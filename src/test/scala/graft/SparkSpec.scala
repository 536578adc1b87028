package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import scala.jdk.CollectionConverters._

/** Shared local session + tiny event-relation builders for golden tests
  * (the ScalaTest analog of the reference's run-stream/test-stream
  * harness, test/riemann/streams_test.clj + src/riemann/test.clj). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.query.RiemannExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = ()  // keep the session for other suites

  /** Typed test-event relation: (event_id, host, service, state, metric,
    * tags, time_s, ttl, attributes). Null-friendly via Option. */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("host", StringType),
    StructField("service", StringType),
    StructField("state", StringType),
    StructField("description", StringType),
    StructField("metric", DoubleType),
    StructField("tags", ArrayType(StringType)),
    StructField("time_s", LongType),
    StructField("ttl", DoubleType),
    StructField("attributes", MapType(StringType, StringType))
  ))

  case class E(
      id: Long = 0, host: String = "h", service: String = "s",
      state: String = null, description: String = null,
      metric: java.lang.Double = null, tags: Seq[String] = null,
      time: java.lang.Long = null, ttl: java.lang.Double = null,
      attributes: Map[String, String] = null)

  def events(es: E*): DataFrame = {
    val rows = es.map(e => Row(e.id, e.host, e.service, e.state,
      e.description, e.metric, e.tags, e.time, e.ttl, e.attributes))
    spark.createDataFrame(rows.asJava, eventSchema)
  }

  def ids(df: DataFrame): Seq[Long] =
    df.select("event_id").collect().map(_.getLong(0)).toSeq.sorted

  def one[T](df: DataFrame, colName: String): T =
    df.select(colName).collect().head.getAs[T](0)
}
