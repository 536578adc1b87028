package graft

import graft.sources.LineProtocols
import org.apache.spark.sql.DataFrame

import scala.util.Random

/** The single-pass [[graft.sources.LineParsers]] expressions must be
  * observationally identical to the column-expression pipelines they
  * replaced ([[LineProtocols.decodeGraphiteColumns]] /
  * [[LineProtocols.decodeOpenTsdbColumns]]) — same accepted lines, same
  * field values, same attribute-map entry ORDER (last-duplicate-wins at
  * last-occurrence position). Checked on adversarial generated lines:
  * phantom \r\n terminators, duplicate tag keys, valueless and
  * empty-value tags, nan/inf spellings, unparseable numbers, signs,
  * fractional and overflowing timestamps. */
class LineParsersParitySpec extends SparkSpec {

  // deterministic corpus: property frameworks shrink poorly across a
  // Spark round-trip, so generate one big seeded batch per protocol
  // and compare the full decoded relations
  private val rnd = new Random(0xcafe)

  private def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.length))

  private val services = Seq("api.req", "sys cpu", "a;b", ";x", "svc", "")
  private val numbers = Seq("1.5", "7", "nan", "NaN", "+NaN", "-nan", "inf",
    "Infinity", "-inf", "1e300", "1e-300", "notanum", "1f", "0x1p3", "12.",
    ".5", "-0.0", "9223372036854775807", "9223372036854775808", "1.9", "-1.9")
  private val tagToks = Seq("host=web01", "host=", "host", "service=api",
    "service=", "dc=east", "dc=west", "a=1", "a=3", "k==v", "=v", "empty=",
    "novalue", "x=a,b", "host=dup1", "host=dup2")
  private val ws = Seq(" ", "  ", "\t")
  private val terminators = Seq("", "\n", "\r\n", " ", " \r\n", "\t")

  private def graphiteLine(): String = {
    val svc = pick(services) +
      (0 to rnd.nextInt(4)).drop(1).map(_ => ";" + pick(tagToks)).mkString
    val parts = rnd.nextInt(10) match {
      case 0 => Seq(svc) // wrong arity
      case 1 => Seq(svc, pick(numbers), pick(numbers), pick(numbers))
      case _ => Seq(svc, pick(numbers), pick(numbers))
    }
    pick(terminators) + parts.mkString(pick(ws)) + pick(terminators)
  }

  private def opentsdbLine(): String = {
    val nTags = rnd.nextInt(4)
    val parts = Seq(pick(Seq("put", "put", "put", "version", "PUT")),
      pick(services.filter(_.nonEmpty)), pick(numbers), pick(numbers)) ++
      (1 to nTags).map(_ => pick(tagToks))
    val kept = if (rnd.nextInt(12) == 0) parts.take(rnd.nextInt(4)) else parts
    pick(terminators) + kept.mkString(pick(ws)) + pick(terminators)
  }

  private def canon(df: DataFrame): Seq[String] = {
    // JSON renders maps in entry order — the order parity matters
    // because downstream hashing (Verify/Bench) sees it
    df.toJSON.collect().toSeq.sorted
  }

  private def compare(mk: DataFrame => DataFrame, spec: DataFrame => DataFrame,
      lines: Seq[String]): Unit = {
    val spark0 = spark
    import spark0.implicits._
    // keep an id column to prove non-line columns survive and pair up
    val df = lines.zipWithIndex.map { case (l, i) => (i.toLong, l) }
      .toDF("lid", "line")
    val got = canon(mk(df))
    val want = canon(spec(df))
    assert(got == want,
      s"parser/columns diverge:\n got=${got.take(5)}\nwant=${want.take(5)}")
  }

  test("graphite: fast parser ≡ column pipeline on 2000 adversarial lines") {
    val ls = (1 to 2000).map(_ => graphiteLine())
    compare(LineProtocols.decodeGraphite(_),
      LineProtocols.decodeGraphiteColumns(_), ls)
  }

  test("opentsdb: fast parser ≡ column pipeline on 2000 adversarial lines") {
    val ls = (1 to 2000).map(_ => opentsdbLine())
    compare(LineProtocols.decodeOpenTsdb(_),
      LineProtocols.decodeOpenTsdbColumns(_), ls)
  }

  test("golden hand cases both parsers accept identically") {
    val ls = Seq(
      "api.req;dc=a;dc=b 1.5 1000",      // dup key order: b at last position
      "svc;a=1;b=2;a=3 5 1706000000",
      "s;=v;k==v;novalue 2 7",           // empty key, =-in-value, null value
      "nanmetric nan 1706000002",
      "x 1.5 2.9",                       // fractional ts truncates
      "x 1.5 1e300",                     // ts overflow drops
      "put sys.cpu 1706000000 42.5 host=web01 cpu=0",
      "put m 1 2 service=api host= host",
      "put m 1 2 host=a host=b dc=x",    // host last-wins
      "put m 1.5 2",                     // fractional opentsdb ts drops
      "put m 1 inf",                     // inf metric parses
      "put m 1 NaN host=w")              // nan filtered
    compare(LineProtocols.decodeGraphite(_),
      LineProtocols.decodeGraphiteColumns(_), ls)
    compare(LineProtocols.decodeOpenTsdb(_),
      LineProtocols.decodeOpenTsdbColumns(_), ls)
  }
}
