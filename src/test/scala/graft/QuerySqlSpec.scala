package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.execution.FilterExec

import graft.query.{QueryLanguage, RiemannSql}

/** The riemann_query SQL surface: the query language callable from
  * `spark.sql(...)` via SparkSessionExtensions (function + analyzer
  * rule). Semantics must be identical to the DataFrame-side
  * QueryLanguage.predicate path, and the expanded predicate must behave
  * like hand-written Catalyst (codegen'd filter, no leftover
  * placeholder). */
class QuerySqlSpec extends SparkSpec {

  private def fixture() = {
    events(
      E(1, host = "a", service = "api req", metric = 0.5,
        tags = Seq("prod"), attributes = Map("dc" -> "east")),
      E(2, host = "b", service = "api req", metric = 7.0,
        tags = Seq("dev"), attributes = Map("dc" -> "west")),
      E(3, host = "a", service = "db", state = "critical", metric = 2.0),
      E(4, host = "c", service = "cache", metric = null))
      .createOrReplaceTempView("qsql_events")
  }

  test("riemann_query is installed in the test session") {
    assert(RiemannSql.isInstalled(spark))
  }

  test("WHERE riemann_query matches the DataFrame predicate path") {
    fixture()
    val queries = Seq(
      """host = "a"""",
      """metric > 1 and not state = "critical"""",
      """tagged "prod" or service =~ "db%"""",
      """dc = "east"""", // attributes-map resolution
      """service ~= "req" and metric < 1""")
    for (q <- queries) {
      val viaSql = spark.sql(
        s"SELECT event_id FROM qsql_events WHERE riemann_query('${q.replace("'", "''")}')")
      val viaDf = spark.table("qsql_events")
        .filter(QueryLanguage.predicate(q, eventSchema))
        .select("event_id")
      assert(viaSql.collect().map(_.getLong(0)).sorted.toSeq ==
        viaDf.collect().map(_.getLong(0)).sorted.toSeq, s"query: $q")
    }
  }

  test("riemann_query works as a projected boolean column") {
    fixture()
    val rows = spark.sql(
      "SELECT event_id, riemann_query('metric > 1') AS hot " +
        "FROM qsql_events ORDER BY event_id")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1))
    assert(rows.toSeq == Seq(1L -> false, 2L -> true, 3L -> true, 4L -> false))
  }

  test("the placeholder is fully expanded before execution") {
    fixture()
    val df = spark.sql(
      "SELECT event_id FROM qsql_events WHERE riemann_query('host = \"a\"')")
    // analyzed: placeholder gone; optimized: on a local relation Catalyst
    // even constant-folds the whole filter away (ConvertToLocalRelation)
    // — the strongest proof the expansion is ordinary Catalyst
    assert(!df.queryExecution.analyzed.toString.contains("RiemannQueryExpr"),
      "placeholder must not survive analysis")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }

  test("syntax errors surface at the call site with the parser message") {
    fixture()
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM qsql_events WHERE riemann_query('metric >')")
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("unexpected end")))
  }

  test("non-literal argument is rejected") {
    fixture()
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM qsql_events WHERE riemann_query(host)").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("string literal")))
  }

  test("duplicate column names raise an ambiguity error, not arbitrary binding") {
    fixture()
    // a self-join exposes `host` (and every other column) on both sides;
    // hand-written SQL raises AMBIGUOUS_REFERENCE here and riemann_query
    // must too — binding to whichever side toMap kept would silently
    // filter on the wrong relation
    val e = intercept[AnalysisException] {
      spark.sql(
        "SELECT l.event_id FROM qsql_events l JOIN qsql_events r " +
          "ON l.event_id = r.event_id WHERE riemann_query('host = \"a\"')")
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("ambiguous"),
      s"expected ambiguity error, got: ${e.getMessage}")
    // unambiguous references through the same join still work
    val ok = spark.sql(
      "SELECT l.event_id FROM qsql_events l " +
        "JOIN (SELECT event_id AS rid FROM qsql_events) r " +
        "ON l.event_id = r.rid WHERE riemann_query('host = \"a\"')")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ok == Seq(1L, 3L))
  }

  test("riemann_query('host = ... and service = ...') pushes down to parquet") {
    fixture()
    val dir = java.nio.file.Files.createTempDirectory("qsql_pq").toString
    spark.table("qsql_events").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("qsql_pq")
    val df = spark.sql(
      "SELECT event_id FROM qsql_pq WHERE riemann_query('host = \"a\"')")
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the compiled predicate is ordinary Catalyst: the (null-safe) host
    // equality must reach the scan as a pushed filter, like hand-written
    // SQL, and the physical plan is a plain codegen'd filter
    assert(formatted.replaceAll("\\s", "").contains("EqualNullSafe(host,a)"),
      s"expected host pushdown in:\n$formatted")
    assert(df.queryExecution.executedPlan.exists(_.isInstanceOf[FilterExec]))
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }
}
