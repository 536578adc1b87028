package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * End-to-end slice: events parquet → riemann event view → index
    * snapshot (latest per [host,service]) → query-language search. */
  def entry(spark: SparkSession): DataFrame = {
    val ev = graft.model.EventView(spark, "/root/testdata/sf0.001")
    graft.operators.Index.search(
      graft.operators.Index.snapshot(ev),
      """state = "critical" or (metric > 120 and tagged "big")""")
  }
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map()
}
