package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.model.EventView
import graft.operators.{Combine, Index, Streams, Windows}
import graft.operators.Streams.EventOps
import graft.functions.Folds
import graft.pipeline.{Curation, Dedup, Similarity, TextAnalysis}
/** Driver contract — one `queries` entry (+ DuckDB `oracleSql` where
  * SQL-expressible) per implemented operator from SURVEY.md §2.
  *
  * Conventions that make the oracle hash-match:
  *  - identical column names on both sides (every computed column
  *    aliased the same),
  *  - a deterministic ORDER BY on both sides,
  *  - anything summed goes through DECIMAL so the result is independent
  *    of partition merge order and engine,
  *  - DuckDB arithmetic always has an explicit DOUBLE operand (bare
  *    numeric literals are DECIMAL there, unlike Spark).
  *
  * The maps themselves live in [[EntryStreams]] / [[EntryPipeline]]
  * (queries) and [[EntryOracle]] (SQL), split along the section
  * boundaries the file grew in; [[EntryShared]] carries the common
  * inputs and derivations. Key sets are asserted disjoint here so a
  * split-file merge can never silently shadow a query.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * End-to-end slice: events parquet → riemann event view → index
    * snapshot (latest per [host,service]) → query-language search. */
  def entry(spark: SparkSession): DataFrame = {
    val ev = EventView(spark, "/root/testdata/sf0.001")
    Index.search(Index.snapshot(ev),
      """state = "critical" or (metric > 120 and tagged "big")""")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val dup = EntryStreams.queries.keySet intersect EntryPipeline.queries.keySet
    require(dup.isEmpty, s"duplicate query keys across split files: $dup")
    EntryStreams.queries ++ EntryPipeline.queries
  }

  def oracleSql: Map[String, String] = EntryOracle.sql
}
