package graft

import org.apache.spark.sql.functions._

import graft.model.EventView
import graft.operators.Index
import graft.sources.Tables

/** The bucketed-storage scale claim, asserted: persisting events
  * bucketed by the index pkey lets pkey-partitioned operators run
  * shuffle-free — at 100 TB the per-query hash exchange (the dominant
  * cost of snapshot/coalesce-style operators) is amortized into the
  * one-time write. */
class BucketingSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("index snapshot over a pkey-bucketed table plans no exchange") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    spark.sql("DROP TABLE IF EXISTS ev_bucketed")
    val ev = EventView(spark, "/root/testdata/sf0.001")
    Tables.writeBucketed(ev, "ev_bucketed", s"$dir/ev", Seq("host", "service"),
      buckets = 8, sortCols = Seq("host", "service"))
    val bucketed = spark.table("ev_bucketed")

    val p = plan(Index.snapshot(bucketed))
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed scan should satisfy the window's distribution:\n$p")
    // the unbucketed plan DOES need the exchange — proving the assert
    // above isn't vacuous
    val p0 = plan(Index.snapshot(ev))
    assert(p0.contains("Exchange hashpartitioning"),
      s"control plan lost its exchange — test is vacuous:\n$p0")

    // and the results are identical to the unbucketed path
    val a = Index.snapshot(bucketed).select("event_id").collect()
      .map(_.getLong(0)).sorted.toSeq
    val b = Index.snapshot(ev).select("event_id").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }

  test("pkey aggregation over the bucketed table also skips the shuffle") {
    // coalesce-style latest-per-key aggregation: same distribution,
    // same free ride on the bucket layout
    val agg = spark.table("ev_bucketed")
      .groupBy("host", "service")
      .agg(max(struct(col("time_s"), col("event_id"))).as("latest"))
    val p = plan(agg)
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed aggregation should not shuffle:\n$p")
  }
}
