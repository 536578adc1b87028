package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Temporal
import graft.pipeline.Dedup

/** AQE posture (r16 verdict item 5): the bench runs with
  * `spark.sql.adaptive` + skew-join splitting ON, so every pinned plan
  * shape must SURVIVE adaptive re-planning, not just the static
  * planner. These tests execute representative queries under forced
  * AQE at both a production-ish (200) and an oversized (2000) shuffle
  * partition count, then assert the pins on the FINAL adaptive plan —
  * the one AQE actually ran — and that AQE did rewrite exchanges
  * (coalesced reads) rather than being silently disabled. A separate
  * leg lowers the skew thresholds until AQE splits a skewed join
  * through our range-join shape, proving no custom operator blocks
  * the skew path. */
class AqeSpec extends AnyFunSuite {

  private lazy val base: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.query.RiemannExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Fresh session (shared context, isolated runtime conf) with AQE
    * forced on at `parts` shuffle partitions. */
  private def aqeSession(parts: Int): SparkSession = {
    val s = base.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.shuffle.partitions", parts)
    s
  }

  /** Execute and return the FINAL adaptive plan string. */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def docs(s: SparkSession) = {
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "fox", "golf", "hotel")
    (0 until 400).map { i =>
      val words = (0 until 8 + rnd.nextInt(12))
        .map(_ => vocab(rnd.nextInt(vocab.size)))
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
  }

  for (parts <- Seq(200, 2000)) {
    test(s"ngramJaccardPairs pins hold on the FINAL adaptive plan at " +
      s"shuffle.partitions=$parts (AQE rewrites, answer unchanged)") {
      val s = aqeSession(parts)
      val d = docs(s)
      val q = Dedup.ngramJaccardPairs(d)
      val expect = Dedup.ngramJaccardPairsJoin(d)
        .collect().map(_.toSeq).toSet
      val got = q.collect().map(_.toSeq).toSet
      assert(got == expect, "AQE re-planning changed the answer")
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("AdaptiveSparkPlan isFinalPlan=true"),
        s"AQE did not engage:\n${p.take(2000)}")
      // AQE must be rewriting exchanges, not rubber-stamping: at tiny
      // data volumes with hundreds/thousands of target partitions the
      // final plan carries coalesced shuffle reads
      assert(p.contains("AQEShuffleRead"),
        s"no adaptive shuffle reads in final plan:\n${p.take(2000)}")
      // the r16/r17 pins, now on the final plan
      assert(!p.contains("array_intersect") && !p.contains("array_union"),
        "set-algebra verify leaked back under AQE")
      assert(p.toLowerCase.contains("ngraminterboundedexpr"),
        "bounded in-group kernel missing under AQE")
      assert(!p.contains("SortMergeJoin"),
        "pair-level verification join resurrected under AQE")
    }

    test(s"bucketed as-of window partitioning survives AQE at " +
      s"shuffle.partitions=$parts") {
      val s = aqeSession(parts)
      import s.implicits._
      val ev = (0 until 2000).map(i =>
        (i.toLong, s"h${i % 7}", 1000L + i))
        .toDF("event_id", "host", "time_s")
      val ref = Seq(("h0", 10L, "v1"), ("h1", 100L, "v2"))
        .toDF("host", "time_s", "cfg")
      val q = Temporal.asOfJoin(ev, ref, Seq("host"), "time_s",
        Seq("cfg"), 3600L, bucketSeconds = 600L)
      val p = finalPlan(q)
      assert(p.contains("AdaptiveSparkPlan isFinalPlan=true"))
      // the skew-hardening contract: no data-volume window without the
      // bucket in its partition spec (PlanSpec's static pin, re-checked
      // on what AQE actually executed)
      val winSpecs = p.linesIterator.filter(_.contains("Window ")).toSeq
      assert(winSpecs.nonEmpty)
      val keysOnly = winSpecs
        .filterNot(_.contains("asof_bucket#"))
      assert(keysOnly.isEmpty,
        s"keys-only window appeared under AQE:\n${keysOnly.mkString("\n")}")
    }
  }

  test("AQE skew-join splitting engages THROUGH the range-join shape " +
    "(no graft operator pins a partitioning that blocks the skew path)") {
    val s = aqeSession(16)
    import s.implicits._
    // force the skew machinery at unit-test volumes
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", 1)
    s.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", 20000)
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", 20000)
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", false)
    // 95% of events on ONE host, intervals covering the hot key
    val ev = (0 until 60000).map { i =>
      val h = if (i % 20 == 0) s"h${i % 7}" else "hot"
      (i.toLong, h, (i % 1000).toLong)
    }.toDF("event_id", "host", "time_s")
    val iv = (0 until 7).map(i => (s"i$i", s"h$i", 0L, 1000L))
      .toDF("interval_id", "host", "start_s", "end_s")
      .union(Seq(("ihot", "hot", 0L, 1000L))
        .toDF("interval_id", "host", "start_s", "end_s"))
    val q = Temporal.rangeJoin(ev, iv, Seq("host"), "time_s",
      "start_s", "end_s", binSeconds = 100)
    // collect() (not count()) so THIS DataFrame's adaptive plan
    // executes and finalizes — count() spawns its own QueryExecution
    val n = q.collect().length
    assert(n == 60000, s"containment join must keep every event, got $n")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("AdaptiveSparkPlan isFinalPlan=true"))
    assert(p.contains("skew=true"),
      s"AQE skew split did not engage:\n${p.take(3000)}")
  }
}
