package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Riemann's state-combining operators: `coalesce` and `project`
  * (reference src/riemann/streams.clj:1187-1241, 2032-2101). Both
  * combine the *latest* states of different entities — the closest
  * thing riemann has to a join.
  *
  * Batch readings: at end-of-data, `coalesce`'s emitted set IS the
  * latest event per [service, host] (the index snapshot restricted to
  * what flowed through), and `project`'s emitted vector is the latest
  * event matching each predicate. Streaming forms belong to
  * [[graft.streaming.StatefulOps]].
  */
object Combine {

  /** `coalesce` (streams.clj:1187-1241): the remembered set = latest
    * event per key (default [service, host] as in the reference's
    * ConcurrentHashMap key). Downstream folds aggregate this relation —
    * e.g. average CPU over hosts. One hash exchange on the key. */
  def coalesce(df: DataFrame,
      keys: Seq[String] = Seq("service", "host")): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(max(struct(col("time_s"), col("event_id"), col("metric"),
        col("state"))).as("latest"))
      .select(keys.map(col) :+
        col("latest.time_s").as("time_s") :+
        col("latest.event_id").as("event_id") :+
        col("latest.metric").as("metric") :+
        col("latest.state").as("state"): _*)

  /** `coalesce` composed with a fold, the canonical usage
    * `(coalesce (smap folds/mean ...))`: fold the latest-per-[service,
    * host] set per service (mean CPU over hosts, etc.). */
  def coalesceFold(df: DataFrame, folds: (String, Column)*): DataFrame =
    coalesce(df).groupBy(col("service"))
      .agg(folds.head._2.as(folds.head._1),
        folds.tail.map { case (n, c) => c.as(n) }: _*)

  /** `project [p1 p2 ...]` (streams.clj:2032-2101): latest event
    * matching each predicate, one output row per group key (the
    * reference's single global vector = `keys = Nil`). Each slot i
    * carries (time_s, event_id, metric); lexicographic struct max =
    * latest by (time, event_id), null-skipping, so one aggregation pass
    * with no join or window. */
  def projectLatest(df: DataFrame, preds: Seq[Column],
      keys: Seq[String] = Nil): DataFrame = {
    val slots = preds.zipWithIndex.map { case (p, i) =>
      max(when(p, struct(col("time_s"), col("event_id"), col("metric"))))
        .as(s"slot$i")
    }
    val grouped =
      if (keys.isEmpty) df.groupBy()
      else df.groupBy(keys.map(col): _*)
    grouped.agg(slots.head, slots.tail: _*)
  }

  /** `project` + `folds/quotient`, the reference's flagship example
    * (enqueues per dequeue): metric of slot0's latest over slot1's. */
  def projectQuotient(df: DataFrame, p1: Column, p2: Column,
      keys: Seq[String] = Nil): DataFrame =
    projectLatest(df, Seq(p1, p2), keys)
      .withColumn("quotient",
        round(col("slot0.metric") / col("slot1.metric"), 6))
      .select((keys.map(col) :+ col("slot0.metric").as("metric_a") :+
        col("slot1.metric").as("metric_b") :+ col("quotient")): _*)
}
