package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.query.QueryLanguage

/** The riemann index: latest event per [host, service] with TTL expiry
  * (reference src/riemann/index.clj:58-126; pkey at
  * src/riemann/common.clj:114-117). Batch form: a deduplicating window
  * over the event relation. Streaming form (keyed state +
  * event-time timeouts): [[graft.streaming.StreamingIndex]].
  *
  * Scale note: `row_number over (partition by host,service)` is a single
  * hash exchange on the pkey and no global sort — at 100 TB the snapshot
  * is shuffle-bound on exactly the index key, which is optimal. The
  * reference's O(1) host+service query fast path (index.clj:44-56)
  * corresponds to predicate pushdown through the window (Catalyst pushes
  * partition-key filters below the window operator).
  */
object Index {

  /** Latest (by time, tie-broken by event_id) event per [host,service]. */
  def snapshot(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("host"), col("service"))
      .orderBy(col("time_s").desc, col("event_id").desc)
    events.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** Snapshot minus entries whose TTL lapsed by `nowS` — the reaper's
    * view (reference src/riemann/core.clj:276-309). Expired entries are
    * returned separately by [[expiredAt]] (the reaper re-streams them as
    * state="expired" events, index.clj:73-87). */
  def liveAt(events: DataFrame, nowS: Column): DataFrame =
    snapshot(events).filter(!Streams.expiredPred(nowS))

  def expiredAt(events: DataFrame, nowS: Column): DataFrame =
    snapshot(events).filter(Streams.expiredPred(nowS))
      .withColumn("state", lit("expired"))
      .withColumn("time_s", nowS)

  /** `delete-from-index` (reference src/riemann/config.clj:258-271,
    * core.clj:256-267): drop index entries matching each delete event
    * on `fields` — by default the pkey, so a delete removes whatever is
    * indexed under its [host, service] regardless of other fields; a
    * custom field list deletes by those values instead.
    *
    * Batch reading: one anti-join of the snapshot against the distinct
    * delete keys. The delete side is small (alert/tombstone traffic) —
    * broadcast — so the index side never re-shuffles. */
  def delete(snapshot: DataFrame, deletes: DataFrame,
      fields: Seq[String] = Seq("host", "service")): DataFrame =
    snapshot.join(
      broadcast(deletes.select(fields.map(col): _*).distinct()),
      fields, "left_anti")

  /** `index/search` (reference src/riemann/index.clj:89-95): run a query
    * language predicate against the snapshot. */
  def search(snapshot: DataFrame, query: String): DataFrame =
    snapshot.filter(QueryLanguage.predicate(query, snapshot.schema))

  /** The reference's point-lookup fast path (index.clj:44-56): a query
    * whose top-level conjunction pins `host`/`service` equality is
    * satisfied without scanning the whole index. Spark reading: those
    * equalities are exactly the snapshot window's partition keys, so
    * filtering the EVENT RELATION before the window is semantics-
    * preserving — and Catalyst then pushes the predicate into the
    * parquet scan, where the generic post-window filter could not go. */
  def searchEvents(events: DataFrame, query: String): DataFrame = {
    import QueryLanguage._
    val ast = parse(query)
    def pkeyEqs(a: Ast): Seq[Column] = a match {
      case And(l, r) => pkeyEqs(l) ++ pkeyEqs(r)
      case Cmp("=", FieldRef(f), StrLit(v)) if f == "host" || f == "service" =>
        Seq(col(f) === v)
      case Cmp("=", StrLit(v), FieldRef(f)) if f == "host" || f == "service" =>
        Seq(col(f) === v)
      case _ => Seq.empty
    }
    val pre = pkeyEqs(ast).foldLeft(events)((d, p) => d.filter(p))
    snapshot(pre).filter(compile(ast, events.schema))
  }
}
