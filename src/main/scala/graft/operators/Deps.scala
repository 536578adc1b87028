package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Riemann's dependency-resolution rules (reference
  * src/riemann/deps.clj:24-80): a Rule relates an event to the current
  * state of the index; `deps-tag` marks events with whether their
  * dependencies are satisfied.
  *
  * Spark reading: the index snapshot is small relative to the event
  * stream, so each leaf rule becomes a broadcast mark — a left join
  * against the aggregated snapshot — and the boolean algebra composes
  * as Column expressions. No shuffle of the event side.
  */
object Deps {

  sealed trait Rule
  /** Map rule {field: value, ...}: some index event has all pairs. */
  case class Matches(fields: Map[String, String]) extends Rule
  /** All child rules must match. */
  case class All(rules: Seq[Rule]) extends Rule
  /** Any child rule matches. */
  case class Any(rules: Seq[Rule]) extends Rule
  /** Child rules evaluated against index entries on the EVENT's host. */
  case class Localhost(rule: Rule) extends Rule
  /** If `a` matches the event itself, `b` must match the index. */
  case class Depends(a: Matches, b: Rule) extends Rule

  /** `deps-tag` (deps.clj:73-80): events gain a boolean
    * `deps_satisfied` column. `index` is the live snapshot
    * ([[Index.liveAt]]); leaf matches aggregate it per (host) or
    * globally and broadcast the tiny result onto the stream. */
  def tagSatisfied(events: DataFrame, indexDf: DataFrame, rule: Rule): DataFrame = {
    // materialize the (small) snapshot exactly once: localCheckpoint
    // truncates the upstream plan so the per-leaf filters below scan
    // the checkpointed blocks instead of recomputing the snapshot, and
    // the context cleaner frees the blocks once the result is
    // unreferenced (a cache() here either leaked pinned blocks or
    // forced eager driver-side collection of every leaf)
    val index = indexDf.localCheckpoint()

    def leafCond(m: Matches): Column =
      m.fields.map { case (k, v) => col(k) === v }
        .reduceOption(_ && _).getOrElse(lit(true))

    // answer every GLOBAL leaf ("does ANY index entry match?") in one
    // batched aggregation job — the rule tree is walked twice (cheap,
    // driver-side) so N leaves cost one Spark action, not N
    val globals = scala.collection.mutable.LinkedHashMap[Matches, Int]()
    def findGlobals(r: Rule, localhost: Boolean): Unit = r match {
      case m: Matches => if (!localhost && !globals.contains(m))
        globals.put(m, globals.size)
      case All(rs) => rs.foreach(findGlobals(_, localhost))
      case Any(rs) => rs.foreach(findGlobals(_, localhost))
      case Localhost(inner) => findGlobals(inner, localhost = true)
      // Depends' `a` is matched against the EVENT, not the index
      case Depends(_, b) => findGlobals(b, localhost)
    }
    findGlobals(rule, localhost = false)
    val globalTruth: Map[Int, Boolean] =
      if (globals.isEmpty) Map.empty
      else {
        val aggs = globals.toSeq.map { case (m, i) =>
          coalesce(max(when(leafCond(m), lit(true))), lit(false)).as(s"_g$i")
        }
        val row = index.agg(aggs.head, aggs.tail: _*).first()
        globals.valuesIterator.map(i => i -> row.getAs[Boolean](s"_g$i")).toMap
      }

    def eventMatches(m: Matches): Column = leafCond(m)

    var out = events
    var joined = 0
    def compile(r: Rule, localhost: Boolean): Column = r match {
      case m: Matches =>
        if (!localhost) lit(globalTruth(globals(m)))
        else {
          // broadcast-mark events whose host has a matching entry; the
          // matching-host relation stays distributed end to end (a
          // collect() here was a driver-memory risk at scale for zero
          // benefit — the broadcast ships the same small set)
          joined += 1
          val markCol = s"_dep$joined"
          val marks = index.filter(leafCond(m)).select(col("host")).distinct()
            .withColumn(markCol, lit(true))
          out = out.join(broadcast(marks), Seq("host"), "left")
          coalesce(col(markCol), lit(false))
        }
      case All(rs) => rs.map(compile(_, localhost))
        .reduceOption(_ && _).getOrElse(lit(true))
      case Any(rs) => rs.map(compile(_, localhost))
        .reduceOption(_ || _).getOrElse(lit(false))
      case Localhost(inner) => compile(inner, localhost = true)
      case Depends(a, b) =>
        // vacuously satisfied unless the event itself matches `a`;
        // NULL fields mean "doesn't match" (riemann truthiness), not
        // SQL three-valued unknown
        !coalesce(eventMatches(a), lit(false)) || compile(b, localhost)
    }
    val cond = compile(rule, localhost = false)
    out.withColumn("deps_satisfied", cond)
      .drop((1 to joined).map(i => s"_dep$i"): _*)
  }
}
