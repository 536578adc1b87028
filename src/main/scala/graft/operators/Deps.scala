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
    // each leaf probes the index with its own action; materialize the
    // (small) snapshot once instead of recomputing it per leaf, and
    // release it before returning — leaf marks are collected to a local
    // relation (the index is in-memory-small by design, as in the
    // reference), so the returned plan holds no executor-resident
    // blocks and survives executor loss
    val index = indexDf.cache()
    try {
    // global leaf truths: does ANY index entry match each global Matches?
    def leafGlobal(m: Matches): Boolean =
      index.filter(m.fields.map { case (k, v) => col(k) === v }
        .reduceOption(_ && _).getOrElse(lit(true))).limit(1).count() > 0

    // per-host leaves used inside Localhost: hosts whose entries match
    def hostsMatching(m: Matches): DataFrame =
      index.filter(m.fields.map { case (k, v) => col(k) === v }
        .reduceOption(_ && _).getOrElse(lit(true)))
        .select(col("host")).distinct()

    def eventMatches(m: Matches): Column =
      m.fields.map { case (k, v) => col(k) === v }
        .reduceOption(_ && _).getOrElse(lit(true))

    var out = events
    var joined = 0
    def compile(r: Rule, localhost: Boolean): Column = r match {
      case m: Matches =>
        if (!localhost) lit(leafGlobal(m))
        else {
          // broadcast-mark events whose host has a matching entry
          joined += 1
          val markCol = s"_dep$joined"
          val hosts = hostsMatching(m).collect().map(_.getString(0)).toSeq
          val session = events.sparkSession
          import session.implicits._
          val marks = hosts.toDF("host").withColumn(markCol, lit(true))
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
    } finally index.unpersist()
  }
}
