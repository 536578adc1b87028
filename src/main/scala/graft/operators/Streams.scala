package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Riemann's stateless stream combinators, re-expressed as declarative
  * DataFrame transforms. A riemann "stream" is `fn [event] -> children`
  * (reference src/riemann/streams.clj:1-26); here every combinator is a
  * `DataFrame => DataFrame` so Catalyst sees one logical plan and can
  * fuse/pushdown/codegen the whole chain — the Spark-native reading of
  * the closure DAG.
  *
  * Filters: where/over/under/tagged* (streams.clj:1661-1810, 1284-1330).
  * Projections: with/default/adjust/scale/tag/untag/smap
  * (streams.clj:154-204, 1346-1488). Routing: split/splitp/dual
  * (streams.clj:127-152, 1812-1916).
  */
object Streams {

  implicit class EventOps(val df: DataFrame) extends AnyVal {

    /** `where` (streams.clj:1765-1810): keep events matching pred. */
    def where(pred: Column): DataFrame = df.filter(pred)

    /** `where` with `(else ...)`: (matching, non-matching) branches off
      * one upstream plan. Null predicate → else branch, as in the
      * reference's truthiness test. */
    def whereElse(pred: Column): (DataFrame, DataFrame) =
      (df.filter(pred), df.filter(!coalesce(pred, lit(false))))

    /** `over` / `under` (streams.clj:1661-1675). */
    def over(x: Double): DataFrame = df.filter(col("metric") > x)
    def under(x: Double): DataFrame = df.filter(col("metric") < x)

    /** `tagged-all` (streams.clj:1284-1310): all tags present; an empty
      * requirement is vacuously true. */
    def taggedAll(tags: Seq[String]): DataFrame =
      df.filter(tags.map(t => array_contains(col("tags"), t))
        .reduceOption(_ && _).getOrElse(lit(true)))

    /** `tagged-any` (streams.clj:1312-1330): any tag present. */
    def taggedAny(tags: Seq[String]): DataFrame =
      df.filter(arrays_overlap(col("tags"), lit(tags.toArray)))

    /** `expired?` (streams.clj:52-61): state=="expired" or the event's
      * ttl has lapsed relative to `nowS` (unix seconds). Deterministic
      * `now` is a parameter — in streaming it's the watermark clock. */
    def expired(nowS: Column): DataFrame =
      df.filter(Streams.expiredPred(nowS))
    def notExpired(nowS: Column): DataFrame =
      df.filter(!Streams.expiredPred(nowS))

    /** `with` (streams.clj:1346-1391): set/overwrite fields. */
    def withFields(fields: (String, Column)*): DataFrame =
      fields.foldLeft(df) { case (d, (k, v)) => d.withColumn(k, v) }

    /** `default` (streams.clj:1393-1417): set only-if-null. */
    def defaultFields(fields: (String, Column)*): DataFrame =
      fields.foldLeft(df) { case (d, (k, v)) =>
        if (d.columns.contains(k)) d.withColumn(k, coalesce(col(k), v))
        else d.withColumn(k, v)
      }

    /** `adjust` (streams.clj:1419-1448): update one field through f. */
    def adjust(field: String, f: Column => Column): DataFrame =
      df.withColumn(field, f(col(field)))

    /** `scale` (streams.clj:1450-1461): metric × factor. */
    def scale(factor: Double): DataFrame =
      df.withColumn("metric", col("metric") * factor)

    /** `tag` (streams.clj:1463-1476): add tags, distinct-preserving. */
    def tag(tags: String*): DataFrame =
      df.withColumn("tags",
        array_union(coalesce(col("tags"), array()), lit(tags.toArray)))

    /** `untag` (streams.clj:1478-1488): remove tags. */
    def untag(tags: String*): DataFrame =
      df.withColumn("tags", array_except(col("tags"), lit(tags.toArray)))

    /** `smap` (streams.clj:163-175): project, dropping null results.
      * The projection is a set of column rewrites; rows where `keep`
      * evaluates null/false are dropped (nil-result semantics). */
    def smap(keep: Column, fields: (String, Column)*): DataFrame =
      withFields(fields: _*).filter(coalesce(keep, lit(false)))

    /** `split` (streams.clj:1812-1853): first-matching-predicate
      * routing, materialized as a route label (single pass; branch =
      * filter on the label). */
    private def routeExpr(routes: Seq[(Column, String)],
        default: Column): Column =
      routes.foldRight(default) { case ((p, name), acc) =>
        when(coalesce(p, lit(false)), lit(name)).otherwise(acc)
      }

    def splitRoutes(routes: Seq[(Column, String)], fallback: String): DataFrame =
      df.withColumn("route", routeExpr(routes, lit(fallback)))

    /** `split` WITHOUT a default branch (streams.clj:1812-1853): events
      * matching no predicate are DROPPED, not routed — the reference's
      * fallthrough semantics when no trailing child is given. */
    def splitRoutesStrict(routes: Seq[(Column, String)]): DataFrame =
      df.withColumn("route", routeExpr(routes, lit(null).cast("string")))
        .filter(col("route").isNotNull)

    private def splitpRoute(extract: Column, cases: Seq[(Any, String)],
        fallback: Column): Column =
      cases.foldRight(fallback) { case ((v, name), acc) =>
        when(extract <=> lit(v), lit(name)).otherwise(acc)
      }

    /** `splitp` (streams.clj:1855-1916): routing on one extracted
      * expression compared against constants. */
    def splitp(extract: Column, cases: Seq[(Any, String)], fallback: String): DataFrame =
      df.withColumn("route", splitpRoute(extract, cases, lit(fallback)))

    /** `splitp` WITHOUT a default clause: the reference THROWS
      * IllegalArgumentException on a non-matching value
      * (streams.clj:1855-1916, clojure.core/condp semantics);
      * `raise_error` reproduces the throw distributed — it surfaces at
      * action time from whichever task hits the unmatched row. */
    def splitpStrict(extract: Column, cases: Seq[(Any, String)]): DataFrame =
      df.withColumn("route", splitpRoute(extract, cases,
        raise_error(concat(
          lit("splitp: no matching clause for "),
          coalesce(extract.cast("string"), lit("null")))).cast("string")))

    /** `dual` (streams.clj:127-152): events matching pred flow on
      * unchanged; the complement is mirrored as expired copies. */
    def dual(pred: Column): (DataFrame, DataFrame) = {
      val (t, f) = whereElse(pred)
      (t, f.withColumn("state", lit("expired")))
    }

    /** `bit-bucket` (streams.clj:123-125): discard everything — the
      * terminal no-op child. As a plan it's an always-false filter, so
      * Catalyst folds it to LocalTableScan(empty) and anything feeding
      * only the bucket never executes. */
    def bitBucket: DataFrame = df.filter(lit(false))

    /** `smapcat f` (streams.clj:177-197): 1→N projection — f yields an
      * array column whose elements become rows. */
    def smapcat(arr: Column, as: String): DataFrame =
      df.withColumn(as, explode(arr))

    /** `sflatten` (streams.clj:199-204): flatten a vector-of-events
      * column back to individual event rows (the inverse of the
      * window operators' collect_list emission). */
    def sflatten(eventsCol: String): DataFrame = {
      val exploded = df.withColumn("_e", explode(col(eventsCol)))
      exploded.select(col("_e.*"))
    }

    /** `match` via [[Streams.matches]] on one field. */
    def matching(field: String, pattern: Any): DataFrame =
      df.filter(Streams.matches(col(field), pattern))
  }

  /** `by fields` (streams.clj:1556-1612): partition the stream by key
    * fields and build an isolated sub-topology per distinct key. The
    * Spark-native reading: the keys become the partitioning of every
    * windowed/stateful operator downstream — this combinator just
    * threads them, and the shuffle on `keys` IS the reference's
    * per-key substream isolation (with the bonus that Spark state is
    * GC'd/spillable where the reference's substreams leak, SURVEY §7). */
  def by(df: DataFrame, keys: Seq[String])(
      build: (DataFrame, Seq[String]) => DataFrame): DataFrame =
    build(df, keys)

  /** `smap f` in its general row-function form (streams.clj:163-175):
    * any Scala function over typed events, nil results dropped —
    * the arbitrary-code escape hatch when a column rewrite can't
    * express f. Prefer the Column-based [[EventOps.smap]] (codegen). */
  def smapTyped[T, U: org.apache.spark.sql.Encoder](
      ds: org.apache.spark.sql.Dataset[T])(f: T => Option[U])
      : org.apache.spark.sql.Dataset[U] =
    ds.flatMap(e => f(e))

  /** `riemann.common/match` (common.clj:181-212, used by streams.clj
    * `match`:1263-1282): polymorphic matcher — a Regex pattern does a
    * regex find, a Map requires every (field → pattern) to match, a Seq
    * means any-of, `null` matches null, anything else is value
    * equality. */
  def matches(target: Column, pattern: Any): Column = pattern match {
    case null => target.isNull
    case r: scala.util.matching.Regex => target.rlike(r.regex)
    case m: Map[_, _] =>
      m.map { case (k, v) => matches(col(k.toString), v) }
        .reduceOption(_ && _).getOrElse(lit(true))
    case s: Seq[_] =>
      s.map(v => matches(target, v)).reduceOption(_ || _).getOrElse(lit(false))
    case c: Column => target <=> c
    case v => target <=> lit(v)
  }

  def expiredPred(nowS: Column): Column =
    col("state") === "expired" ||
      (col("ttl").isNotNull && nowS - col("time_s") > col("ttl"))
}
