package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Riemann's fold library (reference src/riemann/folds.clj) as Spark
  * aggregate expressions. A fold takes a vector of events and yields one
  * event whose metric is the folded value, attached to the first/last
  * event of the group (folds.clj:60-73) — here: aggregate `Column`s to
  * use inside `groupBy(...).agg(...)`, plus `max_by(struct(*))`-style
  * event-carrying extrema.
  *
  * Strict (`sum*`) vs friendly (`sum`) nil handling (folds.clj:1-14):
  * Spark aggregates skip nulls natively, which is the friendly variant;
  * strict variants are a correctness mode, not a perf path, and are
  * covered by `assertNoNull`.
  *
  * Exactness: `sumExact` aggregates through DECIMAL(18,6) so the result
  * is independent of partition merge order — at 1000-executor scale a
  * double sum is nondeterministic in its last ulps, which breaks both
  * reproducibility and oracle checks. Cast back to double at the end.
  */
object Folds {

  private val D = DecimalType(18, 6)

  /** Order-independent exact sum of a double column (folds.clj:92-101). */
  def sumExact(c: Column): Column = sum(c.cast(D)).cast("double")

  /** Mean via exact sum / count (folds.clj:156-164). */
  def meanExact(c: Column): Column =
    (sum(c.cast(D)).cast("double") / count(c)).as("mean")

  /** Population std-dev (reference divides by n, folds.clj:212-221),
    * computed from exact moments for partition-order independence:
    * sqrt(S2/n − (S1/n)²). */
  def stddevPopExact(c: Column): Column = {
    val s1 = sum(c.cast(D)).cast("double")
    val s2 = sum((c.cast(D) * c.cast(D))).cast("double")
    val n = count(c).cast("double")
    sqrt(s2 / n - (s1 / n) * (s1 / n))
  }

  /** `product` (folds.clj:103-113) — order-independent via log-space for
    * positive metrics; general variant needs an Aggregator. */
  def productLog(c: Column): Column = exp(sum(log(c)))

  /** Exact interpolated percentile — Spark's sort-based `percentile`
    * aggregate (NOT approx). The reference's sorted-sample is
    * nearest-rank over actual events; use [[nearestRank]] where
    * bit-parity with folds.clj:16-49 matters. */
  def percentileExact(c: Column, p: Double): Column =
    call_function("percentile", c, lit(p))

  /** Nearest-rank percentile (folds.clj:16-49 sorted-sample-extract):
    * element at min(floor(p·n), n−1) of the sorted sample; null when
    * every input was null (empty sample, as the reference returns []). */
  def nearestRank(c: Column, p: Double): Column = {
    val ms = sort_array(collect_list(c))
    when(size(ms) > 0,
      element_at(ms, (least(floor(lit(p) * size(ms)), size(ms) - 1) + 1).cast("int")))
  }

  def medianExact(c: Column): Column = percentileExact(c, 0.5)

  /** riemann's `median` (folds.clj:186-189) IS nearest-rank — the
    * element at index floor(0.5·n) of the sorted sample, never an
    * interpolated midpoint. [[medianExact]] interpolates on even
    * counts; use this one for reference parity. */
  def medianFold(c: Column): Column = nearestRank(c, 0.5)

  /** `difference` (folds.clj:115-126): first metric minus the rest, in
    * `ord` order == 2*first − sum. */
  def differenceExact(c: Column, ord: Column): Column =
    (lit(2) * min_by(c, ord).cast(D) - sum(c.cast(D))).cast("double")

  /** `quotient` (folds.clj:128-154): first / product(rest) in `ord`
    * order, via log-space (positive metrics). */
  def quotientLog(c: Column, ord: Column): Column =
    exp(lit(2) * log(min_by(c, ord)) - sum(log(c)))

  /** `minimum`/`maximum`/`extremum` (folds.clj:191-210): fold returns
    * the whole extremal event, not just the value. */
  def minimumEvent(all: Column, c: Column): Column = min_by(all, c)
  def maximumEvent(all: Column, c: Column): Column = max_by(all, c)

  /** Deterministic mode (folds.clj:166-184 `modes`/`mode`): most
    * frequent value; ties broken by smallest value so distributed runs
    * and the oracle agree. One aggregation pass: count per value, then
    * lexicographic struct max over (count, −value). */
  def modeDeterministic(df: org.apache.spark.sql.DataFrame, valueCol: String,
      keys: Seq[String]): org.apache.spark.sql.DataFrame = {
    val counted = df.filter(col(valueCol).isNotNull)
      .groupBy((keys.map(col) :+ col(valueCol)): _*)
      .agg(count(lit(1)).as("cnt"))
    counted.groupBy(keys.map(col): _*)
      .agg(max(struct(col("cnt").as("cnt"), (-col(valueCol)).as("negv"))).as("m"))
      .select((keys.map(col) :+ (-col("m.negv")).as("mode") :+
        col("m.cnt").as("mode_count")): _*)
  }

  /** `modes` (folds.clj:166-184): ALL most-frequent values, sorted —
    * the plural form `mode` picks the smallest element of. */
  def modesAll(df: org.apache.spark.sql.DataFrame, valueCol: String,
      keys: Seq[String]): org.apache.spark.sql.DataFrame = {
    val counted = df.filter(col(valueCol).isNotNull)
      .groupBy((keys.map(col) :+ col(valueCol)): _*)
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
    counted.withColumn("mx", max("cnt").over(w))
      .filter(col("cnt") === col("mx"))
      .groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(col(valueCol))).as("modes"),
        max("cnt").as("mode_count"))
  }

  def countNonNil(c: Column): Column = count(c)
}
