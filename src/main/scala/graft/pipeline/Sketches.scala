package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic, engine-portable distinct-count sketching
  * (HyperLogLog, Flajolet et al. 2007) — the cardinality counterpart
  * of the approx percentile family: at 100 TB "how many distinct
  * hosts/users/urls per key" is a first-class monitoring AND curation
  * question (riemann folds count distinct hosts per service in
  * user configs; corpus reports count distinct domains per shard),
  * and the exact answer needs a full shuffle of every distinct value
  * while the sketch needs one bounded-width partial aggregate.
  *
  * Unlike `approx_count_distinct` (whose HLL++ bias tables are an
  * engine-internal detail), every step here is md5-derived and
  * SQL-expressible, so the DuckDB oracle replays the sketch EXACTLY:
  * hash = first-15-hex of md5("hll:" ++ value) → 60 bits; bucket =
  * hash mod m; rho = position of the first 1-bit in the remaining
  * 60-lg(m) bits (via the binary-string length both engines print
  * identically); per-bucket max-rho is the mergeable state; the
  * estimate is the classic alpha_m·m²/Σ2^−rho harmonic mean with
  * linear counting below 2.5m — transcendentals (ln) pre-computed on
  * the driver and embedded as literals on BOTH sides, and the
  * harmonic sum carried as an exact DECIMAL of scaled powers of two,
  * so no cross-engine libm difference can flip a bit.
  *
  * Scale shape: [[sketch]] is one hash aggregation with map-side
  * combine to ≤ m rows per key (the mergeable partial — union sketches
  * by taking max-rho per bucket again); [[estimate]] rolls ≤ m rows
  * per key up to one. No driver state, no second pass over the data.
  */
object Sketches {

  /** Default precision: 2^6 = 64 buckets (~13% standard error) — small
    * enough that the per-key state is negligible, and the entry
    * surface's rel-err column shows the real achieved accuracy. */
  val DefaultB = 6

  private def alphaM(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** alpha_m · m² · 2^61 as ONE driver-computed double — the numerator
    * literal both the Spark plan and the DuckDB oracle embed (so each
    * engine performs the same single divide). */
  def alphaNum(b: Int): Double = {
    val m = 1 << b
    alphaM(m) * m * m * math.pow(2.0, 61)
  }

  /** Driver-precomputed m·ln(m/zeros) for zeros ∈ [1, m] — the
    * linear-counting table both engines embed as literals (libm ln
    * can differ across engines in the last ulp; a literal cannot). */
  def lnTable(b: Int): Seq[Double] = {
    val m = 1 << b
    (1 to m).map(z => m * math.log(m.toDouble / z))
  }

  /** The mergeable HLL state: one row per (keys, bucket) with the max
    * first-1-bit position `rho` observed in that bucket. NULL values
    * are excluded up front — like `count(DISTINCT …)`, the sketch
    * counts distinct NON-NULL values (a null would otherwise hash to a
    * phantom null bucket and skew n_zero against the exact audit). */
  private def hllHash(valueCol: String): Column =
    conv(substring(md5(concat(lit("hll:"),
      col(valueCol).cast("string"))), 1, 15), 16, 10).cast("long")

  private def hllBucket(valueCol: String, b: Int): Column = {
    require(b >= 2 && b <= 16, s"b must be in [2,16], got $b")
    hllHash(valueCol) % (1 << b)
  }

  /** First-1-bit position of the (60-b)-wide hash remainder: its
    * printed binary length (identical in Spark's conv and DuckDB's
    * bin, including "0" for zero) gives the top bit's position. The
    * shift is an exact bit op, not `/` (double division would round a
    * 60-bit hash past the 53-bit mantissa); DuckDB mirrors `// m`. */
  private def hllRho(valueCol: String, b: Int): Column = {
    val restBits = 60 - b
    val rest = shiftright(hllHash(valueCol), b)
    when(rest === 0, lit(restBits + 1))
      .otherwise(lit(restBits) - length(conv(rest.cast("string"),
        10, 2)) + 1)
  }

  def sketch(df: DataFrame, keys: Seq[String], valueCol: String,
      b: Int = DefaultB): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select((keys.map(col) :+ hllBucket(valueCol, b).as("bucket") :+
        hllRho(valueCol, b).as("rho")): _*)
      .groupBy((keys :+ "bucket").map(col): _*)
      .agg(max(col("rho")).as("r"))

  /** Σ 2^{-rho} scaled by 2^61 so the harmonic sum is EXACT decimal
    * arithmetic: present buckets contribute 2^(61-r) (r ≥ 1 keeps it
    * in long range), absent buckets 2^61 each. */
  private def zTerm: Column =
    pow(lit(2.0), lit(61) - col("r")).cast(DecimalType(38, 0))

  /** The estimator tail shared by batch and streaming rollups: from
    * (…, n_buckets, zp) to (…, n_zero, hll_est) — one divide off the
    * exact decimal sum, linear counting from the driver-literal table. */
  private def estimateCols(rolled: DataFrame, keep: Seq[Column],
      b: Int): DataFrame = {
    val m = 1 << b
    val pow261 = math.pow(2.0, 61) // exactly representable
    val withE = rolled
      .withColumn("n_zero", lit(m) - col("n_buckets"))
      .withColumn("z", (col("zp") +
        col("n_zero").cast(DecimalType(38, 0)) *
          lit(pow261).cast(DecimalType(38, 0))).cast("double"))
      .withColumn("e_raw", lit(alphaNum(b)) / col("z"))
    val linear = element_at(
      array(lnTable(b).map(lit): _*), col("n_zero"))
    withE.withColumn("hll_est", round(
        when(col("e_raw") <= lit(2.5 * m) && col("n_zero") > 0, linear)
          .otherwise(col("e_raw")), 4))
      .select(keep :+ col("n_buckets") :+ col("n_zero") :+
        col("hll_est"): _*)
  }

  /** Roll a [[sketch]] up to one estimate row per key:
    * (keys, n_buckets, n_zero, hll_est). */
  def estimate(sk: DataFrame, keys: Seq[String],
      b: Int = DefaultB): DataFrame =
    estimateCols(
      sk.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).cast("int").as("n_buckets"),
          sum(zTerm).as("zp")),
      keys.map(col), b)

  /** Count-min frequency sketch (Cormode & Muthukrishnan 2005) — the
    * frequency companion to the HLL distinct sketch: "how often does
    * each value occur" answered from d×w cells instead of a
    * per-distinct-value shuffle. Cells are exact additive counts
    * (unlike HLL's max-rho state there is no estimator nonlinearity),
    * so the sketch is deterministic, mergeable by cell-wise addition,
    * and replayed EXACTLY by the DuckDB oracle; estimates are
    * min-over-rows and can only OVERcount (collision bias —
    * [[cmsEstimate]] surfaces the achieved overshoot against the
    * exact count).
    *
    * Scale shape: one aggregation to d·w rows per key-group with
    * map-side combine — the partial-aggregate rows ARE the mergeable
    * sketch. Estimation joins a (small) probe set against d·|probes|
    * cells. */
  val DefaultCmsDepth = 4
  val DefaultCmsWidth = 256

  private def cmsBucket(valueCol: String, row: Int, w: Int): Column =
    conv(substring(md5(concat(lit(s"cms:$row:"),
      col(valueCol).cast("string"))), 1, 15), 16, 10).cast("long") % w

  /** The mergeable CMS state: (row, bucket, cnt), d·w rows max. */
  def cmsSketch(df: DataFrame, valueCol: String,
      d: Int = DefaultCmsDepth, w: Int = DefaultCmsWidth): DataFrame = {
    require(d >= 1 && w >= 2, s"need d >= 1, w >= 2; got d=$d w=$w")
    // nulls excluded like the HLL sketch (and like count(value)): a
    // null would hash to d null buckets no probe can ever look up
    df.filter(col(valueCol).isNotNull)
      .select(posexplode(array((0 until d).map(r =>
        cmsBucket(valueCol, r, w)): _*)).as(Seq("row", "bucket")))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate every probe value against a [[cmsSketch]]:
    * (value, cms_est) with cms_est = min over the d rows' cells. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame,
      valueCol: String, d: Int = DefaultCmsDepth,
      w: Int = DefaultCmsWidth): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val cells = probes.select(col(valueCol),
        posexplode(array((0 until d).map(r =>
          cmsBucket(valueCol, r, w)): _*)).as(Seq("row", "bucket")))
    // the sketch is d·w rows — broadcast it under the probes
    cells.join(broadcast(sketch), Seq("row", "bucket"))
      .groupBy(valueCol).agg(min(col("cnt")).as("cms_est"))
  }

  /** Sketch + estimate + exact audit over the df's own distinct
    * values: (value, n_exact, cms_est, over_err) — over_err ≥ 0 by
    * construction (CMS never undercounts). */
  def cmsFrequencies(df: DataFrame, valueCol: String,
      d: Int = DefaultCmsDepth, w: Int = DefaultCmsWidth): DataFrame = {
    val sk = cmsSketch(df, valueCol, d, w)
    val exact = df.groupBy(valueCol).agg(count(lit(1)).as("n_exact"))
    exact.join(cmsEstimate(sk, exact.select(valueCol), valueCol, d, w),
        valueCol)
      .withColumn("over_err", col("cms_est") - col("n_exact"))
  }

  /** Streaming face of [[sketch]]: per event-time window × keys, the
    * mergeable HLL bucket-max state, emitted when the watermark closes
    * the window (append mode). The sketch rows ARE the deliverable —
    * a monitoring consumer stores them per window and rolls up with
    * [[estimate]] (or unions windows by bucket-max first: the merge
    * property SketchesSpec pins). One stateful aggregation, state
    * bounded at m rows per (window, keys) — the whole point of
    * sketching the firehose instead of buffering distinct values. */
  private def streamingSketchWin(stream: DataFrame, eventTimeCol: String,
      windowDur: String, keys: Seq[String], valueCol: String,
      b: Int, watermark: String): DataFrame =
    stream
      .filter(col(valueCol).isNotNull)
      // pre-project bucket AND rho in one pass like the batch sketch:
      // as groupBy-vs-agg expressions they'd live in separate
      // HashAggregate projections and each pay the md5 hash chain
      .select((col(eventTimeCol) +: keys.map(col)) ++
        Seq(hllBucket(valueCol, b).as("bucket"),
          hllRho(valueCol, b).as("rho")): _*)
      .withWatermark(eventTimeCol, watermark)
      .groupBy((window(col(eventTimeCol), windowDur) +: keys.map(col)) :+
        col("bucket"): _*)
      .agg(max(col("rho")).as("r"))

  def streamingSketch(stream: DataFrame, eventTimeCol: String,
      windowDur: String, keys: Seq[String], valueCol: String,
      b: Int = DefaultB, watermark: String = "0 seconds"): DataFrame =
    streamingSketchWin(stream, eventTimeCol, windowDur, keys, valueCol,
        b, watermark)
      .select((col("window.start").as("window_start") +:
        keys.map(col)) ++ Seq(col("bucket"), col("r")): _*)

  /** The full streaming answer to "how many DISTINCT values per
    * window × keys" — which Spark streaming aggregation cannot express
    * exactly (`count(DISTINCT)` is unsupported on streams) and the
    * sketch answers in bounded state: level 1 is the windowed
    * bucket-max sketch, level 2 re-windows on `window_time` (the
    * chained-stateful-operator shape) and rolls the ≤ m bucket rows up
    * through the SAME estimator tail as the batch [[estimate]].
    * Output (append on window close): (window_start, keys, n_buckets,
    * n_zero, hll_est). Batch parity spec-pinned: the closed window's
    * row equals estimate(sketch(batch rows)). */
  def streamingDistinct(stream: DataFrame, eventTimeCol: String,
      windowDur: String, keys: Seq[String], valueCol: String,
      b: Int = DefaultB, watermark: String = "0 seconds"): DataFrame = {
    val sk = streamingSketchWin(stream, eventTimeCol, windowDur, keys,
      valueCol, b, watermark)
    val rolled = sk
      .groupBy(window(window_time(col("window")), windowDur) +:
        keys.map(col): _*)
      .agg(count(lit(1)).cast("int").as("n_buckets"),
        sum(zTerm).as("zp"))
    estimateCols(rolled,
      col("window.start").as("window_start") +: keys.map(col), b)
  }

  /** Streaming face of [[cmsSketch]]: per event-time window × keys,
    * additive cells (the CMS merge is a plain sum, so this is ONE
    * windowed count aggregation over the exploded hash rows). */
  def streamingCmsSketch(stream: DataFrame, eventTimeCol: String,
      windowDur: String, keys: Seq[String], valueCol: String,
      d: Int = DefaultCmsDepth, w: Int = DefaultCmsWidth,
      watermark: String = "0 seconds"): DataFrame = {
    require(d >= 1 && w >= 2, s"need d >= 1, w >= 2; got d=$d w=$w")
    stream
      .filter(col(valueCol).isNotNull)
      .select((col(eventTimeCol) +: keys.map(col)) :+
        posexplode(array((0 until d).map(r =>
          cmsBucket(valueCol, r, w)): _*)).as(Seq("row", "bucket")): _*)
      .withWatermark(eventTimeCol, watermark)
      .groupBy((window(col(eventTimeCol), windowDur) +: keys.map(col)) ++
        Seq(col("row"), col("bucket")): _*)
      .agg(count(lit(1)).as("cnt"))
      .select((col("window.start").as("window_start") +: keys.map(col)) ++
        Seq(col("row"), col("bucket"), col("cnt")): _*)
  }

  /** Sketch + estimate + exact comparison in one relation:
    * (keys, n_exact, n_buckets, n_zero, hll_est, rel_err) — the
    * accuracy-auditing surface (the exact side is the expensive
    * distinct shuffle the sketch exists to avoid; here it doubles as
    * the oracle-checked ground truth). */
  def hllDistinct(df: DataFrame, keys: Seq[String], valueCol: String,
      b: Int = DefaultB): DataFrame = {
    val est = estimate(sketch(df, keys, valueCol, b), keys, b)
    val exact = df.groupBy(keys.map(col): _*)
      .agg(countDistinct(col(valueCol)).as("n_exact"))
    exact.join(est, keys)
      .withColumn("rel_err", round(
        abs(col("hll_est") - col("n_exact").cast("double")) /
          col("n_exact").cast("double"), 4))
  }
}
