package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Baseline: brute-force cosine top-k with the query
  * side broadcast (one pass over the corpus, no shuffle of the big
  * side). Scale path: random-hyperplane LSH bucketing so candidate
  * generation is a bucket-equijoin.
  *
  * Dot products use `zip_with`/`aggregate` higher-order functions —
  * codegen-friendly Catalyst expressions, no UDF.
  */
object Similarity {

  /** Sequential-order dot product of two double arrays (fast path). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** Order-independent exact dot product: per-element double products
    * (deterministic) summed through DECIMAL(38,18). Use where results
    * must be identical under any partitioning/engine (oracle parity);
    * [[dot]] is the cheaper in-partition variant. */
  def dotExact(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x * y).cast(DecimalType(38, 18))),
      lit(java.math.BigDecimal.ZERO).cast(DecimalType(38, 18)),
      (acc, x) => (acc + x).cast(DecimalType(38, 18))).cast("double")

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** L2-normalized copy (cast to double once, normalize once — cosine
    * then reduces to a dot product in the join). The norm sums squares
    * through decimal so the unit vector is bit-identical on any engine;
    * sqrt is IEEE-exact everywhere. */
  def normalized(a: Column): Column = {
    val d = transform(a, x => x.cast("double"))
    val n = sqrt(aggregate(
      transform(d, x => (x * x).cast(DecimalType(38, 18))),
      lit(java.math.BigDecimal.ZERO).cast(DecimalType(38, 18)),
      (acc, x) => (acc + x).cast(DecimalType(38, 18))).cast("double"))
    transform(d, x => x / n)
  }

  /** Brute-force cosine top-k: for each query vector (small set,
    * broadcast), rank the whole corpus. Ties broken by vec_id; cosine
    * rounded so ranking is stable across engines and partitionings. */
  def bruteForceTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val e = embeddings.select(col("vec_id"), normalized(col("embedding")).as("unit"))
    val q = e.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("unit").as("qunit"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(dotExact(col("unit"), col("qunit")), 6).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * md5-derived integer mapped to [-0.5, 0.5). md5 (not xxhash64) so
    * any engine — including the DuckDB oracle — reproduces the exact
    * hyperplanes; pure column arithmetic, no RNG state. */
  private def planeComponent(plane: Column, dim: Column): Column = {
    val h = conv(substring(md5(concat(plane.cast("string"), lit("_"),
      dim.cast("string"))), 1, 15), 16, 10).cast("long")
    ((h % 100000) - 50000).cast("double") / 100000.0
  }

  /** Random-hyperplane LSH bucket id as ONE codegen'd expression per
    * row — no crossJoin row blowup, no shuffle: for each plane p, the
    * projection is an `aggregate` over (component, dim) pairs; the sign
    * bits pack into a long. */
  def bucketExpr(unit: Column, planes: Int): Column = {
    def proj(p: Column): Column =
      aggregate(
        zip_with(unit, sequence(lit(0), size(unit) - 1),
          (x, d) => (x * planeComponent(p, d)).cast(DecimalType(38, 18))),
        lit(java.math.BigDecimal.ZERO).cast(DecimalType(38, 18)),
        (acc, x) => (acc + x).cast(DecimalType(38, 18))).cast("double")
    aggregate(
      transform(sequence(lit(0), lit(planes - 1)),
        p => when(proj(p) >= 0, pow(lit(2.0), p).cast("long")).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
  }

  /** Random-hyperplane LSH bucket id per vector: docs hashing to the
    * same bucket are cosine-close with high probability. Narrow one-pass
    * projection — scales as a pure map. */
  def lshBuckets(embeddings: DataFrame, planes: Int = 8): DataFrame =
    embeddings.select(col("vec_id"), col("label"),
      bucketExpr(normalized(col("embedding")), planes).as("bucket"))

  /** LSH-bucketed ANN top-k: candidates share a bucket; exact cosine
    * only within buckets. Recall/cost tuned by `planes`. */
  def lshTopK(embeddings: DataFrame, k: Int, planes: Int = 8): DataFrame = {
    val buckets = lshBuckets(embeddings, planes)
    val e = embeddings.select(col("vec_id"), normalized(col("embedding")).as("unit"))
      .join(buckets.select("vec_id", "bucket"), "vec_id")
    val a = e.as("a")
    val b = e.as("b")
    val scored = a.join(b, col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("vec_id"),
        round(dotExact(col("a.unit"), col("b.unit")), 6).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Corpus-level embedding stats — norms and per-label centroids
    * (IVF coarse quantizer seed; centroid = mean of unit vectors).
    * Decimal-exact sums at every reduction so the result is independent
    * of partition merge order. */
  def labelCentroids(embeddings: DataFrame): DataFrame = {
    val e = embeddings.select(col("label"), normalized(col("embedding")).as("unit"))
    val dims = e.select(col("label"), posexplode(col("unit")).as(Seq("dim", "v")))
    dims.groupBy("label", "dim")
      .agg((sum(col("v").cast(DecimalType(38, 18))).cast("double") /
        count(lit(1))).as("c"))
      .groupBy("label")
      .agg(round(sqrt(sum((col("c") * col("c")).cast(DecimalType(38, 18)))
        .cast("double")), 4).as("centroid_norm"),
        count(lit(1)).as("dims"))
  }
}
