package graft.pipeline

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Hot-bucket caps shared by every LSH-style blocking stage
  * (MinHash bands, SimHash pigeonhole blocks, hyperplane buckets).
  *
  * At 100 TB a boilerplate-heavy corpus puts millions of documents in
  * one (band, bucket) group; the within-bucket self-join then goes
  * quadratic on exactly that group. The cap drops over-full buckets
  * WHOLE before the join — recall on pathological near-dup blobs is
  * traded for a hard bound on join fan-out. Since round 8 the cap is
  * ON BY DEFAULT ([[DefaultMaxBucket]]); `maxBucket = Int.MaxValue` is
  * the explicit keep-everything opt-out.
  *
  * "No silent caps": every engaged cap is observed via a
  * `CollectMetrics` node (zero extra jobs — the counters ride the same
  * pass that sizes the buckets) and logged through a per-session
  * [[QueryExecutionListener]], so a run that dropped buckets says so
  * in the driver log with bucket/row counts.
  */
object Caps {

  /** Default hot-bucket cap for the LSH family. 1,000 members is ~5e5
    * candidate pairs per bucket — large enough that genuine near-dup
    * clusters (tens of members) are never touched, small enough that
    * one boilerplate bucket cannot dominate a stage. */
  val DefaultMaxBucket = 1000

  /** Per-member hash-payload bound for pair-family GROUP synthesis
    * (r17): inside a (band, bucket) aggregation row each member
    * carries at most this many sorted 60-bit shingle hashes — 8 KB —
    * so a group's payload is ≤ maxBucket · (cap·8 B + cells) ≈ 8 MB
    * no matter how long its documents are (a book-length doc has
    * ~10⁵ distinct shingles ≈ 800 KB; × 1000 members that is a
    * heap-killing 800 MB row without the bound). Pairs whose
    * truncated prefixes cannot prove membership either way are
    * re-verified against the full sets via a narrow join — exactness
    * is never traded, only the in-group fast path. */
  val DefaultMaxInlineHashes = 1024

  private val nameCounter = new AtomicLong(0)

  /** Most recent engaged-cap observations, newest last:
    * (metric name, dropped buckets, dropped rows, largest bucket).
    * Bounded ring for tests/diagnostics; the log line is the real
    * reporting channel. */
  private[graft] val recentDrops =
    new ConcurrentLinkedQueue[(String, Long, Long, Long)]()

  // weak keys: a stopped-and-dropped session must not be pinned forever
  // in a long-running driver that cycles sessions; synchronized because
  // WeakHashMap is not thread-safe
  private val registered = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Drop groups of `keys` larger than `maxBucket` from `banded`,
    * keeping its column set: annotate every row with its bucket size via
    * `count(*) OVER (PARTITION BY keys)`, then filter.
    *
    * The window's required hash partitioning on `keys` is exactly the
    * distribution the downstream within-bucket self-join needs, so the
    * (expensive — the minhash/simhash kernels live upstream) banded
    * relation is shuffled ONCE and the kernels run ONCE; the cap costs
    * one cheap count-window plus a sort that the self-join's SMJ wanted
    * anyway, riding the join's own exchange. (The r8 shape — a sizing
    * aggregate plus a forced-broadcast ANTI join against the oversized
    * bucket keys — recomputed the whole upstream for the aggregate's
    * separate exchange, and broadcast a relation whose size is bounded
    * only by totalRows/maxBucket: a driver OOM at 100 TB. Measured on
    * the r8 bench, that second pass roughly doubled the LSH family.)
    * An over-full bucket's rows do co-locate in one window group before
    * being dropped — linear, spill-backed buffering in `WindowExec`,
    * never the quadratic join fan-out the cap exists to prevent.
    *
    * The dropped-bucket counters ride the same pass via `observe`,
    * placed between the window and the cap filter so they see every
    * row. Buckets are recovered from per-row sizes as Σ 1/size per
    * dropped row (each dropped bucket contributes exactly 1.0), rounded
    * — exact for any bucket size a double can count. */
  def cap(banded: DataFrame, keys: Seq[String], maxBucket: Int,
      what: String): DataFrame =
    if (maxBucket == Int.MaxValue) banded
    else {
      require(maxBucket > 0, s"maxBucket ($maxBucket) must be positive")
      registerListener(banded.sparkSession)
      val name = s"graft_cap_${what}_${nameCounter.incrementAndGet()}"
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keys.map(col): _*)
      banded.withColumn("_bsz", count(lit(1)).over(w))
        .observe(name,
          coalesce(round(sum(when(col("_bsz") > maxBucket,
            lit(1.0) / col("_bsz")).otherwise(lit(0.0)))), lit(0.0))
            .cast("long").as("dropped_buckets"),
          coalesce(sum(when(col("_bsz") > maxBucket, 1L).otherwise(0L)),
            lit(0L)).as("dropped_rows"),
          coalesce(max(col("_bsz")), lit(0L)).as("max_bucket"))
        .filter(col("_bsz") <= maxBucket)
        .drop("_bsz")
    }

  private def registerListener(spark: SparkSession): Unit =
    if (registered.add(spark)) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith("graft_cap_")) {
              val buckets = row.getAs[Long]("dropped_buckets")
              if (buckets > 0) {
                val rows = row.getAs[Long]("dropped_rows")
                val maxB = row.getAs[Long]("max_bucket")
                recentDrops.add((name, buckets, rows, maxB))
                while (recentDrops.size > 64) recentDrops.poll()
                log.warn(s"$name: hot-bucket cap dropped $buckets " +
                  s"bucket(s) covering $rows row(s); largest bucket had " +
                  s"$maxB members. Pass maxBucket = Int.MaxValue to keep " +
                  "everything.")
              }
            }
          }
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = ()
      })
    }
}
