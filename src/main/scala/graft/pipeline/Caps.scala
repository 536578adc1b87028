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

  private val nameCounter = new AtomicLong(0)

  /** Most recent engaged-cap observations, newest last:
    * (metric name, dropped buckets, dropped rows, largest bucket).
    * Bounded ring for tests/diagnostics; the log line is the real
    * reporting channel. */
  private[graft] val recentDrops =
    new ConcurrentLinkedQueue[(String, Long, Long, Long)]()

  private val registered = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Drop groups of `keys` larger than `maxBucket` from `banded`,
    * keeping its column set. One cheap aggregate on the (already
    * narrow) banded relation, then an ANTI-join of `banded` against the
    * oversized groups — the anti side is the handful of hot buckets
    * (broadcastable at any corpus size), not the near-total kept set.
    * The dropped-bucket counters are collected on that same aggregate
    * pass. The anti shape also keeps the `CollectMetrics` node alive
    * exactly when it matters: with drops engaged the oversized relation
    * is non-empty so AQE's empty-relation propagation cannot prune the
    * observation out of the final plan (it may prune it in the
    * no-drops case, where the counters are all zero and nothing would
    * be logged anyway). */
  def cap(banded: DataFrame, keys: Seq[String], maxBucket: Int,
      what: String): DataFrame =
    if (maxBucket == Int.MaxValue) banded
    else {
      require(maxBucket > 0, s"maxBucket ($maxBucket) must be positive")
      registerListener(banded.sparkSession)
      val name = s"graft_cap_${what}_${nameCounter.incrementAndGet()}"
      val oversized = banded.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("_bsz"))
        .observe(name,
          coalesce(sum(when(col("_bsz") > maxBucket, 1L).otherwise(0L)),
            lit(0L)).as("dropped_buckets"),
          coalesce(sum(when(col("_bsz") > maxBucket, col("_bsz"))
            .otherwise(0L)), lit(0L)).as("dropped_rows"),
          coalesce(max(col("_bsz")), lit(0L)).as("max_bucket"))
        .filter(col("_bsz") > maxBucket)
        .select(keys.map(col): _*)
      banded.join(broadcast(oversized), keys, "left_anti")
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
