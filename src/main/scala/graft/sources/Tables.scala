package graft.sources

import org.apache.spark.sql.DataFrame

/** Storage layout for the 100 TB path: persist the event relation
  * BUCKETED (and sorted) by the index pkey [host, service], so every
  * downstream pkey-partitioned operator — index snapshot, coalesce,
  * per-key windows, deps marks — consumes the files' bucket
  * partitioning instead of paying a hash exchange per query. The
  * reference's index IS a hash table on the pkey
  * (src/riemann/index.clj:58-61); bucketing is the storage-level
  * reading of the same idea, amortizing the one shuffle into the
  * write. BucketingSpec asserts the snapshot plan over a bucketed
  * table contains no Exchange. */
object Tables {

  /** Write `df` as a bucketed external parquet table. `buckets` should
    * track the downstream parallelism (at cluster scale: a small
    * multiple of total executor cores; bucket count is fixed at write
    * time, so size it for the biggest consumer). */
  def writeBucketed(df: DataFrame, name: String, path: String,
      keys: Seq[String], buckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, keys.head, keys.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
     else w).format("parquet").saveAsTable(name)
  }
}
