package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive fix for unsplittable inputs (optimization guide §2.5
  * "input skew: one huge unsplittable file … repartition immediately
  * after the read", §6) — the r21 `EntryShared.spread` primitive,
  * hoisted into the pipeline layer (r22) so kernel-heavy pipeline
  * internals (e.g. [[Similarity.annRecall]]'s shared corpus cache) can
  * use it without the entry layer: when the physical scan yields fewer
  * splits than half the session parallelism, one explicit
  * hash-of-unique-id exchange right above the read lets the narrow
  * per-row work above it use the whole cluster. At real scale a table
  * scan yields thousands of splits and this is a no-op — it is "the
  * input cannot feed the cluster" detection, not a local-mode constant.
  *
  * HASH partitioning on the table's unique id, not round-robin:
  * round-robin pays a map-side sort of the full rows
  * (spark.sql.execution.sortBeforeRepartition, needed for its retry
  * determinism), while hash-of-id is retry-deterministic by
  * construction and sorts nothing (guide §2.5's "derive the synthetic
  * key deterministically" rule). Unique ids hash uniformly, so no
  * partition skew. Explicit numPartitions (`REPARTITION_BY_NUM`) so
  * AQE cannot coalesce the tiny exchange back to one partition. */
private[graft] object Spread {
  def spread(df: DataFrame, key: Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.queryExecution.toRdd.getNumPartitions * 2 <= target)
      df.repartition(target, key)
    else df
  }
}
