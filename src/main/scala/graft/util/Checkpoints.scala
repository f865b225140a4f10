package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graftshim.InternalRowDF
import org.apache.spark.storage.StorageLevel

/** Eager, serialized, RELEASABLE checkpointing.
  *
  * `Dataset.localCheckpoint()` has no working release: the blocks it
  * caches live outside the CacheManager, so `Dataset.unpersist()` is a
  * no-op on them and a long-running process that checkpoints per unit
  * of work (a streamed merge per micro-batch) accumulates dead
  * generations until the context dies — the exact pathology the bench
  * sweep measured in round 4. This utility checkpoints at the RDD
  * layer (copy → persist MEMORY_AND_DISK_SER → localCheckpoint →
  * materialize) and hands back a `release` thunk that unpersists
  * exactly those blocks — safe under concurrent queries, unlike a
  * global transient-block sweep.
  *
  * Eager by construction (one cheap count over the caching pass): the
  * data is fully materialized before the caller's next step, which is
  * what makes read-then-overwrite-the-same-path sequences safe. */
object Checkpoints {

  /** The one definition of the round-4 caching recipe (copy because
    * the scan iterator reuses its UnsafeRow buffer; serialized so the
    * GC skips the blocks; localCheckpoint to truncate lineage). Lazy —
    * the caller's first action materializes it. Shared with
    * [[graft.operators.PrefixSum]]. */
  private[graft] def checkpointInternalRdd(
      df: DataFrame): org.apache.spark.rdd.RDD[
        org.apache.spark.sql.catalyst.InternalRow] =
    InternalRowDF.toInternalRdd(df)
      .mapPartitions(it => it.map(_.copy()), preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
      .localCheckpoint()

  def checkpointTracked(df: DataFrame): (DataFrame, () => Unit) = {
    val spark = df.sparkSession
    val rdd = checkpointInternalRdd(df)
    rdd.count() // materialize NOW (checkpoint happens on first action)
    (InternalRowDF.fromInternalRdd(spark, rdd, df.schema),
      () => rdd.unpersist(blocking = false))
  }
}
