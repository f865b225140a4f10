package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.ext.TextOps
import graft.merge.Merge

/** Streaming ingest for the curation family — documents arrive as files
  * (the at-least-once reality of every corpus drop), get gated and
  * scrubbed IN the stream (the same map-only expressions as the batch
  * pipeline — narrow projections run identically under Structured
  * Streaming), and are merged per micro-batch into a deduplicated
  * curated store.
  *
  * The dedup CANNOT be a stream-local operator: the batch semantics
  * keep the min-doc_id representative per key across the WHOLE corpus,
  * while any within-stream dedup is first-seen-wins and depends on
  * arrival order. So the store merge recomputes min per key over
  * (store ∪ batch) in `foreachBatch` — min is commutative/associative,
  * which gives the convergence contract CurationStreamSpec proves:
  * whatever the file slicing, arrival order, or redelivery, the final
  * store equals the batch pipeline's dedup output exactly.
  *
  * Scale shape: each merge is O(store ∪ batch) here (atomic sibling-dir
  * rewrite, same publish mechanics as [[graft.merge.Merge]]); at 100 TB
  * the store lives partitioned/bucketed BY KEY so the merge touches
  * only the key partitions the batch delivers — the
  * `updateTablePartitioned` pattern with the dedup key in place of the
  * month. Checkpointed source offsets + an idempotent, order-independent
  * merge ⇒ effectively-once, the same contract as the reference
  * pipeline's merge stage.
  */
object CurationStream {

  /** One micro-batch into the store: union, re-pick each key's min
    * doc_id, atomically republish. Idempotent (re-delivered rows change
    * nothing) and order-independent (min over any batching converges to
    * the corpus-wide min). */
  def mergeCuratedBatch(spark: SparkSession, batch: DataFrame,
                        storePath: String): Unit = {
    val fs = new Path(storePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val unioned =
      if (fs.exists(new Path(storePath)))
        spark.read.parquet(storePath).unionByName(batch)
      else batch
    // distinct() first: a redelivered row is byte-identical to its
    // store copy (scrub is deterministic), and dedupScrubbed's
    // survivor-join assumes unique doc_ids — without this, redelivery
    // would duplicate every surviving row. localCheckpoint cuts the
    // self-read lineage before the overwrite (same hazard note as
    // Merge.updateTablePartitioned).
    Merge.overwriteAtomic(
      TextOps.dedupScrubbed(unioned.distinct().localCheckpoint()),
      storePath)
  }

  /** Number of hash buckets for the partitioned store layout. At 100 TB
    * this is sized so one bucket ≈ a few GB (e.g. 2¹⁴ buckets); 64 keeps
    * the test corpus honest (every batch touches a strict subset). */
  val storeBuckets = 64

  private def bucketOf = org.apache.spark.sql.functions.pmod(
    org.apache.spark.sql.functions.xxhash64(
      org.apache.spark.sql.functions.substring(
        org.apache.spark.sql.functions.col("scrubbed"), 1, 40)),
    org.apache.spark.sql.functions.lit(storeBuckets.toLong))

  /** The O(delivered-buckets) merge — [[mergeCuratedBatch]]'s 100 TB
    * form, the `updateTablePartitioned` pattern with the dedup key's
    * hash bucket as the partition: the store lives as
    * `bucket=<pmod(xxhash64(key40), N)>` partitions, a batch's rows
    * hash to a set of buckets, and the merge reads, re-deduplicates,
    * and dynamically overwrites ONLY those partitions — every other
    * bucket's files stay byte-identical (spec-asserted). Work per batch
    * is O(batch + touched buckets), independent of store size. Same
    * convergence contract: min per key over store∪batch, idempotent
    * under redelivery, order-independent. */
  def mergeCuratedBatchPartitioned(spark: SparkSession, batch: DataFrame,
                                   storePath: String): Unit = {
    import org.apache.spark.sql.functions._
    val fs = new Path(storePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val withBucket = batch.withColumn("bucket", bucketOf)
    val touched = withBucket.select("bucket").distinct()
      .collect().map(_.getLong(0)).toSet // bounded by storeBuckets
    if (touched.isEmpty) return // fully-gated batch: nothing to merge
    val existing =
      if (fs.exists(new Path(storePath)))
        Some(spark.read.parquet(storePath)
          .filter(col("bucket").isInCollection(touched)))
      else None
    val unioned = existing.fold(withBucket)(withBucket.unionByName(_))
    val merged = TextOps.dedupScrubbed(
        unioned.drop("bucket").distinct().localCheckpoint())
      .withColumn("bucket", bucketOf)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try merged.write.mode("overwrite").partitionBy("bucket")
      .parquet(storePath)
    finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None =>
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Wire the stream: files under `uploadDir` (same schema as the
    * documents table) → gate+scrub → per-batch dedup merge. */
  def runCurationStream(spark: SparkSession, uploadDir: String,
                        storePath: String, checkpointDir: String,
                        schema: StructType,
                        partitionedStore: Boolean = false): StreamingQuery = {
    val docs = spark.readStream.schema(schema).parquet(uploadDir)
    TextOps.gateAndScrub(docs).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (partitionedStore)
          mergeCuratedBatchPartitioned(spark, batch, storePath)
        else mergeCuratedBatch(spark, batch, storePath)
      }
      .start()
  }
}
