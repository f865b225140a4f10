package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.slf4j.LoggerFactory
import graft.clean.Clean
import graft.config.PipelineConf
import graft.merge.Merge
import graft.schema.SchemaLoader.FieldSpec

/** The reference's event-driven pipeline (`main.py:18-63`) as one
  * Structured Streaming program:
  *
  *  ST1  file-arrival trigger: `readStream` on the upload dir with
  *       `Trigger.AvailableNow` + maxFilesPerTrigger=1 — one micro-batch
  *       per uploaded file, mirroring one Cloud-Function invocation per
  *       GCS Finalize event
  *  ST2  the second stage (load→merge→views) runs in the same
  *       foreachBatch — the Pub/Sub hop becomes an in-job dataflow edge
  *  ST3  effectively-once table update: checkpointed source offsets +
  *       idempotent cutoff merge (re-running a batch reproduces the same
  *       base table)
  *  ST4  late/overlapping data: staging rows win the overlap window
  *       (Merge semantics)
  *  ST5  failure path: any batch error, or a batch whose rows ALL fail
  *       cleaning, dead-letters the raw file(s) into errorDir (`S8`,
  *       reference `config.py:223-234`)
  *  ST6  post-update notification: one message file per processed batch
  *       in notifyDir, base64-encoded payload (`S9`/`S10` analog — a
  *       downstream `readStream` on notifyDir is the second trigger)
  *  ST7  stage-transition logging via slf4j
  *
  * Scale: each micro-batch is the same narrow clean + merge dataflow as
  * batch mode; state lives in the base table + checkpoint dir only.
  */
object StreamPipeline {

  private val log = LoggerFactory.getLogger(getClass)

  /** stagingPath = the persisted `table_new` analog (S5, truncate-loaded
    * every batch, queryable between batches, merge-retry source);
    * cleanedDir = the cleaned-output bucket analog (S4, one durable
    * cleaned CSV artifact per data type). Both default to siblings of
    * basePath, mirroring the reference's `<type>_update` staging-table
    * naming (`settings.yaml:20`) and second-bucket cleaned file
    * (`config.py:146`). */
  final case class StreamDirs(
      uploadDir: String,
      basePath: String,
      errorDir: String,
      notifyDir: String,
      checkpointDir: String,
      stagingPath: String = "",
      cleanedDir: String = "",
      partitionedBase: Boolean = false,
      /** When > 0 (requires partitionedBase): run
        * [[graft.merge.Merge.compactPartitions]] after every Nth
        * successfully merged batch — per-batch dynamic overwrites
        * fragment the overlap partitions, and the pipeline maintains
        * itself instead of leaning on an external maintenance job. A
        * compaction failure only logs: the data is correct either way,
        * and the next trigger retries. */
      compactEveryBatches: Int = 0) {
    def stagingOrDefault: String =
      if (stagingPath.nonEmpty) stagingPath else basePath + "_update"
    def cleanedOrDefault: String =
      if (cleanedDir.nonEmpty) cleanedDir else basePath + "_cleaned"
  }

  /** S10 — decode a notify-message DataFrame (column `payload` base64). */
  def decodeMessage(df: DataFrame): DataFrame =
    df.withColumn("payload", unbase64(col("payload")).cast("string"))

  def deadLetter(spark: SparkSession, files: Seq[String], errorDir: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val err = new Path(errorDir)
    val fs = err.getFileSystem(conf)
    fs.mkdirs(err)
    files.foreach { f =>
      val src = new Path(f)
      log.warn(s"dead-lettering $src -> $errorDir")
      fs.rename(src, new Path(err, src.getName))
    }
  }

  private def notify(spark: SparkSession, notifyDir: String,
                     batchId: Long, name: String): Unit = {
    val dir = new Path(notifyDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    val payload = java.util.Base64.getEncoder
      .encodeToString(name.getBytes("UTF-8"))
    val out = fs.create(new Path(dir, s"batch-$batchId.msg"), true)
    out.write(s"""{"payload":"$payload"}""".getBytes("UTF-8"))
    out.close()
  }

  /** ST6/S10 — the DECOUPLED second stage: a `readStream` on notifyDir,
    * the Pub/Sub-subscription analog. The reference's second Cloud
    * Function is triggered BY the message alone (`main.py:47-48`,
    * `config.py:55-57`), not by sharing a process with the loader — this
    * is that hop: each notify file becomes a micro-batch row, the base64
    * payload is decoded to the data-type name, and `onMessage(name)`
    * runs the downstream step (view refresh, in the reference). The
    * checkpoint makes message consumption effectively-once across
    * restarts, like a Pub/Sub ack.
    *
    * Scale: message files are tiny and per-batch; the stream's state is
    * the checkpointed file offsets only. The downstream work runs as
    * ordinary batch jobs inside foreachBatch. */
  def runNotifyStage(spark: SparkSession, notifyDir: String,
                     checkpointDir: String)(onMessage: String => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = StructType(Seq(StructField("payload", StringType, true)))
    val msgs = spark.readStream.schema(schema).json(notifyDir)
    msgs.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        decodeMessage(batch).select("payload")
          .collect().map(_.getString(0)).foreach { name =>
            log.info(s"notify stage: batch $batchId message '$name'")
            onMessage(name)
          }
      }
      .start()
  }

  /** Wire the full pipeline; returns the started query (caller awaits).
    * Processes everything currently in uploadDir, then stops
    * (Trigger.AvailableNow); restart with the same checkpoint to pick up
    * only new files. */
  def run(spark: SparkSession, fields: Seq[FieldSpec], conf: PipelineConf,
          dirs: StreamDirs): org.apache.spark.sql.streaming.StreamingQuery = {
    val stringSchema = StructType(
      fields.map(f => StructField(f.name, StringType, nullable = true)))
    val raw = spark.readStream
      .option("header", true)
      .option("maxFilesPerTrigger", 1) // one batch per uploaded file
      .schema(stringSchema)
      .csv(dirs.uploadDir)
      .withColumn("__src", col("_metadata.file_path"))

    raw.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", dirs.checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val files = batch.select("__src").distinct()
          .collect().map(_.getString(0)).toSeq
        log.info(s"[${conf.name}] batch $batchId: ${files.size} file(s)")
        try {
          val cleaned = Clean.clean(fields, conf)(batch.drop("__src"))
            .localCheckpoint() // sever lineage from files we may move
          val kept = cleaned.count()
          if (kept == 0 && files.nonEmpty) {
            // every row failed cleaning — treat as a poisoned file
            log.warn(s"[${conf.name}] batch $batchId cleaned to 0 rows")
            deadLetter(spark, files, dirs.errorDir)
          } else {
            // S4: durable cleaned artifact (reference writes the cleaned
            // file to a second bucket, config.py:146) — inspectable
            // between stages, overwritten per batch like the reference's
            // fixed per-type uri2.
            cleaned.write.mode("overwrite").option("header", true)
              .csv(s"${dirs.cleanedOrDefault}/${conf.name}")
            // S5: truncate-load the staging table (WRITE_TRUNCATE,
            // config.py:161-171). table_new survives the batch and is
            // queryable; the merge below consumes the PERSISTED artifact.
            Merge.overwriteAtomic(cleaned, dirs.stagingOrDefault)
            log.info(s"[${conf.name}] batch $batchId staged $kept rows " +
              s"at ${dirs.stagingOrDefault}")
            // Reference semantics (main.py:50-62): a load failure
            // dead-letters, but a MERGE failure only logs — staging is
            // committed, so the merge alone is retryable
            // (Merge.updateFromStaging).
            try {
              // partitionedBase routes through the O(overlap) dynamic-
              // partition-overwrite merge — the 100 TB base-table layout
              if (dirs.partitionedBase)
                Merge.updateFromStagingPartitioned(
                  spark, dirs.basePath, dirs.stagingOrDefault, conf.dateCol)
              else Merge.updateFromStaging(
                spark, dirs.basePath, dirs.stagingOrDefault, conf.dateCol)
              log.info(s"[${conf.name}] batch $batchId merged $kept rows")
              if (dirs.partitionedBase && dirs.compactEveryBatches > 0 &&
                  (batchId + 1) % dirs.compactEveryBatches == 0)
                try {
                  val n = Merge.compactPartitions(spark, dirs.basePath)
                  log.info(s"[${conf.name}] batch $batchId compacted $n partition(s)")
                } catch {
                  case e: Throwable =>
                    log.warn(s"[${conf.name}] compaction failed " +
                      s"(data unaffected, retried next trigger): ${e.getMessage}")
                }
              notify(spark, dirs.notifyDir, batchId, conf.name)
            } catch {
              case e: Throwable =>
                log.warn(s"[${conf.name}] batch $batchId merge failed " +
                  s"(staging persisted, retryable): ${e.getMessage}")
            }
          }
        } catch {
          case e: Throwable =>
            log.warn(s"[${conf.name}] batch $batchId failed: ${e.getMessage}")
            deadLetter(spark, files, dirs.errorDir)
        }
      }
      .start()
  }
}
