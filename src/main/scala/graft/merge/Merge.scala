package graft.merge

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A1/A2/S7 — the reference's core state-update semantic
  * (`config.py:180-212`): load a staging batch, take MIN(date_col) as the
  * cutoff, and rebuild the base table as
  * `base WHERE date < cutoff  UNION ALL  staging  ORDER BY date`.
  *
  * Every base row on/after the staging window start is REPLACED by the
  * staging contents — this is the reference's whole late/corrected-data
  * story (ST4): re-delivered rows in the overlap window win.
  *
  * Scale shape: the filter is a narrow map; the union is free (no
  * shuffle); the trailing sort is one range-partition exchange. With the
  * base table date-partitioned at rest, the cutoff filter becomes
  * partition pruning and the rewrite touches only overlap partitions.
  */
object Merge {

  /** A1 — scalar MIN cutoff (`config.py:180-187`). Single-row collect:
    * the aggregation is distributed (partial mins per partition); only
    * the one-row result reaches the driver. */
  def cutoff(staging: DataFrame, dateCol: String): Option[Any] =
    Option(staging.agg(min(col(dateCol))).first().get(0))

  /** A2 — cutoff filter + UNION ALL + order (`config.py:192-199`).
    * Empty staging (null cutoff) leaves the base unchanged — the
    * reference would interpolate a Python `None` into SQL there; we make
    * the no-op explicit instead. */
  def merge(base: DataFrame, staging: DataFrame, dateCol: String): DataFrame =
    cutoff(staging, dateCol) match {
      case Some(cut) =>
        base.filter(col(dateCol) < lit(cut))
          .unionByName(staging)
          .orderBy(col(dateCol).asc)
      case None => base
    }

  /** S7 — overwrite-own-input table rewrite. BigQuery's
    * `CREATE OR REPLACE TABLE old AS (… FROM old …)` reads and replaces
    * the same table in one statement; Spark cannot overwrite a path it is
    * reading, so: write to a sibling temp dir, then swap via filesystem
    * renames (rename is atomic on HDFS/local within one volume). The
    * displaced old data survives at `<path>.bak` until the next rewrite —
    * a cheap poor-man's version for rollback. */
  def overwriteAtomic(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(path)
    val tmp = new Path(path + ".tmp")
    val bak = new Path(path + ".bak")
    fs.delete(tmp, true)
    df.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(bak, true)
    if (fs.exists(target) && !fs.rename(target, bak))
      throw new java.io.IOException(s"could not displace $target")
    if (!fs.rename(tmp, target)) {
      fs.rename(bak, target) // roll back
      throw new java.io.IOException(s"could not publish $tmp to $target")
    }
  }

  /** The full update step (reference `update_table`, `config.py:201-212`):
    * read base, merge staging in, atomically rewrite base. */
  def updateTable(spark: SparkSession, basePath: String,
                  staging: DataFrame, dateCol: String): Unit = {
    val base = spark.read.parquet(basePath)
    // The write job scans basePath while writing the sibling tmp dir —
    // the input is only displaced by the rename AFTER the job completes,
    // so no checkpoint/self-overwrite hazard exists.
    overwriteAtomic(merge(base, staging, dateCol), basePath)
  }

  /** The 100 TB merge: base laid out partitioned by month
    * (`pmonth=yyyy-MM` directories) and the rewrite touches ONLY the
    * partitions on/after the cutoff month — everything older is not
    * read, not shuffled, and not rewritten.
    *
    * Mechanics: rows to publish = (base rows in overlap partitions
    * still below the exact cutoff) ∪ staging; written with
    * `partitionOverwriteMode=dynamic`, which replaces exactly the
    * partitions present in the written data and leaves all others'
    * files byte-identical (spec-asserted). The unpartitioned
    * [[updateTable]] rewrites the whole table per batch — correct, but
    * O(table); this variant is O(overlap), which is what makes a daily
    * merge into a years-deep 100 TB table feasible. Reading the
    * partitions being overwritten is safe: the source files are
    * replaced only at job commit.
    *
    * Semantics are IDENTICAL to [[merge]] (MergeSpec cross-checks the
    * resulting table): cutoff-month base rows below the exact cutoff
    * survive, everything on/after the cutoff is replaced by staging.
    *
    * Dynamic partition overwrite only replaces partitions PRESENT in the
    * written data — a base partition on/after the cutoff month where no
    * base row survives the exact cutoff AND staging delivers no rows
    * would silently keep its stale files (rows [[merge]] deletes). So
    * the overlap partition dirs are listed BEFORE the write (a pure
    * filesystem metadata call, O(#overlap months)) and any of them the
    * output months did not cover is deleted after the write commits.
    * Delete-after-commit keeps the crash contract: a failure mid-step
    * leaves at worst stale extra rows, and the merge is idempotent —
    * re-running it converges. */
  def updateTablePartitioned(spark: SparkSession, basePath: String,
                             staging: DataFrame, dateCol: String): Unit =
    cutoff(staging, dateCol) match {
      case Some(cut) =>
        val pmonth = date_format(col(dateCol), "yyyy-MM")
        val cutMonth = staging.sparkSession.range(1)
          .select(date_format(lit(cut), "yyyy-MM")).first().getString(0)
        val fs = new Path(basePath)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val overlapMonths = fs.listStatus(new Path(basePath)).toSeq
          .filter(_.isDirectory)
          .map(_.getPath.getName)
          .filter(_.startsWith("pmonth="))
          .map(_.stripPrefix("pmonth="))
          .filter(_ >= cutMonth)
        val base = spark.read.parquet(basePath)
        // the checkpoint materializes the surviving overlap rows BEFORE
        // the write starts: it is what keeps this off Spark's
        // "cannot overwrite a path being read from" hazard, and it is
        // bounded by the overlap window — O(overlap), never O(table).
        // Tracked + released: a streamed pipeline calls this per
        // micro-batch, and un-releasable Dataset.localCheckpoint blocks
        // would accumulate for the life of the stream.
        val (out, release) = graft.util.Checkpoints.checkpointTracked(
          base
            .filter(col("pmonth") >= cutMonth && col(dateCol) < lit(cut))
            .drop("pmonth")
            .unionByName(staging)
            .withColumn("pmonth", pmonth))
        try {
          val outMonths = out.select("pmonth").distinct()
            .collect().map(_.getString(0)).toSet
          // per-WRITE option, not the session conf: toggling the session
          // setting would race any concurrent partitioned overwrite on
          // the same SparkSession (and clobber a caller's own setting)
          out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("pmonth").parquet(basePath)
          overlapMonths.filterNot(outMonths).foreach { m =>
            fs.delete(new Path(basePath, s"pmonth=$m"), true)
          }
        } finally release()
      case None => ()
    }

  /** Small-file compaction for the month-partitioned base — the
    * maintenance pass a streamed-into table needs: per-batch merges
    * leave each overlap partition with one file generation per batch,
    * and at 100 TB a scan over millions of small files is dominated by
    * open/footer costs. For every partition holding more than
    * `maxFiles` parquet files, rewrite it to ⌈bytes/targetBytes⌉ files
    * (a coalesce — no shuffle; rows within the partition just
    * concatenate) and swap via rename. Returns the number of partitions
    * compacted. Idempotent: a partition already at its target file
    * count — `max(maxFiles, ⌈bytes/targetBytes⌉)` for partitions bigger
    * than maxFiles·targetBytes — is skipped on re-run, so large healthy
    * partitions are never re-rewritten.
    *
    * Crash contract: every run begins with [[recoverCompaction]], so a
    * kill at ANY point — including between the displace and publish
    * renames, where the partition is momentarily absent — is healed by
    * the next run (the original generation is restored from the
    * dot-prefixed backup). Temp/backup dirs are dot-prefixed, so
    * partition discovery never lists them and a crashed run never
    * double-counts rows.
    *
    * Reader contract (single-maintainer, like every rewrite here):
    * compaction of partition A never touches partition B — concurrent
    * reads of other partitions are safe (spec-asserted). A reader
    * listing THE partition being swapped can observe it briefly absent
    * (rename is atomic per path, but the swap is two renames); run
    * compaction from the pipeline's own maintenance slot — as
    * [[graft.streaming.StreamPipeline]] does, between batches — not
    * concurrently with readers of the same partition. */
  def compactPartitions(spark: SparkSession, basePath: String,
                        maxFiles: Int = 8,
                        targetBytes: Long = 128L << 20): Int = {
    val fs = new Path(basePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverCompaction(spark, basePath)
    val parts = fs.listStatus(new Path(basePath)).toSeq
      .filter(_.isDirectory)
      .filter(_.getPath.getName.startsWith("pmonth="))
    var compacted = 0
    parts.foreach { p =>
      val files = fs.listStatus(p.getPath).toSeq.filter(f =>
        f.isFile && f.getPath.getName.endsWith(".parquet"))
      val n = math.max(1,
        math.ceil(files.map(_.getLen).sum.toDouble / targetBytes).toInt)
      if (files.length > math.max(maxFiles, n)) {
        val month = p.getPath.getName.stripPrefix("pmonth=")
        val tmp = new Path(basePath, s".compact-tmp-$month")
        val bak = new Path(basePath, s".compact-bak-$month")
        fs.delete(tmp, true)
        // the write job reads the live partition while writing tmp; the
        // source is only displaced by the renames after it completes
        spark.read.parquet(p.getPath.toString).coalesce(n)
          .write.mode("overwrite").parquet(tmp.toString)
        fs.delete(bak, true)
        if (!fs.rename(p.getPath, bak))
          throw new java.io.IOException(s"could not displace ${p.getPath}")
        if (!fs.rename(tmp, p.getPath)) {
          fs.rename(bak, p.getPath) // roll back
          throw new java.io.IOException(s"could not publish $tmp")
        }
        fs.delete(bak, true)
        compacted += 1
      }
    }
    compacted
  }

  /** Heal a compaction interrupted by a crash. The swap sequence is
    * `write tmp → delete bak → rename(partition→bak) →
    * rename(tmp→partition) → delete bak`; each possible crash point
    * leaves a distinct, recognizable state:
    *
    *  - bak present, partition ABSENT — died between the two renames
    *    (the dangerous window: the month is invisible to readers and,
    *    unhealed, to every later merge). Restore the original
    *    generation: rename bak back to the live name.
    *  - bak present, partition present — died after publish, before the
    *    backup delete. The compacted generation is live; drop the bak.
    *  - tmp present (any time) — an incomplete or superseded write;
    *    delete it. When a bak was just restored this discards a fully
    *    written compacted generation, deliberately: the original data
    *    is the safe root, and the next run simply re-compacts.
    *
    * Invoked automatically as the first step of [[compactPartitions]];
    * public so a restarting pipeline can also heal without compacting. */
  def recoverCompaction(spark: SparkSession, basePath: String): Int = {
    val fs = new Path(basePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(new Path(basePath)).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
    var healed = 0
    entries.filter(_.startsWith(".compact-bak-")).foreach { name =>
      val month = name.stripPrefix(".compact-bak-")
      val live = new Path(basePath, s"pmonth=$month")
      if (!fs.exists(live)) {
        if (!fs.rename(new Path(basePath, name), live))
          throw new java.io.IOException(
            s"could not restore $name to $live")
        healed += 1
      } else {
        fs.delete(new Path(basePath, name), true)
      }
    }
    entries.filter(_.startsWith(".compact-tmp-")).foreach { name =>
      fs.delete(new Path(basePath, name), true)
    }
    healed
  }

  /** Initial load for the partitioned layout. */
  def writePartitioned(df: DataFrame, basePath: String, dateCol: String): Unit =
    df.withColumn("pmonth", date_format(col(dateCol), "yyyy-MM"))
      .write.mode("overwrite").partitionBy("pmonth").parquet(basePath)

  /** S5 retry path — merge from the PERSISTED staging table. The
    * reference truncate-loads `table_new` and keeps it queryable
    * (`config.py:161-171`, `settings.yaml:20`); a merge failure leaves
    * staging committed so the merge alone can be re-run
    * (`main.py:50-62`: load failure dead-letters, merge failure only
    * logs). This is that retry: no re-clean, no re-upload — just re-read
    * `table_new` and redo the cutoff merge (idempotent, MergeSpec
    * property). */
  def updateFromStaging(spark: SparkSession, basePath: String,
                        stagingPath: String, dateCol: String): Unit =
    updateTable(spark, basePath, spark.read.parquet(stagingPath), dateCol)

  /** [[updateFromStaging]] against a month-partitioned base — the same
    * retryable/idempotent contract, O(overlap) per attempt. */
  def updateFromStagingPartitioned(spark: SparkSession, basePath: String,
                                   stagingPath: String, dateCol: String): Unit =
    updateTablePartitioned(spark, basePath,
      spark.read.parquet(stagingPath), dateCol)
}
