package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MONOID STORE COMPACTION — the maintenance pass every
  * per-batch-delta store ([[MonoidStore]]: [[HeavyHittersStore]],
  * [[SkewStore]], [[HistogramStore]], [[Bm25Store]], [[ProfileStore]])
  * needs at scale: after thousands of micro-batches the store is
  * thousands of tiny `batch=<id>` dirs, and every view pays the full
  * listing + small-file scan. Compaction folds all deltas with id ≤
  * `upto` into ONE base delta (`batch=-1`) — valid because the
  * stores' merge IS a monoid fold (associative): folding a pre-folded
  * base with newer deltas equals folding the originals, so every view
  * is unchanged (spec-proven). [[compactWith]] takes the store's own
  * fold, so non-sum monoids compose too: ProfileStore's min/max
  * lattice bounds and its bottom-k KMV sketch compact with the exact
  * reduce their views use — a plain column sum would have corrupted
  * both (the round-11 Scaladoc overclaimed this; now the fold is the
  * caller's).
  *
  * SAFETY CONTRACT (why `upto` exists): per-batch-dir overwrite is
  * what makes REDELIVERY idempotent — a replayed batch rewrites its
  * own dir. A compacted batch's dir is gone, so a replay of it would
  * double-add. Structured Streaming's checkpoint guarantees committed
  * batch ids are never redelivered, so the caller passes the last
  * COMMITTED id as `upto` and compaction is exactly as safe as the
  * checkpoint — the same recovery contract as
  * [[graft.merge.Merge.compactPartitions]] on the base table.
  *
  * Crash safety (the [[graft.merge.Merge.compactPartitions]]
  * recovery posture): the merged base is written to a DOT-prefixed
  * temp dir (invisible to partition discovery) together with an
  * `_ABSORBED` manifest naming every delta dir it folded; only then
  * are the absorbed dirs deleted and the temp renamed to `batch=-1`.
  * A crash at ANY point is converged by [[recover]] (run
  * automatically at the start of the next [[compact]]): if a temp
  * with a manifest exists, delete whatever absorbed dirs remain and
  * install the temp — the merged data was durable before the first
  * delete, so nothing is ever lost and re-running is idempotent.
  * Like the base-table compaction, the pass is maintenance — not
  * concurrent with readers of the same store. */
object StoreCompaction {

  val baseBatchId: Long = -1L
  private[streaming] val manifestName = "_ABSORBED"

  private def listTmp(fs: org.apache.hadoop.fs.FileSystem,
                      root: Path): Seq[Path] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith(".compact-tmp-")).toSeq

  /** Converge a crashed compaction: finish deleting the absorbed
    * dirs named in the temp's manifest, then install the temp as the
    * base. No-op when no temp exists. */
  def recover(spark: SparkSession, storePath: String): Unit = {
    val root = new Path(storePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    listTmp(fs, root).foreach { tmp =>
      val mf = new Path(tmp, manifestName)
      if (!fs.exists(mf)) fs.delete(tmp, true) // died mid-write: discard
      else {
        val in = fs.open(mf)
        val absorbed = scala.io.Source.fromInputStream(in).getLines().toList
        in.close()
        absorbed.map(new Path(root, _)).filter(fs.exists)
          .foreach(fs.delete(_, true))
        // the manifest travels INTO the installed base (underscore
        // files are invisible to parquet readers): deleting it before
        // the rename would open a window where a crash loses both the
        // manifest and the absorbed dirs
        fs.rename(tmp, new Path(root, s"batch=$baseBatchId"))
      }
    }
  }

  /** Fold every `batch=<id>` delta with id ≤ `upto` (including a
    * previous base) into `batch=-1`, summing `sumCols` grouped by the
    * remaining columns. Returns the number of delta dirs absorbed. */
  def compact(spark: SparkSession, storePath: String,
              sumCols: Seq[String], upto: Long): Int =
    compactWith(spark, storePath, MonoidStore.aggReduce(sumCols), upto)

  /** The general form: fold eligible deltas with the store's OWN
    * monoid (`reduce` must preserve column names/order — true of
    * every [[MonoidStore]] reduce, whose views it also serves). */
  def compactWith(spark: SparkSession, storePath: String,
                  reduce: DataFrame => DataFrame, upto: Long): Int = {
    recover(spark, storePath)
    val root = new Path(storePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    val dirs = fs.listStatus(root).map(_.getPath)
      .filter(p => p.getName.startsWith("batch="))
      .filter { p =>
        val id = p.getName.stripPrefix("batch=").toLong
        id == baseBatchId || id <= upto
      }
    if (dirs.length <= 1) return 0 // nothing to fold
    val delta = spark.read.parquet(dirs.map(_.toString): _*)
    val merged = reduce(delta)
      .select(delta.columns.map(col): _*) // original column order
      .coalesce(1)
    val tmp = new Path(root, s".compact-tmp-$upto")
    merged.write.mode("overwrite").parquet(tmp.toString)
    // durable manifest BEFORE any delete — recovery replays from it
    val out = fs.create(new Path(tmp, manifestName), true)
    out.write(dirs.map(_.getName).mkString("\n").getBytes("UTF-8"))
    out.close()
    dirs.foreach(fs.delete(_, true))
    fs.rename(tmp, new Path(root, s"batch=$baseBatchId"))
    dirs.length
  }
}
