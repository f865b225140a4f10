package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType
import graft.operators.{DiffInDiff, MarkovEval}

/** Incrementally-maintained MARKOV NEXT-EVENT EVAL — the streaming
  * twin of [[MarkovEval]] (round-13 verdict ask #2): the transition
  * counts are a |types|²-bounded per-key SUM monoid, but unlike every
  * other sum in the suite the KEY is a PAIR of adjacent events, and a
  * user's adjacency can straddle a batch boundary. The store therefore
  * keeps two tables:
  *
  *  - `counts/`: each batch's INTERNAL (is_train, from_type, to_type)
  *    pair counts — the plain [[MonoidStore]] sum-delta layout;
  *  - `segments/`: one BOUNDARY row per (user, batch) — the first and
  *    last (ts, event_id, event_type) of the user's slice — so the
  *    cross-batch transitions (prev slice's last event → this slice's
  *    first event) are re-derived at read time by ordering each user's
  *    segments and lagging the last-event type. A replayed batch
  *    rewrites BOTH of its own dirs (each a deterministic function of
  *    the batch alone), so replay stays idempotent; [[MonoidStore]]
  *    compaction is a pure union fold for segments (reduce = identity)
  *    and the usual sum fold for counts — both inert to every view.
  *
  * ORDER CONTRACT (stated, not hidden): the stitched view equals the
  * batch [[MarkovEval.markovEval]] when batches partition each user's
  * event stream into time-contiguous slices — the file-stream
  * arrival-order case. Sum columns tolerate arbitrary slicing;
  * ADJACENCY inherently cannot (an out-of-order event changes pairs
  * already counted), which is the same watermark assumption every
  * streaming sessionizer states.
  *
  * SCALE. Per batch: one per-user agg (boundaries) + one lag window
  * over the batch's own rows (map-side after the user repartition);
  * state = |types|² counts + one boundary row per (user, batch-with-
  * activity). The segment table grows with cadence × active users —
  * bounded per batch, but unbounded over a long-running stream's
  * LIFETIME, which is why [[foldSegments]] exists: it migrates the
  * stitch pairs of adjacent COMMITTED segments into a persisted
  * |types|²-bounded count table and collapses each user's folded
  * segments to ONE row, so segment state is one row per user plus one
  * per user per UNfolded batch — bounded by the fold cadence, not the
  * stream's lifetime. The fold is this store's own compaction (plain
  * union compaction would shrink nothing — reduce is identity — and,
  * worse, would silently ORPHAN a previously folded stitch table, so
  * the raw [[MonoidStore.compact]] path refuses loudly and
  * [[runMarkovStream]] cadences the fold instead). */
object MarkovStore {

  def countsStore(storePath: String): MonoidStore =
    MonoidStore.sums(s"$storePath/counts", "n")

  /** Boundary rows fold by plain union: each (user, batch) row is
    * distinct state, not a mergeable value. `compactable = false`
    * (the PrivacyLedger refusal posture): a plain union compaction of
    * a base installed by [[foldSegments]] would delete the base dir —
    * and the folded stitch table nested inside it — without carrying
    * the stitch counts into the new base, silently losing every
    * already-folded cross-batch transition. [[foldSegments]] IS this
    * table's compaction. */
  def segmentsStore(storePath: String): MonoidStore =
    new MonoidStore(s"$storePath/segments", df => df, compactable = false)

  /** One batch's internal pair counts — [[MarkovEval.transitionCounts]]
    * over the batch's own rows. */
  def countsDelta(batch: DataFrame): DataFrame =
    MarkovEval.transitionCounts(batch)

  /** One batch's per-user boundary rows: the (ts, event_id, type) of
    * the slice's first and last event, via the struct lattice (struct
    * comparison is (ts, event_id)-lexicographic — event_id breaks ts
    * ties exactly like the batch operator's lag window). */
  def segmentsDelta(batch: DataFrame): DataFrame =
    batch.groupBy("user_id").agg(
      min(struct(col("ts"), col("event_id"), col("event_type"))).as("f"),
      max(struct(col("ts"), col("event_id"), col("event_type"))).as("l"))
      .select(col("user_id"),
        col("f.ts").as("f_ts"), col("f.event_id").as("f_eid"),
        col("f.event_type").as("f_type"),
        col("l.ts").as("l_ts"), col("l.event_id").as("l_eid"),
        col("l.event_type").as("l_type"))

  def appendMarkovBatch(spark: SparkSession, batch: DataFrame,
                        storePath: String, batchId: Long): Unit = {
    countsStore(storePath).append(countsDelta(batch), batchId)
    segmentsStore(storePath).append(segmentsDelta(batch), batchId)
  }

  /** The lag derivation of cross-batch stitch pairs, shared by the
    * live view and [[foldSegments]]: order each user's segments by
    * first-event (ts, event_id) and pair the previous segment's last
    * type with this segment's first type. A stitch pair's train/eval
    * half follows its TO-event (the later segment's first event) — the
    * batch operator's split rule. */
  private def stitchPairs(segs: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("f_ts", "f_eid")
    val split = lit(DiffInDiff.splitDate).cast("timestamp")
    segs
      .withColumn("prev_l_type", lag(col("l_type"), 1).over(w))
      .filter(col("prev_l_type").isNotNull)
      .select((col("f_ts") < split).as("is_train"),
        col("prev_l_type").as("from_type"), col("f_type").as("to_type"),
        lit(1L).as("n"))
  }

  /** The folded-stitch table's dir name INSIDE the segments base dir.
    * The underscore prefix makes it invisible to the parent's parquet
    * partition discovery (Spark's file index skips `_`/`.`-prefixed
    * paths), which is what lets ONE atomic rename install the
    * collapsed segments and their migrated stitch counts together. */
  private val stitchDirName = "_stitch"

  private def stitchBasePath(storePath: String) = new org.apache.hadoop.fs.Path(
    s"$storePath/segments/batch=${StoreCompaction.baseBatchId}/$stitchDirName")

  /** Stitch counts already migrated by [[foldSegments]] (empty before
    * any fold). */
  def stitchBase(spark: SparkSession, storePath: String): DataFrame = {
    val p = stitchBasePath(storePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(p.toString)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("is_train",
          org.apache.spark.sql.types.BooleanType),
        org.apache.spark.sql.types.StructField("from_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("to_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType))))
  }

  /** The live (is_train, from_type, to_type, n) table: merged internal
    * counts, plus the stitch counts a past [[foldSegments]] migrated,
    * plus the stitch pairs re-derived from the segments still live. */
  def countsView(spark: SparkSession, storePath: String): DataFrame =
    countsStore(storePath).merged(spark)
      .unionByName(stitchBase(spark, storePath))
      .unionByName(stitchPairs(segmentsStore(storePath).merged(spark)))
      .groupBy("is_train", "from_type", "to_type")
      .agg(sum("n").as("n"))

  /** THE SEGMENT FOLD — the offline rewrite that keeps a long-running
    * stream's segment state bounded by the fold CADENCE instead of its
    * lifetime: derive the stitch pairs WITHIN the committed segment
    * dirs (ids ≤ `upto` — under the order contract those hold a
    * time-prefix of every user's segments, so their internal lag pairs
    * are exactly the pairs the live view would have derived from
    * them), add them to the previously folded stitch counts, and
    * collapse each user's folded segments to ONE (first, last)
    * boundary row — off which every FUTURE stitch keeps deriving.
    *
    * CRASH SAFETY is single-rename: both payloads — the collapsed
    * rows and the updated `_stitch` count table nested inside the same
    * temp dir — become visible via the one `batch=-1` rename of
    * [[StoreCompaction]]'s protocol, whose `_ABSORBED` manifest and
    * [[StoreCompaction.recover]] converge any interruption. There is
    * NO window where the stitch counts are installed but their source
    * segments still stitch at read time (the double-count hazard a
    * two-table write would have), because visibility of both is the
    * same rename. Re-running after success is a no-op (nothing left
    * to fold). Returns the number of segment dirs absorbed. */
  def foldSegments(spark: SparkSession, storePath: String,
                   upto: Long): Int = {
    val segPath = s"$storePath/segments"
    StoreCompaction.recover(spark, segPath)
    val root = new org.apache.hadoop.fs.Path(segPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    val dirs = fs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith("batch="))
      .filter { p =>
        val id = p.getName.stripPrefix("batch=").toLong
        id == StoreCompaction.baseBatchId || id <= upto
      }
    if (dirs.length <= 1) return 0 // nothing to fold
    val segs = spark.read.parquet(dirs.map(_.toString): _*)
    val stitch = stitchBase(spark, storePath)
      .unionByName(stitchPairs(segs))
      .groupBy("is_train", "from_type", "to_type").agg(sum("n").as("n"))
    val collapsed = segs.groupBy("user_id").agg(
      min(struct(col("f_ts"), col("f_eid"), col("f_type"))).as("f"),
      max(struct(col("l_ts"), col("l_eid"), col("l_type"))).as("l"))
      .select(col("user_id"),
        col("f.f_ts").as("f_ts"), col("f.f_eid").as("f_eid"),
        col("f.f_type").as("f_type"),
        col("l.l_ts").as("l_ts"), col("l.l_eid").as("l_eid"),
        col("l.l_type").as("l_type"))
    val tmp = new org.apache.hadoop.fs.Path(root, s".compact-tmp-$upto")
    // both payloads durable in the temp BEFORE the manifest: stitch is
    // computed (it reads the old base's _stitch) before anything moves
    collapsed.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    stitch.coalesce(1).write.mode("overwrite")
      .parquet(new org.apache.hadoop.fs.Path(tmp, stitchDirName).toString)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(tmp, StoreCompaction.manifestName), true)
    out.write(dirs.map(_.getName).mkString("\n").getBytes("UTF-8"))
    out.close()
    dirs.foreach(fs.delete(_, true))
    fs.rename(tmp,
      new org.apache.hadoop.fs.Path(root,
        s"batch=${StoreCompaction.baseBatchId}"))
    dirs.length
  }

  /** Live train → serve → score readout ≡ [[MarkovEval.markovEval]]
    * over the absorbed events. */
  def markovView(spark: SparkSession, storePath: String): DataFrame =
    MarkovEval.markovFromCounts(countsView(spark, storePath))

  /** Wire the event-file stream; `compactEvery` > 0 enables the
    * cadenced counts compaction AND the segment fold (the fold plays
    * compaction for the segments table — see [[foldSegments]]). Both
    * run on everything up to the PREVIOUS batch: the checkpoint has
    * committed those ids, so their dirs are never redelivered. */
  def runMarkovStream(spark: SparkSession, uploadDir: String,
                      storePath: String, checkpointDir: String,
                      schema: StructType,
                      compactEvery: Int = 0): StreamingQuery = {
    val cs = countsStore(storePath)
    val ss = segmentsStore(storePath)
    cs.recover(spark); ss.recover(spark)
    CurationStream.runFileStream(spark, uploadDir, checkpointDir, schema) {
      (batch, id) =>
        appendMarkovBatch(spark, batch, storePath, id)
        cs.maybeCompact(spark, id, compactEvery)
        if (compactEvery > 0 && id > 0 && id % compactEvery == 0)
          foldSegments(spark, storePath, id - 1)
    }
  }
}
