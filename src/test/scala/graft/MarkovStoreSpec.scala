package graft

import org.apache.spark.sql.functions._
import graft.operators.MarkovEval
import graft.streaming.MarkovStore

/** Streaming Markov eval store: the live readout equals the batch
  * operator over the absorbed events at every prefix point — with
  * users ACTIVE ACROSS batches, so the cross-batch stitch pairs (the
  * segment-boundary derivation) are load-bearing — replay idempotent,
  * compaction inert for both tables. Batches slice the stream by TIME
  * (the store's stated order contract: adjacency cannot survive
  * arbitrary slicing, arrival order is the watermark assumption). */
class MarkovStoreSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def events = Tables(spark, dir, "events")

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("live markov view == batch at every prefix; stitch pairs are " +
    "load-bearing; replay idempotent; compaction inert") {
    val tmp = java.nio.file.Files.createTempDirectory("markovstore")
      .toFile.getAbsolutePath
    // time-contiguous slices: every user active in more than one slice
    // contributes at least one cross-batch transition
    val cuts = Seq("2024-01-11", "2024-01-21")
    val parts = Seq(
      events.filter(col("ts") < lit(cuts(0)).cast("timestamp")),
      events.filter(col("ts") >= lit(cuts(0)).cast("timestamp") &&
        col("ts") < lit(cuts(1)).cast("timestamp")),
      events.filter(col("ts") >= lit(cuts(1)).cast("timestamp")))
      .map(_.localCheckpoint())
    val prefixes = Seq(
      events.filter(col("ts") < lit(cuts(0)).cast("timestamp")),
      events.filter(col("ts") < lit(cuts(1)).cast("timestamp")),
      events)
    parts.zipWithIndex.foreach { case (p, i) =>
      MarkovStore.appendMarkovBatch(spark, p, s"$tmp/store", i.toLong)
      assert(rows(MarkovStore.markovView(spark, s"$tmp/store"))
        === rows(MarkovEval.markovEval(prefixes(i))),
        s"live != batch after batch $i")
    }
    // the stitch is genuinely load-bearing: internal counts alone
    // (sum of per-batch pair tables) under-count the corpus pairs
    val internalOnly = MarkovStore.countsStore(s"$tmp/store")
      .merged(spark).agg(sum("n")).head().getLong(0)
    val full = MarkovEval.transitionCounts(events)
      .agg(sum("n")).head().getLong(0)
    assert(internalOnly < full, "no cross-batch pairs in this slicing?")
    assert(MarkovStore.countsView(spark, s"$tmp/store")
      .agg(sum("n")).head().getLong(0) === full)
    val batchRows = rows(MarkovEval.markovEval(events))
    // replay the newest batch: both dirs rewritten, views unchanged
    MarkovStore.appendMarkovBatch(spark, parts(2), s"$tmp/store", 2L)
    assert(rows(MarkovStore.markovView(spark, s"$tmp/store"))
      === batchRows, "after replay")
    // compaction folds both tables (sum fold / union fold): inert
    MarkovStore.countsStore(s"$tmp/store").compact(spark, 2L)
    MarkovStore.segmentsStore(s"$tmp/store").compact(spark, 2L)
    assert(rows(MarkovStore.markovView(spark, s"$tmp/store"))
      === batchRows, "after compaction")
  }

  test("file-stream wiring absorbs time-sliced uploads") {
    val tmp = java.nio.file.Files.createTempDirectory("markovstore2")
      .toFile.getAbsolutePath
    val cut = "2024-01-16"
    val parts = Seq(
      events.filter(col("ts") < lit(cut).cast("timestamp")),
      events.filter(col("ts") >= lit(cut).cast("timestamp")))
      .map(_.localCheckpoint())
    parts.zipWithIndex.foreach { case (p, i) =>
      p.coalesce(1).write.parquet(s"$tmp/src/up$i")
    }
    MarkovStore.runMarkovStream(spark, s"$tmp/src/*", s"$tmp/store",
      s"$tmp/ckpt", parts.head.schema, compactEvery = 2)
      .awaitTermination()
    assert(rows(MarkovStore.markovView(spark, s"$tmp/store"))
      === rows(MarkovEval.markovEval(events)))
  }
}
