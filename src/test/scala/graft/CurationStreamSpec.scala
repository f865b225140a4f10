package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ext.TextOps
import graft.streaming.CurationStream

/** The streaming curation ingest must CONVERGE to the batch pipeline's
  * output — same store whatever the slicing, order, or redelivery. */
class CurationStreamSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def storeRows(path: String) =
    spark.read.parquet(path).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq.sorted

  test("stream-fed store equals the batch gate+scrub+dedup output") {
    val tmp = Files.createTempDirectory("curation-stream").toFile.getAbsolutePath
    val upload = s"$tmp/upload"
    val store = s"$tmp/store"
    val docs = Tables(spark, dir, "documents").select("doc_id", "text")
    val schema = docs.schema

    // the corpus arrives in three arbitrary slices, one file each —
    // note the slicing SPLITS dedup groups across batches
    docs.filter(col("doc_id") % 3 === 0).coalesce(1)
      .write.parquet(s"$upload/part0")
    docs.filter(col("doc_id") % 3 === 1).coalesce(1)
      .write.parquet(s"$upload/part1")
    docs.filter(col("doc_id") % 3 === 2).coalesce(1)
      .write.parquet(s"$upload/part2")

    CurationStream.runCurationStream(
      spark, s"$upload/*", store, s"$tmp/ckpt", schema)
      .awaitTermination()

    val batch = TextOps.dedupScrubbed(TextOps.gateAndScrub(docs))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq.sorted
    assert(batch.nonEmpty)
    assert(storeRows(store) === batch)

    // redelivery of the WHOLE corpus (fresh checkpoint = every file
    // re-processed): the merge is idempotent, the store is unchanged
    CurationStream.runCurationStream(
      spark, s"$upload/*", store, s"$tmp/ckpt2", schema)
      .awaitTermination()
    assert(storeRows(store) === batch)

    // chunks derived from the streamed store equal the batch pipeline's
    val fromStore = spark.read.parquet(store)
    val t = split(col("scrubbed"), " ")
    val lastChunk = floor((size(t) - lit(1)).cast("double") /
      TextOps.chunkStride).cast("bigint")
    val streamedChunks = fromStore
      .select(col("doc_id"), t.as("t"),
        explode(sequence(lit(0L), lastChunk)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        concat_ws(" ", slice(col("t"),
          (col("chunk_id") * TextOps.chunkStride + 1).cast("int"),
          lit(TextOps.chunkWindow))).as("chunk_text"))
      .collect().map(_.toSeq).toSet
    val batchChunks = TextOps.curateChunks(spark, dir)
      .select("doc_id", "chunk_id", "chunk_text")
      .collect().map(_.toSeq).toSet
    assert(streamedChunks === batchChunks)
  }
}
