package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Events
import graft.streaming.EventStreams

/** Streaming/batch agreement for the event analytics: the watermarked
  * streaming operators must produce exactly the batch answer on every
  * window/session the watermark has finalized. (Windows and sessions
  * still open when a bounded replay ends are unemitted by design —
  * append mode emits on watermark passage — so the comparison domain is
  * "finalized by the end-of-stream watermark".) */
class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def eventsDf = Tables(spark, dir, "events")

  /** Raw file schema as the engine's batch reader would scan it —
    * [[Tables]] sets the layout-tolerance confs (nanosAsLong, NTZ-off);
    * the ts normalization happens post-read via [[Tables.adaptEventsTs]],
    * exactly as in Tables.apply, whatever layout the testdata has. */
  private def rawSchema = {
    Tables(spark, dir, "events") // ensures layout confs are set
    spark.read.parquet(s"$dir/events.parquet").schema
  }

  /** FileStreamSource wants a directory; stage the parquet into one. */
  private def stageSourceDir(): String = {
    val d = Files.createTempDirectory("evt-src")
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("events.parquet"))
    d.toFile.getAbsolutePath
  }

  test("streaming windowed counts == batch on watermark-finalized windows") {
    val src = spark.readStream
      .schema(rawSchema)
      .parquet(stageSourceDir())
      .transform(Tables.adaptEventsTs)
    val out = Files.createTempDirectory("evt-win").toFile.getAbsolutePath
    val q = EventStreams.windowedCounts(src)
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("append")
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("win_counts")
      .select($"ws", $"event_type", $"n_events")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    val batch = Events.qEventsWindow(spark, dir)
      .select($"ws", $"event_type", $"n_events")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet

    assert(streamed.nonEmpty)
    // every emitted window matches batch exactly
    assert(streamed.subsetOf(batch))
    // and everything older than maxTs - watermark(2h) - window(1h) was emitted
    val maxTs = eventsDf.agg(max($"ts")).as[java.sql.Timestamp].head()
    val cutoff = maxTs.getTime - (3L * 3600 * 1000)
    val mustEmit = batch.filter(_._1.getTime < cutoff)
    assert(mustEmit.subsetOf(streamed))
  }

  test("streaming dedup: a fully re-delivered file emits no duplicates") {
    // stage the SAME parquet twice — an exact at-least-once re-delivery
    val srcDir = Files.createTempDirectory("evt-dup")
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      srcDir.resolve("events_a.parquet"))
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      srcDir.resolve("events_b.parquet"))
    val src = spark.readStream
      .schema(rawSchema)
      .parquet(srcDir.toFile.getAbsolutePath)
      .transform(Tables.adaptEventsTs)
    val out = Files.createTempDirectory("evt-dup-out").toFile.getAbsolutePath
    val q = graft.streaming.EventStreams.dedupEvents(src)
      .writeStream.format("memory").queryName("dedup_events")
      .outputMode("append")
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("dedup_events")
    assert(streamed.count() === eventsDf.count())
    assert(streamed.select("event_id").distinct().count() === eventsDf.count())
  }

  test("stream-stream proximity join == batch range join (inner join: complete on bounded replay)") {
    def src() = spark.readStream
      .schema(rawSchema)
      .parquet(stageSourceDir())
      .transform(Tables.adaptEventsTs)
    val errors = src().filter($"event_type" === "error")
    val clicks = src().filter($"event_type" === "click")
      .withColumnRenamed("ts", "cts")
    val out = Files.createTempDirectory("evt-prox").toFile.getAbsolutePath
    val q = graft.streaming.EventStreams.proximityJoin(errors, clicks)
      .writeStream.format("memory").queryName("prox")
      .outputMode("append")
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("prox")
      .select($"user_id", $"event_id", $"click_id", $"dt_us")
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = graft.operators.RangeJoin.qRangeJoin(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSet
    // inner stream-stream joins emit matches as soon as both sides are
    // buffered — nothing waits on the watermark, so the bounded replay
    // must reproduce the batch answer EXACTLY
    assert(streamed === batch)
  }

  test("streaming sessionize == batch on watermark-finalized sessions") {
    val src = spark.readStream
      .schema(rawSchema)
      .parquet(stageSourceDir())
      .transform(Tables.adaptEventsTs)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventStreams.Event]
    val out = Files.createTempDirectory("evt-sess").toFile.getAbsolutePath
    val q = EventStreams.sessionize(src)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append")
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("sessions")
      .select($"user_id", $"session_start", $"session_end", $"n_events")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
      .collect().toSet
    val batch = Events.qSessionize(spark, dir)
      .select($"user_id", $"session_start", $"session_end", $"n_events")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
      .collect().toSet

    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch))
    // sessions that closed well before the end-of-stream watermark
    // (maxTs - 2h) must all have been emitted via gap or timeout
    val maxTs = eventsDf.agg(max($"ts")).as[java.sql.Timestamp].head()
    val gapMs = Events.sessionGapMicros / 1000
    val cutoff = maxTs.getTime - (2L * 3600 * 1000) - gapMs
    val mustEmit = batch.filter(_._3.getTime < cutoff)
    assert(mustEmit.subsetOf(streamed))
  }
}
