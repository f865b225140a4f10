package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.config.PipelineConf
import graft.schema.SchemaLoader.FieldSpec
import graft.streaming.StreamPipeline
import graft.streaming.StreamPipeline.StreamDirs

/** End-to-end streaming pipeline: file arrival -> clean -> merge -> notify,
  * with a poisoned file landing in the dead-letter dir (ST1/ST3/ST4/ST5/ST6). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val fields = Seq(
    FieldSpec("PolicyNumber", "STRING", "NULLABLE"),
    FieldSpec("PolicyExpiryDate", "DATE", "NULLABLE"),
    FieldSpec("Amount", "FLOAT", "NULLABLE"))

  private val conf = PipelineConf(
    name = "RenewalList.CSV", jsonfile = "", dateCol = "PolicyExpiryDate",
    convertFuncs = Map("PolicyNumber" -> "strip_excel"),
    tableNew = "", tableOld = "", uri1 = None, uri2 = None)

  private def baseDf(rows: (String, String, Double)*) =
    rows.toDF("PolicyNumber", "PolicyExpiryDate", "Amount")
      .withColumn("PolicyExpiryDate", to_date($"PolicyExpiryDate"))

  test("e2e: good file merges (staging wins overlap), bad file dead-letters, notify emitted") {
    val root = Files.createTempDirectory("stream-spec").toFile.getAbsolutePath
    val dirs = StreamDirs(
      uploadDir = s"$root/upload", basePath = s"$root/base",
      errorDir = s"$root/error", notifyDir = s"$root/notify",
      checkpointDir = s"$root/ckpt")
    new java.io.File(dirs.uploadDir).mkdirs()

    // seed base table: one old row, one row inside the coming overlap
    baseDf(("P1", "2020-01-01", 10.0), ("P2", "2020-02-01", 20.0))
      .write.parquet(dirs.basePath)

    // good upload: corrects P2, adds P3 (cutoff = 2020-02-01)
    Files.write(new java.io.File(dirs.uploadDir, "RenewalList.CSV").toPath,
      ("PolicyNumber,PolicyExpiryDate,Amount\n" +
        "\"=\"\"P2\"\"\",2020-02-01,22.0\n" +
        "P3,2020-03-01,30.0\n").getBytes("UTF-8"))
    // poisoned upload: header mismatch -> every row cleans to null date
    Files.write(new java.io.File(dirs.uploadDir, "garbage.csv").toPath,
      "a,b,c\nx,y,z\n1,2,3\n".getBytes("UTF-8"))

    val q = StreamPipeline.run(spark, fields, conf, dirs)
    q.awaitTermination(120000)

    val base = spark.read.parquet(dirs.basePath)
      .collect()
      .map(r => (r.getAs[String]("PolicyNumber"),
        r.getAs[java.sql.Date]("PolicyExpiryDate").toString,
        r.getAs[Double]("Amount"))).toSet
    // P1 kept (pre-cutoff), P2 replaced by staging's 22.0, P3 appended;
    // strip_excel ran on the quoted ="P2" artifact
    assert(base === Set(
      ("P1", "2020-01-01", 10.0),
      ("P2", "2020-02-01", 22.0),
      ("P3", "2020-03-01", 30.0)))

    // ST5: poisoned file moved to the dead-letter dir, gone from upload
    val errFiles = new java.io.File(dirs.errorDir).list().toSeq
    assert(errFiles === Seq("garbage.csv"))
    assert(!new java.io.File(dirs.uploadDir, "garbage.csv").exists())
    assert(new java.io.File(dirs.uploadDir, "RenewalList.CSV").exists())

    // ST6: notification message present and base64-decodable (S10)
    val msgs = new java.io.File(dirs.notifyDir).list().toSeq.filter(_.endsWith(".msg"))
    assert(msgs.size === 1)
    val decoded = StreamPipeline.decodeMessage(
      spark.read.json(dirs.notifyDir)).select("payload").as[String].head()
    assert(decoded === "RenewalList.CSV")

    // ST6 decoupled hop: the second stage consumes the REAL message file
    // written above and fires from it alone
    val fired = new java.util.concurrent.CopyOnWriteArrayList[String]()
    StreamPipeline.runNotifyStage(spark, dirs.notifyDir, s"$root/nckpt") {
      name => fired.add(name)
    }.awaitTermination(120000)
    assert(fired.toArray.toSeq === Seq("RenewalList.CSV"))

    // S5: staging table_new persisted past the batch and queryable —
    // holds exactly the last GOOD batch (the poisoned batch never stages)
    val staging = spark.read.parquet(dirs.stagingOrDefault)
      .collect()
      .map(r => (r.getAs[String]("PolicyNumber"),
        r.getAs[java.sql.Date]("PolicyExpiryDate").toString,
        r.getAs[Double]("Amount"))).toSet
    assert(staging === Set(("P2", "2020-02-01", 22.0), ("P3", "2020-03-01", 30.0)))

    // S4: durable cleaned CSV artifact in the cleaned "bucket"
    val cleanedBack = spark.read.option("header", true)
      .csv(s"${dirs.cleanedOrDefault}/RenewalList.CSV")
    assert(cleanedBack.count() === 2)
    assert(cleanedBack.columns.toSeq ===
      Seq("PolicyNumber", "PolicyExpiryDate", "Amount"))
  }

  test("S5: merge failure leaves staging committed; updateFromStaging retries") {
    val root = Files.createTempDirectory("stream-spec3").toFile.getAbsolutePath
    val basePath = s"$root/base"
    val stagingPath = s"$root/base_update"
    baseDf(("P1", "2020-01-01", 1.0), ("P2", "2020-02-01", 2.0))
      .write.parquet(basePath)

    // load step committed staging (WRITE_TRUNCATE)
    graft.merge.Merge.overwriteAtomic(
      baseDf(("P2", "2020-02-01", 22.0)), stagingPath)

    def baseRows() = spark.read.parquet(basePath).collect()
      .map(r => (r.getAs[String]("PolicyNumber"), r.getAs[Double]("Amount")))
      .toSet

    // merge "fails" here — base untouched, staging survives and is queryable
    assert(spark.read.parquet(stagingPath).count() === 1)
    assert(baseRows() === Set(("P1", 1.0), ("P2", 2.0)))

    // retry the merge alone, from the persisted artifact
    graft.merge.Merge.updateFromStaging(spark, basePath, stagingPath, "PolicyExpiryDate")
    assert(baseRows() === Set(("P1", 1.0), ("P2", 22.0)))

    // retry again (double-delivery) — idempotent, staging still present
    graft.merge.Merge.updateFromStaging(spark, basePath, stagingPath, "PolicyExpiryDate")
    assert(baseRows() === Set(("P1", 1.0), ("P2", 22.0)))
    assert(spark.read.parquet(stagingPath).count() === 1)
  }

  test("ST6: notify stage is message-triggered and effectively-once") {
    val root = Files.createTempDirectory("stream-notify").toFile.getAbsolutePath
    val notifyDir = s"$root/notify"
    new java.io.File(notifyDir).mkdirs()
    // the message IS the trigger: no first stage runs in this test
    val payload = java.util.Base64.getEncoder
      .encodeToString("RenewalList.CSV".getBytes("UTF-8"))
    Files.write(new java.io.File(notifyDir, "batch-7.msg").toPath,
      s"""{"payload":"$payload"}""".getBytes("UTF-8"))

    val fired = new java.util.concurrent.CopyOnWriteArrayList[String]()
    StreamPipeline.runNotifyStage(spark, notifyDir, s"$root/nckpt") {
      name => fired.add(name)
    }.awaitTermination(120000)
    assert(fired.toArray.toSeq === Seq("RenewalList.CSV"))

    // restart with the same checkpoint: message already acked — no refire
    StreamPipeline.runNotifyStage(spark, notifyDir, s"$root/nckpt") {
      name => fired.add(name)
    }.awaitTermination(120000)
    assert(fired.size === 1)
  }

  test("partitioned base: streamed merge + in-pipeline compaction") {
    val root = Files.createTempDirectory("stream-part").toFile.getAbsolutePath
    val dirs = StreamDirs(s"$root/upload", s"$root/base", s"$root/error",
      s"$root/notify", s"$root/ckpt",
      partitionedBase = true, compactEveryBatches = 1)
    new java.io.File(dirs.uploadDir).mkdirs()
    // seed a deliberately fragmented January (12 files) + February
    val seed = baseDf((1 to 24).map(d => (f"P$d%02d", f"2020-01-$d%02d", d * 1.0)) :+
      (("PF", "2020-02-01", 99.0)): _*)
    seed.repartition(12).withColumn("pmonth",
        org.apache.spark.sql.functions.date_format($"PolicyExpiryDate", "yyyy-MM"))
      .write.partitionBy("pmonth").parquet(dirs.basePath)
    def janFiles() =
      new java.io.File(s"${dirs.basePath}/pmonth=2020-01").listFiles()
        .count(_.getName.endsWith(".parquet"))
    assert(janFiles() > 8)

    // upload cuts into February: staging wins the overlap
    Files.write(new java.io.File(dirs.uploadDir, "RenewalList.CSV").toPath,
      ("PolicyNumber,PolicyExpiryDate,Amount\n" +
        "PF,2020-02-01,42.0\nPG,2020-03-01,7.0\n").getBytes("UTF-8"))
    StreamPipeline.run(spark, fields, conf, dirs).awaitTermination(120000)

    val base = spark.read.parquet(dirs.basePath).drop("pmonth")
      .collect().map(r => (r.getAs[String]("PolicyNumber"),
        r.getAs[Double]("Amount"))).toSet
    assert(base.contains("PF" -> 42.0) && base.contains("PG" -> 7.0))
    assert(base.size === 26) // 24 January + replaced PF + new PG
    // compaction ran inside the pipeline: January defragmented
    assert(janFiles() <= 8)
  }

  test("ST3: restart with same checkpoint reprocesses nothing") {
    val root = Files.createTempDirectory("stream-spec2").toFile.getAbsolutePath
    val dirs = StreamDirs(s"$root/upload", s"$root/base", s"$root/error",
      s"$root/notify", s"$root/ckpt")
    new java.io.File(dirs.uploadDir).mkdirs()
    baseDf(("P1", "2020-01-01", 1.0)).write.parquet(dirs.basePath)
    Files.write(new java.io.File(dirs.uploadDir, "u1.csv").toPath,
      "PolicyNumber,PolicyExpiryDate,Amount\nP9,2020-09-01,9.0\n".getBytes("UTF-8"))

    StreamPipeline.run(spark, fields, conf, dirs).awaitTermination(120000)
    val after1 = spark.read.parquet(dirs.basePath).count()
    // second run, same checkpoint, no new files -> no new batches
    StreamPipeline.run(spark, fields, conf, dirs).awaitTermination(120000)
    val after2 = spark.read.parquet(dirs.basePath).count()
    assert(after1 === 2 && after2 === 2)
    assert(new java.io.File(dirs.notifyDir).list()
      .count(_.endsWith(".msg")) === 1)
  }
}
