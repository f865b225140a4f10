package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.config.PipelineConf
import graft.schema.SchemaLoader.FieldSpec
import graft.streaming.StreamPipeline
import graft.streaming.StreamPipeline.StreamDirs

/** CLI demo of the streaming pipeline (ST1–ST7): synthesizes an upload
  * dir with one good and one poisoned file, runs the AvailableNow
  * pipeline, prints the merged base table, dead-letter dir, and decoded
  * notification. `runMain graft.StreamDemo [workDir]`. */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(
      Files.createTempDirectory("graft-stream-demo").toString)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.functions._

    val fields = Seq(
      FieldSpec("PolicyNumber", "STRING", "NULLABLE"),
      FieldSpec("PolicyExpiryDate", "DATE", "NULLABLE"),
      FieldSpec("Amount", "FLOAT", "NULLABLE"))
    val conf = PipelineConf("RenewalList.CSV", "", "PolicyExpiryDate",
      Map("PolicyNumber" -> "strip_excel"), "", "", None, None)
    val dirs = StreamDirs(s"$root/upload", s"$root/base", s"$root/error",
      s"$root/notify", s"$root/ckpt")
    new java.io.File(dirs.uploadDir).mkdirs()

    // Seed only on first run — a rerun on the same workDir demonstrates
    // the checkpoint making reprocessing a no-op without clobbering the
    // previously merged state.
    if (!new java.io.File(dirs.basePath).exists()) {
      Seq(("P1", "2020-01-01", 10.0), ("P2", "2020-02-01", 20.0))
        .toDF("PolicyNumber", "PolicyExpiryDate", "Amount")
        .withColumn("PolicyExpiryDate", to_date($"PolicyExpiryDate"))
        .write.parquet(dirs.basePath)
      Files.write(new java.io.File(dirs.uploadDir, "RenewalList.CSV").toPath,
        ("PolicyNumber,PolicyExpiryDate,Amount\n" +
          "\"=\"\"P2\"\"\",2020-02-01,22.0\nP3,2020-03-01,30.0\n").getBytes)
      Files.write(new java.io.File(dirs.uploadDir, "garbage.csv").toPath,
        "a,b,c\nx,y,z\n".getBytes)
    }

    println(s"[demo] work dir: $root")
    StreamPipeline.run(spark, fields, conf, dirs).awaitTermination(120000)

    println("[demo] base table after merge (staging won the overlap):")
    spark.read.parquet(dirs.basePath).orderBy("PolicyExpiryDate").show()
    println("[demo] dead-letter dir: " +
      Option(new java.io.File(dirs.errorDir).list()).map(_.toSeq).getOrElse(Nil))
    println("[demo] notifications: " +
      StreamPipeline.decodeMessage(spark.read.json(dirs.notifyDir))
        .select("payload").as[String].collect().toSeq)
    spark.stop()
  }
}
