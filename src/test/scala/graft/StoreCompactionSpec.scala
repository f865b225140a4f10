package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.streaming.{HistogramStore, SkewStore, StoreCompaction}

/** Store compaction: views unchanged across compaction, newer deltas
  * untouched, idempotent re-compaction, and crash recovery from every
  * interruption point. */
class StoreCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new Path("/tmp").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  test("histogram store: view identical after compaction; newer deltas kept") {
    val tmp = java.nio.file.Files.createTempDirectory("compact-hist")
      .toFile.getAbsolutePath
    val store = s"$tmp/store"
    // five batches; compact the first three (committed), keep 3..4
    (0 until 5).foreach { i =>
      val batch = (0 until 200).map(j => ((i * 37 + j * 13) % 900).toDouble)
        .toDF("v")
      HistogramStore.appendHistBatch(spark, batch, "v", store, i.toLong)
    }
    def key(r: org.apache.spark.sql.Row) =
      r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))
    val before = HistogramStore.quantilesView(spark, store)
      .collect().map(key).toMap
    val absorbed = StoreCompaction.compact(spark, store, Seq("c"), upto = 2L)
    assert(absorbed === 3)
    val names = fs.listStatus(new Path(store)).map(_.getPath.getName).toSet
    assert(names === Set("batch=-1", "batch=3", "batch=4"))
    assert(HistogramStore.quantilesView(spark, store)
      .collect().map(key).toMap === before)
    // fold the rest (base + 2 deltas) — still identical, then no-op
    assert(StoreCompaction.compact(spark, store, Seq("c"), 10L) === 3)
    assert(HistogramStore.quantilesView(spark, store)
      .collect().map(key).toMap === before)
    assert(StoreCompaction.compact(spark, store, Seq("c"), 10L) === 0)
  }

  test("skew store: profile and salting decision survive compaction") {
    val tmp = java.nio.file.Files.createTempDirectory("compact-skew")
      .toFile.getAbsolutePath
    val store = s"$tmp/store"
    (0 until 4).foreach { i =>
      val batch = ((1L to 500L).map(j => (j % 50, j)) ++
        (1L to (if (i == 3) 4000L else 100L)).map(j => (7L, j)))
        .toDF("fk", "v")
      SkewStore.appendKeyCountBatch(spark, batch, "fk", store, i.toLong)
    }
    val before = SkewStore.skewStatsView(spark, store).head()
    val saltsBefore = SkewStore.currentSalts(spark, store, 32)
    StoreCompaction.compact(spark, store, Seq("c"), 3L)
    val after = SkewStore.skewStatsView(spark, store).head()
    assert(after === before)
    assert(SkewStore.currentSalts(spark, store, 32) === saltsBefore)
    assert(saltsBefore >= 2) // the planted hot key still decides
  }

  test("crash recovery: interrupted compaction converges without loss") {
    val tmp = java.nio.file.Files.createTempDirectory("compact-crash")
      .toFile.getAbsolutePath
    val store = s"$tmp/store"
    (0 until 3).foreach { i =>
      SkewStore.appendKeyCountBatch(spark,
        (1L to 300L).map(j => (j % 20, j)).toDF("fk", "v"),
        "fk", store, i.toLong)
    }
    val want = SkewStore.keyCounts(spark, store)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // simulate the crash AFTER the durable temp+manifest but BEFORE
    // any delete/rename: build the temp exactly as compact() does,
    // then call recover()
    val root = new Path(store)
    val dirs = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("batch=")).sorted
    val merged = spark.read.parquet(
        dirs.map(n => s"$store/$n"): _*)
      .groupBy("k").agg(sum(col("c")).as("c")).coalesce(1)
    val tmpDir = new Path(root, ".compact-tmp-99")
    merged.write.mode("overwrite").parquet(tmpDir.toString)
    val out = fs.create(new Path(tmpDir, "_ABSORBED"), true)
    out.write(dirs.mkString("\n").getBytes("UTF-8"))
    out.close()
    StoreCompaction.recover(spark, store)
    assert(SkewStore.keyCounts(spark, store)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap === want)
    val names = fs.listStatus(root).map(_.getPath.getName).toSet
    assert(names === Set("batch=-1"))
    // crash mid-delete (some absorbed dirs already gone) also
    // converges: recovery re-runs deletes idempotently — simulate by
    // creating a fresh temp whose manifest lists both long-gone dirs
    // and the current base
    spark.read.parquet(s"$store/batch=-1").coalesce(1)
      .write.mode("overwrite").parquet(tmpDir.toString)
    val out2 = fs.create(new Path(tmpDir, "_ABSORBED"), true)
    out2.write((dirs :+ "batch=-1").mkString("\n").getBytes("UTF-8"))
    out2.close()
    StoreCompaction.recover(spark, store)
    assert(SkewStore.keyCounts(spark, store)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap === want)
  }
}
