package graft

import java.nio.file.Files
import org.scalacheck.Gen
import graft.merge.Merge

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(String, Int)]) =
    rows.toDF("d", "v").withColumn("d",
      org.apache.spark.sql.functions.to_date($"d"))

  test("A2/ST4: overlap rows are REPLACED by staging, disjoint base kept") {
    val base = df(Seq("2020-01-01" -> 1, "2020-02-01" -> 2, "2020-03-01" -> 3))
    val staging = df(Seq("2020-02-01" -> 20, "2020-04-01" -> 40))
    val out = Merge.merge(base, staging, "d")
      .collect().map(r => r.getDate(0).toString -> r.getInt(1)).toSeq
    // cutoff = 2020-02-01: base keeps only January; staging wins overlap
    assert(out === Seq("2020-01-01" -> 1, "2020-02-01" -> 20, "2020-04-01" -> 40))
  }

  test("A2: empty staging leaves base unchanged") {
    val base = df(Seq("2020-01-01" -> 1))
    val out = Merge.merge(base, base.filter($"v" > 99), "d")
    assert(out.collect().map(_.getInt(1)).toSeq === Seq(1))
  }

  test("property: merge is idempotent — merge(merge(b,s),s) == merge(b,s)") {
    val day = Gen.chooseNum(1, 28)
    val rows = Gen.listOfN(12, Gen.zip(day, Gen.chooseNum(0, 100)))
      .map(_.map { case (d, v) => (f"2020-01-$d%02d", v) })
    forAllSamples(Gen.zip(rows, rows), 20) { case (b, s) =>
      if (s.nonEmpty) {
        val once = Merge.merge(df(b), df(s), "d")
        val twice = Merge.merge(once, df(s), "d")
        val key = (r: org.apache.spark.sql.Row) =>
          (r.getDate(0).toString, r.getInt(1))
        assert(twice.collect().map(key).sorted.toSeq ===
          once.collect().map(key).sorted.toSeq)
      }
    }
  }

  test("S7: updateTable rewrites its own input atomically, keeps .bak") {
    val dir = Files.createTempDirectory("merge-spec").toFile.getAbsolutePath
    val basePath = s"$dir/base"
    df(Seq("2020-01-01" -> 1, "2020-02-01" -> 2)).write.parquet(basePath)
    val staging = df(Seq("2020-02-01" -> 22))
    Merge.updateTable(spark, basePath, staging, "d")
    val out = spark.read.parquet(basePath)
      .collect().map(r => r.getDate(0).toString -> r.getInt(1)).toSeq.sorted
    assert(out === Seq("2020-01-01" -> 1, "2020-02-01" -> 22))
    // previous generation preserved for rollback
    assert(new java.io.File(s"$basePath.bak").exists())
    // second update over the rewritten base still works (no stale handles)
    Merge.updateTable(spark, basePath, df(Seq("2020-01-15" -> 9)), "d")
    val out2 = spark.read.parquet(basePath)
      .collect().map(r => r.getDate(0).toString -> r.getInt(1)).toSeq.sorted
    assert(out2 === Seq("2020-01-01" -> 1, "2020-01-15" -> 9))
  }

  test("partitioned merge: same semantics as merge(), old partitions untouched") {
    val dir = Files.createTempDirectory("merge-part").toFile.getAbsolutePath
    val basePath = s"$dir/base"
    val base = df(Seq(
      "2020-01-01" -> 1, "2020-01-20" -> 2,
      "2020-02-01" -> 3, "2020-02-10" -> 4,
      "2020-03-01" -> 5))
    Merge.writePartitioned(base, basePath, "d")

    def partFiles(month: String) = {
      val d = new java.io.File(s"$basePath/pmonth=$month")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toSeq.sorted
    }
    val janBefore = partFiles("2020-01")

    // staging cuts into February: cutoff = 2020-02-05
    val staging = df(Seq("2020-02-05" -> 40, "2020-03-15" -> 50))
    Merge.updateTablePartitioned(spark, basePath, staging, "d")

    // semantics == the unpartitioned merge
    val got = spark.read.parquet(basePath).drop("pmonth")
      .collect().map(r => r.getDate(0).toString -> r.getInt(1)).toSeq.sorted
    val want = Merge.merge(base, staging, "d")
      .collect().map(r => r.getDate(0).toString -> r.getInt(1)).toSeq.sorted
    assert(got === want)
    assert(got === Seq("2020-01-01" -> 1, "2020-01-20" -> 2,
      "2020-02-01" -> 3, "2020-02-05" -> 40, "2020-03-15" -> 50))

    // January's partition files were not rewritten (same names + mtimes)
    assert(partFiles("2020-01") === janBefore)
  }

  test("partitioned merge deletes overlap partitions staging does not cover") {
    val dir = Files.createTempDirectory("merge-part-stale").toFile.getAbsolutePath
    val basePath = s"$dir/base"
    // March is entirely on/after the cutoff and staging delivers no March
    // rows: dynamic overwrite alone would leave pmonth=2020-03 untouched
    // and its rows would wrongly survive.
    val base = df(Seq(
      "2020-01-01" -> 1, "2020-02-01" -> 3, "2020-02-10" -> 4,
      "2020-03-01" -> 5, "2020-03-20" -> 6))
    Merge.writePartitioned(base, basePath, "d")
    val staging = df(Seq("2020-02-05" -> 40))
    Merge.updateTablePartitioned(spark, basePath, staging, "d")
    val got = spark.read.parquet(basePath).drop("pmonth")
      .collect().map(r => r.getDate(0).toString -> r.getInt(1)).toSeq.sorted
    val want = Merge.merge(base, staging, "d")
      .collect().map(r => r.getDate(0).toString -> r.getInt(1)).toSeq.sorted
    assert(got === want)
    assert(got === Seq("2020-01-01" -> 1, "2020-02-01" -> 3, "2020-02-05" -> 40))
    assert(!new java.io.File(s"$basePath/pmonth=2020-03").exists())
  }

  test("compaction: fragmented partitions rewritten, healthy ones untouched, rows identical") {
    val dir = Files.createTempDirectory("merge-compact").toFile.getAbsolutePath
    val basePath = s"$dir/base"
    // January fragmented into many files; February written compact
    val jan = (1 to 24).map(d => (f"2020-01-$d%02d", d))
    val feb = Seq("2020-02-01" -> 100)
    df(jan).repartition(12)
      .withColumn("pmonth",
        org.apache.spark.sql.functions.date_format(
          org.apache.spark.sql.functions.col("d"), "yyyy-MM"))
      .write.partitionBy("pmonth").parquet(basePath)
    df(feb).coalesce(1)
      .withColumn("pmonth",
        org.apache.spark.sql.functions.date_format(
          org.apache.spark.sql.functions.col("d"), "yyyy-MM"))
      .write.mode("append").partitionBy("pmonth").parquet(basePath)

    def files(month: String) =
      new java.io.File(s"$basePath/pmonth=$month").listFiles()
        .filter(_.getName.endsWith(".parquet"))
    val febBefore = files("2020-02").map(f => f.getName -> f.lastModified()).toSeq
    assert(files("2020-01").length > 4)

    val before = spark.read.parquet(basePath).drop("pmonth")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1))).toSeq.sorted

    val n = Merge.compactPartitions(spark, basePath, maxFiles = 4)
    assert(n === 1)
    assert(files("2020-01").length <= 4)
    // healthy partition untouched (same names + mtimes); no stray dirs
    assert(files("2020-02").map(f => f.getName -> f.lastModified()).toSeq === febBefore)
    assert(!new java.io.File(basePath).list().exists(_.contains("compact")))
    // data identical
    val after = spark.read.parquet(basePath).drop("pmonth")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1))).toSeq.sorted
    assert(after === before)
    // idempotent: second run finds nothing to do
    assert(Merge.compactPartitions(spark, basePath, maxFiles = 4) === 0)
    // a partition already AT its byte-sized target file count is skipped
    // even when that count exceeds maxFiles (no perpetual re-rewrite of
    // large healthy partitions): with targetBytes tiny, n >= current
    // files, so nothing is rewritten
    val febFiles = files("2020-02").map(f => f.getName -> f.lastModified()).toSeq
    assert(Merge.compactPartitions(spark, basePath,
      maxFiles = 0, targetBytes = 1L) === 0)
    assert(files("2020-02").map(f => f.getName -> f.lastModified()).toSeq === febFiles)
  }

  test("compaction recovery heals every crash point, loses no data") {
    val dir = Files.createTempDirectory("merge-recover").toFile.getAbsolutePath
    val basePath = s"$dir/base"
    val rows = (1 to 10).map(d => (f"2020-01-$d%02d", d))
    Merge.writePartitioned(df(rows), basePath, "d")
    def baseRows() = spark.read.parquet(basePath).drop("pmonth")
      .collect().map(r => r.getDate(0).toString -> r.getInt(1)).toSeq.sorted
    val want = baseRows()
    val live = new java.io.File(s"$basePath/pmonth=2020-01")
    val bak = new java.io.File(s"$basePath/.compact-bak-2020-01")
    val tmp = new java.io.File(s"$basePath/.compact-tmp-2020-01")

    // crash BETWEEN the renames: partition displaced to bak, tmp written
    // but unpublished — the month is invisible until recovery runs
    df(rows).coalesce(1).write.parquet(tmp.getAbsolutePath)
    assert(live.renameTo(bak))
    assert(!live.exists())
    assert(Merge.recoverCompaction(spark, basePath) === 1)
    assert(live.exists() && !bak.exists() && !tmp.exists())
    assert(baseRows() === want)

    // crash AFTER publish, before the backup delete: live present,
    // stale bak + tmp left behind — recovery just cleans them up
    df(rows).coalesce(1).write.parquet(bak.getAbsolutePath)
    df(rows).coalesce(1).write.parquet(tmp.getAbsolutePath)
    assert(Merge.recoverCompaction(spark, basePath) === 0)
    assert(live.exists() && !bak.exists() && !tmp.exists())
    assert(baseRows() === want)

    // compactPartitions self-heals: seed the dangerous state again and
    // call the compactor directly — it must restore, then compact as usual
    assert(live.renameTo(bak))
    Merge.compactPartitions(spark, basePath, maxFiles = 4)
    assert(live.exists() && !bak.exists())
    assert(baseRows() === want)
  }

  test("compacting one partition leaves other partitions' files untouched") {
    // the reader contract: compaction of A never touches B, so readers
    // of other partitions are safe while a partition is being swapped
    val dir = Files.createTempDirectory("merge-reader").toFile.getAbsolutePath
    val basePath = s"$dir/base"
    val fn = org.apache.spark.sql.functions
    df((1 to 24).map(d => (f"2020-01-$d%02d", d))).repartition(12)
      .withColumn("pmonth", fn.date_format(fn.col("d"), "yyyy-MM"))
      .write.partitionBy("pmonth").parquet(basePath)
    df(Seq("2020-02-01" -> 1, "2020-02-02" -> 2)).coalesce(1)
      .withColumn("pmonth", fn.date_format(fn.col("d"), "yyyy-MM"))
      .write.mode("append").partitionBy("pmonth").parquet(basePath)
    def feb() = new java.io.File(s"$basePath/pmonth=2020-02").listFiles()
      .map(f => f.getName -> f.lastModified()).toSeq.sorted
    val febBefore = feb()
    assert(Merge.compactPartitions(spark, basePath, maxFiles = 4) === 1)
    assert(feb() === febBefore)
  }

  test("property: partitioned merge over random batch sequences equals folded merge()") {
    // the disk-layout variant must be indistinguishable from the
    // in-memory semantics under ANY batch shape: random dates spanning
    // months, random overlap, empty batches, batches that wipe whole
    // months — the shapes that exercise dynamic overwrite, stale-month
    // deletion, and cutoff-month row splitting together
    val day = Gen.chooseNum(1, 28)
    val month = Gen.chooseNum(1, 4)
    val row = Gen.zip(month, day, Gen.chooseNum(0, 99))
      .map { case (m, d, v) => (f"2021-$m%02d-$d%02d", v) }
    // batch sizes 0..8: size-0 batches exercise the None-cutoff no-op
    // path of the partitioned merge, not just the overwrite machinery
    val batches = Gen.listOfN(3,
      Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, row)))
    val initial = Gen.nonEmptyListOf(row).map(_.take(12))
    forAllSamples(Gen.zip(initial, batches), 10) { case (init, bs) =>
      val dir = Files.createTempDirectory("merge-prop").toFile.getAbsolutePath
      val basePath = s"$dir/base"
      Merge.writePartitioned(df(init), basePath, "d")
      var expected = df(init)
      val releases = scala.collection.mutable.Buffer[() => Unit]()
      bs.foreach { b =>
        Merge.updateTablePartitioned(spark, basePath, df(b), "d")
        // fold eagerly (keeps plans small) via the RELEASABLE
        // checkpoint — raw Dataset.localCheckpoint blocks can't be
        // freed and would accumulate across the shared test JVM
        val (ck, rel) =
          graft.util.Checkpoints.checkpointTracked(
            Merge.merge(expected, df(b), "d"))
        expected = ck
        releases += rel
      }
      val got = spark.read.parquet(basePath).drop("pmonth")
        .collect().map(r => r.getDate(0).toString -> r.getInt(1))
        .toSeq.sorted
      val want = expected
        .collect().map(r => r.getDate(0).toString -> r.getInt(1))
        .toSeq.sorted
      releases.foreach(_())
      assert(got === want)
    }
  }

  test("partitioned merge from persisted staging is retryable and idempotent") {
    val dir = Files.createTempDirectory("merge-part-retry").toFile.getAbsolutePath
    val basePath = s"$dir/base"
    val stagingPath = s"$dir/base_update"
    Merge.writePartitioned(
      df(Seq("2020-01-01" -> 1, "2020-02-01" -> 2)), basePath, "d")
    Merge.overwriteAtomic(df(Seq("2020-02-01" -> 22)), stagingPath)

    def baseRows() = spark.read.parquet(basePath).drop("pmonth")
      .collect().map(r => r.getDate(0).toString -> r.getInt(1)).toSeq.sorted

    Merge.updateFromStagingPartitioned(spark, basePath, stagingPath, "d")
    assert(baseRows() === Seq("2020-01-01" -> 1, "2020-02-01" -> 22))
    // double delivery — idempotent
    Merge.updateFromStagingPartitioned(spark, basePath, stagingPath, "d")
    assert(baseRows() === Seq("2020-01-01" -> 1, "2020-02-01" -> 22))
  }
}
