package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Range join semantics on handcrafted data: boundary inclusion, cross-
  * bucket matches, per-key isolation, no duplicate pairs. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("range join: tolerance boundary inclusive, bucket-crossing pairs found once") {
    val tol = 60L * 1000000 // 1 minute
    val left = Seq(
      (1L, ts("2024-01-01 10:00:30"), "e1"),
      (1L, ts("2024-01-01 10:05:00"), "e2"),
      (2L, ts("2024-01-01 10:00:30"), "e3")
    ).toDF("k", "lt", "ln")
    val right = Seq(
      (1L, ts("2024-01-01 10:01:30"), "c1"), // exactly 60s after e1 (inclusive) — and a bucket boundary cross
      (1L, ts("2024-01-01 10:04:10"), "c2"), // 50s before e2
      (1L, ts("2024-01-01 09:58:00"), "c3"), // 150s before e1 — out
      (2L, ts("2024-01-01 10:00:00"), "c4")  // matches e3 only (key 2)
    ).toDF("k", "rt", "rn")

    val out = RangeJoin.rangeJoin(left, right, "k", "lt", "rt", tol)
      .select("k", "ln", "rn").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

    assert(out.length === out.distinct.length) // no duplicate pairs
    assert(out.toSet === Set(
      (1L, "e1", "c1"),
      (1L, "e2", "c2"),
      (2L, "e3", "c4")))
  }

  test("range join rejects overlapping non-key columns") {
    val l = Seq((1L, ts("2024-01-01 00:00:00"), "x")).toDF("k", "t1", "v")
    val r = Seq((1L, ts("2024-01-01 00:00:00"), "y")).toDF("k", "t2", "v")
    intercept[IllegalArgumentException] {
      RangeJoin.rangeJoin(l, r, "k", "t1", "t2", 1000000L)
    }
  }

  test("range join == brute-force reference on random data (property)") {
    import org.scalacheck.Gen
    val base = ts("2024-01-01 00:00:00").getTime
    val tol = 90L * 1000000 // 90 s
    val genRows = for {
      nl <- Gen.chooseNum(0, 25)
      nr <- Gen.chooseNum(0, 25)
      l <- Gen.listOfN(nl, Gen.zip(Gen.chooseNum(1L, 3L), Gen.chooseNum(0L, 600L)))
      r <- Gen.listOfN(nr, Gen.zip(Gen.chooseNum(1L, 3L), Gen.chooseNum(0L, 600L)))
    } yield (l.distinct, r.distinct)
    forAllSamples(genRows, n = 15) { case (lrows, rrows) =>
      val left = lrows.map { case (k, s) =>
        (k, new Timestamp(base + s * 1000), s"l$k-$s") }.toDF("k", "lt", "ln")
      val right = rrows.map { case (k, s) =>
        (k, new Timestamp(base + s * 1000), s"r$k-$s") }.toDF("k", "rt", "rn")
      val got = RangeJoin.rangeJoin(left, right, "k", "lt", "rt", tol)
        .select("ln", "rn").collect()
        .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
      val want = (for {
        (lk, ls) <- lrows
        (rk, rs) <- rrows
        if lk == rk && math.abs(ls - rs) * 1000000 <= tol
      } yield (s"l$lk-$ls", s"r$rk-$rs")).sorted
      assert(got === want)
    }
  }

  test("driver query: pairs are within tolerance and keyed correctly") {
    val out = RangeJoin.qRangeJoin(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(math.abs(r.getAs[Long]("dt_us")) <= 3600000000L)
    }
  }
}
