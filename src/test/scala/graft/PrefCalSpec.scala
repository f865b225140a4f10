package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ext.{IsotonicCal, PrefRank, RankCorr, RaterAgreement}

/** Preference/calibration wave: Cohen's kappa, Spearman, isotonic
  * (PAVA-minimax), label-noise flags, preference pairs, Bradley-Terry. */
class PrefCalSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def verdictDf(rows: Seq[(Int, Int)]) = {
    val schema = StructType(Seq(StructField("ra", IntegerType, false),
      StructField("rb", IntegerType, false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 2),
      schema)
  }

  test("kappa: hand-checked 2x2 and the degenerate constant-rater case") {
    // classic textbook cells: kk=20, kd=5, dk=10, dd=15 → po=0.7,
    // pe = (25*30 + 25*20)/50² = 0.5, κ = 0.4
    val rows = Seq.fill(20)((1, 1)) ++ Seq.fill(5)((1, 0)) ++
      Seq.fill(10)((0, 1)) ++ Seq.fill(15)((0, 0))
    val out = RaterAgreement.kappaFromVerdicts(verdictDf(rows)).collect()(0)
    assert(out.getAs[Long]("n_docs") === 50L)
    assert(out.getAs[Long]("po_micro") === 700000L)
    assert(out.getAs[Long]("pe_micro") === 500000L)
    assert(out.getAs[Long]("kappa_micro") === 400000L)
    // both raters constant-keep: pe = 1 → κ undefined → reported 0
    val const = RaterAgreement.kappaFromVerdicts(
      verdictDf(Seq.fill(7)((1, 1)))).collect()(0)
    assert(const.getAs[Long]("po_micro") === 1000000L)
    assert(const.getAs[Long]("kappa_micro") === 0L)
  }

  private def rankDf(pairs: Seq[(Long, Long)]) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, false),
      StructField("ra", LongType, false),
      StructField("rb", LongType, false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        pairs.zipWithIndex.map { case ((a, b), i) => Row(i.toLong, a, b) },
        2), schema)
  }

  test("spearman: identity, exact reversal, and a brute-force replay") {
    val n = 40
    val ident = RankCorr.spearmanFromRanks(
      rankDf((1L to n).map(r => (r, r)))).collect()(0)
    assert(ident.getAs[Long]("rho_micro") === 1000000L)
    assert(ident.getAs[Long]("footrule_micro") === 1000000L)
    assert(ident.getAs[Long]("max_disp") === 0L)
    val rev = RankCorr.spearmanFromRanks(
      rankDf((1L to n).map(r => (r, n - r + 1)))).collect()(0)
    assert(rev.getAs[Long]("rho_micro") === -1000000L)
    // Diaconis-Graham: reversal footrule distance is the max n²/2-ish
    // mass → normalized F ≈ −1/2 for even n (exactly −(n+2)/(2(n+1)))
    assert(math.abs(rev.getAs[Long]("footrule_micro") + 500000L) < 30000L)
    // brute replay on a fixed shuffle
    val perm = new scala.util.Random(7).shuffle((1L to n).toList)
    val out = RankCorr.spearmanFromRanks(
      rankDf((1L to n).map(r => (r, perm(r.toInt - 1))))).collect()(0)
    val d2 = (1 to n).map(r => { val d = r - perm(r - 1); d.toLong * d }).sum
    val exp = math.round(1e6 - 6e6 * d2 /
      (n.toDouble * n * n - n))
    assert(out.getAs[Long]("rho_micro") === exp)
  }

  test("isotonic: fit is monotone and equals driver-side PAVA on the buckets") {
    val bt = IsotonicCal.bucketTable(
      IsotonicCal.scoredLabeled(spark, dir))
    val fit = IsotonicCal.isotonicFromBuckets(bt)
      .orderBy("bucket").collect()
    assert(fit.nonEmpty)
    // monotone nondecreasing in the bucket order
    val iso = fit.map(_.getAs[Long]("iso_micro"))
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b })
    // classic sequential PAVA over the quantized bucket averages must
    // agree with the minimax formulation (same quantization)
    val cnts = fit.map(_.getAs[Long]("cnt"))
    val poss = fit.map(_.getAs[Long]("pos"))
    case class Block(var cnt: Long, var pos: Long)
    val blocks = scala.collection.mutable.ArrayBuffer.empty[Block]
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    for (k <- cnts.indices) {
      blocks += Block(cnts(k), poss(k)); sizes += 1
      while (blocks.length >= 2 &&
        blocks(blocks.length - 2).pos * blocks.last.cnt >=
          blocks.last.pos * blocks(blocks.length - 2).cnt) {
        val b = blocks.remove(blocks.length - 1)
        val sz = sizes.remove(sizes.length - 1)
        blocks.last.cnt += b.cnt; blocks.last.pos += b.pos
        sizes(sizes.length - 1) += sz
      }
    }
    val pava = blocks.toSeq.zip(sizes).flatMap { case (b, s) =>
      Seq.fill(s)(b.pos * 1000000L / b.cnt) }
    assert(iso.toSeq === pava)
  }

  test("label noise: flags are exactly the calibrated-threshold violations") {
    val sl = IsotonicCal.scoredLabeled(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("s"),
        r.getAs[Int]("y")))
    val fit = IsotonicCal.isotonicFromBuckets(IsotonicCal.bucketTable(
        IsotonicCal.scoredLabeled(spark, dir))).collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("iso_micro"))
      .toMap
    val lo = sl.map(_._2).min
    val hi = sl.map(_._2).max
    val w = (hi - lo) / IsotonicCal.isoBuckets + 1
    val expect = sl.flatMap { case (id, s, y) =>
      val p = fit((s - lo) / w)
      if (y == 1 && p <= IsotonicCal.pLowMicro) Some(id -> "suspect_keep")
      else if (y == 0 && p >= IsotonicCal.pHighMicro)
        Some(id -> "suspect_drop")
      else None
    }.toSet
    val got = IsotonicCal.qLabelNoise(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("flag")).toSet
    assert(got === expect)
  }

  test("pref pairs: ranks are a gap apart, winner outranks loser, margins >= 0") {
    val n = Tables(spark, dir, "documents").count()
    val out = PrefRank.qPrefPairs(spark, dir).collect()
    assert(out.nonEmpty)
    val byTier = out.groupBy(_.getAs[String]("tier"))
    for ((tier, denom) <- PrefRank.prefTiers) {
      val gap = math.max(n / denom, 1L)
      val rows = byTier.getOrElse(tier, Array.empty)
      assert(rows.length.toLong === (n - gap),
        s"tier $tier should emit n-gap pairs")
      assert(rows.forall(r => r.getAs[Long]("loser_rank") ===
        r.getAs[Long]("winner_rank") + gap))
      assert(rows.forall(_.getAs[Long]("margin_micro") >= 0L))
    }
  }

  test("bradley-terry: 2-source closed form and dominance ordering") {
    // two sources, wins 30 vs 10 (plus smoothing +1 → 31 vs 11):
    // BT fixed point has s_a/s_b = 31/11; MM converges there
    val s = PrefRank.mmStrengths(
      Map(("a", "b") -> 30L, ("b", "a") -> 10L), Seq("a", "b"))
    val ratio = s("a").toDouble / s("b")
    assert(math.abs(ratio - 31.0 / 11.0) < 0.01 * (31.0 / 11.0))
    // total normalized to |S| units (integer truncation slack)
    assert(math.abs(s.values.sum - 2L * 1000000L) <= 4L)
    // a source that beats everyone must rank strongest
    val s3 = PrefRank.mmStrengths(
      Map(("a", "b") -> 50L, ("a", "c") -> 50L, ("b", "c") -> 25L,
        ("c", "b") -> 25L),
      Seq("a", "b", "c"))
    assert(s3("a") > s3("b") && s3("a") > s3("c"))
    // b and c split their head-to-head and both lose to a equally
    assert(s3("b") === s3("c"))
  }

  test("bradley-terry driver query: one row per source, ranks are a permutation") {
    val out = PrefRank.qBradleyTerry(spark, dir).collect()
    val srcs = Tables(spark, dir, "documents")
      .select("source").distinct().count()
    assert(out.length === srcs)
    assert(out.map(_.getAs[Long]("rank")).sorted.toSeq ===
      (1L to srcs).toSeq)
    assert(out.forall(_.getAs[Long]("strength_micro") >= 1L))
    // the strength order must agree with rank order
    val byRank = out.sortBy(_.getAs[Long]("rank"))
      .map(_.getAs[Long]("strength_micro"))
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
  }
}
