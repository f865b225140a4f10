package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.EmbedAlgebra
import graft.ext.EmbedAlgebra.{dim, kOut}

/** Embedding linear algebra: PCA power iteration against a planted
  * dominant axis AND an independent double-precision reference; ABTT
  * residual semantics on rank-1 data; JL sign-grid portability and norm
  * preservation. */
class EmbedAlgebraSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  /** Planted corpus: x = mean + t·u + s·w with u the dominant axis
    * (|t| ≤ 5), w a weak orthogonal axis (|s| ≤ 0.3) — PC1 must be u. */
  private lazy val planted: DataFrame = {
    val u = Array.tabulate(dim)(j =>
      if (j == 0) 3.0 / 13 else if (j == 1) 4.0 / 13
      else if (j == 63) 12.0 / 13 else 0.0)
    val w = Array.tabulate(dim)(j => if (j == 5) 1.0 else 0.0)
    val mean = Array.tabulate(dim)(j => if (j == 2) 0.5 else 0.0)
    val rows = (0 until 110).map { i =>
      val t = (i % 11) - 5.0 // -5..5, mean 0
      val s = ((i % 7) - 3.0) * 0.1 // -0.3..0.3
      val v = Array.tabulate(dim)(j =>
        (mean(j) + t * u(j) + s * w(j)).toFloat)
      (i.toLong, v)
    }
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private def cosineTo(vMicro: Array[Long], axis: Array[Double]): Double = {
    val v = vMicro.map(_.toDouble)
    val dot = v.zip(axis).map { case (a, b) => a * b }.sum
    val nv = math.sqrt(v.map(x => x * x).sum)
    val na = math.sqrt(axis.map(x => x * x).sum)
    dot / nv / na
  }

  test("pca recovers a planted dominant axis with its variance share") {
    val m = EmbedAlgebra.fitPca(planted)
    val u = Array.tabulate(dim)(j =>
      if (j == 0) 3.0 / 13 else if (j == 1) 4.0 / 13
      else if (j == 63) 12.0 / 13 else 0.0)
    assert(math.abs(cosineTo(m.vMicro, u)) > 0.999)
    // var(t) = 10 vs var(s) ≈ 0.04: explained share must be ~100%
    assert(m.explained > 0.99)
    // lambda ≈ var(t) = E[t²] = (2·(1+4+9+16+25))/11 = 10
    assert(math.abs(m.lambda - 10.0) / 10.0 < 0.01)
  }

  test("pca quantization fidelity: unquantized same-round replay on real data") {
    // the testdata embeddings are near-isotropic (λ1/λ2 ≈ 1.07), so 8
    // rounds can't CONVERGE here (the planted test covers convergence
    // where a gap exists) — what this corpus tests is that the
    // micro-quantized integer pipeline tracks the exact real-arithmetic
    // iteration: same covariance, same 8 pivot-normalized rounds, no
    // quantization anywhere
    val emb = Tables(spark, dir, "embeddings")
    val m = EmbedAlgebra.fitPca(emb)
    val rows = emb.select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = rows.length.toDouble
    val mu = Array.tabulate(dim)(j => rows.map(_(j)).sum / n)
    val cov = Array.tabulate(dim, dim)((i, j) =>
      rows.map(r => (r(i) - mu(i)) * (r(j) - mu(j))).sum / n)
    var v = Array.fill(dim)(1.0)
    (1 to EmbedAlgebra.rounds).foreach { _ =>
      val w = Array.tabulate(dim)(i =>
        (0 until dim).map(j => cov(i)(j) * v(j)).sum)
      val piv = w.zipWithIndex
        .minBy { case (x, i) => (-math.abs(x), i) }._1
      v = w.map(_ / piv)
    }
    assert(math.abs(cosineTo(m.vMicro, v)) > 0.9999)
    // Rayleigh quotient from the quantized direction matches the exact
    // replay's, and both respect the spectrum's bounds
    val vv = v.map(x => x * x).sum
    val lamRef = (for { i <- 0 until dim; j <- 0 until dim }
      yield v(i) * cov(i)(j) * v(j)).sum / vv
    assert(math.abs(m.lambda - lamRef) / lamRef < 1e-3)
    val trace = (0 until dim).map(i => cov(i)(i)).sum
    assert(m.lambda <= trace && m.lambda >= trace / dim * 0.9)
    assert(m.explained > 0.0 && m.explained <= 1.0)
  }

  test("abtt on rank-1 data: residual vanishes, projection recovers t") {
    val u = Array.tabulate(dim)(j =>
      if (j == 0) 3.0 / 13 else if (j == 1) 4.0 / 13
      else if (j == 63) 12.0 / 13 else 0.0)
    import spark.implicits._
    val rank1 = (0 until 44).map { i =>
      val t = (i % 11) - 5.0
      (i.toLong, Array.tabulate(dim)(j => (t * u(j)).toFloat))
    }.toDF("vec_id", "embedding")
    val m = EmbedAlgebra.fitPca(rank1)
    val out = EmbedAlgebra.abttScore(rank1, m).collect()
    // all variance lives on u: removing PC1 leaves ~nothing (micro²
    // units — 1e4 is 1e-8 of a unit norm)
    assert(out.forall(r => math.abs(r.getAs[Long]("resid2_micro2")) < 1e4))
    // projections take exactly the 11 planted t values (×1e6, centred)
    val projs = out.map(_.getAs[Long]("proj_micro")).distinct.sorted
    assert(projs.length === 11)
    val gaps = projs.sliding(2).map(p => p(1) - p(0)).toSeq
    assert(gaps.forall(g => math.abs(g - 1000000L) < 1000L))
  }

  test("jl sign grid: driver md5 == Spark md5 expression, all 1024 cells") {
    import spark.implicits._
    val grid = (for { k <- 0 until kOut; j <- 1 to dim }
      yield (k, j)).toDF("k", "j")
    val sparkSigns = grid.select(col("k"), col("j"),
        when(conv(substring(md5(concat(lit("jl:"), col("k"), lit(":"),
          col("j")).cast("binary")), 1, 1), 16, 10).cast("int") % 2 === 0,
          1L).otherwise(-1L).as("s"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    for { k <- 0 until kOut; j <- 1 to dim }
      assert(sparkSigns((k, j)) === EmbedAlgebra.jlSign(k, j),
        s"sign mismatch at ($k,$j)")
  }

  test("jl projection: integer-exact, deterministic, norms preserved") {
    val emb = Tables(spark, dir, "embeddings")
    val a = EmbedAlgebra.jlProject(emb).collect()
    val b = EmbedAlgebra.jlProject(emb).collect()
    assert(a.map(_.toString).sorted.toSeq === b.map(_.toString).sorted.toSeq)
    assert(a.length === 500 * kOut)
    // norm_ok is a per-VECTOR flag: constant across a vector's k rows
    val byVec = a.groupBy(_.getAs[Long]("vec_id"))
    assert(byVec.values.forall(_.map(_.getAs[Boolean]("norm_ok"))
      .distinct.length == 1))
    // JL at k=16: expect the overwhelming majority inside the 2× window
    val okFrac = byVec.values.count(_.head.getAs[Boolean]("norm_ok"))
      .toDouble / byVec.size
    assert(okFrac > 0.9, s"norm_ok fraction $okFrac")
    // independent recomputation of one vector's projection
    val q0 = emb.filter(col("vec_id") === 0).select("embedding")
      .head.getSeq[Float](0).map(x => // HALF_UP ≡ both engines' round()
        java.math.BigDecimal.valueOf(x.toDouble * 1e6)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue).toArray
    val y0 = a.filter(_.getAs[Long]("vec_id") == 0L)
      .map(r => r.getAs[Int]("k") -> r.getAs[Long]("y_micro")).toMap
    for (k <- 0 until kOut) {
      val expect = (1 to dim).map(j =>
        EmbedAlgebra.jlSign(k, j) * q0(j - 1)).sum
      assert(y0(k) === expect, s"k=$k")
    }
  }
}
