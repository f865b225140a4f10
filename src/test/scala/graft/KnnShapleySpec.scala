package graft

import org.apache.spark.sql.functions._
import graft.ext.{KnnShapley, Similarity}

/** Independent-path checks for exact KNN-Shapley: a sequential JVM
  * replay of the Jia et al. recursion per probe, and the efficiency
  * property (per-probe values telescope to the top-K match fraction). */
class KnnShapleySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("windowed suffix recursion equals a sequential JVM replay; " +
    "per-probe efficiency holds") {
    val emb = Tables(spark, dir, "embeddings")
    val rows = emb.select("vec_id", "label", "embedding").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getSeq[Float](2).toArray)).sortBy(_._1)
    val probes = rows.filter(r =>
      r._1 % KnnShapley.probeMod == KnnShapley.probeRes)
    assert(probes.nonEmpty)
    val k = KnnShapley.shapK
    // sequential replay: per probe, rank by the same fold-order dot,
    // run the recursion with the same per-term quantization
    val expect = scala.collection.mutable.Map.empty[Long, Long]
    var effOk = true
    probes.foreach { case (pid, plabel, pvec) =>
      def dot(a: Array[Float], b: Array[Float]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
        s
      }
      val train = rows.filter(_._1 != pid)
        .map { case (id, l, v) => (id, l, dot(v, pvec)) }
        .sortBy { case (id, _, c) => (-c, id) } // cosine desc, id asc
      val n = train.length
      val m = train.map(t => if (t._2 == plabel) 1L else 0L)
      // SQL ROUND is half-AWAY-FROM-ZERO on negatives (both engines);
      // Java's math.round is floor(x+0.5) — they differ at −x.5
      def rnd(x: Double): Long =
        if (x >= 0) math.floor(x + 0.5).toLong
        else math.ceil(x - 0.5).toLong
      val s = new Array[Long](n)
      s(n - 1) = rnd(1e6 * m(n - 1) / n)
      var j = n - 2
      while (j >= 0) {
        s(j) = s(j + 1) +
          rnd(1e6 * (m(j) - m(j + 1)) / math.max(j + 1, k))
        j -= 1
      }
      train.zipWithIndex.foreach { case ((id, _, _), i) =>
        expect(id) = expect.getOrElse(id, 0L) + s(i)
      }
      // efficiency identity on the UNQUANTIZED recursion (Jia et al.
      // Thm 1): Σ_j s_j = (1/K)·(top-K matches) — checked on exact
      // doubles, since the per-term micro quantization's error is
      // amplified by rank under the Σ_i i·δ_i telescope
      val st = new Array[Double](n)
      st(n - 1) = m(n - 1).toDouble / n
      var q = n - 2
      while (q >= 0) {
        st(q) = st(q + 1) +
          (m(q) - m(q + 1)).toDouble / math.max(q + 1, k)
        q -= 1
      }
      effOk &&= math.abs(st.sum - m.take(k).sum.toDouble / k) < 1e-9
    }
    assert(effOk, "efficiency identity violated beyond quantization")
    val got = KnnShapley.knnShapley(emb).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("shapley_sum_micro")).toMap
    assert(got.keySet === expect.keySet)
    got.foreach { case (id, v) =>
      assert(v === expect(id), s"vec $id: window $v != sequential")
    }
    // the valuation is non-trivial: labels agree with structure enough
    // that some points help and (with 10 label classes) many hurt
    assert(got.values.exists(_ > 0) && got.values.exists(_ < 0))
  }

  test("a planted mislabeled near-duplicate of the probe is the most " +
    "negative point") {
    import spark.implicits._
    // 1 probe (label 0) + its exact duplicate labeled 9 (poison) +
    // 40 orthogonal-ish points labeled 0
    val d = 8
    def v(seed: Int): Array[Float] = {
      val a = Array.tabulate(d)(i =>
        (((seed * 31 + i * 17) % 13) - 6).toFloat / 10f)
      a
    }
    val probe = Array.fill(d)(0f); probe(0) = 1f
    val poison = probe.clone()
    val rows =
      Seq((KnnShapley.probeRes, 0L, probe.toSeq),
        (1L, 9L, poison.toSeq)) ++
        (2L to 41L).filter(_ != KnnShapley.probeRes)
          .map(i => (i, 0L, v(i.toInt).toSeq))
    val emb = rows.toDF("vec_id", "label", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val out = KnnShapley.knnShapley(emb).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("shapley_sum_micro"))
    val worst = out.minBy(_._2)
    assert(worst._1 === 1L, s"poison not most negative: ${worst}")
    assert(worst._2 < 0L)
  }
}
