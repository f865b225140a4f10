package graft

import org.apache.spark.sql.functions._
import graft.ext.SqAnn

class SqAnnSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def emb(vs: Seq[(Long, Seq[Float])]) =
    vs.toDF("vec_id", "embedding")

  test("fit finds exact per-dimension extremes; constant dims are safe") {
    val g = SqAnn.fitGrid(emb(Seq(
      (0L, Seq(1.0f, 5.0f, 7.0f)),
      (1L, Seq(-3.0f, 5.0f, 2.0f)))))
    assert(g.mn.toSeq === Seq(-3.0, 5.0, 2.0))
    assert(g.mx.toSeq === Seq(1.0, 5.0, 7.0))
  }

  test("codes stay in [0,255]; extremes map to the grid ends") {
    val data = Seq((0L, Seq(1.0f, 5.0f, 7.0f)), (1L, Seq(-3.0f, 5.0f, 2.0f)))
    val g = SqAnn.fitGrid(emb(data))
    val codes = SqAnn.sqCodes(emb(data), g).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Long](1)).toMap
    assert(codes.values.forall(_.forall(c => c >= 0L && c <= 255L)))
    assert(codes(0L)(0) === 255L) // x = mx → top code
    assert(codes(1L)(0) === 0L)   // x = mn → bottom code
    assert(codes(0L)(1) === 0L)   // constant dim → code 0, no NaN
  }

  test("asymmetric score approximates the exact dot within grid error") {
    val embDf = spark.read.parquet(s"$dir/embeddings.parquet")
    val g = SqAnn.fitGrid(embDf)
    val q = embDf.filter(col("vec_id") === 0)
      .select(col("embedding")).head.getSeq[Float](0).map(_.toDouble)
    // |x̂·q − x·q| ≤ Σ_i |q_i|·step_i/2, plus 64 half-micro roundings
    val bound = q.indices.map(i =>
      math.abs(q(i)) * (g.mx(i) - g.mn(i)) / 255.0 / 2.0).sum + 64e-6
    val qv = embDf.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    val joined = SqAnn.sqScores(embDf.crossJoin(broadcast(qv)), col("qv"), g)
      .join(graft.ext.Similarity.qAnnCosineById(spark, dir), Seq("vec_id"))
      .select(abs(col("approx_micro") / 1e6 - col("cosine")).as("err"))
      .agg(max("err")).head.getDouble(0)
    assert(joined <= bound, s"max err $joined exceeds grid bound $bound")
  }

  test("driver query: 10 rows, recall floor met on testdata") {
    val out = SqAnn.qAnnSq(spark, dir).collect()
    assert(out.length === 10)
    assert(out.forall(_.getAs[Boolean]("recall_ok")))
    // ranked by approx score, ties by vec_id
    val scores = out.map(_.getAs[Long]("approx_micro")).toSeq
    assert(scores === scores.sorted.reverse)
  }
}
