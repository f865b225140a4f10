package graft

import org.apache.spark.sql.functions._
import graft.ext.{RetrievalEval, Similarity}

/** Retrieval eval: metric identities on the testdata panel, the
  * query's own list is always a perfect hit for itself, and the metric
  * definitions recompute driver-side from the raw lists. */
class RetrievalEvalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("metrics bounded and self-hit present") {
    val out = RetrievalEval.qRetrievalMetrics(spark, dir).collect()
    assert(out.length === RetrievalEval.evalQueries)
    out.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0) // recall
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0) // mrr
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0 + 1e-12)
      // the query vector itself is in its home bucket at cosine =
      // ||q||² (the top), so the served list always has ≥1 true hit:
      // mrr > 0 and recall ≥ 1/k
      assert(r.getDouble(3) > 0.0)
      assert(r.getDouble(2) >= 1.0 / RetrievalEval.evalK)
    }
  }

  test("metrics recompute from the raw lists (driver-side definition)") {
    val emb = Tables(spark, dir, "embeddings")
    val vecs = emb.orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x.toDouble * y.toDouble }
    def bucket(v: Array[Float]): Int =
      (0 until Similarity.annLshDetBits)
        .map(j => if (v(j) >= 0) 1 << j else 0).sum
    val k = RetrievalEval.evalK
    val out = RetrievalEval.qRetrievalMetrics(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    for (q <- 0L until RetrievalEval.evalQueries.toLong) {
      val qv = vecs(q); val qb = bucket(qv)
      def topk(pool: Iterable[Long]): Seq[Long] =
        pool.toSeq.map(id => (id, cos(vecs(id), qv)))
          .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1)
      val truth = topk(vecs.keys)
      val served = topk(vecs.keys.filter(id =>
        Integer.bitCount(bucket(vecs(id)) ^ qb) <= 1))
      val hits = served.zipWithIndex.collect {
        case (id, i) if truth.contains(id) => i + 1 }
      val recall = hits.size.toDouble / k
      val mrr = if (hits.isEmpty) 0.0 else 1.0 / hits.min
      val dcg = hits.map(r => 1.0 / math.log(r + 1.0)).sum
      val idcg = (1 to k).map(i => 1.0 / math.log(i + 1.0)).sum
      val row = out(q)
      assert(math.abs(row.getDouble(2) - recall) < 1e-12, s"recall q=$q")
      assert(math.abs(row.getDouble(3) - mrr) < 1e-12, s"mrr q=$q")
      assert(math.abs(row.getDouble(4) - dcg / idcg) < 1e-9, s"ndcg q=$q")
    }
  }
}
