package graft

import org.apache.spark.sql.functions._
import graft.ext.CorpusOps

/** Quantile normalization: distribution-alignment properties on the
  * corpus (the DuckDB hash check is the cross-engine gate). */
class QuantileNormSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("quantile norm: rank-monotone within source, permille in range") {
    val out = CorpusOps.qQuantileNorm(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val p = r.getLong(r.fieldIndex("permille"))
      assert(p >= 0 && p <= 1000)
    }
    // within a source, norm_score is monotone in raw score
    out.groupBy(_.getString(1)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(r => (r.getLong(2), r.getLong(0)))
      val norms = sorted.map(_.getLong(4))
      assert(norms.zip(norms.tail).forall { case (a, b) => a <= b })
    }
  }

  test("quantile norm: extremes map to corpus extremes") {
    val out = CorpusOps.qQuantileNorm(spark, dir)
    val corpus = out.agg(min("score"), max("score")).head
    val (cmin, cmax) = (corpus.getLong(0), corpus.getLong(1))
    // every source's rank-0 doc lands on the corpus minimum, and its
    // rank-1000 doc on the corpus maximum (target_rank 1 and N)
    val lows = out.filter(col("permille") === 0)
      .select("norm_score").distinct().collect().map(_.getLong(0))
    val highs = out.filter(col("permille") === 1000)
      .select("norm_score").distinct().collect().map(_.getLong(0))
    assert(lows.toSeq === Seq(cmin))
    assert(highs.toSeq === Seq(cmax))
  }

  test("quantile norm: normalized distributions agree across sources") {
    // after normalization, each source's median normalized score sits
    // near the corpus median raw score — the point of the operator
    val out = CorpusOps.qQuantileNorm(spark, dir).cache()
    val corpusMedian = out.select(expr("percentile(score, 0.5)")).head.getDouble(0)
    val perSource = out.groupBy("source")
      .agg(expr("percentile(norm_score, 0.5)").as("m")).collect()
    val span = out.agg(max("score") - min("score")).head.getLong(0).toDouble
    perSource.foreach { r =>
      assert(math.abs(r.getDouble(1) - corpusMedian) <= span * 0.05,
        s"source ${r.getString(0)} median ${r.getDouble(1)} vs corpus $corpusMedian")
    }
    out.unpersist()
  }
}
