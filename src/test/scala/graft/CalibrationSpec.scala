package graft

import org.apache.spark.sql.functions._
import graft.ext.CorpusOps

/** Calibration table: decile partition properties and consistency with
  * the inference output it rolls up. (Cross-engine equality — the
  * ntile identity vs DuckDB's native ntile — is the driver's hash
  * check; ExtSpec already replays the training unroll itself.) */
class CalibrationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("calibration: equal-count deciles, monotone score bands") {
    val cal = CorpusOps.qCalibration(spark, dir).orderBy("decile").collect()
    assert(cal.map(_.getInt(0)).toSeq === (1 to 10))
    val sizes = cal.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1)
    // equal-count bins over a total order: bands don't overlap
    val bands = cal.map(r => (r.getLong(2), r.getLong(3)))
    bands.sliding(2).foreach { case Array((_, hi), (lo2, _)) =>
      assert(hi <= lo2)
    }
  }

  test("calibration: rollup totals match the inference output") {
    val cal = CorpusOps.qCalibration(spark, dir)
      .agg(sum("n_docs"), sum("n_pred_pos"), sum("n_label_pos")).head
    val inf = CorpusOps.qClassifierInfer(spark, dir)
      .agg(count(lit(1)), sum(col("pred").cast("bigint")),
        sum(col("y").cast("bigint"))).head
    assert(cal.getLong(0) === inf.getLong(0))
    assert(cal.getLong(1) === inf.getLong(1))
    assert(cal.getLong(2) === inf.getLong(2))
  }
}
