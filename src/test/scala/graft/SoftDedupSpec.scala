package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.ext.SoftDedup
import graft.operators.Aggregates

/** CUBE lattice and soft-dedup reweighting. */
class SoftDedupSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("cube: all four grouping levels in one pass; grand total row present") {
    val rows = Aggregates.qCube(spark, dir).collect()
    val levels = rows.map(r =>
      (r.getAs[Int]("g_rf"), r.getAs[Int]("g_ls"))).distinct.sorted
    assert(levels === Seq((0, 0), (0, 1), (1, 0), (1, 1)))
    val grand = rows.filter(r =>
      r.getAs[Int]("g_rf") == 1 && r.getAs[Int]("g_ls") == 1)
    assert(grand.length === 1)
    assert(grand(0).getAs[Long]("n_rows")
      === Tables(spark, dir, "lineitem").count())
  }

  test("soft dedup: cluster total weight is exactly one document") {
    val schema = StructType(Seq(StructField("doc_id", LongType, false),
      StructField("key", StringType, false),
      StructField("tokens", LongType, false)))
    val docs = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, "a", 10L), Row(2L, "a", 10L), Row(3L, "a", 10L),
      Row(4L, "b", 7L)), 2), schema)
    val out = SoftDedup.softWeights(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("weight_micro") === 333333L)
    assert(out(4L).getAs[Long]("weight_micro") === 1000000L)
    assert(out(1L).getAs[Long]("eff_tokens_micro") === 3333333L)
    assert(out(4L).getAs[Long]("eff_tokens_micro") === 7000000L)
    // per-cluster weight mass ≈ 1e6 (integer truncation only)
    val aMass = Seq(1L, 2L, 3L).map(out(_).getAs[Long]("weight_micro")).sum
    assert(aMass === 999999L)
  }

  test("soft dedup driver query: every document keeps a row; uniques weigh 1") {
    val out = SoftDedup.qSoftDedup(spark, dir).collect()
    assert(out.length === Tables(spark, dir, "documents").count())
    assert(out.filter(_.getAs[Long]("cluster_sz") == 1L)
      .forall(_.getAs[Long]("weight_micro") == 1000000L))
  }
}
