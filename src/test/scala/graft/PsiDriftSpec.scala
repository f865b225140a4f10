package graft

import org.apache.spark.sql.functions._
import graft.operators.PsiDrift

class PsiDriftSpec extends SparkSpec {
  import spark.implicits._

  private def feat(rows: Seq[(String, Long)]) = rows.toDF("side", "cents")

  test("identical distributions score zero and don't alarm") {
    val rows = (0 until 100).flatMap { i =>
      val cents = (i % 10) * PsiDrift.bucketCents + 17L
      Seq(("ref", cents), ("cur", cents))
    }
    val out = PsiDrift.psiDrift(feat(rows)).collect()
    assert(out.length === 10) // full bucket domain, even when sparse
    assert(out.forall(_.getAs[Long]("psi_micro") === 0L))
    assert(out.forall(_.getAs[Int]("drifted") === 0))
  }

  test("a planted mass shift alarms; PSI terms are non-negative") {
    // ref concentrates in bucket 0, cur in bucket 9
    val rows = (0 until 200).map(_ => ("ref", 100L)) ++
      (0 until 200).map(_ => ("cur", 9L * PsiDrift.bucketCents + 100L))
    val out = PsiDrift.psiDrift(feat(rows)).collect()
    assert(out.forall(_.getAs[Long]("psi_micro") >= 0L)) // sign lemma
    assert(out.forall(_.getAs[Int]("drifted") === 1))
    val total = out.head.getAs[Long]("psi_total_micro")
    assert(total >= PsiDrift.alarmMicro)
    assert(out.forall(_.getAs[Long]("psi_total_micro") === total))
    // the moved-mass buckets carry the score
    val byBucket = out.map(r =>
      r.getAs[Long]("bucket") -> r.getAs[Long]("psi_micro")).toMap
    assert(byBucket(0L) > 0L && byBucket(9L) > 0L)
    assert((1L to 8L).forall(byBucket(_) === 0L))
  }

  test("tail amounts clamp into the last bucket") {
    val rows = Seq(("ref", 999L * PsiDrift.bucketCents), ("cur", 0L))
    val out = PsiDrift.psiDrift(feat(rows))
      .filter(col("bucket") === 9).collect()
    assert(out.head.getAs[Long]("c_ref") === 1L)
  }
}
