package graft

import org.apache.spark.sql.functions._
import graft.ext.Curriculum

class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  private def scored(rows: (Long, Long, Long)*) =
    rows.toSeq.toDF("doc_id", "n_bigrams", "nll_micro")

  test("phases are equal-count cuts of the difficulty order") {
    // 8 docs, difficulties 10,20,...,80 → 2 per phase
    val rows = (1L to 8L).map(i => (i, 1L, i * 10L))
    val out = Curriculum.schedule(scored(rows: _*)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("phase")).toMap
    assert(out(1L) === 0L && out(2L) === 0L)
    assert(out(3L) === 1L && out(4L) === 1L)
    assert(out(5L) === 2L && out(6L) === 2L)
    assert(out(7L) === 3L && out(8L) === 3L)
  }

  test("difficulty is integer avg nll; bigram-less docs are easiest") {
    val out = Curriculum.schedule(scored(
      (1L, 3L, 100L), (2L, 0L, 0L), (3L, 2L, 999L))).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("diff_micro"), r.getAs[Long]("phase")))).toMap
    assert(out(1L)._1 === 33L)  // 100 div 3
    assert(out(2L)._1 === 0L)   // no bigrams → 0
    assert(out(3L)._1 === 499L) // 999 div 2
    assert(out(2L)._2 === 0L)   // easiest phase
  }

  test("shards are deterministic and within range") {
    val rows = (1L to 100L).map(i => (i, 1L, i))
    val a = Curriculum.schedule(scored(rows: _*)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shard")).toMap
    val b = Curriculum.schedule(scored(rows: _*)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shard")).toMap
    assert(a === b)
    assert(a.values.forall(s => s >= 0L && s < Curriculum.nShards))
    assert(a.values.toSet.size > 1) // not all in one shard
  }

  test("driver query: full cover, ordered phases, exact quartile sizes") {
    val out = Curriculum.qCurriculum(spark, "/root/testdata/sf0.001")
      .collect()
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert(out.length === docs)
    // phase sizes differ by at most 1 (exact equal-count cut)
    val sizes = out.groupBy(_.getAs[Long]("phase")).map(_._2.length)
    assert(sizes.max - sizes.min <= 1)
    // difficulty is monotone across phase boundaries
    val maxByPhase = out.groupBy(_.getAs[Long]("phase"))
      .map { case (p, rs) => p -> rs.map(_.getAs[Long]("diff_micro")).max }
    val minByPhase = out.groupBy(_.getAs[Long]("phase"))
      .map { case (p, rs) => p -> rs.map(_.getAs[Long]("diff_micro")).min }
    (0L until Curriculum.nPhases - 1).foreach { p =>
      assert(maxByPhase(p) <= minByPhase(p + 1))
    }
  }
}
