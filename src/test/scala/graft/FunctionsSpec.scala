package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.ext.Similarity
import graft.functions.GraftFunctions

/** Native codegen'd vec_dot vs the interpreted HOF formulation: the two
  * must agree BIT-EXACTLY (same sequential left fold in double space) on
  * real embeddings and on adversarial random vectors, and the function
  * must be callable from SQL text after registration. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("vec_dot == HOF fold bit-exactly on the embeddings table") {
    val emb = Tables(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val both = emb.crossJoin(broadcast(q)).select(
      Similarity.dot(col("embedding"), col("qv")).as("native"),
      Similarity.dotHof(col("embedding"), col("qv")).as("hof"))
    val rows = both.collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      // bitwise equality, not epsilon — same IEEE op sequence
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("vec_dot == HOF fold on random vectors (property)") {
    val genVec = Gen.listOfN(16, Gen.chooseNum(-1e6f, 1e6f))
    forAllSamples(Gen.zip(genVec, genVec), n = 50) { case (a, b) =>
      val df = Seq((a.toArray, b.toArray)).toDF("a", "b")
      val Array(row) = df.select(
        Similarity.dot(col("a"), col("b")).as("native"),
        Similarity.dotHof(col("a"), col("b")).as("hof")).collect()
      assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(row.getDouble(1)))
    }
  }

  test("vec_dot: mismatched lengths -> null, null input -> null") {
    val df = Seq(
      (Array(1f, 2f), Array(1f, 2f, 3f)),
      (null.asInstanceOf[Array[Float]], Array(1f))
    ).toDF("a", "b")
    val out = df.select(Similarity.dot(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("vec_dot is callable from SQL text after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT))) AS d").head()
    assert(r.getDouble(0) === 9.0)
  }

  test("shingles3 native == HOF formulation exactly, including order") {
    val docs = Tables(spark, dir, "documents")
    val both = docs.select(
      graft.ext.Dedup.shingles3(col("text")).as("native"),
      graft.ext.Dedup.shingles3Hof(col("text")).as("hof"))
    val rows = both.collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1))
    }
    // edge cases: < 3 tokens falls back to whole text; empty tokens kept
    val edge = Seq("one two", "a  b c d", "").toDF("text")
      .select(graft.ext.Dedup.shingles3(col("text")).as("n"),
        graft.ext.Dedup.shingles3Hof(col("text")).as("h"))
      .collect()
    edge.foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1)))
  }

  test("shingles3_hashed == transform(shingles3, xxhash64) exactly") {
    val docs = Tables(spark, dir, "documents")
    val both = docs.select(
      graft.ext.Dedup.shingles3Hashed(col("text")).as("fused"),
      transform(graft.ext.Dedup.shingles3(col("text")),
        g => xxhash64(g)).as("composed"))
    val rows = both.collect()
    assert(rows.length === 500)
    rows.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
    // edge cases: < 3 tokens (whole-text hash), doubled/leading spaces,
    // empty string
    val edge = Seq("one two", "a  b c d", " lead sp ace", "")
      .toDF("text")
      .select(graft.ext.Dedup.shingles3Hashed(col("text")).as("f"),
        transform(graft.ext.Dedup.shingles3(col("text")),
          g => xxhash64(g)).as("c"))
      .collect()
    edge.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("shingles3_md5 == transform(shingles3, 15-hex-digit md5 parse)") {
    // the composed form is the spec: first 15 hex digits of md5(shingle)
    // parsed base-16 — exactly what the DuckDB oracle's Horner fold
    // computes (Dedup.qDedupSimhashSql)
    def composed(c: org.apache.spark.sql.Column) =
      transform(graft.ext.Dedup.shingles3(c),
        g => conv(substring(md5(g.cast("binary")), 1, 15), 16, 10)
          .cast("long"))
    val docs = Tables(spark, dir, "documents")
    val both = docs.select(
      org.apache.spark.sql.graftshim.Shingles3Md5
        .shingles3Md5(col("text")).as("fused"),
      composed(col("text")).as("comp"))
    val rows = both.collect()
    assert(rows.length === 500)
    rows.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
    // values are 60-bit: top 4 bits clear, so simhash bits 60-63 can
    // never be set — the property the oracle's 60-term fold relies on
    rows.foreach(r => r.getSeq[Long](0).foreach(h =>
      assert((h >>> 60) === 0L)))
    val edge = Seq("one two", "a  b c d", " lead sp ace", "")
      .toDF("text")
      .select(org.apache.spark.sql.graftshim.Shingles3Md5
        .shingles3Md5(col("text")).as("f"),
        composed(col("text")).as("c"))
      .collect()
    edge.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("strip_excel is SQL-callable and matches btrim semantics") {
    GraftFunctions.register(spark)
    val r = spark.sql("""SELECT strip_excel('="0123"') AS s""").head()
    assert(r.getString(0) === "0123")
    // untouched strings pass through
    assert(spark.sql("SELECT strip_excel('plain') AS s")
      .head().getString(0) === "plain")
  }

  test("text-pipeline expressions are SQL-callable after registration") {
    GraftFunctions.register(spark)
    assert(spark.sql(
      "SELECT simhash64(shingles3_hashed('a b c d e')) AS s")
      .head().getLong(0) ===
      spark.sql(
        "SELECT simhash64(transform(shingles3('a b c d e'), g -> xxhash64(g))) AS s")
        .head().getLong(0))
    assert(spark.sql("SELECT size(minhash16(array(1L, 2L, 3L))) AS n")
      .head().getInt(0) === 16)
    assert(spark.sql("SELECT bigram_rep_ratio('x y x y x y') AS r")
      .head().getDouble(0) > 0.5)
    assert(spark.sql("SELECT size(pair_combos(array(1L, 2L, 3L))) AS n")
      .head().getInt(0) === 3)
    assert(spark.sql("SELECT size(winnow_fingerprints('abcdefghijklmnop')) AS n")
      .head().getInt(0) >= 1)
    assert(spark.sql("SELECT size(trigram_counts('abcd')) AS n")
      .head().getInt(0) === 2)
  }

  test("vec_dot stays inside whole-stage codegen") {
    val emb = Tables(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    // AQE defers physical planning, so CodegenMode sees no subtrees
    // until execution; turn it off for the static plan inspection only.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val code = emb.crossJoin(broadcast(q))
        .select(Similarity.dot(col("embedding"), col("qv")).as("d"))
        .queryExecution.explainString(
          org.apache.spark.sql.execution.CodegenMode)
      assert(code.contains("WholeStageCodegen"))
      // the generated Java contains the primitive loop, not an eval() call
      assert(code.contains(".getFloat("))
      assert(!code.contains("nullSafeEval"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
