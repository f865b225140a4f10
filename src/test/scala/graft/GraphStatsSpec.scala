package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{GraphStats, LabelProp, PageRank}
import graft.ext.CorpusQa

/** Graph quality readouts (modularity, assortativity) and corpus
  * metadata QA (lang confusion, word entropy). */
class GraphStatsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def edgeDf(es: Seq[(Long, Long, Long)]) = {
    val schema = StructType(Seq(StructField("src", LongType, false),
      StructField("dst", LongType, false),
      StructField("w", LongType, false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(es.map(e => Row(e._1, e._2, e._3)), 2),
      schema)
  }

  private def commDf(cs: Seq[(Long, Long)]) = {
    val schema = StructType(Seq(
      StructField("p_partkey", LongType, false),
      StructField("community", LongType, false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(cs.map(c => Row(c._1, c._2)), 2),
      schema)
  }

  test("modularity: two disconnected triangles under their own labels score 1/2") {
    // triangle {1,2,3} and {4,5,6}, unit weights, both directions
    def tri(a: Long, b: Long, c: Long) = Seq(
      (a, b, 1L), (b, a, 1L), (a, c, 1L), (c, a, 1L), (b, c, 1L), (c, b, 1L))
    val edges = edgeDf(tri(1, 2, 3) ++ tri(4, 5, 6))
    val comm = commDf(Seq(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L))
    val out = GraphStats.modularity(edges, comm).collect()
    assert(out.length === 2)
    // each community: internal 6/12, degree share 1/2 → 1/2 − 1/4
    assert(out.forall(_.getAs[Long]("q_contrib_micro") === 250000L))
    assert(out.forall(_.getAs[Long]("internal_w") === 6L))
    // merging everything into ONE community scores exactly 0
    val one = GraphStats.modularity(edges,
      commDf((1L to 6L).map(_ -> 1L))).collect()
    assert(one.length === 1)
    assert(one(0).getAs[Long]("q_contrib_micro") === 0L)
  }

  test("modularity driver query: contribs recompute from edges + LPA labels") {
    val edges = PageRank.coPurchaseEdgesMemo(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val comm = LabelProp.qLabelProp(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val m2 = edges.map(_._3).sum.toDouble
    val by = edges.groupBy(e => comm(e._1))
    val expect = by.map { case (c, es) =>
      val win = es.filter(e => comm(e._2) == c).map(_._3).sum
      val deg = es.map(_._3).sum
      c -> math.round(1e6 * (win / m2 - (deg / m2) * (deg / m2)))
    }
    val got = GraphStats.qModularity(spark, dir).collect()
      .map(r => r.getAs[Long]("community") ->
        r.getAs[Long]("q_contrib_micro")).toMap
    assert(got === expect)
    // LPA after 3 sweeps must beat the trivial one-community split (0)
    assert(got.values.sum > 0L, "LPA communities carry positive modularity")
  }

  test("assortativity: star is exactly -1, cycle is degenerate 0") {
    val star = edgeDf((2L to 7L).flatMap(l =>
      Seq((1L, l, 1L), (l, 1L, 1L))))
    assert(GraphStats.assortativity(star).head
      .getAs[Long]("r_micro") === -1000000L)
    val cycle = edgeDf((0L until 8L).flatMap { i =>
      val j = (i + 1) % 8
      Seq((i, j, 1L), (j, i, 1L))
    })
    assert(GraphStats.assortativity(cycle).head
      .getAs[Long]("r_micro") === 0L) // zero variance → surfaced as 0
  }

  test("lang confusion: cells partition the corpus, shares sum per declared lang") {
    val out = CorpusQa.qLangConfusion(spark, dir).collect()
    val total = Tables(spark, dir, "documents").count()
    assert(out.map(_.getAs[Long]("n_docs")).sum === total)
    for ((_, rows) <- out.groupBy(_.getAs[String]("lang_declared"))) {
      val s = rows.map(_.getAs[Long]("declared_share_micro")).sum
      assert(math.abs(s - 1000000L) <= rows.length,
        "rounded shares sum to ~1 per declared lang")
    }
  }

  test("word entropy: degenerate docs score 0, uniform doc scores ln k, " +
    "driver rows replay brute-force") {
    import spark.implicits._
    val docs = Seq((1L, "x x x x"), (2L, "a b a b"), (3L, "p q r s"))
      .toDF("doc_id", "text")
    // synthetic docs go through the same expression the operator uses
    val counts = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    val totals = counts.groupBy("doc_id").agg(
      sum(col("c")).as("n_tokens"), count(lit(1)).as("n_types"))
    val ent = counts.join(totals, Seq("doc_id"))
      .selectExpr("doc_id",
        """cast(round(1000000.0
          | * (cast(c as double) / cast(n_tokens as double))
          | * ln(cast(n_tokens as double) / cast(c as double)))
          | as bigint) as t""".stripMargin.replace("\n", " "))
      .groupBy("doc_id").agg(sum("t").as("e"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("e")).toMap
    assert(ent(1L) === 0L)
    assert(ent(2L) === 2 * math.round(0.5e6 * math.log(2)))
    assert(ent(3L) === 4 * math.round(0.25e6 * math.log(4)))
    // the real driver query replays brute-force per doc
    val brute = Tables(spark, dir, "documents").collect().flatMap { r =>
      val id = r.getAs[Long]("doc_id")
      val ws = r.getAs[String]("text").split(" ").filter(_.nonEmpty)
      if (ws.isEmpty) None else {
        val n = ws.length.toDouble
        val h = ws.groupBy(identity).values.map { g =>
          math.round(1e6 * (g.length / n) * math.log(n / g.length))
        }.sum
        Some(id -> h)
      }
    }.toMap
    val driver = CorpusQa.qWordEntropy(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("entropy_micro")).toMap
    assert(driver === brute)
  }

  test("heaps law: curve replays brute-force, fit replays OLS on the points") {
    import java.security.MessageDigest
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val bucketOf = (id: Long) =>
      (java.lang.Long.parseUnsignedLong(
        md5hex(id.toString).take(15), 16) % 10).toInt
    val docs = Tables(spark, dir, "documents").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val toks = docs.flatMap { case (id, t) =>
      t.split(" ").filter(_.nonEmpty).map(w => (w, bucketOf(id))) }
    val nTok = toks.groupBy(_._2).map { case (b, xs) => b -> xs.length }
    val minB = toks.groupBy(_._1).map { case (w, xs) =>
      w -> xs.map(_._2).min }
    val expect = (1 to 10).flatMap { k =>
      val n = (0 until k).map(b => nTok.getOrElse(b, 0)).sum.toLong
      val v = minB.values.count(_ <= k - 1).toLong
      if (n > 0 && v > 0) Some((k.toLong, n, v)) else None
    }
    val got = CorpusQa.qHeapsLaw(spark, dir)
      .orderBy("train_buckets").collect()
    assert(got.map(r => (r.getAs[Long]("train_buckets"),
      r.getAs[Long]("tokens_cum"), r.getAs[Long]("types_cum"))).toSeq
      === expect)
    // OLS replay over the quantized points
    val xs = got.map(_.getAs[Long]("x_micro"))
    val ys = got.map(_.getAs[Long]("y_micro"))
    assert(xs.zip(got).forall { case (x, r) =>
      x === math.round(1e6 * math.log(r.getAs[Long]("tokens_cum"))) })
    val np = xs.length.toLong
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val beta = math.round(1e6 * (np.toDouble * sxy - sx.toDouble * sy) /
      (np.toDouble * sxx - sx.toDouble * sx))
    assert(got.forall(_.getAs[Long]("beta_micro") === beta))
    // sub-linear vocabulary growth; the synthetic corpus' ~31-word
    // vocab saturates in the first bucket, so β = 0 is the CORRECT
    // fit here (flat V(N)) — the bound is [0, 1)
    assert(beta >= 0L && beta < 1000000L)
  }
}
