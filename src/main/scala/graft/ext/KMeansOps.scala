package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Integer-exact Lloyd k-means over the embeddings table — the
  * clustering primitive behind cluster-balanced data selection (and the
  * oracle-checkable cross-validation of the float k-means the IVF index
  * family fits internally, `Similarity.fitCentroids`).
  *
  * Everything runs in integer space so the driver's DuckDB oracle can
  * replay ALL of it bit-for-bit, iterations included:
  *  - inputs quantize to milli-units (round(x·1000) — exact longs);
  *  - centroids live in micro-units, updated with the overflow-safe
  *    exact mean  (s div n)·1000 + ((s mod n)·1000) div n  — equal to
  *    (s·1000) div n by the division identity but never forming s·1000,
  *    so per-cluster sums stay in long range even at 10¹² members
  *    (truncating div/% agree between Spark, Java and DuckDB);
  *  - distances are exact integer squared-L2; argmin ties break toward
  *    the smaller cluster id.
  * Deterministic seeding: the k vectors with the smallest
  * (md5(vec_id), vec_id) — the engine's standard replayable hash coin.
  *
  * Scale shape per iteration: assignment is MAP-ONLY (k centroid
  * literals broadcast into the scan as codegen'd zip_with/aggregate
  * folds — no join, no UDF); the update is one posexplode + partial
  * hash-aggregate whose shuffle carries k·dims rows PER PARTITION
  * (never the corpus), collected as k·dims driver metadata. Lloyd at
  * 100 TB is k·dims·iters longs of driver state and iters+1 scans.
  */
object KMeansOps {

  val kmK = 8
  val kmIters = 3
  private val milli = 1000

  /** Exact truncating mean in micro-units, overflow-safe (never forms
    * s·1000): identical to (s·1000) div n for truncating division. */
  private def meanMicro(s: Long, n: Long): Long =
    (s / n) * milli + ((s % n) * milli) / n

  private def quantized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      transform(col("embedding"),
        x => round(x.cast("double") * milli).cast("long")).as("xm"))

  /** Map-only assignment against literal centroids: per-cluster exact
    * integer squared-L2 via zip_with + aggregate folds, argmin with
    * smaller-cluster tie-break via least + first-match CASE. */
  private def assignFrame(q: DataFrame,
                          cents: Array[Array[Long]]): DataFrame = {
    val dCols = cents.indices.map { c =>
      aggregate(
        zip_with(col("xm"), typedLit(cents(c)), (x, ct) => {
          val dd = x * milli - ct
          dd * dd
        }),
        lit(0L), (acc, v) => acc + v).as(s"d$c")
    }
    val withD = q.select(col("vec_id") +: dCols: _*)
    val m = least(cents.indices.map(c => col(s"d$c")): _*)
    val pred = cents.indices.foldRight(lit(-1): Column)((c, rest) =>
      when(col(s"d$c") === m, c).otherwise(rest))
    withD.select(col("vec_id"), pred.as("cluster"), m.as("d2"))
  }

  /** One Lloyd update: k·dims partial-agg sums → driver; clusters that
    * lost every member keep their previous centroid. */
  private def updateCents(q: DataFrame, assigned: DataFrame,
                          prev: Array[Array[Long]]): Array[Array[Long]] = {
    val rows = q.join(assigned.select("vec_id", "cluster"), "vec_id")
      .select(col("cluster"), posexplode(col("xm")).as(Seq("j", "x")))
      .groupBy("cluster", "j")
      .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
      .collect() // k × dims rows — bounded driver metadata
    val byCluster = rows.groupBy(_.getInt(0))
    prev.indices.map { c =>
      byCluster.get(c) match {
        case Some(rs) => rs.sortBy(_.getInt(1))
          .map(r => meanMicro(r.getLong(2), r.getLong(3))).toArray
        case None => prev(c)
      }
    }.toArray
  }

  /** Full Lloyd run; returns the FINAL assignment (vec_id, cluster,
    * exact squared distance in micro²-units). */
  def kmeans(emb: DataFrame, k: Int = kmK,
             iters: Int = kmIters): DataFrame = {
    val q = quantized(emb)
    val seedIds = emb
      .select(col("vec_id"),
        md5(col("vec_id").cast("string").cast("binary")).as("h"))
      .orderBy(col("h"), col("vec_id")).limit(k)
      .collect().map(_.getLong(0))
    val seedXm = q.filter(col("vec_id").isin(seedIds: _*)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    var cents = seedIds.map(id => seedXm(id).map(_ * milli.toLong))
    for (_ <- 1 until iters)
      cents = updateCents(q, assignFrame(q, cents), cents)
    assignFrame(q, cents)
  }

  def qKmeans(spark: SparkSession, dir: String): DataFrame =
    kmeans(Tables(spark, dir, "embeddings"))

  /** Cluster-balanced diversity sample — per final cluster, the m
    * lowest (md5(vec_id), vec_id) members: the "take a quota from every
    * region of embedding space" selection step cluster-based curation
    * pipelines run after k-means. Rank ≤ m over a per-cluster window
    * plans as WindowGroupLimit — the per-group limit is pushed below
    * the sort, so the exchange carries ≤ m·k rows. */
  val clusterQuota = 10

  def clusterSample(emb: DataFrame, m: Int = clusterQuota): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster")
      .orderBy(md5(col("vec_id").cast("string").cast("binary")),
        col("vec_id"))
    kmeans(emb)
      .select(col("vec_id"), col("cluster"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= m)
  }

  def qClusterSample(spark: SparkSession, dir: String): DataFrame =
    clusterSample(Tables(spark, dir, "embeddings"))

  /** Shared oracle CTE chain replaying the WHOLE Lloyd run — quantize,
    * seed, then per iteration distance/argmin/exact-mean-update CTEs
    * (the winnow/bpe_train full-replay technique). Ends with a{iters}
    * = (vec_id, cluster, d2). */
  private def kmCtes(k: Int, iters: Int): String = {
    val per = (1 until iters).map { i =>
      s"""dst$i AS (
         |  SELECT q.vec_id, c.cluster,
         |    CAST(SUM((q.xm*1000 - c.c)*(q.xm*1000 - c.c)) AS BIGINT) AS d2
         |  FROM q JOIN c${i - 1} c ON q.j = c.j GROUP BY 1, 2),
         |a$i AS (
         |  SELECT vec_id, cluster, d2 FROM (
         |    SELECT vec_id, cluster, d2, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY d2, cluster) AS rn
         |    FROM dst$i) t WHERE rn = 1),
         |u$i AS (
         |  SELECT a.cluster, q.j,
         |    (CAST(SUM(q.xm) AS BIGINT) // COUNT(*)) * 1000
         |      + ((CAST(SUM(q.xm) AS BIGINT) % COUNT(*)) * 1000)
         |        // COUNT(*) AS c
         |  FROM a$i a JOIN q USING (vec_id) GROUP BY 1, 2),
         |c$i AS (
         |  SELECT c.cluster, c.j, COALESCE(u.c, c.c) AS c
         |  FROM c${i - 1} c LEFT JOIN u$i u
         |    ON c.cluster = u.cluster AND c.j = u.j)""".stripMargin
    }.mkString(",\n")
    s"""q AS (
       |  SELECT vec_id, j,
       |    CAST(round(CAST(embedding[j] AS DOUBLE) * 1000.0) AS BIGINT)
       |      AS xm
       |  FROM embeddings,
       |    LATERAL unnest(generate_series(1, len(embedding))) AS u(j)),
       |sd AS (
       |  SELECT vec_id, rn - 1 AS cluster FROM (
       |    SELECT vec_id, row_number() OVER (
       |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
       |    FROM embeddings) t WHERE rn <= $k),
       |c0 AS (
       |  SELECT sd.cluster, q.j, q.xm * 1000 AS c
       |  FROM sd JOIN q USING (vec_id)),
       |$per,
       |dst$iters AS (
       |  SELECT q.vec_id, c.cluster,
       |    CAST(SUM((q.xm*1000 - c.c)*(q.xm*1000 - c.c)) AS BIGINT) AS d2
       |  FROM q JOIN c${iters - 1} c ON q.j = c.j GROUP BY 1, 2),
       |a$iters AS (
       |  SELECT vec_id, cluster, d2 FROM (
       |    SELECT vec_id, cluster, d2, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY d2, cluster) AS rn
       |    FROM dst$iters) t WHERE rn = 1)""".stripMargin
  }

  val qKmeansSql: String =
    s"""WITH ${kmCtes(kmK, kmIters)}
       |SELECT vec_id, CAST(cluster AS INTEGER) AS cluster, d2
       |FROM a$kmIters""".stripMargin

  val qClusterSampleSql: String =
    s"""WITH ${kmCtes(kmK, kmIters)}
       |SELECT vec_id, CAST(cluster AS INTEGER) AS cluster, rk FROM (
       |  SELECT vec_id, cluster, CAST(row_number() OVER (
       |    PARTITION BY cluster
       |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS BIGINT) AS rk
       |  FROM a$kmIters) t
       |WHERE rk <= $clusterQuota""".stripMargin
}
