package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Similarity search over the `embeddings` table (64-dim float vectors,
  * unit-normalized — dot product IS cosine), plus distinct-count
  * sketches.
  *
  * Scale design:
  *  - brute-force top-k broadcasts the query vector and plans as
  *    TakeOrderedAndProject — per-partition top-k heaps, k-row driver
  *    merge, no global sort. This is the correct *baseline* even at
  *    100 TB for single queries;
  *  - the LSH variant buckets vectors by sign-bits of projections onto
  *    deterministic pseudo-random hyperplanes, then scans only the
  *    query's bucket — the standard recall/cost dial when query volume
  *    makes full scans too expensive. Bucketing is a map-only projection
  *    (hyperplanes derived from hashes, no stored model).
  */
object Similarity {

  /** Exact dot product of two equal-length float-array columns in double
    * space — a sequential left fold in element order, the same order
    * DuckDB's list_sum uses, so results hash-compare. Backed by the
    * native codegen'd [[graft.functions.FloatVectorDot]]; [[dotHof]]
    * keeps the built-in-composition form as the semantic cross-check. */
  def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.vecDot(a, b)

  /** The higher-order-function formulation of [[dot]] (interpreted, not
    * codegen'd) — retained as the independent reference implementation
    * the FunctionsSpec equivalence property runs against. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Every vector's exact cosine against query vec 0, no top-k — the
    * VALUE oracle for the ANN family. q_ann_lsh / q_ann_ivf membership
    * is seeded-hash / trained-model specific (rows-only checks), but
    * cosine is a pure function of vec_id, and this full table is
    * hash-checked against DuckDB: any (vec_id, cosine) row the ANN
    * queries can return is a row of this table, so returned values are
    * oracle-verified even though membership isn't. ExtSpec closes the
    * loop by recomputing every cosine the LSH/IVF paths actually return.
    * Same broadcast-1-row + codegen'd [[dot]] plan as [[qAnnBrute]],
    * minus TakeOrderedAndProject — map-only at any scale. */
  def qAnnCosineById(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    emb.crossJoin(broadcast(q))
      .select(col("vec_id"), dot(col("embedding"), col("qv")).as("cosine"))
  }

  val qAnnCosineByIdSql: String =
    """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
      |SELECT vec_id,
      |  list_sum(list_transform(list_zip(embedding, qv),
      |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS cosine
      |FROM embeddings, q""".stripMargin

  /** Brute-force cosine top-10 neighbors of vec_id 0 — the cosine table
    * ([[qAnnCosineById]]) plus TakeOrderedAndProject, one definition of
    * the projection shared by both (the transactionsInnerSql pattern). */
  def qAnnBrute(spark: SparkSession, dir: String): DataFrame =
    qAnnCosineById(spark, dir)
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(10)

  val qAnnBruteSql: String =
    qAnnCosineByIdSql + "\nORDER BY cosine DESC, vec_id ASC\nLIMIT 10"

  /** Sign of the projection of `v` onto pseudo-random hyperplane `p`
    * (components ±1 derived from xxhash64(dim, plane) — deterministic,
    * no stored model). Multi-band callers pass disjoint plane-id ranges
    * (band b uses ids b·planes … b·planes+planes−1), so every band's
    * hyperplane set is independent. */
  private def planeBit(v: Column, p: Int): Column = {
    val contrib = transform(sequence(lit(1), lit(64)), i =>
      element_at(v, i).cast("double") *
        when(xxhash64(i, lit(p)).bitwiseAND(1) === 1, 1.0).otherwise(-1.0))
    when(aggregate(contrib, lit(0.0), (acc, x) => acc + x) >= 0, 1L)
      .otherwise(0L)
  }

  /** `planes`-bit sign-LSH bucket id for one band — shared by the ANN
    * query path (8 planes → 256 buckets, band 0) and embedding
    * pair-mining (where `planes` is sized to the corpus: expected
    * bucket size n/2^planes must stay well under the hot-bucket bound,
    * and `band` > 0 selects an independent hyperplane set). */
  private def signBucket(v: Column, planes: Int, band: Int = 0): Column =
    (0 until planes)
      .map(p => shiftleft(planeBit(v, band * planes + p), p)).reduce(_ + _)

  /** LSH-bucketed ANN with MULTI-PROBE (round 6): 8 signed projections →
    * 256 buckets; scan the query's bucket PLUS every bucket within
    * Hamming distance `probeRadius` of it (radius 1 = 9 of 256 buckets ≈
    * 3.5% of the corpus). Single-bucket probing loses any neighbor that
    * flips one plane — for a neighbor at angle θ the per-plane agreement
    * is 1 − θ/π, so at the moderate-similarity cosines a real query
    * chases, most true neighbors differ in exactly one bit; probing the
    * Hamming-1 shell is the standard recall/cost dial (multi-probe LSH)
    * and recovers them for 9× the scan of one bucket, still ~30× less
    * than a full scan. The probe set is driver-derived from the query
    * row (one 1-row lookup — bounded driver metadata, same pattern as
    * the IVF centroid probe); candidates are a bucket-membership filter,
    * then exact cosine + TakeOrderedAndProject top-k.
    * Spark-only (seeded hashes) — rows-only membership check; every
    * returned cosine is value-verified against q_ann_cosine_by_id. */
  def qAnnLsh(spark: SparkSession, dir: String): DataFrame =
    annLsh(spark, dir, probeRadius = 1)

  def annLsh(spark: SparkSession, dir: String, k: Int = 10,
             planes: Int = 8, probeRadius: Int = 1): DataFrame = {
    require(probeRadius >= 0 && probeRadius <= 2,
      "probeRadius beyond 2 approaches a full scan — use qAnnBrute")
    val emb = Tables(spark, dir, "embeddings")
    val bucketed = emb.select(col("vec_id"), col("embedding"),
      signBucket(col("embedding"), planes).as("bucket"))
    // one bounded driver lookup: the query's vector + home bucket
    // (NOTE this makes construction eager — same posture as qAnnIvf's
    // centroid probe; both ANN paths are driver-query shaped, not
    // composable lazy views)
    val qRows = bucketed.filter(col("vec_id") === 0)
      .select(col("embedding"), col("bucket")).take(1)
    require(qRows.nonEmpty, "query vector vec_id=0 not found in embeddings")
    val qRow = qRows(0)
    val qv = qRow.getSeq[Float](0)
    val qb = qRow.getLong(1)
    val shell1 = (0 until planes).map(p => qb ^ (1L << p))
    val shell2 =
      if (probeRadius < 2) Seq.empty
      else for {
        p1 <- 0 until planes; p2 <- (p1 + 1) until planes
      } yield qb ^ (1L << p1) ^ (1L << p2)
    val probes = (qb +: (if (probeRadius >= 1) shell1 else Seq.empty))
      .++(shell2).distinct
    val qcol = array(qv.map(lit(_)): _*)
    bucketed.filter(col("bucket").isInCollection(probes))
      .select(col("vec_id"), col("bucket"),
        dot(col("embedding"), qcol).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Sign-bit bucket width for [[qAnnLshDet]]: 2⁸ = 256 buckets, the
    * same 8-bit budget as [[qAnnLsh]]'s hyperplane band. */
  val annLshDetBits = 8

  /** [[qAnnLsh]] with a DETERMINISTIC bucket function — the
    * q_semdedup_det move applied to the ANN serving path: buckets come
    * from the SIGN BITS of the first [[annLshDetBits]] embedding
    * components (a pure, seedless function of the data any SQL engine
    * reproduces bit-for-bit) instead of hashed pseudo-random
    * hyperplanes, and the probe set is the same Hamming-1 shell —
    * derived IN-PLAN from a 1-row broadcast of the query's bucket, no
    * driver lookup at all. Everything that makes the production path
    * scale is unchanged: bucket is a map-only projection, candidates
    * are ~9/256 of the corpus, exact cosine + TakeOrderedAndProject
    * top-k. What changes is checkability: membership itself (which
    * buckets, which Hamming shell, which ties) is hash-checked against
    * [[qAnnLshDetSql]]'s full ANSI replay, closing the loop the
    * rows-only q_ann_lsh documents. Axis-sign buckets trade recall vs
    * data-adaptive or hashed planes (components are not isotropic), so
    * the seeded path stays the production default; this twin pins the
    * PIPELINE's semantics — probe-shell derivation included — in the
    * driver gate. */
  def qAnnLshDet(spark: SparkSession, dir: String): DataFrame = {
    val bits = annLshDetBits
    val emb = Tables(spark, dir, "embeddings")
    val bucketCol = (0 until bits)
      .map(j => when(element_at(col("embedding"), j + 1) >= 0, 1 << j)
        .otherwise(0))
      .reduce(_ + _).cast("int")
    val bucketed = emb.select(col("vec_id"), col("embedding"),
      bucketCol.as("bucket"))
    val q = bucketed.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), col("bucket").as("qb"))
    // Hamming distance between bucket ids as a sum of per-bit CASEs —
    // the formulation the oracle replays term-for-term; ≤ 1 selects the
    // home bucket plus its 8-bucket shell
    def hamming(a: Column, b: Column): Column = (0 until bits)
      .map(j => when(shiftright(a, j).bitwiseAND(1) =!=
        shiftright(b, j).bitwiseAND(1), 1).otherwise(0))
      .reduce(_ + _)
    bucketed.crossJoin(broadcast(q))
      .filter(hamming(col("bucket"), col("qb")) <= 1)
      .select(col("vec_id"), col("bucket"),
        dot(col("embedding"), col("qv")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(10)
  }

  /** Full ANSI replay of [[qAnnLshDet]]: sign-bit buckets, the scalar
    * query row, the per-bit Hamming ≤ 1 probe filter, the q_ann-proven
    * list_zip/list_sum dot, and the (cosine desc, vec_id) top-10. */
  val qAnnLshDetSql: String = {
    val bits = annLshDetBits
    val bucketExpr = (0 until bits)
      .map(j => s"(CASE WHEN embedding[${j + 1}] >= 0 THEN ${1 << j} ELSE 0 END)")
      .mkString(" + ")
    val hamming = (0 until bits)
      .map(j => s"(CASE WHEN (b.bucket >> $j) & 1 <> (q.qb >> $j) & 1 " +
        "THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH b AS (
      |  SELECT vec_id, embedding, CAST($bucketExpr AS INTEGER) AS bucket
      |  FROM embeddings),
      |q AS (SELECT embedding AS qv, bucket AS qb FROM b WHERE vec_id = 0)
      |SELECT b.vec_id, b.bucket,
      |  list_sum(list_transform(list_zip(b.embedding, q.qv),
      |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS cosine
      |FROM b, q
      |WHERE $hamming <= 1
      |ORDER BY cosine DESC, vec_id ASC
      |LIMIT 10""".stripMargin
  }

  /** Pair-mining near-dup over the REAL embedding column — the
    * embedding-space twin of the n-gram dedup family: bucket all
    * vectors by [[signBucket]] sign-LSH (map-only, no stored model),
    * generate candidate pairs ONLY within a bucket (equi-join on the
    * bucket id — never all-pairs), verify with exact cosine ≥ `minCos`.
    *
    * SIZE `planes` TO THE CORPUS: expected bucket size is n/2^planes,
    * and buckets larger than `maxBucket` are DROPPED outright (their
    * pairs are lost, not sampled — the standard LSH skew guard trading
    * a degenerate bucket's recall for bounded O(bucket²) cost). With
    * the 8-plane default that means ~51k vectors is the ceiling before
    * average buckets hit the bound — at 100 TB you want
    * planes ≈ log₂(n / (maxBucket/4)).
    *
    * Recall envelope: a pair at cosine c shares one band's bucket with
    * probability p = (1 − acos(c)/π)^planes — at 8 planes ≈ 0.92 at
    * c = 0.9995, ≈ 0.69 at c = 0.99, ≈ 0.52 at c = 0.97. With `bands`
    * independent hyperplane sets (the MinHash banding pattern) the
    * candidate probability is 1 − (1 − p)^bands: at c = 0.99,
    * 2 bands ≈ 0.90, 4 bands ≈ 0.99 — the recall lever below the
    * tight-duplicate regime, at bands× bucketing/join cost. Exact-cosine
    * verification runs ONCE per distinct candidate pair regardless of
    * how many bands propose it.
    *
    * Plan note: the per-vector work (bands × planes sign folds) is
    * computed ONCE into a releasable checkpoint (the PrefixSum Tracked
    * pattern — ~vec_id + embedding + `bands` longs per row), which both
    * self-join sides and the verify step read; nothing re-executes per
    * side. [[embedNearDup]] leaves the blocks to the session sweep; a
    * caller that knows the result's lifetime (a long-lived JVM cycling
    * corpora) should use [[embedNearDupTracked]] and `release()` after
    * consuming the result — see USAGE.md's lifecycle section.
    *
    * NOT a driver query: the testdata embeddings are mutually
    * near-orthogonal by construction (measured max pair cosine 0.513 at
    * sf0.01 — no planted near-dups), so any honest threshold returns
    * zero rows there. ExtSpec runs it over a corpus with planted
    * near-dups, recomputes every reported cosine, and cross-checks
    * recall against brute force at both 1 and 4 bands. */
  def embedNearDup(emb: DataFrame, minCos: Double,
                   maxBucket: Int = 200, planes: Int = 8,
                   bands: Int = 1): DataFrame =
    embedNearDupTracked(emb, minCos, maxBucket, planes, bands).df

  /** [[embedNearDup]] result with its checkpoint lifetime exposed:
    * `release()` unpersists exactly this call's blocks (safe under
    * concurrent queries). Call it after the result DataFrame has been
    * consumed (collected / written), not before. */
  final case class NearDup(df: DataFrame, release: () => Unit)

  def embedNearDupTracked(emb: DataFrame, minCos: Double,
                          maxBucket: Int = 200, planes: Int = 8,
                          bands: Int = 1): NearDup = {
    require(planes >= 1 && planes <= 62, "planes must be in [1, 62]")
    require(bands >= 1, "bands must be >= 1")
    // ONE pass computes every band bucket per vector; the checkpoint is
    // what the join sides and the verify step all read (eager, so the
    // interpreted sign folds run exactly once per vector)
    val perVec = emb.select(col("vec_id"), col("embedding"),
      array((0 until bands).map(b =>
        signBucket(col("embedding"), planes, b)): _*).as("buckets"))
    val (vecs, release) = graft.util.Checkpoints.checkpointTracked(perVec)
    val bucketRows = vecs.select(col("vec_id"),
      posexplode(col("buckets")).as(Seq("band", "bucket")))
    // window count over (band, bucket) — one exchange, cap applied per
    // band so one hot band can't poison another band's buckets
    val capped = bucketRows
      .withColumn("bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket")))
      .filter(col("bn") <= maxBucket)
      .drop("bn")
    val proposed = capped.as("a").join(capped.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
    // a pair colliding in k bands is proposed k times; verify once
    val pairs = if (bands > 1) proposed.distinct() else proposed
    val out = pairs
      .join(vecs.select(col("vec_id").as("vec_a"),
        col("embedding").as("ea")), "vec_a")
      .join(vecs.select(col("vec_id").as("vec_b"),
        col("embedding").as("eb")), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        dot(col("ea"), col("eb")).as("cosine"))
      .filter(col("cosine") >= minCos)
    NearDup(out, release)
  }

  /** IVF (inverted-file) ANN index: a k-means coarse quantizer's cell
    * assignments (materialized) plus its centroids — the artifact a real
    * deployment builds offline, persists (as a table partitioned/bucketed
    * by `cell`), and serves every query from. */
  final case class IvfIndex(cells: DataFrame, centroids: Array[Array[Double]])

  /** Offline IVF index build — the KMeans fit. Runs ONCE per corpus:
    * qAnnIvf memoizes the result, so the per-query path never trains.
    * The cell table is localCheckpoint-materialized (vec_id, embedding,
    * cell — the same bytes a persisted index table would hold); centroid
    * math beyond the fit is driver-side O(k·d) only. */
  def buildIvfIndex(spark: SparkSession, dir: String, k: Int = 16): IvfIndex =
    buildIvfIndexOn(Tables(spark, dir, "embeddings"), k, fitEvery = 1L)

  /** Corpus-scaled IVF build — the BOUNDED-FAN-IN serving posture
    * (round-16): cell count grows with the corpus so the EXPECTED CELL
    * SIZE stays ~`targetCellSize`, making a probe's candidate list
    * nprobe·targetCellSize — CONSTANT in corpus size — where the
    * fixed-16-cell build's cells (n/16 each) grew linearly and dragged
    * the ADC leg of every probe with them (the 17× 100× slope on
    * q_knn_probe_ann_budget). The fit runs on a deterministic sample
    * (~50 points per centroid): a coarse quantizer needs cluster
    * GEOMETRY, not membership — transform assigns the full corpus in
    * one map pass. Recall at fixed nprobe is the LSH-style tradeoff
    * (bounded candidates find the neighbors only where neighbors
    * cluster); ExtSpec asserts the bound empirically on this corpus
    * and the production dial is nprobe. The broadcast centroid table
    * is k·d doubles — `maxCells` caps it (4096·64 ≈ 2 MB); beyond the
    * cap cells grow again, and the real-scale continuation is sharding
    * the coarse quantizer (FAISS's HNSW-over-centroids move). */
  def buildIvfIndexScaled(spark: SparkSession, dir: String,
                          targetCellSize: Int = 256,
                          maxCells: Int = 4096): IvfIndex = {
    val emb = Tables(spark, dir, "embeddings")
    val n = emb.count()
    val k = math.max(16L, math.min(maxCells.toLong,
      n / targetCellSize)).toInt
    buildIvfIndexOn(emb, k, fitEvery = math.max(1L, n / (k.toLong * 50)))
  }

  /** k clamped to the DISTINCT point count on tiny inputs: Spark ML's
    * KMeansAggregator sizes per-task buffers by the RETURNED center
    * count while indexing by assignment — with k above the distinct
    * point count (k-means|| dedupes its seeds) the fit itself throws an
    * executor-side ArrayIndexOutOfBounds (round-16 edge-corpus find,
    * KMeans.scala:795). The exact distinct count is gated behind a
    * cheap limit-probe so production-sized fits never pay it. */
  private def safeK(points: DataFrame, k: Int): Int =
    if (points.limit(4097).count() > 4096L) k
    else math.max(1, math.min(k, points.distinct().count().toInt))

  private def buildIvfIndexOn(embIn: DataFrame, k: Int,
                              fitEvery: Long): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val emb = embIn.withColumn("fv", array_to_vector(col("embedding")))
    val fit = if (fitEvery <= 1L) emb
              else emb.filter(col("vec_id") % fitEvery === 0)
    // a coarse quantizer doesn't need convergence — 5 Lloyd iterations
    // give stable-enough cells at a quarter of the fit cost
    val model = new KMeans().setK(safeK(fit.select("embedding"), k))
      .setSeed(42L).setFeaturesCol("fv")
      .setMaxIter(5)
      .fit(fit)
    val cells = model.transform(emb)
      .select(col("vec_id"), col("embedding"), col("prediction").as("cell"))
      .localCheckpoint()
    IvfIndex(cells, model.clusterCenters.map(_.toArray))
  }

  /** IVF (inverted-file) ANN query: probe only the `nprobe` cells whose
    * centroids are nearest the query vector, then brute-force inside
    * them — the standard scale path when query volume makes full scans
    * too expensive and hyperplane buckets too coarse.
    *
    * The index comes from [[buildIvfIndex]], built on first use and
    * cached per (session, corpus) via [[graft.util.SessionCache]] —
    * checkpointed cell blocks live in one SparkContext, so the index
    * must never outlive or cross its building session; rewritten DATA
    * at the same dir keeps serving the built index by design, exactly
    * like a persisted index table awaiting an explicit rebuild. The
    * query path is a cell-membership filter that
    * prunes the scan to ~nprobe/k of the corpus, then the same
    * TakeOrderedAndProject top-k as the brute path. Centroid distances
    * for probe selection are driver-side over k vectors — O(k·d), never
    * corpus-sized. Float sums inside KMeans are
    * aggregation-order-dependent → rows-only check; the spec
    * cross-validates every returned cosine against the brute path. */
  def qAnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val idx = graft.util.SessionCache.memoize(spark, "ivf", dir) {
      buildIvfIndex(spark, dir)
    }
    val qv = idx.cells.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    withRecallOk(ivfQuery(idx, qv), spark, dir)
  }

  /** Recall floor for the approximate ANN driver queries' in-row
    * quality assertion — the same ≥0.5 bound ExtSpec enforces (IVF
    * nprobe 4/16 and 16-cell/subspace 4-bit PQ both clear it with
    * margin at every tested SF). */
  val recallFloorHits = 5

  /** Append `recall_ok` to a top-k ANN result: TRUE iff ≥
    * [[recallFloorHits]] of the brute-force top-10 ids appear in the
    * result — computed IN-QUERY against the oracle-checked brute
    * table, so the driver's rows-only check asserts retrieval QUALITY
    * (not just shape) for the seeded/trained families whose membership
    * can't be portable SQL. Both sides are ≤10-row broadcasts; the
    * result plan is re-evaluated once for the overlap count (its
    * corpus-sized inputs are the memoized/checkpointed artifacts, so
    * the second evaluation reuses cached blocks, never a fresh corpus
    * scan). */
  private def withRecallOk(res: DataFrame, spark: SparkSession,
                           dir: String): DataFrame = {
    val brute = qAnnBrute(spark, dir).select(col("vec_id").as("bid"))
    val hits = res.join(broadcast(brute), col("vec_id") === col("bid"),
        "left_semi")
      .agg(count(lit(1)).as("hits"))
    res.crossJoin(broadcast(hits))
      .withColumn("recall_ok", col("hits") >= recallFloorHits)
      .drop("hits")
  }

  /** The serving path, index-source-agnostic (freshly built, memoized,
    * or [[loadIvfIndex]]-ed): pick the `nprobe` cells whose centroids
    * are nearest the query (driver-side over k vectors — O(k·d), never
    * corpus-sized), then exact top-k inside them. Over a PERSISTED
    * index the cell filter is partition pruning — the scan reads only
    * ~nprobe/k of the index FILES, not just of its rows. */
  def ivfQuery(idx: IvfIndex, qv: Array[Float], k: Int = 10,
               nprobe: Int = 4): DataFrame = {
    val probed = idx.centroids.zipWithIndex
      .map { case (c, i) =>
        val d = c.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum
        (i, d)
      }
      .sortBy(_._2).take(nprobe).map(_._1)
    val qcol = array(qv.map(lit(_)): _*)
    idx.cells.filter(col("cell").isInCollection(probed.toSeq))
      .select(col("vec_id"), col("cell"),
        dot(col("embedding"), qcol).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
  }

  /** BATCH IVF serving — the shape a deployment actually runs: answer a
    * whole DataFrame of queries against the index in ONE distributed
    * plan, instead of a driver round-trip per query ([[ivfQuery]]'s
    * probe selection is driver-side; fine for one vector, not for a
    * query stream). Fully distributed:
    *   1. probe selection: queries × broadcast k-centroid table
    *      (nq × k rows — the k=16 multiplier, never corpus-sized),
    *      squared distance per pair, `row_number PARTITION BY query_id`
    *      keeps the nprobe nearest cells — a window over nq × k rows
    *      partitioned by a high-cardinality key;
    *   2. candidates: equi-join of (query_id, cell, qv) against the
    *      cell table on `cell` — over a [[saveIvfIndex]]-persisted
    *      index this is the same partition-pruned scan as the single
    *      path, now shared by every query probing that cell;
    *   3. exact cosine via the codegen'd [[dot]], top-k per query via
    *      `row_number PARTITION BY query_id` — plans with
    *      WindowGroupLimit (rank pushdown prunes to k per query before
    *      the final sort).
    * Output: (query_id, vec_id, cell, cosine), k rows per query.
    * ExtSpec proves batch results equal the single-query path per id. */
  def ivfQueryBatch(idx: IvfIndex, queries: DataFrame, k: Int = 10,
                    nprobe: Int = 4): DataFrame = {
    val spark = idx.cells.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
    val centroids = idx.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
    val dist2 = aggregate(
      zip_with(col("centroid"), col("qv"),
        (c, q) => (c - q.cast("double")) * (c - q.cast("double"))),
      lit(0.0), (acc, x) => acc + x)
    val probed = queries
      .select(col("query_id"), col("embedding").as("qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("rk", row_number().over(
        w.partitionBy("query_id").orderBy(dist2.asc, col("cell").asc)))
      .filter(col("rk") <= nprobe)
      .select(col("query_id"), col("qv"), col("cell"))
    probed.join(idx.cells, "cell")
      .select(col("query_id"), col("vec_id"), col("cell"),
        dot(col("embedding"), col("qv")).as("cosine"))
      .withColumn("rk", row_number().over(
        w.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("vec_id").asc)))
      .filter(col("rk") <= k)
      .drop("rk")
  }

  /** Size `planes` to a corpus for [[embedNearDup]], from the documented
    * envelope: expected bucket size n/2^planes should sit well under
    * `maxBucket` (a quarter of it here, so skew has 4× headroom before
    * the cap starts dropping average-sized buckets). */
  def planesForCorpus(n: Long, maxBucket: Int = 200): Int = {
    require(n > 0 && maxBucket >= 4)
    val target = n / (maxBucket / 4.0)
    math.min(62, math.max(1,
      math.ceil(math.log(target) / math.log(2.0)).toInt))
  }

  /** MAP-ONLY cell assignment under FIXED centroids — the incremental
    * half of IVF maintenance: new vectors join an existing index by
    * taking the argmin over the k-centroid table exactly like
    * [[pqEncode]]'s sub-centroid argmin (centroids as a plan literal —
    * k·d doubles, ~8 KB at k=16 — distances via a zip_with fold, first
    * minimum wins so ties resolve to the lowest cell id in any eval
    * path). No shuffle, no fit: the declarative twin of what
    * [[buildIvfIndex]] derives by TRAINING, which is why a streaming
    * corpus can keep its index current per batch and refit on a
    * trigger instead of per arrival ([[graft.streaming.CurationStream
    * .appendAnnBatch]]). NOTE: not asserted equal to the KMeansModel's
    * own transform — MLlib computes distances via the norm trick
    * (‖a‖²+‖b‖²−2ab), which can differ in ulps on exact-boundary ties;
    * an index must use ONE assignment function for both its initial
    * bulk load and its increments, and this is that function. */
  def ivfAssign(emb: DataFrame,
                centroids: Array[Array[Double]]): DataFrame = {
    val cents = array(centroids.map(c => array(c.map(lit(_)): _*)): _*)
    val dists = transform(cents, c =>
      aggregate(zip_with(c, col("embedding"), (x, y) => {
        val d = x - y.cast("double"); d * d
      }), lit(0.0), (a, x) => a + x))
    emb.select(col("vec_id"), col("embedding"),
      (array_position(dists, array_min(dists)).cast("int") - 1).as("cell"))
  }

  /** Deterministic hash-coin sample on vec_id — THE fit sample for
    * every trainable artifact here ([[trainPq]], [[fitCentroids]]):
    * one definition so a refit always trains its coarse quantizer and
    * its codebooks on the SAME sample of the same store. */
  private def hashSample(emb: DataFrame, frac: Double): DataFrame = {
    require(frac > 0 && frac <= 1.0)
    if (frac >= 1.0) emb
    else emb.filter(
      pmod(xxhash64(col("vec_id")), lit(10000L)) < (frac * 10000).toLong)
  }

  /** Fit ONLY the coarse-quantizer centroids, on an arbitrary
    * embeddings frame — the fit half of [[buildIvfIndex]] decoupled
    * from the table loader so a REFIT can retrain on a live serving
    * store (or any corpus slice) rather than the original source dir.
    * Same posture as the bulk build: seeded KMeans, 5 Lloyd
    * iterations. `fitSample` is [[trainPq]]'s deterministic hash-coin
    * sample — at scale the k·d centroid statistics stabilize long
    * before the corpus is exhausted, so a refit fits on a sample and
    * re-encodes everything. */
  def fitCentroids(emb: DataFrame, k: Int = 16,
                   fitSample: Double = 1.0): Array[Array[Double]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val fit = hashSample(emb, fitSample)
      .withColumn("fv", array_to_vector(col("embedding")))
    new KMeans().setK(safeK(fit.select("embedding"), k))
      .setSeed(42L).setFeaturesCol("fv").setMaxIter(5)
      .fit(fit)
      .clusterCenters.map(_.toArray)
  }

  /** Persist the index the way a real deployment serves it: the cell
    * table PARTITIONED BY cell — so a query's cell-membership filter
    * becomes partition pruning at the scan (`PartitionFilters` in the
    * plan; only the probed cells' files are opened) — plus the k×d
    * centroid matrix as a one-row-per-centroid table. */
  def saveIvfIndex(idx: IvfIndex, path: String): Unit = {
    idx.cells.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/cells")
    val spark = idx.cells.sparkSession
    import spark.implicits._
    idx.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("centroid_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  def loadIvfIndex(spark: SparkSession, path: String): IvfIndex = {
    val centroids = spark.read.parquet(s"$path/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(_._2)
    IvfIndex(spark.read.parquet(s"$path/cells"), centroids)
  }

  // ------------------------------------------------------ product quantization

  /** PQ codebooks: `m` subspaces × `ks` centroids × (dim/m) components
    * (Jégou et al. 2011, "Product Quantization for Nearest Neighbor
    * Search" — the IVF-PQ pairing FAISS made standard). */
  final case class PqModel(m: Int, ks: Int,
                           codebooks: Array[Array[Array[Double]]]) {
    val dsub: Int = codebooks.head.head.length
    require(ks <= 16, "codes are packed 4 bits each — ks beyond 16 needs a wider pack")
  }

  /** Train a PQ model: split the 64-dim space into `m` subspaces and
    * k-means each independently (seeded, 5 Lloyd iterations — the
    * coarse-quantizer posture of [[buildIvfIndex]]). The m fits run
    * over PROJECTED slices of the corpus — m sequential jobs over
    * (n × dim/m) data, once per corpus, memoized by the driver query.
    *
    * Why PQ at 100 TB: serving memory. A 64-dim float vector is 256 B;
    * its PQ code at m=8, ks=16 is 8 four-bit codes = ONE 32-bit int —
    * 64× smaller. 10¹⁰ vectors stop needing 2.5 TB of RAM across the
    * fleet and fit in 40 GB — the difference between "the index lives
    * in memory next to the serving executors" and "every query pages
    * the corpus". The scan side gets the same factor: an ADC pass
    * reads 4-byte codes at cache speed instead of streaming full
    * vectors. */
  def trainPq(emb: DataFrame, m: Int = 8, ks: Int = 16,
              fitSample: Double = 1.0): PqModel = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val dim = 64
    require(dim % m == 0)
    require(fitSample > 0 && fitSample <= 1.0)
    // PRODUCTION FIT POSTURE: codebooks are 16 centroids per subspace —
    // statistics that stabilize long before the corpus is exhausted —
    // so a deployment FITS ON A SAMPLE and encodes the corpus (the
    // FAISS train/add split). The sample is a deterministic hash coin
    // on vec_id (the qHashSample technique): reproducible across runs
    // and engines, no seeded RNG state.
    val fit = hashSample(emb, fitSample)
    val dsub = dim / m
    val codebooks = (0 until m).map { j =>
      val sub = fit.select(
        slice(col("embedding"), j * dsub + 1, dsub).as("sub"))
        .withColumn("fv", array_to_vector(col("sub")))
      new KMeans().setK(safeK(sub.select("sub"), ks))
        .setSeed(42L + j).setFeaturesCol("fv")
        .setMaxIter(5).fit(sub)
        .clusterCenters.map(_.toArray)
    }.toArray
    PqModel(m, ks, codebooks)
  }

  /** Encode the corpus: nearest sub-centroid per subspace, packed 4
    * bits each into one INT — (vec_id, code). The assignment reuses
    * the fitted KMeansModels' own transform? No — the model here is
    * the raw centroid matrix, so assignment is a declarative argmin
    * over a BROADCAST ks-row table per subspace: m chained
    * projections, each a zip_with distance + array_position argmin
    * over 16 centroids — pure map, no shuffle, codegen-friendly. */
  def pqEncode(emb: DataFrame, model: PqModel): DataFrame = {
    val dsub = model.dsub
    // per subspace: distances to the 16 sub-centroids as a literal
    // 2-D array (ks × dsub doubles baked into the plan — 1 KB), argmin
    // by (distance, centroid-id) for a deterministic code
    val codeCols = (0 until model.m).map { j =>
      val sub = slice(col("embedding"), j * dsub + 1, dsub)
      val cents = array(model.codebooks(j).map(c =>
        array(c.map(lit(_)): _*)): _*)
      val dists = transform(cents, c =>
        aggregate(zip_with(c, sub, (x, y) => {
          val d = x - y.cast("double"); d * d
        }), lit(0.0), (a, x) => a + x))
      // argmin: position of the min distance (first occurrence — ties
      // resolve to the lowest centroid id in both eval paths)
      (array_position(dists, array_min(dists)).cast("int") - 1)
        .as(s"c$j")
    }
    emb.select(col("vec_id") +: codeCols: _*)
      .select(col("vec_id"),
        (0 until model.m).map(j => shiftleft(col(s"c$j"), 4 * j))
          .reduce(_ + _).cast("int").as("code"))
  }

  /** ADC (asymmetric distance computation) approximate dot products:
    * the query builds an m × ks lookup table of sub-dot-products
    * driver-side (128 doubles), and each corpus code sums m table
    * entries selected by its packed nibbles — no float vector is ever
    * read. This is the scan that runs over the 64×-compressed code
    * table at serving time. */
  def pqAdcDot(code: Column, qv: Array[Float], model: PqModel): Column = {
    val dsub = model.dsub
    (0 until model.m).map { j =>
      val lut = model.codebooks(j).map { c =>
        c.zipWithIndex.map { case (x, i) => x * qv(j * dsub + i) }.sum
      }
      element_at(array(lut.map(lit(_)): _*),
        shiftright(code, 4 * j).bitwiseAND(15).cast("int") + 1)
    }.reduce(_ + _)
  }

  /** BATCH ADC — [[pqAdcDot]] with the query vector as a COLUMN: the
    * per-subspace LUT cannot be driver-built (there is no single query
    * vector), so the sub-dot is computed in-plan — the code's nibble
    * selects a sub-centroid row from the literal codebook (ks × dsub
    * doubles, the same 1 KB [[pqEncode]] bakes), zip_with against the
    * query's slice, fold. Still a pure map over the code table, now
    * usable under a DataFrame of queries ([[ivfPqQueryBatch]],
    * [[knnProbeAnn]]); the single-query path keeps the driver LUT
    * (m additions/row beats m folds/row when qv is a constant). */
  def pqAdcDotCol(code: Column, qv: Column, model: PqModel): Column = {
    val dsub = model.dsub
    (0 until model.m).map { j =>
      val cents = array(model.codebooks(j).map(c =>
        array(c.map(lit(_)): _*)): _*)
      val cent = element_at(cents,
        shiftright(code, 4 * j).bitwiseAND(15).cast("int") + 1)
      aggregate(
        zip_with(cent, slice(qv, j * dsub + 1, dsub),
          (x, y) => x * y.cast("double")),
        lit(0.0), (a, x) => a + x)
    }.reduce(_ + _)
  }

  /** BATCH IVF-PQ serving — [[ivfQueryBatch]]'s distributed shape
    * composed with the PQ stage: probe selection over the broadcast
    * centroid table, candidates from the cell-partitioned code table
    * (partition-pruned over a persisted store), ADC ranking via
    * [[pqAdcDotCol]] keeps `rerank` per query, exact re-rank reads only
    * those vectors. One plan answers every query; k rows per query_id,
    * WindowGroupLimit at both per-query windows. */
  def ivfPqQueryBatch(cellCodes: DataFrame, emb: DataFrame, model: PqModel,
                      centroids: Array[Array[Double]], queries: DataFrame,
                      k: Int = 10, nprobe: Int = 4,
                      rerank: Int = 50): DataFrame = {
    val spark = cellCodes.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
    val centroidsDf = centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("cell", "centroid")
    val dist2 = aggregate(
      zip_with(col("centroid"), col("qv"),
        (c, q) => (c - q.cast("double")) * (c - q.cast("double"))),
      lit(0.0), (acc, x) => acc + x)
    val probed = queries
      .select(col("query_id"), col("embedding").as("qv"))
      .crossJoin(broadcast(centroidsDf))
      .withColumn("rk", row_number().over(
        w.partitionBy("query_id").orderBy(dist2.asc, col("cell").asc)))
      .filter(col("rk") <= nprobe)
      .select(col("query_id"), col("qv"), col("cell"))
    val cand = probed.join(cellCodes, "cell")
      .select(col("query_id"), col("qv"), col("vec_id"),
        pqAdcDotCol(col("code"), col("qv"), model).as("adc"))
      .withColumn("rk", row_number().over(
        w.partitionBy("query_id")
          .orderBy(col("adc").desc, col("vec_id").asc)))
      .filter(col("rk") <= rerank)
      .select(col("query_id"), col("qv"), col("vec_id"))
    cand.join(emb.select(col("vec_id"), col("embedding")), "vec_id")
      .select(col("query_id"), col("vec_id"),
        dot(col("embedding"), col("qv")).as("cosine"))
      .withColumn("rk", row_number().over(
        w.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("vec_id").asc)))
      .filter(col("rk") <= k)
      .drop("rk")
  }

  /** PQ serving: ADC top-`rerank` candidates over the code table, then
    * EXACT cosine re-ranking of that candidate set against the full
    * vectors — the standard two-stage that gives compressed-scan cost
    * with exact final scores (returned cosines are value-verifiable
    * against [[qAnnCosineById]], like every ANN path here). */
  def pqQuery(codes: DataFrame, emb: DataFrame, model: PqModel,
              qv: Array[Float], k: Int = 10, rerank: Int = 50): DataFrame = {
    val candidates = codes
      .select(col("vec_id"), pqAdcDot(col("code"), qv, model).as("adc"))
      .orderBy(col("adc").desc, col("vec_id").asc)
      .limit(rerank)
    val qcol = array(qv.map(lit(_)): _*)
    emb.join(candidates, "vec_id")
      .select(col("vec_id"), dot(col("embedding"), qcol).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
  }

  /** IVF-PQ COMPOSED serving — the FAISS IVFPQ architecture, from the
    * two artifacts this engine already builds: the IVF coarse
    * quantizer prunes the scan to `nprobe` cells, the ADC pass ranks
    * only the survivors' 4-byte codes, and the top-`rerank` candidates
    * re-rank by exact cosine. The serving table is `(cell, vec_id,
    * code)` — code CO-LOCATED with cell, which is what a deployment
    * persists partitioned by cell ([[saveIvfIndex]]'s layout plus one
    * int column): the cell filter becomes partition pruning, the ADC
    * scan reads ~nprobe/k of a 4-byte-per-vector table (the 64×
    * compression × the 4/16 pruning ≈ 250× less IO than brute), and
    * the exact re-rank touches `rerank` full vectors, not the corpus.
    * Returned cosines stay value-verifiable against
    * [[qAnnCosineById]] — ExtSpec does, and bounds recall vs brute. */
  def ivfPqQuery(cellCodes: DataFrame, emb: DataFrame, model: PqModel,
                 centroids: Array[Array[Double]], qv: Array[Float],
                 k: Int = 10, nprobe: Int = 4, rerank: Int = 100): DataFrame = {
    val probed = centroids.zipWithIndex
      .map { case (c, i) =>
        (i, c.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum)
      }
      .sortBy(_._2).take(nprobe).map(_._1)
    val cand = cellCodes.filter(col("cell").isInCollection(probed.toSeq))
      .select(col("vec_id"), pqAdcDot(col("code"), qv, model).as("adc"))
      .orderBy(col("adc").desc, col("vec_id").asc)
      .limit(rerank)
    val qcol = array(qv.map(lit(_)): _*)
    emb.join(cand, "vec_id")
      .select(col("vec_id"), dot(col("embedding"), qcol).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Driver query: IVF-PQ ANN for vec 0 — reuses BOTH memoized
    * artifacts (the IVF index and the PQ model/codes, shared with
    * q_ann_ivf / q_ann_pq — one build each per corpus, the composed
    * index is a join away) and serves through [[ivfPqQuery]]. Seeded
    * k-means on both stages → rows-only membership check; every
    * returned cosine is value-verified in ExtSpec. */
  def qAnnIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val idx = graft.util.SessionCache.memoize(spark, "ivf", dir) {
      buildIvfIndex(spark, dir)
    }
    val (model, codes) =
      graft.util.SessionCache.memoize(spark, "pq", dir) {
        val emb = Tables(spark, dir, "embeddings")
        val m = trainPq(emb)
        (m, pqEncode(emb, m).localCheckpoint())
      }
    val cellCodes = graft.util.SessionCache.memoize(spark, "ivfpq", dir) {
      idx.cells.select(col("cell"), col("vec_id"))
        .join(codes, "vec_id").localCheckpoint()
    }
    val emb = Tables(spark, dir, "embeddings")
    val qv = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    withRecallOk(ivfPqQuery(cellCodes, emb, model, idx.centroids, qv),
      spark, dir)
  }

  /** Driver query: PQ-compressed ANN for vec 0 — train + encode
    * memoized (the persisted-artifact posture: codebooks and the code
    * table are what a deployment ships to serving), ADC top-50, exact
    * top-10 re-rank. Seeded k-means codebooks → rows-only membership
    * check; ExtSpec value-verifies every returned cosine against the
    * brute path and bounds recall@10. */
  def qAnnPq(spark: SparkSession, dir: String): DataFrame = {
    val (model, codes) =
      graft.util.SessionCache.memoize(spark, "pq", dir) {
        val emb = Tables(spark, dir, "embeddings")
        val m = trainPq(emb)
        (m, pqEncode(emb, m).localCheckpoint())
      }
    val emb = Tables(spark, dir, "embeddings")
    val qv = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    withRecallOk(pqQuery(codes, emb, model, qv), spark, dir)
  }

  /** Exact distinct counts (oracle-checked)… */
  def qCountDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents").agg(
      count_distinct(col("lang")).as("n_langs"),
      count_distinct(col("source")).as("n_sources"),
      count_distinct(col("text")).as("n_texts"))

  val qCountDistinctSql: String =
    """SELECT COUNT(DISTINCT lang) AS n_langs,
      |       COUNT(DISTINCT source) AS n_sources,
      |       COUNT(DISTINCT text) AS n_texts
      |FROM documents""".stripMargin

  /** …and the sketch version that actually scales: HLL++
    * approx_count_distinct — constant memory, one pass, no exact-distinct
    * shuffle. Estimates are engine-specific → rows-only check. */
  def qApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents").agg(
      approx_count_distinct(col("text")).as("approx_texts"),
      approx_count_distinct(col("source")).as("approx_sources"))

  /** Query-sample modulus for [[qKnnProbe]]: vec_id % 25 = 0 → a
    * deterministic 4% probe set. */
  val knnProbeEvery = 25

  /** Neighbors per query for the probe vote. */
  val knnProbeK = 10

  /** kNN EMBEDDING-QUALITY PROBE — the standard eval for an embedding
    * column: classify each probe vector by majority label of its k
    * nearest neighbors (self excluded) and surface per-query verdicts.
    * Labels ride the `embeddings` table; a rising kNN accuracy is the
    * cheapest trustworthy signal that an embedding space organizes the
    * classes — the eval run before anyone trusts semantic dedup or ANN
    * retrieval over that space.
    *
    * Deterministic end to end — exact cosine, (cosine desc, vec_id)
    * neighbor tiebreak, (count desc, label asc) vote tiebreak — so the
    * whole probe is hash-checked against [[qKnnProbeSql]].
    *
    * Scale shape: the probe set is a bounded deterministic SAMPLE
    * (n / [[knnProbeEvery]]), broadcast against the corpus — scoring
    * is map-side (corpus × probes dots computed in the scan); the
    * per-query top-k window shuffles probes × corpus rows, bounded by
    * the sample rate. That is the EVAL posture: full-corpus kNN is
    * quadratic by definition, so production either samples (this) or
    * serves candidates from the ANN index ([[ivfPqQuery]]) and
    * re-votes — the probe exists to validate exactly that index. */
  def qKnnProbe(spark: SparkSession, dir: String): DataFrame =
    knnProbe(Tables(spark, dir, "embeddings"))

  /** The generic form — size `every` so probes ≈ your eval budget
    * (cost is probes × corpus dots; the RATE-fixed driver query is for
    * the oracle, a 100× corpus wants a 100× modulus). */
  def knnProbe(emb: DataFrame, every: Int = knnProbeEvery,
               k: Int = knnProbeK): DataFrame = {
    val q = emb.filter(col("vec_id") % every === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        col("label").as("qlabel"))
    val scored = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("qlabel"), col("vec_id").as("nid"),
        col("label").as("nlabel"),
        dot(col("embedding"), col("qv")).as("cosine"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cosine").desc, col("nid").asc)
    val votes = scored.withColumn("__rk", row_number().over(wTop))
      .filter(col("__rk") <= k)
      .groupBy("qid", "qlabel", "nlabel").agg(count(lit(1)).as("cnt"))
    val wVote = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cnt").desc, col("nlabel").asc)
    votes.withColumn("__vr", row_number().over(wVote))
      .filter(col("__vr") === 1)
      .select(col("qid").as("vec_id"), col("qlabel").as("label"),
        col("nlabel").as("pred"),
        (col("qlabel") === col("nlabel")).cast("int").as("correct"))
  }

  /** ANN-SERVED kNN PROBE — the production loop [[knnProbe]] exists to
    * validate, closed (round-7 ask #6): the same deterministic probe
    * set is answered from the IVF-PQ serving path
    * ([[ivfPqQueryBatch]]'s candidates — nprobe-cell prune, ADC
    * top-`rerank`, exact re-rank) instead of a full scan, the top-k
    * re-votes, and each probe reports its verdict AND its recall
    * against the brute top-k — so one table says both "does the index
    * preserve kNN accuracy" and "what fraction of true neighbors does
    * it surface". Output: (vec_id, label, pred, correct, recall).
    *
    * Scale shape: everything is bounded by the probe sample × the
    * serving path's own costs — probe selection over the broadcast
    * centroid table, candidates partition-pruned to nprobe/k of the
    * code table, ADC in-plan ([[pqAdcDotCol]]); the brute comparison
    * column reuses [[knnProbe]]'s broadcast-sample shape, which is the
    * eval posture by construction. Seeded k-means artifacts → rows-only
    * driver check; ExtSpec replays the whole pipeline driver-side and
    * bounds recall + accuracy against the brute probe. */
  def knnProbeAnn(emb: DataFrame, cellCodes: DataFrame, model: PqModel,
                  centroids: Array[Array[Double]],
                  every: Int = knnProbeEvery, k: Int = knnProbeK,
                  nprobe: Int = 4, rerank: Int = 50): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val q = emb.filter(col("vec_id") % every === 0)
      .select(col("vec_id").as("query_id"), col("embedding"),
        col("label").as("qlabel"))
    // ANN top-k per probe, self excluded (a probe is its own nearest
    // neighbor through any faithful index — drop it before the window
    // so the vote sees k real neighbors)
    val served = ivfPqQueryBatch(
      cellCodes, emb, model, centroids,
      q.select(col("query_id"), col("embedding")), k + 1, nprobe, rerank)
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("rk", row_number().over(
        w.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("vec_id").asc)))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"))
    // re-vote over the served neighbor set
    val votes = served
      .join(emb.select(col("vec_id"), col("label").as("nlabel")), "vec_id")
      .groupBy("query_id", "nlabel").agg(count(lit(1)).as("cnt"))
      .withColumn("vr", row_number().over(
        w.partitionBy("query_id").orderBy(col("cnt").desc, col("nlabel").asc)))
      .filter(col("vr") === 1)
      .select(col("query_id"), col("nlabel").as("pred"))
    // brute top-k per probe (the knnProbe shape) for per-probe recall
    val brute = emb.crossJoin(broadcast(q.withColumnRenamed("embedding", "qv")))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        dot(col("embedding"), col("qv")).as("cosine"))
      .withColumn("rk", row_number().over(
        w.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("vec_id").asc)))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"))
    val recall = brute
      .join(served.withColumn("hit", lit(1)),
        Seq("query_id", "vec_id"), "left")
      .groupBy("query_id")
      .agg((sum(coalesce(col("hit"), lit(0))).cast("double") / k)
        .as("recall"))
    q.select(col("query_id"), col("qlabel"))
      .join(votes, "query_id").join(recall, "query_id")
      .select(col("query_id").as("vec_id"), col("qlabel").as("label"),
        col("pred"),
        (col("qlabel") === col("pred")).cast("int").as("correct"),
        col("recall"))
  }

  /** Driver query: the ANN-served probe over the memoized IVF-PQ
    * artifacts (same builds as q_ann_ivf_pq — the composed index is
    * what this probe validates). Rows-only like every seeded-artifact
    * path; ExtSpec carries the exact replay and the bounds. */
  def qKnnProbeAnn(spark: SparkSession, dir: String): DataFrame = {
    val idx = graft.util.SessionCache.memoize(spark, "ivf", dir) {
      buildIvfIndex(spark, dir)
    }
    val (model, codes) =
      graft.util.SessionCache.memoize(spark, "pq", dir) {
        val emb = Tables(spark, dir, "embeddings")
        val m = trainPq(emb)
        (m, pqEncode(emb, m).localCheckpoint())
      }
    val cellCodes = graft.util.SessionCache.memoize(spark, "ivfpq", dir) {
      idx.cells.select(col("cell"), col("vec_id"))
        .join(codes, "vec_id").localCheckpoint()
    }
    knnProbeAnn(Tables(spark, dir, "embeddings"), cellCodes, model,
      idx.centroids)
  }

  val qKnnProbeSql: String =
    s"""WITH q AS (
      |  SELECT vec_id AS qid, embedding AS qv, label AS qlabel
      |  FROM embeddings WHERE vec_id % $knnProbeEvery = 0),
      |s AS (
      |  SELECT q.qid, q.qlabel, e.vec_id AS nid, e.label AS nlabel,
      |    list_sum(list_transform(list_zip(e.embedding, q.qv),
      |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS cosine
      |  FROM embeddings e JOIN q ON e.vec_id <> q.qid),
      |top AS (
      |  SELECT qid, qlabel, nlabel FROM (
      |    SELECT s.*, ROW_NUMBER() OVER (
      |      PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS rk FROM s)
      |  WHERE rk <= $knnProbeK),
      |votes AS (
      |  SELECT qid, qlabel, nlabel, COUNT(*) AS cnt
      |  FROM top GROUP BY 1, 2, 3)
      |SELECT qid AS vec_id, qlabel AS label, nlabel AS pred,
      |  CAST(qlabel = nlabel AS INTEGER) AS correct
      |FROM (
      |  SELECT votes.*, ROW_NUMBER() OVER (
      |    PARTITION BY qid ORDER BY cnt DESC, nlabel ASC) AS vr
      |  FROM votes)
      |WHERE vr = 1""".stripMargin

  /** Sketch size for [[qApproxDistinctDet]] — relative error
    * ≈ 1/√k ≈ 12.5%; production sizes k to its error budget. */
  val kmvK = 64

  /** DETERMINISTIC distinct-count sketch — KMV / bottom-k (Bar-Yossef
    * et al. 2002), the q_semdedup_det move applied to the sketch
    * family: where HLL's register layout is engine-internal
    * (q_approx_distinct is rows-only), KMV's state is just the k
    * SMALLEST distinct hash values of the keys, and with md5-Horner
    * hashes (60 bits) that state — and therefore the estimate — is
    * bit-identical in any engine: the driver hash-checks the sketch
    * AND the estimator, pinning approximate-distinct semantics the way
    * the bloom det twin pins membership.
    *
    * Scale shape: distinct-hash then `ORDER BY h LIMIT k` plans as
    * partial-aggregate + TakeOrderedAndProject — every partition keeps
    * its own k-minimum heap and the driver merges k-row slices, which
    * is exactly the KMV MERGE operation (union sketches = k smallest
    * of the union): mergeable across partitions, snapshots, or days,
    * like the production HLL it stands beside. Estimator: k < kmvK ⇒
    * the sketch IS the exact distinct count; else (k−1)·2⁶⁰ / h_k —
    * one IEEE division, no order-dependent float sums. */
  def qApproxDistinctDet(spark: SparkSession, dir: String): DataFrame = {
    val h = Tables(spark, dir, "documents")
      .select(conv(substring(md5(col("text").cast("binary")), 1, 15),
        16, 10).cast("bigint").as("h"))
      .distinct()
      .orderBy(col("h")).limit(kmvK)
    h.agg(count(lit(1)).cast("bigint").as("k_used"), max(col("h")).as("kth"))
      .select(col("k_used"), col("kth"),
        when(col("k_used") < kmvK, col("k_used").cast("double"))
          .otherwise((col("k_used").cast("double") - 1.0) *
            lit(1152921504606846976.0) / col("kth").cast("double"))
          .as("est"))
  }

  /** Full ANSI replay of [[qApproxDistinctDet]]. */
  val qApproxDistinctDetSql: String =
    s"""WITH h AS (
      |  SELECT DISTINCT CAST(CAST('0x' || substr(md5(text), 1, 15)
      |    AS UBIGINT) AS BIGINT) AS h
      |  FROM documents),
      |k AS (SELECT h FROM h ORDER BY h LIMIT $kmvK),
      |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS k_used, MAX(h) AS kth FROM k)
      |SELECT k_used, kth,
      |  CASE WHEN k_used < $kmvK THEN CAST(k_used AS DOUBLE)
      |    ELSE (CAST(k_used AS DOUBLE) - 1.0) * 1152921504606846976.0
      |      / CAST(kth AS DOUBLE) END AS est
      |FROM s""".stripMargin

  // ------------------------------------------------- prototype scoring

  /** Target class for [[qEmbedPrototype]] — production passes a curated
    * seed set's label (or any predicate selecting the seed vectors). */
  val protoLabel = 0

  private val protoMicro = 1e6

  /** Label-conditioned CENTROID affinity — the embedding-space quality
    * filter: score every vector by its dot product with the target
    * class's mean embedding (the parametric cousin of [[knnProbe]]'s
    * kNN vote, and the scoring half of a nearest-class-mean
    * classifier). The production use is semantic filtering toward a
    * curated seed set — keep documents whose embeddings sit near the
    * seed centroid (the embedding-side analog of DSIR's n-gram
    * importance weighting).
    *
    * Engine-portable determinism: a float mean is an order-dependent
    * float sum — NOT portable — so each component is quantized to
    * integer micro-units first (round(x·1e6) as BIGINT), the
    * per-dimension sums are exact integer aggregation in any engine,
    * and the centroid component is `(CAST(s AS DOUBLE) / n / 1e6)`
    * narrowed to FLOAT — correctly-rounded ops only. The score then
    * reuses the hash-proven [[dot]] machinery (sequential left fold in
    * element order, matching DuckDB's list_sum). The score is the raw
    * dot, deliberately unnormalized: the centroid's norm is one
    * positive constant, so ranking/thresholding is cosine-equivalent
    * without betting the oracle on a driver-side norm fold.
    *
    * Scale shape: the centroid build is one partial-agg pass over the
    * TARGET slice only (64 integer sums — bounded state), collected as
    * 64 rows of driver metadata (the k-centroids contract); scoring is
    * map-only codegen against the literal array — no join, no shuffle,
    * scan speed at any corpus size. */
  def embedPrototype(emb: DataFrame, label: Int = protoLabel): DataFrame = {
    val tgt = emb.filter(col("label") === label)
    val n = tgt.count() // bounded scalar (same contract as Merge's cutoff)
    require(n > 0, s"embedPrototype: no label=$label vectors")
    val sums = tgt
      .select(posexplode(col("embedding")).as(Seq("j", "x")))
      .groupBy("j")
      .agg(sum(round(col("x").cast("double") * protoMicro).cast("bigint"))
        .as("s"))
      .collect() // one row per dimension — bounded driver metadata
    val proto: Array[Float] = sums.sortBy(_.getInt(0))
      .map(r => (r.getLong(1).toDouble / n / protoMicro).toFloat)
    emb.select(col("vec_id"), col("label"),
      dot(col("embedding"), typedLit(proto)).as("proto_dot"))
  }

  def qEmbedPrototype(spark: SparkSession, dir: String): DataFrame =
    embedPrototype(Tables(spark, dir, "embeddings"))

  /** Label set for [[qNcmPredict]] — the testdata's 10 classes; the
    * oracle SQL is generated from this constant. Production derives it
    * with one DISTINCT scan (bounded metadata). */
  val ncmLabels: Range = 0 until 10

  /** Nearest-class-mean prediction — [[embedPrototype]] extended to
    * every class: one partial-agg pass builds ALL per-class quantized
    * centroids (|labels|×dims bounded integer sums → driver metadata),
    * then scoring computes each vector's dot against every literal
    * centroid IN THE SCAN — d₀…d₉ as map-only codegen columns, argmax
    * with lowest-label tiebreak via greatest + first-match CASE (both
    * engines pick the same winner because every dot is the identical
    * double). The plan stays Exchange-free for scoring: NCM is the
    * classifier you get for free once centroids exist, the parametric
    * cross-check of [[knnProbe]]'s kNN vote over the same space.
    *
    * Output per vector: true label, predicted class, correct flag —
    * the confusion matrix and accuracy are one groupBy away. */
  def ncmPredict(emb: DataFrame,
                 labels: Seq[Int] = ncmLabels): DataFrame = {
    val counts = emb.groupBy("label").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val sums = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("j", "x")))
      .groupBy("label", "j")
      .agg(sum(round(col("x").cast("double") * protoMicro).cast("bigint"))
        .as("s"))
      .collect() // |labels| × dims rows — bounded driver metadata
    val protos: Map[Int, Array[Float]] = sums.groupBy(_.getInt(0)).map {
      case (l, rows) =>
        l -> rows.sortBy(_.getInt(1)).map(r =>
          (r.getLong(2).toDouble / counts(l) / protoMicro).toFloat)
    }
    // a declared class ABSENT from the corpus (round-16 edge-corpus
    // find) has no centroid: its dot column is NULL, which both
    // engines' greatest() skips and the prediction CASE never matches
    // — exactly what the oracle's empty scalar subquery produces
    val dCols = labels.map(l => protos.get(l)
      .map(p => dot(col("embedding"), typedLit(p)))
      .getOrElse(lit(null).cast("double")).as(s"d$l"))
    val withDots = emb.select(col("vec_id") +: col("label") +: dCols: _*)
    val m = greatest(labels.map(l => col(s"d$l")): _*)
    val pred = labels.foldRight(lit(-1): Column)((l, rest) =>
      when(col(s"d$l") === m, l).otherwise(rest))
    withDots
      .select(col("vec_id"), col("label"), pred.as("pred"))
      .withColumn("correct", (col("pred") === col("label")).cast("int"))
  }

  def qNcmPredict(spark: SparkSession, dir: String): DataFrame =
    ncmPredict(Tables(spark, dir, "embeddings"))

  val qNcmPredictSql: String = {
    val labels = ncmLabels
    val dDefs = labels.map(l =>
      s"""    list_sum(list_transform(list_zip(embedding,
         |      (SELECT pv FROM pv WHERE label = $l)),
         |      q -> CAST(q[1] AS DOUBLE) * CAST(q[2] AS DOUBLE))) AS d$l"""
        .stripMargin).mkString(",\n")
    val m = s"greatest(${labels.map(l => s"d$l").mkString(", ")})"
    val predCase = labels.map(l => s"WHEN d$l = m THEN $l").mkString(" ")
    s"""WITH cnt AS (
      |  SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label),
      |sums AS (
      |  SELECT label, j, SUM(CAST(round(CAST(embedding[j] AS DOUBLE)
      |    * 1000000.0) AS BIGINT)) AS s
      |  FROM embeddings,
      |    LATERAL unnest(generate_series(1, len(embedding))) AS u(j)
      |  GROUP BY label, j),
      |pv AS (
      |  SELECT label, list(CAST(CAST(s AS DOUBLE) / n / 1000000.0 AS FLOAT)
      |    ORDER BY j) AS pv
      |  FROM sums JOIN cnt USING (label) GROUP BY label, n),
      |dots AS (
      |  SELECT vec_id, label,
      |$dDefs
      |  FROM embeddings),
      |scored AS (
      |  SELECT *, $m AS m FROM dots)
      |SELECT vec_id, label,
      |  CASE $predCase ELSE -1 END AS pred,
      |  CAST(CASE $predCase ELSE -1 END = label AS INTEGER) AS correct
      |FROM scored""".stripMargin
  }

  val qEmbedPrototypeSql: String =
    s"""WITH n AS (
      |  SELECT COUNT(*) AS n FROM embeddings WHERE label = $protoLabel),
      |sums AS (
      |  SELECT j, SUM(CAST(round(CAST(embedding[j] AS DOUBLE)
      |    * 1000000.0) AS BIGINT)) AS s
      |  FROM embeddings,
      |    LATERAL unnest(generate_series(1, len(embedding))) AS u(j)
      |  WHERE label = $protoLabel GROUP BY j),
      |proto AS (
      |  SELECT list(CAST(CAST(s AS DOUBLE) / n / 1000000.0 AS FLOAT)
      |    ORDER BY j) AS pv
      |  FROM sums, n),
      |scored AS (
      |  SELECT vec_id, label,
      |    list_sum(list_transform(list_zip(embedding, pv),
      |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS proto_dot
      |  FROM embeddings, proto)
      |SELECT vec_id, label, proto_dot FROM scored""".stripMargin
}
