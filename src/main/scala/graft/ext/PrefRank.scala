package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** PREFERENCE-DATA CONSTRUCTION AND PAIRWISE-STRENGTH ESTIMATION — the
  * two reward-modeling primitives a training-data pipeline runs over a
  * scored corpus:
  *
  *  1. [[qPrefPairs]] builds (winner, loser) preference pairs from a
  *     per-document quality score at three controlled hardness tiers
  *     (the standard RLHF data recipe: easy pairs teach the direction,
  *     hard pairs teach the boundary — cf. Ouyang et al. 2022's
  *     comparison data, Touvron et al. 2023's margin-binned pairs).
  *  2. [[qBradleyTerry]] estimates per-SOURCE strengths from the
  *     pairwise win counts via the Bradley-Terry model (Bradley &
  *     Terry 1952) under Hunter 2004's MM iteration — "which source
  *     wins quality comparisons, as a calibrated strength", the
  *     readout that prices a new data source against the existing mix.
  *
  * THE SCORE is the stopword-naturalness micro ratio (exact integer:
  * 10⁶·stopwords div tokens) with doc_id tiebreak — any scorer plugs
  * in; the machinery is the point.
  *
  * SCALE — pairs. One scalable global row number (range-partitioned,
  * [[graft.operators.RowNumbering]]), a broadcast 1-row count, then a
  * rank-offset self equi-join per tier: rank r pairs with rank r+gap,
  * so candidate generation is EXACTLY 3n rows — never the n² of
  * all-pairs mining.
  *
  * SCALE — Bradley-Terry. The win-count matrix never touches pairs at
  * all: with one ascending sort by (score, doc_id), [[
  * graft.operators.PrefixSum]]'s multi-column running totals give, at
  * every doc, the count of already-seen docs FROM EACH SOURCE — so
  * wins(i beats j) = Σ_{docs of i} cum_j, one sort + one partial agg
  * for the whole |S|² matrix (|sources| is bounded and enumerated
  * up front — the same bounded-domain contract as
  * [[graft.operators.MixDrift]]). Win masses are Θ(n²) so they
  * aggregate in DECIMAL(38,0)/HUGEINT, then collapse to a ≤ 10⁵ + 1
  * integer resolution (BT strengths are invariant under count scaling,
  * so the rescale moves strengths < 10⁻⁵ relative); the MM iteration
  * then runs on the ≤ |S|²-cell integer matrix — bounded driver state,
  * the two-phase-selection posture — with every operation a truncating
  * integer division both engines replay exactly. Iterates are clamped
  * to [1, 10¹⁰] micro so every intermediate stays far inside Long
  * (documented: a source whose strength ratio exceeds 10⁴× the mean
  * reads as the clamp; add-1 smoothing keeps zero-win sources alive —
  * Davidson 1970's regularization posture). */
object PrefRank {

  /** MM rounds: strengths stabilize to < 10⁻⁴ relative on round-3
    * for |S| ≤ 32; 5 is the fixed, replayable budget. */
  val btRounds = 5

  /** Count-matrix resolution after rescale (see scaladoc). */
  val btCountRes = 100000L

  private val strengthUnit = 1000000L // micro
  private val clampHi = 10000000000L  // 10⁴ × unit

  /** (doc_id, source, q): the integer quality score, one map-only
    * scan. */
  def scoredDocs(docs: DataFrame): DataFrame = {
    val t = split(col("text"), " ")
    docs.select(col("doc_id"), col("source"),
      ((size(filter(t, x => x.isInCollection(TextOps.stopwords)))
        .cast("bigint") * lit(strengthUnit))
        .cast("bigint")).as("sw"),
      size(t).cast("bigint").as("nt"))
      .selectExpr("doc_id", "source", "sw div nt as q")
  }

  // ------------------------- preference pairs -------------------------

  /** Hardness tiers: rank gap as a fraction of the corpus — easy pairs
    * are half the list apart, hard pairs near-adjacent. */
  val prefTiers: Seq[(String, Long)] = Seq(
    ("easy", 2L), ("medium", 8L), ("hard", 64L))

  def qPrefPairs(spark: SparkSession, dir: String): DataFrame = {
    val sd = scoredDocs(Tables(spark, dir, "documents"))
    val ranked = graft.operators.RowNumbering.withGlobalRowNumber(
      sd, Seq(col("q").desc, col("doc_id").asc), "rn")
    val n1 = ranked.agg(count(lit(1)).as("n"))
    val w = ranked.select(col("rn").as("rw"), col("doc_id").as("winner_doc"),
      col("q").as("qw"))
    val l = ranked.select(col("rn").as("rl"), col("doc_id").as("loser_doc"),
      col("q").as("ql"))
    prefTiers.map { case (tier, denom) =>
      w.crossJoin(broadcast(n1))
        .selectExpr("rw", "winner_doc", "qw",
          s"rw + greatest(n div $denom, 1L) as want")
        .join(l, col("want") === col("rl"))
        .selectExpr(s"'$tier' as tier", "winner_doc", "loser_doc",
          "rw as winner_rank", "rl as loser_rank",
          "qw - ql as margin_micro")
    }.reduce(_.unionAll(_))
  }

  val qPrefPairsSql: String = {
    val tierSelects = prefTiers.map { case (tier, denom) =>
      s"""SELECT '$tier' AS tier, w.doc_id AS winner_doc,
        |  l.doc_id AS loser_doc, w.rn AS winner_rank,
        |  l.rn AS loser_rank, w.q - l.q AS margin_micro
        |FROM ranked w CROSS JOIN nn
        |JOIN ranked l
        |  ON l.rn = w.rn + GREATEST(nn.n // $denom, 1)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH sd AS (
      |  SELECT doc_id, source,
      |    (CAST(len(list_filter(string_split(text, ' '),
      |       x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS BIGINT)
      |     * 1000000)
      |      // CAST(len(string_split(text, ' ')) AS BIGINT) AS q
      |  FROM documents),
      |ranked AS MATERIALIZED (
      |  SELECT doc_id, q,
      |    CAST(row_number() OVER (ORDER BY q DESC, doc_id ASC)
      |      AS BIGINT) AS rn
      |  FROM sd),
      |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ranked)
      |$tierSelects""".stripMargin
  }

  // -------------------------- Bradley-Terry ---------------------------

  /** The |S|²-cell win matrix (i, j, wins of i over j) — one sort, one
    * partial agg, Θ(n²) masses on DECIMAL(38,0). `srcs` must enumerate
    * every source (bounded domain, sorted). */
  def winMatrix(sd: DataFrame, srcs: Seq[String]): DataFrame = {
    val withInd = srcs.zipWithIndex.foldLeft(sd) { case (df, (s, k)) =>
      df.withColumn(s"i$k", (col("source") === s).cast("bigint"))
    }
    val cum = graft.operators.PrefixSum.withRunningTotals(
      withInd, Seq(col("q").asc, col("doc_id").asc),
      srcs.indices.map(k => s"i$k"), srcs.indices.map(k => s"c$k"))
    // beats_j(a) = inclusive cum_j at a − [a ∈ j]
    val aggs = srcs.indices.map { k =>
      sum((col(s"c$k") - col(s"i$k")).cast(DecimalType(38, 0)))
        .as(s"w$k")
    }
    val sums = cum.groupBy("source").agg(aggs.head, aggs.tail: _*)
    val stackExpr = srcs.indices.map { k =>
      s"'${srcs(k)}', coalesce(w$k, cast(0 as decimal(38,0)))"
    }.mkString(", ")
    sums.selectExpr("source as i",
        s"stack(${srcs.size}, $stackExpr) as (j, wins)")
      .filter(col("i") =!= col("j"))
  }

  /** Integer MM iteration over the collected (bounded) matrix:
    * strengths in micro units, every op a truncating Long division. */
  def mmStrengths(cells: Map[(String, String), Long],
                  srcs: Seq[String]): Map[String, Long] = {
    // add-1 smoothing on the (already ≤ btCountRes-resolution)
    // off-diagonal counts — Davidson's regularization keeps zero-win
    // sources at finite strength
    val c = (for { i <- srcs; j <- srcs if i != j }
      yield (i, j) -> (cells.getOrElse((i, j), 0L) + 1L)).toMap
    var s = srcs.map(_ -> strengthUnit).toMap
    for (_ <- 1 to btRounds) {
      val sNew = srcs.map { i =>
        val wI = srcs.filter(_ != i)
          .map(j => c((i, j))).sum
        val den = srcs.filter(_ != i).map { j =>
          val pair = c((i, j)) + c((j, i))
          pair * strengthUnit * strengthUnit / (s(i) + s(j))
        }.sum
        i -> (if (den == 0L) strengthUnit
              else wI * strengthUnit * strengthUnit / den)
      }.toMap
      val clamped = sNew.map { case (k, v) =>
        k -> math.max(1L, math.min(clampHi, v)) }
      val tot = clamped.values.sum
      s = clamped.map { case (k, v) =>
        k -> math.max(1L, v * (srcs.size * strengthUnit) / tot) }
    }
    s
  }

  def qBradleyTerry(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val srcs = docs.select("source").distinct()
      .collect().map(_.getString(0)).sorted.toSeq // bounded domain
    val sd = scoredDocs(docs)
    val wm = winMatrix(sd, srcs)
    // rescale Θ(n²) masses to Long BEFORE collecting (documented: BT
    // is count-scale invariant; resolution btCountRes)
    val cells = wm.collect().map { r =>
      (r.getString(0), r.getString(1)) ->
        r.getDecimal(2).toBigInteger
    }.toMap
    val maxW = cells.values.map(v => BigInt(v)).foldLeft(BigInt(0))(_ max _)
    val down = (maxW / BigInt(btCountRes) + 1)
    val longCells = cells.map { case (k, v) =>
      k -> (BigInt(v) / down).toLong }
    val s = mmStrengths(longCells, srcs)
    val winsOf = srcs.map(i => i -> srcs.filter(_ != i)
      .map(j => longCells.getOrElse((i, j), 0L)).sum).toMap
    val lossOf = srcs.map(i => i -> srcs.filter(_ != i)
      .map(j => longCells.getOrElse((j, i), 0L)).sum).toMap
    val rows = srcs.map { i =>
      Row(i, winsOf(i), lossOf(i), s(i)) }
    val schema = StructType(Seq(
      StructField("source", StringType, nullable = false),
      StructField("wins_scaled", LongType, nullable = false),
      StructField("losses_scaled", LongType, nullable = false),
      StructField("strength_micro", LongType, nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    // rank over the ≤ |S|-row strength table — bounded-domain window
    df.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("strength_micro").desc, col("source").asc))
      .cast("bigint"))
  }

  /** Oracle: the naive pair join (exact at oracle scale — both sides
    * compute the same exact integers) + the identical downscale /
    * smoothing / MM-round unroll in SQL. */
  val qBradleyTerrySql: String = {
    val u = strengthUnit
    // every stage MATERIALIZED: DuckDB inlines plain CTEs, and the
    // round chain re-evaluated per reference blows past the oracle
    // cost ceiling (the classifierTrainCtes lesson)
    val rounds = (1 to btRounds).map { r =>
      val prev = if (r == 1) "s0" else s"s${r - 1}"
      s"""t$r AS MATERIALIZED (
        |  SELECT p.i, SUM(p.pair * $u * $u // (si.s + sj.s)) AS den
        |  FROM sym p
        |  JOIN $prev si ON si.src = p.i
        |  JOIN $prev sj ON sj.src = p.j
        |  GROUP BY p.i),
        |c$r AS MATERIALIZED (
        |  SELECT w.i AS src, GREATEST(1, LEAST($clampHi,
        |    CASE WHEN t.den = 0 THEN $u
        |    ELSE (w.wi * $u * $u) // t.den END)) AS v
        |  FROM wtot w JOIN t$r t ON t.i = w.i),
        |n$r AS MATERIALIZED (SELECT SUM(v) AS tot FROM c$r),
        |s$r AS MATERIALIZED (
        |  SELECT src, GREATEST(1, v * (sc.cnt * $u) // n.tot) AS s
        |  FROM c$r CROSS JOIN n$r n CROSS JOIN scnt sc)""".stripMargin
    }.mkString(",\n")
    s"""WITH sd AS MATERIALIZED (
      |  SELECT doc_id, source,
      |    (CAST(len(list_filter(string_split(text, ' '),
      |       x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS BIGINT)
      |     * 1000000)
      |      // CAST(len(string_split(text, ' ')) AS BIGINT) AS q
      |  FROM documents),
      |srcs AS MATERIALIZED (SELECT DISTINCT source AS src FROM sd),
      |scnt AS MATERIALIZED (SELECT COUNT(*) AS cnt FROM srcs),
      |wm AS MATERIALIZED (
      |  SELECT a.source AS i, b.source AS j,
      |    CAST(COUNT(*) AS HUGEINT) AS w
      |  FROM sd a JOIN sd b
      |    ON a.source <> b.source
      |   AND (a.q > b.q OR (a.q = b.q AND a.doc_id > b.doc_id))
      |  GROUP BY 1, 2),
      |down AS MATERIALIZED (
      |  SELECT COALESCE(MAX(w), 1) // $btCountRes + 1 AS dv FROM wm),
      |grid AS MATERIALIZED (
      |  SELECT a.src AS i, b.src AS j,
      |    CAST(COALESCE(w.w, 0) // dv AS BIGINT) AS c
      |  FROM srcs a JOIN srcs b ON a.src <> b.src
      |  LEFT JOIN wm w ON w.i = a.src AND w.j = b.src
      |  CROSS JOIN down),
      |sym AS MATERIALIZED (
      |  SELECT a.i, a.j, (a.c + 1) + (b.c + 1) AS pair
      |  FROM grid a JOIN grid b ON a.i = b.j AND a.j = b.i),
      |wtot AS MATERIALIZED (
      |  SELECT i, SUM(c + 1) AS wi FROM grid GROUP BY i),
      |s0 AS MATERIALIZED (
      |  SELECT src, CAST($u AS BIGINT) AS s FROM srcs),
      |$rounds,
      |wl AS (SELECT i, SUM(c) AS ws FROM grid GROUP BY i),
      |ll AS (SELECT j, SUM(c) AS ls FROM grid GROUP BY j)
      |SELECT w.i AS source,
      |  CAST(w.ws AS BIGINT) AS wins_scaled,
      |  CAST(l.ls AS BIGINT) AS losses_scaled,
      |  CAST(s.s AS BIGINT) AS strength_micro,
      |  CAST(row_number() OVER (ORDER BY s.s DESC, w.i ASC)
      |    AS BIGINT) AS rank
      |FROM wl w JOIN ll l ON l.j = w.i
      |JOIN s$btRounds s ON s.src = w.i""".stripMargin
  }
}
