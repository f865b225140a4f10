package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** CUMULATIVE GAINS / LIFT CURVE — the model-consumer's view of the
  * quality scorer the calibration family grades from the model's
  * side: rank documents by the KN score, cut into deciles, and ask
  * "if I keep only the top d/10, what fraction of the truly-good
  * documents do I capture, and at what lift over random?"
  *
  *   gain(d) = cumPos(d) / totalPos,
  *   lift(d) = (cumPos(d)·totalN) / (cumN(d)·totalPos).
  *
  * The decile where lift crosses 1 is where the scorer stops adding
  * value — the keep-budget number a curation plan reads off directly
  * (where [[IsotonicCal]] answers "is the probability honest" and
  * [[graft.ext.CorpusOps.qClassifierEval]] "is the ranking right").
  *
  * DETERMINISM. Semantics are EXACT global ranks under
  * (s desc, doc_id asc) with decile = (rn−1)·10 div n + 1 — identical
  * to [[qGainsCurveSql]]'s row_number formulation. Counts are exact
  * integers; the closing gain/lift rounding runs through the SAME
  * Spark `round` expression as always (the 7 curve columns are
  * produced by one selectExpr over the 10-row decile table), so the
  * hash vs the oracle is unchanged.
  *
  * SCALE (round-15 rework; the ask was flattening a 9.97× 100× slope).
  * The old implementation materialized a per-row global row number
  * (two-level, but still a full range-shuffle + sort of the scored
  * corpus). The curve never needed per-row ranks — only the NINE
  * boundary ORDER STATISTICS. Those come from the two-phase
  * distributed selection ([[CorpusOps.kthLargestWeighted]]'s posture,
  * generalized): decile row-count boundaries K_d = ⌈d·n/10⌉ are
  * arithmetic; the boundary KEYS (s*, id*) at each K_d come from
  * shared bucket-histogram passes (all nine boundaries per pass,
  * 4096-wide adaptive grid, ≤12 bits refined per level — bounded
  * driver state, a handful of partial-agg scans, NO global sort, NO
  * shuffle beyond ≤4096-row aggregates); rank ties inside an equal-s
  * run resolve by the same selection on doc_id (unique per row). One
  * closing scan evaluates all nine cumulative-positive counters as
  * conditional sums. Everything the corpus size touches is a
  * map-side partial aggregation. */
object GainsCurve {

  /** One refinement level narrows each tracked window by 2^12. */
  private val levelBits = 12

  /** h − l saturating at Long.MaxValue: the selection windows start at
    * (min, max) of an arbitrary long column, whose span can exceed
    * Long.MaxValue — a wrapped width would degrade shift to 0 and
    * collect every distinct value. */
  private def satWidth(l: Long, h: Long): Long = {
    val d = h - l
    if (((h ^ l) & (h ^ d)) < 0L) Long.MaxValue else d
  }

  /** For each rank k in `ks` (1 = largest under `c` desc), the exact
    * boundary: (value v, #rows with c > v, #rows with c = v).
    * Shared iterative histogram selection: every level is ONE
    * partial-agg scan covering ALL ranks (windows OR'd into the
    * filter), collecting ≤ 4096·|ks| bucket rows. Levels =
    * ⌈bits(range)/12⌉ ≤ 6, typically 2. */
  private[ext] def multiSelectLargest(df: DataFrame, c: Column,
      ks: Seq[Long], lo0: Long, hi0: Long): Map[Long, (Long, Long, Long)] = {
    // per-rank window state: rank -> (rowsAboveWindow, lo, hi)
    var state = ks.distinct.map(k => k -> (0L, lo0, hi0)).toMap
    var out = Map.empty[Long, (Long, Long, Long)]
    while (state.nonEmpty) {
      val width = state.values.map { case (_, l, h) => satWidth(l, h) }.max
      val shift = math.max(0,
        64 - java.lang.Long.numberOfLeadingZeros(math.max(width, 1L)) -
          levelBits)
      val windows = state.values.map { case (_, l, h) => (l, h) }.toSeq.distinct
      val cond = windows.map { case (l, h) => c >= l && c <= h }
        .reduce(_ || _)
      val hist = df.filter(cond)
        .groupBy(shiftright(c, shift).as("b"))
        .agg(count(lit(1)).as("cnt"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(-_._1)
      state = state.flatMap { case (k, (base, lo, hi)) =>
        // Walk this window's buckets from the top until rank k lands.
        // A bucket belongs to at most ONE window: bucket grids are
        // aligned (coarse boundaries are multiples of the fine width),
        // so fine buckets nest inside exactly one previous-level
        // window; the row filter already confined counts to windows,
        // so a plain overlap test is exact.
        var cum = base
        var found = false
        var next: Option[(Long, (Long, Long, Long))] = None
        val it = hist.iterator
        while (it.hasNext && !found) {
          val (b, cnt) = it.next()
          val bLo = b << shift
          // shift=0 → bHi = bLo = value; saturate: buckets adjoining
          // Long.MaxValue must not wrap past it and dodge the overlap
          // test (that would lose the top bucket → require(found) trips)
          val bSpan = (1L << shift) - 1
          val bHi =
            if (bLo > Long.MaxValue - bSpan) Long.MaxValue
            else bLo + bSpan
          if (bHi >= lo && bLo <= hi) {
            if (cum + cnt >= k) {
              found = true
              if (shift == 0) out += k -> (b, cum, cnt)
              else next = Some(k ->
                (cum, math.max(bLo, lo), math.min(bHi, hi)))
            } else cum += cnt
          }
        }
        require(found, s"rank $k not located (window [$lo,$hi])")
        next
      }
    }
    out
  }

  def gainsCurve(sl: DataFrame): DataFrame = {
    val spark = sl.sparkSession
    val outSchema = StructType(Seq(
      StructField("decile", LongType, nullable = false),
      StructField("n_d", LongType, nullable = false),
      StructField("pos_d", LongType, nullable = false),
      StructField("cum_n", LongType, nullable = false),
      StructField("cum_pos", LongType, nullable = false)))
    val (scored, release) = graft.util.Checkpoints.checkpointTracked(
      sl.select(col("doc_id").cast("long").as("doc_id"),
        col("s").cast("long").as("s"), col("y").cast("long").as("y")))
    try {
      val st = scored.agg(count(lit(1)), sum("y"), min("s"), max("s")).head()
      val n = st.getLong(0)
      if (n == 0) {
        // matches the SQL: zero input rows → zero curve rows
        return spark.createDataFrame(
          new java.util.ArrayList[Row](), outSchema)
          .selectExpr("decile", "n_d", "pos_d", "cum_n", "cum_pos",
            "cum_n as gain_micro", "cum_n as lift_micro")
      }
      val totalPos = st.getLong(1)
      val (minS, maxS) = (st.getLong(2), st.getLong(3))
      // decile boundaries in rank space: decile d covers
      // rn−1 ∈ [⌈(d−1)n/10⌉, ⌈dn/10⌉−1] ⇒ cumN(d) = ⌈dn/10⌉
      val kd = (1 to 10).map(d => (d.toLong * n + 9) / 10)
      val bounds = multiSelectLargest(
        scored, col("s"), kd.take(9).filter(_ >= 1), minS, maxS)
      // per-boundary composite cut (v_d, idCut_d): rank K_d's row has
      // s = v_d; within the equal-s run ranks go by doc_id ASC, so the
      // cut keeps the m_d smallest doc_ids (m_d = K_d − #rows above).
      // m_d = eq ⇒ the whole run is in ⇒ no id resolution needed.
      val raw = kd.take(9).map { k =>
        val (v, above, eq) = bounds(k)
        (k, v, k - above, eq)
      }
      // Boundaries falling in the SAME equal-s run share one tie set:
      // resolve all their ranks in a single multiSelectLargest over
      // that run (heavily tied scores would otherwise rescan the same
      // tie rows up to 9 times). m ≥ eq ⇒ whole run in ⇒ no resolution.
      val idCutByK: Map[Long, Long] = raw
        .filter { case (_, _, m, eq) => m < eq }
        .groupBy(_._2).flatMap { case (v, grp) =>
          // m-th smallest doc_id among the s = v rows = m-th largest
          // of −doc_id (ids are unique: eq-count per value is 1)
          val tie = scored.filter(col("s") === v)
          val mm = tie.agg(min("doc_id"), max("doc_id")).head()
          val sel = multiSelectLargest(tie, -col("doc_id"),
            grp.map(_._3), -mm.getLong(1), -mm.getLong(0))
          grp.map { case (k, _, m, _) => k -> -sel(m)._1 }
        }
      val cuts: Seq[(Long, Long, Long)] = raw.map { case (k, v, m, eq) =>
        (k, v, if (m >= eq) Long.MaxValue else idCutByK(k))
      }
      // ONE closing scan: all nine cumulative positive counts
      val cumExprs = cuts.zipWithIndex.map { case ((_, v, idCut), i) =>
        sum(when(col("s") > v ||
          (col("s") === v && col("doc_id") <= idCut), col("y"))
          .otherwise(0L)).as(s"c$i")
      }
      val cumRow = scored.agg(cumExprs.head, cumExprs.tail: _*).head()
      val cumPos = cuts.indices.map(i => cumRow.getLong(i)) :+ totalPos
      val rows = new java.util.ArrayList[Row]()
      var prevK = 0L; var prevP = 0L
      (1 to 10).foreach { d =>
        val (kcur, pcur) = (kd(d - 1), cumPos(d - 1))
        if (kcur > prevK) // empty deciles don't emit (GROUP BY shape)
          rows.add(Row(d.toLong, kcur - prevK, pcur - prevP, kcur, pcur))
        prevK = kcur; prevP = pcur
      }
      // the rounding columns run through Spark's own `round`, exactly
      // as the previous formulation — identical hash machinery
      spark.createDataFrame(rows, outSchema)
        .crossJoin(broadcast(spark.range(1).select(
          lit(n).as("tn"), lit(totalPos).as("tp"))))
        .selectExpr("decile", "n_d", "pos_d", "cum_n", "cum_pos",
          """case when tp = 0 then 0 else
            |cast(round(1000000.0 * cast(cum_pos as double)
            |  / cast(tp as double)) as bigint) end as gain_micro"""
            .stripMargin.replace("\n", " "),
          """case when tp = 0 or cum_n = 0 then 0 else
            |cast(round(1000000.0 * cast(cum_pos as double)
            |  * cast(tn as double)
            |  / (cast(cum_n as double) * cast(tp as double)))
            | as bigint) end as lift_micro"""
            .stripMargin.replace("\n", " "))
        .orderBy("decile")
    } finally release()
  }

  def qGainsCurve(spark: SparkSession, dir: String): DataFrame =
    gainsCurve(IsotonicCal.scoredLabeled(spark, dir))

  val qGainsCurveSql: String =
    s"""WITH ${IsotonicCal.slCtes},
       |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM sl),
       |ranked AS (
       |  SELECT y, row_number() OVER (ORDER BY s DESC, doc_id ASC)
       |    AS rn FROM sl),
       |deciles AS (
       |  SELECT (rn - 1) * 10 // (SELECT GREATEST(n, 1) FROM nn) + 1
       |      AS decile,
       |    CAST(COUNT(*) AS BIGINT) AS n_d,
       |    CAST(SUM(y) AS BIGINT) AS pos_d
       |  FROM ranked GROUP BY 1),
       |tot AS (SELECT CAST(SUM(n_d) AS BIGINT) AS tn,
       |    CAST(SUM(pos_d) AS BIGINT) AS tp FROM deciles),
       |curve AS (
       |  SELECT decile, n_d, pos_d,
       |    CAST(SUM(n_d) OVER w AS BIGINT) AS cum_n,
       |    CAST(SUM(pos_d) OVER w AS BIGINT) AS cum_pos, tn, tp
       |  FROM deciles, tot
       |  WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING))
       |SELECT decile, n_d, pos_d, cum_n, cum_pos,
       |  CASE WHEN tp = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * CAST(cum_pos AS DOUBLE)
       |      / CAST(tp AS DOUBLE)) AS BIGINT) END AS gain_micro,
       |  CASE WHEN tp = 0 OR cum_n = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * CAST(cum_pos AS DOUBLE)
       |      * CAST(tn AS DOUBLE)
       |      / (CAST(cum_n AS DOUBLE) * CAST(tp AS DOUBLE)))
       |      AS BIGINT) END AS lift_micro
       |FROM curve
       |ORDER BY decile""".stripMargin
}
