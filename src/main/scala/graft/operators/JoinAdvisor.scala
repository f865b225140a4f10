package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** JOIN PLANNING ADVISOR — the cost numbers a physical planner (or the
  * engineer staring at an OOM'd stage) wants BEFORE running a join,
  * computed exactly from per-key count tables instead of guessed from
  * table-level statistics: the join's exact output cardinality
  * |A ⋈ B| = Σ_k cA(k)·cB(k), the heaviest key's share of that
  * output (the skew that one task will eat), and the resulting
  * strategy recommendation (broadcast / shuffle / salt). Catalyst
  * estimates these from column NDVs and uniformity assumptions —
  * which is exactly what skewed real data violates; this operator is
  * the measured version, the [[DataQuality.qSkewProfile]] posture
  * extended from one side to the join product.
  *
  * Plan shape: one partial-agg count per side (keyed shuffles), then
  * the advisor math runs entirely on the TWO COUNT TABLES (|keys|
  * rows, never the corpora): an inner equi-join on key, Σ products in
  * DECIMAL(38,0) (output mass at 100 TB overflows Long — the
  * CorrMatrix exactness pattern), max product, and the decision
  * thresholds as plain CASEs.
  *
  * Decision: `broadcast` if the dim side's row count fits the
  * broadcast budget; else `salt` if the hottest key's output share
  * exceeds [[saltShare]] (one task owning >that fraction of the join
  * is the imbalance AQE's skew split fires on); else `shuffle`. */
object JoinAdvisor {

  /** Row-count budget for recommending a broadcast build side —
    * a stand-in for spark.sql.autoBroadcastJoinThreshold's byte
    * budget, keyed on rows so the oracle reproduces it exactly. */
  val broadcastRows = 100000L
  /** Hot-key output share past which salting is recommended. */
  val saltShare = 0.2

  /** Advise one equi-join: exact output size + skew + strategy.
    * Output: (join_name, est_rows, n_keys_matched, max_key_rows,
    * top1_share, build_rows, strategy). */
  def advise(a: DataFrame, aKey: String, b: DataFrame, bKey: String,
             joinName: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val ca = a.groupBy(col(aKey).as("k")).agg(count(lit(1)).as("ca"))
    val cb = b.groupBy(col(bKey).as("k")).agg(count(lit(1)).as("cb"))
    val prod = ca.join(cb, "k")
      .select(col("k"), (col("ca").cast(dec) * col("cb")).cast(dec).as("p"))
    val bRows = b.count() // build-side cardinality — bounded metadata
    prod.agg(sum(col("p")).cast(dec).as("est"),
        count(lit(1)).as("n_keys_matched"), max(col("p")).cast(dec).as("mx"))
      .select(lit(joinName).as("join_name"),
        col("est").cast(LongType).as("est_rows"),
        col("n_keys_matched"),
        col("mx").cast(LongType).as("max_key_rows"),
        (col("mx").cast(DoubleType) / col("est").cast(DoubleType))
          .as("top1_share"),
        lit(bRows).as("build_rows"),
        when(lit(bRows) <= broadcastRows, "broadcast")
          .when(col("mx").cast(DoubleType) / col("est").cast(DoubleType)
            > saltShare, "salt")
          .otherwise("shuffle").as("strategy"))
  }

  /** One join's decision inputs, collected from ONE shared per-key
    * count pass (both [[advise]]'s thresholds and [[DqGate.saltsFor]]'s
    * fan-out read the same two |keys|-row tables): the advisor
    * thresholds (build cardinality, hot-key output share) plus the
    * fact-side skew statistics the salting fan-out needs. */
  final case class JoinDecision(strategy: String, estRows: BigDecimal,
                                maxKeyRows: BigDecimal, top1Share: Double,
                                buildRows: Long, factStats: DqGate.SkewStats)

  /** Decide the physical strategy for `fact ⋈ dim` from measured
    * counts — the closed loop [[DqGate.joinWithSkewGuard]] executes.
    * The fact-side count table is computed ONCE (releasable
    * checkpoint) and serves both the output-mass products and the
    * skew statistics; `broadcastBudget` is parameterized so tests
    * (and deployments with different executor memory) can move the
    * broadcast bar without re-deriving the rest. */
  def adviseJoin(fact: DataFrame, factKey: String, dim: DataFrame,
                 dimKey: String,
                 broadcastBudget: Long = broadcastRows): JoinDecision = {
    val dec = DecimalType(38, 0)
    val (ca, release) = graft.util.Checkpoints.checkpointTracked(
      fact.groupBy(col(factKey).as("k")).agg(count(lit(1)).as("ca")))
    try {
      val (cb, releaseB) = graft.util.Checkpoints.checkpointTracked(
        dim.groupBy(col(dimKey).as("k")).agg(count(lit(1)).as("cb")))
      try {
        val f = ca.agg(count(lit(1)).as("n_keys"), sum(col("ca")).as("n_rows"),
          max(col("ca")).as("max_cnt"),
          sum(col("ca").cast(dec) * col("ca")).as("sum_c2")).head()
        val nRows = f.getAs[Long]("n_rows")
        val stats = DqGate.SkewStats(f.getAs[Long]("n_keys"), nRows,
          f.getAs[Long]("max_cnt"),
          f.getAs[java.math.BigDecimal]("sum_c2").doubleValue() /
            (nRows.toDouble * nRows.toDouble))
        val p = ca.join(cb, "k")
          .select((col("ca").cast(dec) * col("cb")).cast(dec).as("p"))
          .agg(sum(col("p")).cast(dec).as("est"),
            max(col("p")).cast(dec).as("mx"))
          .crossJoin(cb.agg(sum(col("cb")).as("brows"))).head()
        val est = Option(p.getAs[java.math.BigDecimal]("est"))
          .map(BigDecimal(_)).getOrElse(BigDecimal(0))
        val mx = Option(p.getAs[java.math.BigDecimal]("mx"))
          .map(BigDecimal(_)).getOrElse(BigDecimal(0))
        val bRows = Option(p.getAs[java.lang.Long]("brows"))
          .map(_.longValue()).getOrElse(0L)
        val share =
          if (est > 0) mx.toDouble / est.toDouble else 0.0
        val strategy =
          if (bRows <= broadcastBudget) "broadcast"
          else if (share > saltShare) "salt"
          else "shuffle"
        JoinDecision(strategy, est, mx, share, bRows, stats)
      } finally releaseB()
    } finally release()
  }

  /** Driver query: advice for three joins of the schema — the
    * lineitem⋈orders key join (dim small enough to broadcast at this
    * SF), the lineitem⋈part join, and the events self-join on user_id
    * (the deliberately skew-prone one). */
  def qJoinAdvisor(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")
    val p = Tables(spark, dir, "part")
    val ev = Tables(spark, dir, "events")
    advise(li, "l_orderkey", o, "o_orderkey", "lineitem_orders")
      .unionAll(advise(li, "l_partkey", p, "p_partkey", "lineitem_part"))
      .unionAll(advise(ev, "user_id", ev, "user_id", "events_self"))
  }

  val qJoinAdvisorSql: String = {
    def arm(name: String, ta: String, ka: String, tb: String,
            kb: String): String =
      s"""SELECT '$name' AS join_name,
        |  CAST(SUM(p) AS BIGINT) AS est_rows,
        |  CAST(COUNT(*) AS BIGINT) AS n_keys_matched,
        |  CAST(MAX(p) AS BIGINT) AS max_key_rows,
        |  CAST(MAX(p) AS DOUBLE) / CAST(SUM(p) AS DOUBLE) AS top1_share,
        |  (SELECT COUNT(*) FROM $tb) AS build_rows,
        |  CASE WHEN (SELECT COUNT(*) FROM $tb) <= $broadcastRows
        |         THEN 'broadcast'
        |       WHEN CAST(MAX(p) AS DOUBLE) / CAST(SUM(p) AS DOUBLE)
        |           > $saltShare THEN 'salt'
        |       ELSE 'shuffle' END AS strategy
        |FROM (
        |  SELECT ca.k, CAST(ca.c AS HUGEINT) * cb.c AS p
        |  FROM (SELECT $ka AS k, CAST(COUNT(*) AS BIGINT) AS c
        |        FROM $ta GROUP BY 1) ca
        |  JOIN (SELECT $kb AS k, CAST(COUNT(*) AS BIGINT) AS c
        |        FROM $tb GROUP BY 1) cb ON ca.k = cb.k)""".stripMargin
    Seq(arm("lineitem_orders", "lineitem", "l_orderkey",
        "orders", "o_orderkey"),
      arm("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
      arm("events_self", "events", "user_id", "events", "user_id"))
      .mkString("\nUNION ALL\n")
  }
}
