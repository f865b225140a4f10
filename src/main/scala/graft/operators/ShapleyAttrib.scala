package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** EXACT SHAPLEY CHANNEL ATTRIBUTION (Shapley 1953; applied to
  * marketing/conversion credit as in Dalessandro et al. 2012,
  * "Causally motivated attribution for online advertising") — the
  * principled alternative to the last-touch heuristic
  * [[Events.qAttribution]] implements: credit each exposure CHANNEL by
  * its average marginal contribution over every coalition of
  * channels, the unique allocation satisfying efficiency, symmetry,
  * and dummy-player axioms.
  *
  * Instantiation on the events table: the four non-purchase event
  * types (click, signup, error, view) are the channels; a user's
  * COALITION is the set of channels they were exposed to; the
  * characteristic function is the monotone "reach" game
  *
  *   v(S) = #{ converted users whose exposure set ⊆ S }
  *
  * (a user's conversion is credited once the coalition covers every
  * channel that touched them — the grand coalition's value is total
  * conversions, the empty coalition's the unexposed converters).
  *
  * EXACTNESS. With |C| = 4 channels there are 16 coalitions; Shapley
  * weights |S|!·(|C|−|S|−1)! are integers over |C|! = 24, so
  * φᵢ·24 = Σ_{S∌i} w(|S|)·(v(S∪i) − v(S)) is EXACT INTEGER
  * arithmetic end to end, and efficiency (Σφᵢ·24 =
  * 24·(v(C) − v(∅))) is a machine-checkable identity (spec-pinned).
  * phi_micro = (φ·24)·10⁶ div 24 and share_micro are integer
  * divisions of exact longs.
  *
  * SCALE SHAPE. ONE corpus scan builds the per-user (exposure
  * bitmask, converted) pair; one partial-agg shuffle collapses it to
  * the ≤2^|C|-row mask histogram — every coalition enumeration
  * thereafter (subset-sum to v(S), the marginal sweep) is broadcast
  * crossJoins over ≤16-row frames, driver-sized no matter the corpus.
  * 2^|C| caps the state: the design holds to |C| ≈ 20 before the
  * histogram itself needs a shuffle, far beyond real channel counts.
  */
object ShapleyAttrib {

  /** Channel order fixes the bit assignment (bit i = channels(i)). */
  val channels: Seq[String] = Seq("click", "signup", "error", "view")

  private val nC = channels.size
  private val full = (1 << nC) - 1

  private def factorial(k: Int): Long = (1 to k).foldLeft(1L)(_ * _)

  /** Per-user (mask, conv) from raw events — the one corpus scan. */
  def exposureMasks(events: DataFrame): DataFrame = {
    val bit = channels.zipWithIndex
      .map { case (c, i) =>
        when(col("event_type") === c, lit(1L << i)).otherwise(lit(0L)) }
      .reduce(_.bitwiseOR(_))
    events.groupBy("user_id").agg(
      // OR over the group: max per bit ≡ bit_or for per-row one-bit
      // contributions is wrong in general, so aggregate each bit's
      // presence separately and re-assemble — still one partial agg
      channels.zipWithIndex.map { case (c, i) =>
        max(when(col("event_type") === c, lit(1L << i)).otherwise(lit(0L)))
          .as(s"b$i")
      }.head,
      channels.zipWithIndex.tail.map { case (c, i) =>
        max(when(col("event_type") === c, lit(1L << i)).otherwise(lit(0L)))
          .as(s"b$i")
      } :+ max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("conv"): _*)
      .select(
        (0 until nC).map(i => col(s"b$i")).reduce(_ + _).as("mask"),
        col("conv"))
  }

  /** The Shapley table from any per-user (mask, conv) frame —
    * coalition game + exact marginal sweep over bounded frames. */
  def shapleyFromMasks(masks: DataFrame): DataFrame = {
    val spark = masks.sparkSession
    import spark.implicits._
    // ≤2^|C|-row histogram of converted users by exact exposure set —
    // materialized ONCE: the game frame v is consumed twice by the
    // marginal sweep and once by the efficiency total, and without the
    // checkpoint each consumer would re-scan the corpus
    // (plan-asserted in PlanAuditR14Spec)
    val (hist, _) = graft.util.Checkpoints.checkpointTracked(
      masks.filter(col("conv") === 1L)
        .groupBy("mask").agg(count(lit(1)).as("cnt")))
    // v(S) = Σ_{m ⊆ S} cnt(m): 16×16 subset-sum, all broadcast
    val coal = spark.range(0, full + 1).toDF("s")
    val v = coal.join(broadcast(hist),
        (col("mask").bitwiseAND(expr(s"~s & ${full}L"))) === 0L, "left")
      .groupBy("s").agg(coalesce(sum("cnt"), lit(0L)).as("v"))
    // marginal sweep: for each channel bit and each S not containing
    // it, weight w(|S|) = |S|!·(|C|−|S|−1)!  (integer over |C|!)
    val chan = channels.zipWithIndex
      .map { case (c, i) => (c, 1L << i) }.toDF("channel", "bit")
    val wExpr = (0 until nC).map(k =>
        s"when bit_count(s) = $k then ${factorial(k) * factorial(nC - 1 - k)}L")
      .mkString("case ", " ", " end")
    val sweep = chan.crossJoin(broadcast(v))
      .filter(col("s").bitwiseAND(col("bit")) === 0L)
      .join(broadcast(v.select(col("s").as("s1"), col("v").as("v1"))),
        col("s1") === col("s").bitwiseOR(col("bit")))
      .groupBy("channel", "bit")
      .agg(sum(expr(wExpr) * (col("v1") - col("v"))).as("phi_f"))
    val fact = factorial(nC)
    sweep.crossJoin(broadcast(
        sweep.agg(sum("phi_f").as("tot_f"))))
      .select(col("channel"),
        col("phi_f"),
        expr(s"(phi_f * 1000000L) div ${fact}L").as("phi_micro"),
        expr("case when tot_f = 0 then 0L else (phi_f * 1000000L) div tot_f end")
          .as("share_micro"))
      .orderBy(col("channel"))
  }

  def shapleyChannels(events: DataFrame): DataFrame =
    shapleyFromMasks(exposureMasks(events))

  def qShapleyChannels(spark: SparkSession, dir: String): DataFrame =
    shapleyChannels(Tables(spark, dir, "events"))

  /** Full replay: mask build, subset-sum game, exact marginal sweep.
    * DuckDB's `&`/`|` bit operators and `bit_count` mirror Spark's. */
  val qShapleyChannelsSql: String = {
    val bitSum = channels.zipWithIndex.map { case (c, i) =>
      s"MAX(CASE WHEN event_type = '$c' THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")
    val wCase = (0 until nC).map(k =>
      s"WHEN bit_count(v0.s) = $k THEN ${factorial(k) * factorial(nC - 1 - k)}")
      .mkString("CASE ", " ", " END")
    val chanRows = channels.zipWithIndex
      .map { case (c, i) => s"('$c', ${1L << i})" }.mkString(", ")
    s"""WITH pu AS (
       |  SELECT user_id, $bitSum AS mask,
       |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
       |  FROM events GROUP BY user_id),
       |hist AS (
       |  SELECT mask, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM pu WHERE conv = 1 GROUP BY mask),
       |coal AS (SELECT range AS s FROM range(0, ${full + 1})),
       |vv AS (
       |  SELECT s, CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS v
       |  FROM coal LEFT JOIN hist ON (hist.mask & (~coal.s & $full)) = 0
       |  GROUP BY s),
       |chan(channel, bit) AS (VALUES $chanRows),
       |sweep AS (
       |  SELECT channel,
       |    CAST(SUM(($wCase) * (v1.v - v0.v)) AS BIGINT) AS phi_f
       |  FROM chan CROSS JOIN vv v0
       |  JOIN vv v1 ON v1.s = (v0.s | chan.bit)
       |  WHERE (v0.s & chan.bit) = 0
       |  GROUP BY channel),
       |tot AS (SELECT SUM(phi_f) AS tot_f FROM sweep)
       |SELECT channel, phi_f,
       |  CAST((phi_f * 1000000) // ${factorial(nC)} AS BIGINT) AS phi_micro,
       |  CAST(CASE WHEN tot.tot_f = 0 THEN 0
       |    ELSE (phi_f * 1000000) // tot.tot_f END AS BIGINT) AS share_micro
       |FROM sweep, tot ORDER BY channel""".stripMargin
  }
}
