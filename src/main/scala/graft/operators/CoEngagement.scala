package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** CO-ENGAGEMENT MATRIX — "users who do X also do Y": the pairwise
  * Jaccard / conditional-reach table over event types that sits
  * behind every cross-sell and feature-adoption dashboard,
  *
  *   J(x, y) = |U_x ∩ U_y| / |U_x ∪ U_y|,
  *   P(y | x) = |U_x ∩ U_y| / |U_x|.
  *
  * DETERMINISM & SCALE — the [[ShapleyAttrib]] bitmask trick: ONE
  * scan folds each user to a ≤2⁵ bitmask over the event-type
  * alphabet, the corpus collapses to the ≤32-row mask histogram, and
  * every pairwise intersection/union is an exact integer sum over
  * that histogram — the |types|² table costs nothing more than the
  * one per-user aggregate regardless of corpus size. Jaccard and
  * the conditional are single rounded divisions of exact integers. */
object CoEngagement {

  /** The event-type alphabet in bit order (alphabetical). */
  val types: Seq[String] = Seq("click", "error", "purchase", "signup",
    "view")

  def coEngagement(events: DataFrame): DataFrame = {
    val bits = types.zipWithIndex.map { case (t, i) =>
      max(when(col("event_type") === t, 1L << i).otherwise(0L))
    }
    val masks = events.groupBy("user_id")
      .agg(bits.reduce(_ + _).as("mask"))
      .groupBy("mask").agg(count(lit(1)).as("c"))
    val spark = events.sparkSession
    import spark.implicits._
    val pairs = (for {
      i <- types.indices; j <- types.indices if i < j
    } yield (types(i), types(j), 1L << i, 1L << j))
      .toDF("type_x", "type_y", "bx", "by")
    masks.crossJoin(broadcast(pairs))
      .groupBy("type_x", "type_y")
      .agg(
        sum(when((col("mask").bitwiseAND(col("bx"))) =!= 0, col("c"))
          .otherwise(0L)).as("n_x"),
        sum(when((col("mask").bitwiseAND(col("by"))) =!= 0, col("c"))
          .otherwise(0L)).as("n_y"),
        sum(when((col("mask").bitwiseAND(col("bx"))) =!= 0 &&
          (col("mask").bitwiseAND(col("by"))) =!= 0, col("c"))
          .otherwise(0L)).as("n_both"))
      .selectExpr("type_x", "type_y", "n_x", "n_y", "n_both",
        """case when n_x + n_y - n_both = 0 then 0 else
          |cast(round(1000000.0 * cast(n_both as double)
          |  / (cast(n_x as double) + n_y - n_both)) as bigint) end
          |as jaccard_micro""".stripMargin.replace("\n", " "),
        """case when n_x = 0 then 0 else
          |cast(round(1000000.0 * cast(n_both as double)
          |  / cast(n_x as double)) as bigint) end
          |as p_y_given_x_micro""".stripMargin.replace("\n", " "))
      .orderBy("type_x", "type_y")
  }

  def qCoEngagement(spark: SparkSession, dir: String): DataFrame =
    coEngagement(Tables(spark, dir, "events"))

  val qCoEngagementSql: String = {
    val bitSum = types.zipWithIndex.map { case (t, i) =>
      s"MAX(CASE WHEN event_type = '$t' THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")
    val pairVals = (for {
      i <- types.indices; j <- types.indices if i < j
    } yield s"('${types(i)}', '${types(j)}', ${1L << i}, ${1L << j})")
      .mkString(", ")
    s"""WITH masks AS (
       |  SELECT mask, CAST(COUNT(*) AS BIGINT) AS c FROM (
       |    SELECT user_id, $bitSum AS mask
       |    FROM events GROUP BY user_id)
       |  GROUP BY mask),
       |pairs(type_x, type_y, bx, by) AS (VALUES $pairVals),
       |agg AS (
       |  SELECT type_x, type_y,
       |    CAST(SUM(CASE WHEN (mask & bx) <> 0 THEN c ELSE 0 END)
       |      AS BIGINT) AS n_x,
       |    CAST(SUM(CASE WHEN (mask & by) <> 0 THEN c ELSE 0 END)
       |      AS BIGINT) AS n_y,
       |    CAST(SUM(CASE WHEN (mask & bx) <> 0 AND (mask & by) <> 0
       |      THEN c ELSE 0 END) AS BIGINT) AS n_both
       |  FROM masks CROSS JOIN pairs GROUP BY 1, 2)
       |SELECT type_x, type_y, n_x, n_y, n_both,
       |  CASE WHEN n_x + n_y - n_both = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * CAST(n_both AS DOUBLE)
       |      / (CAST(n_x AS DOUBLE) + n_y - n_both)) AS BIGINT) END
       |    AS jaccard_micro,
       |  CASE WHEN n_x = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * CAST(n_both AS DOUBLE)
       |      / CAST(n_x AS DOUBLE)) AS BIGINT) END
       |    AS p_y_given_x_micro
       |FROM agg
       |ORDER BY type_x, type_y""".stripMargin
  }
}
