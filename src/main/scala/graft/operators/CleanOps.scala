package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.config.Converters

/** Clean-stage scalar operators (SURVEY.md §2.2) surfaced as
  * oracle-checked queries over driver testdata. Dirty inputs (Excel
  * artifacts, empty strings, unparseable dates) are synthesized
  * deterministically from clean columns so both engines see identical
  * bytes.
  */
object CleanOps {

  /** P9/F7 — strip_excel ≡ btrim(col, "\"="): wrap real values in the
    * `="…"` Excel artifact, strip it back off through the converter
    * registry. */
  def qCleanStrip(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    docs.select(
      col("doc_id"),
      Converters("strip_excel")(
        concat(lit("=\""), col("source"), lit("\""))).as("stripped"))
  }

  val qCleanStripSql: String =
    """SELECT doc_id, trim('="' || source || '"', '"=') AS stripped
      |FROM documents""".stripMargin

  /** P4 — '' → NULL normalization, plus the F1 COALESCE default that
    * usually follows it. */
  def qCleanNulls(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val synthEmpty = when(col("event_id") % 7 === 0, lit(""))
      .otherwise(col("event_type"))
    val nulled = when(synthEmpty === "", lit(null).cast("string"))
      .otherwise(synthEmpty)
    ev.select(
      col("event_id"),
      nulled.as("etype_nulled"),
      coalesce(nulled, lit("UNKNOWN")).as("etype_defaulted"))
  }

  val qCleanNullsSql: String =
    """SELECT event_id,
      |  NULLIF(CASE WHEN event_id % 7 = 0 THEN '' ELSE event_type END, '')
      |    AS etype_nulled,
      |  COALESCE(
      |    NULLIF(CASE WHEN event_id % 7 = 0 THEN '' ELSE event_type END, ''),
      |    'UNKNOWN') AS etype_defaulted
      |FROM events""".stripMargin

  /** P3 — lenient datetime coercion: unparseable → null, never error
    * (pandas errors='coerce' ≡ Spark try_to_date under ANSI mode). */
  def qCleanDatecoerce(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val dirty = when(col("event_id") % 5 === 0, lit("not-a-date"))
      .otherwise(date_format(col("ts"), "yyyy-MM-dd"))
    // Emitted as an ISO string: DuckDB DATE surfaces as a midnight
    // timestamp through the comparator's pandas bridge, so a raw DATE
    // column can't hash-compare; the coercion itself is what's under test.
    ev.select(col("event_id"),
      date_format(try_to_date(dirty), "yyyy-MM-dd").as("coerced"))
  }

  val qCleanDatecoerceSql: String =
    """SELECT event_id,
      |  strftime(TRY_CAST(CASE WHEN event_id % 5 = 0 THEN 'not-a-date'
      |                         ELSE strftime(ts, '%Y-%m-%d') END AS DATE),
      |           '%Y-%m-%d') AS coerced
      |FROM events""".stripMargin

  /** P5 — bulk cast to declared types with coercion (astype analog);
    * bad cells → null via try_cast. */
  def qCleanCast(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val dirty = when(col("event_id") % 3 === 0, lit("oops"))
      .otherwise(col("user_id").cast("string"))
    ev.select(
      col("event_id"),
      dirty.try_cast("bigint").as("user_id_cast"))
  }

  val qCleanCastSql: String =
    """SELECT event_id,
      |  TRY_CAST(CASE WHEN event_id % 3 = 0 THEN 'oops'
      |                ELSE CAST(user_id AS VARCHAR) END AS BIGINT)
      |    AS user_id_cast
      |FROM events""".stripMargin
}
