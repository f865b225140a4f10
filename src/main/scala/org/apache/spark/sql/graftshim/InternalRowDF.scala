package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bridge to Spark's `private[sql]` InternalRow surface.
  *
  * Lives under `org.apache.spark.sql` (subpackages see `private[sql]`
  * members) so engine operators can hop DataFrame → RDD[InternalRow] →
  * DataFrame without the external-Row round-trip: `df.rdd` deserializes
  * every Tungsten UnsafeRow into boxed `Row` objects (per-field
  * converters, one object per value) and `createDataFrame` re-encodes
  * them — pure overhead when the transform only appends a long. This is
  * the same mechanism Spark's own operators use; nothing here touches
  * execution internals beyond the two public-in-bytecode calls.
  */
object InternalRowDF {

  /** The physical plan's RDD of Tungsten rows (no external conversion). */
  def toInternalRdd(df: DataFrame): RDD[InternalRow] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.toRdd

  /** Wrap an RDD[InternalRow] back into a DataFrame (LogicalRDD). */
  def fromInternalRdd(spark: SparkSession, rdd: RDD[InternalRow],
                      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** The session's `private[sql]` UUID — a genuinely unique session id
    * (unlike `System.identityHashCode`, which recurs after GC), used to
    * scope cached artifacts to their building session. */
  def sessionUUID(spark: SparkSession): Option[String] = spark match {
    case c: org.apache.spark.sql.classic.SparkSession => Some(c.sessionUUID)
    case _ => None
  }
}
