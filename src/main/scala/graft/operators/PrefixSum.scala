package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.graftshim.InternalRowDF
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Distributed inclusive running total — `SUM(v) OVER (ORDER BY …
  * ROWS UNBOUNDED PRECEDING)` without the single-partition window that
  * plain `Window.orderBy` plans (one executor scans the whole table).
  *
  * Same scalable shape as [[RowNumbering]] (which is the `v = 1`
  * special case):
  *
  *   1. `orderBy(keys)` — range-partitioned sort, one exchange, each
  *      partition a contiguous key range;
  *   2. one lightweight per-partition SUM job over the sorted
  *      checkpoint (a long per partition reaches the driver — never
  *      rows), scanned left into per-partition starting offsets;
  *   3. a map pass appends offset + running local sum, in Tungsten
  *      format (`JoinedRow` over the sorted UnsafeRow — no external-Row
  *      round-trip).
  *
  * Cost at 100 TB: the sort you were doing anyway + one summing pass
  * reusing its shuffle files + a #partitions-sized driver array.
  * Long-sum overflow is the caller's contract (token counts: 2⁶³ ≫ any
  * corpus's total tokens). `sortCols` must be a total order for
  * deterministic output (same contract as RowNumbering).
  *
  * The sorted RDD is persisted serialized THEN localCheckpoint'ed —
  * the sum job doubles as materialization, downstream executions read
  * cached partitions, and serialized blocks stay invisible to the GC
  * (see RowNumbering's narrative; same reasoning verbatim).
  */
object PrefixSum {
  def withRunningTotal(df: DataFrame, sortCols: Seq[Column],
                       valueCol: String, outCol: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(sortCols: _*)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    val getV: InternalRow => Long = sorted.schema(vIdx).dataType match {
      case LongType => _.getLong(vIdx)
      case IntegerType => _.getInt(vIdx).toLong
      case dt => throw new IllegalArgumentException(
        s"running total needs an integral value column, got $dt")
    }
    val outSchema = StructType(
      sorted.schema.fields :+ StructField(outCol, LongType, nullable = false))
    val base = InternalRowDF.toInternalRdd(sorted)
      .mapPartitions(it => it.map(_.copy()), preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
      .localCheckpoint()
    val partSums = base
      .mapPartitions(it => Iterator.single(it.map(getV).sum))
      .collect()
    val offsets = partSums.scanLeft(0L)(_ + _)
    val withTotals = base.mapPartitionsWithIndex { (pi, it) =>
      var acc = offsets(pi)
      it.map { r =>
        acc += getV(r)
        val v = new GenericInternalRow(Array[Any](acc))
        new JoinedRow(r, v): InternalRow
      }
    }
    InternalRowDF.fromInternalRdd(spark, withTotals, outSchema)
  }
}
