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
  * The sorted RDD is persisted serialized THEN localCheckpoint'ed:
  * the per-partition sums job is eager (it executes the sort pipeline
  * at DataFrame-construction time), and without the checkpoint the
  * `LogicalRDD`-backed result would re-run the whole upstream pipeline
  * on every downstream execution (measured in round 3 as a ≥2×
  * re-execution of the transactions view per invocation). Rows are
  * `copy()`ed BEFORE caching because the scan iterator reuses its
  * UnsafeRow buffer; storage is MEMORY_AND_DISK_SER because serialized
  * blocks are byte arrays the garbage collector skips, where
  * deserialized caching holds every row live (measured as old-gen GC
  * thrash once several checkpoint generations coexist in one JVM).
  */
object PrefixSum {
  /** Tracked result: the checkpointed RDD backing `df` (so callers
    * that know the result's lifetime, e.g. a streaming micro-batch,
    * can unpersist EXACTLY their own blocks when done — a global
    * transient-block sweep is not safe under concurrent queries) and
    * the grand total, free from the per-partition sums the driver
    * already collected. */
  final case class Tracked(df: DataFrame,
                           checkpoint: org.apache.spark.rdd.RDD[InternalRow],
                           total: Long)

  /** Multi-column variant: several running totals off ONE sort + ONE
    * per-partition sums job (the sums job returns k longs per
    * partition instead of 1 — still never rows). */
  final case class TrackedMulti(
      df: DataFrame,
      checkpoint: org.apache.spark.rdd.RDD[InternalRow],
      totals: Seq[Long])

  def withRunningTotal(df: DataFrame, sortCols: Seq[Column],
                       valueCol: String, outCol: String): DataFrame =
    withRunningTotalTracked(df, sortCols, valueCol, outCol).df

  def withRunningTotalTracked(
      df: DataFrame, sortCols: Seq[Column], valueCol: String,
      outCol: String): Tracked = {
    val m = withRunningTotalsTracked(df, sortCols, Seq(valueCol), Seq(outCol))
    Tracked(m.df, m.checkpoint, m.totals.head)
  }

  def withRunningTotals(df: DataFrame, sortCols: Seq[Column],
                        valueCols: Seq[String],
                        outCols: Seq[String]): DataFrame =
    withRunningTotalsTracked(df, sortCols, valueCols, outCols).df

  def withRunningTotalsTracked(
      df: DataFrame, sortCols: Seq[Column], valueCols: Seq[String],
      outCols: Seq[String]): TrackedMulti = {
    require(valueCols.nonEmpty && valueCols.size == outCols.size,
      "valueCols/outCols must pair up")
    val spark = df.sparkSession
    val sorted = df.orderBy(sortCols: _*)
    val k = valueCols.size
    // null values count as 0 (SUM's null semantics over non-null acc)
    val getVs: Array[InternalRow => Long] = valueCols.map { valueCol =>
      val vIdx = sorted.schema.fieldIndex(valueCol)
      sorted.schema(vIdx).dataType match {
        case LongType =>
          (r: InternalRow) => if (r.isNullAt(vIdx)) 0L else r.getLong(vIdx)
        case IntegerType =>
          (r: InternalRow) =>
            if (r.isNullAt(vIdx)) 0L else r.getInt(vIdx).toLong
        case dt => throw new IllegalArgumentException(
          s"running total needs an integral value column, got $dt")
      }
    }.toArray
    val outSchema = StructType(sorted.schema.fields ++
      outCols.map(c => StructField(c, LongType, nullable = false)))
    val base = graft.util.Checkpoints.checkpointInternalRdd(sorted)
    val partSums: Array[Array[Long]] = base.mapPartitions { it =>
      val s = new Array[Long](k)
      it.foreach { r =>
        var i = 0
        while (i < k) { s(i) += getVs(i)(r); i += 1 }
      }
      Iterator.single(s)
    }.collect()
    val offsets = partSums.scanLeft(new Array[Long](k)) { (a, b) =>
      Array.tabulate(k)(i => a(i) + b(i))
    }
    val withTotals = base.mapPartitionsWithIndex { (pi, it) =>
      val acc = offsets(pi).clone()
      it.map { r =>
        val vals = new Array[Any](k)
        var i = 0
        while (i < k) {
          acc(i) += getVs(i)(r); vals(i) = acc(i); i += 1
        }
        new JoinedRow(r, new GenericInternalRow(vals)): InternalRow
      }
    }
    TrackedMulti(InternalRowDF.fromInternalRdd(spark, withTotals, outSchema),
      base, offsets.last.toSeq)
  }
}
