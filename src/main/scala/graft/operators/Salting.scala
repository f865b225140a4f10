package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed joins — the explicit fallback when AQE's
  * runtime skew-join split can't apply (streaming joins, non-AQE
  * plans, or a single key so hot that one split still OOMs a task).
  *
  * Shape: the skewed (fact) side spreads each row across `salts`
  * sub-keys with a deterministic pseudo-random salt; the build (dim)
  * side replicates every row once per salt value; the equi-join runs on
  * (key, salt), so a key holding 10⁹ rows lands on `salts` tasks
  * instead of one. Cost: the dim side is `salts`× larger in the
  * shuffle — size `salts` to the observed skew factor, not higher.
  *
  * AQE's skew handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default in this engine's sessions) is the first line of defense —
  * prefer it; reach for explicit salting only when the plan shows a
  * skewed SMJ that AQE didn't split.
  */
object Salting {

  /** xxhash64 rejects maps (and variants) at analysis; a fact carrying
    * such a column must not fail a generic salt, so the salt hashes only
    * the hashable columns. */
  private def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType => false
      case _: VariantType => false
      case s: StructType => s.fields.forall(f => hashable(f.dataType))
      case a: ArrayType => hashable(a.elementType)
      case _ => true
    }
  }

  /** Deterministic row salt in [0, salts): hashed from all HASHABLE fact
    * columns, so it is a pure function of row CONTENT — stable across
    * runs, retries, and repartitionings (`rand()` or
    * `monotonically_increasing_id()` both vary with partition layout and
    * break retried tasks / oracle comparisons). Exact duplicate rows
    * (up to unhashable map/variant columns) share a salt, so a hot key
    * whose rows are all byte-identical still lands on one task —
    * spreading those needs a store-side disambiguator (ingest sequence
    * number), not a salt function. */
  private def rowSalt(fact: DataFrame, salts: Int): Column = {
    val cols = fact.schema.fields
      .filter(f => hashable(f.dataType)).map(f => col(f.name)).toSeq
    require(cols.nonEmpty,
      "saltedJoin needs at least one hashable (non-map, non-variant) " +
        "fact column to derive a deterministic salt from")
    pmod(xxhash64(cols: _*), lit(salts.toLong)).cast("int")
  }

  /** Equi-join `fact ⋈ dim` on `factKey == dimKey`, salted `salts` ways.
    * Semantics identical to the plain join (spec-checked); only the
    * physical distribution of the hot keys changes. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedFact = fact.withColumn("__salt", rowSalt(fact, salts))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) &&
          saltedFact("__salt") === saltedDim("__salt"),
        joinType)
      .drop("__salt")
  }
}
