package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character-trigram HISTOGRAM as one native expression:
  * `trigram_counts(text)` → array<struct<dim:int, c:bigint>> with
  * dim = cp₁·2¹⁴ + cp₂·2⁷ + cp₃ over consecutive code points (the same
  * dim formula as the embed-dedup oracle; injective for 7-bit chars).
  *
  * This replaces two pipeline stages of `q_dedup_embed`: the
  * interpreted HOF dim extraction (zip_with over three shifted char
  * slices) AND the corpus-scale groupBy(doc, dim) — the histogram is
  * the map-side combine, done inside the expression, so the downstream
  * explode emits pre-aggregated (dim, count) rows and the first shuffle
  * the query needs is the (much smaller) docfreq aggregation. Measured
  * 3.2 s → see DESIGN.md.
  *
  * Output order is ascending dim (deterministic; downstream is
  * order-insensitive group-bys anyway). Arithmetic is Java int (wraps
  * identically to Spark's `ascii()*16384+…` int math); the oracle-parity
  * precondition is 7-bit text, as documented on the query.
  */
case class TrigramCounts(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("dim", IntegerType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "trigram_counts"

  override def nullSafeEval(input: Any): Any =
    TrigramCounts.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftshim.TrigramCounts.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): TrigramCounts = copy(child = newChild)
}

object TrigramCounts {

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    val cps = new Array[Int](n)
    var (i, j) = (0, 0)
    while (i < str.length) {
      val cp = str.codePointAt(i)
      cps(j) = cp; j += 1
      i += Character.charCount(cp)
    }
    val hist = new java.util.TreeMap[Integer, java.lang.Long]()
    var k = 0
    while (k + 2 < n) {
      val dim = cps(k) * 16384 + cps(k + 1) * 128 + cps(k + 2)
      val prev = hist.get(dim)
      hist.put(dim, if (prev == null) 1L else prev.longValue() + 1L)
      k += 1
    }
    val out = new Array[Any](hist.size())
    var idx = 0
    val it = hist.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(idx) = InternalRow(e.getKey.intValue(), e.getValue.longValue())
      idx += 1
    }
    new GenericArrayData(out)
  }

  def trigramCounts(c: Column): Column =
    ExpressionUtils.column(TrigramCounts(ExpressionUtils.expression(c)))
}

/** Distinct word-3-gram shingles of a single-space-tokenized text, as a
  * native expression: `shingles3(text)` → array<string>. Semantics match
  * the HOF form it replaces (zip_with over three shifted token slices +
  * array_distinct, with the whole-text fallback for < 3 tokens) and the
  * jaccard oracle's list comprehension — first-occurrence order, which
  * array_distinct also preserves. Shared by the Jaccard / MinHash /
  * SimHash dedup paths, whose DAGs evaluate it over the corpus more
  * than once: interpreted lambdas there were the single hottest
  * expression in the bench. */
case class Shingles3(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "shingles3"

  override def nullSafeEval(input: Any): Any =
    Shingles3.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftshim.Shingles3.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): Shingles3 = copy(child = newChild)
}

object Shingles3 {

  def compute(s: UTF8String): ArrayData = {
    // split on single spaces, exactly like split(text, " ") — empty
    // tokens from doubled/leading/trailing spaces included
    val toks = s.toString.split(" ", -1)
    if (toks.length < 3) return new GenericArrayData(Array[Any](s))
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + 2 < toks.length) {
      seen.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
      i += 1
    }
    val out = new Array[Any](seen.size())
    var idx = 0
    val it = seen.iterator()
    while (it.hasNext) {
      out(idx) = UTF8String.fromString(it.next()); idx += 1
    }
    new GenericArrayData(out)
  }

  def shingles3(c: Column): Column =
    ExpressionUtils.column(Shingles3(ExpressionUtils.expression(c)))
}

/** Fused shingle hashing: `shingles3_hashed(text)` → array<bigint>,
  * semantically `transform(shingles3(text), g -> xxhash64(g))` but
  * computed WITHOUT materializing shingle strings: the corpus is
  * single-space tokenized, so every word-3-gram's bytes are exactly a
  * contiguous byte slice of the original text (UTF-8 multi-byte chars
  * never contain 0x20, so byte-scanning for spaces is exact), and each
  * distinct shingle is hashed in place with Spark's XXH64 (seed 42 —
  * identical values to the `xxhash64` built-in on the shingle string).
  * Replaces the interpreted per-element HOF lambda on the dedup hot
  * paths (jaccard / minhash / simhash / decontaminate each evaluate it
  * corpus-wide). Distinctness is tracked by hash value — two distinct
  * shingles of one document colliding in 64 bits (odds ~shingles²/2⁶⁴)
  * would drop one, the same collision contract the hashed inverted
  * index already documents. */
case class Shingles3Hashed(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "shingles3_hashed"

  override def nullSafeEval(input: Any): Any =
    Shingles3Hashed.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftshim.Shingles3Hashed.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): Shingles3Hashed = copy(child = newChild)
}

object Shingles3Hashed {

  private val seed = 42L // xxhash64 built-in default seed

  def compute(s: UTF8String): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes()
    // token start offsets (token k begins after the k-th space byte)
    var nTokens = 1
    var i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' ')
        nTokens += 1
      i += 1
    }
    if (nTokens < 3)
      return new GenericArrayData(Array[Any](
        org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(base, off, len, seed)))
    val starts = new Array[Int](nTokens + 1)
    var t = 1
    i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' ') {
        starts(t) = i + 1; t += 1
      }
      i += 1
    }
    starts(nTokens) = len + 1 // virtual separator past the end
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var k = 0
    while (k + 2 < nTokens) {
      val from = starts(k)
      val until = starts(k + 3) - 1 // drop the trailing separator
      seen.add(org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(base, off + from, until - from, seed))
      k += 1
    }
    val out = new Array[Any](seen.size())
    var idx = 0
    val it = seen.iterator()
    while (it.hasNext) { out(idx) = it.next().longValue(); idx += 1 }
    new GenericArrayData(out)
  }

  def shingles3Hashed(c: Column): Column =
    ExpressionUtils.column(Shingles3Hashed(ExpressionUtils.expression(c)))
}

/** Distinct word-3-gram shingles hashed to a 60-bit MD5-derived integer,
  * as one native expression: `shingles3_md5(text)` → array<bigint>,
  * each value = the first 15 hex digits of md5(shingle) parsed base-16
  * (equivalently: the big-endian first 8 digest bytes, shifted right 4).
  *
  * Exists for ORACLE PARITY on the SimHash path: the seeded XXH64 of
  * [[Shingles3Hashed]] is not computable in portable SQL, but `md5` is a
  * standard function in every engine, and a 15-hex-digit parse is a
  * 15-term Horner fold the oracle replays verbatim (the q_winnow
  * technique — see `Dedup.qDedupSimhashSql`). 60 bits rather than 64 so
  * the parsed value always fits a signed BIGINT in both engines; the
  * SimHash fold over these hashes therefore never sets bits 60–63 (the
  * signed sum over a constant-0 bit is −n), which both engines agree on.
  * Shingle extraction is byte-for-byte [[Shingles3]] (distinct,
  * first-occurrence order, whole-text fallback under 3 tokens); MD5 runs
  * over each shingle's UTF-8 bytes, exactly what SQL `md5(g)` hashes. */
case class Shingles3Md5(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "shingles3_md5"

  override def nullSafeEval(input: Any): Any =
    Shingles3Md5.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftshim.Shingles3Md5.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): Shingles3Md5 = copy(child = newChild)
}

object Shingles3Md5 {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(s: UTF8String): ArrayData = {
    val shingles = Shingles3.compute(s)
    val n = shingles.numElements()
    val digest = md.get()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      digest.reset()
      val d = digest.digest(shingles.getUTF8String(i).getBytes)
      val hi = ((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) |
        ((d(2) & 0xFFL) << 40) | ((d(3) & 0xFFL) << 32) |
        ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
        ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
      out(i) = hi >>> 4
      i += 1
    }
    new GenericArrayData(out)
  }

  def shingles3Md5(c: Column): Column =
    ExpressionUtils.column(Shingles3Md5(ExpressionUtils.expression(c)))
}

/** Word-bigram repetition ratio as one native expression:
  * `bigram_rep_ratio(text)` → double = 1 − distinct_bigrams/total_bigrams
  * (0.0 for texts under 2 tokens) — semantically the
  * zip_with + array_distinct HOF composition it replaces, but computed
  * over byte slices of the original single-space-tokenized text with no
  * per-row array materialization (the interpreted lambda built and
  * deduped every bigram string). Distinctness is tracked by seeded
  * XXH64 of the slice — two distinct bigrams of one document colliding
  * in 64 bits (odds ~tokens²/2⁶⁴) is the same vanishing contract as the
  * hashed shingle paths. */
case class BigramRepRatio(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "bigram_rep_ratio"

  override def nullSafeEval(input: Any): Any =
    BigramRepRatio.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftshim.BigramRepRatio.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): BigramRepRatio = copy(child = newChild)
}

object BigramRepRatio {

  private val seed = 42L

  def compute(s: UTF8String): Double = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes()
    var nTokens = 1
    var i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' ')
        nTokens += 1
      i += 1
    }
    if (nTokens < 2) return 0.0
    val starts = new Array[Int](nTokens + 1)
    var t = 1
    i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' ') {
        starts(t) = i + 1; t += 1
      }
      i += 1
    }
    starts(nTokens) = len + 1
    val seen = new java.util.HashSet[java.lang.Long]()
    var k = 0
    while (k + 1 < nTokens) {
      val from = starts(k)
      val until = starts(k + 2) - 1
      seen.add(org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(base, off + from, until - from, seed))
      k += 1
    }
    1.0 - seen.size().toDouble / (nTokens - 1).toDouble
  }

  def bigramRepRatio(c: Column): Column =
    ExpressionUtils.column(BigramRepRatio(ExpressionUtils.expression(c)))
}

/** Registration descriptors for the text-pipeline native expressions —
  * consumed by `graft.functions.GraftFunctions.register` and the
  * `GraftExtensions` SparkSessionExtensions hook, so every one of them
  * is callable from SQL text (`SELECT simhash64(...)`) exactly like the
  * built-ins. */
object TextExpressionDescriptions {

  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private def unary(name: String, cls: Class[_],
                    mk: Expression => Expression) =
    (new FunctionIdentifier(name), new ExpressionInfo(cls.getName, name),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"$name takes exactly 1 argument")
        mk(args.head)
      })

  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    unary("trigram_counts", classOf[TrigramCounts], TrigramCounts(_)),
    unary("shingles3", classOf[Shingles3], Shingles3(_)),
    unary("shingles3_hashed", classOf[Shingles3Hashed], Shingles3Hashed(_)),
    unary("shingles3_md5", classOf[Shingles3Md5], Shingles3Md5(_)),
    unary("pair_combos", classOf[PairCombos], PairCombos(_)),
    unary("minhash16", classOf[MinHash16], MinHash16(_)),
    unary("simhash64", classOf[Simhash64], Simhash64(_)),
    unary("bigram_rep_ratio", classOf[BigramRepRatio], BigramRepRatio(_)),
    unary("winnow_fingerprints", classOf[WinnowFingerprints],
      WinnowFingerprints(_)))
}

/** All ordered pairs (a, b) with a < b from a sorted long array —
  * the map-side candidate-pair generation of the Jaccard inverted
  * index (`pair_combos(ds)` over each shingle's doc list). Replaces a
  * doubly-nested interpreted transform/filter HOF; per-list cost is
  * n(n-1)/2 with n already capped by the docfreq guard. */
case class PairCombos(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType))

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("doc_a", LongType, nullable = false),
      StructField("doc_b", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "pair_combos"

  override def nullSafeEval(input: Any): Any =
    PairCombos.compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftshim.PairCombos.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): PairCombos = copy(child = newChild)
}

/** 64-bit SimHash from an array of shingle hashes, as one native
  * expression: `simhash64(array<bigint>)` → bigint with bit j set iff
  * Σ_h ((h>>j & 1)·2 − 1) > 0 — exactly the signed-bit-sum signature the
  * explode + 64-column hash-aggregate formulation computed, but MAP-ONLY:
  * the per-document fold happens inside the expression, so building
  * signatures for a 100 TB corpus shuffles nothing (the old shape pushed
  * corpus×shingles rows into a 64-aggregate exchange). */
case class Simhash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType))

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    Simhash64.compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftshim.Simhash64.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): Simhash64 = copy(child = newChild)
}

object Simhash64 {

  def compute(hs: ArrayData): Long = {
    val sums = new Array[Int](64)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) sums(j) += 1 else sums(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (sums(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  def simhash64(c: Column): Column =
    ExpressionUtils.column(Simhash64(ExpressionUtils.expression(c)))
}

/** K=16 MinHash signature from an array of shingle hashes, as one
  * native expression: `minhash16(array<bigint>)` → array<bigint> where
  * element j = min over shingles of XXH64(h, seed = j) — the same
  * per-document 16-way min the explode + 16-min hash-aggregate
  * formulation computed, but MAP-ONLY: the fold happens inside the
  * expression, so signature building shuffles nothing at any corpus
  * size (the old shape pushed corpus×shingles rows through a partial /
  * final aggregate exchange). An empty input yields Long.MaxValue mins
  * (callers never produce one: shingles3 falls back to the whole
  * text). */
case class MinHash16(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType))

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "minhash16"

  override def nullSafeEval(input: Any): Any =
    MinHash16.compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftshim.MinHash16.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): MinHash16 = copy(child = newChild)
}

object MinHash16 {

  val K = 16

  def compute(hs: ArrayData): ArrayData = {
    val mins = Array.fill(K)(Long.MaxValue)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < K) {
        val v = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashLong(h, j.toLong)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(v => v: Any))
  }

  def minhash16(c: Column): Column =
    ExpressionUtils.column(MinHash16(ExpressionUtils.expression(c)))
}

object PairCombos {

  def compute(ds: ArrayData): ArrayData = {
    val n = ds.numElements()
    val out = new Array[Any](n * (n - 1) / 2)
    var (i, idx) = (0, 0)
    while (i < n) {
      val a = ds.getLong(i)
      var j = i + 1
      while (j < n) {
        out(idx) = InternalRow(a, ds.getLong(j)); idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def pairCombos(c: Column): Column =
    ExpressionUtils.column(PairCombos(ExpressionUtils.expression(c)))
}
