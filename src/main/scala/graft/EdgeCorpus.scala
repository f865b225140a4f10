package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import java.time.LocalDateTime

/** DIALECT-DISCIPLINE EDGE CORPUS (round-16 ask #2). Three shared-SQL
  * dialect bugs in two rounds (the Bayes decimal-literal split, the
  * chi² zero-cell densification, q12's HUGEINT cast) were all the same
  * class: ONE SQL text, TWO engines' typing/rounding rules, caught
  * only when the driver's corpus happened to exercise the edge. This
  * corpus exercises the edges ON PURPOSE — every shared query text
  * runs over it on BOTH engines through the normal gate machinery
  * (`runMain graft.EdgeCorpus /tmp/edge_corpus`, then `runMain
  * graft.Verify /tmp/edge_corpus <out>`, then
  * `tools/check_oracle.py /tmp/edge_corpus <out>`), so a split shows
  * up as a hash mismatch here before a production corpus finds it.
  * [[graft.DialectEdgeSpec]] keeps the Spark half green in-tree.
  *
  * What the rows plant (schema = TESTDATA.md's, byte for byte):
  *  - SINGLE GROUPS: one-customer market segment, one-doc source and
  *    lang, one-label-dominant embeddings, single-event-type user —
  *    the chi²/Bayes zero-cell and empty-contingency class;
  *  - EMPTY JOINS: a customer with no orders, an order with no lines,
  *    a part never ordered — LEFT JOIN / NOT EXISTS zero arms;
  *  - BOUNDARY AGGREGATES: an order whose quantity sum is EXACTLY the
  *    q18 HAVING threshold (300), another one line over it; shipdates
  *    exactly on the >= / < date-literal boundaries;
  *  - ROUNDING EDGES: money values ending in .005/.015 (the
  *    ROUND(x·100) half-cent cases where HALF_UP vs banker's rounding
  *    would split), 0.0 and negative balances (q22's > 0 filter and
  *    signed-cents sums);
  *  - STRING EDGES: part names with '%', '_' and an embedded quote
  *    (LIKE/escape discipline), duplicate names, names within edit
  *    distance 1-2, and length-≤2 names (the PassJoin short-string
  *    corner); documents that are empty, whitespace-only, one char,
  *    exact duplicates, and accented UTF-8;
  *  - TIES: identical event timestamps for one user, identical
  *    embedding vectors, equal order totalprices — every ORDER BY
  *    tie-break in the shared texts gets a real tie to break.
  *
  * All tables stay NON-EMPTY and FK-consistent: the gate's operators
  * contractually assume populated inputs (driver-side cutoffs read
  * MAX(id)); "empty relation" is planted as empty JOIN ARMS and empty
  * GROUPS, which is what the shared texts can actually hit. */
object EdgeCorpus {

  private def ts(s: String): LocalDateTime = LocalDateTime.parse(s)

  def write(spark: SparkSession, outDir: String): Unit = {
    def save(name: String, schema: StructType, rows: Seq[Row]): Unit =
      spark.createDataFrame(
          new java.util.ArrayList[Row](rows.length) {
            rows.foreach(add)
          }, schema)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name.parquet")

    save("region", StructType(Seq(
      StructField("r_regionkey", IntegerType, false),
      StructField("r_name", StringType, false))), Seq(
      Row(0, "ASIA"),
      Row(1, "O'RE%_ION"))) // quote + LIKE metacharacters in a dim name

    save("nation", StructType(Seq(
      StructField("n_nationkey", IntegerType, false),
      StructField("n_name", StringType, false),
      StructField("n_regionkey", IntegerType, false))),
      (1 to 7).map(i => Row(i, s"NATION_$i", (i - 1) % 2)))

    save("customer", StructType(Seq(
      StructField("c_custkey", LongType, false),
      StructField("c_name", StringType, false),
      StructField("c_nationkey", IntegerType, false),
      StructField("c_acctbal", DoubleType, false),
      StructField("c_mktsegment", StringType, false))), Seq(
      Row(1L, "cust-a", 1, 100.005, "BUILDING"), // half-cent edge
      Row(2L, "cust-b", 2, -2.675, "BUILDING"), // classic float round
      Row(3L, "cust-c", 3, 0.0, "MACHINERY"), // q22's > 0 boundary
      Row(4L, "cust-no-orders", 4, 55.55, "MACHINERY"), // empty join arm
      Row(5L, "cust-lone-segment", 5, 10.015, "FURNITURE"))) // 1-row group

    save("supplier", StructType(Seq(
      StructField("s_suppkey", LongType, false),
      StructField("s_name", StringType, false),
      StructField("s_nationkey", IntegerType, false),
      StructField("s_acctbal", DoubleType, false))), Seq(
      Row(1L, "supp-1", 1, 499.995), // q16's < 500 straddles a half-cent
      Row(2L, "supp-2", 2, -0.005),
      Row(3L, "supp-3", 7, 500.0))) // exactly the NOT-IN threshold

    save("part", StructType(Seq(
      StructField("p_partkey", LongType, false),
      StructField("p_name", StringType, false),
      StructField("p_brand", StringType, false),
      StructField("p_type", StringType, false),
      StructField("p_size", IntegerType, false),
      StructField("p_retailprice", DoubleType, false))), Seq(
      Row(1L, "gear small", "Brand#5", "ECONOMY", 11, 1.005),
      Row(2L, "gear small", "Brand#5", "ECONOMY", 11, 2.0), // dup name
      Row(3L, "gear smell", "Brand#3", "PROMO", 5, 3.0), // dist 1
      Row(4L, "gear smells", "Brand#12", "SMALL ANVIL", 1, 4.0), // dist 2
      Row(5L, "ab", "Brand#23", "PROMO", 28, 5.0), // short-string corner
      Row(6L, "ac", "Brand#23", "PROMO", 37, 6.0), // dist 1 at len 2
      Row(7L, "p100%_o'brien", "Brand#15", "ECONOMY", 11, 7.005),
      Row(8L, "never ordered", "Brand#3", "STANDARD", 5, 8.0)))

    save("orders", StructType(Seq(
      StructField("o_orderkey", LongType, false),
      StructField("o_custkey", LongType, false),
      StructField("o_orderstatus", StringType, false),
      StructField("o_totalprice", DoubleType, false),
      StructField("o_orderdate", TimestampNTZType, false),
      StructField("o_orderpriority", StringType, false))), Seq(
      // same totalprice twice: the q18/q03 ORDER BY tie, broken by key
      Row(10L, 1L, "F", 1000.0, ts("1997-01-01T00:00:00"), "1-URGENT"),
      Row(11L, 1L, "O", 1000.0, ts("1997-03-31T23:59:59"), "2-HIGH"),
      Row(12L, 2L, "F", 300.005, ts("1996-12-31T23:59:59"), "5-LOW"),
      Row(13L, 2L, "F", 42.0, ts("1997-04-01T00:00:00"), "3-MEDIUM"),
      Row(14L, 3L, "O", 0.0, ts("1998-01-01T00:00:00"), "1-URGENT"),
      Row(15L, 5L, "F", 7.015, ts("1997-06-01T00:00:00"), "4-NOT SPEC"),
      Row(16L, 3L, "F", 9.99, ts("1997-07-04T12:00:00"), "5-LOW"))) // no lines

    val li = StructType(Seq(
      StructField("l_orderkey", LongType, false),
      StructField("l_partkey", LongType, false),
      StructField("l_suppkey", LongType, false),
      StructField("l_linenumber", IntegerType, false),
      StructField("l_quantity", DoubleType, false),
      StructField("l_extendedprice", DoubleType, false),
      StructField("l_discount", DoubleType, false),
      StructField("l_tax", DoubleType, false),
      StructField("l_returnflag", StringType, false),
      StructField("l_linestatus", StringType, false),
      StructField("l_shipdate", TimestampNTZType, false)))
    save("lineitem", li, Seq(
      // order 10: sum(qty) = 301 in ONE line — q18 HAVING > 300 hit;
      // multi-supplier with a SOLE R line — the q21 keep shape
      Row(10L, 1L, 1L, 1, 301.0, 10.005, 0.05, 0.0, "R", "F",
        ts("1997-01-01T00:00:00")),
      Row(10L, 2L, 2L, 2, 1.0, 0.995, 0.07, 0.01, "N", "F",
        ts("1997-06-01T00:00:01")),
      // order 11: sum(qty) = EXACTLY 300 — the HAVING boundary miss
      Row(11L, 1L, 1L, 1, 150.0, 5.015, 0.0, 0.0, "N", "O",
        ts("1997-02-01T00:00:00")),
      Row(11L, 3L, 2L, 2, 150.0, 2.675, 0.06, 0.02, "N", "O",
        ts("1997-12-31T23:59:59")),
      // order 12: two R lines from DIFFERENT suppliers — q21 anti arm;
      // same part twice (co-purchase self-pair, w > 1 edge)
      Row(12L, 3L, 1L, 1, 0.0, 0.005, 0.05, 0.0, "R", "F",
        ts("1996-12-31T23:59:59")), // zero quantity, half-cent price
      Row(12L, 3L, 2L, 2, 24.0, 100.0, 0.07, 0.03, "R", "F",
        ts("1997-01-01T00:00:00")),
      Row(12L, 4L, 2L, 3, 23.999, 49.995, 0.051, 0.0, "N", "F",
        ts("1997-03-01T00:00:00")),
      // order 13: single-line basket (no co-purchase pairs at all)
      Row(13L, 5L, 3L, 1, 30.0, 3.0, 0.05, 0.0, "A", "F",
        ts("1997-04-01T00:00:00")),
      // order 14: ships exactly at both deck date boundaries
      Row(14L, 6L, 3L, 1, 21.0, 1.005, 0.07, 0.0, "N", "O",
        ts("1998-01-01T00:00:00")),
      Row(14L, 7L, 1L, 2, 40.0, 2.005, 0.05, 0.0, "N", "O",
        ts("1997-01-01T00:00:00")),
      // order 15: lone-segment customer's only line; R on an F order
      // with a single supplier — q21's EXISTS arm must NOT fire
      Row(15L, 7L, 3L, 1, 9.0, 7.015, 0.0, 0.0, "R", "F",
        ts("1997-06-01T00:00:00"))))

    save("events", StructType(Seq(
      StructField("event_id", LongType, false),
      StructField("ts", TimestampNTZType, false),
      StructField("user_id", LongType, false),
      StructField("event_type", StringType, false),
      StructField("value", DoubleType, false),
      StructField("props", StringType, false))), Seq(
      // user 1: three events at the IDENTICAL timestamp (window ties)
      Row(1L, ts("1997-05-01T10:00:00"), 1L, "view", 0.0, "{}"),
      Row(2L, ts("1997-05-01T10:00:00"), 1L, "click", -1.5, ""),
      Row(3L, ts("1997-05-01T10:00:00"), 1L, "view", 2.005, "{\"a\":1}"),
      Row(4L, ts("1997-05-01T10:00:01"), 1L, "purchase", 100.005, "{}"),
      // user 2: a single event — every per-user window is length 1
      Row(5L, ts("1997-05-02T00:00:00"), 2L, "view", 0.0, "{}"),
      // user 3: one TYPE only (single-state markov / funnel stall)
      Row(6L, ts("1997-05-03T00:00:00"), 3L, "view", 1.0, "{}"),
      Row(7L, ts("1997-05-04T00:00:00"), 3L, "view", 1.0, "{}"),
      Row(8L, ts("1997-05-05T00:00:00"), 3L, "view", 1.0, "{}")))

    save("documents", StructType(Seq(
      StructField("doc_id", LongType, false),
      StructField("text", StringType, false),
      StructField("lang", StringType, false),
      StructField("source", StringType, false),
      StructField("n_chars", LongType, false))), Seq(
      Row(1L, "", "en", "web", 0L), // empty text
      Row(2L, "   ", "en", "web", 3L), // whitespace only
      Row(3L, "x", "en", "web", 1L), // single char
      Row(4L, "the quick brown fox jumps over the lazy dog", "en",
        "web", 44L),
      Row(5L, "the quick brown fox jumps over the lazy dog", "en",
        "web", 44L), // exact duplicate
      Row(6L, "the quick brown fox jumps over the lazy cat", "en",
        "web", 44L), // near duplicate
      Row(7L, "café déjà vu — naïve résumé", "fr",
        "books", 26L), // lone lang+source doc, accented UTF-8
      Row(8L, "the the the the the the the the", "en", "web", 31L),
      // doc 10 ≡ doc 4 (mod 3): the same synthesized MODALITY, so the
      // media near-dup family has a same-modality duplicate pair to
      // find (4 vs 5 are exact TEXT dups but different modalities)
      Row(10L, "the quick brown fox jumps over the lazy dog", "en",
        "web", 44L),
      // PII that actually redacts: an email with +tag and multi-dot
      // domain, a dashed phone, AND the documented swallow case (a
      // phone-shaped span inside an email must count as the EMAIL) —
      // Java-regex vs RE2 agreement on the shared patterns is only
      // proven when the corpus makes them match something
      Row(11L, "contact john.doe+spam@example.co.uk or 555-123-4567 " +
        "and 111-222-3333@mail.example.com today", "en", "web", 92L)))

    val vecDim = 64
    def unit(seed: Int): Seq[Float] = {
      // deterministic pseudo-vector with NEGATIVE components, L2-normed
      val raw = (0 until vecDim).map(i =>
        math.sin(seed * 37.0 + i * 1.7) - 0.3)
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(x => (x / n).toFloat)
    }
    save("embeddings", StructType(Seq(
      StructField("vec_id", LongType, false),
      StructField("embedding", ArrayType(FloatType, false), false),
      StructField("label", IntegerType, false))), Seq(
      Row(0L, unit(1), 0),
      Row(25L, unit(1), 0), // identical vector (cosine tie), probe id
      Row(2L, unit(2), 0),
      Row(3L, unit(3), 0),
      Row(4L, unit(4), 0), // label 0 dominates: near-zero-cell tables
      Row(5L, unit(5), 1),
      Row(50L, unit(6), 1),
      Row(7L, unit(7), 0)))
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/edge_corpus")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    write(spark, out)
    println(s"edge corpus written to $out")
    spark.stop()
  }
}
