package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-validation harness for the dedup/LSH family: every 100 TB claim
  * in those operators rests on caps (docfreq cap, LSH bucket cap, simhash
  * block cap, decontamination fan-out bound) keeping candidate work
  * LINEAR in corpus size. This main tests that empirically instead of
  * arguing it: it builds a `factor`× documents corpus by
  * duplicate-and-perturb, times the family at both scales, and prints
  * per-query ratios — near-linear (≲ factor, log-factor slack) is the
  * pass; anything approaching factor² means a cap failed.
  *
  * Corpus construction: copy `i` of each doc rotates a 10-letter
  * alphabet by `i` in `translate`, so
  *  - the 10 copies of one document are NOT near-duplicates of each
  *    other (every rotation rewrites most shingles/trigrams) — pair
  *    output stays linear by design, the timing measures candidate
  *    generation rather than a quadratic output artifact;
  *  - each PLANTED near-dup pair inside the source corpus stays a
  *    near-dup inside every copy (both members get the same rotation),
  *    so duplicate density per copy is unchanged;
  *  - length, whitespace and ids (doc_id·factor+i) stay
  *    collision-free and deterministic.
  *
  * Usage: `runMain graft.ScaleCheck [srcDir] [bigDir] [factor] [queries]`
  * (defaults /root/testdata/sf0.1, /tmp/sfbig, 10, all; `queries` is a
  * comma-separated subset filter — the 100× runs target only the
  * heaviest families rather than paying the full sweep at 100×).
  * Results go to stdout as one JSON line; DESIGN.md records the
  * round's run.
  */
object ScaleCheck {

  private val alphabet = "aeiounrstl" // 10 letters -> 10 distinct rotations

  /** Second scaling axis for factors beyond 10: a per-word SUFFIX letter
    * (one of 9 consonants disjoint from the rotation alphabet, so the
    * two transforms commute). Copies with different suffixes share ZERO
    * word-3-gram shingles (every word's last character differs), and
    * within-copy planted near-dup pairs are preserved exactly — the same
    * two properties the rotation axis guarantees. Copy k of `factor`
    * applies rotation k mod 10 and suffix k div 10 (suffix 0 = none), so
    * any two of up to 100 copies differ in every shingle: different
    * suffix ⇒ disjoint shingles outright; same suffix, different
    * rotation ⇒ the rotation rewrites every word (each vocabulary word
    * contains a vowel, and all vowels are in the rotation alphabet). */
  private val suffixes = "bcdfghjkm" // disjoint from `alphabet`

  def scaleDocuments(spark: SparkSession, srcDir: String, outDir: String,
                     factor: Int): Unit = {
    require(factor <= alphabet.length * (suffixes.length + 1),
      s"at most ${alphabet.length * (suffixes.length + 1)} distinct copies available")
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val copies = (0 until factor).map { k =>
      val i = k % alphabet.length
      val j = k / alphabet.length
      val rot = alphabet.drop(i) + alphabet.take(i)
      val rotated =
        if (i == 0) col("text") else translate(col("text"), alphabet, rot)
      val transformed =
        if (j == 0) rotated
        else regexp_replace(rotated, "(\\S+)", "$1" + suffixes(j - 1))
      docs.select(
        (col("doc_id") * factor + k).as("doc_id"),
        transformed.as("text"),
        col("lang"), col("source"),
        // recompute, don't copy: suffix copies lengthen every word, and
        // a stale n_chars ≠ length(text) would be a latent red herring
        // for any n_chars-consuming query run against the scaled dir
        length(transformed).cast("long").as("n_chars"))
    }
    copies.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
  }

  /** Scale the FACT tables `factor`× while copying the dimensions
    * byte-equivalent — the realistic growth shape (a warehouse's facts
    * grow, its dims don't), and the one the view plans' broadcast
    * strategy banks on. Keys are remapped as `key·factor + i` so joins
    * stay consistent within each copy and never match across copies:
    *  - lineitem/orders: l_orderkey ↔ o_orderkey remapped in lockstep;
    *    part/supp/cust keys untouched (dims constant);
    *  - events: user_id and event_id remapped — per-user event density
    *    is unchanged, so sessions/windows scale in COUNT, not size.
    * events.ts is kept as the raw nanos long (read with nanosAsLong, no
    * conversion) so the scaled table round-trips through the same
    * Tables loader path as the driver testdata. */
  /** Scale the embeddings `factor`×: copy k circularly shifts each
    * vector by k mod dim positions and negates when k ≥ dim. Shifts and
    * negation preserve unit norm exactly, and a shifted/negated random
    * unit vector is ~orthogonal to every other copy (E[cos] = 0,
    * sd ≈ 1/√dim), so NO near-duplicate pairs are planted across
    * copies — semdedup/ANN timings at the big scale measure candidate
    * generation, not an output artifact. vec_id remaps `id·factor+k`
    * like every other scaled key. */
  def scaleEmbeddings(spark: SparkSession, srcDir: String, outDir: String,
                      factor: Int): Unit = {
    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    require(factor <= 2 * dim,
      s"at most ${2 * dim} distinct shift/sign copies available")
    val copies = (0 until factor).map { k =>
      val s = k % dim
      val shifted =
        if (s == 0) col("embedding")
        else concat(slice(col("embedding"), s + 1, dim - s),
          slice(col("embedding"), 1, s))
      val signed =
        if (k < dim) shifted
        else transform(shifted, x => -x)
      emb.select((col("vec_id") * factor + k).as("vec_id"),
        signed.as("embedding"), col("label"))
    }
    copies.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
  }

  /** Extra scaled copy of `part` under a DIFFERENT name: the dims stay
    * constant by design (the broadcast premise of the view family), but
    * the fuzzy join treats part as its FACT — its 10× point needs a
    * 10× name corpus. Copies rotate names through the vowel alphabet
    * (the documents transform): within-copy near-pair density is
    * preserved (both members of a pair get the same rotation), and a
    * rotation rewrites every vowel, so cross-copy near pairs are
    * essentially absent — output scales ~factor×, and the timing
    * measures candidate generation, not an inflated result. */
  def scalePartNames(spark: SparkSession, srcDir: String, outDir: String,
                     factor: Int): Unit = {
    val part = spark.read.parquet(s"$srcDir/part.parquet")
    (0 until factor).map { k =>
      val i = k % alphabet.length
      val rot = alphabet.drop(i) + alphabet.take(i)
      val name =
        if (i == 0) col("p_name") else translate(col("p_name"), alphabet, rot)
      part.select((col("p_partkey") * factor + k).as("p_partkey"),
        name.as("p_name"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/part_scaled.parquet")
  }

  /** Scaled population twin of `customer` under a DIFFERENT name (the
    * part_scaled pattern): customer itself stays an unscaled dim (the
    * view family's broadcast premise), but k-anonymity treats it as
    * the POPULATION — its 10× point needs a 10× population. Copies
    * remap only the key; the quasi-identifier and sensitive columns
    * repeat, so the equivalence-class COUNT stays fixed while class
    * SIZES grow ~factor× — exactly how a growing population behaves
    * against a fixed QI space. */
  def scaleCustomer(spark: SparkSession, srcDir: String, outDir: String,
                    factor: Int): Unit = {
    val c = spark.read.parquet(s"$srcDir/customer.parquet")
    (0 until factor).map { k =>
      c.withColumn("c_custkey", col("c_custkey") * factor + k)
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/customer_scaled.parquet")
  }

  /** Scaled register twin for record linkage
    * (`customer_linkage_scaled`): the FS blocking passes are equi-joins
    * on exact name and (nation, segment), and ANY blocked join is
    * quadratic in block SIZE — so the honest growth model for a
    * register is the census one: a 10× register covers 10× the
    * geography (10× the blocking-key cardinality), not 10×-denser
    * blocks (Splink's block-size guidance states exactly this
    * requirement). Copies remap the key, uniquify names (a `~k`
    * suffix — the name corruption replaces the LAST char with 'X',
    * which never collides with a clean name), and shift nations to a
    * disjoint 25-key range per copy: block sizes stay constant, block
    * COUNT grows ~factor, and the measured slope is the operator's
    * (blocked joins + broadcast weight table + map-side scoring).
    * The dirty side's nation corruption ((nation+1) % 25) folds a
    * corrupted record into copy 0's key range — a deliberate ~10%
    * cross-copy skew that AQE's skew split must absorb; total
    * candidate mass stays ~factor. */
  def scaleCustomerLinkage(spark: SparkSession, srcDir: String,
                           outDir: String, factor: Int): Unit = {
    val c = spark.read.parquet(s"$srcDir/customer.parquet")
    (0 until factor).map { k =>
      c.withColumn("c_custkey", col("c_custkey") * factor + k)
        .withColumn("c_name", concat(col("c_name"), lit("~" + k)))
        .withColumn("c_nationkey", col("c_nationkey") + lit(25L * k))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite")
      .parquet(s"$outDir/customer_linkage_scaled.parquet")
  }

  def scaleFacts(spark: SparkSession, srcDir: String, outDir: String,
                 factor: Int): Unit = {
    // dims copied unscaled, so the scaled dir is a COMPLETE table
    // set — the full Bench surface runs against it unchanged
    Seq("region", "nation", "customer", "supplier", "part")
      .foreach { t =>
        spark.read.parquet(s"$srcDir/$t.parquet")
          .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      }
    scalePartNames(spark, srcDir, outDir, factor)
    scaleCustomer(spark, srcDir, outDir, factor)
    scaleCustomerLinkage(spark, srcDir, outDir, factor)
    scaleEmbeddings(spark, srcDir, outDir, factor)
    def copies(src: DataFrame)(remap: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => remap(src, i)).reduce(_ unionByName _)

    val orders = spark.read.parquet(s"$srcDir/orders.parquet")
    copies(orders) { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") * factor + i)
    }.repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")

    val li = spark.read.parquet(s"$srcDir/lineitem.parquet")
    copies(li) { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") * factor + i)
    }.repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$srcDir/events.parquet")
    copies(ev) { (df, i) =>
      df.withColumn("user_id", col("user_id") * factor + i)
        .withColumn("event_id", col("event_id") * factor + i)
    }.repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")
  }

  private def materialize(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val srcDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val bigDir = args.lift(1).getOrElse("/tmp/sfbig")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    // The generator OVERWRITES bigDir. Writing into the source dir (or
    // any testdata dir) destroys the corpus the engine is graded
    // against — this exact foot-gun fired once (src==big "isolation
    // timing"); the small side of a normal run is the isolation number.
    require(new java.io.File(bigDir).getCanonicalPath !=
      new java.io.File(srcDir).getCanonicalPath,
      "bigDir must differ from srcDir (the generator overwrites bigDir)")
    require(!new java.io.File(bigDir).getCanonicalPath
      .startsWith("/root/testdata"),
      "bigDir must never point into /root/testdata")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // a marker written only after FULL generation — AND a table-set
    // completeness check, so a dir generated by an older harness
    // version (or an interrupted run) regenerates instead of being
    // silently trusted with tables missing
    // v2: embeddings now scale too (shift/sign copies) — the version
    // suffix forces dirs from the v1 harness (constant embeddings) to
    // regenerate rather than be silently trusted
    // v3: part_scaled (fuzzy-join fact twin) added to the table set
    // v4: customer_scaled (k-anonymity population twin) added
    // v5: customer_linkage_scaled (record-linkage register twin) added
    // The marker also embeds the SOURCE corpus' max mtime: the driver
    // regenerates /root/testdata between rounds, and a big dir scaled
    // from the previous generation would silently pair stale big-side
    // numbers with fresh small-side ones (worse: the old events ts
    // layout). A source refresh now forces regeneration.
    val srcStamp = Tables.names.map(t =>
      new java.io.File(s"$srcDir/$t.parquet").lastModified()).max
    val marker =
      new java.io.File(s"$bigDir/_SCALED_OK_v5_${factor}_$srcStamp")
    val complete = Tables.names.forall(t =>
      new java.io.File(s"$bigDir/$t.parquet").exists())
    if (!marker.exists() || !complete) {
      scaleDocuments(spark, srcDir, bigDir, factor)
      scaleFacts(spark, srcDir, bigDir, factor)
      // drop markers from EARLIER source generations for this factor
      // before stamping: stale markers otherwise accumulate, and a
      // restored source corpus with an older mtime (backup copy,
      // touch -r) would match an old marker and revalidate a big dir
      // scaled from different data
      Option(new java.io.File(bigDir).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith(s"_SCALED_OK_v"))
        .foreach(_.delete())
      marker.createNewFile()
    }

    // two families: the capped dedup/LSH candidate generators, and the
    // relational/window operators whose scale story is partitioning
    // (RowNumbering, fact-fact join, one-exchange sessionization,
    // union+window as-of, bucketed range join, natural-key TF-IDF)
    // '' / 'all' = no filter (lets a caller reach the 5th outFile arg
    // while still running the full family)
    val subset = args.lift(3).filter(s => s.nonEmpty && s != "all")
      .map(_.split(",").toSet)
    val family: Seq[(String, (SparkSession, String) => DataFrame)] = (Seq(
      "q_dedup_exact" -> (ext.Dedup.qDedupExact _),
      "q_dedup_jaccard" -> (ext.Dedup.qDedupJaccard _),
      "q_dedup_minhash" -> (ext.Dedup.qDedupMinhash _),
      "q_dedup_simhash" -> (ext.Dedup.qDedupSimhash _),
      "q_dedup_embed" -> (ext.Dedup.qDedupEmbed _),
      "q_decontaminate" -> (ext.Dedup.qDecontaminate _),
      // round-6: cluster resolution — pair mining + star contraction;
      // the perturbed corpus keeps clusters small, so rounds stay
      // constant and cost tracks the pair set (~factor×)
      "q_dup_clusters" -> (ext.Dedup.qDupClusters _),
      // round-7: the cluster-keyed split rides the same memoized pair
      // view; its own work is the contraction + a broadcastable join
      "q_split_leakfree" -> (ext.Dedup.qSplitLeakfree _),
      // round-12: contrastive mining rides the memoized candidate-
      // scored table; its own work is two filters + the per-anchor
      // WindowGroupLimit — candidate-set-sized, output bounded by
      // |near-dups| + k·|anchors|
      "q_contrastive_pairs" -> (ext.Dedup.qContrastivePairs _),
      // UNMEMOIZED trainer: the driver query memoizes the model per
      // dir, which would make pass 2 a cache hit — here the point is
      // the TRAINING cost's slope, so every pass retrains
      "q_classifier_train" -> ((s: SparkSession, d: String) => {
        val m = ext.CorpusOps.trainClassifier(Tables(s, d, "documents"))
        import s.implicits._
        m.rounds.map(r => (r.round, r.nMistakes, r.wL1))
          .toDF("round", "n_mistakes", "w_l1")
      }),
      // round-8: the PQ BUILD path unmemoized (the serving path is
      // q_ann_pq above) — m sequential KMeans fits plus the argmin
      // encode; this is what a refit costs when annNeedsRefit fires
      "q_pq_build" -> ((s: SparkSession, d: String) => {
        val emb = Tables(s, d, "embeddings")
        ext.Similarity.pqEncode(emb, ext.Similarity.trainPq(emb))
      }),
      // the production posture: fit on a deterministic ~10% sample,
      // encode the full corpus — the slope this should flatten is the
      // fit's, the encode stays corpus-sized map work
      "q_pq_build_sampled" -> ((s: SparkSession, d: String) => {
        val emb = Tables(s, d, "embeddings")
        ext.Similarity.pqEncode(emb,
          ext.Similarity.trainPq(emb, fitSample = 0.1))
      }),
      // the ANN-served probe at its DOCUMENTED scale posture: a fixed
      // probe BUDGET (`every` grows with the corpus, here ~80 probes
      // at any size) over the CORPUS-SCALED index
      // (buildIvfIndexScaled: cell size ~constant, so candidates per
      // probe are nprobe·cellSize — bounded, where the fixed-16-cell
      // oracle index's cells grew linearly; round-16 ask #8). The
      // rate-fixed driver query (n/25 probes, 16 cells) is the
      // oracle's fixture and deliberately not timed at scale.
      "q_knn_probe_ann_budget" -> ((s: SparkSession, d: String) => {
        val emb = Tables(s, d, "embeddings")
        val n = emb.count()
        val every = math.max(1L, n / 80L).toInt
        val idx = graft.util.SessionCache.memoize(s, "ivf-scaled", d) {
          ext.Similarity.buildIvfIndexScaled(s, d)
        }
        val (model, codes) =
          graft.util.SessionCache.memoize(s, "pq", d) {
            val m = ext.Similarity.trainPq(emb)
            (m, ext.Similarity.pqEncode(emb, m).localCheckpoint())
          }
        val cellCodes =
          graft.util.SessionCache.memoize(s, "ivfpq-scaled", d) {
            idx.cells.select(org.apache.spark.sql.functions.col("cell"),
                org.apache.spark.sql.functions.col("vec_id"))
              .join(codes, "vec_id").localCheckpoint()
          }
        ext.Similarity.knnProbeAnn(emb, cellCodes, model, idx.centroids,
          every = every)
      })) ++
      Seq("q_view_transactions", "q_view_transactions_scaled",
        "q_view_auto_optiom", "q_view_retention",
        "q_sessionize", "q_events_window", "q_asof_join", "q_range_join",
        "q_tfidf",
        // round-5 curation family: pack exercises the distributed
        // prefix sum, curate_e2e the whole composed pipeline
        "q_pack", "q_passage_dedup", "q_contam_frac", "q_curate_e2e",
        // release gate: one partial-agg scan per gate + the contam
        // shingle join (its own slope is the q_contam_frac row)
        "q_release_gate",
        // round-6 corpus-model family: boilerplate's line-hash
        // docfreq + anti join, lm_score's model build + scoring join
        // (rotation copies grow the model ~factor× too — vocabulary
        // scales with this corpus, the worst case for the model join),
        // classifier/vocab as the map-only and agg-only controls
        "q_boilerplate", "q_lm_score", "q_classifier", "q_vocab",
        // round-6 embedding family (embeddings scale as of harness v2):
        // semdedup's k≈√n quantizer keeps within-cell mining ~n^1.5,
        // ann_ivf's probe prunes to ~nprobe/k of the corpus
        "q_semdedup", "q_ann_ivf",
        // round-6 tokenizer/versioning family: per-pass cost is the
        // map-side work (encode replace-chain, bloom probe, digest
        // tree) — the trained/built artifacts are memoized per dir
        "q_bpe_encode", "q_bpe_tokenize", "q_bloom_novel",
        "q_pack_boundaries", "q_manifest",
        // round-7 family: PQ serving (ADC scan over the 4-byte code
        // column; codebooks/codes memoized like the IVF index) and the
        // deterministic twins (sign-bucket ANN probe, position-join
        // bloom — map-only probes over bounded broadcast state);
        // classifier training is timed unmemoized above
        "q_ann_pq", "q_ann_ivf_pq", "q_ann_lsh_det", "q_bloom_novel_det",
        // observability/versioning: one partial-agg rollup; one
        // co-partitioned full-outer join (both linear by shape)
        "q_curate_report", "q_snapshot_diff",
        // round-8 family: exact-substring dedup (the corpus-tokens-
        // sized window-hash shuffle + dup-mass-bounded rebuild), the
        // media det twin (decode-once memoized features, banded
        // integer-cosine pairs), and the linear observability/mixing
        // additions (partial-agg scans + bounded broadcast joins).
        // q_knn_probe_ann is deliberately ABSENT: its probe set is
        // RATE-fixed for the oracle (n/25 probes × corpus candidates —
        // the documented eval posture is a fixed-BUDGET probe count,
        // i.e. scale `every` with the corpus), so timing the fixed
        // rate at 10× would measure the posture users are told to
        // avoid, not the operator.
        "q_substr_dedup", "q_media_near_dup_det",
        "q_temp_sample", "q_pack_stats", "q_dataset_card",
        "q_classifier_eval", "q_bpe_stats",
        // round-8 late addition — DSIR: one map-only hashed-feature
        // pass (unigrams+bigrams → md5 mod B), two ≤B-row count
        // tables, scoring joins the broadcast-sized λ table, and the
        // resample is TakeOrderedAndProject; the slope should be the
        // feature pass's (~linear), the model side is
        // corpus-size-independent
        "q_dsir_weights", "q_dsir_sample",
        // cross-source overlap matrix: the pair view is memoized (its
        // own build cost is q_dedup_jaccard's row above); this adds
        // the source-tag join + a ≤|sources|²-row agg
        "q_source_overlap",
        // centroid build (one partial-agg pass over the target slice,
        // 64 bounded integer sums) + literal-array map-only scoring —
        // both timed together, unmemoized; ncm scores all 10 literal
        // centroids in the same scan
        "q_embed_prototype", "q_ncm_predict",
        // two-phase distributed selection: two partial-agg scans with
        // bounded (bucket-width) driver state — no global sort at any n
        "q_score_threshold",
        // round-9 path-analytics family: funnel's one-shuffle fold
        // (per-user arrays of funnel-typed events — user_id remapping
        // keeps per-user density constant, so array sizes don't grow
        // with the corpus, only user count does), cohort's
        // co-partitioned user join + (weeks²/2)-cell distinct, and
        // rolling-active's fixed 7× pair-set explode
        "q_funnel", "q_cohort", "q_rolling_active",
        // quality-aware survivor: star contraction over the memoized
        // pair view + the map-only classifier score + a duplicate-
        // bounded rank window
        "q_dedup_keep_best",
        // rest of the round-9 events/path family: conversion rollup
        // (|users|-sized percentile over the funnel), transitions
        // (sessionizer plan shape), weekly top-k (WindowGroupLimit
        // below the exchange), hourly anomaly (rollup first, one
        // range window over |hours × types| rows), mixture plan (one
        // partial-agg scan + #domains driver rows)
        "q_funnel_conv", "q_event_transitions", "q_top_spenders",
        // Markov eval: the transitions window + two |types|²-bounded
        // halves and a rank-1 model pick — the sessionizer shape
        "q_markov_eval",
        // RFM: one scan → per-user table + three two-level global row
        // numbers (the ntile shape ×3), ≤125-row rollup
        "q_rfm",
        // Lorenz/Gini: one scan + ONE two-level row number; the i·x
        // mass rides DECIMAL(38,0); 10-row output
        "q_lorenz",
        // embedding drift: one posexplode scan → |labels|×dims
        // bounded integer sums (embeddings scale under harness v2)
        "q_embed_drift",
        // Zipf fit: one tokenize scan → vocab table (~factor under
        // rotation copies) + one two-level rank + 1-row OLS agg
        "q_zipf",
        // CCNet buckets: the memoized-KN scoring join + two bounded
        // two-phase selections + one rollup (the score_threshold shape)
        "q_ccnet_buckets",
        // quality fusion: the classifier + KN serving scans (models
        // memoized — their training slopes are the _fit rows) + three
        // scalable rankings + a TakeOrdered head
        "q_quality_fusion",
        "q_event_anomaly", "q_mixture_plan",
        // round-10 family: gap-fill (rollup-first — spine cost is
        // |hours×types|, independent of event volume), islands and
        // attribution (the sessionizer's one-exchange shape), grouping
        // sets (one Expand + partial agg), scalable ntile (two-level
        // row number, no single-partition window), integer Lloyd
        // k-means + cluster sample (iters+1 scans, k·dims driver
        // state; embeddings scale under harness v2)
        "q_gap_fill", "q_islands", "q_attribution",
        "q_grouping_sets", "q_ntile", "q_kmeans", "q_cluster_sample",
        // pagerank: co-partitioned edge build (Σ order-size² pairs),
        // Σedges per round; region revenue: two fact shuffles + two
        // broadcast dims; winsorize: per-type exact percentile +
        // map-only clip; zorder: pure map-side integer expression
        "q_pagerank", "q_region_revenue", "q_winsorize", "q_zorder",
        // graph/basket/calibration family: triangles (degree-ordered
        // orientation — wedge candidates O(m^1.5), baskets don't cross
        // scaled copies so edges grow ~linearly), assoc rules (Apriori
        // prune + the same co-partitioned basket self-join),
        // concurrency (boundary prefix sum — two jobs over the session
        // sort), calibration (train memoized; deciles via two-level
        // row number), quantile norm (two rank passes + rank-key join)
        "q_triangles", "q_assoc_rules", "q_concurrency",
        "q_calibration", "q_quantile_norm",
        // round-9 late family: BFS (frontier joins — edge build is the
        // dominant self-join, distinct part-pair edges saturate at
        // |parts|² while edge MASS grows ~factor), SCD2 (grain agg +
        // two key-partitioned windows over 10× per-key depth), CDC
        // apply (max_by partial agg — shuffle bounded by touched keys,
        // not log depth), BM25 (tokenize + dlen agg scale; query-term
        // tf stays copy-0-sized because rotations rewrite the terms),
        // skyline (two partial-agg scans + bucket-keyed window)
        "q_bfs", "q_scd2", "q_cdc_apply", "q_bm25", "q_skyline",
        // rolling KMV: per-day distinct-hash stream grows ~factor
        // (users remap ×factor, days constant) but sketches stay ≤k
        // per day — the merge is constant, the slope is the distinct
        // pass; bloom join: build ~|urgent|×factor, probe map-only
        "q_rolling_hll", "q_bloom_join",
        // banded interval join: sessions ×factor (users remap), burst
        // side bounded by |hours|; shuffle is Σ interval-length/bucket
        "q_interval_join",
        // trigrams: one per-user window layout, |types|³-bounded agg;
        // cusum: rollup-first — windows run over |hours×types| rows,
        // never event volume
        "q_path_trigrams", "q_cusum",
        // unpivot: one Expand over the pivot's |users|-row matrix;
        // seasonal naive: rollup-first lags over |hours×types|
        "q_unpivot", "q_seasonal_naive",
        // robust z: two grouped percentiles over |hours×types|;
        // pmi: two partial aggs + vocabulary-sized broadcast joins
        "q_robust_z", "q_pmi",
        // min-plus relaxation: edge build dominates (as BFS); rounds
        // ride the saturated distinct-edge table
        "q_shortest_path",
        // two-phase weighted selection: two partial-agg scans +
        // one bounded-bucket window, driver state ≤ wmBuckets longs
        "q_weighted_median",
        // G-test drift: one scan to the |periods×cats| rollup
        "q_mix_drift",
        // round-10 data-quality family: profile (one multi-distinct
        // Expand scan — distinct mass grows with remapped keys), rules
        // (conditional partial aggs + one key-keyed join/anti-join),
        // benford (map + 9-row rollup), skew profile (per-key counts
        // then stats over the count table)
        "q_dq_profile", "q_dq_rules", "q_benford", "q_skew_profile",
        // ACF: rollup-first — the window + per-lag aggs ride the
        // |hours| spine, never event volume
        "q_acf",
        // k-core / item-CF: the support-2 pair build is the dominant
        // basket self-join (Σ basket² — co-purchase precedent); peel
        // rounds ride the support-filtered edge set, the CF window
        // rides the pair table partitioned by item
        "q_kcore", "q_item_cf",
        // KMV set algebra: distinct (type,user) pass ~factor; the
        // pairwise sketch math is |types|²·k regardless of corpus —
        // the exact-audit self-join is the only other corpus-sized leg
        "q_kmv_intersect",
        // EWMA level monitor: rollup-first like cusum — the lag window
        // rides |types×hours| rows, never event volume
        "q_ewma",
        // OLS trend: rollup-first — spine + five sufficient statistics
        // over |types×hours| rows, |types|-row final agg
        "q_trend",
        // AMOC changepoint: rollup-first — one cumsum window +
        // struct-max argmax over |types×hours| rows
        "q_changepoint",
        // weighted sampler: ≤cap× map-only replica explode, per-item
        // min partial agg, global TakeOrdered — no sort at any n
        "q_weighted_sample",
        // correlation matrix: the canonical map-side-combine aggregate
        // (one scan, 15 exact-integer statistics, 1-row shuffle)
        "q_corr_matrix",
        // seasonality eta²: rollup-first — the ANOVA runs over
        // |types×24| group rows off the |types×hours| spine
        "q_seasonality",
        // round-11 family: RRF fusion (the BM25 tokenize/dlen scans +
        // the map-only cosine pass — both ~factor; candidate lists and
        // the fusion itself are constant-size), retrieval eval (two
        // map-only scoring passes over the scaled embeddings + 8
        // per-query WindowGroupLimit top-k's; metrics on ≤2·Q·k rows),
        // row-level DQ gate (the lineitem⟕orders key join + codegen
        // verdicts — quarantine mass ~factor)
        "q_rrf_fusion", "q_retrieval_metrics", "q_dq_quarantine",
        // join advisor: per-key count shuffles on both sides, then
        // the cardinality/skew math over |keys|-row count tables
        "q_join_advisor",
        // classifier CV: folds× the training budget (broadcast weight
        // table + two partial aggs per round), map-only held-out
        // scoring — trained models memoized per (dir, fold)
        "q_classifier_cv",
        // histogram percentiles: one scan → |buckets|-row count table;
        // the cumulative window and per-p pick ride bounded rows
        "q_quantile_hist",
        // round-12: unigram encode rides the memoized model — the
        // measured slope is the corpus explode + broadcast type-join
        // (the serving posture; training slope is the unmemoized
        // entry below); the compare row adds the BPE replace-chain
        // corpus pass on the same scan
        "q_unigram_encode", "q_tokenizer_compare",
        // round-12 forget-cascade audit: three partial-agg scans +
        // the one lineitem⟕deleted-orders semi-join (fact keys remap
        // in lockstep under scaling, so cascade density is preserved)
        "q_forget_audit",
        // round-12 embedding-algebra family: pca rides the memoized
        // model (output constant at d rows — the timed leg is the
        // first pass's moment scan, then serving); abtt/project are
        // map-only codegen against literal arrays — slope = the scan
        "q_embed_pca", "q_embed_abtt", "q_embed_project",
        // round-12 session 2 — drift pair: KS is one partial-agg scan
        // to the per-value count table (bounded by the cents domain,
        // not the corpus) + the bounded cumulative window; DP release
        // is one scan to 25 per-nation rows + map-only noise math
        "q_ks_drift", "q_dp_counts",
        // SQ8 ANN: fit = one posexplode partial-agg scan (memoized);
        // serving = map-only literal-grid scoring + TakeOrdered — the
        // slope is the scan, like ann_lsh_det
        "q_ann_sq",
        // MMR rerank: the corpus-sized leg is the exact-cosine scan +
        // top-20 TakeOrdered; the 400-pair head and the greedy are
        // constant-size at any corpus
        "q_mmr_rerank",
        // wordpiece encode rides the memoized model: the slope is the
        // type-table build + greedy matching per TYPE + the broadcast
        // join back (types grow ~factor under rotation/suffix copies)
        "q_wordpiece_encode",
        // bootstrap CI: the corpus-sized leg is the retrieval panel
        // build (timed as q_retrieval_metrics); the resample fan-out
        // is a constant 1600-row broadcast join
        "q_bootstrap_ci",
        // span corruption: pure map — words + per-block coin structs +
        // two array HOF emissions; the ideal linear-scan shape
        "q_span_corrupt",
        // curriculum: lm scoring join (~factor) + the range-partitioned
        // global row number (no single-partition window) + map math
        "q_curriculum",
        // round-12 session 3 — target encoding: one scan to per-cust
        // partials (custkeys fixed, group sizes ~factor) + the linear
        // join back; hashing trick: explode → map-side partial agg,
        // output capped at docs·2^k; SPRT: users ~factor, ONE range-
        // partitioned sort carries both running totals (the PrefixSum
        // shape) — slope ≈ factor·log(factor) from the sort
        "q_target_encode", "q_feature_hash", "q_sprt",
        // round-12 session 3 wave 2 — CUPED: one scan to 1 row of
        // sufficient stats (ideal linear shape); AUC: inference scan +
        // the bounded per-score group table (scores grow with vocab
        // under rotation copies, still domain-bounded); MI select:
        // explode → distinct presence shuffle → ≤2^k bucket rows; KM:
        // per-user agg → the calendar-bounded life table
        "q_cuped", "q_auc", "q_mi_select", "q_kaplan_meier",
        // RMST: the same per-user scan + per-arm bounded grid as
        // log-rank, plus K-row integer area arithmetic
        "q_rmst",
        // log-rank rides the same per-user scan + bounded grid as KM;
        // perm test fans the per-user table out B× with MAP-SIDE
        // COMBINE to 2B cells/partition — shuffle O(B·parts), corpus-
        // independent; the slope is the scan + the fan-out map work
        "q_logrank", "q_perm_test",
        // round-14 session 3 — the BH battery rides the perm-test
        // shape per event type: per-(user, type) counts ~factor, the
        // B-draw broadcast fan-out combines map-side to ≤ m·2B cells
        // per partition, BH itself is an m-row bounded-domain window
        "q_fdr_bh",
        // coverage curve: one exploded-shingle pass + per-gram MIN
        // partial agg + a ≤11-row histogram — the dedup_exact shape;
        // the whole 10-point curve costs ONE scan, never a per-k join
        "q_coverage_curve",
        // Heaps'-law fit: the same min-bucket trick over TOKENS (one
        // exploded pass, per-type MIN, two 10-row cumsums, OLS on the
        // constant spine) — vocab grows ~factor under rotation copies,
        // exercising the per-type MIN agg at its worst
        "q_heaps_law",
        // Simpson check: the strat_effect scan re-published as the
        // ≤10-row per-stratum table + a broadcast 1-row naive — the
        // ideal one-scan shape
        "q_simpson_check",
        // DiD: one scan to per-user pre/post sums -> 1-row suff stats,
        // the CUPED shape with a time split instead of a covariate
        "q_did_test",
        // round-13 backfill — A/B: one scan → per-user agg (users
        // remap ~factor, per-user density constant) → 1-row integer
        // sufficient statistics, the ideal linear shape
        "q_ab_test",
        // Mann-Whitney: per-user cents groups grow ~|users| but the
        // running total is PrefixSum's range-partitioned sort — slope
        // ≈ factor·log(factor), never a single-partition window
        "q_mann_whitney",
        // tail risk rides the same per-value group table + ONE
        // range-partitioned running count (PrefixSum, descending) —
        // the mann_whitney shape with a broadcast 1-row cut
        "q_tail_risk",
        // Kneser-Ney SERVING (model memoized per dir — the production
        // train-once lifetime; training slope is q_kn_fit below): the
        // corpus bigram stream joined to the vocab-bounded count
        // tables — vocab grows ~factor under rotation/suffix copies,
        // the worst case for the model join (the lm_score posture)
        "q_kneser_ney",
        // round-14 (verdict ask #3): the vocab-CAPPED model under the
        // SAME vocab-growth worst case — every model table is bounded
        // at (capV+1)² regardless of corpus growth, so the serving
        // slope should flatten to the pure bigram scan as the rotated
        // vocab saturates past the cap (the uncapped row above is the
        // control)
        "q_kneser_ney_capped",
        // round-13 session 2 — SRM/MDE/group-sequential: one scan →
        // per-user agg → bounded integer sufficient statistics (the
        // ab_test shape; group_seq carries K=5 conditional sums)
        "q_srm_check", "q_mde_power", "q_group_seq",
        // trimmed mean + QTE: per-(arm, cents) groups + the range-
        // partitioned per-arm running total (the mann_whitney shape);
        // the decile probe is a 9-row broadcast fan-out
        "q_trimmed_ab", "q_qte",
        // post-stratification: one scan → ≤10-row stratum table
        "q_strat_effect",
        // conformal: the map-only inference scan (model memoized) +
        // two bounded selection passes + one eval partial agg
        "q_conformal",
        // Theil-Sen: rollup-first — the pair set is C(|hours|, 2),
        // calendar-bounded; the corpus-sized leg is the one rollup
        "q_theil_sen",
        // KN-gated curate: qCurate's chain plus the KN scoring join
        // (memoized model — serving slope is q_kneser_ney's row) and
        // the two bounded threshold scans (q_score_threshold's shape)
        "q_curate_e2e_kn",
        // round-14: RBO — past the KN serving join (the row above) and
        // two range-partitioned global row numbers, the whole query
        // lives on rows with max(ra, rb) ≤ 1000 and the constant
        // 1000-row depth spine, so the slope should track the KN scan
        "q_rbo",
        // round-14 session 3 — Spearman: the SAME two global row
        // numbers as q_rbo, then ONE partial-agg scan to four
        // sufficient statistics (no depth spine at all) — the cheaper
        // whole-list complement should track or beat the RBO slope
        "q_spearman",
        // rater kappa: two map-only gate predicates + a 4-cell partial
        // agg — the ideal linear-scan shape (the rotated copies kill
        // the stopword gate but the repetition gate still computes,
        // so the scan work is honest)
        "q_rater_kappa",
        // isotonic calibration: the KN serving scan (memoized model) +
        // a 1-row min/max pass + one ≤24-bucket shuffle; the B²
        // interval/minimax tail is constant-domain work
        "q_isotonic_cal",
        // preference pairs: one range-partitioned global row number +
        // a broadcast 1-row count + three rank-offset equi-joins —
        // exactly 3n output rows, slope ≈ factor·log(factor) from the
        // sort, never an all-pairs leg
        "q_pref_pairs",
        // Bradley-Terry: the win matrix from ONE multi-column
        // PrefixSum (|S|=20 indicator totals off one sort) + an |S|²
        // partial agg; the Θ(n²) win MASSES ride decimal sums but the
        // WORK is the sort — MM rounds are driver arithmetic over the
        // bounded matrix. Uncapped pair joins would be factor²; this
        // row is the evidence the one-sort formulation isn't
        "q_bradley_terry",
        // link prediction: adjacency build/shuffle ~edge mass
        // (~factor; distinct part-pair edges saturate as in BFS while
        // degrees grow), per-center wedge work capped at C(S,2) by the
        // bottom-S sample REGARDLESS of hub degree — the cap is
        // exactly what this row exercises: uncapped wedges would be
        // Σd² ≈ factor²
        "q_link_predict",
        // round-14 session 4 — qini: one scan → per-user triple
        // (users ~factor), two-level global row number, 10-row decile
        // table (the mann_whitney sort shape)
        "q_qini",
        // shapley channels: one scan → per-user mask partial agg →
        // ≤16-row coalition game; the ideal linear shape with a
        // constant-size driver tail
        "q_shapley_channels",
        // FD profile: one scan, |candidates| explode fan-out, one
        // histogram shuffle whose cardinality rides the lhs key
        // growth (~factor for the orderkey candidates)
        "q_fd_discover",
        // inclusion deps: per-candidate distinct-project shuffles
        // (child cardinality ~factor for the fact-side keys) + one
        // value-keyed join each
        "q_inclusion_deps",
        // HITS: same memoized edge build as pagerank (edges ~factor
        // under constant basket sizes), 6 half-steps of join +
        // partial agg, 1-row broadcast normalizers
        "q_hits",
        // burstiness: (type, hour) histogram rides a FIXED calendar
        // spine (copies keep the ts range); the gap window partitions
        // by (user, type) — users ~factor, per-partition size constant
        "q_burstiness",
        // off-policy eval: one scan → per-user agg → ONE 1-row
        // aggregate carrying every policy's sums (the ab_test shape)
        "q_offpolicy_eval",
        // paired-series diagnostics: one scan → (hour, type) rollup;
        // the spine/lag/Cramer work is calendar-bounded (the Autocorr
        // exemption), so the slope is the scan alone
        "q_xcorr", "q_granger",
        // ANOVA: one scan → |sources| sufficient-statistic rows
        // (groups fixed under copies, sizes ~factor), 1-row verdict
        "q_anova",
        // cube: one Expand + partial agg (the rollup plan, 4 levels)
        "q_cube",
        // soft dedup: cluster histogram + one annotate join back —
        // output rows grow exactly ~factor (every doc keeps a row)
        "q_soft_dedup",
        // source ablation: one map-only gate scan -> |sources| rows +
        // a 1-row broadcast total — the ideal linear shape
        "q_source_ablation",
        // round-14 session 5 — Cliff's delta: the EXACT mann_whitney
        // plan (one scan → per-user agg → distinct-value prefix sum)
        // plus a 1-row post-projection; slope must track q_mann_whitney
        "q_cliffs_delta",
        // Nelson-Aalen: the kaplan_meier shape — one scan → per-user
        // clock triple → bounded duration-domain life table; the
        // cumulative window is over calendar days, never users
        "q_nelson_aalen",
        // chi²/Cramér-V: one (lang, source) partial agg (grid bounded
        // by both domains), then grid-sized densify + 1-row verdict —
        // the mix_drift boundedness contract
        "q_chi2_assoc",
        // Bayes A/B: one scan → per-user agg → ONE 1-row integer
        // aggregate (the ab_test shape, cheapest possible)
        "q_bayes_ab",
        // entropy l-diversity: one (class, value) histogram shuffle,
        // grid-sized joins after (the t_closeness shape minus the
        // dense grid)
        "q_l_diversity",
        // readability: ONE map-only documents scan → |sources| rows —
        // the source_ablation shape (regex counts make the scan
        // honest under rotation)
        "q_readability",
        // Brown double-EWMA + forecast eval: one partial agg to the
        // |types×hours| rollup; spine/lag work calendar-bounded (the
        // Autocorr exemption — slope is the scan alone)
        "q_double_ewma", "q_forecast_eval",
        // TextRank: adjacent-pair partial agg (edge set bounded by
        // DISTINCT bigrams — saturates under Heaps' law while counts
        // grow), then 3 rounds of broadcast join over the vocab graph
        "q_textrank",
        // STL-lite: one partial agg to the |types×hours| rollup; the
        // centered MA and hod means are calendar-bounded
        "q_stl_decompose",
        // degree power law: the memoized edge build (~factor) + one
        // degree partial agg + a 1-row MLE
        "q_degree_powerlaw",
        // runs test: the cusum shape — one rollup partial agg,
        // calendar-bounded spine windows, 1 row per type
        "q_runs_test",
        // McNemar: the rater_kappa shape — one map-only two-gate scan
        // to a 4-cell aggregate
        "q_mcnemar",
        // odds ratio: the ab_test shape — one scan, one 4-cell row
        "q_odds_ratio",
        // fightin' words: one tokenize scan → vocab-bounded (word,
        // side) agg → two TakeOrdered top-k legs
        "q_fightin_words",
        // Chao richness: tokenize scan → per-source vocab agg
        // (Heaps-saturating) → |sources| rows
        "q_chao_richness",
        // extreme value: the cusum rollup + |types×days| maxima fold
        "q_extreme_value",
        // covariate balance: one scan → per-user agg → 3-way stack →
        // |covariates| rows (the ab_test shape ×3)
        "q_covariate_balance",
        // survival quantiles: the kaplan_meier table + a 3-row probe
        "q_median_survival",
        // (hubness is registered below as q_hubness_budget — the
        // driver query's 1% probe RATE is an oracle fixture; timing
        // it at factor scale would measure the rate's quadratic
        // probe×corpus leg rather than the documented budget posture)
        // ESS: one pass over the memoized DSIR weight table → 1 row
        "q_ess",
        // gains curve: the KN serving join + ONE two-level global row
        // number + a 10-row decile table
        "q_gains_curve",
        // Borda: the same three rankings as quality_fusion with an
        // integer point sum instead of the RRF float
        "q_borda_fusion",
        // capture-recapture: one scan → per-user two-bit agg → 1 row
        "q_capture_recapture",
        // Simpson diversity: one bounded (lang, source) grid agg
        "q_simpson_diversity",
        // ICC/DEFF: one scan → per-user masses → 1-row moments
        "q_icc",
        // factorial: the ab_test shape with a 4-cell aggregate
        "q_factorial_ab",
        // word burstiness: (doc, word) partial agg, vocab-bounded tail
        "q_word_burstiness",
        // Gries DP: the wc monoid + bounded word×source dense grid
        "q_word_dispersion",
        // churn risk: one scan → per-user clocks → 6-row histogram,
        // band membership by integer cross-multiplication
        "q_churn_risk",
        // co-engagement: one scan → ≤32-row mask histogram → |types|²
        // pairwise sums (the shapley_channels shape)
        "q_coengagement",
        // embed geometry: one posexplode scan → 64 integer rows
        "q_embed_geometry",
        // segmented SRM: one scan → per-user gateway agg → 5 rows
        "q_srm_segmented",
        // overdispersion: the ab_test shape, 1-row moments
        "q_overdispersion",
        // ADF: the granger shape — rollup + calendar-bounded lags +
        // 1-row-per-type Cramer statistics
        "q_adf_test",
        // Tukey HSD: the anova scan + C(k,2) grid pairs
        "q_tukey_hsd",
        // KS A/B: the mann_whitney prefix-sum shape, 1-row verdict
        "q_ks_ab",
        // rate ratio: the ab_test shape, 1-row verdict
        "q_rate_ratio",
        // audio stats: the memoized real-codec decode (one map pass)
        // + a |sources| rollup
        "q_audio_stats")
        .map(n => n -> SparkEntry.queries(n)) ++ Seq(
      // t-closeness against the scaled population twin (the
      // k_anonymity posture): class count fixed, class sizes ~factor;
      // one (class, band) histogram shuffle then bounded-grid sweeps
      "q_t_closeness" -> ((s: SparkSession, d: String) => {
        val f = new java.io.File(s"$d/customer_scaled.parquet")
        val c = if (f.exists) s.read.parquet(f.getPath)
                else Tables(s, d, "customer")
        graft.operators.Anonymity.tClosenessProfile(
          c.withColumn("bal_band",
            org.apache.spark.sql.functions.floor(
              org.apache.spark.sql.functions.col("c_acctbal") / 1000.0)
              .cast(org.apache.spark.sql.types.LongType)),
          Seq("c_nationkey", "c_mktsegment"), "bal_band")
      }),
      // round-14 (verdict ask #8): the heuristic curate gate's
      // stopword predicate collapses on the rotated corpus (only
      // copy-0 keeps stopwords), so q_curate_e2e's scale row proves
      // the plan but not the work — this rotation-INVARIANT gate twin
      // (length + punct only, same chain: scrub → dedup → chunk →
      // prefix-sum pack) keeps the kept set growing ~factor so the
      // measured slope carries honest output volume
      "q_curate_e2e_invariant" ->
        ((s: SparkSession, d: String) => ext.TextOps.qCurateInvariant(s, d)),
      // round-12 session 2: the WordPiece TRAINING slope, unmemoized
      // (classifier_train posture) — per round one pair-explode scan +
      // one symbol-explode scan over |types|, argmax TakeOrdered;
      // types grow ~factor so rounds stay type-table-bounded
      "q_wordpiece_train_fit" -> ((s: SparkSession, d: String) => {
        import org.apache.spark.sql.functions._
        val types = Tables(s, d, "documents")
          .select(explode(split(col("text"), " ")).as("word"))
          .groupBy("word").agg(count(lit(1)).as("n"))
        val m = ext.WordPiece.train(types)
        import s.implicits._
        m.merges.toDF("rank", "left", "right", "pair_count",
          "left_count", "right_count")
      }),
      // round-12: the PCA FIT slope, unmemoized (classifier_train
      // posture) — the corpus-sized leg is the one d(d+1)/2-products
      // moment pass folded map-side to ≤d²-row partial state; the
      // power iteration is driver work over d² integers, corpus-free
      "q_pca_fit" -> ((s: SparkSession, d: String) => {
        val m = ext.EmbedAlgebra.fitPca(Tables(s, d, "embeddings"))
        import s.implicits._
        m.vMicro.zipWithIndex.toSeq
          .map { case (v, j0) => (j0 + 1L, v, m.lambda, m.explained) }
          .toDF("j", "v_micro", "lambda", "explained")
      }),
      // round-12: the unigram TRAINING slope, unmemoized (the
      // classifier_train posture): the type-table build is the
      // corpus-sized leg (~factor); the EM rounds run over |types|,
      // which the rotated/suffixed copies grow ~min(factor, 100)× of
      // a 31-type base — still bounded vocab work per round
      "q_unigram_train_fit" -> ((s: SparkSession, d: String) => {
        import org.apache.spark.sql.functions._
        val types = Tables(s, d, "documents")
          .select(explode(split(col("text"), " ")).as("word"))
          .filter(col("word") =!= "")
          .groupBy("word").agg(count(lit(1)).as("n"))
        val m = ext.Unigram.train(types)
        import s.implicits._
        m.rounds.zipWithIndex.flatMap { case (vs, r) =>
          vs.map(v => (r, v._1, v._2, v._3))
        }.toDF("round", "piece", "cnt", "cost_micro")
      }),
      // round-12: generalization ladder against the scaled population
      // twin (same fallback contract as q_k_anonymity below): class
      // count fixed, class sizes ~factor — the cascade stays windowed
      // sums over the bounded class table
      "q_k_generalize" -> ((s: SparkSession, d: String) => {
        val f = new java.io.File(s"$d/customer_scaled.parquet")
        val c = if (f.exists) s.read.parquet(f.getPath)
                else Tables(s, d, "customer")
        graft.operators.Anonymity.generalizeLadder(c, Tables(s, d, "nation"))
      }),
      // k-anonymity against the DEDICATED scaled population twin
      // (customer stays an unscaled dim for the view family): class
      // count fixed, class sizes ~factor — one QI groupBy then
      // bounded threshold aggs; falls back to the real customer table
      // on the unscaled source dir
      "q_k_anonymity" -> ((s: SparkSession, d: String) => {
        val f = new java.io.File(s"$d/customer_scaled.parquet")
        val c = if (f.exists) s.read.parquet(f.getPath)
                else Tables(s, d, "customer")
        graft.operators.Anonymity.kAnonymityProfile(
          c.withColumn("bal_band",
            org.apache.spark.sql.functions.floor(
              org.apache.spark.sql.functions.col("c_acctbal") / 1000.0)
              .cast(org.apache.spark.sql.types.LongType)),
          Seq("c_nationkey", "c_mktsegment"), "bal_band")
      }),
      // heavy hitters at a FIXED absolute threshold (the small corpus'
      // T): the scaled corpus' disjoint vocabularies make nothing
      // RELATIVELY heavy, so the relative form would time an empty
      // prune; fixing T keeps candidate mass ~factor× and measures the
      // sketch + prune + exact passes at honest selectivity
      "q_heavy_hitters_absT" -> ((s: SparkSession, d: String) => {
        val b = graft.operators.HeavyHitters.bigrams(Tables(s, d, "documents"))
        // 250 ≈ the sf0.1 corpus' N/1000 relative threshold (N≈266k,
        // max bigram count 357): ~900 heavy keys at small, ~factor×
        // that at big (each rotated copy contributes its own set)
        graft.operators.HeavyHitters.heavyHitters(b, absoluteT = Some(250L))
      }),
      // round-13: the Kneser-Ney TRAINING slope, unmemoized (the
      // classifier_train posture) — two type-table groupBys off the
      // corpus bigram stream plus the two scalar counts; bigram types
      // grow ~factor under rotation/suffix copies so every leg is
      // ~factor, none corpus²
      "q_kn_fit" -> ((s: SparkSession, d: String) => {
        val m = ext.KneserNey.train(Tables(s, d, "documents"),
          materialize = false)
        // touch all three count tables so the fit cost is what's timed
        m.big.join(m.uni, "w1").join(m.cont, "w2")
          .select(org.apache.spark.sql.functions.col("w1"),
            org.apache.spark.sql.functions.col("w2"),
            org.apache.spark.sql.functions.col("c12"),
            org.apache.spark.sql.functions.col("c1"),
            org.apache.spark.sql.functions.col("n1f"),
            org.apache.spark.sql.functions.col("n1r"))
      }),
      // record linkage against the DEDICATED register twin (see
      // scaleCustomerLinkage: blocking-key cardinality must grow with
      // the register or ANY blocked join is quadratic in block size —
      // the census growth model and Splink's stated blocking
      // requirement); falls back to the real customer table on the
      // unscaled source dir
      "q_record_linkage" -> ((s: SparkSession, d: String) => {
        val f = new java.io.File(s"$d/customer_linkage_scaled.parquet")
        val c = if (f.exists) s.read.parquet(f.getPath)
                else Tables(s, d, "customer")
        graft.operators.RecordLinkage.linkPairs(c)
      }),
      // the eval rides the same candidate table + one partial agg
      "q_linkage_eval" -> ((s: SparkSession, d: String) => {
        val f = new java.io.File(s"$d/customer_linkage_scaled.parquet")
        val c = if (f.exists) s.read.parquet(f.getPath)
                else Tables(s, d, "customer")
        graft.operators.RecordLinkage.linkageEval(c)
      }),
      // round-14 session 3: embedding decontamination at its
      // DOCUMENTED scale posture — the eval battery is small by
      // nature, so the timed variant holds it CONSTANT (~30 vectors)
      // as the train side grows; the slope is the broadcast map-only
      // scan (the rate-fixed %17 driver query would grow the battery
      // with the corpus and time an undocumented quadratic)
      "q_embed_decontam_budget" -> ((s: SparkSession, d: String) => {
        val emb = Tables(s, d, "embeddings")
        val n = emb.count()
        ext.EmbedDecontam.embedDecontam(emb,
          math.max(ext.EmbedDecontam.evalMod, n / 30L))
      }),
      // round-13: KNN-Shapley at its DOCUMENTED scale posture — a
      // fixed probe BUDGET (~80 probes at any corpus), so the slope is
      // the per-probe scoring scan + partitioned windows, not the
      // probe count (the q_knn_probe_ann_budget convention; the
      // rate-fixed driver query is deliberately not timed at scale)
      "q_knn_shapley_budget" -> ((s: SparkSession, d: String) => {
        val emb = Tables(s, d, "embeddings")
        val n = emb.count()
        ext.KnnShapley.knnShapley(emb, mod = math.max(1L, n / 80L))
      }),
      // hubness under the SAME fixed probe budget: the driver query's
      // 1% probe RATE is the oracle's fixture; at scale the budget
      // form is the documented posture (the q_hubness 100× row
      // without it measured the rate's quadratic probe×corpus leg —
      // 90× — which is exactly what this registration retires)
      "q_hubness_budget" -> ((s: SparkSession, d: String) => {
        val emb = Tables(s, d, "embeddings")
        val n = emb.count()
        ext.Hubness.hubness(emb, mod = math.max(1L, n / 80L))
      }),
      // fuzzy join against the DEDICATED scaled name corpus (dims
      // don't scale; part_scaled is the fact-shaped twin) — falls back
      // to the real part table on the unscaled source dir
      "q_fuzzy_join" -> ((s: SparkSession, d: String) => {
        val f = new java.io.File(s"$d/part_scaled.parquet")
        val df = if (f.exists) s.read.parquet(f.getPath)
                 else Tables(s, d, "part")
        graft.operators.FuzzyJoin.fuzzyJoin(df)
      }),
      // round 16: the bounded-output arm on the same scaled corpus —
      // output is n·k by construction, so its slope isolates the
      // candidate-generation cost the exhaustive row mixes with its
      // own (legitimately quadratic-in-group-size) output volume
      "q_fuzzy_join_topk" -> ((s: SparkSession, d: String) => {
        val f = new java.io.File(s"$d/part_scaled.parquet")
        val df = if (f.exists) s.read.parquet(f.getPath)
                 else Tables(s, d, "part")
        graft.operators.FuzzyJoin.fuzzyJoinTopK(df)
      })) ++
      // round 15: the relational deck — facts scale ×factor, dims stay
      // constant (the realistic warehouse growth shape scaleFacts
      // produces), so these rows measure exactly what a 100 TB
      // deployment pays: fact-fact shuffle growth under broadcast-dim
      // join chains, semi/anti-join subquery decorrelation at scale
      graft.operators.TpchDeck.queries.toSeq.sortBy(_._1))
      .filter { case (n, _) => subset.forall(_.contains(n)) }

    def time(fn: (SparkSession, String) => DataFrame, dir: String): Double = {
      // warm-up + min-of-2, transient blocks dropped between passes —
      // same methodology as Bench
      val times = (0 to 2).map { _ =>
        val t0 = System.nanoTime()
        materialize(fn(spark, dir))
        val t = (System.nanoTime() - t0) / 1e9
        graft.util.SessionCache.dropTransientBlocks(spark)
        System.gc()
        t
      }
      times.drop(1).min
    }

    val rows = family.map { case (name, fn) =>
      val small = time(fn, srcDir)
      val big = time(fn, bigDir)
      // output cardinality at both scales: linear (~factor×) growth
      // confirms the perturbed corpus kept duplicate density constant
      // rather than inflating pairs quadratically
      val smallRows = fn(spark, srcDir).count()
      val bigRows = fn(spark, bigDir).count()
      graft.util.SessionCache.dropTransientBlocks(spark)
      (name, small, big, big / small, smallRows, bigRows)
    }
    val qjson = rows.map { case (n, s, b, r, sr, br) =>
      f"""\"$n\":{\"small_sec\":$s%.3f,\"big_sec\":$b%.3f,\"ratio\":$r%.2f,\"small_rows\":$sr,\"big_rows\":$br}"""
    }.mkString("{", ",", "}")
    val line =
      s"""{"metric":"scale_check","factor":$factor,"src":"$srcDir","big":"$bigDir","queries":$qjson}"""
    println(line)
    // Optional 5th arg: ALSO write the line to a run file. The
    // round-14 verdict's missing item #3: the 10×/100× evidence that
    // grades the 100 TB claim lived only in DESIGN.md prose tables —
    // the BENCH_LOCAL lesson applied here: runs at each factor land in
    // files that tools/merge_scalecheck.py folds into the committed
    // machine-readable SCALECHECK_r<N>.json artifact.
    args.lift(4).foreach { path =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path), line)
    }
    spark.stop()
  }
}
