package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** SQL surface for the curation/dedup artifacts — the ext analog of
  * [[graft.views.Views.createAll]]: a SQL-first user registers once and
  * then composes plain `spark.sql` over the corpus views.
  *
  * These are DATAFRAME-backed temp views, not SQL text, on purpose: the
  * backing plans are the scale-correct formulations that ANSI text
  * cannot express — the memoized jaccard pair view, the star-contraction
  * cluster table, RowNumbering's distributed global order — so a SQL
  * user gets the 100 TB plans, not a single-partition window. Temp views
  * over already-materialized artifacts (the memoized pair set, the
  * contraction's checkpointed fixpoint) serve from those blocks;
  * re-registering after a table rewrite = new session or
  * [[graft.util.SessionCache.clear]], like any materialized view. */
object CurationViews {

  /** Register `dup_pairs`, `dup_clusters`, `corpus_dedup`, `doc_stats`,
    * `corpus_mixture`, `corpus_shuffle`, `corpus_vocab`, `doc_scores`
    * and `corpus_boilerplate` (plus the base tables) as temp views over
    * `dir`. */
  def createAll(spark: SparkSession, dir: String): Unit = {
    graft.Tables.registerAll(spark, dir)
    Dedup.jaccardPairs(spark, dir)
      .createOrReplaceTempView("dup_pairs")
    Dedup.qDupClusters(spark, dir)
      .createOrReplaceTempView("dup_clusters")
    Dedup.resolveDuplicates(
        graft.Tables(spark, dir, "documents"),
        Dedup.jaccardPairs(spark, dir).select(col("doc_a"), col("doc_b")))
      .createOrReplaceTempView("corpus_dedup")
    TextOps.qTextStats(spark, dir)
      .createOrReplaceTempView("doc_stats")
    TextOps.qMixtureSample(spark, dir)
      .createOrReplaceTempView("corpus_mixture")
    TextOps.qShardShuffle(spark, dir)
      .createOrReplaceTempView("corpus_shuffle")
    // round-6 corpus-model surface: the quality signals a SQL-first
    // selection query joins against (classifier score + LM nll +
    // repetition in ONE per-doc table), the vocabulary head, the
    // rewritten corpus, the semantic-dedup verdict and the trained
    // tokenizer merges
    CorpusOps.qVocab(spark, dir)
      .createOrReplaceTempView("corpus_vocab")
    val docs = graft.Tables(spark, dir, "documents")
    CorpusOps.classify(docs)
      .join(CorpusOps.qLmScore(spark, dir), Seq("doc_id"))
      .join(TextOps.qRepRatio(spark, dir), Seq("doc_id"))
      .createOrReplaceTempView("doc_scores")
    CorpusOps.qBoilerplate(spark, dir)
      .createOrReplaceTempView("corpus_boilerplate")
    graft.ext.SemDedup.qSemDedup(spark, dir)
      .createOrReplaceTempView("semantic_dedup")
    graft.ext.Bpe.qBpeTrain(spark, dir)
      .createOrReplaceTempView("bpe_merges")
  }
}
