package graft.llm

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse keyword retrieval over a document corpus — Okapi BM25
  * (Robertson & Zaragoza 2009, "The Probabilistic Relevance Framework:
  * BM25 and Beyond"), the lexical complement to the dense ANN tier
  * (`Similarity`): hybrid retrieval pipelines, retrieval-based
  * decontamination (find the training docs an eval query can surface),
  * and corpus QA all need it.
  *
  * Design for 100 TB:
  *  - The index build is ONE (term, doc)-keyed map-side-combined
  *    aggregation over the exploded token stream; document frequency and
  *    the length table are bounded by |vocab| and |docs|.
  *  - Query evaluation never shuffles the postings relation: query terms
  *    (with their idf) are a tiny relation that `broadcast()`-joins into
  *    the postings scan, followed by one (query, doc)-keyed fold. k-way
  *    ranking is a per-query window over the fold output.
  *  - `maxDfFrac` prunes stopword-grade terms at index build (df above
  *    the fraction): BM25 gives them ~zero idf anyway, and they are
  *    exactly the Zipf-head keys that would skew the probe join.
  *
  * Verification follows the `doc_lm_ppl`/`doc_dsir` policy: the hashed
  * oracle surface is the INTEGER join statistics per (query, doc) —
  * matched-term count, summed tf, summed tf·df, document length — which
  * pin tokenize, the postings/df/length relations, the pruning rule, and
  * the probe joins; the ln-based idf, the BM25 score fold, and the
  * ranking are pinned by an independent plain-Scala re-derivation in
  * `TextSearchSpec` (doubles are not correctly-rounded across engines).
  */
object TextSearch {

  /** The deployable BM25 index relations: postings (`tok`, `doc_id`,
    * `tf`, `dl` — doc length denormalized in, so scoring needs no extra
    * join), document frequency (`tok`, `df_t`) AFTER `maxDfFrac` pruning,
    * plus the corpus scalars.
    */
  final case class Bm25Index(postings: DataFrame, dfRel: DataFrame,
                             nDocs: Long, avgDl: Double, maxDfFrac: Double)

  /** Build the index: tokenize → explode → one (term, doc) count, the
    * doc-length relation folded in, df per term, stopword-grade terms
    * (df > maxDfFrac·N) dropped from BOTH relations.
    */
  def bm25Index(corpus: DataFrame, idCol: String, textCol: String,
                maxDfFrac: Double = 0.5): Bm25Index = {
    require(maxDfFrac > 0 && maxDfFrac <= 1,
      s"maxDfFrac must be in (0, 1], got $maxDfFrac")
    val d = corpus.select(col(idCol).as("doc_id"),
        TextDedup.tokenize(col(textCol)).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"), col("toks"))
    val stats = d.agg(count(lit(1)), coalesce(avg(col("dl")), lit(0.0))).head()
    val (nDocs, avgDl) = (stats.getLong(0), stats.getDouble(1))
    val post0 = d.select(col("doc_id"), col("dl"),
        explode(col("toks")).as("tok"))
      .groupBy("tok", "doc_id", "dl").agg(count(lit(1)).as("tf"))
    // MATERIALIZE the vocab-bounded df relation (executor-resident
    // localCheckpoint): it is read by every query batch AND feeds the
    // postings semi-join, and without it each use re-runs the full
    // postings build through the lazy lineage. The postings relation
    // itself stays lazy — it is corpus-sized, and a serving deployment
    // persists it once explicitly (bucketed by term) rather than per
    // index handle.
    val dfAll = post0.groupBy("tok").agg(count(lit(1)).as("df_t"))
      .filter(col("df_t") <= lit(maxDfFrac * nDocs))
      .localCheckpoint(true)
    val postings = post0.join(dfAll.select("tok"), Seq("tok"), "left_semi")
    Bm25Index(postings, dfAll, nDocs, avgDl, maxDfFrac)
  }

  /** Distinct query terms: (query_id, tok). BM25's standard form scores
    * distinct terms (Lucene's practice — query term multiplicity is a
    * boost, not a semantic, and dropping it keeps the surface integer).
    */
  private def queryTerms(queries: DataFrame, qidCol: String,
                         qtextCol: String): DataFrame =
    queries.select(col(qidCol).as("query_id"),
        TextDedup.tokenize(col(qtextCol)).as("toks"))
      .select(col("query_id"), explode(array_distinct(col("toks"))).as("tok"))

  /** INTEGER join statistics per (query, candidate doc) — the
    * `doc_bm25_md5`-style oracle surface: `n_match` distinct matched
    * terms, `tf_sum` = Σ tf, `tfdf_sum` = Σ tf·df_t (pins the df
    * relation through the probe join), and the candidate's `dl`.
    * Candidates = docs sharing ≥ 1 surviving term with the query.
    */
  def bm25Stats(queries: DataFrame, qidCol: String, qtextCol: String,
                index: Bm25Index,
                broadcastQueries: Boolean = true): DataFrame = {
    val qt0 = queryTerms(queries, qidCol, qtextCol)
      .join(index.dfRel, Seq("tok")) // inner: unseen/pruned terms score 0
    val qt = if (broadcastQueries) broadcast(qt0) else qt0
    qt.join(index.postings, Seq("tok"))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_match"),
        sum(col("tf")).as("tf_sum"),
        sum(col("tf") * col("df_t")).as("tfdf_sum"),
        first(col("dl")).cast("long").as("dl"))
  }

  /** Top-k BM25 retrieval: score = Σ_t idf(t) · tf·(k1+1) /
    * (tf + k1·(1 − b + b·dl/avgdl)), idf = ln(1 + (N − df + 0.5)/(df +
    * 0.5)) (the Lucene/standard non-negative form); ties broken by
    * doc_id. The per-query candidate fold is one aggregation; ranking is
    * a per-query window (k small ⇒ the window input is the candidate
    * relation, already collapsed to one row per (query, doc)).
    */
  def bm25TopK(queries: DataFrame, qidCol: String, qtextCol: String,
               index: Bm25Index, k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               broadcastQueries: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(k1 >= 0, s"k1 must be non-negative, got $k1")
    require(b >= 0 && b <= 1, s"b must be in [0, 1], got $b")
    // broadcastQueries = true is the interactive/eval-probe regime (query
    // relation ≪ postings). A corpus-sized query batch (millions of
    // queries) passes false: the probe becomes a term-keyed shuffle join
    // whose postings side is already (tok, doc, tf, dl) after pruning —
    // the decontaminate(broadcastEval) contract. Identical output.
    val qt0 = queryTerms(queries, qidCol, qtextCol)
      .join(index.dfRel, Seq("tok"))
      .withColumn("idf",
        log(lit(1.0) + (lit(index.nDocs.toDouble) - col("df_t") + lit(0.5)) /
          (col("df_t") + lit(0.5))))
    val qt = if (broadcastQueries) broadcast(qt0) else qt0
    val scored = qt.join(index.postings, Seq("tok"))
      .withColumn("norm",
        col("tf").cast("double") * lit(k1 + 1.0) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(index.avgDl))))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("idf") * col("norm")).as("score"))
    scored.withColumn("rank",
        row_number().over(Window.partitionBy("query_id")
          .orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "doc_id", "score", "rank")
  }
}
