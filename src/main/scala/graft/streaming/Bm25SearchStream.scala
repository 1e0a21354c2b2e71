package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.TextDedup
import graft.llm.TextSearch.Bm25Index

/** Streaming twin of [[graft.llm.TextSearch.bm25Stats]]: arriving
  * QUERIES retrieve against a STATIC pre-built BM25 index — the search
  * deployment shape (index built offline from the corpus, query stream
  * scored against it; for training-data work, the stream is eval
  * prompts probing which training docs they can surface).
  *
  * Plan: tokenize → distinct-term explode → stream-static INNER joins
  * against the df and postings relations (stateless — the stream side
  * holds no index state) → ONE updating (query, doc) aggregation
  * emitting the same integer statistics as the batch operator, so the
  * `doc_bm25_stream_replay` oracle row shares the batch DuckDB mirror.
  *
  * State: one aggregation row per live (query, candidate) pair;
  * [[bm25StatsStreamWindowed]] is the event-time-watermarked form whose
  * per-(query, doc) state EVICTS (`doc_bm25_windowed_stream_replay`
  * pins it against the same batch mirror). Ranking (`bm25TopK`'s
  * window) is the consumer's side of the contract here — update-mode
  * emissions carry the fold, and a downstream batch rank (or the
  * AnnStream-style merge stage) finishes top-k where needed.
  */
object Bm25SearchStream {

  def bm25StatsStream(stream: DataFrame, qtextCol: String, qidCol: String,
                      index: Bm25Index): DataFrame = {
    val qt = stream.select(col(qidCol).as("query_id"),
        TextDedup.tokenize(col(qtextCol)).as("toks"))
      .select(col("query_id"), explode(array_distinct(col("toks"))).as("tok"))
      .join(index.dfRel, Seq("tok"))
    qt.join(index.postings, Seq("tok"))
      .groupBy("query_id", "doc_id")
      .agg(bm25Aggs.head, bm25Aggs.tail: _*)
  }

  /** WATERMARK-BOUNDED form of [[bm25StatsStream]]: the (query, doc)
    * aggregation keyed by (event-time window, query, doc) under a
    * `tsCol` watermark, so a query batch's statistics rows evict once
    * the watermark passes their window — state bounded by the queries
    * in the watermark horizon, not the queries ever seen. Completed
    * queries score identically to the unwindowed form when each query's
    * rows carry one event time; see
    * [[LmScoreStream.lmScoreStreamWindowed]] for the full contract.
    * Output adds the `window` struct column.
    */
  def bm25StatsStreamWindowed(stream: DataFrame, qtextCol: String,
                              qidCol: String, tsCol: String, index: Bm25Index,
                              windowDur: String,
                              watermarkDelay: String): DataFrame = {
    val qt = stream.select(col(qidCol).as("query_id"), col(tsCol).as("__ts"),
        TextDedup.tokenize(col(qtextCol)).as("toks"))
      .withWatermark("__ts", watermarkDelay)
      .select(col("query_id"), col("__ts"),
        explode(array_distinct(col("toks"))).as("tok"))
      .join(index.dfRel, Seq("tok"))
    qt.join(index.postings, Seq("tok"))
      .groupBy(window(col("__ts"), windowDur), col("query_id"), col("doc_id"))
      .agg(bm25Aggs.head, bm25Aggs.tail: _*)
  }

  private def bm25Aggs = Seq(
    count(lit(1)).as("n_match"),
    sum(col("tf")).as("tf_sum"),
    sum(col("tf") * col("df_t")).as("tfdf_sum"),
    first(col("dl")).cast("long").as("dl"))
}
