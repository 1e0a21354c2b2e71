package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.CorpusOps
import graft.llm.CorpusOps.DsirModel
import graft.llm.TextDedup

/** Streaming twin of [[graft.llm.CorpusOps.dsirWeights]]: score every
  * arriving document's DSIR importance statistics against a STATIC
  * pre-trained bucket model ([[graft.llm.CorpusOps.dsirTrain]]) — the
  * deployment shape (Xie et al. 2023 §3 trains the hashed-n-gram
  * distributions once on the target + a raw sample, then scores the full
  * pool in one pass; here the pool streams past the model).
  *
  * Plan: tokenize → gram explode (explode_outer, so an empty doc still
  * emits its zero row) → bucket → stream-static LEFT join against the
  * bucket-count relation (stateless — the model side is a bounded
  * ≤ 16^hexChars-row static relation) → ONE per-doc updating
  * aggregation. The batch operator's per-(doc, bucket) pre-aggregation
  * is deliberately absent, exactly as in [[LmScoreStream]]: chaining two
  * streaming aggregations is not expressible in update mode, and the
  * per-occurrence join looks up the same counts. Output columns match
  * the batch operator (the `doc_dsir_md5` oracle's integer surface +
  * `logw`), and because the aggregation is incremental the result stays
  * correct even if a source splits one document's gram rows across
  * micro-batches (the `doc_dsir_stream_replay` oracle feeds whole docs
  * per chunk, so it exercises the across-docs update path; the
  * within-doc straddle path is the same incremental fold).
  *
  * State: one aggregation row per document seen — bounded by the
  * DISTINCT docs in flight; an unbounded-id production pipeline uses
  * [[dsirScoreStreamWindowed]], the event-time-watermarked form whose
  * per-doc state EVICTS (`doc_dsir_windowed_stream_replay` pins it
  * against the same batch mirror).
  */
object DsirScoreStream {

  def dsirScoreStream(stream: DataFrame, textCol: String, idCol: String,
                      model: DsirModel): DataFrame = {
    val j = gramJoin(stream.select(col(idCol).as("doc_id"),
      TextDedup.tokenize(col(textCol)).as("toks")), model)
    j.groupBy("doc_id").agg(dsirAggs(model).head, dsirAggs(model).tail: _*)
  }

  /** WATERMARK-BOUNDED form of [[dsirScoreStream]]: the per-doc
    * aggregation keyed by (event-time window, doc) under a `tsCol`
    * watermark, so windows below the watermark evict their state —
    * bounded by the watermark horizon, not the docs ever seen. Completed
    * docs score identically to the unwindowed form when each document's
    * rows carry one event time (the window key is then constant within
    * the doc); see [[LmScoreStream.lmScoreStreamWindowed]] for the full
    * contract. Output adds the `window` struct column.
    */
  def dsirScoreStreamWindowed(stream: DataFrame, textCol: String,
                              idCol: String, tsCol: String, model: DsirModel,
                              windowDur: String,
                              watermarkDelay: String): DataFrame = {
    val j = gramJoin(stream.select(col(idCol).as("doc_id"),
        col(tsCol).as("__ts"),
        TextDedup.tokenize(col(textCol)).as("toks"))
      .withWatermark("__ts", watermarkDelay), model, carryTs = true)
    j.groupBy(window(col("__ts"), windowDur), col("doc_id"))
      .agg(dsirAggs(model).head, dsirAggs(model).tail: _*)
  }

  /** gram explode → bucket → stream-static LEFT join against the bounded
    * bucket-count relation; `carryTs` threads the event-time column
    * through for the windowed form.
    */
  private def gramJoin(toks: DataFrame, model: DsirModel,
                       carryTs: Boolean = false): DataFrame = {
    val carry = if (carryTs) Seq(col("doc_id"), col("__ts"))
                else Seq(col("doc_id"))
    val d = toks
      .select(carry :+
        explode_outer(CorpusOps.dsirGrams(col("toks"), model.gramNs))
          .as("gram"): _*)
      .withColumn("bucket",
        CorpusOps.dsirBucket(col("gram"), model.hexChars, model.md5Family))
    d.join(model.buckets, Seq("bucket"), "left")
      .select(carry ++ Seq(col("gram"),
        coalesce(col("c_tgt"), lit(0L)).as("c_tgt"),
        coalesce(col("c_raw"), lit(0L)).as("c_raw")): _*)
  }

  // the null-gram sentinel of an empty doc contributes to no sum
  private def dsirAggs(model: DsirModel) = {
    val logConst = math.log(
      (model.totRaw + model.alpha * model.nBuckets) /
        (model.totTgt + model.alpha * model.nBuckets))
    val pos = col("gram").isNotNull
    Seq(
      sum(when(pos, lit(1L)).otherwise(lit(0L))).as("n_grams"),
      sum(when(pos && col("c_tgt") === 0L, lit(1L)).otherwise(lit(0L)))
        .as("oov_tgt"),
      sum(when(pos && col("c_raw") === 0L, lit(1L)).otherwise(lit(0L)))
        .as("oov_raw"),
      sum(when(pos, col("c_tgt")).otherwise(lit(0L))).as("hit_tgt"),
      sum(when(pos, col("c_raw")).otherwise(lit(0L))).as("hit_raw"),
      (sum(when(pos,
        log(col("c_tgt").cast("double") + lit(model.alpha)) -
          log(col("c_raw").cast("double") + lit(model.alpha)))
        .otherwise(lit(0.0))) +
        sum(when(pos, lit(1L)).otherwise(lit(0L))).cast("double") *
          lit(logConst)).as("logw"))
  }
}
