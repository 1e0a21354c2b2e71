package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.CorpusOps
import graft.llm.CorpusOps.QualityClfModel
import graft.llm.TextDedup

/** Streaming twin of [[graft.llm.CorpusOps.qualityClfScore]]: score
  * every arriving document against a STATIC pre-trained quality
  * classifier ([[graft.llm.CorpusOps.qualityClfTrain]]) — the
  * deployment shape of the fastText-style filter (train the hashed
  * n-gram NB once on the labeled split, score the crawl as it streams
  * past). Identical structure to [[DsirScoreStream]]: gram
  * explode_outer → bucket → stream-static LEFT join against the bounded
  * bucket relation (stateless — the model side is static and ≤
  * 16^hexChars rows) → one per-doc updating aggregation. Output columns
  * match the batch operator; `pred` is derived from the incremental
  * score, so a doc's verdict is final once its last gram row lands.
  * State: one aggregation row per in-flight doc (the DsirScoreStream
  * bound; a windowed form would evict like `dsirScoreStreamWindowed` —
  * same construction, omitted until a pipeline needs it).
  */
object QualityClfStream {

  def qualityClfScoreStream(stream: DataFrame, textCol: String,
                            idCol: String, model: QualityClfModel): DataFrame = {
    require(model.nPosDocs > 0 && model.nNegDocs > 0,
      "model must be trained on non-empty classes")
    val logConst = math.log(
      (model.totNeg + model.alpha * model.nBuckets) /
        (model.totPos + model.alpha * model.nBuckets))
    val logPrior = math.log(model.nPosDocs.toDouble / model.nNegDocs)
    val d = stream
      .select(col(idCol).as("doc_id"),
        TextDedup.tokenize(col(textCol)).as("toks"))
      .select(col("doc_id"),
        explode_outer(CorpusOps.dsirGrams(col("toks"), model.gramNs))
          .as("gram"))
      .withColumn("bucket",
        CorpusOps.dsirBucket(col("gram"), model.hexChars, model.md5Family))
      .join(model.buckets, Seq("bucket"), "left")
      .select(col("doc_id"), col("gram"),
        coalesce(col("c_pos"), lit(0L)).as("c_pos"),
        coalesce(col("c_neg"), lit(0L)).as("c_neg"))
    val pos = col("gram").isNotNull
    d.groupBy("doc_id").agg(
        sum(when(pos, lit(1L)).otherwise(lit(0L))).as("n_grams"),
        sum(when(pos && col("c_pos") === 0L, lit(1L)).otherwise(lit(0L)))
          .as("oov_pos"),
        sum(when(pos && col("c_neg") === 0L, lit(1L)).otherwise(lit(0L)))
          .as("oov_neg"),
        sum(when(pos, col("c_pos")).otherwise(lit(0L))).as("hit_pos"),
        sum(when(pos, col("c_neg")).otherwise(lit(0L))).as("hit_neg"),
        (lit(logPrior) +
          sum(when(pos,
            log(col("c_pos").cast("double") + lit(model.alpha)) -
              log(col("c_neg").cast("double") + lit(model.alpha)))
            .otherwise(lit(0.0))) +
          sum(when(pos, lit(1L)).otherwise(lit(0L))).cast("double") *
            lit(logConst)).as("score"))
      .withColumn("pred", col("score") > 0)
  }
}
