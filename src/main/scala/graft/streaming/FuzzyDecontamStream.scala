package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.llm.TextDedup

/** STREAMING fuzzy-contamination detection — the online form of
  * `TextDedup.crossMinhashPairs`: train documents STREAM in; the eval
  * corpus is STATIC (eval sets are fixed at pipeline-build time and tiny
  * next to the train firehose), pre-banded once into a (band, bh, id,
  * shingle-set) index; each arriving doc computes its own MinHash bands
  * as pure expressions and joins the static index — Spark's native
  * STREAM-STATIC join, which is STATELESS on the stream side (no
  * watermark-keyed join state, no state store growth with corpus size).
  * Verified hits (exact Jaccard ≥ threshold) emit as a contamination log
  * (id_a = train, id_b = eval, jaccard) — the relation a pipeline
  * quarantines or anti-joins downstream.
  *
  * Pair-level dedup is WATERMARK-BOUNDED: a pair matching in m bands
  * emits m rows, but all m arise from the SAME input row (one arrival's
  * band array, exploded and joined within one micro-batch) — so
  * duplicates only ever co-occur inside a single micro-batch, and
  * `dropDuplicatesWithinWatermark` over a batch-time event-time column
  * (`current_timestamp()` is the micro-batch timestamp — constant within
  * a batch, monotone across batches) removes them exactly while RocksDB
  * evicts pair state older than `dedupRetention` — the state is bounded
  * by the pairs emitted inside the retention window, not the lifetime
  * log. The one divergence: a train doc REDELIVERED (at-least-once
  * source) more than `dedupRetention` after its first delivery re-emits
  * its pairs; the downstream anti-join is idempotent to that, which is
  * the operator's sink contract. Callers that COUNT or AGGREGATE the
  * log (rather than anti-join it) inherit that weakening — under an
  * at-least-once source their tallies can include retention-window
  * re-emissions; such callers should dedup on (id_a, id_b) themselves
  * or consume the anti-joined relation.
  *
  * Cap semantics vs the batch twin: online, the stream side's bucket
  * occupancy is unknowable, so `maxBucket` caps the STATIC EVAL side
  * only (a band bucket with more than maxBucket eval members is dropped
  * from the index). The batch operator caps the combined occupancy;
  * when neither cap binds the two admitted sets are identical
  * (`doc_fuzzy_pairs_stream_replay` shares the batch mirror at exactly
  * that geometry), and the divergence when a cap DOES bind is pinned at
  * a cap-binding geometry by the `doc_fuzzy_pairs_capped_md5` (batch,
  * combined-occupancy policy) and `doc_fuzzy_pairs_capped_stream_replay`
  * (this operator, eval-side-only policy) oracle rows — each policy
  * hash-matched against its own DuckDB mirror.
  *
  * 100 TB shape: the eval index is a small static relation (broadcast
  * by Catalyst when under the threshold), the stream side is a pure
  * projection + join per micro-batch, and the only stream-side state is
  * the watermark-bounded pair window — the right decontamination
  * topology for a continuous ingestion pipeline.
  */
object FuzzyDecontamStream {

  /** [[contaminationLogStats]] holder: the log plus the persisted eval
    * index, which the CALLER must release after the stream finishes
    * (`unpersist()`) — the `PairsWithStats` cached-relation contract.
    * The persist is load-bearing across micro-batches (each batch
    * re-executes the static side), so the operator cannot release it
    * itself.
    */
  final case class ContaminationStream(log: DataFrame, cached: Seq[DataFrame]) {
    def unpersist(): Unit = cached.foreach(_.unpersist(false))
  }

  /** One-shot convenience form of [[contaminationLogStats]]: the persisted
    * eval index is left for ContextCleaner GC. Harnesses and repeated
    * invocations (sweeps, benches) should use the Stats form and
    * `unpersist()` after the stream finishes.
    */
  def contaminationLog(stream: DataFrame, evalStatic: DataFrame,
                       idCol: String, textCol: String, shingleN: Int = 3,
                       bands: Int = 4, rowsPerBand: Int = 2,
                       threshold: Double = 0.2, maxBucket: Int = 1000,
                       dedupRetention: String = "10 minutes"): DataFrame =
    contaminationLogStats(stream, evalStatic, idCol, textCol, shingleN, bands,
      rowsPerBand, threshold, maxBucket, dedupRetention).log

  /** DuckDB-checkable md5 twin of [[contaminationLog]]. */
  def contaminationLogMd5(stream: DataFrame, evalStatic: DataFrame,
                          idCol: String, textCol: String, shingleN: Int = 3,
                          bands: Int = 4, rowsPerBand: Int = 2,
                          threshold: Double = 0.2, maxBucket: Int = 1000,
                          dedupRetention: String = "10 minutes"): DataFrame =
    contaminationLogStatsMd5(stream, evalStatic, idCol, textCol, shingleN,
      bands, rowsPerBand, threshold, maxBucket, dedupRetention).log

  def contaminationLogStats(stream: DataFrame, evalStatic: DataFrame,
                            idCol: String, textCol: String, shingleN: Int = 3,
                            bands: Int = 4, rowsPerBand: Int = 2,
                            threshold: Double = 0.2, maxBucket: Int = 1000,
                            dedupRetention: String = "10 minutes"): ContaminationStream =
    contaminationLogImpl(stream, evalStatic, idCol, textCol, shingleN, bands,
      rowsPerBand, threshold, maxBucket, dedupRetention, TextDedup.XxHash)

  def contaminationLogStatsMd5(stream: DataFrame, evalStatic: DataFrame,
                               idCol: String, textCol: String, shingleN: Int = 3,
                               bands: Int = 4, rowsPerBand: Int = 2,
                               threshold: Double = 0.2, maxBucket: Int = 1000,
                               dedupRetention: String = "10 minutes"): ContaminationStream =
    contaminationLogImpl(stream, evalStatic, idCol, textCol, shingleN, bands,
      rowsPerBand, threshold, maxBucket, dedupRetention, TextDedup.Md5Hash)

  private def contaminationLogImpl(stream: DataFrame, evalStatic: DataFrame,
                                   idCol: String, textCol: String,
                                   shingleN: Int, bands: Int, rowsPerBand: Int,
                                   threshold: Double, maxBucket: Int,
                                   dedupRetention: String,
                                   fam: TextDedup.HashFamily): ContaminationStream = {
    val k = bands * rowsPerBand
    def prep(df: DataFrame) = df
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("toks", TextDedup.tokenize(col("text")))
      .withColumn("sh", array_distinct(TextDedup.shingleHashes(col("toks"), shingleN, fam)))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", TextDedup.minhashFromBaseHashes(col("sh"), k, fam))
    def band(withSig: DataFrame) = withSig.select(
      col("id"), col("sh"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          fam.band(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand), b).as("bh"))): _*))
        .as("bb"))
      .select(col("id"), col("sh"), col("bb.band"), col("bb.bh"))
    // static eval index: banded once, eval-side bucket cap applied at
    // index-build time (see the cap-semantics note above)
    val evalBanded = band(prep(evalStatic))
    val okBuckets = evalBanded.groupBy("band", "bh").count()
      .filter(col("count") <= maxBucket).select("band", "bh")
    val evalIdx = evalBanded.join(okBuckets, Seq("band", "bh"))
      .select(col("band"), col("bh"), col("id").as("id_b"), col("sh").as("sh_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // stream side: pure projections + the stream-static join. The
    // event-time column is the MICRO-BATCH timestamp (constant within a
    // batch, monotone across batches), which is exactly the granularity
    // the pair dedup needs — see the watermark note in the scaladoc.
    val log = band(prep(stream))
      .select(col("id").as("id_a"), col("sh").as("sh_a"), col("band"), col("bh"),
        current_timestamp().as("__arrival_ts"))
      .withWatermark("__arrival_ts", dedupRetention)
      .join(evalIdx, Seq("band", "bh"))
      .select(col("id_a"), col("id_b"),
        TextDedup.jaccardDistinct(col("sh_a"), col("sh_b")).as("jaccard"),
        col("__arrival_ts"))
      .filter(col("jaccard") >= threshold)
      // a pair matching in m bands emits m times without this; all m
      // co-occur in one micro-batch (one arrival's exploded bands), so
      // the within-watermark dedup is exact while its state stays
      // bounded by the retention window
      .dropDuplicatesWithinWatermark("id_a", "id_b")
      .select("id_a", "id_b", "jaccard")
    ContaminationStream(log, cached = Seq(evalIdx))
  }
}
