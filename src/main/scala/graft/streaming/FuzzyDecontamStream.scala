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
  * watermark, no state store growth with corpus size; the only stateful
  * operator is the pair-level `dropDuplicates`, bounded by the emitted
  * pair count, the same shape as `everStream`). Verified hits
  * (exact Jaccard ≥ threshold) emit as a contamination log
  * (id_a = train, id_b = eval, jaccard) — the relation a pipeline
  * quarantines or anti-joins downstream.
  *
  * Cap semantics vs the batch twin: online, the stream side's bucket
  * occupancy is unknowable, so `maxBucket` caps the STATIC EVAL side
  * only (a band bucket with more than maxBucket eval members is dropped
  * from the index). The batch operator caps the combined occupancy;
  * when neither cap binds — the verified regime for the oracle rows —
  * the two admitted sets are identical.
  *
  * 100 TB shape: the eval index is a small static relation (broadcast
  * by Catalyst when under the threshold), the stream side is a pure
  * projection + join per micro-batch, and nothing on the stream side
  * accumulates — the right decontamination topology for a continuous
  * ingestion pipeline.
  */
object FuzzyDecontamStream {

  def contaminationLog(stream: DataFrame, evalStatic: DataFrame,
                       idCol: String, textCol: String, shingleN: Int = 3,
                       bands: Int = 4, rowsPerBand: Int = 2,
                       threshold: Double = 0.2, maxBucket: Int = 1000): DataFrame =
    contaminationLogImpl(stream, evalStatic, idCol, textCol, shingleN, bands,
      rowsPerBand, threshold, maxBucket, TextDedup.XxHash)

  /** DuckDB-checkable md5 twin of [[contaminationLog]]. */
  def contaminationLogMd5(stream: DataFrame, evalStatic: DataFrame,
                          idCol: String, textCol: String, shingleN: Int = 3,
                          bands: Int = 4, rowsPerBand: Int = 2,
                          threshold: Double = 0.2, maxBucket: Int = 1000): DataFrame =
    contaminationLogImpl(stream, evalStatic, idCol, textCol, shingleN, bands,
      rowsPerBand, threshold, maxBucket, TextDedup.Md5Hash)

  private def contaminationLogImpl(stream: DataFrame, evalStatic: DataFrame,
                                   idCol: String, textCol: String,
                                   shingleN: Int, bands: Int, rowsPerBand: Int,
                                   threshold: Double, maxBucket: Int,
                                   fam: TextDedup.HashFamily): DataFrame = {
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
    // stream side: pure projections + the stream-static join
    band(prep(stream))
      .select(col("id").as("id_a"), col("sh").as("sh_a"), col("band"), col("bh"))
      .join(evalIdx, Seq("band", "bh"))
      .select(col("id_a"), col("id_b"),
        TextDedup.jaccardDistinct(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      // a pair matching in m bands emits m times without this; pair-keyed
      // built-in dedup state, bounded by the contamination log size
      .dropDuplicates("id_a", "id_b")
  }
}
