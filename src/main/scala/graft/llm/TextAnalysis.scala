package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis columns for training-data curation: language ID
  * (stopword/char-class heuristic), quality scoring, token counting,
  * and document fingerprinting. All pure Catalyst expressions — one
  * projection pass over the corpus, no shuffle, fully codegen.
  */
object TextAnalysis {

  private[graft] val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "his", "her", "are"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "von", "sie", "ist", "des", "sich", "mit", "dem", "ein", "war"),
    "fr" -> Seq("le", "la", "les", "et", "est", "des", "une", "dans", "que", "pour", "qui", "sur", "pas", "au"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "una", "por", "con", "para", "del", "se", "las", "como"),
  )

  /** Count of tokens appearing in a fixed word list (multiset count). */
  private def hitsSafe(toks: Column, words: Seq[String]): Column =
    aggregate(toks, lit(0),
      (acc, t) => acc + when(array_contains(typedLit(words), t), 1).otherwise(0))

  /** Fraction of CJK characters in the raw text. */
  def cjkRatio(text: Column): Column =
    when(length(text) === 0, 0.0d)
      .otherwise(length(regexp_replace(text, "[^\\p{script=Han}]", "")).cast("double") / length(text))

  /** Heuristic language ID over {en, de, fr, es, zh}: CJK ratio decides zh;
    * otherwise the language with the most stopword hits (ties → en).
    * Returns a `pred_lang` string column.
    */
  def langId(text: Column): Column = {
    // One token pass computing ALL per-language counts into an int array,
    // then argmax = first index of the max. The previous form folded a
    // when-chain over four per-language `aggregate` scores; each fold
    // step nests the running best TWICE (condition + else), so the score
    // expressions — a full tokenize + token scan each — were duplicated
    // up to ~8× in the final tree (measured 3.67 s at sf0.1 under the
    // payload-forcing bench; this form: one count pass referenced twice).
    // Semantics preserved exactly: the fold started from ("en", -1) with
    // a strict `>`, which is first-max over the alphabetical language
    // order — identical to array_position's first-occurrence rule. One
    // deliberate divergence from the fold: on NULL text the fold's null
    // comparisons kept the 'en' seed, while the argmax propagates NULL
    // through counts/array_max/element_at — the coalesce below restores
    // the fold's 'en' answer for NULL input.
    val langs = stopwords.keys.toSeq.sorted
    val toks = TextDedup.tokenize(text)
    val counts = aggregate(toks, array(langs.map(_ => lit(0)): _*),
      (acc, t) => array(langs.zipWithIndex.map { case (l, i) =>
        element_at(acc, i + 1) +
          when(array_contains(typedLit(stopwords(l)), t), 1).otherwise(0)
      }: _*))
    val pred = element_at(typedLit(langs),
      array_position(counts, array_max(counts)).cast("int"))
    when(cjkRatio(text) > 0.25, "zh").otherwise(coalesce(pred, lit("en")))
  }

  /** Quality features + a composite score in [0,1]: length band, alpha
    * ratio, punctuation ratio, stopword ratio, mean token length band —
    * the standard cheap pre-filters before expensive model scoring.
    */
  def qualityColumns(df0: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    // tokens staged as an attribute: three consumers below (count,
    // stopword hits, mean length) would each re-run the tokenize regexp
    // from an inline expression
    val df = df0.withColumn("__q_toks", TextDedup.tokenize(t))
    val toks = col("__q_toks")
    val nTok = size(toks)
    val alpha = length(regexp_replace(t, "[^\\p{L}]", "")).cast("double")
    val punct = length(regexp_replace(t, "[\\p{L}\\p{Nd}\\s]", "")).cast("double")
    val allStops = stopwords.values.flatten.toSeq.distinct
    val stopHits = hitsSafe(toks, allStops).cast("double")
    df.withColumn("n_tokens", nTok)
      .withColumn("alpha_ratio", when(length(t) === 0, 0.0d).otherwise(alpha / length(t)))
      .withColumn("punct_ratio", when(length(t) === 0, 0.0d).otherwise(punct / length(t)))
      .withColumn("stopword_ratio", when(nTok === 0, 0.0d).otherwise(stopHits / nTok))
      .withColumn("mean_token_len",
        when(nTok === 0, 0.0d)
          .otherwise(aggregate(toks, lit(0L), (a, x) => a + length(x)).cast("double") / nTok))
      .withColumn("quality_score",
        least(lit(1.0d),
          (least(col("n_tokens").cast("double") / 20, lit(1.0d)) * 0.3
            + col("alpha_ratio") * 0.3
            + (lit(1.0d) - least(col("punct_ratio") * 4, lit(1.0d))) * 0.2
            + least(col("stopword_ratio") * 3, lit(1.0d)) * 0.2)))
      .drop("__q_toks")
  }

  /** Token counts: whitespace tokens and a BPE-ish segmentation count
    * (word pieces + standalone punctuation — `\w+|[^\w\s]` matches).
    */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("ws_tokens", size(array_remove(split(col(textCol), " "), "")))
      .withColumn("bpeish_tokens", regexp_count(col(textCol), lit("\\w+|[^\\w\\s]")))

  /** Document fingerprint: minimum 64-bit hash over character 8-grams of
    * the normalized text (winnowing-lite) plus a full-text hash. Two docs
    * sharing the min-gram fingerprint are near-identical candidates.
    */
  /** Cross-engine-checkable fingerprint variant: md5 instead of xxhash64
    * (slower; exists so the fingerprint semantics are oracle-verifiable —
    * the xxhash64 `fingerprint` is the production path).
    */
  def fingerprintMd5(df: DataFrame, textCol: String): DataFrame = {
    val norm = trim(regexp_replace(lower(col(textCol)), "[^\\p{L}\\p{Nd}]+", " "))
    df.withColumn("__norm", norm)
      .withColumn("fp_min_gram_md5",
        array_min(transform(
          sequence(lit(1), greatest(length(col("__norm")) - 7, lit(1))),
          i => md5(col("__norm").substr(i, lit(8))))))
      .withColumn("fp_full_md5", md5(col("__norm")))
      .drop("__norm")
  }

  def fingerprint(df: DataFrame, textCol: String): DataFrame = {
    val norm = trim(regexp_replace(lower(col(textCol)), "[^\\p{L}\\p{Nd}]+", " "))
    df.withColumn("__norm", norm)
      // fused one-pass native expression (graft.functions.XxMinCharGramHash)
      // — same values as the HOF form
      // array_min(transform(sequence(1, len-7), i => xxhash64(substr(i, 8))))
      // without the per-window substring + hash-array allocation (equality
      // pinned in NativeExprSpec; measured 1.99 s → see BASELINE round-9)
      .withColumn("fp_min_gram",
        org.apache.spark.sql.GraftColumnBridge.column(
          graft.functions.XxMinCharGramHash(
            org.apache.spark.sql.GraftColumnBridge.expression(col("__norm")), 8)))
      .withColumn("fp_full", xxhash64(col("__norm")))
      .drop("__norm")
  }
}
