package graft.llm

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenization (Sennrich et al. 2016,
  * arXiv:1508.07909) as a TRAIN-OFFLINE / DEPLOY-LITERALS model — the
  * same deployment pattern as the PQ codebooks, SemDeDup centroids and
  * LM count models: training is a bounded offline step, the deployed
  * encoder is a pure function of (text, merge table) that runs
  * distributed with zero shuffles. This makes the quota tier's units
  * real: `packSequences` / `mixByTokenBudget` / `tokenBudgetStream`
  * accept a trained tokenizer instead of the `\w+` regex, so budgets
  * and packing offsets are denominated in actual BPE tokens.
  *
  * Every rule is DETERMINISTIC and engine-mirrorable (the DuckDB oracle
  * re-derives training AND encoding from the raw table — no Spark
  * literal reaches the mirror):
  *
  *  - TRAINING SAMPLE: the first `sampleDocs` docs by `idCol`, each
  *    truncated to `sampleChars` CODE POINTS, joined by '\n'.
  *  - TRAINING ROUND: count adjacent token pairs (overlapping
  *    occurrences counted); best pair = max count, ties by code-point
  *    lexicographic (left, then right); stop early when the best count
  *    is < 2; apply = repeated leftmost single merge until absent
  *    (equivalent to left-to-right non-overlapping merge-all, since a
  *    merge can never create a new occurrence of its own pair).
  *  - VOCAB IDS: base tokens = the sample's distinct code points,
  *    sorted, ids 1..B; merge tokens first-wins ids B+1.. in merge
  *    order; tokens outside the vocab encode to 0 (UNK).
  *  - ENCODE: repeatedly apply the merge-table pair with the smallest
  *    rank present anywhere in the sequence, leftmost occurrence, ONE
  *    merge per step, until no pair from the table remains (the
  *    greedy min-rank encoder).
  */
object Bpe {

  /** Deployed model: ordered merge rules + token→id vocabulary. */
  final case class BpeModel(merges: IndexedSeq[(String, String)],
                            tokenIds: Map[String, Int]) extends Serializable {
    def vocabSize: Int = tokenIds.size

    /** pair → merge rank (first occurrence wins), built ONCE per model
      * instance and reused across every encode call — [[encodeString]]
      * sits inside the codegen hot path ([[graft.functions
      * .BpeEncodeExpr]] calls it per row), so an O(|merges|) map
      * rebuild per row would dominate at 65536 merges. @transient +
      * lazy: rebuilt on first use after deserialization on each
      * executor, never shipped.
      */
    @transient lazy val mergeRank: Map[(String, String), Int] = {
      val rank = scala.collection.mutable.HashMap.empty[(String, String), Int]
      merges.zipWithIndex.foreach { case (p, k) =>
        if (!rank.contains(p)) rank(p) = k
      }
      rank.toMap
    }
  }

  /** Code-point lexicographic compare (DuckDB's binary UTF-8 collation
    * — String.compareTo is UTF-16 code-UNIT order, which diverges for
    * non-BMP vs high-BMP comparisons).
    */
  private def cpCompare(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  private def codePointTokens(s: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toArray
  }

  private def takeCodePoints(s: String, n: Int): String = {
    var i = 0; var taken = 0
    while (i < s.length && taken < n) {
      i += Character.charCount(s.codePointAt(i))
      taken += 1
    }
    s.substring(0, i)
  }

  /** Train on a bounded sample of `df` — the one driver-side step.
    * The collect is CONSTANT-SIZE by construction: `sampleDocs` rows ×
    * `sampleChars` code points (defaults: 4 × 240 ≈ 1 KB), the same
    * bounded-model materialization contract as `semDedupCentroids` /
    * `anchorCodebook`. At 100 TB nothing else leaves the executors;
    * the ORDER BY idCol LIMIT n plan is a TakeOrdered, not a sort.
    */
  def train(df: DataFrame, idCol: String, textCol: String, numMerges: Int,
            sampleDocs: Int = 4, sampleChars: Int = 240): BpeModel = {
    require(numMerges >= 0, s"numMerges must be non-negative, got $numMerges")
    require(sampleDocs > 0 && sampleChars > 0,
      s"sample bounds must be positive, got $sampleDocs x $sampleChars")
    // null-text rows are filtered OUT of the sample (not coalesced to
    // ""): the DuckDB mirror's string_agg skips NULLs, so an empty-string
    // stand-in would inject a stray '\n' separator the oracle never sees
    val sample = df.select(col(idCol), col(textCol))
      .filter(col(textCol).isNotNull)
      .orderBy(col(idCol)).limit(sampleDocs)
      .collect() // bounded: sampleDocs rows, truncated below
      .map(r => takeCodePoints(r.getString(1), sampleChars))
      .mkString("\n")
    trainOnSample(sample, numMerges)
  }

  /** DISTRIBUTED trainer — per-doc BPE with per-iteration aggregation
    * (the `lloydRefine` iterative-relation pattern): the training input
    * is a RELATION of (id, first-`sampleChars`-code-points) rows, never
    * a concatenated driver string, so `sampleDocs` can scale far past
    * any single-task bound. Semantics differ from [[train]] in exactly
    * one principled way: the pre-tokenization boundary is the DOCUMENT
    * — adjacent pairs are counted WITHIN docs and summed across them
    * (no '\n' joining, so no cross-doc merges), which is how production
    * BPE treats its word/segment boundaries.
    *
    * Per merge round: one map-side-combined (pair → count) aggregation
    * over the corpus sample + a LIMIT-1 argmax collect (one constant
    * row); the winning merge is applied distributed via a codegen'd
    * `aggregate` fold (left-to-right non-overlapping — equivalent to
    * repeated-leftmost because a merge can never create a new
    * occurrence of its own pair). Ties break by (max count, code-point
    * lex) exactly like [[trainOnSample]] — Spark's UTF8String binary
    * ordering IS code-point order, matching DuckDB's collation. The
    * only driver-side materializations are the per-round 1-row argmax
    * and the final base-token vocabulary (bounded by the sample's
    * distinct code points — a few KB).
    */
  def trainDistributed(df: DataFrame, idCol: String, textCol: String,
                       numMerges: Int, sampleDocs: Int = 64,
                       sampleChars: Int = 240): BpeModel = {
    require(numMerges >= 0, s"numMerges must be non-negative, got $numMerges")
    require(sampleDocs > 0 && sampleChars > 0,
      s"sample bounds must be positive, got $sampleDocs x $sampleChars")
    // (?s). matches exactly one code point (incl. newlines, incl.
    // non-BMP — Java regex '.' consumes a full surrogate pair)
    val sample = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .filter(col("text").isNotNull)
      .orderBy("id").limit(sampleDocs)
      .select(regexp_extract_all(
        substring(col("text"), 1, sampleChars), lit("(?s)."), lit(0)).as("toks"))
    var cur = sample
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var continue = true
    while (continue && round < numMerges) {
      val zipped = arrays_zip(
        slice(col("toks"), lit(1), size(col("toks")) - 1).as("l"),
        slice(col("toks"), lit(2), size(col("toks")) - 1).as("r"))
      val best = cur.filter(size(col("toks")) >= 2)
        .select(explode(zipped).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r")).count()
        .filter(col("count") >= 2)
        .orderBy(desc("count"), col("l"), col("r"))
        .limit(1)
        .collect() // constant: exactly the per-round 1-row argmax
      if (best.isEmpty) continue = false
      else {
        val l = best(0).getString(0); val r = best(0).getString(1)
        merges += ((l, r))
        // left-to-right non-overlapping merge fold, codegen'd: merge the
        // accumulator's last token with the current one when they form
        // (l, r); a merged token can never re-form its own pair, so the
        // plain fold equals repeated-leftmost (see scaladoc)
        val folded = aggregate(col("toks"),
          array().cast("array<string>"),
          (acc, t) => when(
            size(acc) > 0 && element_at(acc, -1) === lit(l) && t === lit(r),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
            .otherwise(concat(acc, array(t))))
        // localCheckpoint per round: without it round k's plan embeds k
        // NESTED aggregate folds and janino compile time dominates the
        // whole trainer (measured 19.7 s at 16 merges); with it every
        // round codegens exactly one fold over materialized rows. LAZY
        // (eager=false): the next round's argmax job materializes it as
        // a side effect — one job per round, not two. The materialized
        // rows are the bounded sample, never the corpus.
        cur = cur.select(folded.as("toks")).localCheckpoint(false)
        round += 1
      }
    }
    // base vocabulary: the sample's distinct code points, sorted — the
    // second (and last) bounded collect, ≤ the sample's distinct-token
    // count (a few KB)
    val base = sample.select(explode(col("toks")).as("t")).distinct()
      .orderBy("t").collect().map(_.getString(0)).toSeq
    assembleModel(base, merges.toSeq)
  }

  /** Parse GPT-2-style `merges.txt` lines into ordered merge rules: one
    * "left right" pair per line, '#'-prefixed header/comment lines and
    * blanks skipped — the standard deployed-artifact format (huggingface
    * tokenizers, openai/gpt-2), so a model trained ANYWHERE plugs into
    * the codegen encoder without retraining. Malformed lines (not
    * exactly two space-separated fields) fail loudly.
    */
  def parseMergesLines(lines: Seq[String]): IndexedSeq[(String, String)] =
    lines.iterator
      .filterNot(l => l.startsWith("#") || l.trim.isEmpty)
      .map { l =>
        val parts = l.split(" ", -1)
        require(parts.length == 2 && parts(0).nonEmpty && parts(1).nonEmpty,
          s"malformed merges line (want 'left right'): '$l'")
        (parts(0), parts(1))
      }.toIndexedSeq

  /** Build a deployable [[BpeModel]] from an EXTERNALLY trained merge
    * table ([[parseMergesLines]] output) + the base-token alphabet —
    * the load-don't-train path: vocab ids follow the same contract as
    * the trainers (base tokens sorted code-point-lex get 1..B, merge
    * products first-wins B+1.. in merge order, 0 = UNK).
    */
  def fromMerges(merges: IndexedSeq[(String, String)],
                 baseTokens: Seq[String]): BpeModel = {
    require(baseTokens.nonEmpty, "baseTokens must be non-empty")
    assembleModel(baseTokens.distinct.sortWith(cpCompare(_, _) < 0), merges)
  }

  /** Shared model assembly: base tokens (pre-sorted) get ids 1..B, merge
    * products first-wins ids B+1.. in merge order.
    */
  private def assembleModel(sortedBase: Seq[String],
                            merges: Seq[(String, String)]): BpeModel = {
    val ids = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    sortedBase.zipWithIndex.foreach { case (t, i) => ids(t) = i + 1 }
    var nid = sortedBase.length + 1
    merges.foreach { case (l, r) =>
      val m = l + r
      if (!ids.contains(m)) { ids(m) = nid; nid += 1 }
    }
    BpeModel(merges.toIndexedSeq, ids.toMap)
  }

  /** The trainer itself (exposed for spec-level known-answer tests). */
  private[graft] def trainOnSample(sample: String, numMerges: Int): BpeModel = {
    var toks = codePointTokens(sample).toBuffer
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var continue = true
    while (continue && round < numMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Int]
      var i = 0
      while (i < toks.length - 1) {
        val p = (toks(i), toks(i + 1))
        counts(p) = counts.getOrElse(p, 0) + 1
        i += 1
      }
      val best = counts.filter(_._2 >= 2)
      if (best.isEmpty) continue = false
      else {
        val (l, r) = best.keysIterator.reduceLeft { (a, b) =>
          val ca = best(a); val cb = best(b)
          if (cb > ca) b
          else if (cb < ca) a
          else {
            val c1 = cpCompare(b._1, a._1)
            if (c1 < 0 || (c1 == 0 && cpCompare(b._2, a._2) < 0)) b else a
          }
        }
        merges += ((l, r))
        // repeated leftmost single merge until absent
        var pos = 0
        while (pos >= 0) {
          pos = -1
          var k = 0
          while (pos < 0 && k < toks.length - 1) {
            if (toks(k) == l && toks(k + 1) == r) pos = k
            k += 1
          }
          if (pos >= 0) {
            toks(pos) = l + r
            toks.remove(pos + 1)
          }
        }
        round += 1
      }
    }
    assembleModel(
      codePointTokens(sample).distinct.sortWith(cpCompare(_, _) < 0).toSeq,
      merges.toSeq)
  }

  /** Greedy min-rank leftmost encode of one string (the deployed
    * function; also the eval of the [[graft.functions.BpeEncodeExpr]]
    * expression). Returns token IDS (0 = UNK).
    */
  def encodeString(text: String, model: BpeModel): Array[Int] = {
    val toks = codePointTokens(text).toBuffer
    val rank = model.mergeRank
    var go = true
    while (go && toks.length > 1) {
      var bestRank = Int.MaxValue
      var bestPos = -1
      var i = 0
      while (i < toks.length - 1) {
        rank.get((toks(i), toks(i + 1))).foreach { rk =>
          if (rk < bestRank) { bestRank = rk; bestPos = i }
        }
        i += 1
      }
      if (bestPos < 0) go = false
      else {
        toks(bestPos) = toks(bestPos) + toks(bestPos + 1)
        toks.remove(bestPos + 1)
      }
    }
    toks.map(t => model.tokenIds.getOrElse(t, 0)).toArray
  }

  /** Column form: array<int> of token ids (null text → null). Runs as a
    * native expression inside whole-stage codegen (the model rides
    * along as a codegen reference object — no UDF, no serialization per
    * row).
    */
  def encode(text: Column, model: BpeModel): Column =
    GraftColumnBridge.column(graft.functions.BpeEncodeExpr(
      GraftColumnBridge.expression(text), model))

  /** Token COUNT under the model — the drop-in replacement for the
    * `\w+|[^\w\s]` regex count in the quota/packing tier.
    */
  def tokenCount(text: Column, model: BpeModel): Column =
    size(encode(text, model))
}
