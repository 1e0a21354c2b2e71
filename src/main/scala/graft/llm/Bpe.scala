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
    val sample = df.select(col(idCol), col(textCol))
      .orderBy(col(idCol)).limit(sampleDocs)
      .collect() // bounded: sampleDocs rows, truncated below
      .map(r => takeCodePoints(Option(r.getString(1)).getOrElse(""), sampleChars))
      .mkString("\n")
    trainOnSample(sample, numMerges)
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
    val base = codePointTokens(sample).distinct.sortWith(cpCompare(_, _) < 0)
    val ids = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    base.zipWithIndex.foreach { case (t, i) => ids(t) = i + 1 }
    var nid = base.length + 1
    merges.foreach { case (l, r) =>
      val m = l + r
      if (!ids.contains(m)) { ids(m) = nid; nid += 1 }
    }
    BpeModel(merges.toIndexedSeq, ids.toMap)
  }

  /** Greedy min-rank leftmost encode of one string (the deployed
    * function; also the eval of the [[graft.functions.BpeEncodeExpr]]
    * expression). Returns token IDS (0 = UNK).
    */
  def encodeString(text: String, model: BpeModel): Array[Int] = {
    val toks = codePointTokens(text).toBuffer
    val rank = scala.collection.mutable.HashMap.empty[(String, String), Int]
    model.merges.zipWithIndex.foreach { case (p, k) =>
      if (!rank.contains(p)) rank(p) = k
    }
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
