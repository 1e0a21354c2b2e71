package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.TextDedup

/** Behavioral suite for duplicated-span detection/removal (the
  * ExactSubstr-style dedup of Lee et al. 2021, TextDedup.duplicateSpans /
  * removeDuplicateSpans): span maximality, overlap merging, within-doc
  * duplication, sub-k docs, full-doc removal, and string-vs-xxhash64 key
  * parity. The corpus-level hash verification lives in the driver oracle
  * rows (`doc_dup_spans`, `doc_dup_span_removal`).
  */
class DupSpanSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")

  private def spansOf(df: DataFrame, k: Int = 3, minCount: Int = 2,
                      hashed: Boolean = false): Seq[(Long, Long, Long, Long)] =
    TextDedup.duplicateSpans(df, "doc_id", "text", k, minCount, hashed)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq

  test("cross-doc duplicated run is reported as one maximal merged span in both docs") {
    // shared run "a b c d e" (5 tokens) inside different contexts: three
    // overlapping duplicated 3-windows must merge to a single [start, start+4] span
    val df = docs(
      1L -> "x a b c d e y",
      2L -> "p q a b c d e")
    assert(spansOf(df) == Seq((1L, 1L, 5L, 5L), (2L, 2L, 6L, 5L)))
  }

  test("disjoint duplicated regions stay separate spans; unique middle survives removal") {
    val df = docs(
      1L -> "a b c KEEP1 ONLY1 d e f",
      2L -> "a b c KEEP2 ONLY2 d e f")
    assert(spansOf(df) == Seq((1L, 0L, 2L, 3L), (1L, 5L, 7L, 3L),
      (2L, 0L, 2L, 3L), (2L, 5L, 7L, 3L)))
    val cleaned = TextDedup.removeDuplicateSpans(df, "doc_id", "text", k = 3)
      .as[(Long, Long, Long, String)].collect().sorted.toSeq
    assert(cleaned == Seq((1L, 8L, 6L, "keep1 only1"), (2L, 8L, 6L, "keep2 only2")))
  }

  test("within-document repetition counts toward minCount (total occurrences, not distinct docs)") {
    val df = docs(1L -> "a b c z z z a b c")
    // "a b c" occurs twice in the same doc → both occurrences are spans
    assert(spansOf(df) == Seq((1L, 0L, 2L, 3L), (1L, 6L, 8L, 3L)))
  }

  test("docs shorter than k contribute no windows and survive removal untouched") {
    val df = docs(1L -> "a b", 2L -> "a b", 3L -> "a b c x a b c")
    val spans = spansOf(df)
    assert(spans.forall(_._1 == 3L), s"sub-k docs must yield no spans: $spans")
    val cleaned = TextDedup.removeDuplicateSpans(df, "doc_id", "text", k = 3)
      .as[(Long, Long, Long, String)].collect().sorted.toSeq
    assert(cleaned.take(2) == Seq((1L, 2L, 0L, "a b"), (2L, 2L, 0L, "a b")))
  }

  test("a fully duplicated document removes to empty text") {
    val df = docs(1L -> "a b c d", 2L -> "a b c d")
    val cleaned = TextDedup.removeDuplicateSpans(df, "doc_id", "text", k = 3)
      .as[(Long, Long, Long, String)].collect().sorted.toSeq
    assert(cleaned == Seq((1L, 4L, 4L, ""), (2L, 4L, 4L, "")))
  }

  test("minCount above occurrence count suppresses the span") {
    val df = docs(1L -> "a b c x", 2L -> "a b c y")
    assert(spansOf(df, minCount = 3).isEmpty)
    assert(spansOf(df, minCount = 2).nonEmpty)
  }

  test("removeSpans over a precomputed (and filtered) spans relation") {
    val df = docs(
      1L -> "a b c KEEP1 ONLY1 d e f g h",
      2L -> "a b c KEEP2 ONLY2 d e f g h")
    val spans = TextDedup.duplicateSpans(df, "doc_id", "text", k = 3)
    // same relation → same result as the one-shot form
    val viaPre = TextDedup.removeSpans(df, "doc_id", "text", spans)
      .as[(Long, Long, Long, String)].collect().sorted.toSeq
    val oneShot = TextDedup.removeDuplicateSpans(df, "doc_id", "text", k = 3)
      .as[(Long, Long, Long, String)].collect().sorted.toSeq
    assert(viaPre == oneShot)
    // filtered relation: only cut spans of >= 4 tokens (keeps the 3-token prefix run)
    val filtered = TextDedup.removeSpans(df, "doc_id", "text",
      spans.filter($"span_tokens" >= 4))
      .as[(Long, Long, Long, String)].collect().sorted.toSeq
    assert(filtered == Seq(
      (1L, 10L, 5L, "a b c keep1 only1"),
      (2L, 10L, 5L, "a b c keep2 only2")))
  }

  test("removeSpans merges overlapping caller spans: n_dup_tokens counts actual removals") {
    import spark.implicits._
    val df = docs(1L -> "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")
    // overlapping [1,4] + [3,6], adjacent [8,9], and an out-of-range [7,99]
    val spans = Seq((1L, 1L, 4L), (1L, 3L, 6L), (1L, 8L, 9L), (1L, 7L, 99L))
      .toDF("doc_id", "span_start", "span_end")
    val r = TextDedup.removeSpans(df, "doc_id", "text", spans)
      .as[(Long, Long, Long, String)].collect().toSeq
    // merged disjoint cover = [1,6] ∪ [7,9] → 6 + 3 = 9 removed, only t0 kept
    assert(r == Seq((1L, 10L, 9L, "t0")))
    // unmerged naive sum would have been 4+4+2+93 = 103 — the old double-count
  }

  test("pathological fully-fragmented doc: many alternating spans stay linear") {
    import spark.implicits._
    // 20k tokens, every even position its own 1-token span → 10k spans on one doc
    val toks = (0 until 20000).map(i => s"w$i").mkString(" ")
    val df = docs(1L -> toks)
    val spans = (0 until 20000 by 2).map(p => (1L, p.toLong, p.toLong))
      .toDF("doc_id", "span_start", "span_end")
    val t0 = System.nanoTime()
    val r = TextDedup.removeSpans(df, "doc_id", "text", spans)
      .as[(Long, Long, Long, String)].collect().toSeq
    val secs = (System.nanoTime() - t0) / 1e9
    assert(r.head._2 == 20000L && r.head._3 == 10000L)
    assert(r.head._4 == (1 until 20000 by 2).map(i => s"w$i").mkString(" "))
    // the old per-token exists was O(tokens × spans) = 2×10^8 interpreted
    // lambda steps for this doc; the two-pointer kernel is O(tokens)
    assert(secs < 30.0, f"pathological doc took $secs%.1f s — kernel regressed to quadratic?")
  }

  test("xxhash64 production keys produce identical spans and removal to string keys") {
    // real-ish corpus slice so the parity check covers merge + removal paths
    val df = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = TextDedup.duplicateSpans(df, "doc_id", "text", k = 5)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    val b = TextDedup.duplicateSpans(df, "doc_id", "text", k = 5, hashedKeys = true)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(a == b)
    assert(a.nonEmpty, "sf0.001 documents should contain duplicated 5-gram spans")
    val ra = TextDedup.removeDuplicateSpans(df, "doc_id", "text", k = 5)
      .as[(Long, Long, Long, String)].collect().sorted.toSeq
    val rb = TextDedup.removeDuplicateSpans(df, "doc_id", "text", k = 5, hashedKeys = true)
      .as[(Long, Long, Long, String)].collect().sorted.toSeq
    assert(ra == rb)
  }
}
