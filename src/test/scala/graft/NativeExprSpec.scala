package graft

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions._

/** Interpreted-vs-codegen parity for the custom Catalyst expressions.
  *
  * Every DataFrame test in the suite exercises only the `doGenCode` path
  * (whole-stage codegen is on by default); a divergence in `nullSafeEval`
  * — the path Spark falls back to when a generated method exceeds the JIT
  * limit or Janino fails — would ship silently. This spec runs the same
  * edge-case inputs (empty arrays, null elements, null arrays, wrong
  * widths, zero vectors) through both paths by flipping
  * `spark.sql.codegen.wholeStage` + `spark.sql.codegen.factoryMode` and
  * asserts identical rows.
  */
class NativeExprSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    GraftColumnBridge.column(e)
  private def e(col: Column) = GraftColumnBridge.expression(col)

  /** Collect `df` under default codegen and under forced interpretation. */
  private def runBoth(df: DataFrame): (Seq[Row], Seq[Row]) = {
    val viaCodegen = df.orderBy("id").collect().toSeq
    val keys = Seq("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN")
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      keys.foreach { case (k, v) => spark.conf.set(k, v) }
      (viaCodegen, df.orderBy("id").collect().toSeq)
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  private def assertParity(df: DataFrame): Unit = {
    val (gen, interp) = runBoth(df)
    assert(gen === interp, "codegen and interpreted results must be identical")
  }

  private lazy val toksDf = Seq(
    (1L, Seq("the", "quick", "brown", "fox")),
    (2L, Seq.empty[String]),
    (3L, Seq("a", null, "b")),
    (4L, null.asInstanceOf[Seq[String]]),
    (5L, Seq("solo"))
  ).toDF("id", "toks")

  test("XxShingleHashes + XxSimhash: interpreted == codegen on edge inputs") {
    val df = toksDf.select(col("id"),
      c(XxShingleHashes(e(col("toks")), 3)).as("sh3"),
      c(XxShingleHashes(e(col("toks")), 1)).as("sh1"),
      c(XxSimhash(e(col("toks")))).as("sim"))
    assertParity(df)
    // sanity on the shared-edge semantics, not just self-consistency
    val rows = df.orderBy("id").collect()
    assert(rows(1).getSeq[Long](1).isEmpty, "empty toks → empty shingles")
    assert(rows(1).getLong(3) === 0L, "empty toks → simhash 0")
    assert(rows(3).isNullAt(1) && rows(3).isNullAt(3), "null toks → null")
  }

  test("XxCharShingleHashes: equals XxShingleHashes over charTokens; " +
      "interpreted == codegen; multibyte and edge inputs") {
    val sDf = Seq(
      (1L, "abcdef"),
      (2L, ""),
      (3L, "ab"),                  // shorter than n=3 → empty
      (4L, null.asInstanceOf[String]),
      (5L, "héllo wörld 中文字"),   // multibyte char boundaries
      (6L, "aaaa")                 // repeated grams (distinct later)
    ).toDF("id", "s")
    val df = sDf.select(col("id"),
      c(XxCharShingleHashes(e(col("s")), 3)).as("native"),
      c(XxCharShingleHashes(e(col("s")), 1)).as("native1"))
    assertParity(df)
    // the native pass must equal the composed HOF form: per-char tokens
    // (Column.substr by char position) through XxShingleHashes
    val composed = sDf
      .withColumn("ctoks", when(length(col("s")) === 0, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), length(col("s"))),
          i => col("s").substr(i, lit(1)))))
      .select(col("id"),
        c(XxShingleHashes(e(col("ctoks")), 3)).as("hof"),
        c(XxShingleHashes(e(col("ctoks")), 1)).as("hof1"))
    val n = df.orderBy("id").collect().toSeq
    val h = composed.orderBy("id").collect().toSeq
    n.zip(h).foreach { case (nr, hr) =>
      assert(nr.isNullAt(1) === hr.isNullAt(1),
        s"null disagreement at id ${nr.getLong(0)}")
      if (!nr.isNullAt(1)) {
        assert(nr.getSeq[Long](1) === hr.getSeq[Long](1),
          s"3-gram mismatch at id ${nr.getLong(0)}")
        assert(nr.getSeq[Long](2) === hr.getSeq[Long](2),
          s"1-gram mismatch at id ${nr.getLong(0)}")
      }
    }
  }

  test("XxMinhashSignature: interpreted == codegen incl. null hash elements") {
    val hsDf = Seq(
      (1L, Seq[java.lang.Long](7L, -3L, Long.MaxValue)),
      (2L, Seq.empty[java.lang.Long]),
      (3L, Seq[java.lang.Long](5L, null, 9L)),
      (4L, null.asInstanceOf[Seq[java.lang.Long]])
    ).toDF("id", "hs")
    assertParity(hsDf.select(col("id"),
      c(XxMinhashSignature(e(col("hs")), 8)).as("sig")))
  }

  test("VecBandCodes: interpreted == codegen incl. wrong width / null element / zero vec") {
    val planes = Seq(Seq(1.0, -2.0, 0.5), Seq(-1.0, 0.0, 3.0),
      Seq(0.25, 0.25, -0.25), Seq(2.0, -1.0, 1.0))
    val vecs = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0, -3.0)),
      (2L, Seq[java.lang.Double](0.0, 0.0, 0.0)),
      (3L, Seq[java.lang.Double](1.0, null, 2.0)),
      (4L, Seq[java.lang.Double](1.0, 2.0)), // wrong width → null
      (5L, null.asInstanceOf[Seq[java.lang.Double]])
    ).toDF("id", "v")
    val df = vecs.select(col("id"),
      c(VecBandCodes(e(col("v")), planes, 2)).as("codes"))
    assertParity(df)
    val byId = df.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(3L).getSeq[Long](1) === Seq(0L, 0L), "null element → all-zero codes")
    assert(byId(4L).isNullAt(1), "wrong width → null")
  }

  test("XxMinCharGramHash: equals the HOF substr form; interpreted == codegen; multibyte") {
    val strs = Seq(
      (1L, "the quick brown fox jumps over"),
      (2L, ""),                       // empty → one whole-string window
      (3L, "short"),                  // shorter than the gram width
      (4L, "exactly8"),               // exactly the gram width
      (5L, "héllo wörld ünïcode ẞtr"),// multibyte: byte-boundary walk
      (7L, "日本語のテキストです漢字かな")   // all multibyte
    ).toDF("id", "s")
    val fused = strs.select(col("id"),
      c(XxMinCharGramHash(e(col("s")), 8)).as("h"))
    // the HOF construction fingerprint() used before the fused expression
    val hof = strs.select(col("id"),
      array_min(transform(
        sequence(lit(1), greatest(length(col("s")) - 7, lit(1))),
        i => xxhash64(col("s").substr(i, lit(8))))).as("h"))
    assert(fused.orderBy("id").collect().toSeq === hof.orderBy("id").collect().toSeq,
      "fused expression must equal the HOF substr form, incl. multibyte strings")
    assertParity(fused)
    // DOCUMENTED divergence on null input: the HOF form yields 42 (an
    // artifact of xxhash64 null-skipping → hash of nothing at seed), the
    // fused expression propagates null like every other unary expression
    val nulls = Seq((1L, null.asInstanceOf[String])).toDF("id", "s")
    assert(nulls.select(c(XxMinCharGramHash(e(col("s")), 8))).head().isNullAt(0))
    assertParity(nulls.select(col("id"), c(XxMinCharGramHash(e(col("s")), 8)).as("h")))
  }

  test("MaxRunLength: equals the sort+fold HOF form; interpreted == codegen") {
    val arrs = Seq(
      (1L, Seq("b", "a", "b", "c", "b", "a")),  // b×3
      (2L, Seq.empty[String]),                   // → 0
      (3L, Seq("x")),                            // → 1
      (4L, Seq("a", null, "a", null, null)),     // nulls group: 3
      (5L, null.asInstanceOf[Seq[String]]),      // null array → null
      (6L, Seq("t", "t", "t", "t"))              // all equal
    ).toDF("id", "a")
    val fused = arrs.select(col("id"), c(MaxRunLength(e(col("a")))).as("m"))
    val hof = arrs.select(col("id"),
      aggregate(sort_array(col("a")),
        struct(lit(null).cast("string").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
        (acc, x) => {
          val run = when(x <=> acc("prev"), acc("run") + 1).otherwise(lit(1L))
          struct(x.as("prev"), run.as("run"), greatest(acc("best"), run).as("best"))
        },
        acc => acc("best")).as("m"))
    assert(fused.orderBy("id").collect().toSeq === hof.orderBy("id").collect().toSeq)
    assertParity(fused)
  }

  test("VecCosine: interpreted == codegen incl. mismatch / null element / zero norm") {
    val pairs = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0, 3.0), Seq[java.lang.Double](-1.0, 0.5, 2.0)),
      (2L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0, 2.0, 3.0)), // mismatch → null
      (3L, Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](1.0, 2.0, 3.0)), // null elem → null
      (4L, Seq[java.lang.Double](0.0, 0.0, 0.0), Seq[java.lang.Double](1.0, 2.0, 3.0)), // zero norm → 0.0
      (5L, null.asInstanceOf[Seq[java.lang.Double]], Seq[java.lang.Double](1.0, 2.0, 3.0))
    ).toDF("id", "a", "b")
    // two VecCosines in ONE projection: pins the freshName fix (a raw
    // `hasNull` in doGenCode would collide and kill codegen compilation)
    val df = pairs.select(col("id"),
      c(VecCosine(e(col("a")), e(col("b")))).as("cos_ab"),
      c(VecCosine(e(col("b")), e(col("a")))).as("cos_ba"))
    assertParity(df)
    val byId = df.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(2L).isNullAt(1) && byId(3L).isNullAt(1) && byId(5L).isNullAt(1))
    assert(byId(4L).getDouble(1) === 0.0)
    assert(byId(1L).getDouble(1) === byId(1L).getDouble(2), "cosine is symmetric")
  }

  test("PqEncode/PqLut/PqScore: interpreted == codegen incl. wrong width / null element") {
    // tiny geometry: dim=4, nSub=2, codesPerSub=2; centroids chosen so
    // argmin ties occur (both centroids of sub 1 identical → tie → code 0)
    val cb: Seq[Seq[Double]] = Seq(
      Seq(1.0, 0.0), Seq(0.0, 1.0), // sub 0
      Seq(0.5, 0.5), Seq(0.5, 0.5)) // sub 1 (deliberate tie)
    val norm2 = cb.map(_.foldLeft(0.0)((a, x) => a + x * x))
    val vecs = Seq(
      (1L, Seq[java.lang.Double](1.0, 0.1, 0.3, 0.7)),
      (2L, Seq[java.lang.Double](0.0, 2.0, -1.0, 4.0)),
      (3L, Seq[java.lang.Double](1.0, 2.0, 3.0)),          // wrong width → null
      (4L, Seq[java.lang.Double](1.0, null, 0.0, 0.0)),    // null elem → null
      (5L, null.asInstanceOf[Seq[java.lang.Double]])
    ).toDF("id", "v")
    val df = vecs.select(col("id"),
      c(PqEncode(e(col("v")), cb, 2, 2)).as("codes"),
      c(PqLut(e(col("v")), cb, 2, 2)).as("lut"))
    assertParity(df)
    val scoreDf = df.select(col("id"),
      c(PqScore(e(col("codes")), e(col("lut")), norm2, 2)).as("s"))
    assertParity(scoreDf)
    val byId = df.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(3L).isNullAt(1) && byId(4L).isNullAt(1) && byId(5L).isNullAt(1))
    // tie in sub 1 resolves to the SMALLEST code for every valid row
    assert(byId(1L).getSeq[Int](1)(1) === 0)
    assert(byId(2L).getSeq[Int](1)(1) === 0)
    // hand-check row 1: sub 0 nearer (1,0) → code 0; score vs own lut =
    // cosine(v, reconstruction) — just pin it is finite and positive here
    assert(byId(1L).getSeq[Int](1)(0) === 0)
    val s1 = scoreDf.collect().map(r => r.getLong(0) -> r).toMap
    assert(!s1(1L).isNullAt(1) && s1(1L).getDouble(1) > 0.0)
    assert(s1(3L).isNullAt(1) && s1(4L).isNullAt(1) && s1(5L).isNullAt(1))
  }

  test("PqAdcSum: interpreted == codegen; gather-sum matches hand fold; guards null") {
    // codes/lut pairs incl. every guard: wrong code count, out-of-range
    // code, null code element, null lut element, lut length not a
    // multiple of codesPerSub (cps = 2 → nSub derived from lut)
    val rows = Seq(
      (1L, Seq[Integer](1, 0), Seq[java.lang.Double](0.5, 1.5, 2.5, 3.5)),  // 1.5 + 2.5
      (2L, Seq[Integer](0, 1), Seq[java.lang.Double](-1.0, 0.0, 0.0, 4.0)), // -1.0 + 4.0
      (3L, Seq[Integer](1, 0, 1), Seq[java.lang.Double](1.0, 2.0, 3.0, 4.0)), // wrong nSub → null
      (4L, Seq[Integer](2, 0), Seq[java.lang.Double](1.0, 2.0, 3.0, 4.0)),  // code ≥ cps → null
      (5L, Seq[Integer](null, 0), Seq[java.lang.Double](1.0, 2.0, 3.0, 4.0)), // null code → null
      (6L, Seq[Integer](1, 0), Seq[java.lang.Double](1.0, null, 3.0, 4.0)), // null lut hit → null
      (7L, Seq[Integer](1, 0), Seq[java.lang.Double](1.0, 2.0, 3.0)),       // ragged lut → null
      (8L, null.asInstanceOf[Seq[Integer]], Seq[java.lang.Double](1.0, 2.0, 3.0, 4.0))
    ).toDF("id", "codes", "lut")
    val df = rows.select(col("id"),
      c(PqAdcSum(e(col("codes")), e(col("lut")), 2)).as("s"))
    assertParity(df)
    val byId = df.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getDouble(1) === 4.0)
    assert(byId(2L).getDouble(1) === 3.0)
    Seq(3L, 4L, 5L, 6L, 7L, 8L).foreach(i =>
      assert(byId(i).isNullAt(1), s"row $i must be null"))
    // row 6 gathers lut(0*2+1)=null → null even though other entries are set
  }
}
