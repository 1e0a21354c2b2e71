package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.CorpusOps

/** Behavioral suite for the corpus-curation tier (llm.CorpusOps) + the
  * streaming packing twin: known-answer fixtures for each metric, and
  * streaming-vs-batch packing equality (incl. kill+restart) on the
  * sf0.001 documents table.
  */
class CorpusOpsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = Tables.documents(spark, sf).cache()

  test("repetitionColumns: known-answer fixture") {
    val df = Seq(
      (1L, "a a b"),          // 3 words, 2 distinct; top word a=2; bigrams {a a, a b}
      (2L, "x"),              // single word: no bigrams
      (3L, ""),               // empty: all zeros
      (4L, "p q p q p q")     // 6 words; top word p=3; bigrams p q=3, q p=2 → 3/5
    ).toDF("doc_id", "text")
    val r = CorpusOps.repetitionColumns(df, "doc_id", "text")
      .orderBy("doc_id")
      .select("n_words", "dup_word_frac", "top_word_frac", "top_bigram_frac")
      .as[(Int, Double, Double, Double)].collect()
    assert(r(0) === ((3, 1.0 / 3, 2.0 / 3, 0.5)))
    assert(r(1) === ((1, 0.0, 1.0, 0.0)))
    assert(r(2) === ((0, 0.0, 0.0, 0.0)))
    assert(r(3) === ((6, 4.0 / 6, 3.0 / 6, 3.0 / 5)))
  }

  test("boilerplatePhrases: document frequency counts multi-doc phrases once per doc") {
    val df = Seq(
      (1L, "the same boilerplate footer here"),
      (2L, "the same boilerplate footer there"),
      (3L, "the same boilerplate footer the same boilerplate footer"), // twice in one doc
      (4L, "entirely different content words")
    ).toDF("doc_id", "text")
    val r = CorpusOps.boilerplatePhrases(df, "doc_id", "text", n = 3, minDf = 3)
      .as[(String, Long, Long)].collect().map(x => x._1 -> ((x._2, x._3))).toMap
    // "the same boilerplate" and "same boilerplate footer": df=3 (doc 3 counted once), total 4
    assert(r("the same boilerplate") === ((3L, 4L)))
    assert(r("same boilerplate footer") === ((3L, 4L)))
    // everything else is below minDf
    assert(r.size === 2)
  }

  test("decontaminate flags train docs sharing an n-gram with the eval set") {
    // evalMod=2: even ids are the eval set
    val df = Seq(
      (2L, "alpha beta gamma delta epsilon zeta"),       // eval
      (4L, "one two three four five six"),               // eval
      (1L, "xx alpha beta gamma delta epsilon yy"),      // shares a 5-gram with doc 2
      (3L, "totally disjoint text with no overlap at all"),
      (5L, "one two three four five and then some")      // shares a 5-gram with doc 4
    ).toDF("doc_id", "text")
    val r = CorpusOps.decontaminate(df, "doc_id", "text", evalMod = 2L, n = 5)
      .as[(Long, Long, Long, Boolean)].collect().map(x => x._1 -> x).toMap
    assert(r.keySet === Set(1L, 3L, 5L)) // only train docs are emitted
    assert(r(1L)._4 && r(1L)._2 === 1L && r(1L)._3 === 1L)
    assert(!r(3L)._4 && r(3L)._2 === 0L)
    assert(r(5L)._4 && r(5L)._2 === 1L && r(5L)._3 === 1L)
  }

  test("decontaminate past the broadcast regime: shuffle join, payload never enters an exchange") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // identical output with and without the broadcast hint
    val viaBroadcast = CorpusOps.decontaminate(docs, "doc_id", "text", evalMod = 10L)
      .collect().toSet
    val viaShuffle = CorpusOps.decontaminate(docs, "doc_id", "text", evalMod = 10L,
      broadcastEval = false)
    assert(viaShuffle.collect().toSet === viaBroadcast)
    // plan: under broadcastEval=false (and no auto-broadcast), the gram
    // join is a shuffle join whose exchanges carry ONLY (id, gram,
    // eval_id)-shaped rows — the text payload is pruned before any
    // exchange, so the plan survives an eval set of any size
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = CorpusOps.decontaminate(docs, "doc_id", "text", evalMod = 10L,
        broadcastEval = false)
      q.collect()
      def walk(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case s: QueryStageExec => walk(s.plan)
        case r: ReusedExchangeExec => walk(r.child)
        case _ => p.children.flatMap(walk) ++ p.subqueries.flatMap(walk)
      })
      val nodes = walk(q.queryExecution.executedPlan)
      val ex = nodes.filter(_.isInstanceOf[ShuffleExchangeLike])
      assert(ex.nonEmpty, "without the hint the gram join must plan a shuffle join")
      assert(nodes.count(_.isInstanceOf[BroadcastHashJoinExec]) === 0,
        "no broadcast join may survive with the hint off and auto-broadcast disabled")
      val payloadEx = ex.filter(_.children.head.output.exists(a =>
        a.name == "text" || a.name == "toks"))
      assert(payloadEx.isEmpty,
        "the text payload must be pruned before every exchange")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("packSequences: per-shard concat-and-chunk offsets and bins") {
    // shard A: 300+300+300 tokens → offsets 0,300,600 → bins 0,0,1 (budget 512)
    // shard B independent: offsets restart at 0
    val mk = (n: Int) => Array.fill(n)("w").mkString(" ")
    val df = Seq(
      (1L, "A", mk(300)), (2L, "A", mk(300)), (3L, "A", mk(300)),
      (10L, "B", mk(600)), (11L, "B", mk(10))
    ).toDF("doc_id", "source", "text")
    val r = CorpusOps.packSequences(df, "doc_id", "text", "source", budget = 512)
      .orderBy("doc_id").select("doc_id", "n_tok", "tok_offset", "bin_id")
      .as[(Long, Int, Long, Long)].collect()
    assert(r.toSeq === Seq((1L, 300, 0L, 0L), (2L, 300, 300L, 0L), (3L, 300, 600L, 1L),
      (10L, 600, 0L, 0L), (11L, 10, 600L, 1L)))
  }

  test("sampleByHash is deterministic and monotone in the threshold prefix") {
    val a = CorpusOps.sampleByHash(docs, "doc_id", "text", "lang",
      Map("en" -> "1999"), "3333").select("doc_id").as[Long].collect().toSet
    val b = CorpusOps.sampleByHash(docs, "doc_id", "text", "lang",
      Map("en" -> "1999"), "3333").select("doc_id").as[Long].collect().toSet
    assert(a === b) // engine-/run-independent
    val wider = CorpusOps.sampleByHash(docs, "doc_id", "text", "lang",
      Map("en" -> "3333"), "6666").select("doc_id").as[Long].collect().toSet
    assert(a.subsetOf(wider)) // stricter prefix is a subset of the looser one
    assert(a.nonEmpty && a.size < docs.count())
  }

  test("redactPii replaces synthetic emails and phones and counts them") {
    val enriched = CorpusOps.withSyntheticPii(docs.limit(20), "doc_id", "text")
    val r = CorpusOps.redactPii(enriched, "doc_id", "pii_text")
    val rows = r.select("redacted", "n_emails", "n_phones").as[(String, Int, Int)].collect()
    assert(rows.length === 20)
    rows.foreach { case (red, ne, np) =>
      assert(ne === 1 && np === 1)
      assert(red.contains("<EMAIL>") && red.contains("<PHONE>"))
      assert(!red.contains("@") && !red.contains("+1-555-"))
    }
  }

  test("packStream equals batch packSequences on the sf0.001 corpus") {
    streaming.UniqueStreams.useRocksDBStateStore(spark)
    val batch = CorpusOps.packSequences(docs, "doc_id", "text", "source", budget = 512)
      .as[(Long, String, Int, Long, Long)].collect().toSet
    val streamed = streaming.Replay.replay(spark, docs, "doc_id", 100, "update")(sdf =>
      streaming.PackStream.packStream(sdf, "doc_id", "text", "source", budget = 512))
      .as[(Long, String, Int, Long, Long)].collect().toSet
    assert(streamed === batch)
  }

  test("packStream survives kill+restart with identical assignments") {
    streaming.UniqueStreams.useRocksDBStateStore(spark)
    val batch = CorpusOps.packSequences(docs, "doc_id", "text", "source", budget = 512)
      .as[(Long, String, Int, Long, Long)].collect().toSet
    val streamed = streaming.Replay.replayWithRestart(spark, docs, "doc_id", 100)(sdf =>
      streaming.PackStream.packStream(sdf, "doc_id", "text", "source", budget = 512))
      .as[(Long, String, Int, Long, Long)].collect().toSet
    assert(streamed === batch)
  }

  test("lineDedup drops exactly the lines shared by >= minDf docs, in-order rebuild") {
    val docs = Seq(
      (1L, "shared header\nunique one\nshared footer"),
      (2L, "shared header\nunique two\nshared footer"),
      (3L, "shared header\nunique three\nshared footer"),
      (4L, "solo header\nunique four\nshared footer")).toDF("doc_id", "text")
    val out = CorpusOps.lineDedup(docs, "doc_id", "text", minDf = 3)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 3L, 2L, "unique one"),
      (2L, 3L, 2L, "unique two"),
      (3L, 3L, 2L, "unique three"),
      (4L, 3L, 1L, "solo header\nunique four")))
  }

  test("lineDedup: within-doc repeats count once toward doc frequency; duplicate positions both drop") {
    val docs = Seq(
      (1L, "dup line\nmiddle\ndup line"),
      (2L, "dup line\nother"),
      (3L, "dup line\nthird")).toDF("doc_id", "text")
    val out = CorpusOps.lineDedup(docs, "doc_id", "text", minDf = 3)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    // "dup line" appears in 3 distinct docs -> dropped everywhere,
    // including BOTH its positions in doc 1
    assert(out == Seq(
      (1L, 3L, 2L, "middle"),
      (2L, 2L, 1L, "other"),
      (3L, 2L, 1L, "third")))
  }

  test("lmPerplexity: hand-computed fixture — counts exact, ppl exactly 4.0") {
    // train "a b a c": unigrams a:2 b:1 c:1 (V=3), bigrams ab:1 ba:1 ac:1.
    // score "a b c" at α=0.5 (denom add = 0.5·(V+1) = 2):
    //   p(b|a) = (1+.5)/(2+2) = 0.375, p(c|b) = (0+.5)/(1+2) = 1/6
    //   ppl = 1/sqrt(0.375/6) = 1/sqrt(1/16) = 4.0 — exact in doubles
    val train = Seq((100L, "a b a c")).toDF("doc_id", "text")
    val score = Seq((1L, "a b c"), (2L, "z"), (3L, "a b a c"))
      .toDF("doc_id", "text")
    val r = CorpusOps.lmPerplexity(score, "text", "doc_id", train, "text")
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_bigrams", "oov_bigrams",
        "hit_prev", "hit_bigram", "ppl")
      .as[(Long, Long, Long, Long, Long, Long, Option[Double])]
      .collect().toSeq
    assert(r(0) === ((1L, 3L, 2L, 1L, 3L, 1L, Some(4.0))))
    assert(r(1) === ((2L, 1L, 0L, 0L, 0L, 0L, None))) // < 2 tokens: no model positions
    // the train doc itself: every bigram seen (oov 0), prevs a,b,a → 5
    assert(r(2)._1 === 3L)
    assert((r(2)._2, r(2)._3, r(2)._4, r(2)._5, r(2)._6) === ((4L, 3L, 0L, 5L, 3L)))
    // in-domain text must score lower perplexity than the OOV-heavy doc 1
    assert(r(2)._7.get < r(0)._7.get)
  }

  test("lmPerplexity: repeated bigram positions weight by multiplicity") {
    // "a b a b a": bigrams ab, ba, ab, ba — the (doc, type) pre-aggregation
    // must weight each type by its multiplicity m in every output column
    val train = Seq((100L, "a b a c")).toDF("doc_id", "text")
    val score = Seq((1L, "a b a b a")).toDF("doc_id", "text")
    val r = CorpusOps.lmPerplexity(score, "text", "doc_id", train, "text")
      .select("n_bigrams", "oov_bigrams", "hit_prev", "hit_bigram")
      .as[(Long, Long, Long, Long)].head()
    // ab: c12=1 c1(a)=2, ×2; ba: c12=1 c1(b)=1, ×2
    assert(r === ((4L, 0L, 6L, 4L)))
  }

  test("lmScoreStream equals batch lmPerplexity on the sf0.001 corpus, any chunking") {
    val model = CorpusOps.lmTrain(docs, "text")
    val batch = CorpusOps.lmPerplexity(docs, "text", "doc_id", docs, "text")
      .select("doc_id", "n_tokens", "n_bigrams", "oov_bigrams",
        "hit_prev", "hit_bigram")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    Seq(100, 7).foreach { chunk => // two micro-batch granularities
      val streamed = graft.streaming.Replay
        .replay(spark, docs, "doc_id", chunk, "update")(sdf =>
          graft.streaming.LmScoreStream.lmScoreStream(sdf, "text", "doc_id", model))
        .select("doc_id", "n_tokens", "n_bigrams", "oov_bigrams",
          "hit_prev", "hit_bigram")
        .as[(Long, Long, Long, Long, Long, Long)].collect()
      // update mode re-emits a doc only when its aggregate changes; with
      // whole docs per chunk each doc appears exactly once
      assert(streamed.toSet === batch, s"chunk=$chunk diverged from batch")
    }
  }

  test("lmScoreStreamWindowed: parity with batch AND state evicts below " +
      "the watermark (the unwindowed form's state only grows)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val model = CorpusOps.lmTrain(docs, "text")
    val batch = CorpusOps.lmPerplexity(docs, "text", "doc_id", docs, "text")
      .select("doc_id", "n_tokens", "n_bigrams", "oov_bigrams",
        "hit_prev", "hit_bigram")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val input = docs.withColumn("event_ts",
      org.apache.spark.sql.functions.timestamp_seconds($"doc_id"))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.row(input.schema)
    def stateRowsAfterReplay(windowed: Boolean): (Set[(Long, Long, Long, Long, Long, Long)], Long) = {
      val ms = MemoryStream[Row]
      val out =
        if (windowed)
          graft.streaming.LmScoreStream.lmScoreStreamWindowed(ms.toDF(),
            "text", "doc_id", "event_ts", model, "50 seconds", "10 seconds")
        else graft.streaming.LmScoreStream.lmScoreStream(ms.toDF(),
          "text", "doc_id", model)
      val sink = s"lm_win_${windowed}_${System.identityHashCode(ms)}"
      val q = out.writeStream.format("memory").queryName(sink)
        .outputMode("update")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("ckpt_lmwin").toString)
        .start()
      val rows = input.orderBy($"doc_id").collect()
      try
        rows.grouped(100).foreach { chunk =>
          ms.addData(chunk.toSeq); q.processAllAvailable()
        }
      finally ()
      val st = Option(q.lastProgress).map(_.stateOperators.map(_.numRowsTotal).sum)
        .getOrElse(-1L)
      val got = spark.table(sink)
        .select("doc_id", "n_tokens", "n_bigrams", "oov_bigrams",
          "hit_prev", "hit_bigram")
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      q.stop()
      (got, st)
    }
    val (winSet, winRows) = stateRowsAfterReplay(windowed = true)
    val (unSet, unRows) = stateRowsAfterReplay(windowed = false)
    assert(winSet === batch, "windowed stream diverged from batch")
    assert(unSet === batch, "unwindowed stream diverged from batch")
    // the unwindowed aggregation holds one row per doc EVER seen; the
    // windowed one only the un-evicted horizon (last chunk's windows +
    // the watermark tail)
    val n = docs.count()
    assert(unRows === n, s"unwindowed state $unRows != corpus size $n")
    assert(winRows < n / 2,
      s"windowed state $winRows did not evict (corpus $n, unwindowed $unRows)")
  }

  test("dsirScoreStreamWindowed equals batch dsirWeights when each doc " +
      "carries one event time") {
    val tgt = docs.filter($"doc_id" % 10 === 0)
    val raw = docs.filter($"doc_id" % 10 =!= 0)
    val model = CorpusOps.dsirTrain(tgt, "text", raw, "text",
      gramNs = Seq(1, 2), hexChars = 2, md5Family = true)
    val batch = CorpusOps.dsirWeights(raw, "doc_id", "text", model)
      .select("doc_id", "n_grams", "oov_tgt", "oov_raw", "hit_tgt", "hit_raw")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val streamed = graft.streaming.Replay.replay(spark,
      raw.withColumn("event_ts",
        org.apache.spark.sql.functions.timestamp_seconds($"doc_id")),
      "doc_id", 100, "update")(sdf =>
        graft.streaming.DsirScoreStream.dsirScoreStreamWindowed(sdf, "text",
          "doc_id", "event_ts", model, "50 seconds", "10 seconds"))
      .select("doc_id", "n_grams", "oov_tgt", "oov_raw", "hit_tgt", "hit_raw")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(streamed.toSet === batch, "windowed dsir stream diverged from batch")
    assert(streamed.length === streamed.toSet.size,
      "a doc emitted more than once despite whole-doc chunks")
  }

  // ---------------------------------------------------------------- DSIR

  /** Independent re-derivation of the DSIR md5 bucketing + stats in plain
    * Scala collections (MessageDigest, no Catalyst) — the fixture the
    * doubles are pinned against.
    */
  private object DsirRef {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def toks(text: String): Seq[String] =
      text.toLowerCase.split("[^\\p{L}\\p{Nd}]+").filter(_.nonEmpty).toSeq
    def grams(text: String): Seq[String] = {
      val t = toks(text)
      t ++ t.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
    }
    def bucket(gram: String, hexChars: Int): String =
      md5hex(gram).take(hexChars)
    def bucketCounts(texts: Seq[String], hexChars: Int): Map[String, Long] =
      texts.flatMap(grams).map(bucket(_, hexChars))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
    def gumbelU(seed: String, id: Long): Double =
      (BigInt(md5hex(s"$seed:$id").take(13), 16).toDouble + 1.0) /
        (math.pow(16.0, 13) + 2.0)
  }

  test("dsirWeights: independent md5 re-derivation on a fixture corpus") {
    val tgtDocs = Seq((100L, "alpha beta alpha"), (101L, "beta gamma"))
    val rawDocs = Seq((1L, "alpha beta gamma delta"), (2L, "epsilon zeta"),
      (3L, ""), (4L, "alpha alpha alpha"))
    val model = CorpusOps.dsirTrain(tgtDocs.toDF("doc_id", "text"), "text",
      rawDocs.toDF("doc_id", "text"), "text",
      gramNs = Seq(1, 2), hexChars = 2, alpha = 1.0, md5Family = true)
    val hc = 2
    val cT = DsirRef.bucketCounts(tgtDocs.map(_._2), hc)
    val cR = DsirRef.bucketCounts(rawDocs.map(_._2), hc)
    val (totT, totR) = (cT.values.sum, cR.values.sum)
    assert((model.totTgt, model.totRaw) === ((totT, totR)))
    val nB = 256.0
    val logConst = math.log((totR + nB) / (totT + nB))
    val r = CorpusOps.dsirWeights(rawDocs.toDF("doc_id", "text"),
        "doc_id", "text", model)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect()
    rawDocs.zip(r).foreach { case ((id, text), row) =>
      val m = DsirRef.grams(text).map(DsirRef.bucket(_, hc))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val expGrams = m.values.sum
      val expOovT = m.collect { case (b, c) if !cT.contains(b) => c }.sum
      val expOovR = m.collect { case (b, c) if !cR.contains(b) => c }.sum
      val expHitT = m.map { case (b, c) => c * cT.getOrElse(b, 0L) }.sum
      val expHitR = m.map { case (b, c) => c * cR.getOrElse(b, 0L) }.sum
      val expLogw = m.map { case (b, c) =>
        c * (math.log(cT.getOrElse(b, 0L) + 1.0) -
          math.log(cR.getOrElse(b, 0L) + 1.0))
      }.sum + expGrams * logConst
      assert(row._1 === id)
      assert((row._2, row._3, row._4, row._5, row._6) ===
        ((expGrams, expOovT, expOovR, expHitT, expHitR)), s"doc $id")
      assert(math.abs(row._7 - expLogw) < 1e-9, s"doc $id logw")
    }
    // the doc sharing target grams (beta, gamma, "beta gamma") must look
    // more target-like than the all-OOV doc. (Doc 4's all-alpha text is
    // deliberately NOT a winner: alpha is relatively more frequent in the
    // raw pool than in the target, so DSIR down-weights it — the
    // re-derivation above pins that, too.)
    val byId = r.map(x => x._1 -> x._7).toMap
    assert(byId(1L) > byId(2L),
      "target-overlapping doc must outweigh the all-OOV doc")
  }

  test("dsirWeights: identical target and raw pools zero every log-ratio") {
    val pool = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"))
      .toDF("doc_id", "text")
    val model = CorpusOps.dsirTrain(pool, "text", pool, "text",
      gramNs = Seq(1, 2), hexChars = 1, md5Family = true)
    val r = CorpusOps.dsirWeights(pool, "doc_id", "text", model)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect()
    r.foreach { row =>
      assert(row._5 === row._6, "hit_tgt must equal hit_raw")
      assert(row._3 === row._4, "oov_tgt must equal oov_raw")
      assert(math.abs(row._7) < 1e-12, "logw must be exactly 0")
    }
  }

  test("dsirSelect: Gumbel top-k matches the re-derivation, partition-invariant") {
    val tgt = Seq((100L, "alpha beta alpha beta")).toDF("doc_id", "text")
    val rawDocs = (1L to 40L).map(i =>
      (i, if (i % 3 == 0) "alpha beta alpha" else s"noise$i words here"))
    val model = CorpusOps.dsirTrain(tgt, "text",
      rawDocs.toDF("doc_id", "text"), "text",
      gramNs = Seq(1, 2), hexChars = 2, md5Family = true)
    val w = CorpusOps.dsirWeights(rawDocs.toDF("doc_id", "text"),
        "doc_id", "text", model)
      .select("doc_id", "logw").as[(Long, Double)].collect().toMap
    val expected = rawDocs.map(_._1)
      .sortBy(id => (-(w(id) - math.log(-math.log(DsirRef.gumbelU("dsir", id)))), id))
      .take(7)
    Seq(1, 13).foreach { nPart =>
      val got = CorpusOps.dsirSelect(
        rawDocs.toDF("doc_id", "text").repartition(nPart), "doc_id", "text",
        model, k = 7)
        .select("doc_id").as[Long].collect().toSeq
      assert(got === expected, s"nPart=$nPart")
    }
    // a different seed reshuffles the draw but keeps |selection| = k
    val other = CorpusOps.dsirSelect(rawDocs.toDF("doc_id", "text"),
      "doc_id", "text", model, k = 7, seed = "other")
      .select("doc_id").as[Long].collect().toSeq
    assert(other.size === 7)
    assert(other !== expected)
  }

  test("dsirScoreStream equals batch dsirWeights on the sf0.001 corpus, any chunking") {
    val tgt = docs.filter($"doc_id" % 10 === 0)
    val raw = docs.filter($"doc_id" % 10 =!= 0)
    val model = CorpusOps.dsirTrain(tgt, "text", raw, "text",
      gramNs = Seq(1, 2), hexChars = 2, md5Family = true)
    val batch = CorpusOps.dsirWeights(raw, "doc_id", "text", model)
      .select("doc_id", "n_grams", "oov_tgt", "oov_raw", "hit_tgt", "hit_raw")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    Seq(100, 7).foreach { chunk =>
      val streamed = graft.streaming.Replay
        .replay(spark, raw, "doc_id", chunk, "update")(sdf =>
          graft.streaming.DsirScoreStream.dsirScoreStream(sdf, "text", "doc_id", model))
        .select("doc_id", "n_grams", "oov_tgt", "oov_raw", "hit_tgt", "hit_raw")
        .as[(Long, Long, Long, Long, Long, Long)].collect()
      assert(streamed.toSet === batch, s"chunk=$chunk diverged from batch")
    }
  }

  test("dsir xxhash64 production family: same stats shape, validation eager") {
    val tgt = docs.filter($"doc_id" % 10 === 0)
    val raw = docs.filter($"doc_id" % 10 =!= 0)
    // production family end-to-end (train → weigh → select) runs and is
    // deterministic across invocations
    val model = CorpusOps.dsirTrain(tgt, "text", raw, "text")
    val a = CorpusOps.dsirSelect(raw, "doc_id", "text", model, k = 25)
      .select("doc_id").as[Long].collect().toSeq
    val b = CorpusOps.dsirSelect(raw.repartition(17), "doc_id", "text", model, k = 25)
      .select("doc_id").as[Long].collect().toSeq
    assert(a === b && a.size === 25)
    // eager validation
    intercept[IllegalArgumentException] {
      CorpusOps.dsirTrain(tgt, "text", raw, "text", gramNs = Seq.empty)
    }
    intercept[IllegalArgumentException] {
      CorpusOps.dsirTrain(tgt, "text", raw, "text", hexChars = 8)
    }
    intercept[IllegalArgumentException] {
      CorpusOps.dsirTrain(tgt, "text", raw, "text", alpha = 0.0)
    }
    intercept[IllegalArgumentException] {
      CorpusOps.dsirSelect(raw, "doc_id", "text", model, k = 0)
    }
  }

  test("lineDedup hashedKeys production form equals the string-key form") {
    val docs = CorpusOps.withSyntheticLines(
      Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", "text")
    val a = CorpusOps.lineDedup(docs, "doc_id", "lines_text", minDf = 3)
      .as[(Long, Long, Long, String)].collect().toSet
    val b = CorpusOps.lineDedup(docs, "doc_id", "lines_text", minDf = 3, hashedKeys = true)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(a == b)
    assert(a.nonEmpty && a.forall(_._3 >= 2),
      "every doc must drop at least its injected header and footer")
  }
}
