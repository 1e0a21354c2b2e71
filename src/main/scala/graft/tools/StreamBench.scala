package graft.tools

import java.sql.Timestamp
import java.nio.file.Files
import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.UniqueStreams

/** Streaming micro-bench: sustained events/s through the stateful
  * operators via MemoryStream → memory sink (BASELINE.md §2 streaming
  * rows). Prints one JSON line.
  */
object StreamBench {
  case class Ev(ts: Timestamp, key: String, seq: Long)
  case class DocEv(doc_id: Long, text: String)
  case class DocTsEv(doc_id: Long, text: String, event_ts: Timestamp)
  case class TaggedEv(doc_id: Long, text: String, is_query: Boolean)
  case class VecEv(vec_id: Long, embedding: Array[Float])

  def main(args: Array[String]): Unit = {
    val nEvents = args.headOption.map(_.toInt).getOrElse(200000)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val enc = Encoders.product[Ev]

    def events(n: Int): Seq[Ev] =
      (0 until n).map(i => Ev(new Timestamp(100000L + i * 10L), s"k${i % 1000}", i.toLong))

    // every key distinct: the regime where exact first/ever state grows
    // one entry per event while firstStreamBloom's stays fixed
    def uniqEvents(n: Int): Seq[Ev] =
      (0 until n).map(i => Ev(new Timestamp(100000L + i * 10L), s"u$i", i.toLong))

    // state telemetry: (rows, bytes) from the final progress — the
    // growing-state vs fixed-state comparison the Bloom A/B is about
    val stateOf = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)]

    def run(name: String, mk: MemoryStream[Ev] => org.apache.spark.sql.DataFrame,
            mode: OutputMode,
            data: Int => Seq[Ev] = events): (String, Double) = {
      val ms = MemoryStream[Ev]
      val q = mk(ms).writeStream.format("memory").queryName(s"sb_$name")
        .outputMode(mode)
        .option("checkpointLocation", Files.createTempDirectory(s"sb_$name").toString)
        .start()
      val batches = 10
      val per = nEvents / batches
      val all = data(nEvents)
      val t0 = System.nanoTime()
      (0 until batches).foreach { b =>
        // last slice takes the division remainder so every event is fed
        // (the reported rate divides by nEvents)
        val hi = if (b == batches - 1) nEvents else (b + 1) * per
        ms.addData(all.slice(b * per, hi))
        q.processAllAvailable()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      Option(q.lastProgress).foreach { p =>
        val ops = p.stateOperators
        if (ops.nonEmpty)
          stateOf(name) = (ops.map(_.numRowsTotal).sum, ops.map(_.memoryUsedBytes).sum)
      }
      q.stop()
      name -> (nEvents / secs)
    }

    // optional 2nd arg: comma-separated op names to run (e.g.
    // "firstUniq,firstBloomUniq" for a big-N soak of one A/B without
    // paying for the whole suite); "neardup"/"dupspan" gate the doc
    // sections below
    val opsFilter = args.lift(1).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def want(n: String): Boolean = opsFilter.forall(_.contains(n))
    val defs: Seq[(String, () => (String, Double))] = Seq(
      "first" -> (() => run("first", ms => UniqueStreams.firstStream(ms.toDF(), Seq("key")), OutputMode.Append())),
      // Bloom twin on the same 1000-key stream (A/B against "first"), then
      // both on the all-unique-keys stream where exact state grows
      // per-event and the Bloom's 8x1Mbit stays fixed
      "firstBloom" -> (() => run("firstBloom", ms => UniqueStreams.firstStreamBloom(ms.toDF(), Seq("key"),
        numShards = 8, bitsPerShard = 1 << 20), OutputMode.Update())),
      "firstUniq" -> (() => run("firstUniq", ms => UniqueStreams.firstStream(ms.toDF(), Seq("key")),
        OutputMode.Append(), uniqEvents)),
      "firstBloomUniq" -> (() => run("firstBloomUniq", ms => UniqueStreams.firstStreamBloom(ms.toDF(), Seq("key"),
        numShards = 8, bitsPerShard = 1 << 20), OutputMode.Update(), uniqEvents)),
      "deduplicate" -> (() => run("deduplicate", ms => UniqueStreams.deduplicateStream(ms.toDF(), Seq("key"), "ts", 5000L), OutputMode.Append())),
      "deduplicateBloom" -> (() => run("deduplicateBloom", ms => UniqueStreams.deduplicateStreamBloom(
        ms.toDF(), Seq("key"), "ts", 5000L, numShards = 8, bitsPerShard = 1 << 20),
        OutputMode.Update())),
      "ever" -> (() => run("ever", ms => UniqueStreams.everStream(ms.toDF(), Seq("key")), OutputMode.Update())),
      "timeBatch" -> (() => run("timeBatch", ms => UniqueStreams.timeBatchStream(ms.toDF(), Seq("key"), "seq", "ts", 60000L), OutputMode.Append())),
      "time" -> (() => run("time", ms => UniqueStreams.timeStream(ms.toDF(), Seq("key"), "ts", 120000L), OutputMode.Update())),
      "deduplicateExact" -> (() => run("deduplicateExact", ms => UniqueStreams.deduplicateStreamExact(
        ms.toDF(), Seq("key"), "seq", "ts", 5000L), OutputMode.Update())),
      "everTtl" -> (() => run("everTtl", ms => UniqueStreams.everStreamTtl(
        ms.toDF(), Seq("key"), "ts", ttlMs = 300000L), OutputMode.Update())),
      // transformWithState requires the RocksDB provider; run last so the
      // provider switch doesn't touch the HDFS-backed runs above
      "everTws" -> (() => { UniqueStreams.useRocksDBStateStore(spark)
        run("everTws", ms => UniqueStreams.everStreamTws(
          ms.toDF(), Seq("key")), OutputMode.Update()) }),
    )
    val results = defs.filter(p => want(p._1)).map(_._2())
    // incremental near-dup throughput (docs/s, heavier per-row work than
    // the keyed ops above: shingle+minhash hashing per doc + the banded
    // index; needs RocksDB — already switched): ~25-word docs in ~n/20
    // near-dup families so the index sees real candidate traffic
    val nDocs = nEvents / 10
    val wordPool = (0 until 4000).map(i => s"w$i")
    def docText(i: Int): String = {
      val fam = i % (nDocs / 20 max 1)
      (0 until 24).map(j => wordPool((fam * 31 + j * 7) % wordPool.length))
        .mkString(" ") + s" v$i"
    }
    val docRate = if (!want("neardup")) 0.0 else {
      UniqueStreams.useRocksDBStateStore(spark) // may be filtered past everTws
      implicit val denc: org.apache.spark.sql.Encoder[DocEv] = Encoders.product[DocEv]
      val ms = MemoryStream[DocEv]
      val q = graft.streaming.NearDupStream
        .nearDupStream(ms.toDF(), "doc_id", "text", threshold = 0.2)
        .writeStream.format("memory").queryName("sb_neardup")
        .outputMode(OutputMode.Update())
        .option("checkpointLocation", Files.createTempDirectory("sb_neardup").toString)
        .start()
      val all = (0 until nDocs).map(i => DocEv(i.toLong, docText(i)))
      val per = nDocs / 10
      val t0 = System.nanoTime()
      (0 until 10).foreach { b =>
        val hi = if (b == 9) nDocs else (b + 1) * per
        ms.addData(all.slice(b * per, hi))
        q.processAllAvailable()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      q.stop()
      nDocs / secs
    }
    // incremental duplicated-span throughput (docs/s): same corpus shape
    // as the near-dup row — family docs share their 24-word body, so the
    // gram index sees constant promote/hit traffic (every family doc
    // after the first re-emits spans), the operator's heavy regime
    val dupSpanRate = if (!want("dupspan")) 0.0 else {
      UniqueStreams.useRocksDBStateStore(spark)
      implicit val denc: org.apache.spark.sql.Encoder[DocEv] = Encoders.product[DocEv]
      val ms = MemoryStream[DocEv]
      val q = graft.streaming.DupSpanStream
        .dupSpanStream(ms.toDF(), "doc_id", "text", k = 5, hashedKeys = true)
        .writeStream.format("memory").queryName("sb_dupspan")
        .outputMode(OutputMode.Update())
        .option("checkpointLocation", Files.createTempDirectory("sb_dupspan").toString)
        .start()
      val all = (0 until nDocs).map(i => DocEv(i.toLong, docText(i)))
      val per = nDocs / 10
      val t0 = System.nanoTime()
      (0 until 10).foreach { b =>
        val hi = if (b == 9) nDocs else (b + 1) * per
        ms.addData(all.slice(b * per, hi))
        q.processAllAvailable()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      q.stop()
      nDocs / secs
    }
    // stream-static SCORING tier throughput (docs/s): LM perplexity,
    // DSIR importance stats, BM25 retrieval stats — stateless
    // stream-static probe joins + ONE updating aggregation per op, the
    // deployment shape (model/index trained offline on the same
    // synthetic corpus; BM25's corpus-sized postings persisted once
    // explicitly, per its scaladoc serving contract)
    val scoringRates: Seq[(String, Double)] = if (!want("scoring")) Seq.empty else {
      implicit val denc: org.apache.spark.sql.Encoder[DocEv] = Encoders.product[DocEv]
      val all = (0 until nDocs).map(i => DocEv(i.toLong, docText(i)))
      val corpus = spark.createDataFrame(all)
      val lmModel = graft.llm.CorpusOps.lmTrain(corpus, "text")
      val dsirModel = graft.llm.CorpusOps.dsirTrain(
        corpus.filter(col("doc_id") % 10 === 0), "text",
        corpus.filter(col("doc_id") % 10 =!= 0), "text")
      val bm25Idx = graft.llm.TextSearch.bm25Index(corpus, "doc_id", "text")
      bm25Idx.postings.persist()
      bm25Idx.postings.count()
      def runDoc(name: String,
                 mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : (String, Double) = {
        val ms = MemoryStream[DocEv]
        val q = mk(ms.toDF()).writeStream.format("memory").queryName(s"sb_$name")
          .outputMode(OutputMode.Update())
          .option("checkpointLocation", Files.createTempDirectory(s"sb_$name").toString)
          .start()
        val per = nDocs / 10
        val t0 = System.nanoTime()
        (0 until 10).foreach { b =>
          val hi = if (b == 9) nDocs else (b + 1) * per
          ms.addData(all.slice(b * per, hi))
          q.processAllAvailable()
        }
        val secs = (System.nanoTime() - t0) / 1e9
        q.stop()
        name -> (nDocs / secs)
      }
      val r = Seq(
        runDoc("lmScore", df =>
          graft.streaming.LmScoreStream.lmScoreStream(df, "text", "doc_id", lmModel)),
        runDoc("dsirScore", df =>
          graft.streaming.DsirScoreStream.dsirScoreStream(df, "text", "doc_id", dsirModel)),
        runDoc("bm25Stats", df =>
          graft.streaming.Bm25SearchStream.bm25StatsStream(df, "text", "doc_id", bm25Idx)))
      bm25Idx.postings.unpersist()
      r
    }
    // WATERMARK-BOUNDED scoring state trajectory (VERDICT r13 ask #2's
    // "done" measurement): the same corpus with advancing per-doc event
    // time (doc i at i seconds) through lmScoreStream vs
    // lmScoreStreamWindowed (50 s windows, 10 s watermark); after each
    // micro-batch record the aggregation's total state rows. The
    // unwindowed form holds one row per doc EVER seen (linear growth);
    // the windowed form evicts windows below the watermark and stays at
    // the horizon (flat).
    val scoringWindowed: String = if (!want("scoring_windowed")) "" else {
      // SPARK_GRAFT_WINDOW_S varies the window (default 50 s): the
      // eviction machinery is per-WINDOW, so wider windows amortize it —
      // the knob that prices boundedness against throughput
      val windowS = sys.env.getOrElse("SPARK_GRAFT_WINDOW_S", "50").toInt
      implicit val denc: org.apache.spark.sql.Encoder[DocTsEv] = Encoders.product[DocTsEv]
      val all = (0 until nDocs).map(i =>
        DocTsEv(i.toLong, docText(i), new Timestamp(i * 1000L)))
      val corpus = spark.createDataFrame(all.map(d => DocEv(d.doc_id, d.text)))
      val lmModel = graft.llm.CorpusOps.lmTrain(corpus, "text")
      def traj(windowed: Boolean): (Seq[Long], Double) = {
        val ms = MemoryStream[DocTsEv]
        val out =
          if (windowed) graft.streaming.LmScoreStream.lmScoreStreamWindowed(
            ms.toDF(), "text", "doc_id", "event_ts", lmModel,
            s"$windowS seconds", "10 seconds")
          else graft.streaming.LmScoreStream.lmScoreStream(
            ms.toDF(), "text", "doc_id", lmModel)
        val q = out.writeStream.format("memory")
          .queryName(s"sb_lmwin_$windowed").outputMode(OutputMode.Update())
          .option("checkpointLocation",
            Files.createTempDirectory(s"sb_lmwin_$windowed").toString)
          .start()
        val rows = scala.collection.mutable.ArrayBuffer.empty[Long]
        val per = nDocs / 10
        val t0 = System.nanoTime()
        (0 until 10).foreach { b =>
          val hi = if (b == 9) nDocs else (b + 1) * per
          ms.addData(all.slice(b * per, hi))
          q.processAllAvailable()
          rows += Option(q.lastProgress)
            .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
        }
        val secs = (System.nanoTime() - t0) / 1e9
        q.stop()
        (rows.toSeq, nDocs / secs)
      }
      val (winRows, winRate) = traj(windowed = true)
      val (unRows, unRate) = traj(windowed = false)
      s""","scoring_windowed":{"docs":$nDocs,"window_s":$windowS,"watermark_s":10,""" +
        s""""windowed_state_rows":[${winRows.mkString(",")}],""" +
        s""""unwindowed_state_rows":[${unRows.mkString(",")}],""" +
        f""""windowed_docs_per_sec":$winRate%.0f,"unwindowed_docs_per_sec":$unRate%.0f}"""
    }
    // STREAMING BM25 INDEX INGESTION throughput: tagged feed (every 10th
    // arrival a query probing the ingested-so-far index), token-sharded
    // transformWithState postings + df state
    val bm25Ingest: String = if (!want("bm25_ingest")) "" else {
      UniqueStreams.useRocksDBStateStore(spark)
      implicit val tenc: org.apache.spark.sql.Encoder[TaggedEv] = Encoders.product[TaggedEv]
      // query i carries family (i/10)'s text, so it probes a family whose
      // first member (id i/10 < i) has already been ingested — real
      // candidate traffic (query i's OWN family members all arrive later)
      val all = (0 until nDocs).map(i =>
        TaggedEv(i.toLong, if (i % 10 == 0) docText(i / 10) else docText(i),
          i % 10 == 0))
      val ms = MemoryStream[TaggedEv]
      val q = graft.streaming.Bm25IngestStream
        .bm25IngestStream(ms.toDF(), "doc_id", "text", "is_query", maxDf = 1000)
        .writeStream.format("memory").queryName("sb_bm25ingest")
        .outputMode(OutputMode.Append())
        .option("checkpointLocation",
          Files.createTempDirectory("sb_bm25ingest").toString)
        .start()
      val per = nDocs / 10
      val t0 = System.nanoTime()
      (0 until 10).foreach { b =>
        val hi = if (b == 9) nDocs else (b + 1) * per
        ms.addData(all.slice(b * per, hi))
        q.processAllAvailable()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      val (stRows, stBytes) = Option(q.lastProgress)
        .map(p => (p.stateOperators.map(_.numRowsTotal).sum,
          p.stateOperators.map(_.memoryUsedBytes).sum)).getOrElse((-1L, -1L))
      val emitted = spark.table("sb_bm25ingest").count()
      q.stop()
      s""","bm25_ingest":{"arrivals":$nDocs,"probe_rows":$emitted,""" +
        s""""state_rows":$stRows,"state_bytes":$stBytes,""" +
        f""""arrivals_per_sec":${nDocs / secs}%.0f}"""
    }
    // STREAMING SemDeDup throughput (vecs/s): cell-sharded incremental
    // semantic dedup. Two regimes:
    //  - balanced: ~n/20 near-dup families spread over 32 cells (each
    //    arrival scans its own cell's members — the n²/nCells budget
    //    paid online)
    //  - hot: 50% of arrivals in ONE family (one cell holds half the
    //    corpus — the quadratic cliff). Run CAPPED: the cell saturates
    //    at maxCell, re-promotes, FREES its state, and admits the rest
    //    at O(1) — state_rows at the end must sit near the balanced
    //    cells' total, not n/2 (the batch semdedup_hotcell cliff's
    //    streaming answer)
    val semDedupArm: String = if (!want("semdedup_stream")) "" else {
      UniqueStreams.useRocksDBStateStore(spark)
      implicit val venc: org.apache.spark.sql.Encoder[VecEv] = Encoders.product[VecEv]
      val dim = 16
      val nVecs = nEvents / 10
      val nFam = (nVecs / 20) max 32
      def famBase(f: Int): Array[Double] = {
        val rnd = new scala.util.Random(f * 2654435761L)
        Array.fill(dim)(rnd.nextGaussian())
      }
      def member(f: Int, j: Int): Array[Float] = {
        val b = famBase(f)
        val rnd = new scala.util.Random(f * 31L + j * 7L + 13L)
        b.map(x => (x + 0.01 * rnd.nextGaussian()).toFloat)
      }
      def feed(hot: Boolean)(i: Int): VecEv = {
        val f = if (hot && i % 2 == 0) 0 else i % nFam
        VecEv(i.toLong, member(f, i / nFam))
      }
      def runSd(name: String, hot: Boolean, maxCell: Int): (Double, Long, Long, Long) = {
        val all = (0 until nVecs).map(feed(hot))
        val corpus = spark.createDataFrame(all)
        val cents = graft.llm.Similarity.semDedupCentroids(corpus, "vec_id",
          "embedding", dim = dim, nCells = 32, lloydIters = 0)
        val ms = MemoryStream[VecEv]
        val q = graft.streaming.SemDedupStream
          .semDedupStream(ms.toDF(), "vec_id", "embedding", dim = dim,
            eps = 0.9, centroids = cents, maxCell = maxCell)
          .writeStream.format("memory").queryName(s"sb_$name")
          .outputMode(OutputMode.Update())
          .option("checkpointLocation", Files.createTempDirectory(s"sb_$name").toString)
          .start()
        val per = nVecs / 10
        val t0 = System.nanoTime()
        (0 until 10).foreach { b =>
          val hi = if (b == 9) nVecs else (b + 1) * per
          ms.addData(all.slice(b * per, hi))
          q.processAllAvailable()
        }
        val secs = (System.nanoTime() - t0) / 1e9
        val (stRows, stBytes) = Option(q.lastProgress)
          .map(p => (p.stateOperators.map(_.numRowsTotal).sum,
            p.stateOperators.map(_.memoryUsedBytes).sum)).getOrElse((-1L, -1L))
        val saturated = spark.table(s"sb_$name")
          .filter(col("change") === "saturated").count()
        q.stop()
        (nVecs / secs, stRows, stBytes, saturated)
      }
      val (balRate, balRows, balBytes, _) = runSd("sd_bal", hot = false, Int.MaxValue)
      val hotCap = (nVecs / 32) * 2
      val (hotRate, hotRows, hotBytes, hotSat) = runSd("sd_hot", hot = true, hotCap)
      s""","semdedup_stream":{"vecs":$nVecs,"cells":32,"eps":0.9,""" +
        f""""balanced_vecs_per_sec":$balRate%.0f,"balanced_state_rows":$balRows,"balanced_state_bytes":$balBytes,""" +
        s""""hot_cap":$hotCap,"hot_saturated_cells":$hotSat,""" +
        f""""hot_capped_vecs_per_sec":$hotRate%.0f,"hot_state_rows":$hotRows,"hot_state_bytes":$hotBytes}"""
    }
    // QUOTA-ADMISSION tier throughput (docs/s): per-group row cap and
    // token-budget mixing at the ingest point — the O(1)/arrival,
    // one-long-per-group operators. Groups = nDocs/50 sources; caps set
    // so roughly half the feed is rejected (the steady state a filled
    // quota spends its life in)
    val quotaArm: String = if (!want("quota_stream")) "" else {
      UniqueStreams.useRocksDBStateStore(spark)
      implicit val denc: org.apache.spark.sql.Encoder[DocEv] = Encoders.product[DocEv]
      val nGroups = (nDocs / 50) max 1
      val all = (0 until nDocs).map(i => DocEv(i.toLong, docText(i)))
      val balancedSrc =
        concat(lit("s"), pmod(col("doc_id"), lit(nGroups)).cast("string"))
      // hot assignment: 90% of arrivals land on ONE source, the rest
      // spread over the remaining groups
      val hotSrc = when(pmod(col("doc_id"), lit(10)) < 9, lit("hotsrc"))
        .otherwise(concat(lit("s"), pmod(col("doc_id"), lit(nGroups)).cast("string")))
      def runQ(name: String,
               mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
               srcExpr: org.apache.spark.sql.Column = balancedSrc)
      : (Double, Long, Long) = {
        val ms = MemoryStream[DocEv]
        val q = mk(ms.toDF().withColumn("src", srcExpr))
          .writeStream.format("memory").queryName(s"sb_$name")
          .outputMode(OutputMode.Append())
          .option("checkpointLocation", Files.createTempDirectory(s"sb_$name").toString)
          .start()
        val per = nDocs / 10
        val t0 = System.nanoTime()
        (0 until 10).foreach { b =>
          val hi = if (b == 9) nDocs else (b + 1) * per
          ms.addData(all.slice(b * per, hi))
          q.processAllAvailable()
        }
        val secs = (System.nanoTime() - t0) / 1e9
        val stRows = Option(q.lastProgress)
          .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
        val admitted = spark.table(s"sb_$name").count()
        q.stop()
        (nDocs / secs, stRows, admitted)
      }
      val (capRate, capRows, capAdm) = runQ("quota_cap", df =>
        graft.streaming.QuotaStream.capPerGroupStream(df, "src", "doc_id", 25))
      val (tokRate, tokRows, tokAdm) = runQ("quota_tok", df =>
        graft.streaming.QuotaStream.tokenBudgetStream(df, "src", "doc_id",
          "text", defaultBudget = 625L))
      // HOT-SOURCE pricing (r15 VERDICT #8): 90% of arrivals on ONE
      // group — the single-shard admission ceiling. Admission is
      // O(1)/arrival (one long of state, no member scan), so the hot
      // shard THROTTLES rather than grinds; the hot/balanced ratio is
      // that ceiling's price. Sub-sharding cannot preserve the
      // sequential greedy-fill contract: admitting arrival k needs the
      // running token sum of arrivals 1..k-1 of the SAME group, so any
      // split either serializes on a shared counter (same ceiling,
      // more machinery) or changes the admitted set. A saturating hot
      // source self-heals: once its quota fills, its shard drains
      // arrivals without state writes (the n >= budget fast path).
      val (capHotRate, _, capHotAdm) = runQ("quota_cap_hot", df =>
        graft.streaming.QuotaStream.capPerGroupStream(df, "src", "doc_id", 25),
        hotSrc)
      val (tokHotRate, _, tokHotAdm) = runQ("quota_tok_hot", df =>
        graft.streaming.QuotaStream.tokenBudgetStream(df, "src", "doc_id",
          "text", defaultBudget = 625L), hotSrc)
      // the worst case: a hot source whose budget NEVER fills — every
      // arrival runs the full admit path (count tokens, append, update
      // state) through one sequential shard; this rate is the honest
      // single-shard ceiling (the saturating arms above self-heal)
      val (tokHotUnbRate, _, tokHotUnbAdm) = runQ("quota_tok_hot_unb", df =>
        graft.streaming.QuotaStream.tokenBudgetStream(df, "src", "doc_id",
          "text", defaultBudget = Long.MaxValue / 4), hotSrc)
      s""","quota_stream":{"docs":$nDocs,"groups":$nGroups,""" +
        f""""cap_docs_per_sec":$capRate%.0f,"cap_state_rows":$capRows,"cap_admitted":$capAdm,""" +
        f""""token_docs_per_sec":$tokRate%.0f,"token_state_rows":$tokRows,"token_admitted":$tokAdm,""" +
        f""""cap_hot_docs_per_sec":$capHotRate%.0f,"cap_hot_admitted":$capHotAdm,""" +
        f""""token_hot_docs_per_sec":$tokHotRate%.0f,"token_hot_admitted":$tokHotAdm,""" +
        f""""token_hot_unbounded_docs_per_sec":$tokHotUnbRate%.0f,""" +
        f""""token_hot_unbounded_admitted":$tokHotUnbAdm}"""
    }
    val qs = (results ++ scoringRates)
      .map { case (k, v) => f""""$k":${v}%.0f""" }.mkString("{", ",", "}")
    val st = stateOf.map { case (k, (r, b)) => s""""$k":{"rows":$r,"bytes":$b}""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"streaming_events_per_sec","n_events":$nEvents,"micro_batches":10,"ops":$qs,"state":$st,"neardup_docs":$nDocs,"neardup_docs_per_sec":${f"$docRate%.0f"},"dupspan_docs_per_sec":${f"$dupSpanRate%.0f"}$scoringWindowed$bm25Ingest$semDedupArm$quotaArm}""")
    spark.stop()
  }
}
