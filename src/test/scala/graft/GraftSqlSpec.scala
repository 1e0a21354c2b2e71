package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL registration surface: the same Catalyst expressions reachable
  * from spark.sql text.
  */
class GraftSqlSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  GraftSql.register(spark)

  test("scalar functions run from SQL text") {
    val r = spark.sql(
      """SELECT graft_lang_id('der Hund und die Katze sind nicht im Haus') AS lang,
        |  graft_jaccard(array('a','b','c'), array('b','c','d')) AS j,
        |  graft_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS cos,
        |  size(graft_tokenize('Hello, World! Again')) AS n_tok,
        |  size(graft_shingles(array('a','b','c','d'), 3)) AS n_sh,
        |  size(graft_minhash(array('x y z'), 8)) AS n_sig
        |""".stripMargin).head()
    assert(r.getString(0) === "de")
    assert(math.abs(r.getDouble(1) - 0.5) < 1e-9)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)
    assert(r.getInt(3) === 3)
    assert(r.getInt(4) === 2)
    assert(r.getInt(5) === 8)
  }

  test("SQL functions compose with tables and aggregation") {
    Tables.documents(spark, "/root/testdata/sf0.001").createOrReplaceTempView("docs")
    val counts = spark.sql(
      """SELECT graft_lang_id(text) AS pred, count(*) AS n
        |FROM docs GROUP BY 1""".stripMargin)
    assert(counts.count() > 0)
    assert(counts.agg(org.apache.spark.sql.functions.sum("n")).as[Long].head() === 500L)
  }

  test("non-literal shingle size is rejected eagerly") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingles(array('a'), 1 + 2ifoo)").collect()
    }
    assert(e != null) // parse/analysis failure either way — never silent
  }

  test("unique window operators run as table-valued functions in FROM") {
    Seq((1L, "a", 1L), (2L, "a", 2L), (3L, "b", 3L), (4L, "a", 4L), (5L, "c", 5L))
      .toDF("ms", "ip", "seq")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_millis(
        org.apache.spark.sql.functions.col("ms")))
      .createOrReplaceTempView("logins_tvf")
    val ever = spark.sql(
      "SELECT ip, seq FROM unique_ever('logins_tvf', 'seq', 'ip')")
      .as[(String, Long)].collect().toSet
    assert(ever === Set(("a", 4L), ("b", 3L), ("c", 5L)))
    val first = spark.sql(
      "SELECT ip, seq FROM unique_first('logins_tvf', 'seq', 'ip')")
      .as[(String, Long)].collect().toSet
    assert(first === Set(("a", 1L), ("b", 3L), ("c", 5L)))
    val len = spark.sql(
      "SELECT ip, seq FROM unique_length('logins_tvf', 'seq', 2, 'ip')")
      .as[(String, Long)].collect().toSet
    assert(len === Set(("a", 4L), ("c", 5L))) // 2 most recent distinct keys
    val dedup = spark.sql(
      "SELECT ip, seq FROM unique_deduplicate('logins_tvf', 'seq', 'ts', 2, 'ip')")
      .as[(String, Long)].collect().toSet
    assert(dedup === Set(("a", 1L), ("b", 3L), ("a", 4L), ("c", 5L))) // a@2 within 2ms of a@1
    val time = spark.sql(
      "SELECT ip, seq FROM unique_time('logins_tvf', 'seq', 'ts', 3, 'ip')")
      .as[(String, Long)].collect().toSet
    // horizon = max ms (5) - 3 → latest-per-key with ms > 2
    assert(time === Set(("a", 4L), ("b", 3L), ("c", 5L)))
    // TVFs compose with ordinary SQL: joins, filters, aggregation
    val agg = spark.sql(
      """SELECT count(*) AS n FROM unique_ever('logins_tvf', 'seq', 'ip') w
        |JOIN logins_tvf l ON w.seq = l.seq WHERE l.ms > 2""".stripMargin)
      .as[Long].head()
    assert(agg === 3L)
  }

  test("all 11 reference windows are callable as TVFs (batch-family spot checks)") {
    // fixture from the TVF test above: (ms, ip, seq) = (1,a,1) (2,a,2)
    // (3,b,3) (4,a,4) (5,c,5); counts hand-derived per operator semantics
    def n(sql: String): Long = spark.sql(sql).count()
    assert(n("SELECT * FROM unique_time_batch('logins_tvf', 'seq', 'ts', 2, 'ip')") === 5L)
    assert(n("SELECT * FROM unique_first_time_batch('logins_tvf', 'seq', 'ts', 2, 'ip')") === 5L)
    assert(n("SELECT * FROM unique_external_time_batch('logins_tvf', 'seq', 'ts', 2, 'ip')") === 4L)
    val lb = spark.sql(
      "SELECT ip, seq FROM unique_length_batch('logins_tvf', 'seq', 2, 'ip')")
      .as[(String, Long)].collect().toSet
    assert(lb === Set(("a", 2L), ("b", 3L), ("a", 4L), ("c", 5L)))
    val flb = spark.sql(
      "SELECT ip, seq FROM unique_first_length_batch('logins_tvf', 'seq', 2, 'ip')")
      .as[(String, Long)].collect().toSet
    assert(flb === Set(("a", 1L), ("b", 3L), ("a", 4L), ("c", 5L)))
    val tlb = spark.sql(
      "SELECT ip, seq FROM unique_time_length_batch('logins_tvf', 'seq', 'ts', 10, 2, 'ip')")
      .as[(String, Long)].collect().toSet
    assert(tlb === Set(("a", 2L), ("b", 3L))) // length flush at 2nd distinct key, then latch
  }

  test("TVFs accept the ANSI TABLE(...) argument form") {
    Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("seq", "ip")
      .createOrReplaceTempView("t_table_arg")
    val r = spark.sql("SELECT ip, seq FROM unique_ever(TABLE(t_table_arg), 'seq', 'ip')")
      .as[(String, Long)].collect().toSet
    assert(r === Set(("a", 2L), ("b", 3L)))
  }

  test("TVF validation fails eagerly on bad arguments") {
    intercept[Exception](spark.sql("SELECT * FROM unique_ever('logins_tvf', 'seq')").collect())
    intercept[Exception](
      spark.sql("SELECT * FROM unique_ever('no_such_table', 'seq', 'ip')").collect())
  }

  test("LLM-pipeline TVFs: exact dedup, minhash pairs, knn from SQL") {
    Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "unrelated words about telescopes and astronomy tonight"))
      .toDF("doc_id", "text").createOrReplaceTempView("docs_tvf")
    val dedup = spark.sql(
      "SELECT doc_id FROM graft_exact_dedup('docs_tvf', 'doc_id', 'text')")
      .as[Long].collect().toSet
    assert(dedup === Set(1L, 3L)) // lowest id wins the identical pair
    val pairs = spark.sql(
      "SELECT id_a, id_b FROM graft_minhash_pairs('docs_tvf', 'text', 'doc_id', 0.9)")
      .as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
    Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding").createOrReplaceTempView("vecs_tvf")
    val nn = spark.sql(
      """SELECT corpus_id FROM graft_knn(TABLE(vecs_tvf),
        |  TABLE(SELECT * FROM vecs_tvf WHERE vec_id = 0), 'vec_id', 'embedding', 1)
        |""".stripMargin).as[Long].collect().toSeq
    assert(nn === Seq(1L)) // nearest non-self neighbor
    val survivors = spark.sql(
      "SELECT doc_id FROM graft_neardup_dedup('docs_tvf', 'doc_id', 'text', 0.9)")
      .as[Long].collect().toSet
    assert(survivors === Set(1L, 3L)) // doc 2 loses its near-dup cluster to doc 1
  }

  test("near-dup and ANN TVFs from SQL: simhash/ngram/vector pairs, lsh + ivf top-k") {
    Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "unrelated words about telescopes and astronomy tonight"))
      .toDF("doc_id", "text").createOrReplaceTempView("docs_nd_tvf")
    val sp = spark.sql(
      "SELECT id_a, id_b FROM graft_simhash_pairs('docs_nd_tvf', 'text', 'doc_id', 3)")
      .as[(Long, Long)].collect().toSet
    assert(sp === Set((1L, 2L))) // identical text → hamming 0
    val np = spark.sql(
      "SELECT id_a, id_b FROM graft_ngram_pairs('docs_nd_tvf', 'text', 'doc_id', 0.5)")
      .as[(Long, Long)].collect().toSet
    assert(np === Set((1L, 2L)))
    // 64-dim corpus (the TVFs run the production dim=64 defaults): one
    // near-identical pair + one unrelated direction
    val base = Array.tabulate(64)(i => math.sin(i + 1.0).toFloat)
    val near = base.clone(); near(0) = near(0) + 0.01f
    val ortho = Array.tabulate(64)(i => math.cos(3.0 * i + 2.0).toFloat)
    Seq((0L, base), (1L, near), (2L, ortho))
      .toDF("vec_id", "embedding").createOrReplaceTempView("vecs64_tvf")
    val nd = spark.sql(
      "SELECT id_a, id_b FROM graft_neardup_pairs('vecs64_tvf', 'vec_id', 'embedding', 0.99)")
      .as[(Long, Long)].collect().toSet
    assert(nd === Set((0L, 1L)))
    val lsh = spark.sql(
      """SELECT corpus_id FROM graft_ann_lsh(TABLE(vecs64_tvf),
        |  TABLE(SELECT * FROM vecs64_tvf WHERE vec_id = 0), 'vec_id', 'embedding', 1)
        |""".stripMargin).as[Long].collect().toSeq
    assert(lsh === Seq(1L))
    val ivf = spark.sql(
      """SELECT corpus_id FROM graft_ann_ivf(TABLE(vecs64_tvf),
        |  TABLE(SELECT * FROM vecs64_tvf WHERE vec_id = 0), 'vec_id', 'embedding', 1, 2, 2)
        |""".stripMargin).as[Long].collect().toSeq
    assert(ivf === Seq(1L))
    // PQ two-stage: with only 2 anchors the ADC stage cannot separate the
    // orthogonal row from the near-identical one (ortho's codes collapse
    // onto the base anchor, reconstructing TO the query — correct ADC
    // behavior at codebook saturation), so the exact re-rank (refine=3)
    // is what recovers the true neighbor
    val pq = spark.sql(
      """SELECT corpus_id FROM graft_ann_pq(TABLE(vecs64_tvf),
        |  TABLE(SELECT * FROM vecs64_tvf WHERE vec_id = 0), 'vec_id', 'embedding', 1, 8, 2, 3)
        |""".stripMargin).as[Long].collect().toSeq
    assert(pq === Seq(1L))
  }

  test("graft_fuzzy_decontam and graft_cap_per_group pin to the Scala API") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    docs.createOrReplaceTempView("docs_fz_tvf")
    val viaSql = spark.sql(
      """SELECT doc_id FROM graft_fuzzy_decontam(
        |  TABLE(SELECT * FROM docs_fz_tvf WHERE doc_id % 10 <> 0),
        |  TABLE(SELECT * FROM docs_fz_tvf WHERE doc_id % 10 = 0),
        |  'doc_id', 'text', 0.2)""".stripMargin)
      .as[Long].collect().toSet
    val viaApi = llm.TextDedup.fuzzyDecontaminate(
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 =!= 0),
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0),
        "doc_id", "text", threshold = 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(viaSql === viaApi)
    assert(viaSql.nonEmpty)
    val capSql = spark.sql(
      "SELECT doc_id FROM graft_cap_per_group('docs_fz_tvf', 'source', 'doc_id', 5)")
      .as[Long].collect().toSet
    val capApi = llm.CorpusOps.capPerGroup(docs, "source", "doc_id", 5)
      .select("doc_id").as[Long].collect().toSet
    assert(capSql === capApi)
    assert(capSql.nonEmpty)
  }

  test("graft_ann_ivfpq TVF pins to ivfPqTopK for direct AND residual encoding") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    emb.createOrReplaceTempView("emb_ivfpq_tvf")
    Seq(0L, 1L).foreach { res =>
      val viaSql = spark.sql(
        s"""SELECT query_id, corpus_id, rank FROM graft_ann_ivfpq(
           |  TABLE(emb_ivfpq_tvf),
           |  TABLE(SELECT * FROM emb_ivfpq_tvf WHERE vec_id < 5),
           |  'vec_id', 'embedding', 10, 16, 4, 8, $res)
           |""".stripMargin).as[(Long, Long, Int)].collect().toSet
      val viaApi = llm.Similarity.ivfPqTopK(emb,
          emb.filter(org.apache.spark.sql.functions.col("vec_id") < 5),
          "vec_id", "embedding", 10, nCells = 16, nProbe = 4, nSub = 8,
          residual = res != 0L)
        .select("query_id", "corpus_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
      assert(viaSql === viaApi, s"residual=$res TVF diverged from the Scala API")
      assert(viaSql.nonEmpty)
    }
  }

  test("graft_dsir TVF pins to CorpusOps.dsirSelect") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    docs.filter($"doc_id" % 10 =!= 0).createOrReplaceTempView("dsir_raw_tvf")
    docs.filter($"doc_id" % 10 === 0).createOrReplaceTempView("dsir_tgt_tvf")
    val viaSql = spark.sql(
      """SELECT doc_id FROM graft_dsir(
        |  TABLE(dsir_raw_tvf), TABLE(dsir_tgt_tvf), 'doc_id', 'text', 30)
        |""".stripMargin).as[Long].collect().toSeq
    val raw = docs.filter($"doc_id" % 10 =!= 0)
    val model = llm.CorpusOps.dsirTrain(
      docs.filter($"doc_id" % 10 === 0), "text", raw, "text")
    val viaApi = llm.CorpusOps.dsirSelect(raw, "doc_id", "text", model, k = 30)
      .select("doc_id").as[Long].collect().toSeq
    assert(viaSql === viaApi, "TVF diverged from the Scala API")
    assert(viaApi.size === 30)
  }

  test("graft_bm25 TVF pins to TextSearch.bm25TopK") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    docs.filter($"doc_id" % 10 =!= 0).createOrReplaceTempView("bm25_corpus_tvf")
    docs.filter($"doc_id" % 10 === 0).createOrReplaceTempView("bm25_queries_tvf")
    val viaSql = spark.sql(
      """SELECT query_id, doc_id, rank FROM graft_bm25(
        |  TABLE(bm25_corpus_tvf), TABLE(bm25_queries_tvf),
        |  'doc_id', 'text', 5)
        |""".stripMargin).as[(Long, Long, Int)].collect().toSet
    val idx = llm.TextSearch.bm25Index(
      docs.filter($"doc_id" % 10 =!= 0), "doc_id", "text")
    val viaApi = llm.TextSearch.bm25TopK(
        docs.filter($"doc_id" % 10 === 0), "doc_id", "text", idx, k = 5)
      .select("query_id", "doc_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(viaSql === viaApi, "TVF diverged from the Scala API")
    assert(viaApi.nonEmpty)
  }

  test("graft_semdedup TVF pins to Similarity.semDedup") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    emb.createOrReplaceTempView("emb_semdedup_tvf")
    val viaSql = spark.sql(
      """SELECT vec_id FROM graft_semdedup(
        |  TABLE(emb_semdedup_tvf), 'vec_id', 'embedding', 64, 0.3, 16, 1)
        |""".stripMargin).as[Long].collect().toSet
    val viaApi = llm.Similarity.semDedup(emb, "vec_id", "embedding",
        dim = 64, eps = 0.3, nCells = 16, lloydIters = 1)
      .as[Long].collect().toSet
    assert(viaSql === viaApi, "TVF diverged from the Scala API")
    assert(viaApi.nonEmpty && viaApi.size < emb.count(),
      "fixture should drop at least one semantic duplicate")
  }

  test("graft_semdedup TVF optional max_cell arg pins to the Scala API " +
      "at a cap-binding geometry") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    emb.createOrReplaceTempView("emb_semdedup_cap_tvf")
    // nCells=2 halves the corpus; a cap of n/2 - 1 is guaranteed to drop
    // at least the larger cell, so the capped set must differ from the
    // uncapped fixture above whenever that cell held any ε-pair
    val cap = (emb.count() / 2 - 1).toInt
    val viaSql = spark.sql(
      s"""SELECT vec_id FROM graft_semdedup(
         |  TABLE(emb_semdedup_cap_tvf), 'vec_id', 'embedding', 64, 0.3, 2, 1, $cap)
         |""".stripMargin).as[Long].collect().toSet
    val viaApi = llm.Similarity.semDedup(emb, "vec_id", "embedding",
        dim = 64, eps = 0.3, nCells = 2, lloydIters = 1, maxCell = cap)
      .as[Long].collect().toSet
    assert(viaSql === viaApi, "TVF max_cell diverged from the Scala API")
  }

  test("graft_token_mix TVF pins to CorpusOps.mixByTokenBudget") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    docs.createOrReplaceTempView("docs_tokenmix_tvf")
    val viaSql = spark.sql(
      """SELECT doc_id, source, n_tok, tok_before FROM graft_token_mix(
        |  TABLE(docs_tokenmix_tvf), 'doc_id', 'text', 'source', 300)
        |""".stripMargin).as[(Long, String, Int, Long)].collect().toSet
    val viaApi = llm.CorpusOps.mixByTokenBudget(docs, "doc_id", "text",
        "source", defaultBudget = 300L)
      .as[(Long, String, Int, Long)].collect().toSet
    assert(viaSql === viaApi, "TVF diverged from the Scala API")
    assert(viaApi.nonEmpty && viaApi.size < docs.count(),
      "fixture should cut at least one source's tail")
  }

  test("graft_token_mix_segmented TVF pins to the Scala API and the " +
      "window-form TVF (identical admission set)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    docs.createOrReplaceTempView("docs_tokenmix_seg_tvf")
    val viaSql = spark.sql(
      """SELECT doc_id, source, n_tok, tok_before FROM graft_token_mix_segmented(
        |  TABLE(docs_tokenmix_seg_tvf), 'doc_id', 'text', 'source', 300, 8)
        |""".stripMargin).as[(Long, String, Int, Long)].collect().toSet
    val viaApi = llm.CorpusOps.mixByTokenBudgetSegmented(docs, "doc_id",
        "text", "source", defaultBudget = 300L, rangeWidth = 8L)
      .as[(Long, String, Int, Long)].collect().toSet
    assert(viaSql === viaApi, "TVF diverged from the Scala API")
    val viaWindow = spark.sql(
      """SELECT doc_id, source, n_tok, tok_before FROM graft_token_mix(
        |  TABLE(docs_tokenmix_seg_tvf), 'doc_id', 'text', 'source', 300)
        |""".stripMargin).as[(Long, String, Int, Long)].collect().toSet
    assert(viaSql === viaWindow, "segmented TVF diverged from the window TVF")
    intercept[IllegalArgumentException] {
      spark.sql("""SELECT * FROM graft_token_mix_segmented(
        |  TABLE(docs_tokenmix_seg_tvf), 'doc_id', 'text', 'source', 300)
        |""".stripMargin)
    }
  }

  test("graft_editdist_decontam TVF pins to the Scala API") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 =!= 0)
      .createOrReplaceTempView("decontam_train_tvf")
    docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0)
      .createOrReplaceTempView("decontam_eval_tvf")
    val viaSql = spark.sql(
      """SELECT doc_id FROM graft_editdist_decontam(
        |  TABLE(decontam_train_tvf), TABLE(decontam_eval_tvf),
        |  'text', 'doc_id', 5)
        |""".stripMargin).as[Long].collect().toSet
    val viaApi = llm.TextDedup.editDecontaminate(
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 =!= 0),
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0), "doc_id", "text", maxDist = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(viaSql === viaApi, "TVF diverged from the Scala API")
    intercept[IllegalArgumentException] {
      spark.sql("""SELECT * FROM graft_editdist_decontam(
        |  TABLE(decontam_train_tvf), TABLE(decontam_eval_tvf), 'text', 'doc_id')
        |""".stripMargin)
    }
  }

  test("graft_image TVFs pin to the Scala API (hashes, pairs, dedup)") {
    val ids = spark.range(0, 60).toDF("doc_id")
    llm.Multimodal.withSyntheticPatternImages(ids, "doc_id")
      .createOrReplaceTempView("img_tvf")
    val hSql = spark.sql(
      "SELECT id, dhash, ahash FROM graft_image_hashes(TABLE(img_tvf), 'doc_id')")
      .as[(Long, Long, Long)].collect().toSet
    val hApi = llm.Multimodal.imageHashes(
        llm.Multimodal.withSyntheticPatternImages(ids, "doc_id"), "doc_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(hSql === hApi, "hashes TVF diverged from the Scala API")
    val pSql = spark.sql(
      "SELECT id_a, id_b, hamming FROM graft_image_pairs(TABLE(img_tvf), 'doc_id', 3)")
      .as[(Long, Long, Int)].collect().toSet
    val pApi = llm.TextDedup.hammingHashPairs(
        llm.Multimodal.imageHashes(
          llm.Multimodal.withSyntheticPatternImages(ids, "doc_id"), "doc_id"),
        "id", "dhash", maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(pSql === pApi && pSql.nonEmpty, "pairs TVF diverged from the Scala API")
    val dSql = spark.sql(
      "SELECT doc_id FROM graft_image_dedup(TABLE(img_tvf), 'doc_id', 3)")
      .as[Long].collect().toSet
    assert(dSql.nonEmpty && dSql.size < 60, "dedup TVF should drop near-dups")
    intercept[IllegalArgumentException] {
      spark.sql("SELECT * FROM graft_image_pairs(TABLE(img_tvf), 'doc_id', 4)")
    }
  }

  test("graft_audio TVFs pin to the Scala API") {
    val ids = spark.range(0, 60).toDF("doc_id")
    llm.Multimodal.withSyntheticWavs(ids, "doc_id")
      .createOrReplaceTempView("wav_tvf")
    val hSql = spark.sql(
      "SELECT id, whash FROM graft_audio_hashes(TABLE(wav_tvf), 'doc_id')")
      .as[(Long, Long)].collect().toSet
    val hApi = llm.Multimodal.audioHashes(
        llm.Multimodal.withSyntheticWavs(ids, "doc_id"), "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(hSql === hApi, "audio hashes TVF diverged from the Scala API")
    val dSql = spark.sql(
      "SELECT doc_id FROM graft_audio_dedup(TABLE(wav_tvf), 'doc_id', 2)")
      .as[Long].collect().toSet
    assert(dSql.nonEmpty && dSql.size < 60, "audio dedup TVF should drop near-dups")
    intercept[IllegalArgumentException] {
      spark.sql("SELECT * FROM graft_audio_pairs(TABLE(wav_tvf), 'doc_id', 4)")
    }
  }

  test("graft_video and graft_audio_seg TVFs pin to the Scala API") {
    val ids = spark.range(0, 60).toDF("doc_id")
    llm.Multimodal.withSyntheticVideoClips(ids, "doc_id")
      .createOrReplaceTempView("vid_tvf")
    val hSql = spark.sql(
      "SELECT id, frame_idx, fhash FROM graft_video_hashes(TABLE(vid_tvf), 'doc_id')")
      .as[(Long, Int, Long)].collect().toSet
    val hApi = llm.Multimodal.videoFrameHashes(
        llm.Multimodal.withSyntheticVideoClips(ids, "doc_id"), "doc_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(hSql === hApi, "video hashes TVF diverged from the Scala API")
    val pSql = spark.sql(
      "SELECT id_a, id_b FROM graft_video_pairs(TABLE(vid_tvf), 'doc_id', 2, 0.5)")
      .as[(Long, Long)].collect().toSet
    val pApi = llm.TextDedup.frameSequencePairs(
        llm.Multimodal.videoFrameHashes(
          llm.Multimodal.withSyntheticVideoClips(ids, "doc_id"), "doc_id"),
        "id", "frame_idx", "fhash", shingleK = 2, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pSql === pApi && pSql.nonEmpty, "video pairs TVF diverged")
    val dSql = spark.sql(
      "SELECT doc_id FROM graft_video_dedup(TABLE(vid_tvf), 'doc_id', 2, 0.5)")
      .as[Long].collect().toSet
    assert(dSql.nonEmpty && dSql.size < 60, "video dedup TVF should drop near-dups")
    intercept[IllegalArgumentException] {
      spark.sql("SELECT * FROM graft_video_pairs(TABLE(vid_tvf), 'doc_id', 0, 0.5)")
    }
    intercept[IllegalArgumentException] {
      spark.sql("SELECT * FROM graft_video_dedup(TABLE(vid_tvf), 'doc_id', 2, 1.5)")
    }
    llm.Multimodal.withSyntheticOffsetWavs(ids, "doc_id")
      .createOrReplaceTempView("seg_tvf")
    val sSql = spark.sql(
      "SELECT id, seg_idx, shash FROM graft_audio_seg_hashes(TABLE(seg_tvf), 'doc_id')")
      .as[(Long, Int, Long)].collect().toSet
    val sApi = llm.Multimodal.audioSegmentHashes(
        llm.Multimodal.withSyntheticOffsetWavs(ids, "doc_id"), "doc_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(sSql === sApi, "audio segment hashes TVF diverged")
    val spSql = spark.sql(
      "SELECT id_a, id_b FROM graft_audio_seg_pairs(TABLE(seg_tvf), 'doc_id', 3)")
      .as[(Long, Long)].collect().toSet
    val spApi = llm.TextDedup.sharedKeyPairs(
        llm.Multimodal.audioSegmentHashes(
          llm.Multimodal.withSyntheticOffsetWavs(ids, "doc_id"), "doc_id"),
        "id", "shash", minShared = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(spSql === spApi && spSql.nonEmpty, "audio segment pairs TVF diverged")
    intercept[IllegalArgumentException] {
      spark.sql("SELECT * FROM graft_audio_seg_pairs(TABLE(seg_tvf), 'doc_id', 0)")
    }
  }

  test("graft_image_tile TVFs pin to the Scala API") {
    val ids = spark.range(0, 60).toDF("doc_id")
    llm.Multimodal.withSyntheticCropImages(ids, "doc_id")
      .createOrReplaceTempView("tile_tvf")
    val hSql = spark.sql(
      "SELECT id, tile_x, tile_y, thash FROM graft_image_tile_hashes(TABLE(tile_tvf), 'doc_id')")
      .as[(Long, Int, Int, Long)].collect().toSet
    val hApi = llm.Multimodal.imageTileHashes(
        llm.Multimodal.withSyntheticCropImages(ids, "doc_id"), "doc_id")
      .as[(Long, Int, Int, Long)].collect().toSet
    assert(hSql === hApi, "tile hashes TVF diverged from the Scala API")
    val pSql = spark.sql(
      "SELECT id_a, id_b FROM graft_image_crop_pairs(TABLE(tile_tvf), 'doc_id', 10)")
      .as[(Long, Long)].collect().toSet
    val pApi = llm.TextDedup.sharedKeyPairs(
        llm.Multimodal.imageTileHashes(
          llm.Multimodal.withSyntheticCropImages(ids, "doc_id"), "doc_id"),
        "id", "thash", minShared = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pSql === pApi && pSql.nonEmpty, "crop pairs TVF diverged")
    intercept[IllegalArgumentException] {
      spark.sql("SELECT * FROM graft_image_crop_pairs(TABLE(tile_tvf), 'doc_id', 0)")
    }
  }

  test("graft_quality_clf and graft_bpe_encode TVFs pin to the Scala API") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    docs.createOrReplaceTempView("clf_docs_tvf")
    docs.filter(org.apache.spark.sql.functions.col("lang") === "en")
      .createOrReplaceTempView("clf_pos_tvf")
    docs.filter(org.apache.spark.sql.functions.col("lang") =!= "en")
      .createOrReplaceTempView("clf_neg_tvf")
    val viaSql = spark.sql(
      """SELECT doc_id, n_grams, hit_pos, hit_neg FROM graft_quality_clf(
        |  TABLE(clf_docs_tvf), TABLE(clf_pos_tvf), TABLE(clf_neg_tvf),
        |  'doc_id', 'text', 2)
        |""".stripMargin).as[(Long, Long, Long, Long)].collect().toSet
    val model = llm.CorpusOps.qualityClfTrain(
      docs.filter(org.apache.spark.sql.functions.col("lang") === "en"),
      docs.filter(org.apache.spark.sql.functions.col("lang") =!= "en"),
      "text", hexChars = 2)
    val viaApi = llm.CorpusOps.qualityClfScore(docs, "doc_id", "text", model)
      .select("doc_id", "n_grams", "hit_pos", "hit_neg")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(viaSql === viaApi, "quality clf TVF diverged from the Scala API")
    val bpeSql = spark.sql(
      """SELECT doc_id, token_ids FROM graft_bpe_encode(
        |  TABLE(clf_docs_tvf), 'doc_id', 'text', 16)
        |""".stripMargin).as[(Long, Seq[Int])].collect().toMap
    val bpeModel = llm.Bpe.train(docs, "doc_id", "text", numMerges = 16)
    val bpeApi = docs.select(org.apache.spark.sql.functions.col("doc_id"),
        llm.Bpe.encode(org.apache.spark.sql.functions.col("text"), bpeModel)
          .as("token_ids"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(bpeSql === bpeApi, "bpe TVF diverged from the Scala API")
  }

  test("graft_editdist TVFs pin to the Scala API") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    docs.createOrReplaceTempView("docs_editdist_tvf")
    val viaSql = spark.sql(
      """SELECT id_a, id_b, dist FROM graft_editdist_pairs(
        |  TABLE(docs_editdist_tvf), 'text', 'doc_id', 5, 5, 4, 4, 1000)
        |""".stripMargin).as[(Long, Long, Int)].collect().toSet
    val viaApi = llm.TextDedup.editDistancePairs(docs, "text", "doc_id",
        maxDist = 5, shingleN = 5, bands = 4, rowsPerBand = 4)
      .as[(Long, Long, Int)].collect().toSet
    assert(viaSql === viaApi, "pairs TVF diverged from the Scala API")
    val dedupSql = spark.sql(
      """SELECT doc_id FROM graft_editdist_dedup(
        |  TABLE(docs_editdist_tvf), 'text', 'doc_id', 5)
        |""".stripMargin).as[Long].collect().toSet
    val dedupApi = llm.TextDedup.dedupByPairs(docs, "doc_id",
        llm.TextDedup.editDistancePairs(docs, "text", "doc_id", maxDist = 5)
          .select("id_a", "id_b"))
      .select("doc_id").as[Long].collect().toSet
    assert(dedupSql === dedupApi, "dedup TVF diverged from the Scala API")
    val bad = intercept[Exception] {
      spark.sql(
        """SELECT * FROM graft_editdist_pairs(
          |  TABLE(docs_editdist_tvf), 'text', 'doc_id', 5, 5)""".stripMargin)
        .collect()
    }
    assert(bad.getMessage.contains("4 or 8 arguments"))
  }

  test("graft_semdedup TVF rejects extra trailing args and an out-of-range " +
      "max_cell instead of silently ignoring/truncating them") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    emb.createOrReplaceTempView("emb_semdedup_argcheck_tvf")
    val nine = intercept[Exception] {
      spark.sql(
        """SELECT vec_id FROM graft_semdedup(
          |  TABLE(emb_semdedup_argcheck_tvf), 'vec_id', 'embedding',
          |  64, 0.3, 16, 1, 100, 999)""".stripMargin).collect()
    }
    assert(nine.getMessage.contains("7 or 8 arguments"),
      s"9-arg call must fail the arity check, got: ${nine.getMessage}")
    val huge = intercept[Exception] {
      spark.sql(
        s"""SELECT vec_id FROM graft_semdedup(
           |  TABLE(emb_semdedup_argcheck_tvf), 'vec_id', 'embedding',
           |  64, 0.3, 16, 1, ${Int.MaxValue.toLong + 1L}L)""".stripMargin)
        .collect()
    }
    assert(huge.getMessage.contains("max_cell must be in"),
      s"out-of-Int-range max_cell must fail, got: ${huge.getMessage}")
  }

  test("graft_ann_ivfpq TVF optional lloyd_iters/refine args pin to the Scala API") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    emb.createOrReplaceTempView("emb_ivfpq_lloyd_tvf")
    // the measured-best configuration (residual + 2 Lloyd passes), now
    // reachable from SQL; plus the exact-cosine refine arg
    val viaSql = spark.sql(
      """SELECT query_id, corpus_id, rank FROM graft_ann_ivfpq(
        |  TABLE(emb_ivfpq_lloyd_tvf),
        |  TABLE(SELECT * FROM emb_ivfpq_lloyd_tvf WHERE vec_id < 5),
        |  'vec_id', 'embedding', 10, 16, 4, 8, 1, 2, 20)
        |""".stripMargin).as[(Long, Long, Int)].collect().toSet
    val viaApi = llm.Similarity.ivfPqTopK(emb,
        emb.filter(org.apache.spark.sql.functions.col("vec_id") < 5),
        "vec_id", "embedding", 10, nCells = 16, nProbe = 4, nSub = 8,
        residual = true, lloydIters = 2, refine = 20)
      .select("query_id", "corpus_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(viaSql === viaApi, "lloyd/refine TVF args diverged from the Scala API")
    assert(viaSql.nonEmpty)
    // omitted optional args keep the old 9-arg behavior (lloyd=0, refine=0)
    val nineArg = spark.sql(
      """SELECT query_id, corpus_id, rank FROM graft_ann_ivfpq(
        |  TABLE(emb_ivfpq_lloyd_tvf),
        |  TABLE(SELECT * FROM emb_ivfpq_lloyd_tvf WHERE vec_id < 5),
        |  'vec_id', 'embedding', 10, 16, 4, 8, 0)
        |""".stripMargin).as[(Long, Long, Int)].collect().toSet
    val plainApi = llm.Similarity.ivfPqTopK(emb,
        emb.filter(org.apache.spark.sql.functions.col("vec_id") < 5),
        "vec_id", "embedding", 10, nCells = 16, nProbe = 4, nSub = 8)
      .select("query_id", "corpus_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(nineArg === plainApi)
  }

  test("corpus-curation TVFs pin to the Scala API") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    docs.createOrReplaceTempView("docs_corpus_tvf")
    val packSql = spark.sql(
      "SELECT * FROM graft_pack('docs_corpus_tvf', 'doc_id', 'text', 'source', 512)")
      .as[(Long, String, Int, Long, Long)].collect().toSet
    val packApi = llm.CorpusOps.packSequences(docs, "doc_id", "text", "source", 512)
      .as[(Long, String, Int, Long, Long)].collect().toSet
    assert(packSql === packApi)
    val repSql = spark.sql(
      "SELECT doc_id, top_bigram_frac FROM graft_repetition('docs_corpus_tvf', 'doc_id', 'text')")
      .as[(Long, Double)].collect().toSet
    val repApi = llm.CorpusOps.repetitionColumns(docs, "doc_id", "text")
      .select(col("doc_id"), col("top_bigram_frac"))
      .as[(Long, Double)].collect().toSet
    assert(repSql === repApi)
    val sampleSql = spark.sql(
      "SELECT doc_id FROM graft_sample('docs_corpus_tvf', 'doc_id', 'text', '2000')")
      .as[Long].collect().toSet
    val sampleApi = llm.CorpusOps.sampleByHash(docs, "doc_id", "text", "doc_id",
      Map.empty, "2000").select("doc_id").as[Long].collect().toSet
    assert(sampleSql === sampleApi && sampleSql.nonEmpty)
    val decontamRows = spark.sql(
      "SELECT count(*) FROM graft_decontam('docs_corpus_tvf', 'doc_id', 'text', 50, 5)")
      .as[Long].head()
    assert(decontamRows === docs.filter(col("doc_id") % 50 =!= 0).count())
    val phrases = spark.sql(
      "SELECT count(*) FROM graft_boilerplate_phrases('docs_corpus_tvf', 'doc_id', 'text', 3, 5)")
      .as[Long].head()
    assert(phrases > 0)
    val red = spark.sql(
      "SELECT n_emails FROM graft_redact_pii('docs_corpus_tvf', 'doc_id', 'text') LIMIT 1")
      .as[Int].head()
    assert(red === 0) // raw corpus has no emails; the op still runs from SQL
  }

  test("span and line dedup TVFs from SQL equal the Scala API") {
    val docs = Seq(
      (1L, "a b c d e unique1\nshared trailer line"),
      (2L, "pre2 a b c d e\nshared trailer line"),
      (3L, "other words entirely here now\nshared trailer line"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("docs_span_tvf")
    val spansSql = spark.sql(
      "SELECT * FROM graft_dup_spans('docs_span_tvf', 'doc_id', 'text', 3, 2)")
      .as[(Long, Long, Long, Long)].collect().toSet
    val spansApi = llm.TextDedup.duplicateSpans(docs, "doc_id", "text", k = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(spansSql === spansApi && spansSql.nonEmpty)
    val remSql = spark.sql(
      "SELECT * FROM graft_dup_span_removal('docs_span_tvf', 'doc_id', 'text', 3, 2)")
      .as[(Long, Long, Long, String)].collect().toSet
    val remApi = llm.TextDedup.removeDuplicateSpans(docs, "doc_id", "text", k = 3)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(remSql === remApi)
    val ldSql = spark.sql(
      "SELECT * FROM graft_line_dedup('docs_span_tvf', 'doc_id', 'text', 3)")
      .as[(Long, Long, Long, String)].collect().toSet
    val ldApi = llm.CorpusOps.lineDedup(docs, "doc_id", "text", minDf = 3)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(ldSql === ldApi && ldApi.forall(_._3 == 1L),
      "every doc should drop exactly the shared trailer line")
    val dlSql = spark.sql(
      "SELECT * FROM graft_dup_lines('docs_span_tvf', 'doc_id', 'text', 3)")
      .as[(Long, Long)].collect().toSet
    val dlApi = llm.CorpusOps.duplicateLines(docs, "doc_id", "text", minDf = 3)
      .as[(Long, Long)].collect().toSet
    assert(dlSql === dlApi && dlSql.nonEmpty)
  }

  test("simhash from SQL equals simhash from the Scala API") {
    val viaSql = spark.sql("SELECT graft_simhash(graft_tokenize('alpha beta gamma'))")
      .as[Long].head()
    val viaApi = Seq("alpha beta gamma").toDF("t")
      .select(llm.TextDedup.simhash(llm.TextDedup.tokenize(org.apache.spark.sql.functions.col("t"))))
      .as[Long].head()
    assert(viaSql === viaApi)
  }
}
