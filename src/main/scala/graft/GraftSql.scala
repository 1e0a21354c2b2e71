package graft

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, FunctionTableSubqueryArgumentExpression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** SQL surface: registers the engine's scalar capabilities in the session
  * function registry so `spark.sql("SELECT graft_lang_id(text) ...")`
  * works. The builders return native Catalyst expression trees (the same
  * Column expressions the Scala API uses) — NOT UDFs, so whole-stage
  * codegen and optimizer rules see through them (SURVEY.md §2.2 "UDx
  * surface": the reference registers its operators declaratively via
  * @Extension; this is the Spark-native analog for the scalar tier).
  *
  * The builders are exposed as data (`scalarBuilders` / `tableBuilders`)
  * so the same definitions back BOTH registration paths: programmatic
  * `GraftSql.register(spark)` into a live session, and the installable
  * [[GraftExtensions]] (`spark.sql.extensions=graft.GraftExtensions`).
  */
object GraftSql {
  private def c(e: Expression): Column = GraftColumnBridge.column(e)
  private def x(col: Column): Expression = GraftColumnBridge.expression(col)

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be a literal integer, got $other")
  }

  private def litLong(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a literal integer, got $other")
  }

  /** Int-valued literal with a [1, Int.MaxValue] range check — the
    * shared guard for every TVF argument that narrows to Int, so an
    * out-of-range Long literal errors instead of silently truncating
    * (the graft_semdedup max_cell hazard, applied uniformly).
    */
  private def litPosInt(e: Expression, what: String): Int = {
    val v = litLong(e, what)
    require(v >= 1L && v <= Int.MaxValue.toLong,
      s"$what must be in [1, ${Int.MaxValue}], got $v")
    v.toInt
  }

  private def litDouble(e: Expression, what: String): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: Float, _) => v.toDouble
    case Literal(v: Int, _) => v.toDouble
    case Literal(v: Long, _) => v.toDouble
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a literal number, got $other")
  }

  private def litStr(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a literal string, got $other")
  }

  /** Table-function builders run at analysis time, under the session that
    * owns the statement — `SparkSession.active` is that session for both
    * the temp-registry path and the extensions path (where no session
    * exists yet at injection time).
    */
  private def tableArg(e: Expression): DataFrame = {
    val spark = SparkSession.active
    e match {
      case t: FunctionTableSubqueryArgumentExpression => GraftColumnBridge.dataset(spark, t.plan)
      case other => spark.table(litStr(other, "table argument"))
    }
  }

  /** Every scalar function as (name, expression builder) — one
    * definition list shared by `register` and [[GraftExtensions]].
    */
  val scalarBuilders: Seq[(String, Seq[Expression] => Expression)] = {
    def f1(fn: Column => Column): Seq[Expression] => Expression =
      es => x(fn(c(es.head)))
    def f2(fn: (Column, Column) => Column): Seq[Expression] => Expression =
      es => x(fn(c(es(0)), c(es(1))))
    Seq(
      "graft_tokenize" -> f1(llm.TextDedup.tokenize),
      "graft_simhash" -> f1(llm.TextDedup.simhash),
      "graft_lang_id" -> f1(llm.TextAnalysis.langId),
      "graft_cjk_ratio" -> f1(llm.TextAnalysis.cjkRatio),
      "graft_jaccard" -> f2(llm.TextDedup.jaccard),
      "graft_cosine" -> f2(llm.Similarity.cosine),
      "graft_shingles" -> { es =>
        x(llm.TextDedup.shingles(c(es(0)), litInt(es(1), "shingle size")))
      },
      "graft_minhash" -> { es =>
        x(llm.TextDedup.minhashSignature(c(es(0)), litInt(es(1), "signature size")))
      })
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    scalarBuilders.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "internal")
    }
    registerTableFunctions(spark)
  }

  // ---- table-valued surface: the window operators as first-class FROM
  // clauses, the SparkSQL analog of the reference's @Extension windows
  // (UniqueEverWindowProcessor.java:63-65; SURVEY.md §4.2). The builders
  // compose the SAME DataFrame operators as the Scala API and return the
  // resulting logical plan, so the optimizer sees an ordinary plan. The
  // table argument is either TABLE(name) or a table-name string literal.

  /** All 11 reference windows + the LLM curation tier as (name, TVF
    * builder), each returning the operator's CURRENT stream, e.g.
    * `SELECT * FROM unique_ever('events', 'event_id', 'user_id')`:
    * `unique_ever(t, seq, key...)`, `unique_first(t, seq, key...)`,
    * `unique_length(t, seq, n, key...)`, `unique_length_batch` /
    * `unique_first_length_batch(t, seq, n, key...)`,
    * `unique_time` / `unique_time_batch` / `unique_first_time_batch` /
    * `unique_external_time_batch(t, seq, ts, window_ms, key...)`,
    * `unique_time_length_batch(t, seq, ts, window_ms, n, key...)`,
    * `unique_deduplicate(t, seq, ts, interval_ms, key...)`.
    */
  val tableBuilders: Seq[(String, Seq[Expression] => LogicalPlan)] = {
    def plan(df: DataFrame): LogicalPlan = GraftColumnBridge.plan(df)
    def keysFrom(es: Seq[Expression]): Seq[String] =
      es.map(litStr(_, "key column")) match {
        case Nil => throw new IllegalArgumentException("at least one key column required")
        case ks => ks
      }
    Seq(
      "unique_ever" -> { (es: Seq[Expression]) =>
        plan(operators.UniqueOps.everCurrent(tableArg(es.head),
          keysFrom(es.drop(2)), litStr(es(1), "seq column")))
      },
      "unique_first" -> { (es: Seq[Expression]) =>
        plan(operators.UniqueOps.first(tableArg(es.head),
          keysFrom(es.drop(2)), litStr(es(1), "seq column")).current)
      },
      "unique_length" -> { (es: Seq[Expression]) =>
        plan(operators.UniqueOps.length(tableArg(es.head),
          keysFrom(es.drop(3)), litStr(es(1), "seq column"),
          litLong(es(2), "window length").toInt).current)
      },
      "unique_time" -> { (es: Seq[Expression]) =>
        plan(operators.UniqueOps.time(tableArg(es.head),
          keysFrom(es.drop(4)), litStr(es(1), "seq column"),
          litStr(es(2), "ts column"), litLong(es(3), "window ms")).current)
      },
      "unique_deduplicate" -> { (es: Seq[Expression]) =>
        plan(operators.UniqueOps.deduplicate(tableArg(es.head),
          keysFrom(es.drop(4)), litStr(es(1), "seq column"),
          litStr(es(2), "ts column"), litLong(es(3), "interval ms")).current)
      },
      // the remaining reference windows, completing all 11 as SQL TVFs
      "unique_time_batch" -> { (es: Seq[Expression]) =>
        plan(operators.UniqueOps.timeBatch(tableArg(es.head),
          keysFrom(es.drop(4)), litStr(es(1), "seq column"),
          litStr(es(2), "ts column"), litLong(es(3), "window ms")).current)
      },
      "unique_first_time_batch" -> { (es: Seq[Expression]) =>
        plan(operators.UniqueOps.firstTimeBatch(tableArg(es.head),
          keysFrom(es.drop(4)), litStr(es(1), "seq column"),
          litStr(es(2), "ts column"), litLong(es(3), "window ms")).current)
      },
      "unique_external_time_batch" -> { (es: Seq[Expression]) =>
        plan(operators.UniqueOps.externalTimeBatch(tableArg(es.head),
          keysFrom(es.drop(4)), litStr(es(1), "seq column"),
          litStr(es(2), "ts column"), litLong(es(3), "window ms")).current)
      },
      "unique_length_batch" -> { (es: Seq[Expression]) =>
        plan(operators.UniqueOps.lengthBatch(tableArg(es.head),
          keysFrom(es.drop(3)), litStr(es(1), "seq column"),
          litLong(es(2), "window length").toInt).current)
      },
      "unique_first_length_batch" -> { (es: Seq[Expression]) =>
        plan(operators.UniqueOps.firstLengthBatch(tableArg(es.head),
          keysFrom(es.drop(3)), litStr(es(1), "seq column"),
          litLong(es(2), "window length").toInt).current)
      },
      "unique_time_length_batch" -> { (es: Seq[Expression]) =>
        plan(operators.UniqueOps.timeLengthBatch(tableArg(es.head),
          keysFrom(es.drop(5)), litStr(es(1), "seq column"),
          litStr(es(2), "ts column"), litLong(es(3), "window ms"),
          litLong(es(4), "window length").toInt).current)
      },
      // ---- LLM-pipeline TVFs: the curation operators as FROM clauses —
      // `graft_exact_dedup(t, id, col...)`,
      // `graft_minhash_pairs(t, text, id, threshold)`,
      // `graft_knn(corpus, queries, id, vec, k)`
      "graft_exact_dedup" -> { (es: Seq[Expression]) =>
        plan(llm.TextDedup.exactDedup(tableArg(es.head),
          keysFrom(es.drop(2)), litStr(es(1), "id column")))
      },
      "graft_minhash_pairs" -> { (es: Seq[Expression]) =>
        plan(llm.TextDedup.minhashPairs(tableArg(es.head),
          litStr(es(1), "text column"), litStr(es(2), "id column"),
          threshold = litDouble(es(3), "threshold")))
      },
      "graft_knn" -> { (es: Seq[Expression]) =>
        plan(llm.Similarity.bruteForceTopK(tableArg(es.head),
          tableArg(es(1)), litStr(es(2), "id column"),
          litStr(es(3), "vector column"), litLong(es(4), "k").toInt))
      },
      // `graft_editdist_pairs(t, text, id, max_dist[, shingle_n, bands,
      // rows_per_band, max_bucket])` — character-level Levenshtein
      // near-dup pairs (banded char-shingle candidates, exact integer
      // dist ≤ max_dist verify)
      "graft_editdist_pairs" -> { (es: Seq[Expression]) =>
        require(es.length == 4 || es.length == 8,
          s"graft_editdist_pairs expects 4 or 8 arguments " +
            s"(t, text, id, max_dist[, shingle_n, bands, rows_per_band, " +
            s"max_bucket]), got ${es.length}")
        if (es.length == 4)
          plan(llm.TextDedup.editDistancePairs(tableArg(es.head),
            litStr(es(1), "text column"), litStr(es(2), "id column"),
            maxDist = litPosInt(es(3), "max_dist")))
        else
          plan(llm.TextDedup.editDistancePairs(tableArg(es.head),
            litStr(es(1), "text column"), litStr(es(2), "id column"),
            maxDist = litPosInt(es(3), "max_dist"),
            shingleN = litPosInt(es(4), "shingle_n"),
            bands = litPosInt(es(5), "bands"),
            rowsPerBand = litPosInt(es(6), "rows_per_band"),
            maxBucket = litPosInt(es(7), "max_bucket")))
      },
      // `graft_token_mix(t, id, text, group, default_budget)` —
      // token-budget corpus mixing (admit each group's docs in id order
      // while tokens consumed < budget; greedy fill). Per-group budget
      // overrides are a Scala-API Map — SQL callers pre-split by group.
      "graft_token_mix" -> { (es: Seq[Expression]) =>
        require(es.length == 5,
          s"graft_token_mix expects 5 arguments " +
            s"(t, id, text, group, default_budget), got ${es.length}")
        plan(llm.CorpusOps.mixByTokenBudget(tableArg(es.head),
          litStr(es(1), "id column"), litStr(es(2), "text column"),
          litStr(es(3), "group column"),
          defaultBudget = litLong(es(4), "default_budget")))
      },
      // `graft_token_mix_segmented(t, id, text, group, default_budget,
      // range_width)` — the hot-source-safe segmented-prefix-sum form
      // (identical admission set; integral id required)
      "graft_token_mix_segmented" -> { (es: Seq[Expression]) =>
        require(es.length == 6,
          s"graft_token_mix_segmented expects 6 arguments " +
            s"(t, id, text, group, default_budget, range_width), got ${es.length}")
        val rw = litLong(es(5), "range_width")
        require(rw >= 1L, s"range_width must be positive, got $rw")
        plan(llm.CorpusOps.mixByTokenBudgetSegmented(tableArg(es.head),
          litStr(es(1), "id column"), litStr(es(2), "text column"),
          litStr(es(3), "group column"),
          defaultBudget = litLong(es(4), "default_budget"),
          rangeWidth = rw))
      },
      // `graft_editdist_decontam(train, eval, text, id, max_dist)` —
      // drop train docs within max_dist edits of some eval doc (the
      // character-level decontamination tier)
      "graft_editdist_decontam" -> { (es: Seq[Expression]) =>
        require(es.length == 5,
          s"graft_editdist_decontam expects 5 arguments " +
            s"(train, eval, text, id, max_dist), got ${es.length}")
        plan(llm.TextDedup.editDecontaminate(tableArg(es.head),
          tableArg(es(1)), litStr(es(3), "id column"),
          litStr(es(2), "text column"),
          maxDist = litPosInt(es(4), "max_dist")))
      },
      // `graft_image_hashes(t, id)` — perceptual dHash/aHash over the
      // table's `media` binary column (real decode; null hashes for
      // undecodable payloads)
      "graft_image_hashes" -> { (es: Seq[Expression]) =>
        require(es.length == 2,
          s"graft_image_hashes expects 2 arguments (t, id), got ${es.length}")
        plan(llm.Multimodal.imageHashes(tableArg(es.head),
          litStr(es(1), "id column")))
      },
      // `graft_image_pairs(t, id, max_hamming)` — banded-hamming image
      // near-dup pairs over the dhash
      "graft_image_pairs" -> { (es: Seq[Expression]) =>
        require(es.length == 3,
          s"graft_image_pairs expects 3 arguments (t, id, max_hamming), " +
            s"got ${es.length}")
        val mh = litLong(es(2), "max_hamming")
        require(mh >= 0L && mh <= 3L,
          s"max_hamming must be in [0, 3] (the 4x16-bit chunk blocking is " +
            s"pigeonhole-exact only at radius <= 3; larger radii would silently " +
            s"miss pairs), got $mh")
        plan(llm.TextDedup.hammingHashPairs(
          llm.Multimodal.imageHashes(tableArg(es.head), litStr(es(1), "id column")),
          "id", "dhash", maxHamming = mh.toInt))
      },
      // `graft_image_dedup(t, id, max_hamming)` — min-id CC image dedup
      "graft_image_dedup" -> { (es: Seq[Expression]) =>
        require(es.length == 3,
          s"graft_image_dedup expects 3 arguments (t, id, max_hamming), " +
            s"got ${es.length}")
        val mh = litLong(es(2), "max_hamming")
        require(mh >= 0L && mh <= 3L,
          s"max_hamming must be in [0, 3] (the 4x16-bit chunk blocking is " +
            s"pigeonhole-exact only at radius <= 3; larger radii would silently " +
            s"miss pairs), got $mh")
        val t = tableArg(es.head)
        val idc = litStr(es(1), "id column")
        plan(llm.TextDedup.dedupByPairs(t, idc,
          llm.TextDedup.hammingHashPairs(
            llm.Multimodal.imageHashes(t, idc), "id", "dhash",
            maxHamming = mh.toInt).select("id_a", "id_b")))
      },
      // `graft_audio_hashes(t, id)` / `graft_audio_pairs(t, id,
      // max_hamming)` / `graft_audio_dedup(t, id, max_hamming)` — the
      // waveform-fingerprint twins of the image TVFs
      "graft_audio_hashes" -> { (es: Seq[Expression]) =>
        require(es.length == 2,
          s"graft_audio_hashes expects 2 arguments (t, id), got ${es.length}")
        plan(llm.Multimodal.audioHashes(tableArg(es.head),
          litStr(es(1), "id column")))
      },
      "graft_audio_pairs" -> { (es: Seq[Expression]) =>
        require(es.length == 3,
          s"graft_audio_pairs expects 3 arguments (t, id, max_hamming), " +
            s"got ${es.length}")
        val mh = litLong(es(2), "max_hamming")
        require(mh >= 0L && mh <= 3L,
          s"max_hamming must be in [0, 3] (the 4x16-bit chunk blocking is " +
            s"pigeonhole-exact only at radius <= 3; larger radii would silently " +
            s"miss pairs), got $mh")
        plan(llm.TextDedup.hammingHashPairs(
          llm.Multimodal.audioHashes(tableArg(es.head), litStr(es(1), "id column")),
          "id", "whash", maxHamming = mh.toInt))
      },
      "graft_audio_dedup" -> { (es: Seq[Expression]) =>
        require(es.length == 3,
          s"graft_audio_dedup expects 3 arguments (t, id, max_hamming), " +
            s"got ${es.length}")
        val mh = litLong(es(2), "max_hamming")
        require(mh >= 0L && mh <= 3L,
          s"max_hamming must be in [0, 3] (the 4x16-bit chunk blocking is " +
            s"pigeonhole-exact only at radius <= 3; larger radii would silently " +
            s"miss pairs), got $mh")
        val t = tableArg(es.head)
        val idc = litStr(es(1), "id column")
        plan(llm.TextDedup.dedupByPairs(t, idc,
          llm.TextDedup.hammingHashPairs(
            llm.Multimodal.audioHashes(t, idc), "id", "whash",
            maxHamming = mh.toInt).select("id_a", "id_b")))
      },
      // `graft_video_hashes(t, id)` / `graft_video_pairs(t, id, k,
      // threshold)` / `graft_video_dedup(t, id, k, threshold)` — the
      // video rung: per-frame dHash over the packed-frame `media`
      // container, then shingled frame-hash sequence matching
      "graft_video_hashes" -> { (es: Seq[Expression]) =>
        require(es.length == 2,
          s"graft_video_hashes expects 2 arguments (t, id), got ${es.length}")
        plan(llm.Multimodal.videoFrameHashes(tableArg(es.head),
          litStr(es(1), "id column")))
      },
      "graft_video_pairs" -> { (es: Seq[Expression]) =>
        require(es.length == 4,
          s"graft_video_pairs expects 4 arguments (t, id, shingle_k, " +
            s"threshold), got ${es.length}")
        val k = litLong(es(2), "shingle_k")
        require(k >= 1L && k <= 16L, s"shingle_k must be in [1, 16], got $k")
        val thr = litDouble(es(3), "threshold")
        require(thr >= 0.0 && thr <= 1.0, s"threshold must be in [0, 1], got $thr")
        plan(llm.TextDedup.frameSequencePairs(
          llm.Multimodal.videoFrameHashes(tableArg(es.head),
            litStr(es(1), "id column")),
          "id", "frame_idx", "fhash", shingleK = k.toInt, threshold = thr))
      },
      "graft_video_dedup" -> { (es: Seq[Expression]) =>
        require(es.length == 4,
          s"graft_video_dedup expects 4 arguments (t, id, shingle_k, " +
            s"threshold), got ${es.length}")
        val k = litLong(es(2), "shingle_k")
        require(k >= 1L && k <= 16L, s"shingle_k must be in [1, 16], got $k")
        val thr = litDouble(es(3), "threshold")
        require(thr >= 0.0 && thr <= 1.0, s"threshold must be in [0, 1], got $thr")
        val t = tableArg(es.head)
        val idc = litStr(es(1), "id column")
        plan(llm.TextDedup.dedupByPairs(t, idc,
          llm.TextDedup.frameSequencePairs(
            llm.Multimodal.videoFrameHashes(t, idc),
            "id", "frame_idx", "fhash", shingleK = k.toInt, threshold = thr)
            .select("id_a", "id_b")))
      },
      // `graft_audio_seg_hashes(t, id)` / `graft_audio_seg_pairs(t, id,
      // min_shared)` — the SHIFT-TOLERANT audio tier (per-segment
      // fingerprints; pairs match on segment-hash values)
      "graft_audio_seg_hashes" -> { (es: Seq[Expression]) =>
        require(es.length == 2,
          s"graft_audio_seg_hashes expects 2 arguments (t, id), got ${es.length}")
        plan(llm.Multimodal.audioSegmentHashes(tableArg(es.head),
          litStr(es(1), "id column")))
      },
      "graft_audio_seg_pairs" -> { (es: Seq[Expression]) =>
        require(es.length == 3,
          s"graft_audio_seg_pairs expects 3 arguments (t, id, min_shared), " +
            s"got ${es.length}")
        val ms = litLong(es(2), "min_shared")
        require(ms >= 1L, s"min_shared must be positive, got $ms")
        plan(llm.TextDedup.sharedKeyPairs(
          llm.Multimodal.audioSegmentHashes(tableArg(es.head),
            litStr(es(1), "id column")),
          "id", "shash", minShared = ms.toInt))
      },
      // `graft_image_tile_hashes(t, id)` / `graft_image_crop_pairs(t,
      // id, min_shared)` — the CROP-TOLERANT image tier (fixed-grid
      // overlapping tile aHashes; pairs match on tile-hash values)
      "graft_image_tile_hashes" -> { (es: Seq[Expression]) =>
        require(es.length == 2,
          s"graft_image_tile_hashes expects 2 arguments (t, id), got ${es.length}")
        plan(llm.Multimodal.imageTileHashes(tableArg(es.head),
          litStr(es(1), "id column")))
      },
      "graft_image_crop_pairs" -> { (es: Seq[Expression]) =>
        require(es.length == 3,
          s"graft_image_crop_pairs expects 3 arguments (t, id, min_shared), " +
            s"got ${es.length}")
        val ms = litLong(es(2), "min_shared")
        require(ms >= 1L, s"min_shared must be positive, got $ms")
        plan(llm.TextDedup.sharedKeyPairs(
          llm.Multimodal.imageTileHashes(tableArg(es.head),
            litStr(es(1), "id column")),
          "id", "thash", minShared = ms.toInt))
      },
      // `graft_quality_clf(docs, pos, neg, id, text[, hex_chars])` —
      // train the hashed-gram NB on the labeled split, score docs
      "graft_quality_clf" -> { (es: Seq[Expression]) =>
        require(es.length == 5 || es.length == 6,
          s"graft_quality_clf expects 5 or 6 arguments " +
            s"(docs, pos, neg, id, text[, hex_chars]), got ${es.length}")
        val hex = if (es.length > 5) {
          val h = litLong(es(5), "hex_chars")
          require(h >= 1L && h <= 7L, s"hex_chars must be in [1, 7], got $h")
          h.toInt
        } else 4
        val textCol = litStr(es(4), "text column")
        val model = llm.CorpusOps.qualityClfTrain(tableArg(es(1)),
          tableArg(es(2)), textCol, hexChars = hex)
        plan(llm.CorpusOps.qualityClfScore(tableArg(es.head),
          litStr(es(3), "id column"), textCol, model))
      },
      // `graft_bpe_encode(t, id, text, num_merges[, sample_docs,
      // sample_chars])` — train BPE on the bounded sample, encode every
      // row's text to its token-id array
      "graft_bpe_encode" -> { (es: Seq[Expression]) =>
        require(es.length == 4 || es.length == 6,
          s"graft_bpe_encode expects 4 or 6 arguments " +
            s"(t, id, text, num_merges[, sample_docs, sample_chars]), " +
            s"got ${es.length}")
        val t = tableArg(es.head)
        val idc = litStr(es(1), "id column")
        val txc = litStr(es(2), "text column")
        val nm = litLong(es(3), "num_merges")
        require(nm >= 0L && nm <= 65536L,
          s"num_merges must be in [0, 65536], got $nm")
        val model =
          if (es.length == 4) llm.Bpe.train(t, idc, txc, nm.toInt)
          else llm.Bpe.train(t, idc, txc, nm.toInt,
            sampleDocs = litPosInt(es(4), "sample_docs"),
            sampleChars = litPosInt(es(5), "sample_chars"))
        plan(t.select(org.apache.spark.sql.functions.col(idc),
          llm.Bpe.encode(org.apache.spark.sql.functions.col(txc), model)
            .as("token_ids")))
      },
      // `graft_editdist_dedup(t, text, id, max_dist)` — min-id CC dedup
      // over the pair relation (eager CC loop, like graft_neardup_dedup)
      "graft_editdist_dedup" -> { (es: Seq[Expression]) =>
        require(es.length == 4,
          s"graft_editdist_dedup expects 4 arguments " +
            s"(t, text, id, max_dist), got ${es.length}")
        val t = tableArg(es.head)
        val idc = litStr(es(2), "id column")
        plan(llm.TextDedup.dedupByPairs(t, idc,
          llm.TextDedup.editDistancePairs(t, litStr(es(1), "text column"),
            idc, maxDist = litPosInt(es(3), "max_dist"))
            .select("id_a", "id_b")))
      },
      // the remaining near-dup / ANN pipelines, completing the LLM tier:
      // `graft_simhash_pairs(t, text, id, maxHamming)`,
      // `graft_ngram_pairs(t, text, id, threshold)`,
      // `graft_neardup_pairs(t, id, vec, threshold)`,
      // `graft_ann_lsh(corpus, queries, id, vec, k)`,
      // `graft_ann_ivf(corpus, queries, id, vec, k, nCells, nProbe)`
      "graft_simhash_pairs" -> { (es: Seq[Expression]) =>
        plan(llm.TextDedup.simhashPairs(tableArg(es.head),
          litStr(es(1), "text column"), litStr(es(2), "id column"),
          maxHamming = litLong(es(3), "max hamming").toInt))
      },
      "graft_ngram_pairs" -> { (es: Seq[Expression]) =>
        plan(llm.TextDedup.ngramJaccardPairs(tableArg(es.head),
          litStr(es(1), "text column"), litStr(es(2), "id column"),
          threshold = litDouble(es(3), "threshold")))
      },
      "graft_neardup_pairs" -> { (es: Seq[Expression]) =>
        plan(llm.Similarity.embeddingNearDupPairs(tableArg(es.head),
          litStr(es(1), "id column"), litStr(es(2), "vector column"),
          threshold = litDouble(es(3), "threshold")))
      },
      "graft_ann_lsh" -> { (es: Seq[Expression]) =>
        plan(llm.Similarity.annTopK(tableArg(es.head),
          tableArg(es(1)), litStr(es(2), "id column"),
          litStr(es(3), "vector column"), litLong(es(4), "k").toInt))
      },
      // `graft_neardup_dedup(t, id, text, threshold)` — the end-to-end
      // near-dup removal (minhash pairs → min-label connected components →
      // drop non-canonical members). The CC label propagation is iterative,
      // so this TVF materializes intermediate jobs while the statement is
      // ANALYZED (same eager-materialization caveat as a CACHE TABLE) —
      // the returned relation itself is a plain anti-join plan.
      "graft_neardup_dedup" -> { (es: Seq[Expression]) =>
        val t = tableArg(es.head)
        val id = litStr(es(1), "id column")
        // stats form so the pipeline-internal persisted signature relation
        // can be released right here: dedupByPairs materializes the CC loop
        // (losers is checkpointed, lineage-free), after which the upstream
        // cache would only leak until ContextCleaner GC
        val pws = llm.TextDedup.minhashPairsWithStats(t,
          litStr(es(2), "text column"), id, threshold = litDouble(es(3), "threshold"))
        val deduped = llm.TextDedup.dedupByPairs(t, id, pws.pairs)
        pws.unpersist()
        plan(deduped)
      },
      // `graft_semdedup(t, id, vec, dim, eps, n_cells, lloyd_iters
      // [, max_cell])` — SemDeDup (Abbas et al. 2023): k-means-cell-
      // confined ε-similarity components, keep the least-centroid-
      // similar member of each. Optional max_cell = the hot-cell
      // occupancy cap (over-cap cells are excluded from the pair scan;
      // their members survive). Eagerly materializes the CC loop during
      // analysis, like graft_neardup_dedup.
      "graft_semdedup" -> { (es: Seq[Expression]) =>
        // explicit arity: extra trailing args must error, not silently
        // drop — and max_cell is range-checked before the Int narrowing
        // (a > Int.MaxValue literal would otherwise truncate silently)
        require(es.length == 7 || es.length == 8,
          s"graft_semdedup expects 7 or 8 arguments " +
            s"(t, id, vec, dim, eps, n_cells, lloyd_iters[, max_cell]), " +
            s"got ${es.length}")
        val maxCell = if (es.length > 7) {
          val mc = litLong(es(7), "max_cell")
          require(mc >= 1L && mc <= Int.MaxValue.toLong,
            s"max_cell must be in [1, ${Int.MaxValue}], got $mc")
          mc.toInt
        } else Int.MaxValue
        plan(llm.Similarity.semDedup(tableArg(es.head),
          litStr(es(1), "id column"), litStr(es(2), "vector column"),
          dim = litLong(es(3), "dim").toInt,
          eps = litDouble(es(4), "eps"),
          nCells = litLong(es(5), "n_cells").toInt,
          lloydIters = litLong(es(6), "lloyd_iters").toInt,
          maxCell = maxCell))
      },
      "graft_ann_ivf" -> { (es: Seq[Expression]) =>
        plan(llm.Similarity.ivfTopK(tableArg(es.head),
          tableArg(es(1)), litStr(es(2), "id column"),
          litStr(es(3), "vector column"), litLong(es(4), "k").toInt,
          nCells = litLong(es(5), "nCells").toInt,
          nProbe = litLong(es(6), "nProbe").toInt))
      },
      // `graft_ann_pq(corpus, queries, id, vec, k, n_sub, codes_per_sub,
      // refine)` — ADC scan over anchor-codebook PQ codes, with the
      // optional exact-cosine re-rank of the top-`refine` candidates
      // (refine = 0 → pure ADC). The codebook anchors collect during
      // analysis, like graft_neardup_dedup's CC loop.
      "graft_ann_pq" -> { (es: Seq[Expression]) =>
        plan(llm.Similarity.pqTopK(tableArg(es.head),
          tableArg(es(1)), litStr(es(2), "id column"),
          litStr(es(3), "vector column"), litLong(es(4), "k").toInt,
          nSub = litLong(es(5), "n_sub").toInt,
          codesPerSub = litLong(es(6), "codes_per_sub").toInt,
          refine = litLong(es(7), "refine").toInt))
      },
      // `graft_ann_ivfpq(corpus, queries, id, vec, k, n_cells, n_probe,
      // n_sub, residual[, lloyd_iters[, refine]])` — the composed IVF×PQ
      // scan; residual <> 0 switches to the Faiss-style residual
      // encoding (`ivfPqTopK(residual = true)`); the optional
      // lloyd_iters > 0 trains the PQ codebook with that many
      // per-subspace Lloyd passes, so the measured-best configuration
      // (residual + 2 Lloyd passes, BASELINE §2 recall table) is
      // reachable from SQL as (..., 1, 2); the optional refine > 0
      // re-ranks the top-`refine` ADC candidates with exact cosine.
      // codesPerSub fixed at 16 (the byte-code default).
      "graft_ann_ivfpq" -> { (es: Seq[Expression]) =>
        plan(llm.Similarity.ivfPqTopK(tableArg(es.head),
          tableArg(es(1)), litStr(es(2), "id column"),
          litStr(es(3), "vector column"), litLong(es(4), "k").toInt,
          nCells = litLong(es(5), "n_cells").toInt,
          nProbe = litLong(es(6), "n_probe").toInt,
          nSub = litLong(es(7), "n_sub").toInt,
          residual = litLong(es(8), "residual") != 0L,
          lloydIters = if (es.length > 9) litInt(es(9), "lloyd_iters") else 0,
          refine = if (es.length > 10) litInt(es(10), "refine") else 0))
      },
      // ---- corpus-curation TVFs (llm.CorpusOps) —
      // `graft_repetition(t, id, text)`,
      // `graft_boilerplate_phrases(t, id, text, n, min_df)`,
      // `graft_decontam(t, id, text, eval_mod, n)`,
      // `graft_pack(t, id, text, shard, budget)`,
      // `graft_sample(t, id, text, prefix)` (uniform md5-prefix sample),
      // `graft_redact_pii(t, id, text)`
      "graft_repetition" -> { (es: Seq[Expression]) =>
        plan(llm.CorpusOps.repetitionColumns(tableArg(es.head),
          litStr(es(1), "id column"), litStr(es(2), "text column")))
      },
      "graft_boilerplate_phrases" -> { (es: Seq[Expression]) =>
        plan(llm.CorpusOps.boilerplatePhrases(tableArg(es.head),
          litStr(es(1), "id column"), litStr(es(2), "text column"),
          n = litLong(es(3), "n").toInt, minDf = litLong(es(4), "min df").toInt))
      },
      "graft_decontam" -> { (es: Seq[Expression]) =>
        plan(llm.CorpusOps.decontaminate(tableArg(es.head),
          litStr(es(1), "id column"), litStr(es(2), "text column"),
          evalMod = litLong(es(3), "eval modulus"), n = litLong(es(4), "n").toInt))
      },
      "graft_pack" -> { (es: Seq[Expression]) =>
        plan(llm.CorpusOps.packSequences(tableArg(es.head),
          litStr(es(1), "id column"), litStr(es(2), "text column"),
          litStr(es(3), "shard column"), budget = litLong(es(4), "budget").toInt))
      },
      "graft_sample" -> { (es: Seq[Expression]) =>
        val id = litStr(es(1), "id column")
        plan(llm.CorpusOps.sampleByHash(tableArg(es.head), id,
          litStr(es(2), "text column"), id /* stratum unused: uniform rate */,
          Map.empty, litStr(es(3), "hex threshold prefix")))
      },
      "graft_redact_pii" -> { (es: Seq[Expression]) =>
        plan(llm.CorpusOps.redactPii(tableArg(es.head),
          litStr(es(1), "id column"), litStr(es(2), "text column")))
      },
      // `graft_dup_spans(t, id, text, k, min_count)` — ExactSubstr-style
      // duplicated-span detection; `graft_dup_span_removal(...)` the cut;
      // `graft_line_dedup(t, id, text, min_df)` — CCNet line dedup
      "graft_dup_spans" -> { (es: Seq[Expression]) =>
        plan(llm.TextDedup.duplicateSpans(tableArg(es.head),
          litStr(es(1), "id column"), litStr(es(2), "text column"),
          k = litInt(es(3), "k"), minCount = litInt(es(4), "min count")))
      },
      "graft_dup_span_removal" -> { (es: Seq[Expression]) =>
        plan(llm.TextDedup.removeDuplicateSpans(tableArg(es.head),
          litStr(es(1), "id column"), litStr(es(2), "text column"),
          k = litInt(es(3), "k"), minCount = litInt(es(4), "min count")))
      },
      "graft_line_dedup" -> { (es: Seq[Expression]) =>
        plan(llm.CorpusOps.lineDedup(tableArg(es.head),
          litStr(es(1), "id column"), litStr(es(2), "text column"),
          minDf = litInt(es(3), "min doc frequency")))
      },
      "graft_dup_lines" -> { (es: Seq[Expression]) =>
        plan(llm.CorpusOps.duplicateLines(tableArg(es.head),
          litStr(es(1), "id column"), litStr(es(2), "text column"),
          minDf = litInt(es(3), "min doc frequency")))
      },
      // `graft_fuzzy_decontam(train, eval, id, text, threshold)` — drop
      // every train doc with an exact-Jaccard-verified cross-corpus
      // near-dup in eval (the paraphrase-tolerant complement to
      // graft_decontam's exact n-grams)
      "graft_fuzzy_decontam" -> { (es: Seq[Expression]) =>
        plan(llm.TextDedup.fuzzyDecontaminate(tableArg(es.head),
          tableArg(es(1)), litStr(es(2), "id column"),
          litStr(es(3), "text column"),
          threshold = litDouble(es(4), "threshold")))
      },
      // `graft_cap_per_group(t, group, order, cap)` — RefinedWeb-style
      // per-domain quota: at most cap rows per group, priority =
      // ascending order column
      "graft_cap_per_group" -> { (es: Seq[Expression]) =>
        plan(llm.CorpusOps.capPerGroup(tableArg(es.head),
          litStr(es(1), "group column"), litStr(es(2), "order column"),
          litInt(es(3), "cap")))
      },
      // `graft_dsir(raw, target, id, text, k)` — DSIR data selection
      // (Xie et al. 2023): train the hashed unigram+bigram importance
      // model (target distribution vs the raw pool), weigh every pool
      // doc, and Gumbel-top-k resample k of them. The model trains
      // eagerly during analysis (two bounded bucket-count relations —
      // the ANN TVFs' train-offline-then-plan contract).
      "graft_dsir" -> { (es: Seq[Expression]) =>
        val raw = tableArg(es.head)
        val id = litStr(es(2), "id column")
        val text = litStr(es(3), "text column")
        val model = llm.CorpusOps.dsirTrain(tableArg(es(1)), text, raw, text)
        plan(llm.CorpusOps.dsirSelect(raw, id, text, model,
          k = litInt(es(4), "k")))
      },
      // `graft_bm25(corpus, queries, id, text, k)` — Okapi BM25 top-k
      // sparse retrieval: index the corpus (stopword-grade terms pruned
      // at the default maxDfFrac), score each query's distinct terms,
      // rank per query. Both tables use the same id/text column names.
      // The index scalars (N, avgdl) collect during analysis — the ANN
      // TVFs' train-offline-then-plan contract.
      "graft_bm25" -> { (es: Seq[Expression]) =>
        val id = litStr(es(2), "id column")
        val text = litStr(es(3), "text column")
        val idx = llm.TextSearch.bm25Index(tableArg(es.head), id, text)
        plan(llm.TextSearch.bm25TopK(tableArg(es(1)), id, text, idx,
          k = litInt(es(4), "k")))
      })
  }

  def registerTableFunctions(spark: SparkSession): Unit = {
    val reg = spark.sessionState.tableFunctionRegistry
    tableBuilders.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "internal")
    }
  }
}
