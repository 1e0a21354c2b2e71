package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming INCREMENTAL duplicated-span detection — the continuous-
  * ingestion form of `TextDedup.duplicateSpans` (the ExactSubstr-style
  * sub-document dedup of Lee et al. 2021). Per arriving document the
  * operator answers "which token ranges of this document — and of every
  * document seen before it — are now duplicated?", and maintains the
  * answer exactly: after any prefix of the feed, the latest span set per
  * document equals the batch operator run over that prefix.
  *
  * The hard part is RETROACTIVITY: a k-gram becomes duplicated only when
  * its `minCount`-th occurrence arrives, at which point every EARLIER
  * occurrence — in documents long since emitted — becomes a duplicated
  * window too. The operator therefore keeps, per gram key, the packed
  * (doc, pos) list of its occurrences until the count reaches `minCount`;
  * promotion converts all stored occurrences to hits (the retroactive
  * edge) and collapses the entry to a zero-length sentinel, after which
  * further occurrences hit directly and cost O(1) state — the analog of
  * `NearDupStream`'s retroactive root demotions, but over positions
  * instead of component labels.
  *
  * Architecture (the repo's standard stateful split):
  *  - Distributed stage: tokenize → k-gram keys in POSITION order (array
  *    index = token position) as pure Catalyst expressions.
  *  - Stateful stage: single-keyed `transformWithState` (RocksDB via
  *    `UniqueStreams.useRocksDBStateStore`) with three MapStates:
  *      gramOcc : gram key → packed [d0,p0,d1,p1,...] occurrences;
  *                zero-length array = "duplicated" sentinel
  *      docHits : doc id → sorted duplicated-window start positions
  *      seen    : doc id → 1 (at-least-once redelivery guard: re-adding
  *                a delivered doc's grams would self-duplicate it)
  *    The gram-count relation is corpus-global (the same reason
  *    NearDupStream's union-find is), so the stage runs one task; the
  *    distributed hashing stage scales out and batch `duplicateSpans`
  *    is the backfill path — the documented hybrid.
  *
  * Output is a REPLACE-BY-DOC change log: whenever a document's hit set
  * grows, its FULL merged span list is re-emitted under one fresh
  * `upd_seq` (same gaps-and-islands merge as the batch op, computed over
  * the doc's complete hit set). A consumer's live view is the rows with
  * each doc's maximum `upd_seq`; spans only ever grow (duplication is
  * monotone under ingestion), so there are no retractions, only
  * supersessions. Hash parity with `TextDedup.duplicateSpans` on the
  * full feed is the `doc_dup_spans_stream_replay` CORRECTNESS row
  * (same DuckDB oracle as `doc_dup_spans`), plus a DupSpanStreamSpec
  * prefix-equivalence test.
  *
  * State sizing: gramOcc holds one entry per distinct never-promoted
  * gram (16-48 bytes each at minCount=2) plus a sentinel per duplicated
  * gram; docHits only stores docs that HAVE duplicated content.
  * `hashedKeys=true` stores xxhash64 hex strings (fixed ~16 chars)
  * instead of raw k-word grams — the production form, spec-pinned equal
  * to the string form like the batch twins.
  */
object DupSpanStream {

  def dupSpanStream(sdf: DataFrame, idCol: String, textCol: String,
                    k: Int = 5, minCount: Int = 2,
                    hashedKeys: Boolean = false): DataFrame = {
    // minCount=1 would mark every window duplicated on arrival (no
    // occurrence store needed); the batch op handles it, the incremental
    // index is pointless there — reject rather than silently diverge
    require(minCount >= 2, s"minCount must be >= 2 for the incremental index, got $minCount")
    // distributed stage: token array projected first (per-element
    // re-evaluation hazard documented on TextDedup.shingles), then the
    // position-ordered gram keys
    val prepared0 = sdf
      .select(col(idCol).cast("long").as("id"),
        graft.llm.TextDedup.tokenize(coalesce(col(textCol), lit(""))).as("toks"))
      .where(col("id").isNotNull)
    // hashed keys via the fused shingle hasher (no per-window string
    // concatenation), rendered as hex for the MapState key type — same
    // encoding as LineDedupStream (≤16 chars vs up to 20 for decimal)
    val keysC =
      if (hashedKeys)
        transform(graft.llm.TextDedup.shingleHashes(col("toks"), k),
          h => hex(h))
      else graft.llm.TextDedup.shingles(col("toks"), k)
    val prepared = prepared0.select(col("id"), keysC.as("gkeys"))

    val rowEnc = Encoders.row(prepared.schema)
    val outSchema = new org.apache.spark.sql.types.StructType()
      .add(idCol, "long").add("span_start", "long").add("span_end", "long")
      .add("upd_seq", "long")
    val outEnc = Encoders.row(outSchema)
    val mc = minCount
    val kk = k

    val processor = new StatefulProcessor[Int, Row, Row] {
      @transient private var gramOcc: org.apache.spark.sql.streaming.MapState[String, Array[Long]] = _
      @transient private var docHits: org.apache.spark.sql.streaming.MapState[Long, Array[Long]] = _
      @transient private var seen: org.apache.spark.sql.streaming.MapState[Long, Long] = _
      @transient private var seqCtr: org.apache.spark.sql.streaming.ValueState[Long] = _

      override def init(outputMode: OutputMode, tm: TimeMode): Unit = {
        gramOcc = getHandle.getMapState[String, Array[Long]]("gramOcc",
          Encoders.STRING, Encoders.kryo[Array[Long]], TTLConfig.NONE)
        docHits = getHandle.getMapState[Long, Array[Long]]("docHits",
          Encoders.scalaLong, Encoders.kryo[Array[Long]], TTLConfig.NONE)
        seen = getHandle.getMapState[Long, Long]("seen",
          Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
        seqCtr = getHandle.getValueState[Long]("seq", Encoders.scalaLong, TTLConfig.NONE)
      }

      override def handleInputRows(key: Int, rows: Iterator[Row],
                                   timerValues: TimerValues): Iterator[Row] = {
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        var seq = if (seqCtr.exists()) seqCtr.get() else 0L
        // batch-local accumulation of new hits; docHits/emission updated
        // once per changed doc at the end of the micro-batch
        val newHits = scala.collection.mutable.HashMap
          .empty[Long, scala.collection.mutable.ArrayBuffer[Long]]
        def addHit(d: Long, p: Long): Unit =
          newHits.getOrElseUpdate(d,
            scala.collection.mutable.ArrayBuffer.empty[Long]) += p

        rows.toSeq.sortBy(_.getLong(0)).foreach { r =>
          val id = r.getLong(0)
          if (!seen.containsKey(id)) {
            seen.updateValue(id, 1L)
            val gk = r.getSeq[String](1)
            var pos = 0
            while (pos < gk.length) {
              val gkey = gk(pos)
              val occ = gramOcc.getValue(gkey) // null = first occurrence
              if (occ == null) {
                gramOcc.updateValue(gkey, Array(id, pos.toLong))
              } else if (occ.length == 0) {
                addHit(id, pos.toLong) // already promoted: O(1) from here on
              } else if (occ.length / 2 + 1 >= mc) {
                // promotion: the stored occurrences become hits
                // RETROACTIVELY along with the arriving one
                var i = 0
                while (i < occ.length) { addHit(occ(i), occ(i + 1)); i += 2 }
                addHit(id, pos.toLong)
                gramOcc.updateValue(gkey, Array.emptyLongArray)
              } else {
                val next = new Array[Long](occ.length + 2)
                System.arraycopy(occ, 0, next, 0, occ.length)
                next(occ.length) = id
                next(occ.length + 1) = pos.toLong
                gramOcc.updateValue(gkey, next)
              }
              pos += 1
            }
          }
        }

        // replace-by-doc emission: merge accumulated hits into state and
        // re-emit each changed doc's full span set under one fresh seq
        newHits.toSeq.sortBy(_._1).foreach { case (d, added) =>
          val prev = {
            val v = docHits.getValue(d)
            if (v == null) Array.emptyLongArray else v
          }
          val all = (prev ++ added).distinct.sorted
          docHits.updateValue(d, all)
          // gaps-and-islands over window starts: hit h covers [h, h+k-1];
          // merge while next start <= current end (strict-overlap rule,
          // identical to the batch running-max break condition)
          var i = 0
          while (i < all.length) {
            val s = all(i)
            var e = s + (kk - 1)
            var j = i + 1
            while (j < all.length && all(j) <= e) {
              e = all(j) + (kk - 1); j += 1
            }
            out += Row(d, s, e, seq)
            i = j
          }
          seq += 1
        }
        seqCtr.update(seq)
        out.iterator
      }
    }

    implicit val outRowEnc: org.apache.spark.sql.Encoder[Row] = outEnc
    prepared.as(rowEnc)
      .groupByKey((_: Row) => 0)(Encoders.scalaInt)
      .transformWithState[Row](processor, TimeMode.None(), OutputMode.Update())
  }

  /** GRAM-SHARDED stage A — the scale-out path past the monolith's
    * single-task ceiling (~1,120 docs/s flat, BASELINE.md round-9),
    * following the `NearDupStream.shardedEdges`/`unionFindStage`
    * precedent. The monolith serializes promotion AND span merging in
    * one task because it keys everything to one Int; but unlike the
    * near-dup union-find, NOTHING here is corpus-global: gram promotion
    * is per-gram-local and span merging is per-doc-local — the operator
    * shards end-to-end.
    *
    * Stage A keys `transformWithState` by the gram itself (posexplode →
    * groupByKey(gkey)), so each gram's occurrence list is its own state
    * row and the promotion work spreads across all cores. Per-gram state
    * is TINY and bounded: at most `minCount - 1` stored (doc, pos) pairs
    * before promotion, then the zero-length sentinel — so the duplicate-
    * occurrence guard scan is O(minCount), and a redelivered occurrence
    * is idempotent (stored ones are skipped; post-promotion re-hits
    * re-emit, which stage B's distinct-merge absorbs). Output: the HIT
    * log (id, pos) — every (doc, window-start) now known duplicated,
    * including the retroactive stored ones released at promotion.
    * Append-mode (hits are never retracted).
    *
    * Spark 4.1 does not chain two update-mode `transformWithState`
    * operators in one query, so stage B runs as a second query bridged
    * by a replayable log of stage-A hits (memory table in the harnesses;
    * files/kafka in production) — the same deployment shape as the
    * sharded near-dup pair.
    */
  def shardedGramHits(sdf: DataFrame, idCol: String, textCol: String,
                      k: Int = 5, minCount: Int = 2,
                      hashedKeys: Boolean = false): DataFrame = {
    require(minCount >= 2, s"minCount must be >= 2 for the incremental index, got $minCount")
    val prepared0 = sdf
      .select(col(idCol).cast("long").as("id"),
        graft.llm.TextDedup.tokenize(coalesce(col(textCol), lit(""))).as("toks"))
      .where(col("id").isNotNull)
    val keysC =
      if (hashedKeys)
        transform(graft.llm.TextDedup.shingleHashes(col("toks"), k), h => hex(h))
      else graft.llm.TextDedup.shingles(col("toks"), k)
    val prepared = prepared0
      .select(col("id"), posexplode(keysC).as(Seq("pos", "gkey")))
      .select(col("gkey"), col("id"), col("pos").cast("long").as("pos"))

    val rowEnc = Encoders.row(prepared.schema)
    val outSchema = new org.apache.spark.sql.types.StructType()
      .add(idCol, "long").add("pos", "long")
    val outEnc = Encoders.row(outSchema)
    val mc = minCount

    val processor = new StatefulProcessor[String, Row, Row] {
      @transient private var occS: org.apache.spark.sql.streaming.ValueState[Array[Long]] = _

      override def init(outputMode: OutputMode, tm: TimeMode): Unit =
        occS = getHandle.getValueState[Array[Long]]("occ",
          Encoders.kryo[Array[Long]], TTLConfig.NONE)

      override def handleInputRows(gkey: String, rows: Iterator[Row],
                                   timerValues: TimerValues): Iterator[Row] = {
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        // deterministic processing order within the batch → deterministic
        // retroactive-release order per gram
        rows.toSeq.sortBy(r => (r.getLong(1), r.getLong(2))).foreach { r =>
          val id = r.getLong(1)
          val pos = r.getLong(2)
          val occ = occS.get() // null = first occurrence of this gram
          if (occ == null) {
            occS.update(Array(id, pos))
          } else if (occ.length == 0) {
            out += Row(id, pos) // promoted: O(1) from here on
          } else {
            // idempotence guard: a redelivered stored occurrence must not
            // inflate the count (scan bounded by minCount-1 entries)
            var dup = false
            var i = 0
            while (i < occ.length && !dup) {
              dup = occ(i) == id && occ(i + 1) == pos
              i += 2
            }
            if (!dup) {
              if (occ.length / 2 + 1 >= mc) {
                var j = 0
                while (j < occ.length) { out += Row(occ(j), occ(j + 1)); j += 2 }
                out += Row(id, pos)
                occS.update(Array.emptyLongArray)
              } else {
                val next = new Array[Long](occ.length + 2)
                System.arraycopy(occ, 0, next, 0, occ.length)
                next(occ.length) = id
                next(occ.length + 1) = pos
                occS.update(next)
              }
            }
          }
        }
        out.iterator
      }
    }

    implicit val outRowEnc: org.apache.spark.sql.Encoder[Row] = outEnc
    prepared.as(rowEnc)
      .groupByKey((r: Row) => r.getString(0))(Encoders.STRING)
      .transformWithState[Row](processor, TimeMode.None(), OutputMode.Append())
  }

  /** Sharded stage B — doc-keyed span merge over the stage-A hit log.
    * Keys by document id (every doc's island merge is independent), so
    * this stage scales out too: per doc-key state is the sorted hit-
    * position array plus a per-doc update counter. Emits the monolith's
    * REPLACE-BY-DOC change log: whenever a doc's hit set grows, its full
    * merged span list re-emits under one fresh per-doc `upd_seq` (the
    * live view — [[latestSpans]] — partitions by doc, so a per-doc
    * counter carries the same semantics as the monolith's global one).
    * Duplicate hits from stage-A redelivery merge away in the distinct
    * union.
    */
  def spanMergeStage(hits: DataFrame, idCol: String, k: Int = 5): DataFrame = {
    val prepared = hits.select(col(idCol).cast("long").as("id"),
      col("pos").cast("long").as("pos"))
    val rowEnc = Encoders.row(prepared.schema)
    val outSchema = new org.apache.spark.sql.types.StructType()
      .add(idCol, "long").add("span_start", "long").add("span_end", "long")
      .add("upd_seq", "long")
    val outEnc = Encoders.row(outSchema)
    val kk = k

    val processor = new StatefulProcessor[Long, Row, Row] {
      @transient private var hitsS: org.apache.spark.sql.streaming.ValueState[Array[Long]] = _
      @transient private var seqS: org.apache.spark.sql.streaming.ValueState[Long] = _

      override def init(outputMode: OutputMode, tm: TimeMode): Unit = {
        hitsS = getHandle.getValueState[Array[Long]]("hits",
          Encoders.kryo[Array[Long]], TTLConfig.NONE)
        seqS = getHandle.getValueState[Long]("seq", Encoders.scalaLong, TTLConfig.NONE)
      }

      override def handleInputRows(d: Long, rows: Iterator[Row],
                                   timerValues: TimerValues): Iterator[Row] = {
        val prev = { val v = hitsS.get(); if (v == null) Array.emptyLongArray else v }
        val added = rows.map(_.getLong(1)).toArray
        val all = (prev ++ added).distinct.sorted
        if (all.length == prev.length) Iterator.empty // nothing new: no supersession
        else {
          val out = scala.collection.mutable.ArrayBuffer.empty[Row]
          val seq = if (seqS.exists()) seqS.get() else 0L
          hitsS.update(all)
          var i = 0
          while (i < all.length) {
            val s = all(i)
            var e = s + (kk - 1)
            var j = i + 1
            while (j < all.length && all(j) <= e) { e = all(j) + (kk - 1); j += 1 }
            out += Row(d, s, e, seq)
            i = j
          }
          seqS.update(seq + 1)
          out.iterator
        }
      }
    }

    implicit val outRowEnc: org.apache.spark.sql.Encoder[Row] = outEnc
    prepared.as(rowEnc)
      .groupByKey((r: Row) => r.getLong(0))(Encoders.scalaLong)
      .transformWithState[Row](processor, TimeMode.None(), OutputMode.Update())
  }

  /** The live span view from the operator's change log: each doc's rows
    * at its maximum `upd_seq`, shaped like `TextDedup.duplicateSpans`
    * output (id, span_start, span_end, span_tokens).
    */
  def latestSpans(log: DataFrame, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
    log.withColumn("__max_seq", max(col("upd_seq")).over(w))
      .filter(col("upd_seq") === col("__max_seq"))
      .select(col(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))
  }
}
