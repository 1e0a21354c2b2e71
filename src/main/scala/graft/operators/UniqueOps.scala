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
final case class UniqueResult(current: DataFrame, expired: DataFrame) {
  def all: DataFrame =
    current.withColumn("change", lit("insert"))
      .unionByName(expired.withColumn("change", lit("expire")))
}

/** Batch (deterministic, oracle-testable) semantics of the 11 `unique:`
  * operators of siddhi-io/siddhi-execution-unique, re-expressed as Spark
  * DataFrame transformations (SURVEY.md §2.1).
  *
  * Conventions (FIXTURES.md §2):
  *  - `keys`: uniqueness key columns. We key on a struct of columns
  *    (null-safe, collision-free) — a documented deviation from the
  *    reference's string-concat keying (UniqueEverWindowProcessor.java:216-222).
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
  * §7.4.3) isolate the sequential part to a tiny (seq,key) projection and
  * keep the per-key replace step fully parallel.
  */
object UniqueOps {
  private val RN = "__graft_rn"

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
    val r = ranked(df, keys, col(seqCol).desc)
    UniqueResult(
      current = r.filter(col(RN) === 1).drop(RN),
      expired = r.filter(col(RN) > 1).drop(RN))
  }

  /** current-only fast path: one shuffle, partial aggregation (no sort). */
  def everCurrent(df: DataFrame, keys: Seq[String], seqCol: String): DataFrame =
    rowPerGroup(df, keys.map(col), seqCol, latest = true)

  // ------------------------------------------------------------------
  // 2. unique:first — first event per key, forever; duplicates silently
  //    dropped, no expired stream (UniqueFirstWindowProcessor.java:122-134,
  //    UniqueFirstWindowTestCase.java:77-79).
  // ------------------------------------------------------------------
  def first(df: DataFrame, keys: Seq[String], seqCol: String): UniqueResult =
    UniqueResult(
      current = rowPerGroup(df, keys.map(col), seqCol, latest = false),
      expired = df.limit(0))

  // ------------------------------------------------------------------
  // 3. unique:time — sliding window of windowMs holding latest-unique per
  //    key (UniqueTimeWindowProcessor.java:177-212). Batch reinterpretation:
  //    final window contents = latest row per key among events with
  //    ts > max(ts) - windowMs; everything else has expired (aged out or
  //    replaced).
  // ------------------------------------------------------------------
  def time(df: DataFrame, keys: Seq[String], seqCol: String, tsCol: String,
           windowMs: Long): UniqueResult = {
    val horizon = df.agg(max(msOf(tsCol)).as("__max_ms"))
    val withMax = df.crossJoin(broadcast(horizon))
    val alive = withMax.filter(msOf(tsCol) > col("__max_ms") - windowMs).drop("__max_ms")
    val cur = rowPerGroup(alive, keys.map(col), seqCol, latest = true)
    val expired = df.join(cur.select(seqCol), Seq(seqCol), "left_anti")
    UniqueResult(cur, expired.select(df.columns.map(col): _*))
  }

  // ------------------------------------------------------------------
  // 4/8/9. tumbling time batches: unique:timeBatch (processing-time in the
  //    reference, event-time here), unique:firstTimeBatch, and
  //    unique:externalTimeBatch (natively event-time,
  //    UniqueExternalTimeBatchWindowProcessor.java:303-326, boundary math
  //    findEndTime 454-458). Batch id = floor((ts_ms - startMs)/windowMs);
  //    within a batch keep latest (ever) or first per key.
  //    replaceTsWithBatchEnd mirrors replace.time.stamp.with.batch.end.time
  //    (cloneAppend 460-470): adds `batch_end_ms`.
  // ------------------------------------------------------------------
  def timeBatch(df: DataFrame, keys: Seq[String], seqCol: String, tsCol: String,
                windowMs: Long, startMs: Long = 0L, keepFirst: Boolean = false,
                replaceTsWithBatchEnd: Boolean = false): UniqueResult = {
    val batchId = floor((msOf(tsCol) - lit(startMs)) / lit(windowMs)).cast("long")
    val tagged = df.withColumn("__batch_id", batchId)
    var cur = rowPerGroup(tagged, col("__batch_id") +: keys.map(col), seqCol, !keepFirst)
      .withColumn("batch_start_ms", lit(startMs) + col("__batch_id") * windowMs)
    if (replaceTsWithBatchEnd)
      cur = cur.withColumn("batch_end_ms", col("batch_start_ms") + windowMs)
    cur = cur.drop("__batch_id")
    // every batch before the last has been re-emitted as EXPIRED on the next
    // flush (UniqueTimeBatchWindowProcessor.java:235-266)
    val lastBatch = tagged.agg(max(col("__batch_id")).as("__last"))
    val expired = cur.crossJoin(broadcast(lastBatch))
      .filter((col("batch_start_ms") - startMs) / windowMs < col("__last"))
      .drop("__last")
    UniqueResult(cur, expired)
  }

  def firstTimeBatch(df: DataFrame, keys: Seq[String], seqCol: String, tsCol: String,
                     windowMs: Long, startMs: Long = 0L): UniqueResult =
    timeBatch(df, keys, seqCol, tsCol, windowMs, startMs, keepFirst = true)

  def externalTimeBatch(df: DataFrame, keys: Seq[String], seqCol: String, tsCol: String,
                        windowMs: Long, startMs: Long = 0L,
                        replaceTsWithBatchEnd: Boolean = false): UniqueResult =
    timeBatch(df, keys, seqCol, tsCol, windowMs, startMs, keepFirst = false,
      replaceTsWithBatchEnd = replaceTsWithBatchEnd)

  // ------------------------------------------------------------------
  // 5. unique:length — sliding window over the last N *distinct keys*.
  //    The reference's expired chunk is ordered by LATEST occurrence (a
  //    replaced key is removed and re-appended,
  //    UniqueLengthWindowProcessor.java:148-157; eviction polls the head,
  //    159-166), so final window contents = the N most-recently-seen
  //    distinct keys, each holding its latest event.
  // ------------------------------------------------------------------
  def length(df: DataFrame, keys: Seq[String], seqCol: String, n: Int): UniqueResult = {
    val latest = rowPerGroup(df, keys.map(col), seqCol, latest = true)
    // rank distinct keys by recency; |keys| rows only after the first agg,
    // so the single-partition window sort is over key-cardinality, not rows.
    val rankW = Window.orderBy(col(seqCol).desc)
    val cur = latest.withColumn(RN, row_number().over(rankW))
      .filter(col(RN) <= n).drop(RN)
    val expired = df.join(cur.select(seqCol), Seq(seqCol), "left_anti")
    UniqueResult(cur, expired.select(df.columns.map(col): _*))
  }

  // ------------------------------------------------------------------
  // 6/7. unique:lengthBatch / unique:firstLengthBatch — tumbling batch
  //    that flushes when it holds N distinct keys
  //    (UniqueLengthBatchWindowProcessor.java:165-197). The count trigger
  //    depends on global arrival order + per-batch distinct count — an
  //    inherently sequential decision (SURVEY.md §7.4.3). We compute batch
  //    boundaries with a fold over the (seq, key) projection on a single
  //    partition (tiny: two columns), then do the keyed replace/keep-first
  //    fully in parallel. Events after the last flush are still pending
  //    (never emitted), matching the reference's observable output.
  // ------------------------------------------------------------------
  def lengthBatch(df: DataFrame, keys: Seq[String], seqCol: String, n: Int,
                  keepFirst: Boolean = false): UniqueResult = {
    val keyStr = concat_ws("", keys.map(c => col(c).cast("string")): _*)
    val seqKey = df.select(col(seqCol).cast("long").as("s"), keyStr.as("k"))
      .repartition(1).sortWithinPartitions("s")
    implicit val enc = Encoders.scalaLong
    // fold: boundary = seq of the event that brings the batch to N distinct keys
    val boundaries: Array[Long] = seqKey.mapPartitions { it =>
      val out = Iterator.newBuilder[Long] // scala.collection builder, small
      val cur = scala.collection.mutable.HashSet.empty[String]
      it.foreach { r =>
        val s = r.getLong(0); val k = r.getString(1)
        cur += k
        if (cur.size == n) { out += s; cur.clear() }
      }
      out.result()
    }(enc).collect().sorted
    val bc = df.sparkSession.sparkContext.broadcast(boundaries)
    val batchIdOf = udf { (s: Long) =>
      val b = bc.value
      var lo = 0; var hi = b.length // # boundaries strictly below s
      while (lo < hi) { val mid = (lo + hi) >>> 1; if (b(mid) < s) lo = mid + 1 else hi = mid }
      lo
    }
    val nBatches = boundaries.length
    val tagged = df.withColumn("__batch_id", batchIdOf(col(seqCol).cast("long")))
      .filter(col("__batch_id") < nBatches) // drop the pending (unflushed) tail
    val cur = rowPerGroup(tagged, col("__batch_id") +: keys.map(col), seqCol, !keepFirst)
      .withColumnRenamed("__batch_id", "batch_id")
    val expired = cur.filter(col("batch_id") < nBatches - 1)
    UniqueResult(cur, expired)
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
      .drop("__batch_id")
    val lastBatch = tagged.agg(max(col("__batch_id")).as("__last"))
    val expired = cur.crossJoin(broadcast(lastBatch))
      .filter((col("batch_start_ms") - startMs) / windowMs < col("__last"))
      .drop("__last")
    UniqueResult(cur, expired)
  }

  // ------------------------------------------------------------------
  // 11. unique:deduplicate — drop events whose key was emitted within the
  //    last intervalMs; first-wins, dropped duplicates do NOT refresh the
  //    interval (map.get/put-if-absent, DeduplicateStreamProcessor.java:158-176);
  //    a key is re-admitted when ts - lastKeptTs > intervalMs (strict,
  //    eviction condition line 160). No expired stream
  //    (DeduplicateTestCase.java:84-86).
  //    Implementation: secondary sort — repartition by key, sort partitions
  //    by (key, ts_ms, seq), one streaming fold per partition. O(1) memory
  //    per row, fully parallel across keys; survives 100 TB.
  // ------------------------------------------------------------------
  def deduplicate(df: DataFrame, keys: Seq[String], seqCol: String, tsCol: String,
                  intervalMs: Long): UniqueResult = {
    val keyStr = concat_ws("", keys.map(c => col(c).cast("string")): _*)
    val prepped = df.withColumn("__k", keyStr).withColumn("__ms", msOf(tsCol))
    val sorted = prepped.repartition(col("__k"))
      .sortWithinPartitions(col("__k"), col("__ms"), col(seqCol))
    val schema = sorted.schema
    implicit val enc = Encoders.row(schema)
    val kept = sorted.mapPartitions { it =>
      var curKey: String = null
      var lastKept = Long.MinValue
      val kIdx = schema.fieldIndex("__k")
      val msIdx = schema.fieldIndex("__ms")
      it.filter { r =>
        val k = r.getString(kIdx); val ms = r.getLong(msIdx)
        if (k != curKey) { curKey = k; lastKept = ms; true }
        else if (ms - lastKept > intervalMs) { lastKept = ms; true }
        else false
      }
    }(enc)
    UniqueResult(kept.drop("__k", "__ms"), df.limit(0))
  }
}
