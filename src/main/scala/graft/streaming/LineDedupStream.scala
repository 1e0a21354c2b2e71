package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming incremental CCNet-style line dedup — the continuous form of
  * `CorpusOps.duplicateLines`: as documents arrive, emit every (doc,
  * position) whose line content has now been seen in at least `minDf`
  * DISTINCT documents, including RETROACTIVELY for occurrences stored
  * before the threshold was crossed (a header line's first minDf-1 hosts
  * learn they carried boilerplate only when the minDf-th host arrives).
  *
  * Simpler change-log than `DupSpanStream`: dropped lines are monotone
  * and positions never merge, so the log is INSERT-ONLY — each (doc,
  * pos) appears exactly once, and the accumulated set after any prefix
  * equals the batch relation over that prefix. State per line key is a
  * header-prefixed packed occurrence array `[used, distinctDocs, d1, p1,
  * d2, p2, …, slack]` until the distinct-doc count reaches `minDf`, then
  * a zero-length sentinel (subsequent occurrences emit immediately, O(1)
  * state). Because each doc is processed exactly once (the `seen` map)
  * and the key-0 stage is serial, an arriving doc's earlier occurrences
  * of a line are always the TAIL entries — so the distinct-doc count
  * updates in O(1) per occurrence (compare against the last stored doc),
  * and geometric array growth amortizes the append copies. A line
  * repeated thousands of times inside fewer than `minDf` docs therefore
  * costs O(1) compute per occurrence; the remaining linear term is the
  * state store's per-update value serialization, bounded by the stored
  * occurrence count. Same single-task global-count stage as the other
  * corpus streams; the distributed stage does the line split and
  * (optionally) hashing. `hashedKeys=true` keys state by xxhash64 hex —
  * the production form, what CCNet itself dedups on.
  */
object LineDedupStream {

  def lineDedupStream(sdf: DataFrame, idCol: String, textCol: String,
                      minDf: Int = 3, hashedKeys: Boolean = false): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2 for the incremental index, got $minDf")
    val linesC = split(coalesce(col(textCol), lit("")), "\n")
    val keysC = if (hashedKeys) transform(linesC, l => hex(xxhash64(l))) else linesC
    val prepared = sdf.select(col(idCol).cast("long").as("id"), keysC.as("lkeys"))
      .where(col("id").isNotNull)

    val rowEnc = Encoders.row(prepared.schema)
    val outSchema = new org.apache.spark.sql.types.StructType()
      .add(idCol, "long").add("pos", "long").add("upd_seq", "long")
    val outEnc = Encoders.row(outSchema)
    val mdf = minDf

    val processor = new StatefulProcessor[Int, Row, Row] {
      @transient private var lineOcc: org.apache.spark.sql.streaming.MapState[String, Array[Long]] = _
      @transient private var seen: org.apache.spark.sql.streaming.MapState[Long, Long] = _
      @transient private var seqCtr: org.apache.spark.sql.streaming.ValueState[Long] = _

      override def init(outputMode: OutputMode, tm: TimeMode): Unit = {
        lineOcc = getHandle.getMapState[String, Array[Long]]("lineOcc",
          Encoders.STRING, Encoders.kryo[Array[Long]], TTLConfig.NONE)
        seen = getHandle.getMapState[Long, Long]("seen",
          Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
        seqCtr = getHandle.getValueState[Long]("seq", Encoders.scalaLong, TTLConfig.NONE)
      }

      override def handleInputRows(key: Int, rows: Iterator[Row],
                                   timerValues: TimerValues): Iterator[Row] = {
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        var seq = if (seqCtr.exists()) seqCtr.get() else 0L
        def emit(d: Long, p: Long): Unit = { out += Row(d, p, seq); seq += 1 }
        rows.toSeq.sortBy(_.getLong(0)).foreach { r =>
          val id = r.getLong(0)
          if (!seen.containsKey(id)) {
            seen.updateValue(id, 1L)
            val lk = r.getSeq[String](1)
            var pos = 0
            while (pos < lk.length) {
              val k = lk(pos)
              val occ = lineOcc.getValue(k)
              if (occ == null) {
                // header: [used=2 payload longs, distinctDocs=1, id, pos]
                lineOcc.updateValue(k, Array(2L, 1L, id, pos.toLong))
              } else if (occ.length == 0) {
                emit(id, pos.toLong) // promoted: every occurrence drops
              } else {
                val used = occ(0).toInt
                // docs are processed once each and this stage is serial,
                // so the arriving doc's stored occurrences (if any) are
                // exactly the tail entries: one comparison replaces the
                // old O(stored²) distinct-doc rescan
                val sameDoc = occ(2 + used - 2) == id
                val distinct = occ(1).toInt + (if (sameDoc) 0 else 1)
                if (distinct >= mdf) {
                  var m = 0
                  while (m < used) { emit(occ(2 + m), occ(2 + m + 1)); m += 2 }
                  emit(id, pos.toLong)
                  lineOcc.updateValue(k, Array.emptyLongArray)
                } else {
                  val next =
                    if (occ.length >= 2 + used + 2) occ
                    else { // geometric growth: amortized O(1) copies
                      val grown = new Array[Long](2 + (occ.length - 2) * 2)
                      System.arraycopy(occ, 0, grown, 0, 2 + used)
                      grown
                    }
                  next(2 + used) = id
                  next(2 + used + 1) = pos.toLong
                  next(0) = used + 2
                  next(1) = distinct.toLong
                  lineOcc.updateValue(k, next)
                }
              }
              pos += 1
            }
          }
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

  /** LINE-SHARDED form — the scale-out path past the monolith's
    * single-task stage, following the `DupSpanStream.shardedGramHits`
    * shape. Line dedup shards even more cleanly than spans: the change
    * log is INSERT-ONLY (each dropped (doc, pos) appears exactly once,
    * no per-doc merge), so ONE stage keyed by the line content (or its
    * xxhash64 hex under `hashedKeys`) is the whole operator — no stage
    * B, no bridge. Each line key's occurrence state is the same
    * header-prefixed `[used, distinctDocs, d, p, …]` array as the
    * monolith; within one key all of a doc's occurrences arrive in one
    * micro-batch (the explode is per doc) and rows are processed sorted
    * by (doc, pos), so the tail-contiguity O(1) distinct-count update
    * carries over. Assumes each doc enters the feed once (Spark's
    * checkpointing makes the pipeline itself exactly-once; external
    * redelivery needs an upstream guard — the monolith's `seen` map is
    * doc-global and cannot shard by line).
    *
    * Output: (idCol, pos) — accumulate the appended rows; after any
    * prefix the set equals batch `CorpusOps.duplicateLines` over it.
    */
  def shardedLineDedupStream(sdf: DataFrame, idCol: String, textCol: String,
                             minDf: Int = 3, hashedKeys: Boolean = false): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2 for the incremental index, got $minDf")
    val linesC = split(coalesce(col(textCol), lit("")), "\n")
    val keysC = if (hashedKeys) transform(linesC, l => hex(xxhash64(l))) else linesC
    val prepared = sdf.select(col(idCol).cast("long").as("id"), keysC.as("lkeys"))
      .where(col("id").isNotNull)
      .select(col("id"), posexplode(col("lkeys")).as(Seq("pos", "lkey")))
      .select(col("lkey"), col("id"), col("pos").cast("long").as("pos"))

    val rowEnc = Encoders.row(prepared.schema)
    val outSchema = new org.apache.spark.sql.types.StructType()
      .add(idCol, "long").add("pos", "long")
    val outEnc = Encoders.row(outSchema)
    val mdf = minDf

    val processor = new StatefulProcessor[String, Row, Row] {
      @transient private var occS: org.apache.spark.sql.streaming.ValueState[Array[Long]] = _

      override def init(outputMode: OutputMode, tm: TimeMode): Unit =
        occS = getHandle.getValueState[Array[Long]]("occ",
          Encoders.kryo[Array[Long]], TTLConfig.NONE)

      override def handleInputRows(lkey: String, rows: Iterator[Row],
                                   timerValues: TimerValues): Iterator[Row] = {
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        rows.toSeq.sortBy(r => (r.getLong(1), r.getLong(2))).foreach { r =>
          val id = r.getLong(1)
          val pos = r.getLong(2)
          val occ = occS.get()
          if (occ == null) {
            occS.update(Array(2L, 1L, id, pos))
          } else if (occ.length == 0) {
            out += Row(id, pos) // promoted
          } else {
            val used = occ(0).toInt
            val sameDoc = occ(2 + used - 2) == id
            val distinct = occ(1).toInt + (if (sameDoc) 0 else 1)
            if (distinct >= mdf) {
              var m = 0
              while (m < used) { out += Row(occ(2 + m), occ(2 + m + 1)); m += 2 }
              out += Row(id, pos)
              occS.update(Array.emptyLongArray)
            } else {
              val next =
                if (occ.length >= 2 + used + 2) occ
                else {
                  val grown = new Array[Long](2 + (occ.length - 2) * 2)
                  System.arraycopy(occ, 0, grown, 0, 2 + used)
                  grown
                }
              next(2 + used) = id
              next(2 + used + 1) = pos
              next(0) = used + 2
              next(1) = distinct.toLong
              occS.update(next)
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
}
