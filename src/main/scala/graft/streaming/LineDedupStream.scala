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
  * equals the batch relation over that prefix. State per line key is the
  * packed (doc, pos) occurrence list until the distinct-doc count
  * reaches `minDf`, then a zero-length sentinel (subsequent occurrences
  * emit immediately, O(1) state). Same single-task global-count stage as
  * the other corpus streams; the distributed stage does the line split
  * and (optionally) hashing. `hashedKeys=true` keys state by xxhash64
  * hex — the production form, what CCNet itself dedups on.
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
                lineOcc.updateValue(k, Array(id, pos.toLong))
              } else if (occ.length == 0) {
                emit(id, pos.toLong) // promoted: every occurrence drops
              } else {
                // distinct docs = |{stored docs} ∪ {arriving doc}|: start
                // at 1 for the arriving doc, skip its own stored earlier
                // positions, count each other doc once (first stored slot)
                var distinct = 1
                var i = 0
                while (i < occ.length) {
                  if (occ(i) != id) {
                    var j = 0; var dup = false
                    while (j < i && !dup) { dup = occ(j) == occ(i); j += 2 }
                    if (!dup) distinct += 1
                  }
                  i += 2
                }
                if (distinct >= mdf) {
                  var m = 0
                  while (m < occ.length) { emit(occ(m), occ(m + 1)); m += 2 }
                  emit(id, pos.toLong)
                  lineOcc.updateValue(k, Array.emptyLongArray)
                } else {
                  val next = new Array[Long](occ.length + 2)
                  System.arraycopy(occ, 0, next, 0, occ.length)
                  next(occ.length) = id
                  next(occ.length + 1) = pos.toLong
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
}
