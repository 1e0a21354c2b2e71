package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming per-group QUOTA ADMISSION — the continuous-ingestion twin
  * of `CorpusOps.capPerGroup` (the RefinedWeb-style per-source cap):
  * admit a group's first `cap` arrivals, reject everything after. The
  * batch operator bounds a finished corpus; this is the same contract
  * applied at the INGEST point — the shape a production crawl pipeline
  * actually needs the cap in (stop paying for a source once its quota
  * is filled, before any downstream work sees the excess).
  *
  * Semantics: arrivals are processed per group in `orderCol` order
  * within each micro-batch, and admission is first-`cap`-by-arrival
  * across batches. When the feed is globally ordered by `orderCol` (the
  * replay harness's contract), admissions equal the batch
  * `capPerGroup(df, groupCol, orderCol, cap)` output exactly — the
  * `doc_source_cap_stream_replay` row shares the batch row's DuckDB
  * mirror. Under out-of-order arrival the operator degrades to
  * first-come-first-admitted (admission decisions are irrevocable at
  * ingest by design — an admit cannot be clawed back from downstream),
  * with per-batch `orderCol` sorting bounding the reordering to batch
  * granularity.
  *
  * Scale: state is ONE long per group (the admission count) — bounded
  * by distinct groups, not rows; output is append-only (admissions are
  * immutable); the stateful stage is keyed by group, so parallelism
  * scales with group count and the hot source costs the same O(1) per
  * arrival as a cold one. This is the streaming operator whose BATCH
  * form Catalyst already provides natively (InferWindowGroupLimit —
  * see capPerGroup's scaladoc); no streaming equivalent exists, so the
  * stateful stage is hand-built where the batch tier deliberately
  * is not.
  */
object QuotaStream {

  def capPerGroupStream(sdf: DataFrame, groupCol: String, orderCol: String,
                        cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val inSchema = sdf.schema
    val prepared = sdf.select(
      col(groupCol).cast("string").as("__g"),
      col(orderCol).cast("long").as("__o"),
      struct(col("*")).as("__row"))
    val prepEnc = Encoders.row(prepared.schema)
    val outEnc = Encoders.row(inSchema)
    val capL = cap.toLong

    val processor = new StatefulProcessor[String, Row, Row] {
      @transient private var cnt: org.apache.spark.sql.streaming.ValueState[Long] = _

      override def init(outputMode: OutputMode, tm: TimeMode): Unit =
        cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong, TTLConfig.NONE)

      override def handleInputRows(group: String, rows: Iterator[Row],
                                   timerValues: TimerValues): Iterator[Row] = {
        var n = if (cnt.exists()) cnt.get() else 0L
        if (n >= capL) {
          // quota already filled: drain without sorting or materializing
          rows.foreach(_ => ())
          Iterator.empty
        } else {
          val admitted = scala.collection.mutable.ArrayBuffer.empty[Row]
          rows.toSeq.sortBy(_.getLong(1)).foreach { r =>
            if (n < capL) { admitted += r.getStruct(2); n += 1 }
          }
          cnt.update(n)
          admitted.iterator
        }
      }
    }

    implicit val outRowEnc: org.apache.spark.sql.Encoder[Row] = outEnc
    prepared.as(prepEnc)
      .groupByKey((r: Row) => r.getString(0))(Encoders.STRING)
      .transformWithState[Row](processor, TimeMode.None(), OutputMode.Append())
  }
}
