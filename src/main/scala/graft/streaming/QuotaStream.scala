package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
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

  /** TOKEN-budget admission — `CorpusOps.mixByTokenBudget` applied at the
    * ingest point (the quota is a token count, not a row count): admit
    * an arrival while the group's tokens consumed so far are under its
    * budget (the crossing document is admitted — greedy fill, the batch
    * contract), reject everything after. Token counting (the shared
    * BPE-ish regexp) runs in the distributed stateless stage; the
    * stateful stage holds ONE long per group (tokens consumed). Output
    * = the input row + `n_tok` + `tok_before` (the batch operator's
    * audit columns), append-only; an `orderCol`-ordered feed reproduces
    * the batch admission set exactly, so the replay row shares the
    * batch mirror.
    */
  def tokenBudgetStream(sdf: DataFrame, groupCol: String, orderCol: String,
                        textCol: String, defaultBudget: Long,
                        budgetByGroup: Map[String, Long] = Map.empty,
                        tokenizer: Option[Column => Column] = None): DataFrame = {
    require(defaultBudget > 0, s"defaultBudget must be positive, got $defaultBudget")
    budgetByGroup.foreach { case (g, b) =>
      require(b > 0, s"budget for group $g must be positive, got $b")
    }
    val inSchema = sdf.schema
    // `tokenizer` swaps the BPE-ish regexp for a real token counter
    // (e.g. Bpe.tokenCount under a deployed model) — still evaluated in
    // the distributed stateless stage, identical batch/stream semantics
    val nTok = tokenizer
      .map(f => f(coalesce(col(textCol), lit(""))))
      .getOrElse(regexp_count(coalesce(col(textCol), lit("")),
        lit("\\w+|[^\\w\\s]")))
    val prepared = sdf.select(
      col(groupCol).cast("string").as("__g"),
      col(orderCol).cast("long").as("__o"),
      nTok.cast("long").as("__ntok"),
      struct(col("*")).as("__row"))
    val prepEnc = Encoders.row(prepared.schema)
    val outSchema = inSchema
      .add("n_tok", "long").add("tok_before", "long")
    val outEnc = Encoders.row(outSchema)
    val budgets = budgetByGroup
    val dflt = defaultBudget

    val processor = new StatefulProcessor[String, Row, Row] {
      @transient private var toks: org.apache.spark.sql.streaming.ValueState[Long] = _

      override def init(outputMode: OutputMode, tm: TimeMode): Unit =
        toks = getHandle.getValueState[Long]("toks", Encoders.scalaLong, TTLConfig.NONE)

      override def handleInputRows(group: String, rows: Iterator[Row],
                                   timerValues: TimerValues): Iterator[Row] = {
        val budget = budgets.getOrElse(group, dflt)
        var n = if (toks.exists()) toks.get() else 0L
        if (n >= budget) {
          rows.foreach(_ => ())
          Iterator.empty
        } else {
          val admitted = scala.collection.mutable.ArrayBuffer.empty[Row]
          rows.toSeq.sortBy(_.getLong(1)).foreach { r =>
            if (n < budget) {
              val nt = r.getLong(2)
              val payload = r.getStruct(3)
              admitted += Row.fromSeq(payload.toSeq :+ nt :+ n)
              n += nt
            }
          }
          toks.update(n)
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
