package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

import graft.llm.TextDedup

/** Streaming BM25 INDEX INGESTION — the missing half of the lexical
  * retrieval tier's streaming story. [[Bm25SearchStream]] scores arriving
  * QUERIES against a static offline-built index; this operator is the
  * twin where the INDEX ITSELF ingests: documents enter the searchable
  * corpus as they arrive (their postings and the per-term document
  * frequency update in state), and interleaved queries probe exactly the
  * arrivals-so-far — the `emb_ann_stream_replay` earlier-arrivals
  * contract applied to lexical retrieval.
  *
  * Shape (the [[NearDupStream.shardedEdges]] pattern): one tagged input
  * stream of documents and queries; `transformWithState` keyed by TOKEN,
  * so the index shards across all cores by term and no single task
  * serializes ingestion. Per token the state is the df count plus the
  * stored postings (doc_id, tf, dl — an append log, exactly the batch
  * index's postings relation restricted to this term). Rows within a
  * micro-batch are processed in `seq` order, so arrival semantics are
  * chunking-insensitive: a query with seq q sees precisely the documents
  * with seq < q, whether they arrived three batches ago or three rows
  * ago.
  *
  *  - DOC arrival: if the term's df has reached `maxDf` the term is
  *    SATURATED — the posting is not stored and df stays pinned (the
  *    online analog of the batch `maxDfFrac` Zipf-head prune: stopword-
  *    grade terms stop costing state; BM25 gives them ~zero idf anyway).
  *    Otherwise df += 1 and the posting is appended. Emits nothing.
  *  - QUERY arrival: emits one row per stored posting of the term —
  *    (query_id, doc_id, tok, tf, dl, df_p) with df_p = the df AT PROBE
  *    TIME — the integer statistics surface of [[graft.llm.TextSearch]]
  *    at per-term granularity. The per-(query, doc) fold (and ranking)
  *    is the consumer's side of the contract, as in [[Bm25SearchStream]];
  *    `doc_bm25_index_stream_replay` folds it batch-side and hash-matches
  *    a DuckDB mirror that re-derives the prefix-df relation in SQL.
  *
  * State bound: df is one long per live term; postings are capped at
  * `maxDf` entries per term, so total state ≤ vocab × maxDf postings —
  * the operator never holds the unbounded corpus (contrast the batch
  * index, which IS corpus-sized but offline). Output mode is Append:
  * emissions are final (a probe result never revises), which is what
  * makes the kill/restart row share this oracle.
  *
  * Reference anchor: the unique-window family's "window contents at
  * arrival time" semantics (e.g. UniqueEverWindowTestCase.java:221-263)
  * — here the "window" is the ingested index and the probe is retrieval.
  */
object Bm25IngestStream {

  /** `stream` carries `idCol` (long; doubles as the arrival seq),
    * `textCol`, and boolean `isQueryCol`. Doc and query ids must be
    * disjoint (they share the seq axis).
    */
  def bm25IngestStream(stream: DataFrame, idCol: String, textCol: String,
                       isQueryCol: String,
                       maxDf: Int = Int.MaxValue): DataFrame = {
    require(maxDf > 0, s"maxDf must be positive, got $maxDf")
    // one row per (arrival, distinct token): tf precomputed by a HOF
    // (no pre-state aggregation — Spark can't chain one into
    // transformWithState), dl = token count. Queries carry tf = 0.
    val prepared = stream.select(col(idCol).cast("long").as("seq"),
        col(isQueryCol).cast("boolean").as("is_query"),
        TextDedup.tokenize(col(textCol)).as("toks"))
      .select(col("seq"), col("is_query"), size(col("toks")).as("dl"),
        explode(transform(array_distinct(col("toks")),
          t => struct(t.as("tok"),
            size(filter(col("toks"), x => x === t)).as("tf")))).as("e"))
      .select(col("e.tok").as("tok"), col("seq"), col("is_query"),
        when(col("is_query"), lit(0L)).otherwise(col("e.tf").cast("long")).as("tf"),
        col("dl").cast("long").as("dl"))
    val rowEnc = Encoders.row(prepared.schema)
    val outSchema = new org.apache.spark.sql.types.StructType()
      .add("query_id", "long").add("doc_id", "long").add("tok", "string")
      .add("tf", "long").add("dl", "long").add("df_p", "long")
    val outEnc = Encoders.row(outSchema)

    val processor = new StatefulProcessor[String, Row, Row] {
      @transient private var df: org.apache.spark.sql.streaming.ValueState[Long] = _
      // postings append log: Array(doc_id, tf, dl) per stored doc
      @transient private var postings: org.apache.spark.sql.streaming.ListState[Array[Long]] = _

      override def init(outputMode: OutputMode, tm: TimeMode): Unit = {
        df = getHandle.getValueState[Long]("df", Encoders.scalaLong, TTLConfig.NONE)
        postings = getHandle.getListState[Array[Long]]("post",
          Encoders.kryo[Array[Long]], TTLConfig.NONE)
      }

      override def handleInputRows(tok: String, rows: Iterator[Row],
                                   timerValues: TimerValues): Iterator[Row] = {
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        // seq order within the batch = arrival order (doc/query ids are
        // disjoint, so the sort is total)
        rows.toSeq.sortBy(_.getLong(1)).foreach { r =>
          val seq = r.getLong(1)
          val isQuery = r.getBoolean(2)
          if (isQuery) {
            val dfNow = if (df.exists()) df.get() else 0L
            postings.get().foreach { p =>
              out += Row(seq, p(0), tok, p(1), p(2), dfNow)
            }
          } else {
            val dfNow = if (df.exists()) df.get() else 0L
            if (dfNow < maxDf) {
              df.update(dfNow + 1L)
              postings.appendValue(Array(seq, r.getLong(3), r.getLong(4)))
            }
            // saturated term: posting dropped, df pinned at maxDf — the
            // online Zipf-head prune (documented, mirrored, not silent)
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
