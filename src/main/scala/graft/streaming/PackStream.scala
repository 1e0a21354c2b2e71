package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming concat-and-chunk sequence packing — the continuous-ingestion
  * form of `CorpusOps.packSequences`: as documents arrive, each is
  * assigned its token offset and training-sequence id within its shard's
  * concatenated stream. A training-data service packs exactly this way:
  * the batch job packs the backfill, the stream packs the tail, and
  * because both are the same deterministic fold over (shard, id-order),
  * their assignments agree row-for-row (the `doc_pack_stream_replay`
  * CORRECTNESS row hash-matches the batch window-function oracle).
  *
  * State is one counter per shard (`ValueState[Long]` — the running token
  * offset), keyed by `shardCol`, so the operator scales with shard count
  * like every keyed operator in `UniqueStreams` tier 1; the token count
  * runs upstream as a codegen'd projection. Requires the RocksDB state
  * store for transformWithState (`UniqueStreams.useRocksDBStateStore`).
  *
  * Within a micro-batch rows are folded in `idCol` order; across batches
  * arrival order IS the packing order (matching batch requires feeding
  * each shard's docs in id order, which the id-ordered replay provides —
  * a production stream reading an ordered log gets this for free).
  */
object PackStream {

  def packStream(sdf: DataFrame, idCol: String, textCol: String,
                 shardCol: String, budget: Int = 512): DataFrame = {
    val prepared = sdf.select(col(idCol).cast("long").as("id"),
        col(shardCol).cast("string").as("shard"),
        regexp_count(col(textCol), lit("\\w+|[^\\w\\s]")).as("n_tok"))
      .where(col("id").isNotNull && col("shard").isNotNull)
    val rowEnc = Encoders.row(prepared.schema)
    val outSchema = new org.apache.spark.sql.types.StructType()
      .add(idCol, "long").add(shardCol, "string")
      .add("n_tok", "integer").add("tok_offset", "long").add("bin_id", "long")
    val outEnc = Encoders.row(outSchema)

    val processor = new StatefulProcessor[String, Row, Row] {
      @transient private var offset: org.apache.spark.sql.streaming.ValueState[Long] = _

      override def init(outputMode: OutputMode, tm: TimeMode): Unit =
        offset = getHandle.getValueState[Long]("offset", Encoders.scalaLong, TTLConfig.NONE)

      override def handleInputRows(shard: String, rows: Iterator[Row],
                                   timerValues: TimerValues): Iterator[Row] = {
        var off = if (offset.exists()) offset.get() else 0L
        val out = rows.toSeq.sortBy(_.getLong(0)).map { r =>
          val nTok = r.getInt(2)
          val row = Row(r.getLong(0), shard, nTok, off, off / budget)
          off += nTok
          row
        }
        offset.update(off)
        out.iterator
      }
    }

    implicit val outRowEnc: org.apache.spark.sql.Encoder[Row] = outEnc
    prepared.as(rowEnc)
      .groupByKey((r: Row) => r.getString(1))(Encoders.STRING)
      .transformWithState[Row](processor, TimeMode.None(), OutputMode.Update())
  }
}
