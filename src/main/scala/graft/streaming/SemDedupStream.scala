package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — the
  * continuous-ingestion twin of `Similarity.semDedup`, completing the
  * one LLM-tier operator that was batch-only. The reference's dedup
  * processors answer "is this arriving event a duplicate of the live
  * index?" per event (DeduplicateStreamProcessor.java:155-178); this is
  * that contract for SEMANTIC duplicates: per arriving embedding,
  * "does an ε-cosine neighbor already live in my k-means cell?",
  * maintained transitively so the final survivor set equals the batch
  * operator's on the same corpus.
  *
  * Deployed-model contract (the DSIR/BM25/codebook pattern): the k-means
  * cell model is trained OFFLINE — `Similarity.semDedupCentroids` runs
  * the exact `lloydAssign` anchor-init + quantized-mean chain the batch
  * operator and its DuckDB mirror pin — and the nCells (cell, centroid)
  * rows are passed as literals. Arrivals never retrain cells: assignment
  * is a pure per-row expression, so the stateless stage stays
  * distributed and codegen'd.
  *
  * Architecture (the cell-SHARDED scale shape, not a monolith):
  *  - Stage 1 (stateless, distributed): cast/width-check the vector and
  *    assign its cell with the SAME `VecCosine` expression and the SAME
  *    max_by(struct(csim, -cell)) tie policy as the batch assignment —
  *    an `array_max` over nCells literal-centroid struct scores, one
  *    codegen'd projection, no shuffle, no state.
  *  - Stage 2 (`transformWithState` KEYED BY CELL — parallelism scales
  *    with nCells, the `shardedIvfPqCellHits` lesson): each cell shard
  *    holds its members (id → vector + centroid-csim), a min-rooted
  *    union-find over the ε-edges seen so far, and one keeper summary
  *    per component root. Per arrival: exact-cosine scan of the cell's
  *    members (the batch within-cell quadratic, paid incrementally),
  *    union with every matched component, and an O(components-merged)
  *    keeper update — the component keeper is min by (csim, id), and
  *    min is associative, so merging keepers never rescans members.
  *
  * Output is a CHANGE LOG in update mode: (id, change, cell, upd_seq).
  *  - an arrival in no ε-pair emits (id, "keep")
  *  - an arrival joining a component emits its own verdict, plus a
  *    "drop" RETRACTION for each previous component keeper it demotes
  *    (the keep-least-centroid-similar policy means a late arrival with
  *    smaller csim takes over the component — greedy emit-once
  *    operators get this wrong, same argument as NearDupStream).
  * A doc's latest row by `upd_seq` is its live verdict; survivors =
  * latest change == "keep" — exactly the batch `semDedup` survivor set,
  * hash-verified by `emb_semdedup_stream_replay` against the SAME
  * DuckDB recursive-CTE oracle as the batch row.
  *
  * `maxCell` (the batch hot-cell cap) carries over EXACTLY: the batch
  * rule "a cell whose FINAL occupancy exceeds maxCell is excluded from
  * the pair scan — its members all survive" depends only on the final
  * count, and occupancy only grows, so the stream saturates a cell the
  * moment its count crosses the cap: it emits one "saturated" telemetry
  * row ("no silent caps"), re-promotes every currently-dropped member
  * to "keep", DELETES the cell's members/union-find/keeper state (the
  * hot cell stops paying the quadratic AND frees its vectors — state
  * SHRINKS at the hot spot), and admits all future arrivals as keeps.
  * Saturated-cell survivors therefore hash-match the capped batch
  * oracle (`emb_semdedup_capped_stream_replay`). A saturation row
  * always precedes the verdicts it triggers, so max_by(upd_seq)
  * consumers are unperturbed (the NearDupStream telemetry contract).
  *
  * Scale: state is Σ min(|cell|, maxCell) vectors, RocksDB-resident,
  * sharded by cell; per-arrival work is one |cell|-length cosine scan —
  * the batch n²/nCells budget paid online — and the cap bounds both at
  * the skew point. Null/empty vectors emit vector-less "keep"s and are
  * never candidates (batch parity: they join no pairs).
  */
object SemDedupStream {

  /** @param centroids deployed cell model from
    *                   [[graft.llm.Similarity.semDedupCentroids]] (train
    *                   offline, deploy — must be the lloydAssign output
    *                   for batch-oracle parity)
    *
    * PRECISION CONTRACT: input vectors are narrowed to float32 on entry
    * (halves RocksDB state vs the batch path's array<double>; the
    * subsequent compute re-widens float→double, which is exact). Batch
    * hash-parity therefore holds exactly when the source vectors are
    * float32-representable — true for `embeddings.parquet` and the
    * usual model-emitted embeddings. A genuinely float64 source can
    * land eps-boundary cosines (and centroid-assignment ties) on the
    * other side of the batch verdict; for such sources widen the state
    * (cast "array<double>") instead of expecting bit-parity.
    */
  def semDedupStream(sdf: DataFrame, idCol: String, vecCol: String,
                     dim: Int, eps: Double,
                     centroids: Seq[(Long, Seq[Double])],
                     maxCell: Int = Int.MaxValue): DataFrame = {
    require(eps > 0 && eps <= 1, s"eps must be in (0, 1], got $eps")
    require(centroids.nonEmpty, "centroids must be non-empty")
    require(maxCell > 0, s"maxCell must be positive, got $maxCell")
    val v0 = coalesce(col(vecCol).cast("array<float>"),
      array().cast("array<float>"))
    val checked = when(size(v0) === 0, v0)
      .otherwise(graft.llm.Similarity.requireDim(v0, dim))
    // batch-assignment parity: same VecCosine over array<double>, same
    // max_by(struct(csim, -cell)) tie policy (ties → smallest cell id),
    // realized as array_max over literal-centroid struct scores
    val scores = centroids.map { case (cell, cent) =>
      struct(
        graft.llm.Similarity.cosine(col("__v").cast("array<double>"),
          typedlit(cent)).as("csim"),
        lit(-cell).as("negcell"),
        lit(cell).as("cell"))
    }
    val best = array_max(array(scores: _*))
    val prepared = sdf
      .select(col(idCol).cast("long").as("id"), checked.as("__v"))
      .where(col("id").isNotNull)
      .select(
        when(size(col("__v")) === 0, lit(-1L))
          .otherwise(best.getField("cell")).as("cell"),
        col("id"), col("__v").as("v"),
        when(size(col("__v")) === 0, lit(0.0))
          .otherwise(best.getField("csim")).as("csim"))
    val prepEnc = Encoders.row(prepared.schema)
    val outSchema = new org.apache.spark.sql.types.StructType()
      .add(idCol, "long").add("change", "string")
      .add("cell", "long").add("upd_seq", "long")
    val outEnc = Encoders.row(outSchema)
    val epsV = eps
    val maxCellL = maxCell.toLong

    val processor = new StatefulProcessor[Long, Row, Row] {
      @transient private var members: org.apache.spark.sql.streaming.MapState[Long, (Array[Float], Double)] = _
      @transient private var parent: org.apache.spark.sql.streaming.MapState[Long, Long] = _
      @transient private var keeperOf: org.apache.spark.sql.streaming.MapState[Long, (Long, Double)] = _
      @transient private var cnt: org.apache.spark.sql.streaming.ValueState[Long] = _
      @transient private var seqCtr: org.apache.spark.sql.streaming.ValueState[Long] = _

      override def init(outputMode: OutputMode, tm: TimeMode): Unit = {
        members = getHandle.getMapState[Long, (Array[Float], Double)]("members",
          Encoders.scalaLong, Encoders.kryo[(Array[Float], Double)], TTLConfig.NONE)
        parent = getHandle.getMapState[Long, Long]("parent",
          Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
        keeperOf = getHandle.getMapState[Long, (Long, Double)]("keeperOf",
          Encoders.scalaLong, Encoders.kryo[(Long, Double)], TTLConfig.NONE)
        cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong, TTLConfig.NONE)
        seqCtr = getHandle.getValueState[Long]("seq", Encoders.scalaLong, TTLConfig.NONE)
      }

      private def find(x: Long): Long = {
        var r = x
        while (parent.containsKey(r)) r = parent.getValue(r)
        var c = x
        while (c != r) {
          val next = parent.getValue(c)
          if (next != r) parent.updateValue(c, r)
          c = next
        }
        r
      }

      // VecCosine's left-fold double loop (cosineScalar parity): the
      // verify must equal the batch pair predicate bit-for-bit
      private def cosF(a: Array[Float], b: Array[Float]): Double = {
        val m = a.length
        if (m != b.length) return 0.0
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < m) {
          val x = a(i).toDouble; val y = b(i).toDouble
          dot += x * y; na += x * x; nb += y * y
          i += 1
        }
        if (na == 0.0 || nb == 0.0) 0.0
        else dot / (math.sqrt(na) * math.sqrt(nb))
      }

      override def handleInputRows(cell: Long, rows: Iterator[Row],
                                   timerValues: TimerValues): Iterator[Row] = {
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        var seq = if (seqCtr.exists()) seqCtr.get() else 0L
        def emit(id: Long, change: String): Unit = {
          out += Row(id, change, cell, seq)
          seq += 1
        }
        var n = if (cnt.exists()) cnt.get() else 0L
        rows.toSeq.sortBy(_.getLong(1)).foreach { r =>
          val id = r.getLong(1)
          val vArr = r.getSeq[Float](2).toArray
          val csim = r.getDouble(3)
          if (vArr.isEmpty) {
            emit(id, "keep") // vector-less: never a candidate, not counted
          } else if (n >= maxCellL) {
            // saturated cell: every member survives, nothing is stored
            n += 1
            if (n == maxCellL + 1L) {
              // first crossing: telemetry, then re-promote every dropped
              // member, then free the cell's quadratic state entirely
              emit(id, "saturated")
              val demoted = scala.collection.mutable.ArrayBuffer.empty[Long]
              members.iterator().foreach { case (mid, _) =>
                val k = keeperOf.getValue(find(mid))
                if (k._1 != mid) demoted += mid
              }
              demoted.sorted.foreach(emit(_, "keep"))
              members.clear(); parent.clear(); keeperOf.clear()
            }
            emit(id, "keep")
          } else {
            val matchedRoots = scala.collection.mutable.LinkedHashSet.empty[Long]
            members.iterator().foreach { case (mid, (mv, _)) =>
              if (cosF(vArr, mv) >= epsV) matchedRoots += find(mid)
            }
            members.updateValue(id, (vArr, csim))
            n += 1
            if (matchedRoots.isEmpty) {
              keeperOf.updateValue(id, (id, csim))
              emit(id, "keep")
            } else {
              val roots = matchedRoots.toSeq
              val newRoot = math.min(roots.min, id)
              val olds = roots.map(keeperOf.getValue)
              roots.foreach(r => if (r != newRoot) parent.updateValue(r, newRoot))
              if (id != newRoot) parent.updateValue(id, newRoot)
              val newKeeper = (olds :+ ((id, csim)))
                .minBy { case (kid, kcs) => (kcs, kid) }
              olds.foreach { case (oid, _) =>
                if (oid != newKeeper._1) emit(oid, "drop")
              }
              emit(id, if (id == newKeeper._1) "keep" else "drop")
              roots.foreach(r => if (r != newRoot) keeperOf.removeKey(r))
              keeperOf.updateValue(newRoot, newKeeper)
            }
            // the arrival that fills the cell TO the cap emits nothing
            // special — only CROSSING the cap excludes the cell (batch:
            // occupancy > maxCell, strictly)
          }
        }
        cnt.update(n)
        seqCtr.update(seq)
        out.iterator
      }
    }

    implicit val outRowEnc: org.apache.spark.sql.Encoder[Row] = outEnc
    prepared.as(prepEnc)
      .groupByKey((r: Row) => r.getLong(0))(Encoders.scalaLong)
      .transformWithState[Row](processor, TimeMode.None(), OutputMode.Update())
  }
}
