package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Brute-force cosine top-k is the exactness baseline;
  * random-hyperplane LSH bucketing is the scale path (corpus shuffled once
  * by bucket; each probe touches only its bucket's partitions). Dot
  * products are `zip_with`/`aggregate` expressions — codegen, no UDFs.
  */
object Similarity {

  /** Cosine similarity of two float/double-array columns. One native
    * codegen'd loop (graft.functions.VecCosine) computing dot + both
    * norms with DOUBLE products — exactly the DuckDB oracle's
    * `CAST(x AS DOUBLE) * CAST(y AS DOUBLE)` math; the previous HOF form
    * multiplied in float and walked each array three times with
    * interpreted lambdas.
    */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(graft.functions.VecCosine(
      org.apache.spark.sql.GraftColumnBridge.expression(a.cast("array<double>")),
      org.apache.spark.sql.GraftColumnBridge.expression(b.cast("array<double>"))))

  /** Exact brute-force cosine top-k: every query against every corpus row.
    * The query side is broadcast (must be small); the corpus streams
    * through one pass. O(|Q|·|corpus|) compute but no corpus shuffle —
    * the right baseline, and the verifier for ANN recall.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"), cosine(col("qv"), col("cv")).as("sim"))
    scored.withColumn("rank",
        row_number().over(Window.partitionBy("query_id")
          .orderBy(col("sim").desc, col("corpus_id"))))
      .filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplanes (seeded; no RNG state).
    * Exposed (private[graft]) so the DuckDB oracle can embed the exact
    * same constants into generated SQL.
    */
  private[graft] def planes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** Packed sign-bit codes of a double-array column against an explicit
    * plane matrix, one code per band of `planesPerGroup` planes: bit i of
    * band g is set iff v · ps(g·ppg+i) >= 0. ONE native codegen'd loop
    * (graft.functions.VecBandCodes) — the previous HOF construction
    * (per-plane `aggregate(zip_with(...))`) walked the vector once per
    * plane with interpreted lambdas. Left-fold double accumulation, so
    * signs are bit-identical to any engine computing double(x)*double(y)
    * in the same order (the DuckDB oracles embed the same constants).
    */
  private[graft] def bandCodes(v: Column, ps: Array[Array[Double]], planesPerGroup: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(graft.functions.VecBandCodes(
      org.apache.spark.sql.GraftColumnBridge.expression(v),
      ps.map(_.toSeq).toSeq, planesPerGroup))

  private def signCode(v: Column, ps: Array[Array[Double]]): Column =
    element_at(bandCodes(v, ps, ps.length), 1)

  /** Fails the query loudly when an embedding's length differs from the
    * configured `dim`: zip_with against a dim-length plane null-pads on
    * mismatch, every dot folds to null, and all sign codes silently
    * collapse to bucket 0 — a wrong-width corpus would otherwise return
    * zero pairs / one giant bucket instead of erroring.
    */
  private[graft] def requireDim(v: Column, dim: Int): Column =
    when(size(v) === dim, v).otherwise(raise_error(concat(
      lit(s"embedding dimension mismatch: expected $dim, got "), size(v).cast("string"))))

  /** LSH bucket id: sign bits of the vector against nPlanes hyperplanes.
    * The float embedding is cast to array<double> first so each product
    * is a single double rounding — bit-identical to any engine computing
    * double(x)*double(y), which keeps bucket signs cross-engine stable.
    * Mismatched embedding widths raise (see requireDim).
    */
  def lshBucket(vec: Column, nPlanes: Int, dim: Int, seed: Long = 42L): Column =
    signCode(requireDim(vec.cast("array<double>"), dim), planes(nPlanes, dim, seed))

  /** LSH-bucketed ANN top-k: corpus and queries bucketed by hyperplane
    * signs; candidates = same-bucket rows only; cosine + per-query top-k
    * within candidates. With nPlanes=8 the corpus splits into ≤256
    * buckets — at 100 TB, the bucket column is the shuffle/partition key
    * and each query probes ~1/256 of the data. Recall is tunable by
    * nPlanes (fewer planes → bigger buckets → higher recall, more work).
    */
  def annTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nPlanes: Int = 8, dim: Int = 64,
              probeHamming: Int = 1): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
      .withColumn("bucket", lshBucket(col("cv"), nPlanes, dim))
    // multi-probe: a near neighbor on the far side of one hyperplane lands
    // in a bucket differing by one bit — probe all buckets within hamming
    // `probeHamming` of the query's own (classic multi-probe LSH; recall
    // rises steeply for +nPlanes extra probes per query)
    val probeSets = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("bucket0", lshBucket(col("qv"), nPlanes, dim))
    val probed =
      if (probeHamming <= 0) probeSets.withColumn("bucket", col("bucket0")).drop("bucket0")
      else probeSets.withColumn("bucket",
          explode(array(col("bucket0") +:
            (0 until nPlanes).map(i => col("bucket0").bitwiseXOR(1L << i)): _*)))
        .drop("bucket0")
    val q = probed
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"), cosine(col("qv"), col("cv")).as("sim"))
    scored.withColumn("rank",
        row_number().over(Window.partitionBy("query_id")
          .orderBy(col("sim").desc, col("corpus_id"))))
      .filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs — the vector-space member of
    * the near-dup family (TextDedup.minhashPairs / simhashPairs for text).
    * Banded hyperplane LSH: `groups` independent bands of
    * `planesPerGroup` sign bits each; two rows are CANDIDATES iff they
    * share a full code in ANY band (OR-amplification, exactly minhash
    * banding), then one exact cosine verify keeps pairs >= `threshold`.
    * Never all-pairs: the self-join is per (band, code) bucket, capped at
    * `maxBucket` with dropped-bucket telemetry (PairsWithStats).
    *
    * Band-collision probability for a pair at cosine s is
    * (1 - acos(s)/pi)^planesPerGroup per band; defaults (8 bands x 8
    * planes) give ~75% recall at s=0.8 and ~94% at s=0.9 while a random
    * pair collides with probability ~8/256 — the production regime. A
    * low-similarity corpus (like the synthetic test embeddings, max
    * cosine ~0.48) needs shorter bands (planesPerGroup=4) — selectivity
    * drops accordingly; tune with the recall/selectivity formulas above.
    *
    * Sizing at scale: random hyperplanes split a centered corpus roughly
    * evenly, so expected bucket size is n / 2^planesPerGroup — pick
    * planesPerGroup ≈ log2(n / targetBucketSize) (e.g. 30 bits for 10^9
    * rows at ~1k/bucket; codes are a single long, up to 62 bits). The
    * (band, code) pair is the only shuffle key and maxBucket bounds the
    * worst per-bucket join, so skew is capped by construction; recall
    * lost to shorter-than-ideal bands is recovered by adding bands (cost
    * is linear in bands, and bands carry ids only).
    *
    * Returns (id_a, id_b, cosine) with id_a < id_b.
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                            threshold: Double = 0.8, groups: Int = 8,
                            planesPerGroup: Int = 8, dim: Int = 64,
                            seed: Long = 42L, maxBucket: Int = 1000): DataFrame =
    embeddingNearDupPairsWithStats(df, idCol, vecCol, threshold, groups,
      planesPerGroup, dim, seed, maxBucket).pairs

  /** `embeddingNearDupPairs` with dropped-bucket telemetry (PairsWithStats). */
  def embeddingNearDupPairsWithStats(df: DataFrame, idCol: String, vecCol: String,
                                     threshold: Double = 0.8, groups: Int = 8,
                                     planesPerGroup: Int = 8, dim: Int = 64,
                                     seed: Long = 42L, maxBucket: Int = 1000): PairsWithStats = {
    // one plane matrix, sliced per band — the oracle embeds the same rows
    val allPlanes = planes(groups * planesPerGroup, dim, seed)
    // persisted 2-consumer projection (band explode + verify join), the
    // same pattern as minhashPairs' signature relation; released by
    // PairsWithStats.unpersist(). Wrong-width embeddings raise loudly
    // (requireDim) instead of collapsing every row into band code 0.
    // Vectors stay in their SOURCE element type (typically float) here:
    // the double cast happens per consumer — at the band-code pass below
    // and inside `cosine` after the verify join — so the cached relation
    // and the verify join's shuffle carry half the bytes, with identical
    // results (float→double widening is exact).
    val prepped = df.select(col(idCol).as("id"),
        requireDim(col(vecCol), dim).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // bands carry ids + short codes only — vectors never ride the explode;
    // all `groups` codes come from ONE fused VecBandCodes pass over v
    val banded = prepped.select(col("id"),
        posexplode(bandCodes(col("v").cast("array<double>"), allPlanes, planesPerGroup))
          .as(Seq("band", "code")))
    val bucketStats = banded.groupBy("band", "code").count()
    val okBuckets = bucketStats
      .filter(col("count") <= maxBucket && col("count") > 1)
      .select("band", "code")
    val dropped = bucketStats.filter(col("count") > maxBucket)
      .select(col("band"), col("code").cast("string").as("bucket"), col("count").as("size"))
    val inBucket = banded.join(okBuckets, Seq("band", "code"))
    // distinct candidates FIRST (a pair sharing m bands would verify m×)
    val cand = inBucket.select(col("band"), col("code"), col("id").as("id_a"))
      .join(inBucket.select(col("band"), col("code"), col("id").as("id_b")), Seq("band", "code"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val pairs = cand
      .join(prepped.select(col("id").as("id_a"), col("v").as("va")), Seq("id_a"))
      .join(prepped.select(col("id").as("id_b"), col("v").as("vb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("va"), col("vb")).as("cosine"))
      .filter(col("cosine") >= threshold)
    PairsWithStats(pairs, dropped, cached = Seq(prepped))
  }

  /** IVF (inverted-file) ANN top-k — the centroid-partitioned scale path
    * beside the hyperplane `annTopK`. Cells start at deterministic anchor
    * rows (the `nCells` lowest-id corpus rows — data-derived yet
    * reproducible, SQL-expressible for the oracle, and valid for ANY id
    * space, unlike an `id < nCells` filter that silently degrades on
    * non-dense ids); `lloydIters` k-means (Lloyd) refinement passes then
    * recompute each centroid as its cell's element-wise mean vector and
    * reassign — two DataFrame aggregations per pass. Every corpus row is
    * assigned to its argmax-cosine centroid; queries probe the `nProbe`
    * nearest cells.
    *
    * Cross-engine determinism of the refinement: element sums are
    * computed on `floor(x * 2^20)` longs — exact, order-independent
    * integer addition — then divided once in double, so the DuckDB twin
    * reproduces centroids bit-for-bit where a double-sum would depend on
    * partition-merge order. The ~1e-6 quantization is noise against
    * k-means' own movement. A cell that captures no rows drops out
    * (standard Lloyd degeneracy; the effective cell count may shrink).
    *
    * Scale shape: centroids are broadcast every pass (nCells rows); each
    * refinement is one broadcast-join assignment + one partial-aggregable
    * (cell, pos) sum — map-side combine collapses the dim-explode before
    * the shuffle — and scoring shuffles the corpus ONCE on the cell id
    * with the probe side broadcast: each query touches ~nProbe/nCells of
    * the data. Sizing at scale: nCells grows with the corpus
    * (≈ n / targetCellSize, classically ~sqrt(n)) so each cell stays
    * partition-sized; the centroid table stays broadcastable far beyond
    * that (10^6 cells of a 64-dim double vector ≈ 0.5 GB — switch the
    * assignment join to a shuffle join first). Per-query cost stays
    * nProbe cells regardless of corpus size.
    *
    * Returns (query_id, corpus_id, sim, rank), rank <= k per query.
    */
  /** Shared anchor-init + Lloyd-refined cell assignment over a
    * `(corpus_id, cv)` relation: returns (centroids, assignment carrying
    * the winning csim). The argmax is max_by over a (csim, -cell)
    * struct — lexicographic, so ties go to the smallest cell id,
    * matching the oracles' ORDER BY csim DESC, cell. Element means in
    * the refinement sum `floor(x * 2^20)` longs (exact, order-
    * independent integer addition) divided once in double, so the
    * DuckDB mirrors reproduce every centroid bit-for-bit — see the
    * determinism note on [[ivfTopK]], whose inline loop this factors
    * out unchanged (now also the clustering stage of [[semDedup]]).
    */
  private[graft] def lloydAssign(c: DataFrame, nCells: Int,
                                 lloydIters: Int): (DataFrame, DataFrame) = {
    def assign(cent: DataFrame): DataFrame =
      c.crossJoin(broadcast(cent))
        .select(col("corpus_id"), col("cv"), col("cell"),
          cosine(col("cv"), col("centroid")).as("csim"))
        .groupBy("corpus_id")
        .agg(max_by(struct(col("cell"), col("cv"), col("csim")),
          struct(col("csim"), -col("cell"))).as("__a"))
        .select(col("corpus_id"), col("__a.cell").as("cell"),
          col("__a.cv").as("cv"), col("__a.csim").as("csim"))
    val scale = 1048576.0d // 2^20 — see determinism note above
    var cent = c.orderBy(col("corpus_id")).limit(nCells)
      .select(col("corpus_id").cast("long").as("cell"), col("cv").as("centroid"))
    for (_ <- 0 until lloydIters)
      cent = assign(cent)
        .select(col("cell"), posexplode(col("cv")))
        .select(col("cell"), col("pos"), floor(col("col") * lit(scale)).cast("long").as("q"))
        .groupBy("cell", "pos")
        .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
        .select(col("cell"), col("pos"),
          (col("s").cast("double") / (col("n").cast("double") * lit(scale))).as("m"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell"), transform(col("pm"), p => p.getField("m")).as("centroid"))
    (cent, assign(cent))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication of an embedding corpus — k-means-cluster the vectors,
    * then inside each cluster drop all but one member of every group of
    * ε-similar vectors. The survivor of each ε-connected component is
    * the member LEAST similar to its cell centroid (the paper's
    * keep-farthest-from-centroid policy: near-centroid members are the
    * redundant ones; the edge member preserves diversity), ties broken
    * by smallest id; vectors in no ε-pair always survive. Returns the
    * surviving rows' `idCol` (one column, caller's name).
    *
    * Composition of verified pieces: cells are [[lloydAssign]]'s
    * deterministic anchor-init + quantized-mean Lloyd refinement
    * (bit-identical across engines — the `emb_ann_ivf` oracle pins the
    * chain), components are [[TextDedup.nearDupClusters]]'s min-label
    * CC (recursive-CTE-mirrored by the near-dup oracle rows), and the
    * keep policy is one min_by over (csim, id).
    *
    * Scale shape: the quadratic pair scan — SemDeDup's whole point —
    * is confined per cell: one self-join shuffled on the cell id costs
    * Σ|cell|² ≈ n²/nCells comparisons, so nCells is the knob (paper
    * uses ~√n cells; each cell stays partition-sized and the join
    * never approaches the corpus square). The assignment relation is
    * eagerly localCheckpointed once (four consumers: two pair-join
    * sides, the keep-policy join, and nothing else — the final
    * anti-join reads the raw corpus), the loser set is pair-members-
    * sized, and the output is one broadcastable anti-join.
    *
    * `maxCell` guards the HOT CELL: duplicate-heavy corpora — the
    * operator's own target — skew the assignment, and the within-cell
    * self-join is exactly quadratic in the largest cell. A cell whose
    * occupancy exceeds `maxCell` is excluded from the pair scan
    * entirely (its members all SURVIVE — conservative, the
    * [[TextDedup]] `maxBucket` contract: a dropped bucket produces no
    * candidate pairs), bounding the scan at maxCell² per cell
    * regardless of skew. "No silent caps": [[semDedupStats]] returns
    * the dropped cells (cell id + occupancy) as telemetry next to the
    * survivors; this overload discards only the telemetry, never the
    * drop decision. The occupancy relation is nCells rows, so the ok-
    * cell filter is a broadcast semi-join — no extra corpus shuffle —
    * and is skipped entirely when maxCell is non-binding by type
    * (Int.MaxValue, the default).
    */
  def semDedup(corpus: DataFrame, idCol: String, vecCol: String,
               dim: Int, eps: Double, nCells: Int = 16,
               lloydIters: Int = 1, maxCell: Int = Int.MaxValue): DataFrame =
    semDedupStats(corpus, idCol, vecCol, dim, eps, nCells, lloydIters,
      maxCell).survivors

  /** [[semDedup]]'s survivors plus its hot-cell telemetry: `droppedCells`
    * = (cell, size) for every cell whose occupancy exceeded `maxCell`
    * and was therefore excluded from the ε-pair scan (members all
    * survive). Empty when the cap never bites — the saturation-telemetry
    * contract `minhashPairsStats` established for banded LSH buckets.
    */
  final case class SemDedupResult(survivors: DataFrame, droppedCells: DataFrame)

  def semDedupStats(corpus: DataFrame, idCol: String, vecCol: String,
                    dim: Int, eps: Double, nCells: Int = 16,
                    lloydIters: Int = 1,
                    maxCell: Int = Int.MaxValue): SemDedupResult = {
    require(eps > 0 && eps <= 1, s"eps must be in (0, 1], got $eps")
    require(nCells > 0, s"nCells must be positive, got $nCells")
    require(maxCell > 0, s"maxCell must be positive, got $maxCell")
    val c = corpus.select(col(idCol).as("corpus_id"),
      requireDim(col(vecCol).cast("array<double>"), dim).as("cv"))
    // lineage-free materialization: the pair self-join would otherwise
    // re-run the crossJoin+argmax assignment once per consumer (same
    // rationale as fuzzyDecontaminate's checkpoint)
    val assigned = lloydAssign(c, nCells, lloydIters)._2.localCheckpoint(true)
    val cellCounts = assigned.groupBy("cell").agg(count(lit(1)).as("__cn"))
    val droppedCells = cellCounts.filter(col("__cn") > maxCell)
      .select(col("cell"), col("__cn").as("size"))
    val scanned =
      if (maxCell == Int.MaxValue) assigned
      else assigned.join(
        broadcast(cellCounts.filter(col("__cn") <= maxCell).select("cell")),
        Seq("cell"), "left_semi")
    val pairs = scanned.as("x").join(scanned.as("y"),
        col("x.cell") === col("y.cell") &&
          col("x.corpus_id") < col("y.corpus_id"))
      .filter(cosine(col("x.cv"), col("y.cv")) >= eps)
      .select(col("x.corpus_id").as("id_a"), col("y.corpus_id").as("id_b"))
    val cc = TextDedup.nearDupClusters(pairs)
    // keep = min (csim, id) member per component; losers = the rest.
    // cc is pair-members-sized — broadcast it, never shuffle the
    // corpus-sized assignment against it
    val withCsim = assigned.join(broadcast(cc), cc("id") === assigned("corpus_id"))
      .select(col("cluster_id"), col("id"), col("csim"))
    val keepers = withCsim.groupBy("cluster_id")
      .agg(min_by(col("id"), struct(col("csim"), col("id"))).as("keep_id"))
    val losers = withCsim.join(keepers, "cluster_id")
      .filter(col("id") =!= col("keep_id"))
      .select(col("id").as("__loser"))
    val survivors = corpus
      .join(broadcast(losers), col(idCol) === col("__loser"), "left_anti")
      .select(col(idCol))
    SemDedupResult(survivors, droppedCells)
  }

  /** The SemDeDup cell model as deployable literals — EXACTLY the
    * [[lloydAssign]] centroid chain [[semDedup]] and its DuckDB mirror
    * pin (anchor init, quantized-mean refinement), collected for the
    * streaming twin [[graft.streaming.SemDedupStream]]. Train offline,
    * deploy: nCells rows, the same constant-size driver-anchor policy as
    * the ANN codebooks, so the stream's assignment (and therefore its
    * survivor set) is bit-identical to the batch operator's on the same
    * corpus.
    */
  def semDedupCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                        dim: Int, nCells: Int = 16,
                        lloydIters: Int = 1): Seq[(Long, Seq[Double])] = {
    require(nCells > 0, s"nCells must be positive, got $nCells")
    val c = corpus.select(col(idCol).as("corpus_id"),
      requireDim(col(vecCol).cast("array<double>"), dim).as("cv"))
    lloydAssign(c, nCells, lloydIters)._1
      .select(col("cell").cast("long").as("cell"), col("centroid"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toIndexedSeq: Seq[Double]))
      .toIndexedSeq.sortBy(_._1)
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nCells: Int = 16, nProbe: Int = 4,
              lloydIters: Int = 0): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    val (cent, assignedC) = lloydAssign(c, nCells, lloydIters)
    val assigned = assignedC.select("corpus_id", "cell", "cv")
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(broadcast(cent))
      .select(col("query_id"), col("qv"), col("cell"),
        cosine(col("qv"), col("centroid")).as("csim"))
      .withColumn("crank",
        row_number().over(Window.partitionBy("query_id")
          .orderBy(col("csim").desc, col("cell"))))
      .filter(col("crank") <= nProbe)
      .select("query_id", "qv", "cell")
    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"), cosine(col("qv"), col("cv")).as("sim"))
    scored.withColumn("rank",
        row_number().over(Window.partitionBy("query_id")
          .orderBy(col("sim").desc, col("corpus_id"))))
      .filter(col("rank") <= k)
  }

  /** Product-quantization ANN top-k — the MEMORY-scale path of the ANN
    * tier (IVF bounds which cells a query touches; PQ bounds the BYTES
    * each touched vector costs). The corpus is encoded once into
    * `nSub` small ints per row (`graft.functions.PqEncode`, a
    * zero-shuffle native projection against a literal codebook): 64-dim
    * float embeddings compress 256 B → 8 B — at 100 TB of raw vectors
    * the scan side shrinks ~32× and fits executor memory where floats
    * would not. Each query precomputes one `PqLut` table (nSub ×
    * codesPerSub subspace dots) and every candidate then scores with
    * `nSub` array reads instead of `dim` multiplies (`PqScore` — the
    * classic ADC scan, Jégou et al. 2011), ranked by approximate cosine
    * = ADC-dot / (‖q‖ · reconstructed ‖x‖).
    *
    * The codebook is DETERMINISTIC anchor slices — subspace m of the
    * `codesPerSub` lowest-id corpus rows — the same anchor-centroid
    * policy as `ivfTopK`'s init, so the DuckDB mirror derives the
    * IDENTICAL constants in SQL and the retrieval log gets a real hash
    * oracle (`emb_ann_pq`); like IVF's anchors, a production deployment
    * would k-means the codebook (better recall, same plan shape — the
    * expressions only see a different literal). The anchor collect is
    * `codesPerSub` rows — constant-size, like the IVF centroid
    * broadcast. Approximation quality is gated by an sbt recall@k test
    * against brute force, like IVF's.
    *
    * Composition with IVF at scale: bucket by `ivfTopK`'s cell id,
    * store codes per cell, ADC-scan only probed cells — both halves are
    * independent column transforms, so the composition is a select.
    */
  /** Deterministic anchor codebook + per-centroid ‖c‖² (left-fold):
    * subspace slices of the `codesPerSub` lowest-id corpus rows — the
    * constant-size collect both `pqTopK` and the streaming
    * `AnnStream.pqAnnStream` share, and the exact constants the DuckDB
    * mirrors re-derive in SQL. A production deployment substitutes a
    * k-means-trained codebook here; every consumer only sees the
    * literals.
    */
  def anchorCodebook(corpus: DataFrame, idCol: String, vecCol: String,
                     dim: Int, nSub: Int, codesPerSub: Int): (Seq[Seq[Double]], Seq[Double]) = {
    require(dim % nSub == 0, s"dim $dim not divisible into $nSub subspaces")
    val subDim = dim / nSub
    val anchors = corpus.orderBy(col(idCol)).limit(codesPerSub)
      .select(requireDim(col(vecCol).cast("array<double>"), dim)).collect()
      .map(_.getSeq[Double](0).toArray)
    require(anchors.length == codesPerSub,
      s"corpus has only ${anchors.length} rows, need $codesPerSub anchor rows")
    val codebook: Seq[Seq[Double]] =
      for (m <- 0 until nSub; j <- 0 until codesPerSub)
        yield anchors(j).slice(m * subDim, (m + 1) * subDim).toSeq
    (codebook, codebook.map(_.foldLeft(0.0)((a, x) => a + x * x)))
  }

  /** Deterministic anchor centroids: the `nCells` lowest-id corpus rows
    * as (cell = id, centroid) — `ivfTopK`/`ivfPqTopK`'s init policy,
    * exposed for the streaming operator (`AnnStream.ivfPqAnnStream`)
    * which takes centroids as literals: train offline, deploy as
    * constants — the same contract as the PQ codebook. Constant-size
    * collect, like the IVF centroid broadcast.
    */
  def anchorCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                      dim: Int, nCells: Int): Seq[(Long, Seq[Double])] =
    corpus.orderBy(col(idCol)).limit(nCells)
      .select(col(idCol).cast("long"),
        requireDim(col(vecCol).cast("array<double>"), dim))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq

  /** TRAINED PQ codebook: per-subspace Lloyd (k-means) refinement of the
    * anchor codebook on a deterministic sample — the PQ analog of
    * `ivfTopK`'s `lloydIters` (measured +9 recall points there; the PQ
    * gain is pinned by LlmOpsSpec's raised recall floors). Faiss-style:
    * training always runs on a bounded sample (the `sampleN` lowest-id
    * rows — deterministic and SQL-mirrorable, unlike a random sample),
    * so the training cost is corpus-size-independent at 100 TB.
    *
    * Each pass assigns every sample subvector with `PqEncode` AGAINST THE
    * CURRENT CODEBOOK — the trainer and the encoder share one argmin
    * (left-fold squared diff, strict <, ties → smallest code), so
    * assignment can never drift from production encoding — then
    * recomputes each (subspace, code) centroid as the element-wise mean
    * of its members. Means use `ivfTopK`'s cross-engine determinism
    * trick: element sums on `floor(x * 2^20)` longs (exact,
    * order-independent integer addition), divided once in double, so the
    * DuckDB mirror reproduces the trained codebook bit-for-bit. A code
    * that captures no members keeps its previous centroid (standard
    * Lloyd degeneracy handling — the codebook must stay indexable).
    *
    * Per pass: one constant-size collect (nSub × codesPerSub centroid
    * rows — the same driver footprint as the IVF centroid broadcast);
    * the sample scan is sampleN rows. Scale-safe by construction.
    */
  def trainedCodebook(corpus: DataFrame, idCol: String, vecCol: String,
                      dim: Int, nSub: Int, codesPerSub: Int,
                      lloydIters: Int, sampleN: Int = 512): (Seq[Seq[Double]], Seq[Double]) = {
    require(dim % nSub == 0, s"dim $dim not divisible into $nSub subspaces")
    require(lloydIters >= 0 && sampleN > 0,
      s"lloydIters/sampleN must be >= 0 / > 0, got $lloydIters/$sampleN")
    val subDim = dim / nSub
    var (cb, _) = anchorCodebook(corpus, idCol, vecCol, dim, nSub, codesPerSub)
    if (lloydIters > 0) {
      val sample = corpus.orderBy(col(idCol)).limit(sampleN)
        .select(requireDim(col(vecCol).cast("array<double>"), dim).as("v"))
      cb = lloydRefine(sample, cb, nSub, codesPerSub, subDim, lloydIters)
    }
    (cb, cb.map(_.foldLeft(0.0)((a, x) => a + x * x)))
  }

  /** The Lloyd loop `trainedCodebook` documents, extracted over an
    * arbitrary sample relation (one `array<double>` column `v`) so the
    * RESIDUAL codebook trains with the identical passes on residual
    * vectors. Constant-size collect per pass; the sample is persisted
    * for the duration of the loop.
    */
  private def lloydRefine(sampleV: DataFrame, cb0: Seq[Seq[Double]], nSub: Int,
                          codesPerSub: Int, subDim: Int, iters: Int): Seq[Seq[Double]] = {
    val scale = 1048576.0d // 2^20 — see ivfTopK's determinism note
    def expr(c: Column) = org.apache.spark.sql.GraftColumnBridge.expression(c)
    def colOf(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      org.apache.spark.sql.GraftColumnBridge.column(e)
    var cb = cb0
    val sample = sampleV
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      for (_ <- 0 until iters) {
        val updated = sample
          .select(colOf(graft.functions.PqEncode(expr(col("v")), cb, nSub,
            codesPerSub)).as("codes"), col("v"))
          .where(col("codes").isNotNull) // null-element vectors train nothing
          .select(explode(sequence(lit(0), lit(nSub - 1))).as("m"),
            col("codes"), col("v"))
          .select(col("m"), element_at(col("codes"), col("m") + 1).as("j"),
            posexplode(slice(col("v"), col("m") * subDim + 1, lit(subDim))))
          .select(col("m"), col("j"), col("pos"),
            floor(col("col") * lit(scale)).cast("long").as("q"))
          .groupBy("m", "j", "pos")
          .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
          .select(col("m"), col("j"), col("pos"),
            (col("s").cast("double") / (col("n").cast("double") * lit(scale))).as("mean"))
          .groupBy("m", "j")
          .agg(array_sort(collect_list(struct(col("pos"), col("mean")))).as("pm"))
          .select(col("m"), col("j"),
            transform(col("pm"), p => p.getField("mean")).as("cent"))
          .collect() // <= nSub * codesPerSub rows — constant-size
        val byKey = updated.map(r =>
          (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
        cb = (for (m <- 0 until nSub; j <- 0 until codesPerSub)
          yield byKey.getOrElse((m, j), cb(m * codesPerSub + j))).toIndexedSeq
      }
    } finally sample.unpersist(false)
    cb
  }

  /** Everything RESIDUAL IVF-PQ deploys as literals, computed driver-side
    * from constant-size collects (Faiss IndexIVFPQ's layout,
    * faiss/IndexIVFPQ.h — residual vectors `v − centroid(cell(v))` are
    * what gets product-quantized, not `v` itself):
    * `cells` = per-IVF-cell (cell id, centroid, ‖centroid‖²,
    * norm-correction table), `codebook` = the residual-trained PQ
    * codebook. The correction table is the cell-dependent part of the
    * reconstructed norm: ‖c + r̃‖² = ‖c‖² + Σ_m (2·cₘ·cb[m][jₘ] +
    * ‖cb[m][jₘ]‖²), so entry (m, j) = 2·dot(centroid slice m, cb[m][j])
    * + ‖cb[m][j]‖² and a candidate's correction is one `PqAdcSum`
    * gather over its codes.
    */
  case class ResidualPqModel(
      cells: Seq[(Long, Seq[Double], Double, Seq[Double])],
      codebook: Seq[Seq[Double]])

  /** Driver-side replica of `cosine` (VecCosine's left-fold double loop)
    * for the constant-size anchor assignments — same arithmetic, same
    * doubles.
    */
  private def cosineScalar(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Argmax-cosine cell for one vector — the driver replica of the
    * DataFrame assignment's `max_by(struct(cell, …), struct(csim,
    * -cell))` policy (ties → smallest cell id).
    */
  private def assignCellScalar(v: Array[Double],
                               cents: Seq[(Long, Array[Double])]): (Long, Array[Double]) = {
    var bestCell = Long.MaxValue
    var bestCent: Array[Double] = null
    var best = Double.NegativeInfinity
    cents.foreach { case (cell, c) =>
      val s = cosineScalar(v, c)
      if (s > best || (s == best && cell < bestCell)) {
        best = s; bestCell = cell; bestCent = c
      }
    }
    require(bestCent != null, "no centroids to assign against")
    (bestCell, bestCent)
  }

  /** Build the residual IVF-PQ model: anchor centroids (`nCells`
    * lowest-id rows), then a PQ codebook over RESIDUALS. The residual
    * anchors are the `codesPerSub` lowest-id rows AFTER the centroid
    * rows (OFFSET nCells) — the centroid rows' own residuals are
    * identically zero, so anchoring on them would collapse the codebook
    * to a single zero code. `lloydIters` > 0 refines with the same
    * per-subspace quantized-mean passes as `trainedCodebook`, on the
    * assigned residuals of the `sampleN` lowest-id rows. All collects
    * are constant-size (nCells + codesPerSub rows; nSub·codesPerSub
    * centroid rows per Lloyd pass) — train offline, deploy literals.
    */
  def residualPqModel(corpus: DataFrame, idCol: String, vecCol: String,
                      dim: Int, nCells: Int, nSub: Int, codesPerSub: Int,
                      lloydIters: Int = 0, sampleN: Int = 512): ResidualPqModel = {
    require(dim % nSub == 0, s"dim $dim not divisible into $nSub subspaces")
    require(lloydIters >= 0 && sampleN > 0,
      s"lloydIters/sampleN must be >= 0 / > 0, got $lloydIters/$sampleN")
    val subDim = dim / nSub
    val cents = anchorCentroids(corpus, idCol, vecCol, dim, nCells)
      .map { case (id, v) => (id, v.toArray) }
    val anchorRows = corpus.orderBy(col(idCol)).limit(nCells + codesPerSub)
      .select(col(idCol).cast("long"),
        requireDim(col(vecCol).cast("array<double>"), dim))
      .collect().drop(nCells)
    require(anchorRows.length == codesPerSub,
      s"corpus has only ${nCells + anchorRows.length} rows, need ${nCells + codesPerSub} " +
        "for residual anchors")
    val resAnchors = anchorRows.map { r =>
      val v = r.getSeq[Double](1).toArray
      val (_, c) = assignCellScalar(v, cents)
      Array.tabulate(dim)(i => v(i) - c(i))
    }
    var rcb: Seq[Seq[Double]] =
      (for (m <- 0 until nSub; j <- 0 until codesPerSub)
        yield resAnchors(j).slice(m * subDim, (m + 1) * subDim).toSeq).toIndexedSeq
    if (lloydIters > 0) {
      val spark = corpus.sparkSession
      import spark.implicits._
      val centDf = broadcast(
        cents.map { case (id, c) => (id, c.toSeq) }.toDF("cell", "centroid"))
      val sample = corpus.orderBy(col(idCol)).limit(sampleN)
        .select(col(idCol).as("__sid"),
          requireDim(col(vecCol).cast("array<double>"), dim).as("cv"))
        .crossJoin(centDf)
        .select(col("__sid"), col("cv"), col("centroid"), col("cell"),
          cosine(col("cv"), col("centroid")).as("csim"))
        .groupBy("__sid")
        .agg(max_by(struct(col("cv"), col("centroid")),
          struct(col("csim"), -col("cell"))).as("__a"))
        .select(zip_with(col("__a.cv"), col("__a.centroid"), (a, b) => a - b).as("v"))
      rcb = lloydRefine(sample, rcb, nSub, codesPerSub, subDim, lloydIters)
    }
    val rn2 = rcb.map(_.foldLeft(0.0)((a, x) => a + x * x))
    val cells = cents.map { case (cell, c) =>
      val cn2 = c.foldLeft(0.0)((a, x) => a + x * x)
      val clut = (for (m <- 0 until nSub; j <- 0 until codesPerSub) yield {
        val e = rcb(m * codesPerSub + j)
        var dot = 0.0
        var i = 0
        while (i < subDim) { dot += c(m * subDim + i) * e(i); i += 1 }
        2.0 * dot + rn2(m * codesPerSub + j)
      }).toIndexedSeq
      (cell, c.toSeq, cn2, clut: Seq[Double])
    }
    ResidualPqModel(cells, rcb)
  }

  /** IVF × PQ — the composed 100 TB ANN shape: IVF bounds WHICH cells a
    * query touches (corpus shuffled once by cell id, probes broadcast),
    * PQ bounds the BYTES each touched row costs (codes, not vectors, in
    * the scan). Both halves are the independent column transforms the
    * component operators already are, so the composition is literally a
    * select: cell assignment (argmax-cosine vs anchor centroids, ties →
    * smallest cell — `ivfTopK`'s policy, Lloyd omitted so the mirror
    * stays closed-form) + `PqEncode` on the corpus side; top-`nProbe`
    * cells + `PqLut`/‖q‖ on the query side; ADC scoring within probed
    * cells; optional exact re-rank (`refine`) like `pqTopK`. Per-query
    * cost: nProbe/nCells of the corpus × nSub byte-reads per row.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int, nCells: Int = 16, nProbe: Int = 4,
                dim: Int = 64, nSub: Int = 8, codesPerSub: Int = 16,
                refine: Int = 0, lloydIters: Int = 0,
                trainSampleN: Int = 512, residual: Boolean = false): DataFrame = {
    if (residual)
      return ivfPqResidualTopK(corpus, queries, idCol, vecCol, k, nCells,
        nProbe, dim, nSub, codesPerSub, refine, lloydIters, trainSampleN)
    val (codebook, norm2) =
      trainedCodebook(corpus, idCol, vecCol, dim, nSub, codesPerSub,
        lloydIters, trainSampleN)
    def expr(c: Column) = org.apache.spark.sql.GraftColumnBridge.expression(c)
    def colOf(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      org.apache.spark.sql.GraftColumnBridge.column(e)
    val cent = corpus.orderBy(col(idCol)).limit(nCells)
      .select(col(idCol).cast("long").as("cell"), col(vecCol).as("centroid"))
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    val assigned = c.crossJoin(broadcast(cent))
      .select(col("corpus_id"), col("cv"), col("cell"),
        cosine(col("cv"), col("centroid")).as("csim"))
      .groupBy("corpus_id")
      .agg(max_by(struct(col("cell"), col("cv")), struct(col("csim"), -col("cell"))).as("__a"))
      .select(col("corpus_id"), col("__a.cell").as("cell"), col("__a.cv").as("cv"))
    val codes = assigned.select(col("corpus_id"), col("cell"),
      colOf(graft.functions.PqEncode(
        expr(requireDim(col("cv").cast("array<double>"), dim)),
        codebook, nSub, codesPerSub)).as("codes"))
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(broadcast(cent))
      .select(col("query_id"), col("qv"), col("cell"),
        cosine(col("qv"), col("centroid")).as("csim"))
      .withColumn("crank",
        row_number().over(Window.partitionBy("query_id")
          .orderBy(col("csim").desc, col("cell"))))
      .filter(col("crank") <= nProbe)
      .select(col("query_id"), col("cell"),
        colOf(graft.functions.PqLut(
          expr(requireDim(col("qv").cast("array<double>"), dim)),
          codebook, nSub, codesPerSub)).as("lut"),
        sqrt(aggregate(requireDim(col("qv").cast("array<double>"), dim),
          lit(0.0d), (acc, x) => acc + x * x)).as("qn"))
    val scored = codes.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        (colOf(graft.functions.PqScore(expr(col("codes")), expr(col("lut")),
          norm2, codesPerSub)) / col("qn")).as("sim"))
    rankAndRefine(scored, corpus, queries, idCol, vecCol, dim, k, refine)
  }

  /** Rank an ADC-scored (query_id, corpus_id, sim) relation and apply
    * the optional exact-cosine re-rank of the top-`refine` candidates
    * (refine = 0 → pure ADC order). Two-stage retrieval: only
    * refine × |queries| raw vectors are fetched — id-keyed point reads
    * against the corpus; at 100 TB the compressed scan does the work
    * and the refine join touches a vanishing fraction.
    */
  private def rankAndRefine(scored: DataFrame, corpus: DataFrame,
                            queries: DataFrame, idCol: String, vecCol: String,
                            dim: Int, k: Int, refine: Int): DataFrame = {
    val ranked = scored.withColumn("rank",
      row_number().over(Window.partitionBy("query_id")
        .orderBy(col("sim").desc, col("corpus_id"))))
    if (refine <= 0) ranked.filter(col("rank") <= k)
    else {
      require(refine >= k, s"refine $refine must be >= k $k")
      val cand = ranked.filter(col("rank") <= refine).drop("rank", "sim")
      val cvs = corpus.select(col(idCol).as("corpus_id"),
        requireDim(col(vecCol).cast("array<double>"), dim).as("cv"))
      val qvs = queries.select(col(idCol).as("query_id"),
        requireDim(col(vecCol).cast("array<double>"), dim).as("qvr"))
      cand.join(cvs, Seq("corpus_id")).join(broadcast(qvs), Seq("query_id"))
        .select(col("query_id"), col("corpus_id"),
          cosine(col("qvr"), col("cv")).as("sim"))
        .withColumn("rank",
          row_number().over(Window.partitionBy("query_id")
            .orderBy(col("sim").desc, col("corpus_id"))))
        .filter(col("rank") <= k)
    }
  }

  /** RESIDUAL IVF-PQ retrieval (`ivfPqTopK(residual = true)`) — the
    * Faiss IndexIVFPQ composition: each corpus row PQ-encodes its
    * RESIDUAL against its assigned cell's centroid instead of the raw
    * vector. Residuals concentrate near zero once cells capture corpus
    * structure, so the same codebook budget spends its codes on a much
    * tighter distribution — the classic IVFPQ recall lever (Jégou et
    * al., "Product Quantization for Nearest Neighbor Search", TPAMI
    * 2011, §IV.B). Scoring reassembles cosine from tabulated pieces:
    *
    *   q·ṽ   = q·c_cell + Σ_m qlut[m][jₘ]          (qlut = PqLut vs rcb)
    *   ‖ṽ‖²  = ‖c_cell‖² + Σ_m clut_cell[m][jₘ]    (clut = the model's
    *                                                norm-correction table)
    *   sim   = q·ṽ / (√‖ṽ‖² · ‖q‖), 0 when ‖ṽ‖² ≤ 0
    *
    * — three `PqAdcSum`/`PqLut` gathers per candidate, no raw vectors in
    * the scan. Plan shape is identical to `ivfPqTopK`: per-query cost is
    * nProbe/nCells of the corpus × nSub byte-reads per row; the per-cell
    * tables ride the (tiny) broadcast probes relation. Reference
    * semantics anchor: siddhi-execution-unique has no ANN tier — this is
    * the beyond-reference LLM-pipeline component (SURVEY.md §2.5).
    */
  private def ivfPqResidualTopK(corpus: DataFrame, queries: DataFrame,
                                idCol: String, vecCol: String, k: Int,
                                nCells: Int, nProbe: Int, dim: Int, nSub: Int,
                                codesPerSub: Int, refine: Int, lloydIters: Int,
                                trainSampleN: Int): DataFrame = {
    val model = residualPqModel(corpus, idCol, vecCol, dim, nCells, nSub,
      codesPerSub, lloydIters, trainSampleN)
    def expr(c: Column) = org.apache.spark.sql.GraftColumnBridge.expression(c)
    def colOf(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      org.apache.spark.sql.GraftColumnBridge.column(e)
    val spark = corpus.sparkSession
    import spark.implicits._
    // the deployed literals: cell → (centroid, ‖c‖², norm-correction lut)
    val centDf = model.cells.toDF("cell", "centroid", "cn2", "clut")
    val c = corpus.select(col(idCol).as("corpus_id"),
      requireDim(col(vecCol).cast("array<double>"), dim).as("cv"))
    val assigned = c.crossJoin(broadcast(centDf.select("cell", "centroid")))
      .select(col("corpus_id"), col("cv"), col("cell"), col("centroid"),
        cosine(col("cv"), col("centroid")).as("csim"))
      .groupBy("corpus_id")
      .agg(max_by(struct(col("cell"), col("cv"), col("centroid")),
        struct(col("csim"), -col("cell"))).as("__a"))
      .select(col("corpus_id"), col("__a.cell").as("cell"),
        zip_with(col("__a.cv"), col("__a.centroid"), (a, b) => a - b).as("rv"))
    val codes = assigned.select(col("corpus_id"), col("cell"),
      colOf(graft.functions.PqEncode(expr(col("rv")), model.codebook, nSub,
        codesPerSub)).as("codes"))
    val probes = queries.select(col(idCol).as("query_id"),
        requireDim(col(vecCol).cast("array<double>"), dim).as("qv"))
      .crossJoin(broadcast(centDf))
      .select(col("query_id"), col("qv"), col("cell"), col("cn2"), col("clut"),
        col("centroid"), cosine(col("qv"), col("centroid")).as("csim"))
      .withColumn("crank",
        row_number().over(Window.partitionBy("query_id")
          .orderBy(col("csim").desc, col("cell"))))
      .filter(col("crank") <= nProbe)
      .select(col("query_id"), col("cell"), col("cn2"), col("clut"),
        aggregate(zip_with(col("qv"), col("centroid"), (x, y) => x * y),
          lit(0.0d), (acc, x) => acc + x).as("qdotc"),
        colOf(graft.functions.PqLut(expr(col("qv")), model.codebook, nSub,
          codesPerSub)).as("lut"),
        sqrt(aggregate(col("qv"), lit(0.0d), (acc, x) => acc + x * x)).as("qn"))
    val adc = colOf(graft.functions.PqAdcSum(expr(col("codes")),
      expr(col("lut")), codesPerSub))
    val vn2 = col("cn2") + colOf(graft.functions.PqAdcSum(expr(col("codes")),
      expr(col("clut")), codesPerSub))
    val scored = codes.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        when(vn2 <= 0, lit(0.0d))
          .otherwise((col("qdotc") + adc) / (sqrt(vn2) * col("qn"))).as("sim"))
    rankAndRefine(scored, corpus, queries, idCol, vecCol, dim, k, refine)
  }

  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int, dim: Int = 64, nSub: Int = 8,
             codesPerSub: Int = 16, refine: Int = 0,
             lloydIters: Int = 0, trainSampleN: Int = 512): DataFrame = {
    val (codebook, norm2) =
      trainedCodebook(corpus, idCol, vecCol, dim, nSub, codesPerSub,
        lloydIters, trainSampleN)
    def expr(c: Column) = org.apache.spark.sql.GraftColumnBridge.expression(c)
    def colOf(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      org.apache.spark.sql.GraftColumnBridge.column(e)
    val codes = corpus.select(col(idCol).as("corpus_id"),
      colOf(graft.functions.PqEncode(
        expr(requireDim(col(vecCol).cast("array<double>"), dim)),
        codebook, nSub, codesPerSub)).as("codes"))
    val q = queries.select(col(idCol).as("query_id"),
        requireDim(col(vecCol).cast("array<double>"), dim).as("qv"))
      .select(col("query_id"),
        colOf(graft.functions.PqLut(expr(col("qv")), codebook, nSub, codesPerSub)).as("lut"),
        sqrt(aggregate(col("qv"), lit(0.0d), (acc, x) => acc + x * x)).as("qn"))
    val scored = codes.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        (colOf(graft.functions.PqScore(expr(col("codes")), expr(col("lut")),
          norm2, codesPerSub)) / col("qn")).as("sim"))
    // Anchor-codebook ADC alone measures ~0.42 recall@10 on the
    // planted-clique spec corpus; refine=5k lifts it to the
    // candidate-coverage ceiling (see LlmOpsSpec's floors).
    rankAndRefine(scored, corpus, queries, idCol, vecCol, dim, k, refine)
  }
}
