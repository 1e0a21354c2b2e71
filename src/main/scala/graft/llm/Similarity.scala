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
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nCells: Int = 16, nProbe: Int = 4,
              lloydIters: Int = 0): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    // argmax-cosine cell per corpus row: max_by over a (csim, -cell)
    // struct — lexicographic, so ties go to the smallest cell id, matching
    // the oracle's ORDER BY csim DESC, cell
    def assign(cent: DataFrame): DataFrame =
      c.crossJoin(broadcast(cent))
        .select(col("corpus_id"), col("cv"), col("cell"),
          cosine(col("cv"), col("centroid")).as("csim"))
        .groupBy("corpus_id")
        .agg(max_by(struct(col("cell"), col("cv")), struct(col("csim"), -col("cell"))).as("__a"))
        .select(col("corpus_id"), col("__a.cell").as("cell"), col("__a.cv").as("cv"))
    val scale = 1048576.0d // 2^20 — see determinism note above
    var cent = corpus.orderBy(col(idCol)).limit(nCells)
      .select(col(idCol).cast("long").as("cell"), col(vecCol).as("centroid"))
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
    val assigned = assign(cent)
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
}
