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

  /** LSH bucket id: sign bits of the vector against nPlanes hyperplanes.
    * The float embedding is cast to array<double> first so each product
    * is a single double rounding — bit-identical to any engine computing
    * double(x)*double(y), which keeps bucket signs cross-engine stable.
    */
  def lshBucket(vec: Column, nPlanes: Int, dim: Int, seed: Long = 42L): Column = {
    val ps = planes(nPlanes, dim, seed)
    val v = vec.cast("array<double>")
    val bits = ps.zipWithIndex.map { case (p, i) =>
      val dot = aggregate(zip_with(v, typedLit(p.toSeq), (x, y) => x * y),
        lit(0.0d), (acc, x) => acc + x)
      when(dot >= 0, shiftleft(lit(1L), i)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

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
}
