package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.TextDedup

/** Scratch profiler for the near-dup pipelines (not part of the driver
  * contract). Usage: runMain graft.tools.Profile <sfDir>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir).cache()
    docs.count()
    def timeIt[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val shOnly = docs.select(col("doc_id").as("id"), col("text"))
      .withColumn("sh", array_distinct(TextDedup.shingles(TextDedup.tokenize(col("text")), 3)))
      .filter(size(col("sh")) > 0)
      .select("id", "sh")
    timeIt("shingles only")(shOnly.count())
    val hsOnly = shOnly.withColumn("hs", transform(col("sh"), s => xxhash64(s)))
    timeIt("shingles+basehash")(hsOnly.select("id", "hs").count())
    // A: HOF rehash (current op implementation)
    val withShA = hsOnly.withColumn("sig", TextDedup.minhashFromBaseHashes(col("hs"), 32))
    timeIt("A: HOF 32-rehash")(withShA.select("id", "sig").count())
    // B: explode + 32 codegen'd min aggregates
    val exploded = hsOnly.select(col("id"), explode(col("hs")).as("h"))
    val withShB = exploded.groupBy("id")
      .agg(array((0 until 32).map(i => min(xxhash64(col("h"), lit(i)))): _*).as("sig"))
    timeIt("B: explode+agg")(withShB.count())
    val withSh = withShA.select("id", "sh", "sig").cache()
    timeIt("shingle+sig materialize")(withSh.count())
    println("[profile] avg shingles/doc: " + withSh.agg(avg(size(col("sh")))).head().getDouble(0))
    val banded = withSh.select(col("id"),
      explode(org.apache.spark.sql.functions.array((0 until 8).map(b =>
        struct(lit(b).as("band"),
          xxhash64(slice(col("sig"), b * 4 + 1, 4), lit(b)).as("bh"))): _*)).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bh")).cache()
    timeIt("banded")(banded.count())
    val sizes = banded.groupBy("band", "bh").count().cache()
    println("[profile] bucket size deciles: " +
      sizes.stat.approxQuantile("count", Array(0.5, 0.9, 0.99, 1.0), 0.0).mkString(","))
    val ok = sizes.filter(col("count") <= 1000 && col("count") > 1).select("band", "bh")
    val inB = banded.join(ok, Seq("band", "bh"))
    val cand = inB.select(col("band"), col("bh"), col("id").as("id_a"))
      .join(inB.select(col("band"), col("bh"), col("id").as("id_b")), Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct().cache()
    timeIt("candidate pairs")(println("[profile] n_cand=" + cand.count()))
    // simhash strategies
    val toksDf = docs.select(col("doc_id").as("id"), TextDedup.tokenize(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
    timeIt("simhash A: 64 HOF aggregates")(
      toksDf.select(col("id"), TextDedup.simhash(col("toks")).as("s")).count())
    val expl = toksDf.select(col("id"), explode(transform(col("toks"), t => xxhash64(t))).as("h"))
    val simB = expl.groupBy("id").agg(
      sum(shiftright(col("h"), 0).bitwiseAND(1)).as("c0"),
      (1 until 64).map(b => sum(shiftright(col("h"), b).bitwiseAND(1)).as(s"c$b")): _*)
    timeIt("simhash B: explode + 64 codegen sums")(simB.count())

    val sets = withSh.select(col("id"), col("sh"))
    val verified = cand
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        TextDedup.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= 0.2)
    timeIt("verify")(println("[profile] n_pairs=" + verified.count()))
    spark.stop()
  }
}
