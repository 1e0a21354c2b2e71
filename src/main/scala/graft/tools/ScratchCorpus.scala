package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.TextDedup

/** Scratch profiler for the corpus-curation queries (not part of the
  * driver contract). Usage: runMain graft.tools.ScratchCorpus <sfDir>
  */
object ScratchCorpus {
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
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val gramsInline = docs.select(col("doc_id").as("id"),
      explode(TextDedup.shingles(TextDedup.tokenize(col("text")), 3)).as("gram"))
    timeIt("explode inline-tokenize")(gramsInline.count())
    timeIt("explode inline-tokenize again")(gramsInline.count())
    val grams = docs
      .select(col("doc_id").as("id"), TextDedup.tokenize(col("text")).as("toks"))
      .select(col("id"), explode(TextDedup.shingles(col("toks"), 3)).as("gram"))
    timeIt("explode projected-toks")(grams.count())
    timeIt("explode projected-toks again")(grams.count())
    timeIt("groupBy gram count")(grams.groupBy("gram").count().count())
    val full = grams.groupBy("gram")
      .agg(count_distinct(col("id")).as("doc_freq"), count(lit(1)).as("total_cnt"))
      .filter(col("doc_freq") >= 5)
    timeIt("count_distinct agg")(full.count())
    timeIt("count_distinct agg again")(full.count())
    // alternative: dedup (gram,id) first, then plain counts
    val alt = grams.groupBy("gram", "id").agg(count(lit(1)).as("c"))
      .groupBy("gram").agg(count(lit(1)).as("doc_freq"), sum("c").as("total_cnt"))
      .filter(col("doc_freq") >= 5)
    timeIt("two-phase alt")(alt.count())
    timeIt("two-phase alt again")(alt.count())
    spark.stop()
  }
}
