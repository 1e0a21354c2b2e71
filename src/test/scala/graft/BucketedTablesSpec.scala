package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.BucketedTables

/** Bucketed storage eliminates the per-query shuffle: joins and
  * aggregations on the bucket key must contain ZERO ShuffleExchange in
  * their executed plans, their scans must actually be bucketed scans
  * (guarding against the toy-scale degenerate case where a
  * single-partition scan satisfies any clustered distribution), and
  * results must equal the unbucketed plans'.
  */
class BucketedTablesSpec extends AnyFunSuite with SparkTestSession {

  private val sfDir = "/root/testdata/sf0.001"
  private val warehouse = java.nio.file.Files
    .createTempDirectory("graft-bucketed").toString

  /** Executes df and returns every node of the FINAL (adaptive) plan.
    * AQE hides exchanges inside leaf QueryStageExec nodes, so those are
    * unwrapped explicitly — a plain children traversal misses them and
    * would make the zero-shuffle assertions vacuous.
    */
  private def execNodes(df: DataFrame): Seq[SparkPlan] = {
    df.collect()
    def walk(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan) // shuffle/broadcast/result stages
      case r: ReusedExchangeExec => walk(r.child)
      case _ => p.children.flatMap(walk) ++ p.subqueries.flatMap(walk)
    })
    walk(df.queryExecution.executedPlan)
  }
  private def shuffles(nodes: Seq[SparkPlan]): Seq[SparkPlan] =
    nodes.filter(_.isInstanceOf[ShuffleExchangeLike])
  private def scans(nodes: Seq[SparkPlan]): Seq[FileSourceScanExec] =
    nodes.collect { case f: FileSourceScanExec => f }

  test("co-bucketed join and bucket-key aggregation run shuffle-free") {
    val docs = Tables.documents(spark, sfDir)
    val embs = Tables.embeddings(spark, sfDir).withColumnRenamed("vec_id", "doc_id")
    BucketedTables.writeBucketed(docs, "docs_bkt", s"$warehouse/docs_bkt", 4, Seq("doc_id"))
    BucketedTables.writeBucketed(embs, "embs_bkt", s"$warehouse/embs_bkt", 4, Seq("doc_id"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = BucketedTables.read(spark, "docs_bkt")
      val b = BucketedTables.read(spark, "embs_bkt")

      val joined = a.join(b, "doc_id").select(col("doc_id"), col("lang"))
      val joinedNodes = execNodes(joined)
      assert(shuffles(joinedNodes).isEmpty,
        "co-bucketed equi-join must not shuffle either side")
      // ... and shuffle-freeness is bucket-driven: both sides scanned
      // AS buckets, not collapsed single-partition reads
      assert(scans(joinedNodes).size === 2)
      assert(scans(joinedNodes).forall(_.bucketedScan))
      // same rows as the unbucketed join
      val expected = docs.join(embs, "doc_id").select(col("doc_id"), col("lang"))
      assert(joined.collect().toSet === expected.collect().toSet)

      val agg = a.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val aggNodes = execNodes(agg)
      assert(shuffles(aggNodes).isEmpty,
        "aggregation on the bucket key must not shuffle")
      assert(scans(aggNodes).forall(_.bucketedScan))
      assert(agg.agg(sum("n")).head().getLong(0) === docs.count())

      // control: the same join shape over multi-partition inputs with no
      // known partitioning DOES shuffle — the detector (and the
      // assertions above) are meaningful, not vacuous
      val cl = spark.createDataFrame(
        spark.sparkContext.parallelize((0L until 5000L).map(Tuple1(_)), 4)
          .map(t => org.apache.spark.sql.Row(t._1)),
        new org.apache.spark.sql.types.StructType()
          .add("doc_id", "long", nullable = false))
      assert(shuffles(execNodes(cl.join(b, "doc_id"))).nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS docs_bkt")
      spark.sql("DROP TABLE IF EXISTS embs_bkt")
    }
  }

  test("LLM tier over id-bucketed documents: span-removal and line-dedup never shuffle the payload") {
    val docs = Tables.documents(spark, sfDir)
    BucketedTables.writeBucketed(docs, "docs_id_bkt", s"$warehouse/docs_id_bkt", 4, Seq("doc_id"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force real shuffle planning: with broadcast enabled the small spans
    // side broadcasts and the payload assertion would be vacuous
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    def payloadShuffles(nodes: Seq[SparkPlan]): Seq[SparkPlan] =
      shuffles(nodes).filter(_.children.head.output.exists(a =>
        Set("toks", "text", "clean_text", "__lines", "lines_text").contains(a.name)))
    try {
      val bkt = BucketedTables.read(spark, "docs_id_bkt")
      // span removal: the corpus body (tokenized text) enters the
      // id-keyed join from the bucketed scan — only the tiny spans
      // relation (ids + positions) may cross an exchange
      val removal = llm.TextDedup.removeDuplicateSpans(bkt, "doc_id", "text", k = 5)
      val nodes = execNodes(removal)
      assert(payloadShuffles(nodes).isEmpty,
        "span removal over the id-bucketed table must not shuffle token payloads")
      assert(scans(nodes).exists(_.bucketedScan))
      val expected = llm.TextDedup.removeDuplicateSpans(docs, "doc_id", "text", k = 5)
      assert(removal.collect().toSet === expected.collect().toSet)

      // line dedup rebuild: same invariant for the line payload. Runs
      // over the synthetic-lines view (shared headers/footers) — raw
      // document text has no newlines, so its drops side is EMPTY and
      // AQE's empty-relation propagation would collapse the whole join
      // away, making every assertion vacuous
      val bktLines = llm.CorpusOps.withSyntheticLines(bkt, "doc_id", "text")
      val ld = llm.CorpusOps.lineDedup(bktLines, "doc_id", "lines_text", minDf = 3)
      val ldNodes = execNodes(ld)
      assert(payloadShuffles(ldNodes).isEmpty,
        "line-dedup rebuild over the id-bucketed table must not shuffle line payloads")
      assert(scans(ldNodes).exists(_.bucketedScan))
      val ldExpected = llm.CorpusOps.lineDedup(
        llm.CorpusOps.withSyntheticLines(docs, "doc_id", "text"),
        "doc_id", "lines_text", minDf = 3)
      assert(ld.collect().toSet === ldExpected.collect().toSet)
      assert(ld.agg(sum(col("n_dropped"))).head().getLong(0) > 0,
        "synthetic-lines corpus must actually drop lines")

      // control: the unbucketed plans DO shuffle the payload under the
      // same no-broadcast regime — the assertions above are not vacuous
      assert(payloadShuffles(execNodes(
        llm.TextDedup.removeDuplicateSpans(docs, "doc_id", "text", k = 5))).nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS docs_id_bkt")
    }
  }

  test("unique window operators on a bucketed-by-key table skip the key shuffle") {
    val docs = Tables.documents(spark, sfDir)
      .withColumn("seq", monotonically_increasing_id())
    BucketedTables.writeBucketed(docs, "docs_keyed_bkt",
      s"$warehouse/docs_keyed_bkt", 4, Seq("lang"))
    try {
      val bkt = BucketedTables.read(spark, "docs_keyed_bkt")
      // ever = latest per key: groupBy(lang).agg(max_by(...)) — on the
      // bucketed table the hash aggregate consumes the scan's bucket
      // partitioning directly
      val r = operators.UniqueOps.everCurrent(bkt, Seq("lang"), "seq")
      val nodes = execNodes(r)
      assert(shuffles(nodes).isEmpty,
        "unique:ever over a key-bucketed table must not shuffle")
      assert(scans(nodes).forall(_.bucketedScan))
      val expected = operators.UniqueOps.everCurrent(docs, Seq("lang"), "seq")
      assert(r.select("doc_id", "lang").collect().toSet ===
        expected.select("doc_id", "lang").collect().toSet)
    } finally {
      spark.sql("DROP TABLE IF EXISTS docs_keyed_bkt")
    }
  }
}
