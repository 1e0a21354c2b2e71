package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.TextSearch

/** Behavioral suite for the BM25 sparse-retrieval tier: an independent
  * plain-Scala re-derivation (tokenize → postings → df → idf → score →
  * rank, no Catalyst) pins the integer join surface exactly and the
  * ln-based score/rank to 1e-9, plus stopword pruning, streaming-vs-
  * batch equality, and eager validation.
  */
class TextSearchSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Independent BM25 re-derivation in Scala collections. */
  private object Bm25Ref {
    def toks(text: String): Seq[String] =
      text.toLowerCase.split("[^\\p{L}\\p{Nd}]+").filter(_.nonEmpty).toSeq
    final case class Index(post: Map[(String, Long), Long], dl: Map[Long, Long],
                           df: Map[String, Long], nDocs: Long, avgDl: Double)
    def index(corpus: Seq[(Long, String)], maxDfFrac: Double): Index = {
      val post = corpus.flatMap { case (id, t) => toks(t).map((_, id)) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val dl = corpus.map { case (id, t) => id -> toks(t).size.toLong }.toMap
      val n = corpus.size.toLong
      val df = post.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toLong)
        .filter { case (_, d) => d <= maxDfFrac * n }.toMap
      val avg = if (n == 0) 0.0 else dl.values.sum.toDouble / n
      Index(post.filter { case ((t, _), _) => df.contains(t) }, dl, df, n, avg)
    }
    def stats(qid: Long, qtext: String, ix: Index): Map[Long, (Long, Long, Long, Long)] = {
      val terms = toks(qtext).distinct.filter(ix.df.contains)
      val cands = ix.post.keys.collect {
        case (t, d) if terms.contains(t) => d
      }.toSet
      cands.map { d =>
        val matched = terms.filter(t => ix.post.contains((t, d)))
        val tfSum = matched.map(t => ix.post((t, d))).sum
        val tfdf = matched.map(t => ix.post((t, d)) * ix.df(t)).sum
        d -> ((matched.size.toLong, tfSum, tfdf, ix.dl(d)))
      }.toMap
    }
    def score(qtext: String, d: Long, ix: Index, k1: Double, b: Double): Double =
      toks(qtext).distinct.filter(ix.df.contains).collect {
        case t if ix.post.contains((t, d)) =>
          val tf = ix.post((t, d)).toDouble
          val idf = math.log(1.0 + (ix.nDocs - ix.df(t) + 0.5) / (ix.df(t) + 0.5))
          idf * tf * (k1 + 1.0) /
            (tf + k1 * (1.0 - b + b * ix.dl(d) / ix.avgDl))
      }.sum
  }

  private val corpusFix = Seq(
    (1L, "spark streaming state store rocksdb"),
    (2L, "spark catalyst optimizer rules the optimizer rewrites plans"),
    (3L, "duckdb oracle mirrors verify every operator"),
    (4L, "state state state spark"),
    (5L, "an unrelated document about gardening tulips"))
  private val queriesFix = Seq(
    (100L, "spark state"),
    (101L, "optimizer plans"),
    (102L, "zzz unseen terms only"))

  test("bm25Stats: independent re-derivation on a fixture corpus") {
    val ix = TextSearch.bm25Index(corpusFix.toDF("doc_id", "text"),
      "doc_id", "text", maxDfFrac = 0.5)
    val ref = Bm25Ref.index(corpusFix, 0.5)
    assert(ix.nDocs === ref.nDocs)
    assert(math.abs(ix.avgDl - ref.avgDl) < 1e-12)
    val got = TextSearch.bm25Stats(queriesFix.toDF("query_id", "text"),
        "query_id", "text", ix)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    val exp = queriesFix.flatMap { case (qid, qt) =>
      Bm25Ref.stats(qid, qt, ref).map { case (d, s) => (qid, d) -> s }
    }.toMap
    assert(got === exp)
    // "spark" appears in 3/5 docs > maxDfFrac=0.5 → pruned; query 100
    // matches only via "state"
    assert(!got.contains((100L, 2L)),
      "doc 2 matches only the pruned stopword-grade term")
    assert(got.contains((100L, 4L)) && got((100L, 4L))._1 === 1L)
    // the all-OOV query surfaces no candidates
    assert(!got.keys.exists(_._1 === 102L))
  }

  test("bm25TopK: scores and ranking match the re-derivation, partition-invariant") {
    val ref = Bm25Ref.index(corpusFix, 1.0)
    val expected = queriesFix.take(2).map { case (qid, qt) =>
      val ranked = corpusFix.map(_._1)
        .map(d => (d, Bm25Ref.score(qt, d, ref, 1.2, 0.75)))
        .filter(_._2 > 0).sortBy { case (d, s) => (-s, d) }.take(3)
      qid -> ranked
    }.toMap
    Seq(1, 7).foreach { nPart =>
      val ix = TextSearch.bm25Index(
        corpusFix.toDF("doc_id", "text").repartition(nPart),
        "doc_id", "text", maxDfFrac = 1.0)
      val got = TextSearch.bm25TopK(queriesFix.toDF("query_id", "text"),
          "query_id", "text", ix, k = 3)
        .as[(Long, Long, Double, Int)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(r => (r._2, r._3)).toSeq)
        .toMap
      expected.foreach { case (qid, exp) =>
        val g = got.getOrElse(qid, Seq.empty)
        assert(g.map(_._1) === exp.map(_._1), s"qid=$qid nPart=$nPart ranking")
        g.zip(exp).foreach { case ((_, gs), (_, es)) =>
          assert(math.abs(gs - es) < 1e-9, s"qid=$qid nPart=$nPart score")
        }
      }
      assert(!got.contains(102L), "all-OOV query must return nothing")
    }
  }

  test("bm25StatsStream equals batch bm25Stats on the sf0.001 corpus, any chunking") {
    val docs = Tables.documents(spark, sf)
    val ix = TextSearch.bm25Index(
      docs.filter($"doc_id" % 10 =!= 0), "doc_id", "text")
    val queries = docs.filter($"doc_id" % 10 === 0)
      .select($"doc_id".as("query_id"), $"text")
    val batch = TextSearch.bm25Stats(queries, "query_id", "text", ix)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty)
    Seq(10, 3).foreach { chunk =>
      val streamed = graft.streaming.Replay
        .replay(spark, queries, "query_id", chunk, "update")(sdf =>
          graft.streaming.Bm25SearchStream.bm25StatsStream(sdf, "text", "query_id", ix))
        .as[(Long, Long, Long, Long, Long, Long)].collect()
      assert(streamed.toSet === batch, s"chunk=$chunk diverged from batch")
    }
  }

  test("bm25StatsStreamWindowed equals batch bm25Stats when each query " +
      "carries one event time") {
    val docs = Tables.documents(spark, sf)
    val ix = TextSearch.bm25Index(
      docs.filter($"doc_id" % 10 =!= 0), "doc_id", "text")
    val queries = docs.filter($"doc_id" % 10 === 0)
      .select($"doc_id".as("query_id"), $"text")
      .withColumn("event_ts",
        org.apache.spark.sql.functions.timestamp_seconds($"query_id"))
    val batch = TextSearch.bm25Stats(
        queries.select("query_id", "text"), "query_id", "text", ix)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val streamed = graft.streaming.Replay
      .replay(spark, queries, "query_id", 10, "update")(sdf =>
        graft.streaming.Bm25SearchStream.bm25StatsStreamWindowed(sdf, "text",
          "query_id", "event_ts", ix, "50 seconds", "10 seconds"))
      .select("query_id", "doc_id", "n_match", "tf_sum", "tfdf_sum", "dl")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(streamed.toSet === batch, "windowed bm25 stream diverged from batch")
  }

  test("bm25IngestStream: queries retrieve exactly the arrivals-so-far " +
      "with at-probe df, at any chunking") {
    graft.streaming.UniqueStreams.useRocksDBStateStore(spark)
    val docs = Tables.documents(spark, sf)
    val tagged = docs.select($"doc_id", $"text",
      ($"doc_id" % 10 === 0).as("is_query"))
    // independent batch expectation: stored postings = first-by-id maxDf
    // docs per token; a query probes stored postings with doc_id < qid;
    // df at probe = count of those rows per (query, token)
    val maxDf = 20
    import org.apache.spark.sql.expressions.Window
    val corp = docs.filter($"doc_id" % 10 =!= 0)
      .select($"doc_id", graft.llm.TextDedup.tokenize($"text").as("toks"))
      .select($"doc_id", org.apache.spark.sql.functions.size($"toks").as("dl"),
        explode($"toks").as("tok"))
      .groupBy("tok", "doc_id", "dl").agg(count(lit(1)).as("tf"))
    val kept = corp.withColumn("rnk",
        row_number().over(Window.partitionBy("tok").orderBy("doc_id")))
      .filter($"rnk" <= maxDf)
    val qt = docs.filter($"doc_id" % 10 === 0)
      .select($"doc_id".as("query_id"),
        explode(array_distinct(graft.llm.TextDedup.tokenize($"text"))).as("tok"))
    val probe = qt.join(kept, Seq("tok")).filter($"doc_id" < $"query_id")
      .withColumn("df_p",
        count(lit(1)).over(Window.partitionBy("query_id", "tok")))
    val expected = probe.groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_match"), sum($"tf").as("tf_sum"),
        sum($"tf" * $"df_p").as("tfdf_sum"), min($"dl").as("dl"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(expected.nonEmpty)
    Seq(50, 7).foreach { chunk =>
      val streamed = graft.streaming.Replay
        .replay(spark, tagged, "doc_id", chunk, "append")(sdf =>
          graft.streaming.Bm25IngestStream.bm25IngestStream(sdf, "doc_id",
            "text", "is_query", maxDf = maxDf))
        .groupBy("query_id", "doc_id")
        .agg(count(lit(1)).as("n_match"), sum($"tf").as("tf_sum"),
          sum($"tf" * $"df_p").as("tfdf_sum"), min($"dl").as("dl"))
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(streamed === expected, s"chunk=$chunk diverged from the batch prefix derivation")
    }
  }

  test("bm25IngestStream: a saturated term stops storing postings and " +
      "pins df (the online Zipf-head prune)") {
    graft.streaming.UniqueStreams.useRocksDBStateStore(spark)
    // docs 1,2,4 all carry "alpha"; maxDf=2 stores only docs 1,2; the
    // query (id 10) sees both with df pinned at 2 — doc 4 is invisible
    val tagged = Seq(
      (1L, "alpha one", false),
      (2L, "alpha two", false),
      (4L, "alpha four", false),
      (10L, "alpha", true)).toDF("doc_id", "text", "is_query")
    val got = graft.streaming.Replay
      .replay(spark, tagged, "doc_id", 2, "append")(sdf =>
        graft.streaming.Bm25IngestStream.bm25IngestStream(sdf, "doc_id",
          "text", "is_query", maxDf = 2))
      .select("query_id", "doc_id", "tf", "df_p")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set((10L, 1L, 1L, 2L), (10L, 2L, 1L, 2L)),
      s"expected docs 1,2 at df=2 and no doc 4, got $got")
  }

  test("bm25 shuffle-join query regime equals the broadcast regime") {
    val docs = Tables.documents(spark, sf)
    val ix = TextSearch.bm25Index(
      docs.filter($"doc_id" % 10 =!= 0), "doc_id", "text")
    val queries = docs.filter($"doc_id" % 10 === 0)
      .select($"doc_id".as("query_id"), $"text")
    val a = TextSearch.bm25TopK(queries, "query_id", "text", ix, k = 5)
      .select("query_id", "doc_id", "rank").as[(Long, Long, Int)].collect().toSet
    val b = TextSearch.bm25TopK(queries, "query_id", "text", ix, k = 5,
        broadcastQueries = false)
      .select("query_id", "doc_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(a === b && a.nonEmpty)
    val sa = TextSearch.bm25Stats(queries, "query_id", "text", ix)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val sb = TextSearch.bm25Stats(queries, "query_id", "text", ix,
        broadcastQueries = false)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(sa === sb)
  }

  test("bm25 validation is eager") {
    val df = corpusFix.toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextSearch.bm25Index(df, "doc_id", "text", maxDfFrac = 0.0)
    }
    val ix = TextSearch.bm25Index(df, "doc_id", "text")
    intercept[IllegalArgumentException] {
      TextSearch.bm25TopK(df, "doc_id", "text", ix, k = 0)
    }
    intercept[IllegalArgumentException] {
      TextSearch.bm25TopK(df, "doc_id", "text", ix, k = 5, b = 1.5)
    }
  }
}
