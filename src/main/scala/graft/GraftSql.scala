package graft

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, FunctionTableSubqueryArgumentExpression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** SQL surface: registers the engine's scalar capabilities in the session
  * function registry so `spark.sql("SELECT graft_lang_id(text) ...")`
  * works. The builders return native Catalyst expression trees (the same
  * Column expressions the Scala API uses) — NOT UDFs, so whole-stage
  * codegen and optimizer rules see through them (SURVEY.md §2.2 "UDx
  * surface": the reference registers its operators declaratively via
  * @Extension; this is the Spark-native analog for the scalar tier).
  */
object GraftSql {
  private def c(e: Expression): Column = GraftColumnBridge.column(e)
  private def x(col: Column): Expression = GraftColumnBridge.expression(col)

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be a literal integer, got $other")
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def f1(name: String)(fn: Column => Column): Unit =
      reg.createOrReplaceTempFunction(name, es => x(fn(c(es.head))), "internal")
    def f2(name: String)(fn: (Column, Column) => Column): Unit =
      reg.createOrReplaceTempFunction(name, es => x(fn(c(es(0)), c(es(1)))), "internal")

    f1("graft_tokenize")(llm.TextDedup.tokenize)
    f1("graft_simhash")(llm.TextDedup.simhash)
    f1("graft_lang_id")(llm.TextAnalysis.langId)
    f1("graft_cjk_ratio")(llm.TextAnalysis.cjkRatio)
    f2("graft_jaccard")(llm.TextDedup.jaccard)
    f2("graft_cosine")(llm.Similarity.cosine)
    reg.createOrReplaceTempFunction("graft_shingles",
      es => x(llm.TextDedup.shingles(c(es(0)), litInt(es(1), "shingle size"))), "internal")
    reg.createOrReplaceTempFunction("graft_minhash",
      es => x(llm.TextDedup.minhashSignature(c(es(0)), litInt(es(1), "signature size"))), "internal")
    registerTableFunctions(spark)
  }

  // ---- table-valued surface: the window operators as first-class FROM
  // clauses, the SparkSQL analog of the reference's @Extension windows
  // (UniqueEverWindowProcessor.java:63-65; SURVEY.md §4.2). The builders
  // compose the SAME DataFrame operators as the Scala API and return the
  // resulting logical plan, so the optimizer sees an ordinary plan. The
  // table argument is either TABLE(name) or a table-name string literal.

  private def litStr(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a literal string, got $other")
  }

  private def litLong(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a literal integer, got $other")
  }

  private def litDouble(e: Expression, what: String): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: Float, _) => v.toDouble
    case Literal(v: Int, _) => v.toDouble
    case Literal(v: Long, _) => v.toDouble
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a literal number, got $other")
  }

  private def tableArg(spark: SparkSession, e: Expression): DataFrame = e match {
    case t: FunctionTableSubqueryArgumentExpression => GraftColumnBridge.dataset(spark, t.plan)
    case other => spark.table(litStr(other, "table argument"))
  }

  /** Registers all 11 reference windows as TVFs, each returning the
    * operator's CURRENT stream, e.g.
    * `SELECT * FROM unique_ever('events', 'event_id', 'user_id')`:
    * `unique_ever(t, seq, key...)`, `unique_first(t, seq, key...)`,
    * `unique_length(t, seq, n, key...)`, `unique_length_batch` /
    * `unique_first_length_batch(t, seq, n, key...)`,
    * `unique_time` / `unique_time_batch` / `unique_first_time_batch` /
    * `unique_external_time_batch(t, seq, ts, window_ms, key...)`,
    * `unique_time_length_batch(t, seq, ts, window_ms, n, key...)`,
    * `unique_deduplicate(t, seq, ts, interval_ms, key...)`.
    */
  def registerTableFunctions(spark: SparkSession): Unit = {
    val reg = spark.sessionState.tableFunctionRegistry
    def plan(df: DataFrame): LogicalPlan = GraftColumnBridge.plan(df)
    def keysFrom(es: Seq[Expression]): Seq[String] =
      es.map(litStr(_, "key column")) match {
        case Nil => throw new IllegalArgumentException("at least one key column required")
        case ks => ks
      }
    reg.createOrReplaceTempFunction("unique_ever", es =>
      plan(operators.UniqueOps.everCurrent(tableArg(spark, es.head),
        keysFrom(es.drop(2)), litStr(es(1), "seq column"))), "internal")
    reg.createOrReplaceTempFunction("unique_first", es =>
      plan(operators.UniqueOps.first(tableArg(spark, es.head),
        keysFrom(es.drop(2)), litStr(es(1), "seq column")).current), "internal")
    reg.createOrReplaceTempFunction("unique_length", es =>
      plan(operators.UniqueOps.length(tableArg(spark, es.head),
        keysFrom(es.drop(3)), litStr(es(1), "seq column"),
        litLong(es(2), "window length").toInt).current), "internal")
    reg.createOrReplaceTempFunction("unique_time", es =>
      plan(operators.UniqueOps.time(tableArg(spark, es.head),
        keysFrom(es.drop(4)), litStr(es(1), "seq column"),
        litStr(es(2), "ts column"), litLong(es(3), "window ms")).current), "internal")
    reg.createOrReplaceTempFunction("unique_deduplicate", es =>
      plan(operators.UniqueOps.deduplicate(tableArg(spark, es.head),
        keysFrom(es.drop(4)), litStr(es(1), "seq column"),
        litStr(es(2), "ts column"), litLong(es(3), "interval ms")).current), "internal")
    // the remaining reference windows, completing all 11 as SQL TVFs
    reg.createOrReplaceTempFunction("unique_time_batch", es =>
      plan(operators.UniqueOps.timeBatch(tableArg(spark, es.head),
        keysFrom(es.drop(4)), litStr(es(1), "seq column"),
        litStr(es(2), "ts column"), litLong(es(3), "window ms")).current), "internal")
    reg.createOrReplaceTempFunction("unique_first_time_batch", es =>
      plan(operators.UniqueOps.firstTimeBatch(tableArg(spark, es.head),
        keysFrom(es.drop(4)), litStr(es(1), "seq column"),
        litStr(es(2), "ts column"), litLong(es(3), "window ms")).current), "internal")
    reg.createOrReplaceTempFunction("unique_external_time_batch", es =>
      plan(operators.UniqueOps.externalTimeBatch(tableArg(spark, es.head),
        keysFrom(es.drop(4)), litStr(es(1), "seq column"),
        litStr(es(2), "ts column"), litLong(es(3), "window ms")).current), "internal")
    reg.createOrReplaceTempFunction("unique_length_batch", es =>
      plan(operators.UniqueOps.lengthBatch(tableArg(spark, es.head),
        keysFrom(es.drop(3)), litStr(es(1), "seq column"),
        litLong(es(2), "window length").toInt).current), "internal")
    reg.createOrReplaceTempFunction("unique_first_length_batch", es =>
      plan(operators.UniqueOps.firstLengthBatch(tableArg(spark, es.head),
        keysFrom(es.drop(3)), litStr(es(1), "seq column"),
        litLong(es(2), "window length").toInt).current), "internal")
    reg.createOrReplaceTempFunction("unique_time_length_batch", es =>
      plan(operators.UniqueOps.timeLengthBatch(tableArg(spark, es.head),
        keysFrom(es.drop(5)), litStr(es(1), "seq column"),
        litStr(es(2), "ts column"), litLong(es(3), "window ms"),
        litLong(es(4), "window length").toInt).current), "internal")
    // ---- LLM-pipeline TVFs: the curation operators as FROM clauses —
    // `graft_exact_dedup(t, id, col...)`,
    // `graft_minhash_pairs(t, text, id, threshold)`,
    // `graft_knn(corpus, queries, id, vec, k)`
    reg.createOrReplaceTempFunction("graft_exact_dedup", es =>
      plan(llm.TextDedup.exactDedup(tableArg(spark, es.head),
        keysFrom(es.drop(2)), litStr(es(1), "id column"))), "internal")
    reg.createOrReplaceTempFunction("graft_minhash_pairs", es =>
      plan(llm.TextDedup.minhashPairs(tableArg(spark, es.head),
        litStr(es(1), "text column"), litStr(es(2), "id column"),
        threshold = litDouble(es(3), "threshold"))), "internal")
    reg.createOrReplaceTempFunction("graft_knn", es =>
      plan(llm.Similarity.bruteForceTopK(tableArg(spark, es.head),
        tableArg(spark, es(1)), litStr(es(2), "id column"),
        litStr(es(3), "vector column"), litLong(es(4), "k").toInt)), "internal")
    // the remaining near-dup / ANN pipelines, completing the LLM tier:
    // `graft_simhash_pairs(t, text, id, maxHamming)`,
    // `graft_ngram_pairs(t, text, id, threshold)`,
    // `graft_neardup_pairs(t, id, vec, threshold)`,
    // `graft_ann_lsh(corpus, queries, id, vec, k)`,
    // `graft_ann_ivf(corpus, queries, id, vec, k, nCells, nProbe)`
    reg.createOrReplaceTempFunction("graft_simhash_pairs", es =>
      plan(llm.TextDedup.simhashPairs(tableArg(spark, es.head),
        litStr(es(1), "text column"), litStr(es(2), "id column"),
        maxHamming = litLong(es(3), "max hamming").toInt)), "internal")
    reg.createOrReplaceTempFunction("graft_ngram_pairs", es =>
      plan(llm.TextDedup.ngramJaccardPairs(tableArg(spark, es.head),
        litStr(es(1), "text column"), litStr(es(2), "id column"),
        threshold = litDouble(es(3), "threshold"))), "internal")
    reg.createOrReplaceTempFunction("graft_neardup_pairs", es =>
      plan(llm.Similarity.embeddingNearDupPairs(tableArg(spark, es.head),
        litStr(es(1), "id column"), litStr(es(2), "vector column"),
        threshold = litDouble(es(3), "threshold"))), "internal")
    reg.createOrReplaceTempFunction("graft_ann_lsh", es =>
      plan(llm.Similarity.annTopK(tableArg(spark, es.head),
        tableArg(spark, es(1)), litStr(es(2), "id column"),
        litStr(es(3), "vector column"), litLong(es(4), "k").toInt)), "internal")
    // `graft_neardup_dedup(t, id, text, threshold)` — the end-to-end
    // near-dup removal (minhash pairs → min-label connected components →
    // drop non-canonical members). The CC label propagation is iterative,
    // so this TVF materializes intermediate jobs while the statement is
    // ANALYZED (same eager-materialization caveat as a CACHE TABLE) —
    // the returned relation itself is a plain anti-join plan.
    reg.createOrReplaceTempFunction("graft_neardup_dedup", es => {
      val t = tableArg(spark, es.head)
      val id = litStr(es(1), "id column")
      // stats form so the pipeline-internal persisted signature relation
      // can be released right here: dedupByPairs materializes the CC loop
      // (losers is checkpointed, lineage-free), after which the upstream
      // cache would only leak until ContextCleaner GC
      val pws = llm.TextDedup.minhashPairsWithStats(t,
        litStr(es(2), "text column"), id, threshold = litDouble(es(3), "threshold"))
      val deduped = llm.TextDedup.dedupByPairs(t, id, pws.pairs)
      pws.unpersist()
      plan(deduped)
    }, "internal")
    reg.createOrReplaceTempFunction("graft_ann_ivf", es =>
      plan(llm.Similarity.ivfTopK(tableArg(spark, es.head),
        tableArg(spark, es(1)), litStr(es(2), "id column"),
        litStr(es(3), "vector column"), litLong(es(4), "k").toInt,
        nCells = litLong(es(5), "nCells").toInt,
        nProbe = litLong(es(6), "nProbe").toInt)), "internal")
  }
}
