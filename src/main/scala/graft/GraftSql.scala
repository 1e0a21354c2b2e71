package graft

import org.apache.spark.sql.{Column, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

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
  }
}
