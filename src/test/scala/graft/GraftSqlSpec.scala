package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL registration surface: the same Catalyst expressions reachable
  * from spark.sql text.
  */
class GraftSqlSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  GraftSql.register(spark)

  test("scalar functions run from SQL text") {
    val r = spark.sql(
      """SELECT graft_lang_id('der Hund und die Katze sind nicht im Haus') AS lang,
        |  graft_jaccard(array('a','b','c'), array('b','c','d')) AS j,
        |  graft_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS cos,
        |  size(graft_tokenize('Hello, World! Again')) AS n_tok,
        |  size(graft_shingles(array('a','b','c','d'), 3)) AS n_sh,
        |  size(graft_minhash(array('x y z'), 8)) AS n_sig
        |""".stripMargin).head()
    assert(r.getString(0) === "de")
    assert(math.abs(r.getDouble(1) - 0.5) < 1e-9)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)
    assert(r.getInt(3) === 3)
    assert(r.getInt(4) === 2)
    assert(r.getInt(5) === 8)
  }

  test("SQL functions compose with tables and aggregation") {
    Tables.documents(spark, "/root/testdata/sf0.001").createOrReplaceTempView("docs")
    val counts = spark.sql(
      """SELECT graft_lang_id(text) AS pred, count(*) AS n
        |FROM docs GROUP BY 1""".stripMargin)
    assert(counts.count() > 0)
    assert(counts.agg(org.apache.spark.sql.functions.sum("n")).as[Long].head() === 500L)
  }

  test("non-literal shingle size is rejected eagerly") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingles(array('a'), 1 + 2ifoo)").collect()
    }
    assert(e != null) // parse/analysis failure either way — never silent
  }

  test("simhash from SQL equals simhash from the Scala API") {
    val viaSql = spark.sql("SELECT graft_simhash(graft_tokenize('alpha beta gamma'))")
      .as[Long].head()
    val viaApi = Seq("alpha beta gamma").toDF("t")
      .select(llm.TextDedup.simhash(llm.TextDedup.tokenize(org.apache.spark.sql.functions.col("t"))))
      .as[Long].head()
    assert(viaSql === viaApi)
  }
}
