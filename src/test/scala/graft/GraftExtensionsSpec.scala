package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The installable registration path: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` resolves the whole SQL
  * surface WITHOUT any programmatic `GraftSql.register` call — the way a
  * cluster operator would deploy the library (SURVEY.md §2.2 "UDx
  * surface"). Results are pinned against the Scala API on the same data
  * so injected builders and library calls cannot drift.
  */
class GraftExtensionsSpec extends AnyFunSuite with SparkTestSession {

  /** A second session on the shared SparkContext with the extension
    * applied. getOrCreate only constructs (and only then applies
    * extensions) when no active/default session exists, so both are
    * cleared first and restored after. `withExtensions(new
    * GraftExtensions)` is the builder-side binding of the SAME class the
    * `spark.sql.extensions=graft.GraftExtensions` conf names — that conf
    * is static (read from the SparkContext's conf at construction), so
    * it cannot be exercised on a shared test context; Spark's own
    * loader instantiates the identical `SparkSessionExtensions => Unit`.
    */
  private def withExtensionSession[A](f: SparkSession => A): A = {
    val base = spark // force the shared session (and its context) first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
      assert(ext ne base, "builder must construct a fresh session for the extension to apply")
      f(ext)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("scalar functions resolve via spark.sql.extensions with no register call") {
    withExtensionSession { ext =>
      val r = ext.sql(
        """SELECT graft_lang_id('der Hund und die Katze sind nicht im Haus') AS lang,
          |  graft_jaccard(array('a','b','c'), array('b','c','d')) AS j,
          |  size(graft_minhash(array('x y z'), 8)) AS n_sig""".stripMargin).head()
      assert(r.getString(0) === "de")
      assert(math.abs(r.getDouble(1) - 0.5) < 1e-9)
      assert(r.getInt(2) === 8)
    }
  }

  test("window TVFs resolve via the extension and match the Scala API") {
    withExtensionSession { ext =>
      import ext.implicits._
      val df = Seq((1L, "a", 10), (2L, "a", 20), (3L, "b", 30), (4L, "a", 40))
        .toDF("seq", "k", "v")
      df.createOrReplaceTempView("ext_events")
      val sql = ext.sql(
        "SELECT k, seq, v FROM unique_ever('ext_events', 'seq', 'k') ORDER BY k")
        .collect().toSeq
      val api = operators.UniqueOps
        .everCurrent(df, Seq("k"), "seq")
        .selectExpr("k", "seq", "v").orderBy("k").collect().toSeq
      assert(sql === api)
      assert(sql.map(r => (r.getString(0), r.getLong(1))) === Seq(("a", 4L), ("b", 3L)))
    }
  }

  test("LLM-tier TVFs resolve via the extension (exact dedup over TABLE arg)") {
    withExtensionSession { ext =>
      import ext.implicits._
      Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
        .toDF("doc_id", "text").createOrReplaceTempView("ext_docs")
      val survivors = ext.sql(
        "SELECT doc_id FROM graft_exact_dedup(TABLE(ext_docs), 'doc_id', 'text')")
        .as[Long].collect().toSet
      assert(survivors === Set(1L, 3L)) // min doc_id per content group wins
    }
  }

  test("the shared session remains isolated from the extension session") {
    // function registries are per-session: the extension session's
    // injected functions must not leak into the base session unless
    // GraftSql.register was called there (GraftSqlSpec does that on the
    // shared session; use a name-check against a fresh plain session).
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val plain = SparkSession.builder().master("local[4]").getOrCreate()
      assert(plain ne spark)
      val err = intercept[Exception] {
        plain.sql("SELECT graft_lang_id('x')").collect()
      }
      assert(err.getMessage.toLowerCase.contains("unresolved")
        || err.getMessage.contains("graft_lang_id"))
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
