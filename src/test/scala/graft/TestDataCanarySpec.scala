package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema canary over the REAL driver-generated testdata.
  *
  * The driver regenerated `/root/testdata` between rounds 8 and 9 with a
  * changed parquet layout (`events.ts`: TIMESTAMP(NANOS) → timestamp[us]),
  * and the breakage surfaced only in the driver's own gate runs — the sbt
  * suite, built entirely on in-memory fixtures, stayed green while every
  * events-based oracle row silently vanished. This spec pins the loader
  * contract against the actual files so the NEXT regeneration fails here
  * first, with a readable diff, before any driver gate runs.
  *
  * Skips (with a loud cancel, not a silent pass) if the testdata directory
  * is absent, so the suite still runs on a bare checkout.
  */
class TestDataCanarySpec extends AnyFunSuite with SparkTestSession {

  private val sfDir = "/root/testdata/sf0.001"
  private def available: Boolean = new java.io.File(sfDir).isDirectory

  private def norm(dt: DataType): String = dt.simpleString

  test("events loads and normalizes ts to TimestampType with rows present") {
    assume(available, s"$sfDir not present on this machine")
    val ev = Tables.events(spark, sfDir)
    val ts = ev.schema("ts").dataType
    assert(ts == TimestampType,
      s"Tables.events must normalize ts to TimestampType for every driver data generation; got $ts")
    val expected = Map(
      "event_id" -> "bigint", "user_id" -> "bigint", "event_type" -> "string",
      "value" -> "double", "props" -> "string")
    expected.foreach { case (c, t) =>
      assert(norm(ev.schema(c).dataType) == t, s"events.$c: expected $t, got ${norm(ev.schema(c).dataType)}")
    }
    assert(ev.limit(1).count() == 1, "events must be non-empty and readable end-to-end")
  }

  test("documents/embeddings/lineitem/orders/customer load with the expected columns") {
    assume(available, s"$sfDir not present on this machine")
    val doc = Tables.documents(spark, sfDir)
    assert(Set("doc_id", "text", "lang", "source").subsetOf(doc.columns.toSet), doc.columns.mkString(","))
    assert(norm(doc.schema("text").dataType) == "string")
    val emb = Tables.embeddings(spark, sfDir)
    assert(Set("vec_id", "embedding").subsetOf(emb.columns.toSet), emb.columns.mkString(","))
    assert(emb.schema("embedding").dataType.isInstanceOf[ArrayType],
      s"embedding must be an array column, got ${emb.schema("embedding").dataType}")
    val li = Tables.lineitem(spark, sfDir)
    assert(Set("l_orderkey", "l_quantity", "l_returnflag").subsetOf(li.columns.toSet))
    val ord = Tables.orders(spark, sfDir)
    assert(Set("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate").subsetOf(ord.columns.toSet))
    val cust = Tables.customer(spark, sfDir)
    assert(Set("c_custkey", "c_name").subsetOf(cust.columns.toSet))
    // each table must actually scan (a pure schema read would miss a
    // corrupt/relaid-out data page)
    Seq(doc, emb, li, ord, cust).foreach(df => assert(df.limit(1).count() == 1))
  }
}
