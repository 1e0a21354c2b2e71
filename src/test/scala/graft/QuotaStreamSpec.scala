package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.{QuotaStream, Replay, UniqueStreams}

/** Streaming per-group quota admission vs the batch capPerGroup: ordered
  * feed equality, cross-batch counter persistence, chunking invariance,
  * and restart safety (counters restore — no double admission).
  */
class QuotaStreamSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val rows = (1L to 40L).map(i => (i, s"s${(i % 3).toInt}", s"t$i"))

  private def withRocks[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    UniqueStreams.useRocksDBStateStore(spark)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("ordered feed: admissions equal batch capPerGroup across chunk " +
      "sizes and survive kill/restart without double admission") {
    val df = rows.toDF("doc_id", "source", "text")
    val batch = llm.CorpusOps.capPerGroup(df, "source", "doc_id", 5)
      .select("doc_id").as[Long].collect().toSet
    assert(batch.size == 15, s"fixture drift: ${batch.size}")
    withRocks {
      def run(chunk: Int) =
        Replay.replay(spark, df, "doc_id", chunk, "append")(sdf =>
          QuotaStream.capPerGroupStream(sdf, "source", "doc_id", 5))
          .select("doc_id").as[Long].collect().toSet
      // chunk 3: quotas fill mid-batch AND across batches; chunk 40: one
      // batch exercises the per-batch sort path alone
      assert(run(3) === batch, "streamed admissions diverged from batch cap")
      assert(run(40) === batch, "single-batch admissions diverged")
      val restarted =
        Replay.replayWithRestart(spark, df, "doc_id", 7)(sdf =>
          QuotaStream.capPerGroupStream(sdf, "source", "doc_id", 5))
          .select("doc_id").as[Long].collect().toSet
      assert(restarted === batch,
        "restart changed admissions (counter restore must prevent re-admission)")
    }
  }

  test("admitted rows carry the full input schema through") {
    val df = rows.toDF("doc_id", "source", "text")
    withRocks {
      val out = Replay.replay(spark, df, "doc_id", 10, "append")(sdf =>
        QuotaStream.capPerGroupStream(sdf, "source", "doc_id", 2))
      assert(out.columns.toSeq == Seq("doc_id", "source", "text"))
      val got = out.as[(Long, String, String)].collect().toSet
      val expected = rows.groupBy(_._2).values.flatMap(_.sortBy(_._1).take(2)).toSet
      assert(got === expected)
    }
  }
}
