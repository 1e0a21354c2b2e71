package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Audio near-dup tier: the REAL javax.sound WAV round-trip must land
  * exactly on the integer window-sum formula (withSyntheticWavs'
  * contract), banded pairs vs brute hamming, dedup vs union-find, and
  * the null-payload contract.
  */
class AudioDedupSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  /** In-memory reference of the fixture + hash spec. */
  private def refHash(id: Long, nSamples: Int = 2048, baseMod: Long = 32L): Long = {
    val base = (id % baseMod) + 1
    val v = (id / baseMod) % 3
    val win = nSamples / 64
    val sums = (0 until 64).map { k =>
      var s = 0L
      for (i <- k * win until (k + 1) * win) {
        var x = ((base * (i.toLong * 7 + 3)) % 251).toInt - 125
        if ((v >= 1 && k == 5) || (v == 2 && k == 11)) x += 40
        s += x
      }
      s
    }
    (0 until 63).foldLeft(0L) { (h, k) =>
      if (sums(k + 1) > sums(k)) h | (1L << k) else h
    }
  }

  test("audioHashes: real WAV round-trip equals the integer formula; " +
      "null/undecodable payloads yield null") {
    val ids = (0L until 120L).toDF("doc_id")
    val got = llm.Multimodal.audioHashes(
        llm.Multimodal.withSyntheticWavs(ids, "doc_id"), "doc_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got.size === 120)
    (0L until 120L).foreach { id =>
      assert(got(id) === Some(refHash(id)),
        s"WAV round-trip hash diverged from the formula for id $id")
    }
    val broken = Seq((1L, null: Array[Byte]), (2L, "RIFFjunk".getBytes),
      (3L, "not audio at all".getBytes)).toDF("doc_id", "media")
    val b = llm.Multimodal.audioHashes(broken, "doc_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(b.values.forall(_.isEmpty), s"broken payloads must yield null: $b")
  }

  test("audio pairs equal brute-force hamming ≤ 2; dedup equals union-find") {
    val ids = (0L until 120L).toDF("doc_id")
    val hs = (0L until 120L).map(id => id -> refHash(id)).toMap
    val brute = (for {
      (ia, ha) <- hs.toSeq; (ib, hb) <- hs.toSeq if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 2
    } yield (ia, ib, d)).toSet
    assert(brute.exists(_._3 == 0) && brute.exists(_._3 > 0),
      s"fixture drift: want exact and near regimes, got ${brute.size} pairs")
    val hashes = llm.Multimodal.audioHashes(
      llm.Multimodal.withSyntheticWavs(ids, "doc_id"), "doc_id")
    val got = llm.TextDedup.hammingHashPairs(hashes, "id", "whash",
        chunkBits = 16, maxHamming = 2, maxBucket = 1000)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === brute, "banded audio pairs diverged from brute force")
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    brute.foreach { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = (0L until 120L).filter(i => find(i) == i).toSet
    val survivors = llm.TextDedup.dedupByPairs(ids, "doc_id",
        llm.TextDedup.hammingHashPairs(hashes, "id", "whash",
          chunkBits = 16, maxHamming = 2, maxBucket = 1000)
          .select("id_a", "id_b"))
      .select("doc_id").as[Long].collect().toSet
    assert(survivors === expect, "audio dedup diverged from union-find")
  }
}
