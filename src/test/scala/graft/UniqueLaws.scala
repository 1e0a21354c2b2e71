package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.operators.UniqueOps

/** Property-based invariants (SURVEY.md §5.2 #3): every operator compared
  * against an independent in-memory Scala fold on randomly generated
  * streams. ScalaCheck runs these natively under sbt test.
  */
object UniqueLaws extends Properties("UniqueOps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8) // each trial runs Spark jobs; keep the suite fast

  private lazy val spark = SparkTestSession.session
  import spark.implicits._

  /** (key, tsMs) pairs with seq = index+1; keys from a small alphabet so
    * collisions are common, ts non-decreasing with random gaps.
    */
  private val streamGen: Gen[List[(String, Long)]] = for {
    n <- Gen.choose(1, 40)
    keys <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d"))
    gaps <- Gen.listOfN(n, Gen.choose(0L, 800L))
  } yield keys.zip(gaps.scanLeft(100000L)(_ + _).tail)

  private def toDf(rows: List[(String, Long)]) =
    rows.zipWithIndex.map { case ((k, ms), i) => (k, ms, i + 1) }
      .toDF("key", "ms", "seq")
      .withColumn("ts", timestamp_millis(col("ms")))

  property("ever: current is last-write-wins; current+expired partition the input") =
    forAll(streamGen) { rows =>
      val r = UniqueOps.ever(toDf(rows), Seq("key"), "seq")
      val cur = r.current.select("key", "seq").as[(String, Int)].collect().toMap
      val oracle = rows.zipWithIndex.map { case ((k, _), i) => k -> (i + 1) }
        .groupMapReduce(_._1)(_._2)(math.max)
      cur == oracle &&
        r.current.count() + r.expired.count() == rows.length
    }

  property("first: one row per key, the minimal seq, no expired") =
    forAll(streamGen) { rows =>
      val r = UniqueOps.first(toDf(rows), Seq("key"), "seq")
      val cur = r.current.select("key", "seq").as[(String, Int)].collect().toMap
      val oracle = rows.zipWithIndex.map { case ((k, _), i) => k -> (i + 1) }
        .groupMapReduce(_._1)(_._2)(math.min)
      cur == oracle && r.expired.count() == 0
    }

  property("length(n): the n most recent distinct keys, latest row each") =
    forAll(streamGen, Gen.choose(1, 5)) { (rows, n) =>
      val r = UniqueOps.length(toDf(rows), Seq("key"), "seq", n)
      val cur = r.current.select("key", "seq").as[(String, Int)].collect().toMap
      val latest = rows.zipWithIndex.map { case ((k, _), i) => k -> (i + 1) }
        .groupMapReduce(_._1)(_._2)(math.max)
      val oracle = latest.toSeq.sortBy(-_._2).take(n).toMap
      cur == oracle
    }

  property("deduplicate: kept gaps per key exceed the interval; drops are within it") =
    forAll(streamGen, Gen.choose(1L, 2000L)) { (rows, interval) =>
      val r = UniqueOps.deduplicate(toDf(rows), Seq("key"), "seq", "ts", interval)
      val kept = r.current.select("key", "ms").as[(String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toList).toMap
      // oracle: fold per key over (ms, seq)-sorted events
      val oracle = rows.zipWithIndex.map { case ((k, ms), i) => (k, ms, i + 1) }
        .groupBy(_._1).view.mapValues { evs =>
          val sorted = evs.sortBy(e => (e._2, e._3))
          var lastKept = Long.MinValue
          sorted.flatMap { case (_, ms, _) =>
            if (lastKept == Long.MinValue || ms - lastKept > interval) {
              lastKept = ms; Some(ms)
            } else None
          }.toList
        }.toMap
      kept == oracle
    }

  property("timeBatch: latest per (floor batch, key); batch count matches") =
    forAll(streamGen, Gen.choose(500L, 3000L)) { (rows, w) =>
      val r = UniqueOps.timeBatch(toDf(rows), Seq("key"), "seq", "ts", w)
      val cur = r.current.select("key", "batch_start_ms", "seq")
        .as[(String, Long, Int)].collect().toSet
      val oracle = rows.zipWithIndex
        .map { case ((k, ms), i) => ((k, (ms / w) * w), i + 1) }
        .groupMapReduce(_._1)(_._2)(math.max)
        .map { case ((k, b), s) => (k, b, s) }.toSet
      cur == oracle
    }

  property("lengthBatch: fold oracle agreement (boundaries, assignment, latest-per-key)") =
    forAll(streamGen, Gen.choose(2, 4)) { (rows, n) =>
      val r = UniqueOps.lengthBatch(toDf(rows), Seq("key"), "seq", n)
      val cur = r.current.select("key", "batch_id", "seq")
        .as[(String, Long, Int)].collect().toSet
      // oracle: sequential fold over arrival order
      var seen = Set.empty[String]
      var batch = 0L
      val assignment = scala.collection.mutable.Map.empty[(String, Long), Int]
      var pending = List.empty[(String, Int)]
      rows.zipWithIndex.foreach { case ((k, _), i) =>
        seen += k
        pending = pending.filterNot(_._1 == k) :+ (k -> (i + 1))
        if (seen.size == n) {
          pending.foreach { case (pk, ps) => assignment((pk, batch)) = ps }
          pending = Nil; seen = Set.empty; batch += 1
        }
      }
      cur == assignment.map { case ((k, b), s) => (k, b, s) }.toSet
    }

  property("lengthBatch segmented intervals == in-memory automaton, any chunking") =
    forAll(streamGen, Gen.choose(2, 5), Gen.choose(1, 7)) { (rows, n, chunks) =>
      // larger chunk counts force batch boundaries to straddle chunk edges —
      // the regime where a mid-chunk flush makes key RE-occurrences
      // load-bearing and naive first-occurrence compression would be wrong
      val got = UniqueOps.lengthBatchIntervals(toDf(rows), Seq("key"), "seq", n, Some(chunks))
        .as[(Long, Long, Long)].collect().toSet
      // oracle: the reference automaton run in memory over arrival order
      var seen = Set.empty[String]
      var batch = 0L
      var lo = 0L // seq of first event - 1 = 0
      val oracle = scala.collection.mutable.Set.empty[(Long, Long, Long)]
      rows.zipWithIndex.foreach { case ((k, _), i) =>
        seen += k
        if (seen.size == n) {
          oracle += ((batch, lo, i + 1L))
          seen = Set.empty; batch += 1; lo = i + 1L
        }
      }
      got == oracle.toSet
    }

  property("deduplicateSalted == deduplicate on random streams and intervals") =
    forAll(streamGen, Gen.choose(1L, 2000L)) { (rows, interval) =>
      val df = toDf(rows)
      val plain = UniqueOps.deduplicate(df, Seq("key"), "seq", "ts", interval)
        .current.select("key", "seq").as[(String, Int)].collect().toSet
      val salted = UniqueOps.deduplicateSalted(df, Seq("key"), "seq", "ts", interval)
        .current.select("key", "seq").as[(String, Int)].collect().toSet
      salted == plain
    }

  property("UniqueResult.all tags exactly current+expired") =
    forAll(streamGen) { rows =>
      val r = UniqueOps.ever(toDf(rows), Seq("key"), "seq")
      val all = r.all.groupBy("change").count().as[(String, Long)].collect().toMap
      all.getOrElse("insert", 0L) == r.current.count() &&
        all.getOrElse("expire", 0L) == r.expired.count()
    }

  /** Random sparse graphs on a small node alphabet — dup cliques, chains,
    * cycles and isolated pairs all arise; self-loops excluded (a pairs
    * relation has id_a < id_b by construction).
    */
  private val edgeSetGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 30)
    es <- Gen.listOfN(n, for {
      a <- Gen.choose(0L, 19L)
      b <- Gen.choose(0L, 19L) if a != b
    } yield (math.min(a, b), math.max(a, b)))
  } yield es.distinct

  property("nearDupClusters: min-label CC equals union-find on random graphs") =
    forAll(edgeSetGen) { es =>
      // driverMaxEdges = 0 forces the distributed min-propagation loop —
      // the default would take the driver union-find fast path, which the
      // fast-path-equivalence spec in LlmOpsSpec covers separately
      val got = graft.llm.TextDedup.nearDupClusters(es.toDF("id_a", "id_b"),
          driverMaxEdges = 0L)
        .as[(Long, Long)].collect().toMap
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      got == parent.keys.map(x => x -> find(x)).toMap
    }
}
