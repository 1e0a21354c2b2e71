package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.UniqueOps
import java.nio.file.{Files, Paths}

/** Randomized-parameter DIFFERENTIAL sweep over the 11 unique operators
  * (VERDICT r9 ask #4): the fixed-parameter CORRECTNESS rows pin one
  * parameterization each (WEEK/DAY/H6, n = 40/50/100, user_id), which
  * misses boundary arithmetic — window sizes that don't divide the day,
  * n ∈ {1, 1000}, non-zero `start.time` anchors, multi-column keys
  * (`UniqueExternalTimeBatchWindowProcessor.java:454-458`'s findEndTime
  * modulo is exactly where a fixed suite can't see a bug).
  *
  * For each seeded draw the tool picks an operator family round-robin,
  * draws (keys, window, n, start, variant) from the grids below, runs
  * the engine, writes the result parquet AND a DuckDB oracle SQL
  * GENERATED FROM THE SAME PARAMETERS — the same layout `graft.Verify`
  * produces, so the standard compare closes the loop:
  *
  *   sbt "runMain graft.tools.SweepVerify <sfDir> <outDir> <seed> <nDraws>"
  *   python3 tools/check_correctness.py <sfDir> <outDir> --skip-verify
  *
  * Determinism: same (seed, nDraws) → same draws, same names, same SQL.
  */
object SweepVerify {

  private val EVSQL = "event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props"

  private val keyGrid = Seq(
    Seq("user_id"),
    Seq("event_type"),
    Seq("user_id", "event_type"),
    Seq("user_id", "event_type", "value"))

  // deliberately includes non-divisors of the day (59 s, 90 min, 1234.567 s,
  // 99999.999 s) alongside the round units the fixed suite uses
  private val windowGrid = Seq(59000L, 3600000L, 5400000L, 21600000L,
    86400000L, 604800000L, 1234567L, 99999999L)

  private val nGrid = Seq(1, 2, 3, 7, 41, 1000)

  private val startGrid = Seq[Option[Long]](Some(0L), Some(3600000L),
    Some(123456L), None)

  private def pk(keys: Seq[String]): String = keys.mkString(", ")

  private def rnSql(keys: Seq[String], desc: Boolean): String =
    s"row_number() OVER (PARTITION BY ${pk(keys)} ORDER BY event_id ${if (desc) "DESC" else "ASC"})"

  private def everSql(keys: Seq[String], variant: String): String = variant match {
    case "current" =>
      s"""SELECT $EVSQL FROM (
         |  SELECT *, ${rnSql(keys, desc = true)} AS rn FROM events) WHERE rn = 1""".stripMargin
    case "expired" =>
      s"""SELECT $EVSQL FROM (
         |  SELECT *, ${rnSql(keys, desc = true)} AS rn FROM events) WHERE rn > 1""".stripMargin
    case "all" =>
      s"""SELECT $EVSQL, CASE WHEN rn = 1 THEN 'insert' ELSE 'expire' END AS change FROM (
         |  SELECT *, ${rnSql(keys, desc = true)} AS rn FROM events)""".stripMargin
  }

  private def firstSql(keys: Seq[String]): String =
    s"""SELECT $EVSQL FROM (
       |  SELECT *, ${rnSql(keys, desc = false)} AS rn FROM events) WHERE rn = 1""".stripMargin

  private def timeSql(keys: Seq[String], w: Long, variant: String): String = {
    val cur =
      s"""SELECT $EVSQL FROM (
         |  SELECT *, ${rnSql(keys, desc = true)} AS rn FROM events) WHERE rn = 1
         |  AND epoch_ms(ts) > (SELECT max(epoch_ms(ts)) FROM events) - $w""".stripMargin
    if (variant == "current") cur
    else
      s"""SELECT $EVSQL FROM events WHERE event_id NOT IN (
         |  SELECT event_id FROM ($cur))""".stripMargin
  }

  /** timeBatch family: fixed anchor (s) or min(ts) anchor (None);
    * keepFirst flips the within-batch winner; replaceTs rewrites ts to
    * the batch end.
    */
  private def timeBatchSql(keys: Seq[String], w: Long, start: Option[Long],
                           keepFirst: Boolean, replaceTs: Boolean,
                           variant: String): String = {
    val ord = if (keepFirst) "ASC" else "DESC"
    val (from, bs) = start match {
      case Some(s) =>
        ("events", s"((epoch_ms(ts) - $s) // $w) * $w + $s")
      case None =>
        ("events e CROSS JOIN (SELECT min(epoch_ms(ts)) AS m FROM events) s",
          s"((epoch_ms(ts) - s.m) // $w) * $w + s.m")
    }
    val head =
      if (replaceTs)
        s"""SELECT event_id, make_timestamp((batch_start_ms + $w) * 1000) AS ts,
           |  user_id, event_type, value, props, batch_start_ms""".stripMargin
      else s"SELECT $EVSQL, batch_start_ms"
    val inner =
      s"""SELECT ${if (start.isEmpty) "e." else ""}*, $bs AS batch_start_ms,
         |    row_number() OVER (PARTITION BY $bs, ${pk(keys)} ORDER BY event_id $ord) AS rn
         |  FROM $from""".stripMargin
    val expFilter =
      if (variant == "expired")
        s"""
           |  AND batch_start_ms < (SELECT max($bs) FROM $from)""".stripMargin
      else ""
    s"""$head FROM (
       |  $inner) WHERE rn = 1$expFilter""".stripMargin
  }

  private def lengthSql(keys: Seq[String], n: Int, variant: String): String = {
    val cur =
      s"""SELECT $EVSQL FROM (
         |  SELECT *, ${rnSql(keys, desc = true)} AS rn FROM events) WHERE rn = 1
         |  ORDER BY event_id DESC LIMIT $n""".stripMargin
    if (variant == "current") cur
    else
      s"""SELECT $EVSQL FROM events WHERE event_id NOT IN (
         |  SELECT event_id FROM ($cur))""".stripMargin
  }

  private def lengthBatchSql(keys: Seq[String], n: Int, latest: Boolean,
                             expiredOnly: Boolean): String = {
    val ord = if (latest) "DESC" else "ASC"
    val expFilter = if (expiredOnly) " AND bid < (SELECT max(bid) FROM bnd)" else ""
    s"""WITH RECURSIVE bnd(bid, s) AS (
       |  SELECT 0::BIGINT AS bid, t.nb AS s FROM (
       |    SELECT CASE WHEN count(*) = $n THEN max(fs) END AS nb FROM (
       |      SELECT min(event_id) AS fs FROM events GROUP BY ${pk(keys)} ORDER BY fs LIMIT $n)
       |  ) t WHERE t.nb IS NOT NULL
       |  UNION ALL
       |  SELECT bnd.bid + 1, t.nb FROM bnd, LATERAL (
       |    SELECT CASE WHEN count(*) = $n THEN max(fs) END AS nb FROM (
       |      SELECT min(event_id) AS fs FROM events WHERE event_id > bnd.s GROUP BY ${pk(keys)} ORDER BY fs LIMIT $n)
       |  ) t WHERE t.nb IS NOT NULL
       |),
       |iv AS (SELECT bid, coalesce(lag(s) OVER (ORDER BY bid), -1) AS lo, s AS hi FROM bnd),
       |t AS (SELECT e.*, iv.bid FROM events e JOIN iv ON e.event_id > iv.lo AND e.event_id <= iv.hi)
       |SELECT $EVSQL, bid AS batch_id FROM (
       |  SELECT *, row_number() OVER (PARTITION BY bid, ${pk(keys)} ORDER BY event_id $ord) AS rn
       |  FROM t) WHERE rn = 1$expFilter""".stripMargin
  }

  private def timeLengthBatchSql(keys: Seq[String], w: Long, n: Int): String = {
    val kpart = pk(keys)
    s"""WITH t AS (SELECT *, epoch_ms(ts) // $w AS b FROM events),
       |f AS (SELECT *, CASE WHEN event_id = min(event_id) OVER (PARTITION BY b, $kpart) THEN 1 ELSE 0 END AS isf FROM t),
       |r AS (SELECT *, coalesce(sum(isf) OVER (PARTITION BY b ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef FROM f)
       |SELECT $EVSQL, batch_start_ms FROM (
       |  SELECT *, b * $w AS batch_start_ms,
       |    row_number() OVER (PARTITION BY b, $kpart ORDER BY event_id DESC) AS rn
       |  FROM r WHERE bef < $n) WHERE rn = 1""".stripMargin
  }

  private def deduplicateSql(keys: Seq[String], w: Long): String = {
    val kp = pk(keys)
    val ke = keys.map(k => s"e.$k").mkString(", ")
    val joinCond = keys.map(k => s"e.$k = k.$k").mkString(" AND ")
    val evJoin = keys.map(k => s"ev.$k = kp.$k").mkString(" AND ")
    s"""WITH RECURSIVE e AS (SELECT $kp, epoch_ms(ts) AS ms FROM events),
       |kept AS (
       |  SELECT $kp, min(ms) AS ms FROM e GROUP BY $kp
       |  UNION ALL
       |  SELECT $ke, min(e.ms) AS ms FROM e JOIN kept k
       |    ON $joinCond AND e.ms > k.ms + $w GROUP BY $ke
       |)
       |SELECT $EVSQL FROM (
       |  SELECT ev.*, row_number() OVER (PARTITION BY ${keys.map(k => s"ev.$k").mkString(", ")}, epoch_ms(ev.ts) ORDER BY ev.event_id) AS rn
       |  FROM events ev JOIN kept kp ON $evJoin AND epoch_ms(ev.ts) = kp.ms
       |) WHERE rn = 1""".stripMargin
  }

  // ---- streaming-sweep oracle builders (the change-log shapes the fixed
  // replay rows use, parameterized by keys/window/n) ----

  private def everStreamSql(keys: Seq[String]): String =
    s"""SELECT $EVSQL, 'insert' AS change FROM events
       |UNION ALL
       |SELECT $EVSQL, 'expire' AS change FROM (
       |  SELECT *, ${rnSql(keys, desc = true)} AS rn FROM events) WHERE rn > 1""".stripMargin

  private def lengthStreamSql(keys: Seq[String], n: Int): String =
    s"""SELECT $EVSQL, 'insert' AS change FROM events
       |UNION ALL
       |SELECT $EVSQL, 'expire' AS change FROM events WHERE event_id NOT IN (
       |  SELECT event_id FROM (${lengthSql(keys, n, "current")}))""".stripMargin

  private def timeStreamSql(keys: Seq[String], w: Long): String =
    s"""SELECT $EVSQL, 'insert' AS change FROM events
       |UNION ALL
       |SELECT $EVSQL, 'expire' AS change FROM (
       |  SELECT *, ${rnSql(keys, desc = true)} AS rn FROM events) WHERE rn > 1
       |UNION ALL
       |SELECT $EVSQL, 'expire' AS change FROM (
       |  SELECT *, ${rnSql(keys, desc = true)} AS rn FROM events) WHERE rn = 1
       |  AND epoch_ms(ts) + $w < (SELECT max(epoch_ms(ts)) FROM events)""".stripMargin

  private def lengthBatchStreamSql(keys: Seq[String], n: Int, latest: Boolean): String =
    s"""SELECT *, 'insert' AS change FROM (${lengthBatchSql(keys, n, latest, expiredOnly = false)})
       |UNION ALL
       |SELECT *, 'expire' AS change FROM (${lengthBatchSql(keys, n, latest, expiredOnly = true)})""".stripMargin

  private def etbStreamSql(keys: Seq[String], w: Long): String =
    s"""SELECT $EVSQL, batch_start_ms + $w AS batch_end_ms FROM (
       |  SELECT e.*, ((epoch_ms(ts) - s.m) // $w) * $w + s.m AS batch_start_ms,
       |    (epoch_ms(ts) - s.m) // $w AS bid,
       |    row_number() OVER (PARTITION BY (epoch_ms(ts) - s.m) // $w, ${pk(keys)} ORDER BY event_id DESC) AS rn
       |  FROM events e CROSS JOIN (SELECT min(epoch_ms(ts)) AS m FROM events) s
       |) WHERE rn = 1 AND bid < (
       |  SELECT max((epoch_ms(ts) - s2.m) // $w)
       |  FROM events CROSS JOIN (SELECT min(epoch_ms(ts)) AS m FROM events) s2)""".stripMargin

  private def tlbStreamSql(keys: Seq[String], w: Long, n: Int): String = {
    val kpart = pk(keys)
    s"""WITH t AS (SELECT *, epoch_ms(ts) // $w AS b FROM events),
       |f AS (SELECT *, CASE WHEN event_id = min(event_id) OVER (PARTITION BY b, $kpart) THEN 1 ELSE 0 END AS isf FROM t),
       |r AS (SELECT *, coalesce(sum(isf) OVER (PARTITION BY b ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef FROM f),
       |k AS (SELECT * FROM r WHERE bef < $n),
       |fl AS (
       |  SELECT b FROM (SELECT DISTINCT b, $kpart FROM k) GROUP BY b HAVING count(*) = $n
       |  UNION
       |  SELECT DISTINCT b FROM k WHERE b < (SELECT max(b) FROM t))
       |SELECT $EVSQL, batch_start_ms FROM (
       |  SELECT *, b * $w AS batch_start_ms,
       |    row_number() OVER (PARTITION BY b, $kpart ORDER BY event_id DESC) AS rn
       |  FROM k WHERE b IN (SELECT b FROM fl)) WHERE rn = 1""".stripMargin
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val seed = if (args.length > 2) args(2).toLong else 42L
    val streamingMode = args.length > 4 && args(4) == "streaming"
    val nDraws = if (args.length > 3) args(3).toInt else (if (streamingMode) 16 else 55)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val rng = new scala.util.Random(seed)
    val ev = graft.Tables.events(spark, sfDir)
    val families = Seq("ever", "first", "time", "timebatch", "firsttimebatch",
      "externaltimebatch", "length", "lengthbatch", "firstlengthbatch",
      "timelengthbatch", "deduplicate")
    // streaming families: the same operators via their stateful
    // Structured Streaming forms, replayed chunk-by-chunk and compared
    // to change-log oracles generated from the same draw — randomized
    // boundary arithmetic through the PROCESSORS, not just the batch
    // reinterpretations
    val streamFamilies = Seq("ever_stream", "first_stream", "time_stream",
      "timebatch_stream", "lengthbatch_stream", "length_stream",
      "deduplicate_stream", "externaltimebatch_stream", "timelengthbatch_stream")
    def pick[A](xs: Seq[A]): A = xs(rng.nextInt(xs.length))
    def replayed(seqCol: String, mode: String)(
        build: DataFrame => DataFrame): DataFrame =
      graft.streaming.Replay.replay(spark, ev, seqCol, 2000, mode)(build)

    val oracles = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var ok = 0
    (0 until nDraws).foreach { i =>
      val fam = if (streamingMode) streamFamilies(i % streamFamilies.length)
                else families(i % families.length)
      val keys = pick(keyGrid)
      val w = pick(windowGrid)
      val n = pick(nGrid)
      // draw a result (engine DataFrame) and its param-matched oracle SQL
      val (df, sql, tag): (DataFrame, String, String) = fam match {
        case "ever" =>
          val v = pick(Seq("current", "expired", "all"))
          val r = UniqueOps.ever(ev, keys, "event_id")
          val d = v match {
            case "current" => r.current
            case "expired" => r.expired
            case "all" => r.all
          }
          (d, everSql(keys, v), v)
        case "first" =>
          (UniqueOps.first(ev, keys, "event_id").current, firstSql(keys), "current")
        case "time" =>
          val v = pick(Seq("current", "expired"))
          val r = UniqueOps.time(ev, keys, "event_id", "ts", w)
          (if (v == "current") r.current else r.expired, timeSql(keys, w, v), s"${v}_w$w")
        case "timebatch" =>
          val v = pick(Seq("current", "expired"))
          val s = pick(startGrid.filter(_.isDefined)) // reference timeBatch anchors the epoch grid
          val rts = rng.nextBoolean() && v == "current"
          val r = UniqueOps.timeBatch(ev, keys, "event_id", "ts", w, s,
            replaceTsWithBatchEnd = rts)
          (if (v == "current") r.current else r.expired,
            timeBatchSql(keys, w, s, keepFirst = false, replaceTs = rts, v),
            s"${v}_w${w}_s${s.get}${if (rts) "_rts" else ""}")
        case "firsttimebatch" =>
          val s = pick(startGrid.filter(_.isDefined))
          (UniqueOps.firstTimeBatch(ev, keys, "event_id", "ts", w, s).current,
            timeBatchSql(keys, w, s, keepFirst = true, replaceTs = false, "current"),
            s"current_w${w}_s${s.get}")
        case "externaltimebatch" =>
          val v = pick(Seq("current", "expired"))
          val s = pick(startGrid) // None = min(ts) anchor, the reference default
          val r = UniqueOps.externalTimeBatch(ev, keys, "event_id", "ts", w, s)
          (if (v == "current") r.current else r.expired,
            timeBatchSql(keys, w, s, keepFirst = false, replaceTs = false, v),
            s"${v}_w${w}_s${s.map(_.toString).getOrElse("min")}")
        case "length" =>
          val v = pick(Seq("current", "expired"))
          val r = UniqueOps.length(ev, keys, "event_id", n)
          (if (v == "current") r.current else r.expired, lengthSql(keys, n, v), s"${v}_n$n")
        case "lengthbatch" =>
          val v = pick(Seq("current", "expired"))
          val r = UniqueOps.lengthBatch(ev, keys, "event_id", n)
          (if (v == "current") r.current else r.expired,
            lengthBatchSql(keys, n, latest = true, expiredOnly = v == "expired"),
            s"${v}_n$n")
        case "firstlengthbatch" =>
          (UniqueOps.firstLengthBatch(ev, keys, "event_id", n).current,
            lengthBatchSql(keys, n, latest = false, expiredOnly = false), s"current_n$n")
        case "timelengthbatch" =>
          (UniqueOps.timeLengthBatch(ev, keys, "event_id", "ts", w, n).current,
            timeLengthBatchSql(keys, w, n), s"current_w${w}_n$n")
        case "deduplicate" =>
          val salted = rng.nextBoolean()
          val d = if (salted)
            UniqueOps.deduplicateSalted(ev, keys, "event_id", "ts", w).current
          else UniqueOps.deduplicate(ev, keys, "event_id", "ts", w).current
          (d, deduplicateSql(keys, w), s"${if (salted) "salted_" else ""}w$w")

        // ---- streaming families (replay harness, change-log oracles) ----
        case "ever_stream" =>
          (replayed("event_id", "update")(sdf =>
            graft.streaming.UniqueStreams.everStream(sdf, keys, Some("event_id"))),
            everStreamSql(keys), "replay")
        case "first_stream" =>
          (replayed("event_id", "update")(sdf =>
            graft.streaming.UniqueStreams.firstStream(sdf, keys, "event_id")),
            firstSql(keys), "replay")
        case "time_stream" =>
          (replayed("event_id", "update")(sdf =>
            graft.streaming.UniqueStreams.timeStream(sdf, keys, "ts", w,
              seqCol = Some("event_id"))),
            timeStreamSql(keys, w), s"replay_w$w")
        case "timebatch_stream" =>
          // ts-ordered feed keeps the watermark monotone; the start.time
          // grid anchor exercises the window() modulo against the batch
          // floor arithmetic
          val s = pick(startGrid.flatten)
          val kf = rng.nextBoolean()
          (replayed("ts", "append")(sdf =>
            graft.streaming.UniqueStreams.timeBatchStream(sdf, keys, "event_id",
              "ts", w, keepFirst = kf, startMs = s)),
            timeBatchSql(keys, w, Some(s), keepFirst = kf, replaceTs = false, "expired"),
            s"replay_w${w}_s$s${if (kf) "_first" else ""}")
        case "lengthbatch_stream" =>
          val nn = pick(Seq(7, 41)) // the recursive oracle at tiny n is the batch sweep's job
          val kf = rng.nextBoolean()
          (replayed("event_id", "update")(sdf =>
            graft.streaming.UniqueStreams.lengthBatchStream(sdf, keys, "event_id", nn,
              keepFirst = kf)),
            lengthBatchStreamSql(keys, nn, latest = !kf),
            s"replay_n$nn${if (kf) "_first" else ""}")
        case "length_stream" =>
          (replayed("event_id", "update")(sdf =>
            graft.streaming.UniqueStreams.lengthStream(sdf, keys, "event_id", n)),
            lengthStreamSql(keys, n), s"replay_n$n")
        case "deduplicate_stream" =>
          (replayed("event_id", "update")(sdf =>
            graft.streaming.UniqueStreams.deduplicateStreamExact(sdf, keys,
              "event_id", "ts", w)),
            deduplicateSql(keys, w), s"replay_w$w")
        case "externaltimebatch_stream" =>
          (replayed("event_id", "update")(sdf =>
            graft.streaming.UniqueStreams.externalTimeBatchStream(sdf, keys,
              "event_id", "ts", w, timeOutMs = 0L)).drop("flush_kind"),
            etbStreamSql(keys, w), s"replay_w$w")
        case "timelengthbatch_stream" =>
          (replayed("event_id", "update")(sdf =>
            graft.streaming.UniqueStreams.timeLengthBatchStream(sdf, keys,
              "event_id", "ts", w, n)).drop("change"),
            tlbStreamSql(keys, w, n), s"replay_w${w}_n$n")
      }
      val name = f"draw$i%03d_${fam}_${keys.mkString("-")}_$tag"
      try {
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        oracles(name) = sql
        ok += 1
        System.err.println(s"[sweep] $name written")
      } catch {
        case scala.util.control.NonFatal(e) =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
          System.err.println(s"[sweep] $name FAILED: ${e.getMessage}")
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      oracles.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    Files.writeString(Paths.get(s"$outDir/errors.json"),
      errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    println(s"""{"draws":$nDraws,"written":$ok,"errors":${errors.size},"seed":$seed}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
