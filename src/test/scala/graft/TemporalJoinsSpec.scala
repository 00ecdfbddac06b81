package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Sketches, TemporalJoins}
import graft.core.Tables

class TemporalJoinsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoin picks latest right row at or before left time, ties by tieBreak") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:00")),
      (2L, "A", ts("2024-01-01 10:05:00")),
      (3L, "A", ts("2024-01-01 09:00:00")), // before any quote -> null
      (4L, "B", ts("2024-01-01 10:00:00"))) // key with no quotes -> null
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(
      (10L, "A", ts("2024-01-01 09:30:00"), 100.0),
      (11L, "A", ts("2024-01-01 10:00:00"), 101.0), // exactly at trade 1 -> inclusive match
      (12L, "A", ts("2024-01-01 10:00:00"), 102.0), // same ts, larger id wins the tie
      (13L, "A", ts("2024-01-01 10:06:00"), 103.0)) // after both trades -> never matched
      .toDF("quote_id", "q_sym", "q_t", "px")
    val got = TemporalJoins.asofJoin(trades, quotes,
        "sym", "q_sym", "t", "q_t", "quote_id", Seq("quote_id", "px"))
      .select("trade_id", "quote_id", "px")
      .collect().map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(got(1L) == (Some(12L), Some(102.0)), "inclusive match, tie to larger quote_id")
    assert(got(2L) == (Some(12L), Some(102.0)), "carry-forward past the tie pair")
    assert(got(3L) == (None, None), "no quote at or before")
    assert(got(4L) == (None, None), "key with no right rows")
  }

  test("asofJoin matches a naive per-row computation on fixture events") {
    val ev = Tables.load(spark, sf, "events")
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("id"), $"user_id".as("uid"), $"ts")
    val c = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_uid"), $"ts".as("c_ts"), $"event_id".as("c_id"))
    val got = TemporalJoins.asofJoin(p, c, "uid", "c_uid", "ts", "c_ts", "c_id", Seq("c_id"))
      .select("id", "c_id").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap

    val clicks = c.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    val naive = p.collect().map { r =>
      val (id, uid, t) = (r.getLong(0), r.getLong(1), r.getTimestamp(2))
      val cand = clicks.filter(q => q._1 == uid && !q._2.after(t))
      id -> (if (cand.isEmpty) None
             else Some(cand.maxBy(q => (q._2.getTime, q._3))._3))
    }.toMap
    assert(got == naive)
  }

  test("asofJoin NULL keys never match (SQL equi-join semantics)") {
    val trades = Seq(
      (1L, Option("A"), ts("2024-01-01 10:00:00")),
      (2L, Option.empty[String], ts("2024-01-01 10:00:00"))) // NULL key
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(
      (10L, Option("A"), ts("2024-01-01 09:30:00"), 100.0),
      (11L, Option.empty[String], ts("2024-01-01 09:30:00"), 999.0)) // NULL key
      .toDF("quote_id", "q_sym", "q_t", "px")
    val got = TemporalJoins.asofJoin(trades, quotes,
        "sym", "q_sym", "t", "q_t", "quote_id", Seq("quote_id", "px"))
      .select("trade_id", "quote_id")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L) == Some(10L), "normal key still matches")
    assert(got(2L) == None, "NULL-key left row must not match a NULL-key right row")
  }

  test("rangeJoinBinned equals naive theta join across bin widths") {
    val ev = Tables.load(spark, sf, "events")
    val er = ev.filter($"event_type" === "error")
      .select($"event_id".as("err_id"), $"ts".as("err_ts"),
        ($"ts" + expr("INTERVAL 1 HOUR")).as("err_end"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"ts".as("p_ts"))
    val naive = p.join(er, $"p_ts" >= $"err_ts" && $"p_ts" < $"err_end")
      .select("err_id", "p_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty, "fixture should produce overlap pairs")
    // bin smaller than, equal to, and larger than the interval span
    for (bin <- Seq(600L, 3600L, 7200L)) {
      val got = TemporalJoins.rangeJoinBinned(p, er, "p_ts", "err_ts", "err_end", bin)
        .select("err_id", "p_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive, s"binWidth=$bin")
    }
  }

  test("rangeJoinBinned drops empty and inverted intervals") {
    val pts = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("p_id", "p_t")
    val ivs = Seq(
      (10L, ts("2024-01-01 09:00:00"), ts("2024-01-01 09:00:00")),  // empty
      (11L, ts("2024-01-01 11:00:00"), ts("2024-01-01 09:00:00")),  // inverted
      (12L, ts("2024-01-01 09:59:00"), ts("2024-01-01 10:00:01")))  // real match
      .toDF("iv_id", "t0", "t1")
    val got = TemporalJoins.rangeJoinBinned(pts, ivs, "p_t", "t0", "t1", 60L)
      .select("iv_id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(12L))
  }

  test("asofJoin plan shuffles once on the key") {
    val ev = Tables.load(spark, sf, "events")
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("id"), $"user_id".as("uid"), $"ts")
    val c = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_uid"), $"ts".as("c_ts"), $"event_id".as("c_id"))
    val plan = TemporalJoins.asofJoin(p, c, "uid", "c_uid", "ts", "c_ts", "c_id", Seq("c_id"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly one key shuffle, plan:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "asof must not fall back to a product join")
  }
  test("forward as-of: earliest at-or-after match, horizon null-out, key isolation") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val left = Seq(
      (1L, 1, "2024-01-01 10:00:00"),  // match exactly at same ts (inclusive)
      (2L, 1, "2024-01-01 11:30:00"),  // next right 11:45 in horizon
      (3L, 1, "2024-01-01 13:30:00"),  // next right 15:00 beyond 1h → null
      (4L, 2, "2024-01-01 10:00:00"),  // other key: isolated
      (5L, 3, "2024-01-01 10:00:00"))  // key with no rights at all
      .toDF("id", "k", "ts_s").withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val right = Seq(
      (101L, 1, "2024-01-01 10:00:00"),
      (100L, 1, "2024-01-01 10:00:00"),  // same ts: smallest id wins
      (102L, 1, "2024-01-01 11:45:00"),
      (103L, 1, "2024-01-01 15:00:00"),
      (201L, 2, "2024-01-01 10:30:00"))
      .toDF("rid", "rk", "rts_s").withColumn("rts", col("rts_s").cast("timestamp")).drop("rts_s")
    val got = graft.ops.TemporalJoins.asofJoinForward(left, right,
        "k", "rk", "ts", "rts", rightTieBreak = "rid",
        rightPayload = Seq("rid"), horizonSec = 3600L)
      .select("id", "rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map(1L -> 100L, 2L -> 102L, 3L -> -1L, 4L -> 201L, 5L -> -1L), s"$got")
  }

}

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("approxDistinct within 5% of exact per group") {
    val ev = Tables.load(spark, sf, "events")
    val exact = ev.groupBy("event_type").agg(countDistinct($"user_id").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Sketches.approxDistinct(ev, Seq("event_type"), "user_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, d) =>
      val a = approx(k)
      assert(math.abs(a - d).toDouble / d <= 0.05, s"$k: approx $a vs exact $d")
    }
  }

  test("approxQuantiles track exact percentiles") {
    val ev = Tables.load(spark, sf, "events")
    val got = Sketches.approxQuantiles(ev, Seq("event_type"), "value", Seq(0.5, 0.99))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val vals = ev.select("event_type", "value").collect()
      .groupBy(_.getString(0)).map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
    vals.foreach { case (k, sorted) =>
      val Seq(p50, p99) = got(k)
      // GK with accuracy 10000 on a few hundred rows is exact up to
      // rank ±1; allow one rank of slack on each side
      def rankOk(v: Double, p: Double) = {
        val r = sorted.count(_ <= v).toDouble / sorted.length
        math.abs(r - p) <= 0.02 || (v >= sorted.dropRight(1).lastOption.getOrElse(v))
      }
      assert(rankOk(p50, 0.5), s"$k p50=$p50")
      assert(rankOk(p99, 0.99), s"$k p99=$p99")
    }
  }

  test("spaceSavingTopK finds the exact top-k on skewed data") {
    // zipf-ish: key i appears ~ 2000/i times; 40 distinct keys,
    // capacity 16 << 40 forces evictions, top-5 must still be exact
    val rows = (1 to 40).flatMap(i => Seq.fill(2000 / i)(s"key_$i"))
    val df = spark.sparkContext.parallelize(rows, 8).toDF("k")
    val exact = Sketches.topKFrequent(df, Seq("k"), 5)
      .collect().map(_.getString(0)).toSeq
    val approx = Sketches.spaceSavingTopK(df, Seq("k"), 5, capacity = 16)
      .collect().map(_.getString(0)).toSeq
    assert(approx == exact, s"approx $approx vs exact $exact")
  }

  test("spaceSavingTopK shuffle is capped at capacity rows per partition") {
    val rows = (1 to 5000).map(i => s"key_$i") // all-distinct worst case
    val df = spark.sparkContext.parallelize(rows, 4).toDF("k")
    // with capacity 64 the candidate set is <= 4*64 rows regardless of
    // the 5000 distinct keys; the call must simply not blow up and
    // return k rows
    val got = Sketches.spaceSavingTopK(df, Seq("k"), 10, capacity = 64).collect()
    assert(got.length == 10)
  }

  test("count-min sketch never underestimates; width tightens the excess") {
    // 2000 rows over 400 keys, zipf-ish, width 32 forces collisions
    val rows = (1 to 400).flatMap(i => Seq.fill(1 + 2000 / (i * 5))(s"k_$i"))
    val df = spark.sparkContext.parallelize(rows, 8).toDF("k")
    val exact = df.groupBy("k").agg(count(lit(1)).as("exact_n"))
    def excess(width: Int): (Long, Double) = {
      val sk = Sketches.countMinSketch(df, "k", depth = 4, width = width)
      val est = Sketches.cmsEstimate(sk, df.select("k").distinct(), "k",
        depth = 4, width = width)
      val j = est.join(exact, Seq("k"))
      val under = j.filter(col("est") < col("exact_n")).count()
      val maxOver = j.agg(max(col("est") - col("exact_n"))).head().getLong(0)
      (under, maxOver.toDouble)
    }
    val (u32, o32) = excess(32)
    val (u512, o512) = excess(512)
    assert(u32 == 0L && u512 == 0L, "CMS underestimated")
    assert(o512 <= o32, s"wider sketch must not overestimate more ($o512 > $o32)")
    assert(o512 <= 4.0 * rows.length / 512 + 1,
      s"width-512 excess $o512 beyond 4N/width")
  }

  test("count-min sketch gate bound holds at sf0.1") {
    // the q_sketch_cms require runs at sf0.1/sf2 in the bench — prove
    // the 4N/width margin is not a small-SF accident
    val got = graft.queries.AnalyticsQueries.qSketchCms(spark, "/root/testdata/sf0.1")
    assert(got.count() >= 150) // sf0.1: 1500 distinct users; requires inside held
  }
}
