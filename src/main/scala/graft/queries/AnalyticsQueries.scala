package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Sketches, TemporalJoins}

/** Gate queries for the analytics extensions beyond the reference's
  * operator surface: temporal joins (as-of, range), OLAP rollup,
  * ranking/offset window functions, and sketch aggregates. Each
  * oracle-backed query ends in a deterministic ORDER BY; sketch
  * queries are rows-only gates with tolerance tests in SketchesSpec.
  */
object AnalyticsQueries {
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** As-of join: each purchase event matched to the same user's most
    * recent click at or before the purchase time (ties on click time
    * broken by largest event_id). Left-outer: purchases with no prior
    * click keep null click columns. One key-partitioned shuffle — see
    * ops/TemporalJoins.asofJoin. */
  def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("id"), col("user_id").as("uid"),
        col("ts"), col("value").as("v"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_uid"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    TemporalJoins.asofJoin(purchases, clicks,
        leftKey = "uid", rightKey = "c_uid",
        leftTime = "ts", rightTime = "click_ts",
        rightTieBreak = "click_id", rightPayload = Seq("click_id", "click_ts"))
      .select(col("id"), col("uid"), col("click_id"), col("click_ts"))
      .orderBy(col("id"))
  }

  /** Range join: for each error event, the count and value-sum of
    * purchase events inside [error_ts, error_ts + 1h) — no equi-key,
    * binned to turn the interval overlap into an equi-join (see
    * ops/TemporalJoins.rangeJoinBinned). Inner: errors with no
    * purchase in-window are absent, matching the oracle. */
  def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("ts").as("err_ts"),
        (col("ts") + expr("INTERVAL 1 HOUR")).as("err_end"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("ts").as("p_ts"), col("value").as("p_value"))
    TemporalJoins.rangeJoinBinned(purchases, errors,
        pointTime = "p_ts", intervalStart = "err_ts", intervalEnd = "err_end",
        binWidth = 3600L)
      .groupBy(col("err_id"))
      .agg(count(lit(1)).as("n_purch"), round(sum(col("p_value")), 2).as("sum_value"))
      .orderBy(col("err_id"))
  }

  /** ROLLUP hierarchy aggregation (reference has no grouping sets —
    * SURVEY §2.4 A9): per (returnflag, linestatus), per returnflag
    * subtotal, and grand total in one pass (Spark expands to grouping
    * sets inside a single hash aggregate — no multi-scan union). */
  def qRollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag").as("f"), col("l_linestatus").as("st"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("f").asc_nulls_first, col("st").asc_nulls_first)

  /** Ranking + offset window functions over per-customer order
    * history: row_number and lag-based price delta (reference's window
    * surface is the count-buffer only — SURVEY §2.4 A7). One
    * key-partitioned window, deterministic (o_orderdate, o_orderkey)
    * ordering. */
  def qRankAnalytics(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("ck")).orderBy(col("o_orderdate"), col("ok"))
    t(s, dir, "orders")
      .select(col("o_custkey").as("ck"), col("o_orderkey").as("ok"),
        col("o_orderdate"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .select(col("ck"), col("ok"), col("rn"),
        round(col("o_totalprice") - col("prev_price"), 2).as("price_delta"))
      .orderBy(col("ck"), col("ok"))
  }

  /** Exact distributed heavy hitters: top-10 (brand, type) pairs by
    * frequency — map-side combine then a one-row-per-key shuffle and
    * global top-k (ops/Sketches.topKFrequent). */
  def qFreqTopk(s: SparkSession, dir: String): DataFrame =
    Sketches.topKFrequent(t(s, dir, "part"), Seq("p_brand", "p_type"), 10)

  /** HLL++ distinct users per event type (rows-only gate; accuracy
    * asserted against exact counts in SketchesSpec). */
  def qSketchDistinct(s: SparkSession, dir: String): DataFrame =
    Sketches.approxDistinct(t(s, dir, "events"), Seq("event_type"), "user_id")
      .orderBy(col("event_type"))

  /** Greenwald-Khanna p50/p95/p99 of event value per type (rows-only
    * gate; tolerance vs exact percentiles in SketchesSpec). */
  def qSketchQuantiles(s: SparkSession, dir: String): DataFrame =
    Sketches.approxQuantiles(t(s, dir, "events"), Seq("event_type"), "value",
        Seq(0.5, 0.95, 0.99))
      .select(col("event_type"), col("quantiles")(0).as("p50"),
        col("quantiles")(1).as("p95"), col("quantiles")(2).as("p99"))
      .orderBy(col("event_type"))
}
