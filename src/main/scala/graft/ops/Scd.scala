package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) maintenance — the warehouse
  * upsert that keeps full value history instead of overwriting:
  * every change to a tracked attribute closes the old version row
  * (`valid_to` stamped) and opens a new current one.
  *
  * Scale shape: `merge` is ONE full-outer key join between the
  * current-version slice and the update batch (broadcast the batch
  * when it is small — pass `broadcastUpdates = true`); version
  * emission is a map-side array-explode over the joined row, so no
  * second pass and no driver loop. Closed history rows never enter
  * the join — they pass through untouched, which at 100 TB means the
  * join cost tracks the ENTITY count, not the accumulated history.
  * Change detection is null-safe column comparison (`<=>`), so a
  * no-op re-send of the same snapshot creates zero new versions —
  * idempotent re-ingestion for free.
  */
object Scd {

  /** SCD2 columns every dimension frame carries: `valid_from`,
    * `valid_to` (null = open), `is_current`. */
  val MetaCols: Seq[String] = Seq("valid_from", "valid_to", "is_current")

  /** Turn a plain snapshot into an initial SCD2 dimension (all rows
    * current from `from`). */
  def init(snapshot: DataFrame, from: Column): DataFrame =
    snapshot.withColumn("valid_from", from.cast("string"))
      .withColumn("valid_to", lit(null).cast("string"))
      .withColumn("is_current", lit(true))

  /** Merge an update batch into an SCD2 dimension.
    *
    * `dim`: key + tracked + MetaCols. `updates`: key + tracked.
    * Rows already closed pass through. A current row whose update
    * differs on ANY tracked column (null-safe) is closed at
    * `effectiveFrom` and re-opened from the update's values; an
    * identical update is a no-op; an unmatched update key inserts a
    * new current row. */
  def merge(dim: DataFrame, updates: DataFrame, key: String,
            tracked: Seq[String], effectiveFrom: Column,
            broadcastUpdates: Boolean = false): DataFrame = {
    require(tracked.nonEmpty, "merge: at least one tracked column")
    val outCols = (key +: tracked) ++ MetaCols
    val cur = dim.filter(col("is_current"))
    val hist = dim.filter(!col("is_current")).select(outCols.map(col): _*)
    val upd0 = updates.select((key +: tracked).map(col): _*)
      .toDF(s"u_$key" +: tracked.map("u_" + _): _*)
    val upd = if (broadcastUpdates) broadcast(upd0) else upd0
    val j = cur.join(upd, col(key) === col(s"u_$key"), "full_outer")

    val hasCur = col(key).isNotNull
    val hasUpd = col(s"u_$key").isNotNull
    val changed = tracked.map(c => !(col(c) <=> col(s"u_$c"))).reduce(_ || _)
    val eff = effectiveFrom.cast("string")

    def ver(k: Column, vals: Seq[Column], from: Column, to: Column,
            current: Column): Column =
      struct((k.as(key) +: tracked.zip(vals).map { case (n, c) => c.as(n) }) ++
        Seq(from.as("valid_from"), to.as("valid_to"),
          current.as("is_current")): _*)

    val curVals = tracked.map(col)
    val updVals = tracked.map(c => col(s"u_$c"))
    val asIs = ver(col(key), curVals, col("valid_from"), col("valid_to"),
      col("is_current"))
    val closed = ver(col(key), curVals, col("valid_from"), eff, lit(false))
    val opened = ver(col(s"u_$key"), updVals, eff,
      lit(null).cast("string"), lit(true))

    val versions = when(hasCur && hasUpd && changed, array(closed, opened))
      .when(hasCur, array(asIs)) // unchanged update or no update
      .otherwise(array(opened))  // brand-new key
    j.select(explode(versions).as("v")).select(col("v.*"))
      .union(hist)
  }

  /** Replay a changelog (one row per observed state) into the full
    * SCD2 history: per key, `valid_from` = the row's timestamp,
    * `valid_to` = the NEXT row's (lead), open tail = current. One
    * key-partitioned sort window. `tieBreak` makes equal-timestamp
    * ordering deterministic. */
  def fromChangelog(log: DataFrame, key: String, ts: String,
                    tieBreak: String, tracked: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col(ts), col(tieBreak))
    log.select((key +: tracked :+ ts :+ tieBreak).distinct.map(col): _*)
      .withColumn("valid_from", col(ts).cast("string"))
      .withColumn("valid_to", lead(col(ts), 1).over(w).cast("string"))
      .withColumn("is_current", col("valid_to").isNull)
      .select(((key +: tracked) ++ MetaCols).map(col): _*)
  }
}
