package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators beyond the reference's equi/theta dispatch
  * (reference joins: sql/SQLJoinDispatcher.java:56-160 — equality or
  * nested-loop only; no temporal semantics anywhere in the grammar).
  * Both operators here exist because the naive spelling is a
  * nested-loop/cartesian plan that dies at scale; these are the
  * shuffle-bounded shapes a 1000-executor cluster wants.
  *
  * Scale properties (see SCALE.md "Temporal joins"):
  *  - asofJoin: ONE hash-partition shuffle of (left ∪ right) on the
  *    join key + an in-partition sort. No row replication, no
  *    broadcast, state = one struct per row. Skew is bounded per key
  *    (a hot key sorts its own rows only).
  *  - rangeJoinBinned: intervals are replicated once per overlapped
  *    bin (ceil(span/binWidth) copies — pick binWidth ≈ typical span
  *    so replication is O(1)), then a plain equi-join on the bin id
  *    that Catalyst/AQE plans like any other shuffle join. Each point
  *    lands in exactly one bin, so no post-join dedup is needed.
  */
object TemporalJoins {

  /** As-of join: for every left row, attach the payload of the single
    * right row with the greatest (rightTime, rightTieBreak) among rows
    * of the same key with rightTime <= leftTime — "the most recent
    * right row at or before the left row's time". Left-outer: left
    * rows with no prior right row keep null payload columns.
    *
    * Spark-first shape: tag both sides, union, and run one
    * last(ignoreNulls) window partitioned by key, ordered by
    * (time, side, tieBreak) with right rows sorting before left rows
    * at equal time (inclusive match). This is a single Exchange on the
    * key + one sort — the same cost as a sort-merge join, with no
    * interval blow-up and no driver state.
    *
    * @param rightPayload right columns carried to the output (names
    *        must not collide with left's)
    * @param rightTieBreak column ordering rights within an equal
    *        timestamp (largest wins) — makes the match deterministic
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightTieBreak: String,
      rightPayload: Seq[String]): DataFrame = {
    require(rightPayload.nonEmpty, "asofJoin: rightPayload must name at least one column")
    val collisions = rightPayload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"asofJoin: payload collides with left columns: $collisions")

    val leftStruct  = struct(left.columns.map(col).toIndexedSeq: _*)
    val rightStruct = struct(rightPayload.map(col).toIndexedSeq: _*)
    val lSide = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"),
      lit(1).as("__side"),
      lit(null).cast(right.select(col(rightTieBreak)).schema.head.dataType).as("__tb"),
      leftStruct.as("__l"),
      lit(null).cast(right.select(rightStruct).schema.head.dataType).as("__r"))
    // SQL equi-join semantics: NULL keys never match. Window.partitionBy
    // groups NULLs together, so without this filter a NULL-key left row
    // would pick up the payload of a NULL-key right row. Dropping
    // NULL-key right rows keeps NULL-key left rows (left-outer) with a
    // null payload, matching what `ON l.k = r.k` would produce.
    val rSide = right.filter(col(rightKey).isNotNull).select(
      col(rightKey).as("__k"), col(rightTime).as("__t"),
      lit(0).as("__side"), col(rightTieBreak).as("__tb"),
      lit(null).cast(left.select(leftStruct).schema.head.dataType).as("__l"),
      rightStruct.as("__r"))

    // Right rows (side 0) sort before left rows (side 1) at equal
    // time, so a right row exactly at leftTime is matched (inclusive).
    // Among equal-time right rows the largest tieBreak sorts last and
    // last() picks it. Left rows carry null __tb; their relative order
    // at equal (t, side) doesn't affect the ignoreNulls carry-forward.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lSide.unionByName(rSide)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*") +: rightPayload.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** FORWARD as-of join: for every left row, the EARLIEST right row of
    * the same key with rightTime >= leftTime (ties on rightTime broken
    * by smallest tieBreak), optionally bounded by `horizonSec` —
    * "the next right event at or after, within the horizon". The
    * followed-by half of event-pattern matching: left = trigger,
    * right = response, horizon = the pattern window. Same plan shape
    * as [[asofJoin]] mirrored: one key exchange, one sort, a
    * first(ignoreNulls) forward-frame window; the horizon is a post
    * null-out (a match beyond it reverts to left-outer null). */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightTieBreak: String,
      rightPayload: Seq[String],
      horizonSec: Long = -1L): DataFrame = {
    require(rightPayload.nonEmpty, "asofJoinForward: rightPayload must name at least one column")
    val collisions = rightPayload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"asofJoinForward: payload collides with left columns: $collisions")

    val leftStruct  = struct(left.columns.map(col).toIndexedSeq: _*)
    // carry rightTime inside the match struct so the horizon check can
    // read it after the window picks the match
    val rightStruct = struct(col(rightTime).as("__rt") +:
      rightPayload.map(col).toIndexedSeq: _*)
    val lSide = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"),
      lit(0).as("__side"),
      lit(null).cast(right.select(col(rightTieBreak)).schema.head.dataType).as("__tb"),
      leftStruct.as("__l"),
      lit(null).cast(right.select(rightStruct).schema.head.dataType).as("__r"))
    val rSide = right.filter(col(rightKey).isNotNull).select(
      col(rightKey).as("__k"), col(rightTime).as("__t"),
      lit(1).as("__side"), col(rightTieBreak).as("__tb"),
      lit(null).cast(left.select(leftStruct).schema.head.dataType).as("__l"),
      rightStruct.as("__r"))

    // left rows (side 0) sort BEFORE right rows at equal time, so a
    // right row exactly at leftTime is inside the forward frame
    // (inclusive); among equal-time rights the smallest tieBreak sorts
    // first and first() picks it
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val matched = lSide.unionByName(rSide)
      .withColumn("__m", first(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
    val inHorizon =
      if (horizonSec < 0) col("__m")
      else when(col("__m").isNotNull &&
        col("__m.__rt") <= col("__t") + expr(s"INTERVAL $horizonSec SECONDS"),
        col("__m"))
    matched.withColumn("__h", inHorizon)
      .select(col("__l.*") +: rightPayload.map(c => col(s"__h.$c").as(c)): _*)
  }

  /** Range (interval-overlap) join: pair every point row with every
    * interval row whose half-open window [start, end) contains the
    * point. No equi-key required — the classic case Spark would plan
    * as a broadcast-nested-loop or cartesian product.
    *
    * Scale path: quantize time into binWidth buckets. Each interval is
    * replicated to the bins it overlaps (sequence + explode — interval
    * spans should be O(binWidth) so replication is a small constant);
    * each point maps to exactly one bin. The bin id becomes an
    * equi-join key, so the pairing is a normal shuffle join with
    * predicate `start <= point < end` verifying exact containment.
    * Output = points.* ++ intervals.* (caller projects/aggregates;
    * column names must be disjoint).
    *
    * @param binWidth bucket width as a SECONDS count (timestamps are
    *        quantized on microseconds internally)
    */
  def rangeJoinBinned(
      points: DataFrame,
      intervals: DataFrame,
      pointTime: String,
      intervalStart: String,
      intervalEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "rangeJoinBinned: binWidth must be positive seconds")
    val collisions = points.columns.toSet.intersect(intervals.columns.toSet)
    require(collisions.isEmpty, s"rangeJoinBinned: overlapping column names: $collisions")
    val binMicros = binWidth * 1000000L
    def binOf(c: Column): Column = floor(unix_micros(c) / binMicros)

    // Half-open [start, end): the last covered bin is the one holding
    // end - 1µs. Empty/inverted intervals produce no bins (guarded —
    // sequence() would otherwise generate a *descending* range and
    // explode the interval onto bins it never touches).
    val ivals = intervals
      .filter(col(intervalStart) < col(intervalEnd))
      .withColumn("__bin",
        explode(sequence(binOf(col(intervalStart)),
          binOf(col(intervalEnd) - expr("INTERVAL 1 MICROSECOND")))))
    val pts = points.withColumn("__bin", binOf(col(pointTime)))

    pts.join(ivals,
        pts("__bin") === ivals("__bin") &&
          col(pointTime) >= col(intervalStart) &&
          col(pointTime) < col(intervalEnd))
      .drop("__bin")
  }
}
