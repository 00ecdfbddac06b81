package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over event streams — the standard
  * user-activity shape (a session = a maximal run of a key's events
  * with no inter-event silence >= gap).
  *
  * Batch and streaming both lower to Spark's NATIVE session window
  * operator (`functions.session_window`): Catalyst plans the merge as
  * a sort-within-partition + linear scan per key (no self-join), and
  * in streaming the state store holds open sessions only — the
  * watermark finalizes and EVICTS a session once it can no longer be
  * extended, so state is O(open sessions), independent of history
  * length. Boundary semantics (verified empirically in SessionsSpec —
  * the docs' half-open "[start, last + gap)" reads stricter than the
  * operator behaves): an event at EXACTLY last_ts + gap still MERGES;
  * only a silence STRICTLY GREATER than the gap starts a new session.
  * `assignSessions` and the DuckDB oracles mirror that `> gap` rule.
  */
object Sessions {

  /** Per-session aggregation (batch): one row per (key, session).
    * Emits `session_window.start/.end` plus the caller's aggregates;
    * distributes by key — one hash exchange, then per-key linear
    * merge. */
  def sessionAgg(df: DataFrame, keyCol: String, tsCol: String, gap: String,
                 aggs: Seq[Column]): DataFrame =
    df.groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(aggs.head, aggs.tail: _*)

  /** Per-session aggregation over a stream: watermark-bounded state,
    * Append mode — a session row is emitted exactly once, when the
    * watermark passes its end (last event + gap). */
  def sessionAggStream(stream: DataFrame, keyCol: String, tsCol: String,
                       gap: String, watermarkDelay: String,
                       aggs: Seq[Column]): DataFrame =
    stream.withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(aggs.head, aggs.tail: _*)

  /** Per-ROW session labels (batch): adds `session_idx` (0-based per
    * key, in time order) — for pipelines that need the session id ON
    * each event (feature extraction, sequence building) rather than a
    * per-session rollup. One hash exchange on the key; the island
    * scan is a per-partition window function, no self-join. */
  def assignSessions(df: DataFrame, keyCol: String, tsCol: String,
                     gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(prev.isNull
      .or(unix_micros(col(tsCol)) - unix_micros(prev) > gapSeconds * 1000000L),
      lit(1L)).otherwise(lit(0L))
    df.withColumn("session_idx",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1L)
  }
}
