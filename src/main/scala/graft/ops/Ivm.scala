package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental view maintenance for keyed count/sum aggregates: keep a
  * materialized `GROUP BY` result current from row-level DELTAS
  * (added, removed) instead of recomputing over the table — the only
  * viable shape at 100 TB, where a dashboard aggregate over a table
  * taking daily 0.1% updates must cost O(delta), not O(table).
  *
  * Count and sum are self-decomposable (Δview = view ⊎ agg(added) ⊖
  * agg(removed)); avg derives as sum/count downstream. MIN/MAX are NOT
  * maintainable from deltas alone (a removed minimum forces a rescan)
  * and are deliberately absent.
  *
  * Scale shape: maintenance is one union of three pre-aggregated
  * frames followed by one keyed aggregation — the deltas two-phase
  * aggregate down to group granularity map-side before the shuffle, so
  * the shuffle carries O(|touched groups|), and the old view rides
  * through partition-aligned (same hash key). Groups whose live row
  * count reaches zero are dropped, so the view never accumulates
  * tombstones. Pairs with `TableStore.diff`, which reads only CHANGED
  * files between two versions: view maintenance cost tracks the
  * commit's footprint end-to-end.
  */
object Ivm {
  private def stateCols(sums: Seq[String]): Seq[Column] =
    col("view_n") +: sums.map(c => col(s"view_sum_$c"))

  /** Materialize the initial view state: keys → (view_n, view_sum_<c>…). */
  def init(rows: DataFrame, keys: Seq[String], sums: Seq[String]): DataFrame =
    rows.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("view_n"),
        sums.map(c => sum(col(c)).as(s"view_sum_$c")): _*)

  /** Advance `view` by one commit's row-level delta. `added`/`removed`
    * are row frames (the two sides of `TableStore.diff`); either may be
    * empty. Result has `init`'s schema. */
  def maintain(view: DataFrame, added: DataFrame, removed: DataFrame,
               keys: Seq[String], sums: Seq[String]): DataFrame = {
    def deltaAgg(rows: DataFrame, sign: Int): DataFrame =
      rows.groupBy(keys.map(col): _*)
        .agg((count(lit(1)) * sign).as("view_n"),
          sums.map(c => (coalesce(sum(col(c)), lit(0.0)) * sign).as(s"view_sum_$c")): _*)
    view.select((keys.map(col) ++ stateCols(sums)): _*)
      .unionByName(deltaAgg(added, 1))
      .unionByName(deltaAgg(removed, -1))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("view_n")).as("view_n"),
        sums.map(c => sum(col(s"view_sum_$c")).as(s"view_sum_$c")): _*)
      .filter(col("view_n") > 0)
  }
}
