package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Single-pass column profiling — the "what is in this table"
  * pre-flight every large-scale ingest runs before committing compute:
  * per-column null counts, cardinality, ranges, and numeric moments,
  * all from ONE scan of the table.
  *
  * Scale shape: the exact variant uses `count(DISTINCT col)` per
  * column, which Catalyst lowers to a single scan + one Expand (one
  * duplicated stream per distinct aggregate) + two-phase aggregation —
  * exact but the shuffled volume is #distinct-cols × rows. The approx
  * variant swaps in `approx_count_distinct` (HyperLogLog++), which
  * needs NO Expand: one scan, partial sketches per partition, constant
  * merge traffic — the 100 TB default. Both produce one tiny row per
  * column; the unpivot to rows happens on a 1-row frame.
  */
object Profile {

  /** Profile `cols` of `df` in one aggregation pass. Output: one row
    * per column — (col_name, n_nonnull, n_null, n_distinct, min_num,
    * max_num, avg_num, min_str, max_str). Numeric stats are null for
    * non-numeric columns and vice versa; avg is rounded to 4 decimals
    * so the value is engine-stable. `approxDistinct` trades exact
    * cardinality for the Expand-free HLL plan (±~2.3% default rsd). */
  def profile(df: DataFrame, cols: Seq[String],
              approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile: at least one column")
    val total = count(lit(1))
    def distinctOf(c: Column): Column =
      if (approxDistinct) approx_count_distinct(c) else count_distinct(c)
    val aggs: Seq[Column] = total.as("__total") +: cols.flatMap { name =>
      val c = col(name)
      val numeric = df.schema(name).dataType.isInstanceOf[NumericType]
      Seq(
        count(c).as(s"__n_$name"),
        distinctOf(c).as(s"__d_$name"),
        (if (numeric) min(c).cast("double") else lit(null).cast("double"))
          .as(s"__minn_$name"),
        (if (numeric) max(c).cast("double") else lit(null).cast("double"))
          .as(s"__maxn_$name"),
        (if (numeric) round(avg(c), 4) else lit(null).cast("double"))
          .as(s"__avg_$name"),
        (if (numeric) lit(null).cast("string") else min(c).cast("string"))
          .as(s"__mins_$name"),
        (if (numeric) lit(null).cast("string") else max(c).cast("string"))
          .as(s"__maxs_$name"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // Unpivot the 1-row aggregate into a row per column (driver-free:
    // still a plan, just over a single-row frame).
    val rows = cols.map { name =>
      struct(lit(name).as("col_name"),
        col(s"__n_$name").as("n_nonnull"),
        (col("__total") - col(s"__n_$name")).as("n_null"),
        col(s"__d_$name").as("n_distinct"),
        col(s"__minn_$name").as("min_num"),
        col(s"__maxn_$name").as("max_num"),
        col(s"__avg_$name").as("avg_num"),
        col(s"__mins_$name").as("min_str"),
        col(s"__maxs_$name").as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** Version-to-version profile drift — the monitoring signal a
    * warehouse alerts on (null-rate spike after an upstream change,
    * cardinality collapse from a bad join, mean shift from a unit
    * change). Both snapshots profile in one scan each; the comparison
    * joins two #cols-row frames — the whole diff is metadata-scale
    * regardless of table size, and with TableStore versions the
    * "before" scan reads the old snapshot's files directly (no saved
    * report needed). avg deltas subtract the already-rounded per-side
    * averages, so the report is engine-stable. */
  def drift(before: DataFrame, after: DataFrame, cols: Seq[String],
            approxDistinct: Boolean = false): DataFrame = {
    def side(df: DataFrame, tag: String) =
      profile(df, cols, approxDistinct).select(col("col_name"),
        col("n_nonnull").as(s"nonnull_$tag"),
        col("n_null").as(s"null_$tag"),
        col("n_distinct").as(s"distinct_$tag"),
        col("avg_num").as(s"avg_$tag"))
    side(before, "b").join(side(after, "a"), Seq("col_name"))
      .select(col("col_name"),
        col("nonnull_b"), col("nonnull_a"),
        (col("nonnull_a") - col("nonnull_b")).as("nonnull_delta"),
        col("null_b"), col("null_a"),
        (col("null_a") - col("null_b")).as("null_delta"),
        col("distinct_b"), col("distinct_a"),
        (col("distinct_a") - col("distinct_b")).as("distinct_delta"),
        col("avg_b"), col("avg_a"),
        round(col("avg_a") - col("avg_b"), 4).as("avg_delta"))
  }

  /** Declarative data-quality expectations — the commit gate a
    * production ingest runs before publishing a batch (the shape of
    * Deequ/dbt-test constraint suites): each check is a row-level
    * predicate that must hold; a NULL predicate result counts as a
    * violation (a null price fails `price > 0` — three-valued logic
    * must not let nulls slip a constraint).
    *
    * ONE scan regardless of check count: every check compiles to a
    * conditional-sum aggregate in the same aggregation (map-side
    * partial combine, one 1-row result), and the report unpivots from
    * that single row. An optional `uniqueKey` adds an exact
    * count-distinct (Expand-based, same single scan) checked against
    * the row count. Output: (check_name, n_violations, pass ∈ {0,1}). */
  def expectations(df: DataFrame, checks: Seq[(String, Column)],
                   uniqueKey: Option[String] = None): DataFrame = {
    require(checks.nonEmpty || uniqueKey.nonEmpty, "expectations: nothing to check")
    val aggs: Seq[Column] =
      count(lit(1)).as("__total") +:
      (checks.map { case (name, pred) =>
        sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)).as(s"__v_$name")
      } ++ uniqueKey.map(k => count_distinct(col(k)).as("__uniq")).toSeq)
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = checks.map { case (name, _) =>
      struct(lit(name).as("check_name"), col(s"__v_$name").as("n_violations"))
    } ++ uniqueKey.map(k =>
      struct(lit(s"unique_$k").as("check_name"),
        (col("__total") - col("__uniq")).as("n_violations"))).toSeq
    one.select(explode(array(rows: _*)).as("e"))
      .select(col("e.check_name"), col("e.n_violations"),
        when(col("e.n_violations") === 0, 1).otherwise(0).as("pass"))
  }
}
