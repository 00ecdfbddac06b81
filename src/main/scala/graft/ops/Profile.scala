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
}
