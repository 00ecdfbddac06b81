package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators: multi-dimensional clustering for
  * data-skipping. Parquet/table-format file pruning works off per-file
  * min/max column stats; a plain sort makes ONE column's ranges tight
  * and leaves every other column's span global. Z-ordering interleaves
  * the bits of two columns' rank codes so files are tight in BOTH
  * dimensions (~√(1/files) of the global span each) — predicates on
  * either column prune files. At 100 TB this is the difference between
  * scanning a table and scanning a predicate's neighborhood for
  * two-dimensional workloads (user × time, key × value, lat × lon).
  */
object Layout {

  /** Bit-interleave two 16-bit codes into one 32-bit z-value (a's bits
    * land on even positions). Unrolled native bit ops — codegen'd. */
  def interleave16(a: Column, b: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Equi-width 16-bit rank code for `c` over [lo, hi] (degenerate
    * range → 0; out-of-range values clamp). */
  private def code(c: Column, lo: Double, hi: Double): Column =
    if (hi <= lo) lit(0L)
    else least(lit(65535L), greatest(lit(0L),
      ((c.cast("double") - lo) / (hi - lo) * 65535.0).cast("long")))

  /** Z-value for two numeric columns given their global ranges. */
  def zvalue(a: Column, b: Column,
             loA: Double, hiA: Double, loB: Double, hiB: Double): Column =
    interleave16(code(a, loA, hiA), code(b, loB, hiB))

  /** Stride-3 bit-interleave of three 16-bit codes into one 48-bit
    * z-value (a on positions ≡0, b ≡1, c ≡2 mod 3) — the
    * (key × value × time)-style three-dimensional clustering. */
  def interleave16x3(a: Column, b: Column, c: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 3 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 3 * i + 1))
        .bitwiseOR(shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), 3 * i + 2))
    }.reduce(_ bitwiseOR _)

  /** Rewrite `df` z-ordered on (colA, colB): one min/max aggregate for
    * the ranges, a map-side z-value projection, then range-partition +
    * in-partition sort by the z-value. Rows are bit-for-bit preserved
    * (only ORDER and file assignment change — the round-trip gate
    * hashes every row against the source). Cost: one extra scan for
    * the ranges + the same range shuffle any sorted write pays. */
  def zorderWrite(df: DataFrame, colA: String, colB: String, path: String,
                  partitions: Int = 32): Unit = {
    val r = df.agg(
      min(col(colA).cast("double")), max(col(colA).cast("double")),
      min(col(colB).cast("double")), max(col(colB).cast("double"))).head()
    require(!r.anyNull, s"zorderWrite: $colA/$colB must have non-null min/max")
    val z = zvalue(col(colA), col(colB),
      r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    df.withColumn("__z", z)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Three-dimensional [[zorderWrite]]: same rewrite with a stride-3
    * z-value, so per-file stats are tight in all THREE dimensions
    * (each ~∛(1/files) of its global span) and predicates on any of
    * the three prune files. Same cost: one min/max scan + the range
    * shuffle any sorted write pays. */
  def zorderWrite3(df: DataFrame, colA: String, colB: String, colC: String,
                   path: String, partitions: Int = 32): Unit = {
    val r = df.agg(
      min(col(colA).cast("double")), max(col(colA).cast("double")),
      min(col(colB).cast("double")), max(col(colB).cast("double")),
      min(col(colC).cast("double")), max(col(colC).cast("double"))).head()
    require(!r.anyNull, s"zorderWrite3: $colA/$colB/$colC need non-null min/max")
    val z = interleave16x3(
      code(col(colA), r.getDouble(0), r.getDouble(1)),
      code(col(colB), r.getDouble(2), r.getDouble(3)),
      code(col(colC), r.getDouble(4), r.getDouble(5)))
    df.withColumn("__z", z)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
