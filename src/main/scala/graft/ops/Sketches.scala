package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Approximate/summary aggregates for 100 TB-scale profiling — the
  * "novel sketch" class of operators the reference has no counterpart
  * for (its aggregate surface is COUNT/SUM/MIN/MAX/AVG/LAST only —
  * reference: sql/SQLGroupFunction.java:47-93).
  *
  * Everything here is a bounded-state aggregate: the shuffle carries
  * sketches (KB per group) or capped candidate sets, never the raw
  * column, so cost scales with group count — not row count.
  */
object Sketches {

  /** Per-group distinct-count estimate via Spark's native HyperLogLog++
    * (codegen'd partial/final aggregate; state ≈ 1.04/rsd² registers
    * per group, merged associatively across partitions — no exact
    * distinct shuffle of the key universe). */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      rsd: Double = 0.02): DataFrame =
    df.groupBy(groupCols.map(col).toIndexedSeq: _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_distinct"))

  /** Per-group quantile estimates via Spark's native Greenwald-Khanna
    * summary (percentile_approx): one pass, mergeable state bounded by
    * `accuracy`, never a per-group sort. */
  def approxQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
      probabilities: Seq[Double], accuracy: Int = 10000): DataFrame = {
    val probs = array(probabilities.map(lit).toIndexedSeq: _*)
    df.groupBy(groupCols.map(col).toIndexedSeq: _*)
      .agg(percentile_approx(col(valueCol), probs, lit(accuracy)).as("quantiles"))
  }

  /** Exact distributed top-k most frequent keys: map-side partial
    * count (hash agg combine) → one shuffle keyed by the group →
    * TakeOrderedAndProject for the global k. The shuffle carries one
    * row per distinct key; use [[spaceSavingTopK]] when even that is
    * too large. */
  def topKFrequent(df: DataFrame, keyCols: Seq[String], k: Int): DataFrame =
    df.groupBy(keyCols.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc +: keyCols.map(col(_).asc): _*)
      .limit(k)

  /** Approximate heavy hitters via per-partition space-saving: each
    * partition keeps at most `capacity` counters (evicting the minimum
    * and inheriting its count — the classic overestimate bound), then
    * candidates are merged by a normal keyed sum and the global top-k
    * taken. The shuffle is capped at capacity × partitions rows no
    * matter how many distinct keys the data holds — this is the shape
    * for "top URLs over 100 TB of logs" where exact groupBy would
    * shuffle billions of distinct keys.
    *
    * Guarantee (space-saving): any key with true frequency
    * > N_partition / capacity survives its partition, so with
    * capacity ≫ k·(skew factor) the reported top-k equals the exact
    * top-k; reported counts may overestimate by at most the smallest
    * evicted counter per partition. */
  def spaceSavingTopK(df: DataFrame, keyCols: Seq[String], k: Int,
      capacity: Int = 4096): DataFrame = {
    require(capacity >= k, "spaceSavingTopK: capacity must be >= k")
    val keyed = df.select(keyCols.map(col).toIndexedSeq: _*)
    val outSchema = StructType(keyed.schema.fields :+ StructField("__cnt", LongType, nullable = false))
    val candidates = keyed.mapPartitions { it =>
      val counters = new scala.collection.mutable.HashMap[Row, Long]
      it.foreach { row =>
        counters.get(row) match {
          case Some(c) => counters.update(row, c + 1)
          case None =>
            if (counters.size < capacity) counters.update(row, 1L)
            else {
              // evict the minimum counter; the newcomer inherits its
              // count + 1 (space-saving's overestimate invariant)
              val (minK, minV) = counters.minBy(_._2)
              counters.remove(minK)
              counters.update(row, minV + 1)
            }
        }
      }
      counters.iterator.map { case (r, c) => Row.fromSeq(r.toSeq :+ c) }
    }(Encoders.row(outSchema))
    candidates.groupBy(keyCols.map(col).toIndexedSeq: _*)
      .agg(sum(col("__cnt")).as("freq"))
      .orderBy(col("freq").desc +: keyCols.map(col(_).asc): _*)
      .limit(k)
  }
}
