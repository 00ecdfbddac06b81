package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temperature-scaled source mixing — the "don't let the biggest crawl
  * drown the corpus" step of training-data assembly: allocate a total
  * mass budget across sources proportional to size^α (α = 0.5 here,
  * the common square-root temperature), then keep a deterministic
  * per-source fraction of documents hitting that allocation.
  *
  * Everything is INTEGER arithmetic so the selection replays
  * bit-for-bit on any engine: size^0.5 enters as floor∘sqrt (IEEE
  * sqrt is correctly rounded, so the floor is engine-stable),
  * allocations and per-million rates use floor division, and the
  * per-document keep test is a modular hash of the id against the
  * rate — no RNG, no float thresholds. Exactness bound: intermediate
  * products stay in BIGINT while per-source mass ≤ ~9·10^12 units;
  * above that, pre-scale the mass column (chars → KB) before calling.
  *
  * Scale shape: one two-phase aggregate for the per-source masses
  * (#sources rows), a broadcast join to attach rates, and a map-side
  * modular filter — the document table is scanned once and never
  * shuffled.
  */
object Mixing {

  private val Mixer = 2654435761L // Knuth multiplicative hash constant

  /** Per-source √-temperature allocation: (source, n, rate_ppm) where
    * n is the source's total mass (sum of `massCol`) and rate_ppm the
    * kept fraction in parts-per-million. `budget` is the target total
    * mass in the same units as `massCol`. Sources whose √-share
    * exceeds their own mass cap at 1e6 (keep everything). */
  def sqrtMixRates(df: DataFrame, sourceCol: String, massCol: String,
                   budget: Long): DataFrame = {
    val sz = df.groupBy(col(sourceCol))
      .agg(sum(col(massCol)).cast("long").as("n"))
      .withColumn("s", floor(sqrt(col("n").cast("double"))).cast("long"))
    val tot = sz.agg(sum(col("s")).cast("long").as("s_sum"))
    sz.crossJoin(broadcast(tot))
      .withColumn("alloc", expr(s"($budget * s) div s_sum"))
      .select(col(sourceCol), col("n"),
        least(lit(1000000L), expr("(1000000 * alloc) div n")).as("rate_ppm"))
  }

  /** Loss-driven domain reweighting — the multiplicative-weights
    * update behind DoReMi-style mixture tuning (Xie et al. 2023),
    * LINEARIZED so it stays integer-exact: a domain whose measured
    * excess loss is high gets its mass-proportional weight scaled by
    * (1 + η·loss) before the budget is re-allocated —
    *
    *   w_i    = n_i · (10⁶ + (η_ppm · loss_ppm_i) div 10⁶) div 10⁶
    *   alloc  = (budget · w_i) div Σw
    *   rate   = min(10⁶, (10⁶ · alloc) div n_i)   [ppm]
    *
    * η and losses ride in parts-per-million. Losses must be
    * NON-NEGATIVE (DoReMi's excess loss is; below zero, Spark's
    * truncating `div` and other engines' flooring `//` diverge) —
    * down-weighting of easy domains comes from the renormalization,
    * as in standard multiplicative weights. Every step is BIGINT
    * arithmetic — no exp(), whose last-ulp rounding differs across
    * engines and would make the rates unreplayable. The same
    * two-phase-aggregate + broadcast shape as [[sqrtMixRates]]; feed
    * the result to [[sampleByRatePpm]] for the realized sample. */
  def reweightRates(df: DataFrame, sourceCol: String, massCol: String,
                    losses: DataFrame, lossCol: String, budget: Long,
                    etaPpm: Long): DataFrame = {
    val sz = df.groupBy(col(sourceCol))
      .agg(sum(col(massCol)).cast("long").as("n"))
      .join(broadcast(losses.select(col(sourceCol),
        col(lossCol).cast("long").as("loss_ppm"))), Seq(sourceCol), "left")
      .withColumn("loss_ppm", coalesce(col("loss_ppm"), lit(0L)))
      .withColumn("w",
        expr(s"(n * (1000000 + ($etaPpm * loss_ppm) div 1000000)) div 1000000"))
    val tot = sz.agg(sum(col("w")).cast("long").as("w_sum"))
    sz.crossJoin(broadcast(tot))
      .withColumn("alloc", expr(s"($budget * w) div w_sum"))
      .select(col(sourceCol), col("n"), col("loss_ppm"),
        least(lit(1000000L), expr("(1000000 * alloc) div n")).as("rate_ppm"))
  }

  /** Greedy budget-constrained selection — "the best `budget` tokens
    * of the corpus": walk documents in (quality desc, id asc) order
    * and keep each while the running weight total stays within the
    * budget (a crossing document is excluded — the greedy fill never
    * overflows). The final assembly step after scoring/filtering,
    * when the training run has a token budget and the corpus has a
    * quality ranking.
    *
    * The global running total is the same TWO-PHASE prefix sum as
    * concat-and-chunk, bucketed by a pure VALUE-RANGE projection on
    * the quality score (descending buckets), so no single-partition
    * window exists at any scale. Ties across identical qualities
    * break by id — a total order, so the kept set is unique and any
    * SQL engine replays it with one window cumsum. A corpus whose
    * quality column is (nearly) constant degenerates to few buckets —
    * rank on a higher-resolution score if that is your data. */
  def selectToBudget(df: DataFrame, idCol: String, qualityCol: String,
                     weightCol: String, budget: Long): DataFrame = {
    require(budget >= 0, "selectToBudget: budget >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).as("__id"),
      col(qualityCol).cast("double").as("__q"),
      col(weightCol).cast("long").as("__w"))
    val r = base.agg(min(col("__q")), max(col("__q")), count(lit(1))).head
    if (r.isNullAt(0)) return df.limit(0)
      .withColumn("cum_weight", lit(0L))
    val (qMin, qMax, nRows) = (r.getDouble(0), r.getDouble(1), r.getLong(2))
    val par = spark.sparkContext.defaultParallelism.toLong
    val buckets = math.max(1L, math.min(par, nRows / 4L)).toInt
    val span = qMax - qMin
    // descending-quality bucket id, pure projection (bucket 0 = best)
    val bCol =
      if (span <= 0.0) lit(0)
      else least(lit(buckets - 1),
        floor((lit(qMax) - col("__q")) / lit(span / buckets)).cast("int"))
    val wb = base.withColumn("__b", bCol)
    val wloc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__b")).orderBy(col("__q").desc, col("__id").asc)
    val local = wb.withColumn("__cum", sum(col("__w")).over(wloc))
    val totals = wb.groupBy(col("__b")).agg(sum(col("__w")).as("__t"))
      .orderBy(col("__b")).collect()
    var acc = 0L
    val prefixRows = totals.map { row =>
      val p = (row.getInt(0), acc); acc += row.getLong(1); p
    }.toSeq
    val prefixDf = prefixRows.toDF("__b", "__pfx")
    val kept = local.join(broadcast(prefixDf), Seq("__b"))
      .withColumn("cum_weight", col("__pfx") + col("__cum"))
      .filter(col("cum_weight") <= budget)
    df.join(kept.select(col("__id").as(idCol), col("cum_weight")), Seq(idCol))
  }

  /** Keep each row iff its id's modular hash lands under the source's
    * rate: (id · 2654435761) mod 1e6 < rate_ppm. Deterministic,
    * stateless, map-side (rates broadcast). Computed in the residue
    * ring — ((id mod 1e6) · (Mixer mod 1e6)) mod 1e6, the SAME value
    * by mod-multiplicativity — so 64-bit ids can't overflow the
    * product under ANSI arithmetic. */
  def sampleByRatePpm(df: DataFrame, sourceCol: String, idCol: String,
                      rates: DataFrame): DataFrame =
    df.join(broadcast(rates.select(col(sourceCol), col("rate_ppm"))),
        Seq(sourceCol))
      .filter(((col(idCol) % 1000000L) * (Mixer % 1000000L)) % 1000000L
        < col("rate_ppm"))
      .drop("rate_ppm")
}
