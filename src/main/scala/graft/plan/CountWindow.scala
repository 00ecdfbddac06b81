package graft.plan

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Scalable lowering of the reference's GLOBAL count-based sliding
  * window (`WINDOW BY col INTERVAL = n` with no partition key —
  * sql/SQLGroupContainer.java:120-158: aggregates over the last n rows
  * in id order, one output row per input row once the buffer is full).
  *
  * A naive `Window.orderBy(col)` moves every row through ONE task — a
  * driver-adjacent bottleneck at scale. Instead:
  *
  *   1. bucket rows by range of the order column (cut points from a
  *      single approx-quantile pass over just that column);
  *   2. compute per-bucket window frames — parallel across buckets;
  *   3. the first n-1 windows of each bucket are missing rows from the
  *      previous bucket, so carry each bucket's last n-1 rows into the
  *      next bucket, recompute, and emit only non-carry rows whose
  *      window is full.
  *
  * Total cost: one column-pruned quantile scan + one hash shuffle on
  * the bucket id + (n-1)×buckets duplicated carry rows — vs. the whole
  * table through a single sort task. Assumes the order column is
  * reasonably dense (the reference's monotonic @GeneratedValue ids
  * are), so range buckets are non-empty and the one-bucket carry
  * suffices.
  *
  * Non-numeric order columns bucket through a MONOTONE NUMERIC PROXY
  * (strings: first 8 UTF-8 bytes as an unsigned integer — byte order
  * IS code-point order; timestamps/dates: epoch seconds; arrays and
  * structs: the proxy of their FIRST element/field — lexicographic
  * ordering is dominated by the head, ties merely collide). The proxy
  * only has to be order-preserving, never exact: proxy(a) < proxy(b)
  * ⇒ a < b, so bucket boundaries can't interleave true order, and
  * rows whose proxies collide (same 8-byte prefix / equal heads)
  * merely share a bucket, where the true column orders them. Double
  * rounding and prefix truncation are monotone coarsenings — they
  * move cut points, not correctness.
  */
object CountWindow {
  import org.apache.spark.sql.types._
  import org.apache.spark.sql.Column

  /** Order-column types the bucketed global window can range-partition
    * (via [[orderProxy]] over [[orderExpr]]). EVERY Spark-orderable
    * type buckets (r13): the common ones through a real structural
    * proxy, exotic ones (UDTs…) through the coarsest monotone proxy —
    * a constant, i.e. one bucket = a correct single-task sort. On top
    * of orderable, maps bucket through their canonical sorted-entries
    * order (r12) and degenerate constant orders (empty struct /
    * all-null column) trivially tie. The only rejects are types Spark
    * itself cannot order at all (maps nested inside containers, maps
    * with unorderable values, variants) — Lowering surfaces those with
    * a clear error instead of an incidental Catalyst one. */
  def canBucket(dt: DataType): Boolean = dt match {
    case NullType => true // all-null column: every row ties — constant proxy
    case s: StructType if s.fields.isEmpty => true // ditto: constant order
    case m: MapType =>
      // canonical order = key-sorted entries array ([[orderExpr]]);
      // buckets by the head entry's key, Spark orders the entries
      // array within buckets — so key must proxy and value must be
      // natively orderable
      canBucket(m.keyType) && sparkOrderable(m.valueType)
    case other => sparkOrderable(other)
  }

  /** Whether Spark's own row ordering can sort the type — required of
    * containers (bucketing only coarsens by the head; the TRUE column
    * orders rows within a bucket, which Catalyst must support). */
  private def sparkOrderable(dt: DataType): Boolean =
    org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(dt)

  /** Spark-orderable canonicalization of the order column — identity
    * for natively orderable types. Maps become their key-sorted
    * entries array (the canonical total order on maps: compare entries
    * lexicographically by key then value — Spark refuses to ORDER BY a
    * raw map, so this also serves the keyed window path). An empty
    * struct compares equal on every row — any consistent order is a
    * valid tie-break, so a constant stands in. Both the within-bucket
    * sort and (via [[orderProxy]]) bucket assignment go through this,
    * so the two can never disagree. */
  def orderExpr(dt: DataType, c: Column): Column = dt match {
    case _: MapType => array_sort(map_entries(c))
    case s: StructType if s.fields.isEmpty => lit(0)
    case _ => c
  }

  /** Monotone numeric proxy of the order column, used ONLY for bucket
    * cut-points and bucket assignment (within-bucket ordering uses the
    * true column). */
  private def orderProxy(dt: DataType, c: Column): Column = dt match {
    case _: NumericType => c.cast("double")
    case _: TimestampType => c.cast("double")
    case _: DateType => c.cast("timestamp").cast("double")
    case TimestampNTZType =>
      // wall-clock seconds WITHOUT any timezone mapping: converting
      // local time through the session zone is NOT monotone across a
      // DST spring-forward gap (nonexistent local times shift past
      // later real ones), so build the proxy from tz-free pieces —
      // days since epoch (the NTZ→DATE cast just drops the clock) plus
      // second-of-day field extraction. Sub-second truncation is a
      // monotone coarsening: collisions merely share a bucket.
      (datediff(c.cast(DateType), lit(java.sql.Date.valueOf("1970-01-01")))
        .cast("double") * 86400.0) +
        hour(c).cast("double") * 3600.0 + minute(c).cast("double") * 60.0 +
        second(c).cast("double")
    case _: YearMonthIntervalType => c.cast("int").cast("double") // total months
    case _: DayTimeIntervalType =>
      // long cast = count of the type's endField unit, truncated; the
      // endField is fixed per column so the scale is constant → the
      // truncation is a monotone coarsening
      c.cast("long").cast("double")
    case _: StringType =>
      // first 8 UTF-8 bytes as an unsigned big-endian integer,
      // arithmetically zero-padded (v·256^(8−len)): shorter strings
      // compare as if padded with 0x00 — exactly byte-wise string
      // order. conv() yields the unsigned value as a decimal string;
      // the double cast may round but rounding is monotone.
      bytePrefixProxy(substring(encode(c, "UTF-8"), 1, 8))
    case BinaryType =>
      // Spark compares BinaryType by unsigned byte-wise lexicographic
      // order — exactly what the 8-byte prefix proxy encodes (r11;
      // was a single-partition fallback)
      bytePrefixProxy(substring(c, 1, 8))
    case a: ArrayType =>
      // lexicographic array order is dominated by the first element;
      // an EMPTY array (or null head) sorts before every non-empty
      // one → -∞, the minimum proxy. `get` (not element_at) so an
      // out-of-bounds index is null, not an ANSI error.
      coalesce(orderProxy(a.elementType, get(c, lit(0))),
        lit(Double.NegativeInfinity))
    case s: StructType if s.fields.nonEmpty =>
      // struct order compares field-by-field; the head field decides
      // except on ties (collisions — shared bucket, true order within)
      coalesce(orderProxy(s.fields.head.dataType, c.getField(s.fields.head.name)),
        lit(Double.NegativeInfinity))
    case m: MapType =>
      // proxy of the canonical sorted-entries array = proxy of the
      // head (smallest-key) entry = proxy of its key; empty map → -∞
      orderProxy(
        ArrayType(StructType(Seq(
          StructField("key", m.keyType, nullable = false),
          StructField("value", m.valueType, m.valueContainsNull)))),
        orderExpr(m, c))
    case BooleanType => c.cast("double") // false→0.0 < true→1.0
    case NullType => lit(0.0) // every row ties — constant proxy
    case _: StructType => lit(0.0) // empty struct: ditto
    case other if sparkOrderable(other) =>
      // exotic-but-orderable (UDTs…): the coarsest monotone proxy —
      // every row ties, one bucket, a correct single-task sort. Rare
      // by construction; the common types above all have real proxies.
      lit(0.0)
    case other => throw new IllegalArgumentException(
      s"CountWindow: cannot bucket order column of type $other")
  }

  /** Unsigned big-endian value of an ≤8-byte prefix, zero-padded to 8
    * bytes arithmetically (v·256^(8−len)) so shorter inputs compare as
    * if padded with 0x00 — byte-wise lexicographic order preserved.
    * Empty/null prefix → 0, the minimum proxy. */
  private def bytePrefixProxy(bin: Column): Column =
    coalesce(
      conv(hex(bin), 16, 10).cast("double") *
        pow(lit(256.0), lit(8) - least(octet_length(bin), lit(8))),
      lit(0.0))

  /** @param aggs given the full-frame WindowSpec, produce the final
    *   named output columns (aggregates over the spec + plain cols). */
  def global(df: DataFrame, orderCol: String, n: Int,
             aggs: WindowSpec => Seq[org.apache.spark.sql.Column]): DataFrame = {
    val spark = df.sparkSession
    // Bucket count must respect BOTH parallelism and the window size:
    // the carry-over spans exactly one bucket boundary, so every bucket
    // needs >= n-1 rows or frames spanning 2+ buckets would come up
    // short and be dropped by the full-window filter. Cap buckets at
    // rows/(4n) — each bucket targets ~4 windows — falling back to a
    // single bucket (tiny data: a one-task sort is then fine).
    // ONE column-pruned pass collects the row count and a fine-grained
    // quantile sketch together; the sketch accuracy is sized so the
    // rank error (~rows/accuracy) stays well under a bucket's 4n rows —
    // quantile noise can then shrink a bucket to ~3n, never below n-1.
    val maxPar = math.max(1, spark.conf.getOption("spark.sql.shuffle.partitions")
      .flatMap(_.toIntOption).getOrElse(32))
    val fracs = (1 until maxPar).map(_.toDouble / maxPar)
    val accuracy = math.max(10000, 16 * maxPar)
    val orderDt = df.schema(orderCol).dataType
    // canonicalized order (maps → sorted entries; constant orders →
    // literal) — what the within-bucket sorts below actually order by
    val ord = orderExpr(orderDt, col(orderCol))
    val proxy = orderProxy(orderDt, col(orderCol))
    val probe = df.select(
      count(col(orderCol)).as("n"),
      percentile_approx(proxy, typedLit(fracs), lit(accuracy)).as("qs")).head
    val rows = probe.getLong(0)
    val fineCuts: Seq[Double] =
      if (probe.isNullAt(1)) Seq.empty else probe.getSeq[Double](1)
    val buckets = math.max(1, math.min(maxPar.toLong, rows / math.max(4L * n, 1L)).toInt)
    val cuts =
      if (buckets <= 1 || fineCuts.isEmpty) Array.empty[Double]
      else (1 until buckets)
        .map(b => fineCuts(math.min(b * maxPar / buckets, fineCuts.length) - 1))
        .distinct.toArray
    // bucket id = number of cut points strictly below this row's PROXY
    // value — a pure projection, consistent across re-evaluations
    // (unlike spark_partition_id after repartitionByRange, whose
    // sampling could re-draw differently per evaluation)
    val pid = cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when(proxy > lit(c), 1).otherwise(0)
    }
    val base = df.withColumn("__pid", pid).withColumn("__carry", lit(false))
    // each bucket's last n-1 rows, replayed into the following bucket
    val wTail = Window.partitionBy(col("__pid")).orderBy(ord.desc)
    val carry = base.withColumn("__rrn", row_number().over(wTail))
      .filter(col("__rrn") < n).drop("__rrn")
      .withColumn("__pid", col("__pid") + 1)
      .withColumn("__carry", lit(true))
    val aug = base.unionByName(carry)
    val w = Window.partitionBy(col("__pid")).orderBy(ord)
      .rowsBetween(-(n - 1), Window.currentRow)
    aug.select(aggs(w) :+ col("__carry") :+ count(lit(1)).over(w).as("__wn"): _*)
      .filter(!col("__carry") && col("__wn") === n)
      .drop("__carry", "__wn")
  }
}
