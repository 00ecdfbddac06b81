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

  /** Count-min sketch over a key column, built relationally: each row
    * contributes `depth` (row, bucket) increments — bucket r =
    * xxhash64(key, salt r) mod width — and the sketch is the d×w
    * count grid (a DataFrame of depth×width rows, KBs at any corpus
    * size; the groupBy shuffles one partial per occupied cell per
    * partition, map-side combined). Use over e.g. URL/user frequency
    * when even one row per DISTINCT key (topKFrequent's shuffle) is
    * too much — the sketch is fixed-size and mergeable (union =
    * cell-wise sum) across corpus shards.
    *
    * Estimates (`cmsEstimate`) overestimate only: for any key,
    * true <= est, and est <= true + 2N/width with prob ≥ 1-(1/2)^depth
    * (the classic Markov bound per row, independent rows). */
  def countMinSketch(df: DataFrame, keyCol: String,
                     depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth > 0 && width > 0, "countMinSketch: depth/width must be positive")
    val rows = array((0 until depth).map(r =>
      struct(lit(r).as("r"),
        pmod(xxhash64(col(keyCol).cast("string"), lit(r)), lit(width)).as("b"))): _*)
    df.select(explode(rows).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates from a count-min sketch for the keys in
    * `keys(keyCol)`: est = min over rows of the key's cell count.
    * Joins keys to their depth cells against the tiny sketch (AQE
    * broadcasts it), then one min per key. */
  def cmsEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
                  depth: Int = 4, width: Int = 256): DataFrame = {
    val cells = keys.select(col(keyCol), explode(array((0 until depth).map(r =>
      struct(lit(r).as("r"),
        pmod(xxhash64(col(keyCol).cast("string"), lit(r)), lit(width)).as("b"))): _*)).as("rb"))
      .select(col(keyCol), col("rb.r").as("r"), col("rb.b").as("b"))
    cells.join(sketch, Seq("r", "b"), "left")
      .na.fill(0L, Seq("cnt"))
      .groupBy(col(keyCol))
      .agg(min(col("cnt")).as("est"))
  }

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
      val summary = new StreamSummary(capacity)
      it.foreach(summary.offer)
      summary.iterator.map { case (r, c) => Row.fromSeq(r.toSeq :+ c) }
    }(Encoders.row(outSchema))
    candidates.groupBy(keyCols.map(col).toIndexedSeq: _*)
      .agg(sum(col("__cnt")).as("freq"))
      .orderBy(col("freq").desc +: keyCols.map(col(_).asc): _*)
      .limit(k)
  }

  /** Metwally et al.'s stream-summary: a doubly-linked list of count
    * buckets in ascending order, each holding the set of keys at that
    * count, plus a key→bucket index. Increment moves a key one bucket
    * to the right; eviction pops any key from the head (minimum)
    * bucket and the newcomer inherits min+1 — every operation O(1),
    * vs. the O(capacity) min-scan a flat HashMap needs per eviction
    * (which on high-cardinality data — the exact workload this sketch
    * exists for — made every arrival pay a 4096-entry scan). */
  private[graft] final class StreamSummary(capacity: Int) extends Serializable {
    private final class Bucket(val count: Long) {
      val keys = new java.util.LinkedHashSet[Row]()
      var prev: Bucket = _
      var next: Bucket = _
    }
    private val index = new java.util.HashMap[Row, Bucket](capacity * 2)
    private var head: Bucket = _ // minimum-count bucket

    private def unlink(b: Bucket): Unit = {
      if (b.prev ne null) b.prev.next = b.next else head = b.next
      if (b.next ne null) b.next.prev = b.prev
    }

    /** Bucket with count `c` immediately after `after` (null = list
      * head), reusing the neighbor when the count already exists. */
    private def bucketAfter(after: Bucket, c: Long): Bucket = {
      val nxt = if (after eq null) head else after.next
      if ((nxt ne null) && nxt.count == c) nxt
      else {
        val nb = new Bucket(c)
        nb.prev = after
        nb.next = nxt
        if (after ne null) after.next = nb else head = nb
        if (nxt ne null) nxt.prev = nb
        nb
      }
    }

    private def moveRight(row: Row, from: Bucket): Unit = {
      val tgt = bucketAfter(from, from.count + 1)
      from.keys.remove(row)
      tgt.keys.add(row)
      index.put(row, tgt)
      if (from.keys.isEmpty) unlink(from)
    }

    def offer(row: Row): Unit = {
      val b = index.get(row)
      if (b ne null) moveRight(row, b)
      else if (index.size < capacity) {
        val tgt = bucketAfter(null, 1L)
        tgt.keys.add(row)
        index.put(row, tgt)
      } else {
        // evict any key from the minimum bucket; the newcomer inherits
        // its count + 1 (space-saving's overestimate invariant)
        val victim = head.keys.iterator.next()
        index.remove(victim)
        val tgt = bucketAfter(head, head.count + 1)
        head.keys.remove(victim)
        tgt.keys.add(row)
        index.put(row, tgt)
        if (head.keys.isEmpty) unlink(head)
      }
    }

    /** Number of tracked keys (== capacity once full). */
    private[graft] def size: Int = index.size

    /** Re-insert a key at a known count — state restoration for the
      * STREAMING heavy-hitters wrapper, which round-trips the summary
      * through Spark state between micro-batches. Callers restore in
      * ascending count order (the iterator's order); the cursor makes
      * that amortized O(1) instead of a head scan per key. */
    private var restoreCursor: Bucket = _
    private[graft] def restore(row: Row, c: Long): Unit = {
      var cur: Bucket =
        if ((restoreCursor ne null) && restoreCursor.count <= c) restoreCursor
        else null
      var nxt = if (cur eq null) head else cur.next
      while ((nxt ne null) && nxt.count <= c) { cur = nxt; nxt = nxt.next }
      // reuse CUR on count equality — bucketAfter only reuses the
      // next bucket, and a duplicate same-count bucket breaks the
      // list's ascending invariant (head stops being the minimum,
      // evictions cascade-inherit from the wrong bucket)
      val tgt = if ((cur ne null) && cur.count == c) cur else bucketAfter(cur, c)
      tgt.keys.add(row)
      index.put(row, tgt)
      restoreCursor = tgt
    }

    def iterator: Iterator[(Row, Long)] = new Iterator[(Row, Long)] {
      private var bucket = head
      private var keyIt: java.util.Iterator[Row] =
        if (head ne null) head.keys.iterator else java.util.Collections.emptyIterator()
      def hasNext: Boolean = {
        while ((bucket ne null) && !keyIt.hasNext) {
          bucket = bucket.next
          if (bucket ne null) keyIt = bucket.keys.iterator
        }
        bucket ne null
      }
      def next(): (Row, Long) = {
        if (!hasNext) throw new NoSuchElementException
        (keyIt.next(), bucket.count)
      }
    }
  }
}
