package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-source overlap matrix — "how much of source A is also in
  * source B": the contamination / provenance diagnostic run before
  * mixing corpora (a crawl that substantially duplicates another
  * source should be down-weighted or dropped, and train/eval sources
  * must not overlap). Overlap is measured as Jaccard similarity of
  * the sources' character-k-shingle SETS — the same granularity the
  * dedup family uses, but aggregated per source pair instead of per
  * document pair.
  *
  * Scale shape (default, ≤63 sources — the practical case): each
  * shingle is hashed map-side (compiled charShingleHashes kernel) and
  * tagged with its source's BIT, then ONE hash aggregation computes
  * per-shingle source masks — `bit_or` is idempotent and associative,
  * so per-document duplicates need no global distinct and the partial
  * (map-side) combine already collapses most rows before the only
  * shuffle, which carries (8-byte hash, 8-byte partial mask). A second
  * metadata-scale aggregate counts shingles per mask (≤2^|sources|
  * observed masks), and the pair matrix falls out of the mask counts
  * with integer popcount arithmetic — no self-join ever happens, so
  * the join's second corpus-sized shuffle (what made this the
  * round-8 bench's worst scaler at 11.5×) is gone entirely. Counts
  * are exact unless two distinct shingles collide in 64 bits —
  * ≈2⁻⁶⁴ per pair; the DuckDB oracle replays raw strings and stays
  * byte-equal short of that event.
  *
  * More than 63 sources falls back to the hashed distinct+self-join
  * shape; `exact = true` restores the raw-string shuffle for callers
  * that cannot tolerate the hash (both shapes below).
  *
  * Measured negative result (keep this formulation): collapsing the
  * JOIN shape to one shuffle via groupBy(shingle)
  * .agg(collect_set(source)) + map-side pair explode is ~40% SLOWER
  * at the 10× corpus — collect_set leaves whole-stage codegen for
  * ObjectHashAggregate and its per-row object cost exceeds the two
  * extra compact-row hash-shuffle passes it saves. The bitmask
  * aggregate above keeps the one-shuffle shape WITHOUT leaving
  * codegen: `bit_or` over a long is a Tungsten aggregate.
  */
object Overlap {

  /** Pairwise (groupA < groupB) shingle-set overlap: n_a, n_b
    * distinct-shingle counts, n_ab the intersection, jaccard rounded
    * to 6 decimals. Rows shorter than k contribute nothing. */
  def shingleOverlapMatrix(df: DataFrame, groupCol: String, textCol: String,
                           k: Int = 5, exact: Boolean = false): DataFrame = {
    require(k >= 1, "k >= 1")
    val groups =
      if (exact) Array.empty[String]
      else df.select(col(groupCol).cast("string").as("g")).distinct()
        .orderBy(col("g")).collect().map(_.getString(0))
    if (!exact && groups.nonEmpty && groups.length <= 63)
      maskMatrix(df, groupCol, textCol, k, groups)
    else joinMatrix(df, groupCol, textCol, k, exact)
  }

  /** One-shuffle bitmask shape (≤63 sources). */
  private def maskMatrix(df: DataFrame, groupCol: String, textCol: String,
                         k: Int, groups: Array[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val gdict = groups.zipWithIndex.toSeq.toDF("__g", "__gi")
    val maskCounts = df.filter(length(col(textCol)) >= k)
      .join(broadcast(gdict), col(groupCol).cast("string") === col("__g"))
      .select(expr("shiftleft(1L, __gi)").as("m"),
        explode(graft.functions.TextHashFunctions.charShingleHashes(
          col(textCol), k, distinct = true)).as("s"))
      .groupBy(col("s")).agg(expr("bit_or(m)").as("mask"))
      .groupBy(col("mask")).agg(count(lit(1)).as("cnt"))
      .collect() // ≤ 2^|sources| observed masks — metadata scale
    val n = groups.length
    val nA = Array.fill(n)(0L)
    val nAB = Array.ofDim[Long](n, n)
    maskCounts.foreach { r =>
      val mask = r.getLong(0)
      val cnt = r.getLong(1)
      var i = 0
      while (i < n) {
        if ((mask & (1L << i)) != 0L) {
          nA(i) += cnt
          var j = i + 1
          while (j < n) {
            if ((mask & (1L << j)) != 0L) nAB(i)(j) += cnt
            j += 1
          }
        }
        i += 1
      }
    }
    val pairs = for {
      i <- 0 until n
      j <- (i + 1) until n
      if nAB(i)(j) > 0L
    } yield (groups(i), groups(j), nA(i), nA(j), nAB(i)(j))
    pairs.toDF("g1", "g2", "n_a", "n_b", "n_ab")
      .select(col("g1"), col("g2"), col("n_a"), col("n_b"), col("n_ab"),
        round(col("n_ab") / (col("n_a") + col("n_b") - col("n_ab")), 6)
          .as("jaccard"))
  }

  /** Distinct + self-join shape: the >63-source fallback, and the
    * exact-string variant (per-document-DISTINCT kernel before the
    * explode, so the global distinct's shuffle carries each
    * (g, shingle) once per document instead of once per occurrence). */
  private def joinMatrix(df: DataFrame, groupCol: String, textCol: String,
                         k: Int, exact: Boolean): DataFrame = {
    val shingleArr =
      if (exact) graft.functions.TextHashFunctions.charShingles(col(textCol), k, distinct = true)
      else graft.functions.TextHashFunctions.charShingleHashes(col(textCol), k, distinct = true)
    val sh = df.filter(length(col(textCol)) >= k)
      .select(col(groupCol).as("g"), explode(shingleArr).as("s"))
      .distinct()
    val per = sh.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val pairs = sh.select(col("g").as("g1"), col("s"))
      .join(sh.select(col("g").as("g2"), col("s")), Seq("s"))
      .filter(col("g1") < col("g2"))
      .groupBy(col("g1"), col("g2")).agg(count(lit(1)).as("n_ab"))
    pairs
      .join(per.select(col("g").as("g1"), col("n").as("n_a")), Seq("g1"))
      .join(per.select(col("g").as("g2"), col("n").as("n_b")), Seq("g2"))
      .select(col("g1"), col("g2"), col("n_a"), col("n_b"), col("n_ab"),
        round(col("n_ab") / (col("n_a") + col("n_b") - col("n_ab")), 6)
          .as("jaccard"))
  }
}
