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
  * Scale shape: one explode to DISTINCT (shingle, source) rows — the
  * per-source shingle SET, so volume is unique-shingles × sources,
  * not corpus length — then a self-equi-join on the shingle. Each
  * shingle contributes at most (sources it appears in choose 2)
  * pairs, so the join output is bounded by #sources², not corpus
  * size; with tens-to-hundreds of sources this is metadata-scale.
  *
  * Shingles travel as 64-bit HASHES by default (compiled
  * charShingleHashes kernel): the distinct and the self-join each
  * shuffle fixed 8-byte longs instead of raw k-char strings — the
  * unique-shingle volume grows near-linearly with the corpus, so the
  * per-row shuffle width IS this query's scale constant (its 10×
  * ratio was 11.5×, the round-8 bench's worst). Counts are exact
  * unless two distinct shingles collide in 64 bits — ≈2⁻⁶⁴ per pair,
  * ~10⁹ unique shingles for a 3% chance of a single collision
  * anywhere; the DuckDB oracle replays raw strings and stays
  * byte-equal short of that event. `exact = true` restores the
  * raw-string shuffle for callers that cannot tolerate it.
  *
  * Measured negative result (keep this formulation): collapsing to
  * ONE shuffle via groupBy(shingle).agg(collect_set(source)) + map-
  * side pair explode is ~40% SLOWER at the 10× corpus (38–46 s vs
  * 27–30 s) — collect_set leaves whole-stage codegen for
  * ObjectHashAggregate and its per-row object cost exceeds the two
  * extra compact-row hash-shuffle passes it saves. Fewer shuffles is
  * not automatically faster when the replacement aggregate abandons
  * Tungsten.
  */
object Overlap {

  /** Pairwise (groupA < groupB) shingle-set overlap: n_a, n_b
    * distinct-shingle counts, n_ab the intersection, jaccard rounded
    * to 6 decimals. Rows shorter than k contribute nothing. */
  def shingleOverlapMatrix(df: DataFrame, groupCol: String, textCol: String,
                           k: Int = 5, exact: Boolean = false): DataFrame = {
    require(k >= 1, "k >= 1")
    // compiled shingle kernel, per-document DISTINCT before the
    // explode: the global distinct's shuffle carries each (g, shingle)
    // once per document instead of once per occurrence
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
