package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Graphs, Profile, Scd}

/** Gate queries for the warehouse-maintenance / curation-signal ops:
  * single-pass column profiling, SCD2 merge, and fixed-point PageRank.
  * Each replays deterministically in DuckDB (the SCD2 update batch and
  * the PageRank edge list are formula-derived from table keys — the
  * FORMULA-REPLAY pattern used by the multimodal gates).
  */
object WarehouseQueries {
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** One-scan profile of every customer column (ops/Profile.profile):
    * null counts, exact cardinality, numeric range/mean, string
    * range — the ingest pre-flight. The exact-distinct plan is one
    * scan + Expand + two-phase agg; ProfileSpec covers the
    * Expand-free approx variant. */
  def qProfile(s: SparkSession, dir: String): DataFrame =
    Profile.profile(t(s, dir, "customer"),
        Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
      .orderBy(col("col_name"))

  /** SCD2 merge (ops/Scd.merge): a 2020 customer snapshot receives a
    * 2021 update batch — keys %7 change (acctbal +100 → close +
    * reopen), keys %5 (and not %7) re-send identical values (must be
    * a NO-OP — the null-safe change detector), keys %31 arrive as
    * brand-new entities (key +1,000,000). One full-outer key join,
    * map-side version explode. is_current travels as int for a
    * dialect-stable compare. */
  def qScd2(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
    val dim = Scd.init(base, lit("2020-01-01"))
    val updates =
      base.filter(col("c_custkey") % 7 === 0)
        .withColumn("c_acctbal", col("c_acctbal") + 100.0)
      .unionAll(
        base.filter(col("c_custkey") % 5 === 0 && col("c_custkey") % 7 =!= 0))
      .unionAll(
        base.filter(col("c_custkey") % 31 === 0)
          .select((col("c_custkey") + 1000000L).as("c_custkey"),
            (col("c_custkey") * 1.5).as("c_acctbal"),
            lit("NEW").as("c_mktsegment")))
    Scd.merge(dim, updates, "c_custkey", Seq("c_acctbal", "c_mktsegment"),
        effectiveFrom = lit("2021-06-01"), broadcastUpdates = true)
      .select(col("c_custkey"), round(col("c_acctbal"), 2).as("bal"),
        col("c_mktsegment").as("seg"), col("valid_from"), col("valid_to"),
        col("is_current").cast("int").as("is_current"))
      .orderBy(col("c_custkey"), col("valid_from"))
  }

  /** Fixed-point PageRank (ops/Graphs.pageRank) over a formula-derived
    * document link graph (each doc links to (id·7 + j·13) mod N,
    * j=1..3), 5 power iterations at d=0.85. Integer arithmetic makes
    * the ranks bit-identical to DuckDB's unrolled-CTE replay — no
    * float tolerance needed. */
  def qPageRank(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"))
    val n = docs.count() // parquet footer count — metadata-cheap
    val edges = docs.select(col("doc_id").as("src"),
        explode(array(lit(1), lit(2), lit(3))).as("j"))
      .select(col("src"),
        ((col("src") * 7 + col("j") * 13) % n).as("dst"))
    Graphs.pageRank(docs, "doc_id", edges, "src", "dst", iters = 5)
      .orderBy(col("node"))
  }
}
