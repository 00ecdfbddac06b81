package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables

/** Source-surface gates beyond plain parquet scans: schema evolution
  * across a table's file history and JSONL ingest with quarantined
  * corrupt records — the two file-level realities every long-lived
  * 100 TB corpus has (columns get added over the years; crawls emit
  * broken lines). Fixtures are written Spark-side from table formulas
  * and the oracle replays the formulas on the source table
  * (FORMULA-REPLAY, as the multimodal gates do). */
object SourceQueries {

  /** Old files carry (key, bal); newer files add mktsegment. A
    * mergeSchema read must surface the union schema with nulls for
    * pre-evolution rows — no rewrite of old files. Even keys were
    * written before the column existed, odd after. */
  def qSchemaEvolve(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
    PipelineQueries.withTempIndexDir("graft_evolve_gate_") { path =>
      base.filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey"), col("c_acctbal"))
        .write.mode("overwrite").parquet(path)
      base.filter(col("c_custkey") % 2 === 1)
        .write.mode("append").parquet(path)
      s.read.option("mergeSchema", "true").parquet(path)
        .select(col("c_custkey"), col("c_acctbal"),
          col("c_mktsegment").as("seg"))
        .orderBy(col("c_custkey"))
        .localCheckpoint(true) // pin before the finally reclaims files
    }
  }

  /** JSONL ingest with PERMISSIVE corrupt-record quarantine: the
    * corpus round-trips through json lines, plus one malformed line
    * per doc_id ≡ 0 (mod 50); parsed rows aggregate, broken lines
    * count into the quarantine — nothing is silently dropped. */
  def qSourceJsonl(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    PipelineQueries.withTempIndexDir("graft_jsonl_gate_") { path =>
      d.write.mode("overwrite").json(path)
      // malformed lines land in the same directory, as a crawler would
      d.filter(col("doc_id") % 50 === 0)
        .select(concat(lit("{\"doc_id\":"), col("doc_id"), lit(",")).as("value"))
        .write.mode("append").text(path)
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("source", StringType),
        StructField("n_chars", LongType),
        StructField("_corrupt_record", StringType)))
      val parsed = s.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .cache() // Spark disallows corrupt-column-only queries uncached
      val out = parsed.agg(
        count(when(col("_corrupt_record").isNull, 1)).as("n_parsed"),
        count(col("_corrupt_record")).as("n_corrupt"),
        sum(when(col("_corrupt_record").isNull, col("n_chars"))).as("chars_total"))
        .localCheckpoint(true)
      parsed.unpersist()
      out
    }
  }
}
