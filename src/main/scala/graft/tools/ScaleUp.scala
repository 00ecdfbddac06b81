package graft.tools

import java.io.File

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Derives an N× scaled copy of a driver testdata directory for
  * SCALING MEASUREMENT (Bench's second pass; see SCALE.md "Scaling
  * study"). Not a correctness fixture — gates always run on the
  * driver's own parquet.
  *
  * Each replica r ∈ [0, factor) is a disjoint key shard: every 64-bit
  * key column is offset by r·2³² so per-key row counts, join fan-outs
  * and window sizes stay CONSTANT as the corpus grows — time should
  * then scale ~linearly with factor, and any super-linear growth is an
  * engine property, not a data artifact. Shared dimension tables
  * (region, nation) are not replicated, mirroring how a real corpus
  * grows against fixed reference data. Content columns are decorrelated
  * across replicas so content-similarity operators don't see every
  * document duplicated `factor` times (which would quadratically blow
  * up true near-dup pair counts BY CONSTRUCTION): document words are
  * deterministically rewritten+shuffled per (doc, replica) — same
  * length/token/char statistics, disjoint shingles AND token bags —
  * and embedding elements are deterministically shuffled (same norm,
  * decorrelated direction).
  *
  * Replica 0 is byte-identical to the source, so sf2 results embed the
  * sf1 results exactly.
  */
object ScaleUp {
  private val Stride = 1L << 32

  /** int64 key columns to shard per table; consistent across tables so
    * foreign keys stay aligned within a replica. */
  private val keyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part"     -> Seq("p_partkey"),
    "orders"   -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events"   -> Seq("event_id", "user_id"),
    "documents"  -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  private def replicate(df: DataFrame, table: String, factor: Int): DataFrame =
    (0 until factor).map { r =>
      keyCols.getOrElse(table, Nil).foldLeft(df) { (d, k) =>
        d.withColumn(k, col(k) + lit(r * Stride))
      }.withColumn("__replica", lit(r))
    }.reduce(_ unionByName _)

  /** Deterministic xorshift64 PRNG — one definition for every
    * per-row decorrelation loop. */
  private final class XorShift(private var s: Long) {
    def nextInt(bound: Int): Int = {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      math.floorMod(s, bound.toLong).toInt
    }
  }

  /** Deterministic per-replica text rewrite, seeded by (doc_id,
    * replica): ~1 word in 4 is replaced with a replica-salted token of
    * the SAME length (so char/length statistics survive), then the
    * words are Fisher-Yates shuffled. Shuffling alone is NOT enough:
    * order-invariant signatures (SimHash's token-bag majority vote)
    * see shuffled replicas as exact duplicates, which turns a scaling
    * measurement into a duplicate-flood stress test. Replica 0
    * untouched. */
  private def rewriteWords(text: String, seed: Long): String = {
    val words = text.split(" ")
    val rng = new XorShift(seed)
    import rng.nextInt
    var i = 0
    while (i < words.length) {
      if (nextInt(4) == 0 && words(i).nonEmpty) {
        // same-length substitute drawn from a salted alphabet
        val sb = new java.lang.StringBuilder(words(i).length)
        var j = 0
        while (j < words(i).length) { sb.append(('a' + nextInt(26)).toChar); j += 1 }
        words(i) = sb.toString
      }
      i += 1
    }
    i = words.length - 1
    while (i > 0) {
      val j = nextInt(i + 1)
      val t = words(i); words(i) = words(j); words(j) = t
      i -= 1
    }
    words.mkString(" ")
  }

  private def decorrelate(df: DataFrame, table: String): DataFrame = table match {
    case "documents" =>
      implicit val enc = Encoders.row(df.schema)
      val textIdx = df.schema.fieldIndex("text")
      val idIdx = df.schema.fieldIndex("doc_id")
      val repIdx = df.schema.fieldIndex("__replica")
      df.mapPartitions { rows =>
        rows.map { row =>
          val r = row.getInt(repIdx)
          if (r == 0) row
          else {
            val vals = row.toSeq.toArray
            vals(textIdx) = rewriteWords(row.getString(textIdx),
              seed = row.getLong(idIdx) * 1315423911L + r)
            Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
          }
        }
      }
    case "embeddings" =>
      implicit val enc = Encoders.row(df.schema)
      val vecIdx = df.schema.fieldIndex("embedding")
      val idIdx = df.schema.fieldIndex("vec_id")
      val repIdx = df.schema.fieldIndex("__replica")
      df.mapPartitions { rows =>
        rows.map { row =>
          val r = row.getInt(repIdx)
          if (r == 0) row
          else {
            // element shuffle: preserves the norm exactly but fully
            // decorrelates direction, so replicas are NOT near-dups of
            // each other (a small additive perturbation left replica
            // cosines ≈ 0.999 — every replica group was a genuine
            // near-dup clique and pair counts grew quadratically)
            val rng = new XorShift(row.getLong(idIdx) * 2654435761L + r)
            val vec = row.getSeq[Float](vecIdx).toArray
            var i = vec.length - 1
            while (i > 0) {
              val j = rng.nextInt(i + 1)
              val t = vec(i); vec(i) = vec(j); vec(j) = t
              i -= 1
            }
            val vals = row.toSeq.toArray
            vals(vecIdx) = scala.collection.immutable.ArraySeq.unsafeWrapArray(vec)
            Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
          }
        }
      }
    case _ => df
  }

  /** Write `df` as the single file `<dstDir>/<table>.parquet` (the
    * layout Tables.load/loadStream expect — loadStream's pathGlobFilter
    * matches a FILE name, so a directory-per-table layout would feed
    * streaming sources nothing). */
  private def writeSingleFile(df: DataFrame, dstDir: File, table: String): Unit = {
    val tmp = new File(dstDir, s".${table}_tmp")
    // small row groups: a single-file table is only scan-parallel up
    // to its row-group count (maxPartitionBytes splits are assigned by
    // row-group midpoint), and this corpus exists to measure scaling.
    // 1 MB row groups (r11, was 8 MB): the 10× documents table is only
    // ~8 MB total, so 8 MB groups left its kernel scans effectively
    // SINGLE-TASK on a 32-core box — the mechanism behind the text
    // kernels' ~9× wall ratios at 10× data. A real 100 TB table is
    // thousands of files/row-groups; the fixture must be splittable
    // too or it measures the fixture, not the engine.
    df.coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes.toString)
      .parquet(tmp.toString)
    val part = tmp.listFiles().find(f => f.getName.startsWith("part-") &&
      f.getName.endsWith(".parquet")).getOrElse(
      throw new IllegalStateException(s"no part file written for $table"))
    val dst = new File(dstDir, s"$table.parquet")
    if (dst.exists()) dst.delete()
    if (!part.renameTo(dst))
      throw new IllegalStateException(s"rename ${part} -> ${dst} failed")
    tmp.listFiles().foreach(_.delete())
    tmp.delete()
  }

  /** Marker written after ALL tables land, so a consumer never reads a
    * half-generated directory (e.g. a bench run killed mid-generate).
    * Carries the source dir + factor + per-table CONTENT fingerprint
    * (size + mtime of every source parquet): a leftover dir generated
    * from a DIFFERENT source, factor, or source content must not be
    * silently reused (it would skew the scaling numbers) — the
    * path-only check a stale or tampered dir could satisfy. */
  def completeMarker(dstDir: String): File = new File(dstDir, "_GRAFT_SCALE_COMPLETE")

  /** Row-group size for derived corpora — part of the fingerprint, so
    * changing it regenerates existing dirs instead of silently reusing
    * a corpus with different scan parallelism. */
  val rowGroupBytes: Int = 1024 * 1024

  def fingerprint(srcDir: String, factor: Int): String = {
    val sig = Tables.names.map { t =>
      val f = new File(srcDir, s"$t.parquet")
      s"$t:${f.length()}:${f.lastModified()}"
    }.mkString(",")
    s"src=$srcDir|factor=$factor|rg=$rowGroupBytes|tables=$sig"
  }

  /** Short stable digest of [[fingerprint]] — used to key the derived
    * dir's NAME, so two benches over different source content can never
    * race into the same directory. */
  def fingerprintHash(srcDir: String, factor: Int): String =
    f"${scala.util.hashing.MurmurHash3.stringHash(fingerprint(srcDir, factor)) & 0xFFFFFFFFL}%08x"

  def isComplete(dstDir: String, srcDir: String, factor: Int): Boolean = {
    val m = completeMarker(dstDir)
    m.exists() && {
      val have = new String(java.nio.file.Files.readAllBytes(m.toPath), "UTF-8").trim
      have == fingerprint(srcDir, factor)
    }
  }

  def scaleUp(spark: SparkSession, srcDir: String, dstDir: String, factor: Int): Unit = {
    require(factor >= 1, "factor must be >= 1")
    val dst = new File(dstDir)
    dst.mkdirs()
    for (table <- Tables.names) {
      val src = Tables.load(spark, srcDir, table)
      val out =
        if (keyCols.contains(table))
          decorrelate(replicate(src, table, factor), table).drop("__replica")
        else src // shared dims: region, nation
      writeSingleFile(out, dst, table)
    }
    java.nio.file.Files.write(completeMarker(dstDir).toPath,
      fingerprint(srcDir, factor).getBytes("UTF-8"))
  }

  /** CLI: ScaleUp <srcDir> <dstDir> [factor=10] */
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleUp <srcDir> <dstDir> [factor=10]")
    val src = args(0)
    val dstDir = args(1)
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-scaleup")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scaleUp(spark, src, dstDir, factor)
    spark.stop()
  }
}
