package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: prints the formatted physical plan of OP-LEVEL frames
  * whose gate queries pin (localCheckpoint) their results — for those
  * gates, `PlanAudit`'s explain of the final frame shows only the
  * post-checkpoint stub, so the interesting plan (candidate
  * generation, dictionary encode) must be audited at the op seam.
  * Usage: sbt "runMain graft.tools.OpPlanAudit [sfDir] [name ...]"
  */
object OpPlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val wanted = if (args.length > 1) args.drop(1).toSet
      else Set("bpe_encode", "unigram_encode", "minhash_pairs", "kmeans_pairs")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-op-plan-audit")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val embs = graft.core.Tables.load(spark, sfDir, "embeddings")
    def audit(name: String)(df: => org.apache.spark.sql.DataFrame): Unit =
      if (wanted(name)) {
        println(s"\n========== $name ==========")
        try df.explain("formatted")
        catch { case e: Throwable => println(s"[audit] $name failed: ${e.getMessage}") }
      }
    audit("bpe_encode") {
      val merges = graft.ops.Bpe.learnMerges(
        graft.ops.Bpe.wordFreq(docs, "text"), numMerges = 30)
      graft.ops.Bpe.encode(docs, "text", merges)
    }
    audit("unigram_encode") {
      val vocab = graft.ops.Unigram.learn(
        graft.ops.Bpe.wordFreq(docs, "text").select(col("word"), col("wcount")),
        vocabSize = 512, iters = 3, seedSize = 2048, maxPieceLen = 6)
      graft.ops.Unigram.encode(docs, "text", vocab)
    }
    audit("minhash_pairs") {
      graft.ops.Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.7)
    }
    audit("kmeans_pairs") {
      val cents = graft.ops.Similarity.kmeansCentroids(
        embs, "vec_id", "embedding", k = 16)
      graft.ops.Dedup.clusteredSemanticPairsWith(embs, "vec_id", "embedding",
        cents, threshold = 0.4, maxCell = 5000, probes = 2)
    }
    spark.stop()
  }
}
