package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name subset (local
    // iteration only — the driver always passes two args = full run)
    val (sfDir, outDir, only) = args match {
      case Array(a, b)    => (a, b, None)
      case Array(a, b, c) => (a, b, Some(c.split(',').toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // PROCESS callbacks are at-least-once under task retries; no
      // speculative duplicates in the gate session (see SCALE.md)
      .config("spark.speculation", "false")
      // q_remote (S8) runs the dialect through the Thrift endpoint
      .config("spark.sql.extensions", "graft.remote.GraftExtensions")
      .config("spark.sql.warehouse.dir", graft.core.TempDirs.create("graft_wh_"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.remote.GraftServer.quietMetastoreLogs()
    new java.io.File(outDir).mkdirs()
    // Oracle AUX channel (r17, q_dedup_kmeans promotion): gates whose
    // oracle needs a gate-trained artifact that pure SQL cannot
    // re-derive (the k-means codebook — distributed double-sum
    // training is not order-replayable) persist it HERE during their
    // run; the dumped oracle SQL references it by absolute path (the
    // __GRAFT_AUX__ substitution below), sibling to outDir so the
    // driver's DuckDB — which already reads outDir's parquet — can
    // read it from the same filesystem. Set only by Verify: bench and
    // production runs never pay the write.
    val auxDir = new java.io.File(
      outDir.replaceAll("/+$", "") + "_aux").getAbsolutePath
    spark.conf.set("spark.graft.oracle.auxDir", auxDir)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("__GRAFT_AUX__", auxDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    graft.queries.RemoteQueries.stopAll()
    spark.stop()
  }
}
