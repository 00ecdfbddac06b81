package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: prints the formatted physical plan of selected gate
  * queries so scan pushdown (PushedFilters/ReadSchema), broadcast
  * choices, and WholeStageCodegen spans can be audited per round.
  * Usage: sbt "runMain graft.PlanAudit [sfDir] [query ...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val wanted = if (args.length > 1) args.drop(1).toSet else Set(
      "q1_agg", "q_join_multiway", "q_filter_pred", "q_sql_window",
      "q_sim_bruteforce", "q_sim_ivf", "q_dedup_minhash", "q_persist_find")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-plan-audit")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.filter(q => wanted.contains(q._1)).toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"[audit] $name failed: ${e.getMessage}") }
      }
    spark.stop()
  }
}
