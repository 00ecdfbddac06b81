package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.GraftSession

/** Physical-plan audits: the scale properties SCALE.md claims must be
  * visible in the executed plan, not just asserted in prose — pushdown
  * reaching the parquet scan, column pruning in ReadSchema, broadcast
  * dispatch for dim joins, and two-phase (partial/final) aggregation.
  * A regression in any of these silently multiplies IO/shuffle at
  * 100 TB while every row-level correctness test stays green.
  */
class PlanAuditSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark
  private lazy val gs = {
    val g = new GraftSession(spark)
    g.registerDir(sf)
    g
  }

  test("dialect WHERE is pushed to the parquet scan; projection prunes ReadSchema") {
    val df = gs.execute(
      "select o.o_orderkey k from orders o where o.o_orderstatus = 'F'")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(o_orderstatus,F)"),
      s"filter not pushed to scan:\n$plan")
    val readSchema = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.contains("o_orderkey") && readSchema.contains("o_orderstatus") &&
      !readSchema.contains("o_totalprice") && !readSchema.contains("o_comment"),
      s"scan reads more columns than the query needs: $readSchema")
  }

  test("dim-table join dispatches to broadcast hash join") {
    val df = queries.BatchQueries.qJoinBroadcast(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("aggregation is two-phase (map-side partial + final)") {
    val df = queries.BatchQueries.q1Agg(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val hashAggs = plan.linesIterator.count(_.contains("HashAggregate"))
    assert(hashAggs >= 2, s"expected partial+final HashAggregate:\n$plan")
  }

  // the executed AQE plan prints "== Final Plan ==" then "== Initial
  // Plan ==" — audits must read only what actually ran
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // AQE finalizes the physical plan only on execution
    val s = df.queryExecution.executedPlan.toString
    s.split("== Initial Plan ==").head
  }

  test("per-source cap shuffles once on source; hash split shuffles only the rollup") {
    // q_source_cap: row_number needs exactly one hash exchange on
    // `source` (plus the final orderBy's range exchange) — a global
    // sort here would serialize 100 TB through one task chain. Spark
    // additionally plans a PARTIAL WindowGroupLimit before the
    // exchange: each input partition pre-trims to the cap per source,
    // so a heavy-hitter source ships at most cap rows per upstream
    // partition instead of its full row count (the skew guard).
    val capPlan = finalPlan(queries.PipelineQueries.qSourceCap(spark, sf))
    assert(capPlan.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      s"expected 1 hash exchange (source):\n$capPlan")
    assert(capPlan.contains("WindowGroupLimit") && capPlan.contains("Partial"),
      s"expected partial window-group-limit pre-trim before the shuffle:\n$capPlan")
    // q_split_hash: bucket assignment is map-side; the only shuffle is
    // the 3-group rollup (partial/final HashAggregate around it)
    val splitPlan = finalPlan(queries.PipelineQueries.qSplitHash(spark, sf))
    assert(splitPlan.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"split rollup must be two-phase:\n$splitPlan")
    assert(splitPlan.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 1,
      s"hash split must not shuffle rows before the rollup:\n$splitPlan")
  }

  test("pipeline text scan stays inside whole-stage codegen end-to-end") {
    val df = queries.PipelineQueries.qTextQuality(spark, sf)
    df.collect() // AQE finalizes the physical plan only on execution
    val plan = df.queryExecution.executedPlan.toString
    // codegen spans render as "*(n) Operator" in the final AQE plan
    assert(plan.contains("*(1)"),
      s"no codegen span in text-quality plan:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"),
      "UDF leaked into the text-quality scan")
  }
}
