package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // graft dialect parser: inert until spark.graft.dialect=on (S8)
    .config("spark.sql.extensions", "graft.remote.GraftExtensions")
    // the thrift-server suite would otherwise drop a spark-warehouse/
    // dir in the repo CWD
    .config("spark.sql.warehouse.dir", graft.core.TempDirs.create("graft_wh_"))
    .getOrCreate()
}

class BatchQueriesSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("every declared query runs and returns rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every query has matching column names with its oracle aliases") {
    // sanity: each oracle entry corresponds to a declared query
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(SparkEntry.queries.contains(k), s"oracle $k has no query")
    }
  }

  test("q1_agg aggregates are stable on sf0.001") {
    val rows = graft.queries.BatchQueries.q1Agg(spark, sf).collect()
    assert(rows.map(_.getString(0)).distinct.sorted.sameElements(Array("A", "N", "R")))
    // count_order column must be positive for every group
    assert(rows.forall(_.getLong(6) > 0))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
