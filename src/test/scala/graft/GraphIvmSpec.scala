package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Graphs, Ivm}

/** ops/Graphs.triangleCounts and ops/Ivm: hand-checkable graphs and
  * multi-leg view maintenance against direct recomputation. */
class GraphIvmSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tri(edges: (Long, Long)*): Map[Long, Long] =
    Graphs.triangleCounts(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("triangle counts on hand-built graphs") {
    // K3: one triangle, every node in it once
    assert(tri((1L, 2L), (2L, 3L), (1L, 3L)) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // K4: four triangles, each node in three
    val k4 = tri((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(k4 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // path graph: no triangles → empty result
    assert(tri((1L, 2L), (2L, 3L), (3L, 4L)).isEmpty)
    // duplicate + reversed + self-loop edges must not inflate counts
    assert(tri((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (3L, 3L), (1L, 2L)) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("star-plus-rim skew: hub triangle counts stay exact under orientation") {
    // hub 0 linked to 1..20, rim i–(i+1): triangles are (0, i, i+1)
    val spokes = (1L to 20L).map(i => (0L, i))
    val rim = (1L until 20L).map(i => (i, i + 1))
    val got = tri((spokes ++ rim): _*)
    assert(got(0L) == 19L) // one per rim edge
    assert(got(1L) == 1L && got(20L) == 1L && got(10L) == 2L)
  }

  test("maintained view tracks direct recompute over randomized legs") {
    val base = (0 until 400)
      .map(i => (i.toLong, s"k${i % 7}", (i * 37 % 100) / 4.0))
    val keys = Seq("k"); val sums = Seq("v")
    def df(rows: Seq[(Long, String, Double)]) = rows.toDF("id", "k", "v")
    var live = base
    var view = Ivm.init(df(live), keys, sums)
    // leg 1: delete a swath; leg 2: insert replacements; leg 3: mixed —
    // removals derive from the CURRENT live set (a delta naming absent
    // rows is not a valid diff)
    type Rows = Seq[(Long, String, Double)]
    val legs: Seq[Rows => (Rows, Rows)] = Seq(
      cur => (Seq.empty, cur.filter(_._1 % 3 == 0)),
      _ => ((1000 until 1100).map(i => (i.toLong, s"k${i % 11}", i / 8.0)), Seq.empty),
      cur => ((2000 until 2050).map(i => (i.toLong, "k1", 5.0)),
        cur.filter(_._2 == "k2").take(20)))
    for (leg <- legs) {
      val (add, rm) = leg(live)
      live = live.filterNot(rm.toSet) ++ add
      view = Ivm.maintain(view, df(add), df(rm), keys, sums).localCheckpoint(true)
      val direct = Ivm.init(df(live), keys, sums)
      def norm(d: org.apache.spark.sql.DataFrame) =
        d.select(col("k"), col("view_n"), round(col("view_sum_v"), 6).as("sv"))
          .as[(String, Long, Double)].collect().sortBy(_._1).toList
      assert(norm(view) == norm(direct), s"view diverged after leg ($add, $rm)")
    }
    // a key whose rows all vanish must leave the view (no tombstones)
    val wipeK3 = live.filter(_._2 == "k3")
    view = Ivm.maintain(view, df(Seq.empty), df(wipeK3), keys, sums)
    assert(!view.select("k").as[String].collect().contains("k3"))
  }

  private def kcore(k: Int, edges: (Long, Long)*): Map[Long, Long] =
    Graphs.kCore(edges.toDF("a", "b"), "a", "b", k)
      .as[(Long, Long)].collect().toMap

  test("k-core peels tails and cascades") {
    // K4 on 1-4 with a pendant path 4-5-6: k=2 keeps K4 + nothing of
    // the path (5 dies -> 6 dies: the CASCADE), k=3 keeps exactly K4
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val g = k4 ++ Seq((4L, 5L), (5L, 6L))
    assert(kcore(3, g: _*) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(kcore(2, g: _*) ==
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), "pendant path must cascade away")
    // k above the max degree: empty core
    assert(kcore(4, g: _*).isEmpty)
    // duplicate + reversed edges are one undirected edge
    assert(kcore(2, (1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L)) ==
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // degenerate inputs through the lazy-checkpoint loop (r14): an
    // empty edge set converges on the first count, and self-loops
    // alone normalize away to the same empty fixed point
    assert(kcore(1).isEmpty)
    assert(kcore(1, (7L, 7L)).isEmpty)
  }
}
