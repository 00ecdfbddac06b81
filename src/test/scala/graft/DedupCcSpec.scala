package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup

/** ops/Dedup.connectedComponents: the alternating-star rounds must
  * equal a reference union-find on ANY graph — chains (multi-hop
  * merging the corpus gate's pair structure doesn't exercise), cycles,
  * stars, forests, and seeded random graphs. */
class DedupCcSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def unionFind(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    verts.map(v => v -> find(v)).toMap
  }

  private def ccOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("chain, cycle, star, and two-component graphs match union-find") {
    val cases = Seq(
      (1L to 9L).sliding(2).map(s => (s(0), s(1))).toSeq, // 9-node path
      Seq((1L, 2L), (2L, 3L), (3L, 1L)),                  // triangle
      (2L to 8L).map(i => (1L, i)),                       // star
      Seq((10L, 20L), (20L, 30L), (40L, 50L)),            // two comps
      Seq((5L, 5L)),                                      // self-loop only
      Seq.empty[(Long, Long)])                            // empty
    cases.foreach { edges =>
      val expect = unionFind(0, edges.filter(e => e._1 != e._2))
      assert(ccOf(edges) == expect, s"edges=$edges")
    }
  }

  test("seeded random graphs (100 vertices) match union-find") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { trial =>
      val edges = Seq.fill(60)((rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
        .filter(e => e._1 != e._2)
      assert(ccOf(edges) == unionFind(100, edges), s"trial $trial")
    }
  }

  test("CC is idempotent: components of a star forest are the stars") {
    val edges = Seq((1L, 5L), (5L, 9L), (2L, 7L)) // comps {1,5,9},{2,7}
    val first = ccOf(edges)
    // feed the (id, component) labeling back in as edges: components
    // must be unchanged for every labeled vertex
    val second = ccOf(first.toSeq.filter(kv => kv._1 != kv._2))
    assert(second.forall { case (id, c) => first(id) == c }, s"$second vs $first")
  }

  test("adversarial descending chain converges (multi-hop min propagation)") {
    // a descending path 99-98-…-0: naive min-flooding needs ~99
    // rounds; alternating-star must finish inside the iteration cap
    val edges = (0L until 99L).map(i => (99L - i, 98L - i))
    val got = ccOf(edges)
    assert(got.values.toSet == Set(0L) && got.size == 100)
  }
}
