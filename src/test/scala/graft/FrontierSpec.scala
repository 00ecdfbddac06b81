package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Frontier

/** Skyline sweep vs the quadratic dominance definition, and the
  * cross-partition threshold carry. */
class FrontierSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("skyline2d equals the quadratic dominance definition") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(2000)((rnd.nextInt(500).toDouble, rnd.nextInt(500).toDouble))
    val df = pts.toDF("x", "y")
    val got = Frontier.skyline2d(df, "x", "y", partitions = 7)
      .as[(Double, Double)].collect().toSet
    val distinct = pts.distinct
    val expect = distinct.filter { case (px, py) =>
      !distinct.exists { case (qx, qy) =>
        qx >= px && qy >= py && (qx > px || qy > py) }
    }.toSet
    assert(got == expect,
      s"missing=${expect -- got} extra=${got -- expect}")
    // frontier is strictly decreasing in y as x descends
    val sorted = got.toSeq.sortBy(-_._1)
    assert(sorted.sliding(2).forall {
      case Seq((_, y1), (_, y2)) => y2 > y1; case _ => true })
  }

  test("skyline2d is partition-count invariant (threshold carry)") {
    val df = Tables()
    for (p <- Seq(1, 3, 32)) {
      val s = Frontier.skyline2d(df, "ep", "value", partitions = p)
        .as[(Double, Double)].collect().toSet
      val base = Frontier.skyline2d(df, "ep", "value", partitions = 2)
        .as[(Double, Double)].collect().toSet
      assert(s == base, s"partitions=$p changed the skyline")
    }
  }

  private def Tables() =
    graft.core.Tables.load(spark, "/root/testdata/sf0.01", "events")
      .select(col("ts").cast("long").as("ep"), col("value"))
}
