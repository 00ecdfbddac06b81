package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Layout

/** Z-order layout: bit-interleave correctness and the data-skipping
  * locality property the rewrite exists for. */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("interleave16 places a-bits on even and b-bits on odd positions") {
    val got = Seq((0xFFFFL, 0L), (0L, 0xFFFFL), (0x0003L, 0x0001L))
      .toDF("a", "b")
      .select(Layout.interleave16(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    assert(got(0) == 0x55555555L, f"a-only must fill even bits, got ${got(0)}%x")
    assert(got(1) == 0xAAAAAAAAL.toLong, f"b-only must fill odd bits, got ${got(1)}%x")
    // a=11, b=01 -> bits: a0->0, a1->2, b0->1 => 0b0111 = 7
    assert(got(2) == 7L, s"mixed interleave, got ${got(2)}")
  }

  test("z-ordered files are tight in BOTH dimensions; plain sort is not") {
    val ev = Tables.load(spark, "/root/testdata/sf0.1", "events")
      .select(col("event_id"), col("user_id"), col("value"))
    def spans(path: String): (Double, Double) = {
      val perFile = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max(col("user_id")) - min(col("user_id"))).cast("double").as("su"),
          (max(col("value")) - min(col("value"))).as("sv"))
        .agg(avg(col("su")), avg(col("sv"))).head()
      (perFile.getDouble(0), perFile.getDouble(1))
    }
    val g = ev.agg((max(col("user_id")) - min(col("user_id"))).cast("double"),
      (max(col("value")) - min(col("value")))).head()
    val (gu, gv) = (g.getDouble(0), g.getDouble(1))
    val zdir = core.TempDirs.create("graft_zorder_spec_")
    val sdir = core.TempDirs.create("graft_sorted_spec_")
    try {
      Layout.zorderWrite(ev, "user_id", "value", zdir)
      // baseline: single-column sorted layout with the same file count
      ev.repartitionByRange(32, col("user_id"))
        .sortWithinPartitions(col("user_id"))
        .write.mode("overwrite").parquet(sdir)
      val (zu, zv) = spans(zdir)
      val (su, sv) = spans(sdir)
      // z-order: both dims well under global span (√(1/32) ≈ 18% ideal)
      assert(zu < 0.5 * gu, s"z-order user_id span $zu vs global $gu")
      assert(zv < 0.5 * gv, s"z-order value span $zv vs global $gv")
      // plain sort: tight on its key, global on the other
      assert(su < 0.2 * gu, s"sorted layout should be tight on its key ($su vs $gu)")
      // (0.6: short edge files pull the mean below the ~100% ideal)
      assert(sv > 0.6 * gv, s"sorted layout's value span should stay near-global ($sv vs $gv)")
      // and z-order beats the sort on the non-key dimension
      assert(zv < 0.6 * sv, s"z-order must beat plain sort on value spans ($zv vs $sv)")
    } finally {
      core.TempDirs.deleteRecursively(java.nio.file.Paths.get(zdir))
      core.TempDirs.deleteRecursively(java.nio.file.Paths.get(sdir))
    }
  }

  test("3D z-order: per-file spans shrink in all three dimensions") {
    val ev = Tables.load(spark, "/root/testdata/sf0.1", "events")
      .select(col("event_id"), col("user_id"), col("value"),
        col("ts").cast("long").as("ep"))
    def spans3(path: String): (Double, Double, Double) = {
      val r = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max(col("user_id")) - min(col("user_id"))).cast("double").as("su"),
          (max(col("value")) - min(col("value"))).as("sv"),
          (max(col("ep")) - min(col("ep"))).cast("double").as("se"))
        .agg(avg(col("su")), avg(col("sv")), avg(col("se"))).head()
      (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    }
    val g = ev.agg(
      (max(col("user_id")) - min(col("user_id"))).cast("double"),
      (max(col("value")) - min(col("value"))),
      (max(col("ep")) - min(col("ep"))).cast("double")).head()
    val (gu, gv, ge) = (g.getDouble(0), g.getDouble(1), g.getDouble(2))
    val zdir = core.TempDirs.create("graft_zorder3_spec_")
    try {
      Layout.zorderWrite3(ev, "user_id", "value", "ep", zdir)
      val (zu, zv, ze) = spans3(zdir)
      // ∛(1/32) ≈ 31% ideal per dim; 0.65 leaves room for edge files
      assert(zu < 0.65 * gu, s"user_id span $zu vs global $gu")
      assert(zv < 0.65 * gv, s"value span $zv vs global $gv")
      assert(ze < 0.65 * ge, s"ep span $ze vs global $ge")
    } finally {
      core.TempDirs.deleteRecursively(java.nio.file.Paths.get(zdir))
    }
  }
}
