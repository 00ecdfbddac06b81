package graft
import scala.annotation.meta.field
import graft.annotations.{DistributedId, NoCheck}
import graft.core.GraftSession

case class PBChecked(@(DistributedId @field) id: Long, v: Double, tag: String)
case class PBFast(@(DistributedId @field)@(NoCheck @field) id: Long, v: Double, tag: String)

/** Measures the @NoCheck dispatch: second 1M-row batch into an
  * already-populated table, where upsert pays its existence anti-join
  * and append does not (first batch = warm-up + population). */
object PersistBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val n = 1000000L
    def rows[T: org.apache.spark.sql.Encoder](base: Long, f: (Long, Double, String) => T) =
      spark.range(n).map(i => f(base + i + 1, i * 0.5, s"t${i % 100}"))
    def tmp() = java.nio.file.Files.createTempDirectory("graft_pb_").toString
    val gs = new GraftSession(spark)
    val tc = gs.registerEntity[PBChecked]("pb_checked", tmp())
    val tf = gs.registerEntity[PBFast]("pb_fast", tmp())
    tc.persistDs(rows(0, PBChecked.apply))
    tf.persistDs(rows(0, PBFast.apply))
    for (round <- 1 to 2) {
      val t0 = System.nanoTime()
      tc.persistDs(rows(round * n, PBChecked.apply))
      val checked = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      tf.persistDs(rows(round * n, PBFast.apply))
      val fast = (System.nanoTime() - t1) / 1e9
      println(f"PERSISTBENCH round=$round checked=${checked}%.2f s (${n/checked}%.0f rows/s)  nocheck=${fast}%.2f s (${n/fast}%.0f rows/s)")
    }
    spark.stop()
  }
}
