package graft
import org.apache.spark.sql.functions._
import graft.ops.Sketches
object SSBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val n = 4000000
    val rows = spark.sparkContext.parallelize(1 to n, 8).map(i => s"key_${i % 2000000}").toDF("k")
    rows.cache().count()
    for (cap <- Seq(1024, 4096, 65536)) {
      // warm
      Sketches.spaceSavingTopK(rows, Seq("k"), 10, capacity = cap).collect()
      val t0 = System.nanoTime()
      Sketches.spaceSavingTopK(rows, Seq("k"), 10, capacity = cap).collect()
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"SSBENCH capacity=$cap%6d total=${ms}%8.1f ms  per-row=${ms * 1e6 / n}%6.1f ns")
    }
    spark.stop()
  }
}
