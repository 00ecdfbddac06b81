package graft
import org.apache.spark.sql.functions._
object MMBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val d = "/root/testdata/sf0.1"
    // warm
    graft.queries.PipelineQueries.qMultimodalMeta(spark, d).write.format("noop").mode("overwrite").save()
    val t0 = System.nanoTime()
    graft.queries.PipelineQueries.qMultimodalMeta(spark, d).write.format("noop").mode("overwrite").save()
    println(f"MMBENCH q_multimodal_meta sf0.1: ${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
