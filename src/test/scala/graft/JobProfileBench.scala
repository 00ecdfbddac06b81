package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Ad-hoc job-level profiler for the sequential-action-chain gate
  * queries (r14, VERDICT ask #1): runs one named SparkEntry query
  * against a given SF dir with a listener recording every job's wall
  * time and description, so the chain's floor is attributable to
  * specific actions instead of guessed at. Test scope — never ships
  * in the library jar, never runs in the driver's suite (it is a
  * `main`, not a Suite).
  *
  *   sbt "Test/runMain graft.JobProfileBench q_dedup_incremental /tmp/graft_sf1_..."
  */
object JobProfileBench {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_dedup_incremental")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkTestSession.spark
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Double)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties).flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        val stages = js.stageInfos.map(si => s"${si.name.takeWhile(_ != '(')}:${si.numTasks}")
          .mkString(",")
        jobs.put(js.jobId, (s"$desc [$stages]", js.time))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach { case (desc, t0) =>
          done.add((je.jobId, desc, (je.time - t0) / 1e3))
        }
      }
    })
    val fn = SparkEntry.queries(name)
    // warm pass, then the measured pass (the bench's min-of-2 shape)
    for (pass <- 1 to 2) {
      done.clear()
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the last job-end events land
      val rows = scala.jdk.CollectionConverters.IteratorHasAsScala(done.iterator()).asScala.toSeq
      println(f"== pass $pass: $name wall $wall%.2f s, ${rows.size} jobs, " +
        f"job-sum ${rows.map(_._3).sum}%.2f s ==")
      rows.sortBy(_._1).foreach { case (id, desc, secs) =>
        println(f"  job $id%4d ${secs}%7.3f s  ${desc.take(110)}")
      }
    }
    spark.stop()
  }
}
