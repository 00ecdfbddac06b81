package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.annotation.meta.field

import graft.annotations.Id
import graft.core.{GraftSession, Metrics}

case class MPoint(@(Id @field) id: Long, v: String)

/** Observability surface (reference core/Instance.java:405-424
  * registerMetrics): lifecycle timers must tick when the engine runs
  * queries/persists, snapshots must be readable in-process, and the
  * MBeans must be visible on the platform JMX server. */
class MetricsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("executeQuery / persistInsertChunk / persistGetChunk timers tick") {
    import spark.implicits._
    val gs = new GraftSession(spark)
    gs.registerDir(sf)
    val eq0 = Metrics.timer("executeQuery").getCount
    gs.execute("select n_name from nation where n_nationkey > 3").collect()
    assert(Metrics.timer("executeQuery").getCount > eq0)

    val dir = java.nio.file.Files.createTempDirectory("graft_metrics_").toString
    val tt = gs.registerEntity[MPoint]("mpoint", dir)
    val pi0 = Metrics.timer("persistInsertChunk").getCount
    val pg0 = Metrics.timer("persistGetChunk").getCount
    tt.persist(Seq(MPoint(1, "a"), MPoint(2, "b")))
    assert(tt.find(1L).contains(MPoint(1, "a")))
    val pi = Metrics.timer("persistInsertChunk")
    assert(pi.getCount > pi0 && pi.getTotalMillis > 0.0 && pi.getMaxMillis > 0.0)
    assert(Metrics.timer("persistGetChunk").getCount > pg0)
  }

  test("localTask listener observes actions; snapshot exposes all metrics") {
    val gs = new GraftSession(spark) // installs the listener bridge
    gs.registerDir(sf)
    val before = Metrics.timer("localTask").getCount
    gs.execute("select count(c_custkey) cnt from customer").collect()
    // QueryExecutionListener delivery is async — poll briefly
    val deadline = System.nanoTime() + 5000000000L
    while (Metrics.timer("localTask").getCount == before && System.nanoTime() < deadline)
      Thread.sleep(100)
    assert(Metrics.timer("localTask").getCount > before,
      "localTask timer must tick for a collected action")
    val snap = Metrics.snapshot
    assert(snap.contains("timer.executeQuery") && snap.contains("timer.localTask"))
    assert(snap("timer.executeQuery").count > 0)
  }

  test("metrics are published as JMX MBeans like the reference registry") {
    new GraftSession(spark)
    Metrics.timer("executeQuery") // ensure registered
    val mbs = java.lang.management.ManagementFactory.getPlatformMBeanServer
    val on = new javax.management.ObjectName("graft.metrics:type=Timer,name=executeQuery")
    assert(mbs.isRegistered(on), "executeQuery timer must be a registered MBean")
    assert(mbs.getAttribute(on, "Count").asInstanceOf[Long] >= 0L)
  }
}
