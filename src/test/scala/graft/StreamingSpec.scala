package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.functions._
import graft.core.{GraftSession, TableStore, Tables}
import graft.streaming.{StreamHandle, StreamOps}
import graft.cep.{EventProcessor, Process}
import java.util.concurrent.atomic.AtomicLong

case class TestEvent(event_id: Long, user_id: Long, event_type: String, value: Double)

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("SELECT STREAM filter/projection: backlog then tail (C1/C2)") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[TestEvent]
    // backlog before the query starts — reference replays it first
    mem.addData(TestEvent(1, 10, "click", 1.0), TestEvent(2, 11, "view", 2.0))
    val gs = new GraftSession(spark)
    gs.registerStream("events", mem.toDF())
    val handle = gs.executeStream(
      "select stream e.event_id, e.value from events e where e.event_type = 'click'")
    try {
      handle.processAllAvailable()
      val backlog = handle.pollAll()
      assert(backlog.map(_.getLong(0)) == Seq(1L))
      // tail: new arrivals flow through the same continuous query
      mem.addData(TestEvent(3, 12, "click", 3.0), TestEvent(4, 13, "view", 4.0))
      handle.processAllAvailable()
      val tail = handle.pollAll()
      assert(tail.map(_.getLong(0)) == Seq(3L))
      assert(handle.poll().isEmpty)
    } finally handle.stop()
  }

  test("heavyHittersStream: eviction regime keeps SS bounds across batches") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[String]
    // skewed: "hot" 40×, "warm" 20×, 60 singletons = 120 arrivals
    // across TWO micro-batches so the state round-trip (restore) is
    // exercised. Survival guarantee threshold = N/capacity = 15, so
    // hot (40) and warm (20) MUST be present; singletons may churn.
    mem.addData(Seq.fill(25)("hot") ++ (1 to 30).map(i => s"u$i"): _*)
    val hh = graft.streaming.StreamOps.heavyHittersStream(
      mem.toDF().withColumnRenamed("value", "k"), "k",
      nShards = 1, capacity = 8)
    val q = hh.writeStream.format("memory").queryName("hh_spec")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      mem.addData(Seq.fill(15)("hot") ++ Seq.fill(20)("warm") ++
        (31 to 60).map(i => s"u$i"): _*)
      q.processAllAvailable()
      val all = spark.table("hh_spec")
        .as[(Int, Long, String, Long)].collect()
      val lastRev = all.map(_._2).max
      val fin = all.filter(_._2 == lastRev).map(t => t._3 -> t._4).toMap
      assert(fin.size == 8, s"candidate set must stay at capacity, got ${fin.size}")
      // space-saving: any key with freq > N/capacity survives, and
      // reported counts only OVERESTIMATE true frequency
      assert(fin.contains("hot") && fin("hot") >= 40L,
        s"hot must survive with count >= 40, got ${fin.get("hot")}")
      assert(fin.contains("warm") && fin("warm") >= 20L,
        s"warm must survive with count >= 20, got ${fin.get("warm")}")
      // SS invariant: every arrival adds exactly 1 to the tracked
      // mass (increments and inherit-evictions alike)
      assert(fin.values.sum == 120L,
        s"tracked mass ${fin.values.sum} != 120 arrivals")
    } finally q.stop()
  }

  test("anomalyStream: flags match the sequential replay across batch splits") {
    implicit val sql = spark.sqlContext
    import graft.streaming.StreamOps
    // one noisy key (values ~10 with a spike), one quiet key — the
    // spike must flag against PRE-spike statistics; batch boundary
    // falls inside the noisy key's sequence
    val base = (1 to 12).map(i => ("a", i.toLong, i.toLong, 10.0 + (i % 3) * 0.1)) ++
      (1 to 12).map(i => ("b", i.toLong, i.toLong, 5.0))
    val spike = Seq(("a", 13L, 13L, 50.0), ("a", 14L, 14L, 10.1))
    val mem = MemoryStream[(String, Long, Long, Double)]
    mem.addData(base.filter(_._2 <= 8): _*)
    val df = mem.toDF().toDF("k", "s1", "s2", "v")
    val q = StreamOps.anomalyStream(df, "k", "s1", "s2", "v", z = 3.0, minN = 4)
      .writeStream.format("memory").queryName("anom_spec")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      mem.addData(base.filter(_._2 > 8) ++ spike: _*)
      q.processAllAvailable()
      val got = spark.table("anom_spec")
        .as[(String, Long, Long, Double, Double)].collect().toSeq
        .sortBy(t => (t._1, t._2))
      val ref = StreamOps.anomalyReplay(base ++ spike, z = 3.0, minN = 4)
        .sortBy(t => (t._1, t._2))
      assert(got == ref, s"streamed flags diverge:\n  got $got\n  ref $ref")
      // the spike itself must be flagged; the quiet key never
      assert(got.exists(t => t._1 == "a" && t._2 == 13L), "spike not flagged")
      assert(!got.exists(_._1 == "b"), "zero-variance key flagged")
    } finally q.stop()
  }

  test("throttleStream: accepted set matches the sequential replay across batch splits") {
    implicit val sql = spark.sqlContext
    import graft.streaming.StreamOps
    // window size 10: key "a" floods window 0 (8 rows vs cap 3, the
    // batch boundary falling MID-window so the cap must carry across
    // batches in state), then resumes in window 2 (count must reset);
    // key "b" sits exactly at the cap; key "c" has one row per window
    // (never throttled). Negative seq1 exercises floorDiv windows.
    val rows = (1 to 8).map(i => ("a", i.toLong, i.toLong)) ++
      Seq(("a", 25L, 25L), ("a", 26L, 26L)) ++
      (1 to 3).map(i => ("b", i.toLong, 100L + i)) ++
      Seq(("c", -5L, 1L), ("c", 5L, 2L), ("c", 15L, 3L))
    val mem = MemoryStream[(String, Long, Long)]
    mem.addData(rows.filter(r => r._1 != "a" || r._2 <= 5): _*)
    val df = mem.toDF().toDF("k", "s1", "s2")
    val q = StreamOps.throttleStream(df, "k", "s1", "s2",
        windowSize = 10L, maxPerWindow = 3L)
      .writeStream.format("memory").queryName("thr_spec")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      mem.addData(rows.filter(r => r._1 == "a" && r._2 > 5): _*)
      q.processAllAvailable()
      val got = spark.table("thr_spec")
        .as[(String, Long, Long, Long, Long)].collect().toSeq
        .sortBy(t => (t._1, t._2, t._3))
      val ref = StreamOps.throttleReplay(rows, windowSize = 10L, maxPerWindow = 3L)
        .sortBy(t => (t._1, t._2, t._3))
      assert(got == ref, s"accepted set diverges:\n  got $got\n  ref $ref")
      // the flood is capped at 3 even though rows 4..8 arrive across
      // two batches; the new window resets the count
      assert(got.count(t => t._1 == "a" && t._2 <= 8) == 3, "window cap leaked")
      assert(got.exists(t => t._1 == "a" && t._2 == 25L && t._5 == 1L),
        "new window did not reset the count")
      assert(got.count(_._1 == "c") == 3, "per-window singleton throttled")
    } finally q.stop()
  }

  test("event subscription routes disjoint streams to two subscribers (C8)") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[TestEvent]
    mem.addData(TestEvent(1, 1, "error", 1.0), TestEvent(2, 1, "click", 2.0))
    val bus = new graft.streaming.EventBus
    val errors = bus.subscribe("events", "subA", Some(col("event_type") === "error"))
    val clicks = bus.subscribe("events", "subB", Some(col("event_type") === "click"))
    val q = bus.dispatch("events", mem.toDF())
    try {
      q.processAllAvailable()
      // late registration: subC joins after the first batch and only
      // sees events from the next one (reference: registry-row insert)
      val late = bus.subscribe("events", "subC", Some(col("event_type") === "error"))
      mem.addData(TestEvent(3, 2, "error", 3.0), TestEvent(4, 2, "view", 4.0))
      q.processAllAvailable()
      val gotErrors = errors.pollAll().map(_.getLong(0)).sorted
      val gotClicks = clicks.pollAll().map(_.getLong(0)).sorted
      val gotLate = late.pollAll().map(_.getLong(0)).sorted
      assert(gotErrors == Seq(1L, 3L), s"subA: $gotErrors")
      assert(gotClicks == Seq(2L), s"subB: $gotClicks")
      assert(gotLate == Seq(3L), s"subC (late): $gotLate")
      // unsubscribe stops delivery to that subscriber only
      bus.unsubscribe(errors)
      mem.addData(TestEvent(5, 3, "error", 5.0))
      q.processAllAvailable()
      assert(errors.pollAll().isEmpty)
      assert(late.pollAll().map(_.getLong(0)) == Seq(5L))
    } finally q.stop()
  }

  test("streaming dedup suppresses duplicates across micro-batches") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[TestEvent]
    mem.addData(TestEvent(1, 10, "click", 1.0), TestEvent(2, 10, "click", 2.0),
      TestEvent(3, 11, "view", 3.0))
    val keys = mem.toDF().select(col("user_id").as("uid"), col("event_type").as("t"))
    val deduped = StreamOps.dedupStream(keys, Seq("uid", "t"))
    val name = s"dedup_test_${System.nanoTime()}"
    val q = deduped.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() == 2) // (10,click), (11,view)
      // cross-batch: a duplicate from batch 0 is suppressed by state,
      // a genuinely new key passes
      mem.addData(TestEvent(4, 10, "click", 4.0), TestEvent(5, 12, "click", 5.0))
      q.processAllAvailable()
      val got = spark.table(name).collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((10L, "click"), (11L, "view"), (12L, "click")))
    } finally q.stop()
  }

  test("streaming dedup runs on the RocksDB state store (the 100 TB state path)") {
    // The heap-backed default keeps every state key in executor memory;
    // dedup state at corpus scale is billions of keys. RocksDB spills
    // state to local disk with an LSM — same query, one conf. This
    // locks the op end-to-end on that provider (an isolated session so
    // other suites keep the default).
    val iso = org.apache.spark.sql.graft.CatalystBridge.isolatedCopy(spark)
    iso.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sql = iso.sqlContext
    val mem = MemoryStream[TestEvent]
    mem.addData(TestEvent(1, 10, "click", 1.0), TestEvent(2, 10, "click", 2.0),
      TestEvent(3, 11, "view", 3.0))
    val keys = org.apache.spark.sql.graft.CatalystBridge.withSession(
      mem.toDF().select(col("user_id").as("uid"), col("event_type").as("t")), iso)
    val deduped = StreamOps.dedupStream(keys, Seq("uid", "t"))
    val name = s"dedup_rocks_${System.nanoTime()}"
    val q = deduped.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      mem.addData(TestEvent(4, 10, "click", 4.0), TestEvent(5, 12, "click", 5.0))
      q.processAllAvailable()
      val got = iso.table(name).collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((10L, "click"), (11L, "view"), (12L, "click")))
    } finally q.stop()
  }

  test("streaming tumbling group-by revises per key (C3)") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[TestEvent]
    mem.addData(TestEvent(1, 1, "a", 10), TestEvent(2, 1, "a", 20), TestEvent(3, 1, "b", 5))
    val gs = new GraftSession(spark)
    gs.registerStream("events", mem.toDF())
    val plan = gs.executeStreamPlan(
      "select stream e.event_type t, sum(e.value) s, count(e.event_id) c from events e group by e.event_type")
    val result = StreamOps.runToMemory(spark, plan, "tumbling_out", OutputMode.Complete())
    val byKey = result.collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(byKey("a") == (30.0, 2L) && byKey("b") == (5.0, 1L))
  }

  test("StreamCallable surface: per-row map over a stream") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[TestEvent]
    mem.addData(TestEvent(1, 1, "click", 2.0), TestEvent(2, 1, "view", 3.0))
    val mapped = StreamOps.mapStream(mem.toDS(), (e: TestEvent) => e.value * 10)
    val out = StreamOps.runToMemory(spark, mapped.toDF(), "callable_out",
      org.apache.spark.sql.streaming.OutputMode.Append())
    assert(out.collect().map(_.getDouble(0)).sorted.toSeq == Seq(20.0, 30.0))
  }

  test("watermarked time window: bounded state, late data dropped (C7)") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val stream = mem.toDF().toDF("ts", "k", "v")
    val windowed = StreamOps.tumblingTimeWindow(stream, "ts", "10 minutes", "5 minutes",
      Seq(col("k")), Seq(count(lit(1)).as("n"), sum(col("v")).as("s")))
    val q = windowed.writeStream.format("memory").queryName("timewin_out")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try {
      // window [10:00,10:10): two rows, then advance the watermark past it
      mem.addData((ts(1), "a", 1.0), (ts(5), "a", 2.0))
      q.processAllAvailable()
      mem.addData((ts(21), "a", 4.0)) // watermark -> 10:16, finalizes [10:00,10:10)
      q.processAllAvailable()
      val emitted = spark.table("timewin_out")
        .select(col("window.start").cast("string"), col("n"), col("s")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(emitted.toSeq == Seq(("2026-01-01 10:00:00", 2L, 3.0)))
      // a late row behind the watermark is dropped, not re-opened
      mem.addData((ts(2), "a", 100.0))
      mem.addData((ts(41), "a", 8.0)) // finalizes [10:20,10:30) too
      q.processAllAvailable()
      val after = spark.table("timewin_out")
        .select(col("window.start").cast("string"), col("n"), col("s")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(after.contains(("2026-01-01 10:00:00", 2L, 3.0)), "late row must not reopen the window")
      assert(after.contains(("2026-01-01 10:20:00", 1L, 4.0)))
    } finally q.stop()
  }

  test("stream resume: a second handle with the same checkpoint skips consumed offsets") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_resume_src_").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_resume_cp_").toString
    Seq(TestEvent(1, 1, "click", 1.0), TestEvent(2, 1, "view", 2.0))
      .toDF().write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    def freshSession(): GraftSession = {
      val gs = new GraftSession(spark)
      gs.registerStream("events", spark.readStream.schema(schema).parquet(dir))
      gs
    }
    // first handle consumes the backlog
    val h1 = freshSession().executeStream(
      "select stream e.event_id id from events e", Some(cp))
    try {
      h1.processAllAvailable()
      assert(h1.pollAll().map(_.getLong(0)).sorted == Seq(1L, 2L))
    } finally h1.stop()
    // new data lands while no handle is running
    Seq(TestEvent(3, 2, "click", 3.0), TestEvent(4, 2, "view", 4.0))
      .toDF().write.mode("append").parquet(dir)
    // second handle, same checkpoint: resumes past consumed offsets —
    // the reference's per-session continue-from-last-position
    // (persistent/Session.java:694-700)
    val h2 = freshSession().executeStream(
      "select stream e.event_id id from events e", Some(cp))
    try {
      h2.processAllAvailable()
      assert(h2.pollAll().map(_.getLong(0)).sorted == Seq(3L, 4L))
    } finally h2.stop()
  }

  test("sinkToStore survives checkpoint LOSS without duplicating (exactly-once)") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_sink_src_").toString
    Seq(TestEvent(1, 1, "click", 1.0), TestEvent(2, 1, "view", 2.0),
        TestEvent(3, 2, "click", 3.0))
      .toDF().write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val storeDir = java.nio.file.Files.createTempDirectory("graft_sink_st_").toString
    val store = new TableStore(spark, storeDir, "event_id")
    def drain(cp: String): Unit = graft.streaming.StreamOps.sinkToStore(
      spark.readStream.schema(schema).parquet(src), store, "sinkX", cp)
    drain(java.nio.file.Files.createTempDirectory("graft_sink_cp1_").toString)
    assert(store.read.count() == 3L)
    // checkpoint LOST (fresh dir): Structured Streaming replays the
    // whole source from batch 0 — at-least-once. The store-side txn
    // marker makes the replayed batches no-ops: still exactly once.
    drain(java.nio.file.Files.createTempDirectory("graft_sink_cp2_").toString)
    assert(store.read.count() == 3L,
      "checkpoint loss duplicated the ingested rows")
    // same checkpoint, new data: only the delta lands
    val cp3 = java.nio.file.Files.createTempDirectory("graft_sink_cp3_").toString
    drain(cp3)
    Seq(TestEvent(4, 2, "view", 4.0)).toDF().write.mode("append").parquet(src)
    drain(cp3)
    assert(store.read.count() == 4L)
    assert(store.read.select("event_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))
  }

  test("dialect streaming count window with PARTITION BY keys state per user") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[TestEvent]
    val gs = new GraftSession(spark)
    gs.registerStream("events", mem.toDF())
    val handle = gs.executeStream(
      """select stream e.event_id id, count(e.event_id) c from events e
         window by e.event_id interval = 2 partition by e.user_id""")
    try {
      mem.addData(TestEvent(1, 1, "a", 1), TestEvent(2, 2, "a", 2),
        TestEvent(3, 1, "a", 3), TestEvent(4, 2, "a", 4))
      handle.processAllAvailable()
      // per-user windows fill independently: user 1 at event 3, user 2 at 4
      val ids = handle.pollAll().map(_.getLong(0)).toSet
      assert(ids == Set(3L, 4L))
    } finally handle.stop()
  }

  test("streaming count window emits once buffer is full (C4/A7)") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[TestEvent]
    val gs = new GraftSession(spark)
    gs.registerStream("events", mem.toDF())
    val handle = gs.executeStream(
      "select stream e.event_id id, count(e.event_id) c, sum(e.value) s from events e window by e.event_id interval = 3")
    try {
      // rows 1-2: buffer not full, nothing emitted
      mem.addData(TestEvent(1, 1, "a", 1), TestEvent(2, 1, "a", 2))
      handle.processAllAvailable()
      assert(handle.pollAll().isEmpty)
      // row 3 fills the window; rows 4-5 slide it — state carries across triggers
      mem.addData(TestEvent(3, 1, "a", 3))
      mem.addData(TestEvent(4, 1, "a", 4), TestEvent(5, 1, "a", 5))
      handle.processAllAvailable()
      val rows = handle.pollAll().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(rows == Seq((3L, 3L, 6.0), (4L, 3L, 9.0), (5L, 3L, 12.0)))
    } finally handle.stop()
  }
}

object ProcessCounter { val calls = new AtomicLong(0) }

/** Serializable top-level processor for the PROCESS STREAM test
  * (anonymous classes would capture the spec instance). */
object DropErrorsForTest extends EventProcessor {
  def process(row: org.apache.spark.sql.Row): Boolean = true
  def delete(): Boolean = true
}

class CepSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("PROCESS runs the callback per matching row and deletes (C5)") {
    ProcessCounter.calls.set(0)
    val gs = new GraftSession(spark)
    gs.registerDir(sf)
    val proc = new EventProcessor {
      def process(row: org.apache.spark.sql.Row): Boolean = {
        ProcessCounter.calls.incrementAndGet(); true
      }
      def delete(): Boolean = true
    }
    val res = gs.executeProcess(
      "process e.event_id from events e within 'test.Handler' where e.event_type = 'error'",
      proc, idCol = Some("event_id"))
    val total = Tables.load(spark, sf, "events").count()
    val errors = Tables.load(spark, sf, "events").filter(col("event_type") === "error").count()
    assert(res.processed == errors)
    assert(ProcessCounter.calls.get() == errors)
    assert(res.retained.count() == total - errors)
  }

  test("PROCESS STREAM: continuous callback over backlog then tail, per-batch deletes (C6)") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[TestEvent]
    // backing table state the deletes apply to
    val dir = java.nio.file.Files.createTempDirectory("graft_ps_").toString
    val store = new TableStore(spark, dir, "event_id")
    store.append(Seq(
      TestEvent(1, 1, "error", 1.0), TestEvent(2, 1, "click", 2.0),
      TestEvent(3, 2, "error", 3.0), TestEvent(4, 2, "view", 4.0)).toDF())
    // backlog arrives before the query starts
    mem.addData(TestEvent(1, 1, "error", 1.0), TestEvent(2, 1, "click", 2.0))
    val gs = new GraftSession(spark)
    gs.registerStream("events", mem.toDF())
    val h = gs.executeStreamProcess(
      "process stream e.event_id from events e within 'test.Handler' where e.event_type = 'error'",
      DropErrorsForTest, store = Some(store), idCol = Some("event_id"))
    try {
      h.processAllAvailable()
      assert(h.processedCount == 1) // backlog error row consumed
      assert(store.read.orderBy("event_id").collect().map(_.getLong(0)).toSeq == Seq(2L, 3L, 4L))
      // tail: new arrivals keep flowing through the same continuous query
      mem.addData(TestEvent(3, 2, "error", 3.0), TestEvent(4, 2, "view", 4.0))
      h.processAllAvailable()
      assert(h.processedCount == 2)
      assert(store.read.orderBy("event_id").collect().map(_.getLong(0)).toSeq == Seq(2L, 4L))
    } finally h.stop()
  }

  test("PROCESS STREAM deletes on a registered store are covered by session ROLLBACK") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[TestEvent]
    val dir = java.nio.file.Files.createTempDirectory("graft_ps_tx_").toString
    val store = new TableStore(spark, dir, "event_id")
    store.append(Seq(
      TestEvent(1, 1, "error", 1.0), TestEvent(2, 1, "click", 2.0)).toDF())
    mem.addData(TestEvent(1, 1, "error", 1.0))
    val gs = new GraftSession(spark)
    gs.registerStream("events", mem.toDF())
    gs.registerStore("events_store", store)
    val h = gs.executeStreamProcess(
      "process stream e.event_id from events e within 'test.Handler' where e.event_type = 'error'",
      DropErrorsForTest, store = Some(store), idCol = Some("event_id"))
    try {
      h.processAllAvailable()
      assert(store.read.count() == 1) // the error row was deleted
    } finally h.stop()
    // the stream's deletes were session writes (intent recorded at
    // start): ROLLBACK restores the pre-stream snapshot
    assert(gs.executeSystem("ROLLBACK").contains("rolled back 1"))
    assert(store.read.count() == 2)
  }

  test("streaming bodies never mutate the caller session's conf (isolated sessions)") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val key = "spark.sql.shuffle.partitions"
    val initial = spark.conf.get(key)
    // poll the USER session's conf concurrently with streaming work: a
    // batch query planned at any point during the stream must see the
    // session's own parallelism, never the stream's capped value
    val observed = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val polling = new java.util.concurrent.atomic.AtomicBoolean(true)
    val poller = new Thread(() => while (polling.get()) {
      observed.add(spark.conf.get(key)); Thread.sleep(2)
    })
    poller.start()
    try {
      // memory-sink drain (runToMemory: isolated cloned session)
      val mem = MemoryStream[TestEvent]
      mem.addData(TestEvent(1, 1, "error", 1.0), TestEvent(2, 1, "click", 2.0))
      val gs = new GraftSession(spark)
      gs.registerStream("events", mem.toDF())
      val plan = gs.executeStreamPlan("select stream e.event_id id from events e")
      assert(StreamOps.runToMemory(spark, plan, "conf_iso_out",
        OutputMode.Append()).count() == 2)
      // PROCESS STREAM with per-batch store deletes (isolated micro session)
      val dir = java.nio.file.Files.createTempDirectory("graft_confiso_").toString
      val store = new TableStore(spark, dir, "event_id")
      store.append(Seq(TestEvent(1, 1, "error", 1.0), TestEvent(2, 1, "click", 2.0)).toDF())
      val mem2 = MemoryStream[TestEvent]
      mem2.addData(TestEvent(1, 1, "error", 1.0))
      val gs2 = new GraftSession(spark)
      gs2.registerStream("events", mem2.toDF())
      val h = gs2.executeStreamProcess(
        "process stream e.event_id from events e within 'test.Handler' where e.event_type = 'error'",
        DropErrorsForTest, store = Some(store), idCol = Some("event_id"))
      try h.processAllAvailable() finally h.stop()
      assert(store.read.collect().map(_.getLong(0)).toSeq == Seq(2L))
    } finally { polling.set(false); poller.join() }
    assert(spark.conf.get(key) == initial)
    import scala.jdk.CollectionConverters._
    assert(observed.asScala.toSet == Set(initial),
      s"user session conf leaked during streaming: ${observed.asScala.toSet}")
  }

  test("PROCESS without delete keeps the table intact") {
    val gs = new GraftSession(spark)
    gs.registerDir(sf)
    val proc = new EventProcessor {
      def process(row: org.apache.spark.sql.Row): Boolean = true
      def delete(): Boolean = false
    }
    val res = gs.executeProcess(
      "process e.event_id from events e within 'test.Handler' where e.event_type = 'click'",
      proc, idCol = Some("event_id"))
    assert(res.retained.count() == Tables.load(spark, sf, "events").count())
  }
}

class TableStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmpStore(): TableStore = {
    val dir = java.nio.file.Files.createTempDirectory("graft_store_").toString
    new TableStore(spark, dir, "id")
  }

  test("append / find / upsert / delete lifecycle (persist/find semantics)") {
    val st = tmpStore()
    st.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    assert(st.read.count() == 2)
    assert(st.find(2L).collect().head.getString(1) == "b")
    // persist = insert-or-update by id (reference Session.persist)
    st.upsert(Seq((2L, "b2"), (3L, "c")).toDF("id", "v"))
    assert(st.read.count() == 3)
    assert(st.find(2L).collect().head.getString(1) == "b2")
    st.delete(col("id") === 1L)
    assert(st.read.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
  }

  test("compaction packs small files without changing content") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_").toString
    val st = new TableStore(spark, dir, "id")
    (0 until 6).foreach(w => st.append(Seq((w.toLong, s"v$w")).toDF("id", "v")))
    val before = st.read.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    st.compact(targetFiles = 2)
    assert(st.read.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq == before)
    st.vacuum(graceMs = 0L)
    val files = new java.io.File(s"$dir/files").listFiles().count(_.getName.endsWith(".parquet"))
    assert(files <= 2, s"expected <=2 data files after compact+vacuum, found $files")
  }

  test("time travel: readVersion returns each committed snapshot until vacuum") {
    val st = tmpStore()
    st.append(Seq((1L, "a")).toDF("id", "v"))
    st.append(Seq((2L, "b")).toDF("id", "v"))
    st.deleteKeys(Seq(Tuple1(1L)).toDF("id"))
    val vs = st.versions
    assert(vs.size == 3 && vs == vs.sorted)
    assert(st.readVersion(vs(0)).collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(st.readVersion(vs(1)).orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(st.read.collect().map(_.getLong(0)).toSeq == Seq(2L))
    intercept[IllegalArgumentException] { st.readVersion(999L) }
    // vacuum ends time travel: only the latest version remains listed
    st.vacuum(graceMs = 0L)
    assert(st.versions == Seq(vs.last))
  }

  test("vacuum grace keeps within-window manifests readable (rollback baselines survive)") {
    val st = tmpStore()
    st.append(Seq((1L, "a")).toDF("id", "v"))
    st.append(Seq((2L, "b")).toDF("id", "v"))
    st.compact(targetFiles = 1) // supersedes both original files
    val vs = st.versions
    // a vacuum whose grace covers the transaction window must not eat
    // the rollback baseline — neither its manifest nor its data files
    st.vacuum(graceMs = 60 * 60 * 1000L)
    assert(st.versions == vs, "within-grace manifests must survive vacuum")
    assert(st.readVersion(vs(0)).collect().map(_.getLong(0)).toSeq == Seq(1L))
    st.revertTo(vs(0)) // ROLLBACK's primitive still works after vacuum
    assert(st.read.collect().map(_.getLong(0)).toSeq == Seq(1L))
    // grace 0: time travel ends, only the latest (reverted) version stays
    st.vacuum(graceMs = 0L)
    assert(st.versions == Seq(st.versions.last))
    assert(st.read.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("vacuum pins a journaled rollback target; recovery completes after vacuum") {
    val st = tmpStore()
    st.append(Seq((1L, "a")).toDF("id", "v"))
    val target = st.versions.last
    st.append(Seq((2L, "b")).toDF("id", "v"))
    st.append(Seq((3L, "c")).toDF("id", "v"))
    st.markPendingRevert(target)
    // an aggressive vacuum must not eat the journaled target — dropping
    // it would make the interrupted rollback permanently unrecoverable
    st.vacuum(graceMs = 0L)
    assert(st.versions.contains(target), "journal-pinned manifest must survive vacuum")
    assert(st.recoverPendingRevert(), "recovery must apply the journaled revert")
    assert(st.read.collect().map(_.getLong(0)).toSeq == Seq(1L))
    // journal cleared: the pin is gone, vacuum can now trim history
    st.vacuum(graceMs = 0L)
    assert(st.versions.size == 1)
  }

  test("maintenance converges: compact is a no-op on empty and already-clustered tables") {
    val st = tmpStore()
    st.initialize(Seq((1L, "a")).toDF("id", "v").schema)
    val v0 = st.versions.size
    st.compact(targetFiles = 4, clusterBy = Seq("id"))
    assert(st.versions.size == v0, "compacting an empty table must not commit a version")
    st.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1))
    st.append(Seq((10L, "c"), (11L, "d")).toDF("id", "v").coalesce(1))
    st.compact(targetFiles = 4, clusterBy = Seq("id")) // 2 files, already disjoint in id
    assert(st.versions.size == v0 + 2,
      "re-clustering <=target disjoint files must not churn a version")
  }

  test("clustered compaction: files stop overlapping in the cluster key") {
    val st = tmpStore()
    // interleaved appends: every file's id range spans the whole key
    // space, so keyed pruning degrades to "rewrite everything"
    st.append(Seq((1L, "x"), (50L, "x"), (100L, "x")).toDF("id", "v").coalesce(1))
    st.append(Seq((2L, "y"), (51L, "y"), (99L, "y")).toDF("id", "v").coalesce(1))
    st.append(Seq((3L, "z"), (52L, "z"), (98L, "z")).toDF("id", "v").coalesce(1))
    val ranges0 = st.fileIdRanges
    def overlapping(rs: Seq[(Option[Long], Option[Long])]): Boolean =
      rs.combinations(2).exists {
        case Seq((Some(a), Some(b)), (Some(c), Some(d))) => a <= d && c <= b
        case _ => true
      }
    assert(overlapping(ranges0), "fixture should start overlapped")
    val before = st.read.orderBy("id").collect().map(_.getLong(0)).toSeq
    st.compact(targetFiles = 3, clusterBy = Seq("id"))
    assert(st.read.orderBy("id").collect().map(_.getLong(0)).toSeq == before)
    val ranges1 = st.fileIdRanges
    assert(ranges1.size > 1, "range partitioning should produce multiple files")
    assert(!overlapping(ranges1),
      s"clustered files must carry disjoint id ranges, got $ranges1")
  }

  test("concurrent appends: optimistic commit retry loses no writer") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = java.nio.file.Files.createTempDirectory("graft_conc_").toString
    val st = new TableStore(spark, dir, "id")
    val writers = (0 until 6).map { w =>
      Future { st.append(Seq((w.toLong, s"writer$w")).toDF("id", "v")) }
    }
    Await.result(Future.sequence(writers), 120.seconds)
    // every writer's row committed exactly once, versions linearized
    assert(st.read.orderBy("id").collect().map(_.getLong(0)).toSeq == (0L until 6L))
    val versions = new java.io.File(s"$dir/_versions").listFiles()
      .map(_.getName).filter(_.endsWith(".manifest"))
      .map(_.stripPrefix("v").stripSuffix(".manifest").toLong).sorted
    assert(versions.toSeq == (0L until versions.length).toSeq, "contiguous version chain")
  }

  test("a stale claim from a crashed committer is stolen; commit proceeds") {
    val dir = java.nio.file.Files.createTempDirectory("graft_claim_").toString
    val st = new TableStore(spark, dir, "id")
    st.append(Seq((1L, "a")).toDF("id", "v")) // commits v0
    // plant a dead committer's claim for the NEXT version, backdated
    // past the steal threshold (claim with no manifest = crash)
    val claim = java.nio.file.Paths.get(dir, "_versions", "v1.claim")
    java.nio.file.Files.write(claim, "dead-committer-token".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE_NEW)
    java.nio.file.Files.setLastModifiedTime(claim,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 120000L))
    st.append(Seq((2L, "b")).toDF("id", "v")) // must steal the claim and commit v1
    assert(st.read.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("file-level pruning: upsert/deleteKeys leave non-overlapping files untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft_prune_").toString
    val st = new TableStore(spark, dir, "id")
    st.append((1L to 100L).map(i => (i, s"v$i")).toDF("id", "v"))
    st.append((1000L to 1100L).map(i => (i, s"v$i")).toDF("id", "v"))
    def manifestNames: Set[String] = {
      val vdir = new java.io.File(s"$dir/_versions")
      val latest = vdir.listFiles().filter(_.getName.endsWith(".manifest"))
        .maxBy(_.getName.stripPrefix("v").stripSuffix(".manifest").toLong)
      scala.io.Source.fromFile(latest).getLines()
        .filterNot(_.startsWith("#")) // txn/schema metadata lines
        .map(_.split("\t").head).toSet
    }
    val before = manifestNames
    // upsert touches only the 1000-1100 range: batch-1 files must
    // survive by name (no rewrite), batch-2 files are replaced
    st.upsert(Seq((1050L, "updated")).toDF("id", "v"))
    val after = manifestNames
    val batch2 = before -- after
    assert((before -- batch2).subsetOf(after), "non-overlapping files must be untouched")
    assert(batch2.nonEmpty, "overlapping files must be rewritten")
    assert(st.find(1050L).collect().head.getString(1) == "updated")
    assert(st.read.count() == 201)
    // keyed delete outside batch-1's range leaves it untouched too
    val beforeDel = manifestNames
    st.deleteKeys(Seq(Tuple1(1050L)).toDF("id"))
    assert((beforeDel -- (beforeDel -- manifestNames)).subsetOf(manifestNames))
    assert(st.read.count() == 200)
    // pure insert (no range overlap) rewrites nothing
    val beforeIns = manifestNames
    st.upsert(Seq((5000L, "new")).toDF("id", "v"))
    assert(beforeIns.subsetOf(manifestNames),
      s"pure inserts must not rewrite any file; lost=${beforeIns -- manifestNames} " +
      s"before=$beforeIns after=$manifestNames")
    assert(st.read.count() == 201)
  }

  test("two-phase DELETE WHERE rewrites only files containing matches; NULLs retained") {
    val dir = java.nio.file.Files.createTempDirectory("graft_del2_").toString
    val st = new TableStore(spark, dir, "id")
    // three disjoint files; only the middle one contains matches
    st.append((1L to 50L).map(i => (i, "keep")).toDF("id", "v").coalesce(1))
    st.append(((100L to 120L).map(i => (i, if (i % 2 == 0) "drop" else "keep"))
      :+ (125L, null: String)).toDF("id", "v").coalesce(1))
    st.append((1000L to 1050L).map(i => (i, "keep")).toDF("id", "v").coalesce(1))
    def manifestNames: Set[String] = {
      val vdir = new java.io.File(s"$dir/_versions")
      val latest = vdir.listFiles().filter(_.getName.endsWith(".manifest"))
        .maxBy(_.getName.stripPrefix("v").stripSuffix(".manifest").toLong)
      scala.io.Source.fromFile(latest).getLines()
        .filterNot(_.startsWith("#")) // txn/schema metadata lines
        .map(_.split("\t").head).toSet
    }
    val before = manifestNames
    val vBefore = st.versions.size
    st.delete(col("v") === "drop")
    val after = manifestNames
    // files 1 and 3 contain no matching row: they survive BY NAME
    assert((before & after).size == 2,
      s"expected 2 untouched files, before=$before after=$after")
    // the NULL-v row evaluates the predicate to NULL → retained
    assert(st.read.filter(col("v").isNull).count() == 1)
    assert(st.read.filter(col("v") === "drop").count() == 0)
    assert(st.read.count() == 50 + 10 + 1 + 51) // odd ids in 100-120 = 10, the null row, rest
    // a delete matching nothing commits no version at all
    val vAfter = st.versions.size
    st.delete(col("v") === "no-such-value")
    assert(st.versions.size == vAfter, "no-match delete must not commit")
    assert(vAfter == vBefore + 1)
  }

  test("snapshot isolation: a resolved reader survives concurrent commits; vacuum keeps only live files") {
    val st = tmpStore()
    st.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val snapshot = st.read // resolves version 0's file list now
    st.delete(col("id") === 1L) // commits version 1
    st.append(Seq((3L, "c")).toDF("id", "v")) // version 2
    // the old snapshot still reads its files (no delete-then-rename window)
    assert(snapshot.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(st.read.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
    st.vacuum(graceMs = 0L) // ends time-travel, current state intact
    assert(st.read.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
  }

  test("store-backed PROCESS rewrites the table") {
    val st = tmpStore()
    st.append(Seq((1L, "x"), (2L, "drop"), (3L, "x")).toDF("id", "v"))
    val res = st.process(col("v") === "drop", new EventProcessor {
      def process(row: org.apache.spark.sql.Row): Boolean = true
      def delete(): Boolean = true
    })
    assert(res.processed == 1)
    assert(st.read.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
  }
}
