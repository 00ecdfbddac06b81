package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Sessions

/** ops/Sessions: half-open gap boundary (an event at exactly
  * last_ts + gap starts a NEW session), agreement between the native
  * session_window aggregate and the per-row labeler, and key
  * isolation. */
class SessionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ev(rows: (Long, String)*) =
    rows.toDF("uid", "t").select(col("uid"), to_timestamp(col("t")).as("ts"))

  test("exact-gap boundary MERGES; one past the gap splits (closed boundary)") {
    // Spark's session_window (verified here, relied on by the oracle):
    // gap 60s — events :00 and :60 merge; :00 and :61 split
    val df = ev(
      (1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 00:01:00"),
      (2L, "2024-01-01 00:00:00"), (2L, "2024-01-01 00:01:01"))
    val agg = Sessions.sessionAgg(df, "uid", "ts", "60 seconds",
      Seq(count(lit(1)).as("n")))
      .select(col("uid"), col("n")).as[(Long, Long)].collect().sorted
    assert(agg.toList == List((1L, 2L), (2L, 1L), (2L, 1L)),
      s"got ${agg.toList}")
    val lab = Sessions.assignSessions(df, "uid", "ts", 60L)
      .groupBy("uid").agg(countDistinct(col("session_idx")).as("n"))
      .as[(Long, Long)].collect().sorted
    assert(lab.toList == List((1L, 1L), (2L, 2L)))
  }

  test("per-row labels partition events identically to session_window") {
    val events = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val fromAgg = Sessions.sessionAgg(events, "user_id", "ts", "4 hours",
      Seq(count(lit(1)).as("n")))
      .select(col("user_id"), col("session_window.start").as("st"), col("n"))
    val fromLabels = Sessions.assignSessions(events, "user_id", "ts", 4 * 3600L)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts")).as("st"), count(lit(1)).as("n"))
      .select(col("user_id"), col("st"), col("n"))
    assert(fromAgg.exceptAll(fromLabels).isEmpty &&
           fromLabels.exceptAll(fromAgg).isEmpty,
      "session_window and per-row labeling disagree")
  }

  test("sessions never span keys") {
    val df = ev((1L, "2024-01-01 00:00:00"), (2L, "2024-01-01 00:00:01"))
    val agg = Sessions.sessionAgg(df, "uid", "ts", "1 hour",
      Seq(count(lit(1)).as("n")))
    assert(agg.count() == 2)
  }
}
