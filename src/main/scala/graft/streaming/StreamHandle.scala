package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import java.util.concurrent.atomic.AtomicLong

/** Client-facing stream result handle mirroring the reference's
  * `StreamQueue` poll/stop API (reference S7: sql/StreamQueue.java:40-134
  * — bounded queue, `poll()` returns next row or null, `stop()` ends the
  * continuous query; per-session resume via stream frame pointers).
  *
  * Spark-native equivalents: a continuous StreamingQuery into a memory
  * sink, `poll` draining the sink table incrementally, `stop()`
  * delegating to StreamingQuery.stop(). Resume-from-last-position comes
  * from checkpointLocation (pass the same checkpoint dir to resume —
  * replaces persistent/Session.java:694-700 bookkeeping).
  */
final class StreamHandle private (spark: SparkSession, query: StreamingQuery,
                                  sinkName: String) {
  private val cursor = new AtomicLong(0L)

  /** Next unread result row, if any has been produced. Non-blocking,
    * like the reference's StreamQueue.poll with timeout semantics. */
  def poll(): Option[Row] = synchronized {
    val rows = spark.table(sinkName).collect()
    val i = cursor.get()
    if (i < rows.length) { cursor.incrementAndGet(); Some(rows(i.toInt)) }
    else None
  }

  /** Drain everything currently produced. */
  def pollAll(): Seq[Row] = synchronized {
    val rows = spark.table(sinkName).collect()
    val i = cursor.getAndSet(rows.length.toLong).toInt
    rows.drop(i).toSeq
  }

  /** Block until all currently-available source data is processed. */
  def processAllAvailable(): Unit = query.processAllAvailable()

  def isActive: Boolean = query.isActive

  /** End the continuous query (reference: sql/StreamQueue.java:79-83). */
  def stop(): Unit = query.stop()
}

object StreamHandle {
  private val counter = new AtomicLong(0L)

  /** Start a continuous query over `stream` into a memory sink and hand
    * back the poll/stop handle. `checkpoint` (optional) enables resume
    * across handles — the reference's continue-from-last-position. */
  def start(spark: SparkSession, stream: DataFrame, mode: OutputMode,
            checkpoint: Option[String] = None,
            triggerMs: Long = 100L): StreamHandle = {
    val name = s"graft_stream_${counter.incrementAndGet()}"
    var w = stream.writeStream.format("memory").queryName(name)
      .outputMode(mode)
      .trigger(Trigger.ProcessingTime(triggerMs)) // reference tail-poll is 100ms (sql/SQLCursor.java:417-419)
    checkpoint.foreach(c => w = w.option("checkpointLocation", c))
    new StreamHandle(spark, w.start(), name)
  }
}
