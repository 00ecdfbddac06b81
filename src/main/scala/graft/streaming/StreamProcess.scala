package graft.streaming

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.cep.{EventProcessor, Process}
import graft.core.TableStore

/** `PROCESS STREAM … WITHIN <class>` — online CEP (reference C6:
  * sql/SQLCursor.java:339-430 with the process flag set;
  * sql/FrameJoinTask.java:187-223). The reference applies the user
  * `EventProcessor` continuously to rows as they arrive and deletes
  * consumed rows from the table.
  *
  * Spark shape: the arriving rows are a Structured Streaming source;
  * each micro-batch runs the callback inside executor partitions (same
  * "tasks move to data" layout as batch PROCESS) via `foreachBatch`,
  * then applies delete-semantics to the backing TableStore as one keyed
  * left-anti rewrite per batch. Checkpointing gives resume — the
  * reference's per-session stream position (persistent/Session.java:694-700).
  *
  * At scale the per-batch rewrite would be a Delta/Iceberg MERGE (row
  * group-level deletes); the parquet copy-on-write store keeps the same
  * API shape in this environment.
  */
object StreamProcess {

  final class Handle private[StreamProcess] (query: StreamingQuery,
                                             processed: AtomicLong) {
    /** For session-scoped lifecycle (see StreamHandle.queryId). */
    private[graft] def queryId: java.util.UUID = query.id
    /** Total rows consumed (process==true) across all batches so far. */
    def processedCount: Long = processed.get()
    def isActive: Boolean = query.isActive
    /** Block until all currently-available source data is processed. */
    def processAllAvailable(): Unit = query.processAllAvailable()
    /** Block until the query terminates (AvailableNow drains and stops). */
    def awaitTermination(): Unit = query.awaitTermination()
    def stop(): Unit = query.stop()
  }

  /** Start the continuous PROCESS over `stream`.
    *
    * @param stream   arriving rows (possibly alias-renamed by the dialect)
    * @param cond     lowered WHERE condition over the stream's columns
    * @param store    table the delete-semantics apply to, with the id
    *                 column name as seen in the STREAM's schema (left)
    *                 mapped to the store's id column
    * @param streamIdCol id column name in the stream's (renamed) schema
    */
  def start(stream: DataFrame, cond: Column, processor: EventProcessor,
            store: Option[TableStore], streamIdCol: Option[String],
            checkpoint: Option[String] = None,
            trigger: Trigger = Trigger.ProcessingTime(100L)): Handle = {
    val processed = new AtomicLong(0L)
    // The per-batch delete rewrite (an anti-join over the affected
    // files) is micro-batch-sized work: run it at modest parallelism on
    // a DEDICATED isolated session, so (a) the cap actually reaches the
    // rewrite's jobs — the store would otherwise plan through the
    // session it was built on — and (b) no session-global conf is ever
    // mutated (a concurrent batch query must never observe a changed
    // shuffle.partitions).
    val microStore = store.map { st =>
      val micro = org.apache.spark.sql.graft.CatalystBridge.isolatedCopy(stream.sparkSession)
      micro.conf.set("spark.sql.shuffle.partitions", "8")
      new TableStore(micro, st.path, st.idCol)
    }
    var w = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (consumed, n) = Process.consumedRows(batch, cond, processor)
        processed.addAndGet(n)
        if (processor.delete()) (microStore, streamIdCol) match {
          case (Some(st), Some(idc)) =>
            st.deleteKeys(consumed.select(col(idc).as(st.idCol)))
          case _ => ()
        }
        consumed.unpersist()
        ()
      }
      .trigger(trigger)
    checkpoint.foreach(c => w = w.option("checkpointLocation", c))
    new Handle(w.start(), processed)
  }
}
