package graft.cep

import org.apache.spark.sql.Row

/** User CEP callback — the reference's sole UDF surface
  * (reference: core/EventProcessor.java:1-7).
  *
  * `process(row)` runs once per matching row; if it returns true AND
  * `delete()` is true, the row is removed from the table
  * (sql/FrameJoinTask.java:193-201). Implementations must be
  * serializable: they execute inside executor tasks, once per partition
  * instance — per-row side effects must be idempotent under Spark task
  * retries (the reference gets exactly-once from its table lock; Spark
  * gives at-least-once on the executor side).
  */
trait EventProcessor extends Serializable {
  def process(row: Row): Boolean
  def delete(): Boolean
}
