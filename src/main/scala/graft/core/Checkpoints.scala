package graft.core

import org.apache.spark.sql.DataFrame

/** Lazy localCheckpoint with a working "free the blocks" handle.
  *
  * `Dataset.rdd` returns a DERIVED deserializing RDD, not the internal
  * RDD that `localCheckpoint` persisted — so the fixed-point loops'
  * previous `prev.rdd.unpersist(...)` calls were no-ops and every
  * round's checkpoint blocks lived until the ContextCleaner got around
  * to them (r14 ADVICE on kCore/connectedComponents). The persisted
  * RDD is registered with the SparkContext at persist-MARK time (lazy
  * checkpoints included), so diffing the context's persistent-RDD
  * registry around the `localCheckpoint` call captures exactly it.
  *
  * The diff window is our own call on this thread; a concurrent
  * persist from another thread could land in the captured set, and
  * unpersisting a cached RDD is always SAFE in Spark (it recomputes),
  * so the worst interleaving costs a recompute, never correctness.
  */
object Checkpoints {
  /** `df.localCheckpoint(eager = false)` plus an unpersist thunk bound
    * to the internal RDD the checkpoint actually persisted. Call the
    * thunk once the NEXT round's frame is materialized and the
    * previous round's blocks are dead. */
  def lazyLocal(df: DataFrame): (DataFrame, () => Unit) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = df.localCheckpoint(eager = false)
    val fresh = sc.getPersistentRDDs.keySet.diff(before)
    (out, () => fresh.foreach { id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false))
    })
  }
}
