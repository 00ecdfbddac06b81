package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cep.{EventProcessor, Process}

/** Mutable parquet-backed table — the ingest/point-op surface of the
  * reference (`session.persist` / `find` / PROCESS delete; reference:
  * persistent/Session.java:436-457, persistent/Table.java:1187-1407).
  *
  * Layout: parquet files under `<path>/data`, rewritten copy-on-write for
  * mutations; appends add files. On a real deployment this would be a
  * transactional table format (Delta/Iceberg) giving snapshot isolation
  * and MERGE — not available in this environment, so the store keeps
  * the same API shape with parquet + atomic directory swap. Appends are
  * the hot path (the reference's 100k objects/s insert claim): a plain
  * parquet append is a pure executor-parallel columnar write, no
  * existence check, matching @NoCheck fast-insert semantics
  * (persistent/Table.java:577-584).
  */
final class TableStore(val spark: SparkSession, val path: String, val idCol: String) {
  private val dataDir = s"$path/data"

  private def fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists: Boolean = fs.exists(new Path(dataDir))

  def read: DataFrame = spark.read.parquet(dataDir)

  /** Fast insert, no existence check (reference @NoCheck path). */
  def append(rows: DataFrame): Unit =
    rows.write.mode("append").parquet(dataDir)

  /** `session.persist(o)` = insert-or-update by id
    * (persistent/Session.java:436-457). Copy-on-write merge. */
  def upsert(rows: DataFrame): Unit = {
    if (!exists) { append(rows); return }
    val merged = read.join(rows.select(col(idCol)), Seq(idCol), "left_anti")
      .unionByName(rows)
    rewrite(merged)
  }

  /** `session.find(cls, id)` (persistent/Session.java:326-342). A scan
    * with key predicate — parquet min/max skipping prunes row groups;
    * at scale, partition or Z-order by the key. */
  def find(id: Any): DataFrame = read.filter(col(idCol) === lit(id))

  /** DELETE WHERE: removes rows where the condition is TRUE only —
    * NULL-evaluating rows are retained (SQL three-valued semantics;
    * a bare `!cond` would silently drop them). */
  def delete(condition: Column): Unit =
    rewrite(read.filter(not(coalesce(condition, lit(false)))))

  /** Delete by key set: one left-anti join on the id column — the
    * delete path PROCESS STREAM uses per micro-batch (consumed row ids
    * stay distributed; no key list ever reaches the driver). */
  def deleteKeys(keys: DataFrame): Unit = {
    val k = keys.select(col(idCol)).distinct()
    rewrite(read.join(k, Seq(idCol), "left_anti"))
  }

  /** PROCESS … WITHIN over this table: run the callback, persist the
    * post-delete state (reference: cluster-locked table rewrite —
    * sql/SQLSelect.java:278-285). */
  def process(condition: Column, processor: EventProcessor): Process.Result = {
    val res = Process.run(read, condition, processor, Some(idCol))
    if (processor.delete()) rewrite(res.retained)
    res
  }

  /** Copy-on-write: write to a side dir, swap atomically. */
  private def rewrite(df: DataFrame): Unit = {
    val tmp = s"$path/data_tmp"
    df.write.mode("overwrite").parquet(tmp)
    val dataPath = new Path(dataDir)
    val f = fs
    if (f.exists(dataPath)) f.delete(dataPath, true)
    f.rename(new Path(tmp), dataPath)
  }
}
