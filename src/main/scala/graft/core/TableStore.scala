package graft.core

import java.util.UUID
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cep.{EventProcessor, Process}

/** Mutable table with a version-manifest commit protocol — the
  * ingest/point-op surface of the reference (`session.persist` /
  * `find` / PROCESS delete; reference: persistent/Session.java:436-457,
  * persistent/Table.java:1187-1407).
  *
  * Layout:
  *   <path>/files/<uuid>-part-*.parquet   immutable data files
  *   <path>/_versions/v{N}.manifest       one data-file name per line
  *
  * A version is committed by renaming a temp manifest into place —
  * one atomic filesystem op, so there is NO window where a reader sees
  * a half-written table (the previous copy-on-write delete-then-rename
  * had a data-loss window on crash). Readers resolve the latest
  * manifest at scan time and keep reading that snapshot even while
  * writers commit — single-table snapshot isolation, the same property
  * a transactional table format (Delta/Iceberg) provides; this is the
  * minimal parquet-only version of it for this environment.
  *
  * Appends are the hot path (the reference's 100k objects/s insert
  * claim): executor-parallel columnar writes of NEW files plus one
  * manifest commit — existing data is never rewritten, matching
  * @NoCheck fast-insert semantics (persistent/Table.java:577-584).
  * Upsert/delete rewrite the rows they must (copy-on-write) but commit
  * atomically; old versions remain for time-travel until `vacuum`.
  */
final class TableStore(val spark: SparkSession, val path: String, val idCol: String) {
  private val filesDir = s"$path/files"
  private val versionsDir = s"$path/_versions"

  private def fs: FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def listVersions(f: FileSystem): Seq[(Long, Path)] = {
    val dir = new Path(versionsDir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .map(_.getPath)
      .filter(_.getName.matches("v\\d+\\.manifest"))
      .map(p => (p.getName.stripPrefix("v").stripSuffix(".manifest").toLong, p))
      .sortBy(_._1)
  }

  private def latestManifest(f: FileSystem): Option[(Long, Seq[String])] =
    listVersions(f).lastOption.map { case (v, p) =>
      val in = f.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      (v, txt.split("\n").map(_.trim).filter(_.nonEmpty).toSeq)
    }

  def exists: Boolean = latestManifest(fs).isDefined

  /** Current snapshot. The file list is resolved now; concurrent
    * commits do not disturb this DataFrame. */
  def read: DataFrame = {
    val f = fs
    latestManifest(f) match {
      case Some((_, names)) if names.nonEmpty =>
        spark.read.parquet(names.map(n => s"$filesDir/$n"): _*)
      case Some(_) => // committed empty table: preserve schema via empty scan
        spark.read.parquet(filesDir).limit(0)
      case None =>
        throw new IllegalStateException(s"table store at $path has no committed version")
    }
  }

  /** Write `rows` as new immutable files; returns their names. */
  private def writeFiles(rows: DataFrame): Seq[String] = {
    val f = fs
    f.mkdirs(new Path(filesDir))
    val tmp = s"$path/_tmp_${UUID.randomUUID().toString.take(8)}"
    rows.write.parquet(tmp)
    val parts = f.listStatus(new Path(tmp)).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
    val prefix = UUID.randomUUID().toString.take(8)
    val names = parts.map { p =>
      val name = s"$prefix-${p.getName}"
      f.rename(p, new Path(s"$filesDir/$name"))
      name
    }
    f.delete(new Path(tmp), true)
    names
  }

  /** Atomically commit a new version listing exactly `names`. Retries
    * on version-number collision (optimistic concurrency: rename fails
    * if the manifest already exists). */
  private def commit(names: Seq[String]): Unit = {
    val f = fs
    f.mkdirs(new Path(versionsDir))
    var attempts = 0
    var done = false
    while (!done) {
      val next = latestManifest(f).map(_._1 + 1).getOrElse(0L)
      val tmp = new Path(s"$versionsDir/.tmp-${UUID.randomUUID().toString.take(8)}")
      val out = f.create(tmp, false)
      try out.write((names.mkString("\n") + "\n").getBytes("UTF-8")) finally out.close()
      done = f.rename(tmp, new Path(s"$versionsDir/v$next.manifest"))
      if (!done) {
        f.delete(tmp, false)
        attempts += 1
        if (attempts > 20) throw new IllegalStateException(s"commit contention at $path")
      }
    }
  }

  private def currentNames: Seq[String] = latestManifest(fs).map(_._2).getOrElse(Seq.empty)

  /** Fast insert, no existence check (reference @NoCheck path): new
    * files + manifest commit, nothing rewritten. */
  def append(rows: DataFrame): Unit = {
    val added = writeFiles(rows)
    commit(currentNames ++ added)
  }

  /** `session.persist(o)` = insert-or-update by id
    * (persistent/Session.java:436-457). Copy-on-write of matching rows,
    * atomic commit. */
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

  /** Replace the table contents in one committed version. */
  private def rewrite(df: DataFrame): Unit = commit(writeFiles(df))

  /** Drop data files unreferenced by the latest version and all older
    * manifests (time-travel ends; current snapshot unaffected). */
  def vacuum(): Unit = {
    val f = fs
    listVersions(f).dropRight(1).foreach { case (_, p) => f.delete(p, false) }
    val live = currentNames.toSet
    if (f.exists(new Path(filesDir)))
      f.listStatus(new Path(filesDir)).toSeq.map(_.getPath)
        .filterNot(p => live.contains(p.getName))
        .foreach(p => f.delete(p, false))
  }
}
