package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.{TableStore, TempDirs}

/** The table-is-a-queue stream must deliver COMMITTED rows only.
  * writeFiles renames data into files/ before the manifest commit, so
  * a file source over files/ could emit rows from files that never
  * commit (crashed append, idempotence-race orphans). readStream now
  * tails the commit-time streamed/ mirror instead — an uncommitted
  * parquet dropped straight into files/ must never reach a reader,
  * while committed backlog and tail appends flow through. */
class StoreStreamIsolationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("stream readers never see uncommitted files in files/") {
    val dir = TempDirs.create("graft_stream_iso_")
    val st = new TableStore(spark, dir, "id")
    st.append(Seq((1L, "a"), (2L, "b")).toDF("id", "tag"))

    // simulate a crashed append: a well-formed data file reaches
    // files/ but its commit never happens
    val orphanSrc = TempDirs.create("graft_stream_iso_orphan_")
    Seq((99L, "orphan")).toDF("id", "tag").coalesce(1).write.mode("overwrite").parquet(orphanSrc)
    val part = new java.io.File(orphanSrc).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$dir/files/zz-orphan-${part.getName}"))

    val ckpt = TempDirs.create("graft_stream_iso_ckpt_")
    val q = st.readStream.writeStream.format("memory").queryName("iso_t")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      val backlog = spark.table("iso_t").select("id").as[Long].collect().sorted
      assert(backlog.toSeq == Seq(1L, 2L),
        s"stream delivered uncommitted rows: ${backlog.toSeq}")

      // tail: a committed append arrives; the orphan still does not
      st.append(Seq((3L, "c")).toDF("id", "tag"))
      q.processAllAvailable()
      val all = spark.table("iso_t").select("id").as[Long].collect().sorted
      assert(all.toSeq == Seq(1L, 2L, 3L), s"tail wrong: ${all.toSeq}")
    } finally q.stop()
  }
}
