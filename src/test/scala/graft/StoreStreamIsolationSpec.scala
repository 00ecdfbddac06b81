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

  test("readStream refuses a checkpoint created against the old files/ layout") {
    val dir = TempDirs.create("graft_ckpt_gen_")
    val st = new TableStore(spark, dir, "id")
    st.append(Seq((1L, "a"), (2L, "b")).toDF("id", "tag"))

    // fabricate a pre-r9 checkpoint: FileStreamSource's consumed-paths
    // log referencing the store's files/ directory verbatim
    val oldCkpt = TempDirs.create("graft_ckpt_gen_old_")
    val srcDir = java.nio.file.Paths.get(s"$oldCkpt/sources/0")
    java.nio.file.Files.createDirectories(srcDir)
    val dataFile = new java.io.File(s"$dir/files").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.write(srcDir.resolve("0"),
      ("v1\n" +
        s"""{"path":"file://${dataFile.getAbsolutePath}","timestamp":1000,"batchId":0}"""
      ).getBytes("UTF-8"))
    val refused = intercept[IllegalStateException] {
      st.readStream(Some(oldCkpt))
    }
    assert(refused.getMessage.contains("files/ source layout") &&
      refused.getMessage.contains("Discard the checkpoint"),
      s"refusal lacks the remediation message: ${refused.getMessage}")

    // a checkpoint created against the CURRENT streamed/ layout passes
    // validation on resume, and the layout marker is stamped
    val newCkpt = TempDirs.create("graft_ckpt_gen_new_")
    val q = st.readStream(Some(newCkpt)).writeStream.format("memory")
      .queryName("ckpt_gen_t").option("checkpointLocation", newCkpt).start()
    try q.processAllAvailable() finally q.stop()
    assert(new java.io.File(s"$dir/streamed/_source_v2").exists(),
      "readStream did not stamp the streamed/_source_v2 layout marker")
    st.readStream(Some(newCkpt)) // must not throw
    // an empty/fresh checkpoint dir is also fine
    st.readStream(Some(TempDirs.create("graft_ckpt_gen_fresh_")))
  }
}
