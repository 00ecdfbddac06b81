package graft.core

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Temp directories for gate/bench table-store round-trips. Gate
  * queries return lazy DataFrames still reading from their temp store,
  * so the dir can't be deleted inline — a shutdown hook reclaims every
  * registered dir when the (short-lived) Verify/Bench JVM exits,
  * instead of accumulating multi-GB parquet copies in /tmp across runs.
  */
object TempDirs {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]()
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      dirs.forEach(p => deleteRecursively(p))
    }))

  /** Create a temp dir that is deleted on JVM exit. */
  def create(prefix: String): String = {
    hookInstalled
    val p = Files.createTempDirectory(prefix)
    dirs.add(p)
    p.toString
  }

  /** Temp dir on tmpfs (/dev/shm) when available, else java.io.tmpdir.
    * Streaming checkpoint latency is dominated by many tiny offset/WAL/
    * state-delta file writes; a RAM-backed fs makes those free. For the
    * LOCAL gate/test harness only — on a cluster a checkpoint must live
    * on storage every node (and a restarted driver) can reach. */
  def createFast(prefix: String): String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (Files.isDirectory(shm) && Files.isWritable(shm)) {
      hookInstalled
      val p = Files.createTempDirectory(shm, prefix)
      dirs.add(p)
      p.toString
    } else create(prefix)
  }

  /** String-path convenience for call sites holding a dir as String. */
  def delete(path: String): Unit = deleteRecursively(java.nio.file.Paths.get(path))

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.deleteIfExists(f))
      finally s.close()
    }
}
