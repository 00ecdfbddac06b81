package graft.tools

/** Dev utility: print one oracle SQL entry (or write it to a file) so
  * a new/changed oracle can be exercised against DuckDB without a full
  * Verify pass. Usage: runMain graft.tools.DumpOracle <query> [outFile] */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val sql = graft.SparkEntry.oracleSql.getOrElse(args(0),
      sys.error(s"no oracle for ${args(0)}"))
    if (args.length > 1)
      java.nio.file.Files.write(java.nio.file.Paths.get(args(1)),
        sql.getBytes("UTF-8"))
    else println(sql)
    ()
  }
}
