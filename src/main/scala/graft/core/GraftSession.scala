package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap
import graft.sqlparse.Parser
import graft.plan.Lowering

/** Session facade mirroring the reference's `Session` surface
  * (reference: persistent/Session.java:181-502 — registerTable /
  * execute / persist / find), rebuilt on SparkSession.
  *
  * Batch `execute` parses the reference dialect and lowers to a lazy
  * DataFrame; the caller iterates it (the reference returns a
  * ResultSet to poll — sql/ResultSetImpl.java:74-99; a Dataset
  * iterator is the Spark-native equivalent).
  */
class GraftSession(val spark: SparkSession,
                   val compat: Lowering.Compat = Lowering.Compat()) {
  private val tables = TrieMap.empty[String, DataFrame]

  /** registerTable equivalent: name → DataFrame (any source). */
  def register(name: String, df: DataFrame): Unit =
    tables.put(name.toLowerCase, df)

  /** Register every driver-generated parquet table from a sf dir. */
  def registerDir(dir: String): Unit =
    Tables.names.foreach(n => register(n, Tables.load(spark, dir, n)))

  def table(name: String): DataFrame =
    tables.getOrElse(name.toLowerCase,
      throw new IllegalArgumentException(s"table not registered: $name"))

  /** Batch SELECT in the reference dialect → lazy DataFrame. */
  def execute(sql: String): DataFrame = {
    val stmt = Parser.parse(sql)
    require(!stmt.stream, "SELECT STREAM goes through executeStream")
    Lowering.lower(stmt, table, compat)
  }
}
