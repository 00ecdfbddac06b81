package graft.sqlparse

/** §2.10 system statements (reference: sql/SQLStatementFactory.java:56-73
  * routes ALTER SYSTEM / CONNECT / ALTER SESSION / COMMIT / ROLLBACK /
  * FREEZE to SQLSystem, sql/SQLSystem.java:81-170). The grammar is flat
  * keyword matching there, and here.
  */
object SystemParser {
  sealed trait SysStmt
  case object Commit extends SysStmt
  case object Rollback extends SysStmt
  case object Freeze extends SysStmt
  case object Unfreeze extends SysStmt
  /** action ∈ STARTUP | SHUTDOWN (INSTANCE). */
  final case class AlterSystem(action: String) extends SysStmt
  /** ALTER SESSION SET key = value. */
  final case class AlterSession(key: String, value: String) extends SysStmt
  /** CONNECT <target> (remote sessions are out of v0 scope — parsed,
    * rejected at execution with a clear message). */
  final case class Connect(target: String) extends SysStmt

  /** None if the text is not a system statement (caller falls through
    * to the SELECT/PROCESS parser). */
  def parse(sql: String): Option[SysStmt] = {
    val words = sql.trim.split("\\s+").toList
    val up = words.map(_.toUpperCase)
    up match {
      case "COMMIT" :: Nil => Some(Commit)
      case "ROLLBACK" :: Nil => Some(Rollback)
      case "FREEZE" :: Nil => Some(Freeze)
      case "UNFREEZE" :: Nil => Some(Unfreeze)
      case "ALTER" :: "SYSTEM" :: action :: rest
          if (action == "STARTUP" || action == "SHUTDOWN") &&
            (rest.isEmpty || rest == List("INSTANCE")) =>
        Some(AlterSystem(action))
      case "ALTER" :: "SESSION" :: "SET" :: _ =>
        // key = value with original casing from the raw text
        val kv = sql.trim.split("\\s+", 4).last
        kv.split("=", 2).map(_.trim) match {
          case Array(k, v) if k.nonEmpty && v.nonEmpty => Some(AlterSession(k, v))
          case _ => None
        }
      case "CONNECT" :: _ =>
        Some(Connect(words.drop(1).mkString(" ")))
      case _ => None
    }
  }
}
