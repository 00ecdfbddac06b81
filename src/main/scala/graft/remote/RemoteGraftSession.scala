package graft.remote

import java.sql.{Connection, DriverManager, Statement}

/** Thin remote client for a [[GraftServer]] endpoint — the reference's
  * `RemoteSession` surface (transport/RemoteSession.java:52-130:
  * execute / persist / find / commit / rollback from another JVM)
  * rebuilt on the HiveServer2 JDBC protocol. Needs only `hive-jdbc`
  * on the client classpath — no Spark runtime, like the reference
  * client needs only its transport jar.
  *
  * Results stream in server-side batches (`fetchSize` = 1000, the
  * reference's remote batch size — sql/SQLCursor.java:85-86); the
  * driver never materializes the full result, mirroring
  * `RemoteResultSet.poll`'s incremental pull.
  */
final class RemoteGraftSession(host: String, port: Int,
                               user: String = "anonymous") extends AutoCloseable {
  Class.forName("org.apache.hive.jdbc.HiveDriver")
  private val conn: Connection =
    DriverManager.getConnection(s"jdbc:hive2://$host:$port/default", user, "")
  locally {
    val st = conn.createStatement()
    try st.execute(s"SET ${GraftDialect.ConfKey}=on") finally st.close()
  }

  /** Execute a dialect (or Spark SQL) statement; poll the result. */
  def execute(sql: String): RemoteResultSet = {
    val st = conn.createStatement()
    st.setFetchSize(1000)
    new RemoteResultSet(st.executeQuery(sql), st)
  }

  /** Statement-form persist: INSERT INTO a graft-backed table
    * (reference RemoteSession.persist, transport/RemoteSession.java:92-101).
    * Values are rendered as literals; strings are quoted, None → NULL. */
  def persist(table: String, rows: Seq[Seq[Any]], columns: Seq[String] = Seq.empty): String = {
    def lit(v: Any): String = v match {
      case null | None => "null"
      case Some(x) => lit(x)
      case s: String => "'" + s.replace("'", "''") + "'"
      case other => other.toString
    }
    val cols = if (columns.isEmpty) "" else columns.mkString(" (", ", ", ")")
    val values = rows.map(_.map(lit).mkString("(", ", ", ")")).mkString(", ")
    statusOf(s"INSERT INTO $table$cols VALUES $values")
  }

  /** Primary-key lookup (reference RemoteSession.find,
    * transport/RemoteSession.java:70-80). */
  def find(table: String, idCol: String, id: Any): Option[Map[String, Any]] = {
    val idLit = id match {
      case s: String => "'" + s.replace("'", "''") + "'"
      case other => other.toString
    }
    val rs = execute(s"SELECT * FROM $table WHERE $idCol = $idLit")
    try rs.poll().map(row => rs.columns.zip(row).toMap) finally rs.close()
  }

  def commit(): String = statusOf("COMMIT")
  def rollback(): String = statusOf("ROLLBACK")

  /** Any statement executed for its status line (system statements,
    * SET, INSERT). */
  def statusOf(sql: String): String = {
    val st = conn.createStatement()
    try {
      if (st.execute(sql)) {
        val rs = st.getResultSet
        try { if (rs.next()) rs.getString(1) else "ok" } finally rs.close()
      } else "ok"
    } finally st.close()
  }

  override def close(): Unit = conn.close()
}

/** Incremental result cursor (reference `RemoteResultSet`:
  * transport/RemoteResultSet.java — poll() until null). */
final class RemoteResultSet(rs: java.sql.ResultSet, st: Statement)
    extends AutoCloseable with Iterator[Seq[Any]] {
  val columns: Seq[String] = {
    val md = rs.getMetaData
    // HiveServer2 qualifies names as `alias.col` for some plans; the
    // reference returns bare entity column names — strip the qualifier
    (1 to md.getColumnCount).map { i =>
      val n = md.getColumnName(i)
      n.substring(n.lastIndexOf('.') + 1)
    }
  }
  private var nextRow: Option[Seq[Any]] = None
  private var finished = false

  /** Next row or None when the stream ends (reference poll()). */
  def poll(): Option[Seq[Any]] =
    if (hasNext) { val r = nextRow; nextRow = None; r } else None

  override def hasNext: Boolean = {
    if (nextRow.isEmpty && !finished) {
      if (rs.next()) nextRow = Some(columns.indices.map(i => rs.getObject(i + 1)))
      else { finished = true; close() }
    }
    nextRow.isDefined
  }
  override def next(): Seq[Any] =
    poll().getOrElse(throw new NoSuchElementException("result drained"))

  override def close(): Unit = { rs.close(); st.close() }
}
