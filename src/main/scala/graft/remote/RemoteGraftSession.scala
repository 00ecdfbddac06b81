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
    try {
      st.execute(s"SET ${GraftDialect.ConfKey}=on")
      // stream results through toLocalIterator on the server instead of
      // a full collect — with this, a 100 TB-scale result only ever
      // holds one partition on the driver while the client paginates
      // (SET is per-connection: each Thrift connection owns a session)
      st.execute("SET spark.sql.thriftServer.incrementalCollect=true")
    } finally st.close()
  }

  /** Execute a dialect (or Spark SQL) statement; poll the result.
    * Timed as `remoteTask` (reference Instance.java:409 — remote work
    * units), measured to first result availability. */
  def execute(sql: String): RemoteResultSet = graft.core.Metrics.timer("remoteTask").time {
    val st = conn.createStatement()
    st.setFetchSize(1000)
    try new RemoteResultSet(st.executeQuery(sql), st)
    catch { case e: Throwable => st.close(); throw e }
  }

  /** Statement-form persist: INSERT INTO a graft-backed table
    * (reference RemoteSession.persist, transport/RemoteSession.java:92-101).
    * Values are rendered as literals; strings are quoted, None → NULL. */
  def persist(table: String, rows: Seq[Seq[Any]], columns: Seq[String] = Seq.empty): String = {
    val cols = if (columns.isEmpty) "" else columns.mkString(" (", ", ", ")")
    val values = rows.map(_.map(RemoteGraftSession.literal).mkString("(", ", ", ")"))
      .mkString(", ")
    statusOf(s"INSERT INTO $table$cols VALUES $values")
  }

  /** Primary-key lookup (reference RemoteSession.find,
    * transport/RemoteSession.java:70-80). */
  def find(table: String, idCol: String, id: Any): Option[Map[String, Any]] = {
    val rs = execute(
      s"SELECT * FROM $table WHERE $idCol = ${RemoteGraftSession.literal(id)}")
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

object RemoteGraftSession {
  /** Render a client value as a dialect literal the server-side
    * tokenizer can lex: strings ''-escaped, floating point in plain
    * (never scientific) notation, date/timestamp values as quoted ISO
    * strings (the INSERT command casts them back via Catalyst Cast). */
  private[graft] def literal(v: Any): String = v match {
    case null | None => "null"
    case Some(x) => literal(x)
    case s: String => "'" + s.replace("'", "''") + "'"
    // valueOf keeps Double.toString's shortest-roundtrip digits (a raw
    // new BigDecimal(d) would expand the exact binary fraction)
    case d: Double => java.math.BigDecimal.valueOf(d).toPlainString
    case f: Float => new java.math.BigDecimal(f.toString).toPlainString
    case b: java.math.BigDecimal => b.toPlainString
    case b: BigDecimal => b.underlying.toPlainString
    case t: java.util.Date => "'" + t.toString + "'" // sql.Date/Timestamp: ISO
    case other => other.toString
  }
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
