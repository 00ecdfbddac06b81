package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.annotation.meta.field
import graft.annotations.Id
import graft.core.GraftSession
import graft.remote.RemoteGraftSession

/** Remote entity for the persist/find round trip. */
case class RemoteDoc(@(Id @field) id: Long, body: String, score: Double)

/** S8 — remote client source/sink (reference transport/RemoteSession
  * .java:52-130) over the Thrift endpoint with the dialect parser
  * extension. One server per suite: HiveServer2 startup is the
  * expensive part, the per-statement path is what's under test.
  */
class RemoteSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  // HiveServer2 is one-per-JVM: share the endpoint the q_remote gate
  // query uses rather than starting a second server
  private lazy val fixture: (GraftSession, RemoteGraftSession) =
    graft.queries.RemoteQueries.endpointSession(spark, sf)

  test("remote dialect SELECT matches local execute (quirk semantics included)") {
    val (gs, remote) = fixture
    // LIKE-as-contains is dialect-only semantics: a Spark-SQL LIKE
    // would match nothing without wildcards — proves dialect routing
    val sql = "SELECT c_name FROM customer WHERE c_name LIKE 'Customer'"
    val rows = remote.execute(sql).toSeq
    val local = gs.execute(sql).count()
    assert(local > 0 && rows.size == local.toInt)
    assert(rows.forall(_.head.asInstanceOf[String].contains("Customer")))
  }

  test("remote join + aggregate with column metadata") {
    val (gs, remote) = fixture
    val sql = "SELECT n.n_name nname, count(c.c_custkey) ncust FROM nation n, customer c " +
      "WHERE n.n_nationkey = c.c_nationkey GROUP BY n.n_name"
    val rs = remote.execute(sql)
    val rows = rs.toSeq
    val local = gs.execute(sql).count()
    assert(rows.size == local.toInt)
  }

  test("Spark SQL falls through the dialect parser on the same connection") {
    val (_, remote) = fixture
    // no FROM clause — not dialect-parseable, must reach Spark's parser
    val rs = remote.execute("SELECT 40 + 2 AS answer")
    assert(rs.columns == Seq("answer"))
    assert(rs.toSeq.head.head.toString.toInt == 42)
  }

  test("system statements execute remotely") {
    val (_, remote) = fixture
    assert(remote.commit().contains("ok"))
    assert(remote.rollback().contains("ok"))
    assert(remote.statusOf("CONNECT admin").contains("connected"))
  }

  test("remote persist (INSERT) lands in the TableStore; remote find reads it back") {
    val (gs, remote) = fixture
    val dir = java.nio.file.Files.createTempDirectory("graft_remote_docs").toString
    import spark.implicits._
    gs.registerEntity[RemoteDoc]("remote_docs", dir)
    val st = remote.persist("remote_docs",
      rows = Seq(Seq(1L, "alpha doc", 0.5), Seq(2L, "beta doc", 1.5)))
    assert(st.contains("inserted 2 rows"))
    val found = remote.find("remote_docs", "id", 2L)
    assert(found.exists(_("body") == "beta doc"))
    // and the store itself has both rows
    assert(gs.table("remote_docs").count() == 2)
    // dialect SELECT over the fresh table through the remote surface
    val rs = remote.execute("SELECT body FROM remote_docs WHERE score > 1")
    assert(rs.toSeq.map(_.head) == Seq("beta doc"))
  }

  test("FREEZE rejects remote persist until UNFREEZE") {
    val (_, remote) = fixture
    assert(remote.statusOf("FREEZE").contains("frozen"))
    try {
      // frozen is checked before table lookup, so this needs no
      // registered store — FREEZE rejects all writes
      val err = intercept[java.sql.SQLException] {
        remote.persist("remote_docs", rows = Seq(Seq(3L, "gamma", 0.0)))
      }
      assert(err.getMessage.toLowerCase.contains("frozen"))
    } finally {
      // the GraftSession is shared JVM-wide (q_remote, other suites) —
      // never leave it frozen on assertion failure
      assert(remote.statusOf("UNFREEZE").contains("unfrozen"))
    }
  }

  test("dialect opt-in is per connection: a plain JDBC client gets stock Spark SQL") {
    val (_, remote) = fixture
    // bare connection, no graft preamble: spark.graft.dialect stays off
    // in ITS thrift session, so the dialect-registry table is invisible
    val port = graft.queries.RemoteQueries.endpointPort.get
    val conn = java.sql.DriverManager.getConnection(
      s"jdbc:hive2://localhost:$port/default", "anonymous", "")
    try {
      val st = conn.createStatement()
      val err = intercept[java.sql.SQLException] {
        st.executeQuery("SELECT c_name FROM customer WHERE c_name LIKE 'Customer'")
      }
      assert(err.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"))
      st.close()
    } finally conn.close()
    // while the graft client on ITS connection still resolves it
    assert(remote.execute("SELECT c_name FROM customer WHERE c_name LIKE 'Customer'")
      .toSeq.nonEmpty)
  }

  test("remote transaction: COMMIT baselines, ROLLBACK undoes wire persists") {
    val (gs, remote) = fixture
    val dir = java.nio.file.Files.createTempDirectory("graft_remote_tx").toString
    import spark.implicits._
    gs.registerEntity[RemoteDoc]("remote_tx", dir)
    remote.persist("remote_tx", rows = Seq(Seq(1L, "keep", 1.0)))
    assert(remote.commit().contains("committed"))
    remote.persist("remote_tx", rows = Seq(Seq(2L, "discard", 2.0)))
    assert(gs.table("remote_tx").count() == 2)
    assert(remote.rollback().contains("rolled back"))
    val kept = gs.table("remote_tx").collect()
    assert(kept.length == 1 && kept.head.getString(1) == "keep")
  }

  test("transactions are per connection: client B's ROLLBACK leaves client A's writes") {
    val (gs, a) = fixture
    val dir = java.nio.file.Files.createTempDirectory("graft_remote_tx2").toString
    import spark.implicits._
    gs.registerEntity[RemoteDoc]("remote_tx2", dir)
    val port = graft.queries.RemoteQueries.endpointPort.get
    val b = new RemoteGraftSession("localhost", port)
    try {
      // A persists and stays uncommitted; B persists its own row and
      // rolls back. The reference's transactions are per-session
      // (persistent/Session.java) — B's rollback must undo ONLY B.
      a.persist("remote_tx2", rows = Seq(Seq(1L, "from-a", 1.0)))
      b.persist("remote_tx2", rows = Seq(Seq(2L, "from-b", 2.0)))
      assert(gs.table("remote_tx2").count() == 2)
      assert(b.rollback().contains("rolled back 1"))
      val left = gs.table("remote_tx2").collect()
      assert(left.length == 1 && left.head.getString(1) == "from-a", left.toSeq)
      // B's rollback reverted the table to its pre-B-write version,
      // which already contained A's row; A's own rollback now undoes
      // A's write (its baseline is the empty table)
      assert(a.rollback().contains("rolled back 1"))
      assert(gs.table("remote_tx2").count() == 0)
    } finally b.close()
  }

  test("remote ROLLBACK does not revert the local session's writes") {
    val (gs, remote) = fixture
    val dir = java.nio.file.Files.createTempDirectory("graft_remote_tx3").toString
    import spark.implicits._
    val tt = gs.registerEntity[RemoteDoc]("remote_tx3", dir)
    // the LOCAL API writes (its own transaction key)...
    tt.persist(Seq(RemoteDoc(1L, "local write", 1.0)))
    // ...and a remote client that wrote NOTHING to this table rolls back
    assert(remote.rollback().contains("ok"))
    assert(gs.table("remote_tx3").count() == 1,
      "a remote rollback must not touch tables it never wrote")
    // the local transaction still owns its write
    assert(gs.executeSystem("ROLLBACK").contains("rolled back 1"))
    assert(gs.table("remote_tx3").count() == 0)
  }

  test("literal rendering survives quotes, small doubles, and timestamps") {
    val (gs, remote) = fixture
    val dir = java.nio.file.Files.createTempDirectory("graft_remote_lit").toString
    import spark.implicits._
    gs.registerEntity[RemoteDoc]("remote_lit", dir)
    remote.persist("remote_lit",
      rows = Seq(Seq(1L, "O'Brien's doc", 0.0001), Seq(2L, "plain", 12345678.9)))
    val a = remote.find("remote_lit", "id", 1L).get
    assert(a("body") == "O'Brien's doc")
    assert(a("score").asInstanceOf[Double] == 0.0001)
    val b = remote.find("remote_lit", "id", 2L).get
    assert(b("score").asInstanceOf[Double] == 12345678.9)
    // string-keyed find with an apostrophe round-trips too
    assert(remote.find("remote_lit", "body", "O'Brien's doc").isDefined)
  }
}
