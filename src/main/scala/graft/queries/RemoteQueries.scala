package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.core.GraftSession
import graft.remote.{GraftServer, RemoteGraftSession}

/** S8 gate query: a dialect statement executed end-to-end THROUGH the
  * remote surface — Thrift endpoint, JDBC wire, batched fetch — and
  * re-materialized driver-side, the way a reference `RemoteSession`
  * client consumes results (transport/RemoteResultSet.java poll loop).
  */
object RemoteQueries {

  /** One active endpoint per JVM: HiveServer2 holds JVM-global service
    * state and a second instance refuses to start, so every caller
    * (gate query, specs) shares this one — bound to the first sf dir
    * requested for the life of the JVM. */
  private var current: Option[(String, GraftSession, GraftServer.Handle, RemoteGraftSession)] =
    None

  /** Server startup is deployment cost, not per-query cost: Bench
    * warms this before the timed loop, like its parquet-reader warm-up.
    * Returns the server-side GraftSession too (tests register extra
    * entities on it). */
  def endpointSession(s: SparkSession, dir: String): (GraftSession, RemoteGraftSession) =
    synchronized {
      current match {
        case Some((d, gs, _, remote)) if d == dir => (gs, remote)
        case Some((d, _, _, _)) =>
          // HiveServer2 cannot be restarted in-process (stop leaves
          // JVM-global service state behind; an attempted restart
          // hangs), so a different sf dir is a caller error here —
          // callers that genuinely need to move the endpoint re-point
          // its registrations with [[rebind]] instead.
          throw new IllegalStateException(
            s"remote endpoint already bound to $d in this JVM; use rebind($dir)")
        case None =>
          val gs = new GraftSession(s)
          gs.registerDir(dir)
          val srv = GraftServer.start(gs)
          val remote = new RemoteGraftSession("localhost", srv.port)
          current = Some((dir, gs, srv, remote))
          (gs, remote)
      }
    }

  def endpoint(s: SparkSession, dir: String): RemoteGraftSession =
    endpointSession(s, dir)._2

  /** Re-point the live endpoint's table registrations at a different
    * sf dir. No server restart is needed (HiveServer2 couldn't restart
    * in-process anyway): registrations are per-query providers, so the
    * NEXT statement already scans the new dir. This is how the bench's
    * scaling pass runs q_remote against the derived corpus — the full
    * S8 wire path (Thrift, JDBC, batched fetch) stays exercised, only
    * the tables behind it move. No-op when no endpoint is up. */
  def rebind(dir: String): Unit = synchronized {
    current match {
      case Some((d, gs, srv, remote)) if d != dir =>
        gs.registerDir(dir)
        current = Some((dir, gs, srv, remote))
      case _ => ()
    }
  }

  /** Listening port of the active endpoint, if one is up (tests open
    * extra raw connections against it). */
  def endpointPort: Option[Int] = synchronized {
    current.map { case (_, _, srv, _) => srv.port }
  }

  /** Orderly teardown before SparkContext stop (a live endpoint would
    * log stopped-context errors from its session manager). */
  def stopAll(): Unit = synchronized {
    current.foreach { case (_, _, srv, remote) =>
      try remote.close() finally srv.stop()
    }
    current = None
  }

  /** Dialect join + aggregate over JDBC; the driver sees only the 25
    * aggregated rows — all heavy lifting stays server-side. */
  def qRemote(s: SparkSession, dir: String): DataFrame = {
    val remote = endpoint(s, dir)
    val rs = remote.execute(
      """select n.n_name nname, count(c.c_custkey) ncust
         from customer c, nation n
         where c.c_nationkey = n.n_nationkey
         group by n.n_name order by n.n_name""")
    val rows = rs.map(Row.fromSeq).toList
    val schema = StructType(Seq(
      StructField("nname", StringType), StructField("ncust", LongType)))
    s.createDataFrame(scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, schema)
  }
}
