package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.GraftSession

/** Queries routed through the reference SQL dialect (parser + lowering)
  * end-to-end, proving `GraftSession.execute` against the DuckDB oracle.
  * The dialect's quirks are visible here on purpose: `[..]` IN lists,
  * dd.MM.yyyy date literals, LIKE-as-contains, and `alias.col → aliascol`
  * result naming.
  *
  * Note on aggregates: sums are taken over integer-valued columns
  * (l_quantity, event ids) so results are order-insensitive and
  * hash-exact across engines — the dialect has no ROUND to absorb
  * float reassociation.
  */
object DialectQueries {
  private def session(s: SparkSession, dir: String): GraftSession = {
    val g = new GraftSession(s)
    g.registerDir(dir)
    g
  }

  /** GROUP BY + all five group functions through the dialect. */
  def qSqlAgg(s: SparkSession, dir: String): DataFrame =
    session(s, dir).execute(
      """select l.l_returnflag f, count(l.l_orderkey) c, sum(l.l_quantity) sq,
         min(l.l_quantity) mn, max(l.l_quantity) mx
         from lineitem l group by l.l_returnflag order by l.l_returnflag""")

  /** Manual's dept/emp-shaped multi-table equi-join, via WHERE joins. */
  def qSqlJoin(s: SparkSession, dir: String): DataFrame =
    session(s, dir).execute(
      """select r.r_name rname, n.n_name nname, count(c.c_custkey) n_cust
         from customer c, nation n, region r
         where c.c_nationkey = n.n_nationkey and n.n_regionkey = r.r_regionkey
         group by r.r_name, n.n_name order by r.r_name, n.n_name""")

  /** Bracketed IN list + dd.MM.yyyy date literal + comparison chain. */
  def qSqlFilter(s: SparkSession, dir: String): DataFrame =
    session(s, dir).execute(
      """select o.o_orderkey k, o.o_orderpriority p from orders o
         where o.o_orderpriority in ['1-URGENT', '2-HIGH']
           and o.o_orderdate >= '01.06.1998'
         order by o.o_orderkey""")

  /** LIKE with reference contains-semantics + nested OR level. */
  def qSqlLike(s: SparkSession, dir: String): DataFrame =
    session(s, dir).execute(
      """select p.p_partkey k, p.p_name nm from part p
         where p.p_name like 'ring' or p.p_name like 'bolt'
         order by p.p_partkey""")

  /** WINDOW BY … INTERVAL = n — count-based sliding window
    * (reference: sql/SQLGroupContainer.java:120-158). Global form:
    * lowered via range buckets + carry-over (CountWindow.global), not a
    * one-task sort. */
  def qSqlWindow(s: SparkSession, dir: String): DataFrame =
    session(s, dir).execute(
      """select e.event_id id, count(e.event_id) c, min(e.value) mn, max(e.value) mx
         from events e window by e.event_id interval = 100""")

  /** Keyed count window — the scale path: PARTITION BY bounds the frame
    * per key and distributes the sort across executors (beyond-reference
    * dialect extension). */
  def qSqlWindowKeyed(s: SparkSession, dir: String): DataFrame =
    session(s, dir).execute(
      """select e.user_id uid, e.event_id id, count(e.event_id) c,
         min(e.value) mn, max(e.value) mx
         from events e window by e.event_id interval = 10 partition by e.user_id
         order by e.user_id, e.event_id""")

  /** Global count window over a STRING order column — round 7 closes
    * the last single-partition fallback: strings now range-bucket via
    * CountWindow's monotone byte-prefix proxy, same carry-over scheme
    * as the numeric path. Unique md5 keys make every frame
    * deterministic, so DuckDB replays the window byte-for-byte. */
  def qSqlWindowString(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val g = session(s, dir)
    g.register("dockeys", graft.core.Tables.load(s, dir, "documents")
      .select(md5(col("doc_id").cast("string")).as("skey"), col("n_chars")))
    g.execute(
      """select d.skey k, count(d.skey) c, min(d.n_chars) mn, max(d.n_chars) mx,
         sum(d.n_chars) sq from dockeys d window by d.skey interval = 50
         order by d.skey""")
  }

  /** IN [SELECT …] subquery → left-semi join (the reference detects
    * this form but never evaluates it — sql/ValueCondition.java:92-96;
    * real here, exceeds reference). */
  def qSqlInSubquery(s: SparkSession, dir: String): DataFrame =
    session(s, dir).execute(
      """select o.o_orderkey k, o.o_orderpriority p from orders o
         where o.o_orderkey in [select l.l_orderkey from lineitem l where l.l_quantity >= 49]
         order by o.o_orderkey""")

  /** NOT IN [SELECT …] → left-anti join. */
  def qSqlNotInSubquery(s: SparkSession, dir: String): DataFrame =
    session(s, dir).execute(
      """select c.c_custkey k, c.c_name nm from customer c
         where c.c_custkey not in [select o.o_custkey from orders o
                                   where o.o_orderpriority = '1-URGENT']
         order by c.c_custkey""")

  /** Null-producing scalar funcs (P9): TO_NUMBER of a non-numeric
    * string is NULL on both engines (Spark cast / DuckDB TRY_CAST). */
  def qSqlNullFuncs(s: SparkSession, dir: String): DataFrame =
    session(s, dir).execute(
      """select o.o_orderkey k, to_number(o.o_orderpriority) nc, to_number(o.o_totalprice) np
         from orders o order by o.o_orderkey""")

  /** Custom UDAF through the dialect — the reference's F_CUSTOM slot
    * (sql/SQLGroupFunction.java:53,60-63, a dead stub there) implemented
    * as a typed Aggregator with partial aggregation. Sum-of-squares over
    * integer-valued doubles: exact in IEEE arithmetic, so the oracle's
    * sum(x*x) matches bit-for-bit. */
  def qSqlCustomAgg(s: SparkSession, dir: String): DataFrame = {
    val gs = session(s, dir)
    gs.registerAggregator("sumsq", SumSq)(org.apache.spark.sql.Encoders.scalaDouble)
    gs.execute(
      """select l.l_returnflag f, sumsq(l.l_quantity) ssq, count(l.l_orderkey) c
         from lineitem l group by l.l_returnflag order by l.l_returnflag""")
  }

  /** NOT IN against an EMPTY subquery result: x NOT IN (empty) is TRUE
    * for every row — the three-valued edge the anti-join lowering must
    * not drop (lineitem has no quantity above 1000, so the subquery is
    * provably empty at every sf). */
  def qSqlNotInEmpty(s: SparkSession, dir: String): DataFrame =
    session(s, dir).execute(
      """select o.o_orderkey k, o.o_orderstatus st from orders o
         where o.o_orderkey not in [select l.l_orderkey from lineitem l where l.l_quantity > 1000]
         order by o.o_orderkey""")

  /** Date RANGE comparisons — a documented dialect extension (the
    * reference admits only = and IN on Date columns,
    * sql/NestedCondition.java:190-216). dd.MM.yyyy literals. */
  def qSqlDateRange(s: SparkSession, dir: String): DataFrame =
    session(s, dir).execute(
      """select o.o_orderkey k, o.o_orderstatus st from orders o
         where o.o_orderdate >= '01.06.1997' and o.o_orderdate < '01.06.1998'
         order by o.o_orderkey""")

  /** LAST with defined order (reference semantics: last by monotonic
    * @Id insertion order, sql/SQLColumn.java:157-188) — lowered to
    * max_by(col, idCol), deterministic under shuffling. */
  def qSqlLast(s: SparkSession, dir: String): DataFrame = {
    val gs = new GraftSession(s,
      graft.plan.Lowering.Compat(lastOrderCol = Some("event_id")))
    gs.registerDir(dir)
    gs.execute(
      """select e.event_type t, last(e.value) lv, max(e.event_id) mxid
         from events e group by e.event_type order by e.event_type""")
  }
}

/** Sum-of-squares Aggregator — the gate's F_CUSTOM exemplar. */
object SumSq extends org.apache.spark.sql.expressions.Aggregator[Double, Double, Double] {
  def zero: Double = 0.0
  def reduce(b: Double, a: Double): Double = b + a * a
  def merge(b1: Double, b2: Double): Double = b1 + b2
  def finish(r: Double): Double = r
  def bufferEncoder: org.apache.spark.sql.Encoder[Double] =
    org.apache.spark.sql.Encoders.scalaDouble
  def outputEncoder: org.apache.spark.sql.Encoder[Double] =
    org.apache.spark.sql.Encoders.scalaDouble
}
