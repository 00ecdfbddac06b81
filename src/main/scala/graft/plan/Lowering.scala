package graft.plan

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.sqlparse.Ast._

/** Lowers the dialect AST to a declarative DataFrame plan.
  *
  * Spark-first by construction: tables are chained with crossJoin and
  * all WHERE conditions become one filter — Catalyst's
  * ExtractFiltersAndInnerJoins/ReorderJoin rewrites the
  * filter-over-cross-join into proper equi-joins and picks
  * broadcast/sort-merge physically, which strictly dominates the
  * reference's fixed-weight dispatcher (sql/SQLJoinDispatcher.java:56-60).
  *
  * Reference semantics preserved (the `Compat` switches):
  *  - LIKE is substring-contains (sql/NestedCondition.java:173-188)
  *  - AVG over integer columns is integer division
  *    (sql/SQLGroupFunction.java:66-74,95-103) when intAvg=true
  *  - date literals parse with the configured format, default
  *    dd.MM.yyyy (core/Config.java:94)
  *  - quoted empty string is NULL (sql/ValueCondition.java:58-60)
  *  - result columns of `a.col` are named `acol` (sql/CList.java:70-78)
  */
object Lowering {

  final case class Compat(
      dateFormat: String = "dd.MM.yyyy",
      intAvg: Boolean = true,
      lastAsAvg: Boolean = false, // reference F_LAST==F_AVG bug, off by default
      /** Insertion-order (id) column for LAST: the reference's LAST is
        * "last by monotonic @Id order" (sql/SQLColumn.java:157-188);
        * with this set, LAST(c) lowers to max_by(c, idCol) —
        * deterministic under shuffling. Unset → Spark last(), which has
        * no ordering guarantee. */
      lastOrderCol: Option[String] = None)

  final case class AnalysisException2(msg: String) extends RuntimeException(msg)

  def lower(stmt: SelectStmt, resolve: String => DataFrame,
            compat: Compat = Compat(),
            customAggs: Map[String, Column => Column] = Map.empty): DataFrame = {
    require(stmt.processWithin.isEmpty, "PROCESS statements go through graft.cep.Process")

    // 1. per-table flat renaming: alias 'e' + column 'name' → 'ename'
    val renamed: Seq[DataFrame] = stmt.tables.map { t =>
      val df = resolve(t.name)
      t.alias match {
        case Some(a) => df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, a + c))
        case None => df
      }
    }
    val joined = renamed.reduceLeft(_.crossJoin(_))
    val ctx = new Ctx(joined, compat)
    import ctx.{colType, resolveRef}

    // IN [SELECT …] terms become semi/anti joins (they are joins, not
    // row predicates); supported at the top level of an AND chain —
    // under OR the membership test can't be separated from the filter.
    def hasSub(c: Cond): Boolean = c match {
      case _: InSubquery => true
      case BoolOp(_, ch) => ch.exists(hasSub)
      case _ => false
    }
    val (subqs, residual) = stmt.where match {
      case None => (Seq.empty[InSubquery], None)
      case Some(s: InSubquery) => (Seq(s), None)
      case Some(BoolOp("AND", children)) =>
        val subs = children.collect { case s: InSubquery => s }
        val rest = children.filterNot(_.isInstanceOf[InSubquery])
        if (rest.exists(hasSub))
          throw AnalysisException2("IN [SELECT …] is only supported in a top-level AND chain")
        val restCond =
          if (rest.isEmpty) None
          else if (rest.size == 1) Some(rest.head)
          else Some(BoolOp("AND", rest))
        (subs, restCond)
      case Some(other) =>
        if (hasSub(other))
          throw AnalysisException2("IN [SELECT …] is only supported in a top-level AND chain")
        (Seq.empty[InSubquery], Some(other))
    }
    val filteredBase = residual.map(c => joined.filter(ctx.lowerCond(c))).getOrElse(joined)
    val filtered = subqs.foldLeft(filteredBase) { (df, s) =>
      val subDf = lower(s.sub, resolve, compat, customAggs)
      if (subDf.columns.length != 1)
        throw AnalysisException2("IN [SELECT …] subquery must select exactly one column, " +
          s"got ${subDf.columns.length}: ${subDf.columns.mkString(", ")}")
      val key = ctx.resolveRef(s.col)
      val subKey = subDf.select(col(subDf.columns.head).as("__graft_subq_key"))
      if (s.negated) {
        // SQL NOT IN three-valued semantics, in full:
        //  - subquery contains a NULL → UNKNOWN for every row → zero rows
        //  - NULL outer key → UNKNOWN (dropped), EXCEPT when the
        //    subquery is empty: x NOT IN (empty set) is TRUE even for
        //    NULL x, so NULL keys survive only then
        //  - otherwise: keep rows whose key matches nothing (anti join;
        //    NULL keys pass the anti join trivially and are culled by
        //    the key-null guard below)
        // The stats marker is one broadcast row (count + null-count of
        // the subquery result) — no driver round-trip.
        val stats = broadcast(subKey.agg(
          count(lit(1)).as("__graft_sub_cnt"),
          count(when(col("__graft_subq_key").isNull, 1)).as("__graft_sub_nulls")))
        df.join(subKey, key === col("__graft_subq_key"), "left_anti")
          .crossJoin(stats)
          .filter(col("__graft_sub_nulls") === 0 &&
            (key.isNotNull || col("__graft_sub_cnt") === 0))
          .drop("__graft_sub_cnt", "__graft_sub_nulls")
      } else
        df.join(subKey, key === col("__graft_subq_key"), "left_semi")
    }

    // 2. select list
    val builtinAggs = Set("COUNT", "SUM", "MIN", "MAX", "AVG", "LAST")
    val aggFuncs = builtinAggs ++ customAggs.keySet // F_CUSTOM, for real
    val scalarFuncs = Set("TO_NUMBER", "TO_CHAR", "TO_DATE")
    stmt.cols.flatMap(_.func).foreach { f =>
      if (!aggFuncs.contains(f) && !scalarFuncs.contains(f))
        throw AnalysisException2(s"unknown function $f (register custom aggregates on the session)")
    }
    val hasAgg = stmt.cols.exists(_.func.exists(aggFuncs.contains))

    def outName(sc: SelCol): String =
      sc.alias.getOrElse(sc.func match {
        case Some(f) => f.toLowerCase + "_" + sc.ref.flatName
        case None => sc.ref.flatName
      })

    def isIntegral(r: ColRef): Boolean =
      colType(r.flatName).orElse(colType(r.name)).exists {
        case _: IntegerType | _: LongType | _: ShortType | _: ByteType => true
        case _ => false
      }

    def aggExpr(sc: SelCol): Column = {
      val c = resolveRef(sc.ref)
      val base = sc.func.get match {
        case "COUNT" => count(c)
        case "SUM" => sum(c)
        case "MIN" => min(c)
        case "MAX" => max(c)
        case "AVG" =>
          if (compat.intAvg && isIntegral(sc.ref))
            floor(sum(c.cast(LongType)) / count(c)).cast(LongType) // reference integer AVG
          else avg(c)
        case "LAST" =>
          if (compat.lastAsAvg) avg(c) // reference bug F_LAST==F_AVG, opt-in only
          else compat.lastOrderCol match {
            // last by insertion (id) order — deterministic
            case Some(idName) =>
              val idRef = ColRef(sc.ref.table, idName)
              max_by(c, resolveRef(
                if (colType(idRef.flatName).isDefined) idRef else ColRef(None, idName)))
            case None => last(c)
          }
        case f if customAggs.contains(f) => customAggs(f)(c)
      }
      base.as(outName(sc))
    }

    def scalarExpr(sc: SelCol): Column = {
      val c = resolveRef(sc.ref)
      val base = sc.func match {
        // try_cast: malformed input → NULL (ANSI cast would throw; the
        // reference's TO_NUMBER never errors — it's a null-producing slot)
        case Some("TO_NUMBER") => c.try_cast(DoubleType)
        case Some("TO_CHAR") =>
          colType(sc.ref.flatName).orElse(colType(sc.ref.name)) match {
            case Some(TimestampType) | Some(DateType) =>
              date_format(c, toSparkFmt(compat.dateFormat))
            case _ => c.cast(StringType)
          }
        case Some("TO_DATE") => to_date(c, toSparkFmt(compat.dateFormat))
        case _ => c
      }
      base.as(outName(sc))
    }

    val projected: DataFrame =
      if (stmt.star) {
        if (stmt.tables.size != 1)
          throw AnalysisException2("SELECT * is single-table only") // sql/SQLSelect.java:292-301
        filtered
      } else if (stmt.windowBy.isDefined) {
        // count-based sliding window: aggregates over the last n rows in
        // windowCol order, emitted per row once the buffer is full
        // (sql/SQLGroupContainer.java:120-158). Batch lowering uses a
        // window frame; the global order is the reference's semantics
        // (monotonic @GeneratedValue ids).
        val (wcol, n) = stmt.windowBy.get
        def inName(r: ColRef): String =
          if (colType(r.flatName).isDefined) r.flatName else r.name
        if (filtered.isStreaming) {
          // streaming count window: stateful ring buffer, not a Window
          // frame (flatMapGroupsWithState — SURVEY.md §7.3). With
          // PARTITION BY, state is bounded at n rows per key and keys
          // hash across executors; without it the stream funnels through
          // one key — reference-compatible but not the scale path.
          import graft.streaming.StreamOps
          if (stmt.windowPartition.size > 1)
            throw AnalysisException2("streaming WINDOW BY supports at most one PARTITION BY key")
          val specs = stmt.cols.map { sc =>
            val f = sc.func.filter(aggFuncs.contains).getOrElse("PLAIN")
            if (customAggs.contains(f))
              throw AnalysisException2(s"custom aggregate $f is not supported in WINDOW BY")
            StreamOps.WindowAggSpec(f, inName(sc.ref), outName(sc))
          }
          return StreamOps.slidingCountWindowRows(filtered, inName(wcol), n, specs,
            keyCol = stmt.windowPartition.headOption.map(inName))
        }
        def outCols(w: org.apache.spark.sql.expressions.WindowSpec) =
          stmt.cols.map { sc =>
            if (sc.func.exists(aggFuncs.contains)) {
              val c = resolveRef(sc.ref)
              val e = sc.func.get match {
                case "COUNT" => count(c).over(w)
                case "SUM" => sum(c).over(w)
                case "MIN" => min(c).over(w)
                case "MAX" => max(c).over(w)
                case "AVG" => avg(c).over(w)
                case "LAST" => last(c).over(w) // frame is ordered: deterministic
                case f => throw AnalysisException2(
                  s"custom aggregate $f is not supported in WINDOW BY")
              }
              e.as(outName(sc))
            } else scalarExpr(sc)
          }
        val orderDt = colType(inName(wcol)).getOrElse(
          throw AnalysisException2(s"WINDOW BY ${inName(wcol)}: unknown column"))
        val bucketable = CountWindow.canBucket(orderDt)
        // canBucket accepts EVERY Spark-orderable type (r13: incl.
        // TIMESTAMP_NTZ and ANSI intervals via real monotone proxies,
        // exotic orderables via a constant one-bucket proxy) plus maps
        // through their key-sorted entries array and constant orders
        // via a literal; what's left is exactly the types Spark itself
        // cannot define an order for (maps nested inside containers,
        // maps with unorderable values, variants) — reject those up
        // front with the real reason instead of an incidental Catalyst
        // "not an orderable data type" buried in the window sort.
        if (!bucketable)
          throw AnalysisException2(s"WINDOW BY ${inName(wcol)}: order column type " +
            s"$orderDt has no defined ordering (Spark cannot sort it); order by an " +
            "orderable column instead")
        val order = CountWindow.orderExpr(orderDt, resolveRef(wcol))
        if (stmt.windowPartition.isEmpty) {
          // reference-compatible global window, lowered scalably
          // (range buckets + carry-over instead of a one-task sort).
          // Numeric, timestamp, date, string, binary, container AND
          // (since r12) map/constant order columns all bucket — the
          // single-partition fallback path is gone.
          CountWindow.global(filtered, inName(wcol), n, outCols)
        } else {
          // keyed count window: per-key frames, sort parallelizes by
          // key (the reference's WINDOW BY has no PARTITION BY — this
          // is the documented extension)
          val keys = stmt.windowPartition.map(resolveRef)
          val w = Window.partitionBy(keys: _*).orderBy(order)
            .rowsBetween(-(n - 1), Window.currentRow)
          val rn = row_number().over(Window.partitionBy(keys: _*).orderBy(order))
          filtered
            .withColumn("__rn", rn)
            .select((outCols(w) :+ col("__rn")): _*)
            .filter(col("__rn") >= n).drop("__rn")
        }
      } else if (hasAgg) {
        // reference validation (sql/SQLSelect.java:347-376)
        val plain = stmt.cols.filter(_.func.forall(f => !aggFuncs.contains(f)))
        if (stmt.groupBy.isEmpty && plain.nonEmpty)
          throw AnalysisException2("aggregates without GROUP BY require all columns aggregated")
        val groupNames = stmt.groupBy.map(_.flatName).toSet
        plain.foreach { sc =>
          if (!groupNames.contains(sc.ref.flatName))
            throw AnalysisException2(s"column ${sc.ref.flatName} is neither grouped nor aggregated")
        }
        val gcols = stmt.groupBy.map(resolveRef)
        val aggs = stmt.cols.filter(_.func.exists(aggFuncs.contains)).map(aggExpr)
        val grouped = filtered.groupBy(gcols: _*).agg(aggs.head, aggs.tail: _*)
        // re-project to declared column order + aliases
        val out = stmt.cols.map { sc =>
          if (sc.func.exists(aggFuncs.contains)) col(outName(sc))
          else col(sc.ref.flatName).as(outName(sc))
        }
        grouped.select(out: _*)
      } else {
        filtered.select(stmt.cols.map(scalarExpr): _*)
      }

    val distincted = if (stmt.distinct) projected.distinct() else projected

    val ordered = if (stmt.orderBy.nonEmpty) {
      // reference ORDER BY is ascending-only (sql/SQLSelect.java:309-324);
      // DESC is a documented dialect extension
      val orderCols = stmt.orderBy.map { oc =>
        val n = oc.ref.flatName
        val base =
          if (distincted.columns.contains(n)) col(n)
          else {
            // order col may have been aliased in the select list
            val aliased = stmt.cols.find(sc => sc.ref == oc.ref && sc.func.isEmpty)
              .flatMap(_.alias)
            col(aliased.getOrElse(n))
          }
        if (oc.desc) base.desc else base
      }
      distincted.orderBy(orderCols: _*)
    } else distincted

    stmt.limit match {
      // with ORDER BY this is a distributed top-k
      // (TakeOrderedAndProject: per-partition heaps, no global sort)
      case Some(n) =>
        if (ordered.isStreaming)
          throw AnalysisException2("LIMIT is not supported on streams")
        ordered.limit(n)
      case None => ordered
    }
  }

  /** Condition-lowering context over a resolved (possibly joined,
    * possibly streaming) DataFrame. Shared by batch lowering,
    * stream lowering, and PROCESS's WHERE handling. */
  private[graft] final class Ctx(df: DataFrame, compat: Compat) {
    def colType(name: String): Option[DataType] =
      df.schema.fields.find(_.name == name).map(_.dataType)

    def resolveRef(r: ColRef): Column = {
      val n = r.flatName
      if (colType(n).isDefined) col(n)
      else if (r.table.isEmpty && colType(r.name).isDefined) col(r.name)
      else throw AnalysisException2(s"unknown column ${r.table.map(_ + ".").getOrElse("")}${r.name}")
    }

    def litFor(r: ColRef, l: Literal): Column = l match {
      case NumLit(v, integral) => if (integral) lit(v.toLong) else lit(v)
      case StrLit("") => lit(null) // reference: quoted empty string is null
      case StrLit(s) =>
        colType(r.flatName).orElse(colType(r.name)) match {
          case Some(TimestampType) => to_timestamp(lit(s), toSparkFmt(compat.dateFormat))
          case Some(TimestampNTZType) => to_timestamp_ntz(lit(s), lit(toSparkFmt(compat.dateFormat)))
          case Some(DateType) => to_date(lit(s), toSparkFmt(compat.dateFormat))
          case _ => lit(s)
        }
    }

    def lowerCond(c: Cond): Column = c match {
      case Cmp(op, l, right) =>
        val lc = resolveRef(l)
        val rc = right.fold(litFor(l, _), resolveRef)
        op match {
          case "=" => lc === rc
          case "<>" => lc =!= rc
          case "<" => lc < rc
          case ">" => lc > rc
          case "<=" => lc <= rc
          case ">=" => lc >= rc
        }
      case InList(r, vs, neg) =>
        val values = vs.map {
          case NumLit(v, integral) => if (integral) v.toLong: Any else v: Any
          case StrLit(s) => s: Any
        }
        val base = resolveRef(r).isin(values: _*)
        if (neg) !base else base
      case Like(r, s, neg) =>
        val base = resolveRef(r).contains(s) // reference LIKE = indexOf
        if (neg) !base else base
      case BoolOp(op, children) =>
        val lowered = children.map(lowerCond)
        if (op == "AND") lowered.reduce(_ && _) else lowered.reduce(_ || _)
      case _: InSubquery =>
        throw AnalysisException2(
          "IN [SELECT …] is only supported in a top-level AND chain of a SELECT's WHERE")
    }
  }

  /** Lower a WHERE condition against an already-resolved DataFrame —
    * used by PROCESS (graft.cep) and ad-hoc stream filters. */
  def lowerCondOn(df: DataFrame, c: Cond, compat: Compat = Compat()): Column =
    new Ctx(df, compat).lowerCond(c)

  /** Java SimpleDateFormat-style reference format → Spark datetime pattern.
    * dd.MM.yyyy happens to be valid in both. */
  private def toSparkFmt(fmt: String): String = fmt
}
