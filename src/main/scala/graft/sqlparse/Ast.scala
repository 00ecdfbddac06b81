package graft.sqlparse

/** AST for the reference's restricted SQL dialect (reference parser:
  * sql/SQLSelect.java:154-401 — indexOf-based clause splitting; we use
  * a real tokenizer + recursive descent but accept the same language).
  *
  * Grammar accepted (case-insensitive keywords):
  *   SELECT [STREAM] [DISTINCT] selcol (',' selcol)*
  *   FROM table [alias] (',' table [alias])*
  *   [WHERE cond]
  *   [GROUP BY colref (',' colref)*]
  *   [ORDER BY colref (',' colref)*]
  *   [WINDOW BY colref INTERVAL = n [PARTITION BY colref (',' colref)*]]
  *                                            -- count-based sliding;
  *                                            -- PARTITION BY exceeds the
  *                                            -- reference: keyed windows
  *                                            -- are the scale path
  *   PROCESS selcols FROM … WITHIN 'className' [WHERE …]
  *
  * selcol  := '*' | [FUNC'('] colref [')'] [alias]
  * colref  := [alias'.']name
  * cond    := term ((AND|OR) term)*   -- one connective kind per level
  *            (reference: sql/NestedCondition.java:366-438)
  * term    := '(' cond ')' | colref op (literal|colref)
  *          | colref [NOT] IN '[' lit (',' lit)* ']'
  *          | colref [NOT] LIKE 'str'   -- substring-contains semantics
  */
object Ast {
  final case class ColRef(table: Option[String], name: String) {
    /** Reference result-column naming: `a.col` → `acol`
      * (reference: sql/CList.java:70-78,175-179). */
    def flatName: String = table.getOrElse("") + name
  }

  sealed trait Literal { def value: Any }
  final case class NumLit(value: Double, isIntegral: Boolean) extends Literal
  final case class StrLit(value: String) extends Literal

  sealed trait Cond
  /** op ∈ =, <>, <, >, <=, >= (reference: sql/Condition.java:34-43). */
  final case class Cmp(op: String, left: ColRef, right: Either[Literal, ColRef]) extends Cond
  final case class InList(col: ColRef, values: Seq[Literal], negated: Boolean) extends Cond
  /** `col [NOT] IN [SELECT …]` — the reference detects but never
    * evaluates this (stub: sql/ValueCondition.java:92-96); here it
    * lowers to a semi/anti join (exceeds reference). */
  final case class InSubquery(col: ColRef, sub: SelectStmt, negated: Boolean) extends Cond
  /** Reference LIKE is indexOf-contains, NOT SQL patterns
    * (sql/NestedCondition.java:173-188). */
  final case class Like(col: ColRef, substring: String, negated: Boolean) extends Cond
  final case class BoolOp(op: String, children: Seq[Cond]) extends Cond

  /** func ∈ COUNT, SUM, MIN, MAX, AVG, LAST, TO_NUMBER, TO_CHAR, TO_DATE
    * (reference: sql/SQLColumn.java:157-188). */
  final case class SelCol(func: Option[String], ref: ColRef, alias: Option[String])
  final case class TableRef(name: String, alias: Option[String])
  /** ORDER BY item. The reference grammar is ascending-only
    * (sql/SQLSelect.java:309-324); DESC is a documented extension. */
  final case class OrderCol(ref: ColRef, desc: Boolean = false)

  final case class SelectStmt(
      stream: Boolean,
      distinct: Boolean,
      star: Boolean,
      cols: Seq[SelCol],
      tables: Seq[TableRef],
      where: Option[Cond],
      groupBy: Seq[ColRef],
      orderBy: Seq[OrderCol],
      windowBy: Option[(ColRef, Int)],
      processWithin: Option[String],
      /** Optional count-window partition keys (beyond-reference
        * extension): bounds window state per key and distributes the
        * sort/state across executors. Empty = reference-compatible
        * global window. */
      windowPartition: Seq[ColRef] = Seq.empty,
      /** LIMIT n (beyond-reference: the grammar has no LIMIT —
        * sql/SQLSelect.java:42-54; with ORDER BY this lowers to a
        * distributed top-k, TakeOrderedAndProject). */
      limit: Option[Int] = None)

  final case class ParseException(msg: String) extends RuntimeException(msg)
}
