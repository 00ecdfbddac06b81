package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass PII redaction kernel: ONE compiled alternation
  * `(email)|(phone)|(ipv4)` drives one left-to-right scan with
  * per-category replacements, where the previous formulation rewrote
  * the full document text three times (three sequential
  * regexp_replace passes — measured 7.6× at 10× data, pure CPU, the
  * bench's costliest map-only op). Alternative order preserves the
  * sequential passes' email-first priority at every position, and the
  * three patterns are mutually exclusive on any input (emails need
  * '@', phones dashed/parenthesized digit groups, IPs dotted quads),
  * so the fused scan replaces exactly the spans the sequential passes
  * did. No-PII documents (the common case in a clean corpus) return
  * the input buffer unchanged — zero copies.
  */
object ScrubKernel {
  /** Same patterns as ops/Scrub — kept textually identical there for
    * the per-category count expressions. Named groups: the phone/IP
    * patterns contain inner groups of their own, so numbered outer
    * groups would shift if a pattern changes. */
  val emailRe = "[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}"
  val phoneRe = "(\\+\\d{1,2}-)?(\\(\\d{3}\\) |\\d{3}-)\\d{3}-\\d{4}"
  val ipv4Re =
    "\\b(25[0-5]|2[0-4]\\d|1?\\d?\\d)(\\.(25[0-5]|2[0-4]\\d|1?\\d?\\d)){3}\\b"

  private val fused = java.util.regex.Pattern.compile(
    s"(?<em>$emailRe)|(?<ph>$phoneRe)|(?<ip>$ipv4Re)")

  def redact(s: UTF8String): UTF8String = {
    val str = s.toString
    val m = fused.matcher(str)
    if (!m.find()) return s // fast path: clean doc, no allocation
    val sb = new java.lang.StringBuilder(str.length)
    var last = 0
    var more = true
    while (more) {
      sb.append(str, last, m.start())
      sb.append(
        if (m.start("em") >= 0) "<EMAIL>"
        else if (m.start("ph") >= 0) "<PHONE>"
        else "<IP>")
      last = m.end()
      more = m.find()
    }
    sb.append(str, last, str.length)
    UTF8String.fromString(sb.toString)
  }

  /** Redaction AND per-category counts in the SAME scan — the gate
    * query needs both, and counting separately costs three more full
    * regexp passes over the original text. Returns an InternalRow
    * (redacted, n_emails, n_phones, n_ips). */
  def scrub(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val str = s.toString
    val m = fused.matcher(str)
    var em = 0L; var ph = 0L; var ip = 0L
    if (!m.find())
      return org.apache.spark.sql.catalyst.InternalRow(s, 0L, 0L, 0L)
    val sb = new java.lang.StringBuilder(str.length)
    var last = 0
    var more = true
    while (more) {
      sb.append(str, last, m.start())
      if (m.start("em") >= 0) { sb.append("<EMAIL>"); em += 1 }
      else if (m.start("ph") >= 0) { sb.append("<PHONE>"); ph += 1 }
      else { sb.append("<IP>"); ip += 1 }
      last = m.end()
      more = m.find()
    }
    sb.append(str, last, str.length)
    org.apache.spark.sql.catalyst.InternalRow(
      UTF8String.fromString(sb.toString), em, ph, ip)
  }
}

case class PiiRedactExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column")
  override def prettyName: String = "graft_pii_redact"
  override protected def nullSafeEval(input: Any): Any =
    ScrubKernel.redact(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ScrubKernel.redact($c)")
  override protected def withNewChildInternal(newChild: Expression): PiiRedactExpr =
    copy(child = newChild)
}

/** (redacted, n_emails, n_phones, n_ips) in one scan. */
case class PiiScrubExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = PiiScrubExpr.schema
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column")
  override def prettyName: String = "graft_pii_scrub"
  override protected def nullSafeEval(input: Any): Any =
    ScrubKernel.scrub(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ScrubKernel.scrub($c)")
  override protected def withNewChildInternal(newChild: Expression): PiiScrubExpr =
    copy(child = newChild)
}

object PiiScrubExpr {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}
  val schema: StructType = StructType(Seq(
    StructField("redacted", StringType, nullable = false),
    StructField("n_emails", LongType, nullable = false),
    StructField("n_phones", LongType, nullable = false),
    StructField("n_ips", LongType, nullable = false)))
}
