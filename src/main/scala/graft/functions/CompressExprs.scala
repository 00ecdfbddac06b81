package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal: DEFLATE the UTF-8 bytes of a
  * document and report (raw_bytes, deflate_bytes). Highly repetitive
  * machine-generated text compresses far below natural prose, so the
  * ratio deflate/raw is the cheap single-number redundancy signal
  * corpus-quality filters threshold on (used alongside the Gopher
  * rules in CCNet-style pipelines). The kernel is a static call from
  * whole-stage codegen — one pass, no UDF, byte-level (never decodes
  * to String).
  *
  * Determinism stance: java.util.zip.Deflater with a FIXED level and
  * strategy is deterministic for a given zlib build, which holds
  * within a run (all executors ship one JRE) — so the signal is
  * stable wherever it is computed and compared within a pipeline.
  * Byte-exact output across DIFFERENT zlib builds is not promised by
  * the format; downstream thresholds (ratios), not exact byte counts,
  * are the contract.
  */
object CompressionKernel {
  def sizes(s: UTF8String): InternalRow = {
    val raw = s.getBytes
    // nowrap (no zlib header/checksum): the 6-byte envelope would
    // drown the signal on short documents
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED, true)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      InternalRow(raw.length.toLong, total)
    } finally d.end()
  }
}

/** (raw_bytes, deflate_bytes) of a string column's UTF-8 encoding. */
case class CompressSizesExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = CompressSizesExpr.schema
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column")
  override def prettyName: String = "graft_compress_sizes"
  override protected def nullSafeEval(input: Any): Any =
    CompressionKernel.sizes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CompressionKernel.sizes($c)")
  override protected def withNewChildInternal(newChild: Expression): CompressSizesExpr =
    copy(child = newChild)
}

object CompressSizesExpr {
  val schema: StructType = StructType(Seq(
    StructField("raw_bytes", LongType, nullable = false),
    StructField("deflate_bytes", LongType, nullable = false)))
}

object CompressFunctions {
  import org.apache.spark.sql.graft.CatalystBridge
  def compressSizes(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    CatalystBridge.column(CompressSizesExpr(CatalystBridge.expression(text)))
}
