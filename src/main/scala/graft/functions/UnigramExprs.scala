package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation kernel for the unigram-LM tokenizer
  * (ops/Unigram — the SentencePiece unigram model's E-step). One
  * compiled DP pass per word; the vocabulary rides into generated
  * code as a referenced HashMap, so the corpus/dict scan stays inside
  * whole-stage codegen with no join against a vocab table.
  *
  * DP spec (shared verbatim with `Unigram.referenceLearn` — the gate
  * requires bit-identical vocabularies from both paths):
  * positions are CODE-POINT boundaries; dp[i] = best log-prob of the
  * first i code points; a piece of length l ≤ maxLen ending at i
  * scores dp[i−l] + logp(piece); strictly-greater score wins, equal
  * score prefers the LONGER piece; if no vocabulary piece ends at i,
  * the single code point is consumed at the `Floor` log-prob (the
  * unknown-character escape — unreachable while the alphabet stays
  * in the vocabulary, which the trainer guarantees).
  *
  * Scores are FIXED-POINT integer log-probs (Q32 log₂ — see
  * Unigram.log2Fp), not doubles (r17): argmax under any positive
  * log-base rescaling is the same segmentation, so the base-2
  * fixed-point grid preserves unigram-LM semantics exactly while
  * making every DP comparison (and every tie) integer-exact — the
  * property that lets an independent SQL engine replay training
  * bit-for-bit, where a last-ulp ln() divergence between libm
  * implementations could flip a near-tie argmax. Same determinism
  * pattern as TimeSeries.decayedScore's score_fp.
  */
object UnigramKernel {
  /** Unknown-character escape log-prob (Q32): low enough that any
    * in-vocabulary path beats it, high enough that a whole word of
    * escapes cannot overflow a Long DP sum. */
  val Floor: Long = -(1L << 55)

  def segment(u: UTF8String, vocab: java.util.HashMap[String, java.lang.Long],
              maxLen: Int): ArrayData = {
    val s = u.toString
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    // code-point boundaries
    val n = s.codePointCount(0, s.length)
    val offs = new Array[Int](n + 1)
    var i = 0
    var p = 0
    while (p < s.length) {
      offs(i) = p
      p += Character.charCount(s.codePointAt(p))
      i += 1
    }
    offs(n) = s.length
    val dp = new Array[Long](n + 1)
    val back = new Array[Int](n + 1)
    i = 1
    while (i <= n) {
      var best = Long.MinValue
      var bestL = 0
      var l = 1
      val lMax = math.min(maxLen, i)
      while (l <= lMax) {
        val lp = vocab.get(s.substring(offs(i - l), offs(i)))
        if (lp ne null) {
          val c = dp(i - l) + lp.longValue()
          if (c > best || (c == best && l > bestL)) { best = c; bestL = l }
        }
        l += 1
      }
      if (bestL == 0) { best = dp(i - 1) + Floor; bestL = 1 }
      dp(i) = best
      back(i) = bestL
      i += 1
    }
    var cnt = 0
    i = n
    while (i > 0) { cnt += 1; i -= back(i) }
    val out = new Array[Any](cnt)
    i = n
    var j = cnt - 1
    while (i > 0) {
      out(j) = UTF8String.fromString(s.substring(offs(i - back(i)), offs(i)))
      j -= 1
      i -= back(i)
    }
    new GenericArrayData(out)
  }
}

case class UnigramSegment(child: Expression, pieces: Array[String],
                          logps: Array[Long], maxLen: Int)
    extends UnaryExpression {
  @transient private lazy val vocabMap: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), logps(i)); i += 1 }
    m
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column")
  override def prettyName: String = "graft_unigram_segment"
  override protected def nullSafeEval(input: Any): Any =
    UnigramKernel.segment(input.asInstanceOf[UTF8String], vocabMap, maxLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("unigramVocab", vocabMap, "java.util.HashMap")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnigramKernel.segment($c, $mRef, $maxLen)")
  }
  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)
}

object UnigramFunctions {
  def segment(word: Column, pieces: Array[String], logps: Array[Long],
              maxLen: Int): Column =
    CatalystBridge.column(UnigramSegment(CatalystBridge.expression(word),
      pieces, logps, maxLen))
}
