package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text statistics + language-ID kernels. The column-
  * expression versions walk the text once per feature (several regex
  * passes + interpreted array intersections per row); these compute
  * everything in a single compiled pass and reproduce the column
  * pipeline's semantics exactly (cross-checked by tests, and for
  * q_text_stats by the DuckDB oracle):
  *   n_chars  = code points of text
  *   n_tokens = 0 if btrim(text) empty else |split(btrim(lower), \s+)|
  *   n_punct  = count of chars in [.,!?;:]
  *   n_stop   = tokens (with duplicates) contained in the stopword set
  *   n_stop_distinct = DISTINCT stopwords present among the tokens
  *       (= size(array_intersect(tokens, stopwords)) — the quality-
  *       feature variant, folded into the same pass so feature
  *       extraction needs no second tokenization)
  */
object TextStatsKernel {

  def stats(u: UTF8String, stopwords: Array[String]): InternalRow = {
    val s = u.toString
    val nChars = s.codePointCount(0, s.length).toLong
    var nPunct = 0L
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '.' || c == ',' || c == '!' || c == '?' || c == ';' || c == ':') nPunct += 1
      i += 1
    }
    // btrim (spaces only) emptiness decides token count 0
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    val (nTokens, nStop, nStopDistinct) =
      if (e == b) (0L, 0L, 0L)
      else {
        val toks = TextHash.tokenize(u)
        val seen = new Array[Boolean](stopwords.length)
        var stop = 0L
        var distinct = 0L
        var j = 0
        while (j < toks.length) {
          var k = 0
          var hit = false
          while (k < stopwords.length && !hit) {
            if (stopwords(k) == toks(j)) {
              hit = true
              if (!seen(k)) { seen(k) = true; distinct += 1 }
            }
            k += 1
          }
          if (hit) stop += 1
          j += 1
        }
        (toks.length.toLong, stop, distinct)
      }
    new GenericInternalRow(Array[Any](nChars, nTokens, nPunct, nStop, nStopDistinct))
  }

  /** Language-ID: CJK code-point ratio > 0.2 → zh; otherwise the
    * language whose marker lexicon has the largest DISTINCT overlap
    * with the token set, ratio-scored, ties broken by the
    * lexicographically largest language code (matches the column
    * version's greatest() over (score, lang) structs). */
  def langId(u: UTF8String, langs: Array[String],
             markers: Array[Array[String]]): UTF8String = {
    val s = u.toString
    val nChars = s.codePointCount(0, s.length)
    var cjk = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp >= 0x4e00 && cp <= 0x9fff) cjk += 1
      i += Character.charCount(cp)
    }
    if (cjk.toDouble / math.max(nChars, 1) > 0.2) return UTF8String.fromString("zh")
    val toks = TextHash.tokenize(u)
    // 0 if btrim-empty: mirrors tokenCount's greatest(_, 1) base
    var bb = 0
    var ee = s.length
    while (bb < ee && s.charAt(bb) == ' ') bb += 1
    while (ee > bb && s.charAt(ee - 1) == ' ') ee -= 1
    val nTok = math.max(if (ee == bb) 0 else toks.length, 1).toDouble
    val tokSet = toks.toSet
    var best = ""
    var bestScore = Double.NegativeInfinity
    var l = 0
    while (l < langs.length) {
      var hits = 0
      val seen = scala.collection.mutable.HashSet.empty[String]
      var m = 0
      while (m < markers(l).length) {
        val w = markers(l)(m)
        if (tokSet.contains(w) && seen.add(w)) hits += 1
        m += 1
      }
      val score = hits / nTok
      if (score > bestScore || (score == bestScore && langs(l) > best)) {
        bestScore = score; best = langs(l)
      }
      l += 1
    }
    UTF8String.fromString(best)
  }
}

case class TextStatsExpr(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {
  private val stopArr = stopwords.toArray
  override def dataType: DataType = TextStatsExpr.schema
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column")
  override def prettyName: String = "graft_text_stats"
  override protected def nullSafeEval(input: Any): Any =
    TextStatsKernel.stats(input.asInstanceOf[UTF8String], stopArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.addReferenceObj("stopwords", stopArr, "java.lang.String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatsKernel.stats($c, $arr)")
  }
  override protected def withNewChildInternal(newChild: Expression): TextStatsExpr =
    copy(child = newChild)
}

object TextStatsExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_stop_distinct", LongType, nullable = false)))
}

case class LangIdExpr(child: Expression, langs: Seq[String],
                      markers: Seq[Seq[String]])
    extends UnaryExpression {
  private val langArr = langs.toArray
  private val markerArr = markers.map(_.toArray).toArray
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column")
  override def prettyName: String = "graft_lang_id"
  override protected def nullSafeEval(input: Any): Any =
    TextStatsKernel.langId(input.asInstanceOf[UTF8String], langArr, markerArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ls = ctx.addReferenceObj("langs", langArr, "java.lang.String[]")
    val ms = ctx.addReferenceObj("markers", markerArr, "java.lang.String[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatsKernel.langId($c, $ls, $ms)")
  }
  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

/** One-pass repetition statistics — the doc-internal duplication
  * signals large-corpus quality filters cut on (the "repetition" rule
  * family: a document that keeps repeating the same n-grams or one
  * token is boilerplate/spam, not prose):
  *   n_tokens  = token count (same tokenization as TextStatsKernel)
  *   n_dup2    = duplicated bigram INSTANCES: (#bigrams − #distinct)
  *   n_dup3    = duplicated trigram instances
  *   max_tok   = occurrences of the most frequent token (0 if none)
  * Counts are exact integers; ratio thresholds divide them downstream
  * (one IEEE double division — oracle-replayable bit-for-bit).
  */
object RepetitionKernel {
  def stats(u: UTF8String): InternalRow = {
    // btrim-empty → zero tokens, mirroring TextStatsKernel
    val s = u.toString
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    if (e == b) return new GenericInternalRow(Array[Any](0L, 0L, 0L, 0L))
    val toks = TextHash.tokenize(u)
    val n = toks.length
    val freq = new java.util.HashMap[String, Int](n * 2)
    var maxTok = 0
    var i = 0
    while (i < n) {
      val c = freq.merge(toks(i), 1, (a, bx) => a + bx)
      if (c > maxTok) maxTok = c
      i += 1
    }
    def dupGrams(k: Int): Long = {
      if (n < k) return 0L
      val set = new java.util.HashSet[String]((n - k + 1) * 2)
      var dups = 0L
      var j = 0
      while (j + k <= n) {
        val sb = new java.lang.StringBuilder(toks(j))
        var m = 1
        while (m < k) { sb.append(' ').append(toks(j + m)); m += 1 }
        if (!set.add(sb.toString)) dups += 1
        j += 1
      }
      dups
    }
    new GenericInternalRow(Array[Any](n.toLong, dupGrams(2), dupGrams(3), maxTok.toLong))
  }
}

case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = RepetitionStatsExpr.schema
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column")
  override def prettyName: String = "graft_repetition_stats"
  override protected def nullSafeEval(input: Any): Any =
    RepetitionKernel.stats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionKernel.stats($c)")
  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)
}

object RepetitionStatsExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_dup2", LongType, nullable = false),
    StructField("n_dup3", LongType, nullable = false),
    StructField("max_tok", LongType, nullable = false)))
}

/** One-pass token-entropy kernel — the vocabulary-diversity quality
  * signal (low-entropy documents are keyword stuffing / template spam;
  * LLM corpus filters cut on it next to the repetition rules):
  *   n_tokens   = token count (same tokenization as TextStatsKernel)
  *   n_distinct = distinct tokens
  *   entropy    = Shannon entropy (nats) of the token unigram
  *                distribution, computed as ln(n) − Σ c·ln(c) / n so
  *                only exact integer counts enter the float math.
  * Empty (btrim) text → (0, 0, 0.0). Per-row, map-side: a corpus-wide
  * entropy pass shuffles NOTHING.
  */
object EntropyKernel {
  def stats(u: UTF8String): InternalRow = {
    val s = u.toString
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    if (e == b) return new GenericInternalRow(Array[Any](0L, 0L, 0.0))
    val toks = TextHash.tokenize(u)
    val n = toks.length
    val freq = new java.util.HashMap[String, Int](n * 2)
    var i = 0
    while (i < n) { freq.merge(toks(i), 1, (a, bx) => a + bx); i += 1 }
    var sumClnC = 0.0
    val it = freq.values().iterator()
    while (it.hasNext) { val c = it.next().toDouble; sumClnC += c * math.log(c) }
    val entropy = math.log(n.toDouble) - sumClnC / n
    new GenericInternalRow(Array[Any](n.toLong, freq.size.toLong, entropy))
  }
}

case class TokenEntropyExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TokenEntropyExpr.schema
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column")
  override def prettyName: String = "graft_token_entropy"
  override protected def nullSafeEval(input: Any): Any =
    EntropyKernel.stats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.EntropyKernel.stats($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenEntropyExpr =
    copy(child = newChild)
}

object TokenEntropyExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))
}

/** One-pass Gopher-rules kernel — every feature and verdict of
  * ops/TextAnalysis.gopherRules in a single compiled scan. The column
  * spelling walked the document ~8 times (token fold, two replace
  * passes, two line filters with interpreted lambdas, a per-token
  * rlike regex, array_intersect). Semantics replicated exactly:
  * Spark split keeps trailing empties (limit −1), ltrim/rtrim trim
  * 0x20 only, length() counts code points, the ellipsis count divides
  * a code-point delta by 3 in double math, round is HALF_UP. */
object GopherKernel {
  private val ReqStop = Array("the", "be", "to", "of", "and", "that", "have", "with")

  def features(u: UTF8String, minWords: Int, maxWords: Int): InternalRow = {
    val s = u.toString
    // tokens: blank (0x20-trim) → empty, else tokenize
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    val toks: Array[String] =
      if (e == b) Array.empty else TextHash.tokenize(u)
    val nWords = toks.length.toLong

    var wordChars = 0L
    var alphaWords = 0L
    val stopSeen = new Array[Boolean](ReqStop.length)
    var nReqStop = 0L
    var t = 0
    while (t < toks.length) {
      val w = toks(t)
      wordChars += w.codePointCount(0, w.length)
      var hasAlpha = false
      var ci = 0
      while (ci < w.length && !hasAlpha) {
        val c = w.charAt(ci)
        if (c >= 'a' && c <= 'z') hasAlpha = true
        ci += 1
      }
      if (hasAlpha) alphaWords += 1
      var k = 0
      var hit = false
      while (k < ReqStop.length && !hit) {
        if (ReqStop(k) == w) {
          hit = true
          if (!stopSeen(k)) { stopSeen(k) = true; nReqStop += 1 }
        }
        k += 1
      }
      t += 1
    }
    val meanWordLen = if (nWords > 0) wordChars.toDouble / nWords else 0.0

    // '#' count and non-overlapping "..." occurrences over the raw text
    var nHash = 0L
    var i = 0
    while (i < s.length) { if (s.charAt(i) == '#') nHash += 1; i += 1 }
    var nDotsRemoved = 0L
    i = s.indexOf("...")
    while (i >= 0) { nDotsRemoved += 3; i = s.indexOf("...", i + 3) }
    val nEllipsis = nDotsRemoved.toDouble / 3.0
    val symbolRatio =
      if (nWords > 0) (nHash + nEllipsis) / nWords.toDouble else 0.0

    // lines: split("\n", -1) keeps trailing empties → nLines >= 1
    val lines = s.split("\n", -1)
    val nLines = lines.length.toLong
    var bulletLines = 0L
    var ellipsisLines = 0L
    var li = 0
    while (li < lines.length) {
      val line = lines(li)
      var lb = 0
      while (lb < line.length && line.charAt(lb) == ' ') lb += 1
      if (lb < line.length) {
        val c = line.charAt(lb)
        if (c == '-' || c == '*' || c == '•') bulletLines += 1
      }
      var le = line.length
      while (le > 0 && line.charAt(le - 1) == ' ') le -= 1
      if ((le >= 3 && line.startsWith("...", le - 3)) ||
          (le >= 1 && line.charAt(le - 1) == '…')) ellipsisLines += 1
      li += 1
    }
    val bulletRatio = bulletLines.toDouble / nLines
    val ellipsisRatio = ellipsisLines.toDouble / nLines
    val alphaRatio = if (nWords > 0) alphaWords.toDouble / nWords else 0.0

    val rWc = nWords >= minWords && nWords <= maxWords
    val rMwl = nWords > 0 && meanWordLen >= 3.0 && meanWordLen <= 10.0
    val rSym = nWords > 0 && symbolRatio <= 0.1
    val rBullet = bulletRatio <= 0.9
    val rEllipsis = ellipsisRatio <= 0.3
    val rAlpha = nWords > 0 && alphaRatio >= 0.8
    val rStop = nReqStop >= 2L
    val mwlRounded = java.math.BigDecimal.valueOf(meanWordLen)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    new GenericInternalRow(Array[Any](
      nWords, mwlRounded, nReqStop,
      rWc, rMwl, rSym, rBullet, rEllipsis, rAlpha, rStop,
      rWc && rMwl && rSym && rBullet && rEllipsis && rAlpha && rStop))
  }
}

case class GopherRulesExpr(child: Expression, minWords: Int, maxWords: Int)
    extends UnaryExpression {
  override def dataType: DataType = GopherRulesExpr.schema
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column")
  override def prettyName: String = "graft_gopher_rules"
  override protected def nullSafeEval(input: Any): Any =
    GopherKernel.features(input.asInstanceOf[UTF8String], minWords, maxWords)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GopherKernel.features($c, $minWords, $maxWords)")
  override protected def withNewChildInternal(newChild: Expression): GopherRulesExpr =
    copy(child = newChild)
}

object GopherRulesExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("mean_word_len", DoubleType, nullable = false),
    StructField("n_req_stopwords", LongType, nullable = false),
    StructField("r_word_count", BooleanType, nullable = false),
    StructField("r_mean_word_len", BooleanType, nullable = false),
    StructField("r_symbol_ratio", BooleanType, nullable = false),
    StructField("r_bullet_lines", BooleanType, nullable = false),
    StructField("r_ellipsis_lines", BooleanType, nullable = false),
    StructField("r_alpha_words", BooleanType, nullable = false),
    StructField("r_stopwords", BooleanType, nullable = false),
    StructField("keep", BooleanType, nullable = false)))
}

/** Column-level entry points. */
object TextStatsFunctions {
  def textStats(text: Column, stopwords: Seq[String]): Column =
    CatalystBridge.column(TextStatsExpr(CatalystBridge.expression(text), stopwords))
  def langId(text: Column, langs: Seq[String], markers: Seq[Seq[String]]): Column =
    CatalystBridge.column(LangIdExpr(CatalystBridge.expression(text), langs, markers))
  def repetitionStats(text: Column): Column =
    CatalystBridge.column(RepetitionStatsExpr(CatalystBridge.expression(text)))
  def tokenEntropy(text: Column): Column =
    CatalystBridge.column(TokenEntropyExpr(CatalystBridge.expression(text)))
  def gopherRules(text: Column, minWords: Int, maxWords: Int): Column =
    CatalystBridge.column(GopherRulesExpr(CatalystBridge.expression(text), minWords, maxWords))
}
