package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Compiled vector kernels + native Catalyst expressions for embedding
  * similarity (cosine, hyperplane LSH signatures). Same motivation as
  * TextHash: `aggregate`/`zip_with` arithmetic evaluates interpreted
  * per element; these run the dot products as tight float loops and
  * keep the surrounding scan in whole-stage codegen.
  */
object VectorSim {

  /** Cosine over the common prefix of two float vectors, accumulating
    * in double left-to-right (same IEEE result as the column-expression
    * fold it replaces). 0 where either norm is 0. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dp = 0.0
    var i = 0
    while (i < n) { dp += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    var na = 0.0
    i = 0
    val la = a.numElements()
    while (i < la) { val x = a.getFloat(i).toDouble; na += x * x; i += 1 }
    var nb = 0.0
    i = 0
    val lb = b.numElements()
    while (i < lb) { val x = b.getFloat(i).toDouble; nb += x * x; i += 1 }
    val nn = math.sqrt(na) * math.sqrt(nb)
    if (nn > 0) dp / nn else 0.0
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim)
    * in [-1, 1] — hash-derived, no RNG state, identical on every
    * executor and every run. */
  @inline def weight(plane: Int, d: Int): Double =
    (java.lang.Math.floorMod(TextHash.combine(plane.toLong, d.toLong), 2000001L)
      - 1000000L).toDouble / 1000000.0

  /** Cells of a pre-NORMALIZED codebook ranked by dot product with `v`
    * (== cosine ranking: |v| is constant across cells), top `n` cell
    * ids descending; ties keep the lower cell. Selection by repeated
    * scan — n and the codebook are both small (coarse quantizer). */
  def nearestCells(v: ArrayData, cbNorm: Array[Array[Double]], n: Int): Array[Int] = {
    val k = cbNorm.length
    val sims = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = cbNorm(c)
      val d = math.min(v.numElements(), cent.length)
      var acc = 0.0
      var i = 0
      while (i < d) { acc += v.getFloat(i).toDouble * cent(i); i += 1 }
      sims(c) = acc
      c += 1
    }
    val out = new Array[Int](math.min(n, k))
    val taken = new Array[Boolean](k)
    var r = 0
    while (r < out.length) {
      var best = -1
      var bestSim = Double.NegativeInfinity
      c = 0
      while (c < k) {
        // `best == -1` guard: NaN sims (corrupt vector) compare false
        // against everything — fall back to first untaken cell instead
        // of indexing with -1
        if (!taken(c) && (best == -1 || sims(c) > bestSim)) { bestSim = sims(c); best = c }
        c += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    out
  }

  def nearestCell(v: ArrayData, cbNorm: Array[Array[Double]]): Int =
    nearestCells(v, cbNorm, 1)(0)

  def nearestCellsData(v: ArrayData, cbNorm: Array[Array[Double]], n: Int): ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(nearestCells(v, cbNorm, n))

  /** L2-normalize a codebook once, driver-side, so per-row ranking is a
    * plain dot product. Zero-norm centroids stay zero (sim 0). */
  def normalizeCodebook(cb: Array[Array[Double]]): Array[Array[Double]] =
    cb.map { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      if (n > 0) c.map(_ / n) else c.clone()
    }

  /** ADC score: Σ_j lut[j·ksub + codes[j]] (see AdcScoreExpr). */
  def adcScore(codes: ArrayData, lut: ArrayData, ksub: Int): Double = {
    val m = codes.numElements()
    val n = lut.numElements()
    var acc = 0.0
    var j = 0
    while (j < m) {
      val idx = j * ksub + codes.getInt(j)
      if (idx >= 0 && idx < n) acc += lut.getDouble(idx)
      j += 1
    }
    acc
  }

  /** Sign-bit signature over `planes` fixed hyperplanes → one long
    * bucket key; `seed` selects the hyperplane family (one per LSH
    * table). */
  def hyperplaneSig(v: ArrayData, planes: Int, seed: Int): Long = {
    val n = v.numElements()
    var bits = 0L
    var p = 0
    while (p < planes) {
      val fam = seed * 1024 + p
      var acc = 0.0
      var d = 0
      while (d < n) { acc += v.getFloat(d).toDouble * weight(fam, d); d += 1 }
      if (acc >= 0) bits |= (1L << p)
      p += 1
    }
    bits
  }
}

case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  private def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires two array<float> columns")
  override def prettyName: String = "graft_cosine"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorSim.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorSim.cosine($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSim = copy(left = newLeft, right = newRight)
}

/** PQ asymmetric-distance score: Σ_j lut[j·ksub + codes[j]] — the ADC
  * inner loop as a compiled kernel. The interpreted `aggregate` HOF
  * spelling costs a per-element lambda dispatch on every corpus×query
  * row of the ADC scan — the one place PQ spends its time. Codes out
  * of lut range (impossible for a matching encode) contribute 0. */
case class AdcScoreExpr(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.IntegerType, _),
            ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int> codes, array<double> lut)")
    }
  override def prettyName: String = "graft_adc_score"
  override protected def nullSafeEval(c: Any, l: Any): Any =
    VectorSim.adcScore(c.asInstanceOf[ArrayData], l.asInstanceOf[ArrayData], ksub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, l) => s"graft.functions.VectorSim.adcScore($c, $l, $ksub)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): AdcScoreExpr = copy(left = newLeft, right = newRight)
}

case class HyperplaneSigExpr(child: Expression, planes: Int, seed: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires an array<float> column")
  }
  override def prettyName: String = "graft_hyperplane_sig"
  override protected def nullSafeEval(v: Any): Any =
    VectorSim.hyperplaneSig(v.asInstanceOf[ArrayData], planes, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorSim.hyperplaneSig($c, $planes, $seed)")
  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigExpr =
    copy(child = newChild)
}

/** Top-`n` nearest codebook cells for a vector, ranked by cosine,
  * as array<int> descending. The codebook rides along as a codegen
  * REFERENCE OBJECT, not as literal expressions: a k×d codebook as
  * `lit()`s costs k·d literal nodes compiled into every plan that
  * touches it (and Janino can't cache across plans because the source
  * differs per codebook); here the generated source is codebook-
  * independent, so repeated IVF/k-means plans hit the codegen cache. */
case class NearestCellsExpr(child: Expression, codebook: Array[Array[Double]], n: Int)
    extends UnaryExpression {
  require(codebook.nonEmpty, "codebook must contain at least one centroid")
  require(n >= 1, s"n must be >= 1, got $n")
  private lazy val cbNorm = VectorSim.normalizeCodebook(codebook)
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType, false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires an array<float> column")
  }
  override def prettyName: String = "graft_nearest_cells"
  override protected def nullSafeEval(v: Any): Any =
    VectorSim.nearestCellsData(v.asInstanceOf[ArrayData], cbNorm, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("cbNorm", cbNorm, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorSim.nearestCellsData($c, $cb, $n)")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCellsExpr =
    copy(child = newChild)
}

/** Column-level entry points. */
object VectorFunctions {
  def cosine(a: Column, b: Column): Column =
    CatalystBridge.column(CosineSim(CatalystBridge.expression(a), CatalystBridge.expression(b)))
  def hyperplaneSignature(vec: Column, planes: Int, seed: Int = 0): Column =
    CatalystBridge.column(HyperplaneSigExpr(CatalystBridge.expression(vec), planes, seed))
  def nearestCells(vec: Column, codebook: Array[Array[Double]], n: Int): Column =
    CatalystBridge.column(NearestCellsExpr(CatalystBridge.expression(vec), codebook, n))
  def adcScore(codes: Column, lut: Column, ksub: Int): Column =
    CatalystBridge.column(AdcScoreExpr(
      CatalystBridge.expression(codes), CatalystBridge.expression(lut), ksub))
}
