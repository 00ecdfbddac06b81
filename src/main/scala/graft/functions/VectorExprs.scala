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

/** Column-level entry points. */
object VectorFunctions {
  def cosine(a: Column, b: Column): Column =
    CatalystBridge.column(CosineSim(CatalystBridge.expression(a), CatalystBridge.expression(b)))
  def hyperplaneSignature(vec: Column, planes: Int, seed: Int = 0): Column =
    CatalystBridge.column(HyperplaneSigExpr(CatalystBridge.expression(vec), planes, seed))
}
