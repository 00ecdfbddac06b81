package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-hash kernels (SURVEY.md
  * §7.3 "custom Expression beats UDF"): each generates a single static
  * call into the compiled TextHash kernel, so scans over documents stay
  * inside whole-stage codegen with no interpreted higher-order
  * functions and no UDF serialization.
  */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column")
  override def prettyName: String = "graft_shingle_hashes"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.shingles(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.shingles($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

case class MinHashSig(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column")
  override def prettyName: String = "graft_minhash"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.minhash(input.asInstanceOf[UTF8String], k, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.minhash($c, $k, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column")
  override def prettyName: String = "graft_simhash"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.simhash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Hashed-BoW feature buckets of a document (hashing trick,
  * floorMod(fnv1a(token), dims); empty tokens dropped). */
case class BucketArray(child: Expression, dims: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column")
  override def prettyName: String = "graft_bow_buckets"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.bucketArray(input.asInstanceOf[UTF8String], dims)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.bucketArray($c, $dims)")
  override protected def withNewChildInternal(newChild: Expression): BucketArray =
    copy(child = newChild)
}

/** Linear hashed-BoW score: bias + Σ w[bucket(token)], all-integer.
  * The weight vector rides into generated code as a referenced
  * object — one compiled pass per document, no explode, no join. */
case class BowScore(child: Expression, dims: Int,
                    weights: Array[Long], bias: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column")
  override def prettyName: String = "graft_bow_score"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.bowScore(input.asInstanceOf[UTF8String], dims, weights, bias)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("bowWeights", weights, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHash.bowScore($c, $dims, $wRef, ${bias}L)")
  }
  override protected def withNewChildInternal(newChild: Expression): BowScore =
    copy(child = newChild)
}

/** Column-level entry points. */
object TextHashFunctions {
  def shingleHashes(text: Column, k: Int): Column =
    CatalystBridge.column(ShingleHashes(CatalystBridge.expression(text), k))
  def minhashSignature(text: Column, k: Int, numHashes: Int): Column =
    CatalystBridge.column(MinHashSig(CatalystBridge.expression(text), k, numHashes))
  def simhash(text: Column): Column =
    CatalystBridge.column(SimHash64(CatalystBridge.expression(text)))
  def bowBuckets(text: Column, dims: Int): Column =
    CatalystBridge.column(BucketArray(CatalystBridge.expression(text), dims))
  def bowScore(text: Column, dims: Int, weights: Array[Long], bias: Long): Column =
    CatalystBridge.column(BowScore(CatalystBridge.expression(text), dims, weights, bias))
}
