package graft.functions

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Perceptual image hashing kernel (dHash — difference hash): the
  * pre-CLIP near-duplicate key of large image-curation pipelines
  * (LAION-style dedup hashes every image before any learned encoder
  * runs). The 64-bit hash is a gradient sign map over an 8×8 grid —
  * robust to re-encoding (codec noise moves cell MEANS by ≪ the
  * between-cell contrast), to global brightness shifts (differences
  * are translation-invariant), and to rescaling (cells pool areas,
  * not pixels). Exposed as a native Catalyst expression so the hash
  * runs inside whole-stage codegen; near-dup pairing reuses the
  * simhash Hamming band machinery (graft.ops.Dedup.imageDHashPairs).
  */
object ImageHash {
  // in-memory stream cache: the default spools through lock-guarded
  // temp files — pure contention for byte-array payloads decoded on
  // 32 executor threads (same fix as ops.Multimodal)
  ImageIO.setUseCache(false)

  /** 64-bit dHash of an encoded image payload; null for null /
    * undecodable bytes (corrupt payloads must not kill a corpus-scale
    * job — the skip-crud contract all multimodal decoders share).
    *
    * Deterministic definition (what a spec or external replay
    * computes): decode pixels; integer luma = 299·R + 587·G + 114·B
    * (×1000 scale, no division); pool into a 9-column × 8-row grid by
    * floor division (pixel (x,y) → cell (y·8/h, x·9/w), exact long
    * sums); cell mean = one IEEE double division; bit r·8+c of the
    * hash is set iff mean(r, c+1) > mean(r, c). Cells an image
    * narrower than 9 or shorter than 8 leaves empty pool to mean 0. */
  def dHash(bytes: Array[Byte]): java.lang.Long = {
    if (bytes == null) return null
    val img =
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch {
        case _: java.io.IOException => null
        case _: RuntimeException => null
      }
    if (img == null) return null
    val w = img.getWidth
    val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w) // one bulk fetch
    val sums = new Array[Long](8 * 9)
    val counts = new Array[Long](8 * 9)
    var y = 0
    while (y < h) {
      val rowBase = (y * 8 / h) * 9
      val pxBase = y * w
      var x = 0
      while (x < w) {
        val cell = rowBase + x * 9 / w
        val v = px(pxBase + x)
        sums(cell) += 299L * ((v >>> 16) & 0xFF) +
          587L * ((v >>> 8) & 0xFF) + 114L * (v & 0xFF)
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        val i = r * 9 + c
        val mLeft = if (counts(i) == 0L) 0.0 else sums(i).toDouble / counts(i)
        val mRight = if (counts(i + 1) == 0L) 0.0 else sums(i + 1).toDouble / counts(i + 1)
        if (mRight > mLeft) hash |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    java.lang.Long.valueOf(hash)
  }
}

/** Native dHash expression over a binary column: one compiled static
  * call per row, inside whole-stage codegen; null result for
  * undecodable payloads. */
case class DHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // undecodable payload → null hash
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a binary column")
  override def prettyName: String = "graft_image_dhash"
  override protected def nullSafeEval(input: Any): Any =
    ImageHash.dHash(input.asInstanceOf[Array[Byte]]) // may be null
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("dhash")
      s"""
         |java.lang.Long $res = graft.functions.ImageHash.dHash($c);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $res.longValue();
         |}
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): DHash64 =
    copy(child = newChild)
}

object ImageHashFunctions {
  def dhash64(payload: Column): Column =
    CatalystBridge.column(DHash64(CatalystBridge.expression(payload)))
}
