package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Perceptual audio fingerprint kernel — the audio counterpart of the
  * image dHash ([[ImageHash]]): a 64-bit ENERGY-DIFFERENCE hash over
  * the decoded PCM stream, the Chromaprint-family idea (sign of the
  * energy gradient across time frames) reduced to its exact-integer
  * core so it is deterministic, replayable, and robust to exactly the
  * transforms an audio-curation dedup must survive:
  *
  *  - volume/gain change: every frame's energy scales together, so all
  *    cross-multiplied frame comparisons are invariant;
  *  - resampling (sample duplication / decimation): frames are
  *    PROPORTIONAL positions in the clip, so per-frame MEAN energy is
  *    preserved up to one-sample boundary effects;
  *  - dither / low-level noise: bounded mean shift per frame, ≪ the
  *    between-frame contrast of real program material.
  *
  * Not robust (by design — these are different recordings): time
  * shifts/trims beyond a frame, re-pitching, heavy filtering.
  */
object AudioFingerprint {
  /** 64-bit fingerprint of an encoded audio payload; null for null /
    * undecodable / non-16-bit-PCM payloads and clips shorter than 65
    * samples (nothing to fingerprint) — corrupt bytes must not kill a
    * corpus-scale job, the skip-crud contract all multimodal decoders
    * share.
    *
    * Deterministic definition (what a spec or external replay
    * computes): decode the container via the JDK reader chain
    * ([[graft.ops.Multimodal.audioReaders]]) to 16-bit signed PCM
    * (either endianness, any channel count — samples interleave and
    * all contribute, same convention as `Multimodal.audioStats`);
    * split the n samples into 65 frames, frame f = samples
    * [f·n/65, (f+1)·n/65) by floor division; E_f = Σ|s| (exact long),
    * n_f = frame sample count; bit f (f = 0..63) is set iff
    * E_{f+1}·n_f > E_f·n_{f+1} — the mean-energy comparison as an
    * exact integer cross-multiply, no division anywhere. */
  def fp64(bytes: Array[Byte]): java.lang.Long = {
    // shared container decode (reader chain, PCM16 validation,
    // unchecked-exception skip-crud): graft.ops.Multimodal.readPcm16
    val decoded = graft.ops.Multimodal.readPcm16(bytes)
    if (decoded == null) return null
    val (pcm, big) = decoded
    val n = pcm.length / 2
    if (n < 65) return null
    val sums = new Array[Long](65)
    val counts = new Array[Long](65)
    var i = 0
    while (i < n) {
      val off = i * 2
      val s = graft.ops.Multimodal.sampleOf(pcm(off), pcm(off + 1), big)
      val f = (i.toLong * 65L / n).toInt
      sums(f) += math.abs(s)
      counts(f) += 1
      i += 1
    }
    var hash = 0L
    var f = 0
    while (f < 64) {
      if (mulGt(sums(f + 1), counts(f), sums(f), counts(f + 1)))
        hash |= 1L << f
      f += 1
    }
    java.lang.Long.valueOf(hash)
  }

  /** Exact 128-bit `a·b > c·d` for NONNEGATIVE longs (high words via
    * Math.multiplyHigh, low words unsigned). The naive 64-bit
    * cross-multiply peaked around 8.9e18 for a maximum-size (~2 GiB,
    * ~1.07e9-sample) 16-bit clip — under Long.MaxValue but with only
    * ~4% headroom, so any widening of the sample domain (24-bit PCM)
    * or frame-count change would have overflowed silently and
    * corrupted hashes; this removes the constraint. Identical results
    * in the non-overflowing domain — persisted fingerprints are
    * unchanged. */
  private def mulGt(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val hi1 = Math.multiplyHigh(a, b)
    val hi2 = Math.multiplyHigh(c, d)
    if (hi1 != hi2) hi1 > hi2
    else java.lang.Long.compareUnsigned(a * b, c * d) > 0
  }
}

/** Native audio-fingerprint expression over a binary column: one
  * compiled static call per row inside whole-stage codegen; null for
  * undecodable payloads. */
case class AudioFp64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // undecodable payload → null hash
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a binary column")
  override def prettyName: String = "graft_audio_fp"
  override protected def nullSafeEval(input: Any): Any =
    AudioFingerprint.fp64(input.asInstanceOf[Array[Byte]]) // may be null
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("afp")
      s"""
         |java.lang.Long $res = graft.functions.AudioFingerprint.fp64($c);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $res.longValue();
         |}
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): AudioFp64 =
    copy(child = newChild)
}

/** Perceptual video hash kernel: per-bit MAJORITY vote over the dHashes
  * of evenly sampled frames — the whole-clip analog of per-frame
  * [[ImageHash]]. Real consecutive frames are visually correlated, so
  * their dHashes agree on most bits; per-frame codec noise flips a few
  * bits of a few frames, which the majority absorbs — a re-encoded or
  * globally brightness-shifted clip lands within small Hamming distance
  * of the original, while unrelated clips are independent 64-bit draws.
  */
object VideoHash {
  /** Frames considered per clip — evenly sampled across the movi index,
    * so per-row cost is bounded regardless of clip length, and the SAME
    * frames are sampled for a transformed copy with equal frame count. */
  val MaxFrames = 16

  /** 64-bit perceptual hash of an AVI payload: demux the REAL container
    * ([[graft.ops.Multimodal.parseAvi]]), dHash up to [[MaxFrames]]
    * evenly sampled frame chunks (frame j of k: index ⌊j·n/k⌋), skip
    * frames that fail to decode, and set bit b iff a STRICT majority of
    * decodable sampled frames have bit b set (ties → 0, deterministic).
    * Null for null/non-AVI payloads and clips with zero decodable
    * frames. */
  def vhash64(bytes: Array[Byte]): java.lang.Long = {
    val info = graft.ops.Multimodal.parseAvi(bytes).orNull
    if (info == null || info.frames.isEmpty) return null
    val n = info.frames.length
    val k = math.min(n, MaxFrames)
    val votes = new Array[Int](64)
    var decoded = 0
    var j = 0
    while (j < k) {
      val (off, len) = info.frames(j * n / k)
      if (off >= 0 && len >= 0 && off + len <= bytes.length) {
        val h = ImageHash.dHash(java.util.Arrays.copyOfRange(bytes, off, off + len))
        if (h != null) {
          decoded += 1
          val hv = h.longValue
          var b = 0
          while (b < 64) {
            if (((hv >>> b) & 1L) == 1L) votes(b) += 1
            b += 1
          }
        }
      }
      j += 1
    }
    if (decoded == 0) return null
    var hash = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) * 2 > decoded) hash |= 1L << b
      b += 1
    }
    java.lang.Long.valueOf(hash)
  }
}

/** Native video-hash expression over a binary column: one compiled
  * static call per row inside whole-stage codegen; null for non-AVI /
  * frameless payloads. */
case class VideoDHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // undecodable payload → null hash
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a binary column")
  override def prettyName: String = "graft_video_dhash"
  override protected def nullSafeEval(input: Any): Any =
    VideoHash.vhash64(input.asInstanceOf[Array[Byte]]) // may be null
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("vdh")
      s"""
         |java.lang.Long $res = graft.functions.VideoHash.vhash64($c);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $res.longValue();
         |}
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): VideoDHash64 =
    copy(child = newChild)
}

object MediaHashFunctions {
  def audioFp64(payload: Column): Column =
    CatalystBridge.column(AudioFp64(CatalystBridge.expression(payload)))
  def videoDHash64(payload: Column): Column =
    CatalystBridge.column(VideoDHash64(CatalystBridge.expression(payload)))
}
