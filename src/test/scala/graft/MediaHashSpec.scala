package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.types._
import graft.functions.{AudioFingerprint, VideoHash}
import graft.ops.{Dedup, Multimodal}

/** Audio fingerprint + video hash kernel contracts:
  *  - the walk-WAV fixture realizes its seeded level-walk comparisons
  *    EXACTLY in the fingerprint (recomputed here from the levels);
  *  - invariance to gain halving, ±8 dither and 2× sample duplication
  *    is exact (Hamming 0) at the fixture's 2000-level margins;
  *  - the video majority hash of a correlated-frame clip equals the
  *    underlying tile's dHash within small Hamming, and survives
  *    per-frame re-encode / global brightness shift within the banded
  *    pairing tolerance;
  *  - corrupt / null / wrong-modality payloads hash to null and pair
  *    with nothing.
  */
class MediaHashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("audio fp of a walk WAV equals the level-walk comparisons, bit for bit") {
    for (seed <- Seq(0L, 1L, 7L, 12345L, -3L)) {
      val wav = Multimodal.renderWalkWav(30, 8000, seed)
      val got = AudioFingerprint.fp64(wav)
      assert(got != null, s"seed $seed: walk WAV fingerprinted to null")
      val levels = Multimodal.fpWalkLevels(seed)
      var expected = 0L
      for (f <- 0 until 64) if (levels(f + 1) > levels(f)) expected |= 1L << f
      assert(got.longValue == expected,
        s"seed $seed: fp ${got.longValue.toHexString} != walk ${expected.toHexString}")
    }
  }

  test("audio fp invariances: gain half, dither, 2x resample all exact") {
    for (seed <- 0L until 20L) {
      val base = AudioFingerprint.fp64(Multimodal.renderWalkWav(28, 8000, seed)).longValue
      val gain = AudioFingerprint.fp64(
        Multimodal.renderWalkWav(28, 8000, seed, gainDen = 2)).longValue
      val dith = AudioFingerprint.fp64(
        Multimodal.renderWalkWav(28, 8000, seed, dither = 8)).longValue
      val resa = AudioFingerprint.fp64(
        Multimodal.renderWalkWav(28, 16000, seed, repeat = 2)).longValue
      assert(java.lang.Long.bitCount(base ^ gain) == 0, s"seed $seed: gain moved fp")
      assert(java.lang.Long.bitCount(base ^ dith) == 0, s"seed $seed: dither moved fp")
      assert(java.lang.Long.bitCount(base ^ resa) == 0, s"seed $seed: resample moved fp")
    }
  }

  test("low-margin render sits at EXACTLY the planted Hamming distance (1..6)") {
    // the flatten-one-frame construction's whole-kernel proof: every
    // chosen comparison bit flips, no other bit moves (r12, the
    // nonzero-distance counterpart of the invariance test above)
    for (seed <- 0L until 20L; flips <- 1 to 6) {
      val base = AudioFingerprint.fp64(Multimodal.renderWalkWav(28, 8000, seed)).longValue
      val flip = AudioFingerprint.fp64(
        Multimodal.renderWalkWavFlipped(28, 8000, seed, flips)).longValue
      assert(java.lang.Long.bitCount(base ^ flip) == flips,
        s"seed $seed flips=$flips: measured ${java.lang.Long.bitCount(base ^ flip)}")
    }
  }

  test("audio fp: corrupt / null / short / wrong-modality payloads hash to null") {
    assert(AudioFingerprint.fp64(null) == null)
    assert(AudioFingerprint.fp64(Array.empty[Byte]) == null)
    assert(AudioFingerprint.fp64(Array[Byte](1, 2, 3, 4)) == null)
    assert(AudioFingerprint.fp64("not audio".getBytes("UTF-8")) == null)
    // real WAV, but 32 samples < 65: nothing to fingerprint
    assert(AudioFingerprint.fp64(Multimodal.renderWav(32, 8000, 1L)) == null)
    // real image: a decodable container of the wrong modality
    assert(AudioFingerprint.fp64(Multimodal.renderImage(20, 20, "png", 1L)) == null)
  }

  test("video hash: correlated-frame clip realizes the tile walk; copies stay close") {
    for (seed <- 0L until 20L) {
      def clip(extraDelta: Int, reencode: Boolean): Array[Byte] = {
        val png = Multimodal.renderTileImage(48, 36, "png", seed)
        val frames = (0 until 5).map { f =>
          val jpeg = Multimodal.shiftBrightness(png, extraDelta + 2 * f, "jpeg")
          if (reencode) Multimodal.reencodeImage(jpeg, "jpeg") else jpeg
        }
        Multimodal.muxAvi(frames, 48, 36, usPerFrame = 40000)
      }
      val base = VideoHash.vhash64(clip(0, reencode = false))
      assert(base != null, s"seed $seed: clip hashed to null")
      val tile = graft.functions.ImageHash.dHash(
        Multimodal.renderTileImage(48, 36, "png", seed)).longValue
      val dTile = java.lang.Long.bitCount(base.longValue ^ tile)
      assert(dTile <= 2, s"seed $seed: majority hash is $dTile bits from the tile walk")
      val re = VideoHash.vhash64(clip(0, reencode = true)).longValue
      val dRe = java.lang.Long.bitCount(base.longValue ^ re)
      assert(dRe <= 6, s"seed $seed: frame re-encode moved the hash by $dRe bits")
      val br = VideoHash.vhash64(clip(16, reencode = false)).longValue
      val dBr = java.lang.Long.bitCount(base.longValue ^ br)
      assert(dBr <= 6, s"seed $seed: brightness shift moved the hash by $dBr bits")
      // low-margin clip (r12): margin-preserving flipped tile → the
      // majority hash lands at flips ± the two clips' JPEG-noise
      // allowance (≤ 2 bits each, per dTile above)
      for (flips <- 1 to 2) {
        val fpng = Multimodal.renderTileImageFlippedRobust(48, 36, "png", seed, flips)
        val fframes = (0 until 5).map(f => Multimodal.shiftBrightness(fpng, 2 * f, "jpeg"))
        val fl = VideoHash.vhash64(Multimodal.muxAvi(fframes, 48, 36, 40000)).longValue
        val d = java.lang.Long.bitCount(base.longValue ^ fl)
        assert(d <= flips + 4, s"seed $seed flips=$flips: video distance $d out of band")
      }
    }
  }

  test("video hash: corrupt / null / wrong-modality payloads hash to null") {
    assert(VideoHash.vhash64(null) == null)
    assert(VideoHash.vhash64(Array.empty[Byte]) == null)
    assert(VideoHash.vhash64(Array[Byte](1, 2, 3, 4)) == null)
    assert(VideoHash.vhash64("not a video".getBytes("UTF-8")) == null)
    assert(VideoHash.vhash64(Multimodal.renderWav(100, 8000, 1L)) == null)
    assert(VideoHash.vhash64(Multimodal.renderImage(20, 20, "png", 1L)) == null)
  }

  test("audioFpPairs / videoDHashPairs: transformed copies pair, corrupt rows never do") {
    val paySchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("payload", BinaryType)))
    implicit val enc = Encoders.row(paySchema)

    val audioRows = new java.util.ArrayList[Row]()
    for (i <- 0L until 25L) {
      audioRows.add(Row(i, Multimodal.renderWalkWav(26, 8000, i)))
      audioRows.add(Row(100L + i, Multimodal.renderWalkWav(26, 8000, i, gainDen = 2)))
    }
    audioRows.add(Row(900L, Array[Byte](0, 1, 2)))
    audioRows.add(Row(901L, null))
    val audioPairs = Dedup.audioFpPairs(
      spark.createDataFrame(audioRows, paySchema), "id", "payload", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (i <- 0L until 25L)
      assert(audioPairs.contains((i, 100L + i)), s"gain copy of wav $i did not pair")
    assert(!audioPairs.exists(p => p._1 >= 900L || p._2 >= 900L),
      "a corrupt/null audio payload appeared in a pair")
    val audioCross = audioPairs.filter { case (a, b) => (b - a) != 100L || a >= 100L }
    assert(audioCross.isEmpty, s"spurious cross-clip audio pairs: $audioCross")

    val videoRows = new java.util.ArrayList[Row]()
    for (i <- 0L until 15L) {
      def frames(reencode: Boolean) = (0 until 4).map { f =>
        val jpeg = Multimodal.shiftBrightness(
          Multimodal.renderTileImage(40, 32, "png", i), 2 * f, "jpeg")
        if (reencode) Multimodal.reencodeImage(jpeg, "jpeg") else jpeg
      }
      videoRows.add(Row(i, Multimodal.muxAvi(frames(false), 40, 32, 40000)))
      videoRows.add(Row(100L + i, Multimodal.muxAvi(frames(true), 40, 32, 40000)))
    }
    videoRows.add(Row(900L, Array[Byte](0, 1, 2)))
    videoRows.add(Row(901L, null))
    val videoPairs = Dedup.videoDHashPairs(
      spark.createDataFrame(videoRows, paySchema), "id", "payload", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (i <- 0L until 15L)
      assert(videoPairs.contains((i, 100L + i)), s"re-encoded copy of clip $i did not pair")
    assert(!videoPairs.exists(p => p._1 >= 900L || p._2 >= 900L),
      "a corrupt/null video payload appeared in a pair")
    val videoCross = videoPairs.filter { case (a, b) => (b - a) != 100L || a >= 100L }
    assert(videoCross.isEmpty, s"spurious cross-clip video pairs: $videoCross")
  }
}
