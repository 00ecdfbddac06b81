package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.types._
import graft.functions.{ImageHash, ImageHashFunctions}
import graft.ops.{Dedup, Multimodal}

/** dHash kernel + imageDHashPairs contract:
  *  - the fixture generator realizes its seeded walk bits EXACTLY in
  *    the hash (bit-level determinism, independently recomputed here);
  *  - invariance to a global brightness shift is exact (Hamming 0) and
  *    to JPEG re-encode within the banded guarantee (Hamming ≤ 3 at the
  *    fixture's 12-level margin);
  *  - corrupt / null / empty payloads hash to null and pair with
  *    nothing.
  */
class ImageHashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def splitmix(seed: Long, r: Int): Long = {
    var z = seed * 0x9E3779B97F4A7C15L + r * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  test("dHash of a tile image equals the seeded walk bits, bit for bit") {
    for (seed <- Seq(0L, 1L, 7L, 12345L, -3L)) {
      val png = Multimodal.renderTileImage(45, 32, "png", seed)
      val got = ImageHash.dHash(png)
      assert(got != null, s"seed $seed: tile image hashed to null")
      var expected = 0L
      for (r <- 0 until 8; c <- 0 until 8)
        if (((splitmix(seed, r) >>> c) & 1L) == 1L) expected |= 1L << (r * 8 + c)
      assert(got.longValue == expected,
        s"seed $seed: dHash ${got.longValue.toHexString} != walk ${expected.toHexString}")
    }
  }

  test("dHash invariances: brightness shift exact, JPEG re-encode within Hamming 3") {
    for (seed <- 0L until 20L) {
      val png = Multimodal.renderTileImage(54, 40, "png", seed)
      val base = ImageHash.dHash(png).longValue
      val bright = ImageHash.dHash(Multimodal.shiftBrightness(png, 16, "png")).longValue
      assert(java.lang.Long.bitCount(base ^ bright) == 0,
        s"seed $seed: brightness shift changed the hash")
      val jpeg = ImageHash.dHash(Multimodal.reencodeImage(png, "jpeg")).longValue
      val d = java.lang.Long.bitCount(base ^ jpeg)
      assert(d <= 3, s"seed $seed: JPEG re-encode moved the hash by $d bits")
    }
  }

  test("low-margin tile sits at EXACTLY the planted Hamming distance (1..6)") {
    // the flatten-one-cell construction's whole-kernel proof: every
    // chosen gradient bit flips, no other bit moves (r12, the image
    // analogue of the audio low-margin family; PNG keeps the
    // margin-zero ties exact)
    for (seed <- 0L until 20L; flips <- 1 to 6) {
      val base = ImageHash.dHash(Multimodal.renderTileImage(45, 32, "png", seed)).longValue
      val flip = ImageHash.dHash(
        Multimodal.renderTileImageFlipped(45, 32, "png", seed, flips)).longValue
      assert(java.lang.Long.bitCount(base ^ flip) == flips,
        s"seed $seed flips=$flips: measured ${java.lang.Long.bitCount(base ^ flip)}")
    }
  }

  test("margin-preserving flip variant also sits at EXACTLY the planted distance on PNG") {
    // the down-step inversion (+24 tail shift) keeps every comparison
    // at the full 12-level margin — used by the video gate whose MJPEG
    // frames would tip the flatten construction's margin-zero ties;
    // on a lossless render the distance is still exact
    for (seed <- 0L until 20L; flips <- 1 to 6) {
      val base = ImageHash.dHash(Multimodal.renderTileImage(45, 32, "png", seed)).longValue
      val flip = ImageHash.dHash(
        Multimodal.renderTileImageFlippedRobust(45, 32, "png", seed, flips)).longValue
      assert(java.lang.Long.bitCount(base ^ flip) == flips,
        s"seed $seed flips=$flips: measured ${java.lang.Long.bitCount(base ^ flip)}")
    }
  }

  test("corrupt / null / empty payloads hash to null") {
    assert(ImageHash.dHash(null) == null)
    assert(ImageHash.dHash(Array.empty[Byte]) == null)
    assert(ImageHash.dHash(Array[Byte](1, 2, 3, 4)) == null)
    assert(ImageHash.dHash("not an image at all".getBytes("UTF-8")) == null)
  }

  test("imageDHashPairs: transformed copies pair, corrupt rows never do") {
    val paySchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("payload", BinaryType)))
    implicit val enc = Encoders.row(paySchema)
    val rows = new java.util.ArrayList[Row]()
    for (i <- 0L until 30L) {
      val png = Multimodal.renderTileImage(36 + i.toInt, 28, "png", i)
      rows.add(Row(i, png))
      rows.add(Row(100L + i, Multimodal.reencodeImage(png, "jpeg")))
    }
    rows.add(Row(900L, Array[Byte](0, 1, 2)))
    rows.add(Row(901L, null))
    val df = spark.createDataFrame(rows, paySchema)
    val pairs = Dedup.imageDHashPairs(df, "id", "payload", maxHamming = 6).collect()
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    for (i <- 0L until 30L)
      assert(found.contains((i, 100L + i)), s"jpeg copy of $i did not pair")
    assert(!pairs.exists(r => r.getLong(0) >= 900L || r.getLong(1) >= 900L),
      "a corrupt/null payload appeared in a pair")
    // distinct seeds carry independent random hashes — no cross pairs
    val cross = found.filter { case (a, b) => (b - a) != 100L || a >= 100L }
    assert(cross.isEmpty, s"spurious cross-image pairs: $cross")
  }
}
