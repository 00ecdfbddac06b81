package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators: image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata structs; decode /
  * feature-extraction / resize / frame-sampling run as batched
  * per-partition transforms.
  *
  * Image decode/encode/resize are REAL (JDK `javax.imageio` —
  * PNG/JPEG/GIF/BMP, headless-safe, zero extra dependencies, used
  * header-only where possible). The remaining fakes are the two
  * model-inference boundaries — feature embedding and video container
  * demux — each isolated behind a single function so a real encoder /
  * ffmpeg binding drops in without touching the distributed plumbing.
  */
object Multimodal {

  // ImageIO's default stream cache spools through temp FILES guarded by
  // a shared lock — with 32 executor threads decoding small in-memory
  // payloads that is pure contention (measured 2.4× slower than
  // single-threaded at sf0.1). Payloads here are byte arrays; cache in
  // memory. Applies once per executor JVM at class load.
  javax.imageio.ImageIO.setUseCache(false)

  val imageMetaType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("format", StringType),
    StructField("n_bytes", LongType)))

  /** Header-only image metadata decode: picks the registered ImageIO
    * reader for the payload and asks it for dimensions WITHOUT decoding
    * pixel data — the cheap path a 100 TB metadata scan wants. Returns
    * None for payloads no reader recognizes (corrupt/unknown bytes must
    * not kill a petabyte job; callers see a null meta struct). */
  private[ops] def decodeImageHeader(bytes: Array[Byte]): Option[(Int, Int, String)] =
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val fmt = reader.getFormatName.toLowerCase match {
              case "jpg" => "jpeg"
              case f => f
            }
            Some((reader.getWidth(0), reader.getHeight(0), fmt))
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch {
      // a payload whose magic bytes select a reader can still have a
      // corrupt header — getWidth/getHeight throw IIOException. Same
      // contract as unrecognized bytes: null meta, never a dead job.
      case _: java.io.IOException => None
      case _: RuntimeException => None
    }

  /** Deterministic synthetic image: a `width`×`height` RGB gradient
    * seeded by `seed`, encoded with the real ImageIO codec ("png" or
    * "jpeg"). This is the executor-side FIXTURE GENERATOR for gates and
    * specs — payload bytes are real compressed images whose dimensions
    * are known from the arguments, so an independent oracle can verify
    * the decode path end-to-end. */
  private[graft] def renderImage(width: Int, height: Int, format: String,
      seed: Long): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    // fill through the backing int[] — setRGB pays a per-pixel color
    // model conversion, ~10× slower for bulk synthesis
    val px = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData
    var y = 0
    while (y < height) {
      val rowBase = y * width
      val rowSeed = seed * 31 + y * 13
      var x = 0
      while (x < width) {
        px(rowBase + x) = ((rowSeed + x * 7) & 0xFFFFFFL).toInt
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    if (!ImageIO.write(img, format, bos))
      throw new IllegalArgumentException(s"no ImageIO writer for format $format")
    bos.toByteArray
  }

  /** Decode image metadata for a binary column. Batched per-partition
    * transform (mapPartitions): one decoder instance per partition, the
    * iterator shape a native codec wants. Output schema = input cols +
    * `meta` struct (null when the payload is null or undecodable). */
  def decodeImageMeta(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("meta", imageMetaType))
    implicit val enc = Encoders.row(outSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val meta =
          if (bytes == null) null
          else decodeImageHeader(bytes) match {
            case Some((w, h, fmt)) => Row(w, h, fmt, bytes.length.toLong)
            case None => null
          }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }
  }

  /** REAL image resize: decode the payload, scale the longer side down
    * to `maxSide` (never up), redraw with bilinear interpolation, and
    * re-encode with the payload's own format. Target dimensions are
    * floor(side × scale) with a 1-px floor — the same floor() an
    * external oracle computes. Output = input cols + `resized` binary +
    * `resized_meta` struct (null for undecodable payloads). Per-row CPU
    * is bounded by maxSide², independent of corpus size. */
  def resizeImagePayloads(df: DataFrame, binCol: String, maxSide: Int): DataFrame = {
    require(maxSide > 0, "resizeImagePayloads: maxSide must be positive")
    val outSchema = StructType(df.schema.fields :+
      StructField("resized", BinaryType) :+ StructField("resized_meta", imageMetaType))
    implicit val enc = Encoders.row(outSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        // one cheap header parse decides everything; full pixel decode
        // only happens for images that actually shrink (the common
        // already-small case costs a header read, nothing more)
        val out: (Array[Byte], Row) =
          if (bytes == null) (null, null)
          else decodeImageHeader(bytes) match {
            case None => (null, null)
            case Some((w, h, fmt)) =>
              val scale = math.min(1.0, maxSide.toDouble / math.max(w, h))
              if (scale >= 1.0) (bytes, Row(w, h, fmt, bytes.length.toLong))
              else {
                val img = try ImageIO.read(new ByteArrayInputStream(bytes))
                          catch { case _: java.io.IOException => null }
                if (img == null) (null, null) // header ok, body corrupt
                else {
                  val tw = math.max(1, math.floor(w * scale).toInt)
                  val th = math.max(1, math.floor(h * scale).toInt)
                  val scaled = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB)
                  val g = scaled.createGraphics()
                  try {
                    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                    g.drawImage(img, 0, 0, tw, th, null)
                  } finally g.dispose()
                  val bos = new ByteArrayOutputStream()
                  ImageIO.write(scaled, fmt, bos)
                  val b = bos.toByteArray
                  (b, Row(tw, th, fmt, b.length.toLong))
                }
              }
          }
        Row.fromSeq(r.toSeq :+ out._1 :+ out._2)
      }
    }
  }

  val audioMetaType: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_frames", LongType),
    StructField("encoding", StringType),
    StructField("n_bytes", LongType)))

  /** Header-only audio metadata decode via the JDK's
    * `javax.sound.sampled` (WAV/AIFF/AU — no external codecs). Returns
    * None for unrecognized payloads, same contract as the image
    * decoder: corrupt bytes must not kill a corpus-scale job. */
  private[ops] def decodeAudioHeader(bytes: Array[Byte])
      : Option[(Int, Int, Long, String)] =
    try {
      val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new ByteArrayInputStream(bytes))
      val af = fmt.getFormat
      Some((af.getSampleRate.toInt, af.getChannels, fmt.getFrameLength.toLong,
        af.getEncoding.toString.toLowerCase))
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** Deterministic synthetic WAV: `nFrames` of 16-bit mono PCM (a
    * seeded waveform) under a standard 44-byte RIFF/WAVE header — the
    * audio counterpart of [[renderImage]] for oracle-backed gates.
    * The header is written directly (the canonical fixed layout;
    * AudioSystem.write produces the identical container but pays
    * stream-copy overhead per call — measured 3 s/5 000 docs, pure
    * fixture cost). DECODING still goes through the real JDK reader. */
  private[graft] def renderWav(nFrames: Int, sampleRate: Int, seed: Long): Array[Byte] = {
    val dataLen = nFrames * 2 // 16-bit mono
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(1)                       // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)            // byte rate
      .putShort(2)                       // block align
      .putShort(16)                      // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var s = seed
    var i = 0
    while (i < nFrames) {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      buf.putShort((s % 32768).toShort)
      i += 1
    }
    buf.array()
  }

  /** Decode audio metadata for a binary column (batched per-partition,
    * like [[decodeImageMeta]]); null meta for null/undecodable rows. */
  def decodeAudioMeta(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("ameta", audioMetaType))
    implicit val enc = Encoders.row(outSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val meta =
          if (bytes == null) null
          else decodeAudioHeader(bytes) match {
            case Some((rate, ch, frames, enc0)) =>
              Row(rate, ch, frames, enc0, bytes.length.toLong)
            case None => null
          }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }
  }

  /** Feature extraction stub: fixed-size float vector per payload
    * (deterministic from content). Real impl: a vision encoder over the
    * decoded image; the batched-iterator plumbing is identical. This is
    * one of the two model-inference boundaries that stay fake (no model
    * weights ship in a query engine). */
  def extractFeatures(df: DataFrame, binCol: String, dim: Int = 16): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType)))
    implicit val enc = Encoders.row(outSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val vec = if (bytes == null) null else {
          // ??? — replace with model inference; deterministic fake:
          val seed = java.util.Arrays.hashCode(bytes)
          Array.tabulate(dim)(i => ((seed * (i + 1)).toFloat / Int.MaxValue))
        }
        Row.fromSeq(r.toSeq :+ vec)
      }
    }
  }

  /** Frame sampling for video payloads: emit one row per sampled frame
    * index (explode — the output-shape pattern for frame-level rows).
    * Frame count is stub-derived from payload size; sampling every
    * `stride`-th frame is the real logic. Container demux is the other
    * model/codec boundary that stays fake (no ffmpeg in a JVM-only
    * engine). */
  def sampleFrames(df: DataFrame, binCol: String, stride: Int,
                   bytesPerFrame: Int = 1024): DataFrame = {
    val nFrames = greatest(lit(1),
      (length(col(binCol)) / bytesPerFrame).cast("int")) // ??? real: container demux
    df.withColumn("frame_idx",
        explode(sequence(lit(0), nFrames - 1, lit(stride))))
      .withColumn("frame_ref",
        concat(lit("frame:"), col("frame_idx").cast("string")))
  }

  /** Metadata-only resize projection: computes the post-resize
    * dimensions from an existing meta struct without touching payload
    * bytes — the planning/estimation shape (e.g. "how many pixels would
    * this corpus be at 512px?") that must not pay decode cost. The
    * byte-producing variant is [[resizeImagePayloads]]. */
  def resizeImages(df: DataFrame, metaCol: String, maxSide: Int): DataFrame = {
    val m = col(metaCol)
    val scale = least(lit(1.0),
      lit(maxSide).cast("double") / greatest(m.getField("width"), m.getField("height")))
    df.withColumn("resized_meta", struct(
      greatest(lit(1), floor(m.getField("width") * scale).cast("int")).as("width"),
      greatest(lit(1), floor(m.getField("height") * scale).cast("int")).as("height"),
      m.getField("format").as("format"),
      m.getField("n_bytes").as("n_bytes")))
  }
}
