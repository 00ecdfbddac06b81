package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators: image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata structs; decode /
  * feature-extraction / resize / frame-sampling run as batched
  * per-partition transforms.
  *
  * The Spark-side plumbing here is real and tested — schemas, batch
  * iteration, partitioning, output shapes. The codec calls themselves
  * are STUBS (this container has no image/audio libraries): each stub
  * is a deterministic fake derived from the payload bytes, isolated
  * behind a single function so a real libjpeg/ffmpeg binding drops in
  * without touching the distributed plumbing.
  */
object Multimodal {

  val imageMetaType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("format", StringType),
    StructField("n_bytes", LongType)))

  // ---------------------------------------------------------------------
  // STUB decoder boundary. Real implementation: image codec over the
  // byte payload. The fake derives deterministic dimensions from a hash
  // of the bytes so tests are stable and the pipeline is runnable.
  // ---------------------------------------------------------------------
  private[ops] def stubDecodeImage(bytes: Array[Byte]): (Int, Int, String) = {
    // ??? — replace with: ImageIO.read(new ByteArrayInputStream(bytes))
    val h = java.util.Arrays.hashCode(bytes)
    val width = 64 + math.floorMod(h, 1024)
    val height = 64 + math.floorMod(h >> 10, 1024)
    val format = if (math.floorMod(h, 2) == 0) "jpeg" else "png"
    (width, height, format)
  }

  /** Decode image metadata for a binary column. Batched per-partition
    * transform (mapPartitions): one decoder instance per partition, the
    * iterator shape a native codec wants. Output schema = input cols +
    * `meta` struct. */
  def decodeImageMeta(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("meta", imageMetaType))
    implicit val enc = Encoders.row(outSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      // per-partition decoder setup would go here (native lib init)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val meta = if (bytes == null) null else {
          val (w, h, fmt) = stubDecodeImage(bytes)
          Row(w, h, fmt, bytes.length.toLong)
        }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }
  }

  /** Feature extraction stub: fixed-size float vector per payload
    * (deterministic from content). Real impl: a vision encoder over the
    * decoded image; the batched-iterator plumbing is identical. */
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
    * `stride`-th frame is the real logic. */
  def sampleFrames(df: DataFrame, binCol: String, stride: Int,
                   bytesPerFrame: Int = 1024): DataFrame = {
    val nFrames = greatest(lit(1),
      (length(col(binCol)) / bytesPerFrame).cast("int")) // ??? real: container demux
    df.withColumn("frame_idx",
        explode(sequence(lit(0), nFrames - 1, lit(stride))))
      .withColumn("frame_ref",
        concat(lit("frame:"), col("frame_idx").cast("string")))
  }

  /** Resize stub: new payload bytes would be produced by the codec;
    * here metadata-only transform showing the column-update shape. */
  def resizeImages(df: DataFrame, metaCol: String, maxSide: Int): DataFrame = {
    val m = col(metaCol)
    val scale = least(lit(1.0),
      lit(maxSide).cast("double") / greatest(m.getField("width"), m.getField("height")))
    df.withColumn("resized_meta", struct(
      (m.getField("width") * scale).cast("int").as("width"),
      (m.getField("height") * scale).cast("int").as("height"),
      m.getField("format").as("format"),
      m.getField("n_bytes").as("n_bytes")))
  }
}
