package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque binary
  * columns + typed metadata structs.
  *
  * The actual media decode is STUBBED (this container has no image or
  * audio libraries): `decodeImageMeta` derives a deterministic fake
  * header from the bytes. Everything Spark-side — schema, batching,
  * partition sizing, mapPartitions signature — is real and tested, so
  * swapping in a real decoder is a one-function change.
  */
object Multimodal {

  val imageMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("format", StringType),
    StructField("n_bytes", IntegerType)))

  /** STUB decode: derives (width, height, format) deterministically
    * from the payload bytes. Real decode would parse the image header
    * here — the call signature (bytes -> meta) is the real one.
    */
  def fakeDecode(bytes: Array[Byte]): (Int, Int, String, Int) = {
    if (bytes == null || bytes.isEmpty) return (0, 0, "empty", 0)
    var h = 0L
    var i = 0
    while (i < math.min(bytes.length, 64)) { h = (h * 31 + (bytes(i) & 0xFF)) & 0x7FFFFFFFL; i += 1 }
    val w = (h % 1920 + 1).toInt
    val ht = (h / 1920 % 1080 + 1).toInt
    val fmt = Array("jpeg", "png", "webp").apply((h % 3).toInt)
    (w, ht, fmt, bytes.length)
  }

  /** Batch image-metadata extraction via mapPartitions (the Scala
    * analogue of mapInPandas batching: one decoder init per partition,
    * streaming rows through it).
    */
  def withImageMeta(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("image_meta", imageMetaSchema))
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { iter =>
      // a real decoder would be initialized ONCE here, per partition
      iter.map { r =>
        val bytes = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        val (w, h, fmt, n) = fakeDecode(bytes)
        Row.fromSeq(r.toSeq :+ Row(w, h, fmt, n))
      }
    }
  }

  /** Deterministic frame sampling plan for video payloads: emits
    * (frame_idx, byte_offset) rows without decoding — the shuffle-free
    * explode pattern a real pipeline would use before batch-decoding
    * frames.
    */
  def frameSamplePlan(df: DataFrame, binCol: String, everyN: Int): DataFrame =
    df.withColumn("n_frames",
        greatest(lit(1), (length(col(binCol)) / lit(1024)).cast("int")))
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(lit(0), col("n_frames") - 1), lit(everyN))))
      .withColumn("byte_offset", col("frame_idx") * lit(1024))
      .drop("n_frames")
}
