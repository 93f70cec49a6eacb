package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travel as opaque `binary` columns with typed metadata
  * extracted by a partition-wise decode stage. The Spark-side
  * plumbing is real — schema handling, per-partition batching via
  * `mapPartitions`, row reassembly through an explicit
  * [[RowEncoder]] — while the actual codec is a deterministic stub
  * ([[StubDecoder]]), because media libraries are unavailable in this
  * environment. Swapping in a real decoder means replacing ONE
  * function of type `Array[Byte] => MediaMeta`.
  *
  * Scale: decode is narrow (no shuffle), CPU-bound, and batches per
  * partition — exactly how a JNI/FFmpeg decode stage deploys on a
  * cluster; size partitions with `spark.sql.files.maxPartitionBytes`
  * so a batch of media fits executor memory.
  */
object BinaryOps {
  /** Typed metadata a decoder yields for one payload. */
  final case class MediaMeta(width: Int, height: Int, channels: Int, format: String)

  type Decoder = Array[Byte] => MediaMeta

  /** Deterministic stand-in for an image decoder: derives plausible
    * dimensions from payload size and format from the first byte.
    * Replace with a real codec in production. */
  object StubDecoder extends Decoder with Serializable {
    def apply(bytes: Array[Byte]): MediaMeta = {
      val n = bytes.length
      val width = 64 + (n * 7) % 960
      val height = 64 + (n * 13) % 960
      val format = if (n == 0) "empty" else if ((bytes(0) & 0xFF) % 2 == 0) "rgb" else "rgba"
      MediaMeta(width, height, 3, format)
    }
  }

  val MetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)
  ))

  /** "Resize": emit a bounded-size derivative payload plus target
    * dimensions. The byte transform is a stub (truncation); the
    * Spark-side shape — a narrow binary→binary projection that
    * codegen executes in place — is exactly how a real scaler
    * deploys. */
  def resize(df: DataFrame, payloadCol: String, width: Int, height: Int): DataFrame =
    df.withColumn("resized_payload", substring(col(payloadCol), 1, width * height / 64))
      .withColumn("resized_width", lit(width))
      .withColumn("resized_height", lit(height))

  /** Sample `nFrames` evenly spaced byte-range "frames" from each
    * payload (video frame-sampling plumbing: one row per frame via
    * posexplode, stub frame extraction = byte slice). */
  def sampleFrames(df: DataFrame, payloadCol: String, nFrames: Int): DataFrame = {
    val p = col(payloadCol)
    val frameLen = greatest(length(p).cast("int").divide(nFrames).cast("int"), lit(1))
    val frames = transform(
      sequence(lit(0), lit(nFrames - 1)),
      i => substring(p, (i * frameLen + 1).cast("int"), frameLen)
    )
    df.select(col("*"), posexplode(frames).as(Seq("frame_idx", "frame_bytes")))
      .where(length(col("frame_bytes")) > 0)
  }

  /** Decode `payloadCol` (binary) partition-wise, appending the
    * decoded metadata columns to every row. */
  def decode(df: DataFrame, payloadCol: String, decoder: Decoder = StubDecoder): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ MetaSchema.fields)
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](payloadIdx)
        val m = decoder(if (bytes == null) Array.emptyByteArray else bytes)
        Row.fromSeq(row.toSeq ++ Seq(m.width, m.height, m.channels, m.format))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
