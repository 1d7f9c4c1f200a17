package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata alongside.
  *
  * The actual media decode (JPEG/WAV/MP4) is STUBBED — the container has no
  * media libraries — behind [[decodeStub]], a deterministic fake keyed on the
  * payload bytes so results are oracle-checkable. Everything around it is the
  * real article: binary schema, per-partition batched iteration
  * (`mapPartitions`, the Scala analogue of a batched pandas UDF), explicit
  * output `StructType`, and row-local metadata projections that never shuffle.
  *
  * Scale posture: payload bytes stay inside their partition — no shuffle ever
  * moves the binary column in these operators; only extracted (small) feature
  * columns flow downstream.
  */
object Multimodal {

  /** Synthesizes a binary payload column from any string column (stand-in
    * for real media bytes in fixtures). */
  def asPayload(c: Column): Column = encode(c, "UTF-8")

  /** Row-local metadata over a binary payload: size, digest, magic bytes.
    * Pure built-ins — stays in whole-stage codegen. */
  def binaryMeta(df: DataFrame): DataFrame =
    df.select(
      col("doc_id"),
      length(col("payload")).cast("long").as("n_bytes"),
      sha2(col("payload"), 256).as("digest"),
      decode(substring(col("payload"), 1, 4), "UTF-8").as("magic"))

  /** Deterministic fake "decode": derives (width, height) from payload size.
    * A real implementation would parse the media header here; the signature
    * — bytes in, fixed-schema features out, no driver involvement — is what
    * a production decode plugs into. */
  private def decodeStub(payload: Array[Byte]): (Int, Int) =
    (payload.length % 640, payload.length % 480)

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  private val frameSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame", BinaryType, nullable = false)))

  /** Frame sampling: split each payload into fixed-size frames, keeping
    * every `stride`-th one — the video-frame-sampling shape (a real decoder
    * would seek keyframes; the slicing/fan-out/schema plumbing is
    * identical). Frames stay inside their source row's partition. */
  def frameSample(df: DataFrame, frameSize: Int, stride: Int): DataFrame = {
    require(frameSize > 0 && stride > 0)
    val spark = df.sparkSession
    val rdd = df.select("doc_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val nFrames = (bytes.length + frameSize - 1) / frameSize
        (0 until nFrames by stride).iterator.map { i =>
          val from = i * frameSize
          val until = math.min(from + frameSize, bytes.length)
          Row(id, i, java.util.Arrays.copyOfRange(bytes, from, until))
        }
      }
    }
    spark.createDataFrame(rdd, frameSchema)
  }

  private val resizeSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_bytes_in", LongType, nullable = false),
    StructField("n_bytes_out", LongType, nullable = false),
    StructField("resized", BinaryType, nullable = false)))

  /** Deterministic stub "resize": strided byte sampling down to at most
    * `width*height` bytes (stride = ceil(len/target)) — a real
    * implementation swaps the sampler for a pixel-domain scaler; the
    * per-partition batched iteration, fixed output schema, and
    * payload-stays-in-partition locality are the production shape. */
  def resize(df: DataFrame, width: Int, height: Int): DataFrame = {
    require(width > 0 && height > 0)
    val target = width * height
    val spark = df.sparkSession
    val rdd = df.select("doc_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val s = math.max(1, (bytes.length + target - 1) / target)
        val out = Array.range(0, bytes.length, s.toInt).map(bytes(_))
        Row(id, width, height, bytes.length.toLong, out.length.toLong, out)
      }
    }
    spark.createDataFrame(rdd, resizeSchema)
  }

  /** Per-partition batched feature extraction over binary payloads —
    * `mapPartitions` so a real decoder could amortize per-batch setup
    * (model load, codec init) exactly once per partition. */
  def decodeFeatures(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select("doc_id", "payload").rdd.mapPartitions { it =>
      // per-partition setup for a real decoder would happen here, once
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (w, h) = decodeStub(bytes)
        Row(id, w, h, bytes.length.toLong)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }
}
