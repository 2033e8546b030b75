package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column handling for a 100 TB training-data pipeline:
  * image/audio/video as opaque `binary` columns with typed metadata;
  * decode / feature-extract / frame-sample as batched per-partition
  * functions.
  *
  * The Spark-side plumbing — schema, partition-local batching, output
  * shape — is real and tested. The actual media DECODE step is a
  * clearly-marked deterministic STUB (`stubDecode`): this container has
  * no image/audio codecs, so the stub derives pseudo-features from the
  * bytes; swap `decode` for a real codec (JNI/FFI or an inference
  * runtime) without touching the operator shape.
  */
object Multimodal {

  /** A media row: opaque payload + minimal typed metadata. */
  final case class MediaRow(id: Long, content: Array[Byte], format: String,
                            width: Int, height: Int)

  /** One extracted-feature row. */
  final case class MediaFeatures(id: Long, featDim: Int, features: Array[Float])

  /** STUB decode — deterministic pseudo-features from the payload bytes:
    * feature k = (mod-p hash of bytes with seed k) scaled to [0,1).
    * Replace with a real decoder at the same signature.
    */
  def stubDecode(content: Array[Byte], dim: Int): Array[Float] = {
    val P = 1000000007L
    Array.tabulate(dim) { k =>
      var h = k.toLong + 1
      var i = 0
      while (i < content.length) { h = (h * 31 + (content(i) & 0xff)) % P; i += 1 }
      (h.toDouble / P).toFloat
    }
  }

  /** Feature extraction over media rows: batched per partition (the
    * mapInPandas batch shape in Scala form — one decode call per row,
    * amortized setup per partition via the iterator closure).
    */
  def extractFeatures(df: DataFrame, dim: Int,
                      decode: (Array[Byte], Int) => Array[Float] = stubDecode): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup (a real decoder would init its codec here)
        it.map { case (id, bytes) => MediaFeatures(id, dim, decode(bytes, dim)) }
      }(Encoders.product[MediaFeatures])
      .toDF()
  }

  /** Video frame sampling: treat the payload as fixed-size frame chunks
    * and keep every `stride`-th frame — the explode-per-frame plumbing;
    * chunking is the stub standing in for a container demuxer.
    */
  def sampleFrames(df: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        bytes.grouped(frameBytes).zipWithIndex
          .filter(_._2 % stride == 0)
          .map { case (frame, idx) => (id, idx.toLong, frame) }
      }
      .toDF("id", "frame_idx", "frame")
  }

  /** Metadata-level resize: recompute target dims preserving aspect
    * ratio (integer floor), content untouched (a real resize happens in
    * the decode stage).
    */
  def resizeMeta(df: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0), lit(maxSide).cast("double") / greatest(col("width"), col("height")))
    df.withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
  }
}
