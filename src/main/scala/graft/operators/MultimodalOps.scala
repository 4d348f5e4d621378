package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video as opaque `BINARY`
 * columns with typed metadata, processed in partition-local batches.
 *
 * The Spark-side shape is real and tested — schema, partitioning,
 * batch iteration, typed output — while the actual media decode is a
 * clearly-marked deterministic STUB (this container has no image/audio
 * libraries). Swapping [[stubDecode]] for a JNI/FFM call to a real
 * decoder changes nothing about the distributed plan.
 */
object MultimodalOps {

  /** Typed metadata a decoder emits per media payload. */
  final case class MediaMeta(
      doc_id: Long,
      bytes: Long,
      width: Int,
      height: Int,
      channels: Int,
      format: String)

  /** A (id, payload) media row. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  /**
   * Attach a fake binary payload derived from the text column — stands
   * in for real image bytes so the pipeline shape is exercised
   * end-to-end on the documents table.
   */
  def withPayload(df: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    df.select(col(idCol).as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"))

  /**
   * STUB decoder: deterministic pseudo-metadata from the payload size.
   * A real implementation would parse the container header (JPEG/PNG/
   * WAV…). Deliberately expressible in SQL so the oracle can verify the
   * plumbing: width = len%640+16, height = (len*7)%480+16.
   */
  def stubDecode(id: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    MediaMeta(id, n,
      (n % 640 + 16).toInt,
      (n * 7 % 480 + 16).toInt,
      3, "stub")
  }

  /**
   * Batch decode: `mapPartitions` over typed rows, decoding in chunks
   * of `batchSize` — the shape a real vectorised decoder (or a Python
   * `mapInPandas` worker) needs: partition-local, no driver round-trip,
   * bounded memory per batch.
   */
  def decodeMeta(df: DataFrame, batchSize: Int = 64): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.as[MediaRow].mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // real code: hand `batch.map(_.payload)` to the decoder in one
        // call; here each row goes through the stub
        batch.map(r => stubDecode(r.doc_id, r.payload))
      }
    }
  }

  /** Pure-column variant of the stub metadata (whole-stage codegen;
    * used by the oracle-checked query). */
  def decodeMetaColumns(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
      length(col("payload")).cast("long").as("bytes"),
      (length(col("payload")) % 640 + 16).as("width"),
      (length(col("payload")).cast("long") * 7 % 480 + 16).cast("int").as("height"),
      lit(3).as("channels"),
      lit("stub").as("format"))

  /**
   * STUB resize: emits the metadata a resize would produce (target
   * box, preserved aspect) without touching pixels.
   */
  def resizeMeta(meta: Dataset[MediaMeta], maxSide: Int = 256)
                (implicit spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions.{greatest => fGreatest}
    meta.toDF()
      .withColumn("scale",
        lit(maxSide) / fGreatest(col("width"), col("height")).cast("double"))
      .withColumn("out_width",
        when(col("scale") >= 1, col("width"))
          .otherwise(floor(col("width") * col("scale"))).cast("int"))
      .withColumn("out_height",
        when(col("scale") >= 1, col("height"))
          .otherwise(floor(col("height") * col("scale"))).cast("int"))
      .drop("scale")
  }

  /**
   * STUB frame sampler for video payloads: deterministic frame indices
   * at a fixed stride — the explode pattern a real sampler uses (one
   * output row per sampled frame, partition-local decode).
   */
  def sampleFrames(df: DataFrame, everyNth: Int = 10,
                   maxFrames: Int = 8): DataFrame = {
    val frameCount = (length(col("payload")) % 300 + 1).cast("int")
    df.select(col("doc_id"), frameCount.as("frame_count"))
      .withColumn("frame_idx", explode(slice(
        sequence(lit(0), col("frame_count") - 1, lit(everyNth)),
        1, maxFrames)))
  }
}
