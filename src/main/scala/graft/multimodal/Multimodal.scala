package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata.
  *
  * Images/audio/video ride through the engine as `binary` columns with a
  * metadata struct; decode / feature-extraction runs batch-wise inside
  * `mapPartitions` over a typed Dataset (the Scala analogue of
  * mapInPandas: one partition = one batch through the extractor, schema
  * declared up front, partitioning preserved). The actual media decode is
  * STUBBED with a deterministic fake (this container has no codecs — see
  * `FakeDecoder`); everything around it — schema, batch iteration,
  * partition shape, output encoding — is real and tested.
  */
object Multimodal {

  case class BlobRow(doc_id: Long, payload: Array[Byte],
      media_type: String, n_bytes: Long)
  case class FeatureRow(doc_id: Long, n_bytes: Long, width: Int,
      height: Int, features: Array[Double])

  /** Wrap documents into blob rows: payload = utf-8 bytes of text (the
    * sandbox stand-in for real image/audio bytes), typed metadata columns.
    */
  def asBlobs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("application/fake-image").as("media_type"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))

  /** STUB decoder: deterministic fake "image decode" — derives dimensions
    * and a fixed-length feature vector purely from the bytes. A real
    * deployment swaps this object for a codec-backed implementation with
    * the same signature; nothing else changes.
    */
  object FakeDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Array[Double]) = {
      val n = payload.length
      val width = 16 + (n % 16)
      val height = 16 + ((n / 16) % 16)
      // integer lane sums, divided once at the end: the feature values are
      // exact (no accumulation-order float drift), so the DuckDB oracle can
      // state the identical arithmetic over the payload bytes.
      val sums = new Array[Long](8)
      var i = 0
      while (i < n) {
        sums(i % 8) += (payload(i) & 0xFF)
        i += 1
      }
      (width, height, sums.map(_ / 255.0))
    }
  }

  /** Batch feature extraction: one partition streams through the decoder.
    * Partitioning is preserved (no shuffle); the output schema is the
    * declared FeatureRow encoder.
    */
  def extractFeatures(blobs: DataFrame): Dataset[FeatureRow] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("payload"), col("media_type"),
        col("n_bytes")).as[BlobRow]
      .mapPartitions { batch =>
        batch.map { row =>
          val (w, h, f) = FakeDecoder.decode(row.payload)
          FeatureRow(row.doc_id, row.n_bytes, w, h, f)
        }
      }
  }

  case class ResizeRow(doc_id: Long, width: Long, height: Long,
      pixels: Array[Long])

  /** Resize to a t x t grid by nearest-neighbor over the decoded image
    * (the payload bytes read as a row-major `width x height` plane, same
    * dimension rule as FakeDecoder). One row in, one row out, map-only —
    * the same justified opaque-decoder mapPartitions lane as
    * extractFeatures (a real deployment resamples the decoded pixel
    * buffer here). Pure integer arithmetic (source index
    * `((r*h/t)*w + c*w/t) mod n`), so the DuckDB oracle states the
    * identical computation over the payload bytes; an empty payload
    * resizes to all-zero pixels.
    */
  def resize(blobs: DataFrame, t: Int = 4): Dataset[ResizeRow] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("payload"), col("media_type"),
        col("n_bytes")).as[BlobRow]
      .mapPartitions { batch =>
        batch.map { row =>
          val n = row.payload.length
          val w = 16 + (n % 16)
          val h = 16 + ((n / 16) % 16)
          val px = new Array[Long](t * t)
          if (n > 0) {
            var r = 0
            while (r < t) {
              var c = 0
              while (c < t) {
                val idx = ((r * h / t) * w + (c * w / t)) % n
                px(r * t + c) = (row.payload(idx) & 0xFF).toLong
                c += 1
              }
              r += 1
            }
          }
          ResizeRow(row.doc_id, w.toLong, h.toLong, px)
        }
      }
  }

  case class FrameRow(doc_id: Long, frame_idx: Long, frame_len: Long,
      byte_sum: Long)

  /** Frame sampling: the payload read as a fake "video" of fixed
    * `frameLen`-byte frames (the last frame may be short); emit every
    * `every`-th frame's index, length, and byte sum. One row in, MANY
    * rows out through the decoder lane (iterator flatMap inside
    * mapPartitions — partition-preserving, no shuffle), the plumbing a
    * real frame extractor needs. Deterministic integer arithmetic,
    * restated exactly by the DuckDB oracle; an empty payload has no
    * frames and emits nothing.
    */
  def sampleFrames(blobs: DataFrame, frameLen: Int = 32,
      every: Int = 2): Dataset[FrameRow] = {
    require(frameLen > 0 && every > 0,
      s"frameLen/every must be positive, got $frameLen/$every")
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("payload"), col("media_type"),
        col("n_bytes")).as[BlobRow]
      .mapPartitions { batch =>
        batch.flatMap { row =>
          val n = row.payload.length
          val numFrames = (n + frameLen - 1) / frameLen
          (0 until numFrames).iterator
            .filter(_ % every == 0)
            .map { f =>
              val from = f * frameLen
              val until = math.min(n, from + frameLen)
              var sum = 0L
              var i = from
              while (i < until) { sum += (row.payload(i) & 0xFF); i += 1 }
              FrameRow(row.doc_id, f.toLong, (until - from).toLong, sum)
            }
        }
      }
  }
}
