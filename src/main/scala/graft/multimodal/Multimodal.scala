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
}
