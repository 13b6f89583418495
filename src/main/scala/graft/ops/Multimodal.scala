package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star M6): media payloads ride as
  * opaque `binary` columns with typed metadata, and decode /
  * feature-extract runs batch-at-a-time over partitions — the schema,
  * partitioning, and batch shape a real image/audio decoder would use
  * with `mapInPandas`-style vectorized UDFs.
  *
  * The decode step itself is STUBBED (no media libraries in this
  * environment): [[FakeDecoder]] derives deterministic pseudo-features
  * from the payload bytes. Swapping in a real decoder touches ONE
  * function; the Spark-side plumbing (typed rows, partition batching,
  * feature schema) is real and oracle-tested via `m_media_features`.
  */
object Multimodal {

  /** Typed media row: payload + envelope metadata. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Typed decoded features (what a real decoder would emit). */
  case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, channels: Int, n_frames: Int)

  /** STUB decoder — deterministic pseudo-features from byte stats.
    * Replace with a real image/audio/video decode; the signature is
    * the contract: one batch of rows in, one batch of features out.
    */
  object FakeDecoder {
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
      rows.map { r =>
        val n = r.payload.length.toLong
        MediaFeatures(r.media_id, r.kind, n,
          width = (16 + n % 64).toInt,
          height = (16 + (n * 7) % 64).toInt,
          channels = (1 + r.media_id % 3).toInt,
          n_frames = (1 + n / 1000).toInt)
      }
  }

  /** Partition-batched decode: the distributed driver of the stub.
    * `mapPartitions` keeps the decoder amortized per batch (decoder
    * init happens once per partition, as with Pandas UDF batches).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(FakeDecoder.decodeBatch _)
  }

  /** Documents→media bridge used by tests and the oracle query: text
    * bytes stand in for a media payload.
    */
  def documentsAsMedia(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      lit("text").as("kind"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }
}
