package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Multimodal

/** Query-registry surface for the multimodal plumbing: documents'
  * bytes ride as binary payloads through the real typed
  * mapPartitions decode path (stub decoder — see
  * [[graft.ops.Multimodal]]); the oracle replicates the stub's
  * deterministic byte arithmetic.
  */
object MultimodalQ {
  import Relational.t

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m_media_features" -> ((s, dir) => {
      import s.implicits._
      val media = Multimodal.documentsAsMedia(t(s, dir, "documents"))
      Multimodal.extractFeatures(media).toDF()
        .select($"media_id", $"kind", $"n_bytes",
          $"width".cast("int").as("width"),
          $"height".cast("int").as("height"),
          $"channels".cast("int").as("channels"),
          $"n_frames".cast("int").as("n_frames"))
        .orderBy($"media_id")
    }),

    // binary-column metadata without decode: size + digest.
    "m_media_meta" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id".as("media_id"),
          octet_length(encode($"text", "UTF-8")).cast("long").as("n_bytes"),
          md5($"text").as("digest"))
        .orderBy($"media_id")
    }))

  val oracles: Map[String, String] = Map(
    "m_media_features" ->
      """SELECT doc_id AS media_id, 'text' AS kind,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         CAST(16 + octet_length(encode(text)) % 64 AS INT) AS width,
         CAST(16 + (octet_length(encode(text)) * 7) % 64 AS INT) AS height,
         CAST(1 + doc_id % 3 AS INT) AS channels,
         CAST(1 + octet_length(encode(text)) // 1000 AS INT) AS n_frames
         FROM documents ORDER BY media_id""",
    "m_media_meta" ->
      """SELECT doc_id AS media_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         md5(text) AS digest
         FROM documents ORDER BY media_id""")
}
