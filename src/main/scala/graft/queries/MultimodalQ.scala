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

  /** the dHash table both m_phash entries derive from */
  private def phashTable(s: SparkSession, dir: String) =
    Multimodal.dhash(Multimodal.documentsAsMedia(t(s, dir, "documents")))

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
    }),

    // video-shape frame sampling: every 3rd fixed-64-byte frame,
    // fingerprinted (see Multimodal.sampleFrames — explode-shaped
    // typed mapPartitions; the fixture corpus is ASCII so the
    // char-sliced oracle is byte-exact).
    "m_frame_sample" -> ((s, dir) => {
      import s.implicits._
      Multimodal.sampleFrames(
        Multimodal.documentsAsMedia(t(s, dir, "documents")), stride = 3)
        .toDF().orderBy($"media_id", $"frame_idx")
    }),

    // ViT-patchify shape: 64-byte frames → 16-byte patches with
    // per-patch digest + byte sum (see Multimodal.patchify).
    "m_patchify" -> ((s, dir) => {
      import s.implicits._
      Multimodal.patchify(
        Multimodal.documentsAsMedia(t(s, dir, "documents")),
        patchBytes = 16)
        .toDF().orderBy($"media_id", $"frame_idx", $"patch_idx")
    }),

    // audio-shape windowed stats: 16-sample windows over the
    // payload's token-length PCM stand-in (Multimodal.windowedPcm).
    "m_audio_windows" -> ((s, dir) => {
      import s.implicits._
      Multimodal.windowedPcm(
        Multimodal.documentsAsMedia(t(s, dir, "documents")), window = 16)
        .toDF().orderBy($"media_id", $"win_idx")
    }),

    // image-preprocessing shape: nearest-neighbor resize of the
    // stubbed byte-grid image to a fixed 8×8 (Multimodal.resizeNearest
    // — one typed-mapPartitions row per media).
    "m_resize" -> ((s, dir) => {
      import s.implicits._
      Multimodal.resizeNearest(
        Multimodal.documentsAsMedia(t(s, dir, "documents")),
        outW = 8, outH = 8)
        .toDF().orderBy($"media_id")
    }),

    // Perceptual-hash table (dHash 9×8 gradient bits) — the image
    // near-dup fingerprint every multimodal curation pipeline keys
    // on (image dedup before caption alignment).
    "m_phash" -> ((s, dir) => {
      import s.implicits._
      phashTable(s, dir).toDF().orderBy($"media_id")
    }),

    // Image near-dup pairs: 4×16-bit bands over the dHash (a band is
    // a 4-hex-char substring) generate candidates — pigeonhole recall
    // for hamming ≤ 3, and in practice most gradient-similar media
    // collide on some band well past that — then the exact hamming
    // (conv/xor/bit_count per band, all codegen) verifies ≤ 6. The
    // banded join is what bounds candidates at 100 TB, exactly like
    // the SimHash text twin.
    "m_phash_pairs" -> ((s, dir) => {
      import s.implicits._
      val hx = phashTable(s, dir).toDF()
      val bands = hx.select($"media_id", $"dhash",
          explode(sequence(lit(0), lit(3))).as("bk"))
        .select($"media_id", $"dhash", $"bk",
          expr("substring(dhash, bk * 4 + 1, 4)").as("key"))
      val cand = bands.select($"media_id".as("ma"), $"dhash".as("da"),
          $"bk", $"key")
        .join(bands.select($"media_id".as("mb"), $"dhash".as("db"),
          $"bk", $"key"), Seq("bk", "key"))
        .filter($"ma" < $"mb")
        .select($"ma", $"da", $"mb", $"db").distinct()
      def bandNum(c: org.apache.spark.sql.Column, b: Int) =
        conv(substring(c, b * 4 + 1, 4), 16, 10).cast("long")
      val ham = (0 until 4).map(b =>
        bit_count(bandNum($"da", b).bitwiseXOR(bandNum($"db", b))))
        .reduce(_ + _)
      cand.withColumn("hamming", ham.cast("long"))
        .filter($"hamming" <= 6)
        .select($"ma", $"mb", $"hamming")
        .orderBy($"ma", $"mb")
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
         FROM documents ORDER BY media_id""",
    "m_frame_sample" ->
      """WITH m AS (SELECT doc_id AS media_id, text,
             length(text)::BIGINT AS n FROM documents),
         f AS (SELECT media_id, text, n,
             unnest(range(0, (n + 63) // 64)) AS fi FROM m),
         s AS (SELECT media_id, fi, fi * 64 AS off,
             least(64, n - fi * 64) AS flen, text
           FROM f WHERE fi % 3 = 0)
         SELECT media_id, fi::INT AS frame_idx, off::BIGINT AS frame_off,
           flen::INT AS frame_len,
           md5(substring(text, (off + 1)::INT, flen::INT)) AS frame_fp
         FROM s ORDER BY media_id, frame_idx""",
    "m_patchify" ->
      """WITH m AS (SELECT doc_id AS media_id, text,
             length(text)::BIGINT AS n FROM documents),
         f AS (SELECT media_id, text, n,
             unnest(range(0, (n + 63) // 64)) AS fi FROM m),
         pp AS (SELECT media_id, text, n, fi,
             unnest(range(0, (least(64, n - fi * 64) + 15) // 16)) AS pi
           FROM f),
         s AS (SELECT media_id, fi, pi, fi * 64 + pi * 16 AS off,
             least(16, n - (fi * 64 + pi * 16)) AS plen, text FROM pp)
         SELECT media_id, fi::INT AS frame_idx, pi::INT AS patch_idx,
           off::BIGINT AS off, plen::INT AS len,
           md5(substring(text, (off + 1)::INT, plen::INT)) AS fp,
           CAST(list_sum(list_transform(
             string_split(substring(text, (off + 1)::INT, plen::INT), ''),
             x -> ord(x))) AS BIGINT) AS byte_sum
         FROM s ORDER BY media_id, frame_idx, patch_idx""",
    "m_audio_windows" ->
      """WITH base AS (SELECT doc_id AS media_id,
             string_split_regex(trim(text), '\s+') AS w FROM documents),
         s AS (SELECT media_id, (i - 1) AS idx, length(w[i])::BIGINT AS v
           FROM (SELECT media_id, w, unnest(range(1, len(w) + 1)) AS i
                 FROM base))
         SELECT media_id, (idx // 16)::INT AS win_idx,
           count(*)::BIGINT AS n_samples, sum(v * v)::BIGINT AS energy,
           ((sum(v) * 1000000) // count(*))::BIGINT AS mean_micro
         FROM s GROUP BY 1, 2 ORDER BY media_id, win_idx""",
    "m_resize" ->
      """WITH m AS (SELECT doc_id AS media_id, text,
             length(text)::BIGINT AS n FROM documents),
         g AS (SELECT media_id, text, n,
             greatest(1, (n + 15) // 16) AS src_h FROM m),
         px AS (SELECT media_id, src_h,
             list_transform(range(0, 64), i ->
               CASE WHEN ((i // 8) * src_h // 8) * 16 + (i % 8) * 2 < n
                 THEN ord(substring(text,
                   (((i // 8) * src_h // 8) * 16 + (i % 8) * 2 + 1)::INT, 1))
                 ELSE 0 END) AS p
           FROM g)
         SELECT media_id, 16 AS src_w, src_h::INT AS src_h,
           8 AS out_w, 8 AS out_h,
           list_sum(p)::BIGINT AS px_sum,
           md5(list_aggregate(list_transform(p, x -> x::VARCHAR),
             'string_agg', ',')) AS px_fp
         FROM px ORDER BY media_id""",
    "m_phash" ->
      s"""WITH $phashCtes
         SELECT media_id, dhash FROM hx ORDER BY media_id""",
    "m_phash_pairs" ->
      s"""WITH $phashCtes,
         bands AS (SELECT media_id, b, dhash, unnest(range(0, 4)) AS bk
           FROM hx),
         keyed AS (SELECT media_id, b, bk,
             substring(dhash, (bk * 4 + 1)::INT, 4) AS key FROM bands),
         cand AS (SELECT DISTINCT a.media_id ma, c.media_id mb
           FROM keyed a JOIN keyed c ON a.bk = c.bk AND a.key = c.key
             AND a.media_id < c.media_id),
         ham AS (SELECT ma, mb,
             (SELECT CAST(len(list_filter(range(0, 64),
                 k -> ba.b[k+1] != bb.b[k+1])) AS BIGINT)
              FROM hx ba, hx bb
              WHERE ba.media_id = ma AND bb.media_id = mb) AS hamming
           FROM cand)
         SELECT ma, mb, hamming FROM ham WHERE hamming <= 6
         ORDER BY ma, mb""")

  /** shared dHash derivation CTEs (pixels → gradient bits → hex) —
    * the exact replay of Multimodal.dhash's stubbed sampling
    * (a def: the oracles val above interpolates it at init)
    */
  private def phashCtes: String =
    """m AS (SELECT doc_id AS media_id, text,
           length(text)::BIGINT AS n FROM documents),
       g AS (SELECT media_id, text, n,
           greatest(1, (n + 15) // 16) AS src_h FROM m),
       px AS (SELECT media_id,
           list_transform(range(0, 72), i ->
             CASE WHEN ((i // 9) * src_h // 8) * 16 + (i % 9) * 16 // 9 < n
               THEN ord(substring(text,
                 (((i // 9) * src_h // 8) * 16
                   + (i % 9) * 16 // 9 + 1)::INT, 1))
               ELSE 0 END) AS p
         FROM g),
       bits AS (SELECT media_id,
           list_transform(range(0, 64), k ->
             CASE WHEN p[(k // 8) * 9 + (k % 8) + 1]
                     < p[(k // 8) * 9 + (k % 8) + 2]
               THEN 1 ELSE 0 END) AS b
         FROM px),
       hx AS (SELECT media_id, b,
           list_aggregate(list_transform(range(0, 16), j ->
             substring('0123456789abcdef',
               (b[j*4+1]*8 + b[j*4+2]*4 + b[j*4+3]*2 + b[j*4+4]
                 + 1)::INT, 1)),
             'string_agg', '') AS dhash
         FROM bits)"""
}
