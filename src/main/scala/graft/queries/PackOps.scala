package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus assembly operators over the `documents` table —
  * the last mile of an LLM data pipeline after filtering/dedup:
  * deterministic global shuffle into shards, GPT-style sequence
  * packing (concatenate the token stream, cut fixed-size blocks),
  * and per-source (domain) corpus statistics with a C4-style keep
  * verdict.
  *
  * Everything is seeded md5 arithmetic so each operator has an exact
  * DuckDB oracle: the "random" shuffle order is the md5 of a seeded
  * key — the standard trick for a reshuffle that is reproducible
  * across runs AND across engines.
  *
  * Scale notes (100 TB): each operator is exactly ONE hash shuffle on
  * the shard key followed by a per-shard window prefix-sum or
  * aggregation — no self-joins, no driver data path. Shard counts are
  * small constants here (8/16) to keep the oracle readable; at
  * cluster scale they become O(corpus/shard-size) and the plan shape
  * is unchanged (hash partition → in-partition sort → running sum),
  * which is exactly how production packing jobs are laid out.
  */
object PackOps {
  import Relational.t
  import TextOps.wordsCol

  /** seeded md5 shuffle key + its 32-bit prefix as a long */
  private def skeyCol(seed: String) =
    md5(concat(lit(seed), col("doc_id")))
  private def hash32(c: org.apache.spark.sql.Column) =
    conv(substring(c, 1, 8), 16, 10).cast("long")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Deterministic global shuffle: every doc gets a seeded md5 key;
    // shard = key-hash mod 16, pos = rank of the key inside the
    // shard. Reading shards 0..15 in pos order IS the training order
    // — reproducible, engine-independent, and a single hash shuffle
    // (the window sort is per-shard, the partitioner's own order).
    "p_shuffle_shards" -> ((s, dir) => {
      import s.implicits._
      val keyed = t(s, dir, "documents")
        .select($"doc_id", skeyCol("shuffle:42:").as("skey"))
        .withColumn("shard", hash32($"skey") % 16)
      keyed
        .withColumn("pos", row_number().over(
          Window.partitionBy($"shard").orderBy($"skey")).cast("long"))
        .select($"doc_id", $"shard", $"pos")
        .orderBy($"doc_id")
    }),

    // GPT-style sequence packing: concatenate every doc's tokens in
    // shuffled order and cut the stream into fixed CTX-token blocks;
    // a doc spans blocks [start/CTX, (end-1)/CTX]. No padding waste
    // by construction — the per-doc block span and offset is all a
    // trainer needs to slice examples. One shuffle + one prefix-sum
    // window; the canonical distributed layout for packing jobs.
    "p_seq_pack" -> ((s, dir) => {
      import s.implicits._
      val ctx = 64
      val base = t(s, dir, "documents")
        .select($"doc_id", size(wordsCol).cast("long").as("n_tokens"),
          skeyCol("pack:42:").as("skey"))
        .withColumn("shard", hash32($"skey") % 8)
      val w = Window.partitionBy($"shard").orderBy($"skey")
        .rowsBetween(Window.unboundedPreceding, -1)
      base
        .withColumn("start_tok", coalesce(sum($"n_tokens").over(w), lit(0L)))
        .select($"doc_id", $"shard", $"n_tokens", $"start_tok",
          expr(s"start_tok div $ctx").as("first_block"),
          expr(s"(start_tok + n_tokens - 1) div $ctx").as("last_block"),
          ($"start_tok" % ctx).as("block_off"))
        .orderBy($"doc_id")
    }),

    // Per-source (domain) corpus stats + C4-style source verdict:
    // docs/tokens per source, English fraction, exact-dup rate inside
    // the source (normalized-text md5), and a keep flag combining the
    // thresholds with a static blocklist — the shape of C4's domain
    // filtering. One narrow per-doc projection + one aggregation on
    // the (low-cardinality) source key; dup counting reuses the
    // per-source md5 — countDistinct is partial-aggregated map-side.
    // Temperature-scaled source mixture (the XLM-R α-sampling shape,
    // α = 0.5): per-source weight √n̄ kept INTEGER (⌊√(n·1e6)⌋) so the
    // total is an order-independent long sum; per-doc keep decisions
    // are salted-md5 thresholds (shuffle-free), the target budget is
    // 200 docs. Doubles appear only in single divisions of exact
    // integers — both engines replay bit-for-bit.
    "p_mixture" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id", $"source")
      val per = docs.groupBy($"source").agg(count(lit(1)).as("n_docs"))
        .withColumn("w",
          floor(sqrt($"n_docs".cast("double") * 1e6)).cast("long"))
      val rates = per
        .crossJoin(broadcast(per.agg(sum($"w").as("sw"))))
        .withColumn("p_mix", $"w".cast("double") / $"sw")
        .withColumn("thresh",
          floor($"w".cast("double") * 2e8 /
            ($"sw" * $"n_docs").cast("double")).cast("long"))
      val kept = docs
        .join(broadcast(rates.select($"source", $"thresh".as("th"))),
          Seq("source"))
        .filter(conv(substring(md5(concat(lit("mix:"), $"doc_id")), 1, 8),
          16, 10).cast("long") % 1000000L < $"th")
        .groupBy($"source").agg(count(lit(1)).as("n_sampled"))
      rates.join(kept, Seq("source"), "left_outer")
        .select($"source", $"n_docs", round($"p_mix", 9).as("p_mix"),
          $"thresh", coalesce($"n_sampled", lit(0L)).as("n_sampled"))
        .orderBy($"source")
    }),

    "p_domain_stats" -> ((s, dir) => {
      import s.implicits._
      val blocklist = Seq("src13", "src7")
      val perDoc = t(s, dir, "documents")
        .select($"source", $"doc_id", $"lang",
          size(wordsCol).cast("long").as("n_tokens"),
          md5(regexp_replace(lower(trim($"text")), "\\s+", " ")).as("fp"))
      perDoc.groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tokens").as("total_tokens"),
          (sum($"n_tokens") * 1.0 / count(lit(1))).as("mean_tokens"),
          (sum(when($"lang" === "en", 1L).otherwise(0L)) * 1.0
            / count(lit(1))).as("en_frac"),
          (count(lit(1)) - countDistinct($"fp")).as("dup_docs"))
        .select($"source", $"n_docs", $"total_tokens", $"mean_tokens",
          $"en_frac", $"dup_docs",
          (!$"source".isin(blocklist: _*) && $"en_frac" >= 0.2 &&
            $"mean_tokens" >= 20.0 &&
            $"dup_docs" * 1.0 / $"n_docs" <= 0.5).as("keep"))
        .orderBy($"source")
    }),

    // Curriculum ordering (easy→hard data scheduling): docs rank by a
    // cheap integer quality score (distinct-word ratio in micro units
    // — INTEGER division, so the rank key is exact) and split into 3
    // curriculum stages by global rank terciles; stage_pos is the
    // in-stage training order. One sort-shuffle on the score key —
    // at cluster scale the global row_number becomes a range-partition
    // rank (same plan shape Spark uses for orderBy writes).
    "p_curriculum" -> ((s, dir) => {
      import s.implicits._
      val scored = t(s, dir, "documents")
        .select($"doc_id", wordsCol.as("w"))
        .select($"doc_id",
          expr("size(array_distinct(w)) * cast(1000000 as bigint) div size(w)")
            .as("score"))
      val n = scored.count()
      // global rank via range shuffle + zipWithIndex (ScaleRank) —
      // not an unpartitioned Window (single-task sort at scale). The
      // in-stage position needs no second window either: stage s
      // starts at rank ceil(s·n/3)+1, so stage_pos is closed-form
      // rank − (s·n+2) div 3 (integer-exact).
      graft.ops.ScaleRank
        .withGlobalRank(scored, "rank", $"score".desc, $"doc_id")
        .withColumn("stage", expr(s"(rank - 1) * 3 div $n"))
        .withColumn("stage_pos",
          expr(s"rank - (stage * $n + 2) div 3").cast("long"))
        .select($"doc_id", $"score", $"rank", $"stage", $"stage_pos")
        .orderBy($"doc_id")
    }),

    // Length-bucketed batching (the dynamic-batching trick): docs
    // group into power-of-2 token-length buckets, each bucket packs
    // B=8 docs per batch in deterministic (doc_id) order, and the
    // per-batch padding waste (B·max_len − Σlen of a full batch) is
    // the metric the bucketing exists to minimize — batching WITHOUT
    // bucketing pads every sequence to the global max. One window
    // shuffle on the bucket key; integer-only arithmetic.
    "p_length_buckets" -> ((s, dir) => {
      import s.implicits._
      val B = 8
      val sized = t(s, dir, "documents")
        .select($"doc_id", size(wordsCol).cast("long").as("n_tok"))
        .filter($"n_tok" > 0)
        // bucket = min b with 2^b >= n_tok (ceil-log2 WITHOUT a float
        // log — ln(x)/ln(2) is off by an ulp at exact powers of two
        // in one engine and not the other; 2^b comparisons are exact
        // in both)
        .withColumn("bucket",
          array_min(filter(sequence(lit(0L), lit(20L)),
            b => pow(lit(2.0), b) >= $"n_tok")))
      val w = Window.partitionBy($"bucket").orderBy($"doc_id")
      sized
        .withColumn("batch_idx",
          ((row_number().over(w) - 1) / B).cast("long"))
        .groupBy($"bucket", $"batch_idx")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tok").as("sum_tok"),
          max($"n_tok").as("max_tok"))
        .withColumn("pad_waste",
          $"n_docs" * $"max_tok" - $"sum_tok")
        .select($"bucket", $"batch_idx", $"n_docs", $"sum_tok",
          $"max_tok", $"pad_waste")
        .orderBy($"bucket", $"batch_idx")
    }))

  val oracles: Map[String, String] = Map(
    "p_shuffle_shards" ->
      """WITH keyed AS (SELECT doc_id,
             md5('shuffle:42:' || doc_id) AS skey
           FROM documents),
         sharded AS (SELECT doc_id, skey,
             ('0x' || substr(skey, 1, 8))::BIGINT % 16 AS shard
           FROM keyed)
         SELECT doc_id, shard,
           row_number() OVER (PARTITION BY shard ORDER BY skey)::BIGINT
             AS pos
         FROM sharded ORDER BY doc_id""",
    "p_seq_pack" ->
      """WITH base AS (SELECT doc_id,
             len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_tokens,
             md5('pack:42:' || doc_id) AS skey
           FROM documents),
         sharded AS (SELECT *,
             ('0x' || substr(skey, 1, 8))::BIGINT % 8 AS shard
           FROM base),
         pos AS (SELECT doc_id, shard, n_tokens,
             coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY skey
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0)::BIGINT AS start_tok
           FROM sharded)
         SELECT doc_id, shard, n_tokens, start_tok,
           (start_tok // 64)::BIGINT AS first_block,
           ((start_tok + n_tokens - 1) // 64)::BIGINT AS last_block,
           (start_tok % 64)::BIGINT AS block_off
         FROM pos ORDER BY doc_id""",
    "p_mixture" ->
      """WITH per AS (SELECT source, count(*)::BIGINT n_docs
           FROM documents GROUP BY 1),
         w AS (SELECT source, n_docs,
             CAST(floor(sqrt(n_docs * 1000000.0)) AS BIGINT) w
           FROM per),
         tot AS (SELECT CAST(SUM(w) AS BIGINT) sw FROM w),
         rates AS (SELECT source, n_docs, w, sw,
             w * 1.0 / sw AS p_mix,
             CAST(floor(w * 200000000.0 / CAST(sw * n_docs AS DOUBLE))
               AS BIGINT) thresh
           FROM w CROSS JOIN tot),
         kept AS (SELECT d.source, count(*)::BIGINT n_sampled
           FROM documents d JOIN rates r USING (source)
           WHERE ('0x' || substr(md5('mix:' || d.doc_id), 1, 8))::BIGINT
             % 1000000 < r.thresh
           GROUP BY 1)
         SELECT r.source, r.n_docs, round(r.p_mix, 9) AS p_mix,
           r.thresh, coalesce(k.n_sampled, 0) AS n_sampled
         FROM rates r LEFT JOIN kept k USING (source)
         ORDER BY r.source""",
    "p_domain_stats" ->
      """WITH per_doc AS (SELECT source, doc_id, lang,
             len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_tokens,
             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
           FROM documents),
         agg AS (SELECT source,
             count(*)::BIGINT AS n_docs,
             sum(n_tokens)::BIGINT AS total_tokens,
             sum(n_tokens) * 1.0 / count(*) AS mean_tokens,
             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) * 1.0
               / count(*) AS en_frac,
             (count(*) - count(DISTINCT fp))::BIGINT AS dup_docs
           FROM per_doc GROUP BY source)
         SELECT source, n_docs, total_tokens, mean_tokens, en_frac,
           dup_docs,
           (source NOT IN ('src13', 'src7') AND en_frac >= 0.2
             AND mean_tokens >= 20.0
             AND dup_docs * 1.0 / n_docs <= 0.5) AS keep
         FROM agg ORDER BY source""",
    "p_curriculum" ->
      """WITH sc AS (SELECT doc_id,
             len(list_distinct(string_split_regex(trim(text), '\s+')))
               * 1000000 // len(string_split_regex(trim(text), '\s+'))
               AS score
           FROM documents),
         r AS (SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
             count(*) OVER () AS n
           FROM sc),
         g AS (SELECT doc_id, score, rank, (rank - 1) * 3 // n AS stage
           FROM r)
         SELECT doc_id, score, rank, stage,
           row_number() OVER (PARTITION BY stage ORDER BY rank)
             AS stage_pos
         FROM g ORDER BY doc_id""",
    "p_length_buckets" ->
      """WITH sized AS (SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
               AS n_tok
           FROM documents
           WHERE len(string_split_regex(trim(text), '\s+')) > 0),
         bucketed AS (SELECT doc_id, n_tok,
             list_min(list_filter(range(0, 21),
               b -> power(2, b) >= n_tok)) AS bucket
           FROM sized),
         batched AS (SELECT bucket, n_tok,
             CAST((row_number() OVER
               (PARTITION BY bucket ORDER BY doc_id) - 1) // 8
               AS BIGINT) AS batch_idx
           FROM bucketed)
         SELECT bucket, batch_idx,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS sum_tok,
           max(n_tok) AS max_tok,
           CAST(count(*) * max(n_tok) - sum(n_tok) AS BIGINT)
             AS pad_waste
         FROM batched GROUP BY bucket, batch_idx
         ORDER BY bucket, batch_idx""")
}
