package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over the `events` table, written as batch
  * DataFrame plans that are reusable verbatim under Structured
  * Streaming (`graft.streaming.EventStreams` runs the same windowed
  * aggregations with `readStream` + watermark; StreamingSpec proves
  * batch/stream parity). The batch forms carry the DuckDB oracles.
  *
  * Money/value sums use exact integer cents; window starts are
  * epoch-aligned on both engines (Spark `window()` ↔ DuckDB
  * `time_bucket`).
  */
object EventOps {
  import Relational.t

  /** Normalize the events `ts` column to session-TZ TimestampType
    * whatever the parquet encoding: TIMESTAMP(NANOS) read as long via
    * `nanosAsLong` converts exactly (integer `div 1000` — no double
    * rounding on 1e18-scale values); TIMESTAMP(MICROS) arrives as
    * TIMESTAMP_NTZ and casts instant-preserving (session TZ is UTC
    * in every entry point).
    */
  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  private def ev(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(t(s, dir, "events"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // tumbling 5-minute windows: count + exact value sum.
    "e_tumbling" -> ((s, dir) => {
      import s.implicits._
      ev(s, dir)
        .groupBy(window($"ts", "5 minutes").getField("start").as("wstart"),
          $"event_type")
        .agg(count(lit(1)).as("n"),
          (sum(round($"value" * 100, 0).cast("long")) / 100.0).as("total"))
        .select(date_format($"wstart", "yyyy-MM-dd HH:mm:ss").as("wstart"),
          $"event_type", $"n", $"total")
        .orderBy($"wstart", $"event_type")
    }),

    // sliding 10-minute windows, 5-minute hop.
    "e_sliding" -> ((s, dir) => {
      import s.implicits._
      ev(s, dir)
        .groupBy(window($"ts", "10 minutes", "5 minutes")
          .getField("start").as("wstart"))
        .agg(count(lit(1)).as("n"))
        .select(date_format($"wstart", "yyyy-MM-dd HH:mm:ss").as("wstart"),
          $"n")
        .orderBy($"wstart")
    }),

    // sessionization: 30-minute-gap sessions per user
    // (gaps-and-islands; the streaming twin is
    // session_window/flatMapGroupsWithState).
    "e_sessions" -> ((s, dir) => {
      import s.implicits._
      val byUser = Window.partitionBy($"user_id")
        .orderBy($"ts", $"event_id")
      val flagged = ev(s, dir)
        .withColumn("prev_ts", lag($"ts", 1).over(byUser))
        .withColumn("new_session",
          when($"prev_ts".isNull ||
            unix_timestamp($"ts") - unix_timestamp($"prev_ts") > 1800, 1L)
            .otherwise(0L))
        .withColumn("session_seq",
          sum($"new_session").over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      flagged.groupBy($"user_id", $"session_seq")
        .agg(count(lit(1)).as("n_events"),
          date_format(min($"ts"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          (unix_timestamp(max($"ts")) - unix_timestamp(min($"ts")))
            .as("duration_sec"))
        .select($"user_id", $"session_seq", $"session_start", $"n_events",
          $"duration_sec")
        .orderBy($"user_id", $"session_seq")
    }),

    // per-type stats with exact sums and time bounds.
    "e_type_stats" -> ((s, dir) => {
      import s.implicits._
      ev(s, dir)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          countDistinct($"user_id").as("n_users"),
          date_format(min($"ts"), "yyyy-MM-dd HH:mm:ss").as("first_ts"),
          date_format(max($"ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"),
          (sum(round($"value" * 100, 0).cast("long")) / 100.0).as("total"))
        .orderBy($"event_type")
    }),

    // top-k users by total value.
    "e_user_topk" -> ((s, dir) => {
      import s.implicits._
      ev(s, dir)
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n"),
          (sum(round($"value" * 100, 0).cast("long")) / 100.0).as("total"))
        .orderBy($"total".desc, $"user_id")
        .limit(25)
    }),

    // Data-quality validation (the Deequ shape): per event type, row
    // and distinct-id counts (duplicate detection), null/range checks
    // on value, and arrival-order timestamp regressions per
    // (user, type) — one keyed window + one aggregation, the audit
    // every ingest pipeline runs before promoting a batch.
    "e_dq_checks" -> ((s, dir) => {
      import s.implicits._
      val e = ev(s, dir)
      val w = Window.partitionBy($"user_id", $"event_type")
        .orderBy($"event_id")
      e.withColumn("prev_ts", lag($"ts", 1).over(w))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          countDistinct($"event_id").as("n_ids"),
          sum(when($"value".isNull, 1L).otherwise(0L)).as("n_null_value"),
          sum(when($"value" < 0, 1L).otherwise(0L)).as("n_neg_value"),
          sum(when($"prev_ts".isNotNull && $"ts" < $"prev_ts", 1L)
            .otherwise(0L)).as("n_ts_regress"),
          (count(lit(1)) === countDistinct($"event_id")).as("ids_unique"))
        .orderBy($"event_type")
    }),

    // volume anomaly detection: per-type minute-bucket counts scored
    // by z-score against the type's own bucket distribution, |z| > 3
    // flagged — the monitoring query every event pipeline runs.
    // Mean/σ come from INTEGER sums (Σn, Σn², bucket count) with one
    // double division at the end, so the result is order-independent
    // and replays exactly; two keyed aggregations (map-side combined)
    // plus a broadcast of the per-type stats — nothing here grows
    // with event volume except the first word-count-shaped pass.
    "e_anomaly" -> ((s, dir) => {
      import s.implicits._
      val buckets = ev(s, dir)
        .groupBy($"event_type", date_trunc("minute", $"ts").as("bucket"))
        .agg(count(lit(1)).as("n"))
      val stats = buckets.groupBy($"event_type")
        .agg(count(lit(1)).as("nb"), sum($"n").as("sn"),
          sum($"n" * $"n").as("sq"))
      buckets.join(broadcast(stats), Seq("event_type"))
        .withColumn("mean", $"sn".cast("double") / $"nb")
        .withColumn("sd",
          sqrt(greatest(($"sq".cast("double") / $"nb") - $"mean" * $"mean",
            lit(0.0))))
        .withColumn("z", round(when($"sd" === 0.0, lit(0.0))
          .otherwise(($"n".cast("double") - $"mean") / $"sd"), 9))
        .select($"event_type",
          date_format($"bucket", "yyyy-MM-dd HH:mm:ss").as("bucket"),
          $"n", $"z", (abs($"z") > 3.0).as("is_anomaly"))
        .orderBy($"event_type", $"bucket")
    }),

    // event-type transition matrix (the Markov-chain prep step behind
    // next-event prediction and session modeling): per-user ordered
    // successor pairs → (from, to) counts and row-normalized
    // transition probabilities. One keyed window + two low-cardinality
    // aggregations; integer counts with one double division, so it
    // replays exactly.
    "e_markov" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val pairs = ev(s, dir)
        .withColumn("next_type", lead($"event_type", 1).over(w))
        .filter($"next_type".isNotNull)
        .select($"event_type".as("from_type"), $"next_type".as("to_type"))
      val tr = pairs.groupBy($"from_type", $"to_type")
        .agg(count(lit(1)).as("n"))
      val tot = tr.groupBy($"from_type")
        .agg(sum($"n").cast("long").as("nf"))
      tr.join(tot, Seq("from_type"))
        .select($"from_type", $"to_type", $"n",
          round($"n".cast("double") / $"nf", 9).as("p"))
        .orderBy($"from_type", $"to_type")
    }),

    // Ordered funnel (view → click → purchase, strictly later steps):
    // per user, the first view, the first click after it, the first
    // purchase after that, and the stage reached. Three narrow
    // filtered scans, everything keyed (shuffled) on user_id only —
    // the standard product-analytics funnel at any scale.
    "e_funnel" -> ((s, dir) => {
      import s.implicits._
      val e = ev(s, dir)
      val v = e.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ts").as("t_view"))
      val c = e.filter($"event_type" === "click")
        .select($"user_id", $"ts".as("tc"))
        .join(v, Seq("user_id")).filter($"tc" > $"t_view")
        .groupBy($"user_id").agg(min($"tc").as("t_click"))
      val p = e.filter($"event_type" === "purchase")
        .select($"user_id", $"ts".as("tp"))
        .join(c, Seq("user_id")).filter($"tp" > $"t_click")
        .groupBy($"user_id").agg(min($"tp").as("t_purchase"))
      v.join(c, Seq("user_id"), "left_outer")
        .join(p, Seq("user_id"), "left_outer")
        .select($"user_id",
          date_format($"t_view", "yyyy-MM-dd HH:mm:ss").as("t_view"),
          date_format($"t_click", "yyyy-MM-dd HH:mm:ss").as("t_click"),
          date_format($"t_purchase", "yyyy-MM-dd HH:mm:ss")
            .as("t_purchase"),
          (lit(1) + when($"t_click".isNotNull, 1).otherwise(0) +
            when($"t_purchase".isNotNull, 1).otherwise(0)).as("stage"))
        .orderBy($"user_id")
    }),

    // as-of join: each purchase matched to the user's most recent
    // prior-or-simultaneous click (graft.ops.AsOfJoin union+window
    // composition — single shuffle per side).
    "e_asof_click" -> ((s, dir) => {
      import s.implicits._
      val events = ev(s, dir)
      val purchases = events.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"event_id")
      val clicks = events.filter($"event_type" === "click")
        .select($"user_id", $"ts", $"event_id".as("click_id"))
      graft.ops.AsOfJoin.asofJoin(purchases, clicks,
        keyCols = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        rightValueCols = Seq("click_id"))
        .select($"event_id", $"user_id",
          date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("ts"),
          $"asof_click_id")
        .orderBy($"event_id")
    }),

    // JSON property extraction + aggregation (semi-structured path).
    "e_json_extract" -> ((s, dir) => {
      import s.implicits._
      ev(s, dir)
        .withColumn("k", get_json_object($"props", "$.k").cast("long"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
          (sum($"k") * 1.0 / count($"k")).as("avg_k"))
        .orderBy($"event_type")
    }),

    // cohort retention: users grouped by first-activity date; for each
    // day offset 0..7, how many came back. Two shuffles (first-day per
    // user broadcastable at any scale — one row per user; activity
    // dedup shuffles once on (user, day)).
    "e_retention" -> ((s, dir) => {
      import s.implicits._
      val act = ev(s, dir)
        .select($"user_id", to_date($"ts").as("d")).distinct()
      val first = act.groupBy($"user_id").agg(min($"d").as("cohort"))
      act.join(first, Seq("user_id"))
        .withColumn("off", datediff($"d", $"cohort"))
        .filter($"off" <= 7)
        .groupBy(date_format($"cohort", "yyyy-MM-dd").as("cohort"), $"off")
        .agg(count_distinct($"user_id").as("n_users"))
        .orderBy($"cohort", $"off")
    }),

    // A/B-test readout: deterministic md5 arm assignment (the salted
    // split both engines hash bit-identically), per-arm user and
    // converter counts stay integers, and the two-proportion z-stat
    // is computed once from the 2-row aggregate — the experiment-
    // analysis shape (assignment is per-row, everything else is one
    // tiny aggregation).
    // Interval (range) join, the scale recipe: 20 overlapping 60-hour
    // campaign windows at 36-hour spacing vs the event stream. The
    // naive form is a θ-join (`ts BETWEEN start AND end`) — a nested
    // loop at scale. Instead time quantizes into 12-hour buckets:
    // each interval EXPLODES to the 5 buckets it overlaps, each event
    // has exactly ONE bucket, and the join becomes a hash equi-join
    // on the bucket key refined by the exact containment predicate.
    // An (event, campaign) pair shares exactly one bucket, so no
    // dedup pass is needed. All integer-micros arithmetic (`div`),
    // so DuckDB replays the naive θ-join to the same rows.
    "e_interval_join" -> ((s, dir) => {
      import s.implicits._
      val H = 3600000000L // one hour in micros
      val t0 = 1704067200000000L // 2024-01-01T00:00:00Z in micros
      val B = 12 * H
      val campaigns = s.range(0, 20)
        .select($"id".as("campaign"),
          (lit(t0) + $"id" * (36 * H)).as("start_us"))
        .withColumn("end_us", $"start_us" + 60 * H)
      val cb = campaigns.select($"campaign", $"start_us", $"end_us",
        explode(sequence(expr(s"start_us div $B"),
          expr(s"(end_us - 1) div $B"))).as("bucket"))
      val evb = ev(s, dir)
        .select($"event_id", $"user_id", unix_micros($"ts").as("us"))
        .withColumn("bucket", expr(s"us div $B"))
      val hits = evb.join(cb, Seq("bucket"))
        .filter($"us" >= $"start_us" && $"us" < $"end_us")
        .groupBy($"campaign")
        .agg(count(lit(1)).as("n_events"),
          countDistinct($"user_id").as("n_users"))
      campaigns.select($"campaign")
        .join(hits, Seq("campaign"), "left_outer")
        .select($"campaign",
          coalesce($"n_events", lit(0L)).as("n_events"),
          coalesce($"n_users", lit(0L)).as("n_users"))
        .orderBy($"campaign")
    }),

    "e_ab_test" -> ((s, dir) => {
      import s.implicits._
      val e = ev(s, dir)
      val arms = e.select($"user_id").distinct()
        .withColumn("arm",
          conv(substring(md5(concat(lit("ab:"), $"user_id")), 1, 8),
            16, 10).cast("long") % 2)
      val converted = e.filter($"event_type" === "purchase" &&
          $"value" > 180)
        .select($"user_id").distinct().withColumn("cv", lit(1L))
      val per = arms.join(converted, Seq("user_id"), "left_outer")
        .groupBy($"arm")
        .agg(count(lit(1)).as("n"), count($"cv").as("c"))
      val a0 = per.filter($"arm" === 0)
        .select($"n".as("n0"), $"c".as("c0"))
      val a1 = per.filter($"arm" === 1)
        .select($"n".as("n1"), $"c".as("c1"))
      val j = a0.crossJoin(a1)
      val r0 = $"c0".cast("double") / $"n0"
      val r1 = $"c1".cast("double") / $"n1"
      val p = ($"c0" + $"c1").cast("double") / ($"n0" + $"n1")
      val se = sqrt(p * (lit(1.0) - p) *
        (lit(1.0) / $"n0" + lit(1.0) / $"n1"))
      j.select($"n0", $"c0", $"n1", $"c1",
        round(r0, 9).as("rate0"), round(r1, 9).as("rate1"),
        round((r1 - r0) / se, 9).as("z"))
    }),

    // RFM segmentation (recency / frequency / monetary): per-user
    // purchase stats (exact cents), then tercile scores. ntile(k) over
    // a total order is the closed form ((rank-1)*k) div n + 1 (larger
    // buckets first — the standard ntile rule, identical in Spark and
    // DuckDB), so each segment comes from a SCALE-SAFE global rank
    // (range shuffle + zipWithIndex, ScaleRank) instead of an
    // unpartitioned ntile window that would sort all users in one
    // task. Each ranking carries a user_id tie-break so both engines
    // cut identically.
    "e_rfm" -> ((s, dir) => {
      import s.implicits._
      val p = ev(s, dir).filter($"event_type" === "purchase")
        .select($"user_id", $"ts",
          round($"value" * 100, 0).cast("long").as("vc"))
      val per = p.groupBy($"user_id").agg(
        max($"ts").as("last_ts"),
        count(lit(1)).as("frequency"),
        sum($"vc").as("mon_c"))
      val mx = p.agg(max($"ts").as("mxts"))
      val base = per.crossJoin(broadcast(mx))
        .withColumn("recency_days",
          datediff($"mxts", $"last_ts").cast("long"))
        .localCheckpoint()
      val n = base.count()
      val ranked = graft.ops.ScaleRank.withGlobalRank(
        graft.ops.ScaleRank.withGlobalRank(
          graft.ops.ScaleRank.withGlobalRank(base,
            "__rr", $"recency_days".asc, $"user_id".asc),
          "__rf", $"frequency".desc, $"user_id".asc),
        "__rm", $"mon_c".desc, $"user_id".asc)
      ranked.select($"user_id", $"recency_days", $"frequency",
          ($"mon_c" / 100.0).as("monetary"),
          expr(s"(__rr - 1) * 3 div $n + 1").as("r_seg"),
          expr(s"(__rf - 1) * 3 div $n + 1").as("f_seg"),
          expr(s"(__rm - 1) * 3 div $n + 1").as("m_seg"))
        .withColumn("rfm",
          $"r_seg" * 100 + $"f_seg" * 10 + $"m_seg")
        .orderBy($"user_id")
    }))

  val oracles: Map[String, String] = Map(
    "e_retention" ->
      """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) d
           FROM events),
         first AS (SELECT user_id, MIN(d) cohort FROM act GROUP BY 1)
         SELECT strftime(cohort, '%Y-%m-%d') AS cohort,
           date_diff('day', cohort, d) AS off,
           COUNT(DISTINCT act.user_id) AS n_users
         FROM act JOIN first ON act.user_id = first.user_id
         WHERE date_diff('day', cohort, d) <= 7
         GROUP BY 1, 2 ORDER BY cohort, off""",
    "e_ab_test" ->
      """WITH users AS (SELECT DISTINCT user_id FROM events),
         arms AS (SELECT user_id,
             ('0x' || substr(md5('ab:' || user_id), 1, 8))::BIGINT % 2
               AS arm FROM users),
         conv AS (SELECT DISTINCT user_id FROM events
           WHERE event_type = 'purchase' AND value > 180),
         per AS (SELECT arm, count(*) AS n, count(conv.user_id) AS c
           FROM arms LEFT JOIN conv USING (user_id) GROUP BY 1),
         a0 AS (SELECT CAST(n AS BIGINT) n0, CAST(c AS BIGINT) c0
           FROM per WHERE arm = 0),
         a1 AS (SELECT CAST(n AS BIGINT) n1, CAST(c AS BIGINT) c1
           FROM per WHERE arm = 1)
         SELECT n0, c0, n1, c1,
           round(CAST(c0 AS DOUBLE) / n0, 9) AS rate0,
           round(CAST(c1 AS DOUBLE) / n1, 9) AS rate1,
           round((CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
             / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
               * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
               * (1.0 / n0 + 1.0 / n1)), 9) AS z
         FROM a0 CROSS JOIN a1""",
    "e_rfm" ->
      """WITH p AS (SELECT user_id, ts,
             CAST(round(value*100) AS BIGINT) vc
           FROM events WHERE event_type = 'purchase'),
         per AS (SELECT user_id, max(ts) last_ts,
             count(*) frequency, CAST(sum(vc) AS BIGINT) mon_c
           FROM p GROUP BY 1),
         base AS (SELECT user_id,
             CAST(date_diff('day', last_ts, (SELECT max(ts) FROM p))
               AS BIGINT) recency_days,
             frequency, mon_c
           FROM per)
         SELECT user_id, recency_days, frequency,
           mon_c/100.0 AS monetary,
           CAST(ntile(3) OVER (ORDER BY recency_days ASC, user_id ASC)
             AS BIGINT) AS r_seg,
           CAST(ntile(3) OVER (ORDER BY frequency DESC, user_id ASC)
             AS BIGINT) AS f_seg,
           CAST(ntile(3) OVER (ORDER BY mon_c DESC, user_id ASC)
             AS BIGINT) AS m_seg,
           CAST(ntile(3) OVER (ORDER BY recency_days ASC, user_id ASC)
               AS BIGINT) * 100
             + CAST(ntile(3) OVER (ORDER BY frequency DESC, user_id ASC)
               AS BIGINT) * 10
             + CAST(ntile(3) OVER (ORDER BY mon_c DESC, user_id ASC)
               AS BIGINT) AS rfm
         FROM base ORDER BY user_id""",
    "e_tumbling" ->
      """SELECT strftime(time_bucket(INTERVAL '5 minutes', ts),
           '%Y-%m-%d %H:%M:%S') AS wstart, event_type,
         COUNT(*) AS n,
         SUM(CAST(round(value*100) AS BIGINT))/100.0 AS total
         FROM events GROUP BY 1, 2 ORDER BY wstart, event_type""",
    "e_anomaly" ->
      """WITH b AS (SELECT event_type, date_trunc('minute', ts) bucket,
             count(*) n
           FROM events GROUP BY 1, 2),
         st AS (SELECT event_type, count(*) nb, sum(n) sn, sum(n*n) sq
           FROM b GROUP BY 1),
         j AS (SELECT b.event_type, b.bucket, b.n,
             CAST(st.sn AS DOUBLE) / st.nb AS mean,
             sqrt(greatest(CAST(st.sq AS DOUBLE) / st.nb
               - (CAST(st.sn AS DOUBLE) / st.nb)
                 * (CAST(st.sn AS DOUBLE) / st.nb), 0.0)) AS sd
           FROM b JOIN st USING (event_type)),
         z AS (SELECT event_type, bucket, n,
             round(CASE WHEN sd = 0.0 THEN 0.0
               ELSE (CAST(n AS DOUBLE) - mean) / sd END, 9) AS z
           FROM j)
         SELECT event_type, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
           n, z, abs(z) > 3.0 AS is_anomaly
         FROM z ORDER BY event_type, bucket""",
    "e_markov" ->
      """WITH e2 AS (SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS nt
           FROM events),
         tr AS (SELECT event_type AS from_type, nt AS to_type,
             count(*) AS n
           FROM e2 WHERE nt IS NOT NULL GROUP BY 1, 2),
         tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS nf FROM tr
           GROUP BY 1)
         SELECT t.from_type, t.to_type, t.n,
           round(CAST(t.n AS DOUBLE) / tot.nf, 9) AS p
         FROM tr t JOIN tot USING (from_type)
         ORDER BY from_type, to_type""",
    "e_sliding" ->
      """SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS wstart, COUNT(*) AS n
         FROM (SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
             time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes'])
             AS wstart FROM events)
         GROUP BY 1 ORDER BY wstart""",
    "e_sessions" ->
      """WITH flagged AS (
           SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
               OR CAST(floor(epoch(ts)) AS BIGINT) -
                  CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
               THEN 1 ELSE 0 END AS new_session
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         sessions AS (
           SELECT user_id, ts,
             CAST(SUM(new_session) OVER (PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS session_seq
           FROM flagged)
         SELECT user_id, session_seq,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events,
           CAST(floor(epoch(max(ts))) AS BIGINT) -
             CAST(floor(epoch(min(ts))) AS BIGINT) AS duration_sec
         FROM sessions GROUP BY user_id, session_seq
         ORDER BY user_id, session_seq""",
    "e_type_stats" ->
      """SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users,
         strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
         strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts,
         SUM(CAST(round(value*100) AS BIGINT))/100.0 AS total
         FROM events GROUP BY event_type ORDER BY event_type""",
    "e_user_topk" ->
      """SELECT user_id, COUNT(*) AS n,
         SUM(CAST(round(value*100) AS BIGINT))/100.0 AS total
         FROM events GROUP BY user_id ORDER BY total DESC, user_id LIMIT 25""",
    "e_dq_checks" ->
      """WITH flagged AS (SELECT event_type, event_id, value, ts,
           lag(ts) OVER (PARTITION BY user_id, event_type
             ORDER BY event_id) AS prev_ts
         FROM events)
         SELECT event_type, count(*)::BIGINT AS n,
           count(DISTINCT event_id)::BIGINT AS n_ids,
           sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_null_value,
           sum(CASE WHEN value < 0 THEN 1 ELSE 0 END)::BIGINT
             AS n_neg_value,
           sum(CASE WHEN prev_ts IS NOT NULL AND ts < prev_ts
             THEN 1 ELSE 0 END)::BIGINT AS n_ts_regress,
           (count(*) = count(DISTINCT event_id)) AS ids_unique
         FROM flagged GROUP BY event_type ORDER BY event_type""",
    "e_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) t_view FROM events
           WHERE event_type = 'view' GROUP BY 1),
         c AS (SELECT e.user_id, min(e.ts) t_click FROM events e
           JOIN v ON e.user_id = v.user_id
           WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1),
         p AS (SELECT e.user_id, min(e.ts) t_purchase FROM events e
           JOIN c ON e.user_id = c.user_id
           WHERE e.event_type = 'purchase' AND e.ts > c.t_click
           GROUP BY 1)
         SELECT v.user_id,
           strftime(v.t_view, '%Y-%m-%d %H:%M:%S') AS t_view,
           strftime(c.t_click, '%Y-%m-%d %H:%M:%S') AS t_click,
           strftime(p.t_purchase, '%Y-%m-%d %H:%M:%S') AS t_purchase,
           (1 + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
              + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END) AS stage
         FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
         ORDER BY v.user_id""",
    "e_asof_click" ->
      """WITH u AS (
           SELECT user_id, ts, 1 AS side, event_id,
             CAST(NULL AS BIGINT) AS r_click
           FROM events WHERE event_type = 'purchase'
           UNION ALL
           SELECT user_id, ts, 0, NULL, event_id
           FROM events WHERE event_type = 'click'),
         c AS (
           SELECT user_id, ts, side, event_id,
             last_value(r_click IGNORE NULLS) OVER (
               PARTITION BY user_id
               ORDER BY ts, side, r_click NULLS FIRST
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS asof_click_id
           FROM u)
         SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
           asof_click_id
         FROM c WHERE side = 1 ORDER BY event_id""",
    "e_interval_join" ->
      """WITH c AS (SELECT i AS campaign,
             1704067200000000 + i * 129600000000 AS start_us
           FROM range(0, 20) t(i)),
         e AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events)
         SELECT c.campaign,
           CAST(count(e.event_id) AS BIGINT) AS n_events,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
         FROM c LEFT JOIN e ON e.us >= c.start_us
           AND e.us < c.start_us + 216000000000
         GROUP BY 1 ORDER BY 1""",
    "e_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
           AS sum_k,
         SUM(CAST(json_extract(props, '$.k') AS BIGINT)) * 1.0 /
           COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS avg_k
         FROM events GROUP BY event_type ORDER BY event_type""")
}
