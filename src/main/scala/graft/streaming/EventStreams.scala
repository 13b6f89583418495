package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.model.{EgdmCodec, Entity}
import graft.ops.GraphMerge
import graft.store.GraphStore

/** Structured Streaming surface (SURVEY §2.E streaming + §3.3):
  *
  *  - [[entitySync]] is the reference's incremental dataset sync
  *    (/root/reference/layer.go:211-238) as a streaming sink: each
  *    micro-batch of EGDM-NDJSON runs the SAME merge job the batch
  *    path uses, committed as one store version per batch — the
  *    buffered writer IS Spark's micro-batch.
  *  - [[tumblingCounts]] / [[sessionize]] are the event-window ops;
  *    the batch twins in [[graft.queries.EventOps]] carry the DuckDB
  *    oracles, and StreamingSpec proves stream==batch results.
  */
object EventStreams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Watermarked tumbling-window counts — append-mode safe. */
  def tumblingCounts(events: DataFrame, watermark: String = "10 minutes",
      width: String = "5 minutes"): DataFrame = {
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).getField("start").as("wstart"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100, 0).cast("long")) / 100.0).as("total"))
  }

  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)
  case class SessionState(start: Long, last: Long, n: Long)
  case class SessionOut(user_id: Long, session_start: Long, n_events: Long,
      duration_sec: Long)

  /** Custom stateful sessionization via flatMapGroupsWithState — the
    * 30-minute-gap sessions of EventOps.e_sessions. A session closes
    * either inline (a newer event past the gap) or on an EVENT-TIME
    * timeout: the open session emits when the WATERMARK passes its
    * last event + gap. Processing-time timeouts would close sessions
    * on wall-clock — wrong under replay/backfill, where hours of
    * event time stream through in seconds.
    */
  def sessionize(events: Dataset[SessionEvent],
      gapSec: Long = 1800,
      watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[SessionEvent],
         state: GroupState[List[SessionState]]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.getOrElse(Nil).map(s =>
              SessionOut(userId, s.start, s.n, s.last - s.start))
            state.remove()
            out.iterator
          } else {
            // fold new events into open sessions (events arrive
            // time-ordered within a micro-batch after sort)
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var sessions = state.getOption.getOrElse(Nil)
            val closed = List.newBuilder[SessionOut]
            sorted.foreach { e =>
              val sec = e.ts.getTime / 1000
              sessions match {
                case open :: rest if sec - open.last <= gapSec =>
                  // a late-but-within-watermark event from a later
                  // micro-batch may sort BEFORE the open session's
                  // anchor; folding it must never move the gap anchor
                  // backward (or duration negative) or stream sessions
                  // diverge from the globally-sorted batch twin
                  sessions = open.copy(
                    start = math.min(open.start, sec),
                    last = math.max(open.last, sec),
                    n = open.n + 1) :: rest
                case open :: rest =>
                  closed += SessionOut(userId, open.start, open.n,
                    open.last - open.start)
                  sessions = SessionState(sec, sec, 1) :: rest
                case Nil =>
                  sessions = SessionState(sec, sec, 1) :: Nil
              }
            }
            state.update(sessions)
            // fire when the watermark passes the open session's gap;
            // the timestamp must sit strictly above the current
            // watermark or Spark rejects it
            sessions.headOption.foreach { s =>
              val fireAt = (s.last + gapSec) * 1000
              state.setTimeoutTimestamp(
                math.max(fireAt, state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }

  case class DocEvent(doc_id: Long, text: String)
  case class DedupKeeper(doc_id: Long, fp: String)

  /** Streaming exact-dedup: the first document per content
    * fingerprint passes through; later copies — in the same
    * micro-batch or any later one — are dropped. The fingerprint is
    * the SAME normalization the batch `dedup_exact`/`t_fingerprint`
    * queries use, so the streamed keeper set equals the batch keeper
    * set when arrival follows doc_id order.
    *
    * This is the ingest-side shape of an LLM-corpus pipeline: dedup
    * happens as data lands instead of in a nightly batch. State is
    * one boolean per fingerprint, keyed (hash-partitioned) by the
    * fingerprint itself — at 100 TB the state store shards across
    * executors exactly like the batch groupBy would, and a RocksDB
    * state store keeps it off-heap.
    */
  def dedupStream(docs: Dataset[DocEvent]): Dataset[DedupKeeper] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withColumn("fp",
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
      .select(col("doc_id"), col("fp")).as[DedupKeeper]
      .groupByKey(_.fp)
      .flatMapGroupsWithState[Boolean, DedupKeeper](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (fp: String, rows: Iterator[DedupKeeper],
         state: GroupState[Boolean]) =>
          if (state.getOption.contains(true)) Iterator.empty
          else {
            state.update(true)
            // first arrival wins; doc_id order within the micro-batch
            Iterator.single(rows.minBy(_.doc_id))
          }
      }
  }

  case class CandPair(da: Long, db: Long)

  /** Streaming MinHash-LSH banding — the streaming twin of the batch
    * dedup_minhash_lsh candidate generator (TextOps.lshCandidates).
    * The 12-hash signature computes PER ROW (array_min over the
    * doc's shingle array == the batch groupBy-min over exploded
    * shingle rows; duplicates cannot change a min), so no streaming
    * aggregation is needed; each doc then lands in its 4 band
    * buckets and flatMapGroupsWithState keyed by (band, band-key)
    * emits a candidate pair per (new doc × prior bucket member).
    * State per bucket is the member id list — bounded by bucket
    * size, which LSH keeps small by design; the state store shards
    * buckets across executors exactly like the batch band self-join
    * shuffles. A pair colliding in several bands is emitted once per
    * band — the consumer distincts (the batch side's `.distinct()`),
    * or chains a dedupStream-shaped pair-keyed stage for
    * exactly-once at scale. The batch path's corpus-wide DF cap
    * (stop-shingle removal) cannot be computed inside the stream (a
    * stream has no corpus-wide document frequency); `stopShingles`
    * takes it as an INPUT — precompute it on the standing corpus with
    * TextOps.stopShingleSet (or maintain a DF sketch) and candidate
    * generation matches the batch pipeline even where the cap bites.
    * The set is plan-literal (broadcast): stop-shingles are the head
    * of the DF distribution, few by construction.
    */
  def minhashCandidates(docs: Dataset[DocEvent],
      stopShingles: Set[String] = Set.empty): Dataset[CandPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = split(trim(col("text")), "\\s+")
    val raw = when(size(words) >= 3,
      transform(sequence(lit(1), size(words) - 2),
        i => array_join(slice(words, i, lit(3)), " ")))
      .otherwise(array().cast("array<string>"))
    // array_except also distincts — harmless (min over dups == min)
    val shingles = if (stopShingles.isEmpty) raw
      else array_except(raw, lit(stopShingles.toArray.sorted))
    def ha(s: Column) = conv(substring(md5(s), 1, 8), 16, 10).cast("long")
    def hb(s: Column) = conv(substring(md5(s), 9, 8), 16, 10).cast("long")
    val sig = array((0 until 12).map(i =>
      array_min(transform(col("sh"),
        s => ha(s) + lit(i.toLong) * hb(s)))): _*)
    docs
      .withColumn("sh", shingles)
      .filter(size(col("sh")) > 0)
      .withColumn("hs", sig)
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(3))).as("b"), col("hs"))
      .select(col("doc_id"), concat_ws(":", col("b"),
        md5(concat_ws("|",
          element_at(col("hs"), col("b") * 3 + 1).cast("string"),
          element_at(col("hs"), col("b") * 3 + 2).cast("string"),
          element_at(col("hs"), col("b") * 3 + 3).cast("string"))))
        .as("bucket"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[List[Long], CandPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(Long, String)],
         state: GroupState[List[Long]]) =>
          var members = state.getOption.getOrElse(Nil)
          val out = Seq.newBuilder[CandPair]
          // doc_id order within the micro-batch for determinism
          rows.map(_._1).toSeq.distinct.sorted.foreach { d =>
            if (!members.contains(d)) {
              members.foreach(p =>
                out += (if (p < d) CandPair(p, d) else CandPair(d, p)))
              members = d :: members
            }
          }
          state.update(members)
          out.result().iterator
      }
  }

  case class SimPair(da: Long, db: Long, hamming: Long)

  /** Streaming 64-bit SimHash near-dup detection — the streaming twin
    * of the batch dedup_simhash_pairs (TextOps). The simhash computes
    * PER ROW (the 64 bit votes fold over the row's distinct-token
    * array with the exact arithmetic of the batch aggregate: same md5
    * halves, same `2·ones > n` vote rule), so no streaming aggregation
    * is needed; each doc lands in its 4 16-bit band buckets and
    * flatMapGroupsWithState keyed by (band, value) verifies exact
    * hamming ≤ 3 against prior bucket members — banding keeps the
    * pigeonhole recall guarantee, and 65536 buckets per band keep
    * per-bucket state small at corpus scale. A pair agreeing on
    * several bands emits once per band; the consumer distincts (the
    * batch side's `.distinct()`). State per bucket is the member
    * (id, simhash) list — RocksDB-spillable, sharded by bucket exactly
    * like the batch band self-join shuffles.
    */
  def simhashPairs(docs: Dataset[DocEvent]): Dataset[SimPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = array_distinct(split(trim(col("text")), "\\s+"))
    val th = transform(toks, t => struct(
      conv(substring(md5(t), 1, 8), 16, 10).cast("long").as("vh"),
      conv(substring(md5(t), 9, 8), 16, 10).cast("long").as("vl")))
    val n = size(th)
    val sim = (0 until 64).map { j =>
      val ones = size(filter(th, v => shiftright(
        if (j < 32) v.getField("vh") else v.getField("vl"),
        31 - j % 32).bitwiseAND(1) === 1))
      when(ones * 2 > n, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    docs
      .withColumn("simhash", sim)
      .select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(3))).as("k"))
      .select(col("doc_id"), col("simhash"),
        concat_ws(":", col("k"),
          expr("shiftright(simhash, 16*k) & 65535")).as("bucket"))
      .as[(Long, Long, String)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[List[(Long, Long)], SimPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(Long, Long, String)],
         state: GroupState[List[(Long, Long)]]) =>
          var members = state.getOption.getOrElse(Nil)
          val out = Seq.newBuilder[SimPair]
          // doc_id order within the micro-batch for determinism
          rows.map(r => (r._1, r._2)).toSeq.distinct.sortBy(_._1)
            .foreach { case (d, h) =>
              if (!members.exists(_._1 == d)) {
                members.foreach { case (pd, ph) =>
                  val ham = java.lang.Long.bitCount(h ^ ph).toLong
                  if (ham <= 3)
                    out += (if (pd < d) SimPair(pd, d, ham)
                      else SimPair(d, pd, ham))
                }
                members = (d, h) :: members
              }
            }
          state.update(members)
          out.result().iterator
      }
  }

  case class DecontamVerdict(doc_id: Long, n_shingles: Long,
      n_hits: Long, overlap: Double, contaminated: Boolean)

  /** Streaming decontamination gate — the streaming twin of the batch
    * t_decontaminate (TextOps): every incoming document is scored for
    * eval-set n-gram overlap BEFORE it enters the training corpus.
    * The benchmark shingle set is an INPUT, precomputed on the static
    * eval corpus (the set is small by construction — eval suites are
    * a few MB against 100 TB of training text — so it ships as a
    * plan literal / broadcast). The verdict is ROW-LOCAL: the doc's
    * distinct shingle array intersects the benchmark set per row —
    * no state store, no shuffle, which is exactly what an ingest
    * filter should be. Same shingle construction and the same
    * `hits * 1.0 / total` arithmetic as the batch op, so verdicts
    * are bit-identical (StreamingSpec pins stream == batch).
    */
  def decontaminate(docs: Dataset[DocEvent],
      benchShingles: Set[String]): Dataset[DecontamVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = split(trim(col("text")), "\\s+")
    val raw = when(size(words) >= 3,
      transform(sequence(lit(1), size(words) - 2),
        i => array_join(slice(words, i, lit(3)), " ")))
      .otherwise(array().cast("array<string>"))
    docs
      .withColumn("sh", array_distinct(raw))
      .withColumn("n_shingles", size(col("sh")).cast("long"))
      .withColumn("n_hits", size(array_intersect(col("sh"),
        lit(benchShingles.toArray.sorted))).cast("long"))
      .select(col("doc_id"), col("n_shingles"), col("n_hits"),
        coalesce(col("n_hits") * 1.0 / col("n_shingles"), lit(0.0))
          .as("overlap"),
        coalesce(col("n_hits") * 1.0 / col("n_shingles") >= 0.5,
          lit(false)).as("contaminated"))
      .as[DecontamVerdict]
  }

  case class LineDedupRow(doc_id: Long, n_segs: Long, n_kept: Long,
      removed_frac: Double, kept_fp: String)

  /** Streaming boilerplate removal — the streaming twin of the batch
    * t_line_dedup (CCNet line-level dedup): each incoming document
    * drops its boilerplate segments and reports the same per-doc
    * verdict. The boilerplate set is an INPUT, precomputed on the
    * static corpus (document frequency needs corpus-wide counts a
    * stream cannot see; df≥3 keeps the set tiny, so it ships as a
    * plan literal / broadcast). ROW-LOCAL like decontaminate: the
    * doc's segment array filters against the set per row — no state,
    * no shuffle; same segmentation and md5 reassembly arithmetic as
    * the batch op (StreamingSpec pins stream == batch).
    */
  def lineDedupStream(docs: Dataset[DocEvent],
      boilerplate: Set[String]): Dataset[LineDedupRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val md5Empty = "d41d8cd98f00b204e9800998ecf8427e" // md5("")
    val words = split(trim(col("text")), "\\s+")
    val segs = when(size(words) >= 1,
      transform(
        sequence(lit(0),
          floor((size(words) + lit(2)) / lit(3)).cast("int") - 1),
        i => array_join(slice(words, i * 3 + 1, lit(3)), " ")))
      .otherwise(array().cast("array<string>"))
    docs
      .withColumn("segs", segs)
      .withColumn("kept", filter(col("segs"),
        s => !array_contains(lit(boilerplate.toArray.sorted), s)))
      .select(col("doc_id"),
        size(col("segs")).cast("long").as("n_segs"),
        size(col("kept")).cast("long").as("n_kept"),
        ((size(col("segs")) - size(col("kept"))) * 1.0 / size(col("segs")))
          .as("removed_frac"),
        when(size(col("kept")) > 0, md5(array_join(col("kept"), " ")))
          .otherwise(lit(md5Empty)).as("kept_fp"))
      .as[LineDedupRow]
  }

  case class ChunkRow(doc_id: Long, chunk_idx: Long, start_tok: Long,
      n_tok: Long, chunk_fp: String)

  /** Streaming passage chunking — t_chunk's streaming twin for a
    * live RAG-ingest path. Chunking is ROW-LOCAL (the batch op's
    * explode with zero shuffle), so the stream needs no state and no
    * watermark: each arriving document emits its windows immediately
    * in append mode. The transform is literally the batch one
    * (TextOps.chunkTable), so stream == batch parity holds by
    * construction and the spec only pins the plumbing.
    */
  def chunkStream(docs: Dataset[DocEvent]): Dataset[ChunkRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.queries.TextOps.chunkTable(docs.toDF()).as[ChunkRow]
  }

  case class PostingRow(term: String, gid: String, tf: Long, dl: Long,
      pos: Seq[Int])

  /** Streaming fulltext-posting ingest — the streaming twin of the
    * store's CREATE FULLTEXT INDEX maintenance: each arriving document
    * emits its posting rows (term, gid, tf, dl, pos) ROW-LOCALLY with
    * the exact index tokenizer (whitespace split of trim — a plain
    * Scala fold of one row, zero shuffle, zero state, append mode).
    * `pos` carries the term's 0-based token positions, matching the
    * batch table's POSITIONAL postings (phrase/slop evaluation). A
    * live ingest path sinks these into the `sect=t/bucket=H(term)`
    * layout the batch commit maintains; the query side is unchanged.
    */
  def ftPostingsStream(docs: Dataset[DocEvent],
      analyzer: String = graft.store.SearchIndexes.WhitespaceAnalyzer)
      : Dataset[PostingRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.flatMap { d =>
      val t = Option(d.text).getOrElse("").trim
      if (t.isEmpty) Iterator.empty
      else {
        // the exact index tokenizer (SearchIndexes.analyze is the
        // driver/executor-side twin of the batch termsOf column)
        val w = graft.store.SearchIndexes.analyze(t, analyzer)
        val dl = w.length.toLong
        w.zipWithIndex.groupBy(_._1).iterator.map { case (term, g) =>
          PostingRow(term, s"d:${d.doc_id}", g.length.toLong, dl,
            g.map(_._2).sorted)
        }
      }
    }
  }

  /** Streaming perceptual-hash ingest — m_phash's streaming twin for
    * a live media pipeline: each arriving payload fingerprints
    * ROW-LOCALLY through the exact batch dHash (no state, append
    * mode); the banded near-dup join stays a batch/bucket-state
    * query over the compact hash table, like the SimHash twin's
    * banding state.
    */
  def phashStream(docs: Dataset[DocEvent])
      : Dataset[graft.ops.Multimodal.DHashRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.ops.Multimodal.dhash(
      graft.ops.Multimodal.documentsAsMedia(
        docs.select(col("doc_id"), col("text"))))
  }

  case class AttrEvent(user_id: Long, tsMicros: Long, event_id: Long,
      event_type: String)
  case class Attribution(event_id: Long, user_id: Long, tsMicros: Long,
      asof_click_id: Option[Long])

  /** Streaming last-click attribution — the streaming twin of the
    * batch as-of join (EventOps.e_asof_click): every purchase is
    * matched to the user's most recent prior-or-simultaneous click.
    * State is ONE (ts, click_id) pair per user — constant per key, the
    * smallest possible as-of state — keyed (hash-partitioned) by
    * user_id exactly as the batch join shuffles. Within a micro-batch
    * events fold in event-time order with clicks before purchases on
    * ties (the batch join's `click.ts <= purchase.ts` contract); the
    * streamed attributions equal the batch as-of result when arrival
    * order follows event time across batches.
    */
  def attributeStream(events: Dataset[AttrEvent]): Dataset[Attribution] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long), Attribution](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[AttrEvent],
         state: GroupState[(Long, Long)]) =>
          val sorted = rows.toSeq.sortBy(e =>
            (e.tsMicros, if (e.event_type == "click") 0 else 1, e.event_id))
          var last = state.getOption // (tsMicros, click_id)
          val out = List.newBuilder[Attribution]
          sorted.foreach { e =>
            e.event_type match {
              case "click" => last = Some((e.tsMicros, e.event_id))
              case "purchase" =>
                out += Attribution(e.event_id, uid, e.tsMicros,
                  last.map(_._2))
              case _ => ()
            }
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  case class FunnelEvent(user_id: Long, tsMicros: Long, event_type: String)
  case class FunnelRow(user_id: Long, t_view: Option[Long],
      t_click: Option[Long], t_purchase: Option[Long], stage: Int)

  /** Streaming funnel — the stateful twin of EventOps.e_funnel: per
    * user, the first view, the first click strictly after it, the
    * first purchase strictly after that. State is THREE optional
    * timestamps per user (constant per key), keyed exactly as the
    * batch funnel shuffles. Each micro-batch emits the user's current
    * funnel row (update semantics); the final row per user equals the
    * batch result when arrival order follows event time across
    * batches. Ties never advance a stage — the strict `>` is in the
    * fold predicate, same as the batch joins.
    */
  def funnelStream(events: Dataset[FunnelEvent]): Dataset[FunnelRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[(Option[Long], Option[Long], Option[Long]),
        FunnelRow](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[FunnelEvent],
         state: GroupState[(Option[Long], Option[Long], Option[Long])]) =>
          var (tv, tc, tp) = state.getOption.getOrElse(
            (Option.empty[Long], Option.empty[Long], Option.empty[Long]))
          rows.toSeq.sortBy(e => (e.tsMicros,
            e.event_type match { case "view" => 0; case "click" => 1
              case _ => 2 })).foreach { e =>
            e.event_type match {
              case "view" if tv.isEmpty => tv = Some(e.tsMicros)
              case "click" if tv.nonEmpty && tc.isEmpty &&
                  e.tsMicros > tv.get => tc = Some(e.tsMicros)
              case "purchase" if tc.nonEmpty && tp.isEmpty &&
                  e.tsMicros > tc.get => tp = Some(e.tsMicros)
              case _ => ()
            }
          }
          state.update((tv, tc, tp))
          FunnelRow(uid, tv, tc, tp,
            (if (tv.isDefined) 1 else 0) + (if (tc.isDefined) 1 else 0) +
              (if (tp.isDefined) 1 else 0))
      }
  }

  case class DqEvent(user_id: Long, event_type: String, event_id: Long,
      tsMicros: Long)
  case class DqKeyStats(user_id: Long, event_type: String, n: Long,
      n_ts_regress: Long)

  /** Streaming data-quality audit — the stateful twin of
    * EventOps.e_dq_checks' arrival-order regression count: per
    * (user, type), state is (last event_id-ordered ts, running
    * counts); each micro-batch folds its rows in event_id order and
    * emits the key's current totals (update semantics). Aggregating
    * the final per-key rows by type equals the batch window's
    * verdict when arrival order follows event_id across batches.
    */
  def dqStream(events: Dataset[DqEvent]): Dataset[DqKeyStats] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(e => (e.user_id, e.event_type))
      .mapGroupsWithState[(Long, Long, Long), DqKeyStats](
        GroupStateTimeout.NoTimeout) {
        (key: (Long, String), rows: Iterator[DqEvent],
         state: GroupState[(Long, Long, Long)]) =>
          var (lastTs, n, regress) =
            state.getOption.getOrElse((Long.MinValue, 0L, 0L))
          rows.toSeq.sortBy(_.event_id).foreach { e =>
            if (lastTs != Long.MinValue && e.tsMicros < lastTs) regress += 1
            lastTs = e.tsMicros
            n += 1
          }
          state.update((lastTs, n, regress))
          DqKeyStats(key._1, key._2, n, regress)
      }
  }

  case class UserEvent(user_id: Long, cents: Long)
  case class UserTotal(user_id: Long, n: Long, total_cents: Long)

  /** Streaming per-user totals — the stateful half of e_user_topk:
    * state is (count, exact integer cents) per user; the top-k cut is
    * a batch query over the compact per-user output (top-k needs the
    * whole key set, so it does not belong in the per-key fold). Keyed
    * like the batch groupBy; state is two longs per user.
    */
  def userTotalsStream(events: Dataset[UserEvent]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[(Long, Long), UserTotal](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[UserEvent], state: GroupState[(Long, Long)]) =>
          var (n, tc) = state.getOption.getOrElse((0L, 0L))
          rows.foreach { e => n += 1; tc += e.cents }
          state.update((n, tc))
          UserTotal(uid, n, tc)
      }
  }

  case class VolEvent(event_type: String, tsMicros: Long)
  case class BucketCount(event_type: String, bucketMinute: Long, n: Long)

  /** Streaming volume monitor — the stateful half of
    * EventOps.e_anomaly: per (type, minute bucket) the state is one
    * running count, emitted on every update. The z-score verdict is a
    * per-type aggregation OVER the bucket counts (it needs the type's
    * whole bucket distribution), so it stays a cheap periodic batch
    * query over this operator's compact output — the standard
    * split between streaming accumulation and batch scoring. Keyed
    * exactly like the batch groupBy shuffles; state is one long per
    * (type, minute), RocksDB-spillable, and a production deployment
    * would add a watermark-driven timeout to retire closed minutes.
    */
  def anomalyStream(events: Dataset[VolEvent]): Dataset[BucketCount] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(e => (e.event_type, e.tsMicros / 60000000L))
      .mapGroupsWithState[Long, BucketCount](GroupStateTimeout.NoTimeout) {
        (key: (String, Long), rows: Iterator[VolEvent],
         state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          BucketCount(key._1, key._2, n)
      }
  }

  case class IntervalEvent(event_id: Long, user_id: Long, tsMicros: Long)
  case class CampaignHit(event_id: Long, user_id: Long, campaign: Long)

  /** Streaming interval enrichment — e_interval_join's streaming
    * twin and the one join CATEGORY the other twins don't cover: a
    * STREAM-STATIC join. The static campaign-window table (exploded
    * to its 12 h buckets exactly like the batch op) broadcasts into
    * the stream; each event equi-joins its ONE time bucket and
    * refines with the exact containment predicate — row-local, no
    * state, no watermark, append mode. The per-campaign aggregation
    * stays a batch query over the emitted hits (like the other
    * compact-output twins).
    */
  def intervalJoinStream(events: Dataset[IntervalEvent])
      : Dataset[CampaignHit] = {
    val spark = events.sparkSession
    import spark.implicits._
    val H = 3600000000L
    val t0 = 1704067200000000L
    val B = 12 * H
    val cb = spark.range(0, 20)
      .select(col("id").as("campaign"),
        (lit(t0) + col("id") * (36 * H)).as("start_us"))
      .withColumn("end_us", col("start_us") + 60 * H)
      .select(col("campaign"), col("start_us"), col("end_us"),
        explode(sequence(expr(s"start_us div $B"),
          expr(s"(end_us - 1) div $B"))).as("bucket"))
    events
      .withColumn("bucket", expr(s"tsMicros div $B"))
      .join(broadcast(cb), Seq("bucket"))
      .filter(col("tsMicros") >= col("start_us") &&
        col("tsMicros") < col("end_us"))
      .select(col("event_id"), col("user_id"), col("campaign"))
      .as[CampaignHit]
  }

  case class PropEvent(gid: String, sVal: Option[String],
      lVal: Option[Long], dVal: Option[Double], bVal: Option[Boolean])
  case class PxRow(sect: String, value: String, gid: String)

  /** Streaming property-index ingest — the row-local twin of the px
    * table's build/delta extraction (SearchIndexes.propRows): each
    * arriving node's scalar property value emits its
    * (sect="p", encoded value, gid) row for the same
    * `sect=p/bucket=H(val)` layout the batch commits maintain.
    * Stateless, append mode; the slot precedence (s, l, d, b) and the
    * numeric-through-double canonicalization are the SHARED
    * encodeValue/encodeScalar definition, so stream and batch rows
    * are byte-equal (pinned by the spec). Completes the live-ingest
    * trio alongside ftPostingsStream and vxAssignStream.
    */
  def pxRowsStream(props: Dataset[PropEvent]): Dataset[PxRow] = {
    import props.sparkSession.implicits._
    props.flatMap { e =>
      val v: Option[Any] =
        e.sVal.orElse(e.lVal).orElse(e.dVal).orElse(e.bVal)
      // BOTH index sections, like the batch extraction: the
      // hash-bucketed equality key and the order-preserving range key
      (v.flatMap(graft.store.SearchIndexes.encodeValue)
        .map(enc => PxRow("p", enc, e.gid)) ++
        v.flatMap(graft.store.SearchIndexes.encodeSortableValue)
          .map(enc => PxRow("r", enc, e.gid))).iterator
    }
  }

  /** Streaming VALUE-DICTIONARY maintenance — the live half of the
    * property table's `sect=w` section (CONTAINS / ENDS WITH needle
    * expansion): an UPDATE-mode streaming aggregation of per-value
    * owner counts over the SAME equality rows [[pxRowsStream]] emits,
    * string values only (the dictionary's own rule — string
    * predicates test the strict string slot, so no other type can
    * match them). State is vocabulary-sized; the batch twin is
    * [[graft.store.SearchIndexes.valueDictRows]].
    */
  def pxValueDictStream(props: Dataset[PropEvent]): DataFrame =
    pxRowsStream(props).toDF()
      .filter(col("sect") === "p" && col("value").startsWith("s:"))
      .groupBy(col("value").as("val"))
      .agg(count(lit(1)).as("n"))

  /** Streaming term-DICTIONARY maintenance — the live half of the
    * posting table's `sect=d` section (prefix/fuzzy bucket pruning):
    * an UPDATE-mode streaming aggregation of per-term document
    * frequency over the SAME row-local tokenization the posting twin
    * emits (one posting row per (term, doc), so `count(*)` IS df).
    * State is per-term (vocabulary-sized — the same bound that makes
    * the batch dictionary cheap); the batch twin is
    * [[graft.store.SearchIndexes.dictRows]].
    */
  def ftDictStream(docs: Dataset[DocEvent],
      analyzer: String = graft.store.SearchIndexes.WhitespaceAnalyzer)
      : DataFrame =
    ftPostingsStream(docs, analyzer)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"))

  case class ClickEv(click_id: Long, cuser: Long,
      clickTime: java.sql.Timestamp)
  case class BuyEv(purchase_id: Long, buser: Long,
      buyTime: java.sql.Timestamp)

  /** Watermarked STREAM-STREAM join — the join category the other
    * twins don't cover (intervalJoinStream is stream-static,
    * attributeStream is stateful-fold): each purchase joins every
    * click by the same user within the last hour
    * (`clickTime ∈ [buyTime − 1h, buyTime]`). Both sides carry
    * watermarks, so Spark derives the state-retention bound from the
    * join's time-range condition and EVICTS clicks older than
    * `watermark − 1h` instead of buffering the stream forever — the
    * property that makes a stream-stream join runnable at scale.
    * Inner join, append mode; the last-click attribution is a batch
    * `max(clickTime) per purchase` over this compact pair output.
    */
  def clickPurchaseJoinStream(clicks: Dataset[ClickEv],
      buys: Dataset[BuyEv], watermark: String = "10 minutes"): DataFrame = {
    val c = clicks.withWatermark("clickTime", watermark)
    val b = buys.withWatermark("buyTime", watermark)
    b.join(c, expr(
      """cuser = buser AND
         clickTime <= buyTime AND
         clickTime >= buyTime - INTERVAL 1 HOUR"""))
      .select(col("purchase_id"), col("buser").as("user_id"),
        col("buyTime"), col("click_id"), col("clickTime"))
  }

  case class MarkovEvent(user_id: Long, event_type: String,
      tsMicros: Long, event_id: Long)
  case class Transition(from_type: String, to_type: String)

  /** Streaming transition extractor — the stateful half of
    * EventOps.e_markov: per user the state is the LAST event seen
    * ((type, ts, id) — three fields), and each arriving event emits
    * one (from, to) transition row. The matrix normalization is a
    * batch aggregation over this compact output. Within a batch the
    * group sorts by (ts, event_id) like the batch window; across
    * batches events are assumed in arrival order (the source's
    * contract for order-sensitive folds, as in sessionize).
    */
  def markovStream(events: Dataset[MarkovEvent]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[(String, Long, Long), Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[MarkovEvent],
         state: GroupState[(String, Long, Long)]) =>
          val sorted = rows.toSeq.sortBy(e => (e.tsMicros, e.event_id))
          var st = state.getOption
          val out = Seq.newBuilder[Transition]
          sorted.foreach { e =>
            st.foreach { case (t, _, _) =>
              out += Transition(t, e.event_type) }
            st = Some((e.event_type, e.tsMicros, e.event_id))
          }
          st.foreach(state.update)
          out.result().iterator
      }
  }

  case class PurchaseEvent(user_id: Long, tsMicros: Long, cents: Long)
  case class UserRfm(user_id: Long, lastTsMicros: Long, frequency: Long,
      mon_c: Long)

  /** Streaming RFM accumulator — the stateful half of
    * EventOps.e_rfm: per user the state is (last purchase ts, count,
    * exact cents), emitted on every update. The tercile segmentation
    * is a global rank cut (it needs the whole per-user distribution),
    * so it stays a periodic batch query over this operator's compact
    * output — the same accumulation/scoring split as anomalyStream.
    * Keyed like the batch groupBy; three longs of state per user.
    */
  def rfmStream(purchases: Dataset[PurchaseEvent]): Dataset[UserRfm] = {
    import purchases.sparkSession.implicits._
    purchases.groupByKey(_.user_id)
      .mapGroupsWithState[(Long, Long, Long), UserRfm](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[PurchaseEvent],
         state: GroupState[(Long, Long, Long)]) =>
          var (last, n, c) = state.getOption.getOrElse((Long.MinValue, 0L, 0L))
          rows.foreach { e =>
            if (e.tsMicros > last) last = e.tsMicros
            n += 1
            c += e.cents
          }
          state.update((last, n, c))
          UserRfm(uid, last, n, c)
      }
  }

  /** Off-heap RocksDB state store for the stateful operators — at
    * 100 TB the dedup fingerprint set and open-session state outgrow
    * executor heaps; RocksDB spills them to local disk with the same
    * key sharding. Session-level conf: queries started after this call
    * use it (Spark ships rocksdbjni in its distribution).
    */
  def useRocksDBStateStore(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  /** Streaming EGDM-NDJSON → graph store: every micro-batch runs the
    * batch merge job (exactly-once per batch via the store's syncId
    * replay guard keyed on batchId).
    */
  def entitySync(spark: SparkSession, ndjsonDir: String, store: GraphStore,
      source: String, label: String): DataStreamWriter[String] = {
    import spark.implicits._
    spark.readStream
      .option("maxFilesPerTrigger", "1")
      .textFile(ndjsonDir)
      .writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[String], batchId: Long) =>
        val entities = batch.filter(_.trim.nonEmpty).map(EgdmCodec.parseLine)
        GraphMerge.applyBatch(store, source, label, entities,
          syncId = s"stream-$batchId")
        ()
      }
  }
}
