package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming surface over the `events` table shape
  * (event_id, ts, user_id, event_type, value).
  *
  * The reference has no true streams (its closest construct is the
  * bounded Telegram long-poll, SURVEY §1.1), so this is the
  * beyond-reference streaming path: the same aggregations the batch
  * gate verifies (q11 hourly rollups, q12 sessionization), expressed as
  * incremental plans. Each transform takes ANY events DataFrame —
  * batch or streaming — so correctness is assertable against the batch
  * result on the same rows (tests do exactly that via MemoryStream).
  *
  * Scale notes: the windowed aggregate is a streaming partial-agg with
  * watermark-bounded state (no unbounded keys held); sessionization
  * holds one small state object per active user and emits on gap
  * timeout — both shapes survive a 1000-executor deployment because
  * state is keyed and pruned, never collected to the driver.
  */
/** Max-tracking accumulator (Spark ships sum/count only): tasks add
  * candidate values, the driver reads the running maximum. Used by
  * [[Streams.nearDupStream]] to surface the worst single bucket's
  * cumulative drop count — the quantity the pair-loss bound keys on
  * (a total drop count alone cannot distinguish scattered stragglers
  * from one blob's tail; see [[Streams.nearDupDropAdvisory]]).
  * Register via `spark.sparkContext.register(acc, name)`.
  *
  * Retry-safe where a sum is not: a retried/speculated task re-adding
  * the same bucket's CUMULATIVE drop count leaves the max unchanged,
  * while a sum accumulator double-counts (the same merge-idempotency
  * argument that made the batch cap observations max-only) — so the
  * worst-bucket figure the advisory quotes is exact even under task
  * retries; the companion `drops` TOTAL is Spark's standard
  * at-least-once accumulator semantics and can only overstate. */
class MaxAccumulator extends org.apache.spark.util.AccumulatorV2[Long, Long] {
  private var mx = 0L
  override def isZero: Boolean = mx == 0L
  override def copy(): MaxAccumulator = {
    val a = new MaxAccumulator; a.mx = mx; a
  }
  override def reset(): Unit = mx = 0L
  override def add(v: Long): Unit = mx = math.max(mx, v)
  override def merge(
      other: org.apache.spark.util.AccumulatorV2[Long, Long]): Unit =
    mx = math.max(mx, other.value)
  override def value: Long = mx
}

object Streams {

  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.Streams")

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class SessionState(start: Long, end: Long, n: Int, sum: Double)
  case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Int, sum_value: Double)

  /** Hourly tumbling-window counts/sums per event type with a 10-minute
    * watermark — the streaming q11. On a batch frame the same plan
    * computes the identical grouped aggregate. */
  def hourlyByType(events: DataFrame, watermark: String = "10 minutes"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    withWm
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** Gap-based sessionization (30-minute inactivity) per user via
    * flatMapGroupsWithState — the streaming q12. Emits a session when
    * the processing-time gap since the watermark passes; in batch tests
    * the state path is exercised through MemoryStream feeds. */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60 * 1000L

    def flush(userId: Long, s: SessionState): SessionOut =
      SessionOut(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.sum)

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s => flush(userId, s)).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var emitted = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.end <= gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.end, t),
                    s.n + 1, s.sum + e.value))
                case Some(s) =>
                  emitted ::= flush(userId, s)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            emitted.reverseIterator
          }
      }
  }

  /** Stream-stream interval join — the incremental q15: each error
    * event joined to the same user's events in the following hour.
    * Both sides carry watermarks and the join condition bounds the
    * event-time range, so each side's state is pruned once the
    * watermark passes the interval — bounded state, any stream length. */
  def followersWithinHour(events: DataFrame,
      watermark: String = "30 minutes"): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val errors = (if (events.isStreaming) events.withWatermark("ts", watermark) else events)
      .where(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id").as("err_user"),
        col("ts").as("err_ts"))
    val all = (if (events.isStreaming) events.withWatermark("ts", watermark) else events)
      .select(col("user_id").as("f_user"), col("ts").as("f_ts"),
        col("event_id").as("f_id"))
    errors.join(all,
      col("err_user") === col("f_user") &&
        col("f_ts") > col("err_ts") &&
        col("f_ts") <= col("err_ts") + expr("INTERVAL 1 HOUR"))
  }

  /** Streaming exact dedup: drop re-deliveries of the same fingerprint
    * inside the watermark horizon (`dropDuplicatesWithinWatermark`) —
    * the incremental form of dd_exact. State is keyed by fingerprint
    * and pruned at the watermark, so memory stays bounded no matter
    * how long the stream runs. */
  def dedupStream(docs: DataFrame, watermark: String = "1 hour"): DataFrame = {
    val withFp = docs.withColumn("fp",
      graft.functions.Dedup.docFingerprint(col("text")))
    if (withFp.isStreaming)
      withFp.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("fp")
    else withFp.dropDuplicates("fp")
  }

  /** Read the parquet events table as a bounded file STREAM (one file
    * per trigger) — how the same pipeline runs incrementally over an
    * arriving directory at scale.
    *
    * File streams require a user-supplied schema, so this path cannot
    * inherit `Tables.adaptTs`'s load-time branching automatically;
    * instead the ts shape is probed ONCE at stream construction with a
    * driver-side batch schema read of the same directory (footer
    * metadata only — no data scan) and the matching decode is baked
    * into the stream. The previous hard-coded nanos shape ("ts BIGINT"
    * + div 1000) silently reinterpreted a micros-written corpus as
    * nanos — every event time ~1000× too small (1970-01-20) — the
    * exact drift class round 9 hit in batch. */
  def eventFileStream(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val d = dir.stripSuffix("/")
    // SINGLE-SHAPE-PER-DIRECTORY CONTRACT: a file stream needs ONE
    // user-supplied schema, so every file arriving in $dir/ must carry
    // the same ts shape — the probe inspects the first listed file (the
    // same listing the stream will read, not a hard-coded name) and
    // bakes its decode into the stream; a directory mixing nanos- and
    // micros-written files is unservable by any single file stream and
    // would decode the minority shape wrongly. A genuinely-arriving
    // directory that is still EMPTY at start() gets the session-default
    // shape (TIMESTAMP — Tables.configure loads micros instants
    // natively), matching what the driver's generator currently writes.
    // RAW loaded type, not Tables.t's (whose adaptTs already normalizes
    // ts to TIMESTAMP for every corpus flavor — probing it chose the
    // TIMESTAMP stream schema even for a nanos file, a read-time crash
    // the nanos-branch spec caught)
    val probe = graft.Tables.firstParquetFile(spark, d)
    val rawTs: DataType = probe match {
      case Some(f) => spark.read.parquet(f.toString).schema("ts").dataType
      case None => TimestampType
    }
    def read(tsSql: String) = spark.readStream
      .schema(s"event_id BIGINT, ts $tsSql, user_id BIGINT, " +
        "event_type STRING, value DOUBLE, props STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/")
    rawTs match {
      case TimestampType => read("TIMESTAMP")
      case TimestampNTZType =>
        // a session with NTZ inference re-enabled (not the graft
        // default) — stream in the inferred shape, then re-tag the
        // instant exactly as Tables.adaptTs does
        read("TIMESTAMP_NTZ").withColumn("ts",
          col("ts").cast(TimestampType))
      case LongType =>
        // nanos corpus surfaced as BIGINT under nanosAsLong — but ONLY
        // if the footer really says TIMESTAMP(NANOS): a plain-INT64
        // (unannotated micros) column also loads as BIGINT, and the
        // div-1000 would silently shift it 1000× (Tables.adaptTs's
        // guard, mirrored here)
        val unit = probe.flatMap(f => graft.Tables.footerTsUnit(spark, f, "ts"))
        if (!unit.contains(
            org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit.NANOS))
          throw new IllegalStateException(
            "events stream ts loaded as BIGINT but the parquet footer says " +
              s"logical type ${unit.map(_.toString).getOrElse("<none>")}, " +
              "not TIMESTAMP(NANOS) — corpus schema drifted; extend " +
              "Streams.eventFileStream (mirrors Tables.adaptTs)")
        read("BIGINT")
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case other =>
        // STRING/DATE/INT32… — fail fast with the batch loader's clear
        // drift message instead of streaming nulls or a read-time
        // schema-mismatch error (the old `case _` decoded these as nanos)
        throw new IllegalStateException(
          s"events stream ts loaded as unexpected type $other — corpus " +
            "schema drifted; extend Streams.eventFileStream (mirrors " +
            "Tables.adaptTs)")
    }
  }

  // encoder classes must be public: Spark's generated safe projections
  // access them from synthesized code outside this object
  case class BandRow(band_idx: Int, band_hash: Int, doc_id: Long,
      ts: Timestamp)
  case class CandPair(doc_a: Long, doc_b: Long)
  /** One band bucket's members: doc ids sorted ascending (binary-search
    * membership) with the aligned arrival timestamps, plus the bucket's
    * CUMULATIVE capped-drop count (round 17: feeds the worst-bucket
    * accumulator so the pair-loss bound is per-bucket, not corpus-wide;
    * resets with the bucket's horizon eviction — by then every dropped
    * arrival's pairing window has passed and its drops are already
    * reported). Adding the field changes the state encoder: checkpoints
    * written by earlier rounds do not resume against this version —
    * the query fails fast at start with
    * STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE (pinned in
    * StreamsRestartSpec on this exact old→new shape); the drain +
    * fresh-checkpoint upgrade recipe is in docs/SIZING.md.
    *
    * `dropped` is DELIBERATELY not aged with the member pruning (the
    * r17-ADVICE alternative was considered and rejected): on a
    * never-empty hot bucket the cumulative count makes C(w,2) a loose
    * LIFETIME bound — drops from different horizons can never pair —
    * but an aged counter fed through the max accumulator would bound
    * only the worst SINGLE horizon, and Σᵢ C(wᵢ,2) can exceed
    * max C(wᵢ,2): an aged "bound" silently understates lifetime loss,
    * the one direction an upper bound must never err in. Loose-safe
    * beats tight-wrong; per-phase reading (clearAdvisories between
    * ingestion phases) is the documented way to keep it interpretable
    * (docs/SIZING.md, streaming section). */
  case class BucketState(ids: Array[Long], tss: Array[Long], dropped: Long)

  /** Streaming NEAR-dup detection — the incremental form of
    * `dd_minhash_lsh`: as documents arrive, each one's 32-slot MinHash
    * signature ([[graft.functions.MinHashRow]], bit-identical to the
    * batch aggregate) is banded 16×2 with the same band hashes as the
    * batch plan, and a `flatMapGroupsWithState` stage keyed by
    * (band_idx, band_hash) emits a candidate pair for every earlier
    * bucket member the new document collides with. Candidates then
    * verify EXACTLY against the already-ingested corpus via a
    * stream-static join (codegen [[graft.functions.VectorOps]] merge
    * scan, then exact shingle Jaccard — the batch two-tier shape), so
    * the emitted (doc_a, doc_b, jaccard) rows are true near-dup pairs,
    * not LSH guesses.
    *
    * Emission is at-least-once per pair (a pair colliding in several
    * bands surfaces once per band key; cross-key dedup would need a
    * second stateful stage, which streaming cannot chain after
    * `flatMapGroupsWithState` — consumers dedup on (doc_a, doc_b), and
    * the spec asserts set-parity with the batch operator).
    *
    * Scale and TTL semantics: state is one SORTED (doc_id, ts) member
    * array per OCCUPIED band bucket (binary-search membership). Pairs
    * only form between documents whose arrival ts are within
    * `horizonMinutes` of each other — a true per-pair horizon, enforced
    * at emission. Members whose ts has fallen behind
    * `watermark − horizon` can never pair with a future arrival (new
    * rows always carry ts ≥ watermark), so each invocation prunes them;
    * a whole bucket is evicted by an event-time timeout once the
    * watermark passes its newest member by the horizon. On an infinite
    * crawl stream, state is bounded by the documents inside
    * horizon + lateness, never the whole history: the watermark DELAY
    * (`latenessMinutes`, default = the horizon so any arrival order
    * within the horizon pairs) trails max event time, and the
    * prune/evict thresholds trail the watermark by the horizon —
    * StreamSmoke measures the default's plateau arriving exactly
    * 2·horizon behind the stream head, with per-batch wall tracking
    * total state (the event-time-timeout scan is O(state keys)), which
    * is why the bound matters; near-ordered streams set the tolerance
    * low to shrink state toward 1× horizon. Near-dup buckets stay tiny by
    * construction (a hot bucket means a degenerate band hash), but a
    * defensive `maxBucketMembers` cap keeps the worst case graceful:
    * an arrival to a full bucket still pairs against the existing
    * members but is not retained as a member itself, and the drop is
    * counted on `drops` (so member↔member pairs stay complete; only
    * pairs among the dropped arrivals themselves — and with later
    * arrivals to the same bucket — can be missed). A raw total like
    * `drops=174` is not interpretable on its own (174 scattered
    * stragglers lose ~nothing; one blob's 174-arrival tail loses up to
    * C(174,2) pairs), so pass `worstBucketDrops` (a [[MaxAccumulator]])
    * and read [[nearDupDropAdvisory]] per batch: it quotes the
    * worst single bucket's cumulative drop count w and the bound
    * w·(w−1)/2 — exact for a near-verbatim blob, whose pairs are lost
    * in ALL bands at once (StreamsSpec pins bound == actual loss on a
    * capped blob arriving across waves).
    *
    * CORPUS CONTRACT: the final exact verify is a stream-static join
    * against `corpus`, and a static side is re-read per micro-batch but
    * NOT unioned with the stream — so `corpus` must contain every
    * streamed document's text by the time its candidate pairs reach the
    * verify. A pair of two brand-new documents whose texts are not yet
    * in `corpus` silently drops at the verify join (candidates survive
    * state; verification cannot score them — pinned by the StreamsSpec
    * stale-corpus case). On a live crawl, point `corpus` at the table
    * the ingest path appends to (e.g. the Delta/parquet landing table
    * the same stream sinks into); state deliberately carries only
    * (doc_id, ts) — 16 bytes/member instead of the full shingle arrays,
    * which for typical documents are ~100× larger and would make the
    * horizon's state bound a memory hazard rather than a guarantee. */
  def nearDupStream(docs: DataFrame, corpus: DataFrame,
      horizonMinutes: Int = 1440,
      maxBucketMembers: Int = 1024,
      drops: Option[org.apache.spark.util.LongAccumulator] = None,
      latenessMinutes: Int = -1,
      worstBucketDrops: Option[MaxAccumulator] = None): DataFrame = {
    import graft.functions.{Dedup, MinHashRow}
    val spark = docs.sparkSession
    import spark.implicits._
    val horizonMs = horizonMinutes * 60000L
    val streaming = docs.isStreaming
    // `latenessMinutes` decouples the watermark DELAY (how far out of
    // order a document may arrive and still pair — late-data tolerance)
    // from the pairing horizon. Default: the horizon itself, the
    // conservative choice (any arrival order within the horizon works;
    // state bound ~2× horizon of documents — the StreamSmoke plateau).
    // A crawl with near-ordered arrivals sets this low and the state
    // bound drops toward 1× horizon + lateness; documents later than
    // the tolerance are dropped by the watermark, the standard trade.
    // Pruning below stays correct for ANY tolerance: it only relies on
    // new arrivals carrying ts >= watermark.
    val lateness =
      if (latenessMinutes >= 0) latenessMinutes else horizonMinutes
    val src =
      if (streaming) docs.withWatermark("ts", s"$lateness minutes")
      else docs
    val sigs = src.select(col("doc_id"), col("ts"),
      MinHashRow.minhash32_row(Dedup.shingles(col("text"))).as("sig"))
    val bands = sigs
      .select(col("doc_id"), col("ts"),
        posexplode(array(Dedup.bandHashCols(col("sig")): _*))
          .as(Seq("band_idx", "band_hash")))
      .as[BandRow]
    val cands = bands
      .groupByKey(r => (r.band_idx, r.band_hash))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        (_: (Int, Int), rows: Iterator[BandRow], state: GroupState[BucketState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val batch = rows.toArray
            val wm = if (streaming) state.getCurrentWatermarkMs else Long.MinValue
            val prev = state.getOption.getOrElse(
              BucketState(Array.empty[Long], Array.empty[Long], 0L))
            // prune members that can no longer pair: new arrivals carry
            // ts >= wm, so ts < wm - horizon means every future |Δts|
            // exceeds the horizon (MinValue wm in batch → keep all)
            val pruneBefore =
              if (wm == Long.MinValue) Long.MinValue else wm - horizonMs
            val keep = prev.tss.indices.filter(i => prev.tss(i) >= pruneBefore)
            var ids = if (keep.length == prev.ids.length) prev.ids
              else keep.map(prev.ids).toArray
            var tss = if (keep.length == prev.tss.length) prev.tss
              else keep.map(prev.tss).toArray
            // first arrival wins per doc; insertion in arrival order so
            // the cap retains the EARLIEST members deterministically
            val fresh = batch.groupBy(_.doc_id).iterator
              .map { case (id, rs) => (id, rs.iterator.map(_.ts.getTime).min) }
              .filter { case (id, _) =>
                java.util.Arrays.binarySearch(ids, id) < 0 }
              .toArray.sortBy { case (id, t) => (t, id) }
            val out = scala.collection.mutable.ArrayBuffer.empty[CandPair]
            var dropped = prev.dropped
            fresh.foreach { case (id, t) =>
              var i = 0
              while (i < ids.length) {
                if (math.abs(t - tss(i)) <= horizonMs)
                  out += CandPair(math.min(ids(i), id), math.max(ids(i), id))
                i += 1
              }
              if (ids.length < maxBucketMembers) {
                val pos = -java.util.Arrays.binarySearch(ids, id) - 1
                val gIds = new Array[Long](ids.length + 1)
                val gTss = new Array[Long](tss.length + 1)
                System.arraycopy(ids, 0, gIds, 0, pos)
                System.arraycopy(tss, 0, gTss, 0, pos)
                gIds(pos) = id; gTss(pos) = t
                System.arraycopy(ids, pos, gIds, pos + 1, ids.length - pos)
                System.arraycopy(tss, pos, gTss, pos + 1, tss.length - pos)
                ids = gIds; tss = gTss
              } else {
                drops.foreach(_.add(1))
                dropped += 1
              }
            }
            // report THIS bucket's cumulative drop count — the max over
            // buckets is what bounds the worst-case pair loss
            if (dropped > prev.dropped) worstBucketDrops.foreach(_.add(dropped))
            if (ids.isEmpty) { if (state.exists) state.remove() }
            else {
              state.update(BucketState(ids, tss, dropped))
              if (streaming)
                // when the watermark passes the newest member by the
                // horizon every member is prunable — evict the bucket
                state.setTimeoutTimestamp(math.max(tss.max + horizonMs, wm + 1))
            }
            out.iterator
          }
        })
    // shared two-tier exact verification against the static corpus
    // (stateless stream-static joins — Dedup.exactVerify)
    val docsStatic = corpus.select(col("doc_id"),
      Dedup.shingles(col("text")).as("shs"))
    Dedup.exactVerify(cands.toDF(), docsStatic)
  }

  /** The streaming cap's pair-loss advisory (round 17, the batch
    * advisories' arithmetic pattern): quotes what a raw drop total
    * cannot say — the worst single bucket's cumulative drop count `w`
    * and the bound `w·(w−1)/2` on the late↔late pairs that bucket can
    * have lost. The bound is EXACT for the shape that matters, a
    * near-verbatim blob past the cap: its pairs drop in all bands at
    * once, so every pair among its `w` capped arrivals is lost
    * (pinned in StreamsSpec: bound == measured loss on a capped blob
    * arriving across waves); scattered single stragglers give w = 1 →
    * bound 0, correctly read as harmless. Pure — callers with live
    * accumulators use [[reportDrops]]. */
  private[graft] def nearDupDropAdvisory(totalDrops: Long,
      worstBucketDrops: Long): Option[graft.Advisory] =
    if (totalDrops > 0) {
      val w = worstBucketDrops
      // knob is the OPERATOR PARAMETER (nearDupStream has no session
      // conf); cap = -1 — the reporting site reads accumulators only
      // and does not know the maxBucketMembers value the stream runs
      Some(graft.Advisory("nearDupStream", "maxBucketMembers",
        cap = -1L, measured = w, bound = w * (w - 1) / 2,
        s"nearDupStream dropped $totalDrops member-arrival(s) at full " +
        "band buckets (maxBucketMembers cap). Each dropped arrival still " +
        "paired against the retained members, so member<->member pairs " +
        "are complete; what can be lost are pairs AMONG dropped arrivals " +
        "and with later arrivals to the same bucket. Worst single bucket " +
        s"dropped $w arrival(s) -> up to ${w * (w - 1) / 2} late<->late " +
        "pair(s) lost in that bucket alone (exactly C(w,2) if its drops " +
        "are one near-verbatim blob inside one horizon; ~0 if they are " +
        "scattered stragglers). Collapse exact duplicates upstream " +
        "(dedupStream first) or raise maxBucketMembers past the largest " +
        "duplicate-blob size.",
        // RaiseKnob on an OPERATOR PARAMETER (knob is nearDupStream's
        // argument, not a conf key); target empty — the drop counter
        // does not observe the blob size a sufficient cap must exceed
        action = graft.AdvisoryAction.RaiseKnob, target = ""))
    } else None

  /** Read the two drop accumulators and fire [[nearDupDropAdvisory]]
    * through the session ledger + WARN log ([[graft.Graft.advise]]).
    * Call driver-side after a micro-batch (e.g. per
    * `processAllAvailable` wave, or from a StreamingQueryListener) —
    * accumulator values are only visible on the driver. Idempotent in
    * effect but not in ledger entries: each call with drops > 0
    * appends one entry quoting the CURRENT totals, so call it on wave
    * boundaries, not per row. */
  def reportDrops(spark: SparkSession,
      drops: org.apache.spark.util.LongAccumulator,
      worstBucketDrops: MaxAccumulator): Option[graft.Advisory] = {
    val adv = nearDupDropAdvisory(drops.value, worstBucketDrops.value)
    adv.foreach(graft.Graft.advise(spark, _, log))
    adv
  }

  /** Auto-fire [[reportDrops]] from the streaming engine's own
    * progress events, so a live deployment gets the advisory without
    * wiring a per-batch callback: attach AFTER `start()`, and the
    * listener reports once per micro-batch IN WHICH the drop total
    * GREW (a quiet stream stays quiet; a blob burst advises once per
    * batch with the then-current totals — each entry quotes the
    * cumulative figures, so the LAST entry is the one to read).
    * Self-removes when the query terminates. Returns the listener so
    * a caller can detach early via `spark.streams.removeListener`. */
  def attachDropReporter(spark: SparkSession,
      query: org.apache.spark.sql.streaming.StreamingQuery,
      drops: org.apache.spark.util.LongAccumulator,
      worstBucketDrops: MaxAccumulator)
      : org.apache.spark.sql.streaming.StreamingQueryListener = {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    val listener = new StreamingQueryListener {
      private val lastReported = new java.util.concurrent.atomic.AtomicLong(0L)
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.id == query.id) {
          val cur = drops.value
          // max-CAS, not getAndSet (r17 ADVICE): two racing progress
          // events could each read the accumulator, and the LATER
          // getAndSet with the SMALLER read would move the watermark
          // backwards, letting the same total re-report. accumulateAndGet
          // with max keeps lastReported monotone; the event that raised
          // it is the one that reports.
          val prev = lastReported.getAndAccumulate(cur, (a, b) => math.max(a, b))
          if (cur > prev)
            reportDrops(spark, drops, worstBucketDrops)
        }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        if (e.id == query.id) spark.streams.removeListener(this)
    }
    spark.streams.addListener(listener)
    listener
  }
}
