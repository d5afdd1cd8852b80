package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQueryException}
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Checkpoint-restart recovery for the three stateful mechanisms the
  * near-dup pin (StreamsSpec.nearDupRestartRecovery) does NOT cover —
  * each holds state in a different operator, so recovering one proves
  * nothing about the others:
  *
  *  - `sessionize`: flatMapGroupsWithState with an EVENT-TIME TIMEOUT —
  *    beyond the state rows themselves, the per-group timeout timestamp
  *    and the watermark must round-trip the checkpoint, or a recovered
  *    session flushes at the wrong time (or never).
  *  - `dedupStream`: `dropDuplicatesWithinWatermark` — built-in keyed
  *    dedup state. The failure mode of lost state is SILENT: a
  *    re-delivered fingerprint is emitted as new, duplicating data
  *    downstream, which is exactly what the operator exists to prevent.
  *  - `hourlyByType` (append mode): StateStoreSave partial aggregates —
  *    a window open across the restart must finalize with the
  *    pre-restart contributions it can only get from the store.
  *
  * Shared protocol (same as the near-dup pin): parquet sink + real
  * `checkpointLocation`, cold stop with state populated, remaining data
  * arrives while the query is DOWN, restart, and the recovered output
  * multiset must equal an uninterrupted control run's. In every case a
  * row is planted to straddle the stop so the assertion can only pass
  * if state genuinely recovered (committed offsets are not replayed, so
  * re-derivation cannot fake it). */
object StreamsRestartSpec {
  // top-level so spark.implicits can derive their encoders (method-local
  // case classes have no stable TypeTag)
  case class V1(n: Long)
  case class V2(n: Long, extra: Long)
  // the PRE-r17 near-dup state shape (BucketState before `dropped` was
  // added) — used to write a checkpoint the real operator must reject
  case class OldBucketState(ids: Array[Long], tss: Array[Long])
}

class StreamsRestartSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60000L)
  private def dir(n: String): String =
    java.nio.file.Files.createTempDirectory(n).toString

  /** Drive `waves` through a fresh query twice — once stopped cold after
    * `stopAfter` waves and restarted, once uninterrupted — and return
    * (recovered, control) row multisets from the parquet sinks. */
  private def restartVsControl[T](
      newStream: MemoryStream[T] => org.apache.spark.sql.DataFrame,
      waves: Seq[Seq[T]], stopAfter: Int)(
      implicit enc: org.apache.spark.sql.Encoder[T]): (Seq[String], Seq[String]) = {

    def run(interrupted: Boolean): Seq[String] = {
      val (out, ckpt) = (dir("rst-out"), dir("rst-ckpt"))
      val mem = MemoryStream[T](spark)
      def start() = newStream(mem).writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      val q1 = start()
      try {
        waves.take(stopAfter).foreach { w =>
          mem.addData(w.toIndexedSeq); q1.processAllAvailable()
        }
        if (!interrupted) waves.drop(stopAfter).foreach { w =>
          mem.addData(w.toIndexedSeq); q1.processAllAvailable()
        }
      } finally q1.stop()
      if (interrupted) {
        waves.drop(stopAfter).foreach(w => mem.addData(w.toIndexedSeq))
        val q2 = start()
        try q2.processAllAvailable() finally q2.stop()
      }
      spark.read.parquet(out).collect().map(_.mkString("|")).toSeq.sorted
    }

    (run(interrupted = true), run(interrupted = false))
  }

  /** Register `body` under BOTH state-store providers (the StreamsSpec
    * near-dup pattern): the default heap map and RocksDB — the 100 TB
    * deployment store, whose checkpoint format (changelog + sst) is a
    * different recovery code path entirely. The provider class is read
    * at each query START, so the conf must stay set across the restart
    * inside `body` — exactly what this wrapper guarantees. */
  private def testBothStores(name: String)(body: => Unit): Unit = {
    test(s"$name (default store)")(body)
    test(s"$name (RocksDB store)") {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try body
      finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  testBothStores("sessionize recovers GroupState and its event-time timeout across restart") {
    // Waves 1-2 open a session for user 1 ([5,20], n=2) that is STILL IN
    // STATE at the stop. The post-restart event at t=70 closes it by
    // gap; the ticks advance the watermark so the timeout machinery
    // flushes the rest. The [5,20] session can only be emitted with
    // n_events=2 if the GroupState (and the timeout timestamp that keeps
    // it alive rather than instantly expiring) survived the checkpoint.
    val waves = Seq(
      Seq(Streams.Event(0, ts(5), 1, "click", 1.0)),
      Seq(Streams.Event(1, ts(20), 1, "click", 2.0)),
      Seq(Streams.Event(2, ts(70), 1, "view", 4.0),
        Streams.Event(3, ts(75), 2, "click", 8.0)),
      Seq(Streams.Event(99, ts(10000), 9, "tick", 0.0)),
      Seq(Streams.Event(100, ts(20000), 9, "tick", 0.0)))
    val (rec, ctl) = restartVsControl[Streams.Event](
      mem => Streams.sessionize(mem.toDS()).toDF(), waves, stopAfter = 2)
    assert(rec.exists(_.startsWith(s"1|${ts(5)}|${ts(20)}|2|3.0")),
      s"straddling session [5,20] n=2 must surface from recovered state: $rec")
    assert(rec == ctl, s"restart changed sessions: rec=$rec ctl=$ctl")
  }

  testBothStores("dedupStream recovers fingerprint state: a post-restart re-delivery is dropped") {
    import StreamsSpec.Doc
    // Doc 0 commits before the stop; doc 1 (same token set → same
    // fingerprint) arrives while the query is down. If the dedup state
    // were lost, doc 1 would be emitted as new — a SILENT duplicate.
    val waves = Seq(
      Seq(Doc(0, ts(1), "alpha beta"), Doc(10, ts(2), "gamma delta")),
      Seq(Doc(1, ts(3), "beta  alpha"), Doc(2, ts(4), "epsilon zeta")))
    val (rec, ctl) = restartVsControl[Doc](
      mem => Streams.dedupStream(mem.toDF()), waves, stopAfter = 1)
    val keptIds = rec.map(_.split('|')(0).toLong).toSet
    assert(!keptIds.contains(1L),
      s"re-delivered fingerprint after restart must be dropped: $rec")
    assert(keptIds == Set(0L, 10L, 2L), s"kept=$keptIds")
    assert(rec == ctl, s"restart changed dedup output: rec=$rec ctl=$ctl")
  }

  testBothStores("hourlyByType (append) finalizes a window opened before the restart") {
    // Hour-0 accumulates two events before the stop; a third lands in
    // the same window while the query is down, and the tick pushes the
    // watermark past the window end so it finalizes post-restart. The
    // emitted n_events=3 / sum=7.0 requires the pre-restart partial
    // aggregate out of the recovered state store.
    val waves = Seq(
      Seq(Streams.Event(0, ts(5), 1, "click", 1.0),
        Streams.Event(1, ts(20), 1, "click", 2.0)),
      Seq(Streams.Event(2, ts(40), 2, "click", 4.0),
        Streams.Event(3, ts(200), 9, "tick", 0.0)))
    val (rec, ctl) = restartVsControl[Streams.Event](
      mem => Streams.hourlyByType(mem.toDF()), waves, stopAfter = 1)
    assert(rec.exists(_ == s"${ts(0)}|click|3|7.0"),
      s"hour-0 window must finalize with the recovered partial: $rec")
    assert(rec == ctl, s"restart changed windows: rec=$rec ctl=$ctl")
  }

  testBothStores("file-source stream recovers its offset log: files arriving while down are picked up once") {
    // The four MemoryStream pins above prove STATE recovery; this one
    // proves SOURCE recovery on the production source shape — the file
    // stream's offset log (which files are already committed) must
    // round-trip the checkpoint, so a restart neither re-reads file A
    // (duplicated aggregates) nor skips file B (lost data). The events
    // corpus is split by TIME inside its densest hour window, so that
    // window accumulates partial state from file A, survives the stop
    // (A's watermark sits 10 min before the cut, inside the window),
    // and finalizes post-restart with contributions from BOTH files.
    import scala.jdk.CollectionConverters._
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val maxTs = ev.agg(max("ts")).head.getTimestamp(0)
    // densest 1-hour window that still closes 10 min before the corpus
    // ends (so the post-restart watermark provably finalizes it) AND
    // holds ≥2 DISTINCT timestamps — with a count-only pick, a window
    // of tied timestamps would put zero rows in file A and the test
    // would silently degrade to proving offset-log recovery only
    val w = ev.groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("count"), countDistinct(col("ts")).as("nts"))
      .where(col("w.end") + expr("INTERVAL 10 MINUTES") < lit(maxTs))
      .where(col("nts") >= 2)
      .orderBy(col("count").desc, col("w.start")).head
    val (wStart, wEnd) =
      (w.getStruct(0).getTimestamp(0), w.getStruct(0).getTimestamp(1))
    val inW = ev.where(col("ts") >= lit(wStart) && col("ts") < lit(wEnd))
      .orderBy("ts").select("ts").collect().map(_.getTimestamp(0))
    // first timestamp STRICTLY after the window's earliest: guarantees
    // ≥1 in-window event before the cut (partial state in file A) and
    // ≥1 at/after it (the window finalizes only with file B's rows)
    val cut = inW.find(_.getTime > inW(0).getTime)
      .getOrElse(fail(s"window [$wStart,$wEnd) lost its distinct timestamps"))

    def writeOne(df: org.apache.spark.sql.DataFrame,
        dst: java.nio.file.Path): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("evsplit")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).iterator().asScala
        .find(_.toString.endsWith(".parquet")).get
      java.nio.file.Files.move(part, dst)
    }

    def run(interrupted: Boolean): Seq[String] = {
      val src = java.nio.file.Paths.get(dir("ev-src"))
      val (out, ckpt) = (dir("ev-out"), dir("ev-ckpt"))
      def start() = Streams.hourlyByType(Streams.eventFileStream(spark, src.toString))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      writeOne(ev.where(col("ts") < lit(cut)), src.resolve("a.parquet"))
      // the source lists by modification time: pin A strictly older so
      // the control run provably processes A before B (an mtime tie
      // could flip the order and late-drop A's rows behind B's watermark)
      java.nio.file.Files.setLastModifiedTime(src.resolve("a.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 60000L))
      if (!interrupted)
        writeOne(ev.where(col("ts") >= lit(cut)), src.resolve("b.parquet"))
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      if (interrupted) {
        // file B lands while the query is DOWN
        writeOne(ev.where(col("ts") >= lit(cut)), src.resolve("b.parquet"))
        val q2 = start()
        try q2.processAllAvailable() finally q2.stop()
      }
      spark.read.parquet(out).collect().map(_.mkString("|")).toSeq.sorted
    }

    val rec = run(interrupted = true)
    val ctl = run(interrupted = false)
    // the straddle window must carry BOTH files' contributions — the
    // batch aggregate over the full corpus is the ground truth
    val expectW = Streams.hourlyByType(ev)
      .where(col("hour_start") === lit(wStart))
      .collect().map(_.mkString("|")).toSeq.sorted
    val recW = rec.filter(_.startsWith(wStart.toString))
    assert(recW == expectW,
      s"window [$wStart,$wEnd) must finalize with both files' events: " +
        s"recovered=$recW expected=$expectW")
    assert(rec == ctl,
      s"restart changed the file-stream output: rec=$rec ctl=$ctl")
  }

  test("state-schema evolution breaks checkpoint resume fast, not silently") {
    // The operational gotcha documented on nearDupRestartRecovery, made
    // executable: the checkpoint pins the state encoder's schema, and a
    // restart whose state class gained a field must be REJECTED at
    // start (a clear state-schema error), not decode garbage. Observed:
    // STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE naming both schemas, with
    // `spark.sql.streaming.stateStore.stateSchemaCheck=false` offered as
    // the (dangerous) escape hatch. If a Spark upgrade ever makes this
    // resume silently, this pin fails and the scaladoc claim must be
    // re-verified before anyone trusts an in-place state-class upgrade
    // at 100 TB.
    import StreamsRestartSpec.{V1, V2}
    val ckpt = dir("schema-ckpt"); val out = dir("schema-out")

    def countWith[S](mem: MemoryStream[Streams.Event], zero: S, inc: S => S)(
        implicit enc: org.apache.spark.sql.Encoder[S]) =
      mem.toDS().withWatermark("ts", "30 minutes").groupByKey(_.user_id)
        .flatMapGroupsWithState[S, (Long, Long)](
          OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
          case (uid, rows, state: GroupState[S]) =>
            val s = inc(state.getOption.getOrElse(zero))
            state.update(s)
            Iterator.single((uid, rows.size.toLong))
        }.toDF("user_id", "n")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append")

    val mem = MemoryStream[Streams.Event](spark)
    val q1 = countWith[V1](mem, V1(0), s => V1(s.n + 1)).start()
    try {
      mem.addData(Streams.Event(0, ts(5), 1, "click", 1.0))
      q1.processAllAvailable()
    } finally q1.stop()

    mem.addData(Streams.Event(1, ts(10), 1, "click", 2.0))
    val ex = intercept[StreamingQueryException] {
      val q2 = countWith[V2](mem, V2(0, 0), s => V2(s.n + 1, s.extra)).start()
      try q2.processAllAvailable() finally q2.stop()
    }
    // pin the ERROR CONDITION, not loose substrings: a streaming
    // failure's message embeds the logical plan (which contains
    // 'FlatMapGroupsWithState'), so the old contains("state") passed on
    // ANY failure from this query. The cause chain's SparkThrowable
    // condition (observed: STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE) can
    // only come from a genuine state-schema rejection; the lone
    // message fallback is "schema_not_compatible" for a condition
    // rename across Spark upgrades — a string no plan dump contains.
    val conditions = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).take(10)
      .collect { case st: org.apache.spark.SparkThrowable =>
        Option(st.getCondition) }.flatten.toSeq
    val msg = (ex.getMessage + Option(ex.getCause).fold("")(_.getMessage))
      .toLowerCase
    assert(conditions.exists(c =>
        c.contains("SCHEMA") && c.contains("COMPATIBLE")) ||
        msg.contains("schema_not_compatible"),
      s"expected a state-schema incompatibility error " +
        s"(conditions=$conditions), got: ${ex.getMessage}")
  }

  test("a pre-r17 nearDupStream checkpoint is rejected by the real operator") {
    // The V1→V2 pin above proves the MECHANISM on a toy operator; this
    // one pins the SHIPPED upgrade path an operator actually hits
    // (docs/SIZING.md, "Streaming near-dup operations"): a checkpoint
    // whose keyed state is the pre-r17 BucketState(ids, tss) — written
    // here by a faithful replica of the old stage: same banding
    // upstream, same (band_idx, band_hash) key, same CandPair output,
    // same exact-verify join downstream — must fail FAST at restart
    // under the r17+ BucketState(ids, tss, dropped) encoder with the
    // recognizable state-schema condition, not decode garbage pairs.
    import StreamsRestartSpec.OldBucketState
    import StreamsSpec.Doc
    import graft.functions.{Dedup, MinHashRow}
    import org.apache.spark.sql.functions.{col, posexplode, array}
    val text = (0 until 30).map(i => s"ckpt tok$i shared body").mkString(" ")
    val corpus = Seq(Doc(1, ts(1), text), Doc(2, ts(5), text),
      Doc(3, ts(9), text)).toDF()
    val ckpt = dir("neardup-old-ckpt"); val out = dir("neardup-old-out")
    val horizonMs = 60 * 60000L

    // the pre-r17 stage: identical plan shape, state value minus `dropped`
    def oldNearDup(docs: org.apache.spark.sql.DataFrame) = {
      val src = docs.withWatermark("ts", "60 minutes")
      val sigs = src.select(col("doc_id"), col("ts"),
        MinHashRow.minhash32_row(Dedup.shingles(col("text"))).as("sig"))
      val bands = sigs.select(col("doc_id"), col("ts"),
        posexplode(array(Dedup.bandHashCols(col("sig")): _*))
          .as(Seq("band_idx", "band_hash")))
        .as[Streams.BandRow]
      val cands = bands.groupByKey(r => (r.band_idx, r.band_hash))
        .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.EventTimeTimeout)(
          (_: (Int, Int), rows: Iterator[Streams.BandRow],
              state: GroupState[OldBucketState]) => {
            if (state.hasTimedOut) { state.remove(); Iterator.empty }
            else {
              val prev = state.getOption.getOrElse(
                OldBucketState(Array.empty[Long], Array.empty[Long]))
              val fresh = rows.toArray.groupBy(_.doc_id).iterator
                .map { case (id, rs) =>
                  (id, rs.iterator.map(_.ts.getTime).min) }
                .filter { case (id, _) => !prev.ids.contains(id) }.toArray
              val outPairs = for {
                (id, t) <- fresh.iterator
                i <- prev.ids.indices.iterator
                if math.abs(t - prev.tss(i)) <= horizonMs
              } yield Streams.CandPair(math.min(prev.ids(i), id),
                math.max(prev.ids(i), id))
              val ids = prev.ids ++ fresh.map(_._1)
              val tss = prev.tss ++ fresh.map(_._2)
              state.update(OldBucketState(ids, tss))
              state.setTimeoutTimestamp(tss.max + horizonMs)
              outPairs
            }
          })
      Dedup.exactVerify(cands.toDF(), corpus.select(col("doc_id"),
        Dedup.shingles(col("text")).as("shs")))
    }

    val mem = MemoryStream[Doc](spark)
    val q1 = oldNearDup(mem.toDF()).writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      // two waves: the pair (1,2) can only emit if wave-1 state was
      // WRITTEN and read back in wave 2 — proves old-shape state exists
      mem.addData(Doc(1, ts(1), text)); q1.processAllAvailable()
      mem.addData(Doc(2, ts(5), text)); q1.processAllAvailable()
    } finally q1.stop()
    assert(spark.read.parquet(out).count() >= 1L)

    mem.addData(Doc(3, ts(9), text))
    val ex = intercept[StreamingQueryException] {
      val q2 = Streams.nearDupStream(mem.toDF(), corpus,
          horizonMinutes = 60)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try q2.processAllAvailable() finally q2.stop()
    }
    val conditions = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).take(10)
      .collect { case st: org.apache.spark.SparkThrowable =>
        Option(st.getCondition) }.flatten.toSeq
    val msg = (ex.getMessage + Option(ex.getCause).fold("")(_.getMessage))
      .toLowerCase
    assert(conditions.exists(c =>
        c.contains("SCHEMA") && c.contains("COMPATIBLE")) ||
        msg.contains("schema_not_compatible"),
      s"the real operator must reject the pre-r17 checkpoint with the " +
        s"state-schema condition (conditions=$conditions), " +
        s"got: ${ex.getMessage}")
  }
}
