package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.t

/** Deduplication operators over `documents` — exact, n-gram Jaccard,
  * MinHash+LSH, SimHash, embedding-cosine — the core training-data
  * pipeline surface.
  *
  * Scale design: every variant generates candidates through an
  * *equi-join on a derived key* (fingerprint, shared shingle, LSH band,
  * SimHash chunk) so the shuffle distributes on high-cardinality keys
  * and no O(n²) comparison ever materializes; exact similarity is only
  * computed on the candidate set. That is the shape that survives 100 TB
  * — the one deliberate exception is [[ddEmbedCosine]]'s exact route,
  * which keeps the broadcast nested loop while the corpus is small
  * enough that full pair scoring is cheaper than blocking (≤ 2¹⁶
  * vectors) and switches to IVF-cell pairing above. Both corpus-size
  * switches and the hot-key caps are session-tunable (see [[confLong]]),
  * and the scale-side plans are driver-gated via the `dd_simhash_wide` /
  * `dd_embed_cosine_bucketed` registrations.
  */
object Dedup {

  /** Session-tunable scale knobs. The corpus-size switches and
    * hot-key caps below were chosen from measured candidate curves on
    * the synthetic corpora (SURVEY §8.4.4), but a real 100 TB operator
    * tunes them per corpus — boilerplate density, duplicate-blob
    * frequency and shingle entropy all move the crossovers. Each knob
    * therefore reads `spark.conf` with the measured value as default:
    *
    *  - `graft.ngram.dfCapFactor` (8): dfCap = factor·√N, floor 64
    *  - `graft.minhash.maxBucket` (1024): LSH band-bucket member cap
    *  - `graft.simhash.wideSwitch` (10⁷): docs above which the C(8,4)
    *    wide band tables replace the 16-bit chunk tables
    *  - `graft.embedCosine.exactMax` (2¹⁶): vectors above which the
    *    IVF-bucketed route replaces the exact broadcast loop
    *  - `graft.embedCosine.maxCell` (corpus-aware: max(4096, 4·√N)
    *    ceilinged at 16384 — [[embedCosineMaxCellDefault]]): IVF-cell
    *    member cap above which a cell is hash-split into shards (the
    *    mega-cell guard — it bounds per-cell PAIRS at ~maxCell²/2 per
    *    shard, so it must sit far below the exactMax broadcast ceiling;
    *    [[embedCapAdvisory]] warns when the resolved cap sits below the
    *    measured zero-miss sizing)
    *  - `graft.ngram.mhPrefixSlots` (0 = off): leading MinHash slots
    *    carried as a slim tier-0 candidate filter in the ngram verify
    *    (see [[mhPrefixFilter]]); `graft.ngram.mhPrefixMin` (2): slots
    *    that must match to survive tier 0. OFF by default: the filter
    *    is probabilistic (a j = 0.5 boundary pair is missed with
    *    p ≈ 2.6·10⁻⁴ at 16/2), so the default keeps [[ddNgramJaccard]]
    *    exact; the knob is the 100 TB escape hatch, measured §8.4.7.
    *
    * KnobsSpec pins that setting each conf actually flips the route /
    * cap; the driver gate runs at defaults, so its output is unchanged. */
  private def confLong(spark: SparkSession, key: String, default: Long): Long =
    spark.conf.get(key, default.toString).toLong

  /** Whether the session's shuffle codec is already zstd — the escape
    * the tier-0 ladder rung would otherwise keep recommending on every
    * retry (r19 ADVICE: the codec is build-time-static, so a dispatcher
    * applying the SetConf record at session rebuild got the identical
    * advisory again and the retry-until-silent loop never converged). */
  private def zstdActive(spark: SparkSession): Boolean =
    spark.conf.get("spark.io.compression.codec", "lz4")
      .toLowerCase.contains("zstd")

  private def confDouble(spark: SparkSession, key: String,
      default: Double): Double =
    spark.conf.get(key, default.toString).toDouble

  /** 3-word shingles (distinct) of the whitespace tokenization — native
    * single-pass expression (see [[ShingleArray]]; the higher-order
    * `transform(sequence, slice)` formulation re-splits the document per
    * shingle and was the dominant cost of every shingle-based op). */
  def shingles(c: Column): Column = ShingleArray.shingles3(c)

  /** Exact dedup under sorted-distinct-token-set normalization: every
    * member of a duplicate group mapped to its canonical (min) doc_id.
    * One shuffle on the 128-bit fingerprint. */
  /** Sorted-distinct-token-set md5 — the exact-dedup document identity,
    * shared by [[ddExact]], `TextAnalysis.taCurate` and
    * `Streams.dedupStream` so the three can never disagree on what
    * counts as "the same document". */
  private[graft] def docFingerprint(c: Column): Column =
    // null-PRESERVING, deliberately: concat_ws swallows a null array
    // into "", which would fingerprint a null-text document identically
    // to an empty-text one — while the DuckDB oracle's md5(null) is
    // NULL, so the two engines would group differently on any corpus
    // containing null texts (pinned by EdgeCorpusSpec)
    when(c.isNotNull, md5(concat_ws(" ",
      array_sort(array_distinct(split(trim(c), "\\s+")))).cast("binary")))

  def ddExact(spark: SparkSession, dir: String): DataFrame = {
    val fp = docFingerprint(col("text"))
    val w = Window.partitionBy("fp")
    t(spark, dir, "documents")
      .select(col("doc_id"), fp.as("fp"))
      .withColumn("canonical", min("doc_id").over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .where(col("group_size") > 1)
      .select("doc_id", "canonical", "group_size", "fp")
      .orderBy("doc_id")
  }

  /** N-gram (3-shingle) Jaccard near-dup pairs at threshold t = 0.5,
    * candidate generation by *prefix-filtered* shared-shingle equi-join
    * (the AllPairs/PPJoin family):
    *
    *  1. per-shingle document frequency (df) in one groupBy; singleton
    *     shingles (df = 1) can never witness a pair and are dropped, and
    *     stop-shingles with df > `dfCap` are dropped outright — a shingle
    *     shared by that many documents carries no near-dup signal and
    *     would emit df² pair instances (the hot-key quadratic);
    *  2. each document's surviving shingles are ordered rarest-first
    *     (df asc, hash asc — a global total order) and only the first
    *     m − ⌈n/2⌉ + 1 participate in the join (m = surviving count,
    *     n = full shingle count). LOSSLESS for t = 0.5: J(A,B) ≥ t with
    *     the length filter 2·min(na,nb) ≥ max(na,nb) forces an overlap
    *     ≥ ⌈n/2⌉, and two sets with overlap ≥ α must share an element
    *     within their first |x| − α + 1 elements of any common order;
    *  3. candidate pairs (distinct, plus the length filter in the join)
    *     are verified with an exact Jaccard over the *string* shingle
    *     arrays — so a 64-bit hash collision in candidate generation can
    *     only add a candidate, never corrupt the output.
    *
    * Rarest-first ordering concentrates the join on low-df keys, so the
    * pair-instance stream shrinks superlinearly vs the naive self-join
    * (the df² blowup lives in the hot shingles, which the prefix rarely
    * touches and `dfCap` hard-bounds).
    *
    * `dfCap` scales with the corpus: by default 8·√N (N from the parquet
    * footer — no extra scan), floored at 64. A shingle hotter than k·√N
    * would emit ≥ k²·N pair instances on its own — super-linear in the
    * corpus — while carrying no near-dup signal (corpus-wide boilerplate
    * has df ~ N). The trade is the standard stop-shingle one: a pair
    * whose shared shingles are ALL hotter than the cap is missed; any
    * sub-cap shared shingle keeps it reachable, and verification is
    * exact regardless. A constant cap either binds never (small corpora)
    * or too late (at 100 TB a df-100k shingle still admits ~10¹⁰ pair
    * instances).
    *
    * Blob corner (round 16, the third sibling of the embed maxCell and
    * minhash maxBucket silent-loss class): a NEAR-verbatim blob of
    * m > dfCap members gives every blob-shared shingle df ≈ m, so ALL
    * of a blob pair's shared shingles are capped and the pair is
    * missed — the dup-farm case, not boilerplate. Here the drop is
    * structural to the stop-shingle design (df-capped shingles are
    * EXPECTED on every real corpus, so a max(df) observation would
    * always fire and carry no signal — unlike the other two caps where
    * any crossing means a dropped bucket/split cell), so the guard is
    * OPERATIONAL, same as §8.4.8e's: sequence `dd_exact` /
    * `dd_minhash_lsh` first — the minhash bucket advisory fires on
    * exactly these blobs — and run ngram on the residue
    * (docs/SIZING.md, blob section). */
  def ddNgramJaccard(spark: SparkSession, dir: String, dfCap: Int = -1): DataFrame =
    // gate-friendly ordering lives HERE, in the registration-facing
    // form; composing operators (ddCluster) consume the unordered core
    // so they never pay a wasted range exchange
    ddNgramJaccardPairs(spark, dir, dfCap).orderBy("doc_a", "doc_b")

  /** Unordered j ≥ 0.5 pair set — the composable core of
    * [[ddNgramJaccard]]. */
  def ddNgramJaccardPairs(spark: SparkSession, dir: String, dfCap: Int = -1): DataFrame = {
    val base = ngramBase(spark, dir)
    val slots = confLong(spark, "graft.ngram.mhPrefixSlots", 0L).toInt
    // ONE driver-side footer read per construction, shared by the
    // advisory (which needs nDocs on BOTH tiers — each has its own
    // measured wall) and the dfCap default. Shared, not cached: the
    // smoke mains overwrite their target/ corpora between factors, so a
    // (dir, table) cache would hand back stale counts.
    val nDocs = graft.Tables.footerRowCount(spark, dir, "documents")
    ngramShuffleWarning(nDocs, slots,
        confLong(spark, "graft.ngram.warnDocs", 4000000L),
        confLong(spark, "graft.ngram.tier0WarnDocs", 8000000L),
        confLong(spark, "graft.ngram.stagedWarnDocs", 16000000L),
        zstd = zstdActive(spark))
      .foreach(graft.Graft.advise(spark, _, log))
    exactVerify(ngramCandidatesFrom(base,
        if (dfCap > 0) dfCap else capForDocs(spark, nDocs)), base,
      mhPrefixSlots = slots,
      mhPrefixMin = confLong(spark, "graft.ngram.mhPrefixMin", 2L).toInt)
  }

  /** Disk-bounded STAGED execution of [[ddNgramJaccard]] — same exact
    * j ≥ 0.5 pair set, peak shuffle-disk bounded at ~1/shards of the
    * single-query plan's.
    *
    * Why it exists (SURVEY §8.4.3g): a single-query near-dup plan holds
    * ALL of its exchanges' shuffle files until the job ends — the
    * df window (exchange by sh), the prefix window (exchange by
    * doc_id), the pair self-join and the verify joins coexist on local
    * disk. The 4000× probe (20M docs) measured that even the slim
    * tier-0 survivor pass ENOSPCs this box's ~72 GB under zstd. On a
    * real cluster the same arithmetic binds per NODE: shuffle disk, not
    * CPU, is the wall.
    *
    * The staged mode breaks the pipeline at its three materialization
    * points and hash-shards each stage, so (a) every Spark job's
    * shuffle files are released before the next starts, and (b) each
    * job sees ~1/shards of the stream:
    *   1. `joinable` (df-filtered exploded stream) → parquet, sharded
    *      by pmod(sh, shards) — df is per-`sh`, so the shard-local
    *      window df is the global df;
    *   2. `prefix` (rarest-first PPJoin prefix) → parquet, sharded by
    *      pmod(doc_id, shards) — rrk is per-doc;
    *   3. per sh-shard: the pair self-join restricted to that shard's
    *      join keys, then the SAME two-tier [[exactVerify]] (with the
    *      session's tier-0 knobs) → parquet append. The union over
    *      shards is the complete candidate set (sharding partitions
    *      the join-KEY space); a pair with witness shingles in several
    *      shards is verified more than once and emits identical rows —
    *      the final distinct dedups. True pairs share many shingles,
    *      but they are the tiny fraction of the stream, so the
    *      duplicated verify volume is negligible next to the bound.
    *
    * The price is re-running the corpus scan + shingle pass once per
    * stage-1/stage-3 shard (map-only, CPU-bound) — the standard
    * disk-for-CPU trade when per-node spill is the binding constraint.
    * `System.gc()` after each SHARD job (round 19, r18 ADVICE: after
    * each stage only, stages 1-2 accumulated their k jobs' files)
    * nudges the ContextCleaner to actually unlink the finished job's
    * shuffle files (cleanup is weak-reference-driven; on a 48 GiB
    * driver heap a collection may otherwise not happen between jobs) —
    * so the per-job spill bound ~1/shards holds in EVERY stage.
    *
    * Shard count: an explicit `shards` argument wins, then an explicit
    * `graft.ngram.stageShards` conf, then the CORPUS-AWARE default
    * (round 19): ceil([[ngramSinglePlanSpillBytes]] / the per-node
    * spill budget). The budget itself is DISK-AWARE (round 20, r19
    * verdict #2 — the prior 18 GB literal was calibrated to this box's
    * 72 GB free): an explicit `graft.ngram.stageSpillBudgetBytes` conf
    * wins, else 25% of the stage filesystem's probed free bytes, else
    * the calibrated 18 GB fallback when the filesystem cannot say —
    * see [[stageSpillBudget]]; the auto path fires one typed Observe
    * record quoting probed-free vs chosen budget. Tiny corpora
    * auto-size to k = 1 (pure staging, no sharding overhead).
    *
    * Eager (runs jobs and writes under `stageDir`), unlike every other
    * operator here — the returned frame reads the materialized result.
    * The invocation OWNS `stageDir` (stamped with a `_graft_stage`
    * marker; a non-empty dir WITHOUT the marker is refused, not
    * destroyed — a mistyped stageDir pointing at data must not be
    * deleted). Each invocation writes under its own monotonic
    * `run-NNNNNN/` subdirectory and reclaims only OLDER runs at entry,
    * keeping the newest prior run intact (round 20, r19 verdict #4:
    * previously the next invocation deleted the files under the
    * earlier handle) — so with SEQUENTIAL use a returned frame stays
    * valid through the next invocation on the same stageDir and is
    * reclaimed at the one after (at most two runs coexist, bounding
    * the retained footprint at one extra `pairs/` result). Concurrent
    * invocations must still pass distinct dirs. The default
    * (`graft.ngram.stageDir`) is safe for sequential use, which is
    * what every registered-gate path does. On a cluster whose
    * corpus lives on a different filesystem (hdfs/s3a) the
    * driver-relative default stages through the LOCAL filesystem — a
    * typed SetConf advisory fires naming the mismatch (round 19).
    * After the pairs write lands, `joinable/` and `prefix/` are
    * deleted eagerly (only `pairs/` backs the returned frame) — the
    * mode exists because disk is the binding constraint, so ~2/3 of
    * the staged footprint must not outlive its use. Each stage appends
    * one typed Observe record (shards, rows, bytes, wall) to the
    * session ledger via [[graft.Graft.advise]], so a staged run is
    * auditable like everything else despite `.explain` on the returned
    * frame showing only the final read.
    * Registered as `dd_ngram_staged` against the SAME DuckDB oracle as
    * `dd_ngram_jaccard`: the driver gate checks the staged mode's
    * result hash-equals the single-query plan's. */
  def ddNgramJaccardStaged(spark: SparkSession, dir: String,
      stageDir: String = "", shards: Int = -1, dfCap: Int = -1): DataFrame = {
    import org.apache.hadoop.fs.Path
    val stage = if (stageDir.nonEmpty) stageDir
      else spark.conf.get("graft.ngram.stageDir", "target/ngram-staged")
    val slots = confLong(spark, "graft.ngram.mhPrefixSlots", 0L).toInt
    val minM = confLong(spark, "graft.ngram.mhPrefixMin", 2L).toInt
    val nDocs = graft.Tables.footerRowCount(spark, dir, "documents")
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val stagePath = new Path(stage)
    val fs = stagePath.getFileSystem(hadoopConf)
    val k = if (shards > 0) shards
      else spark.conf.getOption("graft.ngram.stageShards") match {
        case Some(v) =>
          val parsed =
            try v.trim.toInt
            catch { case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"graft.ngram.stageShards must be a positive integer, got '$v'")
            }
          require(parsed > 0,
            s"graft.ngram.stageShards must be positive, got $parsed " +
            "(k = 0 would write no stage and fail opaquely at the read)")
          parsed
        case None =>
          val spill = ngramSinglePlanSpillBytes(nDocs, tier0 = slots > 0,
            zstd = zstdActive(spark))
          val confBudget =
            spark.conf.getOption("graft.ngram.stageSpillBudgetBytes")
              .map { v =>
                try v.trim.toLong
                catch { case _: NumberFormatException =>
                  throw new IllegalArgumentException(
                    "graft.ngram.stageSpillBudgetBytes must be a " +
                    s"positive long, got '$v'")
                }
              }
          val probed = probeStageFree(fs, stagePath)
          val (budget, source) = stageSpillBudget(confBudget, probed)
          val sized = ngramStageShards(spill, budget)
          // one Observe record whenever the budget was CHOSEN rather
          // than configured — the sizing decision must be auditable
          // (an explicit conf is the user's own choice; stays silent)
          if (confBudget.isEmpty)
            graft.Graft.advise(spark, graft.Advisory("dd_ngram_staged",
              knob = "graft.ngram.stageSpillBudgetBytes", cap = budget,
              measured = probed, bound = spill,
              s"dd_ngram_staged auto-sized shards=$sized: predicted " +
              s"single-plan spill $spill bytes against a $source spill " +
              s"budget of $budget bytes" + (if (source == "probed")
                s" (25% of $probed free bytes on the stage filesystem — " +
                "NOTE: a remote-FS probe reports cluster-wide free space " +
                "while the budget bounds PER-NODE spill)"
              else " (free-space probe unavailable — the box-calibrated " +
                "default)") +
              ". Override via graft.ngram.stageSpillBudgetBytes.",
              action = graft.AdvisoryAction.Observe, target = source), log)
          sized
      }
    val cap = if (dfCap > 0) dfCap else capForDocs(spark, nDocs)
    val corpusPath = new Path(dir)
    stageFsMismatchAdvisory(
        corpusPath.getFileSystem(hadoopConf).makeQualified(corpusPath).toUri,
        fs.makeQualified(stagePath).toUri)
      .foreach(graft.Graft.advise(spark, _, log))
    val marker = new Path(stagePath, "_graft_stage")
    val RunName = "run-(\\d+)".r
    var prevRun = 0L // newest prior run id — kept live through this run
    if (fs.exists(stagePath)) {
      // staged-owned = marked by a prior r19+ run, or shaped exactly
      // like a pre-marker r18 residue — which always retained ALL
      // THREE stage dirs (the old code deleted nothing), so the
      // grandfather clause requires `joinable` present: a user's
      // persisted COPY of results (typically `pairs/` alone) is
      // refused, not destroyed. Anything with foreign entries is
      // refused outright.
      val entries = fs.listStatus(stagePath).map(_.getPath.getName)
        .filterNot(_ == "_graft_stage")
      val owned = fs.exists(marker) ||
        (entries.forall(Set("joinable", "prefix", "pairs")) &&
          entries.contains("joinable"))
      if (entries.nonEmpty && !owned)
        throw new IllegalArgumentException(
          s"refusing to clear stage dir '$stage': it is non-empty and " +
          "carries no _graft_stage marker from a prior staged run — a " +
          "mistyped stageDir / graft.ngram.stageDir pointing at a data " +
          "directory must not be silently destroyed. Pass an empty or " +
          "staged-owned directory.")
      // reclaim: pre-run-subdir residue (flat joinable/prefix/pairs,
      // r18/r19 layout — its contract already invalidated the frame at
      // the next invocation) goes now; among run-*/ subdirs only the
      // NEWEST survives — it may back a live frame from the previous
      // invocation (the r19 ADVICE foot-gun this layout removes)
      val runIds = entries.collect { case RunName(id) => id.toLong }
      prevRun = if (runIds.isEmpty) 0L else runIds.max
      entries.foreach {
        case RunName(id) if id.toLong == prevRun => ()
        case e => fs.delete(new Path(stagePath, e), true)
      }
    }
    val runStr = f"$stage/run-${prevRun + 1L}%06d"
    fs.mkdirs(new Path(runStr))
    if (!fs.exists(marker)) fs.create(marker).close()
    val base = ngramBase(spark, dir)
    // schemas captured from the plans (no execution) so the staged
    // parquet reads never depend on inference — an all-empty stage
    // (degenerate corpus) writes only _SUCCESS, which schema-less
    // parquet reads reject
    val joinableSchema = ngramJoinable(ngramExploded(base), cap).schema
    // the gc nudge exists to make the ContextCleaner release the
    // finished job's shuffle files while DISK is the constraint; on a
    // small corpus (gates, tests, benches) the whole single-plan spill
    // is under a GB and a forced full collection is pure wall-clock —
    // 2.2 s of the 5.25 s sf0.001 invocation, measured min-of-5
    val gcMinDocs = confLong(spark, "graft.ngram.stageGcMinDocs", 1000000L)
    def afterJob(): Unit = if (nDocs >= gcMinDocs) System.gc()
    // one typed Observe record per stage: the staged run's audit trail
    // (the returned frame's .explain shows only the final read, so the
    // ledger is where a 100 TB operator reads what the stages did)
    def stageRecord(name: String, wallMs: Long): Unit = {
      val p = new Path(runStr, name)
      val rows = graft.Tables.footerRowCountAtPath(spark, p.toString)
      val bytes = fs.getContentSummary(p).getLength
      graft.Graft.advise(spark, graft.Advisory("dd_ngram_staged",
        knob = s"stage:$name", cap = k, measured = rows, bound = bytes,
        s"dd_ngram_staged stage '$name': $rows rows, $bytes bytes " +
        s"written in $wallMs ms across $k shard job(s) under '$runStr'.",
        action = graft.AdvisoryAction.Observe,
        target = wallMs.toString), log)
    }
    def timed(body: => Unit): Long = {
      val t0 = System.nanoTime(); body
      (System.nanoTime() - t0) / 1000000L
    }
    val w1 = timed((0 until k).foreach { i =>
      ngramJoinable(
          ngramExploded(base).where(pmod(col("sh"), lit(k)) === i), cap)
        .write.mode("append").parquet(s"$runStr/joinable")
      afterJob()
    })
    stageRecord("joinable", w1)
    val joinable = spark.read.schema(joinableSchema)
      .parquet(s"$runStr/joinable")
    val prefixSchema = ngramPrefix(joinable).schema
    val w2 = timed((0 until k).foreach { i =>
      ngramPrefix(joinable.where(pmod(col("doc_id"), lit(k)) === i))
        .write.mode("append").parquet(s"$runStr/prefix")
      afterJob()
    })
    stageRecord("prefix", w2)
    val prefix = spark.read.schema(prefixSchema).parquet(s"$runStr/prefix")
    val pairsSchema = exactVerify(ngramPairJoin(prefix), base,
      mhPrefixSlots = slots, mhPrefixMin = minM).schema
    val w3 = timed((0 until k).foreach { i =>
      exactVerify(
          ngramPairJoin(prefix.where(pmod(col("sh"), lit(k)) === i)), base,
          mhPrefixSlots = slots, mhPrefixMin = minM)
        .write.mode("append").parquet(s"$runStr/pairs")
      afterJob()
    })
    stageRecord("pairs", w3)
    // only pairs/ backs the returned frame — drop the other two stages'
    // footprint NOW, not at the next invocation (r18 verdict #3)
    fs.delete(new Path(runStr, "joinable"), true)
    fs.delete(new Path(runStr, "prefix"), true)
    spark.read.schema(pairsSchema).parquet(s"$runStr/pairs")
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  /** Predicted single-query-plan shuffle spill for the ngram near-dup
    * operator — PURE, calibrated on the measured §8.4.3e-g ENOSPC
    * ladder (per-doc spill at each wall; survivors, and with them
    * spill, are measured exactly linear in the corpus):
    * exact+lz4 78 GB/5M docs = 15.6 KB/doc, tier-0+lz4 78 GB/10M =
    * 7.8 KB/doc, tier-0+zstd 72 GB/20M = 3.6 KB/doc, exact+zstd ~2/3
    * of exact+lz4 (§8.4.3f's measured "~1/3 less under zstd"). */
  private[graft] def ngramSinglePlanSpillBytes(nDocs: Long,
      tier0: Boolean, zstd: Boolean): Long = {
    val perDoc = (tier0, zstd) match {
      case (false, false) => 15600L
      case (false, true)  => 10400L
      case (true,  false) => 7800L
      case (true,  true)  => 3600L
    }
    nDocs * perDoc
  }

  /** Corpus-aware staged shard count (round 19, the mode's last
    * un-sized knob): per-job spill is ~1/shards of the single plan's,
    * so k = ceil(predicted spill / per-node budget) bounds each job
    * under the budget; 1 for anything that fits outright. PURE —
    * pinned in KnobsSpec at the three measured ladder points. */
  private[graft] def ngramStageShards(spillBytes: Long,
      budgetBytes: Long): Int = {
    require(budgetBytes > 0, s"spill budget must be positive: $budgetBytes")
    math.max(1L, math.ceil(spillBytes.toDouble / budgetBytes).toLong).toInt
  }

  private[graft] val stageBudgetFallbackBytes = 18000000000L
  private[graft] val stageBudgetFraction = 0.25
  private[graft] val stageBudgetFloorBytes = 1000000000L
  // a generic Hadoop FileSystem that doesn't implement getStatus
  // reports remaining = Long.MaxValue; anything past 1 PB is treated
  // as "the filesystem cannot say" rather than a usable measurement
  private[graft] val stageBudgetProbeCeilingBytes = 1000000000000000L

  /** Per-node stage spill budget (round 20, r19 verdict #2: the 18 GB
    * literal was calibrated to THIS box's 72 GB free and silently
    * mis-sized k on any other node). PURE — pinned in KnobsSpec.
    * Precedence: an explicit `graft.ngram.stageSpillBudgetBytes` conf
    * wins; else 25% of the PROBED free bytes on the stage filesystem
    * (conservative: the staged run shares the disk with the corpus,
    * the other stages' parquet, and everything else on the node),
    * floored at 1 GB so a nearly-full disk degrades to many small
    * shards instead of a degenerate budget; else — probe unavailable
    * (-1) or past the 1 PB sanity fence — the box-calibrated 18 GB
    * fallback. Caveat the Observe advisory quotes: a remote-FS probe
    * (hdfs getStatus) reports CLUSTER-wide remaining while the budget
    * bounds PER-NODE spill — the conf override is the per-node escape.
    * Returns (budget, source) with source ∈ {conf, probed, fallback}. */
  private[graft] def stageSpillBudget(confBytes: Option[Long],
      probedFreeBytes: Long): (Long, String) = confBytes match {
    case Some(b) =>
      require(b > 0,
        s"graft.ngram.stageSpillBudgetBytes must be positive: $b")
      (b, "conf")
    case None if probedFreeBytes > 0 &&
        probedFreeBytes < stageBudgetProbeCeilingBytes =>
      (math.max(stageBudgetFloorBytes,
        (probedFreeBytes * stageBudgetFraction).toLong), "probed")
    case None => (stageBudgetFallbackBytes, "fallback")
  }

  /** Free bytes on the stage filesystem, probed at the deepest
    * EXISTING ancestor of the stage path (the stage dir itself may not
    * exist yet on a first run); -1 when the filesystem cannot say.
    *
    * Local filesystems probe via `File.getUsableSpace` (statvfs
    * f_bavail — the bytes a write can actually consume), NOT Hadoop's
    * `getStatus().getRemaining`, which maps to f_bfree and on
    * reserved/thin-provisioned volumes reports free space that does
    * not exist for writers. MEASURED the hard way on this box's first
    * 40M-doc attempt: f_bfree said 227 GB where df's Avail (f_bavail)
    * said 69 GB — the 3× over-report sized k = 3 instead of 8 and the
    * run ENOSPCed mid-stage, the exact failure the budget exists to
    * prevent (§8.4.3h, round 20). */
  private[graft] def probeStageFree(fs: org.apache.hadoop.fs.FileSystem,
      stagePath: org.apache.hadoop.fs.Path): Long =
    try {
      var p = fs.makeQualified(stagePath)
      while (p != null && !fs.exists(p)) p = p.getParent
      if (p == null) -1L
      else if (Option(p.toUri.getScheme).forall(_ == "file"))
        new java.io.File(p.toUri.getPath).getUsableSpace
      else fs.getStatus(p).getRemaining
    } catch { case scala.util.control.NonFatal(_) => -1L }

  /** Stage-filesystem hygiene advisory (round 19, r18 verdict #4) —
    * PURE over the two qualified URIs: fires when the staged mode's
    * stage dir resolves to a DIFFERENT filesystem than the corpus
    * (scheme or authority differ). The default stageDir is
    * driver-relative; against an hdfs/s3a corpus that silently routes
    * every staged byte through the driver's local disk. SetConf:
    * point `graft.ngram.stageDir` at any writable path on the corpus
    * filesystem (the target suggests a corpus-adjacent one). */
  private[graft] def stageFsMismatchAdvisory(corpusUri: java.net.URI,
      stageUri: java.net.URI): Option[graft.Advisory] = {
    def fsId(u: java.net.URI): String =
      Option(u.getScheme).getOrElse("file") +
        "://" + Option(u.getAuthority).getOrElse("")
    val (c, s) = (fsId(corpusUri), fsId(stageUri))
    if (c != s)
      Some(graft.Advisory("dd_ngram_staged", "graft.ngram.stageDir",
        cap = -1L, measured = -1L, bound = -1L,
        s"dd_ngram_staged stages through '$s' while the corpus lives " +
        s"on '$c': every staged byte (3 stage materializations) routes " +
        "through the stage filesystem — for a driver-relative default " +
        "against an hdfs/s3a corpus that means the driver's LOCAL disk, " +
        "not the cluster's. Set graft.ngram.stageDir to a writable " +
        "path on the corpus filesystem.",
        action = graft.AdvisoryAction.SetConf,
        // suggest a SIBLING of the corpus dir, not a child: staging
        // inside the dataset root would feed transient stage churn to
        // corpus-level backup/sync tooling (falls back to a child
        // only when the corpus IS the filesystem root)
        target = {
          val c = new org.apache.hadoop.fs.Path(corpusUri)
          Option(c.getParent)
            .map(p => new org.apache.hadoop.fs.Path(p, "_ngram_staged"))
            .getOrElse(new org.apache.hadoop.fs.Path(c, "_ngram_staged"))
            .toString
        }))
    else None
  }

  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.Dedup")

  /** The measured disk-wall advisories, one per tier (the full ladder
    * is SURVEY §8.4.3e/f — exact ngram ENOSPCs at 5M docs under lz4,
    * tier-0's own 79%-slimmed shuffle one doubling later at 10M, and
    * zstd rescues each at its scale):
    *
    *  - `mhPrefixSlots == 0` above `warnDocs` (default 4M, just under
    *    the measured 5M wall): the exact tier-1 shuffle (candidate
    *    pairs carrying shingle hash arrays) exceeded ~78 GB of per-box
    *    lz4 spill — the run dies with ENOSPC, not slowly. Names the
    *    two measured escapes: tier-0 (identical pair set measured
    *    through 10M docs) or zstd.
    *  - `mhPrefixSlots > 0` above `tier0WarnDocs` (default 8M, just
    *    under the measured 10M wall): tier-0 itself hits the same box's
    *    disk at 2× the corpus; the remaining escape is zstd
    *    (measured: 560.5 s at 10M docs, formula-exact pair count).
    *  - `mhPrefixSlots > 0` above `stagedWarnDocs` (default 16M, just
    *    under the measured 20M wall): past zstd's own wall even the
    *    slim survivor pass out-spills the box — the single-query plan
    *    shape itself is the problem (all exchanges' shuffle files
    *    coexist until job end), so the record's action is
    *    SwitchOperator to `dd_ngram_staged`, the ladder's last rung.
    *
    * Advisory only — the operator's output is unaffected. The record's
    * `measured` is the corpus size and `cap` the warn threshold; the
    * retry action rides the `action`/`target` fields (round 19): each
    * rung is a SetConf of the next measured escape, except the last,
    * which is a SwitchOperator — dispatchable with zero prose parsing
    * (pinned in KnobsSpec's generic-dispatch test). Each rung goes
    * SILENT once its escape is active (round 20, r19 ADVICE): the
    * exact rung once `mhPrefixSlots > 0`, the zstd rung once the
    * session codec is already zstd — tier-0+zstd is MEASURED clean
    * through just under 20M docs, so the band between `tier0WarnDocs`
    * and `stagedWarnDocs` has nothing further to recommend and a
    * retry-until-silent dispatcher converges on every rung. */
  private[graft] def ngramShuffleWarning(nDocs: Long, mhPrefixSlots: Int,
      warnDocs: Long, tier0WarnDocs: Long = 8000000L,
      stagedWarnDocs: Long = 16000000L,
      zstd: Boolean = false): Option[graft.Advisory] =
    if (mhPrefixSlots == 0 && nDocs >= warnDocs)
      Some(graft.Advisory("dd_ngram_jaccard", "graft.ngram.mhPrefixSlots",
        cap = warnDocs, measured = nDocs, bound = -1L,
        s"dd_ngram_jaccard over $nDocs documents with the exact " +
        "candidate shuffle: at 5M docs this tier-1 shuffle exceeded " +
        "78 GB/box of lz4 spill (ENOSPC, SURVEY 8.4.3e). Consider " +
        "graft.ngram.mhPrefixSlots=16 (79% shuffle discard, zero " +
        "measured pair loss through 10M docs) or " +
        "spark.io.compression.codec=zstd.",
        action = graft.AdvisoryAction.SetConf, target = "16"))
    else if (mhPrefixSlots > 0 && nDocs >= stagedWarnDocs)
      Some(graft.Advisory("dd_ngram_jaccard", knob = "",
        cap = stagedWarnDocs, measured = nDocs, bound = -1L,
        s"dd_ngram_jaccard over $nDocs documents with tier-0 " +
        s"(mhPrefixSlots=$mhPrefixSlots): past zstd's own measured wall " +
        "(even the slim survivor pass ENOSPCs under zstd at 20M docs on " +
        "a 72 GB-spill box, SURVEY 8.4.3g) no codec or filter rung " +
        "remains — the single-query plan holds every exchange's shuffle " +
        "files until job end. Switch to ddNgramJaccardStaged / " +
        "dd_ngram_staged: per-job spill bounded at ~1/shards, identical " +
        "pair set (oracle-gated).",
        action = graft.AdvisoryAction.SwitchOperator,
        target = "dd_ngram_staged"))
    else if (mhPrefixSlots > 0 && nDocs >= tier0WarnDocs && !zstd)
      Some(graft.Advisory("dd_ngram_jaccard", "spark.io.compression.codec",
        cap = tier0WarnDocs, measured = nDocs, bound = -1L,
        s"dd_ngram_jaccard over $nDocs documents with tier-0 " +
        s"(mhPrefixSlots=$mhPrefixSlots): the slimmed candidate shuffle " +
        "hit the same ~78 GB/box lz4 spill wall at 10M docs (ENOSPC, " +
        "SURVEY 8.4.3f). Set spark.io.compression.codec=zstd — measured " +
        "to complete at 10M docs with the formula-exact pair set. Past " +
        "that (even the survivor pass ENOSPCs under zstd at 20M docs on " +
        "the same box, SURVEY 8.4.3g), switch to ddNgramJaccardStaged / " +
        "dd_ngram_staged: bounded per-job spill, identical pair set.",
        action = graft.AdvisoryAction.SetConf, target = "zstd"))
    else None

  private[graft] def resolveCap(spark: SparkSession, dir: String, dfCap: Int): Int =
    if (dfCap > 0) dfCap
    else capForDocs(spark, graft.Tables.footerRowCount(spark, dir, "documents"))

  private def capForDocs(spark: SparkSession, nDocs: Long): Int = {
    val factor = confLong(spark, "graft.ngram.dfCapFactor", 8L)
    math.max(64L, factor * math.round(math.sqrt(nDocs.toDouble))).toInt
  }

  /** The ngram candidate pairs BEFORE exact verification — factored out
    * (like [[minhashCandidates]]) so the scale smoke can measure
    * candidate growth against wall-clock growth. */
  private[graft] def ngramCandidates(spark: SparkSession, dir: String,
      dfCap: Int = -1): DataFrame =
    ngramCandidatesFrom(ngramBase(spark, dir), resolveCap(spark, dir, dfCap))

  /** Candidates surviving the tier-0 MinHash-prefix filter — factored
    * out (like [[ngramCandidates]]) so ScaleSmoke can measure the
    * tier-0 discard ratio directly: survivors/candidates is the factor
    * by which the filter slims the array-carrying tier-1 shuffle. */
  private[graft] def ngramTier0Survivors(spark: SparkSession, dir: String,
      slots: Int = 16, minMatch: Int = 2): DataFrame = {
    val base = ngramBase(spark, dir)
    mhPrefixFilter(ngramCandidatesFrom(base, resolveCap(spark, dir, -1)),
      base, slots, minMatch)
  }

  private def ngramBase(spark: SparkSession, dir: String): DataFrame = {
    // ONE corpus pass for the whole operator: scan + ShingleArray,
    // exchanged once on doc_id. The exploded candidate stream below and
    // all four verify branches inside exactVerify read this exchange
    // back (identical subtrees → ReusedExchange), so the expensive
    // shingle pass never re-executes. Two details make that true:
    // the explicit isNotNull(doc_id) matches the filter the verify
    // joins would infer on their side (a single differing conjunct
    // breaks subtree identity and silently disables the reuse) and
    // sits on a SCANNED column, so it pushes into the parquet scan for
    // free; and the coalesce makes `shs` NON-NULLABLE (shingles3 is
    // null only for null text, where the explode dropped the doc
    // anyway — an empty array behaves identically), so no consumer can
    // infer isnotnull(shs) and push the whole ShingleArray expression
    // into the scan as a second-evaluation data filter.
    t(spark, dir, "documents")
      .where(col("doc_id").isNotNull)
      .select(col("doc_id"),
        coalesce(shingles(col("text")), typedLit(Seq.empty[String])).as("shs"))
      .repartition(col("doc_id"))
  }

  private def ngramCandidatesFrom(base: DataFrame, cap: Int): DataFrame =
    ngramPairJoin(ngramPrefix(ngramJoinable(ngramExploded(base), cap)))

  /** The exploded per-shingle stream (doc_id, n, sh) — stage 0 of the
    * candidate pipeline. Factored out (with the three stages below) so
    * [[ddNgramJaccardStaged]] can materialize and hash-shard the exact
    * same plan pieces; composed back in [[ngramCandidatesFrom]] they
    * produce the identical single-query plan (PlanSpec's reuse pins). */
  private def ngramExploded(base: DataFrame): DataFrame = {
    val docs = base.withColumn("n", size(col("shs")))
    // 64-bit shingle hashes as join keys: fixed-width keys halve the
    // shuffle vs strings (measured 2.3×); safe because of step 3.
    // explode_OUTER, deliberately: a plain explode infers a
    // size(shs) > 0 constraint that pushes the whole coalesce(shingles)
    // expression into the scan as a data filter — re-evaluating the
    // shingle pass AND breaking subtree identity with the verify
    // branches (2 scans again). shs is empty only for null-text docs;
    // their single null-shingle row hashes to xxhash64's seed, can
    // only pair null-text docs with each other, and the exact verify
    // (empty arrays → null jaccard) drops any such pair.
    docs.select(col("doc_id"), col("n"),
        explode_outer(col("shs")).as("shStr"))
      .select(col("doc_id"), col("n"), xxhash64(col("shStr")).as("sh"))
  }

  /** df-filtered stream: shingles with 2 ≤ df ≤ cap. Shards cleanly by
    * shingle hash — every row of a given `sh` lands in the same shard,
    * so the per-shard window df equals the global df. */
  private def ngramJoinable(s: DataFrame, cap: Int): DataFrame =
    // df via a window over the shingle key, not a groupBy + join-back:
    // the exploded shingle stream (ShingleArray + explode + xxhash64)
    // is the expensive pass at scale, and the agg+join shape traverses
    // it twice (once per branch); the window computes df on the single
    // exchange the stream needs anyway (~15 s saved of a 42 s run at
    // 40× sf0.1). A df-195k hot key lands in one window partition, but
    // counting 195k rows in one task is noise next to the join it would
    // otherwise explode into — and the cap then drops it.
    s.withColumn("df", count(lit(1)).over(Window.partitionBy("sh")))
      .where(col("df").between(2, cap))

  /** Rarest-first PPJoin prefix (sh, doc_id, n, rrk). Shards cleanly
    * by doc_id — rrk is a per-doc rank over the doc's own joinable
    * shingles, so a doc-sharded window computes the same values.
    *
    * ONE window function, not two (round 22): the original formulation
    * carried the forward rarest-first rank rk (row_number asc) AND the
    * per-doc joinable count m (a second, whole-partition-buffering
    * window pass) only to use them as the suffix length m − rk. The
    * REVERSE rank rrk = row_number over (df desc, sh desc) = m − rk + 1
    * expresses both the prefix cut and the join's positional bound
    * directly: rk ≤ m − ⌈n/2⌉ + 1 ⇔ rrk ≥ ⌈n/2⌉, and
    * 1 + min(m − rk) = min(rrk). Same total order (ties only on 64-bit
    * hash collisions, identical to the old orderBy), so the kept set is
    * identical — and the exact verify makes even a collision-tie
    * reshuffle output-invariant. The plan loses one Window node per
    * join side (the count pass buffered every partition) and the prefix
    * row narrows by the dropped m column through the pair-join
    * exchange and the staged prefix parquet. */
  private def ngramPrefix(joinable: DataFrame): DataFrame = {
    val byDoc = Window.partitionBy("doc_id")
    joinable
      .withColumn("rrk", row_number().over(
        byDoc.orderBy(col("df").desc, col("sh").desc)))
      .where(col("rrk") >= ceil(col("n") / lit(2.0)))
      .select("sh", "doc_id", "n", "rrk")
  }

  /** The prefix self-join → distinct candidate pairs. Shards cleanly by
    * shingle hash: the join key is `sh`, so restricting both sides to
    * one hash shard yields exactly the candidates whose WITNESS shingle
    * falls in that shard — the union over shards is the full candidate
    * set (a pair with witnesses in several shards repeats; the final
    * distinct dedups). */
  private def ngramPairJoin(prefix: DataFrame): DataFrame =
    // PPJoin positional filter: a common shingle at ranks (rk_a, rk_b)
    // bounds the overlap by 1 + min(remaining suffix on either side);
    // pairs whose common prefix shingles all sit too late can never
    // reach the required overlap ⌈(na+nb)/3⌉. Lossless: for a true pair
    // the first common element always satisfies the bound.
    // (callers run these candidates through exactVerify — tier 1 scores
    // on pre-sorted hash arrays with the codegen'd SortedOverlap merge
    // scan, tier 2 recomputes Jaccard on the exact string arrays, so a
    // 64-bit collision can only ADD a candidate, never corrupt output)
    prefix.alias("a").join(prefix.alias("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id") &&
        least(col("a.n"), col("b.n")) * 2 >= greatest(col("a.n"), col("b.n")) &&
        // 1 + min(suffix) with the reverse rank: m − rk + 1 = rrk
        least(col("a.rrk"), col("b.rrk")) >=
          ceil((col("a.n") + col("b.n")) / lit(3.0)))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

  /** Two-tier exact verification of candidate pairs — SHARED by every
    * near-dup path (ngram prefix join, MinHash LSH, the streaming
    * variant), so a threshold or rounding tweak can never diverge
    * between them. Tier 1 scores every candidate with a codegen'd
    * merge scan over pre-sorted 64-bit hash arrays (collisions only ADD
    * candidates); tier 2 recomputes Jaccard on the exact string arrays
    * for the survivors. Output: (doc_a, doc_b, jaccard) at j ≥ 0.5,
    * collision-proof, unordered.
    *
    * Shape note: the four doc-side join branches below (hash arrays as
    * doc_a/doc_b, string arrays as doc_a/doc_b) all hang off ONE
    * explicit exchange of (doc_id, shs) on doc_id — identical subtrees,
    * so the corpus scan + ShingleArray pass executes once and the other
    * three branches are ReusedExchange reads (the same pattern as the
    * band-window reuse in [[minhashCandidates]]). Without it Spark
    * re-reads and re-shingles the corpus once per branch: four extra
    * full passes at 100 TB for a verify whose probe side (the candidate
    * set) is tiny. Callers that derive their CANDIDATE stream from the
    * same arrays pass an already-`repartition(doc_id)`'d frame — the
    * identity projection and double repartition collapse in the
    * optimizer (RemoveNoopOperators + CollapseRepartition), leaving one
    * exchange that candidate generation and verify share: the whole
    * operator then reads the corpus exactly once (pinned in PlanSpec).
    *
    * @param cand candidate pairs (doc_a, doc_b)
    * @param docs (doc_id, shs) — each doc's distinct shingle array
    * @param mhPrefixSlots leading MinHash slots for the optional tier-0
    *   pre-filter (0 = off, the default — see [[mhPrefixFilter]])
    * @param mhPrefixMin matching slots a pair needs to survive tier 0
    */
  private[graft] def exactVerify(cand: DataFrame, docs: DataFrame,
      mhPrefixSlots: Int = 0, mhPrefixMin: Int = 2): DataFrame = {
    val base = docs.select(col("doc_id"), col("shs"))
      .repartition(col("doc_id"))
    val cand0 =
      if (mhPrefixSlots <= 0) cand
      else mhPrefixFilter(cand, base, mhPrefixSlots, mhPrefixMin)
    val hsh = base.select(col("doc_id"), size(col("shs")).as("n"),
      array_sort(transform(col("shs"), xxhash64(_))).as("hs"))
    val tier1 = cand0.select("doc_a", "doc_b")
      .join(hsh.select(col("doc_id").as("doc_a"), col("hs").as("ha"),
        col("n").as("na")), "doc_a")
      .join(hsh.select(col("doc_id").as("doc_b"), col("hs").as("hb"),
        col("n").as("nb")), "doc_b")
      .withColumn("shared", VectorOps.sortedOverlap(col("ha"), col("hb")))
      // two EMPTY shingle sets (both docs null-text) give a 0/0 union —
      // an ANSI divide-by-zero, not a near-dup; their Jaccard is 0. A
      // `when` guard, not a conjunct: predicate order is not a contract
      .withColumn("union_n",
        (col("na") + col("nb") - col("shared")).cast("double"))
      .where(when(col("union_n") === 0, 0.0)
        .otherwise(FastRound.round4(col("shared") / col("union_n"))) >= 0.5)
      .select("doc_a", "doc_b")
    tier1
      .join(base.select(col("doc_id").as("doc_a"), col("shs").as("sa")), "doc_a")
      .join(base.select(col("doc_id").as("doc_b"), col("shs").as("sb")), "doc_b")
      .withColumn("jaccard", FastRound.round4(
        size(array_intersect(col("sa"), col("sb"))) /
          size(array_union(col("sa"), col("sb"))).cast("double")))
      .where(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Tier-0 MinHash-prefix candidate filter (OFF by default — see the
    * `graft.ngram.mhPrefixSlots` knob).
    *
    * Motivation (SURVEY §8.4.7): at 500× the ngram verify's dominant
    * shuffle is tier 1's doc_b join, where every one of ~53M candidate
    * pairs carries doc_a's FULL sorted hash array (~5 KB for a
    * 600-shingle doc) through the exchange. A `slots`-slot MinHash
    * prefix is `8·slots` bytes — at 16 slots, ~37× slimmer — and
    * P(slot match) = J(a, b) exactly (the MinHash property), so
    * requiring ≥ `minMatch` of `slots` matching slots discards the
    * low-Jaccard bulk of the candidate stream BEFORE any full array
    * rides a shuffle; only survivors reach the two exact tiers.
    *
    * The filter is probabilistic, which is why the ngram operator keeps
    * it off by default: with (16, 2) a boundary pair at exactly j = 0.5
    * survives with p = 1 − BinomCDF(1; 16, 0.5) ≈ 0.99974, and the miss
    * probability decays geometrically above the boundary (j = 0.7 →
    * ~2·10⁻⁸); a j = 0.02 pair — the typical PPJoin false candidate,
    * sharing one rare shingle of hundreds — survives with only ~5%.
    * Fixed hash seeds ([[MinHashRow]]) make the outcome deterministic
    * per corpus. The prefix frame hangs off the SAME doc_id exchange as
    * every other verify branch (ReusedExchange — no extra corpus pass),
    * and the doc-side cost is 16 of the 32 slot mins [[MinHashRow]]
    * already computes map-only for the LSH family.
    *
    * NOT applied to the MinHash-LSH path: its candidates collide on a
    * 2-slot band by construction, so a ≥ 2-match requirement is already
    * implied and the extra joins would be pure overhead. */
  private[graft] def mhPrefixFilter(cand: DataFrame, base: DataFrame,
      slots: Int, minMatch: Int): DataFrame = {
    val pf = base.select(col("doc_id"),
      slice(MinHashRow.minhash32_row(col("shs")), 1, slots).as("mh"))
    cand.select("doc_a", "doc_b")
      .join(pf.select(col("doc_id").as("doc_a"), col("mh").as("ma")), "doc_a")
      .join(pf.select(col("doc_id").as("doc_b"), col("mh").as("mb")), "doc_b")
      .where(aggregate(zip_with(col("ma"), col("mb"),
        (a, b) => when(a === b, 1).otherwise(0)), lit(0), _ + _) >= minMatch)
      .select("doc_a", "doc_b")
  }

  /** The 16×2 LSH band hashes of a 32-slot minhash signature — shared
    * between the batch LSH and the streaming variant so their candidate
    * spaces are identical by construction. */
  private[graft] def bandHashCols(sig: Column, bandsOf: Int = 16): Seq[Column] =
    (0 until bandsOf).map(j =>
      hash(element_at(sig, 2 * j + 1), element_at(sig, 2 * j + 2)))

  /** MinHash + LSH near-dup detection. Candidates are approximate
    * (banded minhash collisions) but every candidate is verified with
    * the exact Jaccard — so precision is always 1 and the output equals
    * the exact j ≥ 0.5 pair set whenever banding recall is total. At
    * 16 bands × 2 rows a pair at the j = 0.5 boundary is missed with
    * probability ≤ (1−0.5²)¹⁶ ≈ 1%, and the murmur3 seeds are fixed, so
    * on a given corpus the output is deterministic; the DuckDB oracle
    * is therefore the exact-Jaccard SQL (the ScalaTest spec asserts the
    * same lsh == exact equality at sf0.001).
    *
    * 32 minhashes (murmur3 with 32 seeds) banded 16×2; candidates from
    * band-hash equi-join; exact Jaccard verification on candidates only.
    *
    * Shape note: the signature is a single per-row expression pass
    * over each document's shingle array ([[MinHashRow]] — bit-identical
    * to the [[MinHashAgg]] sketch, pinned by ExpressionParitySpec), so
    * the signature stage is map-only: no explode, no shuffle, no
    * aggregation hash map. The first shuffle in the whole operator is
    * the band-key exchange that the candidate self-join then reuses.
    * (Not nested higher-order lambdas: `transform(.., array_min(
    * transform(..)))` stays interpreted and gets duplicated per band
    * reference by CollapseProject, which made this operator ~40×
    * slower. [[MinHashAgg]] remains the distributed-aggregate form for
    * when shingles arrive as rows, e.g. SQL `minhash32(sh) GROUP BY`.) */
  def ddMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    // ONE corpus pass: the signature/band stream and all four verify
    // branches read the same doc_id exchange back (ReusedExchange), so
    // the scan + ShingleArray pass executes exactly once
    // same base shape as ddNgramJaccardPairs (see the note there for
    // why the filter and the non-nullable coalesce are load-bearing)
    val base = t(spark, dir, "documents")
      .where(col("doc_id").isNotNull)
      .select(col("doc_id"),
        coalesce(shingles(col("text")), typedLit(Seq.empty[String])).as("shs"))
      .repartition(col("doc_id"))
    // the measured band-bucket advisory (round 16): warn post-run
    // when any bucket measurably crossed the cap — the near-verbatim-
    // blob silent-loss case the scaladoc below can only describe
    ensureCapAdvisoryListener(spark)
    // driver-side footer count, stamped into the observation name so
    // the pruned-observation advisory can quote the corpus size (the
    // benign-vs-degenerate dial; one footer read, no scan)
    val nDocs = graft.Tables.footerRowCount(spark, dir, "documents")
    // shared two-tier exact verification (see exactVerify)
    exactVerify(minhashCandidates(base, nDocs = nDocs), base)
      .orderBy("doc_a", "doc_b")
  }

  /** The LSH candidate pairs BEFORE exact verification — factored out
    * so the scale smoke can measure candidate growth against wall-clock
    * growth (the verify cost is candidate-proportional by design).
    *
    * Hot-bucket cap (the band-join analogue of the ngram dfCap): a
    * band bucket with m members emits m(m−1)/2 candidate instances, so
    * a DEGENERATE band hash — e.g. a corpus-wide boilerplate suffix
    * capturing both minhash slots of a band — turns the join quadratic.
    * Measured at 20× sf0.1: 4 buckets over 256 members carried 6.9M of
    * the 7.4M candidate instances while all 5120 true pairs kept
    * colliding in healthy content bands. Buckets larger than
    * `maxBucket` therefore emit nothing; total candidates are bounded
    * by 8·maxBucket·N — linear in the corpus. A true j ≥ 0.5 pair
    * collides in 4 of 16 bands in expectation, so losing a degenerate
    * band leaves recall intact (the lsh == exact spec and the DuckDB
    * oracle pin this at the gate SFs, where no bucket nears the cap);
    * run dd_exact first so giant IDENTICAL-doc clusters never reach
    * the near-dup pass. The residual risk (round 16) is a
    * NEAR-verbatim blob larger than the cap — dd_exact does not
    * collapse it, its members share most minhash slots, so it crosses
    * in ALL its bands at once and its pairs silently lose candidacy.
    * The [[observeCapMetrics]] observation on the pre-filter stream +
    * [[minhashBucketAdvisory]] make that measurable at runtime
    * (max bucket vs cap — fires exactly when a bucket is dropped),
    * pinned in KnobsSpec on a near-verbatim blob where the drop is
    * demonstrated against the found-at-default control. The cap is a
    * deterministic function of the corpus, so the operator stays
    * oracle-checkable. Default mirrors the streaming variant's
    * per-bucket member cap. */
  private[graft] def minhashCandidates(docs: DataFrame,
      maxBucket: Int = -1, nDocs: Long = -1L): DataFrame = {
    val cap =
      if (maxBucket > 0) maxBucket
      else confLong(docs.sparkSession, "graft.minhash.maxBucket", 1024L).toInt
    // per-row sketch over the doc's own shingle array: map-only, the
    // same 32-slot signature the streaming variant projects
    val sigs = docs.select(col("doc_id"),
      MinHashRow.minhash32_row(col("shs")).as("sig"))
    // the band index is BAKED into the hash's high bits (the simhash
    // band-key treatment): hash() is a 32-bit murmur3, band_idx < 16,
    // so idx·2³² + hash is a bijection of (band_idx, band_hash) — the
    // window partitioning and self-join below run on ONE long instead
    // of two ints (one hash, narrower exchange row; A/B'd). The
    // STREAMING variant keeps explicit (band_idx, band_hash) state
    // keys from the same bandHashCols — output-pair parity is what the
    // specs pin, not internal key encoding.
    val bands = sigs.select(col("doc_id"),
        explode(array(bandHashCols(col("sig")).zipWithIndex.map {
          case (h, j) => h.cast("long") + lit(j.toLong << 32)
        }: _*)).as("band_key"))
    // window count (not a separate agg + semi-join): one exchange on
    // the band key that the self-join below then reuses for both sides
    val kept = bands
      .withColumn("bucket_m", count(lit(1)).over(
        Window.partitionBy("band_key")))
      // measured-bucket observation BEFORE the drop filter: every row
      // carries its bucket's member count, so max(bucket_m) vs cap is
      // free and the listener advisory fires on the measured quantity
      // (max-only metrics — the window re-runs on both self-join
      // sides above the reused band exchange)
      .transform(observeCapMetrics(_, bucketMetricsPrefix,
        col("bucket_m"), cap, nDocs))
      .where(col("bucket_m") <= cap)
      .drop("bucket_m")
    kept.alias("a").join(kept.alias("b"),
        col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** SimHash near-dup: frequency-weighted 64-bit simhash over token
    * xxhash64 values; candidates by 4×16-bit chunk equi-join; verified
    * by Hamming distance. Rows-only driver check (hash-dependent).
    *
    * Shape note: bit-majority is computed by exploding tokens and taking
    * 64 `sum(±1)` aggregates in one codegen'd groupBy (bit b of the
    * simhash is set iff more than half the token hashes have bit b set,
    * i.e. iff the signed sum is > 0) — not by a 64-step interpreted
    * `aggregate(sequence(0,63), filter(...))` pass per document.
    *
    * Band construction is CORPUS-SIZE-SWITCHED (both shapes from the
    * general Manku/Jain/Sarma WWW'07 block design in [[simhashBands]]):
    *
    *  - N ≤ [[simhashWideSwitch]]: 4 tables keyed by one 16-bit chunk.
    *    Pigeonhole-complete for Hamming ≤ 3 (6 differing bits can touch
    *    all 4 chunks, so recall at the d ≤ 6 cut is partial — measured
    *    0.93/0.92 vs exact Jaccard at the gate SFs, pinned in
    *    FunctionsSpec). Expected bucket size N/2¹⁶ → candidate
    *    instances ~N²/2¹⁵: fine to ~10⁷ docs, inherently quadratic
    *    past that.
    *  - N > [[simhashWideSwitch]]: 8 blocks of 8 bits keyed on 4-block
    *    combinations — C(8,4) = 70 tables of 32-bit keys.
    *    Pigeonhole-complete for Hamming ≤ 4 (≤ 4 differing bits touch
    *    ≤ 4 blocks, leaving a 4-subset intact — a STRONGER guarantee
    *    than the small plan's d ≤ 3); expected bucket size N/2³² keeps
    *    the self-join linear to ~10¹⁰ docs. The 70-way band fan-out is
    *    a map-side, linear cost — the price of removing the quadratic
    *    candidate term. Measured at the gate SFs: recall vs exact
    *    Jaccard 0.93/0.96 (≥ the 0.92 floor on both constructions,
    *    pinned in FunctionsSpec) with ~6× fewer candidates than the
    *    chunk join even at 5k docs; the candidate gap widens as N²/2¹⁵
    *    vs N·70/2³²·N. Outputs differ only in which d ∈ [4,6] pairs the
    *    bands surface (each construction finds some the other misses),
    *    which is why the switch — not the wide design alone — keeps the
    *    small-corpus output byte-stable. Sharding by a coarse content
    *    key (lang, source) stacks with either shape.
    *
    * The Hamming ≤ 6 cut is re-verified exactly on every candidate in
    * both shapes, so the switch affects recall only, never precision.
    * The minhash operator remains the default near-dup path at 100 TB;
    * simhash is the cheap high-precision screen. */
  def ddSimhash(spark: SparkSession, dir: String): DataFrame =
    ddSimhash(spark, dir,
      wideBands = graft.Tables.footerRowCount(spark, dir, "documents")
        > simhashWideSwitch(spark))

  /** Above this corpus size the 16-bit chunk buckets average ≥ ~150
    * members (N/2¹⁶) and the chunk self-join's ~N²/2¹⁵ candidate term
    * starts to dominate — switch to the wide (8, 4) block tables.
    * Tunable via `graft.simhash.wideSwitch` (see [[confLong]] note). */
  private[graft] def simhashWideSwitch(spark: SparkSession): Long =
    confLong(spark, "graft.simhash.wideSwitch", 10L * 1000 * 1000)

  private[graft] def ddSimhash(spark: SparkSession, dir: String,
      wideBands: Boolean): DataFrame = {
    // Wide-construction certificate (pigeonhole, driver-observable): an
    // instance can only be emitted by the (8, 4) tables if some 4-subset
    // of its 8-bit blocks is intact, i.e. ≥ 4 blocks of sig_xor are
    // zero. A regression that silently swaps the scale path back to the
    // (16, 1) chunk tables emits d ∈ [5,6] instances whose bits spread
    // over 6 blocks (one 16-bit chunk intact = only 2 intact 8-bit
    // blocks), so the assert turns that plan swap into a driver-visible
    // crash of the rows-only row rather than an unnoticed recall change.
    // Evaluated per pair INSTANCE, map-side, BEFORE the distinct: the
    // invariant holds instance-wise (the emitting table's 4-block subset
    // is intact by construction), the checked bits are already in
    // sig_xor's registers, and the dedup shuffle stays at the original
    // 3 columns — carrying sig_xor through the distinct instead measured
    // +0.3 s on the sf0.1 bench for zero extra guarantee.
    // SWAR zero-byte count over the low 7 bytes in 6 bitwise ops + one
    // bit_count (vs the previous 8-way shift/mask/compare reduce, ~4×
    // the codegen ops on the hot pair-instance stream): for byte b,
    // (b & 0x7F) + 0x7F carries into bit 7 iff the low 7 bits are
    // non-zero, OR b covers bit 7 itself, so after the OR bit 7 is set
    // iff b ≠ 0 — invert and mask the marker bits. Per-byte sums are
    // ≤ 0xFE with a zeroed top byte, so no cross-byte carries and no
    // ANSI overflow. The top byte can't join the trick (its marker
    // would need bit 63 arithmetic that overflows under ANSI) — one
    // explicit compare covers it.
    val low7 = lit(0x007f7f7f7f7f7f7fL)
    val intactBlocks = bit_count(bitwise_not(
        (col("sig_xor").bitwiseAND(low7) + low7)
          .bitwiseOR(col("sig_xor")).bitwiseOR(low7))
        .bitwiseAND(lit(0x0080808080808080L))) +
      when(shiftrightunsigned(col("sig_xor"), 56) === 0, 1).otherwise(0)
    val certified =
      if (!wideBands) col("hamming")
      else coalesce(assert_true(intactBlocks >= 4,
          concat(lit("simhash wide-band invariant violated: only "),
            intactBlocks, lit(" intact blocks for pair ("),
            col("doc_a"), lit(","), col("doc_b"), lit(")"))),
        col("hamming"))
    simhashJoin(simhashScaledBands(simhashDocs(spark, dir), wideBands))
      .select(col("doc_a"), col("doc_b"), certified.as("hamming"))
      // filter BEFORE the distinct: the Hamming cut is computable per
      // pair instance, so the dedup shuffle only carries survivors
      .where(col("hamming") <= 6)
      .distinct()
      // the gated dump re-certifies the cut in-query: `hamming` is
      // emitted through assert_true, so a regression that drops or
      // loosens the filter turns the driver's rows-only row into a
      // crash (err != null) instead of silently shipping far pairs —
      // the invariant is driver-observable, not only ScalaTest-pinned.
      // Evaluated on output survivors only: free.
      .select(col("doc_a"), col("doc_b"),
        coalesce(assert_true(col("hamming").between(0, 6),
            concat(lit("simhash invariant violated: hamming "),
              col("hamming"), lit(" outside [0,6]"))),
          col("hamming")).as("hamming"))
      .orderBy("doc_a", "doc_b")
  }

  private def simhashScaledBands(docs: DataFrame,
      wideBands: Boolean): DataFrame =
    if (wideBands) simhashBands(docs, 8, 4) else simhashBands(docs, 16, 1)

  /** (doc_id, simhash) — the per-row signature straight off the text:
    * map-only, no explode + groupBy shuffle of every token hash
    * ([[SimHashRow]] tokenizes and hashes internally, bit-identical to
    * simhash64(xxhash64(tok)) over the exploded stream). Null texts are
    * filtered on the INPUT column (mirroring the old explode semantics:
    * no rows, no signature) — filtering on the signature itself would
    * push the predicate below the projection and evaluate the expensive
    * expression twice per row. The tiny repartition (16 bytes/doc) is
    * the materialization point the band self-join reuses — without it
    * each join side would recompute the whole signature pass (the
    * aggregate's groupBy exchange used to play this role). The
    * partition count is EXPLICIT: AQE would coalesce a 1.6 MB exchange
    * to one partition by size, serializing the compute-dense band
    * fan-out + self-join it feeds (the `spread` problem — see
    * Similarity's scaladoc). The coalesce makes the signature attribute
    * NON-NULLABLE (the default never fires behind the text filter):
    * otherwise the join infers isnotnull(simhash), pushes it through
    * the projection, and the scan evaluates the whole signature a
    * second time as a data filter — measured 1.6× on this operator. */
  private def simhashDocs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .where(col("text").isNotNull)
      .select(col("doc_id"),
        coalesce(SimHashRow.simhash64_row(col("text")), lit(0L)).as("simhash"))
      .repartition(spark.sessionState.conf.numShufflePartitions, col("doc_id"))

  private def simhashChunk(bits: Int)(j: Int): Column =
    shiftright(col("simhash"), j * bits).bitwiseAND(lit((1L << bits) - 1))

  /** (doc_id, simhash, key) band rows — the general Manku/Jain/Sarma
    * block design: the 64-bit signature splits into 64/`chunkBits`
    * blocks; one table per `chunksPerKey`-subset of blocks, keyed by
    * the subset's bit concatenation WITH the table index baked into
    * the key's high bits (see below). A Hamming-d pair collides in
    * SOME table whenever its differing bits leave one subset intact —
    * guaranteed for d ≤ blocks − chunksPerKey (pigeonhole). Default
    * plan: (16, 1) = 4 tables of 16-bit keys; scale plan: (8, 4) =
    * C(8,4) = 70 tables of 32-bit keys. */
  private[graft] def simhashBands(docs: DataFrame, chunkBits: Int,
      chunksPerKey: Int): DataFrame = {
    // the baked-key encoding's preconditions, EXPLICIT (r17 ADVICE): a
    // future (chunkBits, chunksPerKey) whose subset keys reach bit 56,
    // or whose table count overflows the 8 high bits, would silently
    // merge distinct tables' buckets and inflate candidates — fail the
    // construction instead. Both shipped constructions (16,1)/(8,4)
    // satisfy this with room.
    require(chunkBits * chunksPerKey <= 56,
      s"simhashBands: subset keys need chunkBits*chunksPerKey <= 56 " +
        s"bits to coexist with the baked table index, got " +
        s"$chunkBits*$chunksPerKey")
    val nTables =
      (0 until 64 / chunkBits).combinations(chunksPerKey).size
    require(nTables <= (1 << (64 - 56)),
      s"simhashBands: $nTables tables overflow the ${64 - 56} high bits " +
        "reserved for the baked table index")
    val chunk = simhashChunk(chunkBits) _
    // the table index is BAKED into the key's high bits (subset keys
    // are < 2^(chunkBits*chunksPerKey) ≤ 2^32, table count ≤ 70 < 2^7,
    // so tbl<<56-safe at both constructions): the band self-join then
    // equi-joins ONE long instead of (tbl, key) — one hash over one
    // column and an 8-bytes-narrower row through the 70·N-row wide
    // exchange. Semantically identical: (tbl, key) pairs and the baked
    // longs are in bijection.
    val keys = (0 until 64 / chunkBits).combinations(chunksPerKey)
      .zipWithIndex
      .map { case (s, i) =>
        s.tail.foldLeft(chunk(s.head))(
          (k, j) => k * lit(1L << chunkBits) + chunk(j)) +
          lit(i.toLong << 56) }
      .toSeq
    docs.select(col("doc_id"), col("simhash"),
      explode(array(keys: _*)).as("key"))
  }

  /** Band-table self-join → (doc_a, doc_b, hamming, sig_xor) pair
    * instances — the shape both constructions share; the Hamming cut
    * downstream is exact, so band choice affects recall only, never
    * precision. `sig_xor` (functionally determined by the pair) rides
    * along so the wide dump can re-derive its pigeonhole certificate. */
  private def simhashJoin(bands: DataFrame): DataFrame = {
    val xor = col("a.simhash").bitwiseXOR(col("b.simhash"))
    bands.alias("a").join(bands.alias("b"),
        col("a.key") === col("b.key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(xor).as("hamming"), xor.as("sig_xor"))
  }

  /** Distinct candidate pairs BEFORE the Hamming verify — factored out
    * (like [[minhashCandidates]]) so the scale smoke can measure the
    * two band constructions' candidate growth against each other. */
  private[graft] def simhashCandidates(spark: SparkSession, dir: String,
      wideBands: Boolean): DataFrame =
    simhashJoin(simhashScaledBands(simhashDocs(spark, dir), wideBands))
      .select("doc_a", "doc_b")
      .distinct()

  /** Embedding-cosine near-dup: top-40 most similar vector pairs,
    * CORPUS-SIZE-ROUTED (the round-6 verdict's "one query a user could
    * naively run at 100 TB" — no longer):
    *
    *  - N ≤ [[embedCosineExactMax]]: exact broadcast nested loop. N²/2
    *    dot products distributed over the cluster; the broadcast side
    *    is ≤ ~34 MB of packed vectors at the threshold, and at 65k
    *    vectors the pair stream is ~2·10⁹ dots — cluster-trivial,
    *    single-node-tolerable, and every pair is scored so the result
    *    is exact (DuckDB oracle-gated at the test SFs).
    *  - N > [[embedCosineExactMax]]: bucketed approximate route over
    *    the SAME IVF assignment ssIvfTopK uses (√N deterministic
    *    centroids, hash-aggregated topk(1) cosine assignment —
    *    Similarity.ivfParts):
    *    pairs are scored only within a cluster, one equi-join on the
    *    cluster id, global top-40 by TakeOrdered. Work drops from N²/2
    *    to ~N·√N/2 scored pairs distributed on the cluster key, at the
    *    usual blocking trade: a true top pair split across clusters is
    *    missed (near-identical vectors land in the same Voronoi cell
    *    unless they straddle a boundary — FunctionsSpec forces this
    *    route at gate SF and requires every planted near-dup pair in
    *    the top-40, plus the mega-cell blob case below).
    *
    * MEASURED bucketed-route quality (EmbedRecallSmoke, SURVEY §8.4.8;
    * 12k planted true pairs per run, SCALE-STABLE across 0.2M/0.4M/1M
    * vectors). WITHOUT boundary probing (probeMargin = 0): pair-level
    * miss ≈ 0.02–0.04 at cos ≥ 0.9995, ≈ 0.06–0.09 at cos ≈ 0.9985,
    * ≈ 0.15–0.20 at cos ≈ 0.99, ≈ ⅓ at cos ≈ 0.97. Misses are
    * geometric, not random: a pair whose base sits in the bottom
    * margin decile (top-2 centroid cosine gap ≤ ~0.004 — ON the
    * Voronoi boundary) misses at ~0.46 while the top decile misses at
    * ~0.02, and interior near-verbatim pairs at < 0.005. That geometry
    * is why the DEFAULT boundary multi-probe (probeMargin = 0.01, see
    * [[graft.functions.Similarity.ivfProbedParts]]) works: replicating
    * the 22% of vectors nearest a boundary into their second cell
    * drops the measured miss to 0 of 2000 at cos ≥ 0.9996, 7/2000 at
    * 0.9985, 0.054 at 0.99 (0.4M through 2M vectors). The probe's
    * COST is the within-cell replication squared on the pair-scoring
    * term (~1.48×), diluted by the margin-invariant assignment pass:
    * measured ~0% at the 2k-vector gate, +12% at 0.4M, +26% med at
    * 2M, +35–37% at 4M (SURVEY §8.4.8b pricing table) — growing with
    * the pair-join share toward ~+50% as cells grow with √N.
    * Even unprobed, the top-40 OPERATOR contract held 39/40 (0.2M) and
    * 40/40 (0.4M) against the exact route at 224× less wall. The
    * probed pair set covers every pair sharing any (cluster, shard) —
    * the shard-aware defer in [[scoreOnceCond]] guarantees it — which
    * is a superset of the unprobed set UNLESS the probe's ~1.22× row
    * replication pushes a mega-cell's population across a cellCap
    * multiple and the re-shard splits a formerly co-resident pair
    * (only cells already past the cap — 4·√N by default, §8.4.8b/c —
    * can be affected, and a
    * mega-cell's pairs are near-uniform by construction).
    *
    * Zero-norm vectors are excluded in both routes (undefined cosine;
    * NaN would top the ranking), mirrored in the oracle. */
  def ddEmbedCosine(spark: SparkSession, dir: String): DataFrame =
    ddEmbedCosine(spark, dir, embedCosineExactMax(spark))

  /** Exact-route ceiling: 2¹⁶ vectors keeps the broadcast ≤ ~34 MB and
    * the full pair scoring ≤ ~2·10⁹ dots — past that the N² term is a
    * cluster-killer and the bucketed route takes over.
    * Tunable via `graft.embedCosine.exactMax` (see [[confLong]] note). */
  private[graft] def embedCosineExactMax(spark: SparkSession): Long =
    confLong(spark, "graft.embedCosine.exactMax", 1L << 16)

  private[graft] def ddEmbedCosine(spark: SparkSession, dir: String,
      exactMax: Long, maxCell: Long = -1L): DataFrame = {
    val nVecs = graft.Tables.footerRowCount(spark, dir, "embeddings")
    // a separate knob, NOT exactMax: forcing the bucketed route with
    // exactMax = 0 must not also zero the mega-cell shard cap
    val cellCap =
      if (maxCell > 0) maxCell
      else confLong(spark, "graft.embedCosine.maxCell",
        embedCosineMaxCellDefault(nVecs))
    embedRouteAdvisory(nVecs, exactMax).foreach(graft.Graft.advise(spark, _, log))
    embedCapAdvisory(nVecs, exactMax, cellCap).foreach(graft.Graft.advise(spark, _, log))
    // the bucketed route's assignment shares ivfParts' per-vector
    // aggregate shape — same sort-fallback spill regime at frontier N
    if (nVecs > exactMax)
      Similarity.sortFallbackAdvisory(spark, nVecs, op = "dd_embed_cosine")
        .foreach(graft.Graft.advise(spark, _, log))
    if (nVecs <= exactMax) {
      val e = t(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("nrm", VectorOps.l2norm(col("v")))
        .where(col("nrm") > 0)
      // the left side is repartitioned by CPU count: the nested-loop join
      // does O(N) dot products per input row, so scan-bytes-sized
      // parallelism (one ~task for a 20 MB file) would serialize it
      e.repartition(spark.sparkContext.defaultParallelism)
        .alias("a").join(broadcast(e.alias("b")), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          FastRound.round4(VectorOps.dot(col("a.v"), col("b.v")) /
            (col("a.nrm") * col("b.nrm"))).as("cos"))
        .orderBy(col("cos").desc, col("vec_a"), col("vec_b"))
        .limit(40)
    } else {
      // Mega-cell guard (the hot-bucket quadratic, embed edition):
      // cells are ~√N in expectation EVEN on clustered corpora, because
      // centroids are data-sampled — a dense region contributes
      // proportionally more centroids. The exception is EXACT-duplicate
      // blobs (failed encodes, constant embeddings): identical vectors
      // score cos = 1.0 against their identical local centroids, every
      // tie breaks to the same minimum c_id, and the whole blob lands
      // in ONE cell of size m emitting m²/2 pairs. Cells over `maxCell`
      // members are therefore hash-split into ⌈m/maxCell⌉ shards and
      // pairs score within a shard only — per-cell work is bounded by
      // ~m·maxCell and the corpus total by ~N·maxCell (linear). The
      // trade: cross-shard pairs of a mega-cell are not scored (a
      // fraction ~1−1/shards), graceful for top-40 mining since a
      // mega-cell is near-uniform by construction — every shard is
      // full of its top pairs (pinned in FunctionsSpec on a 300-dup
      // blob). Cells under the cap get shards = 1: behavior unchanged.
      // The MEASURED-cell advisory listener (round 16) complements the
      // N-derived embedCapAdvisory above: it fires post-run from the
      // observation riding the sharded stream whenever a real cell
      // crossed the cap — the skewed-corpus case 4·√N cannot see.
      ensureCapAdvisoryListener(spark)
      val a = embedCells(spark, dir, cellCap, nVecs)
      a.alias("a").join(a.alias("b"),
          scoreOnceCond(a.columns.contains("other")))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          FastRound.round4(VectorOps.dot(col("a.v"), col("b.v")) /
            (col("a.nrm") * col("b.nrm"))).as("cos"))
        .orderBy(col("cos").desc, col("vec_a"), col("vec_b"))
        .limit(40)
        // rows-only gate hardening (as in ddSimhash): the dumped rows
        // re-certify pair orientation and that every emitted score is a
        // real cosine — |cos| ≤ 1 after round4 (zero norms are filtered,
        // so no NaN/Inf can reach here) and vec_a < vec_b from the join.
        // A regression in either crashes the driver dump visibly.
        // Evaluated on the 40 surviving rows only: free.
        .select(
          coalesce(assert_true(col("vec_a") < col("vec_b"),
              lit("embed invariant violated: vec_a >= vec_b")),
            col("vec_a")).as("vec_a"),
          col("vec_b"),
          coalesce(assert_true(col("cos").between(-1d, 1d),
              concat(lit("embed invariant violated: |cos| > 1: "), col("cos"))),
            col("cos")).as("cos"))
    }
  }

  /** The bucketed route's score-exactly-once join condition over the
    * `a`/`b` aliases of [[embedCells]] output. Unprobed: plain
    * same-(cluster, shard) with `vec_id` ordering. Under boundary
    * multi-probe a pair can co-reside in BOTH its cells; score it in
    * the min-valued common cell WHERE IT IS SCORABLE (both sides
    * compute the same answer — deterministic, no distinct needed, so
    * the scored stream still flows straight into TakeOrdered). With
    * ≤2 cells per vector, "defer to a smaller common cell" is pure
    * scalar logic: a smaller common cell exists iff both sides' OTHER
    * cell is the same one and sorts below this one — no array
    * allocation per candidate pair (the array_intersect form measured
    * 2.7× on the operator at 1M vectors).
    *
    * The `otherShard` conjunct (round 13) makes the defer SHARD-AWARE:
    * if the smaller common cell is a hash-split mega-cell and the pair
    * lands in different shards there, it is NOT scorable there, so
    * this cell must keep it — without that term a pair co-resident in
    * a (cluster, shard) here but split in its other, smaller cell was
    * skipped in both and silently lost, and duplicate blobs (the very
    * thing mega-cells are made of) are where that bites. With it, a
    * pair is scored exactly once iff it shares ANY (cluster, shard):
    * in its min common cell when same-shard there, else here.
    *
    * Null-safe equality (<=>), NOT ===: an unreplicated b side has
    * other = null, and (long === null) is SQL-null, which would null
    * the whole conjunction and silently DROP a pair that must be
    * scored; (5 <=> null) is plain false. The leading isNotNull makes
    * the both-null case (neither side replicated, where
    * null <=> null = true) short out to false before the <=> runs.
    * When `a.other <=> b.other` holds non-null, both otherShards are
    * non-null too (computed whenever other is), so <=> on them is
    * exact same-shard-in-the-other-cell. */
  private[graft] def scoreOnceCond(probed: Boolean): Column = {
    val base = col("a.cluster") === col("b.cluster") &&
      col("a.shard") === col("b.shard") &&
      col("a.vec_id") < col("b.vec_id")
    if (probed)
      base && !(col("a.other").isNotNull &&
        (col("a.other") <=> col("b.other")) &&
        col("a.other") < col("a.cluster") &&
        (col("a.otherShard") <=> col("b.otherShard")))
    else base
  }

  /** The §8.4.8 route advisory: when the corpus size routes the top-40
    * mining onto the bucketed path, log what that buys and costs in
    * MEASURED terms, so a 100 TB operator learns the quality trade from
    * the logs rather than the source. Advisory only — the routing
    * itself is the documented default. */
  private[graft] def embedRouteAdvisory(nVecs: Long,
      exactMax: Long): Option[graft.Advisory] =
    if (nVecs > exactMax)
      Some(graft.Advisory("dd_embed_cosine", "graft.embedCosine.exactMax",
        cap = exactMax, measured = nVecs, bound = -1L,
        s"dd_embed_cosine over $nVecs vectors routes BUCKETED " +
        s"(exactMax=$exactMax): pairs score within IVF cells only. " +
        "Measured pair-level miss (scale-stable through 1M vectors, " +
        "SURVEY 8.4.8) under the default boundary multi-probe " +
        "(graft.embedCosine.probeMargin=0.01): 0/2000 planted pairs at " +
        "cos>=0.9996 through 20M vectors under the corpus-aware cell cap " +
        "(SURVEY 8.4.8c/8.4.8d — the 16384 cap ceiling binds past ~16.8M " +
        "vectors but measures loss-free through ~20M; a separate advisory " +
        "quantifies the measured curve beyond), ~5-7% at cos~0.99; top-40 " +
        "contract measured 39-40/40 vs the exact route. The margin is " +
        "a measured dial (SURVEY 8.4.8b: 0.02/0.03 buy the ~0.99 tier " +
        "down to ~3%/2.7% for +15%/+31% wall); probeMargin=0 reverts " +
        "to single-cell assignment (~2-4% miss at cos>=0.9995). For " +
        "exhaustive pair mining raise graft.embedCosine.exactMax " +
        "knowingly (N^2/2 dot products).",
        // Observe, not RaiseKnob: the bucketed route is the operator
        // WORKING as designed at this N — auto-raising exactMax to
        // `measured` would re-run N^2/2 dot products unknowingly, the
        // opposite of what the "knowingly" in the prose demands
        action = graft.AdvisoryAction.Observe, target = ""))
    else None

  /** CORPUS-AWARE mega-cell cap default (round 14; measured, SURVEY
    * §8.4.8b): `max(4096, 4·√N)`, ceilinged at 16384.
    *
    * The cap is really a per-task PAIR budget — a (cluster, shard)
    * join partition does ~maxCell²/2 scorings in ONE task — so it must
    * stay bounded; but the §8.4.8b 4M-vector ladder showed the old
    * FIXED 4096 starts costing real pairs exactly where corpora get
    * interesting: IVF cells average ~1.22·√N members post-replication,
    * and once the data-sampled tail crosses the cap (measured onset at
    * 4M vectors, cap ≈ 1.7× the average cell) shard-splits cost
    * 1–4/2000 planted pairs at near-verbatim tiers — silently, while
    * the route advisory still promised zero miss. 4·√N keeps the cap
    * at ≈ 3.3× the expected post-replication cell, comfortably above
    * the measured tail (the 4M ladder re-measured 0/2000 at the
    * near-verbatim tiers under this default — §8.4.8c).
    *
    * The 16384 ceiling is the pair-budget line: 16384²/2 ≈ 1.3·10⁸
    * scorings ≈ low minutes in one task at the measured ~1M-scoring/s
    * task throughput — 16× the proven-fine 4096 budget and still ~15×
    * under the 2·10⁹-scoring task observed pinned for 40+ minutes at
    * 500× (the pathology the cap exists to prevent). It binds at
    * 4·√N > 16384 ⇔ N ≳ 16.8M vectors; past that the contract
    * degrades along the MEASURED §8.4.8d ladder (20M-vector corpus,
    * consistent with the 4M onset in cap/mean-cell units): loss 0
    * while the ceiling stays ≥ ~2.3× the mean post-replication cell
    * (ceiling-equivalent N ≈ 30M; N ≈ 20M measured directly), onset
    * ~0.05–0.15% near-verbatim at ~2.0× (≈ 40M), ~0.2–0.5% at ~1.7×
    * (≈ 54M), ~4% at ~1.4× (≈ 80M), ~24% at ~1.0× (≈ 145M) — and
    * [[embedCapAdvisory]] says so at runtime. */
  private[graft] def embedCosineMaxCellDefault(nVecs: Long): Long =
    math.min(16384L, math.max(4096L, embedCosineMaxCellSizing(nVecs)))

  /** The UNCAPPED zero-miss sizing `4·√N` — the single source both
    * [[embedCosineMaxCellDefault]] (floor 4096 / ceiling 16384 around
    * it) and [[embedCapAdvisory]] (fires when the resolved cap sits
    * below it) derive from, so a retune of the formula cannot
    * desynchronize the default from the advisory (r14 advisory). */
  private[graft] def embedCosineMaxCellSizing(nVecs: Long): Long =
    4L * math.round(math.sqrt(nVecs.toDouble))

  /** Cap-binding advisory (round 14, closing the r13 finding): fires
    * when the bucketed route runs with a cell cap BELOW the measured
    * zero-miss sizing ([[embedCosineMaxCellDefault]] uncapped, 4·√N) —
    * i.e. the 16384 pair-budget ceiling binds (N ≳ 16.8M) or the
    * operator pinned `maxCell` under the corpus-aware default. Without
    * it a 10M-vector operator read an advisory promising a zero-miss
    * contract the fixed cap no longer delivered, and nothing at
    * runtime said the cap was binding. */
  private[graft] def embedCapAdvisory(nVecs: Long, exactMax: Long,
      cellCap: Long): Option[graft.Advisory] = {
    val target = embedCosineMaxCellSizing(nVecs)
    if (nVecs > exactMax && cellCap < target)
      Some(graft.Advisory("dd_embed_cosine", "graft.embedCosine.maxCell",
        cap = cellCap, measured = target, bound = -1L,
        s"dd_embed_cosine cell cap $cellCap is BELOW the measured " +
        s"zero-miss sizing 4*sqrt(N) = $target for this corpus " +
        s"($nVecs vectors): IVF cells crossing the cap are hash-split " +
        "and cross-shard pairs are not scored. Measured cap ladder at " +
        "20M vectors (SURVEY 8.4.8d; the 4M onset 8.4.8b agrees in " +
        "cap/mean-cell units): near-verbatim loss is 0 while the cap " +
        "stays >= ~2.3x the mean post-replication cell (the 16384 " +
        "ceiling through N ~30M), onset ~0.05-0.15% at ~2.0x (ceiling " +
        "at N ~40M), ~0.2-0.5% at ~1.7x (~54M), ~4% at ~1.4x (~80M), " +
        "~24% at ~1.0x (~145M). Raise " +
        "graft.embedCosine.maxCell knowingly (per-task pair budget " +
        "~maxCell^2/2 scorings, ~1M scorings/s/task) or accept the " +
        "measured loss.",
        action = graft.AdvisoryAction.RaiseKnob, target = target.toString))
    else None
  }

  /** Name PREFIX of the observation riding the bucketed route's
    * sharded cell stream ([[Similarity.shardCells]] / the unprobed
    * window path in [[embedCells]]). The full name is scoped by the
    * observed subtree's semanticHash plus the cap: Spark rejects
    * duplicate observation names on DIFFERENT plans
    * (DUPLICATED_METRICS_NAME), so a composite query unioning two
    * bucketed routes over different corpora must get distinct names —
    * while identical constructions (self-join sides, a re-built
    * route whose plan the KnobsSpec route-flip pins compare with
    * `sameResult`) must KEEP the same name, or the pins and the
    * duplicate-allowance for identical plans both break. The
    * semanticHash gives exactly that equivalence. */
  private[graft] val cellMetricsPrefix = "graft.embedCosine.cellStats"

  /** Attach the MEASURED cell-distribution observation (round 16,
    * closing the r15 lead finding): every row of the sharded stream
    * carries its cell's post-replication member count (`cnt`), so a
    * CollectMetrics here costs nothing — no extra pass, no exchange —
    * and yields the PHYSICAL loss dial the §8.4.8d analysis names:
    * the largest measured cell vs the cap. [[embedCapAdvisory]] keys
    * on the N-derived `4·√N` sizing and is silent on a SKEWED corpus
    * whose mega-cell crosses the cap while `cap ≥ 4·√N` — exactly the
    * silent-loss class this observation closes.
    *
    * Only merge-idempotent aggregates (max) ride the observation: the
    * subtree can execute more than once inside one query (self-join
    * sides above a reused exchange re-run anything above the exchange,
    * e.g. the unprobed window path), and a sum/count would silently
    * double where a max cannot. */
  private[graft] def observeCellMetrics(df: DataFrame, cellCap: Long,
      nRows: Long = -1L): DataFrame =
    observeCapMetrics(df, cellMetricsPrefix, col("cnt"), cellCap, nRows)

  /** Name PREFIX of the [[minhashCandidates]] band-bucket observation
    * — the minhash analogue of [[cellMetricsPrefix]] (round 16): a
    * band bucket over `graft.minhash.maxBucket` is DROPPED, and while
    * scattered degenerate bands are harmless (a true pair collides in
    * ~4 of 16 bands), a NEAR-VERBATIM blob larger than the cap — the
    * one thing `dd_exact` does NOT collapse — crosses in ALL its
    * bands and its pairs silently lose candidacy. Same machinery,
    * same listener, own advisory. */
  private[graft] val bucketMetricsPrefix = "graft.minhash.bucketStats"

  /** The shared cap-observation shape: max-only metrics (see
    * [[observeCellMetrics]]'s re-execution note) under a name scoped
    * by the observed subtree's semanticHash + cap (see
    * [[cellMetricsPrefix]]'s composability note).
    *
    * Known corner, measured (round 16), GUARDED (round 17): when the
    * query's WHOLE result is empty, AQE's empty-relation propagation
    * replans the remainder to an EmptyRelation and the CollectMetrics
    * node is pruned with it — `observedMetrics` then has nothing to
    * deliver, so a fully-degenerate run (every candidate dropped)
    * cannot advise with MEASURED numbers. The listener detects that
    * shape (observation declared in the analyzed plan, absent from
    * `observedMetrics`) and fires [[prunedObservationAdvisory]]
    * instead, pinned in KnobsSpec on a pure-blob corpus. The realistic
    * partial-loss shape — a capped blob amid a corpus that still
    * yields results — delivers the measured advisory as before. */
  private[graft] def observeCapMetrics(df: DataFrame, prefix: String,
      cnt: Column, cap: Long, nRows: Long = -1L): DataFrame =
    // nRows (the driver-side footer corpus count, round 18) rides the
    // NAME, not the metrics row: the pruned-observation fallback fires
    // exactly when the metrics never deliver, so anything it quotes
    // must survive in the one artifact that does — the analyzed plan's
    // CollectMetrics name. Deterministic per corpus, so identical
    // constructions still share a name (the semanticHash contract).
    df.observe(
      s"$prefix/${Integer.toHexString(
        df.queryExecution.analyzed.semanticHash())}/cap=$cap/n=$nRows",
      max(cnt).as("max_cnt"),
      max(lit(cap)).as("cap"))

  /** The measured band-bucket advisory: fires iff the largest
    * measured band bucket crosses the member cap — i.e. at least one
    * bucket is being dropped from candidate generation. */
  private[graft] def minhashBucketAdvisory(maxBucket: Long,
      cap: Long): Option[graft.Advisory] =
    if (cap > 0 && maxBucket > cap)
      // bound: the dropped bucket loses ALL its candidate pairs —
      // C(m, 2) of the measured worst bucket (exact for the blob shape,
      // where every band's bucket is the same m members)
      Some(graft.Advisory("dd_minhash_lsh", "graft.minhash.maxBucket",
        cap = cap, measured = maxBucket,
        bound = maxBucket * (maxBucket - 1) / 2,
        s"dd_minhash_lsh MEASURED band bucket of $maxBucket members " +
        s"crosses graft.minhash.maxBucket = $cap and is DROPPED from " +
        "candidate generation. Scattered degenerate bands are harmless " +
        "(a true j>=0.5 pair collides in ~4 of 16 bands), but a " +
        "NEAR-VERBATIM blob larger than the cap — which dd_exact does " +
        "NOT collapse — crosses in ALL its bands and its pairs are " +
        "silently lost. Collapse blobs first (dd_exact, then near-dup " +
        s"on the residue), or set graft.minhash.maxBucket >= $maxBucket " +
        "knowingly (per-bucket candidate budget ~m^2/2 instances).",
        action = graft.AdvisoryAction.RaiseKnob,
        target = maxBucket.toString))
    else None

  /** The measured-cell advisory text: fires iff the largest measured
    * post-replication cell CROSSES the cap — the exact condition under
    * which hash-split shards exist and cross-shard pairs of that cell
    * go unscored. Quotes the measured split arithmetic rather than the
    * N-derived proxy. */
  private[graft] def measuredCellAdvisory(maxCell: Long,
      cellCap: Long): Option[graft.Advisory] =
    if (cellCap > 0 && maxCell > cellCap) {
      val shards = math.ceil(maxCell.toDouble / cellCap).toLong
      // bound: of the split cell's C(m, 2) pairs, the ~(1 − 1/shards)
      // fraction landing cross-shard is not scored
      val cellPairs = maxCell * (maxCell - 1) / 2
      Some(graft.Advisory("dd_embed_cosine", "graft.embedCosine.maxCell",
        cap = cellCap, measured = maxCell,
        bound = cellPairs - cellPairs / shards,
        s"dd_embed_cosine MEASURED post-replication IVF cell of " +
        s"$maxCell members crosses the cell cap $cellCap: that cell is " +
        s"hash-split into $shards shards and ~" +
        f"${(1.0 - 1.0 / shards) * 100}%.0f%% of ITS pairs are not " +
        "scored (graceful for top-40 mining of near-uniform duplicate " +
        "blobs — every shard is full of the blob's top pairs — but " +
        "real loss for a genuinely skewed corpus; SURVEY 8.4.8d's " +
        "cap/mean dial reaches the same regime at smaller N under " +
        "skew). This advisory keys on the MEASURED cell distribution, " +
        "not the 4*sqrt(N) sizing — set graft.embedCosine.maxCell >= " +
        s"$maxCell to score this cell unsplit (per-task pair budget " +
        "~maxCell^2/2 scorings, ~1M scorings/s/task) or accept the " +
        "split.",
        action = graft.AdvisoryAction.RaiseKnob, target = maxCell.toString))
    } else None

  private val capAdvisorySessions =
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()

  /** True iff `name` is one of this module's cap observations — the
    * listener's dispatch predicate AND the pruned-observation scan's. */
  private def isCapObservation(name: String): Boolean =
    name.startsWith(cellMetricsPrefix) || name.startsWith(bucketMetricsPrefix)

  /** The generic fallback for a cap observation that was DECLARED in
    * the analyzed plan but never delivered (round 17, closing the r16
    * lead finding): AQE's empty-relation propagation replans an
    * empty-at-runtime subtree to an EmptyRelation and prunes the
    * CollectMetrics node with it — which happens EXACTLY when loss is
    * total (e.g. a pure near-verbatim blob corpus where every band
    * bucket crosses the cap: zero candidates survive, the result is
    * empty, and the measured advisory the case most needs has no
    * metrics to deliver). This advisory cannot quote the measured
    * max — the observation never ran to completion (`measured = -1` on
    * the record) — so it names the condition and the knob generically,
    * with the cap AND the driver-side corpus count parsed from the
    * observation name. The corpus count (round 18, closing the r17
    * benign-vs-degenerate finding) is what lets a consumer read
    * "EMPTY result" without a re-run: N = 0 is benign, N = 502 000
    * with duplicates expected means the cap dropped everything. */
  private[graft] def prunedObservationAdvisory(name: String): graft.Advisory = {
    val (op, knob) =
      if (name.startsWith(cellMetricsPrefix))
        ("dd_embed_cosine", "graft.embedCosine.maxCell")
      else ("dd_minhash_lsh", "graft.minhash.maxBucket")
    def seg(k: String): Option[String] =
      name.split(s"/$k=").lift(1).map(_.takeWhile(_ != '/'))
    val cap = seg("cap").getOrElse("?")
    // pre-r18 names carry no /n= segment; n = -1 means "not stamped"
    val n = seg("n").flatMap(_.toLongOption).getOrElse(-1L)
    val corpusNote =
      if (n == 0) "The corpus had 0 rows — this empty result is BENIGN. "
      else if (n > 0)
        s"The corpus had $n rows, so if duplicates were expected this " +
          "empty result is the degenerate shape, not an empty input. "
      else ""
    graft.Advisory(op, knob,
      cap = seg("cap").flatMap(_.toLongOption).getOrElse(-1L),
      measured = -1L, bound = -1L,
      s"$op: this route's result (its branch, in a composite query) is " +
      "EMPTY and the cap observation was pruned with the empty plan " +
      "(AQE empty-relation propagation), so no measured " +
      s"advisory is available. ${corpusNote}An empty result can be " +
      "benign (empty or " +
      "pair-free input) — but if duplicates were expected, the cap " +
      s"($knob = $cap) may have dropped EVERY candidate (a fully-" +
      "degenerate corpus, e.g. one near-verbatim blob larger than the " +
      "cap, hits exactly this). Collapse blobs first (dd_exact, then " +
      s"near-dup on the residue) or re-run with $knob raised past the " +
      "largest duplicate-blob size.",
      // RaiseKnob with an EMPTY target: the sufficient value was never
      // observed (the observation itself was pruned) — the documented
      // "raise past the largest expected blob" semantic
      action = graft.AdvisoryAction.RaiseKnob, target = "")
  }

  /** Register (once per session) the QueryExecutionListener that turns
    * the [[observeCellMetrics]] / [[minhashCandidates]] observations
    * into runtime advisories (ledger + WARN, [[graft.Graft.advise]]).
    * Delivery is post-query — the measured counts only exist once the
    * assignment ran — which still tells the operator their freshly
    * computed result lost cross-shard pairs, with the knob to re-run.
    * Observations PRESENT in the analyzed plan but ABSENT from
    * `observedMetrics` were pruned by AQE's empty-relation propagation
    * (the 100%-loss corner) and fire [[prunedObservationAdvisory]]. */
  private[graft] def ensureCapAdvisoryListener(spark: SparkSession): Unit = {
    val fresh = capAdvisorySessions.synchronized {
      capAdvisorySessions.put(spark, java.lang.Boolean.TRUE) == null
    }
    if (fresh)
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit = {
            val delivered = qe.observedMetrics
            // prefix match: a composite query can carry SEVERAL cap
            // observations (one per distinct route subtree) — advise
            // on each, dispatching by prefix
            delivered.foreach { case (name, row) =>
              val sink: Option[(Long, Long) => Option[graft.Advisory]] =
                if (name.startsWith(cellMetricsPrefix))
                  Some(measuredCellAdvisory(_, _))
                else if (name.startsWith(bucketMetricsPrefix))
                  Some(minhashBucketAdvisory(_, _))
                else None
              sink.foreach { advise =>
                val i = row.fieldIndex("max_cnt")
                if (!row.isNullAt(i)) // empty stream → null max
                  advise(row.getLong(i), row.getAs[Long]("cap"))
                    .foreach(graft.Graft.advise(qe.sparkSession, _, log))
              }
            }
            // pruned-observation fallback: every cap observation the
            // ANALYZED plan declares must have delivered; one that
            // didn't was replanned away with an empty subtree — advise
            // generically, since the measured max no longer exists.
            // The cache corner was probed before choosing ANALYZED as
            // the diff base (round 17): a .cache()d route does NOT
            // false-fire here, because observedMetrics traverses
            // InMemoryTableScan into the cached physical plan and a
            // HEALTHY cached result delivers its metrics on every
            // cache-served re-trigger (measured: analyzed=1
            // delivered=1 on both triggers) — while a DEGENERATE
            // cached result's CollectMetrics was AQE-pruned inside the
            // cached materialization itself, so delivery is absent on
            // every trigger (measured: analyzed=1 delivered=0) and
            // this advisory correctly fires each time the poisoned
            // cache is read. Diffing withCachedData instead would go
            // SILENT there — cache substitution removes the logical
            // node for healthy and degenerate caches alike. Both
            // shapes pinned in KnobsSpec.
            // (distinct: identical self-join sides above a reused
            // exchange carry the same semanticHash-scoped name twice
            // in the plan but deliver once.)
            qe.analyzed.collect {
              case c: org.apache.spark.sql.catalyst.plans.logical.CollectMetrics
                  if isCapObservation(c.name) => c.name
            }.distinct.filterNot(delivered.contains).foreach { name =>
              graft.Graft.advise(qe.sparkSession,
                prunedObservationAdvisory(name), log)
            }
          }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        })
  }

  /** The effective boundary-probe margin — the
    * `graft.embedCosine.probeMargin` conf with its measured default
    * (0.01, §8.4.8b). Single-sourced here so EmbedRecallSmoke's cap
    * ladder replicates exactly the margin the route would use instead
    * of re-stating the default (the r14 single-sourcing rule). */
  private[graft] def embedProbeMargin(spark: SparkSession): Double =
    confDouble(spark, "graft.embedCosine.probeMargin", 0.01)

  /** The bucketed embed route's cell assignment — (vec_id, v, nrm,
    * cluster, shard) after the mega-cell hash-split — factored out
    * (like [[ngramCandidates]]) so EmbedRecallSmoke can measure the
    * route's pair-level quality directly: a pair is scorable iff both
    * sides share (cluster, shard), so the measured miss rate of planted
    * true pairs is exactly the co-residency failure rate here, with no
    * top-40 truncation in the way.
    *
    * The explicit cluster-key repartition is the materialization point
    * both self-join sides read back (ReusedExchange; partitioning by
    * `cluster` alone still satisfies the (cluster, shard) join's
    * clustered distribution) — the N×√N assignment pass runs exactly
    * once. On the unprobed path the cell-count window consumes the
    * same exchange; the probed path computes shard AND otherShard on
    * the slim pre-payload stream inside ivfProbedParts instead. */
  private[graft] def embedCells(spark: SparkSession, dir: String,
      cellCap: Long, nVecs: Long = -1L): DataFrame = {
    // graft.embedCosine.probeMargin > 0 (DEFAULT 0.01) turns on
    // boundary multi-probe (Similarity.ivfProbedParts): vectors within
    // that top-2 centroid margin of a Voronoi boundary join BOTH
    // cells, and the route's pair join de-duplicates by
    // min-common-cell. Default ON at the §8.4.8-measured point: 0.01
    // replicates 1.22× rows, zeroes the measured near-verbatim miss
    // (2000/2000 planted pairs at cos ≥ 0.9996 recovered at 0.4M
    // through 2M vectors vs 1.8–3.7% missed unprobed), at a measured
    // wall cost that grows with the pair-join share — ~0% at the gate
    // SF to +35–37% at 4M vectors (§8.4.8b pricing; the conjunct
    // itself is scalar codegen — the cost is the replicated pair
    // scorings). Set 0 for the round-≤11 single-assignment plan.
    val pm = embedProbeMargin(spark)
    if (pm > 0)
      // shard + otherShard (the scoreOnceCond shard-aware-defer input)
      // are computed on the slim pre-payload stream inside
      // ivfProbedParts — see its scaladoc for why a payload-side
      // window + count-aggregate pair re-runs the assignment pass.
      // The explicit cluster-key repartition stays the materialization
      // point both self-join sides read back (ReusedExchange).
      Similarity.ivfProbedParts(spark, dir, pm, cellCap, nVecs)
        .repartition(col("cluster"))
    else {
      val byCell = Window.partitionBy("cluster")
      Similarity.ivfParts(spark, dir)._3
        .repartition(col("cluster"))
        .withColumn("cnt", count(lit(1)).over(byCell))
        .withColumn("shard", pmod(xxhash64(col("vec_id")),
          ceil(col("cnt") / lit(cellCap.toDouble)).cast("long")))
        // same measured-cell observation as the probed path; max-only
        // metrics stay correct though the window re-runs on both
        // self-join sides above the reused exchange
        .transform(observeCellMetrics(_, cellCap, nVecs))
        .drop("cnt")
    }
  }

  /** Benchmark decontamination: flag documents sharing any 3-gram with
    * a benchmark phrase set. The benchmark side is tiny by nature →
    * broadcast equi-join on the shingle; each training doc is checked
    * in one scan regardless of corpus size (the standard pre-training
    * leakage filter). */
  def ddDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val phrases = Seq(
      "query data stream", "table key filter", "sort table scan")
    import spark.implicits._
    val bench = phrases.toDF("phrase")
      .select(col("phrase"), explode(shingles(col("phrase"))).as("sh"))
    // Pre-filter each doc's shingle ARRAY against the literal benchmark
    // shingle set before exploding (round 21): only matching shingles
    // become rows, so the join probe stream shrinks from every shingle
    // instance in the corpus to the (rare) hits — the full token
    // stream never materializes as rows. The driver-side literal
    // mirrors [[shingles]] exactly for the 3-token phrases (whitespace
    // split → one 3-shingle each); the broadcast join on the exploded
    // bench side still attributes each hit to its phrase(s), so
    // n_hits/matched are row-identical to the explode-then-join shape
    // (A/B'd exceptAll-empty both directions at sf0.1; ~10% faster
    // locally, and at 100 TB the probe side of the join drops from
    // |all shingle instances| to |hits|).
    val benchShs = phrases
      .flatMap(_.trim.split("\\s+").toSeq.sliding(3).map(_.mkString(" ")))
      .distinct
    val docHits = t(spark, dir, "documents")
      .select(col("doc_id"),
        explode(array_intersect(shingles(col("text")),
          typedLit(benchShs))).as("sh"))
    docHits.join(broadcast(bench), "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"),
        array_join(array_sort(collect_set(col("phrase"))), ",").as("matched"))
      .orderBy("doc_id")
  }

  /** Near-dup CLUSTERS: connected components over the j ≥ 0.5 pair
    * graph, each member labeled with the component's minimum doc_id
    * (the canonical representative to keep) and the component size.
    *
    * Iterative min-label propagation: each round every node takes the
    * min of its own and its neighbors' labels; converges in
    * O(component diameter) rounds — near-dup clusters are shallow
    * (duplicates of a common ancestor), so this is 2-4 rounds in
    * practice. Each round is ONE join + ONE aggregate: the aggregate
    * carries the node's previous label alongside the new min (tagging
    * the union's own-label rows), so the convergence check is a
    * filter-count over the already-persisted round output — no second
    * join re-shuffling the label set (the standard Spark shape for
    * connected components, minus the usual per-round compare join). */
  def ddCluster(spark: SparkSession, dir: String): DataFrame =
    clusterFromPairs(ddNgramJaccardPairs(spark, dir)
      .select("doc_a", "doc_b"))

  /** [[ddCluster]] with pair generation routed through the
    * disk-bounded STAGED mode (round 20, r19 verdict #3): the
    * propagation itself is pair-proportional (the pair set is the tiny
    * fraction of the stream), so dd_cluster's scale wall IS the ngram
    * single-plan wall — measured ENOSPC at 20M docs even under
    * tier-0+zstd (§8.4.3g). This composition is the same
    * SwitchOperator escape the ngram ladder's last rung names, applied
    * to the component DAG: identical labels (the staged pair set is
    * oracle-identical), per-job spill bounded at ~1/shards.
    * Registered as `dd_cluster_staged` against the SAME DuckDB oracle
    * as `dd_cluster`. Inherits [[ddNgramJaccardStaged]]'s eager
    * execution and stageDir contract. */
  def ddClusterStaged(spark: SparkSession, dir: String,
      stageDir: String = "", shards: Int = -1): DataFrame =
    clusterFromPairs(ddNgramJaccardStaged(spark, dir, stageDir, shards)
      .select("doc_a", "doc_b"))

  private def clusterFromPairs(pairs: DataFrame): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // both edge directions from ONE pass over the pair subtree (a
    // union of two selects would recompute the whole dedup DAG twice)
    val edges = pairs.select(explode(array(
        struct(col("doc_a"), col("doc_b")),
        struct(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))).as("e"))
      .select(col("e.doc_a"), col("e.doc_b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // round 0 fused into the init: label = min(self, neighbors)
    val init = edges
      .groupBy(col("doc_a").as("node"))
      .agg(least(first(col("doc_a")), min(col("doc_b"))).as("label"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // `cached` is the handle whose blocks get released each round;
    // `labels` is its (node, label) projection feeding the next round
    var cached = init
    var labels = init
    var changed = 1L
    while (changed > 0) {
      val prop = edges.join(labels, edges("doc_a") === labels("node"))
        .select(col("doc_b").as("node"), col("label"), lit(false).as("own"))
      val next = labels.select(col("node"), col("label"), lit(true).as("own"))
        .union(prop)
        .groupBy("node").agg(
          min("label").as("label"),
          // every node contributes exactly one own=true row, so prev is
          // total and label <= prev by construction
          min(when(col("own"), col("label"))).as("prev"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      changed = next.where(col("label") < col("prev")).count()
      cached.unpersist()
      cached = next
      labels = next.select("node", "label")
    }
    // the final labels are materialized (the convergence count ran), so
    // the edge cache can be released — a long-lived session would
    // otherwise hold the edge blocks until shutdown. Lineage stays
    // intact: an evicted label partition would recompute through the
    // unpersisted edges, slower but correct.
    edges.unpersist()
    labels
      .select(col("node").as("doc_id"), col("label").as("cluster"))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy("cluster")))
      .orderBy("doc_id")
  }

  /** Cross-document repeated-span detection — the per-document signal
    * behind substring-level dedup (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better"): for every document,
    * the fraction of its 5-gram spans (counted WITH multiplicity — a
    * span repeated inside one doc counts each time) that also occur in
    * at least `minDocs` distinct documents. High `dup_bp` marks
    * boilerplate-heavy documents to drop or trim before training.
    *
    * Shape at 100 TB: span df is one hash-aggregate over (doc, gram)
    * distinct pairs; the instance stream joins the ≥minDocs gram set on
    * a fixed-width 60-bit key (first 15 md5 hex chars — the same
    * derivation on the DuckDB side, so any collision is deterministic
    * and identical in both engines); per-doc totals come from the token
    * count, no second pass. Hot boilerplate grams skew the join's build
    * side only by their df row — instances stay spread across docs. */
  def ddSpan(spark: SparkSession, dir: String, minDocs: Int = 2): DataFrame = {
    // null text excluded EXPLICITLY (mirrored in the oracle): the
    // exploded instance stream drops such docs implicitly, which would
    // silently diverge from the oracle's LEFT JOIN keeping them.
    //
    // Shape note: span df stays the distinct+hash-agg+join-back form
    // deliberately. The dense_rank-window rewrite that won for dd_cdc
    // loses here 25× (0.4 → 10.8 s at 20×): a sliding 5-token gram
    // stream is ~|tokens| rows — sorting it for the window costs far
    // more than recomputing the cheap explode+md5 for the join branch,
    // and AQE broadcasts the small ≥minDocs gram set so the instance
    // stream is never exchanged at all. (dd_cdc's chunk stream is ~16×
    // smaller and its chunker is the dominant cost, which flips the
    // trade — see ddCdc.)
    val docs = t(spark, dir, "documents")
      .where(col("text").isNotNull)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("tk"))
    val base = docs.select(col("doc_id"),
      greatest(size(col("tk")) - 4, lit(0)).cast("long").as("n_spans"))
    // guard: sequence(1, n) with n < 1 would DESCEND in Spark
    val grams = docs
      .where(size(col("tk")) >= 5)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("tk")) - 4),
          i => concat_ws(" ", slice(col("tk"), i, lit(5))))).as("gram"))
      .select(col("doc_id"),
        conv(substring(md5(col("gram")), 1, 15), 16, 10).cast("long").as("g"))
    val dupGrams = grams.distinct()
      .groupBy("g").agg(count(lit(1)).as("ddf"))
      .where(col("ddf") >= minDocs)
      .select("g")
    val dupCnt = grams.join(dupGrams, "g")
      .groupBy("doc_id").agg(count(lit(1)).as("dup_cnt"))
    base.join(dupCnt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        coalesce(col("dup_cnt"), lit(0L)).as("n_dup_spans"))
      .withColumn("dup_bp",
        when(col("n_spans") === 0, 0L)
          .otherwise(expr("(10000 * n_dup_spans) div n_spans")))
      .orderBy("doc_id")
  }

  /** Content-defined chunk dedup (the FastCDC/Rabin family): each
    * document's token stream is cut where the hash of the trailing
    * 4-token window ≡ 0 (mod 16) — boundaries depend only on LOCAL
    * content, so an edit moves at most its neighboring cut and
    * unchanged regions keep their chunk fingerprints (the property
    * that makes CDC the crawl-snapshot dedup primitive, unlike
    * fixed-width spans where one insertion shifts every later span).
    * Output: per-document chunk count, chunks shared with ≥ 2 distinct
    * documents, and the duplicated fraction in basis points.
    *
    * Shape at 100 TB: chunking is a pure per-row expression (no
    * shuffle); chunk df rides ONE exchange on the fixed-width 60-bit
    * md5 fingerprint (dense_rank + max window = distinct-doc count),
    * then one per-doc aggregate — the corpus is read and chunked
    * exactly once, same shape as [[ddSpan]]. */
  def ddCdc(spark: SparkSession, dir: String): DataFrame = {
    // one-pass native chunker (see CdcChunks scaladoc for why the HOF
    // formulation was quadratic); every doc yields >= 1 chunk, so the
    // per-doc chunk count falls out of the same instance aggregation
    // ONE corpus pass: the chunk df (distinct docs per fingerprint) is
    // dense_rank + max over the fingerprint window instead of a
    // distinct+agg+join-back — the join shape re-ran the scan AND the
    // native chunker once per branch (chunking is the dominant cost)
    val inst = t(spark, dir, "documents")
      .where(col("text").isNotNull) // mirrored in the oracle, as in ddSpan
      .select(col("doc_id"),
        explode(CdcChunks.cdc_chunks(col("text"))).as("chunk"))
      .select(col("doc_id"),
        conv(substring(md5(col("chunk")), 1, 15), 16, 10).cast("long").as("g"))
    val wOrd = Window.partitionBy("g").orderBy("doc_id")
    val wAll = Window.partitionBy("g")
    inst
      .withColumn("dr", dense_rank().over(wOrd))
      .withColumn("ddf", max("dr").over(wAll))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("ddf") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"))
      .withColumn("dup_bp", expr("(10000 * n_dup_chunks) div n_chunks"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_cdc"           -> ddCdc _,
    "dd_cluster"       -> ddCluster _,
    "dd_decontaminate" -> ddDecontaminate _,
    "dd_exact"         -> ddExact _,
    "dd_ngram_jaccard" -> ((s: SparkSession, d: String) => ddNgramJaccard(s, d)),
    // disk-bounded staged mode, same pair set — gate-checked against
    // the SAME oracle as dd_ngram_jaccard (§8.4.3g)
    "dd_ngram_staged"  -> ((s: SparkSession, d: String) => ddNgramJaccardStaged(s, d)),
    // the staged composition for components — same oracle as dd_cluster
    // (§8.4.3g's escape applied to the family whose wall IS pair
    // generation; round 20)
    "dd_cluster_staged" -> ((s: SparkSession, d: String) => ddClusterStaged(s, d)),
    "dd_minhash_lsh"   -> ddMinhashLsh _,
    "dd_simhash"       -> ddSimhash _,
    "dd_embed_cosine"  -> ddEmbedCosine _,
    "dd_span"          -> ((s: SparkSession, d: String) => ddSpan(s, d)),
    // The SCALE-ROUTE variants, parameter-forced (the ta_vocab_k10
    // pattern): the gate corpora sit far below both corpus-size
    // switches, so without these rows the driver gate would only ever
    // exercise the small-corpus plans — the code that actually runs at
    // 100 TB (wide C(8,4) band tables, IVF-bucketed cell pairing) would
    // be ScalaTest-only. Rows-only checks (approximate by design, like
    // dd_simhash / ss_ivf_topk); EdgeGateSpec's exclusion-derived list
    // edge-gates them automatically.
    "dd_simhash_wide" ->
      ((s: SparkSession, d: String) => ddSimhash(s, d, wideBands = true)),
    "dd_embed_cosine_bucketed" ->
      ((s: SparkSession, d: String) => ddEmbedCosine(s, d, exactMax = -1L)),
  )

  /** Registered queries whose EAGER staged execution makes them
    * by-design heavier than their single-plan twins — the bench
    * derives its round-comparable `total_shared` exclusion list from
    * this tag (round 20, r19 verdict #5: the set was a literal in
    * Bench.scala that a future heavy query could silently miss;
    * KnobsSpec pins that every tag names a registered query). */
  val benchHeavy: Set[String] = Set("dd_ngram_staged", "dd_cluster_staged")

  private val ngramOracleSql: String =
    """WITH t AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    generate_series(1, greatest(len(tk)-2, 1)),
      |    i -> array_to_string(tk[i:i+2],' '))) AS shs
      |  FROM (SELECT doc_id, string_split_regex(trim(text),'\s+') AS tk
      |        FROM documents)),
      |s AS (SELECT doc_id, len(shs) AS n, unnest(shs) AS sh FROM t),
      |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared,
      |        any_value(a.n) AS na, any_value(b.n) AS nb
      |      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2)
      |SELECT doc_a, doc_b,
      |  round(shared/(na+nb-shared), 4) AS jaccard
      |FROM p WHERE round(shared/(na+nb-shared), 4) >= 0.5
      |ORDER BY doc_a, doc_b""".stripMargin

  /** The dd_cluster DuckDB oracle — shared by the staged
    * composition (identical labels by construction). */
  private val clusterOracleSql: String =
    """WITH RECURSIVE t AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, greatest(len(tk)-2, 1)),
        |    i -> array_to_string(tk[i:i+2],' '))) AS shs
        |  FROM (SELECT doc_id, string_split_regex(trim(text),'\s+') AS tk
        |        FROM documents)),
        |s AS (SELECT doc_id, len(shs) AS n, unnest(shs) AS sh FROM t),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared,
        |        any_value(a.n) AS na, any_value(b.n) AS nb
        |      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2),
        |pairs AS (SELECT doc_a, doc_b FROM p
        |          WHERE round(shared/(na+nb-shared), 4) >= 0.5),
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        |          UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        |  SELECT DISTINCT a AS node, a AS r FROM edges
        |  UNION
        |  SELECT e.b AS node, reach.r FROM reach JOIN edges e ON e.a = reach.node),
        |lab AS (SELECT node AS doc_id, min(r) AS cluster FROM reach GROUP BY node)
        |SELECT doc_id, cluster,
        |  count(*) OVER (PARTITION BY cluster) AS cluster_size
        |FROM lab ORDER BY doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "dd_decontaminate" ->
      """WITH bench AS (
        |  SELECT phrase, unnest(list_distinct(list_transform(
        |    generate_series(1, greatest(len(tk)-2, 1)),
        |    i -> array_to_string(tk[i:i+2],' ')))) AS sh
        |  FROM (SELECT phrase, string_split_regex(trim(phrase),'\s+') AS tk
        |        FROM (VALUES ('query data stream'), ('table key filter'),
        |                     ('sort table scan')) p(phrase))),
        |ds AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, greatest(len(tk)-2, 1)),
        |    i -> array_to_string(tk[i:i+2],' ')))) AS sh
        |  FROM (SELECT doc_id, string_split_regex(trim(text),'\s+') AS tk
        |        FROM documents))
        |SELECT doc_id, count(*) AS n_hits,
        |  array_to_string(list_sort(list(DISTINCT phrase)), ',') AS matched
        |FROM ds JOIN bench USING (sh)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "dd_exact" ->
      """SELECT doc_id, canonical, group_size, fp FROM (
        |  SELECT doc_id,
        |    min(doc_id) OVER (PARTITION BY fp) AS canonical,
        |    count(*) OVER (PARTITION BY fp) AS group_size, fp
        |  FROM (SELECT doc_id,
        |          md5(array_to_string(list_sort(list_distinct(
        |            string_split_regex(trim(text),'\s+'))),' ')) AS fp
        |        FROM documents))
        |WHERE group_size > 1 ORDER BY doc_id""".stripMargin,
    "dd_ngram_jaccard" -> ngramOracleSql,
    // the staged mode must produce the identical pair set — same oracle
    "dd_ngram_staged" -> ngramOracleSql,
    // Connected components over the exact-Jaccard pair graph: the
    // recursive CTE reaches every node from every component member, so
    // min(reached) is the component minimum.
    "dd_cluster" -> clusterOracleSql,
    // the staged composition must produce identical labels — same oracle
    "dd_cluster_staged" -> clusterOracleSql,
    // LSH verifies candidates with the exact Jaccard, so its output is
    // the exact pair set (see ddMinhashLsh scaladoc) — same oracle.
    "dd_minhash_lsh" ->
      """WITH t AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, greatest(len(tk)-2, 1)),
        |    i -> array_to_string(tk[i:i+2],' '))) AS shs
        |  FROM (SELECT doc_id, string_split_regex(trim(text),'\s+') AS tk
        |        FROM documents)),
        |s AS (SELECT doc_id, len(shs) AS n, unnest(shs) AS sh FROM t),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared,
        |        any_value(a.n) AS na, any_value(b.n) AS nb
        |      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |  round(shared/(na+nb-shared), 4) AS jaccard
        |FROM p WHERE round(shared/(na+nb-shared), 4) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin,
    "dd_embed_cosine" ->
      """WITH e AS (SELECT vec_id, v FROM (
        |             SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |             FROM embeddings)
        |           WHERE list_sum(list_transform(v, x -> x*x)) > 0)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  round(list_cosine_similarity(a.v, b.v), 4) AS cos
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |ORDER BY cos DESC, vec_a, vec_b LIMIT 40""".stripMargin,
    "dd_span" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text),'\s+') AS tk
        |           FROM documents WHERE text IS NOT NULL),
        |base AS (SELECT doc_id, greatest(len(tk)-4, 0) AS n_spans FROM t),
        |g AS (SELECT doc_id,
        |        CAST(('0x' || substr(md5(gram),1,15)) AS BIGINT) AS g
        |      FROM (SELECT doc_id, unnest(list_transform(
        |              generate_series(1, len(tk)-4),
        |              i -> array_to_string(tk[i:i+4],' '))) AS gram
        |            FROM t WHERE len(tk) >= 5)),
        |dup AS (SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS ddf
        |                       FROM g GROUP BY g) WHERE ddf >= 2),
        |cnt AS (SELECT doc_id, count(*) AS n_dup_spans
        |        FROM g JOIN dup USING (g) GROUP BY doc_id)
        |SELECT doc_id, n_spans,
        |  coalesce(n_dup_spans, 0) AS n_dup_spans,
        |  CASE WHEN n_spans = 0 THEN 0
        |       ELSE (10000 * coalesce(n_dup_spans, 0)) // n_spans
        |  END AS dup_bp
        |FROM base LEFT JOIN cnt USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "dd_cdc" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text),'\s+') AS tk
        |           FROM documents WHERE text IS NOT NULL),
        |cutpos AS (SELECT doc_id, tk,
        |    list_concat(list_concat([0],
        |      CASE WHEN len(tk) >= 5 THEN
        |        list_filter(generate_series(4, len(tk)-1),
        |          i -> CAST(('0x' || substr(md5(
        |                 array_to_string(tk[i-3:i],' ')),1,8)) AS BIGINT)
        |               % 16 = 0)
        |      ELSE [] END), [len(tk)]) AS cuts
        |  FROM t),
        |chunked AS (SELECT doc_id,
        |    list_transform(generate_series(1, len(cuts)-1),
        |      j -> array_to_string(tk[cuts[j]+1:cuts[j+1]],' ')) AS chunks
        |  FROM cutpos),
        |base AS (SELECT doc_id, len(chunks) AS n_chunks FROM chunked),
        |inst AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(chunk),1,15)) AS BIGINT) AS g
        |  FROM (SELECT doc_id, unnest(chunks) AS chunk FROM chunked)),
        |dup AS (SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS ddf
        |                       FROM inst GROUP BY g) WHERE ddf >= 2),
        |cnt AS (SELECT doc_id, count(*) AS n_dup_chunks
        |        FROM inst JOIN dup USING (g) GROUP BY doc_id)
        |SELECT doc_id, n_chunks,
        |  coalesce(n_dup_chunks, 0) AS n_dup_chunks,
        |  (10000 * coalesce(n_dup_chunks, 0)) // n_chunks AS dup_bp
        |FROM base LEFT JOIN cnt USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
  )
}
