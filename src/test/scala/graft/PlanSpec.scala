package graft

import graft.queries.Relational
import org.scalatest.funsuite.AnyFunSuite

/** Scale-guard assertions over the PHYSICAL plans — the properties
  * that make these queries survive a 100 TB / 1000-executor deployment
  * must be visible in `explain`, not assumed: filters reach the
  * parquet scan, unused columns are pruned, small dimensions broadcast,
  * top-k avoids global sorts, and the hot paths stay inside
  * whole-stage codegen. A regression here is a performance bug even
  * while every correctness gate stays green. */
class PlanSpec extends AnyFunSuite {
  import SparkTestSession.{sf, spark}

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("no registered query plans a SortAggregate or CartesianProduct") {
    // the round-8 IVF finding, generalized as a standing guard: an
    // array/struct aggregation buffer silently disqualifies hash
    // aggregation and Spark plans a SortAggregate — sorting the
    // aggregate's ENTIRE input stream (the IVF assignment was sorting
    // N×√N rows carrying full vector payloads while every correctness
    // gate stayed green). With the typed-imperative paths
    // ObjectHashAggregate-eligible and the fallback threshold raised
    // (Tables.configure), no registry query should sort-aggregate; a
    // CartesianProduct anywhere is likewise a plan bug (the
    // broadcast-constant cross joins plan BroadcastNestedLoopJoin).
    // Registry-wide by construction — a future registration with a
    // sort-aggregating shape fails here without anyone remembering to
    // add a pin.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = planOf(fn(spark, sf))
        Seq("SortAggregate", "CartesianProduct")
          .filter(plan.contains).map(s => s"$name: $s")
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  test("unpartitioned windows appear only where the input is provably bounded") {
    // an unpartitioned window funnels its ENTIRE input into one task
    // (the WindowExec "No Partition Defined" warning) — fatal at scale
    // on an unbounded stream. Registry-wide guard with an explicit
    // allowlist: ta_vocab's global rank runs on the ≤ k rows surviving
    // the TakeOrdered cut (pinned separately), and ta_report's
    // corpus_docs sum runs on the grouped corpus card — bounded by the
    // (source, lang) group count by construction (round 21: it
    // replaced a second full corpus scan + aggregate). A future
    // registration with a global window on raw data fails here.
    // detection traverses the PHYSICAL plan for window nodes with an
    // empty partitionSpec rather than regex-matching the formatted
    // string: the old `windowspecdefinition(<attr> ASC…` pattern
    // required a bare attribute as the first spec entry, so a global
    // window ordered by a computed key (e.g. a double wrapped in
    // knownfloatingpointnormalized(...)) slipped past exactly the
    // guard built to catch it
    import org.apache.spark.sql.execution.window.{WindowExecBase, WindowGroupLimitExec}
    val bounded = Set("ta_vocab", "ta_vocab_k10", "ta_report")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).collect {
      case (name, fn) if !bounded(name) &&
          fn(spark, sf).queryExecution.sparkPlan.collect {
            case w: WindowExecBase if w.partitionSpec.isEmpty => w.nodeName
            case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w.nodeName
          }.nonEmpty => name
    }
    assert(offenders.isEmpty, s"unbounded global windows in: $offenders")
  }

  test("q6: tight filters are pushed down to the parquet scan") {
    val plan = planOf(Relational.q6ForecastRevenue(spark, sf))
    assert(plan.contains("PushedFilters: ["), plan.take(2000))
    assert(plan.contains("GreaterThanOrEqual(l_discount") ||
      plan.contains("LessThan(l_quantity"), plan.take(2000))
  }

  test("q1: scan reads only the six needed lineitem columns") {
    val plan = planOf(Relational.q1PricingSummary(spark, sf))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(fail("no ReadSchema in plan"))
    Seq("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount")
      .foreach(c => assert(readSchema.contains(c), readSchema))
    // pruned: the fact key and dates are not needed by q1
    Seq("l_orderkey", "l_shipdate").foreach(c =>
      assert(!readSchema.contains(c), s"unpruned column $c in: $readSchema"))
  }

  test("q2: tiny dimensions join via broadcast, not shuffle") {
    val plan = planOf(Relational.q2RevenueByNation(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan.take(3000))
  }

  test("q3: top-10 uses TakeOrderedAndProject, not a global sort") {
    val plan = planOf(Relational.q3TopOrders(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("q4: EXISTS compiles to a semi join") {
    val plan = planOf(Relational.q4PriorityExists(spark, sf))
    assert(plan.contains("LeftSemi"), plan.take(3000))
  }

  test("q1: aggregation runs inside whole-stage codegen with partial aggregation") {
    val df = Relational.q1PricingSummary(spark, sf)
    df.collect() // AQE: codegen stages appear only in the FINAL plan
    val plan = planOf(df)
    assert(plan.contains("*("), plan.take(3000)) // WholeStageCodegen stage marker
    // partial (map-side) aggregate before the exchange
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan.take(3000))
  }

  test("dedup candidate generation shuffles on derived keys, never cross-joins") {
    val plan = planOf(graft.functions.Dedup.ddNgramJaccard(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("q14 as-of join: one exchange on user_id, no inequality join") {
    val plan = planOf(Relational.q14AsofJoin(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    // the union-window shape shuffles once by user_id for the window
    assert(plan.contains("Window"), plan.take(3000))
  }

  test("q15 range join: bucketed equi-join, no nested-loop fallback") {
    val plan = planOf(Relational.q15RangeJoin(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("compute-dense embedding stages are repartitioned past scan-size parallelism") {
    // a small-on-disk embeddings table must NOT serialize the
    // dot-product fan-out into one scan-sized task: the heavy joins
    // sit above an explicit round-robin exchange
    Seq(graft.functions.Similarity.ssIvfTopK(spark, sf),
        graft.functions.Similarity.ssQuantizedTopK(spark, sf)).foreach { df =>
      val plan = planOf(df)
      assert(plan.contains("RoundRobinPartitioning"), plan.take(3000))
    }
  }

  test("IVF centroid assignment hash-aggregates a slim scored stream, no sort") {
    // round 8: the assignment is topk(k=1) over (vec_id, c_cos, c_id)
    // ONLY — the previous first(v)/min_by form had array/struct
    // buffers, so Spark silently planned a SortAggregate that sorted
    // the N×√N scored stream WITH the ~300-byte vector payload. Pins:
    // the aggregate is ObjectHashAggregate (typed-imperative topk,
    // partial combine before the exchange), no SortAggregate anywhere,
    // and the vectors rejoin from the SAME round-robin exchange the
    // scored side reads (ReusedExchange — scan count unchanged).
    val df = graft.functions.Similarity.ssIvfTopK(spark, sf)
    df.collect() // AQE: reuse nodes appear only in the final plan
    val finalPlan = planOf(df).split("== Initial Plan ==").head
    assert("partial_topk".r.findAllIn(finalPlan).nonEmpty, finalPlan.take(3000))
    assert(finalPlan.contains("ObjectHashAggregate"), finalPlan.take(3000))
    assert(!finalPlan.contains("SortAggregate"), finalPlan.take(3000))
    assert(finalPlan.contains("ReusedExchange"), finalPlan.take(3000))
  }

  test("the composable pair core carries no gate ordering (no range exchange)") {
    // dd_cluster consumes ddNgramJaccardPairs and immediately
    // reshuffles on doc_id — a trailing ORDER BY in the reusable
    // operator would pay a wasted global sort; the ordering belongs to
    // the registration-facing dd_ngram_jaccard only
    val plan = planOf(graft.functions.Dedup.ddNgramJaccardPairs(spark, sf))
    assert(!plan.toLowerCase.contains("rangepartitioning"), plan.take(3000))
  }

  test("ta_report's global share window consumes the grouped corpus card") {
    // round 21: corpus_docs moved from a second full corpus
    // scan+aggregate to an unpartitioned window over the (source, lang)
    // card. The allowlist in the global-window guard admits it because
    // the input is provably bounded — this pin makes the boundedness
    // itself structural: every empty-partitionSpec window in ta_report
    // must read an aggregate, never a raw scan.
    import org.apache.spark.sql.execution.window.WindowExecBase
    val wins = graft.functions.TextAnalysis.taReport(spark, sf)
      .queryExecution.sparkPlan.collect {
        case w: WindowExecBase if w.partitionSpec.isEmpty => w
      }
    assert(wins.nonEmpty, "expected the global corpus_docs window")
    wins.foreach { w =>
      assert(w.child.collectFirst {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
      }.nonEmpty, "global window must consume the grouped card, not a scan")
    }
  }

  test("ta_pack's cumulative window partitions by (source, shard), not source alone") {
    // packing is sequential per partition stream: with a handful of
    // sources, partitioning by source alone caps the window stage at
    // n_sources tasks regardless of cluster size
    val plan = planOf(graft.functions.TextAnalysis.taPack(spark, sf))
    val spec = "windowspecdefinition\\(source#\\d+, shard#\\d+L?,".r
    assert(spec.findFirstIn(plan).isDefined, plan.take(3000))
  }

  test("similarity top-k is a partial-aggregating bounded heap, no window funnel") {
    // the scored stream must never be fully sorted on a <=n_queries-
    // cardinality key: that funnels N x queries rows into <=5 tasks.
    // The two-phase topk aggregate keeps <=k rows per group per map
    // task (partial_topk before the exchange), so no Window operator
    // may appear anywhere in these plans.
    Seq(graft.functions.Similarity.ssCosineTopK(spark, sf),
        graft.functions.Similarity.ssIvfTopK(spark, sf),
        graft.functions.Similarity.ssQuantizedTopK(spark, sf)).foreach { df =>
      val plan = planOf(df)
      assert(!plan.contains("Window"), plan.take(3000))
      assert("partial_topk".r.findAllIn(plan).nonEmpty, plan.take(3000))
    }
  }

  test("dd_span joins instances on the fixed-width key, never cross-joins") {
    val plan = planOf(graft.functions.Dedup.ddSpan(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    // the df aggregate must partial-combine before its exchange
    assert(plan.contains("partial_count"), plan.take(3000))
  }

  test("dd_cdc shares the dd_span shape: one scan, window df, partial combine") {
    val df = graft.functions.Dedup.ddCdc(spark, sf)
    df.collect() // AQE: final plan
    val finalPlan = planOf(df).split("== Initial Plan ==").head
    assert(!finalPlan.contains("CartesianProduct"), finalPlan.take(3000))
    assert(!finalPlan.contains("BroadcastNestedLoopJoin"), finalPlan.take(3000))
    // the corpus is read and chunked exactly once
    assert("Scan parquet".r.findAllIn(finalPlan).length == 1, finalPlan.take(3000))
    assert(finalPlan.contains("partial_count"), finalPlan.take(3000))
  }

  test("minhash band self-join reuses the bucket-count window exchange") {
    // the hot-bucket cap rides a window over the band key; both sides
    // of the candidate self-join must then REUSE that exchange, or the
    // whole signature pipeline (scan → shingles → minhash32_row →
    // band posexplode) would execute twice
    val df = graft.functions.Dedup.ddMinhashLsh(spark, sf)
    df.collect() // AQE: reuse nodes appear only in the final plan
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(plan.contains("ReusedExchange"), plan.take(3000))
    // the signature stage is a map-only per-row sketch — no explode +
    // groupBy aggregate (and so no doc_id exchange) feeding the bands
    assert(plan.contains("minhash32_row"), plan.take(3000))
    assert(!plan.contains("partial_minhash32("), plan.take(3000))
    // the whole operator reads the corpus exactly ONCE in the FINAL
    // plan: the band pipeline and the four verify join branches all
    // read the shared doc_id exchange back (ReusedExchange / reused
    // broadcast) instead of re-scanning and re-shingling
    val finalPlan = plan.split("== Initial Plan ==").head
    assert("Scan parquet".r.findAllIn(finalPlan).length == 1, finalPlan.take(3000))
  }

  test("dd_simhash signature is map-only behind one reused exchange") {
    val df = graft.functions.Dedup.ddSimhash(spark, sf)
    df.collect() // AQE: reuse nodes appear only in the final plan
    val finalPlan = planOf(df).split("== Initial Plan ==").head
    // per-row signature: no explode + simhash aggregate, no token shuffle
    assert(finalPlan.contains("simhash64_row"), finalPlan.take(3000))
    assert(!finalPlan.contains("partial_simhash64"), finalPlan.take(3000))
    // the chunk self-join reads ONE signature exchange back — the scan
    // and the signature pass execute once, not once per join side
    assert(finalPlan.contains("ReusedExchange"), finalPlan.take(3000))
    assert("Scan parquet".r.findAllIn(finalPlan).length == 1, finalPlan.take(3000))
    // and nothing re-evaluates the signature as a pushed scan filter
    assert(!finalPlan.contains("isnotnull(simhash64_row"), finalPlan.take(3000))
  }

  test("dd_simhash wide (8,4) bands keep the one-scan reused-exchange shape") {
    // the >10M-doc band plan must inherit every plan property of the
    // default: map-only signature, 70-way band fan-out off ONE
    // signature exchange that both self-join sides read back, one
    // corpus scan, no signature re-evaluation as a pushed scan filter
    val df = graft.functions.Dedup.ddSimhash(spark, sf, wideBands = true)
    df.collect() // AQE: reuse nodes appear only in the final plan
    val finalPlan = planOf(df).split("== Initial Plan ==").head
    assert(finalPlan.contains("simhash64_row"), finalPlan.take(3000))
    assert(finalPlan.contains("ReusedExchange"), finalPlan.take(3000))
    assert("Scan parquet".r.findAllIn(finalPlan).length == 1, finalPlan.take(3000))
    assert(!finalPlan.contains("isnotnull(simhash64_row"), finalPlan.take(3000))
  }

  test("dd_embed_cosine's bucketed route runs the IVF assignment once") {
    // past 2^16 vectors the route self-joins the ivfParts assignment on
    // the cluster key: the explicit repartition is the materialization
    // point both sides must READ BACK — without reuse the whole
    // N×√N assignment pass (and its two embeddings scans) runs twice
    val df = graft.functions.Dedup.ddEmbedCosine(spark, sf, exactMax = 0)
    df.collect() // AQE: reuse nodes appear only in the final plan
    val finalPlan = planOf(df).split("== Initial Plan ==").head
    assert(finalPlan.contains("ReusedExchange"), finalPlan.take(3000))
    // one scan feeds the vectors, one the centroid broadcast — the
    // self-join must not add a third/fourth
    assert("Scan parquet".r.findAllIn(finalPlan).length <= 2, finalPlan.take(3000))
    assert(!finalPlan.contains("CartesianProduct"), finalPlan.take(3000))
    // the global top-40 is a TakeOrdered, not a full sort of the pairs
    assert(finalPlan.contains("TakeOrderedAndProject"), finalPlan.take(3000))
  }

  test("near-dup verify computes the shingle pass once behind a reused doc_id exchange") {
    val df = graft.functions.Dedup.ddNgramJaccard(spark, sf)
    df.collect() // AQE: reuse nodes appear only in the final plan
    val finalPlan = planOf(df).split("== Initial Plan ==").head
    assert(finalPlan.contains("REPARTITION_BY_COL"), finalPlan.take(3000))
    assert(finalPlan.contains("ReusedExchange"), finalPlan.take(3000))
    // candidate generation and the verify base share the single scan
    assert("Scan parquet".r.findAllIn(finalPlan).length == 1, finalPlan.take(3000))
  }

  test("ta_vocab cuts the vocabulary with TakeOrdered, not a global sort") {
    val plan = planOf(graft.functions.TextAnalysis.taVocab(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
  }

  test("ta_quality_lr is one scan + one partial-combining aggregate") {
    val plan = planOf(graft.functions.TextAnalysis.taQualityLr(spark, sf))
    assert("FileScan".r.findAllIn(plan).length == 1, plan.take(3000))
    assert(plan.contains("partial_count") && plan.contains("partial_sum"),
      plan.take(3000))
    assert(!plan.contains("Window"), plan.take(3000))
  }
}
