package graft

import graft.queries.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proves the bucketed-ingest → exchange-free-join property from the
  * physical plan, and that results are identical to the shuffled join. */
class BucketingSpec extends AnyFunSuite {
  import SparkTestSession.sf

  // Own session (shared context, ISOLATED SQLConf): this suite disables
  // the broadcast threshold, which must not leak into concurrently
  // running suites that assert broadcast plans.
  private lazy val spark = SparkTestSession.spark.newSession()

  test("partitioned ingest: pruned dirs, bounded files, no small-file explosion") {
    val out = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val docs = Tables.t(spark, sf, "documents")
    graft.queries.Ingest.writePartitioned(docs, out,
      partitionCols = Seq("lang"), maxRecordsPerFile = 100, sortCols = Seq("doc_id"))
    // directory partitioning by the pruning column
    val langDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("lang=")).map(_.getName).toSet
    assert(langDirs.nonEmpty)
    // bounded file sizes: no parquet file above the record cap
    val reread = spark.read.parquet(out)
    assert(reread.count() == docs.count())
    import org.apache.spark.sql.functions.{count, input_file_name}
    val perFile = reread.groupBy(input_file_name()).agg(count("*").as("n"))
      .collect().map(_.getLong(1))
    assert(perFile.forall(_ <= 100), s"file over cap: ${perFile.max}")
    // partition pruning visible in the plan
    val pruned = reread.where(org.apache.spark.sql.functions.col("lang") === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("lang"), plan.take(2000))
  }

  test("bucketed fact-fact join plans without any exchange") {
    val li = Tables.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = Tables.t(spark, sf, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"), col("o_totalprice"))

    Bucketing.writeBucketed(li, "li_b", "l_orderkey", 8)
    Bucketing.writeBucketed(o, "o_b", "l_orderkey", 8)
    // At sf0.001 the planner would just broadcast orders; the scenario
    // bucketing exists for is the one where BOTH sides are fact-scale
    // and nothing broadcasts — model it by disabling the threshold.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.colocatedJoin(spark, "li_b", "o_b", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(3000))
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        plan.take(3000))

      // identical result to the plain shuffled join
      val expected = li.join(o, "l_orderkey").count()
      assert(joined.count() == expected)

      // and a bucketed groupBy on the bucket key also skips the shuffle
      val agg = spark.table("li_b").groupBy("l_orderkey")
        .agg(sum("l_quantity"))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
