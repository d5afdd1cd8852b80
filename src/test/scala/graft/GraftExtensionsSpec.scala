package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface a library user sees: extension-injected native
  * functions + corpus views, pure `spark.sql`. */
class GraftExtensionsSpec extends AnyFunSuite {
  import SparkTestSession.{sf, spark}

  test("extension functions are callable from SQL") {
    val row = spark.sql(
      """SELECT rolling_hash('hello') AS rh,
        |       shingles3('a b c d') AS sh,
        |       dot_f64(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot,
        |       json_path_extract('{"k": 7}', '$.k') AS jp,
        |       cdc_chunks('a b c') AS cc""".stripMargin)
      .collect()(0)
    assert(row.getLong(0) ==
      "hello".getBytes("UTF-8").foldLeft(0L)((a, b) => (a * 131 + (b & 0xff)) % 1000000007L))
    assert(row.getSeq[String](1) == Seq("a b c", "b c d"))
    assert(row.getDouble(2) == 11.0)
    assert(row.getSeq[String](3) == Seq("7"))
    assert(row.getSeq[String](4) == Seq("a b c")) // < 5 tokens: one chunk
  }

  test("wrong arity fails at analysis time, not execution time") {
    val e = intercept[Exception](spark.sql("SELECT rolling_hash('a', 'b')"))
    assert(e.getMessage.contains("expects exactly 1"))
    val e2 = intercept[Exception](spark.sql("SELECT rolling_hash(42)").collect())
    assert(e2.getMessage.toLowerCase.contains("type") ||
      e2.getMessage.contains("DATATYPE_MISMATCH"), e2.getMessage)
  }

  test("SQL sketch aggregates plan hash-based with many groups") {
    // minhash32/simhash64 are TypedImperativeAggregates, which only
    // hash-aggregate through ObjectHashAggregateExec — and that exec's
    // DEFAULT config falls back to sort-based aggregation after 128
    // distinct keys per task, silently re-sorting any many-group
    // sketch aggregation (the same failure shape the IVF assignment
    // had with min_by). Tables.configure raises the threshold; this
    // pins the plan a library user's GROUP BY doc_id actually gets.
    Graft.registerTables(spark, sf)
    val df = spark.sql(
      """SELECT doc_id, minhash32(sh) AS mh FROM (
        |  SELECT doc_id, explode(shingles3(text)) AS sh FROM documents)
        |GROUP BY doc_id""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
    assert(!plan.contains("SortAggregate"), plan.take(2000))
    // 256k: covers the IVF N-distinct-keys-per-task case (~16k at the
    // 500× smoke) with a wide margin, while keeping a ceiling for
    // library users' own UNBOUNDED collect_list buffers — the memory
    // guard the 128 default exists for (round-9 advice)
    assert(spark.conf.get(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold").toInt
      == (1 << 18))
  }

  test("registered corpus views answer SQL end to end") {
    Graft.registerTables(spark, sf)
    val n = spark.sql(
      """SELECT count(*) FROM lineitem l JOIN orders o
        |ON l.l_orderkey = o.o_orderkey""".stripMargin).collect()(0).getLong(0)
    assert(n > 0)
    // custom expression over a registered view
    val fp = spark.sql(
      "SELECT doc_id, rolling_hash(text) AS h FROM documents ORDER BY doc_id LIMIT 3")
      .collect()
    assert(fp.length == 3 && fp.forall(!_.isNullAt(1)))
  }
}
