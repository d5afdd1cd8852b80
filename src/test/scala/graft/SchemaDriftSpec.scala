package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus schema-drift smoke: the driver regenerates `/root/testdata`
  * between rounds, and round 9 lost 8 gate queries + 9 tests to a silent
  * events.ts TIMESTAMP(NANOS)→TIMESTAMP(MICROS) flip that surfaced as
  * nine unrelated analysis errors. This suite pins the POST-LOAD schema
  * of every table in every SF dir in one place, so the next regeneration
  * fails here with `table.field: found X, expected Y` — and exercises
  * every branch of `Tables.adaptTs` against synthetic files so the
  * adaptive loader itself stays covered whichever way the corpus is
  * currently written. */
class SchemaDriftSpec extends AnyFunSuite {
  import SparkTestSession.spark

  // `TS` = normalized (must load as TIMESTAMP); `TS_ANY` = either
  // timestamp flavor accepted (the TPC-H date columns are green as
  // loaded and only healed if written as nanos).
  private val TS = Set("TIMESTAMP")
  private val TS_ANY = Set("TIMESTAMP", "TIMESTAMP_NTZ")
  private def one(sql: String) = Set(sql)

  private val expected: Map[String, Seq[(String, Set[String])]] = Map(
    "region" -> Seq("r_regionkey" -> one("INT"), "r_name" -> one("STRING")),
    "nation" -> Seq("n_nationkey" -> one("INT"), "n_name" -> one("STRING"),
      "n_regionkey" -> one("INT")),
    "customer" -> Seq("c_custkey" -> one("BIGINT"), "c_name" -> one("STRING"),
      "c_nationkey" -> one("INT"), "c_acctbal" -> one("DOUBLE"),
      "c_mktsegment" -> one("STRING")),
    "supplier" -> Seq("s_suppkey" -> one("BIGINT"), "s_name" -> one("STRING"),
      "s_nationkey" -> one("INT"), "s_acctbal" -> one("DOUBLE")),
    "part" -> Seq("p_partkey" -> one("BIGINT"), "p_name" -> one("STRING"),
      "p_brand" -> one("STRING"), "p_type" -> one("STRING"),
      "p_size" -> one("INT"), "p_retailprice" -> one("DOUBLE")),
    "orders" -> Seq("o_orderkey" -> one("BIGINT"), "o_custkey" -> one("BIGINT"),
      "o_orderstatus" -> one("STRING"), "o_totalprice" -> one("DOUBLE"),
      "o_orderdate" -> TS_ANY, "o_orderpriority" -> one("STRING")),
    "lineitem" -> Seq("l_orderkey" -> one("BIGINT"), "l_partkey" -> one("BIGINT"),
      "l_suppkey" -> one("BIGINT"), "l_linenumber" -> one("INT"),
      "l_quantity" -> one("DOUBLE"), "l_extendedprice" -> one("DOUBLE"),
      "l_discount" -> one("DOUBLE"), "l_tax" -> one("DOUBLE"),
      "l_returnflag" -> one("STRING"), "l_linestatus" -> one("STRING"),
      "l_shipdate" -> TS_ANY),
    "events" -> Seq("event_id" -> one("BIGINT"), "ts" -> TS,
      "user_id" -> one("BIGINT"), "event_type" -> one("STRING"),
      "value" -> one("DOUBLE"), "props" -> one("STRING")),
    "documents" -> Seq("doc_id" -> one("BIGINT"), "text" -> one("STRING"),
      "lang" -> one("STRING"), "source" -> one("STRING"),
      "n_chars" -> one("BIGINT")),
    "embeddings" -> Seq("vec_id" -> one("BIGINT"),
      "embedding" -> one("ARRAY<FLOAT>"), "label" -> one("INT")))

  private val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1")
    .map(s => s"/root/testdata/$s")
    .filter(d => new java.io.File(d).isDirectory)

  test("every table in every SF dir loads with the pinned post-load schema") {
    assume(sfDirs.nonEmpty, "/root/testdata missing — drift smoke needs the corpus")
    val drift = for {
      dir <- sfDirs
      (table, fields) <- expected.toSeq
      // a table the adaptive loader itself rejects (or a missing ts
      // column crashing the adapt step) must become ONE report line,
      // not abort the sweep and mask every later table's drift
      problem <- scala.util.Try(Tables.t(spark, dir, table).schema) match {
        case scala.util.Failure(e) =>
          Seq(s"$dir $table: LOAD FAILED — ${e.getMessage}")
        case scala.util.Success(loaded) =>
          val byName = loaded.fields.map(f => f.name -> f.dataType.sql).toMap
          val missing = fields.collect {
            case (n, _) if !byName.contains(n) => s"$dir $table.$n: MISSING"
          }
          val wrong = fields.collect {
            case (n, ok) if byName.contains(n) && !ok(byName(n)) =>
              s"$dir $table.$n: found ${byName(n)}, expected ${ok.mkString("|")}"
          }
          val extra = (byName.keySet -- fields.map(_._1)).toSeq.sorted
            .map(n => s"$dir $table.$n: UNEXPECTED column (${byName(n)})")
          missing ++ wrong ++ extra
      }
    } yield problem
    assert(drift.isEmpty,
      "corpus schema drifted — fix Tables.adaptTs / update this pin:\n" +
        drift.mkString("\n"))
  }

  // ---- adaptive events loader: all branches on synthetic files ----

  private def writeAndLoad(mk: org.apache.spark.sql.DataFrame): Long = {
    val dir = java.nio.file.Files.createTempDirectory("drift-ts").toString
    mk.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Tables.t(spark, dir, "events")
    assert(out.schema("ts").dataType == TimestampType,
      s"normalized events.ts should be TIMESTAMP, got ${out.schema("ts").dataType}")
    out.select(unix_micros(col("ts"))).head.getLong(0)
  }

  private val micros = 123456789L // 1970-01-01T00:02:03.456789Z

  test("events loader heals a nanos-written file (LongType branch)") {
    // a REAL TIMESTAMP(NANOS)-annotated file (NanosParquet — Spark can't
    // write one; the driver's pyarrow generator can): nanosAsLong
    // surfaces it as BIGINT and the loader must divide to µs — and the
    // footer guard must let it through, because the annotation is there
    val dir = java.nio.file.Files.createTempDirectory("drift-ts").toString
    NanosParquet.writeEvents(s"$dir/events.parquet",
      Seq((1L, micros * 1000L, 7L, "click", 1.0, "{}")))
    val out = Tables.t(spark, dir, "events")
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros(col("ts"))).head.getLong(0) == micros)
  }

  test("events loader rejects a plain-INT64 ts (no logical annotation)") {
    // the 1000×-shift drift class the footer guard exists for: a
    // regenerated corpus writing unannotated INT64 (micros, say) ALSO
    // loads as BIGINT, and decoding it as nanos would silently shift
    // every instant — the guard must throw the drift message instead
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("drift-ts").toString
    Seq((1L, micros)).toDF("event_id", "ts")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Tables.t(spark, dir, "events"))
    assert(e.getMessage.contains("NANOS") && e.getMessage.contains("drifted"),
      e.getMessage)
  }

  test("events loader normalizes a micros-written file (TIMESTAMP_NTZ branch)") {
    // the graft session reads micros files natively as TIMESTAMP
    // (inferTimestampNTZ off — see Tables.configure); force inference
    // back on so the NTZ fallback branch stays exercised for sessions
    // that run with Spark's default
    import spark.implicits._
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try {
      val got = writeAndLoad(Seq(Tuple1(1L)).toDF("event_id")
        .withColumn("ts", to_timestamp_ntz(lit("1970-01-01 00:02:03.456789"))))
      assert(got == micros)
    } finally
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
  }

  test("micros corpus loads ts natively: no cast above the scan, range filter pushes down") {
    // the 100 TB contract behind inferTimestampNTZ=false: a time-range
    // predicate on events.ts must reach the parquet reader as a pushed
    // filter (row-group pruning on event time), which a cast-wrapped
    // column disqualifies. Guarded on the corpus actually being
    // micros-written (a future nanos regeneration re-enters the
    // convert branch, where pushdown is structurally unavailable).
    val dir = sfDirs.headOption.getOrElse(fail("no sf dirs"))
    val df = Tables.t(spark, dir, "events")
      .where(col("ts") >= lit("2024-01-01 00:00:00").cast(TimestampType))
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec leaf"))
    assume(scan.schema.exists(f => f.name == "ts" &&
      f.dataType == TimestampType), "corpus not micros-written — skip")
    assert(scan.metadata("PushedFilters").contains("GreaterThanOrEqual(ts"),
      s"ts range filter not pushed: ${scan.metadata("PushedFilters")}")
  }

  test("events loader passes through an instant-written file (TIMESTAMP branch)") {
    import spark.implicits._
    val got = writeAndLoad(Seq(Tuple1(1L)).toDF("event_id")
      .withColumn("ts", timestamp_micros(lit(micros))))
    assert(got == micros)
  }

  test("events loader rejects an unrecognized ts type with a clear message") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("drift-ts").toString
    Seq((1L, "not-a-timestamp")).toDF("event_id", "ts")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Tables.t(spark, dir, "events"))
    assert(e.getMessage.contains("events.ts") && e.getMessage.contains("drifted"))
  }
}
