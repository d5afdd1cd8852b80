package graft
import org.apache.spark.sql.functions.{col, sum => fsum}

/** Focused per-query micro-bench for A/B experiments across builds:
  *   sbt "runMain graft.QueryBench <iters> <query,query,...>"
  * Runs each named `SparkEntry.queries` entry <iters> times after a
  * warmup pass and prints every wall plus min/median — a
  * drift-resistant companion to Bench's whole-suite min-of-3 when one
  * operator's cost is in question (the whole suite's noise floor on a
  * shared box is larger than a single query's regression).
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(5)
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("dd_simhash_wide"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = Graft.sessionBuilder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    // QUERY_BENCH_CONF="k=v;k=v" — session confs that must be set at
    // context build (e.g. spark.io.compression.codec=zstd for the codec
    // A/B; core confs are not settable via spark.conf.set at runtime).
    // ';' separates entries, so values must not contain ';'.
    sys.env.get("QUERY_BENCH_CONF").foreach(_.split(";").foreach { kv =>
      require(kv.contains("="),
        s"bad QUERY_BENCH_CONF entry '$kv': expected k=v;k=v")
      val Array(k, v) = kv.split("=", 2); builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).select(col("id") % 97 as "k", col("id") as "v")
      .groupBy("k").agg(fsum("v")).count()
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).count() // warm (codegen + file listing)
      val walls = (1 to iters).map { _ =>
        val t0 = System.nanoTime(); fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val s = walls.sorted
      println(f"$n%-24s min ${s.head}%.3f  med ${s(s.size / 2)}%.3f  " +
        walls.map(w => f"$w%.2f").mkString("[", " ", "]"))
    }
    spark.stop()
  }
}
