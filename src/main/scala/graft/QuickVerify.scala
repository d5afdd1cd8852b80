package graft
import java.nio.file.{Files, Paths}

/** Dev-loop subset of [[Verify]]: dump only the named queries (plus their
  * oracle SQL) so `tools/check_correctness.py` can gate a single operator
  * without re-running all of SparkEntry.queries.
  *
  * Usage: sbt "runMain graft.QuickVerify <sfDir> <outDir> <name> [<name>...]"
  */
object QuickVerify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Graft.sessionBuilder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, sfDir, outDir, names)
    spark.stop()
  }

  /** The dump body, callable on a caller-owned session (EdgeGateSpec
    * runs it on the shared test session — `main` would stop it). */
  def run(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      outDir: String, names: Set[String]): Unit = {
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(kv => names(kv._1)).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      println(f"[quick] $name dumped in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => names(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}
