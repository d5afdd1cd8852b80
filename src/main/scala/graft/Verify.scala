package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Graft.sessionBuilder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Preflight: surface corpus schema drift as ONE clear message instead
    // of N per-query analysis failures (the driver regenerates testdata
    // between rounds; round 9 lost 8 gate queries to a silent nanos→micros
    // flip diagnosed one stack trace at a time). NonFatal only: an OOM or
    // linkage error here means the JVM is dying, not that a table drifted.
    import scala.util.control.NonFatal
    val drifted = Tables.names.flatMap { n =>
      try { Tables.t(spark, sfDir, n).schema; None }
      catch { case NonFatal(e) =>
        System.err.println(s"[verify] SCHEMA DRIFT in table $n: ${e.getMessage}")
        Some(n)
      }
    }
    if (drifted.nonEmpty)
      System.err.println(s"[verify] preflight failed for table(s) " +
        s"${drifted.mkString(", ")} — per-query failures below that " +
        "mention these tables are the SAME drift, not new bugs")
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case NonFatal(e) =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
