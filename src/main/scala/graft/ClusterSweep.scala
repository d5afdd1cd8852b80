package graft

/** Full-registry multi-executor sweep (round 16, r15 brief item 5):
  * EVERY `SparkEntry.queries` entry runs under a real multi-executor
  * master (local-cluster, `spark.jars` deployment) and its row count
  * is compared against a local[*] run of the same corpus in the same
  * JVM. ClusterSmoke covers the serialization-sensitive embed/IVF
  * family in depth; this sweep pins every OTHER operator's
  * task-binary path against the classloader landmine ClusterSmoke
  * documents (SURVEY §8.4.10): graft classes must ship as a user jar
  * — never via executor extraClassPath — or Spark 4.1.2 task
  * deserialization breaks on any plan fragment carrying a graft
  * expression.
  *
  * Row-count equality (not hash equality) is the right check here:
  * the correctness gate already hash-matches local[*] against the
  * DuckDB oracle; what a multi-executor master can break is task
  * execution itself (deserialization, classloading, shuffle), which
  * surfaces as a crash or a wrong cardinality, not a silently
  * permuted value.
  *
  * Run (jar must be current):
  *   sbt package && SPARK_SCALA_VERSION=2.13 \
  *     tools/runmain.sh graft.ClusterSweep [sfDir]
  */
object ClusterSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val master = sys.env.getOrElse("SCALE_SMOKE_MASTER",
      "local-cluster[2,16,6144]")

    def runAll(spark: org.apache.spark.sql.SparkSession,
        tag: String): Map[String, Either[String, Long]] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val res =
          try Right(fn(spark, dir).count())
          catch { case scala.util.control.NonFatal(e) =>
            Left((String.valueOf(e.getClass.getSimpleName) + ": " +
              String.valueOf(e.getMessage).takeWhile(_ != '\n')).take(200))
          }
        println(f"[$tag] $name%-28s ${
          res.fold("FAILED " + _, c => f"$c%10d")}  ${
          (System.nanoTime() - t0) / 1e9}%5.1f s")
        name -> res
      }.toMap

    // resolve the jar BEFORE the local phase: a missing/stale jar
    // should fail in a second, not after a full local[*] sweep
    val jar = ClusterJar.resolve()

    // phase 1: the local[*] reference counts
    val local = Graft.sessionBuilder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    local.sparkContext.setLogLevel("ERROR")
    println(s"== phase 1: local[32] reference on $dir " +
      s"(${SparkEntry.queries.size} queries)")
    val ref = runAll(local, "local")
    local.stop()
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()

    // phase 2: the same registry under local-cluster + spark.jars
    val opens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")
    val cluster = Graft.sessionBuilder().master(master)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.jars", jar)
      .config("spark.executor.extraJavaOptions", opens)
      .config("spark.executor.memory",
        sys.env.getOrElse("SCALE_SMOKE_EXEC_MEM", "6g"))
      .getOrCreate()
    cluster.sparkContext.setLogLevel("ERROR")
    println(s"== phase 2: $master with spark.jars=$jar")
    val got = runAll(cluster, "cluster")
    cluster.stop()

    var bad = 0
    ref.keys.toSeq.sorted.foreach { name =>
      (ref(name), got(name)) match {
        case (Right(a), Right(b)) if a == b => ()
        case (a, b) =>
          bad += 1
          println(s"MISMATCH $name: local=$a cluster=$b")
      }
    }
    println(s"== ${ref.size - bad}/${ref.size} row counts match " +
      s"between local[32] and $master")
    if (bad > 0) sys.exit(1)
  }
}
