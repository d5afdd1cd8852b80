package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the §8.4.10 deployment precondition so a refactor cannot
  * silently re-arm the landmine: every multi-executor main resolves
  * its `spark.jars` artifact through [[ClusterJar.resolve]], which
  * must fail LOUDLY when the packaged jar is missing (the
  * extraClassPath-era failure was an unrelated-looking executor
  * ClassCastException hours later) or STALE (old classes on
  * executors vs current driver classes — confusing divergence, the
  * r12 advisory's "stale jar" trap). */
class ClusterJarSpec extends AnyFunSuite {

  private def tmp(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("cluster-jar")

  test("missing jar fails loudly and names the deployment rule") {
    val d = tmp()
    val e = intercept[IllegalArgumentException] {
      ClusterJar.resolve(s"$d/absent.jar", s"$d/classes")
    }
    assert(e.getMessage.contains("sbt package") &&
      e.getMessage.contains("spark.jars"),
      s"message must say how to fix and why: ${e.getMessage}")
  }

  test("stale jar (older than newest class file) is refused") {
    val d = tmp()
    val jar = java.nio.file.Files.createFile(d.resolve("app.jar"))
    val classes = java.nio.file.Files.createDirectories(
      d.resolve("classes/graft"))
    val cls = java.nio.file.Files.createFile(classes.resolve("A.class"))
    // the jar predates the class file by a full minute — no mtime
    // granularity flake
    java.nio.file.Files.setLastModifiedTime(jar,
      java.nio.file.attribute.FileTime.fromMillis(
        java.nio.file.Files.getLastModifiedTime(cls).toMillis - 60000L))
    val e = intercept[IllegalStateException] {
      ClusterJar.resolve(jar.toString, d.resolve("classes").toString)
    }
    assert(e.getMessage.contains("OLDER") &&
      e.getMessage.contains("sbt package"), e.getMessage)
  }

  test("fresh jar resolves; no classes dir means nothing to compare") {
    val d = tmp()
    val classes = java.nio.file.Files.createDirectories(
      d.resolve("classes/graft"))
    val cls = java.nio.file.Files.createFile(classes.resolve("A.class"))
    val jar = java.nio.file.Files.createFile(d.resolve("app.jar"))
    java.nio.file.Files.setLastModifiedTime(jar,
      java.nio.file.attribute.FileTime.fromMillis(
        java.nio.file.Files.getLastModifiedTime(cls).toMillis + 60000L))
    assert(ClusterJar.resolve(jar.toString,
      d.resolve("classes").toString) == jar.toString)
    assert(ClusterJar.resolve(jar.toString, s"$d/no-such-dir") ==
      jar.toString)
  }
}
