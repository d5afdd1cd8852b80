package graft

import graft.queries.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted joins must be RESULT-identical to the plain join while
  * spreading the hot key across reducers. */
class SkewSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  // 10k probe rows, 80% on key 0 (the hot key), build side 20 keys.
  private lazy val probe = spark.range(10000)
    .select(col("id"),
      when(col("id") % 5 =!= 0, lit(0L)).otherwise(col("id") % 20).as("k"))
  private lazy val build = spark.range(20)
    .select(col("id").as("k"), concat(lit("dim-"), col("id")).as("name"))

  test("saltedJoin equals the plain join and salts into `factor` sub-keys") {
    val plain = probe.join(build, "k").select("id", "name")
    val salted = Skew.saltedJoin(probe, build, "k", 8, col("id"))
      .select("id", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the hot key's probe rows really spread over multiple salts
    val spread = probe.withColumn("__salt", pmod(xxhash64(col("id")), lit(8L)))
      .where(col("k") === 0).select("__salt").distinct().count()
    assert(spread == 8L)
  }

  test("saltedJoinHotKeys salts only the hot key and matches the plain join") {
    val plain = probe.join(build, "k").select("id", "name")
    val salted = Skew.saltedJoinHotKeys(probe, build, "k",
      hotKeys = Seq(0L), factor = 8, saltSource = col("id"))
      .select("id", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("AQE skew-join split is enabled in the session") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
  }
}
