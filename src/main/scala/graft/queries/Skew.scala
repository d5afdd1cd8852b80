package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins.
  *
  * First line of defense is AQE's skew-join split
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default in Spark 4):
  * it splits oversized partitions of a sort-merge join at runtime.
  * Salting is the explicit fallback for the cases AQE can't fix —
  * e.g. one pathological key receiving most of the stream when the
  * other side can't broadcast: the skewed side spreads each hot key
  * over `factor` sub-keys, the build side replicates each row
  * `factor` times, and the join runs on `(key, salt)` so the hot key's
  * rows land on `factor` different reducers.
  *
  * Cost model: replicating the build side multiplies ITS shuffle by
  * `factor` — worth it only when the probe side's hot key dominates;
  * prefer bounding `factor` to the observed skew ratio and salting
  * ONLY the known-hot keys (`saltedJoinHotKeys`) at very large scale.
  */
object Skew {

  /** Full salted equi-join: probe side salted deterministically from
    * `saltSource` (any per-row expression — a unique id keeps the salt
    * stable across task retries), build side replicated `factor`×. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      factor: Int, saltSource: Column): DataFrame = {
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(factor.toLong)))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(factor.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Salt only the listed hot keys; everything else joins unsalted.
    * The build side replicates only its hot-key rows — the shape that
    * stays cheap when 99.9% of keys are well-behaved. */
  def saltedJoinHotKeys(probe: DataFrame, build: DataFrame, key: String,
      hotKeys: Seq[Any], factor: Int, saltSource: Column): DataFrame = {
    val isHot = col(key).isin(hotKeys: _*)
    val saltedProbe = probe.withColumn("__salt",
      when(isHot, pmod(xxhash64(saltSource), lit(factor.toLong))).otherwise(lit(0L)))
    val saltedBuild = build.withColumn("__salt",
      explode(when(isHot, sequence(lit(0L), lit(factor.toLong - 1)))
        .otherwise(array(lit(0L)))))
    saltedProbe.join(saltedBuild, Seq(key, "__salt")).drop("__salt")
  }
}
