package graft

import org.apache.spark.sql.functions._
import graft.functions.{Similarity, TopKAgg, VectorOps}

/** Quality pre-measurement for the ONE-SIDED probe candidate
  * (SURVEY §8.4.8b forward note) against the shipped two-sided
  * design, at CLUSTER granularity, from the assignment data alone —
  * the shipped operator is not touched.
  *
  * Designs compared on the same top-2 assignment:
  *  - two-sided (shipped): vector joins second cell iff margin ≤ pm
  *  - one-sided: … iff margin ≤ pm AND c2 < c1 (at most one common
  *    cell per pair, no dedup conjunct, ~half the replication)
  * A planted pair is recovered iff the sides' cell sets intersect.
  * Shard effects are ignored here (the ≥4M `maxCell` regime is
  * measured separately, §8.4.8b) — this isolates the design question:
  * how much margin does one-sided need to match two-sided recovery,
  * and at what replication?
  *
  * Run over a cached EmbedRecallSmoke corpus:
  *   tools/runmain.sh graft.ProbeDesignSmoke \
  *     [dir=target/embed-recall-smoke] [pm,pm,...]
  */
object ProbeDesignSmoke {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/embed-recall-smoke")
    val margins = args.lift(1).map(_.split(",").toSeq.map(_.toDouble))
      .getOrElse(Seq(0.005, 0.01, 0.015, 0.02, 0.03))
    val spark = Graft.sessionBuilder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SCALE_SMOKE_PARTITIONS", "64"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // top-2 assignment exactly as ivfProbedParts computes it
    val (e, cents, _) = Similarity.ivfParts(spark, dir)
    val top2 = e.join(broadcast(cents))
      .select(col("vec_id"),
        (VectorOps.dot(col("v"), col("cv")) /
          (col("nrm") * col("cn"))).as("c_cos"), col("c_id"))
      .groupBy("vec_id")
      .agg(TopKAgg.topk(col("c_cos"), col("c_id"), 2).as("tk"))
      .select(col("vec_id"),
        get(col("tk"), lit(0)).getField("id").as("c1"),
        get(col("tk"), lit(1)).getField("id").as("c2"),
        (get(col("tk"), lit(0)).getField("score") -
          get(col("tk"), lit(1)).getField("score")).as("margin"))
      .cache()
    val n = top2.count()
    println(s"assignment: $n vectors")

    // corpus-wide replication per margin, both designs
    val replCols = margins.flatMap(pm => Seq(
      avg((col("margin") <= pm).cast("double")).as(f"two_$pm%.3f"),
      avg((col("margin") <= pm && col("c2") < col("c1")).cast("double"))
        .as(f"one_$pm%.3f")))
    val repl = top2.agg(replCols.head, replCols.tail: _*).head
    margins.zipWithIndex.foreach { case (pm, i) =>
      println(f"pm $pm%.3f  extra rows: two-sided ${repl.getDouble(2 * i)}%.3f  " +
        f"one-sided ${repl.getDouble(2 * i + 1)}%.3f")
    }

    def side(idCol: String, p: String) = top2.select(
      col("vec_id").as(idCol), col("c1").as(s"c1$p"),
      col("c2").as(s"c2$p"), col("margin").as(s"m$p"))
    val pairs = spark.read.parquet(s"$dir/pairs")
      .join(side("base_id", "a"), "base_id")
      .join(side("partner_id", "b"), "partner_id")
      .cache()

    def probed(p: String, pm: Double, oneSided: Boolean) = {
      val gate = if (oneSided)
        col(s"m$p") <= pm && col(s"c2$p") < col(s"c1$p")
      else col(s"m$p") <= pm
      when(gate, array(col(s"c1$p"), col(s"c2$p")))
        .otherwise(array(col(s"c1$p")))
    }
    println("tier  " + margins.map(pm => f"two$pm%.3f one$pm%.3f").mkString("  "))
    val cols = margins.flatMap { pm => Seq(
      avg(size(array_intersect(probed("a", pm, false),
        probed("b", pm, false)) ) .gt(0).cast("double")).as(f"t$pm"),
      avg(size(array_intersect(probed("a", pm, true),
        probed("b", pm, true))).gt(0).cast("double")).as(f"o$pm")) }
    pairs.groupBy("tier").agg(cols.head, cols.tail: _*)
      .orderBy("tier").collect().foreach { r =>
        println(f"${r.getInt(0)}%4d  " + margins.indices.map(i =>
          f"${1 - r.getDouble(1 + 2 * i)}%.4f ${1 - r.getDouble(2 + 2 * i)}%.4f")
          .mkString("   ") + "   (miss rates)")
      }
    spark.stop()
  }
}
