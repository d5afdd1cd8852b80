package graft

import org.apache.spark.sql.functions.col

/** Whole-operator wall for the bucketed embed route per probeMargin —
  * the §8.4.8 sweep's cost column. EmbedRecallSmoke measures the
  * route's QUALITY per margin against its own cell assignment; this
  * main prices the margin's replication in the one place it actually
  * costs: the (cluster, shard) pair join of `ddEmbedCosine` end to
  * end (the assignment pass is margin-invariant, measured ~flat
  * 10–11 s at 0.41M vectors).
  *
  * Run over an existing corpus (e.g. the EmbedRecallSmoke cache):
  *   tools/runmain.sh graft.EmbedOpBench \
  *     [dir=target/embed-recall-smoke] [iters=3] [margin,margin,...]
  * Prints per-margin per-iter walls + min/med; margins run
  * interleaved (m1 m2 ... m1 m2 ...) so host drift hits all arms.
  */
object EmbedOpBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/embed-recall-smoke")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val margins = args.lift(2).map(_.split(",").toSeq.map(_.toDouble))
      .getOrElse(Seq(0.0, 0.01))
    val spark = Graft.sessionBuilder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SCALE_SMOKE_PARTITIONS", "64"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("graft.embedCosine.exactMax", "0")
    def one(m: Double): Double = {
      spark.conf.set("graft.embedCosine.probeMargin", m.toString)
      val t0 = System.nanoTime()
      graft.functions.Dedup.ddEmbedCosine(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    margins.foreach(one) // warm codegen/listing per arm, untimed
    val walls = (1 to iters).flatMap(_ => margins.map(m => m -> one(m)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    margins.foreach { m =>
      val s = walls(m).sorted
      println(f"margin $m%.3f  min ${s.head}%.1f  med ${s(s.size / 2)}%.1f  " +
        s.map(w => f"$w%.1f").mkString("[", " ", "]"))
    }
    spark.stop()
  }
}
