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
  *     [dir=target/embed-recall-smoke] [iters=3] [margin,...] [cap,...]
  * Prints per-arm per-iter walls + min/med; arms (margin × cap) run
  * interleaved (a1 a2 ... a1 a2 ...) so host drift hits all arms.
  * A cap of -1 means the corpus-aware default. The cap arm (round 16)
  * prices the measured-cell advisory's own advice: on a skewed corpus
  * the advisory says "raise graft.embedCosine.maxCell past the
  * measured max cell" — this measures what that raise costs on the
  * pair join (per-task pair budget ~maxCell²/2), so §8.4.8e can quote
  * loss AND price for the same corpus.
  */
object EmbedOpBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/embed-recall-smoke")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val margins = args.lift(2).map(_.split(",").toSeq.map(_.toDouble))
      .getOrElse(Seq(0.0, 0.01))
    val caps = args.lift(3).map(_.split(",").toSeq.map(_.toLong))
      .getOrElse(Seq(-1L))
    val spark = Graft.sessionBuilder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SCALE_SMOKE_PARTITIONS", "64"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("graft.embedCosine.exactMax", "0")
    val arms = for (m <- margins; c <- caps) yield (m, c)
    def one(arm: (Double, Long)): Double = {
      spark.conf.set("graft.embedCosine.probeMargin", arm._1.toString)
      if (arm._2 > 0)
        spark.conf.set("graft.embedCosine.maxCell", arm._2.toString)
      else spark.conf.unset("graft.embedCosine.maxCell")
      val t0 = System.nanoTime()
      graft.functions.Dedup.ddEmbedCosine(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    arms.foreach(one) // warm codegen/listing per arm, untimed
    val walls = (1 to iters).flatMap(_ => arms.map(a => a -> one(a)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    arms.foreach { case a @ (m, c) =>
      val s = walls(a).sorted
      println(f"margin $m%.3f cap ${if (c > 0) c.toString else "default"}%-8s" +
        f"  min ${s.head}%.1f  med ${s(s.size / 2)}%.1f  " +
        s.map(w => f"$w%.1f").mkString("[", " ", "]"))
    }
    spark.stop()
  }
}
