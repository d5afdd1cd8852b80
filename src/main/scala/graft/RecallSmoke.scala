package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** IVF recall-at-scale measurement (SURVEY §8.4.6).
  *
  * The operator's quality contract — recall ≥ 0.8 vs exact brute force
  * — was pinned only at the gate SFs (≤ ~2k vectors), while the probed
  * fraction nprobe/√N SHRINKS as the corpus grows: nothing detected
  * recall decay at 100×+. This smoke measures it directly: replicate
  * the sf0.1 embeddings ×factor with per-copy deterministic
  * perturbation (amplitudes spread over 0.02–1.0, so a query's true
  * neighbor list mixes tight near-dups with essentially-fresh random
  * vectors — nontrivial for IVF, computable exactly), then compute
  * per-query top-10 overlap between [[graft.functions.Similarity]]'s
  * IVF path and the exact scan over a sampled query set, per nprobe.
  *
  *   sbt "runMain graft.RecallSmoke [factor] [nprobe,nprobe,...] [nQueries]"
  *
  * Prints one line per nprobe: mean/min recall and the probed fraction
  * nprobe/√N — the table SURVEY §8.4.6 records.
  */
object RecallSmoke {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(20)
    val nprobes = args.lift(1).map(_.split(",").toSeq.map(_.toInt))
      .getOrElse(Seq(6, 12, 24, 48))
    val nQueries = args.lift(2).map(_.toInt).getOrElse(100)
    val parts = sys.env.getOrElse("SCALE_SMOKE_PARTITIONS", "64")
    val spark = Graft.sessionBuilder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val big = "target/recall-smoke"

    // embeddings ×factor: copy 0 verbatim (the query population), copies
    // k ≥ 1 perturbed per-element with a deterministic hash noise whose
    // amplitude cycles 0.02…1.0 by copy — small amplitudes create tight
    // near-dup clusters (the easy, realistic case: corpora cluster),
    // large ones essentially fresh random vectors (the hard case: the
    // true top-10 spreads across Voronoi cells). Noise is a pure
    // function of (vec_id, element index), so the corpus is
    // reproducible run to run.
    val e = Tables.t(spark, src, "embeddings")
    val ne = Option(e.agg(max("vec_id")).head.getAs[Number](0))
      .map(_.longValue + 1).getOrElse(0L)
    val amp = (col("copy") % 7).cast("double") / 7.0 * 0.98 + 0.02
    e.crossJoin(spark.range(factor).select(col("id").as("copy")))
      .select((col("vec_id") + col("copy") * ne).as("vec_id"),
        when(col("copy") === 0, col("embedding"))
          .otherwise(transform(col("embedding"), (x, i) =>
            (x + ((pmod(xxhash64(col("vec_id"), col("copy"), i), lit(2001))
              - 1000).cast("double") / 1000.0 * amp).cast("float"))
              .cast("float"))).as("embedding"),
        col("label"))
      .write.mode("overwrite").parquet(s"$big/embeddings.parquet")
    val nVecs = spark.read.parquet(s"$big/embeddings.parquet").count()
    val kCents = math.round(math.sqrt(nVecs.toDouble))
    println(s"corpus: $nVecs vectors (${factor}x sf0.1), ~$kCents centroids, " +
      s"$nQueries queries")

    import graft.functions.Similarity
    // exact ground truth once per factor; IVF once per nprobe
    val t0 = System.nanoTime()
    val exact = Similarity.ssCosineTopK(spark, big, nQueries)
      .select(col("q_id"), col("cand_id")).cache()
    val nExact = exact.count()
    println(f"exact ground truth: $nExact rows " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    nprobes.foreach { np =>
      val t1 = System.nanoTime()
      val ivf = Similarity.ssIvfTopK(spark, big, np, nQueries)
        .select(col("q_id"), col("cand_id"))
      val per = exact.join(ivf, Seq("q_id", "cand_id"))
        .groupBy("q_id").agg(count(lit(1)).as("hit"))
      val stats = exact.groupBy("q_id").agg(count(lit(1)).as("n"))
        .join(per, Seq("q_id"), "left")
        .select(col("q_id"), (coalesce(col("hit"), lit(0L)) /
          col("n")).as("recall"))
        .agg(avg("recall").as("mean"), min("recall").as("min"),
          sum(when(col("recall") < 0.8, 1L).otherwise(0L)).as("below08"),
          count(lit(1)).as("nq"))
        .head()
      println(f"nprobe=$np%3d  probed=${np.toDouble / kCents}%.4f  " +
        f"mean=${stats.getDouble(0)}%.4f  min=${stats.getDouble(1)}%.4f  " +
        f"below0.8=${stats.getLong(2)}/${stats.getLong(3)}  " +
        f"wall=${(System.nanoTime() - t1) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
