package graft

import org.apache.spark.sql.functions._

/** At-scale receipt for the round-16 minhash band-bucket advisory
  * (the batch sibling of §8.4.8e's embed measurement): a NEAR-verbatim
  * blob — identical base text + a unique tail token per doc, so
  * `dd_exact` does NOT collapse it — planted in a ScaleSmoke-style
  * background corpus. Expected at the 1024 default cap: every blob
  * band bucket crosses the cap, ALL blob pairs are dropped (count = 0
  * against C(blob, 2) expected), the healthy background is unaffected,
  * and the measured bucket advisory fires quoting ~blob-size members.
  * With the cap raised past the blob, the pairs come back.
  *
  * Run: tools/runmain.sh graft.MinhashBlobSmoke [bgCopies=100] [blob=2000]
  */
object MinhashBlobSmoke {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(100)
    val blob = args.lift(1).map(_.toInt).getOrElse(2000)
    val spark = Graft.sessionBuilder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val src = "/root/testdata/sf0.1"
    val big = "target/minhash-blob-smoke"

    // background: the ScaleSmoke construction — fresh vocabulary per
    // copy, so copies are NOT near-dups of each other and the
    // background contributes only its own sf0.1-internal pairs
    val d = Tables.t(spark, src, "documents")
    val n = Option(d.agg(max("doc_id")).head.getAs[Number](0))
      .map(_.longValue + 1).getOrElse(0L)
    val nBg = n * copies
    val blobText = "the quick brown fox jumps over the lazy dog again " +
      "and again while the stream flows past the mill every single day"
    val blobDf = spark.range(blob).select(
      (col("id") + nBg).as("doc_id"),
      concat(lit(blobText + " tail"), col("id")).as("text"))
    d.crossJoin(spark.range(copies).select(col("id").as("copy")))
      .repartition(spark.sparkContext.defaultParallelism * 2)
      .select((col("doc_id") + col("copy") * n).as("doc_id"),
        when(col("copy") === 0, col("text"))
          .otherwise(array_join(transform(split(col("text"), " "),
            t => concat(lit("v"), col("copy"), lit("·"), t)), " ")).as("text"))
      .unionByName(blobDf)
      .write.mode("overwrite").parquet(s"$big/documents.parquet")
    println(s"corpus: ${nBg + blob} docs ($copies x sf0.1 background + " +
      s"$blob-member near-verbatim blob), default maxBucket 1024")

    def run(tag: String, expectAdvisory: Boolean): Long = {
      Graft.clearAdvisories(spark)
      val t0 = System.nanoTime()
      val df = graft.functions.Dedup.ddMinhashLsh(spark, big)
      // count the FULL (non-empty) result first: the observation
      // delivers on this execution — a blob-slice count alone is an
      // EMPTY query at the default cap and AQE's empty-relation
      // propagation prunes the observation with the plan (since round
      // 17 that corner fires prunedObservationAdvisory instead of the
      // measured one; this smoke measures the MEASURED path)
      val total = df.count()
      val blobPairs = df
        .where(col("doc_a") >= nBg && col("doc_b") >= nBg).count()
      println(f"[$tag] pairs total $total%10d, blob $blobPairs%10d " +
        f"(expected full ${blob.toLong * (blob - 1) / 2}) " +
        f"${(System.nanoTime() - t0) / 1e9}%7.1f s")
      // the listener delivers asynchronously; poll the session ledger —
      // the STRUCTURED channel (round 18): match on typed fields, no
      // substring over the prose
      def advisory = Graft.advisoryRecords(spark).find(a =>
        a.op == "dd_minhash_lsh" && a.knob == "graft.minhash.maxBucket" &&
          a.measured > a.cap)
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      while (advisory.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(100)
      println(s"[$tag] advisory: " + advisory.map(a =>
        s"knob ${a.knob}, cap ${a.cap}, measured ${a.measured}, " +
          s"bound ${a.bound}").getOrElse("(silent)"))
      // the advisory firing at scale is the POINT of this smoke: a
      // regression where the capped run drops the blob silently must
      // fail here, not print "(silent)" and pass on counts alone
      require(advisory.isDefined == expectAdvisory,
        s"[$tag] expected advisory fired=$expectAdvisory, got $advisory")
      // fired at the default cap ⇒ the measured bucket must be the
      // planted blob's (≲ blob members, ≥ the 1024 cap it crossed)
      advisory.foreach(a => require(a.measured > 1024L && a.measured <= blob,
        s"[$tag] measured bucket ${a.measured} outside (1024, $blob]"))
      blobPairs
    }
    val atDefault = run("cap=1024 (default)", expectAdvisory = true)
    spark.conf.set("graft.minhash.maxBucket", (blob + 100).toString)
    val raised = run(s"cap=${blob + 100}", expectAdvisory = false)
    require(atDefault == 0 && raised == blob.toLong * (blob - 1) / 2,
      s"unexpected: default=$atDefault raised=$raised")
    spark.stop()
  }
}
