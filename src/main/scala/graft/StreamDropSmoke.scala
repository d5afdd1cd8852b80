package graft

import org.apache.spark.sql.functions._

/** At-scale receipt for the round-17 streaming drop advisory — the
  * streaming sibling of [[MinhashBlobSmoke]]: a near-verbatim blob
  * LARGER than `maxBucketMembers` arrives across waves inside one
  * horizon, planted in a MinhashBlobSmoke-style background corpus.
  * Expected: the blob's band buckets fill to the cap, later blob
  * arrivals are dropped as members (still pairing against the retained
  * ones), and the measured streamed loss vs the BATCH operator's
  * ground truth (cap raised past the blob) must sit within the
  * advisory's per-bucket C(w,2) bound — the toy-scale StreamsSpec pin
  * shows the bound exact when every band drops the same arrivals; at
  * scale the per-band buckets differ slightly (tail tokens perturb
  * some minhash slots), so a pair dropped in one band can still emit
  * from another and measured loss ≤ bound, strictly.
  *
  * Run: tools/runmain.sh graft.StreamDropSmoke [bgCopies=20] [blob=400]
  *      [cap=256] [waves=8]
  */
object StreamDropSmoke {
  case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)

  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(20)
    val blob = args.lift(1).map(_.toInt).getOrElse(400)
    val cap = args.lift(2).map(_.toInt).getOrElse(256)
    val waves = args.lift(3).map(_.toInt).getOrElse(8)
    val stepMin = 30 // waves*step well inside the 1440-min horizon
    val spark = Graft.sessionBuilder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val src = "/root/testdata/sf0.1"
    val big = "target/stream-drop-smoke"

    // background: fresh vocabulary per copy (MinhashBlobSmoke's
    // construction) so copies are not near-dups of each other; blob:
    // identical base text + unique tail per doc so dd_exact would NOT
    // collapse it — the silent-loss shape. Every doc gets a wave id;
    // ts = wave * step (blob spread round-robin across all waves).
    val d = Tables.t(spark, src, "documents")
    val n = Option(d.agg(max("doc_id")).head.getAs[Number](0))
      .map(_.longValue + 1).getOrElse(0L)
    val nBg = n * copies
    val blobText = "the quick brown fox jumps over the lazy dog again " +
      "and again while the stream flows past the mill every single day"
    val blobDf = spark.range(blob).select(
      (col("id") + nBg).as("doc_id"),
      concat(lit(blobText + " tail"), col("id")).as("text"),
      (col("id") % waves).cast("int").as("wave"))
    d.crossJoin(spark.range(copies).select(col("id").as("copy")))
      .repartition(spark.sparkContext.defaultParallelism * 2)
      .select((col("doc_id") + col("copy") * n).as("doc_id"),
        when(col("copy") === 0, col("text"))
          .otherwise(array_join(transform(split(col("text"), " "),
            t => concat(lit("v"), col("copy"), lit("·"), t)), " ")).as("text"),
        pmod(xxhash64(col("doc_id")), lit(waves)).cast("int").as("wave"))
      .unionByName(blobDf)
      .withColumn("ts_ms", (col("wave") * stepMin + 60) * 60000L)
      .write.mode("overwrite").parquet(s"$big/documents.parquet")
    val landing = spark.read.parquet(s"$big/documents.parquet")
    println(s"corpus: ${nBg + blob} docs ($copies x sf0.1 background + " +
      s"$blob-member near-verbatim blob), cap $cap, $waves waves")

    // batch ground truth FIRST: the full blob pair set at a raised cap
    spark.conf.set("graft.minhash.maxBucket", (blob + 100).toString)
    val t0 = System.nanoTime()
    val truthBlob = graft.functions.Dedup.ddMinhashLsh(spark, big)
      .where(col("doc_a") >= nBg && col("doc_b") >= nBg).count()
    println(f"batch truth (cap ${blob + 100}): blob pairs $truthBlob%9d " +
      f"(expected ${blob.toLong * (blob - 1) / 2}) " +
      f"${(System.nanoTime() - t0) / 1e9}%6.1f s")
    require(truthBlob == blob.toLong * (blob - 1) / 2,
      s"batch control must find the full blob: $truthBlob")
    spark.conf.unset("graft.minhash.maxBucket")

    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[Doc](spark)
    val drops = spark.sparkContext.longAccumulator("drops")
    val worst = new graft.streaming.MaxAccumulator
    spark.sparkContext.register(worst, "worst_bucket_drops")
    val out = graft.streaming.Streams.nearDupStream(
      mem.toDF(), landing.select("doc_id", "text"),
      maxBucketMembers = cap, drops = Some(drops),
      worstBucketDrops = Some(worst))
    val q = out.writeStream.format("memory").queryName("drop_pairs")
      .outputMode("append").start()
    try {
      println(f"${"wave"}%-5s ${"wall_s"}%8s ${"docs"}%7s ${"drops"}%7s ${"worst"}%7s")
      for (w <- 0 until waves) {
        val wave = landing.where(col("wave") === w)
          .select("doc_id", "ts_ms", "text").collect()
          .map(r => Doc(r.getLong(0), new java.sql.Timestamp(r.getLong(1)),
            r.getString(2)))
        val t1 = System.nanoTime()
        mem.addData(wave.toIndexedSeq)
        q.processAllAvailable()
        println(f"$w%-5d ${(System.nanoTime() - t1) / 1e9}%8.2f " +
          f"${wave.length}%7d ${drops.value}%7d ${worst.value}%7d")
      }
      val streamedBlob = spark.table("drop_pairs")
        .where(col("doc_a") >= nBg && col("doc_b") >= nBg)
        .select("doc_a", "doc_b").distinct().count()
      val missing = truthBlob - streamedBlob
      val w = worst.value
      val bound = w * (w - 1) / 2
      println(f"streamed blob pairs $streamedBlob%9d, missing $missing%9d " +
        f"vs advisory bound C($w,2) = $bound")
      Graft.clearAdvisories(spark)
      val adv = graft.streaming.Streams.reportDrops(spark, drops, worst)
      println("advisory: " +
        adv.map(_.message.takeWhile(_ != '.')).getOrElse("(silent)"))
      require(adv.isDefined && missing > 0 && missing <= bound,
        s"loss must be real and within the quoted bound: missing=$missing bound=$bound")
      // the structured record must quote the same arithmetic (round 18)
      require(adv.exists(a => a.measured == w && a.bound == bound),
        s"record fields must match the accumulators: $adv")
      require(Graft.advisories(spark).exists(_.contains("late<->late")),
        "advisory must reach the session ledger")
    } finally q.stop()
    spark.stop()
  }
}
