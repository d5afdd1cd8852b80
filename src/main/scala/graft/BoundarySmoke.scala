package graft
import org.apache.spark.sql.functions._

/** Boundary-adversarial measurement for the tier-0 MinHash-prefix
  * filter (`graft.ngram.mhPrefixSlots` — SURVEY §8.4.7).
  *
  * The §8.4.7 zero-pair-loss result rode an easy candidate mix: every
  * true pair in the replicated gate corpus sits at j ≫ 0.5, where the
  * (16, 2)-prefix miss probability is astronomically small. The knob's
  * scaladoc bound actually bites AT the boundary: a j = 0.500 pair
  * survives with p = 1 − BinomCDF(1; 16, 0.5) = 1 − 17/2¹⁶ ≈ 0.999741
  * (miss ≈ 2.59·10⁻⁴). This main builds a corpus whose true pairs sit
  * EXACTLY there and measures the realized miss rate against theory.
  *
  * Construction: independent pair groups with disjoint vocabularies.
  * Each doc is 3-word-shingled ([[graft.functions.Dedup.shingles]]), so
  * a pair sharing a P-token prefix with per-side unique suffixes shares
  * exactly s = P−2 of its n = T−2 distinct shingles per side:
  * j = s/(2n−s). T = 32, P = 22 → j = 20/40 = 0.500 (the boundary);
  * T = 32, P = 23 → j = 21/39 ≈ 0.538 (just above — miss ≈ 8.4·10⁻⁵).
  * All tokens carry the group id, so no cross-group shingle ever
  * matches and the exact (filter-off) operator must find EXACTLY one
  * pair per group — any off-run deviation is a construction bug, not a
  * filter measurement.
  *
  * Run: sbt "runMain graft.BoundarySmoke [kBoundary] [kNear]"
  * (defaults 30000 / 10000 → expected misses ≈ 30000·2.59e-4 +
  * 10000·8.4e-5 ≈ 7.8 + 0.8; a measured count far above ~20 would
  * falsify the scaladoc bound, 0–15 confirms it).
  */
object BoundarySmoke {
  def main(args: Array[String]): Unit = {
    val kBoundary = args.headOption.map(_.toInt).getOrElse(30000)
    val kNear = args.lift(1).map(_.toInt).getOrElse(10000)
    val spark = Graft.sessionBuilder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "target/boundary-smoke"

    // group g, side ∈ {a, b}: P shared prefix tokens + (T−P) unique
    // suffix tokens, every token namespaced by g
    def side(g: org.apache.spark.sql.Column, s: String, p: Int, t: Int) =
      array_join(concat(
        transform(sequence(lit(0), lit(p - 1)),
          i => concat(lit("g"), g, lit("p"), i)),
        transform(sequence(lit(0), lit(t - p - 1)),
          i => concat(lit("g"), g, lit(s), i))), " ")
    def pairs(k: Int, p: Int, t: Int, gBase: Long, idBase: Long) =
      spark.range(k).select((col("id") + gBase).as("g"))
        .select(col("g"),
          posexplode(array(side(col("g"), "a", p, t),
            side(col("g"), "b", p, t))).as(Seq("s", "text")))
        .select((lit(idBase) + col("g") * 2 + col("s")).as("doc_id"), col("text"))
    val docs = pairs(kBoundary, 22, 32, 0L, 0L)
      .union(pairs(kNear, 23, 32, kBoundary.toLong, 0L))
      .withColumn("lang", lit("en")).withColumn("source", lit("boundary"))
      .withColumn("n_chars", length(col("text")))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    import graft.functions.Dedup
    def run(tag: String): Set[(Long, Long)] = {
      val t0 = System.nanoTime()
      val ps = Dedup.ddNgramJaccardPairs(spark, dir)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"$tag%-10s ${(System.nanoTime() - t0) / 1e9}%7.2f s   pairs=${ps.size}")
      ps
    }
    val off = run("off")
    val expected = (0L until (kBoundary + kNear).toLong)
      .map(g => (2 * g, 2 * g + 1)).toSet
    require(off == expected,
      s"construction broken: off-run must find exactly one pair per group " +
        s"(missing=${(expected -- off).take(5)} extra=${(off -- expected).take(5)})")
    spark.conf.set("graft.ngram.mhPrefixSlots", "16")
    val on = run("mh16")
    spark.conf.unset("graft.ngram.mhPrefixSlots")
    val missed = off -- on
    val missB = missed.count(_._1 < 2L * kBoundary)
    val missN = missed.size - missB
    val expB = kBoundary * 2.594e-4
    val expN = kNear * 8.4e-5
    println(f"j=0.500: missed $missB of $kBoundary (measured ${missB.toDouble / kBoundary}%.2e, theory 2.59e-4, expected count $expB%.1f)")
    println(f"j=0.538: missed $missN of $kNear (measured ${missN.toDouble / kNear}%.2e, theory 8.4e-5, expected count $expN%.1f)")
    println(s"""{"miss_boundary":$missB,"k_boundary":$kBoundary,"miss_near":$missN,"k_near":$kNear,"extra":${(on -- off).size}}""")
    spark.stop()
  }
}
