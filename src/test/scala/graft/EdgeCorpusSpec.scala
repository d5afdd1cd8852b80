package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The gate corpora contain no degenerate documents, so the near-dup
  * family's edge semantics — null text, empty text, whitespace-only
  * text, sub-shingle-length docs — are pinned here against a
  * brute-force Scala reference on a purpose-built corpus. These paths
  * are load-bearing: the single-scan base turns null text into an
  * empty shingle array (coalesce) and rides an explode_outer, and the
  * claim that "the exact verify drops any null-pair" has to be TRUE,
  * not just argued in a comment. */
class EdgeCorpusSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  // doc 1: null text — must be invisible to every operator's pair set.
  // docs 2/3: empty and whitespace-only — SQL trim + split yield the
  //   single empty token, so both carry exactly the shingle [""] and
  //   form a legitimate j=1 pair (DuckDB agrees on this semantic).
  // doc 4: sub-shingle-length (1 token).
  // docs 5/6: identical. doc 7: near-dup of 5/6. doc 8: unrelated.
  // doc 9: tab-edged — SQL trim strips spaces ONLY, so the tab stays.
  private val corpus: Seq[(Long, String)] = Seq(
    1L -> null,
    2L -> "",
    3L -> "   ",
    4L -> "lonely",
    5L -> "a b c d e f g h",
    6L -> "a b c d e f g h",
    7L -> "a b c d e f g h i",
    8L -> "x y z w v u t s",
    9L -> "\tq r s t u v w x ",
    // second null doc: both engines window-group NULL fingerprints
    // together, so the two null docs must surface as an exact-dup group
    10L -> null,
    // unicode: CJK (multibyte UTF-8), emoji (surrogate pairs in the
    // JVM), combining marks — web corpora are full of all three, and
    // the tokenize→shingle→hash pipeline must treat them as opaque
    // bytes without corruption. 11/12 near-dup; 13 unrelated.
    11L -> "机器 学习 模型 训练 数据 管道 系统 工程",
    12L -> "机器 学习 模型 训练 数据 管道 系统 架构",
    13L -> "🚀 café naïve étude ßharp Ωmega 你好")

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("edge-corpus").toString
    corpus.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("edge"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  /** Brute-force reference: SQL-parity tokenization (trim strips spaces
    * only; split keeps trailing empties), distinct 3-shingles, exact
    * Jaccard — independent of the ShingleArray expression under test. */
  private def refShingles(text: String): Set[String] = {
    var b = 0; var e = text.length
    while (b < e && text.charAt(b) == ' ') b += 1
    while (e > b && text.charAt(e - 1) == ' ') e -= 1
    val toks = text.substring(b, e).split("\\s+", -1)
    (0 to math.max(toks.length - 3, 0))
      .map(i => toks.slice(i, math.min(i + 3, toks.length)).mkString(" "))
      .toSet
  }

  private lazy val refPairs: Set[(Long, Long)] = {
    val shs = corpus.collect { case (id, t) if t != null => id -> refShingles(t) }
    (for {
      (a, sa) <- shs; (b, sb) <- shs if a < b
      j = (sa & sb).size.toDouble / (sa | sb).size
      if j >= 0.5
    } yield (a, b)).toSet
  }

  test("the brute-force reference sees the expected pair structure") {
    // (2,3) empty-token pair; (5,6) identical; (5,7)/(6,7) near-dup;
    // (11,12) the CJK near-dup — 5/6 shared shingles of 7
    assert(refPairs ==
      Set((2L, 3L), (5L, 6L), (5L, 7L), (6L, 7L), (11L, 12L)))
  }

  test("dd_ngram_jaccard matches the reference on the degenerate corpus") {
    val got = functions.Dedup.ddNgramJaccard(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got == refPairs, s"got $got expected $refPairs")
  }

  test("dd_minhash_lsh matches the reference on the degenerate corpus") {
    val got = functions.Dedup.ddMinhashLsh(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got == refPairs, s"got $got expected $refPairs")
  }

  test("dd_exact groups only the identical documents") {
    val got = functions.Dedup.ddExact(spark, dir)
      .select("doc_id", "canonical").as[(Long, Long)].collect().toSet
    // 5/6 identical; 2/3 normalize to the same empty token set; the
    // two null-text docs group on their (shared) null fingerprint —
    // DuckDB's window PARTITION BY groups NULLs identically
    assert(got == Set((1L, 1L), (10L, 1L),
      (2L, 2L), (3L, 2L), (5L, 5L), (6L, 5L)), got)
  }

  test("dd_simhash pairs the identical docs and never sees the null doc") {
    val got = functions.Dedup.ddSimhash(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got.contains((5L, 6L)), got) // identical text → hamming 0
    assert(got.forall { case (a, b) =>
      a != 1L && b != 1L && a != 10L && b != 10L }, got)
    // the wide (8,4) scale bands inherit the same edge semantics: an
    // identical pair is Hamming 0 (all 70 tables collide), null docs
    // are filtered before the signature in both plans
    val wide = functions.Dedup.ddSimhash(spark, dir, wideBands = true)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(wide.contains((5L, 6L)), wide)
    assert(wide.forall { case (a, b) =>
      a != 1L && b != 1L && a != 10L && b != 10L }, wide)
  }

  test("the dfCap trade on an all-identical corpus is exactly as documented") {
    // 200 byte-identical docs: every shingle has df = 200 > the default
    // cap 8·√200 ≈ 113, so the ngram path drops ALL shingles and finds
    // NOTHING — the documented stop-shingle trade ("run dd_exact first").
    // The claim only holds if (a) dd_exact really does catch the whole
    // group, (b) raising the cap really does restore every pair, and
    // (c) minhash — whose bucket cap is 1024 members — still finds all
    // pairs where ngram's earlier-binding cap cannot.
    val d = java.nio.file.Files.createTempDirectory("all-dup").toString
    (1L to 200L).map(i => (i, "the same document body repeated verbatim"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("dup"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val allPairs = (for (a <- 1L to 200L; b <- a + 1 to 200L) yield (a, b)).toSet

    val exact = functions.Dedup.ddExact(spark, d)
      .select("doc_id", "canonical").as[(Long, Long)].collect()
    assert(exact.length == 200 && exact.forall(_._2 == 1L), exact.take(5).toSeq)

    val defaultCap = functions.Dedup.ddNgramJaccard(spark, d)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(defaultCap.isEmpty, s"cap 8·√200 must drop the df=200 shingles")

    val raisedCap = functions.Dedup.ddNgramJaccard(spark, d, dfCap = 1000)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(raisedCap == allPairs, s"raised cap: ${raisedCap.size} pairs")

    val mh = functions.Dedup.ddMinhashLsh(spark, d)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(mh == allPairs, s"minhash: ${mh.size} pairs")
  }

  /** Randomized-corpus differential property: 50 generated corpora
    * (unicode tokens, planted dup clusters, null/empty/whitespace
    * salts) checked against the brute-force reference for the whole
    * exact/ngram/minhash family — including the rounded jaccard
    * VALUES, not just the pair sets. The ScalaCheck seed is FIXED:
    * corpora are reproducible, so the strong `lsh == exact` assertion
    * (banding recall has a ~1% theoretical miss at the j = 0.5
    * boundary per pair) stays deterministic — a failure is a real
    * regression, never generator luck. */
  test("exact/ngram/minhash match brute force on 50 random corpora") {
    import org.scalacheck.{Gen, rng}
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "数据", "模型", "训练", "🚀", "café", "naïve", "ßharp", "x1", "y2",
      "z-3", "Ωmega", "a@b.co", "http://x.io", "123", "456.789")
    val docGen: Gen[String] = for {
      n <- Gen.chooseNum(0, 12)
      toks <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield toks.mkString(" ")
    // a corpus: base docs + a dup cluster layer (identical copies,
    // appended-token near-dups, case-perturbed docs) + degenerate salts
    val corpusGen: Gen[List[String]] = for {
      k <- Gen.chooseNum(2, 12)
      base <- Gen.listOfN(k, docGen)
      nd <- Gen.chooseNum(0, 8)
      dups <- Gen.listOfN(nd, for {
        src <- Gen.oneOf(base)
        mode <- Gen.chooseNum(0, 2)
        tok <- Gen.oneOf(vocab)
      } yield mode match {
        case 0 => src                             // identical copy
        case 1 => s"$src $tok"                    // appended token
        case _ => src.toUpperCase                 // case-perturbed
      })
      salts <- Gen.someOf(Seq[String](null, "", "   ", "\tq r s\t", " lone "))
    } yield base ++ dups ++ salts

    def round4(d: Double): Double =
      BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def refTokenSet(t: String): Set[String] = {
      var b = 0; var e = t.length
      while (b < e && t.charAt(b) == ' ') b += 1
      while (e > b && t.charAt(e - 1) == ' ') e -= 1
      t.substring(b, e).split("\\s+", -1).toSet
    }
    var seed = rng.Seed(20260813L)
    for (i <- 1 to 50) {
      val texts = corpusGen.apply(Gen.Parameters.default, seed)
        .getOrElse(List("fallback doc"))
      seed = seed.next
      val corpus = texts.zipWithIndex.map { case (t, j) => (j + 1L, t) }
      val d = java.nio.file.Files.createTempDirectory(s"rand-corpus-$i")
        .toString
      corpus.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("rand"))
        .withColumn("n_chars", length(col("text")))
        .write.mode("overwrite").parquet(s"$d/documents.parquet")

      // brute-force references on this corpus
      val shs = corpus.collect { case (id, t) if t != null =>
        id -> refShingles(t) }
      val refJ = (for {
        (a, sa) <- shs; (b, sb) <- shs if a < b
        u = (sa | sb).size
        j = if (u == 0) 0.0 else (sa & sb).size.toDouble / u
        if round4(j) >= 0.5
      } yield (a, b, round4(j))).toSet
      // exact dedup: group by the distinct token SET (sorting only
      // canonicalizes the fingerprint string, set identity is what
      // groups); both engines group the null-text docs together
      val refEx = corpus
        .groupBy { case (_, t) => Option(t).map(refTokenSet) }
        .values.map(_.map(_._1)).filter(_.size > 1)
        .flatMap(g => g.map(id => (id, g.min, g.size.toLong))).toSet

      val gotJ = functions.Dedup.ddNgramJaccard(spark, d)
        .select("doc_a", "doc_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      assert(gotJ == refJ, s"corpus $i ngram: got $gotJ expected $refJ " +
        s"texts=$corpus")
      // every 5th corpus (offset from the cluster sample): the tier-0
      // MinHash-prefix filter must preserve the pair set on arbitrary
      // degenerate shapes too, not just the gate corpus KnobsSpec pins.
      // Tier-0 is a probabilistic discard whose loss is MEASURED zero
      // (§8.4.3f formula-exact at 10M docs); under the committed seed
      // this re-measures it per run over random degenerate corpora —
      // a failure here would be the documented trade surfacing, with
      // the corpus printed for the record.
      if (i % 5 == 3) {
        spark.conf.set("graft.ngram.mhPrefixSlots", "16")
        try {
          val gotT0 = functions.Dedup.ddNgramJaccard(spark, d)
            .select("doc_a", "doc_b", "jaccard")
            .as[(Long, Long, Double)].collect().toSet
          assert(gotT0 == refJ, s"corpus $i ngram tier-0: got $gotT0 " +
            s"expected $refJ texts=$corpus")
        } finally spark.conf.unset("graft.ngram.mhPrefixSlots")
      }
      val gotMh = functions.Dedup.ddMinhashLsh(spark, d)
        .select("doc_a", "doc_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      assert(gotMh == refJ, s"corpus $i minhash: got $gotMh expected $refJ " +
        s"texts=$corpus")
      val gotEx = functions.Dedup.ddExact(spark, d)
        .select("doc_id", "canonical", "group_size")
        .as[(Long, Long, Long)].collect().toSet
      assert(gotEx == refEx, s"corpus $i exact: got $gotEx expected $refEx " +
        s"texts=$corpus")

      // every 5th corpus: dd_cluster vs brute-force union-find over the
      // reference pair graph (the iterative min-label propagation is
      // the most intricate operator in the family — each check runs
      // the whole ngram pipeline plus the label loop, so sample)
      if (i % 5 == 0) {
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        refJ.foreach { case (a, b, _) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val members = refJ.flatMap(p => Seq(p._1, p._2))
        val refCl = members.groupBy(find).values
          .flatMap(g => g.map(id => (id, g.min, g.size.toLong))).toSet
        val gotCl = functions.Dedup.ddCluster(spark, d)
          .select("doc_id", "cluster", "cluster_size")
          .as[(Long, Long, Long)].collect().toSet
        assert(gotCl == refCl, s"corpus $i cluster: got $gotCl " +
          s"expected $refCl texts=$corpus")
      }
    }
  }

  /** Chunk-vs-wide simhash differential property: both constructions
    * share the exact Hamming ≤ 6 verify, and their band designs are
    * pigeonhole-complete to d ≤ 3 (4×16-bit chunks) and d ≤ 4 (C(8,4)
    * block tables). With ground truth from the collected signatures
    * (the signature expression itself is pinned bit-identical to the
    * aggregate in ExpressionParitySpec — here only the BAND designs are
    * under test), on every corpus:
    *  - precision: each output ⊆ the exact d ≤ 6 pair set;
    *  - completeness floors: chunk finds ALL d ≤ 3 pairs, wide finds
    *    ALL d ≤ 4 pairs (so wide ⊇ chunk within d ≤ 4);
    *  - identity on easy corpora: when every d ≤ 6 pair has d ≤ 3, the
    *    two outputs must be IDENTICAL — the property the corpus-size
    *    switch relies on to keep small-corpus output stable.
    * Fixed ScalaCheck seed → reproducible corpora, deterministic run. */
  test("chunk and wide simhash bands agree as the block design guarantees") {
    import org.scalacheck.{Gen, rng}
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "数据", "模型", "训练", "🚀", "café", "naïve", "x1", "y2", "z-3")
    val docGen: Gen[String] = for {
      n <- Gen.chooseNum(1, 12)
      toks <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield toks.mkString(" ")
    // heavier dup layer than the jaccard property: simhash pairs need
    // LOW Hamming distance, which identical copies (d = 0) and
    // single-token edits (small d) provide; random doc pairs sit near
    // d ≈ 32 and only exercise the precision bound
    val corpusGen: Gen[List[String]] = for {
      k <- Gen.chooseNum(2, 8)
      base <- Gen.listOfN(k, docGen)
      nd <- Gen.chooseNum(2, 10)
      dups <- Gen.listOfN(nd, for {
        src <- Gen.oneOf(base)
        mode <- Gen.chooseNum(0, 2)
        tok <- Gen.oneOf(vocab)
      } yield mode match {
        case 0 => src               // identical copy: d = 0
        case 1 => s"$src $tok"      // appended token: small d
        case _ => src.toUpperCase   // case flip: moderate d
      })
      salts <- Gen.someOf(Seq[String](null, "", "   "))
    } yield base ++ dups ++ salts
    var seed = rng.Seed(20260813L)
    var easyCorpora = 0
    for (i <- 1 to 25) {
      val texts = corpusGen.apply(Gen.Parameters.default, seed)
        .getOrElse(List("fallback doc"))
      seed = seed.next
      val corpus = texts.zipWithIndex.map { case (t, j) => (j + 1L, t) }
      val d = java.nio.file.Files.createTempDirectory(s"simhash-diff-$i")
        .toString
      corpus.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("sh"))
        .withColumn("n_chars", length(col("text")))
        .write.mode("overwrite").parquet(s"$d/documents.parquet")

      // ground-truth Hamming pairs from the collected signatures (the
      // same null-text filter simhashDocs applies)
      val sigs = corpus.toDF("doc_id", "text")
        .where(col("text").isNotNull)
        .select(col("doc_id"),
          functions.SimHashRow.simhash64_row(col("text")).as("s"))
        .as[(Long, Long)].collect().toSeq
      def pairsAt(maxD: Int): Set[(Long, Long)] = (for {
        (a, sa) <- sigs; (b, sb) <- sigs if a < b
        if java.lang.Long.bitCount(sa ^ sb) <= maxD
      } yield (a, b)).toSet
      val d6 = pairsAt(6); val d4 = pairsAt(4); val d3 = pairsAt(3)

      val chunk = functions.Dedup.ddSimhash(spark, d, wideBands = false)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      val wide = functions.Dedup.ddSimhash(spark, d, wideBands = true)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(chunk.subsetOf(d6), s"corpus $i chunk precision: " +
        s"${chunk -- d6} not within Hamming 6; texts=$corpus")
      assert(wide.subsetOf(d6), s"corpus $i wide precision: " +
        s"${wide -- d6} not within Hamming 6; texts=$corpus")
      assert(d3.subsetOf(chunk), s"corpus $i chunk completeness: " +
        s"missed d<=3 pairs ${d3 -- chunk}; texts=$corpus")
      assert(d4.subsetOf(wide), s"corpus $i wide completeness: " +
        s"missed d<=4 pairs ${d4 -- wide}; texts=$corpus")
      if (d6 == d3) {
        easyCorpora += 1
        assert(chunk == wide, s"corpus $i: all pairs at d<=3 but " +
          s"outputs differ: chunk ${chunk -- wide} wide ${wide -- chunk}; " +
          s"texts=$corpus")
      }
    }
    // the identity branch must actually execute — a generator drift
    // that stops producing easy corpora would hollow the property out
    assert(easyCorpora >= 5, s"only $easyCorpora/25 easy corpora")
  }

  test("dd_span and dd_cdc report every non-null doc exactly once") {
    val span = functions.Dedup.ddSpan(spark, dir)
      .select("doc_id").as[Long].collect().toSeq
    assert(span.sorted ==
      Seq(2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 11L, 12L, 13L), span)
    val cdc = functions.Dedup.ddCdc(spark, dir)
      .select("doc_id").as[Long].collect().toSeq
    assert(cdc.sorted ==
      Seq(2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 11L, 12L, 13L), cdc)
    // both null docs are invisible to the span/cdc family
    // identical docs 5/6 are fully duplicated spans of each other
    val bp = functions.Dedup.ddSpan(spark, dir)
      .select("doc_id", "dup_bp").as[(Long, Long)].collect().toMap
    assert(bp(5L) == 10000L && bp(6L) == 10000L, bp)
    assert(bp(4L) == 0L, bp) // 0 spans → 0 bp, no division blowup
  }
}
