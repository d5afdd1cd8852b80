package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** FastRound replaces Spark's BigDecimal `round` in the oracle-gated
  * scoring paths, so equality must be BITWISE, not approximate — a
  * single divergent value is an oracle hash mismatch. Pinned over
  * millions of fixed-seed values across the ranges the engine actually
  * rounds (cosines, jaccards, wide magnitudes), plus the adversarial
  * grid where divergence would hide: exact decimal halves (the
  * BigDecimal fallback territory), shortest-repr classics (2.675),
  * signed zeros, subnormals, NaN/Inf, and the 2⁵² integral frontier. */
class FastRoundSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import graft.functions.FastRound

  private def check(values: Seq[Double], scale: Int): Unit = {
    import spark.implicits._
    val df = values.toDF("x").select(
      col("x"),
      round(col("x"), scale).as("spark_r"),
      org.apache.spark.sql.GraftBridge.column(
        FastRound(org.apache.spark.sql.GraftBridge.expression(col("x")), scale))
        .as("fast_r"))
    // driver-side raw-bit compare: catches signed-zero divergence and
    // canonicalizes NaN; ~megabytes even at millions of rows
    val bad = df.collect().filter { r =>
      java.lang.Double.doubleToLongBits(r.getDouble(1)) !=
        java.lang.Double.doubleToLongBits(r.getDouble(2))
    }.take(5)
    assert(bad.isEmpty, s"scale=$scale divergent: ${bad.toSeq
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))}")
  }

  test("fast_round is bitwise-equal to Spark round on 4M fixed-seed values") {
    val rnd = new scala.util.Random(20260813L)
    // cosine range (the hot path), jaccard range, and wide magnitudes
    val cos = Seq.fill(1500000)(rnd.nextDouble() * 2.2 - 1.1)
    val jac = Seq.fill(1500000)(rnd.nextDouble())
    val wide = Seq.fill(1000000)(
      (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(20) - 6))
    check(cos ++ jac ++ wide, 4)
    check((cos ++ wide).take(1000000), 2)
    // scale 0 — the per-element map stages (quantization ±127ish,
    // micro-unit centroids up to ~1e7)
    check(cos.take(500000).map(_ * 127) ++
      wide.take(500000).map(_ * 1e6), 0)
  }

  test("fast_round matches Spark round on the adversarial boundary grid") {
    // every representable neighborhood of k·10⁻⁴ and (k+½)·10⁻⁴ in the
    // cosine range — the exact-half fallback and the off-by-one-ulp
    // territory where a naive multiply-floor diverges
    val halves = (-20000 to 20000).flatMap { k =>
      val h = (k + 0.5) / 1e4
      val e = k / 1e4
      Seq(h, Math.nextUp(h), Math.nextDown(h), e, Math.nextUp(e), Math.nextDown(e))
    }
    val classics = Seq(2.675, -2.675, 0.00005, -0.00005, 1.0005, -1.0005,
      0.1 + 0.2, 1.005, -1.005, 0.49995, -0.49995,
      0.0, -0.0, 1e-310, -1e-310, Double.MinPositiveValue,
      4.503599627370495e15, 4.503599627370497e15, -4.6e15,
      9.007199254740992e15, Double.MaxValue, Double.MinValue)
    check(halves ++ classics, 4)
    check(halves.map(_ * 100) ++ classics, 2)
    check(halves.map(_ * 10000) ++ classics, 0)
  }

  test("fast_round passes NaN and infinities through like Spark") {
    import spark.implicits._
    val df = Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
      .toDF("x").select(
        round(col("x"), 4).as("spark_r"),
        graft.functions.FastRound.round4(col("x")).as("fast_r"))
    df.collect().foreach { r =>
      assert(r.getDouble(0).isNaN == r.getDouble(1).isNaN)
      assert(r.getDouble(0).isNaN || r.getDouble(0) == r.getDouble(1))
    }
    // null propagates
    val n = Seq[Option[Double]](None).toDF("x")
      .select(graft.functions.FastRound.round4(col("x"))).collect()
    assert(n(0).isNullAt(0))
  }

  test("unsupported scales are rejected at construction, not mid-task") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    Seq(-1, 10).foreach { s =>
      val e = intercept[IllegalArgumentException] {
        graft.functions.FastRound(Literal(1.5), s)
      }
      assert(e.getMessage.contains("fast_round"), e.getMessage)
    }
  }
}
