package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** `fast_round(x)` — Spark's `round(x, scale)` semantics without the
  * per-row BigDecimal.
  *
  * Spark's `Round` on DoubleType evaluates
  * `BigDecimal.valueOf(x).setScale(scale, HALF_UP).doubleValue()` —
  * a `Double.toString`, a decimal parse and a decimal rescale PER
  * VALUE. Profiled live on the embed-cosine pair loop (jstack samples
  * of the hot task): ~2/3 of task CPU sat in BigDecimal /
  * FloatingDecimal, dwarfing the 32-dim dot product the round
  * decorates. Every cosine/jaccard operator rounds EVERY scored
  * candidate, so that constant multiplies the O(pairs) stream — the
  * single largest non-algorithmic cost in the family.
  *
  * Fast path: round-to-nearest only depends on which SIDE of the .5
  * boundary the scaled value falls, and "the value" under Spark's
  * semantics is the SHORTEST decimal representation `Double.toString`
  * picks (|shortest − x| ≤ ulp(x)/2; the ×10^scale double multiply
  * adds another half-ulp), so the computed `|x|·10^scale` sits within
  * ~2.3e−16 relative of its exact decimal counterpart. When the
  * fractional part is farther than a 400×-margined eps from 0.5,
  * integer arithmetic produces the IDENTICAL result; inside the
  * margin (~1e−13 of continuous inputs — but including every exact
  * decimal half like 0.00005) it falls back to the BigDecimal
  * original, so equality is by construction, not probabilistic.
  * NaN/±Inf pass through (Spark's special case); results of magnitude
  * 0 normalize to +0.0 exactly as `BigDecimal.doubleValue` does;
  * scaled magnitudes ≥ 2⁵² (coarser double grid than the decimal
  * scale — floor arithmetic would drop digits) also take the
  * BigDecimal path.
  * FastRoundSpec pins bitwise equality against Spark's `round` over
  * millions of fixed-seed and adversarial values.
  */
case class FastRound(child: Expression, scale: Int)
    extends UnaryExpression with ExpectsInputTypes {

  // Spark's round accepts any scale (negative rounds left of the
  // point); this fast path only implements 0..9 (the POW table), so
  // reject the rest at construction — planning time — instead of an
  // ArrayIndexOutOfBoundsException mid-task.
  require(0 <= scale && scale <= 9,
    s"fast_round supports 0 <= scale <= 9, got $scale — use Spark's round() for other scales")

  override def inputTypes: Seq[GraftBridge.ADT] = Seq(DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "fast_round"

  override protected def nullSafeEval(input: Any): Any =
    FastRound.round(input.asInstanceOf[Double], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FastRound.round($c, $scale)")

  override protected def withNewChildInternal(newChild: Expression): FastRound =
    copy(child = newChild)
}

object FastRound {
  private val POW = Array.tabulate(10)(i => math.pow(10, i))

  /** Bit-identical to
    * `BigDecimal.valueOf(x).setScale(scale, HALF_UP).doubleValue()`
    * (with Spark's NaN/Inf pass-through) for 0 ≤ scale ≤ 9. */
  def round(x: Double, scale: Int): Double = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) return x
    val p = POW(scale)
    val ay = math.abs(x) * p
    // scaled magnitude ≥ 2^52: the double grid is coarser than the
    // scale's decimal grid, so floor arithmetic loses digits the
    // shortest decimal repr still carries — BigDecimal territory
    // (never reached by the cosine/jaccard hot path, |x| ≤ ~1)
    if (ay >= 4.503599627370496e15) return slow(x, scale)
    val n = math.floor(ay)
    val frac = ay - n
    // |computed − exact·10^scale| ≤ ~2.3e−16·ay (shortest-repr gap +
    // multiply rounding); 400× safety margin, absolute floor for tiny ay
    val eps = ay * 1e-13 + 1e-16
    if (math.abs(frac - 0.5) <= eps) return slow(x, scale)
    val r = if (frac > 0.5) n + 1.0 else n
    if (r == 0.0) 0.0 // BigDecimal has no signed zero: −eps rounds to +0.0
    else (if (x < 0) -r else r) / p
  }

  private def slow(x: Double, scale: Int): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()

  /** `round(c, 4)` — the hot-path variant (cosine / jaccard scores). */
  def round4(c: Column): Column =
    GraftBridge.column(FastRound(GraftBridge.expression(c), 4))

  /** `round(c)` — scale-0, for the per-element map stages (int8
    * quantization, micro-unit centroids) that round N×dim values. */
  def round0(c: Column): Column =
    GraftBridge.column(FastRound(GraftBridge.expression(c), 0))
}
