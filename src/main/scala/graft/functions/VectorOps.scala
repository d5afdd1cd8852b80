package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Dot product of two `ARRAY<DOUBLE>` columns as a native Catalyst
  * `Expression` with `doGenCode`.
  *
  * The embedding-similarity operators (dedup by cosine, ANN top-k) score
  * O(pairs × dim) products; the `aggregate(zip_with(...))` formulation
  * allocates a zipped array per pair and evaluates two interpreted
  * higher-order lambdas, which dominates the runtime. This expression is
  * a tight primitive loop over the two `ArrayData`s inside whole-stage
  * codegen — no allocation, no lambda dispatch — and sums left-to-right
  * exactly like `aggregate`, so scores are bit-identical to the
  * reference formulation (and to the DuckDB oracle after round(_, 4))
  * for equal-length vectors. Length mismatch (impossible for a
  * fixed-dimension embedding column) sums the common prefix, where
  * `zip_with` would null-pad and null the whole sum.
  */
case class DotF64(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[GraftBridge.ADT] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f64"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF64 =
    copy(left = newLeft, right = newRight)
}

/** Count of common elements between two SORTED `ARRAY<BIGINT>` columns
  * by merge scan — the candidate-verification primitive of the dedup
  * family. `array_intersect` builds a per-row hash set; over millions of
  * candidate pairs that allocation dominates the stage. The merge scan
  * is allocation-free inside whole-stage codegen. Duplicates pair off
  * min-multiplicity (equal to set-intersection size when inputs are
  * distinct, as shingle-hash arrays are); inputs MUST be pre-sorted
  * (`array_sort`), which the producer does once per document, not per
  * pair. */
case class SortedOverlap(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[GraftBridge.ADT] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_overlap"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedOverlap =
    copy(left = newLeft, right = newRight)
}

object VectorOps {
  /** `dot_f64(a, b)` — sum of pairwise products over the common prefix. */
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(DotF64(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** L2 norm via the same codegen'd loop (identical fp order to
    * `aggregate(v, 0.0, (a,x) -> a + x*x)`). */
  def l2norm(v: Column): Column = sqrt(dot(v, v))

  /** `sorted_overlap(a, b)` — common-element count of two pre-sorted
    * long arrays (merge scan, allocation-free). */
  def sortedOverlap(a: Column, b: Column): Column =
    GraftBridge.column(SortedOverlap(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
