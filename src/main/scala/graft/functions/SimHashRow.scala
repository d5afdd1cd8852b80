package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `simhash64_row(token_hashes)` — the per-ROW form of [[SimHashAgg]]:
  * the frequency-weighted 64-bit SimHash of one document's token-hash
  * array, computed in a single expression evaluation. Bit b of the
  * signature is set iff a strict majority of the hashes have it set
  * (`2·cnt_set(b) > n`) — bit-identical to the aggregate, asserted in
  * ExpressionParitySpec.
  *
  * Exists for the same reason as [[MinHashRow]]: when each document
  * already carries its token array, the signature is a pure projection
  * — no explode, no shuffle, no aggregation hash map — so the stage is
  * map-only and embarrassingly parallel at any corpus size.
  * [[SimHashAgg]] remains the distributed-aggregate form for when
  * token hashes arrive as rows (SQL `simhash64(h) GROUP BY`).
  */
case class SimHashRow(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[GraftBridge.ADT] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64_row"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var n = 0
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1
          b += 1
        }
        n += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) * 2 > n) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashRow =
    copy(child = newChild)
}

object SimHashRow {
  def simhash64_row(c: Column): Column =
    GraftBridge.column(SimHashRow(GraftBridge.expression(c)))
}
