package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `minhash32_row(shingles)` — the per-ROW form of [[MinHashAgg]]:
  * the 32-slot MinHash signature of one document's shingle array,
  * computed in a single expression evaluation. Slot k is
  * `min over shingles of XXH64(shingle, seed = k)` — bit-identical to
  * the aggregate's sketch, asserted in ExpressionParitySpec.
  *
  * Exists for Structured Streaming: the batch LSH computes signatures
  * with a groupBy aggregate, but a streaming query cannot chain an
  * aggregation into `flatMapGroupsWithState` (the band-bucket state
  * stage of [[graft.streaming.Streams.nearDupStream]]), so the
  * signature must be a stateless per-row projection there.
  */
case class MinHashRow(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  val numHashes = 32

  override def inputTypes: Seq[GraftBridge.ADT] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash32_row"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        var k = 0
        while (k < numHashes) {
          val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
            s.numBytes(), k)
          if (h < sig(k)) sig(k) = h
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig.map(x => x: Any))
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashRow =
    copy(child = newChild)
}

object MinHashRow {
  def minhash32_row(c: Column): Column =
    GraftBridge.column(MinHashRow(GraftBridge.expression(c)))
}
