package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** `simhash64(token_hash)` — frequency-weighted 64-bit SimHash as a
  * custom Catalyst aggregate: a 64-counter buffer tallies how many
  * input hashes have each bit set; the final signature sets bit b iff
  * a strict majority do (identical to `2·cnt_set(b) > n`, the
  * reference-equivalent majority rule). One buffer update per row and
  * counter-wise addition on merge — mergeable, map-side-combined —
  * replacing 64 conditional-sum aggregate columns.
  */
case class SimHashAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[GraftBridge.ADT] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash64"

  /** 64 bit-counters + total count. */
  override def createAggregationBuffer(): Array[Int] = new Array[Int](65)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) buffer(b) += 1
        b += 1
      }
      buffer(64) += 1
    }
    buffer
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 65) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buffer: Array[Int]): Any = {
    val n = buffer(64)
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (buffer(b) * 2 > n) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(65 * 4)
    buffer.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(65)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
}

object SimHashAgg {
  /** Column API: `df.groupBy("doc_id").agg(simhash64(xxhash64($"tok")))`. */
  def simhash64(c: Column): Column =
    GraftBridge.column(
      SimHashAgg(GraftBridge.expression(c)).toAggregateExpression())
}
