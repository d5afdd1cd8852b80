package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `minhash32(shingle)` — a 32-permutation MinHash set sketch as a
  * custom Catalyst AGGREGATE (`TypedImperativeAggregate[Array[Long]]`).
  *
  * The sketch of a group is `sig[k] = min over rows of xxhash64(value,
  * seed=k)`; Jaccard similarity between two groups ≈ fraction of equal
  * signature slots. One 256-byte buffer per group replaces 32 separate
  * `min(hash(...))` aggregate columns: narrower shuffle rows, one
  * buffer update per input row, and partial merge is a pairwise min —
  * the classic mergeable-sketch shape that makes it work as a
  * map-side-combined distributed aggregate at any scale.
  */
case class MinHashAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  val numHashes = 32

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[GraftBridge.ADT] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash32"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buffer: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var k = 0
      while (k < numHashes) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), k)
        if (h < buffer(k)) buffer(k) = h
        k += 1
      }
    }
    buffer
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var k = 0
    while (k < numHashes) { if (b(k) < a(k)) a(k) = b(k); k += 1 }
    a
  }

  override def eval(buffer: Array[Long]): Any =
    new GenericArrayData(buffer.map(x => x: Any))

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(numHashes * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}

object MinHashAgg {
  /** Column API: `df.groupBy("doc_id").agg(minhash32($"shingle"))`. */
  def minhash32(c: Column): Column =
    GraftBridge.column(
      MinHashAgg(GraftBridge.expression(c)).toAggregateExpression())

  /** Estimated Jaccard similarity of two signatures: fraction of equal
    * slots. */
  def jaccardEstimate(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x).cast("double") / 32.0
  }
}
