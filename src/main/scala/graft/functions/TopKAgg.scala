package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `topk(score, id, k)` — bounded per-group top-k as a custom Catalyst
  * aggregate (`TypedImperativeAggregate`), ordered by (score DESC, id
  * ASC).
  *
  * This is the two-phase top-k shape: every map task keeps at most `k`
  * (score, id) pairs per group, the shuffle carries those tiny partial
  * states, and the reducer merges ≤k-element lists. A
  * `row_number().over(Window.partitionBy(q))` formulation instead
  * shuffles EVERY scored row into ≤|q| reducer tasks and fully sorts
  * them — a funnel that collapses parallelism to the number of queries
  * (5 here) no matter how large the scored stream grows. With this
  * aggregate the reduced data per group is k·num_map_tasks rows,
  * independent of corpus size.
  *
  * Output: `array<struct<score:double, id:long>>`, sorted, length ≤ k —
  * posexplode it to recover (rank, id, score) rows.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[(Double, Long)]]
  with ExpectsInputTypes {

  type Buf = scala.collection.mutable.ArrayBuffer[(Double, Long)]

  override def children: Seq[Expression] = Seq(score, id)
  override def inputTypes: Seq[GraftBridge.ADT] = Seq(DoubleType, LongType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk"

  /** (score DESC, id ASC): a beats b. NaN-aware: a NaN score loses to
    * any real score (NaN-vs-NaN ties break by id). The plain `as > bs`
    * comparison is false in BOTH directions against NaN, so a NaN that
    * reached the buffer first would block every later real entry and
    * the result would depend on arrival order — every current call
    * site filters zero norms upstream so NaN can't arrive, but the
    * aggregate must not silently depend on that precondition.
    * NaN-loses matches the `min_by` the topk(1) assignment replaced
    * (Spark's total order puts NaN above every real, so min_by never
    * picks it while real values exist). */
  @inline private def beats(as: Double, ai: Long, bs: Double, bi: Long): Boolean = {
    val an = java.lang.Double.isNaN(as)
    val bn = java.lang.Double.isNaN(bs)
    if (an || bn) (!an && bn) || (an && bn && ai < bi)
    else as > bs || (as == bs && ai < bi)
  }

  override def createAggregationBuffer(): Buf = new Buf(k + 1)

  /** Insertion into a ≤k-element list kept sorted best-first; k is
    * small (10 here), so linear insertion beats heap bookkeeping. */
  private def insert(buf: Buf, s: Double, i: Long): Unit = {
    if (buf.length >= k) {
      val (ws, wi) = buf.last
      if (!beats(s, i, ws, wi)) return
    }
    var pos = 0
    while (pos < buf.length && {
      val (bs, bi) = buf(pos); beats(bs, bi, s, i)
    }) pos += 1
    buf.insert(pos, (s, i))
    if (buf.length > k) buf.remove(buf.length - 1)
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val sv = score.eval(input)
    val iv = id.eval(input)
    if (sv != null && iv != null)
      insert(buf, sv.asInstanceOf[Double], iv.asInstanceOf[Long])
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    b.foreach { case (s, i) => insert(a, s, i) }
    a
  }

  override def eval(buf: Buf): Any =
    new GenericArrayData(buf.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    }.toArray[Any])

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.length * 16)
    bb.putInt(buf.length)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buf(n + 1)
    var i = 0
    while (i < n) { buf += ((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAgg {
  /** Column API: `df.groupBy("q_id").agg(topk($"cos", $"cand_id", 10))`. */
  def topk(score: Column, id: Column, k: Int): Column =
    GraftBridge.column(
      TopKAgg(GraftBridge.expression(score), GraftBridge.expression(id), k)
        .toAggregateExpression())
}
