package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `simhash64_row(text)` — the per-ROW form of the
  * `simhash64(xxhash64(tok))` exploded-stream aggregate: the
  * frequency-weighted 64-bit SimHash of one document, computed in a
  * single expression evaluation. Tokenization mirrors
  * `split(trim(text), '\s+')` exactly (SQL trim strips spaces only —
  * [[ShingleArray.sqlTrim]]; limit -1 keeps trailing empty tokens);
  * each token is hashed with XXH64 at seed 42 — the seed of Spark's
  * `xxhash64` — and bit b of the signature is set iff a strict
  * majority of the token hashes have it set (`2·cnt_set(b) > n`).
  * Bit-identical to the aggregate formulation, asserted in
  * ExpressionParitySpec.
  *
  * Exists for the same reason as [[MinHashRow]]: the signature is a
  * pure projection — no explode, no shuffle, no aggregation hash map —
  * so the stage is map-only and embarrassingly parallel at any corpus
  * size. Tokenization and hashing happen INSIDE the expression with a
  * cached compiled pattern: an interpreted `split(...)` child (any
  * CodegenFallback's children evaluate interpreted) recompiles the
  * regex per document, and a `transform(.., xxhash64)` wrapper
  * evaluates the lambda interpreted per token — both measured traps.
  * [[SimHashAgg]] remains the distributed-aggregate form for when
  * token hashes arrive as rows (SQL `simhash64(h) GROUP BY`).
  */
case class SimHashRow(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[GraftBridge.ADT] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64_row"

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  override protected def nullSafeEval(input: Any): Any = {
    val toks = ws.split(
      ShingleArray.sqlTrim(input.asInstanceOf[UTF8String].toString), -1)
    val counts = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val s = UTF8String.fromString(toks(i))
      // seed 42 = Spark SQL xxhash64's seed, for slot-exact parity
      // with simhash64(xxhash64(tok)) over an exploded token stream
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
        s.numBytes(), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1
        b += 1
      }
      i += 1
    }
    val n = toks.length
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
