package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over a string's UTF-8 bytes:
  * `acc_{i+1} = (131 * acc_i + byte_i) mod 1_000_000_007`.
  *
  * Document fingerprinting primitive (SURVEY "beyond-reference" text
  * analysis). Implemented as a native Catalyst `Expression` with
  * `doGenCode` so it stays inside whole-stage codegen — at 100 TB this
  * runs once per document in the generated loop, with no UDF
  * serialization boundary. The modulus keeps the value reproducible in
  * any engine with 64-bit integers (the DuckDB oracle replicates it with
  * `list_reduce` over `unicode()` codes, identical for ASCII corpora).
  */
case class RollingHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.GraftBridge.ADT] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 131L + (bytes(i) & 0xffL)) % 1000000007L
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $acc = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $acc = ($acc * 131L + ($bytes[$i] & 0xffL)) % 1000000007L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  import org.apache.spark.sql.GraftBridge

  /** Column-API entry point: `rolling_hash($"text")`. */
  def rolling_hash(c: Column): Column =
    GraftBridge.column(RollingHash(GraftBridge.expression(c)))

  /** Register as a SQL function (`SELECT rolling_hash(text) ...`).
    * Arity and input type are checked at analysis time (ExpectsInputTypes
    * covers the type; the builder rejects wrong arity). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash",
      exprs => {
        if (exprs.length != 1)
          throw new IllegalArgumentException(
            s"rolling_hash expects exactly 1 argument, got ${exprs.length}")
        RollingHash(exprs.head)
      },
      "built-in")
}
