package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunks of a document's whitespace tokenization, as a
  * native Catalyst `Expression`: the token stream is cut after position
  * `i` (1-based, probed for 4 ≤ i ≤ n−1) whenever the md5 of the
  * trailing 4-token window — first 8 hex chars as an integer — is
  * ≡ 0 (mod 16). Expected chunk length ~16 tokens; boundaries depend
  * only on local content (the Rabin/FastCDC property).
  *
  * Semantically identical to the HOF formulation
  * `transform(sequence(..), j -> concat_ws(" ", slice(tk, cuts[j]+1,
  * cuts[j+1]-cuts[j])))` over a filtered cut array, but ONE pass per
  * document: that formulation re-evaluated the whole md5-filtered cut
  * array inside every lambda invocation once CollapseProject inlined
  * it (measured 38 s → <1 s at sf0.01 for dd_cdc). Mirrors the DuckDB
  * oracle exactly — same window string, same md5 prefix, same modulus.
  *
  * CodegenFallback is deliberate, as in [[ShingleArray]]: per-row work
  * (md5 per window) dwarfs the fallback's virtual call and the
  * surrounding plan stays in whole-stage codegen.
  */
case class CdcChunks(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[GraftBridge.ADT] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override protected def nullSafeEval(input: Any): Any = {
    // limit -1: KEEP trailing empty tokens — both Spark's split() and
    // DuckDB's string_split_regex do (Java's default limit 0 drops them)
    val toks = ShingleArray.sqlTrim(input.asInstanceOf[UTF8String].toString)
      .split("\\s+", -1)
    val n = toks.length
    val md = java.security.MessageDigest.getInstance("MD5")
    val cuts = scala.collection.mutable.ArrayBuffer(0)
    var i = 4 // 1-based window-end position; final position never probed
    while (i <= n - 1) {
      val win = new java.lang.StringBuilder()
      var j = i - 4
      while (j < i) {
        if (j > i - 4) win.append(' ')
        win.append(toks(j))
        j += 1
      }
      md.reset()
      // first 8 hex chars of the md5 = first 4 digest bytes as an
      // unsigned 32-bit big-endian int (no hex round-trip)
      val d = md.digest(win.toString.getBytes("UTF-8"))
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      if (h % 16 == 0) cuts += i
      i += 1
    }
    cuts += n
    val out = new Array[Any](cuts.length - 1)
    var c = 0
    while (c < cuts.length - 1) {
      val sb = new java.lang.StringBuilder()
      var k = cuts(c)
      while (k < cuts(c + 1)) {
        if (k > cuts(c)) sb.append(' ')
        sb.append(toks(k))
        k += 1
      }
      out(c) = UTF8String.fromString(sb.toString)
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {
  def cdc_chunks(c: Column): Column =
    GraftBridge.column(CdcChunks(GraftBridge.expression(c)))
}
