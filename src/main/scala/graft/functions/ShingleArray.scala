package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 3-word shingles of a document's whitespace tokenization, as
  * a native Catalyst `Expression`.
  *
  * Semantically identical to
  * `array_distinct(transform(sequence(1, greatest(n-2, 1)), i ->
  *   concat_ws(" ", slice(split(trim(text), "\\s+"), i, 3))))`
  * but tokenizes ONCE per document. The higher-order formulation
  * re-evaluates the regex split inside every lambda invocation (slice's
  * child is the split expression), making shingling O(tokens²) per
  * document and the dominant cost of every shingle-based dedup operator.
  * Here it is a single pass: split, then one sliding window.
  *
  * CodegenFallback is deliberate: the per-row work (regex split + array
  * build) dwarfs the one virtual call the fallback costs, and the
  * surrounding plan stays in whole-stage codegen.
  */
case class ShingleArray(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[GraftBridge.ADT] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles3"

  override protected def nullSafeEval(input: Any): Any = {
    // limit -1: KEEP trailing empty tokens — both Spark's split() and
    // DuckDB's string_split_regex do (Java's default limit 0 drops them)
    val toks = ShingleArray.sqlTrim(input.asInstanceOf[UTF8String].toString)
      .split("\\s+", -1)
    val out = new java.util.LinkedHashSet[String]()
    val last = math.max(toks.length - 3, 0)
    var i = 0
    while (i <= last) {
      val end = math.min(i + 3, toks.length)
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out.add(sb.toString)
      i += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}

object ShingleArray {
  def shingles3(c: Column): Column =
    GraftBridge.column(ShingleArray(GraftBridge.expression(c)))

  /** SQL-`trim` semantics: strip SPACES only. Java's `String.trim`
    * strips every char ≤ U+0020 (tabs, newlines), so a tab-edged
    * document would tokenize differently here than in the Spark HOF
    * (`trim()` strips spaces only) and the DuckDB oracle — a latent
    * parity break for any native expression that claims to mirror the
    * `split(trim(text), '\s+')` formulation. */
  private[functions] def sqlTrim(s: String): String = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    if (b == 0 && e == s.length) s else s.substring(b, e)
  }
}
