package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JSONPath subset used by the reference's wiring (`$`, `$.a.b`,
  * `$.arr[2].c`, `$.segments[*].text` — block.go:303-365): evaluated
  * against the PValue tree; `[*]` produces one match per element (the
  * fan-out source, engine op E3).
  */
object JsonPath {
  sealed trait Tok
  case class Field(name: String) extends Tok
  case class Index(i: Int) extends Tok
  case object Star extends Tok

  def compile(path: String): Seq[Tok] = {
    require(path.startsWith("$"), s"JSONPath must start with $$: $path")
    val rest = path.drop(1)
    val toks = scala.collection.mutable.ArrayBuffer[Tok]()
    var i = 0
    while (i < rest.length) {
      rest(i) match {
        case '.' =>
          val j0 = i + 1
          var j = j0
          while (j < rest.length && rest(j) != '.' && rest(j) != '[') j += 1
          if (j > j0) toks += Field(rest.substring(j0, j))
          i = j
        case '[' =>
          val j = rest.indexOf(']', i)
          require(j > i, s"unclosed [ in $path")
          val inner = rest.substring(i + 1, j).trim
          toks += (if (inner == "*") Star else Index(inner.toInt))
          i = j + 1
        case c => throw new IllegalArgumentException(s"bad JSONPath char '$c' in $path")
      }
    }
    toks.toSeq
  }

  /** All matches of `path` in `v` (empty if no match). */
  def eval(v: PValue, path: String): Seq[PValue] = walk(Seq(v), compile(path))

  private def walk(vs: Seq[PValue], toks: Seq[Tok]): Seq[PValue] = toks match {
    case Seq() => vs
    case t +: rest =>
      val next = vs.flatMap { v =>
        (t, v) match {
          case (Field(n), PObj(m)) => m.get(n).toSeq
          // Field access maps over arrays (oliveagle/jsonpath get_key
          // collects the key from every element) — how `array_input` +
          // `$.text` projects a field out of each buffered JSON.
          case (Field(n), PArr(a)) =>
            a.flatMap { case PObj(m) => m.get(n).toSeq; case _ => Nil }
          case (Index(i), PArr(a)) => if (i >= 0 && i < a.size) Seq(a(i)) else Nil
          case (Star, PArr(a))     => a
          case _                   => Nil
        }
      }
      walk(next, rest)
  }

  /** Render a matched value the way the reference hands it to the next
    * block: scalars as their string form, composites as JSON. */
  def renderMatch(v: PValue): String = v match {
    case PStr(s)            => s
    case o @ (PObj(_) | PArr(_)) => Json.render(o)
    case other              => other.asString
  }
}

/** Catalyst expression `json_path_extract(json_str, path)` →
  * `ARRAY<STRING>` of matches. Parse-or-passthrough per the reference's
  * HandleResultValue (block.go:502-519): non-JSON input under path `$`
  * yields the raw string. Evaluated per row on executors (wiring stays
  * distributed); CodegenFallback is fine — JSON parsing dominates. */
case class JsonPathExtract(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "json_path_extract"

  override protected def nullSafeEval(json: Any, path: Any): Any = {
    val s = json.toString
    val p = path.toString
    val parsed = Json.tryParse(s)
    val matches: Seq[String] = parsed match {
      case Some(v) => JsonPath.eval(v, p).map(JsonPath.renderMatch)
      case None    => if (p.trim == "$") Seq(s) else Nil
    }
    new GenericArrayData(matches.map(UTF8String.fromString).toArray[Any])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JsonPathExtract =
    copy(left = newLeft, right = newRight)
}

object JsonPathExtract {
  import org.apache.spark.sql.GraftBridge
  def json_path_extract(json: Column, path: String): Column =
    GraftBridge.column(JsonPathExtract(GraftBridge.expression(json),
      org.apache.spark.sql.catalyst.expressions.Literal(UTF8String.fromString(path), StringType)))
}
