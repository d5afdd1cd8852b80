package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** E1-E6 semantics, mirroring the reference engine unit tests
  * (test/unit/pipeline_test.go MergeMaps/priority cases and
  * json_path_test.go). */
class WiringSpec extends AnyFunSuite {

  private def m(kvs: (String, String)*): Map[String, PValue] =
    kvs.map { case (k, v) => k -> (PStr(v): PValue) }.toMap

  test("mergeMaps zips two aligned property streams by position") {
    val in = Seq(m("a" -> "a0"), m("a" -> "a1"), m("b" -> "b0"), m("b" -> "b1"))
    assert(Wiring.mergeMaps(in) ==
      Seq(m("a" -> "a0", "b" -> "b0"), m("a" -> "a1", "b" -> "b1")))
  }

  test("mergeMaps broadcasts a scalar over a longer stream (inherit from last row)") {
    val in = Seq(m("s" -> "x"), m("b" -> "b0"), m("b" -> "b1"), m("b" -> "b2"))
    assert(Wiring.mergeMaps(in) == Seq(
      m("s" -> "x", "b" -> "b0"), m("s" -> "x", "b" -> "b1"), m("s" -> "x", "b" -> "b2")))
  }

  test("mergeMaps collapses equal consecutive values (reference quirk)") {
    // Two identical 'a' maps merge into one row — replicated, not fixed.
    val in = Seq(m("a" -> "same"), m("a" -> "same"), m("b" -> "b0"), m("b" -> "b1"))
    assert(Wiring.mergeMaps(in) ==
      Seq(m("a" -> "same", "b" -> "b0"), m("a" -> "same", "b" -> "b1")))
  }

  test("mergeMaps property: distinct aligned streams always zip (n=2..12)") {
    (2 to 12).foreach { n =>
      val as = (0 until n).map(i => m("a" -> s"a$i"))
      val bs = (0 until n).map(i => m("b" -> s"b$i"))
      val cs = (0 until n).map(i => m("c" -> s"c$i"))
      val merged = Wiring.mergeMaps(as ++ bs ++ cs)
      assert(merged.size == n)
      merged.zipWithIndex.foreach { case (row, i) =>
        assert(row == m("a" -> s"a$i", "b" -> s"b$i", "c" -> s"c$i"))
      }
    }
  }

  test("inputByPriority: request > wired > literal, fill-missing-only") {
    val out = Wiring.inputByPriority(
      request = Some(m("text" -> "from-request")),
      wired = Seq(m("text" -> "from-wired", "extra" -> "w")),
      literal = Some(m("text" -> "from-literal", "sep" -> ",")))
    // Request wins on 'text'; wired/literal fill only missing keys;
    // wired rows re-append and merge (pipeline.go:305).
    assert(out.head("text") == PStr("from-request"))
    assert(out.head("extra") == PStr("w"))
    assert(out.head("sep") == PStr(","))
  }

  test("inputByPriority: literal only when nothing else") {
    val out = Wiring.inputByPriority(None, Nil, Some(m("a" -> "1")))
    assert(out == Seq(m("a" -> "1")))
  }

  test("handleResultValue: JSON detection by first byte, else raw string") {
    assert(Wiring.handleResultValue("""{"a":1}""".getBytes("UTF-8"))
      == Right(PObj(Map("a" -> PInt(1)))))
    assert(Wiring.handleResultValue("plain text".getBytes("UTF-8"))
      == Right(PStr("plain text")))
    assert(Wiring.handleResultValue("{broken".getBytes("UTF-8")).isLeft)
  }

  test("JsonPath: scalar, nested, index, star") {
    val v = Json.parse(
      """{"text":"all","segments":[{"t":"s0"},{"t":"s1"},{"t":"s2"}]}""")
    assert(JsonPath.eval(v, "$.text") == Seq(PStr("all")))
    assert(JsonPath.eval(v, "$.segments[1].t") == Seq(PStr("s1")))
    assert(JsonPath.eval(v, "$.segments[*].t") ==
      Seq(PStr("s0"), PStr("s1"), PStr("s2")))
    assert(JsonPath.eval(v, "$") == Seq(v))
    assert(JsonPath.eval(v, "$.missing").isEmpty)
  }

  test("resolveWired: star JSONPath fans out one row per element in array mode") {
    val transcription =
      """{"segments":[{"text":" a"},{"text":" b"},{"text":" c"},{"text":" d"}]}"""
    val ic = InputConfig(isArray = true, property = Map(
      "user_prompt" -> PropertyWiring("tr", Some("$.segments[*].text"))))
    val props = Map("user_prompt" -> PropSpec("user_prompt", TString))
    val out = Wiring.resolveWired(ic, props,
      s => if (s == "tr") Some(Seq(transcription.getBytes("UTF-8"))) else None)
    assert(out == Right(Seq(
      Map("user_prompt" -> PStr(" a")), Map("user_prompt" -> PStr(" b")),
      Map("user_prompt" -> PStr(" c")), Map("user_prompt" -> PStr(" d")))))
  }

  test("resolveWired: array_input passes all buffers as one array value") {
    val ic = InputConfig(property = Map(
      "videos" -> PropertyWiring("clips", arrayInput = true)))
    val props = Map("videos" -> PropSpec("videos", TArr(TFile)))
    val bufs = Seq("v0".getBytes, "v1".getBytes, "v2".getBytes)
    val out = Wiring.resolveWired(ic, props, s => Some(bufs))
    val rows = out.toOption.get
    // one map per origin buffer, each holding the WHOLE array (the
    // scalar-mode collapse then keeps the first)
    assert(rows.size == 3)
    val combined = Wiring.combine(ic, rows)
    assert(combined.size == 1)
    combined.head("videos") match {
      case PArr(vs) => assert(vs.map(_.asString) == Seq("v0", "v1", "v2"))
      case other    => fail(s"expected array, got $other")
    }
  }

  test("resolveWired: unknown origin and bad json path are errors") {
    val ic = InputConfig(property = Map("x" -> PropertyWiring("nope")))
    assert(Wiring.resolveWired(ic, Map.empty, _ => None).isLeft)
    val ic2 = InputConfig(property = Map(
      "x" -> PropertyWiring("src", Some("$.missing"))))
    assert(Wiring.resolveWired(ic2, Map.empty,
      _ => Some(Seq("""{"a":1}""".getBytes))).isLeft)
  }

  test("spec parse: duplicate slugs, unknown ids, short descriptions rejected") {
    val json =
      """{"slug":"p","title":"t","description":"d","blocks":[
        |{"id":"wrap_text","slug":"dup","description":"first of the duplicate slugs here"},
        |{"id":"wrap_text","slug":"dup","description":"second of the duplicate slugs here"},
        |{"id":"no_such_block","slug":"b3","description":"references an unregistered block id"},
        |{"id":"wrap_text","slug":"b4","description":"too short"},
        |{"id":"wrap_text","slug":"b5","description":"wires a property to a missing origin",
        | "input_config":{"property":{"text":{"origin":"ghost"}}}}
        |]}""".stripMargin
    val errs = PipelineSpec.parse(json, Set("wrap_text")).swap.toOption.get
    assert(errs.exists(_.contains("duplicate block slug 'dup'")))
    assert(errs.exists(_.contains("unknown block id 'no_such_block'")))
    assert(errs.exists(_.contains("at least 20 chars")))
    assert(errs.exists(_.contains("unknown origin 'ghost'")))
  }

  test("spec parse validates origins against document order") {
    val knownIds = Set("wrap_text")
    val json =
      """{"slug":"p","title":"t","description":"d","blocks":[
        |{"id":"wrap_text","slug":"b1","description":"first block with a long description",
        | "input_config":{"property":{"text":{"origin":"b2"}}}},
        |{"id":"wrap_text","slug":"b2","description":"second block with a long description"}
        |]}""".stripMargin
    val parsed = PipelineSpec.parse(json, knownIds)
    assert(parsed.isLeft)
    assert(parsed.swap.toOption.get.exists(_.contains("must precede")))
  }
}
