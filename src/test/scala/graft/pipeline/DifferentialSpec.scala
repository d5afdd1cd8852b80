package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Differential testing: the two executors must agree on randomized
  * pure-compute specs, and the JsonPathExtract expression must agree
  * with Spark's built-in get_json_object on scalar paths. */
class DifferentialSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val registry = BlockRegistry.standard()

  test("Runner and BulkRunner agree on 20 randomized text pipelines") {
    val rnd = new Random(42)
    def word() = Random.alphanumeric.take(rnd.nextInt(5) + 1).mkString
    (0 until 20).foreach { i =>
      val nSegs = rnd.nextInt(4) + 1
      val segs = Seq.fill(nSegs)(s"${word()} ${word()} ${word()}")
      val transcription =
        s"""{"segments":[${segs.map(s => s"""{"text":"$s"}""").mkString(",")}]}"""
      val old = segs.head.split(" ")(rnd.nextInt(3))
      val spec = PipelineSpec(s"fuzz-$i", "t", "d", Seq(
        BlockSpec("upload_file", "src", "carry the random transcription json",
          input = Map("file" -> PStr(transcription))),
        BlockSpec("wrap_text", "wrap", "wrap each random segment",
          input = Map("prefix" -> PStr(word()), "suffix" -> PStr(word())),
          inputConfig = Some(InputConfig(isArray = true, property = Map(
            "text" -> PropertyWiring("src", Some("$.segments[*].text")))))),
        BlockSpec("text_replace", "repl", "replace one random token",
          input = Map("old" -> PStr(old), "new" -> PStr(word())),
          inputConfig = Some(InputConfig(isArray = true, property = Map(
            "text" -> PropertyWiring("wrap"))))),
        BlockSpec("join_strings", "join", "join the replaced segments",
          input = Map("separator" -> PStr("|")),
          inputConfig = Some(InputConfig(property = Map(
            "strings" -> PropertyWiring("repl", arrayInput = true)))))))

      val ctrl = Runner.process(spec, Runner.StartInput(),
        Runner.RunConfig(spark, registry,
          new CheckpointStore(java.nio.file.Files
            .createTempDirectory("fuzz").toString), Clients.mockCtx()))
      assert(ctrl.status == Runner.Completed, s"spec $i: ${ctrl.status}")
      val ctrlJoin = new String(ctrl.outputs("join").head._2, "UTF-8")

      val bulk = BulkRunner.run(spec, Map.empty,
        BulkRunner.BulkConfig(spark, registry, Clients.mockCtx()))
      val bulkJoin = new String(
        bulk("join").collect()(0).getAs[Array[Byte]]("value"), "UTF-8")
      assert(bulkJoin == ctrlJoin, s"executor divergence on spec $i")
    }
  }

  test("executors agree on a misaligned two-origin zip (inherit rule)") {
    // a 4-way text fan-out zipped with a 2-way mark fan-out: positions
    // past the shorter stream inherit its last value (MergeMaps
    // block.go:404-500) — both executors must produce the same rows
    val texts =
      """{"segments":[{"text":"aa x"},{"text":"bb x"},{"text":"cc x"},{"text":"dd x"}]}"""
    val marks = """{"marks":[{"m":"aa"},{"m":"bb"}]}"""
    val spec = PipelineSpec("misaligned", "t", "d", Seq(
      BlockSpec("upload_file", "src", "carry the four-segment transcription",
        input = Map("file" -> PStr(texts))),
      BlockSpec("upload_file", "src2", "carry the two-mark json document",
        input = Map("file" -> PStr(marks))),
      BlockSpec("text_replace", "repl", "replace the wired mark per segment",
        input = Map("new" -> PStr("ZZ")),
        inputConfig = Some(InputConfig(isArray = true, property =
          scala.collection.immutable.ListMap(
            "text" -> PropertyWiring("src", Some("$.segments[*].text")),
            "old" -> PropertyWiring("src2", Some("$.marks[*].m")))))),
      BlockSpec("join_strings", "join", "join the replaced segments",
        input = Map("separator" -> PStr("|")),
        inputConfig = Some(InputConfig(property = Map(
          "strings" -> PropertyWiring("repl", arrayInput = true)))))))

    val ctrl = Runner.process(spec, Runner.StartInput(),
      Runner.RunConfig(spark, registry,
        new CheckpointStore(java.nio.file.Files
          .createTempDirectory("misaligned").toString), Clients.mockCtx()))
    assert(ctrl.status == Runner.Completed, ctrl.status.toString)
    val ctrlJoin = new String(ctrl.outputs("join").head._2, "UTF-8")

    val bulk = BulkRunner.run(spec, Map.empty,
      BulkRunner.BulkConfig(spark, registry, Clients.mockCtx()))
    val bulkJoin = new String(
      bulk("join").collect()(0).getAs[Array[Byte]]("value"), "UTF-8")
    assert(bulkJoin == ctrlJoin, s"divergence: bulk=$bulkJoin ctrl=$ctrlJoin")
    // rows 2-3 inherited mark "bb", which only matches row 1's text
    assert(ctrlJoin == "ZZ x|ZZ x|cc x|dd x", ctrlJoin)
  }

  test("JsonPathExtract agrees with get_json_object on scalar paths") {
    val dir = SparkTestSession.sf
    val events = graft.Tables.t(spark, dir, "events")
    val both = events.select(
      element_at(JsonPathExtract.json_path_extract(col("props"), "$.k"), 1).as("mine"),
      get_json_object(col("props"), "$.k").as("builtin"))
    assert(both.where(col("mine") =!= col("builtin") ||
      col("mine").isNull =!= col("builtin").isNull).count() == 0)
  }
}
