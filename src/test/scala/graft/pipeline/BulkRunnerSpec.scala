package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The data-plane executor: agreement with the control-plane Runner on
  * pure-compute specs, and distributed behavior on a fan-out far past
  * driver-materialization comfort. */
class BulkRunnerSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val registry = BlockRegistry.standard()

  private val transcription =
    """{"segments":[{"text":" alpha"},{"text":" beta"},{"text":" gamma"}]}"""

  // upload(tr) → wrap per segment (star fan-out) → replace → join
  private val spec = PipelineSpec("bulk-pipe", "t", "d", Seq(
    BlockSpec("upload_file", "tr", "carry the transcription json",
      input = Map("file" -> PStr(transcription))),
    BlockSpec("wrap_text", "per-seg", "wrap each segment text",
      input = Map("prefix" -> PStr("["), "suffix" -> PStr("]")),
      inputConfig = Some(InputConfig(isArray = true, property = Map(
        "text" -> PropertyWiring("tr", Some("$.segments[*].text")))))),
    BlockSpec("text_replace", "replace", "replace the bracket marker",
      input = Map("old" -> PStr("["), "new" -> PStr("{")),
      inputConfig = Some(InputConfig(isArray = true, property = Map(
        "text" -> PropertyWiring("per-seg"))))),
    BlockSpec("join_strings", "join", "join the wrapped segments",
      input = Map("separator" -> PStr("|")),
      inputConfig = Some(InputConfig(property = Map(
        "strings" -> PropertyWiring("replace", arrayInput = true)))))))

  test("bulk executor agrees with the control-plane Runner") {
    val bulkConf = BulkRunner.BulkConfig(spark, registry, Clients.mockCtx())
    val bulk = BulkRunner.run(spec, Map.empty, bulkConf)
    val bulkRows = bulk("per-seg").orderBy("idx").collect()
      .map(r => new String(r.getAs[Array[Byte]]("value"), "UTF-8")).toSeq
    assert(bulkRows == Seq("[alpha]", "[beta]", "[gamma]"))
    val bulkJoin = new String(
      bulk("join").collect()(0).getAs[Array[Byte]]("value"), "UTF-8")

    val runnerConf = Runner.RunConfig(spark, registry,
      new CheckpointStore(
        java.nio.file.Files.createTempDirectory("bulk-vs-runner").toString),
      Clients.mockCtx())
    val report = Runner.process(spec, Runner.StartInput(), runnerConf)
    assert(report.status == Runner.Completed)
    val runnerJoin = new String(report.outputs("join").head._2, "UTF-8")
    assert(bulkJoin == runnerJoin)
    assert(bulkJoin == "{alpha]|{beta]|{gamma]")
  }

  test("driver-side blocks are rejected with a clear message") {
    val bad = PipelineSpec("bad", "t", "d", Seq(
      BlockSpec("openai_chat_completion", "chat", "needs the control plane",
        input = Map("user_prompt" -> PStr("hi")))))
    val e = intercept[IllegalArgumentException] {
      BulkRunner.run(bad, Map.empty,
        BulkRunner.BulkConfig(spark, registry, Clients.mockCtx()))
    }
    assert(e.getMessage.contains("control-plane Runner"))
  }

  test("generic path keeps binary props binary and types numeric props") {
    // a real PNG (non-UTF8 bytes: a string round-trip would corrupt it)
    val img = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(1, 1, 0xff8800)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    assert(new String(png, "UTF-8").getBytes("UTF-8").toSeq != png.toSeq,
      "fixture must not survive a UTF-8 round-trip, or the test proves nothing")

    val initial = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(0, png)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("idx",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.BinaryType))))
    val resizeSpec = PipelineSpec("bulk-binary", "t", "d", Seq(
      BlockSpec("image_resize", "resize", "shrink the wired binary image",
        input = Map("width" -> PInt(2L), "height" -> PInt(2L)),
        inputConfig = Some(InputConfig(property = Map(
          "image" -> PropertyWiring("src")))))))
    val out = BulkRunner.run(resizeSpec, Map("src" -> initial),
      BulkRunner.BulkConfig(spark, registry, Clients.mockCtx()))
    val bytes = out("resize").collect()(0).getAs[Array[Byte]]("value")
    val decoded = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(decoded != null, "resize output must decode as an image")
    assert(decoded.getWidth == 2 && decoded.getHeight == 2)
  }

  test("a 50k-row stage runs distributed with parquet checkpoints") {
    val n = 50000
    val initial = spark.range(n).select(
      col("id").cast("int").as("idx"),
      concat(lit("doc-"), col("id")).cast("binary").as("value"))
    val wideSpec = PipelineSpec("bulk-wide", "t", "d", Seq(
      BlockSpec("wrap_text", "wrap", "wrap every row of the big stage",
        input = Map("prefix" -> PStr("<"), "suffix" -> PStr(">")),
        inputConfig = Some(InputConfig(isArray = true, property = Map(
          "text" -> PropertyWiring("src")))))))
    val root = java.nio.file.Files.createTempDirectory("bulk-ckpt").toString
    val out = BulkRunner.run(wideSpec, Map("src" -> initial),
      BulkRunner.BulkConfig(spark, registry, Clients.mockCtx(),
        checkpointDir = Some(root)))
    assert(out("wrap").count() == n)
    val sample = out("wrap").where(col("idx") === 12345).collect()(0)
    assert(new String(sample.getAs[Array[Byte]]("value"), "UTF-8") == "<doc-12345>")
    // checkpoint is a real parquet stage dir, reloadable (E12 at scale)
    val reloaded = BulkRunner.load(spark, root, "bulk-wide", "wrap")
    assert(reloaded.count() == n)
    // and the plan is a distributed select, not a driver loop
    assert(out("wrap").queryExecution.executedPlan.toString.contains("FileScan parquet"))
  }
}
