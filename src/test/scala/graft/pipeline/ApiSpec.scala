package graft.pipeline

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The HTTP facade, driven through a real loopback socket — mirrors
  * the reference's server_test + the §3.1 start/resume handlers. */
class ApiSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val registry = BlockRegistry.standard()

  private def get(port: Int, path: String): (Int, String) = {
    val client = java.net.http.HttpClient.newHttpClient()
    val resp = client.send(
      java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def post(port: Int, path: String, body: String): (Int, String) = {
    val client = java.net.http.HttpClient.newHttpClient()
    val resp = client.send(
      java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"http://127.0.0.1:$port$path"))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("health, blocks, pipelines, start, processings round-trip") {
    val specJson =
      """{"slug":"api-pipe","title":"t","description":"d","blocks":[
        |{"id":"wrap_text","slug":"wrap","description":"wrap the posted input text",
        | "input":{"prefix":"(",  "suffix":")"}}
        |]}""".stripMargin
    val spec = PipelineSpec.parse(specJson, registry.ids).toOption.get
    val uploadSpec = PipelineSpec("upload-pipe", "t", "d", Seq(
      BlockSpec("upload_file", "take", "accept the posted file bytes")))
    val root = java.nio.file.Files.createTempDirectory("graft-api").toString
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val conf = Runner.RunConfig(spark, registry,
      new CheckpointStore(root), Clients.mockCtx())
    val svc = new PipelineService(Seq(spec, uploadSpec), conf)
    val port = svc.start()
    try {
      assert(get(port, "/health") == (200, """{"status":"ok"}"""))

      val (bc, blocks) = get(port, "/blocks")
      assert(bc == 200 && blocks.contains(""""id":"wrap_text""""))
      // all 25 block ids are served, with their input schemas
      assert(registry.ids.forall(id => blocks.contains(s""""id":"$id"""")))
      assert(blocks.contains(""""input_schema""""))
      assert(blocks.contains(""""enum""""))

      val (pc, pipelines) = get(port, "/pipelines")
      assert(pc == 200 && pipelines.contains(""""slug":"api-pipe""""))
      assert(get(port, "/pipelines/nope")._1 == 404)

      val (sc, started) = post(port, "/pipelines/api-pipe/start",
        """{"block":{"slug":"","input":{"text":"ping"}}}""")
      assert(sc == 200 && started.contains("processing_id"))
      val pid = started.split("\"")(3)

      // async run → poll for the status doc
      val deadline = System.currentTimeMillis() + 20000
      var done = false
      while (!done && System.currentTimeMillis() < deadline) {
        val (_, body) = get(port, "/pipelines/api-pipe/processings")
        done = body.contains(pid) && body.contains(""""is_completed":true""")
        if (!done) Thread.sleep(50)
      }
      assert(done, "processing did not complete in time")

      // the checkpointed output is the wrapped text
      val out = conf.checkpoint.loadOutput("api-pipe", pid, "wrap").get
      assert(new String(out.head._2, "UTF-8") == "(ping)")

      // details endpoint: status + structured ledger
      val (dc, details) = get(port, s"/pipelines/api-pipe/processings/$pid")
      assert(dc == 200 && details.contains(""""is_completed":true"""))
      assert(details.contains(""""block":"wrap""""))
      assert(get(port, "/pipelines/api-pipe/processings/nope")._1 == 404)

      // base64 file input (the multipart analogue): starts an
      // upload-shaped run whose checkpoint holds the decoded bytes
      val png = Clients.MockLLMClient.pngBytes("api-upload")
      val b64 = java.util.Base64.getEncoder.encodeToString(png)
      val (uc, up) = post(port, "/pipelines/upload-pipe/start",
        s"""{"block":{"slug":"","input":{"file_b64":"$b64"}}}""")
      assert(uc == 200)
      val upid = up.split("\"")(3)
      val deadline2 = System.currentTimeMillis() + 20000
      var uploaded: Option[Seq[(Int, Array[Byte])]] = None
      while (uploaded.isEmpty && System.currentTimeMillis() < deadline2) {
        uploaded = conf.checkpoint.loadOutput("upload-pipe", upid, "take")
        if (uploaded.isEmpty) Thread.sleep(50)
      }
      assert(uploaded.get.head._2.sameElements(png))

      // resume requires processing_id and slug
      assert(post(port, "/pipelines/api-pipe/resume", "{}")._1 == 400)
      val (rc, _) = post(port, "/pipelines/api-pipe/resume",
        s"""{"pipeline":{"processing_id":"$pid"},"block":{"slug":"wrap","input":{"text":"again"}}}""")
      assert(rc == 200)
    } finally svc.stop()
  }
}
