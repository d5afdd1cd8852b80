package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** The production OpenAI-compatible client, driven against an
  * in-process loopback server (the reference's httptest pattern) —
  * request shapes and response extraction, zero egress. */
class ClientsSpec extends AnyFunSuite {

  private def withServer(routes: Map[String, com.sun.net.httpserver.HttpExchange => Unit])
      (body: String => Unit): Unit = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, h) =>
      server.createContext(path, (ex: com.sun.net.httpserver.HttpExchange) => h(ex))
    }
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def respond(ex: com.sun.net.httpserver.HttpExchange, code: Int,
      body: Array[Byte]): Unit = {
    ex.sendResponseHeaders(code, body.length)
    try ex.getResponseBody.write(body) finally ex.close()
  }

  test("chat: messages + response_format sent, content extracted") {
    var seen: PValue = PNull
    var auth = ""
    withServer(Map("/chat/completions" -> { ex =>
      auth = ex.getRequestHeaders.getFirst("Authorization")
      seen = Json.parse(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
      respond(ex, 200,
        """{"choices":[{"message":{"role":"assistant","content":"hi there"}}]}"""
          .getBytes("UTF-8"))
    })) { base =>
      val c = new Clients.OpenAIClient(base, "test-key")
      assert(c.available)
      assert(c.chat("gpt-test", "be brief", "hello", "json") == Right("hi there"))
      assert(auth == "Bearer test-key")
      val o = seen.asInstanceOf[PObj].m
      assert(o("model").asString == "gpt-test")
      val msgs = o("messages").asSeq
      assert(msgs.map(m => m.asInstanceOf[PObj].m("role").asString) ==
        Seq("system", "user"))
      assert(o("response_format").asInstanceOf[PObj].m("type").asString ==
        "json_object")
    }
  }

  test("tts returns raw bytes; image decodes b64_json; errors surface") {
    val audio = Array[Byte](1, 2, 3, -4, -5)
    val png = Clients.MockLLMClient.pngBytes("gen")
    val b64 = java.util.Base64.getEncoder.encodeToString(png)
    withServer(Map(
      "/audio/speech" -> (respond(_, 200, audio)),
      "/images/generations" -> (respond(_, 200,
        s"""{"data":[{"b64_json":"$b64"}]}""".getBytes("UTF-8"))),
      "/chat/completions" -> (respond(_, 500, "boom".getBytes("UTF-8"))))) { base =>
      val c = new Clients.OpenAIClient(base, "k")
      assert(c.tts("hi", "tts-1", "alloy", "mp3", 1.0).map(_.toSeq) ==
        Right(audio.toSeq))
      assert(c.imageGen("a cat", "standard", "1024x1024").map(_.toSeq) ==
        Right(png.toSeq))
      val err = c.chat("m", "", "u", "text")
      assert(err.isLeft && err.left.exists(_.contains("HTTP 500")))
    }
  }

  test("transcribe posts the audio as a multipart file field") {
    val audio = Clients.MockLLMClient.mp3Bytes("speech")
    var file: Array[Byte] = Array.empty
    var model = ""
    withServer(Map("/audio/transcriptions" -> { ex =>
      val ct = ex.getRequestHeaders.getFirst("Content-Type")
      val bound = Multipart.boundary(ct).get
      val (form, files) = Multipart.formAndFiles(
        Multipart.parse(ex.getRequestBody.readAllBytes(), bound))
      file = files("file")
      model = form("model").head
      respond(ex, 200, """{"task":"transcribe","text":"ok"}""".getBytes("UTF-8"))
    })) { base =>
      val c = new Clients.OpenAIClient(base, "k")
      val out = c.transcribe(audio, "whisper-1", "en", "verbose_json")
      assert(out == Right("""{"task":"transcribe","text":"ok"}"""))
      assert(file.toSeq == audio.toSeq, "audio must ride byte-exact")
      assert(model == "whisper-1")
    }
  }

  test("fromEnv switches real client on OPENAI_API_KEY, mocks otherwise") {
    val real = Clients.fromEnv(Map(
      "OPENAI_API_KEY" -> "k", "OPENAI_BASE_URL" -> "http://127.0.0.1:1").get _)
    assert(real.llm.isInstanceOf[Clients.OpenAIClient])
    val offline = Clients.fromEnv(_ => None)
    assert(offline.llm.isInstanceOf[Clients.MockLLMClient])
  }
}
