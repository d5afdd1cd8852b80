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

  test("telegram: review message round-trips through a callback press, ack dedups") {
    var sentBody: PValue = PNull
    var answered = ""
    def reviewText(): String = sentBody.asInstanceOf[PObj]
      .m("text").asString
    withServer(Map(
      "/bottok/sendMessage" -> { ex =>
        sentBody = Json.parse(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
        respond(ex, 200, """{"ok":true,"result":{"message_id":7}}""".getBytes("UTF-8"))
      },
      "/bottok/getUpdates" -> { ex =>
        ex.getRequestBody.readAllBytes()
        val msg = Json.render(PStr(reviewText()))
        respond(ex, 200,
          (s"""{"ok":true,"result":[{"update_id":41,"callback_query":""" +
            s"""{"id":"cb1","data":"r:2","message":{"text":$msg}}},""" +
            s"""{"update_id":42,"message":{"text":"not a callback"}}]}""")
            .getBytes("UTF-8"))
      },
      "/bottok/answerCallbackQuery" -> { ex =>
        val b = Json.parse(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
        answered = b.asInstanceOf[PObj].m("callback_query_id").asString
        respond(ex, 200, """{"ok":true,"result":true}""".getBytes("UTF-8"))
      })) { base =>
      val c = new Clients.TelegramModerationClient("tok", base)
      val sent = c.sendReview("new clip", None, -100L, "pid-1", "review-stage",
        2, "make-clip", Map("regenerate" -> "Redo it"))
      assert(sent.isRight, sent)
      // reference template + shortened a:/d:/r: callback data
      assert(reviewText() ==
        "Please review: new clip\nProcessingId: pid-1\n" +
        "BlockSlug: review-stage\nIndex: 2\nRegenerateBlockSlug: make-clip")
      val kb = sentBody.asInstanceOf[PObj].m("reply_markup").asInstanceOf[PObj]
        .m("inline_keyboard").asSeq.head.asSeq
      assert(kb.map(b => b.asInstanceOf[PObj].m("callback_data").asString) ==
        Seq("a:2", "d:2", "r:2"))
      assert(kb.map(b => b.asInstanceOf[PObj].m("text").asString) ==
        Seq("Approve", "Decline", "Redo it"))

      val ups = c.fetchUpdates()
      assert(ups == Seq(Clients.ModerationUpdate("regenerate", 2, "pid-1",
        "review-stage", "make-clip", "cb1")),
        "the button press must parse back to a full decision")
      c.ack(ups)
      assert(answered == "cb1", "ack must answer the callback query")
      assert(c.fetchUpdates().isEmpty, "acked callbacks are not redelivered")
    }
  }

  test("telegram: photo review and final media messages go out as multipart") {
    val png = Clients.MockLLMClient.pngBytes("review")
    var photo: Array[Byte] = Array.empty
    var caption = ""
    var videoName = ""
    withServer(Map(
      "/bottok/sendPhoto" -> { ex =>
        val ct = ex.getRequestHeaders.getFirst("Content-Type")
        val (form, files) = Multipart.formAndFiles(
          Multipart.parse(ex.getRequestBody.readAllBytes(),
            Multipart.boundary(ct).get))
        photo = files("photo"); caption = form("caption").head
        respond(ex, 200, """{"ok":true,"result":{"message_id":9}}""".getBytes("UTF-8"))
      },
      "/bottok/sendVideo" -> { ex =>
        val ct = ex.getRequestHeaders.getFirst("Content-Type")
        val (_, files) = Multipart.formAndFiles(
          Multipart.parse(ex.getRequestBody.readAllBytes(),
            Multipart.boundary(ct).get))
        videoName = files.keys.mkString
        respond(ex, 200, """{"ok":true,"result":{"message_id":10}}""".getBytes("UTF-8"))
      })) { base =>
      val c = new Clients.TelegramModerationClient("tok", base)
      val sent = c.sendReview("clip", Some(png), -1L, "p", "b", 0, "", Map.empty)
      assert(sent.isRight, sent)
      assert(photo.toSeq == png.toSeq, "image bytes must ride byte-exact")
      assert(caption.startsWith("Please review: clip"))
      val vid = c.sendMessage("", None, Some("vid".getBytes), -1L, "done")
      assert(vid.isRight && videoName == "video")
    }
  }

  test("fromEnv switches telegram client on TELEGRAM_BOT_TOKEN; unreachable = unavailable") {
    val real = Clients.fromEnv(Map("TELEGRAM_BOT_TOKEN" -> "t",
      "TELEGRAM_API_BASE_URL" -> "http://127.0.0.1:1").get _)
    assert(real.moderation.isInstanceOf[Clients.TelegramModerationClient])
    assert(!real.moderation.available, "connection-refused endpoint is unavailable")
    assert(Clients.fromEnv(_ => None).moderation
      .isInstanceOf[Clients.MockModerationClient])
  }
}
