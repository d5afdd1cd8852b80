package graft.pipeline

/** External-service client traits + deterministic mocks.
  *
  * The reference talks to OpenAI (chat/TTS/whisper/DALL-E) and Telegram
  * (moderation buttons); its tests inject httptest mock servers
  * (test/functional/pipeline_test.go:367-416). We mirror that with
  * injectable traits: production impls would wrap real HTTP APIs;
  * the mocks are deterministic and used by every test — no network
  * call ever happens in-tree (SURVEY §5.3).
  */
object Clients {

  // ------------------------------------------------------------- LLM
  /** OpenAI-shaped media/LLM surface (blocks #2-5). */
  trait LLMClient extends Serializable {
    def available: Boolean
    /** chat completion → assistant message content
      * (block_openai_chat_completion.go:58-117). */
    def chat(model: String, systemPrompt: String, userPrompt: String,
        responseFormat: String): Either[String, String]
    /** text → speech audio bytes (block_openai_tts_request.go:33-76). */
    def tts(text: String, model: String, voice: String, format: String,
        speed: Double): Either[String, Array[Byte]]
    /** audio → whisper verbose_json transcription
      * (block_openai_transcription_request.go:34-83). */
    def transcribe(audio: Array[Byte], model: String, language: String,
        format: String): Either[String, String]
    /** prompt → image bytes (block_openai_image_request.go:34-78). */
    def imageGen(prompt: String, quality: String,
        size: String): Either[String, Array[Byte]]
  }

  /** Deterministic mock: canned responses, overridable per test. */
  class MockLLMClient(
      var chatResponse: String = """{"title": "mock title", "text": "mock text"}""",
      var transcription: String = MockLLMClient.defaultTranscription,
      var availableFlag: Boolean = true) extends LLMClient {
    val calls = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    /** Optional input-dependent responder — fan-out tests need distinct
      * responses per prompt (identical consecutive values collapse in
      * MergeMaps, a reference quirk we replicate). */
    var chatResponder: Option[(String, String) => String] = None
    override def available: Boolean = availableFlag
    override def chat(model: String, sys: String, user: String, fmt: String) = {
      calls.add(s"chat:$model")
      Right(chatResponder.map(f => f(sys, user)).getOrElse(chatResponse))
    }
    override def tts(text: String, model: String, voice: String, fmt: String, speed: Double) = {
      calls.add(s"tts:$voice")
      Right(MockLLMClient.mp3Bytes(s"audio-of:$text"))
    }
    override def transcribe(audio: Array[Byte], model: String, lang: String, fmt: String) = {
      calls.add("transcribe"); Right(transcription)
    }
    override def imageGen(prompt: String, quality: String, size: String) = {
      calls.add(s"image:$size"); Right(MockLLMClient.pngBytes(prompt))
    }
  }

  object MockLLMClient {
    /** Whisper verbose_json with 2 segments — the canonical fixture
      * shape (reference test/unit/main_test.go:561-594). */
    val defaultTranscription: String =
      """{"task":"transcribe","language":"english","duration":4.0,
        |"text":"Hello world. Goodbye world.",
        |"segments":[
        |  {"id":0,"start":0.0,"end":2.0,"text":" Hello world."},
        |  {"id":1,"start":2.0,"end":4.0,"text":" Goodbye world."}
        |]}""".stripMargin

    /** A tiny valid 1×1 PNG (deterministic; decodes with ImageIO). */
    def pngBytes(seed: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = seed.hashCode
      (0 until 8).foreach(x => (0 until 8).foreach(y => img.setRGB(x, y, rgb)))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** Deterministic fake mp3 (ID3 magic + payload) — media decode is
      * stubbed; the Spark-side plumbing is what's under test. */
    def mp3Bytes(payload: String): Array[Byte] =
      "ID3".getBytes("UTF-8") ++ payload.getBytes("UTF-8")
  }

  /** Production OpenAI-compatible [[LLMClient]] over java.net.http —
    * the request/response shapes mirror the reference's go-openai usage
    * (block_openai_chat_completion.go:81-117 messages + response_format,
    * block_openai_tts_request.go:33-76 /audio/speech,
    * block_openai_transcription_request.go:34-83 multipart
    * /audio/transcriptions, block_openai_image_request.go:34-78
    * b64_json /images/generations).
    *
    * Wired purely from explicit settings (see [[fromEnv]]); the test
    * suite constructs it but never lets it touch the network — mocks
    * remain the test path.
    */
  class OpenAIClient(baseUrl: String, apiKey: String, timeoutMs: Long = 60000)
      extends LLMClient {
    @transient private lazy val http = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()

    override def available: Boolean = apiKey.nonEmpty

    private def post(path: String, contentType: String,
        body: Array[Byte]): Either[String, Array[Byte]] =
      try {
        val req = java.net.http.HttpRequest
          .newBuilder(java.net.URI.create(s"$baseUrl$path"))
          .timeout(java.time.Duration.ofMillis(timeoutMs))
          .header("Authorization", s"Bearer $apiKey")
          .header("Content-Type", contentType)
          .POST(java.net.http.HttpRequest.BodyPublishers.ofByteArray(body))
          .build()
        val resp = http.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofByteArray())
        if (resp.statusCode() / 100 == 2) Right(resp.body())
        else Left(s"HTTP ${resp.statusCode()} for POST $path: " +
          new String(resp.body(), "UTF-8").take(500))
      } catch { case e: Exception => Left(String.valueOf(e.getMessage)) }

    private def postJson(path: String, body: PValue): Either[String, PValue] =
      post(path, "application/json", Json.render(body).getBytes("UTF-8"))
        .flatMap(b => Json.tryParse(new String(b, "UTF-8"))
          .toRight(s"non-JSON response from $path"))

    private def pathGet(v: PValue, segs: Any*): Option[PValue] =
      segs.foldLeft(Option(v)) {
        case (Some(PObj(m)), s: String) => m.get(s)
        case (Some(PArr(xs)), i: Int)   => xs.lift(i)
        case _                          => None
      }

    override def chat(model: String, systemPrompt: String, userPrompt: String,
        responseFormat: String): Either[String, String] = {
      val messages =
        (if (systemPrompt.nonEmpty)
          Seq(PObj(Map("role" -> PStr("system"), "content" -> PStr(systemPrompt))))
        else Nil) :+
          PObj(Map("role" -> PStr("user"), "content" -> PStr(userPrompt)))
      val fmt = if (responseFormat == "json") "json_object" else "text"
      postJson("/chat/completions", PObj(Map(
        "model" -> PStr(model),
        "messages" -> PArr(messages),
        "response_format" -> PObj(Map("type" -> PStr(fmt))))))
        .flatMap(r => pathGet(r, "choices", 0, "message", "content")
          .map(_.asString).toRight("no choices[0].message.content in response"))
    }

    override def tts(text: String, model: String, voice: String,
        format: String, speed: Double): Either[String, Array[Byte]] =
      post("/audio/speech", "application/json", Json.render(PObj(Map(
        "model" -> PStr(model), "input" -> PStr(text), "voice" -> PStr(voice),
        "response_format" -> PStr(format), "speed" -> PNum(speed))))
        .getBytes("UTF-8"))

    override def transcribe(audio: Array[Byte], model: String,
        language: String, format: String): Either[String, String] = {
      val boundary = s"graft${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val out = new java.io.ByteArrayOutputStream()
      def field(n: String, v: String): Unit =
        out.write((s"--$boundary\r\nContent-Disposition: form-data; " +
          s"""name="$n"\r\n\r\n$v\r\n""").getBytes("UTF-8"))
      field("model", model)
      if (language.nonEmpty) field("language", language)
      field("response_format", format)
      out.write((s"--$boundary\r\nContent-Disposition: form-data; " +
        "name=\"file\"; filename=\"audio.mp3\"\r\n" +
        "Content-Type: application/octet-stream\r\n\r\n").getBytes("UTF-8"))
      out.write(audio)
      out.write(s"\r\n--$boundary--\r\n".getBytes("UTF-8"))
      post("/audio/transcriptions", s"multipart/form-data; boundary=$boundary",
        out.toByteArray).map(new String(_, "UTF-8"))
    }

    override def imageGen(prompt: String, quality: String,
        size: String): Either[String, Array[Byte]] =
      postJson("/images/generations", PObj(Map(
        "prompt" -> PStr(prompt), "quality" -> PStr(quality),
        "size" -> PStr(size), "n" -> PInt(1L),
        "response_format" -> PStr("b64_json"))))
        .flatMap(r => pathGet(r, "data", 0, "b64_json").map(_.asString)
          .toRight("no data[0].b64_json in response"))
        .flatMap(b64 =>
          try Right(java.util.Base64.getDecoder.decode(b64))
          catch { case e: Exception => Left(s"bad b64_json: ${e.getMessage}") })
  }

  // ------------------------------------------------------ moderation
  /** One approve/decline/regenerate button press, as parsed back from
    * the review message (block_send_moderation_telegram.go:56-99).
    * `callbackId` identifies the Telegram callback query for
    * acknowledgement (empty for mock-origin updates). */
  case class ModerationUpdate(
      action: String, // approve | decline | regenerate | unknown
      index: Int,
      processingId: String,
      blockSlug: String,
      regenerateBlockSlug: String = "",
      callbackId: String = "")

  /** Telegram-shaped moderation surface (blocks #23-25). */
  trait ModerationClient extends Serializable {
    def available: Boolean
    /** Send review message with buttons; returns sent-message JSON. */
    def sendReview(text: String, image: Option[Array[Byte]], groupId: Long,
        processingId: String, blockSlug: String, index: Int,
        regenerateBlockSlug: String,
        extraDecisions: Map[String, String]): Either[String, String]
    /** One GetUpdates poll batch (block_fetch_moderation_telegram.go:
      * 129-215): all OUTSTANDING updates. The fetch block acknowledges
      * the ones addressed to it via [[ack]]; unmatched updates stay
      * deliverable for other rows/stages (the reference's
      * acknowledgedCallbacks map, :23-75). */
    def fetchUpdates(): Seq[ModerationUpdate]
    /** Acknowledge consumed updates (no re-delivery). */
    def ack(consumed: Seq[ModerationUpdate]): Unit
    /** Final text/image/video message (block_send_message_telegram.go:
      * 52-143); returns sent-message JSON. */
    def sendMessage(text: String, image: Option[Array[Byte]],
        video: Option[Array[Byte]], groupId: Long,
        caption: String): Either[String, String]
  }

  /** Mock with a programmable update queue: tests enqueue decisions,
    * the fetch block drains them (mirrors the reference's channel-
    * instrumented mock Telegram server). */
  class MockModerationClient(var availableFlag: Boolean = true)
      extends ModerationClient {
    val sent = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    private val updates =
      java.util.Collections.synchronizedList(
        new java.util.ArrayList[ModerationUpdate]())

    def enqueue(u: ModerationUpdate): Unit = updates.add(u)

    override def available: Boolean = availableFlag
    override def sendReview(text: String, image: Option[Array[Byte]],
        groupId: Long, processingId: String, blockSlug: String, index: Int,
        regenerateBlockSlug: String, extraDecisions: Map[String, String]) = {
      sent.add(s"review:$blockSlug:$index")
      Right(s"""{"message_id":${sent.size},"chat_id":$groupId,""" +
        s""""processing_id":"$processingId","block_slug":"$blockSlug","index":$index}""")
    }
    override def fetchUpdates(): Seq[ModerationUpdate] =
      updates.synchronized {
        scala.jdk.CollectionConverters.ListHasAsScala(updates).asScala.toSeq
      }
    override def ack(consumed: Seq[ModerationUpdate]): Unit =
      updates.synchronized { consumed.foreach(updates.remove) }
    override def sendMessage(text: String, image: Option[Array[Byte]],
        video: Option[Array[Byte]], groupId: Long, caption: String) = {
      val kind =
        if (image.isDefined) "photo" else if (video.isDefined) "video" else "text"
      sent.add(s"message:$kind")
      Right(s"""{"message_id":${sent.size},"chat_id":$groupId,"kind":"$kind"}""")
    }
  }

  /** Production Telegram [[ModerationClient]] over the public Bot HTTP
    * API (`https://api.telegram.org/bot<token>/<method>`) — the same
    * surface the reference drives through tgbotapi
    * (block_send_moderation_telegram.go:141-259 sendPhoto/sendMessage
    * with an inline keyboard, block_fetch_moderation_telegram.go:129-233
    * getUpdates + answerCallbackQuery). Review messages embed
    * ProcessingId/BlockSlug/Index/RegenerateBlockSlug in the exact
    * reference text template; button callback data is the shortened
    * `a:`/`d:`/`r:` action form (:57-59).
    *
    * Unconsumed updates stay deliverable: the poll offset is never
    * advanced on Telegram's side, and consumed callbacks are tracked in
    * an acknowledged-id set (the reference's acknowledgedCallbacks map,
    * :23-75) and answered so the button spinner clears.
    *
    * Wired purely from explicit settings (see [[fromEnv]]); tests
    * construct it against an unreachable endpoint and the pure parse
    * helpers — never the live API. */
  class TelegramModerationClient(token: String,
      baseUrl: String = "https://api.telegram.org", timeoutMs: Long = 30000)
      extends ModerationClient {
    import TelegramModerationClient._

    @transient private lazy val http = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()
    private val acked =
      java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

    private def call(method: String, contentType: String,
        body: Array[Byte]): Either[String, PValue] =
      try {
        val req = java.net.http.HttpRequest
          .newBuilder(java.net.URI.create(s"$baseUrl/bot$token/$method"))
          .timeout(java.time.Duration.ofMillis(timeoutMs))
          .header("Content-Type", contentType)
          .POST(java.net.http.HttpRequest.BodyPublishers.ofByteArray(body))
          .build()
        val resp = http.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofByteArray())
        Json.tryParse(new String(resp.body(), "UTF-8")) match {
          case Some(PObj(m)) if m.get("ok").exists(_ == PBool(true)) =>
            Right(m.getOrElse("result", PNull))
          case _ => Left(s"telegram $method: HTTP ${resp.statusCode()} " +
            new String(resp.body(), "UTF-8").take(300))
        }
      } catch { case e: Exception => Left(String.valueOf(e.getMessage)) }

    private def callJson(method: String, body: PValue): Either[String, PValue] =
      call(method, "application/json", Json.render(body).getBytes("UTF-8"))

    /** Photo/video upload: multipart/form-data with the JSON fields
      * alongside the binary part (the Bot API's file-upload form). */
    private def callMultipart(method: String, fields: Map[String, String],
        fileField: String, fileName: String,
        bytes: Array[Byte]): Either[String, PValue] = {
      val boundary = s"graft${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val out = new java.io.ByteArrayOutputStream()
      fields.foreach { case (n, v) =>
        out.write((s"--$boundary\r\nContent-Disposition: form-data; " +
          s"""name="$n"\r\n\r\n$v\r\n""").getBytes("UTF-8"))
      }
      out.write((s"--$boundary\r\nContent-Disposition: form-data; " +
        s"""name="$fileField"; filename="$fileName"\r\n""" +
        "Content-Type: application/octet-stream\r\n\r\n").getBytes("UTF-8"))
      out.write(bytes)
      out.write(s"\r\n--$boundary--\r\n".getBytes("UTF-8"))
      call(method, s"multipart/form-data; boundary=$boundary", out.toByteArray)
    }

    override def available: Boolean =
      token.nonEmpty && callJson("getMe", PObj(Map.empty)).isRight

    override def sendReview(text: String, image: Option[Array[Byte]],
        groupId: Long, processingId: String, blockSlug: String, index: Int,
        regenerateBlockSlug: String,
        extraDecisions: Map[String, String]): Either[String, String] = {
      val body = reviewMessage(text, processingId, blockSlug, index,
        regenerateBlockSlug)
      val buttons = reviewButtons(index, extraDecisions)
      val markup = PObj(Map("inline_keyboard" -> PArr(Seq(PArr(buttons)))))
      val sent = image match {
        case Some(img) =>
          callMultipart("sendPhoto", Map(
            "chat_id" -> groupId.toString, "caption" -> body,
            "reply_markup" -> Json.render(markup)),
            "photo", "image.png", img)
        case None =>
          callJson("sendMessage", PObj(Map(
            "chat_id" -> PInt(groupId), "text" -> PStr(body),
            "reply_markup" -> markup)))
      }
      // reference output shape: {"sentMessage": ..., "sentButtons": [...]}
      sent.map(r => Json.render(PObj(Map(
        "sentMessage" -> r, "sentButtons" -> PArr(buttons)))))
    }

    override def fetchUpdates(): Seq[ModerationUpdate] =
      callJson("getUpdates", PObj(Map("timeout" -> PInt(0L)))) match {
        case Right(PArr(updates)) =>
          updates.flatMap(parseUpdate)
            .filterNot(u => acked.contains(u.callbackId)).toSeq
        case _ => Nil
      }

    override def ack(consumed: Seq[ModerationUpdate]): Unit =
      consumed.filter(_.callbackId.nonEmpty).foreach { u =>
        acked.add(u.callbackId)
        // clears the button loading indicator (reference :231-233)
        callJson("answerCallbackQuery", PObj(Map(
          "callback_query_id" -> PStr(u.callbackId),
          "text" -> PStr("Processing..."))))
      }

    override def sendMessage(text: String, image: Option[Array[Byte]],
        video: Option[Array[Byte]], groupId: Long,
        caption: String): Either[String, String] =
      ((image, video) match {
        case (Some(img), _) =>
          callMultipart("sendPhoto", Map(
            "chat_id" -> groupId.toString, "caption" -> caption),
            "photo", "image.png", img)
        case (None, Some(vid)) =>
          callMultipart("sendVideo", Map(
            "chat_id" -> groupId.toString, "caption" -> caption),
            "video", "video.mp4", vid)
        case _ =>
          callJson("sendMessage", PObj(Map(
            "chat_id" -> PInt(groupId),
            "text" -> (if (caption.isEmpty) PStr(text)
                       else PStr(s"$text\n$caption")))))
      }).map(Json.render)
  }

  object TelegramModerationClient {
    /** The reference review-message template
      * (GenerateTelegramReviewMessage, :33-45). */
    def reviewMessage(text: String, processingId: String, blockSlug: String,
        index: Int, regenerateBlockSlug: String): String = {
      val base = s"Please review: $text\nProcessingId: $processingId\n" +
        s"BlockSlug: $blockSlug\nIndex: $index"
      if (regenerateBlockSlug.nonEmpty)
        s"$base\nRegenerateBlockSlug: $regenerateBlockSlug"
      else base
    }

    /** Approve/Decline (+ regenerate from extra_decisions) buttons with
      * shortened `action:index` callback data (:47-49, 57-59). */
    def reviewButtons(index: Int,
        extraDecisions: Map[String, String]): Seq[PValue] = {
      def btn(label: String, action: String) = PObj(Map(
        "text" -> PStr(label), "callback_data" -> PStr(s"$action:$index")))
      Seq(btn("Approve", "a"), btn("Decline", "d")) ++
        extraDecisions.get("regenerate").map(l =>
          btn(if (l.nonEmpty) l else "Regenerate", "r"))
    }

    // leftmost-match semantics like the Go regexes (:58-61): the plain
    // `BlockSlug:` line precedes `RegenerateBlockSlug:` (whose tail
    // would also match) in the template
    private val ReProcessing = "ProcessingId: ([^\n]+)".r
    private val ReSlug = "BlockSlug: ([^\n]+)".r
    private val ReRegen = "RegenerateBlockSlug: ([^\n]+)".r

    /** One getUpdates entry → decision, if it is a callback press on a
      * parseable review message (ParseTelegramReviewMessage, :56-99 +
      * the fetch block's data split, block_fetch_moderation_telegram
      * .go:160-201). Text messages and foreign callbacks → None. */
    def parseUpdate(u: PValue): Option[ModerationUpdate] = for {
      cb <- u match {
        case PObj(m) => m.get("callback_query")
        case _       => None
      }
      cbm <- Some(cb).collect { case PObj(m) => m }
      data <- cbm.get("data").map(_.asString)
      parts = data.split(":", 2)
      if parts.length == 2 && parts(1).forall(_.isDigit)
      msg <- cbm.get("message").collect { case PObj(m) => m }
      body <- msg.get("text").map(_.asString).filter(_.nonEmpty)
        .orElse(msg.get("caption").map(_.asString)).filter(_.nonEmpty)
      pid <- ReProcessing.findFirstMatchIn(body).map(_.group(1))
      slug <- ReSlug.findFirstMatchIn(body).map(_.group(1))
    } yield ModerationUpdate(
      action = parts(0) match {
        case "a" => "approve" case "d" => "decline"
        case "r" => "regenerate" case _ => "unknown"
      },
      index = parts(1).toInt,
      processingId = pid,
      blockSlug = slug,
      regenerateBlockSlug =
        ReRegen.findFirstMatchIn(body).map(_.group(1)).getOrElse(""),
      callbackId = cbm.get("id").map(_.asString).getOrElse(""))
  }

  // ------------------------------------------------------------ http
  /** Plain HTTP fetch (block #1: block_http.go:60-121 — only url +
    * method are consumed; non-200 is an error; 30 s timeout). */
  trait HttpClient extends Serializable {
    def available(url: String): Boolean
    def request(url: String, method: String): Either[String, Array[Byte]]
  }

  /** Real impl over java.net.http (JDK 17) — used in tests against an
    * in-process com.sun.net.httpserver, mirroring httptest. */
  class JdkHttpClient(timeoutMs: Long = 30000) extends HttpClient {
    @transient private lazy val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()

    override def available(url: String): Boolean =
      try { request(url, "GET").isRight } catch { case _: Exception => false }

    override def request(url: String, method: String): Either[String, Array[Byte]] =
      try {
        val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
          .timeout(java.time.Duration.ofMillis(timeoutMs))
          .method(method.toUpperCase,
            java.net.http.HttpRequest.BodyPublishers.noBody())
          .build()
        val resp = client.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofByteArray())
        if (resp.statusCode() == 200) Right(resp.body())
        else Left(s"HTTP ${resp.statusCode()} for $method $url")
      } catch { case e: Exception => Left(e.getMessage) }
  }

  /** Mock http client with a canned url→body map. */
  class MockHttpClient(responses: Map[String, Array[Byte]] = Map.empty)
      extends HttpClient {
    override def available(url: String): Boolean = responses.contains(url)
    override def request(url: String, method: String): Either[String, Array[Byte]] =
      responses.get(url).toRight(s"HTTP 404 for $method $url")
  }

  /** Default all-mock context for tests and offline runs. */
  def mockCtx(): BlockCtx = BlockCtx(
    llm = new MockLLMClient(),
    moderation = new MockModerationClient(),
    http = new MockHttpClient())

  /** Config switch for production runs: a real OpenAI-compatible client
    * when OPENAI_API_KEY is set (endpoint override via OPENAI_BASE_URL
    * — any compatible server works), a real Telegram moderation client
    * when TELEGRAM_BOT_TOKEN is set (endpoint override via
    * TELEGRAM_API_BASE_URL), mocks otherwise. The test suite never
    * calls this with keys in the environment; it stays offline. */
  def fromEnv(env: String => Option[String] = k => sys.env.get(k)): BlockCtx = {
    val llm: LLMClient = env("OPENAI_API_KEY") match {
      case Some(key) if key.nonEmpty => new OpenAIClient(
        env("OPENAI_BASE_URL").getOrElse("https://api.openai.com/v1"), key)
      case _ => new MockLLMClient()
    }
    val moderation: ModerationClient = env("TELEGRAM_BOT_TOKEN") match {
      case Some(tok) if tok.nonEmpty => new TelegramModerationClient(tok,
        env("TELEGRAM_API_BASE_URL").getOrElse("https://api.telegram.org"))
      case _ => new MockModerationClient()
    }
    BlockCtx(llm = llm, moderation = moderation, http = new JdkHttpClient())
  }
}
