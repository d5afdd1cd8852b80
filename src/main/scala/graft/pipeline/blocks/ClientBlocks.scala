package graft.pipeline.blocks

import graft.pipeline._

/** Client-backed blocks (#1-5 HTTP/OpenAI, #23-25 Telegram moderation)
  * — all DriverSide: ordered, side-effecting stages whose external
  * calls go through the injectable [[Clients]] traits (mocks in tests;
  * SURVEY §2.2 legend "driver").
  */
object ClientBlocks {

  /** #1 http_request (block_http.go:60-121): fetch url with method;
    * headers/query/body are declared in the schema but unused by the
    * reference's processor — only url + method are consumed. Non-200 is
    * an error. */
  object HttpRequest extends BlockOp {
    override val id = "http_request"
    override val description = "Fetch a URL and return the response body"
    override val mode: ExecMode = DriverSide
    override val props = Seq(
      PropSpec("url", TUrl, required = true),
      PropSpec("method", TString, default = Some(PStr("GET")),
        enumVals = Seq("GET", "POST", "get", "post")),
      PropSpec("headers", TObj),
      PropSpec("query", TObj),
      PropSpec("body", TString))

    override def available(ctx: BlockCtx): Boolean = true
    override def process(row: InputRow, ctx: BlockCtx): BlockResult =
      ctx.http.request(row.str("url"), row.str("method")) match {
        case Left(err)    => throw new RuntimeException(err)
        case Right(bytes) => BlockResult.bytes(bytes)
      }
  }

  /** #2 openai_chat_completion (block_openai_chat_completion.go:58-117):
    * returns choices[0].message.content; response_format text|json. */
  object ChatCompletion extends BlockOp {
    override val id = "openai_chat_completion"
    override val description = "LLM chat completion over the injected client"
    override val mode: ExecMode = DriverSide
    override val props = Seq(
      PropSpec("model", TString, default = Some(PStr("gpt-4o-2024-08-06"))),
      PropSpec("system_prompt", TString, default = Some(PStr("You are a helpful assistant."))),
      PropSpec("user_prompt", TString, required = true),
      PropSpec("response_format", TString, default = Some(PStr("text")),
        enumVals = Seq("text", "json")))

    override def available(ctx: BlockCtx): Boolean = ctx.llm.available
    override def process(row: InputRow, ctx: BlockCtx): BlockResult =
      ctx.llm.chat(row.str("model"), row.str("system_prompt"),
        row.str("user_prompt"), row.str("response_format")) match {
        case Left(err) => throw new RuntimeException(err)
        case Right(s)  => BlockResult.text(s)
      }
  }

  /** #3 openai_tts_request (block_openai_tts_request.go:33-76). */
  object TtsRequest extends BlockOp {
    override val id = "openai_tts_request"
    override val description = "Text to speech over the injected client"
    override val mode: ExecMode = DriverSide
    override val props = Seq(
      PropSpec("text", TString, required = true),
      PropSpec("model", TString, default = Some(PStr("tts-1"))),
      PropSpec("voice", TString, default = Some(PStr("alloy")),
        enumVals = Seq("alloy", "echo", "fable", "onyx", "nova", "shimmer")),
      PropSpec("response_format", TString, default = Some(PStr("mp3"))),
      PropSpec("speed", TNumber, default = Some(PNum(1.0))))

    override def available(ctx: BlockCtx): Boolean = ctx.llm.available
    override def process(row: InputRow, ctx: BlockCtx): BlockResult =
      ctx.llm.tts(row.str("text"), row.str("model"), row.str("voice"),
        row.str("response_format"),
        row.props.get("speed").map(_.asDouble).getOrElse(1.0)) match {
        case Left(err) => throw new RuntimeException(err)
        case Right(b)  => BlockResult.bytes(b)
      }
  }

  /** #4 openai_transcription_request
    * (block_openai_transcription_request.go:34-83): whisper
    * verbose_json (segments with start/end/text) — the JSONPath fan-out
    * source for the yt-short pipeline. */
  object TranscriptionRequest extends BlockOp {
    override val id = "openai_transcription_request"
    override val description = "Audio transcription over the injected client"
    override val mode: ExecMode = DriverSide
    override val props = Seq(
      PropSpec("audio", TFile, required = true),
      PropSpec("model", TString, default = Some(PStr("whisper-1"))),
      PropSpec("language", TString, default = Some(PStr("en"))),
      PropSpec("format", TString, default = Some(PStr("verbose_json"))))

    override def available(ctx: BlockCtx): Boolean = ctx.llm.available
    override def process(row: InputRow, ctx: BlockCtx): BlockResult =
      ctx.llm.transcribe(row.bytes("audio"), row.str("model"),
        row.str("language"), row.str("format")) match {
        case Left(err) => throw new RuntimeException(err)
        case Right(s)  => BlockResult.text(s)
      }
  }

  /** #5 openai_image_request (block_openai_image_request.go:34-78). */
  object ImageRequest extends BlockOp {
    override val id = "openai_image_request"
    override val description = "Image generation over the injected client"
    override val mode: ExecMode = DriverSide
    override val props = Seq(
      PropSpec("prompt", TString, required = true),
      PropSpec("quality", TString, default = Some(PStr("standard")),
        enumVals = Seq("standard", "hd")),
      PropSpec("size", TString, default = Some(PStr("1024x1024")),
        enumVals = Seq("1024x1024", "1792x1024", "1024x1792")))

    override def available(ctx: BlockCtx): Boolean = ctx.llm.available
    override def process(row: InputRow, ctx: BlockCtx): BlockResult =
      ctx.llm.imageGen(row.str("prompt"), row.str("quality"), row.str("size")) match {
        case Left(err) => throw new RuntimeException(err)
        case Right(b)  => BlockResult.bytes(b)
      }
  }

  /** #23 send_moderation_tg
    * (block_send_moderation_telegram.go:141-259): sends the review
    * message (photo or text) with Approve/Decline[/Regenerate] buttons;
    * the message body embeds ProcessingId/BlockSlug/Index/
    * RegenerateBlockSlug as parseable text. Sequential by config
    * (`parallel_available: false` is on the FETCH side; sends are
    * ordered because fan-out rows are moderated in order). */
  object SendModeration extends BlockOp {
    override val id = "send_moderation_tg"
    override val description = "Send a review request to the moderation channel"
    override val mode: ExecMode = DriverSide
    override val props = Seq(
      PropSpec("text", TString, required = true),
      PropSpec("image", TFile),
      PropSpec("group_id", TInt, default = Some(PInt(0L))),
      PropSpec("approve", TString, default = Some(PStr("Approve"))),
      PropSpec("decline", TString, default = Some(PStr("Decline"))),
      PropSpec("regenerate", TString, default = Some(PStr("Regenerate"))),
      PropSpec("extra_decisions", TObj),
      PropSpec("regenerate_block_slug", TString, default = Some(PStr(""))))

    override def available(ctx: BlockCtx): Boolean = ctx.moderation.available
    override def process(row: InputRow, ctx: BlockCtx): BlockResult = {
      val extra = row.props.get("extra_decisions") match {
        case Some(PObj(m)) => m.map { case (k, v) => k -> v.asString }
        case _             => Map.empty[String, String]
      }
      ctx.moderation.sendReview(
        row.str("text"),
        row.opt("image").map(_.asBytes),
        row.props.get("group_id").map(_.asLong).getOrElse(0L),
        ctx.processingId, ctx.blockSlug, ctx.inputIndex,
        row.str("regenerate_block_slug"), extra) match {
        case Left(err)   => throw new RuntimeException(err)
        case Right(json) => BlockResult.text(json)
      }
    }
  }

  /** #24 fetch_moderation_tg
    * (block_fetch_moderation_telegram.go:99-259): drain the update
    * queue, keep decisions addressed to (processingId, blockSlug,
    * inputIndex); LAST decision wins. approve → continue; decline →
    * stop (if stop_pipeline_if_decline); regenerate → stop with
    * regeneration target (E10); no decision → retry (50×10s default;
    * tests shrink the interval). */
  object FetchModeration extends BlockOp {
    override val id = "fetch_moderation_tg"
    override val description = "Fetch the moderation decision for this stage"
    override val mode: ExecMode = DriverSide
    override val parallelAvailable: Boolean = false // config.yaml:180
    override val retryCount: Int = 50
    override val retryIntervalMs: Long = 10000L
    override val props = Seq(
      PropSpec("block_slug", TString, default = Some(PStr(""))),
      PropSpec("stop_pipeline_if_decline", TBool, default = Some(PBool(true))),
      PropSpec("retry_if_unknown", TBool, default = Some(PBool(true))))

    override def available(ctx: BlockCtx): Boolean = ctx.moderation.available
    override def process(row: InputRow, ctx: BlockCtx): BlockResult = {
      val stopIfDecline = row.props.get("stop_pipeline_if_decline")
        .forall(_.asBool)
      val retryIfUnknown = row.props.get("retry_if_unknown").forall(_.asBool)
      val forSlug = row.str("block_slug")
      val mine = ctx.moderation.fetchUpdates().filter(u =>
        u.processingId == ctx.processingId && u.blockSlug == forSlug &&
          u.index == ctx.inputIndex &&
          u.action != "unknown")
      ctx.moderation.ack(mine) // unmatched updates stay for other rows
      val action = mine.lastOption.map(_.action).getOrElse("unknown")
      val decisionJson = Json.render(PObj(Map(
        "processing_id" -> PStr(ctx.processingId),
        "action" -> PStr(action))))
      action match {
        case "approve" => BlockResult(Seq(decisionJson.getBytes("UTF-8")))
        case "decline" =>
          BlockResult(Seq(decisionJson.getBytes("UTF-8")), stop = stopIfDecline)
        case "regenerate" =>
          val target = mine.last.regenerateBlockSlug
          BlockResult(Nil, stop = true, targetSlug = target,
            targetIdx = ctx.inputIndex)
        case _ =>
          BlockResult(Seq(decisionJson.getBytes("UTF-8")),
            retry = retryIfUnknown)
      }
    }
  }

  /** #25 send_message_tg (block_send_message_telegram.go:52-143): final
    * delivery with the image > video > text fallback chain. */
  object SendMessage extends BlockOp {
    override val id = "send_message_tg"
    override val description = "Send the final message to the channel"
    override val mode: ExecMode = DriverSide
    override val props = Seq(
      PropSpec("text", TString, default = Some(PStr(""))),
      PropSpec("image", TFile),
      PropSpec("video", TFile),
      PropSpec("group_id", TInt, default = Some(PInt(0L))))

    override def available(ctx: BlockCtx): Boolean = ctx.moderation.available
    override def process(row: InputRow, ctx: BlockCtx): BlockResult = {
      val caption = s"ProcessingId: ${ctx.processingId}"
      ctx.moderation.sendMessage(row.str("text"),
        row.opt("image").map(_.asBytes), row.opt("video").map(_.asBytes),
        row.props.get("group_id").map(_.asLong).getOrElse(0L), caption) match {
        case Left(err)   => throw new RuntimeException(err)
        case Right(json) => BlockResult.text(json)
      }
    }
  }

  val all: Seq[BlockOp] = Seq(HttpRequest, ChatCompletion, TtsRequest,
    TranscriptionRequest, ImageRequest, SendModeration, FetchModeration,
    SendMessage)
}
