package graft.pipeline.blocks

import graft.pipeline._

/** #16 subtitles_from_transcription
  * (block_subtitles_from_transcription.go:198-244, ASS writer :66-196):
  * Whisper verbose_json → Advanced SubStation file. Pure string
  * formatting — Distributed. The `srt` output enum is declared but not
  * implemented in the reference (:239-241); replicated. */
object SubtitleBlocks {

  object SubtitlesFromTranscription extends BlockOp {
    override val id = "subtitles_from_transcription"
    override val description = "Render a Whisper transcription as ASS subtitles"
    override val props = Seq(
      PropSpec("transcription", TFile, required = true),
      PropSpec("input_format", TString, default = Some(PStr("openai_verbose_json"))),
      PropSpec("output_format", TString, default = Some(PStr("ass")),
        enumVals = Seq("ass", "srt")),
      PropSpec("name", TString, default = Some(PStr("Default"))),
      PropSpec("font_name", TString, default = Some(PStr("Arial"))),
      PropSpec("font_size", TInt, default = Some(PInt(30L))),
      PropSpec("primary_colour", TString, default = Some(PStr("&H00FFFFFF"))),
      PropSpec("secondary_colour", TString, default = Some(PStr("&H00000000"))),
      PropSpec("back_colour", TString, default = Some(PStr("&H00000000"))),
      PropSpec("bold", TInt, default = Some(PInt(-1L))),
      PropSpec("italic", TInt, default = Some(PInt(0L))),
      PropSpec("border_style", TInt, default = Some(PInt(1L))),
      PropSpec("outline", TNumber, default = Some(PNum(1.0))),
      PropSpec("shadow", TNumber, default = Some(PNum(0.0))),
      PropSpec("alignment", TInt, default = Some(PInt(2L))),
      PropSpec("margin_l", TInt, default = Some(PInt(10L))),
      PropSpec("margin_r", TInt, default = Some(PInt(10L))),
      PropSpec("margin_v", TInt, default = Some(PInt(10L))))

    /** ASS time `HH:MM:SS.cc` (formatOpenAITranscriptionSegmentTime,
      * :191-196 — centiseconds, hours not wrapped). */
    def formatTime(seconds: Double): String = {
      val totalMs = (seconds * 1000).toLong
      f"${totalMs / 3600000}%02d:${totalMs / 60000 % 60}%02d:${totalMs / 1000 % 60}%02d.${totalMs % 1000 / 10}%02d"
    }

    override def process(row: InputRow, ctx: BlockCtx): BlockResult = {
      val bytes = row.bytes("transcription")
      if (row.str("output_format") != "ass")
        return BlockResult(Nil) // srt: declared, not implemented (reference parity)
      val segments: Seq[(Double, Double, String)] =
        if (row.str("input_format") == "openai_verbose_json")
          Json.tryParse(new String(bytes, "UTF-8")) match {
            case Some(PObj(m)) => m.get("segments") match {
              case Some(PArr(segs)) => segs.collect { case PObj(s) =>
                (s.get("start").map(_.asDouble).getOrElse(0.0),
                  s.get("end").map(_.asDouble).getOrElse(0.0),
                  s.get("text").map(_.asString).getOrElse(""))
              }
              case _ => Nil
            }
            case _ => throw new IllegalArgumentException("invalid transcription JSON")
          }
        else Nil

      def i(name: String): Long = row.props(name).asLong
      val header =
        s"""[Script Info]
           |Title: Transcription Subtitles
           |Original Script: ChatGPT
           |ScriptType: v4.00+
           |Collisions: Normal
           |PlayDepth: 0
           |
           |[Styles]
           |Format: Name, Fontname, Fontsize, PrimaryColour, SecondaryColour, BackColour, Bold, Italic, BorderStyle, Outline, Shadow, Alignment, MarginL, MarginR, MarginV
           |Style: ${row.str("name")},${row.str("font_name")},${i("font_size")},${row.str("primary_colour")},${row.str("secondary_colour")},${row.str("back_colour")},${i("bold")},${i("italic")},${i("border_style")},${fmt1(row.props("outline").asDouble)},${fmt1(row.props("shadow").asDouble)},${i("alignment")},${i("margin_l")},${i("margin_r")},${i("margin_v")}
           |
           |[Events]
           |Format: Marked, Start, End, Style, Name, MarginL, MarginR, MarginV, Effect, Text""".stripMargin
      val events = segments.map { case (start, end, text) =>
        s"\nDialogue: 0,${formatTime(start)},${formatTime(end)},${row.str("name")},,0,0,0,,$text"
      }.mkString
      BlockResult.text(header + events)
    }

    /** Go's %.1f. */
    private def fmt1(d: Double): String = f"$d%.1f"
  }

  val all: Seq[BlockOp] = Seq(SubtitlesFromTranscription)
}
