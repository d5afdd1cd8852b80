package graft.pipeline.blocks

import graft.pipeline._

/** Control-flow blocks: conditional stop (#21) and the upload identity
  * source (#22). */
object ControlBlocks {

  /** #21 stop_pipeline (block_stop_pipeline.go:48-67): evaluate
    * `data <condition> value` (all strings — the reference instantiates
    * EvaluateCondition[string]); if true the pipeline halts with status
    * Stopped (engine op E8). Empty output either way. */
  object StopPipeline extends BlockOp {
    override val id = "stop_pipeline"
    override val description = "Stop the pipeline if a condition holds"
    override val mode: ExecMode = DriverSide // drives run control flow
    override val props = Seq(
      PropSpec("data", TString, required = true),
      PropSpec("condition", TString, required = true,
        enumVals = Seq("==", "!=", ">", "<", ">=", "<=")),
      PropSpec("value", TString, required = true))

    override def process(row: InputRow, ctx: BlockCtx): BlockResult =
      Blocks.evaluateCondition(
        row.props.getOrElse("data", PStr("")),
        row.props.getOrElse("value", PStr("")),
        row.str("condition")) match {
        case Left(err)   => throw new IllegalArgumentException(err)
        case Right(stop) => BlockResult(outputs = Nil, stop = stop)
      }
  }

  /** #22 upload_file (block_upload_file.go:49-78): identity over the
    * uploaded bytes (the multipart parse happens in the API layer);
    * rejects empty payloads. */
  object UploadFile extends BlockOp {
    override val id = "upload_file"
    override val description = "Pass an uploaded file into the pipeline"
    override val props = Seq(PropSpec("file", TFile, required = true))

    override def process(row: InputRow, ctx: BlockCtx): BlockResult = {
      val bytes = row.bytes("file")
      if (bytes.isEmpty) throw new IllegalArgumentException("file is empty")
      BlockResult.bytes(bytes)
    }
  }

  val all: Seq[BlockOp] = Seq(StopPipeline, UploadFile)
}
