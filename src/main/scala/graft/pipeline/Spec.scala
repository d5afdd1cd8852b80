package graft.pipeline

/** Pipeline spec language — the JSON surface of the reference
  * (config/pipelines_validation_schema.json:8-92 in the reference tree):
  * ordered blocks, literal `input`, `input_config` wiring with origin /
  * json_path / array_input / type:"array" / parallel.
  */
case class PropertyWiring(
    origin: String,
    jsonPath: Option[String] = None,
    arrayInput: Boolean = false)

case class InputConfig(
    isArray: Boolean = false,
    parallel: Boolean = false,
    property: Map[String, PropertyWiring] = Map.empty)

case class BlockSpec(
    id: String,
    slug: String,
    description: String,
    input: Map[String, PValue] = Map.empty,
    inputConfig: Option[InputConfig] = None)

case class PipelineSpec(
    slug: String,
    title: String,
    description: String,
    blocks: Seq[BlockSpec]) {
  def blockIndex(slug: String): Int = blocks.indexWhere(_.slug == slug)
  def block(slug: String): Option[BlockSpec] = blocks.find(_.slug == slug)
}

object PipelineSpec {

  /** Parse + structurally validate a pipeline JSON document. Mirrors the
    * reference's meta-schema rules (unique slugs, required description
    * of ≥20 chars, origins must reference *earlier* blocks) plus
    * registry membership of each block id. */
  def parse(json: String, knownBlockIds: Set[String]): Either[Seq[String], PipelineSpec] = {
    val root = Json.parse(json) match {
      case o: PObj => o
      case _       => return Left(Seq("pipeline document must be a JSON object"))
    }
    def str(o: PObj, k: String): String =
      o.m.get(k).map(_.asString).getOrElse("")

    val blocks = root.m.get("blocks") match {
      case Some(PArr(bs)) => bs.zipWithIndex.map {
        case (b: PObj, i) => parseBlock(b, i)
        case (_, i)       => Left(Seq(s"blocks[$i] must be an object"))
      }
      case _ => return Left(Seq("missing blocks array"))
    }
    val errs = scala.collection.mutable.ArrayBuffer[String]()
    blocks.foreach { case Left(es) => errs ++= es; case _ => }
    // Keep each block's DOCUMENT position: when an earlier block fails to
    // parse, positions in the compacted list would shift and let a
    // later-block origin slip past the must-precede check.
    val parsedAt = blocks.zipWithIndex.collect { case (Right(b), i) => (b, i) }
    val parsed = parsedAt.map(_._1)
    val docPos = parsedAt.map { case (b, i) => b.slug -> i }.toMap

    val spec = PipelineSpec(str(root, "slug"), str(root, "title"),
      str(root, "description"), parsed)

    if (spec.slug.isEmpty) errs += "pipeline slug is required"
    val dup = parsed.groupBy(_.slug).collect { case (s, bs) if bs.size > 1 => s }
    dup.foreach(s => errs += s"duplicate block slug '$s'")
    parsedAt.foreach { case (b, i) =>
      if (!knownBlockIds.contains(b.id)) errs += s"unknown block id '${b.id}'"
      if (b.description.length < 20)
        errs += s"block '${b.slug}': description must be at least 20 chars"
      b.inputConfig.foreach(_.property.foreach { case (prop, w) =>
        docPos.get(w.origin) match {
          case None => errs += s"block '${b.slug}' property '$prop': unknown origin '${w.origin}'"
          case Some(j) if j >= i =>
            errs += s"block '${b.slug}' property '$prop': origin '${w.origin}' must precede it"
          case _ =>
        }
      })
    }
    if (errs.nonEmpty) Left(errs.toSeq) else Right(spec)
  }

  private def parseBlock(b: PObj, i: Int): Either[Seq[String], BlockSpec] = {
    def str(k: String): String = b.m.get(k).map(_.asString).getOrElse("")
    val input = b.m.get("input") match {
      case Some(PObj(m)) => m
      case _             => Map.empty[String, PValue]
    }
    val ic = b.m.get("input_config").map {
      case PObj(m) =>
        val props = m.get("property") match {
          case Some(PObj(pm)) => pm.collect { case (name, PObj(w)) =>
            name -> PropertyWiring(
              origin = w.get("origin").map(_.asString).getOrElse(""),
              jsonPath = w.get("json_path").map(_.asString),
              arrayInput = w.get("array_input").exists(_.asBool))
          }
          case _ => Map.empty[String, PropertyWiring]
        }
        InputConfig(
          isArray = m.get("type").exists(_.asString == "array"),
          parallel = m.get("parallel").exists(_.asBool),
          property = props)
      case _ => InputConfig()
    }
    if (str("id").isEmpty || str("slug").isEmpty)
      Left(Seq(s"blocks[$i]: id and slug are required"))
    else Right(BlockSpec(str("id"), str("slug"), str("description"), input, ic))
  }
}
