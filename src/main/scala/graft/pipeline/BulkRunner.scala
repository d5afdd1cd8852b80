package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-plane pipeline executor: every stage output IS a DataFrame
  * `(idx INT, value BINARY)` — nothing is ever collected to the driver.
  *
  * The control-plane [[Runner]] replicates the reference's execution
  * model faithfully (driver-resident buffers, moderation, retry,
  * regeneration — matching `[]*bytes.Buffer` semantics,
  * pipeline_block_data_registry.go:43). This executor is the 100 TB
  * form of the SAME spec language: a fan-out of a million rows stays a
  * Spark stage, JSONPath projection runs as a Catalyst expression,
  * zip-merge is a join on idx, checkpoints are parquet directories.
  *
  * Scope: pure-compute pipelines — ExprBlockOps run as codegen'd
  * selects, other Distributed blocks via mapPartitions. DriverSide
  * blocks (external clients, moderation, conditional stop) need the
  * control-plane Runner and are rejected up front; the spec suite
  * proves the two executors agree on specs both can run.
  */
object BulkRunner {

  case class BulkConfig(
      spark: SparkSession,
      registry: BlockRegistry,
      ctx: BlockCtx,
      /** Stage-checkpoint root (parquet per stage); None = in-memory
        * lineage only. */
      checkpointDir: Option[String] = None,
      /** E12 at data scale: hydrate stages whose checkpoint already
        * exists (complete `_SUCCESS` marker AND a manifest matching the
        * stage's current fingerprint) instead of recomputing them — a
        * killed run resumes from its last finished stage, while a run
        * resumed after EDITING the spec recomputes the edited stage and
        * everything downstream of it (the manifest embeds the upstream
        * fingerprints, so staleness propagates; reference analogue:
        * resume hydrates by processingId, immutable per run —
        * types/dataclasses/pipeline.go:193-202). */
      resume: Boolean = false)

  /** Run a spec over an initial stage map; returns slug → stage frame. */
  def run(spec: PipelineSpec, initial: Map[String, DataFrame],
      conf: BulkConfig): Map[String, DataFrame] = {
    val unsupported = spec.blocks
      .map(b => b -> conf.registry(b.id))
      .filter(_._2.mode == DriverSide)
    require(unsupported.isEmpty,
      s"BulkRunner handles pure-compute stages only; driver-side blocks " +
        s"${unsupported.map(_._1.slug).mkString(", ")} need the control-plane Runner")

    val stages = scala.collection.mutable.LinkedHashMap[String, DataFrame]()
    initial.foreach { case (k, v) => stages(k) = normalize(v) }
    // Initial (caller-provided) stages carry an opaque tag: the guard
    // covers spec edits; swapping the initial DATA under the same slug
    // is the caller's contract, as in the reference (a processing's
    // input files are immutable once staged).
    val fps = scala.collection.mutable.Map[String, String]()
    initial.keys.foreach(k => fps(k) = s"external:$k")

    spec.blocks.foreach { blockSpec =>
      val fp = stageFingerprint(blockSpec, fps)
      fps(blockSpec.slug) = fp
      val ckpt = conf.checkpointDir.map(r => s"$r/${spec.slug}/${blockSpec.slug}")
      val finished = conf.resume && ckpt.exists(p => checkpointCurrent(conf, p, fp))
      if (finished) stages(blockSpec.slug) = conf.spark.read.parquet(ckpt.get)
      else stages(blockSpec.slug) = runBlock(spec, blockSpec, stages, conf, fp)
    }
    stages.toMap
  }

  // --- stage fingerprints (stale-resume guard) ----------------------
  private val ManifestFile = "_graft_manifest"

  /** SHA-256 over the block's output-relevant spec fields plus the
    * fingerprints of every wired origin, so editing any upstream block
    * invalidates all downstream checkpoints. `description` is excluded:
    * it never affects the computed bytes. */
  private def stageFingerprint(b: BlockSpec,
      fps: scala.collection.Map[String, String]): String = {
    val ic = b.inputConfig.getOrElse(InputConfig())
    val wiring = ic.property.toSeq.sortBy(_._1).map { case (name, w) =>
      val up = fps.getOrElse(w.origin, s"unmaterialized:${w.origin}")
      s"$name<=${w.origin}#$up;path=${w.jsonPath.getOrElse("")};arr=${w.arrayInput}"
    }.mkString("|")
    val lits = b.input.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=${canonValue(v)}" }.mkString("|")
    val doc = s"id=${b.id}\nslug=${b.slug}\nisArray=${ic.isArray}\n" +
      s"lits=$lits\nwiring=$wiring"
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(doc.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Deterministic rendering of a literal input value (object keys
    * sorted; bytes hashed raw, never via a UTF-8 round-trip). */
  private def canonValue(v: PValue): String = v match {
    case PStr(s)   => s"s:$s"
    case PBytes(b) =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      "b:" + md.digest(b).take(8).map("%02x".format(_)).mkString
    case PNum(d)  => s"n:$d"
    case PInt(l)  => s"i:$l"
    case PBool(b) => s"t:$b"
    case PArr(vs) => vs.map(canonValue).mkString("a:[", ",", "]")
    case PObj(m)  => m.toSeq.sortBy(_._1)
      .map { case (k, x) => s"$k=${canonValue(x)}" }.mkString("o:{", ",", "}")
    case PNull    => "null"
  }

  /** Hadoop-FS view of a checkpoint path (works for hdfs://, s3a://,
    * file:/ — a java.io.File probe would silently disable resume on
    * any non-local checkpoint root). */
  private def hfs(conf: BulkConfig, p: String) = {
    val path = new org.apache.hadoop.fs.Path(p)
    (path.getFileSystem(conf.spark.sessionState.newHadoopConf()), path)
  }

  private def checkpointCurrent(conf: BulkConfig, p: String, fp: String): Boolean = {
    val (fs, path) = hfs(conf, p)
    val ok = fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS"))
    ok && {
      val mf = new org.apache.hadoop.fs.Path(path, ManifestFile)
      fs.exists(mf) && {
        val in = fs.open(mf)
        try {
          val bytes = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](4096)
          var n = in.read(buf)
          while (n > 0) { bytes.write(buf, 0, n); n = in.read(buf) }
          new String(bytes.toByteArray, "UTF-8") == fp
        } finally in.close()
      }
    }
  }

  private def writeManifest(conf: BulkConfig, p: String, fp: String): Unit = {
    val (fs, path) = hfs(conf, p)
    val out = fs.create(new org.apache.hadoop.fs.Path(path, ManifestFile), true)
    try out.write(fp.getBytes("UTF-8")) finally out.close()
  }

  private def runBlock(spec: PipelineSpec, blockSpec: BlockSpec,
      stages: scala.collection.mutable.LinkedHashMap[String, DataFrame],
      conf: BulkConfig, fp: String): DataFrame = {
      val op = conf.registry(blockSpec.id)
      val ic = blockSpec.inputConfig.getOrElse(InputConfig())

      // E1-E4 at frame level: each wired property becomes (idx, value).
      val propFrames: Map[String, DataFrame] = ic.property.map { case (name, w) =>
        val origin = stages.getOrElse(w.origin,
          throw new NoSuchElementException(s"origin ${w.origin} not materialized"))
        val resolved = (w.arrayInput, w.jsonPath) match {
          case (true, None) => Wiring.fanIn(origin)
          case (true, Some(path)) =>
            Wiring.fanIn(origin.select(col("idx"),
              element_at(JsonPathExtract.json_path_extract(
                col("value").cast("string"), path), 1).as("value")))
          case (false, Some(path)) if isStar(path) && ic.isArray =>
            Wiring.jsonPathExplode(origin, path)
          case (false, Some(path)) =>
            origin.select(col("idx"),
              element_at(JsonPathExtract.json_path_extract(
                col("value").cast("string"), path), 1).as("value"))
          case (false, None) => origin
        }
        name -> resolved
      }

      val litRow: Map[String, PValue] = blockSpec.input
      val (in: DataFrame, zipCleanup: (() => Unit)) =
        if (propFrames.isEmpty)
          (conf.spark.range(1).select(lit(0).as("idx")), () => ())
        else Wiring.zipByIdxWithCleanup(propFrames)

      def typedCol(name: String): Column = {
        val present = propFrames.contains(name)
        val isArr = op.propsByName.get(name).exists(_.typ.isInstanceOf[TArr])
        // literal > schema default (prepare() applies the same order)
        val fallback = litRow.get(name)
          .orElse(op.propsByName.get(name).flatMap(_.default))
        (present, isArr) match {
          case (true, true)   => col(name).cast("array<string>")
          case (false, true)  => lit(null).cast("array<string>")
          case (true, false)  =>
            coalesce(col(name).cast("string"), litFor(fallback).cast("string"))
          case (false, false) => litFor(fallback)
        }
      }

      val out = execute(op, blockSpec, in, typedCol, conf)
      conf.checkpointDir match {
        case Some(root) =>
          val path = s"$root/${spec.slug}/${blockSpec.slug}"
          out.write.mode("overwrite").parquet(path)
          // manifest AFTER the parquet commit: a crash between the two
          // leaves _SUCCESS without a manifest → recomputed on resume
          writeManifest(conf, path, fp)
          // the parquet checkpoint cuts the lineage, so the zip's
          // interned property frames can be released now
          zipCleanup()
          conf.spark.read.parquet(path)
        case None => out
      }
  }

  /** Resume: hydrate stage frames from a previous run's parquet
    * checkpoints (the E12 analogue at data scale). */
  def load(spark: SparkSession, root: String, pipelineSlug: String,
      blockSlug: String): DataFrame =
    spark.read.parquet(s"$root/$pipelineSlug/$blockSlug")

  // ------------------------------------------------------------------
  private def normalize(df: DataFrame): DataFrame =
    df.select(col("idx").cast("int").as("idx"), col("value").cast("binary").as("value"))

  private def isStar(path: String): Boolean =
    try JsonPath.compile(path).contains(JsonPath.Star)
    catch { case _: Exception => false }

  private def litFor(v: Option[PValue]): Column = v match {
    case Some(PNull) | None => lit(null).cast("string")
    // a binary literal must reach TFile props as raw bytes: a UTF-8
    // round-trip through asString corrupts non-UTF8 payloads (the
    // control-plane Runner keeps them intact via PropSpec.castTo)
    case Some(PBytes(b))    => lit(b)
    case Some(x)            => lit(x.asString)
  }

  private def execute(op: BlockOp, blockSpec: BlockSpec, in: DataFrame,
      typedCol: String => Column, conf: BulkConfig): DataFrame = op match {
    case e: ExprBlockOp =>
      // one codegen'd select over the whole stage
      normalize(in.select(col("idx"),
        e.outputColumn(typedCol).cast("binary").as("value")))
    case _ =>
      // generic Distributed block: mapPartitions, rows streamed through
      // the op. Columns stay typed by the prop's schema type — a TFile
      // prop travels as BinaryType end-to-end (a string round-trip would
      // silently corrupt non-UTF8 payloads like PNG/MP3), an array prop
      // as array<binary>/array<string> (so join_videos' fan-in arrives
      // as a real PArr), everything else as string re-cast by
      // PropSpec.castTo (so an int prop arrives as PInt, not a
      // stringly-typed PStr).
      val ctx = conf.ctx
      val props = op.props
      val propCols = props.map { p =>
        val c = p.typ match {
          case TFile =>
            if (in.columns.contains(p.name))
              coalesce(col(p.name).cast("binary"), typedCol(p.name).cast("binary"))
            else typedCol(p.name).cast("binary")
          case TArr(TFile) =>
            // fan-in of binary stage values: keep the bytes as bytes
            if (in.columns.contains(p.name)) col(p.name).cast("array<binary>")
            else lit(null).cast("array<binary>")
          case _ => typedCol(p.name)
        }
        c.as(p.name)
      }
      val ds = in.select((col("idx").cast("int").as("idx") +: propCols): _*)
      val slug = blockSpec.slug
      import conf.spark.implicits._
      val raw = ds.mapPartitions { rows =>
        rows.map { r =>
          val m = props.zipWithIndex.flatMap { case (p, i) =>
            Option(r.get(i + 1)).map { v =>
              val raw: PValue = v match {
                case b: Array[Byte] => PBytes(b)
                case xs: scala.collection.Seq[_] => PArr(xs.map {
                  case b: Array[Byte] => PBytes(b)
                  case x              => PStr(String.valueOf(x))
                }.toSeq)
                case s => PStr(s.toString)
              }
              p.name -> p.cast(raw)
            }
          }.toMap
          val prepared = op.prepare(m).fold(
            e => throw new IllegalArgumentException(s"$slug: $e"), identity)
          val res = op.process(InputRow(r.getInt(0), prepared), ctx)
          (r.getInt(0), res.outputs)
        }
      }.toDF("src_idx", "outs")
      // E13 at frame scale (Runner.scala's sortedResults loop): fan-out
      // mode keeps output[0] at the input index; otherwise every buffer
      // becomes an independent row, re-indexed contiguously by
      // (input idx, buffer position) — how audio_chunk's N chunks become
      // N rows (reference pipeline.go:523-601).
      if (blockSpec.inputConfig.exists(_.isArray))
        normalize(raw.select(col("src_idx").as("idx"),
          coalesce(element_at(col("outs"), 1),
            lit(Array.empty[Byte])).as("value")))
      else explodeOutputs(raw)
  }

  /** Explode per-row output buffers to independent rows with a global
    * contiguous index — zipWithIndex over a range-partitioned frame,
    * same pattern as [[Wiring.jsonPathExplode]] (no single-task
    * `row_number()` window). */
  private def explodeOutputs(raw: DataFrame): DataFrame = {
    val spark = raw.sparkSession
    val exploded = raw
      .select(col("src_idx"), posexplode(col("outs")).as(Seq("pos", "value")))
      .repartitionByRange(col("src_idx"), col("pos"))
      .sortWithinPartitions("src_idx", "pos")
    val indexed = exploded.select("value").rdd.zipWithIndex.map {
      case (r, i) => org.apache.spark.sql.Row(i.toInt, r.getAs[Array[Byte]](0))
    }
    spark.createDataFrame(indexed, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("idx",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.BinaryType))))
  }
}
