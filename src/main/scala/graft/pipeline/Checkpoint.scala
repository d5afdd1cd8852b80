package graft.pipeline

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import java.io.{ByteArrayOutputStream}

/** Per-stage checkpoint store (engine ops E11-E13): every block output
  * row is written to
  * `<root>/<pipelineSlug>/<processingId>/<blockSlug>/output_<idx>.<ext>`
  * (the reference's layout, pipeline_block_data_registry.go:291-334),
  * extension inferred by magic-bytes sniffing (types/storage.go:126-170).
  *
  * Multi-storage fan-out: like the reference (which writes every output
  * to local FS AND MinIO, pipeline_block_data_registry.go:291-334),
  * every write goes to ALL `roots`; a failing root is reported, never
  * fatal. Reads take the FIRST root that has the data — `roots` order
  * is preference order (the reference hardcodes minio-preferred,
  * `:210-214`; here the caller declares it), so data present in several
  * stores is never merged twice.
  *
  * Uses the Hadoop FileSystem API so the same store works on local FS in
  * tests and on HDFS/S3 at cluster scale; block outputs are the
  * inter-stage contract that makes resume and targeted regeneration
  * possible.
  */
class CheckpointStore(val roots: Seq[String], conf: Configuration)
    extends Serializable {
  require(roots.nonEmpty, "CheckpointStore needs at least one storage root")

  def this(root: String) = this(Seq(root), new Configuration())
  def this(roots: Seq[String]) = this(roots, new Configuration())
  def this(root: String, conf: Configuration) = this(Seq(root), conf)

  private def fs(p: Path): FileSystem = p.getFileSystem(conf)

  /** Stage directory in the preferred (first) root. */
  def stageDir(pipeline: String, processingId: String, blockSlug: String): Path =
    new Path(roots.head, s"$pipeline/$processingId/$blockSlug")

  /** E11: persist one stage's output rows to every storage root.
    * Replaces only the indexes present in `rows` (targeted regeneration
    * rewrites a single index, pipeline.go:523-601). Returns the
    * per-root failures `(root, error)` — the caller ledgers them; a
    * partial write is not fatal as long as one root survives. */
  def saveOutput(pipeline: String, processingId: String, blockSlug: String,
      rows: Seq[(Int, Array[Byte])]): Seq[(String, String)] =
    roots.flatMap { root =>
      try { saveOutputTo(root, pipeline, processingId, blockSlug, rows); None }
      catch { case e: Exception => Some(root -> String.valueOf(e.getMessage)) }
    }

  private def saveOutputTo(root: String, pipeline: String, processingId: String,
      blockSlug: String, rows: Seq[(Int, Array[Byte])]): Unit = {
    val dir = new Path(root, s"$pipeline/$processingId/$blockSlug")
    val f = fs(dir)
    if (!f.mkdirs(dir)) throw new java.io.IOException(s"cannot create $dir")
    // One listing up front (listStatus per row is O(rows × files) RPCs on
    // object stores); map index → existing files so regeneration can
    // replace output_<idx>.* even when the extension changes.
    val existing: Map[String, Seq[Path]] = f.listStatus(dir).toSeq
      .map(_.getPath)
      .groupBy(p => p.getName.takeWhile(_ != '.'))
    rows.foreach { case (idx, bytes) =>
      existing.getOrElse(s"output_$idx", Nil).foreach(f.delete(_, false))
      val ext = Mime.extensionOf(bytes)
      atomicWrite(f, new Path(dir, s"output_$idx$ext"), bytes)
    }
  }

  /** Write-then-rename so a concurrent reader (the async start/resume
    * API polls while the run executes) never observes a half-written
    * file. Dot-prefixed temp names are invisible to the output_/doc
    * listings. */
  private def atomicWrite(f: FileSystem, target: Path, bytes: Array[Byte]): Unit = {
    val tmp = new Path(target.getParent, s".${target.getName}.tmp")
    val out = f.create(tmp, true)
    try out.write(bytes) finally out.close()
    if (f.exists(target)) f.delete(target, false)
    if (!f.rename(tmp, target))
      throw new java.io.IOException(s"cannot publish $target")
  }

  /** E12: hydrate a stage's rows from storage (resume path) — first
    * root that has the stage wins (preferred-store dedup on load). */
  def loadOutput(pipeline: String, processingId: String,
      blockSlug: String): Option[Seq[(Int, Array[Byte])]] =
    roots.iterator.flatMap { root =>
      try loadOutputFrom(root, pipeline, processingId, blockSlug)
      catch { case _: Exception => None }
    }.nextOption()

  private def loadOutputFrom(root: String, pipeline: String,
      processingId: String, blockSlug: String): Option[Seq[(Int, Array[Byte])]] = {
    val dir = new Path(root, s"$pipeline/$processingId/$blockSlug")
    val f = fs(dir)
    if (!f.exists(dir)) return None
    val idxRe = "output_(\\d+).*".r
    val rows = f.listStatus(dir).toSeq.flatMap { st =>
      st.getPath.getName match {
        case idxRe(i) => Some(i.toInt -> readFully(f, st.getPath))
        case _        => None
      }
    }.sortBy(_._1)
    if (rows.isEmpty) None else Some(rows)
  }

  /** E14: write a structured run-ledger document to every root;
    * returns per-root failures. */
  def saveDocument(pipeline: String, processingId: String, name: String,
      content: String): Seq[(String, String)] =
    roots.flatMap { root =>
      try {
        val p = new Path(root, s"$pipeline/$processingId/$name")
        atomicWrite(fs(p), p, content.getBytes("UTF-8"))
        None
      } catch { case e: Exception => Some(root -> String.valueOf(e.getMessage)) }
    }

  /** Union across roots (a processing may survive in only one store). */
  def listProcessings(pipeline: String): Seq[String] =
    roots.flatMap { root =>
      try {
        val dir = new Path(root, pipeline)
        val f = fs(dir)
        if (!f.exists(dir)) Nil
        else f.listStatus(dir).toSeq.filter(_.isDirectory).map(_.getPath.getName)
      } catch { case _: Exception => Nil }
    }.distinct

  /** First root with matching documents wins (same dedup rule as
    * loadOutput). */
  def readDocuments(pipeline: String, processingId: String,
      prefix: String): Seq[(String, String)] =
    roots.iterator.map { root =>
      try {
        val dir = new Path(root, s"$pipeline/$processingId")
        val f = fs(dir)
        if (!f.exists(dir)) Nil
        else f.listStatus(dir).toSeq
          .filter(st => st.isFile && st.getPath.getName.startsWith(prefix))
          .map(st => st.getPath.getName -> new String(readFully(f, st.getPath), "UTF-8"))
          .sortBy(_._1)
      } catch { case _: Exception => Seq.empty[(String, String)] }
    }.find(_.nonEmpty).getOrElse(Nil)

  private def readFully(f: FileSystem, p: Path): Array[Byte] = {
    val in = f.open(p)
    val buf = new ByteArrayOutputStream()
    try {
      val tmp = new Array[Byte](64 * 1024)
      var n = in.read(tmp)
      while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
    } finally in.close()
    buf.toByteArray
  }
}

/** Magic-bytes MIME sniffer — the reference infers checkpoint file
  * extensions from a 261-byte prefix (types/helpers/storage.go:10-26);
  * this covers the formats its blocks emit. */
object Mime {
  def extensionOf(b: Array[Byte]): String = {
    def has(off: Int, sig: Int*): Boolean =
      b.length >= off + sig.size &&
        sig.indices.forall(i => (b(off + i) & 0xff) == sig(i))
    if (has(0, 0x89, 0x50, 0x4e, 0x47)) ".png"
    else if (has(0, 0xff, 0xd8, 0xff)) ".jpg"
    else if (has(0, 'G', 'I', 'F', '8')) ".gif"
    else if (b.length >= 12 && has(4, 'f', 't', 'y', 'p')) ".mp4"
    else if (has(0, 'I', 'D', '3') || has(0, 0xff, 0xfb) || has(0, 0xff, 0xf3) ||
             has(0, 0xff, 0xf2)) ".mp3"
    else if (has(0, 'R', 'I', 'F', 'F')) ".wav"
    else if (has(0, 'O', 'g', 'g', 'S')) ".ogg"
    else if (has(0, 0x1a, 0x45, 0xdf, 0xa3)) ".webm"
    else if (looksJson(b)) ".json"
    else ".txt"
  }

  /** Brace/bracket pre-filter (first and last non-whitespace byte),
    * then a real parse for payloads up to 64 KB — a wrap_text output
    * like "[hello]" must not be checkpointed as .json. Multi-MB
    * payloads keep the cheap heuristic: extension inference must not
    * run Jackson over them just to pick ".json" vs ".txt". */
  private def looksJson(b: Array[Byte]): Boolean = {
    var i = 0
    while (i < b.length && Character.isWhitespace(b(i))) i += 1
    var j = b.length - 1
    while (j > i && Character.isWhitespace(b(j))) j -= 1
    val braced =
      i <= j && ((b(i) == '{' && b(j) == '}') || (b(i) == '[' && b(j) == ']'))
    braced &&
      (b.length > 64 * 1024 || Json.tryParse(new String(b, "UTF-8")).isDefined)
  }
}
