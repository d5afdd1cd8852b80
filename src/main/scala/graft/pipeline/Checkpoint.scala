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
  * Uses the Hadoop FileSystem API so the same store works on local FS in
  * tests and on HDFS/S3 at cluster scale; blocks outputs are the
  * inter-stage contract that makes resume and targeted regeneration
  * possible.
  */
class CheckpointStore(root: String, conf: Configuration = new Configuration())
    extends Serializable {

  private def fs(p: Path): FileSystem = p.getFileSystem(conf)

  def stageDir(pipeline: String, processingId: String, blockSlug: String): Path =
    new Path(root, s"$pipeline/$processingId/$blockSlug")

  /** E11: persist one stage's output rows. Replaces only the indexes
    * present in `rows` (targeted regeneration rewrites a single index,
    * pipeline.go:523-601). */
  def saveOutput(pipeline: String, processingId: String, blockSlug: String,
      rows: Seq[(Int, Array[Byte])]): Unit = {
    val dir = stageDir(pipeline, processingId, blockSlug)
    val f = fs(dir)
    f.mkdirs(dir)
    // One listing up front (listStatus per row is O(rows × files) RPCs on
    // object stores); map index → existing files so regeneration can
    // replace output_<idx>.* even when the extension changes.
    val existing: Map[String, Seq[Path]] = f.listStatus(dir).toSeq
      .map(_.getPath)
      .groupBy(p => p.getName.takeWhile(_ != '.'))
    rows.foreach { case (idx, bytes) =>
      existing.getOrElse(s"output_$idx", Nil).foreach(f.delete(_, false))
      val ext = Mime.extensionOf(bytes)
      val p = new Path(dir, s"output_$idx$ext")
      val out = f.create(p, true)
      try out.write(bytes) finally out.close()
    }
  }

  /** E12: hydrate a stage's rows from storage (resume path). */
  def loadOutput(pipeline: String, processingId: String,
      blockSlug: String): Option[Seq[(Int, Array[Byte])]] = {
    val dir = stageDir(pipeline, processingId, blockSlug)
    val f = fs(dir)
    if (!f.exists(dir)) return None
    val idxRe = "output_(\\d+).*".r
    val rows = f.listStatus(dir).toSeq.flatMap { st =>
      st.getPath.getName match {
        case idxRe(i) =>
          val in = f.open(st.getPath)
          val buf = new ByteArrayOutputStream()
          try {
            val tmp = new Array[Byte](64 * 1024)
            var n = in.read(tmp)
            while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
          } finally in.close()
          Some(i.toInt -> buf.toByteArray)
        case _ => None
      }
    }.sortBy(_._1)
    if (rows.isEmpty) None else Some(rows)
  }

  /** E14: write a structured run-ledger document. */
  def saveDocument(pipeline: String, processingId: String, name: String,
      content: String): Unit = {
    val p = new Path(root, s"$pipeline/$processingId/$name")
    val f = fs(p)
    val out = f.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  def listProcessings(pipeline: String): Seq[String] = {
    val dir = new Path(root, pipeline)
    val f = fs(dir)
    if (!f.exists(dir)) Nil
    else f.listStatus(dir).toSeq.filter(_.isDirectory).map(_.getPath.getName)
  }

  def readDocuments(pipeline: String, processingId: String,
      prefix: String): Seq[(String, String)] = {
    val dir = new Path(root, s"$pipeline/$processingId")
    val f = fs(dir)
    if (!f.exists(dir)) Nil
    else f.listStatus(dir).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith(prefix))
      .map { st =>
        val in = f.open(st.getPath)
        val buf = new ByteArrayOutputStream()
        try {
          val tmp = new Array[Byte](64 * 1024)
          var n = in.read(tmp)
          while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
        } finally in.close()
        st.getPath.getName -> new String(buf.toByteArray, "UTF-8")
      }.sortBy(_._1)
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

  /** Cheap brace/bracket heuristic (first and last non-whitespace byte)
    * — extension inference must not parse multi-MB payloads with
    * Jackson just to pick ".json" vs ".txt". */
  private def looksJson(b: Array[Byte]): Boolean = {
    var i = 0
    while (i < b.length && Character.isWhitespace(b(i))) i += 1
    var j = b.length - 1
    while (j > i && Character.isWhitespace(b(j))) j -= 1
    i <= j && ((b(i) == '{' && b(j) == '}') || (b(i) == '[' && b(j) == ']'))
  }
}
