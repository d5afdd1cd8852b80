package graft.pipeline

/** Minimal multipart/form-data parser (RFC 7578 subset) for the API's
  * start/resume handlers — the Scala counterpart of the reference's
  * `ParseMultipartForm` + `ParseForm` path
  * (api/schemas/pipelines.go:78-154, api/handlers/pipelines.go:155).
  *
  * Byte-exact part extraction: file parts are binary and must never
  * round-trip through a string decode.
  */
object Multipart {

  /** One body part: `filename` present ⇒ a file field. */
  case class Part(name: String, filename: Option[String], data: Array[Byte])

  /** Extract the boundary token from a Content-Type header value. */
  def boundary(contentType: String): Option[String] =
    contentType.split(";").map(_.trim)
      .find(_.toLowerCase.startsWith("boundary="))
      .map(_.substring("boundary=".length).stripPrefix("\"").stripSuffix("\""))

  /** Parse the full request body. Parts with unparseable headers are
    * skipped (matching Go's lenient mime/multipart reader). */
  def parse(body: Array[Byte], boundaryToken: String): Seq[Part] = {
    val delim = ("--" + boundaryToken).getBytes("ISO-8859-1")
    val parts = scala.collection.mutable.ArrayBuffer[Part]()
    var pos = indexOf(body, delim, 0)
    while (pos >= 0) {
      val afterDelim = pos + delim.length
      // closing delimiter is "--boundary--"
      if (afterDelim + 1 < body.length &&
          body(afterDelim) == '-' && body(afterDelim + 1) == '-') {
        pos = -1
      } else {
        val partStart = skipCrLf(body, afterDelim)
        val next = indexOf(body, delim, partStart)
        if (next < 0) pos = -1
        else {
          // part content ends just before "\r\n--boundary"
          val partEnd = math.max(partStart, next - 2)
          parsePart(java.util.Arrays.copyOfRange(body, partStart, partEnd))
            .foreach(parts += _)
          pos = next
        }
      }
    }
    parts.toSeq
  }

  /** Convenience views matching the reference's form/files split:
    * (scalar+array form fields, first-file-per-key). */
  def formAndFiles(parts: Seq[Part])
      : (Map[String, Seq[String]], Map[String, Array[Byte]]) = {
    val (fileParts, fieldParts) = parts.partition(_.filename.isDefined)
    val form = fieldParts.groupBy(_.name)
      .map { case (k, ps) => k -> ps.map(p => new String(p.data, "UTF-8")) }
    val files = fileParts.groupBy(_.name)
      .map { case (k, ps) => k -> ps.head.data } // first file per key
    (form, files)
  }

  // ------------------------------------------------------------------
  private def parsePart(part: Array[Byte]): Option[Part] = {
    val headerEnd = indexOf(part, "\r\n\r\n".getBytes("ISO-8859-1"), 0)
    if (headerEnd < 0) return None
    val headers = new String(part, 0, headerEnd, "ISO-8859-1")
    val data = java.util.Arrays.copyOfRange(part, headerEnd + 4, part.length)
    val disposition = headers.split("\r\n")
      .find(_.toLowerCase.startsWith("content-disposition:"))
      .getOrElse(return None)
    for (name <- headerParam(disposition, "name"))
      yield Part(name, headerParam(disposition, "filename"), data)
  }

  private def headerParam(header: String, param: String): Option[String] =
    header.split(";").map(_.trim)
      .find(_.toLowerCase.startsWith(param + "="))
      .map(_.substring(param.length + 1).stripPrefix("\"").stripSuffix("\""))

  private def skipCrLf(b: Array[Byte], from: Int): Int = {
    var i = from
    if (i + 1 < b.length && b(i) == '\r' && b(i + 1) == '\n') i += 2
    i
  }

  private def indexOf(haystack: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(0, from)
    val limit = haystack.length - needle.length
    while (i <= limit) {
      var j = 0
      while (j < needle.length && haystack(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }
}
