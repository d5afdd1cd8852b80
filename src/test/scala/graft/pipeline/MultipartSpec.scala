package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Byte-exactness and header parsing of the multipart/form-data parser. */
class MultipartSpec extends AnyFunSuite {
  private val boundary = "bTest123"

  private def body(fields: Seq[(String, String)],
      files: Seq[(String, String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    fields.foreach { case (n, v) =>
      out.write((s"--$boundary\r\nContent-Disposition: form-data; " +
        s"""name="$n"\r\n\r\n$v\r\n""").getBytes("UTF-8"))
    }
    files.foreach { case (n, fn, d) =>
      out.write((s"--$boundary\r\nContent-Disposition: form-data; " +
        s"""name="$n"; filename="$fn"\r\n""" +
        "Content-Type: application/octet-stream\r\n\r\n").getBytes("UTF-8"))
      out.write(d); out.write("\r\n".getBytes("UTF-8"))
    }
    out.write(s"--$boundary--\r\n".getBytes("UTF-8"))
    out.toByteArray
  }

  test("binary file parts survive byte-exact, fields and arrays parse") {
    val bin = (0 until 512).map(i => ((i * 7 + 128) % 256).toByte).toArray
    assert(new String(bin, "UTF-8").getBytes("UTF-8").toSeq != bin.toSeq)
    val parts = Multipart.parse(
      body(Seq("a" -> "x", "tags[]" -> "t1", "tags[]" -> "t2"),
        Seq(("f", "f.bin", bin))), boundary)
    val (form, files) = Multipart.formAndFiles(parts)
    assert(form("a") == Seq("x"))
    assert(form("tags[]") == Seq("t1", "t2"))
    assert(files("f").toSeq == bin.toSeq, "file bytes must round-trip exactly")
  }

  test("boundary extraction handles quoted and unquoted forms") {
    assert(Multipart.boundary("multipart/form-data; boundary=abc") == Some("abc"))
    assert(Multipart.boundary("multipart/form-data; boundary=\"a c\"") == Some("a c"))
    assert(Multipart.boundary("application/json").isEmpty)
  }

  test("empty value and trailing part parse") {
    val (form, _) = Multipart.formAndFiles(
      Multipart.parse(body(Seq("e" -> "", "z" -> "last"), Nil), boundary))
    assert(form("e") == Seq(""))
    assert(form("z") == Seq("last"))
  }
}
