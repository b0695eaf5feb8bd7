package graft.sources

import graft.SparkSuite
import org.scalatest.funsuite.AnyFunSuite

class WarcSpec extends AnyFunSuite with SparkSuite {
  import Warc._

  private def gz(records: Array[Byte]*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach(r => out.write(gzipMember(r)))
    out.toByteArray
  }

  test("a response record round-trips through member-per-record gzip") {
    val body = "<p>héllo wörld — 多字节</p>" // multi-byte UTF-8: Content-Length counts BYTES
    val payload = gz(
      warcinfoRecord("f.warc.gz"),
      responseRecord("https://a.example/x", "2026-01-01T00:00:00Z", 200, body))
    val got = parseWarcGz(payload).toList
    assert(got.map(r => (r.uri, r.date, r.status, r.contentType, r.body)) ==
      List(("https://a.example/x", "2026-01-01T00:00:00Z", 200,
        "text/html; charset=utf-8", body)))
  }

  test("Content-Length framing survives WARC-looking and CRLF-bearing bodies") {
    // a body that CONTAINS a fake record header and blank lines: only the
    // byte count may delimit it — any text-based resync would split here
    val trap = "WARC/1.0\r\nContent-Length: 0\r\n\r\nstill the same body\r\n\r\ntail"
    val payload = gz(
      responseRecord("https://a.example/1", "d", 200, trap),
      responseRecord("https://a.example/2", "d", 404, "after"))
    val got = parseWarcGz(payload).toList
    assert(got.map(_.body) == List(trap, "after"))
    assert(got.map(_.status) == List(200, 404))
  }

  test("non-response records and non-HTTP blocks are skipped, not fatal") {
    val reqBlock = ("GET /x HTTP/1.1\r\nHost: a.example\r\n\r\n").getBytes("UTF-8")
    val payload = gz(
      warcinfoRecord("f"),
      record("request", Seq("WARC-Target-URI" -> "https://a.example/x"), reqBlock),
      record("response", Seq("WARC-Target-URI" -> "u"), "not http at all".getBytes("UTF-8")),
      responseRecord("https://a.example/keep", "d", 200, "kept"))
    assert(parseWarcGz(payload).map(_.uri).toList == List("https://a.example/keep"))
  }

  test("a truncated or malformed tail keeps the records already parsed") {
    val good = responseRecord("https://a.example/ok", "d", 200, "fine")
    val second = responseRecord("https://a.example/cut", "d", 200, "about to be cut")
    val truncated = parseWarc(good ++ second.dropRight(20)).toList
    assert(truncated.map(_.uri) == List("https://a.example/ok"))
    val damaged = parseWarc(good ++ "GARBAGE not a version line\r\n\r\n".getBytes("UTF-8")).toList
    assert(damaged.map(_.uri) == List("https://a.example/ok"))
  }

  test("the body decodes under its declared charset; unknown labels degrade, never throw") {
    val latin = "café niño" // é/ñ are single bytes in ISO-8859-1
    val payload = gz(
      responseRecordBytes("https://a.example/l1", "d", 200,
        "text/html; charset=ISO-8859-1", latin.getBytes("ISO-8859-1")),
      responseRecordBytes("https://a.example/utf", "d", 200,
        "text/html; charset=\"utf-8\"", "café".getBytes("UTF-8")), // quoted label
      responseRecordBytes("https://a.example/junk", "d", 200,
        "text/html; charset=no-such-charset", "plain ascii".getBytes("US-ASCII")))
    val got = parseWarcGz(payload).map(r => (r.uri, r.body)).toList
    assert(got == List(
      ("https://a.example/l1", latin),
      ("https://a.example/utf", "café"),
      ("https://a.example/junk", "plain ascii")))
  }

  test("chunked transfer encoding reassembles; untrustworthy framing skips the record") {
    def chunkedRecord(uri: String, chunkedBody: String): Array[Byte] = {
      val block = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
        "Transfer-Encoding: chunked\r\n\r\n" + chunkedBody).getBytes("UTF-8")
      record("response", Seq("WARC-Target-URI" -> uri, "WARC-Date" -> "d",
        "Content-Type" -> "application/http;msgtype=response"), block)
    }
    // two chunks (the first with an extension to ignore), trailers present
    val good = chunkedRecord("https://a.example/ok",
      "6;ext=1\r\nhello \r\n5\r\nworld\r\n0\r\nX-Trailer: t\r\n\r\n")
    // a size line that lies about its data length: the record must skip
    val bad = chunkedRecord("https://a.example/bad", "FFFF\r\nshort\r\n0\r\n\r\n")
    val after = responseRecord("https://a.example/after", "d", 200, "still here")
    val got = parseWarcGz(gz(good, bad, after)).map(r => (r.uri, r.body)).toList
    assert(got == List(
      ("https://a.example/ok", "hello world"),
      ("https://a.example/after", "still here")))
  }

  test("binary content types keep exact payload bytes; text stays decoded") {
    // bytes that are INVALID UTF-8 (a lone 0xFF, a truncated multi-byte
    // sequence): a charset decode would corrupt them irreversibly
    val img = Array[Byte](0x47, 0x49, 0x46, 0xFF.toByte, 0xC3.toByte, 0x00, 0x89.toByte)
    val payload = gz(
      responseRecordBytes("https://a.example/img", "d", 200, "image/gif", img),
      responseRecord("https://a.example/page", "d", 200, "<p>text</p>"))
    val got = parseWarcGz(payload).toList
    assert(got.map(_.uri) == List("https://a.example/img", "https://a.example/page"))
    assert(got(0).body == null && got(0).bodyBinary.toSeq == img.toSeq)
    assert(got(1).bodyBinary == null && got(1).body == "<p>text</p>")
  }

  test("a binary type mislabeled with a charset still keeps exact bytes") {
    // servers routinely emit 'application/pdf; charset=UTF-8' — the
    // charset PARAMETER must not route the payload through a lossy decode
    val img = Array[Byte](0x25, 0x50, 0x44, 0x46, 0xFF.toByte, 0xFE.toByte)
    val got = parseWarcGz(gz(responseRecordBytes(
      "https://a.example/pdf", "d", 200, "application/pdf; charset=UTF-8", img))).toList
    assert(got.head.body == null && got.head.bodyBinary.toSeq == img.toSeq)
  }

  test("a gzip member truncated mid-stream keeps the sound prefix, not an exception") {
    val r1 = responseRecord("https://a.example/sound", "d", 200, "intact")
    val r2 = responseRecord("https://a.example/lost", "d", 200, "half written")
    val payload = gz(r1) ++ gz(r2).dropRight(15) // torn tail member
    assert(parseWarcGz(payload).map(_.uri).toList == List("https://a.example/sound"))
  }

  test("empty body and a multi-member file with no responses both parse") {
    assert(parseWarcGz(gz(warcinfoRecord("empty"), warcinfoRecord("again"))).isEmpty)
    val got = parseWarcGz(gz(responseRecord("u", "d", 200, ""))).toList
    assert(got.map(_.body) == List(""))
  }

  test("writeFixture + readResponses round-trip the corpus through real files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("warc_rt").toString
    val docs = (0L until 100L).map(i =>
      (i, s"https://c.example/doc/$i", "2026-01-01T00:00:00Z",
        if (i % 7 == 0) 404 else 200, s"<p>doc $i body — ünïcode</p>"))
      .toDF("id", "uri", "date", "status", "html")
    writeFixture(docs, dir, nFiles = 8)
    // nFiles files exist even if murmur collides buckets into one partition
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".warc.gz"))
    assert(files.length == 8)
    val got = readResponses(spark, dir)
      .select("uri", "status", "body").as[(String, Int, String)].collect().toSet
    val want = (0L until 100L).map(i =>
      (s"https://c.example/doc/$i", if (i % 7 == 0) 404 else 200,
        s"<p>doc $i body — ünïcode</p>")).toSet
    assert(got == want)
  }
}
