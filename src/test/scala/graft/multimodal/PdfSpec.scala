package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class PdfSpec extends AnyFunSuite {

  private def fromContent(content: String): Array[Byte] = {
    // wrap a raw content stream in the synthetic skeleton by splicing:
    // build a tiny PDF by hand around the given stream body
    val head = s"%PDF-1.4\n1 0 obj\n<< /Length ${content.length} >>\nstream\n"
    (head + content + "\nendstream\nendobj\n%%EOF\n").getBytes("UTF-8")
  }

  test("synthetic round-trip, raw and FlateDecode, incl. escapes and unicode") {
    for (compress <- Seq(false, true);
         text <- Seq(
           "plain words here",
           "parens (nested (deep)) and \\ backslash",
           "unicode: café 多字节",
           "line one\nline two")) {
      val got = Pdf.extractText(Pdf.synthetic(text, compress))
      assert(got.contains(text), s"compress=$compress text=[$text] got=$got")
    }
  }

  test("the escape table decodes: named, octal, line continuation") {
    val got = Pdf.extractText(fromContent(
      "BT (a\\(b\\)c\\\\d\\012e\\tf\\\ng) Tj ET")).get
    assert(got == "a(b)c\\d\ne\tfg")
  }

  test("hex strings and TJ arrays show text; kerning numbers are ignored") {
    assert(Pdf.extractText(fromContent("BT <48656C6C6F> Tj ET")).get == "Hello")
    assert(Pdf.extractText(fromContent("BT [(He) -120 (llo)] TJ ET")).get == "Hello")
  }

  test("strings bound to non-show operators are discarded; Td separates") {
    val got = Pdf.extractText(fromContent(
      "BT (junk) Do (first) Tj 0 -14 Td (second) Tj ET")).get
    assert(got == "first second")
  }

  test("non-PDF payloads are None; a textless PDF is empty, not wrong") {
    assert(Pdf.extractText("not a pdf".getBytes("UTF-8")).isEmpty)
    assert(Pdf.extractText(fromContent("0 0 612 792 re f")).contains(""))
  }

  test("document text containing the word 'endstream' cannot truncate its stream") {
    // /Length is honored, so the in-text marker is just bytes
    for (compress <- Seq(false, true)) {
      val text = "this doc discusses endstream and endobj markers in PDFs"
      assert(Pdf.extractText(Pdf.synthetic(text, compress)).contains(text))
    }
  }

  test("a nested dict inside the stream dict cannot hide the filter or length") {
    // /DecodeParms carries a NESTED << >>: a nearest-'<<' window would see
    // only the inner dict, miss /FlateDecode, and emit garbage text ops
    val raw = "BT (nested dict) Tj ET".getBytes("UTF-8")
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](1024)
    val out = new java.io.ByteArrayOutputStream()
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val body = out.toByteArray
    val pdf = (s"%PDF-1.4\n1 0 obj\n<< /Length ${body.length} /Filter /FlateDecode " +
      "/DecodeParms << /Columns 1 >> >>\nstream\n").getBytes("UTF-8") ++
      body ++ "\nendstream\nendobj\n%%EOF\n".getBytes("UTF-8")
    assert(Pdf.extractText(pdf).contains("nested dict"))
  }

  test("stream data containing 'obj' and '/Length' cannot mis-frame the NEXT stream") {
    // stream 1's length-declared DATA embeds a fake object header and a
    // fake /Length; stream 2 is Flate-compressed, so a window that starts
    // inside stream 1's data (or trusts the fake length) would miss the
    // filter or mis-frame the bytes. The dict window is floored at the
    // previous 'endstream', anchored to the 'N G obj' header shape, and
    // takes the LAST /Length in the window.
    val fake = "BT (first) Tj ET 9 0 obj\n<< /Length 2 >> junk << trailing"
    val raw2 = "BT (second framed right) Tj ET".getBytes("UTF-8")
    val d = new java.util.zip.Deflater()
    d.setInput(raw2); d.finish()
    val buf = new Array[Byte](1024)
    val out = new java.io.ByteArrayOutputStream()
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val body = out.toByteArray
    val pdf = (s"%PDF-1.4\n1 0 obj\n<< /Length ${fake.length} >>\nstream\n" +
      fake + s"\nendstream\nendobj\n" +
      s"2 0 obj\n<< /Length ${body.length} /Filter /FlateDecode >>\nstream\n")
      .getBytes("UTF-8") ++ body ++ "\nendstream\nendobj\n%%EOF\n".getBytes("UTF-8")
    val got = Pdf.extractText(pdf).get
    assert(got.contains("first") && got.contains("second framed right"), got)
  }

  test("an indirect /Length reference falls back to the marker scan") {
    val content = "BT (indirect) Tj ET"
    val pdf = (s"%PDF-1.4\n1 0 obj\n<< /Length 8 0 R >>\nstream\n" +
      content + "\nendstream\nendobj\n%%EOF\n").getBytes("UTF-8")
    assert(Pdf.extractText(pdf).contains("indirect"))
  }

  test("an FDICT-flagged Flate stream yields nothing instead of spinning forever") {
    val raw = "BT (never seen) Tj ET".getBytes("UTF-8")
    val d = new java.util.zip.Deflater()
    d.setDictionary("some preset dictionary".getBytes("UTF-8")) // sets FDICT
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](1024)
    val out = new java.io.ByteArrayOutputStream()
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val body = out.toByteArray
    val pdf = (s"%PDF-1.4\n1 0 obj\n<< /Length ${body.length} /Filter /FlateDecode >>\nstream\n")
      .getBytes("UTF-8") ++ body ++ "\nendstream\nendobj\n%%EOF\n".getBytes("UTF-8")
    assert(Pdf.extractText(pdf).contains("")) // terminates, extracts nothing
  }

  test("a truncated Flate stream degrades to its sound prefix, never throws") {
    val whole = Pdf.synthetic("a reasonably long sentence to compress well", compress = true)
    // chop inside the stream: extraction must not throw
    val cut = java.util.Arrays.copyOf(whole, whole.length * 2 / 3)
    val got = Pdf.extractText(cut)
    assert(got.isDefined) // prefix text or empty — but parsed, not crashed
  }
}
