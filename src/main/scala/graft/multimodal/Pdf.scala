package graft.multimodal

/** REAL PDF text extraction — the other dominant crawl DOCUMENT format
  * after HTML, and a first-class LLM-pipeline input. No library: the
  * format's text layer is reachable with the JDK alone — object/stream
  * framing is byte markers, /FlateDecode is `java.util.zip.Inflater`
  * (the same codec PNG already uses), and page text is a token stream
  * of string literals bound to `Tj`/`TJ`/`'`/`"` show operators.
  *
  * SUBSET, stated honestly (the [[Media.parseBmp]] rule): literal
  * `(...)` strings (with the full escape table: `\\`, `\(`, `\)`,
  * `\n\r\t\b\f`, octal, line continuations) and hex `<...>` strings,
  * raw or FlateDecode content streams, text-positioning operators
  * (`Td`/`TD`/`T*`) rendered as separators. Encrypted files, CMap
  * (Identity-H) glyph-index text, and predictor-coded streams yield
  * whatever literal text they expose — typically nothing — rather than
  * wrong text; `extractText` returns None only for a non-PDF payload.
  * Strings decode as UTF-8 (the writer's convention here); real-world
  * WinAnsi/PDFDoc encodings differ per font and are out of scope.
  */
object Pdf {

  private val Latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

  /** A minimal spec-valid single-page PDF whose page content shows
    * `text` with one `Tj` — optionally FlateDecode-compressed, so both
    * filter paths are exercised by fixtures. Deterministic bytes. */
  def synthetic(text: String, compress: Boolean): Array[Byte] = {
    val escaped = text.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    val contentRaw = s"BT /F1 12 Tf 72 720 Td ($escaped) Tj ET".getBytes("UTF-8")
    val content =
      if (compress) {
        val d = new java.util.zip.Deflater()
        d.setInput(contentRaw); d.finish()
        val buf = new Array[Byte](contentRaw.length + 64)
        val out = new java.io.ByteArrayOutputStream()
        while (!d.finished()) out.write(buf, 0, d.deflate(buf))
        d.end()
        out.toByteArray
      } else contentRaw
    val filter = if (compress) "/Filter /FlateDecode " else ""
    val objs = Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
      null, // placeholder: the stream object is assembled below
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    val out = new java.io.ByteArrayOutputStream(content.length + 1024)
    def w(s: String): Unit = out.write(s.getBytes(Latin1))
    w("%PDF-1.4\n")
    val offsets = new Array[Int](objs.length + 1)
    objs.zipWithIndex.foreach { case (body, i) =>
      offsets(i + 1) = out.size()
      w(s"${i + 1} 0 obj\n")
      if (body != null) w(body + "\n")
      else {
        w(s"<< /Length ${content.length} $filter>>\nstream\n")
        out.write(content)
        w("\nendstream\n")
      }
      w("endobj\n")
    }
    val xref = out.size()
    w(s"xref\n0 ${objs.length + 1}\n0000000000 65535 f \n")
    (1 to objs.length).foreach(i => w(f"${offsets(i)}%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    out.toByteArray
  }

  /** Visible text of every content stream, in document order. None only
    * for a non-PDF payload; a PDF exposing no extractable text yields "". */
  def extractText(bytes: Array[Byte]): Option[String] = {
    if (bytes.length < 5 || new String(bytes, 0, 5, Latin1) != "%PDF-") return None
    val sb = new StringBuilder
    var pos = 0
    while (pos < bytes.length) {
      val s = indexOf(bytes, "stream", pos)
      if (s < 0) pos = bytes.length
      else {
        // the stream keyword ends with CRLF or LF; data starts after it
        var dataStart = s + 6
        if (dataStart < bytes.length && bytes(dataStart) == '\r') dataStart += 1
        if (dataStart < bytes.length && bytes(dataStart) == '\n') dataStart += 1
        // the OWNING OBJECT's dict tells us the filter AND (when direct)
        // the byte length — honoring /Length is what keeps a document whose
        // TEXT contains the word 'endstream' from truncating its own
        // stream. Window from the preceding 'obj' keyword, NOT the nearest
        // '<<': a stream dict with a nested dict (/DecodeParms << ... >>)
        // would otherwise hide /Length and — worse — /FlateDecode, and an
        // undetected filter means garbage text ops over compressed bytes.
        // TWO framing guards against a PRECEDING stream's binary data
        // happening to contain 'obj' or '/Length N': (1) the window floor
        // is the previous 'endstream' (no earlier object's data can leak
        // in), and the 'obj' must carry the 'N G obj' header shape
        // (digits, ws, digits, ws); (2) the LAST /Length match in the
        // window wins — the owning dict is the closest to 'stream'.
        val floor = lastIndexOf(bytes, "endstream", s)
        val objStart = anchoredObjBefore(bytes, s, floor)
        val rawDict = if (objStart >= 0) objStart else lastIndexOf(bytes, "<<", s)
        val dictStart = if (rawDict > floor) rawDict else -1
        val dict = if (dictStart >= 0) new String(bytes, dictStart, s - dictStart, Latin1) else ""
        // (?!\d) pins the FULL digit run; the second lookahead rejects
        // indirect references ('/Length 8 0 R') without letting
        // backtracking accept their numeric prefix
        val lenM = java.util.regex.Pattern.compile("/Length\\s+(\\d+)(?!\\d)(?!\\s+\\d+\\s+R)")
          .matcher(dict)
        var direct = -1L
        while (lenM.find()) direct = lenM.group(1).toLong
        val (dataEnd, next) =
          if (direct >= 0 && dataStart + direct <= bytes.length) {
            // trust the declared length; resync on the endstream AFTER it
            val after = indexOf(bytes, "endstream", dataStart + direct.toInt)
            ((dataStart + direct.toInt), if (after < 0) bytes.length else after + 9)
          } else {
            // indirect-ref or bogus length: fall back to the marker scan
            val e = indexOf(bytes, "endstream", dataStart)
            if (e < 0) (-1, bytes.length)
            else {
              var de = e
              // writers may put CRLF/LF before endstream; not stream data
              if (de > dataStart && bytes(de - 1) == '\n') de -= 1
              if (de > dataStart && bytes(de - 1) == '\r') de -= 1
              (de, e + 9)
            }
          }
        if (dataEnd >= dataStart) {
          val raw = java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
          val content =
            if (dict.contains("/FlateDecode")) inflate(raw) // null on damage
            else raw
          if (content != null) appendTextOps(content, sb)
        }
        pos = next
      }
    }
    Some(sb.result().trim)
  }

  private def indexOf(hay: Array[Byte], needle: String, from: Int): Int = {
    val n = needle.getBytes(Latin1)
    var i = math.max(from, 0)
    while (i + n.length <= hay.length) {
      var j = 0
      while (j < n.length && hay(i + j) == n(j)) j += 1
      if (j == n.length) return i
      i += 1
    }
    -1
  }

  /** Last 'obj' keyword before `before` (and after `floor`) that carries
    * the 'N G obj' object-header shape — digits, whitespace, digits,
    * whitespace, 'obj' — so an 'obj' byte run INSIDE an earlier stream's
    * binary data never frames the dict window. -1 when none qualifies. */
  private def anchoredObjBefore(bytes: Array[Byte], before: Int, floor: Int): Int = {
    def ws(b: Byte): Boolean = b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == 0x0c || b == 0
    def dig(b: Byte): Boolean = b >= '0' && b <= '9'
    var cand = lastIndexOf(bytes, "obj", before)
    while (cand > floor) {
      var i = cand - 1
      if (i >= 0 && ws(bytes(i))) {
        while (i >= 0 && ws(bytes(i))) i -= 1
        val gEnd = i
        while (i >= 0 && dig(bytes(i))) i -= 1
        if (i < gEnd && i >= 0 && ws(bytes(i))) {
          while (i >= 0 && ws(bytes(i))) i -= 1
          val nEnd = i
          while (i >= 0 && dig(bytes(i))) i -= 1
          if (i < nEnd) return cand
        }
      }
      cand = lastIndexOf(bytes, "obj", cand)
    }
    -1
  }

  private def lastIndexOf(hay: Array[Byte], needle: String, before: Int): Int = {
    val n = needle.getBytes(Latin1)
    var i = math.min(before, hay.length) - n.length
    while (i >= 0) {
      var j = 0
      while (j < n.length && hay(i + j) == n(j)) j += 1
      if (j == n.length) return i
      i -= 1
    }
    -1
  }

  private def inflate(raw: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(raw)
    val out = new java.io.ByteArrayOutputStream(raw.length * 4 + 64)
    val buf = new Array[Byte](1 << 14)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        // 0 bytes means STUCK, not just truncated: needsInput (torn
        // stream) but also needsDictionary (FDICT-flagged zlib, which we
        // cannot serve) — both keep the prefix instead of spinning forever
        if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
          return out.toByteArray
        out.write(buf, 0, n)
      }
      out.toByteArray
    } catch {
      case _: java.util.zip.DataFormatException => null
    } finally inf.end()
  }

  /** Walk one content stream's token sequence: string literals buffer
    * until a text-SHOW operator binds them (`Tj`, `'`, `"`, or `TJ` over
    * an array); positioning operators (`Td`, `TD`, `T*`) and `ET` become
    * separators. Strings bound to non-show operators are discarded. */
  private def appendTextOps(content: Array[Byte], sb: StringBuilder): Unit = {
    var i = 0
    val pending = new StringBuilder // strings seen since the last operator
    def sep(): Unit =
      if (sb.nonEmpty && !sb.last.isWhitespace) sb.append(' ')
    while (i < content.length) {
      val c = content(i).toChar
      if (c == '(') {
        val (s, next) = literalString(content, i)
        pending.append(s); i = next
      } else if (c == '<' && i + 1 < content.length && content(i + 1) != '<') {
        val (s, next) = hexString(content, i)
        pending.append(s); i = next
      } else if (c == '%') { // comment to end of line
        while (i < content.length && content(i) != '\n' && content(i) != '\r') i += 1
      } else if (c.isLetter || c == '\'' || c == '"') {
        var j = i
        while (j < content.length && !content(j).toChar.isWhitespace &&
          !"()<>[]{}/%".contains(content(j).toChar)) j += 1
        val op = new String(content, i, j - i, Latin1)
        op match {
          case "Tj" | "TJ" | "'" | "\"" =>
            if (pending.nonEmpty) { sep(); sb.append(pending); pending.clear() }
          case "Td" | "TD" | "T*" | "ET" =>
            pending.clear(); sep()
          case _ => pending.clear() // a non-show operator consumed them
        }
        i = j
      } else i += 1 // numbers, arrays, names, whitespace: irrelevant here
    }
  }

  /** PDF literal string: balanced parens, escape table, octal, line
    * continuations. Returns (decoded, index past the closing paren). */
  private def literalString(b: Array[Byte], open: Int): (String, Int) = {
    val out = new java.io.ByteArrayOutputStream()
    var i = open + 1
    var depth = 1
    while (i < b.length && depth > 0) {
      val c = b(i).toChar
      if (c == '\\' && i + 1 < b.length) {
        val e = b(i + 1).toChar
        e match {
          case 'n' => out.write('\n'); i += 2
          case 'r' => out.write('\r'); i += 2
          case 't' => out.write('\t'); i += 2
          case 'b' => out.write('\b'); i += 2
          case 'f' => out.write('\f'); i += 2
          case '(' | ')' | '\\' => out.write(e); i += 2
          case '\n' => i += 2 // line continuation
          case '\r' => i += (if (i + 2 < b.length && b(i + 2) == '\n') 3 else 2)
          case d if d >= '0' && d <= '7' =>
            var v = 0; var k = i + 1
            while (k < b.length && k < i + 4 && b(k) >= '0' && b(k) <= '7') {
              v = v * 8 + (b(k) - '0'); k += 1
            }
            out.write(v & 0xff); i = k
          case other => out.write(other); i += 2 // unknown escape: literal
        }
      } else {
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        if (depth > 0) out.write(b(i))
        i += 1
      }
    }
    (new String(out.toByteArray, "UTF-8"), i)
  }

  /** PDF hex string `<...>`: pairs of hex digits, odd length pads 0. */
  private def hexString(b: Array[Byte], open: Int): (String, Int) = {
    val hex = new StringBuilder
    var i = open + 1
    while (i < b.length && b(i) != '>') {
      val c = b(i).toChar
      if (!c.isWhitespace) hex.append(c)
      i += 1
    }
    if (hex.length % 2 == 1) hex.append('0')
    val out = new Array[Byte](hex.length / 2)
    var k = 0
    var ok = true
    while (k < out.length && ok) {
      try out(k) = Integer.parseInt(hex.substring(2 * k, 2 * k + 2), 16).toByte
      catch { case _: NumberFormatException => ok = false }
      k += 1
    }
    (if (ok) new String(out, "UTF-8") else "", i + 1)
  }
}
