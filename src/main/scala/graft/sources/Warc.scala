package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) ingestion — the wire format web-scale
  * crawl corpora actually arrive in (Common Crawl ships petabytes of
  * `.warc.gz`), so an LLM-data pipeline's FIRST operator is this parse.
  *
  * Layout implemented here is the standard one: a `.warc.gz` file is a
  * CONCATENATION of gzip members (one record per member is the common
  * writer convention; the reader accepts any member split because
  * `GZIPInputStream` walks consecutive members transparently and record
  * boundaries come from WARC's own `Content-Length` framing, never from
  * the compression layer). A record is
  *
  * {{{
  * WARC/1.0 CRLF
  * <Name>: <value> CRLF ...          (WARC named fields)
  * Content-Length: <n> CRLF CRLF
  * <n bytes of block> CRLF CRLF      (record separator)
  * }}}
  *
  * and a `response` record's block is itself an HTTP/1.1 message
  * (status line, headers, empty line, body).
  *
  * Scale posture: the Spark face ([[readResponses]]) is a `binaryFile`
  * scan — one row per FILE — followed by a narrow per-file flatMap, so
  * the parallel unit is the file and blobs never shuffle. At 100 TB the
  * writer's contract is therefore file granularity: ~100 MB–1 GB per
  * `.warc.gz` keeps tasks balanced, and the JVM's 2 GB `Array[Byte]`
  * ceiling is the hard per-file bound (Common Crawl's own ~1 GB segment
  * convention sits comfortably inside both).
  *
  * Malformed-input contract (the [[graft.multimodal.Media]] honesty
  * discipline): a structurally invalid record — bad version line, missing
  * or unparsable `Content-Length`, or a block running past the buffer —
  * ENDS that file's iteration, keeping every record already parsed.
  * Without per-record compression boundaries there is no reliable resync
  * point after corrupt framing, and guessing one could silently misattribute
  * bytes across documents; truncation-at-damage is the only honest recovery.
  * Records of other types (`warcinfo`, `request`, ...) and non-HTTP blocks
  * are SKIPPED, not fatal.
  */
object Warc {

  private val Crlf = "\r\n"

  /** Page shell wrapped around each fixture document's text — SHARED
    * constants (the q173/q185/q194 discipline): the q205 fixture writer
    * builds the HTML from these and the oracle generator replays the same
    * literals, so kernel and oracle cannot drift. The shell carries a tag
    * whose strip must die ('<meta ...>'), an entity, and the body tags. */
  val shellPrefix = "<html><head><meta charset=\"utf-8\"><title>crawl &amp; co</title></head><body><p>"
  val shellSuffix = "</p></body></html>"

  /** One WARC/1.0 record: named fields + Content-Length framing + block +
    * record separator. The header is ASCII by construction (callers pass
    * URI/date/type strings); the BLOCK is arbitrary bytes. */
  def record(warcType: String, headers: Seq[(String, String)], block: Array[Byte]): Array[Byte] = {
    val head = new StringBuilder("WARC/1.0").append(Crlf)
      .append("WARC-Type: ").append(warcType).append(Crlf)
    headers.foreach { case (k, v) => head.append(k).append(": ").append(v).append(Crlf) }
    head.append("Content-Length: ").append(block.length).append(Crlf).append(Crlf)
    val hb = head.toString.getBytes("UTF-8")
    val out = new java.io.ByteArrayOutputStream(hb.length + block.length + 4)
    out.write(hb); out.write(block); out.write(s"$Crlf$Crlf".getBytes("UTF-8"))
    out.toByteArray
  }

  /** An HTTP/1.1 response block. `Content-Length` counts body BYTES —
    * multi-byte UTF-8 text makes the byte-vs-char distinction live. */
  def httpResponseBlock(status: Int, contentType: String, body: Array[Byte]): Array[Byte] = {
    val reason = status match {
      case 200 => "OK"; case 404 => "Not Found"; case 301 => "Moved Permanently"
      case _ => "Status"
    }
    val head = (s"HTTP/1.1 $status $reason" + Crlf +
      s"Content-Type: $contentType" + Crlf +
      s"Content-Length: ${body.length}" + Crlf + Crlf).getBytes("UTF-8")
    val out = new java.io.ByteArrayOutputStream(head.length + body.length)
    out.write(head); out.write(body)
    out.toByteArray
  }

  /** A full `response` record for one captured page (UTF-8 body). */
  def responseRecord(uri: String, date: String, status: Int, html: String): Array[Byte] =
    responseRecordBytes(uri, date, status, "text/html; charset=utf-8",
      html.getBytes("UTF-8"))

  /** A `response` record with an explicit content type and raw body —
    * the non-UTF-8 face ([[responseRecord]] is the common case). */
  def responseRecordBytes(uri: String, date: String, status: Int,
                          contentType: String, body: Array[Byte]): Array[Byte] =
    record("response", Seq(
      "WARC-Record-ID" -> s"<urn:uuid:${java.util.UUID.nameUUIDFromBytes(uri.getBytes("UTF-8"))}>",
      "WARC-Target-URI" -> uri,
      "WARC-Date" -> date,
      "Content-Type" -> "application/http;msgtype=response"),
      httpResponseBlock(status, contentType, body))

  /** The file-leading `warcinfo` record (readers must skip it). */
  def warcinfoRecord(filename: String): Array[Byte] =
    record("warcinfo", Seq("WARC-Filename" -> filename),
      s"software: graft${Crlf}format: WARC File Format 1.0$Crlf".getBytes("UTF-8"))

  /** One gzip MEMBER. Concatenated members form a valid `.warc.gz`. */
  def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream((bytes.length >> 1) + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  /** One parsed `response` record. Crawls are MULTIMODAL: a text
    * content type decodes into `body` under its declared charset
    * (`bodyBinary` null); any other type — image, audio, video,
    * application — keeps its exact payload bytes in `bodyBinary`
    * (`body` null), because a charset decode of binary data is lossy
    * and silently corrupting. */
  case class WarcResponse(uri: String, date: String, status: Int,
                          contentType: String, body: String,
                          bodyBinary: Array[Byte])

  /** Inflate a whole (multi-member) gzip payload. A TRUNCATED or corrupt
    * member (a half-written crawl file — routine at fleet scale) keeps the
    * bytes already inflated instead of failing the task: the record walk
    * then applies its own truncate-at-damage contract, so one bad file
    * costs its own tail, never the job. */
  private[graft] def inflateAll(gz: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(gz), 1 << 16)
    val out = new java.io.ByteArrayOutputStream(math.max(gz.length << 2, 1024))
    val buf = new Array[Byte](1 << 16)
    try {
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } catch {
      case _: java.io.EOFException | _: java.util.zip.ZipException => ()
    } finally in.close()
    out.toByteArray
  }

  /** Reassemble an RFC 7230 §4.1 chunked body: hex-size line (chunk
    * extensions after ';' ignored) CRLF data CRLF ... 0-chunk (trailers
    * ignored). Crawlers that archive the raw wire bytes store bodies in
    * this form. Returns null on malformed framing — a body whose chunk
    * sizes cannot be trusted cannot be attributed to the page. */
  private def dechunk(bytes: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(len)
    var p = off
    val end = off + len
    while (true) {
      var q = p
      while (q + 1 < end && !(bytes(q) == '\r' && bytes(q + 1) == '\n')) q += 1
      if (q + 1 >= end) return null
      val sizeStr = new String(bytes, p, q - p, "US-ASCII").takeWhile(_ != ';').trim
      val size = try Integer.parseInt(sizeStr, 16)
                 catch { case _: NumberFormatException => return null }
      if (size < 0) return null
      if (size == 0) return out.toByteArray // done; trailers ignored
      val dataStart = q + 2
      if (dataStart + size + 2 > end) return null
      out.write(bytes, dataStart, size)
      if (!(bytes(dataStart + size) == '\r' && bytes(dataStart + size + 1) == '\n'))
        return null
      p = dataStart + size + 2
    }
    null // unreachable
  }

  /** Route a payload by content type: text decodes (charset-aware),
    * everything else keeps its exact bytes (see [[WarcResponse]]). A
    * MISSING content type defaults to text — the common case for archived
    * HTTP/1.0 responses, and the reader downstream can re-sniff. */
  private def assemble(uri: String, date: String, status: Int, contentType: String,
                       bytes: Array[Byte], off: Int, len: Int): WarcResponse = {
    // route by the PRIMARY type only: 'application/pdf; charset=UTF-8' is
    // a mislabel servers routinely emit, and treating the charset
    // parameter as a text signal would lossily string-decode the PDF bytes
    val primary = contentType.toLowerCase(java.util.Locale.ROOT)
      .takeWhile(_ != ';').trim
    val isText = primary.isEmpty || primary.startsWith("text/") ||
      primary.contains("json") || primary.contains("xml") ||
      primary.contains("javascript") || primary.contains("x-www-form-urlencoded")
    if (isText)
      WarcResponse(uri, date, status, contentType,
        decodeBody(bytes, off, len, contentType), null)
    else
      WarcResponse(uri, date, status, contentType, null,
        java.util.Arrays.copyOfRange(bytes, off, off + len))
  }

  /** Decode an HTTP body under its declared charset (see
    * parseHttpResponse's contract). */
  private def decodeBody(bytes: Array[Byte], off: Int, len: Int,
                         contentType: String): String = {
    val m = java.util.regex.Pattern.compile("(?i)charset\\s*=\\s*\"?([A-Za-z0-9_.:-]+)")
      .matcher(contentType)
    val cs: java.nio.charset.Charset =
      if (m.find()) {
        try java.nio.charset.Charset.forName(m.group(1))
        catch { case _: Exception => java.nio.charset.StandardCharsets.UTF_8 }
      } else java.nio.charset.StandardCharsets.UTF_8
    try new String(bytes, off, len, cs)
    catch { case _: Exception =>
      new String(bytes, off, len, java.nio.charset.StandardCharsets.ISO_8859_1)
    }
  }

  /** Parse a `.warc.gz` payload into its `response` records. */
  def parseWarcGz(bytes: Array[Byte]): Iterator[WarcResponse] = parseWarc(inflateAll(bytes))

  /** Parse an UNCOMPRESSED WARC byte stream. Lazy per-record walk — the
    * caller's flatMap pulls records one at a time. */
  def parseWarc(bytes: Array[Byte]): Iterator[WarcResponse] =
    new scala.collection.AbstractIterator[WarcResponse] {
      private var pos = 0
      private var nextResp: WarcResponse = null
      advance()

      override def hasNext: Boolean = nextResp != null
      override def next(): WarcResponse = {
        if (nextResp == null) throw new NoSuchElementException("parseWarc")
        val r = nextResp; advance(); r
      }

      /** Index just past the next CRLF at/after `from`, or -1. */
      private def lineEnd(from: Int): Int = {
        var i = from
        while (i + 1 < bytes.length && !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
        if (i + 1 < bytes.length) i + 2 else -1
      }

      private def ascii(from: Int, until: Int): String =
        new String(bytes, from, until - from, "UTF-8")

      @annotation.tailrec
      private def advance(): Unit = {
        nextResp = null
        // skip record separators / padding between records
        while (pos + 1 < bytes.length && bytes(pos) == '\r' && bytes(pos + 1) == '\n') pos += 2
        if (pos >= bytes.length) return
        // version line — anything else is unframed damage: stop (see scaladoc)
        val ve = lineEnd(pos)
        if (ve < 0 || !ascii(pos, ve - 2).startsWith("WARC/")) { pos = bytes.length; return }
        // named fields until the empty line
        var p = ve
        var warcType: String = ""
        var uri: String = ""
        var date: String = ""
        var len = -1L
        var ok = true
        var headerDone = false
        while (ok && !headerDone) {
          val le = lineEnd(p)
          if (le < 0) ok = false
          else if (le == p + 2) { headerDone = true; p = le } // empty line
          else {
            val line = ascii(p, le - 2)
            val c = line.indexOf(':')
            if (c < 0) ok = false
            else {
              val k = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
              val v = line.substring(c + 1).trim
              k match {
                case "warc-type" => warcType = v
                case "warc-target-uri" => uri = v
                case "warc-date" => date = v
                case "content-length" =>
                  len = try v.toLong catch { case _: NumberFormatException => -1L }
                case _ => ()
              }
              p = le
            }
          }
        }
        if (!ok || len < 0 || p + len > bytes.length) { pos = bytes.length; return }
        val blockStart = p
        pos = p + len.toInt // len <= bytes.length <= 2^31-1: the cast is safe
        if (warcType == "response") {
          val resp = parseHttpResponse(blockStart, blockStart + len.toInt, uri, date)
          if (resp != null) { nextResp = resp; return }
        }
        advance() // skipped type or non-HTTP block: walk on
      }

      /** HTTP/1.1 block -> response, or null when the block isn't HTTP.
        * The body decodes under the header's declared charset (crawls are
        * NOT all UTF-8): any JDK-supported `charset=` honors; a missing or
        * unknown declaration falls back to UTF-8 — with ISO-8859-1 as the
        * last resort since it cannot fail, so a mislabeled body degrades
        * to readable bytes instead of an exception. */
      private def parseHttpResponse(from: Int, until: Int,
                                    uri: String, date: String): WarcResponse = {
        val se = lineEnd(from)
        if (se < 0 || se > until) return null
        val statusLine = ascii(from, se - 2)
        if (!statusLine.startsWith("HTTP/")) return null
        val parts = statusLine.split(" ", 3)
        if (parts.length < 2) return null
        val status = try parts(1).toInt catch { case _: NumberFormatException => return null }
        var p = se
        var contentType = ""
        var chunked = false
        while (p < until) {
          val le = lineEnd(p)
          if (le < 0 || le > until) return null
          if (le == p + 2) { // empty line: the rest is the body
            if (chunked) {
              // archived raw wire bytes: reassemble before decoding;
              // untrustworthy chunk framing skips the record (see dechunk)
              val de = dechunk(bytes, le, until - le)
              if (de == null) return null
              return assemble(uri, date, status, contentType, de, 0, de.length)
            }
            return assemble(uri, date, status, contentType, bytes, le, until - le)
          }
          val line = ascii(p, le - 2)
          val c = line.indexOf(':')
          if (c >= 0) {
            val key = line.substring(0, c).trim
            if (key.equalsIgnoreCase("Content-Type"))
              contentType = line.substring(c + 1).trim
            else if (key.equalsIgnoreCase("Transfer-Encoding"))
              chunked = line.substring(c + 1).trim
                .toLowerCase(java.util.Locale.ROOT).contains("chunked")
          }
          p = le
        }
        null // header never terminated inside the block
      }
    }

  /** Write a deterministic `.warc.gz` fixture corpus from a frame of
    * `(id: Long, uri, date, status: Int, html)` rows: rows partition by
    * `pmod(id, nFiles)` (same id -> same file, so re-runs are idempotent
    * file-for-file) and each task streams its partition through
    * member-per-record gzip into ONE file — the write is distributed and
    * constant-memory, never a driver collect. Empty partitions still emit
    * a warcinfo-only file (a real reader must cope with those). Files land
    * as `part-<p>.warc.gz` under `dir`; the caller owns completion marking
    * (write-then-`_SUCCESS`, the standing-asset convention). */
  /** The standard page-capture shaping of a documents frame — SHARED by
    * the q205/q208 standing fixture and the sf0.1 `Stress crawl` study so
    * the two can never desynchronize: uri and the 404 stripe from doc-id
    * residues, a fixed date, the shared shell around the text. */
  def shapePages(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("id"),
      concat(lit("https://crawl.example/doc/"), col(idCol).cast("string")).as("uri"),
      lit("2026-01-01T00:00:00Z").as("date"),
      when(pmod(col(idCol), lit(97L)) === 0, 404).otherwise(200).as("status"),
      concat(lit(shellPrefix), col(textCol), lit(shellSuffix)).as("html"))

  def writeFixture(shaped: DataFrame, dir: String, nFiles: Int): Unit =
    writeFiles(
      shaped.select(col("id").cast("long"), col("uri").cast("string"),
        col("date").cast("string"), col("status").cast("int"), col("html").cast("string")),
      dir, nFiles)(r => responseRecord(
        r.getString(1), r.getString(2), r.getInt(3), r.getString(4)))

  /** [[writeFixture]]'s multimodal sibling: `(id, uri, date, status,
    * ctype, payload: binary)` rows — image/audio/whatever captures with
    * their exact bytes. */
  def writeMediaFixture(shaped: DataFrame, dir: String, nFiles: Int): Unit =
    writeFiles(
      shaped.select(col("id").cast("long"), col("uri").cast("string"),
        col("date").cast("string"), col("status").cast("int"),
        col("ctype").cast("string"), col("payload")),
      dir, nFiles)(r => responseRecordBytes(
        r.getString(1), r.getString(2), r.getInt(3), r.getString(4),
        r.getAs[Array[Byte]](5)))

  private def writeFiles(rows: DataFrame, dir: String, nFiles: Int)
                        (toRecord: Row => Array[Byte]): Unit = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    new java.io.File(dir).mkdirs()
    rows
      .repartition(nFiles, pmod(col(rows.columns.head), lit(nFiles.toLong)))
      .foreachPartition { (it: Iterator[Row]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val target = new java.io.File(dir, f"part-$pid%05d.warc.gz")
        val tmp = java.io.File.createTempFile(s"warc-$pid-", ".tmp", new java.io.File(dir))
        val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(tmp), 1 << 16)
        try {
          out.write(gzipMember(warcinfoRecord(target.getName)))
          it.foreach(r => out.write(gzipMember(toRecord(r))))
        } finally out.close()
        java.nio.file.Files.move(tmp.toPath, target.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
      }
  }

  /** The Spark face: `binaryFile` scan over `*.warc.gz` -> narrow per-file
    * record parse. Zero shuffles; the blob never leaves its scan task. */
  def readResponses(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc.gz").load(path)
      .select(col("content")).as[Array[Byte]]
      .flatMap(parseWarcGz(_))
      .toDF()
  }
}
