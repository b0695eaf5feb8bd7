package graft.sources

import java.nio.file.Files

import org.scalatest.funspec.AnyFunSpec

import graft.SparkSuite

/** Source formats: lossless round-trips under adversarial content, and the
  * corrupt-record quarantine posture. */
class FormatsSpec extends AnyFunSpec with SparkSuite {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("data").toString

  // embedded delimiter, quote, newline, unicode, empty string and NULL —
  // everything that breaks naive CSV handling
  private val tricky = Seq(
    (1L, "plain", Some(10L)),
    (2L, "comma, inside", Some(20L)),
    (3L, "quote \" inside", None),
    (4L, "line\nbreak", Some(40L)),
    (5L, "ünïcødé ✓", Some(50L)),
    (6L, "", None),
    (7L, null.asInstanceOf[String], Some(70L)))
  private val ddl = "id BIGINT, s STRING, v BIGINT"

  it("CSV round-trips adversarial strings losslessly under the strict reader") {
    val path = tmp("csv")
    val df = tricky.toDF("id", "s", "v")
    Formats.writeCsv(df, path)
    val back = Formats.readCsv(spark, path, ddl)
      .as[(Long, Option[String], Option[Long])].collect().toSet
    // CSV cannot distinguish NULL from empty string (both write as nothing);
    // normalize that one documented ambiguity, everything else must be exact
    val want = df.as[(Long, Option[String], Option[Long])].collect()
      .map { case (i, s, v) => (i, s.filter(_.nonEmpty), v) }.toSet
    assert(back === want)
  }

  it("JSON-lines round-trips the same content exactly (NULL vs empty preserved)") {
    val path = tmp("jsonl")
    val df = tricky.toDF("id", "s", "v")
    Formats.writeJsonLines(df, path)
    val back = Formats.readJsonLines(spark, path, ddl)
      .as[(Long, Option[String], Option[Long])].collect().toSet
    assert(back === df.as[(Long, Option[String], Option[Long])].collect().toSet)
  }

  it("JSON-lines carries nested structs and arrays CSV cannot") {
    val path = tmp("jsonn")
    val df = Seq((1L, ("a", 2L), Seq(1L, 2L, 3L)), (2L, ("b", 4L), Seq.empty[Long]))
      .toDF("id", "kv", "xs")
    Formats.writeJsonLines(df, path)
    val back = Formats.readJsonLines(spark, path,
        "id BIGINT, kv STRUCT<_1: STRING, _2: BIGINT>, xs ARRAY<BIGINT>")
      .as[(Long, (String, Long), Seq[Long])].collect().toSet
    assert(back === df.as[(Long, (String, Long), Seq[Long])].collect().toSet)
  }

  it("the strict reader FAILS FAST on malformed input instead of dropping rows") {
    val path = tmp("strict")
    Seq("""{"id": 1, "s": "ok", "v": 10}""", """not json at all""")
      .toDF("value").coalesce(1).write.text(path)
    val e = intercept[org.apache.spark.SparkException] {
      Formats.readJsonLines(spark, path, ddl).collect()
    }
    assert(e.getMessage.toLowerCase.contains("malformed") ||
      Option(e.getCause).exists(_.getMessage.toLowerCase.contains("malformed")), e.getMessage)
  }

  it("audited read quarantines malformed lines in _corrupt_record, keeps good rows") {
    val path = tmp("quarantine")
    Seq("""{"id": 1, "s": "ok", "v": 10}""",
        """{"id": 2, "s": "also ok"}""",
        """{"id": "NOT A NUMBER", "s": "bad types", "v": 3}""",
        """not json at all""")
      .toDF("value").coalesce(1).write.text(path)
    // Spark refuses queries touching ONLY _corrupt_record straight off the
    // raw files; materialize the parse first (the quarantine pattern does
    // this anyway — parse once, split good/bad from the cached frame)
    val got = Formats.readJsonLinesAudited(spark, path, ddl).cache()
    val good = got.where($"_corrupt_record".isNull)
      .select("id", "s").as[(Long, String)].collect().toSet
    val bad = got.where($"_corrupt_record".isNotNull).count()
    assert(good === Set((1L, "ok"), (2L, "also ok")))
    assert(bad === 2L)
  }

  it("zip archives round-trip members through real files; empty buckets write none") {
    val dir = tmp("zips")
    val rows = (0L until 40L).map(i =>
      (i, s"m/member$i.txt", s"content of member $i — unïcode".getBytes("UTF-8")))
      .toDF("id", "member", "bytes")
    Formats.writeZipFixture(rows, dir, nFiles = 8)
    val got = Formats.readZipMembers(spark, dir)
      .select("member", "bytes").as[(String, Array[Byte])].collect()
      .map { case (m, b) => (m, new String(b, "UTF-8")) }.toSet
    val want = (0L until 40L).map(i =>
      (s"m/member$i.txt", s"content of member $i — unïcode")).toSet
    assert(got === want)
  }

  it("tar.gz archives round-trip members; sizes and unicode survive") {
    val dir = tmp("tars")
    val rows = (0L until 30L).map(i =>
      (i, s"d/doc$i.txt",
        (s"tar member $i ünïcode " + ("x" * (i % 600).toInt)).getBytes("UTF-8")))
      .toDF("id", "member", "bytes")
    Formats.writeTarFixture(rows, dir, nFiles = 4)
    val got = Formats.readTarMembers(spark, dir)
      .select("member", "bytes").as[(String, Array[Byte])].collect()
      .map { case (m, b) => (m, new String(b, "UTF-8")) }.toSet
    val want = (0L until 30L).map(i =>
      (s"d/doc$i.txt", s"tar member $i ünïcode " + ("x" * (i % 600).toInt))).toSet
    assert(got === want)
  }

  it("tar damage stops at the broken header; non-file entries skip") {
    // build one archive, gunzip it, then surgically patch entries
    val dir = tmp("tarpatch")
    val rows = (0L until 3L).map(i =>
      (0L, s"m$i.txt", s"member $i".getBytes("UTF-8"))).toDF("id", "member", "bytes")
    Formats.writeTarFixture(rows, dir, nFiles = 1)
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tar.gz")).head
    val gz = new java.util.zip.GZIPInputStream(new java.io.FileInputStream(f))
    val tar = {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = gz.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = gz.read(buf) }
      gz.close(); out.toByteArray
    }
    // entry k starts at k * 1024 here (9-byte members pad to one block),
    // but which MEMBER landed at entry k is shuffle-order-dependent —
    // discover the actual order from the archive instead of assuming it
    val order = Formats.tarMembers(tar).map(_._1).toList
    assert(order.toSet == Set("m0.txt", "m1.txt", "m2.txt"))
    def recheck(off: Int): Unit = { // recompute the checksum after a patch
      java.util.Arrays.fill(tar, off + 148, off + 156, ' '.toByte)
      var sum = 0L
      (off until off + 512).foreach(i => sum += (tar(i) & 0xff))
      val cs = java.lang.Long.toOctalString(sum)
      val padded = ("0" * (6 - cs.length)) + cs
      System.arraycopy(padded.getBytes("US-ASCII"), 0, tar, off + 148, 6)
      tar(off + 154) = 0; tar(off + 155) = ' '
    }
    // patch entry 1 into a DIRECTORY (typeflag '5', checksum fixed): skipped
    tar(1024 + 156) = '5'; recheck(1024)
    val skipped = Formats.tarMembers(tar).map(_._1).toList
    assert(skipped == List(order(0), order(2)))
    // now BREAK entry 1's checksum: iteration must stop after entry 0
    tar(1024 + 148) = '9'
    val stopped = Formats.tarMembers(tar).map(_._1).toList
    assert(stopped == List(order(0)))
  }

  it("a damaged zip tail keeps the members already read, never an exception") {
    val dir = tmp("zipdmg")
    val rows = (0L until 10L).map(i =>
      (0L, s"m$i.txt", s"member $i".getBytes("UTF-8"))) // one bucket, one file
      .toDF("id", "member", "bytes")
    Formats.writeZipFixture(rows, dir, nFiles = 1)
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".zip")).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    java.nio.file.Files.write(f.toPath, java.util.Arrays.copyOf(bytes, bytes.length / 2))
    val survivors = Formats.readZipMembers(spark, dir).count()
    assert(survivors > 0 && survivors < 10, s"got $survivors")
  }
}
