package graft.multimodal

import graft.SparkSuite
import org.scalatest.funsuite.AnyFunSuite

class GifSpec extends AnyFunSuite with SparkSuite {

  private def grayPalette: Array[Int] =
    Array.tabulate(256)(i => (i << 16) | (i << 8) | i)

  private def closedForm(w: Int, h: Int, seed: Long): Array[Byte] =
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      (((x + 2L * y + seed) % 256) & 0xff).toByte
    }

  private def assertPixels(img: Gif.GifImage, w: Int, h: Int, seed: Long): Unit = {
    assert((img.width, img.height) == (w, h))
    for (y <- 0 until h; x <- 0 until w) {
      val v = ((x + 2L * y + seed) % 256).toInt
      assert(img.pixel(x, y) == ((v, v, v)), s"pixel ($x,$y) seed $seed")
    }
  }

  test("synthetic GIFs round-trip the closed form exactly") {
    // 1x1 (single literal), odd small, and q206's geometry family
    for ((w, h, seed) <- Seq((1, 1, 0L), (3, 5, 7L), (8, 8, 1L), (23, 15, 42L)))
      assertPixels(Gif.decode(Gif.syntheticGifImage(w, h, seed)).get, w, h, seed)
  }

  test("a large image drives the dictionary to the 12-bit ceiling and resets") {
    // 256x64 = 16384 pixels: the LZW table certainly fills (4096 entries),
    // forcing the encoder's clear-reset branch and the decoder's matching
    // reset — an exact round-trip proves the width/reset pairing
    val (w, h, seed) = (256, 64, 9L)
    assertPixels(Gif.decode(Gif.syntheticGifImage(w, h, seed)).get, w, h, seed)
  }

  test("a constant image exercises the KwKwK self-referencing code path") {
    val indices = Array.fill(16 * 16)(42.toByte)
    val img = Gif.decode(Gif.encode(16, 16, indices, grayPalette)).get
    for (y <- 0 until 16; x <- 0 until 16) assert(img.pixel(x, y) == ((42, 42, 42)))
  }

  test("an interlaced GIF deinterlaces to the same raster") {
    val (w, h, seed) = (10, 13, 3L)
    val raster = closedForm(w, h, seed)
    // feed rows in the 4-pass interlace order, then set the interlace flag
    val passRows = Seq((0, 8), (4, 8), (2, 4), (1, 2))
      .flatMap { case (s0, st) => s0 until h by st }
    val interleaved = new Array[Byte](w * h)
    passRows.zipWithIndex.foreach { case (srcY, k) =>
      System.arraycopy(raster, srcY * w, interleaved, k * w, w)
    }
    val bytes = Gif.encode(w, h, interleaved, grayPalette)
    val descPacked = 6 + 7 + 768 + 9 // last byte of the image descriptor
    bytes(descPacked) = (bytes(descPacked) | 0x40).toByte
    assertPixels(Gif.decode(bytes).get, w, h, seed)
  }

  test("low min-code-size LZW round-trips (4-color stream)") {
    val indices = Array.tabulate(200)(i => ((i * 7 + i / 3) % 4).toByte)
    val decoded = Gif.lzwDecode(Gif.lzwEncode(indices, 2), 2, indices.length)
    assert(decoded.get.toSeq == indices.toSeq)
  }

  test("damage decodes to None, never to wrong pixels") {
    val good = Gif.syntheticGifImage(9, 7, 5L)
    assert(Gif.decode(good.dropRight(8)).isEmpty) // truncated LZW stream
    assert(Gif.decode(good.take(13)).isEmpty) // header only
    assert(Gif.decode("GIF89a".getBytes("US-ASCII")).isEmpty)
    assert(Gif.decode(Array[Byte]()).isEmpty)
    // no color table anywhere: spec-invalid for rendering, must refuse
    val noGct = good.clone()
    noGct(10) = (noGct(10) & 0x7f).toByte // clear the GCT flag
    assert(Gif.decode(noGct).isEmpty)
  }

  test("dims sniffs the logical screen without decoding") {
    assert(Gif.dims(Gif.syntheticGifImage(23, 15, 1L)).contains((23L, 15L)))
    assert(Gif.dims("notagif".getBytes("US-ASCII")).isEmpty)
  }

  test("resize samples the index raster and re-encodes losslessly") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val blobs = Seq((1L, Gif.syntheticGifImage(20, 10, 4L)))
      .toDF("doc_id", "blob")
    val resized = Media.resize(blobs, "doc_id", "blob", 5, 4)
    val row = resized.select("kind", "resized").as[(String, Array[Byte])].head()
    assert(row._1 == "gif")
    val img = Gif.decode(row._2).get
    // the q147 sampling grid, replayed on the source closed form
    for (y <- 0 until 4; x <- 0 until 5) {
      val sx = x * 20 / 5; val sy = y * 10 / 4
      val v = ((sx + 2L * sy + 4L) % 256).toInt
      assert(img.pixel(x, y) == ((v, v, v)))
    }
    val means = Media.pixelMeans(blobs, "doc_id", "blob")
      .select(col("width"), col("height")).as[(Long, Long)].head()
    assert(means == ((20L, 10L)))
  }

  test("perceptual hash is encoding-invariant across interlaced/progressive forms") {
    import spark.implicits._
    val (w, h, seed) = (16, 16, 8L)
    val plain = Gif.syntheticGifImage(w, h, seed)
    val raster = closedForm(w, h, seed)
    val passRows = Seq((0, 8), (4, 8), (2, 4), (1, 2))
      .flatMap { case (s0, st) => s0 until h by st }
    val interleaved = new Array[Byte](w * h)
    passRows.zipWithIndex.foreach { case (srcY, k) =>
      System.arraycopy(raster, srcY * w, interleaved, k * w, w)
    }
    val inter = Gif.encode(w, h, interleaved, grayPalette)
    val descPacked = 6 + 7 + 768 + 9
    inter(descPacked) = (inter(descPacked) | 0x40).toByte
    val hashes = Media.perceptualHash(
      Seq((1L, plain), (2L, inter)).toDF("doc_id", "blob"), "doc_id", "blob")
      .select("kind", "phash").as[(String, Long)].collect().toSeq
    assert(hashes.map(_._1) == Seq("gif", "gif"))
    assert(hashes(0)._2 == hashes(1)._2)
  }
}
