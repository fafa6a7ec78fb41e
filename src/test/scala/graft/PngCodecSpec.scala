package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, PngCodec}

/** Hand-rolled baseline PNG codec: round-trip identity (which, with
  * the encoder's adaptive per-row filter selection, exercises every
  * defilter path on real data), hand-built fixtures for each
  * supported color type, loud refusal of unsupported variants, and
  * container-equivalence — the SAME pixels through BMP and PNG must
  * produce identical downstream stats/dhash.
  */
class PngCodecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rng(seed: Long) = new scala.util.Random(seed)

  test("encode/decode round-trip is pixel-identical across image " +
      "shapes and content classes (adaptive filters cover all five)") {
    val r = rng(42)
    val shapes = Seq((1, 1), (3, 7), (8, 8), (17, 5), (64, 48))
    for ((w, h) <- shapes) {
      // three content classes steering the adaptive filter heuristic
      // to different choices: noise (None wins), horizontal gradients
      // (Sub), vertical gradients (Up/Paeth)
      val noise = Array.fill[Byte](w * h * 3)(r.nextInt(256).toByte)
      val horiz = Array.tabulate[Byte](w * h * 3)(i =>
        ((i / 3 % w) * 5 % 256).toByte)
      val vert = Array.tabulate[Byte](w * h * 3)(i =>
        ((i / 3 / w) * 11 % 256).toByte)
      for (px <- Seq(noise, horiz, vert)) {
        val bytes = PngCodec.encodePng(px, w, h)
        val (gw, gh, gpx) = PngCodec.decodePng(bytes)
        assert((gw, gh) == (w, h))
        assert(gpx.toSeq == px.toSeq, s"round-trip drift at ${w}x$h")
      }
    }
  }

  // hand-build a PNG of arbitrary color type with per-row filter 0,
  // so the color-type mapping paths are pinned independently of the
  // encoder (which only emits type 2)
  private def rawPng(w: Int, h: Int, colorType: Int, depth: Int,
      scanlines: Array[Byte], plte: Option[Array[Byte]] = None,
      interlace: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G',
      0x0d, 0x0a, 0x1a, 0x0a))
    def chunk(tag: String, body: Array[Byte]): Unit = {
      out.write(java.nio.ByteBuffer.allocate(4).putInt(body.length).array)
      val tb = tag.getBytes("US-ASCII")
      out.write(tb)
      out.write(body)
      val c = new java.util.zip.CRC32()
      c.update(tb); c.update(body)
      out.write(java.nio.ByteBuffer.allocate(4)
        .putInt(c.getValue.toInt).array)
    }
    chunk("IHDR", java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(depth.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(interlace.toByte).array)
    plte.foreach(chunk("PLTE", _))
    val d = new java.util.zip.Deflater()
    d.setInput(scanlines); d.finish()
    val idat = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) idat.write(buf, 0, d.deflate(buf))
    d.end()
    chunk("IDAT", idat.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  test("grayscale, palette, gray+alpha and RGBA color types all map " +
      "onto opaque BGR correctly") {
    // 2x2 grayscale: values 10,20,30,40 -> B=G=R=v
    val gray = rawPng(2, 2, 0, 8,
      Array[Byte](0, 10, 20, 0, 30, 40))
    val (_, _, gpx) = PngCodec.decodePng(gray)
    assert(gpx.toSeq == Seq[Byte](10, 10, 10, 20, 20, 20,
      30, 30, 30, 40, 40, 40))
    // 2x1 palette: entries (255,0,0) red and (0,0,255) blue; indices
    // 0,1 -> BGR rows (0,0,255) then (255,0,0)
    val pal = rawPng(2, 1, 3, 8, Array[Byte](0, 0, 1),
      plte = Some(Array[Byte](255.toByte, 0, 0, 0, 0, 255.toByte)))
    val (_, _, ppx) = PngCodec.decodePng(pal)
    assert(ppx.toSeq == Seq[Byte](0, 0, 255.toByte, 255.toByte, 0, 0))
    // 1x1 gray+alpha (v=77, a=128): alpha dropped
    val ga = rawPng(1, 1, 4, 8, Array[Byte](0, 77, 128.toByte))
    assert(PngCodec.decodePng(ga)._3.toSeq == Seq[Byte](77, 77, 77))
    // 1x1 RGBA (1,2,3,200): alpha dropped, BGR order
    val rgba = rawPng(1, 1, 6, 8,
      Array[Byte](0, 1, 2, 3, 200.toByte))
    assert(PngCodec.decodePng(rgba)._3.toSeq == Seq[Byte](3, 2, 1))
  }

  test("unsupported variants and corruption fail loudly, never " +
      "mis-decode") {
    val good = PngCodec.encodePng(Array[Byte](1, 2, 3), 1, 1)
    // 16-bit depth refused
    intercept[Exception] {
      PngCodec.decodePng(rawPng(1, 1, 0, 16, Array[Byte](0, 0, 1)))
    }
    // Adam7 refused
    intercept[Exception] {
      PngCodec.decodePng(rawPng(1, 1, 0, 8, Array[Byte](0, 1),
        interlace = 1))
    }
    // flipped bit in IDAT body -> CRC failure
    val corrupt = good.clone()
    corrupt(good.length - 20) = (corrupt(good.length - 20) ^ 0x40).toByte
    intercept[Exception] { PngCodec.decodePng(corrupt) }
    // truncation
    intercept[Exception] {
      PngCodec.decodePng(java.util.Arrays.copyOf(good, good.length - 6))
    }
    // not a PNG at all
    intercept[Exception] { PngCodec.decodePng("plain text".getBytes) }
    assert(!PngCodec.isPng("BMnope".getBytes))
    // an FDICT (preset-dictionary) zlib stream must FAIL, not spin
    // the inflate loop forever
    val d = new java.util.zip.Deflater()
    d.setDictionary("somedict".getBytes("US-ASCII"))
    d.setInput(Array[Byte](0, 1, 2, 3)) // 1x1 RGB scanline
    d.finish()
    val idat = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](256)
    while (!d.finished()) idat.write(buf, 0, d.deflate(buf))
    d.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G',
      0x0d, 0x0a, 0x1a, 0x0a))
    def chunk(tag: String, body: Array[Byte]): Unit = {
      out.write(java.nio.ByteBuffer.allocate(4).putInt(body.length).array)
      val tb = tag.getBytes("US-ASCII")
      out.write(tb); out.write(body)
      val c = new java.util.zip.CRC32()
      c.update(tb); c.update(body)
      out.write(java.nio.ByteBuffer.allocate(4)
        .putInt(c.getValue.toInt).array)
    }
    chunk("IHDR", java.nio.ByteBuffer.allocate(13).putInt(1).putInt(1)
      .put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array)
    chunk("IDAT", idat.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    val e = intercept[Exception] { PngCodec.decodePng(out.toByteArray) }
    assert(e.getMessage.contains("FDICT") ||
      e.getMessage.contains("truncated"), e.getMessage)
  }

  test("container equivalence: the same fixture pixels through BMP " +
      "and PNG yield identical image stats, dhash and resized stats") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "x")).toDF("doc_id", "text")
    val viaBmp = Multimodal.decodeImageStats(
      Multimodal.synthesizeBmp(docs, "doc_id", "text"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val viaPng = Multimodal.decodeImageStats(
      Multimodal.synthesizePng(docs, "doc_id", "text"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(viaBmp == viaPng)
    val dhBmp = Multimodal.imageDhashes(
      Multimodal.synthesizeBmp(docs, "doc_id", "text"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val dhPng = Multimodal.imageDhashes(
      Multimodal.synthesizePng(docs, "doc_id", "text"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(dhBmp.toSeq == dhPng.toSeq)
    // resize preserves the container and the stats agree across both
    val rsBmp = Multimodal.decodeImageStats(Multimodal.resizeTable(
      Multimodal.synthesizeBmp(docs, "doc_id", "text"), 5, 4))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val rsPng = Multimodal.decodeImageStats(Multimodal.resizeTable(
      Multimodal.synthesizePng(docs, "doc_id", "text"), 5, 4))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(rsBmp == rsPng)
    // and the resized PNG payload is still a PNG
    val resized = Multimodal.resizeTable(
      Multimodal.synthesizePng(docs, "doc_id", "text"), 5, 4)
      .select("payload").head().getAs[Array[Byte]](0)
    assert(PngCodec.isPng(resized))
  }

  test("a PNG from the adaptive encoder survives a decode by shape " +
      "alone: IDAT split across chunks and ancillary chunks skip clean") {
    val px = Array.tabulate[Byte](6 * 4 * 3)(i => (i * 13 % 256).toByte)
    val whole = PngCodec.encodePng(px, 6, 4)
    // re-frame: split the IDAT into two chunks and inject a tEXt
    // chunk between them — readers must concatenate IDATs and skip
    // ancillary chunks
    def readChunks(b: Array[Byte]): Seq[(String, Array[Byte])] = {
      var pos = 8
      val out = Seq.newBuilder[(String, Array[Byte])]
      while (pos < b.length) {
        val len = java.nio.ByteBuffer.wrap(b, pos, 4).getInt
        val tag = new String(b, pos + 4, 4, "US-ASCII")
        out += ((tag, java.util.Arrays.copyOfRange(b, pos + 8,
          pos + 8 + len)))
        pos += 12 + len
      }
      out.result()
    }
    val chunks = readChunks(whole)
    val idat = chunks.find(_._1 == "IDAT").get._2
    val (a, b) = idat.splitAt(idat.length / 2)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G',
      0x0d, 0x0a, 0x1a, 0x0a))
    def chunk(tag: String, body: Array[Byte]): Unit = {
      out.write(java.nio.ByteBuffer.allocate(4).putInt(body.length).array)
      val tb = tag.getBytes("US-ASCII")
      out.write(tb); out.write(body)
      val c = new java.util.zip.CRC32()
      c.update(tb); c.update(body)
      out.write(java.nio.ByteBuffer.allocate(4)
        .putInt(c.getValue.toInt).array)
    }
    chunk("IHDR", chunks.find(_._1 == "IHDR").get._2)
    chunk("IDAT", a)
    chunk("tEXt", "Comment hello".getBytes("US-ASCII"))
    chunk("IDAT", b)
    chunk("IEND", Array.emptyByteArray)
    val (w, h, got) = PngCodec.decodePng(out.toByteArray)
    assert((w, h) == (6, 4) && got.toSeq == px.toSeq)
  }
}
