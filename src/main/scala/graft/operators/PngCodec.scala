package graft.operators

/** Hand-rolled baseline PNG codec — public format (RFC 2083 / the W3C
  * PNG spec), pure JVM: chunk framing with CRC-32, zlib via
  * `java.util.zip.Inflater`/`Deflater`, and the five scanline filters
  * (None/Sub/Up/Average/Paeth) in both directions. Same pattern as
  * the BMP/WAV/xlsx codecs: small but REAL, so the image pipeline
  * ([[Multimodal.decodeImageStats]], dHash, resize) applies to actual
  * web-corpus bytes, not just the synthesized BMP fixtures.
  *
  * Decoder coverage: 8-bit depth, color types 0 (grayscale), 2 (RGB),
  * 3 (palette), 4 (gray+alpha), 6 (RGBA), non-interlaced — the
  * overwhelming majority of web PNGs. Alpha is dropped (the stats/
  * dhash pipeline consumes opaque pixels); 16-bit and Adam7 are
  * refused loudly, never mis-decoded. Output is row-major top-down
  * BGR — the exact contract [[Multimodal.decodeBmp]] returns, so
  * every downstream consumer composes across both containers.
  *
  * Encoder: color type 2 (RGB), 8-bit, one IDAT, per-row ADAPTIVE
  * filter selection by the spec's minimum-sum-of-absolute-differences
  * heuristic — which also means the round-trip spec exercises every
  * defilter path with real, compressible data.
  */
object PngCodec {

  private val Signature =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private def crc32(parts: Array[Byte]*): Int = {
    val c = new java.util.zip.CRC32()
    parts.foreach(p => c.update(p))
    c.getValue.toInt
  }

  private def chunk(out: java.io.ByteArrayOutputStream, tag: String,
      body: Array[Byte]): Unit = {
    val len = java.nio.ByteBuffer.allocate(4).putInt(body.length).array
    val tagB = tag.getBytes("US-ASCII")
    out.write(len)
    out.write(tagB)
    out.write(body)
    out.write(java.nio.ByteBuffer.allocate(4)
      .putInt(crc32(tagB, body)).array)
  }

  /** Paeth predictor — the spec's exact tie-breaking order (left,
    * above, upper-left).
    */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode top-down row-major BGR pixels as an 8-bit truecolor PNG
    * with per-row adaptive filtering.
    */
  def encodePng(bgr: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0 && bgr.length == width * height * 3,
      s"bad dimensions: $width x $height for ${bgr.length} bytes")
    val bpp = 3
    val stride = width * bpp
    // raw scanlines in RGB byte order (the PNG pixel order)
    val raw = new Array[Byte](height * stride)
    var k = 0
    while (k < width * height) {
      raw(3 * k) = bgr(3 * k + 2)     // R
      raw(3 * k + 1) = bgr(3 * k + 1) // G
      raw(3 * k + 2) = bgr(3 * k)     // B
      k += 1
    }
    val filtered = new java.io.ByteArrayOutputStream()
    val cand = Array.ofDim[Byte](5, stride)
    var y = 0
    while (y < height) {
      def cur(i: Int): Int = raw(y * stride + i) & 0xff
      def left(i: Int): Int = if (i >= bpp) cur(i - bpp) else 0
      def up(i: Int): Int = if (y > 0) raw((y - 1) * stride + i) & 0xff else 0
      def upLeft(i: Int): Int =
        if (y > 0 && i >= bpp) raw((y - 1) * stride + i - bpp) & 0xff else 0
      var i = 0
      while (i < stride) {
        val x = cur(i)
        cand(0)(i) = x.toByte
        cand(1)(i) = (x - left(i)).toByte
        cand(2)(i) = (x - up(i)).toByte
        cand(3)(i) = (x - (left(i) + up(i)) / 2).toByte
        cand(4)(i) = (x - paeth(left(i), up(i), upLeft(i))).toByte
        i += 1
      }
      // minimum sum of absolute values (bytes as signed) — the spec's
      // recommended heuristic
      var best = 0
      var bestSum = Long.MaxValue
      var f = 0
      while (f < 5) {
        var s = 0L
        var j = 0
        while (j < stride) { s += math.abs(cand(f)(j).toInt); j += 1 }
        if (s < bestSum) { bestSum = s; best = f }
        f += 1
      }
      filtered.write(best)
      filtered.write(cand(best))
      y += 1
    }
    val deflater = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(filtered.toByteArray)
    deflater.finish()
    val idat = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished())
      idat.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor RGB
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate/adaptive/none
      .array
    chunk(out, "IHDR", ihdr)
    chunk(out, "IDAT", idat.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decode a baseline PNG to (width, height, row-major top-down BGR)
    * — the [[Multimodal.decodeBmp]] contract. Validates the
    * signature, IHDR fields and every chunk CRC; concatenates all
    * IDAT chunks; inflates; defilters; maps each supported color type
    * onto opaque BGR.
    */
  def decodePng(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(isPng(bytes), "not a PNG payload")
    var pos = 8
    var width = 0
    var height = 0
    var colorType = -1
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd) {
      require(pos + 8 <= bytes.length, "truncated chunk header")
      val len = java.nio.ByteBuffer.wrap(bytes, pos, 4).getInt
      // Long arithmetic: an adversarial len near Int.MaxValue would
      // overflow the Int sum and slip past the bound
      require(len >= 0 && pos.toLong + 12L + len <= bytes.length,
        s"truncated chunk body (len=$len at $pos)")
      val tag = new String(bytes, pos + 4, 4, "US-ASCII")
      val crc = java.nio.ByteBuffer.wrap(bytes, pos + 8 + len, 4).getInt
      val c = new java.util.zip.CRC32()
      c.update(bytes, pos + 4, 4 + len)
      require(c.getValue.toInt == crc, s"bad CRC on $tag chunk")
      tag match {
        case "IHDR" =>
          require(len == 13, s"bad IHDR length $len")
          val b = java.nio.ByteBuffer.wrap(bytes, pos + 8, 13)
          width = b.getInt
          height = b.getInt
          val depth = b.get() & 0xff
          colorType = b.get() & 0xff
          val compression = b.get() & 0xff
          val filterMethod = b.get() & 0xff
          val interlace = b.get() & 0xff
          require(width > 0 && height > 0, s"bad dims $width x $height")
          require(depth == 8,
            s"unsupported bit depth $depth (baseline decoder is 8-bit)")
          require(Set(0, 2, 3, 4, 6).contains(colorType),
            s"unsupported color type $colorType")
          require(compression == 0 && filterMethod == 0,
            "non-deflate compression or non-zero filter method")
          require(interlace == 0, "Adam7 interlacing unsupported")
        case "PLTE" =>
          require(len % 3 == 0, s"bad PLTE length $len")
          palette = java.util.Arrays.copyOfRange(bytes, pos + 8,
            pos + 8 + len)
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks (tEXt, gAMA, ...) skip clean
      }
      pos += 12 + len
    }
    require(colorType >= 0, "missing IHDR")
    require(idat.size > 0, "missing IDAT")
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    }
    if (colorType == 3) require(palette != null, "palette image, no PLTE")
    val stride = width * channels
    val raw = new Array[Byte]((stride + 1) * height)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    var off = 0
    while (off < raw.length && !inflater.finished()) {
      val n = inflater.inflate(raw, off, raw.length - off)
      // zero progress without completion is ALWAYS fatal: a truncated
      // stream (needsInput) or an FDICT preset-dictionary header
      // (needsDictionary) would otherwise spin this loop forever on
      // an executor instead of failing the row loudly
      if (n == 0 && !inflater.finished())
        sys.error(
          if (inflater.needsDictionary)
            "preset-dictionary (FDICT) zlib streams unsupported"
          else "truncated IDAT stream")
      off += n
    }
    inflater.end()
    require(off == raw.length,
      s"IDAT inflated to $off bytes, expected ${raw.length}")
    // defilter in place into a packed scanline buffer
    val px = new Array[Byte](stride * height)
    val bpp = channels
    var y = 0
    while (y < height) {
      val filter = raw(y * (stride + 1)) & 0xff
      val rowOff = y * (stride + 1) + 1
      val outOff = y * stride
      def left(i: Int): Int =
        if (i >= bpp) px(outOff + i - bpp) & 0xff else 0
      def up(i: Int): Int =
        if (y > 0) px(outOff - stride + i) & 0xff else 0
      def upLeft(i: Int): Int =
        if (y > 0 && i >= bpp) px(outOff - stride + i - bpp) & 0xff else 0
      var i = 0
      filter match {
        case 0 =>
          System.arraycopy(raw, rowOff, px, outOff, stride)
        case 1 => while (i < stride) {
            px(outOff + i) = ((raw(rowOff + i) & 0xff) + left(i)).toByte
            i += 1
          }
        case 2 => while (i < stride) {
            px(outOff + i) = ((raw(rowOff + i) & 0xff) + up(i)).toByte
            i += 1
          }
        case 3 => while (i < stride) {
            px(outOff + i) =
              ((raw(rowOff + i) & 0xff) + (left(i) + up(i)) / 2).toByte
            i += 1
          }
        case 4 => while (i < stride) {
            px(outOff + i) = ((raw(rowOff + i) & 0xff) +
              paeth(left(i), up(i), upLeft(i))).toByte
            i += 1
          }
        case f => sys.error(s"invalid filter type $f on row $y")
      }
      y += 1
    }
    // map to opaque BGR
    val out = new Array[Byte](width * height * 3)
    var k = 0
    val npx = width * height
    colorType match {
      case 0 => while (k < npx) { // grayscale
          val v = px(k)
          out(3 * k) = v; out(3 * k + 1) = v; out(3 * k + 2) = v
          k += 1
        }
      case 2 => while (k < npx) { // RGB -> BGR
          out(3 * k) = px(3 * k + 2)
          out(3 * k + 1) = px(3 * k + 1)
          out(3 * k + 2) = px(3 * k)
          k += 1
        }
      case 3 => while (k < npx) { // palette index -> RGB -> BGR
          val idx = px(k) & 0xff
          require(3 * idx + 2 < palette.length,
            s"palette index $idx out of range")
          out(3 * k) = palette(3 * idx + 2)
          out(3 * k + 1) = palette(3 * idx + 1)
          out(3 * k + 2) = palette(3 * idx)
          k += 1
        }
      case 4 => while (k < npx) { // gray+alpha, alpha dropped
          val v = px(2 * k)
          out(3 * k) = v; out(3 * k + 1) = v; out(3 * k + 2) = v
          k += 1
        }
      case 6 => while (k < npx) { // RGBA, alpha dropped
          out(3 * k) = px(4 * k + 2)
          out(3 * k + 1) = px(4 * k + 1)
          out(3 * k + 2) = px(4 * k)
          k += 1
        }
    }
    (width, height, out)
  }

  /** True iff the payload starts with the 8-byte PNG signature. */
  def isPng(bytes: Array[Byte]): Boolean =
    bytes.length > 8 && Signature.indices.forall(i =>
      bytes(i) == Signature(i))
}
