package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multimodal column handling: opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted per partition.
  *
  * The decode step is a REAL image-header codec (pure JVM, r10 — it
  * replaced the round-1..9 deterministic stub): payloads are genuine
  * PNG / JPEG byte streams (correct signatures, chunk/segment structure,
  * real CRC32 on the PNG IHDR) built from the documents table, and the
  * decoder recovers width/height by parsing that structure — walking
  * JPEG segment markers to SOFn, validating the PNG signature + IHDR
  * chunk + CRC. What the container still lacks is pixel codecs (no
  * libjpeg/libpng), so payload BODIES are the document's utf-8 bytes
  * standing in for compressed pixel data; a real deployment swaps only
  * the body source. The Spark plumbing is the 100 TB media-pipeline
  * shape either way: binary column + typed metadata schema,
  * partition-parallel decode via typed `Dataset.mapPartitions` (one
  * decoder instantiation per partition, as a JNI codec or ONNX session
  * would need), and narrow pipelining (no shuffle).
  */
object Multimodal {

  /** Input: a binary payload + source metadata. */
  final case class Payload(doc_id: Long, payload: Array[Byte],
                           source: String, lang: String)

  /** Decoded header metadata. `b0` is the first BODY byte (after the
    * image header) — proves the parser found the right body offset.
    */
  final case class Meta(doc_id: Long, format: String, width: Int,
                        height: Int, n_bytes: Int, b0: Int)

  /** Image dimensions are derived from the body length so the DuckDB
    * oracle can re-derive them from the text column alone; 509 is prime
    * and keeps both dims within JPEG's 16-bit fields.
    */
  val DimBase = 509

  /** PNG header = 8-byte signature + IHDR chunk (4 len + 4 type +
    * 13 data + 4 crc).
    */
  val PngHeaderLen = 33

  /** JPEG header = SOI(2) + COM segment(6) + SOF0 segment(13) + EOI(2).
    * The COM segment exists to force the decoder to actually walk
    * segments rather than read a fixed offset.
    */
  val JpegHeaderLen = 23

  /** Build a REAL PNG byte stream: signature, IHDR with big-endian dims
    * and a genuine CRC32 over type+data, then `body` as the (stand-in)
    * compressed payload.
    */
  def buildPng(width: Int, height: Int, body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(PngHeaderLen + body.length)
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte), 0, 8)
    val data = new Array[Byte](17) // "IHDR" + 13 data bytes
    "IHDR".getBytes("US-ASCII").copyToArray(data)
    def be32(v: Int, off: Int): Unit = {
      data(off) = (v >>> 24).toByte; data(off + 1) = (v >>> 16).toByte
      data(off + 2) = (v >>> 8).toByte; data(off + 3) = v.toByte
    }
    be32(width, 4); be32(height, 8)
    data(12) = 8 // bit depth
    data(13) = 2 // color type: truecolor
    // compression/filter/interlace = 0
    out.write(Array[Byte](0, 0, 0, 13), 0, 4) // IHDR data length
    out.write(data, 0, 17)
    val crc = new java.util.zip.CRC32
    crc.update(data)
    val c = crc.getValue.toInt
    out.write(Array((c >>> 24).toByte, (c >>> 16).toByte,
      (c >>> 8).toByte, c.toByte), 0, 4)
    out.write(body, 0, body.length)
    out.toByteArray
  }

  /** Build a REAL JPEG byte stream: SOI, a COM segment, SOF0 carrying
    * the dims, EOI, then `body` as trailing (stand-in) entropy data.
    */
  def buildJpeg(width: Int, height: Int, body: Array[Byte]): Array[Byte] = {
    val h = Array[Int](
      0xFF, 0xD8,                   // SOI
      0xFF, 0xFE, 0x00, 0x04, 'g', 'r', // COM segment, len 4
      0xFF, 0xC0, 0x00, 0x0B,       // SOF0, len 11
      0x08,                         // precision
      height >>> 8, height & 0xff,
      width >>> 8, width & 0xff,
      0x01, 0x01, 0x11, 0x00,       // 1 component
      0xFF, 0xD9                    // EOI
    ).map(_.toByte)
    val out = new Array[Byte](h.length + body.length)
    h.copyToArray(out)
    body.copyToArray(out, h.length)
    out
  }

  /** Parse a PNG or JPEG header: detect the format from the signature,
    * then read the dimensions from the IHDR chunk (PNG — CRC-checked) or
    * by walking segment markers to the first SOFn (JPEG). Throws on
    * malformed input — a corrupt blob must fail loudly, not produce
    * garbage dims.
    */
  def decodeImageHeader(b: Array[Byte]): Meta = {
    def u8(i: Int) = b(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int) = (be16(i).toLong << 16 | be16(i + 2)).toInt
    if (b.length >= PngHeaderLen && u8(0) == 0x89 && u8(1) == 'P' &&
        u8(2) == 'N' && u8(3) == 'G') {
      require(be32(8) == 13 && u8(12) == 'I' && u8(13) == 'H' &&
        u8(14) == 'D' && u8(15) == 'R', "PNG: first chunk is not IHDR")
      val crc = new java.util.zip.CRC32
      crc.update(b, 12, 17)
      require(crc.getValue.toInt == be32(29), "PNG: IHDR CRC mismatch")
      Meta(-1, "png", be32(16), be32(20), b.length,
        if (b.length > PngHeaderLen) u8(PngHeaderLen) else -1)
    } else if (b.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
      var i = 2
      while (i + 3 < b.length) {
        require(u8(i) == 0xFF, s"JPEG: expected marker at $i")
        val m = u8(i + 1)
        if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
          // SOFn: [len][precision][height][width]...; body follows EOI
          // in this builder's layout.
          val segEnd = i + 2 + be16(i + 2)
          val bodyOff = segEnd + 2 // skip EOI
          return Meta(-1, "jpeg", be16(i + 7), be16(i + 5), b.length,
            if (b.length > bodyOff) u8(bodyOff) else -1)
        }
        require(m != 0xD9 && m != 0xDA, "JPEG: reached EOI/SOS before SOF")
        i += 2 + be16(i + 2)
      }
      throw new IllegalArgumentException("JPEG: no SOF marker found")
    } else throw new IllegalArgumentException(
      s"unsupported image format (first bytes ${b.take(4).toSeq})")
  }

  /** Decoded pixel statistics — computed over the ACTUAL pixel buffer
    * of an uncompressed image, not its header.
    */
  final case class PixelStats(doc_id: Long, width: Int, height: Int,
                              n_pixels: Long, px_sum: Long, px_min: Int,
                              px_max: Int, px_mean: Double)

  /** Build a REAL binary PPM (P6): `P6`, a comment line (forces the
    * parser to handle comments), ASCII dims + maxval, single whitespace,
    * then 3·w·h raw RGB bytes.
    */
  def buildPpm(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == 3 * width * height,
      s"P6 needs ${3 * width * height} bytes, got ${pixels.length}")
    val header = s"P6\n# graft\n$width $height\n255\n"
      .getBytes("US-ASCII")
    val out = new Array[Byte](header.length + pixels.length)
    header.copyToArray(out)
    pixels.copyToArray(out, header.length)
    out
  }

  /** Decode a P6 PPM END-TO-END: tokenize the header (whitespace- and
    * comment-tolerant, per the netpbm spec), then aggregate the real
    * pixel bytes — sum, min, max, mean. This is the pixel path the
    * PNG/JPEG stand-ins can't offer without native codecs: P6 is
    * uncompressed, so the full decode is pure JVM. Throws on malformed
    * input or a truncated pixel buffer.
    */
  def decodePpm(b: Array[Byte]): PixelStats = {
    var i = 0
    def skipWs(): Unit = {
      var more = true
      while (more && i < b.length) {
        val c = b(i) & 0xff
        if (c == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\n' || c == '\r' || c == '\t') i += 1
        else more = false
      }
    }
    def int(): Int = {
      skipWs()
      var v = 0
      require(i < b.length && (b(i) & 0xff) >= '0' && (b(i) & 0xff) <= '9',
        s"P6: expected integer at $i")
      while (i < b.length && (b(i) & 0xff) >= '0' && (b(i) & 0xff) <= '9') {
        v = v * 10 + (b(i) - '0'); i += 1
      }
      v
    }
    require(b.length >= 2 && b(0) == 'P' && b(1) == '6', "not a P6 PPM")
    i = 2
    val w = int(); val h = int(); val maxval = int()
    require(maxval == 255, s"P6: unsupported maxval $maxval")
    // exactly one whitespace byte before the raster, per spec — verify it
    // IS whitespace, or a CRLF/comment-bearing header would silently shift
    // the raster start and corrupt every statistic downstream.
    require(i < b.length && ((b(i) & 0xff) match {
      case ' ' | '\n' | '\r' | '\t' => true
      case _ => false
    }), s"P6: expected single whitespace before raster at $i, " +
      s"got ${if (i < b.length) (b(i) & 0xff).toString else "EOF"}")
    i += 1
    val n = 3L * w * h
    require(b.length - i >= n, s"P6: raster truncated (${b.length - i} < $n)")
    var sum = 0L
    var min = 255
    var max = 0
    var k = i
    val end = i + n.toInt
    while (k < end) {
      val v = b(k) & 0xff
      sum += v
      if (v < min) min = v
      if (v > max) max = v
      k += 1
    }
    PixelStats(-1, w, h, w.toLong * h, sum, min, max, sum.toDouble / n)
  }

  /** Build P6 images from the documents table (dims from the text's
    * BYTE length as in [[decodeDocuments]]; pixel bytes = the utf-8 text
    * bytes tiled across the raster) and decode them end-to-end,
    * recovering pixel statistics from the ACTUAL raster. The DuckDB
    * oracle re-derives the same statistics from the text column alone
    * (byte sums via hex digits), so this is the one multimodal path
    * whose PIXELS — not just headers — are cross-engine verified.
    */
  def pixelStatsDocuments(spark: SparkSession, docs: DataFrame): DataFrame =
    rasterRoundTrip(spark, docs)((w, h, raster) =>
      decodePpm(buildPpm(w, h, raster)))

  /** The shared payload→raster convention of [[pixelStatsDocuments]]
    * and [[pngPixelStatsDocuments]]: dims from the text's byte length,
    * utf-8 bytes tiled across 3·w·h, then one codec round-trip per
    * document. ONE implementation on purpose — both queries share the
    * same DuckDB oracle, so a tiling tweak in a lone copy would
    * silently break the other's oracle match.
    */
  private def rasterRoundTrip(spark: SparkSession, docs: DataFrame)(
      roundTrip: (Int, Int, Array[Byte]) => PixelStats): DataFrame = {
    import spark.implicits._
    docs
      .selectExpr("doc_id", "encode(text, 'UTF-8') AS payload",
        "source", "lang")
      .as[Payload]
      .mapPartitions { it =>
        // An empty text has no bytes to tile into a raster (t(k % 0)
        // would divide by zero) — skip it rather than rely on callers
        // pre-filtering, so the method is safe on any docs frame.
        it.filter(_.payload.nonEmpty).map { p =>
          val t = p.payload
          val n = t.length
          val w = n % DimBase + 1
          val h = (n / DimBase) % DimBase + 1
          val raster = new Array[Byte](3 * w * h)
          var k = 0
          while (k < raster.length) { raster(k) = t(k % n); k += 1 }
          roundTrip(w, h, raster).copy(doc_id = p.doc_id)
        }
      }
      .toDF()
  }

  /** Decode one payload: real header parse, doc_id threaded through. */
  def decode(p: Payload): Meta =
    decodeImageHeader(p.payload).copy(doc_id = p.doc_id)

  /** Build image payloads from the documents table (even doc_id → PNG,
    * odd → JPEG; dims derived from the text length; utf-8 text bytes as
    * the stand-in body) and run the partition-parallel header decode.
    */
  def decodeDocuments(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs
      .selectExpr("doc_id", "encode(text, 'UTF-8') AS payload",
        "source", "lang")
      .as[Payload]
      .mapPartitions { it =>
        // Per-partition decoder setup would go here (codec/session init).
        it.map { p =>
          val n = p.payload.length
          val w = n % DimBase + 1
          val h = (n / DimBase) % DimBase + 1
          val img = if (p.doc_id % 2 == 0) buildPng(w, h, p.payload)
                    else buildJpeg(w, h, p.payload)
          decode(p.copy(payload = img))
        }
      }
      .toDF()
  }

  // ------------------------------------------- real PNG pixels (r12)

  /** Encode a COMPLETE, spec-conformant PNG: signature, IHDR (8-bit
    * truecolor), one IDAT whose data is the zlib-DEFLATE of the
    * filtered scanlines, and IEND — every chunk CRC32'd. Scanline
    * filters rotate through all five PNG types (None/Sub/Up/Average/
    * Paeth, row i uses i % 5), so decoding exercises the full filter
    * algebra, not just the trivial type 0. PNG's compression layer is
    * zlib (RFC 1950), which `java.util.zip.Deflater` IS — no native
    * codec needed.
    */
  def encodePng(width: Int, height: Int, raster: Array[Byte]): Array[Byte] = {
    require(raster.length == 3 * width * height,
      s"PNG needs ${3 * width * height} raster bytes, got ${raster.length}")
    val bpp = 3
    val stride = bpp * width
    val filtered = new Array[Byte](height * (stride + 1))
    var y = 0
    while (y < height) {
      val ft = y % 5
      filtered(y * (stride + 1)) = ft.toByte
      var x = 0
      while (x < stride) {
        val raw = raster(y * stride + x) & 0xff
        val left = if (x >= bpp) raster(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) raster((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= bpp)
          raster((y - 1) * stride + x - bpp) & 0xff else 0
        val enc = ft match {
          case 0 => raw
          case 1 => raw - left
          case 2 => raw - up
          case 3 => raw - (left + up) / 2
          case 4 => raw - paeth(left, up, ul)
        }
        filtered(y * (stride + 1) + 1 + x) = (enc & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filtered)
    deflater.finish()
    val zbuf = new java.io.ByteArrayOutputStream(filtered.length / 2 + 64)
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) zbuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()

    val out = new java.io.ByteArrayOutputStream(zbuf.size + 64)
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte), 0, 8)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be32(v: Int): Array[Byte] = Array((v >>> 24).toByte,
        (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
      val td = typ.getBytes("US-ASCII") ++ data
      out.write(be32(data.length), 0, 4)
      out.write(td, 0, td.length)
      val crc = new java.util.zip.CRC32
      crc.update(td)
      out.write(be32(crc.getValue.toInt), 0, 4)
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = (width >>> 24).toByte; ihdr(1) = (width >>> 16).toByte
    ihdr(2) = (width >>> 8).toByte; ihdr(3) = width.toByte
    ihdr(4) = (height >>> 24).toByte; ihdr(5) = (height >>> 16).toByte
    ihdr(6) = (height >>> 8).toByte; ihdr(7) = height.toByte
    ihdr(8) = 8; ihdr(9) = 2 // bit depth 8, truecolor
    chunk("IHDR", ihdr)
    chunk("IDAT", zbuf.toByteArray)
    chunk("IEND", Array.empty)
    out.toByteArray
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Decode a PNG END-TO-END: walk the chunks (CRC-verified),
    * zlib-INFLATE the concatenated IDAT data, reverse all five scanline
    * filter types, and aggregate the reconstructed pixel bytes. Only
    * the planted profile (8-bit truecolor, non-interlaced) is in scope
    * — anything else fails loudly rather than mis-decoding.
    */
  def decodePngPixels(b: Array[Byte]): PixelStats = {
    require(b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' &&
      b(2) == 'N' && b(3) == 'G', "not a PNG")
    def be32(i: Int): Int =
      ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
        ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
    var i = 8
    var w = 0; var h = 0
    val idat = new java.io.ByteArrayOutputStream()
    while (i + 8 <= b.length) {
      val len = be32(i)
      val typ = new String(b, i + 4, 4, "US-ASCII")
      require(i + 8 + len + 4 <= b.length, s"PNG: truncated chunk $typ")
      val crc = new java.util.zip.CRC32
      crc.update(b, i + 4, 4 + len)
      require(crc.getValue.toInt == be32(i + 8 + len),
        s"PNG: $typ CRC mismatch")
      typ match {
        case "IHDR" =>
          w = be32(i + 8); h = be32(i + 12)
          require((b(i + 16) & 0xff) == 8 && (b(i + 17) & 0xff) == 2 &&
            (b(i + 20) & 0xff) == 0,
            "PNG: only 8-bit truecolor non-interlaced is in scope")
        case "IDAT" => idat.write(b, i + 8, len)
        case _ => () // IEND / ancillary
      }
      i += 12 + len
    }
    require(w > 0 && h > 0 && idat.size > 0, "PNG: missing IHDR/IDAT")
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    val bpp = 3
    val stride = bpp * w
    val lines = new Array[Byte](h * (stride + 1))
    var off = 0
    while (!inflater.finished() && off < lines.length) {
      val k = inflater.inflate(lines, off, lines.length - off)
      // A truncated deflate stream (the IDAT CRC only covers the bytes
      // PRESENT, so it passes) makes inflate() return 0 forever once
      // input is exhausted — fail loudly instead of spinning.
      require(k > 0, s"PNG: deflate stream truncated at $off of " +
        s"${lines.length} scanline bytes")
      off += k
    }
    inflater.end()
    require(off == lines.length,
      s"PNG: inflated $off of ${lines.length} scanline bytes")

    val recon = new Array[Byte](h * stride)
    var sum = 0L; var min = 255; var max = 0
    var y = 0
    while (y < h) {
      val ft = lines(y * (stride + 1)) & 0xff
      var x = 0
      while (x < stride) {
        val enc = lines(y * (stride + 1) + 1 + x) & 0xff
        val left = if (x >= bpp) recon(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) recon((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= bpp)
          recon((y - 1) * stride + x - bpp) & 0xff else 0
        val raw = ft match {
          case 0 => enc
          case 1 => enc + left
          case 2 => enc + up
          case 3 => enc + (left + up) / 2
          case 4 => enc + paeth(left, up, ul)
          case other =>
            throw new IllegalArgumentException(s"PNG: filter $other")
        }
        val v = raw & 0xff
        recon(y * stride + x) = v.toByte
        sum += v
        if (v < min) min = v
        if (v > max) max = v
        x += 1
      }
      y += 1
    }
    val n = h.toLong * stride
    PixelStats(-1, w, h, w.toLong * h, sum, min, max, sum.toDouble / n)
  }

  /** Real-PNG pixel statistics over the documents table: the raster is
    * the utf-8 text bytes tiled across 3·w·h (identical to
    * [[pixelStatsDocuments]]'s PPM raster, so the same oracle verifies
    * both), but the payload is a COMPRESSED, filtered, CRC'd PNG —
    * encode and decode both run inside the partition, end to end, on
    * the JVM's own zlib. This closes the last stand-in asterisk on the
    * multimodal family: the bytes crossing the "decoder" here are a
    * genuine image codec stream, not a header stapled to raw text.
    */
  def pngPixelStatsDocuments(spark: SparkSession,
                             docs: DataFrame): DataFrame =
    rasterRoundTrip(spark, docs)((w, h, raster) =>
      decodePngPixels(encodePng(w, h, raster)))
}
