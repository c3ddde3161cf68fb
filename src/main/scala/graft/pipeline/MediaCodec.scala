package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM codecs for two real public media formats — 24-bit
  * uncompressed BMP (Windows BITMAPINFOHEADER) and 16-bit PCM mono WAV
  * (RIFF) — the genuine decode step behind the multimodal pipeline seam
  * (Multimodal): no codec dependency, byte-exact, executor-side.
  *
  * Both formats are handled for real: BMP rows are 4-byte padded and
  * stored bottom-up (top-down when height < 0), pixels are BGR; WAV is
  * parsed by walking RIFF chunks (unknown chunks skipped, word-aligned)
  * to find `fmt ` and `data`. Encoders exist so fixtures are genuine
  * binaries produced and consumed by the same public layout.
  */
object MediaCodec {

  // --- BMP (24bpp, BI_RGB) ---

  /** Encode a width×height image; `pixel(x, y)` returns packed 0xRRGGBB
    * with (0,0) the TOP-left corner. */
  def encodeBmp(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims $width x $height")
    val rowBytes = width * 3
    val pad = (4 - rowBytes % 4) % 4
    val imageSize = (rowBytes + pad) * height
    val fileSize = 54 + imageSize
    val b = ByteBuffer.allocate(fileSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putShort(0).putShort(0).putInt(54) // reserved, data offset
    b.putInt(40).putInt(width).putInt(height) // positive height = bottom-up
      .putShort(1).putShort(24).putInt(0).putInt(imageSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1 // bottom-up row order
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val p = pixel(x, y)
        b.put((p & 0xFF).toByte)          // B
        b.put(((p >> 8) & 0xFF).toByte)   // G
        b.put(((p >> 16) & 0xFF).toByte)  // R
        x += 1
      }
      var i = 0
      while (i < pad) { b.put(0.toByte); i += 1 }
      y -= 1
    }
    b.array()
  }

  /** Decoded image: packed 0xRRGGBB pixels, row-major, TOP-down. */
  final case class Bmp(width: Int, height: Int, pixels: Array[Int]) {
    def pixel(x: Int, y: Int): Int = pixels(y * width + x)
  }

  def decodeBmp(bytes: Array[Byte]): Bmp = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 54 && b.get(0) == 'B' && b.get(1) == 'M',
      "not a BMP: bad magic")
    val dataOffset = b.getInt(10)
    val headerSize = b.getInt(14)
    require(headerSize >= 40, s"unsupported BMP header size $headerSize")
    val width = b.getInt(18)
    val rawHeight = b.getInt(22)
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    val bpp = b.getShort(28).toInt
    val compression = b.getInt(30)
    require(bpp == 24, s"unsupported BMP bpp $bpp (24 only)")
    require(compression == 0, s"unsupported BMP compression $compression")
    val rowBytes = width * 3
    val stride = rowBytes + (4 - rowBytes % 4) % 4
    val out = new Array[Int](width * height)
    var row = 0
    while (row < height) {
      // file rows run bottom-up unless height was negative
      val y = if (topDown) row else height - 1 - row
      val base = dataOffset + row * stride
      var x = 0
      while (x < width) {
        val i = base + x * 3
        out(y * width + x) = ((bytes(i + 2) & 0xFF) << 16) |
          ((bytes(i + 1) & 0xFF) << 8) | (bytes(i) & 0xFF)
        x += 1
      }
      row += 1
    }
    Bmp(width, height, out)
  }

  // --- WAV (RIFF, PCM 16-bit mono) ---

  def encodeWavPcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataBytes = samples.length * 2
    val b = ByteBuffer.allocate(44 + dataBytes).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + dataBytes).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16)
      .putShort(1)             // PCM
      .putShort(1)             // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)  // byte rate
      .putShort(2)             // block align
      .putShort(16)            // bits per sample
    b.put("data".getBytes).putInt(dataBytes)
    samples.foreach(b.putShort)
    b.array()
  }

  final case class Wav(sampleRate: Int, samples: Array[Short])

  def decodeWavPcm16(bytes: Array[Byte]): Wav = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    require(bytes.length >= 12 && fourcc(0) == "RIFF" && fourcc(8) == "WAVE",
      "not a WAV: bad RIFF/WAVE magic")
    var off = 12
    var rate = -1
    var samples: Array[Short] = null
    while (off + 8 <= bytes.length && (rate < 0 || samples == null)) {
      val id = fourcc(off)
      val size = b.getInt(off + 4)
      id match {
        case "fmt " =>
          val fmt = b.getShort(off + 8).toInt
          val channels = b.getShort(off + 10).toInt
          val bits = b.getShort(off + 22).toInt
          require(fmt == 1, s"unsupported WAV format $fmt (PCM only)")
          require(channels == 1, s"unsupported WAV channels $channels (mono only)")
          require(bits == 16, s"unsupported WAV bits $bits (16 only)")
          rate = b.getInt(off + 12)
        case "data" =>
          val n = size / 2
          samples = Array.tabulate(n)(i => b.getShort(off + 8 + 2 * i))
        case _ => // skip unknown chunk
      }
      off += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    require(rate > 0, "WAV missing fmt chunk")
    require(samples != null, "WAV missing data chunk")
    Wav(rate, samples)
  }
}
