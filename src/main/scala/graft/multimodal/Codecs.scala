package graft.multimodal

/** Pure-JVM media codecs for public container formats that need no
  * native libraries: RIFF/WAVE PCM (audio) and binary PGM "P5"
  * (image). These close the last declared stub in the repo — G1/G2/G3
  * now run a REAL parse of a real container format, not a byte-stat
  * fake. The synthetic corpus encodes each document's bytes as
  * samples/pixels, so the decoded values equal `ascii(char)` and the
  * existing documents-table DuckDB oracles replay the decode exactly:
  * a mis-parsed header (wrong data offset, wrong sample count, wrong
  * endianness) shifts every decoded value and breaks the hash gate.
  *
  * Reference scope note: tagtree's storage layer (storage.h:12-56) is
  * media-silent — this is the mandated training-data-pipeline half of
  * the brief, not a reference port.
  */
object Codecs {

  final case class WavData(sampleRate: Int, channels: Int, samples: Array[Int])

  /** RIFF/WAVE, PCM signed 16-bit little-endian, mono by default.
    * Encoder emits the canonical 44-byte header; decoder walks the
    * chunk list (tolerating extra chunks such as LIST/INFO before or
    * after `data`, and the RIFF odd-size pad byte) rather than
    * assuming byte-44 data — real WAV files in the wild need exactly
    * this.
    */
  object WavCodec {

    private def le16(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
      b.write(v & 0xff); b.write((v >> 8) & 0xff)
    }
    private def le32(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
      b.write(v & 0xff); b.write((v >> 8) & 0xff)
      b.write((v >> 16) & 0xff); b.write((v >> 24) & 0xff)
    }
    private def tag(b: java.io.ByteArrayOutputStream, s: String): Unit =
      b.write(s.getBytes("US-ASCII"))

    /** PCM16 mono WAV container around `samples` (each clamped to
      * signed-16 range by the caller's contract).
      */
    def encode(samples: Array[Int], sampleRate: Int): Array[Byte] = {
      val dataSize = samples.length * 2
      val b = new java.io.ByteArrayOutputStream(44 + dataSize)
      tag(b, "RIFF"); le32(b, 36 + dataSize); tag(b, "WAVE")
      tag(b, "fmt "); le32(b, 16)
      le16(b, 1) // PCM
      le16(b, 1) // mono
      le32(b, sampleRate)
      le32(b, sampleRate * 2) // byte rate = rate * channels * 2
      le16(b, 2) // block align
      le16(b, 16) // bits per sample
      tag(b, "data"); le32(b, dataSize)
      var i = 0
      while (i < samples.length) { le16(b, samples(i) & 0xffff); i += 1 }
      b.toByteArray
    }

    private def rdLe16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def rdLe32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def rdTag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, "US-ASCII")

    /** Parse a WAV byte stream: verify RIFF/WAVE magic, walk chunks to
      * find `fmt ` and `data` wherever they sit, decode PCM16 LE to
      * signed ints. Throws IllegalArgumentException on a malformed or
      * unsupported container (wrong magic, missing chunks, non-PCM,
      * bits != 16) — corrupt media must fail loudly at the decode
      * stage, not flow NaNs downstream.
      */
    def decode(bytes: Array[Byte]): WavData = {
      require(bytes.length >= 12 && rdTag(bytes, 0) == "RIFF" &&
        rdTag(bytes, 8) == "WAVE", "not a RIFF/WAVE stream")
      var fmtOff = -1; var dataOff = -1; var dataLen = -1
      var o = 12
      while (o + 8 <= bytes.length && (fmtOff < 0 || dataOff < 0)) {
        val id = rdTag(bytes, o)
        val sz = rdLe32(bytes, o + 4)
        require(sz >= 0 && o + 8 + sz <= bytes.length, s"chunk '$id' overruns stream")
        if (id == "fmt ") fmtOff = o + 8
        else if (id == "data") { dataOff = o + 8; dataLen = sz }
        o += 8 + sz + (sz & 1) // RIFF pads odd-sized chunks
      }
      require(fmtOff >= 0, "missing fmt chunk")
      require(dataOff >= 0, "missing data chunk")
      val audioFormat = rdLe16(bytes, fmtOff)
      val channels = rdLe16(bytes, fmtOff + 2)
      val rate = rdLe32(bytes, fmtOff + 4)
      val bits = rdLe16(bytes, fmtOff + 14)
      require(audioFormat == 1, s"unsupported audio format $audioFormat (PCM only)")
      require(bits == 16, s"unsupported bits-per-sample $bits (16 only)")
      require(channels >= 1, "zero channels")
      val n = dataLen / 2
      val samples = new Array[Int](n)
      var i = 0
      while (i < n) {
        samples(i) = rdLe16(bytes, dataOff + 2 * i).toShort.toInt // sign-extend
        i += 1
      }
      WavData(rate, channels, samples)
    }
  }

  final case class PgmData(width: Int, height: Int, pixels: Array[Byte])

  /** Binary PGM ("P5"): `P5 <w> <h> <maxval>` header in ASCII with
    * arbitrary whitespace and `#` comment lines, then one unsigned
    * byte per pixel, row-major. maxval is fixed at 255 (1 byte/pixel).
    */
  object PgmCodec {

    def encode(pixels: Array[Byte], width: Int, height: Int): Array[Byte] = {
      require(pixels.length == width * height,
        s"pixel count ${pixels.length} != ${width}x$height")
      val header = s"P5\n# graft synthetic\n$width $height\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + pixels.length)
      System.arraycopy(header, 0, out, 0, header.length)
      System.arraycopy(pixels, 0, out, header.length, pixels.length)
      out
    }

    def decode(bytes: Array[Byte]): PgmData = {
      require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '5',
        "not a binary PGM (P5) stream")
      var o = 2
      // read the next ASCII integer, skipping whitespace and # comments
      def nextInt(): Int = {
        var inComment = false
        while (o < bytes.length && {
          val c = bytes(o).toChar
          if (inComment) { if (c == '\n') inComment = false; true }
          else if (c == '#') { inComment = true; true }
          else c == ' ' || c == '\t' || c == '\n' || c == '\r'
        }) o += 1
        require(o < bytes.length && bytes(o) >= '0' && bytes(o) <= '9',
          "malformed PGM header")
        var v = 0
        while (o < bytes.length && bytes(o) >= '0' && bytes(o) <= '9') {
          v = v * 10 + (bytes(o) - '0'); o += 1
        }
        v
      }
      val w = nextInt(); val h = nextInt(); val maxval = nextInt()
      require(maxval == 255, s"unsupported maxval $maxval (255 only)")
      o += 1 // exactly one whitespace byte separates header from raster
      require(o + w * h <= bytes.length, "PGM raster truncated")
      val px = java.util.Arrays.copyOfRange(bytes, o, o + w * h)
      PgmData(w, h, px)
    }
  }
}
