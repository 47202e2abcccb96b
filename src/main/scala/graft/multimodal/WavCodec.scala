package graft.multimodal

/** A REAL audio codec — RIFF/WAVE with 16-bit mono PCM, the dependency-free
  * audio wire format (the WAVE subset every tool emits). Like [[PpmCodec]]
  * for images, this is an actual byte format parsed from actual bytes:
  * RIFF envelope, chunk walk, `fmt ` validation (PCM tag, mono, 16-bit),
  * little-endian sample reassembly — not a stub.
  *
  * [[encode]] deliberately writes an ODD-sized unknown `LIST` chunk between
  * `fmt ` and `data`, so every round trip exercises the two corners real
  * WAV parsers get wrong: skipping chunks you don't understand, and the
  * RIFF rule that chunk bodies are padded to even length (the pad byte is
  * NOT counted in the declared size). The q183/q184 oracles regenerate the
  * expected samples from the generative formula alone, so a defect in any
  * of header layout, chunk skip, padding, or endianness shifts bytes and
  * breaks the hash match.
  */
object WavCodec {

  final case class WavAudio(sampleRate: Int, samples: Array[Short])

  private val ASCII = java.nio.charset.StandardCharsets.US_ASCII

  private def putU32(out: Array[Byte], pos: Int, v: Long): Unit = {
    out(pos) = (v & 0xff).toByte
    out(pos + 1) = ((v >> 8) & 0xff).toByte
    out(pos + 2) = ((v >> 16) & 0xff).toByte
    out(pos + 3) = ((v >> 24) & 0xff).toByte
  }

  private def putU16(out: Array[Byte], pos: Int, v: Int): Unit = {
    out(pos) = (v & 0xff).toByte
    out(pos + 1) = ((v >> 8) & 0xff).toByte
  }

  private def putTag(out: Array[Byte], pos: Int, tag: String): Unit =
    System.arraycopy(tag.getBytes(ASCII), 0, out, pos, 4)

  /** Serialize as RIFF/WAVE: `RIFF`(size)`WAVE` + `fmt `(16: PCM, mono,
    * 16-bit) + an odd-length `LIST` info chunk (+1 pad byte) + `data`.
    * Canonical little-endian layout throughout. */
  def encode(a: WavAudio): Array[Byte] = {
    val info = "graft".getBytes(ASCII)            // 5 bytes — odd on purpose
    val infoPadded = info.length + (info.length & 1)
    val dataLen = a.samples.length * 2
    val riffBody = 4 + (8 + 16) + (8 + infoPadded) + (8 + dataLen)
    val out = new Array[Byte](8 + riffBody)
    var p = 0
    putTag(out, p, "RIFF"); putU32(out, p + 4, riffBody.toLong); p += 8
    putTag(out, p, "WAVE"); p += 4
    putTag(out, p, "fmt "); putU32(out, p + 4, 16L); p += 8
    putU16(out, p, 1)                              // PCM
    putU16(out, p + 2, 1)                          // mono
    putU32(out, p + 4, a.sampleRate.toLong)
    putU32(out, p + 8, a.sampleRate.toLong * 2)    // byte rate
    putU16(out, p + 12, 2)                         // block align
    putU16(out, p + 14, 16)                        // bits per sample
    p += 16
    putTag(out, p, "LIST"); putU32(out, p + 4, info.length.toLong); p += 8
    System.arraycopy(info, 0, out, p, info.length)
    p += infoPadded                                // pad byte stays zero
    putTag(out, p, "data"); putU32(out, p + 4, dataLen.toLong); p += 8
    var i = 0
    while (i < a.samples.length) {
      putU16(out, p + 2 * i, a.samples(i) & 0xffff)
      i += 1
    }
    out
  }

  private def u16(b: Array[Byte], pos: Int): Int =
    (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8)

  private def u32(b: Array[Byte], pos: Int): Long =
    (b(pos) & 0xffL) | ((b(pos + 1) & 0xffL) << 8) |
      ((b(pos + 2) & 0xffL) << 16) | ((b(pos + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], pos: Int): String =
    new String(b, pos, 4, ASCII)

  /** Parse a RIFF/WAVE file: walk the chunk list, skipping unknown chunks
    * (honoring odd-size padding), validate `fmt ` as 16-bit mono PCM, and
    * reassemble the little-endian samples from `data`. Accepts `data`
    * before OR after unknown chunks; requires `fmt ` before `data` (the
    * spec's ordering guarantee). */
  def decode(bytes: Array[Byte]): WavAudio = {
    require(bytes.length >= 12 && tag(bytes, 0) == "RIFF" &&
      tag(bytes, 8) == "WAVE", "not a RIFF/WAVE file")
    val end = math.min(bytes.length.toLong, 8L + u32(bytes, 4)).toInt
    var pos = 12
    var sampleRate = -1
    var haveFmt = false
    while (pos + 8 <= end) {
      val id = tag(bytes, pos)
      val sz = u32(bytes, pos + 4)
      val body = pos + 8
      require(body + sz <= end, s"truncated chunk '$id' ($sz bytes)")
      id match {
        case "fmt " =>
          require(sz >= 16, s"fmt chunk too small ($sz)")
          require(u16(bytes, body) == 1, "only PCM (format tag 1) supported")
          require(u16(bytes, body + 2) == 1, "only mono supported")
          require(u16(bytes, body + 14) == 16, "only 16-bit samples supported")
          sampleRate = u32(bytes, body + 4).toInt
          require(sampleRate > 0, "bad sample rate")
          haveFmt = true
        case "data" =>
          require(haveFmt, "data chunk before fmt")
          val n = (sz / 2).toInt
          val samples = new Array[Short](n)
          var i = 0
          while (i < n) {
            samples(i) = u16(bytes, body + 2 * i).toShort
            i += 1
          }
          return WavAudio(sampleRate, samples)
        case _ => ()                               // unknown chunk: skip
      }
      pos = body + (sz + (sz & 1L)).toInt          // padded to even
    }
    throw new IllegalArgumentException("no data chunk found")
  }

  /** Integer decimation: keep every `factor`-th sample starting at 0 and
    * divide the clock — the drop-sample resampler (no interpolation, so
    * the oracle can replay the index arithmetic exactly). */
  def decimate(a: WavAudio, factor: Int): WavAudio = {
    require(factor >= 1)
    val n = if (a.samples.isEmpty) 0 else (a.samples.length - 1) / factor + 1
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = a.samples(i * factor)
      i += 1
    }
    WavAudio(a.sampleRate / factor, out)
  }
}
