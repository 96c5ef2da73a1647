package graft.kernel

/** Pure-JVM WAV (RIFF/PCM) codec, built from the public RIFF/WAVE
  * format description the same way [[Png]]/[[Hdf5]]/[[Tiff]] are built
  * from their specs. Decode supports the canonical uncompressed forms —
  * PCM (format 1) at 8-bit unsigned and 16-bit signed little-endian,
  * any channel count/sample rate, chunk-ordered or with trailing
  * metadata chunks — and rejects compressed/float forms loudly (a
  * silent misparse of sample data would poison every feature computed
  * downstream). Encode writes 16-bit PCM.
  *
  * Samples decode to SIGNED ints (8-bit unsigned is rebased by -128),
  * channel-interleaved exactly as stored, so integer features (sums,
  * peaks) computed from them are engine-portable with no float step.
  */
object Wav {

  /** Decoded audio: `samples` channel-interleaved signed values
    * (16-bit: -32768..32767; 8-bit input rebased to -128..127). */
  final case class Audio(sampleRate: Int, channels: Int,
      bitsPerSample: Int, samples: Array[Int])

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  def isWav(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE"

  def decode(bytes: Array[Byte]): Audio = {
    require(isWav(bytes), "not a WAV: bad RIFF/WAVE header")
    var off = 12
    var channels, sampleRate, bits = -1
    var data: (Int, Int) = null // (offset, length)
    while (data == null || channels < 0) {
      require(off + 8 <= bytes.length,
        "truncated WAV: fmt or data chunk missing")
      val ctype = new String(bytes, off, 4, "US-ASCII")
      val len = le32(bytes, off + 4)
      require(len >= 0 && off + 8 + len <= bytes.length,
        s"truncated chunk $ctype at $off")
      ctype match {
        case "fmt " =>
          require(len >= 16, s"fmt chunk length $len")
          val fmt = le16(bytes, off + 8)
          require(fmt == 1, s"only PCM (format 1) supported, got $fmt")
          channels = le16(bytes, off + 10)
          sampleRate = le32(bytes, off + 12)
          bits = le16(bytes, off + 22)
          require(channels > 0, s"bad channel count $channels")
          require(bits == 8 || bits == 16, s"only 8/16-bit PCM, got $bits")
        case "data" => data = (off + 8, len)
        case _ => // LIST/INFO/fact etc — metadata, not samples
      }
      // chunks are word-aligned: odd lengths carry a pad byte
      off += 8 + len + (len & 1)
    }
    val (dOff, dLen) = data
    val bytesPer = bits / 8
    require(dLen % (bytesPer * channels) == 0,
      s"data length $dLen not a frame multiple")
    val n = dLen / bytesPer
    val samples = new Array[Int](n)
    var i = 0
    while (i < n) {
      samples(i) =
        if (bits == 16) le16(bytes, dOff + i * 2).toShort.toInt
        else (bytes(dOff + i) & 0xff) - 128
      i += 1
    }
    Audio(sampleRate, channels, bits, samples)
  }

  /** Encode 16-bit PCM (samples must fit in -32768..32767). */
  def encode(audio: Audio): Array[Byte] = {
    require(audio.samples.forall(s => s >= -32768 && s <= 32767),
      "sample out of 16-bit range")
    require(audio.samples.length % audio.channels == 0,
      "sample count not a frame multiple")
    val dataLen = audio.samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def ascii(s: String, off: Int): Unit =
      s.getBytes("US-ASCII").zipWithIndex.foreach { case (b, i) => out(off + i) = b }
    def w16(v: Int, off: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
    }
    def w32(v: Int, off: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    ascii("RIFF", 0); w32(36 + dataLen, 4); ascii("WAVE", 8)
    ascii("fmt ", 12); w32(16, 16); w16(1, 20) // PCM
    w16(audio.channels, 22); w32(audio.sampleRate, 24)
    w32(audio.sampleRate * audio.channels * 2, 28) // byte rate
    w16(audio.channels * 2, 32); w16(16, 34) // block align, bits
    ascii("data", 36); w32(dataLen, 40)
    var i = 0
    while (i < audio.samples.length) {
      w16(audio.samples(i) & 0xffff, 44 + i * 2)
      i += 1
    }
    out
  }
}
