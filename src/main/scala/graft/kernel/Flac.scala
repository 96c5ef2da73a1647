package graft.kernel

/** FLAC container metadata — the `fLaC` marker and the mandatory
  * STREAMINFO metadata block (the public FLAC format spec): 34 bytes
  * of bit-packed stream parameters — 20-bit sample rate, 3-bit
  * channels−1, 5-bit bits-per-sample−1, 36-bit total samples — giving
  * the exact duration with no frame decode (the lossy-container
  * header-only rule; FLAC's rice-coded subframes are decodable in
  * principle but out of scope for a metadata table). */
object Flac {

  /** title/artist from a VORBIS_COMMENT metadata block (type 4 — FLAC
    * embeds the Vorbis comment structure verbatim, LE lengths despite
    * FLAC's otherwise big-endian fields), "" when untagged. */
  final case class Meta(sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long, durationMs: Long,
      title: String = "", artist: String = "")

  def isFlac(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == 'f' && bytes(1) == 'L' &&
      bytes(2) == 'a' && bytes(3) == 'C'

  def metadata(bytes: Array[Byte]): Meta = {
    require(isFlac(bytes), "not a FLAC stream: no fLaC marker")
    require(bytes.length >= 8, "flac: truncated before block header")
    val btype = bytes(4) & 0x7f
    require(btype == 0, s"flac: first metadata block type $btype, spec requires STREAMINFO")
    val len = ((bytes(5) & 0xff) << 16) | ((bytes(6) & 0xff) << 8) | (bytes(7) & 0xff)
    require(len == 34, s"flac: STREAMINFO length $len, spec requires 34")
    require(bytes.length >= 8 + 34, "flac: STREAMINFO truncated")
    val p = 8
    val sampleRate = ((bytes(p + 10) & 0xff) << 12) |
      ((bytes(p + 11) & 0xff) << 4) | ((bytes(p + 12) & 0xff) >> 4)
    val channels = ((bytes(p + 12) >> 1) & 0x7) + 1
    val bps = (((bytes(p + 12) & 1) << 4) | ((bytes(p + 13) & 0xff) >> 4)) + 1
    val total = ((bytes(p + 13) & 0x0fL) << 32) |
      ((bytes(p + 14) & 0xffL) << 24) | ((bytes(p + 15) & 0xffL) << 16) |
      ((bytes(p + 16) & 0xffL) << 8) | (bytes(p + 17) & 0xffL)
    require(sampleRate >= 1, s"flac: sample rate $sampleRate")
    // walk the remaining metadata blocks for VORBIS_COMMENT (type 4);
    // every block is bounds-checked against the file (hostile declared
    // lengths are loud, the kernel-wide untrusted-input rule)
    var title = ""; var artist = ""
    var last = (bytes(4) & 0x80) != 0
    var off = 8 + 34
    while (!last) {
      require(off + 4 <= bytes.length, "flac: truncated metadata block header")
      val hdr = bytes(off) & 0xff
      last = (hdr & 0x80) != 0
      val btype2 = hdr & 0x7f
      require(btype2 != 0, "flac: duplicate STREAMINFO block")
      val blen = ((bytes(off + 1) & 0xff) << 16) |
        ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
      require(off + 4 + blen <= bytes.length,
        s"flac: metadata block (type $btype2) length $blen overruns the file")
      if (btype2 == 4) {
        val t = Ogg.vorbisComments(bytes, off + 4, off + 4 + blen)
        title = t._1; artist = t._2
      }
      off += 4 + blen
    }
    Meta(sampleRate, channels, bps, total, total * 1000L / sampleRate,
      title, artist)
  }

  /** Structurally valid fLaC + STREAMINFO fixture (zeroed MD5 and
    * block/frame-size fields; no audio frames); title/artist append a
    * real VORBIS_COMMENT block after STREAMINFO. */
  def encodeHeader(sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long, title: String = "",
      artist: String = ""): Array[Byte] = {
    require(sampleRate >= 1 && sampleRate < (1 << 20), s"rate $sampleRate")
    require(channels >= 1 && channels <= 8, s"channels $channels")
    require(bitsPerSample >= 4 && bitsPerSample <= 32, s"bps $bitsPerSample")
    require(totalSamples >= 0 && totalSamples < (1L << 36), s"samples $totalSamples")
    val out = new Array[Byte](8 + 34)
    out(0) = 'f'; out(1) = 'L'; out(2) = 'a'; out(3) = 'C'
    out(4) = 0x80.toByte // last block, type 0
    out(7) = 34
    val p = 8
    out(p + 10) = ((sampleRate >> 12) & 0xff).toByte
    out(p + 11) = ((sampleRate >> 4) & 0xff).toByte
    out(p + 12) = (((sampleRate & 0xf) << 4) | (((channels - 1) & 0x7) << 1) |
      (((bitsPerSample - 1) >> 4) & 1)).toByte
    out(p + 13) = ((((bitsPerSample - 1) & 0xf) << 4) |
      ((totalSamples >> 32) & 0xf)).toInt.toByte
    out(p + 14) = ((totalSamples >> 24) & 0xff).toByte
    out(p + 15) = ((totalSamples >> 16) & 0xff).toByte
    out(p + 16) = ((totalSamples >> 8) & 0xff).toByte
    out(p + 17) = (totalSamples & 0xff).toByte
    if (title.isEmpty && artist.isEmpty) out
    else {
      out(4) = 0 // STREAMINFO no longer the last block
      val body = Ogg.commentBlock(title, artist)
      val hdr = Array((0x80 | 4).toByte, // last block, type 4
        ((body.length >> 16) & 0xff).toByte,
        ((body.length >> 8) & 0xff).toByte, (body.length & 0xff).toByte)
      out ++ hdr ++ body
    }
  }
}
