package graft.kernel

import java.io.{ByteArrayOutputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal POSIX ustar tar read/write, from the public format spec
  * (POSIX.1-1988 ustar layout; the pax/GNU extensions are rejected
  * loudly). This is the container format of WebDataset training shards —
  * a tar of `{key}.{ext}` members, consumed sequentially — so only
  * regular-file members exist here by contract.
  *
  * Untrusted-input discipline (the Png/Warc lesson): every header is
  * checksum-VERIFIED, sizes are budget-checked against the archive
  * bounds before any slice, and unknown typeflags/magic raise rather
  * than skip.
  *
  * Writing is deterministic byte-for-byte: fixed mode/uid/gid, mtime 0 —
  * two builds of the same members are identical archives (the shard
  * reproducibility contract training pipelines rely on).
  */
object Tar {

  final case class Member(name: String, bytes: Array[Byte])

  private val BLOCK = 512

  /** Stream `members` as a ustar archive onto `out` (two zero blocks at
    * the end). Member payloads are row-sized; the archive itself is
    * never buffered here — at shard scale the caller hands a file
    * OutputStream and memory stays O(member). */
  def writeTo(out: OutputStream, members: Iterator[Member]): Unit = {
    members.foreach { m =>
      out.write(header(m.name, m.bytes.length))
      out.write(m.bytes)
      val pad = (BLOCK - m.bytes.length % BLOCK) % BLOCK
      if (pad > 0) out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](2 * BLOCK))
  }

  def write(members: Seq[Member]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    writeTo(bos, members.iterator)
    bos.toByteArray
  }

  private def header(name: String, size: Int): Array[Byte] = {
    val nameBytes = name.getBytes(UTF_8)
    require(nameBytes.length > 0 && nameBytes.length <= 100,
      s"ustar member name must be 1..100 bytes: '$name'")
    require(size >= 0, s"negative member size: $size")
    val h = new Array[Byte](BLOCK)
    System.arraycopy(nameBytes, 0, h, 0, nameBytes.length)
    putOctal(h, 100, 8, 420)        // mode 0644
    putOctal(h, 108, 8, 0)          // uid
    putOctal(h, 116, 8, 0)          // gid
    putOctal(h, 124, 12, size.toLong)
    putOctal(h, 136, 12, 0L)        // mtime 0: deterministic archives
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum = spaces while summing
    h(156) = '0'                    // typeflag: regular file
    System.arraycopy("ustar\u0000".getBytes(UTF_8), 0, h, 257, 6) // magic "ustar\0"
    h(263) = '0'; h(264) = '0'      // version "00"
    val sum = h.map(b => b & 0xff).sum
    // chksum: 6 octal digits, NUL, space (the historical layout)
    val oct = ("%06o".format(sum)).getBytes(UTF_8)
    System.arraycopy(oct, 0, h, 148, 6)
    h(154) = 0; h(155) = ' '.toByte
    h
  }

  private def putOctal(h: Array[Byte], off: Int, width: Int, v: Long): Unit = {
    require(v >= 0 && v < (1L << (3 * (width - 1))),
      s"value $v does not fit an $width-byte octal field")
    val s = ("%0" + (width - 1) + "o").format(v).getBytes(UTF_8)
    System.arraycopy(s, 0, h, off, width - 1)
    h(off + width - 1) = 0
  }

  /** Parse a complete ustar archive. Stops at the first all-zero block;
    * verifies every header checksum; bounds-checks every size. */
  def parse(archive: Array[Byte]): Seq[Member] = {
    val out = Seq.newBuilder[Member]
    var off = 0
    var done = false
    while (!done) {
      require(off + BLOCK <= archive.length,
        s"tar truncated: header at $off overruns ${archive.length}")
      if (isZeroBlock(archive, off)) { done = true }
      else {
        val magic = new String(archive, off + 257, 5, UTF_8)
        require(magic == "ustar", s"not a ustar header at $off: magic '$magic'")
        val stored = octal(archive, off + 148, 8)
        var sum = 0L
        var i = 0
        while (i < BLOCK) {
          val b = if (i >= 148 && i < 156) ' '.toByte else archive(off + i)
          sum += (b & 0xff); i += 1
        }
        require(sum == stored,
          s"tar header checksum mismatch at $off: stored $stored computed $sum")
        val typeflag = archive(off + 156)
        require(typeflag == '0'.toByte || typeflag == 0.toByte,
          s"unsupported tar member type '${typeflag.toChar}' at $off " +
            "(only regular files exist in WebDataset shards)")
        val size = octal(archive, off + 124, 12)
        require(size >= 0 && size <= Int.MaxValue, s"absurd member size $size")
        val dataOff = off + BLOCK
        require(dataOff + size <= archive.length,
          s"tar member at $off claims $size bytes past archive end")
        val name = {
          val base = cString(archive, off, 100)
          val prefix = cString(archive, off + 345, 155)
          if (prefix.isEmpty) base else prefix + "/" + base
        }
        require(name.nonEmpty, s"empty member name at $off")
        out += Member(name,
          java.util.Arrays.copyOfRange(archive, dataOff, dataOff + size.toInt))
        val blocks = (size + BLOCK - 1) / BLOCK
        off = dataOff + (blocks * BLOCK).toInt
      }
    }
    out.result()
  }

  private def isZeroBlock(a: Array[Byte], off: Int): Boolean = {
    var i = 0
    while (i < BLOCK) { if (a(off + i) != 0) return false; i += 1 }
    true
  }

  private def octal(a: Array[Byte], off: Int, width: Int): Long = {
    var v = 0L
    var i = 0
    var seen = false
    while (i < width) {
      val c = a(off + i)
      if (c >= '0' && c <= '7') {
        seen = true
        v = v * 8 + (c - '0')
        require(v >= 0, s"octal overflow at $off")
      } else if (c == 0 || c == ' ') {
        if (seen) i = width // trailing terminator ends the field
      } else {
        throw new IllegalArgumentException(
          s"bad octal byte 0x${"%02x".format(c & 0xff)} in tar header at $off")
      }
      i += 1
    }
    v
  }

  private def cString(a: Array[Byte], off: Int, max: Int): String = {
    var n = 0
    while (n < max && a(off + n) != 0) n += 1
    new String(a, off, n, UTF_8)
  }
}
