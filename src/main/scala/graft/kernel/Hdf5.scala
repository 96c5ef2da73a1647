package graft.kernel

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Inflater

import scala.collection.mutable

import Raster.Grid

/** Minimal HDF5 reader for the cogify decode stage — NetCDF-4 granules
  * ARE HDF5 containers, and they are the reference's primary input
  * (lambdas/cogify/handler.py:84-96 opens them with `netCDF4.Dataset`
  * and pulls one variable plus `_FillValue` and the x/y coordinate
  * variables). Implemented directly from the public HDF5 File Format
  * Specification; no HDF5 library exists in this environment.
  *
  * Scope (what a NetCDF-4 data file actually uses):
  *  - superblock versions 0/1 (symbol-table root group — the library
  *    default netCDF-4 writes) and 2/3 (root object header direct);
  *  - version-1 object headers with continuation blocks, and version-2
  *    (`OHDR`/`OCHK`) headers with compact link messages;
  *  - groups via symbol-table message → local heap + v1 B-tree → SNOD
  *    nodes, via compact link messages, or via DENSE link storage
  *    (fractal heap + name-index v2 B-tree — what the netCDF-4 library
  *    switches to once a group holds ~8+ links, i.e. every
  *    many-variable science granule);
  *  - datasets with contiguous, compact, or chunked (v1 B-tree, node
  *    type 1) layout; deflate (id 1) and shuffle (id 2) filters;
  *  - fixed-point and IEEE-float datatypes, either endianness;
  *  - numeric attributes (versions 1/2/3): `_FillValue`,
  *    `scale_factor`, `add_offset`.
  *
  * Checksums (superblock v2, v2 object headers) are not verified —
  * corrupted files fail on structural requires instead.
  */
object Hdf5 {

  private val Undef = -1L // the spec's "undefined address" (all ones)

  /** clazz 0 = fixed-point, 1 = IEEE float. */
  final case class Dtype(clazz: Int, size: Int, littleEndian: Boolean,
      signed: Boolean) {
    def numeric: Boolean = clazz == 0 || clazz == 1
  }

  sealed trait Layout extends Serializable
  final case class Compact(data: Array[Byte]) extends Layout
  final case class Contiguous(addr: Long, size: Long) extends Layout
  /** `chunkDims` excludes the spec's trailing element-size entry. */
  final case class Chunked(btree: Long, chunkDims: IndexedSeq[Int],
      elemSize: Int) extends Layout

  final case class Filter(id: Int, client: IndexedSeq[Int])

  final case class Attr(name: String, values: IndexedSeq[Double]) {
    def number: Double = values.head
  }

  final case class Dataset(path: String, dims: IndexedSeq[Int], dtype: Dtype,
      layout: Layout, filters: IndexedSeq[Filter], atts: Map[String, Attr],
      fillValue: Option[Double])

  final case class H5File(datasets: Map[String, Dataset], bytes: Array[Byte]) {
    def dataset(path: String): Dataset = {
      val p = path.stripPrefix("/")
      datasets.getOrElse(p,
        throw new NoSuchElementException(
          s"no dataset $p (have: ${datasets.keys.toSeq.sorted.mkString(", ")})"))
    }
  }

  // ---------------------------------------------------------------------
  // superblock

  def parse(bytes: Array[Byte]): H5File = {
    require(bytes.length >= 9 &&
      (bytes(0) & 0xff) == 0x89 && bytes(1) == 'H' && bytes(2) == 'D' &&
      bytes(3) == 'F' && bytes(4) == '\r' && bytes(5) == '\n' &&
      (bytes(6) & 0xff) == 0x1a && bytes(7) == '\n',
      "not an HDF5 file (missing \\x89HDF\\r\\n\\x1a\\n signature)")
    val buf = le(bytes)
    val sbVersion = bytes(8).toInt
    val rootAddr = sbVersion match {
      case 0 | 1 =>
        require(bytes(13) == 8 && bytes(14) == 8,
          s"unsupported offset/length sizes ${bytes(13)}/${bytes(14)} (only 8/8)")
        // v1 inserts "indexed storage internal node K" (2) + reserved (2)
        // between the group-node Ks and the file consistency flags
        val entry = if (sbVersion == 0) 56 else 60
        buf.getLong(entry + 8) // symbol-table entry: name offset, OH addr
      case 2 | 3 =>
        require(bytes(9) == 8 && bytes(10) == 8,
          s"unsupported offset/length sizes ${bytes(9)}/${bytes(10)} (only 8/8)")
        buf.getLong(36) // base, extension, EOF, then root OH address
      case v => throw new IllegalArgumentException(s"superblock version $v")
    }
    val out = mutable.LinkedHashMap.empty[String, Dataset]
    walk(bytes, rootAddr, "", out, mutable.Set.empty[Long])
    H5File(out.toMap, bytes)
  }

  private def le(bytes: Array[Byte]): ByteBuffer =
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)

  // ---------------------------------------------------------------------
  // object headers → raw messages

  /** One header message: spec type + its data slice. */
  private final case class Msg(typ: Int, off: Int, len: Int)

  private def readMessages(bytes: Array[Byte], addr0: Int): Seq[Msg] = {
    val buf = le(bytes)
    if (bytes(addr0) == 'O' && bytes(addr0 + 1) == 'H' &&
        bytes(addr0 + 2) == 'D' && bytes(addr0 + 3) == 'R')
      readMessagesV2(bytes, buf, addr0)
    else readMessagesV1(bytes, buf, addr0)
  }

  private def readMessagesV1(bytes: Array[Byte], buf: ByteBuffer,
      addr0: Int): Seq[Msg] = {
    require(bytes(addr0) == 1, s"object header version ${bytes(addr0)}")
    val numMessages = buf.getShort(addr0 + 2) & 0xffff
    val headerSize = buf.getInt(addr0 + 8)
    // 12-byte prefix then messages aligned to the next 8-byte boundary
    val msgs = mutable.ArrayBuffer.empty[Msg]
    val blocks = mutable.Queue((addr0 + 16, addr0 + 16 + headerSize))
    while (blocks.nonEmpty && msgs.size < numMessages) {
      var (pos, end) = blocks.dequeue()
      while (pos + 8 <= end && msgs.size < numMessages) {
        val typ = buf.getShort(pos) & 0xffff
        val size = buf.getShort(pos + 2) & 0xffff
        val data = pos + 8
        if (typ == 0x10) { // continuation: offset + length, no signature
          blocks.enqueue((buf.getLong(data).toInt,
            buf.getLong(data).toInt + buf.getLong(data + 8).toInt))
        }
        msgs += Msg(typ, data, size)
        pos = data + size
      }
    }
    msgs.toSeq
  }

  private def readMessagesV2(bytes: Array[Byte], buf: ByteBuffer,
      addr0: Int): Seq[Msg] = {
    require(bytes(addr0 + 4) == 2, s"OHDR version ${bytes(addr0 + 4)}")
    val flags = bytes(addr0 + 5) & 0xff
    var pos = addr0 + 6
    if ((flags & 0x20) != 0) pos += 16 // access/mod/change/birth times
    if ((flags & 0x10) != 0) pos += 4 // max-compact / min-dense
    val sizeBytes = 1 << (flags & 0x3)
    val chunk0 = readUint(buf, pos, sizeBytes); pos += sizeBytes
    val msgs = mutable.ArrayBuffer.empty[Msg]
    val creationOrder = (flags & 0x04) != 0
    // chunk = messages, then a 4-byte checksum (not verified)
    val blocks = mutable.Queue((pos, pos + chunk0.toInt))
    while (blocks.nonEmpty) {
      var (p, end) = blocks.dequeue()
      while (end - p > 4) {
        val typ = bytes(p) & 0xff
        val size = buf.getShort(p + 1) & 0xffff
        var data = p + 4
        if (creationOrder) data += 2
        if (typ == 0x10) {
          // continuation block: OCHK signature + messages + checksum
          val off = buf.getLong(data).toInt
          val len = buf.getLong(data + 8).toInt
          require(bytes(off) == 'O' && bytes(off + 1) == 'C' &&
            bytes(off + 2) == 'H' && bytes(off + 3) == 'K',
            "missing OCHK signature on continuation block")
          blocks.enqueue((off + 4, off + len))
        }
        msgs += Msg(typ, data, size)
        p = data + size
      }
    }
    msgs.toSeq
  }

  private def readUint(buf: ByteBuffer, pos: Int, n: Int): Long = n match {
    case 1 => buf.get(pos) & 0xffL
    case 2 => buf.getShort(pos) & 0xffffL
    case 4 => buf.getInt(pos) & 0xffffffffL
    case 8 => buf.getLong(pos)
  }

  // ---------------------------------------------------------------------
  // group traversal

  private def walk(bytes: Array[Byte], addr: Long, prefix: String,
      out: mutable.LinkedHashMap[String, Dataset],
      visited: mutable.Set[Long]): Unit = {
    if (!visited.add(addr)) return
    val buf = le(bytes)
    val msgs = readMessages(bytes, addr.toInt)

    // group? — symbol-table message or link/link-info messages
    val symtab = msgs.find(_.typ == 0x11)
    val links = msgs.filter(_.typ == 0x06)
    val linkInfo = msgs.find(_.typ == 0x02)
    val isDataset = msgs.exists(_.typ == 0x08) // layout ⇒ dataset

    if (isDataset) {
      out += (prefix.stripSuffix("/").stripPrefix("/") ->
        parseDataset(bytes, prefix.stripSuffix("/").stripPrefix("/"), msgs))
    } else {
      symtab.foreach { m =>
        val btree = buf.getLong(m.off)
        val heap = buf.getLong(m.off + 8)
        val heapData = localHeapData(bytes, heap)
        groupBtree(bytes, btree).foreach { snod =>
          symbolNode(bytes, snod).foreach { case (nameOff, ohAddr) =>
            val name = cString(bytes, heapData + nameOff.toInt)
            walk(bytes, ohAddr, s"$prefix$name/", out, visited)
          }
        }
      }
      linkInfo.foreach { m =>
        // version(1) flags(1) [max corder(8)] fractal heap, name index
        val flags = bytes(m.off + 1) & 0xff
        val base = m.off + 2 + (if ((flags & 1) != 0) 8 else 0)
        val fh = buf.getLong(base)
        val nameIndex = buf.getLong(base + 8)
        if (fh != Undef) // dense storage: links live in the fractal heap
          denseLinks(bytes, buf, fh, nameIndex).foreach { case (name, target) =>
            walk(bytes, target, s"$prefix$name/", out, visited)
          }
      }
      links.foreach { m =>
        linkTarget(bytes, buf, m).foreach { case (name, target) =>
          walk(bytes, target, s"$prefix$name/", out, visited)
        }
      }
    }
  }

  /** Hard-link name → object header address (soft/external links skipped). */
  private def linkTarget(bytes: Array[Byte], buf: ByteBuffer,
      m: Msg): Option[(String, Long)] = {
    require(bytes(m.off) == 1, s"link message version ${bytes(m.off)}")
    val flags = bytes(m.off + 1) & 0xff
    var pos = m.off + 2
    var linkType = 0
    if ((flags & 0x08) != 0) { linkType = bytes(pos) & 0xff; pos += 1 }
    if ((flags & 0x04) != 0) pos += 8 // creation order
    if ((flags & 0x10) != 0) pos += 1 // charset
    val lenSize = 1 << (flags & 0x3)
    val nameLen = readUint(buf, pos, lenSize).toInt; pos += lenSize
    val name = new String(bytes, pos, nameLen, "UTF-8"); pos += nameLen
    if (linkType == 0) Some(name -> buf.getLong(pos)) else None
  }

  /** Local heap: verify HEAP signature, return data segment address. */
  private def localHeapData(bytes: Array[Byte], addr: Long): Int = {
    val a = addr.toInt
    require(bytes(a) == 'H' && bytes(a + 1) == 'E' && bytes(a + 2) == 'A' &&
      bytes(a + 3) == 'P', "missing HEAP signature")
    le(bytes).getLong(a + 24).toInt
  }

  private def cString(bytes: Array[Byte], at: Int): String = {
    var end = at
    while (bytes(end) != 0) end += 1
    new String(bytes, at, end - at, "UTF-8")
  }

  /** v1 group B-tree (node type 0) → all leaf children (SNOD addresses),
    * ignoring the separator keys. */
  private def groupBtree(bytes: Array[Byte], addr: Long): Seq[Long] = {
    val buf = le(bytes)
    val a = addr.toInt
    require(bytes(a) == 'T' && bytes(a + 1) == 'R' && bytes(a + 2) == 'E' &&
      bytes(a + 3) == 'E', "missing TREE signature")
    require(bytes(a + 4) == 0, s"B-tree node type ${bytes(a + 4)} (expected 0)")
    val level = bytes(a + 5) & 0xff
    val n = buf.getShort(a + 6) & 0xffff
    // entries at +24: key0 child0 key1 child1 … key_n (keys are heap offsets)
    val children = (0 until n).map(i => buf.getLong(a + 24 + 8 + i * 16))
    if (level == 0) children
    else children.flatMap(groupBtree(bytes, _))
  }

  /** SNOD entries: (link name heap offset, object header address). */
  private def symbolNode(bytes: Array[Byte], addr: Long): Seq[(Long, Long)] = {
    val buf = le(bytes)
    val a = addr.toInt
    require(bytes(a) == 'S' && bytes(a + 1) == 'N' && bytes(a + 2) == 'O' &&
      bytes(a + 3) == 'D', "missing SNOD signature")
    val n = buf.getShort(a + 6) & 0xffff
    (0 until n).map { i =>
      val e = a + 8 + i * 40 // entry: name off, OH addr, cache, reserved, scratch
      (buf.getLong(e), buf.getLong(e + 8))
    }
  }

  // ---------------------------------------------------------------------
  // dense (fractal-heap) group link storage — spec §III.F (fractal heap)
  // and §III.A.2 (version-2 B-trees). The netCDF-4 library switches a
  // group from compact link messages to dense storage once its link
  // count grows (~8+ variables), so many-variable science granules
  // (the reference's GPM/OMI collections, lambdas/cogify/example.ini)
  // land here. Strategy: enumerate every record of the name-index v2
  // B-tree (type 5: name hash + heap ID), resolve each managed heap ID
  // through the fractal heap's doubling table, and hand the bytes to the
  // SAME link-message parser the compact path uses.

  /** All (link name → object header address) pairs of a dense group. */
  private def denseLinks(bytes: Array[Byte], buf: ByteBuffer,
      heapAddr: Long, nameIndexAddr: Long): Seq[(String, Long)] = {
    require(nameIndexAddr != Undef,
      "dense link storage without a name-index v2 B-tree")
    val heap = parseFractalHeap(bytes, buf, heapAddr)
    v2BtreeRecords(bytes, buf, nameIndexAddr).flatMap { rec =>
      // type-5 record: hash-of-name (4 bytes) then the heap ID
      val objOff = resolveHeapId(bytes, buf, heap, rec + 4)
      linkTarget(bytes, buf, Msg(0x06, objOff, 0))
    }
  }

  /** The fractal-heap geometry needed to resolve managed heap IDs. */
  private final case class FractalHeap(offsetSize: Int, idLenSize: Int,
      tableWidth: Int, startBlockSize: Long, maxDirectBlockSize: Long,
      rootBlockAddr: Long, rootRows: Int, checksumDirect: Boolean,
      blockHeaderSize: Int)

  private def parseFractalHeap(bytes: Array[Byte], buf: ByteBuffer,
      addr: Long): FractalHeap = {
    val a = addr.toInt
    require(bytes(a) == 'F' && bytes(a + 1) == 'R' && bytes(a + 2) == 'H' &&
      bytes(a + 3) == 'P', "missing FRHP signature")
    require(bytes(a + 4) == 0, s"fractal heap version ${bytes(a + 4)}")
    val heapIdLen = buf.getShort(a + 5) & 0xffff
    val ioFiltersLen = buf.getShort(a + 7) & 0xffff
    require(ioFiltersLen == 0,
      "filtered fractal heaps are not used for group links")
    val flags = bytes(a + 9) & 0xff
    // fixed-width block: maxManagedObjSize(4) at +10, then 12 length/
    // address fields (8 bytes each) at +14, then the doubling table
    val tableWidth = buf.getShort(a + 110) & 0xffff
    val startBlockSize = buf.getLong(a + 112)
    val maxDirectBlockSize = buf.getLong(a + 120)
    val maxHeapSizeBits = buf.getShort(a + 128) & 0xffff
    val rootBlockAddr = buf.getLong(a + 132)
    val rootRows = buf.getShort(a + 140) & 0xffff
    val offsetSize = (maxHeapSizeBits + 7) / 8
    val idLenSize = heapIdLen - 1 - offsetSize
    require(idLenSize > 0, s"heap ID length $heapIdLen too small for " +
      s"$offsetSize-byte offsets")
    val checksumDirect = (flags & 0x02) != 0
    // FHDB header: sig(4) version(1) heap addr(8) block offset, [checksum]
    val blockHeaderSize = 4 + 1 + 8 + offsetSize + (if (checksumDirect) 4 else 0)
    FractalHeap(offsetSize, idLenSize, tableWidth, startBlockSize,
      maxDirectBlockSize, rootBlockAddr, rootRows, checksumDirect,
      blockHeaderSize)
  }

  /** Resolve a managed heap ID at `idAt` to the absolute file offset of
    * the object's first byte. Heap offsets cover managed space
    * INCLUDING direct-block headers, so the object's file position is
    * blockAddr + (offset - blockHeapOffset). */
  private def resolveHeapId(bytes: Array[Byte], buf: ByteBuffer,
      heap: FractalHeap, idAt: Int): Int = {
    val idFlags = bytes(idAt) & 0xff
    val idType = (idFlags >> 4) & 0x3
    require((idFlags >> 6) == 0, s"heap ID version ${idFlags >> 6}")
    require(idType == 0,
      s"heap ID type $idType (huge/tiny objects never hold group links)")
    var off = 0L
    for (i <- 0 until heap.offsetSize) // little-endian offset
      off |= (bytes(idAt + 1 + i) & 0xffL) << (8 * i)
    val (blockAddr, blockHeapOff) = directBlockFor(bytes, buf, heap, off)
    (blockAddr + (off - blockHeapOff)).toInt
  }

  /** The doubling table: (file address, heap-space offset) of the direct
    * block containing heap offset `off`. Root is either a single direct
    * block (rows == 0) or an indirect block whose rows of direct-block
    * children double in size from row 2 on; indirect children beyond
    * the direct rows (giant heaps) are out of scope for link storage. */
  private def directBlockFor(bytes: Array[Byte], buf: ByteBuffer,
      heap: FractalHeap, off: Long): (Long, Long) = {
    if (heap.rootRows == 0) {
      require(off < heap.startBlockSize * heap.tableWidth,
        s"heap offset $off beyond the root direct block")
      return (heap.rootBlockAddr, 0L)
    }
    val a = heap.rootBlockAddr.toInt
    require(bytes(a) == 'F' && bytes(a + 1) == 'H' && bytes(a + 2) == 'I' &&
      bytes(a + 3) == 'B', "missing FHIB signature on root indirect block")
    // sig(4) version(1) heap addr(8) block offset(offsetSize), children
    val childrenAt = a + 4 + 1 + 8 + heap.offsetSize
    // direct rows: row 0 and 1 are startBlockSize, row r≥2 doubles
    val maxDirectRows = 2 +
      (63 - java.lang.Long.numberOfLeadingZeros(heap.maxDirectBlockSize)) -
      (63 - java.lang.Long.numberOfLeadingZeros(heap.startBlockSize))
    var heapOff = 0L
    var idx = 0
    for (row <- 0 until math.min(heap.rootRows, maxDirectRows)) {
      val size = if (row < 2) heap.startBlockSize
        else heap.startBlockSize << (row - 1)
      for (_ <- 0 until heap.tableWidth) {
        if (off >= heapOff && off < heapOff + size) {
          val addr = buf.getLong(childrenAt + idx * 8)
          require(addr != Undef, s"heap offset $off in an unallocated block")
          return (addr, heapOff)
        }
        heapOff += size
        idx += 1
      }
    }
    throw new IllegalArgumentException(
      s"heap offset $off beyond the direct rows of the root indirect block")
  }

  /** Absolute offsets of every record in a v2 B-tree, depth ≤ 1 (a
    * 512-byte leaf holds ~45 link records; depth 1 covers thousands of
    * links — deeper trees don't arise from group link counts). */
  private def v2BtreeRecords(bytes: Array[Byte], buf: ByteBuffer,
      addr: Long): Seq[Int] = {
    val a = addr.toInt
    require(bytes(a) == 'B' && bytes(a + 1) == 'T' && bytes(a + 2) == 'H' &&
      bytes(a + 3) == 'D', "missing BTHD signature")
    require(bytes(a + 4) == 0, s"v2 B-tree version ${bytes(a + 4)}")
    val recordType = bytes(a + 5) & 0xff
    require(recordType == 5,
      s"v2 B-tree record type $recordType (expected 5: link name index)")
    val nodeSize = buf.getInt(a + 6)
    val recordSize = buf.getShort(a + 10) & 0xffff
    val depth = buf.getShort(a + 12) & 0xffff
    val rootAddr = buf.getLong(a + 16)
    val rootNRec = buf.getShort(a + 24) & 0xffff

    def leafRecords(nodeAddr: Long, nRec: Int): Seq[Int] = {
      val n = nodeAddr.toInt
      require(bytes(n) == 'B' && bytes(n + 1) == 'T' && bytes(n + 2) == 'L' &&
        bytes(n + 3) == 'F', "missing BTLF signature")
      (0 until nRec).map(i => n + 6 + i * recordSize)
    }

    depth match {
      case 0 => leafRecords(rootAddr, rootNRec)
      case 1 =>
        val n = rootAddr.toInt
        require(bytes(n) == 'B' && bytes(n + 1) == 'T' && bytes(n + 2) == 'I' &&
          bytes(n + 3) == 'N', "missing BTIN signature")
        // all nRec records first, then nRec+1 child pointers; a child
        // pointer = address(8) + #records, the count sized to hold the
        // max records a leaf can carry (leaf prefix = 10 bytes)
        val maxLeafRec = (nodeSize - 10) / recordSize
        val nRecSize = (64 - java.lang.Long.numberOfLeadingZeros(
          math.max(1, maxLeafRec).toLong) + 7) / 8
        val ptrsAt = n + 6 + rootNRec * recordSize
        val out = mutable.ArrayBuffer.empty[Int]
        for (i <- 0 to rootNRec) {
          val pos = ptrsAt + i * (8 + nRecSize)
          val childAddr = buf.getLong(pos)
          val childN = readUint(buf, pos + 8, nRecSize).toInt
          out ++= leafRecords(childAddr, childN)
        }
        // in-tree records (the internal node's own) precede the pointers
        out ++= (0 until rootNRec).map(i => n + 6 + i * recordSize)
        out.toSeq
      case d => throw new IllegalArgumentException(
        s"v2 B-tree depth $d (group link indexes never exceed depth 1)")
    }
  }

  // ---------------------------------------------------------------------
  // dataset metadata from messages

  private def parseDataset(bytes: Array[Byte], path: String,
      msgs: Seq[Msg]): Dataset = {
    val buf = le(bytes)
    var dims: IndexedSeq[Int] = IndexedSeq.empty
    var dtype: Option[Dtype] = None
    var layout: Option[Layout] = None
    var filters = IndexedSeq.empty[Filter]
    val atts = mutable.LinkedHashMap.empty[String, Attr]
    var fillRaw: Option[(Int, Int)] = None // (offset, size) decoded after dtype

    msgs.foreach { m =>
      m.typ match {
        case 0x01 => dims = parseDataspace(bytes, buf, m.off)
        case 0x03 => dtype = Some(parseDatatype(bytes, buf, m.off))
        case 0x05 => fillRaw = parseFillValue(bytes, buf, m.off)
        case 0x08 => layout = Some(parseLayout(bytes, buf, m.off))
        case 0x0B => filters = parseFilters(bytes, buf, m.off)
        case 0x0C => parseAttribute(bytes, buf, m.off).foreach(a => atts += a.name -> a)
        case _ => // nil, times, symbol placeholders… — irrelevant here
      }
    }
    val dt = dtype.getOrElse(
      throw new IllegalArgumentException(s"dataset $path has no datatype message"))
    val fill = fillRaw.collect { case (off, size) if size > 0 && dt.numeric =>
      decodeElem(bytes, off, dt)
    }
    Dataset(path, dims, dt,
      layout.getOrElse(throw new IllegalArgumentException(s"dataset $path has no layout")),
      filters, atts.toMap, fill)
  }

  private def parseDataspace(bytes: Array[Byte], buf: ByteBuffer,
      off: Int): IndexedSeq[Int] = {
    val version = bytes(off) & 0xff
    val rank = bytes(off + 1) & 0xff
    val dimsAt = version match {
      case 1 => off + 8 // version, rank, flags, 5 reserved
      case 2 => off + 4 // version, rank, flags, type
      case v => throw new IllegalArgumentException(s"dataspace version $v")
    }
    (0 until rank).map(i => buf.getLong(dimsAt + i * 8).toInt)
  }

  private def parseDatatype(bytes: Array[Byte], buf: ByteBuffer,
      off: Int): Dtype = {
    val clazz = bytes(off) & 0x0f
    val bits0 = bytes(off + 1) & 0xff
    val size = buf.getInt(off + 4)
    Dtype(clazz, size, littleEndian = (bits0 & 1) == 0,
      signed = clazz == 0 && (bits0 & 0x08) != 0)
  }

  /** → Some((value offset, value size)) when a fill value is defined. */
  private def parseFillValue(bytes: Array[Byte], buf: ByteBuffer,
      off: Int): Option[(Int, Int)] = (bytes(off) & 0xff) match {
    case 1 =>
      Some((off + 8, buf.getInt(off + 4))).filter(_ => bytes(off + 3) == 1)
    case 2 =>
      if (bytes(off + 3) != 1) None else Some((off + 8, buf.getInt(off + 4)))
    case 3 =>
      val flags = bytes(off + 1) & 0xff
      if ((flags & 0x20) == 0) None else Some((off + 6, buf.getInt(off + 2)))
    case v => throw new IllegalArgumentException(s"fill value version $v")
  }

  private def parseLayout(bytes: Array[Byte], buf: ByteBuffer,
      off: Int): Layout = {
    require(bytes(off) == 3, s"layout message version ${bytes(off)} (only v3)")
    (bytes(off + 1) & 0xff) match {
      case 0 =>
        val size = buf.getShort(off + 2) & 0xffff
        Compact(java.util.Arrays.copyOfRange(bytes, off + 4, off + 4 + size))
      case 1 => Contiguous(buf.getLong(off + 2), buf.getLong(off + 10))
      case 2 =>
        val dim = bytes(off + 2) & 0xff // rank + 1
        val btree = buf.getLong(off + 3)
        val sizes = (0 until dim).map(i => buf.getInt(off + 11 + i * 4))
        Chunked(btree, sizes.dropRight(1), sizes.last)
      case c => throw new IllegalArgumentException(s"layout class $c")
    }
  }

  private def parseFilters(bytes: Array[Byte], buf: ByteBuffer,
      off: Int): IndexedSeq[Filter] = {
    val version = bytes(off) & 0xff
    val n = bytes(off + 1) & 0xff
    var pos = if (version == 1) off + 8 else off + 2
    (0 until n).map { _ =>
      val id = buf.getShort(pos) & 0xffff
      val nameLen =
        if (version == 1 || id >= 256) { val l = buf.getShort(pos + 2) & 0xffff; pos += 2; l }
        else 0
      pos += 2 // id was consumed above; after optional nameLen the cursor sits at flags
      val nClient = buf.getShort(pos + 2) & 0xffff
      pos += 4 // flags + nClient
      val paddedName = if (version == 1) (nameLen + 7) / 8 * 8 else nameLen
      pos += paddedName
      val client = (0 until nClient).map(i => buf.getInt(pos + i * 4))
      pos += nClient * 4
      if (version == 1 && nClient % 2 == 1) pos += 4
      Filter(id, client)
    }
  }

  /** Numeric attributes only; non-numeric datatypes → None. */
  private def parseAttribute(bytes: Array[Byte], buf: ByteBuffer,
      off: Int): Option[Attr] = {
    val version = bytes(off) & 0xff
    val nameSize = buf.getShort(off + 2) & 0xffff
    val dtSize = buf.getShort(off + 4) & 0xffff
    val dsSize = buf.getShort(off + 6) & 0xffff
    val pad = version == 1 // v1 pads name/datatype/dataspace to 8 bytes
    def padded(n: Int) = if (pad) (n + 7) / 8 * 8 else n
    if (version == 2 && (bytes(off + 1) & 0x03) != 0) return None // shared dt/ds
    var pos = off + 8
    if (version == 3) pos += 1 // name character-set encoding
    val name = cString(bytes, pos); pos += padded(nameSize)
    val dt = parseDatatype(bytes, buf, pos); pos += padded(dtSize)
    val dims = parseDataspace(bytes, buf, pos); pos += padded(dsSize)
    if (!dt.numeric) None
    else {
      val n = dims.product.max(1) // scalar dataspace → one element
      Some(Attr(name,
        (0 until n).map(i => decodeElem(bytes, pos + i * dt.size, dt))))
    }
  }

  // ---------------------------------------------------------------------
  // element decode

  private def decodeElem(bytes: Array[Byte], at: Int, dt: Dtype): Double = {
    val buf = ByteBuffer.wrap(bytes, at, dt.size).order(
      if (dt.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    dt.clazz match {
      case 1 => dt.size match {
        case 4 => buf.getFloat.toDouble
        case 8 => buf.getDouble
        case s => throw new IllegalArgumentException(s"float size $s")
      }
      case 0 => (dt.size, dt.signed) match {
        case (1, true) => buf.get.toDouble
        case (1, false) => (buf.get & 0xff).toDouble
        case (2, true) => buf.getShort.toDouble
        case (2, false) => (buf.getShort & 0xffff).toDouble
        case (4, true) => buf.getInt.toDouble
        case (4, false) => (buf.getInt & 0xffffffffL).toDouble
        case (8, _) => buf.getLong.toDouble
        case (s, _) => throw new IllegalArgumentException(s"int size $s")
      }
      case c => throw new IllegalArgumentException(s"datatype class $c is not numeric")
    }
  }

  // ---------------------------------------------------------------------
  // data reads

  /** Full flattened read (row-major), applying chunk filters. */
  def readAll(f: H5File, ds: Dataset): Array[Double] = {
    val n = ds.dims.product.max(1)
    val out = new Array[Double](n)
    ds.fillValue.foreach(fv => java.util.Arrays.fill(out, fv))
    fillFrom(f, ds, out, slab0Only = false)
    out
  }

  private def fillFrom(f: H5File, ds: Dataset, out: Array[Double],
      slab0Only: Boolean): Unit = ds.layout match {
    case Compact(data) =>
      var i = 0
      while (i < out.length) { out(i) = decodeElem(data, i * ds.dtype.size, ds.dtype); i += 1 }
    case Contiguous(addr, _) =>
      require(addr != Undef, s"dataset ${ds.path} has no allocated storage")
      // row-major: a leading-dim slab 0 is exactly the first out.length elems
      var i = 0
      while (i < out.length) {
        out(i) = decodeElem(f.bytes, (addr + i.toLong * ds.dtype.size).toInt, ds.dtype)
        i += 1
      }
    case Chunked(btree, chunkDims, elemSize) =>
      require(btree != Undef, s"dataset ${ds.path} has no allocated chunks")
      val rank = ds.dims.length
      require(chunkDims.length == rank,
        s"chunk rank ${chunkDims.length} != dataset rank $rank")
      chunkEntries(f.bytes, btree, rank).foreach {
        case (size, mask, offsets, addr) =>
          if (!slab0Only || rank < 3 || offsets(0) < chunkDims(0))
            scatterChunk(f, ds, chunkDims, elemSize, size, mask, offsets,
              addr, out, slab0Only)
      }
  }

  /** v1 chunk B-tree (node type 1) → (chunk bytes, filter mask, chunk
    * offsets in element space, address) per allocated chunk. */
  private def chunkEntries(bytes: Array[Byte], addr: Long,
      rank: Int): Seq[(Int, Int, IndexedSeq[Long], Long)] = {
    val buf = le(bytes)
    val a = addr.toInt
    require(bytes(a) == 'T' && bytes(a + 1) == 'R' && bytes(a + 2) == 'E' &&
      bytes(a + 3) == 'E', "missing TREE signature (chunk index)")
    require(bytes(a + 4) == 1, s"B-tree node type ${bytes(a + 4)} (expected 1)")
    val level = bytes(a + 5) & 0xff
    val n = buf.getShort(a + 6) & 0xffff
    // key: chunk size u32, filter mask u32, then (rank+1) u64 offsets
    val keySize = 8 + 8 * (rank + 1)
    (0 until n).flatMap { i =>
      val k = a + 24 + i * (keySize + 8)
      val child = buf.getLong(k + keySize)
      if (level > 0) chunkEntries(bytes, child, rank)
      else Seq((buf.getInt(k), buf.getInt(k + 4),
        (0 until rank).map(d => buf.getLong(k + 8 + d * 8)): IndexedSeq[Long],
        child))
    }
  }

  private def scatterChunk(f: H5File, ds: Dataset,
      chunkDims: IndexedSeq[Int], elemSize: Int, storedSize: Int, mask: Int,
      offsets: IndexedSeq[Long], addr: Long, out: Array[Double],
      slab0Only: Boolean): Unit = {
    val rank = ds.dims.length
    val chunkElems = chunkDims.product
    var data = java.util.Arrays.copyOfRange(f.bytes, addr.toInt,
      addr.toInt + storedSize)
    // filters apply in pipeline order on write → reverse on read; a set
    // mask bit means that filter was skipped for this chunk
    ds.filters.zipWithIndex.reverse.foreach { case (flt, i) =>
      if ((mask & (1 << i)) == 0) flt.id match {
        case 1 => data = inflate(data, chunkElems * elemSize)
        case 2 => data = unshuffle(data, flt.client.headOption.getOrElse(elemSize))
        case other => throw new UnsupportedOperationException(
          s"HDF5 filter id $other (deflate and shuffle are supported)")
      }
    }
    // scatter with clipping (edge chunks run past the dataset dims);
    // for slab0Only (3-D → first slab) keep only leading-index-0 elems
    val sliceRank = if (slab0Only && rank == 3) 1 else 0
    val outDims = ds.dims.drop(sliceRank)
    val outStrides = outDims.scanRight(1)((d, s) => d * s).drop(1)
    val idx = new Array[Long](rank)
    var i = 0
    while (i < chunkElems) {
      // decompose i into chunk-local coords (row-major)
      var rem = i; var d = rank - 1; var ok = true
      while (d >= 0) { idx(d) = offsets(d) + rem % chunkDims(d); rem /= chunkDims(d); d -= 1 }
      d = 0
      while (d < rank && ok) { if (idx(d) >= ds.dims(d)) ok = false; d += 1 }
      if (ok && sliceRank == 1 && idx(0) != 0) ok = false
      if (ok) {
        var flat = 0; var j = sliceRank
        while (j < rank) { flat += idx(j).toInt * outStrides(j - sliceRank); j += 1 }
        out(flat) = decodeElem(data, i * ds.dtype.size, ds.dtype)
      }
      i += 1
    }
  }

  def inflate(data: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new Array[Byte](expected)
    var off = 0
    while (!inf.finished() && off < expected)
      off += inf.inflate(out, off, expected - off)
    inf.end()
    out
  }

  /** Reverse of the HDF5 shuffle filter: input holds all first bytes,
    * then all second bytes, … of each `elemSize`-wide element. */
  def unshuffle(data: Array[Byte], elemSize: Int): Array[Byte] = {
    if (elemSize <= 1) return data
    val n = data.length / elemSize
    val out = new Array[Byte](data.length)
    var b = 0
    while (b < elemSize) {
      var i = 0
      while (i < n) { out(i * elemSize + b) = data(b * n + i); i += 1 }
      b += 1
    }
    out
  }

  // ---------------------------------------------------------------------
  // the cogify-facing surface (mirrors Netcdf.readCoord / readGrid)

  /** Full read of a 1-D (coordinate) dataset — handler.py:98-101 takes
    * min/max of these for the extent. */
  def readCoord(f: H5File, path: String): Array[Double] = {
    val ds = f.dataset(path)
    require(ds.dims.length == 1, s"$path is not 1-D (dims ${ds.dims.mkString("x")})")
    readAll(f, ds)
  }

  /** Read a 2-D dataset — or the first slab of a 3-D one, the way the
    * reference takes `variable[0]` of a (time, y, x) cube
    * (handler.py:90-91) — as a float grid. `_FillValue` (attribute
    * first, fill-value message as fallback) becomes the grid's nodata;
    * `scale_factor`/`add_offset` apply to non-fill cells (the netCDF4
    * auto-scaling default), fill cells keep the raw sentinel. */
  def readGrid(f: H5File, path: String): Grid = {
    val ds = f.dataset(path)
    val (h, w) = ds.dims match {
      case IndexedSeq(hh, ww) => (hh, ww)
      case IndexedSeq(_, hh, ww) => (hh, ww)
      case other => throw new IllegalArgumentException(
        s"$path has shape ${other.mkString("x")}; expected 2-D or 3-D")
    }
    val raw = new Array[Double](h * w)
    val fill = ds.atts.get("_FillValue").map(_.number).orElse(ds.fillValue)
    fill.foreach(fv => java.util.Arrays.fill(raw, fv))
    fillFrom(f, ds, raw, slab0Only = ds.dims.length == 3)
    val scale = ds.atts.get("scale_factor").map(_.number)
    val offset = ds.atts.get("add_offset").map(_.number)
    val data = new Array[Float](h * w)
    var i = 0
    while (i < raw.length) {
      val x = raw(i)
      data(i) =
        if (fill.contains(x)) x.toFloat
        else (x * scale.getOrElse(1.0) + offset.getOrElse(0.0)).toFloat
      i += 1
    }
    Grid(w, h, data, fill.map(_.toFloat))
  }
}
