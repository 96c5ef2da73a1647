package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Deflater

import scala.collection.mutable.ArrayBuffer

import graft.kernel.{Cogify, Hdf5, Tiff}
import graft.kernel.Cogify.{CogifyTask, CollectionConfig, FetchGridReader}
import graft.sources.Fetch

/** HDF5 reader (reference A8's NetCDF-4 decode stage,
  * cogify/handler.py:84-101) against byte streams hand-built from the
  * public HDF5 File Format Specification grammar — the builder below
  * writes the external representation directly (superblock, symbol-table
  * group machinery, v1/v2 object headers, chunk B-trees, shuffle/deflate
  * filter payloads) so the parser is checked against the spec, not
  * against itself. Mirrors NetcdfSpec's approach for the classic format.
  */
class Hdf5Spec extends SparkSuite {

  import Hdf5Spec._

  // the NetcdfSpec fixture values, as an HDF5 container: q is 3x4 int16
  // with a fill sentinel, scaled by 0.5 and offset by 10 on read
  private def fixtureA: Array[Byte] = build(Seq(
    BData("lat", Seq(3), F64LE, Seq(10, 20, 30)),
    BData("lon", Seq(4), F32LE, Seq(100, 101, 102, 103)),
    BData("q", Seq(3, 4), I16LE,
      Seq(0, 1, 2, 3, 4, -9, 6, 7, 8, 9, 10, 11),
      atts = Seq(BAtt("_FillValue", I16LE, Seq(-9)),
        BAtt("scale_factor", F64LE, Seq(0.5)),
        BAtt("add_offset", F64LE, Seq(10.0))),
      chunk = Some(Seq(2, 3)), shuffle = true, deflate = true,
      splitHeader = true), // exercises the v1 continuation block
    BGroup("geo", Seq(
      BData("cube", Seq(2, 2, 3), F32BE,
        Seq(1, 2, 3, 4, 5, 6, /* slab 1: */ 7, 8, 9, 10, 11, 12)),
      BData("z", Seq(2, 2), U8, Seq(7, 8, 9, 10),
        chunk = Some(Seq(2, 2))))))) // chunked, no filters

  test("v0 superblock: groups, contiguous + chunked, filters, attributes") {
    val f = Hdf5.parse(fixtureA)
    assert(f.datasets.keySet == Set("lat", "lon", "q", "geo/cube", "geo/z"))

    assert(Hdf5.readCoord(f, "lat").toSeq == Seq(10.0, 20.0, 30.0))
    assert(Hdf5.readCoord(f, "lon").toSeq == Seq(100.0, 101.0, 102.0, 103.0))

    val q = f.dataset("q")
    assert(q.dims == IndexedSeq(3, 4))
    assert(q.layout.isInstanceOf[Hdf5.Chunked])
    assert(q.filters.map(_.id) == IndexedSeq(2, 1)) // shuffle then deflate
    assert(q.atts("_FillValue").number == -9.0)

    val g = Hdf5.readGrid(f, "q")
    assert(g.width == 4 && g.height == 3)
    assert(g.nodata.contains(-9f))
    assert(g(1, 1) == -9f) // fill kept raw, not scaled
    assert(g(0, 0) == 10f && g(0, 3) == 11.5f && g(2, 3) == 15.5f) // x*0.5+10

    // 3-D → slab 0 (handler.py:90-91 takes variable[0]); BE floats decode
    val cube = Hdf5.readGrid(f, "geo/cube")
    assert(cube.width == 3 && cube.height == 2)
    assert(cube.data.toSeq == Seq(1f, 2f, 3f, 4f, 5f, 6f))

    val z = Hdf5.readGrid(f, "geo/z")
    assert(z.data.toSeq == Seq(7f, 8f, 9f, 10f))
  }

  test("v2 superblock, v2 object headers, link-message groups") {
    val bytes = build(Seq(
      BGroup("g", Seq(
        BData("v", Seq(2, 3), F32LE, Seq(1, 2, 3, 4, 5, 6),
          atts = Seq(BAtt("scale_factor", F64LE, Seq(2.0))),
          fill = Some(-1.0))))), v2 = true)
    val f = Hdf5.parse(bytes)
    assert(f.datasets.keySet == Set("g/v"))
    val ds = f.dataset("g/v")
    assert(ds.fillValue.contains(-1.0)) // v3 fill-value message
    val g = Hdf5.readGrid(f, "g/v")
    assert(g.width == 3 && g.height == 2)
    assert(g.data.toSeq == Seq(2f, 4f, 6f, 8f, 10f, 12f)) // x*2.0
    assert(g.nodata.contains(-1f))
  }

  test("dense link storage: many-variable group parses (depth-0 index, direct-block heap)") {
    // 14 links — past the library's compact→dense switch point (~8)
    val names = (1 to 12).map(i => f"var$i%02d")
    val kids = Seq(
      BData("lat", Seq(3), F64LE, Seq(10, 20, 30)),
      BData("lon", Seq(4), F64LE, Seq(100, 101, 102, 103))) ++
      names.zipWithIndex.map { case (n, i) =>
        BData(n, Seq(3, 4), F32LE, (0 until 12).map(j => (i * 100 + j).toDouble))
      }
    val f = Hdf5.parse(build(Seq(BGroup("science", kids, dense = true)), v2 = true))
    assert(f.datasets.keySet ==
      (names.map(n => s"science/$n").toSet + "science/lat" + "science/lon"))
    names.zipWithIndex.foreach { case (n, i) =>
      val g = Hdf5.readGrid(f, s"science/$n")
      assert(g.width == 4 && g.height == 3)
      assert(g.data.toSeq == (0 until 12).map(j => (i * 100 + j).toFloat))
    }
    assert(Hdf5.readCoord(f, "science/lat").toSeq == Seq(10.0, 20.0, 30.0))
  }

  test("dense link storage: depth-1 name index and root-indirect heap blocks") {
    // tiny node/block sizes force the scale structures a small fixture
    // would otherwise never hit: BTIN over several BTLF leaves (node 64
    // → 4 records per leaf) and an FHIB root whose direct blocks double
    // (start 64 → rows of 64,64,128,…)
    val names = (1 to 30).map(i => f"d$i%02d")
    val kids = names.zipWithIndex.map { case (n, i) =>
      BData(n, Seq(2), F32LE, Seq(i.toDouble, i + 0.5))
    }
    val f = Hdf5.parse(build(
      Seq(BGroup("g", kids, dense = true, btreeNodeSize = 64, startBlockSize = 64)),
      v2 = true))
    assert(f.datasets.keySet == names.map(n => s"g/$n").toSet)
    names.zipWithIndex.foreach { case (n, i) =>
      assert(Hdf5.readCoord(f, s"g/$n").toSeq == Seq(i.toDouble, i + 0.5))
    }
  }

  test("dense link storage: cogify decodes a many-variable granule end to end") {
    import spark.implicits._
    val lons = Seq(100.25, 100.75, 101.25, 101.75, 102.25, 102.75)
    val lats = Seq(10.25, 10.75, 11.25, 11.75)
    val extra = (1 to 9).map(i => BData(f"aux$i%02d", Seq(4, 6), F32LE,
      (0 until 24).map(j => (i * 1000 + j).toDouble)))
    val vals = Seq.tabulate(24)(i => i.toDouble)
    val bytes = build(Seq(
      BGroup("science",
        Seq(BData("lat", Seq(4), F64LE, lats),
          BData("lon", Seq(6), F64LE, lons),
          BData("precip", Seq(4, 6), F32LE, vals,
            atts = Seq(BAtt("_FillValue", F32LE, Seq(-9999.0))),
            chunk = Some(Seq(3, 4)), shuffle = true, deflate = true)) ++ extra,
        dense = true)), v2 = true)
    val src = new java.io.File(tempDir("h5dense"), "granule.nc4")
    java.nio.file.Files.write(src.toPath, bytes)

    val out = tempDir("h5densecog").getAbsolutePath
    val results = Cogify.run(
      Seq(CogifyTask("H5D", src.getAbsolutePath, Some("g"), upload = false)).toDS(),
      Map("H5D" -> CollectionConfig("precip", group = Some("science"),
        xVariable = Some("lon"), yVariable = Some("lat"),
        useTopLeftRecipe = true)),
      s"file:$out",
      mkReader = () => new FetchGridReader(() => new Fetch.RoutingFetcher()))
      .collect()
    assert(results.length == 1 && results.head.error.isEmpty, results.toSeq)
    assert(results.head.width == 6 && results.head.height == 4)
    val (grid, _) = Tiff.readGrid(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/H5D/granule.nc4.cog.tif")))
    assert(grid.data.toSeq == vals.map(_.toFloat))
    assert(grid.nodata.contains(-9999f))
  }

  test("cogify kernel decodes an HDF5/NetCDF-4 granule end to end") {
    import spark.implicits._
    // 4x6 precip grid with real coordinate variables (non-global extent),
    // the NetCDF-4 layout: variables in a group, chunked + deflate
    val vals = Seq.tabulate(24)(i => i.toDouble)
    val lons = Seq(100.25, 100.75, 101.25, 101.75, 102.25, 102.75)
    val lats = Seq(10.25, 10.75, 11.25, 11.75)
    val bytes = build(Seq(
      BGroup("science", Seq(
        BData("lat", Seq(4), F64LE, lats),
        BData("lon", Seq(6), F64LE, lons),
        BData("precip", Seq(4, 6), F32LE, vals,
          atts = Seq(BAtt("_FillValue", F32LE, Seq(-9999.0))),
          chunk = Some(Seq(3, 4)), shuffle = true, deflate = true)))))
    val src = new java.io.File(tempDir("h5"), "granule.nc4")
    java.nio.file.Files.write(src.toPath, bytes)

    val out = tempDir("h5cog").getAbsolutePath
    val results = Cogify.run(
      Seq(CogifyTask("H5C", src.getAbsolutePath, Some("g"), upload = false)).toDS(),
      Map("H5C" -> CollectionConfig("precip", group = Some("science"),
        xVariable = Some("lon"), yVariable = Some("lat"),
        useTopLeftRecipe = true)),
      s"file:$out",
      mkReader = () => new FetchGridReader(() => new Fetch.RoutingFetcher()))
      .collect()
    assert(results.length == 1 && results.head.error.isEmpty, results.toSeq)
    assert(results.head.width == 6 && results.head.height == 4)
    assert(math.abs(results.head.affine.head - (102.75 - 100.25) / 6) < 1e-12)

    val (grid, _) = Tiff.readGrid(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/H5C/granule.nc4.cog.tif")))
    assert(grid.data.toSeq == vals.map(_.toFloat))
    assert(grid.nodata.contains(-9999f))
  }

  test("randomized: 25 seeded spec-grammar files parse back exactly") {
    val rnd = new scala.util.Random(0x85DF5L)
    val types = Seq(F32LE, F32BE, F64LE, I16LE, I16BE, I32LE, U8)
    for (iter <- 1 to 25) {
      val h = 1 + rnd.nextInt(12)
      val w = 1 + rnd.nextInt(15)
      val t = types(rnd.nextInt(types.size))
      def vals(n: Int): Seq[Double] =
        (0 until n).map(_ => if (t.clazz == 0)
          (if (t == U8) rnd.nextInt(250) else rnd.nextInt(100) - 50).toDouble
          else (rnd.nextInt(4000) - 2000) / 8.0)
      val grid = vals(h * w)
      val chunk = if (rnd.nextBoolean())
        Some(Seq(1 + rnd.nextInt(h + 2), 1 + rnd.nextInt(w + 2))) else None
      val (shuf, defl) = (chunk.isDefined && rnd.nextBoolean(),
        chunk.isDefined && rnd.nextBoolean())
      val v2 = rnd.nextBoolean()
      val bytes = build(Seq(
        BData("g", Seq(h, w), t, grid, chunk = chunk,
          shuffle = shuf, deflate = defl)), v2 = v2)
      val f = Hdf5.parse(bytes)
      val got = Hdf5.readGrid(f, "g")
      assert(got.width == w && got.height == h, s"iter $iter")
      assert(got.data.toSeq == grid.map(_.toFloat),
        s"iter $iter $t ${h}x$w chunk=$chunk shuf=$shuf defl=$defl v2=$v2")
    }
  }
}

/** Spec-grammar builder for HDF5 bytes (test-side only). Writes:
  * superblock v0 (symbol-table root) or v2 (direct root object header);
  * v1 object headers (with optional continuation split) or v2 `OHDR`
  * compact headers; v1 group B-tree + local heap + SNOD or link
  * messages; contiguous and chunked (v1 B-tree node type 1) layouts;
  * shuffle + deflate filter chains; attribute/fill/datatype/dataspace
  * messages in both version families.
  */
object Hdf5Spec {

  sealed trait BType {
    def size: Int; def le: Boolean; def clazz: Int; def signed: Boolean
  }
  case object F32LE extends BType { val size = 4; val le = true; val clazz = 1; val signed = false }
  case object F32BE extends BType { val size = 4; val le = false; val clazz = 1; val signed = false }
  case object F64LE extends BType { val size = 8; val le = true; val clazz = 1; val signed = false }
  case object I16LE extends BType { val size = 2; val le = true; val clazz = 0; val signed = true }
  case object I16BE extends BType { val size = 2; val le = false; val clazz = 0; val signed = true }
  case object I32LE extends BType { val size = 4; val le = true; val clazz = 0; val signed = true }
  case object U8 extends BType { val size = 1; val le = true; val clazz = 0; val signed = false }

  final case class BAtt(name: String, dtype: BType, values: Seq[Double])

  sealed trait BNode { def name: String }
  final case class BData(name: String, dims: Seq[Int], dtype: BType,
      values: Seq[Double], atts: Seq[BAtt] = Nil, chunk: Option[Seq[Int]] = None,
      shuffle: Boolean = false, deflate: Boolean = false,
      fill: Option[Double] = None, splitHeader: Boolean = false) extends BNode
  /** `dense` stores the group's links in a fractal heap + name-index v2
    * B-tree (the netCDF-4 library's switch once link counts grow);
    * `btreeNodeSize`/`startBlockSize` shrink the structures so a small
    * fixture exercises the depth-1 B-tree and root-indirect-heap paths. */
  final case class BGroup(name: String, children: Seq[BNode],
      dense: Boolean = false, btreeNodeSize: Int = 512,
      startBlockSize: Int = 512) extends BNode

  // ---------------------------------------------------------------------
  // little-endian byte sink with patching

  private final class W {
    val buf = ArrayBuffer.empty[Byte]
    def pos: Int = buf.length
    def u8(v: Int): Unit = buf += v.toByte
    def u16(v: Int): Unit = { u8(v); u8(v >>> 8) }
    def u32(v: Long): Unit = { u8(v.toInt); u8((v >>> 8).toInt); u8((v >>> 16).toInt); u8((v >>> 24).toInt) }
    def u64(v: Long): Unit = { u32(v & 0xffffffffL); u32(v >>> 32) }
    def bytes(b: Array[Byte]): Unit = buf ++= b
    def ascii(s: String): Unit = bytes(s.getBytes("US-ASCII"))
    def zeros(n: Int): Unit = buf ++= new Array[Byte](n)
    def patchU64(at: Int, v: Long): Unit =
      (0 until 8).foreach(i => buf(at + i) = (v >>> (8 * i)).toByte)
    def toArray: Array[Byte] = buf.toArray
  }

  private def pad8(b: Array[Byte]): Array[Byte] =
    if (b.length % 8 == 0) b else b ++ new Array[Byte]((8 - b.length % 8) % 8)

  // ---------------------------------------------------------------------
  // element / datatype / dataspace encodings

  private def enc(t: BType, vals: Seq[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(vals.size * t.size)
      .order(if (t.le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    vals.foreach { v =>
      t match {
        case F32LE | F32BE => bb.putFloat(v.toFloat)
        case F64LE => bb.putDouble(v)
        case I16LE | I16BE => bb.putShort(v.toInt.toShort)
        case I32LE => bb.putInt(v.toInt)
        case U8 => bb.put(v.toInt.toByte)
      }
    }
    bb.array()
  }

  private def dtypeBytes(t: BType): Array[Byte] = {
    val bb = ByteBuffer.allocate(if (t.clazz == 1) 20 else 12)
      .order(ByteOrder.LITTLE_ENDIAN)
    val order = if (t.le) 0 else 1
    bb.put(((1 << 4) | t.clazz).toByte) // version 1, class
    if (t.clazz == 1) {
      bb.put((order | 0x20).toByte) // byte order; implied-msb mantissa norm
      bb.put((t.size * 8 - 1).toByte) // sign bit position
      bb.put(0.toByte)
      bb.putInt(t.size)
      bb.putShort(0) // bit offset
      bb.putShort((t.size * 8).toShort) // precision
      if (t.size == 4) { bb.put(23.toByte); bb.put(8.toByte); bb.put(0.toByte); bb.put(23.toByte); bb.putInt(127) }
      else { bb.put(52.toByte); bb.put(11.toByte); bb.put(0.toByte); bb.put(52.toByte); bb.putInt(1023) }
    } else {
      bb.put((order | (if (t.signed) 0x08 else 0)).toByte)
      bb.put(0.toByte); bb.put(0.toByte)
      bb.putInt(t.size)
      bb.putShort(0) // bit offset
      bb.putShort((t.size * 8).toShort) // precision
    }
    bb.array()
  }

  /** v1 simple dataspace (rank 0 = scalar); v2 form for the v2 family. */
  private def dataspaceBytes(dims: Seq[Int], v2: Boolean): Array[Byte] = {
    val bb = ByteBuffer.allocate((if (v2) 4 else 8) + dims.size * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    if (v2) { bb.put(2.toByte); bb.put(dims.size.toByte); bb.put(0.toByte)
      bb.put((if (dims.isEmpty) 0 else 1).toByte) } // scalar vs simple
    else { bb.put(1.toByte); bb.put(dims.size.toByte); bb.put(0.toByte)
      bb.put(new Array[Byte](5)) }
    dims.foreach(d => bb.putLong(d.toLong))
    bb.array()
  }

  // ---------------------------------------------------------------------
  // header messages

  private def attrMsg(a: BAtt, v2: Boolean): Array[Byte] = {
    val nameB = a.name.getBytes("US-ASCII") :+ 0.toByte
    val dt = dtypeBytes(a.dtype)
    val ds = dataspaceBytes(if (a.values.size == 1) Nil else Seq(a.values.size), v2)
    val data = enc(a.dtype, a.values)
    val bb = ArrayBuffer.empty[Byte]
    if (v2) { // version 3: no field padding, plus a charset byte
      bb += 3; bb += 0
      bb ++= le16(nameB.length); bb ++= le16(dt.length); bb ++= le16(ds.length)
      bb += 0 // name character-set encoding (ASCII)
      bb ++= nameB; bb ++= dt; bb ++= ds; bb ++= data
    } else { // version 1: name/datatype/dataspace padded to 8
      bb += 1; bb += 0
      bb ++= le16(nameB.length); bb ++= le16(dt.length); bb ++= le16(ds.length)
      bb ++= pad8(nameB); bb ++= pad8(dt); bb ++= pad8(ds); bb ++= data
    }
    bb.toArray
  }

  private def le16(v: Int): Array[Byte] = Array(v.toByte, (v >>> 8).toByte)
  private def le32(v: Long): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
  private def le64(v: Long): Array[Byte] = le32(v & 0xffffffffL) ++ le32(v >>> 32)

  private def fillMsg(t: BType, fill: Option[Double], v2: Boolean): Array[Byte] =
    if (v2) fill match { // version 3
      case Some(f) => Array[Byte](3, 0x22) ++ le32(t.size) ++ enc(t, Seq(f))
      case None => Array[Byte](3, 0x02) // alloc time only, undefined
    } else fill match { // version 2
      case Some(f) => Array[Byte](2, 2, 0, 1) ++ le32(t.size) ++ enc(t, Seq(f))
      case None => Array[Byte](2, 2, 0, 0)
    }

  // ---------------------------------------------------------------------
  // object headers

  /** v1 object header; optionally split after the first two messages
    * into a continuation block (written BEFORE the header, so its
    * address is known). Returns the header address. */
  private def objectHeaderV1(w: W, msgs: Seq[(Int, Array[Byte])],
      split: Boolean): Long = {
    def msgBytes(ms: Seq[(Int, Array[Byte])]): Array[Byte] = {
      val bb = ArrayBuffer.empty[Byte]
      ms.foreach { case (typ, data0) =>
        val data = pad8(data0)
        bb ++= le16(typ); bb ++= le16(data.length); bb += 0; bb ++= Array[Byte](0, 0, 0)
        bb ++= data
      }
      bb.toArray
    }
    val (head, contMsg) =
      if (!split || msgs.size <= 2) (msgs, None)
      else {
        val contBody = msgBytes(msgs.drop(2))
        val contAddr = w.pos
        w.bytes(contBody)
        (msgs.take(2), Some(0x10 -> (le64(contAddr) ++ le64(contBody.length))))
      }
    val body = msgBytes(head ++ contMsg)
    val addr = w.pos
    w.u8(1); w.u8(0)
    w.u16(msgs.size + (if (contMsg.isDefined) 1 else 0))
    w.u32(1) // reference count
    w.u32(body.length)
    w.u32(0) // pad: messages start 8-byte aligned after the 12-byte prefix
    w.bytes(body)
    addr
  }

  /** v2 `OHDR` header (flags: 2-byte chunk-0 size), unverified checksum. */
  private def objectHeaderV2(w: W, msgs: Seq[(Int, Array[Byte])]): Long = {
    val bb = ArrayBuffer.empty[Byte]
    msgs.foreach { case (typ, data) =>
      bb += typ.toByte; bb ++= le16(data.length); bb += 0; bb ++= data
    }
    val addr = w.pos
    w.ascii("OHDR"); w.u8(2); w.u8(0x01)
    w.u16(bb.length)
    w.bytes(bb.toArray)
    w.u32(0) // checksum (reader does not verify)
    addr
  }

  // ---------------------------------------------------------------------
  // dataset + group writers

  private def shuffleBytes(raw: Array[Byte], elemSize: Int): Array[Byte] = {
    if (elemSize <= 1) return raw
    val n = raw.length / elemSize
    val out = new Array[Byte](raw.length)
    var b = 0
    while (b < elemSize) {
      var i = 0
      while (i < n) { out(b * n + i) = raw(i * elemSize + b); i += 1 }
      b += 1
    }
    out
  }

  private def deflateBytes(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater(6)
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val chunk = new Array[Byte](8192)
    while (!d.finished()) out.write(chunk, 0, d.deflate(chunk))
    d.end()
    out.toByteArray
  }

  private def writeDataset(w: W, d: BData, v2: Boolean): Long = {
    val rank = d.dims.size
    val msgs = ArrayBuffer.empty[(Int, Array[Byte])]
    msgs += 0x01 -> dataspaceBytes(d.dims, v2)
    msgs += 0x03 -> dtypeBytes(d.dtype)
    msgs += 0x05 -> fillMsg(d.dtype, d.fill, v2)

    d.chunk match {
      case None =>
        val data = enc(d.dtype, d.values)
        val addr = w.pos
        w.bytes(data)
        msgs += 0x08 -> (Array[Byte](3, 1) ++ le64(addr) ++ le64(data.length))
      case Some(cd) =>
        require(cd.size == rank)
        // chunks in row-major order of their grid position
        val counts = d.dims.zip(cd).map { case (n, c) => (n + c - 1) / c }
        val chunkElems = cd.product
        val entries = ArrayBuffer.empty[(Seq[Long], Int, Long)]
        def emit(pos: List[Int], dim: Int): Unit =
          if (dim == rank) {
            val offsets = pos.reverse.zip(cd).map { case (p, c) => p.toLong * c }
            val vals = (0 until chunkElems).map { i =>
              var rem = i
              val local = new Array[Int](rank)
              var k = rank - 1
              while (k >= 0) { local(k) = rem % cd(k); rem /= cd(k); k -= 1 }
              val global = offsets.zip(local).map { case (o, l) => o + l }
              if (global.zip(d.dims).forall { case (g, n) => g < n }) {
                var flat = 0L
                global.zip(d.dims).foreach { case (g, n) => flat = flat * n + g }
                d.values(flat.toInt)
              } else d.fill.getOrElse(0.0)
            }
            var raw = enc(d.dtype, vals)
            if (d.shuffle) raw = shuffleBytes(raw, d.dtype.size)
            if (d.deflate) raw = deflateBytes(raw)
            val addr = w.pos
            w.bytes(raw)
            entries += ((offsets, raw.length, addr))
          } else (0 until counts(dim)).foreach(p => emit(p :: pos, dim + 1))
        emit(Nil, 0)
        // v1 B-tree, node type 1, single leaf
        val btreeAddr = w.pos
        w.ascii("TREE"); w.u8(1); w.u8(0); w.u16(entries.size)
        w.u64(-1L); w.u64(-1L)
        entries.foreach { case (offsets, size, addr) =>
          w.u32(size); w.u32(0)
          offsets.foreach(w.u64); w.u64(0) // the element-size dimension
          w.u64(addr)
        }
        // final key: one beyond the last chunk in every dimension
        w.u32(0); w.u32(0)
        d.dims.foreach(n => w.u64(n.toLong)); w.u64(0)

        msgs += 0x08 -> (Array[Byte](3, 2, (rank + 1).toByte) ++ le64(btreeAddr) ++
          cd.flatMap(c => le32(c)).toArray ++ le32(d.dtype.size))
        val filters = ArrayBuffer.empty[Byte]
        val fs = (if (d.shuffle) Seq((2, Seq(d.dtype.size))) else Nil) ++
          (if (d.deflate) Seq((1, Seq(6))) else Nil)
        if (fs.nonEmpty) {
          filters += 1; filters += fs.size.toByte
          filters ++= Array[Byte](0, 0, 0, 0, 0, 0)
          fs.foreach { case (id, client) =>
            filters ++= le16(id); filters ++= le16(0) // name length 0
            filters ++= le16(0) // flags
            filters ++= le16(client.size)
            client.foreach(c => filters ++= le32(c))
            if (client.size % 2 == 1) filters ++= le32(0)
          }
          msgs += 0x0B -> filters.toArray
        }
    }
    d.atts.foreach(a => msgs += 0x0C -> attrMsg(a, v2))
    if (v2) objectHeaderV2(w, msgs.toSeq)
    else objectHeaderV1(w, msgs.toSeq, d.splitHeader)
  }

  private def writeNode(w: W, node: BNode, v2: Boolean): Long = node match {
    case d: BData => writeDataset(w, d, v2)
    case g: BGroup => writeGroup(w, g, v2)
  }

  /** Bob Jenkins' lookup3 `hashlittle` (public domain; the checksum the
    * HDF5 spec names for v2 B-tree name hashing), initval 0. The reader
    * enumerates records rather than searching, so the hash only has to
    * be deterministic — but writing the real one keeps the fixture
    * byte-faithful to what the library writes. */
  private def lookup3(data: Array[Byte]): Long = {
    def rot(x: Int, k: Int): Int = (x << k) | (x >>> (32 - k))
    var a = 0xdeadbeef + data.length
    var b = a; var c = a
    var i = 0; var len = data.length
    def u(j: Int): Int = data(j) & 0xff
    def word(j: Int, n: Int): Int =
      (0 until n).map(k => u(j + k) << (8 * k)).foldLeft(0)(_ | _)
    while (len > 12) {
      a += word(i, 4); b += word(i + 4, 4); c += word(i + 8, 4)
      a -= c; a ^= rot(c, 4); c += b
      b -= a; b ^= rot(a, 6); a += c
      c -= b; c ^= rot(b, 8); b += a
      a -= c; a ^= rot(c, 16); c += b
      b -= a; b ^= rot(a, 19); a += c
      c -= b; c ^= rot(b, 4); b += a
      i += 12; len -= 12
    }
    if (len > 0) {
      a += word(i, math.min(len, 4))
      if (len > 4) b += word(i + 4, math.min(len - 4, 4))
      if (len > 8) c += word(i + 8, len - 8)
      c ^= b; c -= rot(b, 14)
      a ^= c; a -= rot(c, 11)
      b ^= a; b -= rot(a, 25)
      c ^= b; c -= rot(b, 16)
      a ^= c; a -= rot(c, 4)
      b ^= a; b -= rot(a, 14)
      c ^= b; c -= rot(b, 24)
    }
    c & 0xffffffffL
  }

  /** Dense link storage: link messages as managed fractal-heap objects,
    * indexed by a type-5 v2 B-tree. Small `startBlockSize` spills the
    * heap into a root indirect block (FHIB); small `btreeNodeSize`
    * forces a depth-1 tree (BTIN root over BTLF leaves). */
  private def writeDenseGroup(w: W, g: BGroup,
      kids: Seq[(String, Long)]): Long = {
    val heapIdLen = 7 // 1 flag + 4 offset (32-bit heap) + 2 length
    val linkMsgs = kids.map { case (name, addr) =>
      val nameB = name.getBytes("UTF-8")
      name -> (Array[Byte](1, 0, nameB.length.toByte) ++ nameB ++ le64(addr))
    }
    val dblockHeader = 4 + 1 + 8 + 4 // FHDB sig, version, heap addr, offset
    val startSize = g.startBlockSize.toLong
    val tableWidth = 4

    // ---- fractal heap header (root block address patched below)
    val frhpAddr = w.pos
    w.ascii("FRHP"); w.u8(0)
    w.u16(heapIdLen); w.u16(0) // ID length, no I/O filters
    w.u8(0) // flags: no checksummed direct blocks
    w.u32(4096) // max managed object size
    w.u64(0); w.u64(-1L) // next huge ID, huge B-tree
    w.u64(0); w.u64(-1L) // free space, free-space manager
    w.u64(0); w.u64(0); w.u64(0) // managed / allocated / iterator offset
    w.u64(linkMsgs.size.toLong) // managed object count
    w.u64(0); w.u64(0); w.u64(0); w.u64(0) // huge/tiny sizes and counts
    w.u16(tableWidth)
    w.u64(startSize); w.u64(65536L) // start / max direct block size
    w.u16(32) // max heap size (bits) → 4-byte heap offsets
    w.u16(1) // starting rows in root indirect block
    val rootBlockAt = w.pos; w.u64(0) // root block address (patched)
    val curRowsAt = w.pos; w.u16(0) // rows in root indirect (patched)
    w.u32(0) // checksum (reader does not verify)

    // ---- pack objects into direct blocks of doubling-table sizes
    def blockSizeOf(row: Int): Long =
      if (row < 2) startSize else startSize << (row - 1)
    // (heap offset, Seq(name, msg, offsetInBlock))
    val blocks = ArrayBuffer.empty[(Int, Long, ArrayBuffer[(String, Array[Byte], Long)])]
    var blockIdx = 0
    var heapOff = 0L
    var cur: ArrayBuffer[(String, Array[Byte], Long)] = null
    var curUsed = 0L
    def openBlock(): Unit = {
      val row = blockIdx / tableWidth
      cur = ArrayBuffer.empty
      blocks += ((blockIdx, heapOff, cur))
      curUsed = dblockHeader.toLong
      blockIdx += 1
    }
    openBlock()
    val ids = linkMsgs.map { case (name, msg) =>
      val row = (blockIdx - 1) / tableWidth
      if (curUsed + msg.length > blockSizeOf(row)) {
        heapOff += blockSizeOf(row)
        openBlock()
      }
      val objHeapOff = heapOff + curUsed
      cur += ((name, msg, curUsed))
      curUsed += msg.length
      require(msg.length <= blockSizeOf((blockIdx - 1) / tableWidth) - dblockHeader,
        s"link message for $name larger than a direct block")
      name -> (Array[Byte](0) ++ le32(objHeapOff) ++ le16(msg.length))
    }.toMap

    // write the blocks; record their file addresses
    val blockAddrs = blocks.map { case (idx, bHeapOff, objs) =>
      val addr = w.pos.toLong
      w.ascii("FHDB"); w.u8(0); w.u64(frhpAddr); w.u32(bHeapOff)
      objs.foreach { case (_, msg, offInBlock) =>
        w.zeros((addr + offInBlock - w.pos).toInt) // (contiguous: no-op)
        w.bytes(msg)
      }
      val size = blockSizeOf(idx / tableWidth)
      w.zeros((addr + size - w.pos).toInt)
      idx -> addr
    }.toMap

    if (blocks.size == 1) { // root IS the direct block
      w.patchU64(rootBlockAt, blockAddrs(0))
    } else { // root indirect block over the doubling table
      val rows = (blocks.map(_._1).max / tableWidth) + 1
      val fhibAddr = w.pos
      w.ascii("FHIB"); w.u8(0); w.u64(frhpAddr); w.u32(0)
      for (i <- 0 until rows * tableWidth)
        w.u64(blockAddrs.getOrElse(i, -1L))
      w.u32(0) // checksum
      w.patchU64(rootBlockAt, fhibAddr)
      w.buf(curRowsAt) = rows.toByte; w.buf(curRowsAt + 1) = (rows >> 8).toByte
    }

    // ---- name-index v2 B-tree (record type 5: hash + heap ID)
    val recordSize = 4 + heapIdLen
    val records = linkMsgs.map { case (name, _) =>
      (lookup3(name.getBytes("UTF-8")), ids(name))
    }.sortBy(_._1)
    val maxLeafRec = (g.btreeNodeSize - 10) / recordSize
    def writeLeaf(recs: Seq[(Long, Array[Byte])]): Long = {
      val addr = w.pos.toLong
      w.ascii("BTLF"); w.u8(0); w.u8(5)
      recs.foreach { case (h, id) => w.u32(h); w.bytes(id) }
      w.u32(0) // checksum
      addr
    }
    val (rootAddr, rootNRec, depth) =
      if (records.size <= maxLeafRec) (writeLeaf(records), records.size, 0)
      else {
        // depth 1: full leaves separated by single internal records
        val leaves = ArrayBuffer.empty[(Long, Int)]
        val internal = ArrayBuffer.empty[(Long, Array[Byte])]
        var rest = records
        while (rest.nonEmpty) {
          // an internal record must be FOLLOWED by another leaf (n
          // records ⇒ n+1 children): shrink this leaf when a full take
          // would leave exactly one record dangling as internal
          val takeN = if (rest.size == maxLeafRec + 1) maxLeafRec - 1
            else maxLeafRec
          val leaf = rest.take(takeN)
          leaves += ((writeLeaf(leaf), leaf.size))
          rest = rest.drop(takeN)
          if (rest.nonEmpty) { internal += rest.head; rest = rest.tail }
        }
        val nRecSize = (64 - java.lang.Long.numberOfLeadingZeros(
          math.max(1, maxLeafRec).toLong) + 7) / 8
        val addr = w.pos.toLong
        w.ascii("BTIN"); w.u8(0); w.u8(5)
        internal.foreach { case (h, id) => w.u32(h); w.bytes(id) }
        leaves.foreach { case (leafAddr, n) =>
          w.u64(leafAddr)
          (0 until nRecSize.toInt).foreach(i => w.u8((n >> (8 * i)) & 0xff))
        }
        w.u32(0) // checksum
        (addr, internal.size, 1)
      }
    val bthdAddr = w.pos
    w.ascii("BTHD"); w.u8(0); w.u8(5)
    w.u32(g.btreeNodeSize.toLong); w.u16(recordSize); w.u16(depth)
    w.u8(100); w.u8(40) // split / merge percent
    w.u64(rootAddr); w.u16(rootNRec)
    w.u64(records.size.toLong) // total records
    w.u32(0) // checksum

    // ---- the group: one Link Info message pointing at heap + index
    objectHeaderV2(w, Seq(
      0x02 -> (Array[Byte](0, 0) ++ le64(frhpAddr) ++ le64(bthdAddr))))
  }

  private def writeGroup(w: W, g: BGroup, v2: Boolean): Long = {
    val kids = g.children.map(c => c.name -> writeNode(w, c, v2))
      .sortBy(_._1) // SNOD entries are name-ordered
    if (g.dense) {
      writeDenseGroup(w, g, kids)
    } else if (v2) {
      // compact group: one link message per child
      val msgs = kids.map { case (name, addr) =>
        val nameB = name.getBytes("UTF-8")
        0x06 -> (Array[Byte](1, 0, nameB.length.toByte) ++ nameB ++ le64(addr))
      }
      objectHeaderV2(w, msgs)
    } else {
      // local heap: NUL-terminated names
      val nameOffsets = ArrayBuffer.empty[Long]
      val heapData = ArrayBuffer.empty[Byte]
      kids.foreach { case (name, _) =>
        nameOffsets += heapData.length.toLong
        heapData ++= name.getBytes("UTF-8"); heapData += 0
      }
      val segSize = (heapData.length + 7) / 8 * 8
      val heapAddr = w.pos
      w.ascii("HEAP"); w.u8(1); w.zeros(3)
      w.u64(segSize); w.u64(-1L); w.u64(heapAddr + 32)
      w.bytes(heapData.toArray); w.zeros(segSize - heapData.length)
      // one SNOD with every entry
      val snodAddr = w.pos
      w.ascii("SNOD"); w.u8(1); w.u8(0); w.u16(kids.size)
      kids.zipWithIndex.foreach { case ((_, ohAddr), i) =>
        w.u64(nameOffsets(i)); w.u64(ohAddr); w.u32(0); w.u32(0); w.zeros(16)
      }
      // group B-tree: single leaf pointing at the SNOD
      val btreeAddr = w.pos
      w.ascii("TREE"); w.u8(0); w.u8(0); w.u16(1)
      w.u64(-1L); w.u64(-1L)
      w.u64(0); w.u64(snodAddr); w.u64(nameOffsets.lastOption.getOrElse(0L))
      objectHeaderV1(w, Seq(0x11 -> (le64(btreeAddr) ++ le64(heapAddr))),
        split = false)
    }
  }

  // ---------------------------------------------------------------------
  // file assembly

  def build(children: Seq[BNode], v2: Boolean = false): Array[Byte] = {
    val w = new W
    w.zeros(if (v2) 48 else 96) // superblock written last (needs addresses)
    val rootAddr = writeGroup(w, BGroup("", children), v2)
    val eof = w.pos.toLong
    val sig = Array(0x89, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n').map(_.toByte)
    val sb = new W
    sb.bytes(sig)
    if (v2) {
      sb.u8(2); sb.u8(8); sb.u8(8); sb.u8(0)
      sb.u64(0) // base address
      sb.u64(-1L) // superblock extension
      sb.u64(eof)
      sb.u64(rootAddr)
      sb.u32(0) // checksum (reader does not verify)
    } else {
      sb.u8(0); sb.u8(0); sb.u8(0); sb.u8(0) // versions: sb, freespace, root STE
      sb.u8(0) // shared-header version
      sb.u8(8); sb.u8(8); sb.u8(0) // offset size, length size, reserved
      sb.u16(4); sb.u16(16) // group leaf / internal K
      sb.u32(0) // file consistency flags
      sb.u64(0) // base address
      sb.u64(-1L) // free-space info
      sb.u64(eof)
      sb.u64(-1L) // driver info
      // root symbol-table entry
      sb.u64(0); sb.u64(rootAddr); sb.u32(0); sb.u32(0); sb.zeros(16)
    }
    val out = w.toArray
    System.arraycopy(sb.toArray, 0, out, 0, sb.pos)
    out
  }
}
