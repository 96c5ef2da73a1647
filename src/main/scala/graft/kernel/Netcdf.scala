package graft.kernel

import java.nio.{ByteBuffer, ByteOrder}

import Raster.Grid

/** NetCDF-3 classic-format reader (CDF-1 and 64-bit-offset CDF-2) for
  * the cogify decode stage (reference A8, lambdas/cogify/handler.py:84-93
  * opens the granule with `netCDF4.Dataset` and pulls one variable plus
  * its `_FillValue` and the x/y coordinate variables). Implemented
  * directly from the public NetCDF Classic Format Specification
  * (magic `CDF\x01|\x02`, big-endian header: dim_list / gatt_list /
  * var_list with 4-byte-aligned names and attribute payloads; fixed-size
  * variable data contiguous at `begin`; record variables interleaved in
  * per-record slabs).
  *
  * Scope: the classic binary container only. NetCDF-4 granules are HDF5
  * files — [[Cogify.FetchGridReader]]'s magic sniff routes those to
  * [[Hdf5]]. Classic files have no groups, so a configured `group` is
  * ignored here (groups exist only in the HDF5 container).
  */
object Netcdf {

  // external type codes, NetCDF Classic Format Specification §"The Format"
  val NcByte = 1
  val NcChar = 2
  val NcShort = 3
  val NcInt = 4
  val NcFloat = 5
  val NcDouble = 6

  def typeSize(t: Int): Int = t match {
    case NcByte | NcChar => 1
    case NcShort => 2
    case NcInt | NcFloat => 4
    case NcDouble => 8
    case other => throw new IllegalArgumentException(s"nc_type $other")
  }

  /** length == 0 marks the record (unlimited) dimension. */
  final case class Dim(name: String, length: Int) {
    def isRecord: Boolean = length == 0
  }

  final case class Att(name: String, ncType: Int, values: IndexedSeq[Any]) {
    /** First value as a double (numeric attributes: _FillValue, scale…). */
    def number: Double = values.head match {
      case n: Number => n.doubleValue()
      case other => throw new IllegalStateException(s"attribute $name is not numeric: $other")
    }
    /** NC_CHAR attribute payload as text. */
    def text: String = new String(
      values.map(_.asInstanceOf[Byte]).toArray, "US-ASCII")
  }

  final case class Variable(name: String, dimIds: Seq[Int],
      atts: Map[String, Att], ncType: Int, vsize: Long, begin: Long)

  final case class NcFile(version: Int, numRecs: Int, dims: IndexedSeq[Dim],
      gatts: Map[String, Att], vars: Map[String, Variable],
      bytes: Array[Byte]) {

    def shape(v: Variable): Seq[Int] =
      v.dimIds.map(dims(_)).map(d => if (d.isRecord) numRecs else d.length)

    def isRecordVar(v: Variable): Boolean =
      v.dimIds.headOption.exists(dims(_).isRecord)

    /** Bytes of one record slab for a record variable (product of the
      * non-record dims), or of the full data block for a fixed one. */
    private[Netcdf] def slabBytes(v: Variable): Long = {
      val fixedElems = v.dimIds.drop(if (isRecordVar(v)) 1 else 0)
        .map(dims(_).length.toLong).product
      fixedElems * typeSize(v.ncType)
    }

    /** Per-record stride: the sum of every record variable's padded slab
      * (spec: each record var's contribution is 4-byte aligned unless it
      * is the only record variable). */
    private[Netcdf] lazy val recStride: Long = {
      val recVars = vars.values.filter(isRecordVar).toSeq
      if (recVars.size == 1) slabBytes(recVars.head)
      else recVars.map(v => pad4(slabBytes(v))).sum
    }
  }

  private def pad4(n: Long): Long = (n + 3) & ~3L

  // ---------------------------------------------------------------------
  // header parse

  private val TagDimension = 0x0A
  private val TagVariable = 0x0B
  private val TagAttribute = 0x0C

  def parse(bytes: Array[Byte]): NcFile = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    require(buf.get() == 'C' && buf.get() == 'D' && buf.get() == 'F',
      "not a NetCDF classic file (missing CDF magic)")
    val version = buf.get().toInt
    require(version == 1 || version == 2,
      s"unsupported NetCDF classic version $version (1=CDF-1, 2=CDF-2)")
    val numRecs = buf.getInt() // STREAMING (-1) reads as unknown; callers
    // only use it for record-dim shapes, where 0 slabs is the safe answer
    val dims = taggedList(buf, TagDimension) {
      Dim(readName(buf), buf.getInt())
    }.toIndexedSeq
    val gatts = attList(buf)
    val vars = taggedList(buf, TagVariable) {
      val name = readName(buf)
      val nDims = buf.getInt()
      val dimIds = Seq.fill(nDims)(buf.getInt())
      val atts = attList(buf)
      val ncType = buf.getInt()
      // vsize is 32-bit in both CDF-1 and CDF-2 (only `begin` widens)
      val vsize = buf.getInt().toLong & 0xffffffffL
      val begin = if (version == 1) buf.getInt().toLong & 0xffffffffL else buf.getLong()
      Variable(name, dimIds, atts, ncType, vsize, begin)
    }
    NcFile(version, math.max(numRecs, 0), dims, gatts,
      vars.map(v => v.name -> v).toMap, bytes)
  }

  /** `ABSENT` is encoded as two zero words; otherwise tag + nelems. */
  private def taggedList[A](buf: ByteBuffer, tag: Int)(one: => A): Seq[A] = {
    val t = buf.getInt()
    val n = buf.getInt()
    if (t == 0 && n == 0) Seq.empty
    else {
      require(t == tag, s"expected list tag $tag, got $t")
      Seq.fill(n)(one)
    }
  }

  /** Name: length + bytes, padded to a 4-byte boundary. */
  private def readName(buf: ByteBuffer): String = {
    val len = buf.getInt()
    val raw = new Array[Byte](len)
    buf.get(raw)
    buf.position(buf.position() + (pad4(len.toLong) - len).toInt)
    new String(raw, "UTF-8")
  }

  private def attList(buf: ByteBuffer): Map[String, Att] =
    taggedList(buf, TagAttribute) {
      val name = readName(buf)
      val ncType = buf.getInt()
      val n = buf.getInt()
      val values: IndexedSeq[Any] = (0 until n).map { _ =>
        ncType match {
          case NcByte | NcChar => buf.get(): Any
          case NcShort => buf.getShort(): Any
          case NcInt => buf.getInt(): Any
          case NcFloat => buf.getFloat(): Any
          case NcDouble => buf.getDouble(): Any
          case other => throw new IllegalArgumentException(s"nc_type $other")
        }
      }
      val payload = n.toLong * typeSize(ncType)
      buf.position(buf.position() + (pad4(payload) - payload).toInt)
      Att(name, ncType, values)
    }.map(a => a.name -> a).toMap

  // ---------------------------------------------------------------------
  // data reads

  /** Flattened numeric read of `count` elements of `v` starting at byte
    * `at` (big-endian external representation, any numeric nc_type). */
  private def readElems(f: NcFile, v: Variable, at: Long, count: Int): Array[Double] = {
    val buf = ByteBuffer.wrap(f.bytes).order(ByteOrder.BIG_ENDIAN)
    buf.position(at.toInt)
    val out = new Array[Double](count)
    var i = 0
    while (i < count) {
      out(i) = v.ncType match {
        case NcByte => buf.get().toDouble
        case NcShort => buf.getShort().toDouble
        case NcInt => buf.getInt().toDouble
        case NcFloat => buf.getFloat().toDouble
        case NcDouble => buf.getDouble()
        case other => throw new IllegalArgumentException(s"non-numeric nc_type $other")
      }
      i += 1
    }
    out
  }

  /** Full read of a 1-D (coordinate) variable — handler.py:98-101 takes
    * min/max of these for the extent. Record coordinate vars read one
    * element per record slab. */
  def readCoord(f: NcFile, name: String): Array[Double] = {
    val v = f.vars.getOrElse(name,
      throw new NoSuchElementException(s"no variable $name"))
    require(v.dimIds.size == 1, s"$name is not 1-D")
    if (!f.isRecordVar(v)) readElems(f, v, v.begin, f.shape(v).head)
    else (0 until f.numRecs).toArray.map(r =>
      readElems(f, v, v.begin + r * f.recStride, 1).head)
  }

  /** Read a 2-D variable — or the first slab of a 3-D one, the way the
    * reference takes `variable[0]` of a (time, y, x) cube
    * (handler.py:90-91) — as a float grid. `_FillValue` becomes the
    * grid's nodata (handler.py:85-88); `scale_factor`/`add_offset` are
    * applied to non-fill cells (the netCDF4 library's auto-scaling
    * default), fill cells keep the raw sentinel.
    */
  def readGrid(f: NcFile, name: String): Grid = {
    val v = f.vars.getOrElse(name,
      throw new NoSuchElementException(s"no variable $name"))
    val shape = f.shape(v)
    val (h, w) = shape match {
      case Seq(hh, ww) => (hh, ww)
      case Seq(_, hh, ww) => (hh, ww) // leading time/record dim: slab 0
      case other => throw new IllegalArgumentException(
        s"$name has shape ${other.mkString("x")}; expected 2-D or 3-D")
    }
    // both record and fixed layouts place the first slab at `begin`
    val raw = readElems(f, v, v.begin, h * w)
    val fill = v.atts.get("_FillValue").map(_.number)
    val scale = v.atts.get("scale_factor").map(_.number)
    val offset = v.atts.get("add_offset").map(_.number)
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
