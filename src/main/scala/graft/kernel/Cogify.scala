package graft.kernel

import java.io.ByteArrayOutputStream
import java.util.zip.{Deflater, Inflater}

import org.apache.spark.sql.Dataset

import Raster._

/** The cogify kernel (reference A8, lambdas/cogify/handler.py:74-185):
  * NetCDF/HDF5 variable → per-collection fixups → extent/CRS/affine →
  * float32 cast → 256×256 deflate-tiled cloud-optimized output, run as a
  * partitioned `mapPartitions` stage with broadcast per-collection config
  * and targeted retry (reference B5's RasterioIOError×5).
  *
  * Real here: config registry, array fixups, affine/extent math, tiling,
  * deflate compression, baseline-GeoTIFF output ([[Tiff]] — externally
  * parseable tags), NetCDF-3 classic ([[Netcdf]]) and NetCDF-4/HDF5
  * ([[Hdf5]]) decode behind [[FetchGridReader]]'s magic sniff, and the
  * partitioned execution + retry. [[FakeGridReader]] remains the
  * synthetic-grid default for specs that don't care about bytes.
  */
object Cogify {

  /** Per-collection physical config (reference example.ini:1-25 via
    * FIXTURES.md §A7) — a typed registry, replacing INI + eval. */
  final case class CollectionConfig(
      variableName: String,
      group: Option[String] = None,
      xVariable: Option[String] = None,
      yVariable: Option[String] = None,
      srcCrs: Option[String] = None, // proj4-style tag, carried as metadata
      useTopLeftRecipe: Boolean = false, // ≈ affine_transformation present
      transposeFix: Boolean = false, // GPM_3IMERGM
      flipudFix: Boolean = false, // OMDOAO3e
      // Extension past the reference's one-variable-per-COG profile
      // (handler.py:78,152): when non-empty, these variables become the
      // bands of ONE multi-band COG (PlanarConfiguration=2), decoded
      // from a single fetch of the container. `variableName` stays the
      // stats/nodata anchor, which is band 0 by construction: a
      // non-empty list must lead with it (enforced, not just documented).
      bandVariables: Seq[String] = Nil) {
    require(bandVariables.isEmpty || bandVariables.head == variableName,
      s"bandVariables must lead with variableName '$variableName' " +
        "(the stats/nodata anchor band)")
  }

  final case class CogifyTask(collection: String, href: String,
      granule_id: Option[String], upload: Boolean)

  final case class CogifyResult(collection: String, href: String,
      granule_id: Option[String], filename: String,
      width: Int, height: Int, n_bands: Int, n_tiles: Int,
      payload_bytes: Long,
      affine: Seq[Double], epsg: Int, stats: Option[BandStats.Stats],
      error: Option[String])

  /** Pluggable decode stage. */
  trait GridReader extends Serializable {
    def read(task: CogifyTask, config: CollectionConfig):
      (Grid, Option[Array[Double]], Option[Array[Double]])

    /** Multi-variable decode (config.bandVariables): one band per
      * variable, shared coordinate vectors. The default wraps the
      * single-variable path for single-variable configs; a reader
      * without multi-band support must NOT silently drop requested
      * bands, so a multi-variable config fails fast (non-retryable →
      * DLQ row) instead. */
    def readBands(task: CogifyTask, config: CollectionConfig):
        (Seq[Grid], Option[Array[Double]], Option[Array[Double]]) = {
      if (config.bandVariables.size > 1)
        throw new UnsupportedOperationException(
          s"reader ${getClass.getSimpleName} decodes one variable per " +
            s"task; config requested ${config.bandVariables.size} bands")
      val (g, xs, ys) = read(task, config)
      (Seq(g), xs, ys)
    }
  }

  /** STUB reader: deterministic synthetic grid derived from the href
    * hash (a real NetCDF reader implements the same trait). */
  final class FakeGridReader(width: Int = 360, height: Int = 180) extends GridReader {
    override def read(task: CogifyTask, config: CollectionConfig) = {
      val seed = graft.functions.SimHash.fnv1a64(task.href)
      val data = new Array[Float](width * height)
      var i = 0
      while (i < data.length) {
        // splitmix-ish deterministic values in [0, 100)
        var z = seed + i * 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        data(i) = ((z >>> 11).toDouble / (1L << 53).toDouble).toFloat * 100f
        i += 1
      }
      val xs = Array.tabulate(width)(c => -180.0 + 360.0 * (c + 0.5) / width)
      val ys = Array.tabulate(height)(r => -90.0 + 180.0 * (r + 0.5) / height)
      (Grid(width, height, data, Some(-9999f)), Some(xs), Some(ys))
    }
  }

  /** Production-shaped reader for already-raster sources: localizes the
    * href through a [[graft.sources.Fetch.Fetcher]] (authenticated HTTP
    * session per partition, or Hadoop FS — reference A7,
    * cogify/handler.py:49-71), then decodes baseline-TIFF bytes
    * ([[Tiff.readGrid]]). Coordinate vectors are rebuilt as pixel-center
    * positions from the file's affine, so downstream extent derivation
    * (handler.py:96-103) sees exactly what a NetCDF x/y variable would
    * carry. A NetCDF reader slots behind the same two seams: fetch →
    * decode.
    */
  final class TiffGridReader(mkFetcher: () => graft.sources.Fetch.Fetcher)
      extends GridReader {
    @transient private lazy val fetcher = mkFetcher()
    override def read(task: CogifyTask, config: CollectionConfig) = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-fetch").toFile
      try {
        val local = fetcher.fetch(task.href, tmp)
        val (grid, affine) = Tiff.readGrid(
          java.nio.file.Files.readAllBytes(local.toPath))
        val xs = Array.tabulate(grid.width)(j => affine.c + affine.a * (j + 0.5))
        val ys = Array.tabulate(grid.height)(i => affine.f + affine.e * (i + 0.5))
        (grid, Some(xs), Some(ys))
      } finally {
        tmp.listFiles().foreach(_.delete()); tmp.delete()
      }
    }
  }

  /** THE production reader: localize via a [[graft.sources.Fetch.Fetcher]]
    * (A7), sniff the container magic, decode — NetCDF-3 classic through
    * [[Netcdf]] (variable + `_FillValue` + x/y coordinate vars per the
    * collection config, handler.py:84-101), NetCDF-4/HDF5 (magic
    * `\x89HDF`) through [[Hdf5]] with the configured group path, and
    * baseline TIFF through [[Tiff.readGrid]]. Unrecognized containers
    * fail fast with a non-retryable error that routes the task to the
    * DLQ instead of burning retry attempts.
    */
  final class FetchGridReader(mkFetcher: () => graft.sources.Fetch.Fetcher)
      extends GridReader {
    @transient private lazy val fetcher = mkFetcher()

    private def localBytes(task: CogifyTask): Array[Byte] = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-fetch").toFile
      try {
        val local = fetcher.fetch(task.href, tmp)
        java.nio.file.Files.readAllBytes(local.toPath)
      } finally {
        tmp.listFiles().foreach(_.delete()); tmp.delete()
      }
    }

    override def read(task: CogifyTask, config: CollectionConfig) =
      decode(localBytes(task), config)

    /** Multi-variable decode: ONE fetch and ONE container parse, then
      * a grid per configured band variable (TIFF sources carry their
      * planes positionally, so the names only set the band count
      * there). */
    override def readBands(task: CogifyTask, config: CollectionConfig) =
      if (config.bandVariables.isEmpty) super.readBands(task, config)
      else {
        val bytes = localBytes(task)
        bytes.take(4).map(_ & 0xff) match {
          case Array(0x43, 0x44, 0x46, _) => // "CDF" — NetCDF-3 classic
            val nc = Netcdf.parse(bytes)
            (config.bandVariables.map(Netcdf.readGrid(nc, _)),
              config.xVariable.map(Netcdf.readCoord(nc, _)),
              config.yVariable.map(Netcdf.readCoord(nc, _)))
          case Array(0x49, 0x49, _, _) | Array(0x4d, 0x4d, _, _) =>
            val (bands, affine) = Tiff.readBands(bytes)
            // TIFF planes are positional, so the variable names can't
            // select — but a count mismatch is a config/file conflict,
            // not something to accept silently
            require(bands.size == config.bandVariables.size,
              s"config lists ${config.bandVariables.size} band variables " +
                s"but the TIFF carries ${bands.size} planes")
            val w = bands.head.width
            val h = bands.head.height
            val xs = Array.tabulate(w)(j => affine.c + affine.a * (j + 0.5))
            val ys = Array.tabulate(h)(i => affine.f + affine.e * (i + 0.5))
            (bands, Some(xs), Some(ys))
          case Array(0x89, 0x48, 0x44, 0x46) => // "\x89HDF" — NetCDF-4/HDF5
            val h5 = Hdf5.parse(bytes)
            val at = (name: String) =>
              (config.group.toSeq :+ name).mkString("/")
            (config.bandVariables.map(n => Hdf5.readGrid(h5, at(n))),
              config.xVariable.map(n => Hdf5.readCoord(h5, at(n))),
              config.yVariable.map(n => Hdf5.readCoord(h5, at(n))))
          case other =>
            throw new UnsupportedOperationException(
              s"unrecognized container magic ${other.map(b => f"$b%02x").mkString}")
        }
      }

    private def decode(bytes: Array[Byte], config: CollectionConfig) =
      bytes.take(4).map(_ & 0xff) match {
        case Array(0x43, 0x44, 0x46, _) => // "CDF" — NetCDF-3 classic
          val nc = Netcdf.parse(bytes)
          val grid = Netcdf.readGrid(nc, config.variableName)
          (grid,
            config.xVariable.map(Netcdf.readCoord(nc, _)),
            config.yVariable.map(Netcdf.readCoord(nc, _)))
        case Array(0x49, 0x49, _, _) | Array(0x4d, 0x4d, _, _) => // "II"/"MM"
          val (grid, affine) = Tiff.readGrid(bytes)
          val xs = Array.tabulate(grid.width)(j => affine.c + affine.a * (j + 0.5))
          val ys = Array.tabulate(grid.height)(i => affine.f + affine.e * (i + 0.5))
          (grid, Some(xs), Some(ys))
        case Array(0x89, 0x48, 0x44, 0x46) => // "\x89HDF" — NetCDF-4/HDF5
          val h5 = Hdf5.parse(bytes)
          // NetCDF-4 variables are HDF5 datasets, grouped per the config
          // (handler.py:84 `group=...`); coordinate vars live alongside
          val at = (name: String) =>
            (config.group.toSeq :+ name).mkString("/")
          val grid = Hdf5.readGrid(h5, at(config.variableName))
          (grid,
            config.xVariable.map(n => Hdf5.readCoord(h5, at(n))),
            config.yVariable.map(n => Hdf5.readCoord(h5, at(n))))
        case other =>
          throw new UnsupportedOperationException(
            s"unrecognized container magic ${other.map(b => f"$b%02x").mkString}")
      }
  }

  val TileSize = 256 // handler.py:28-29

  final case class Tile(tileCol: Int, tileRow: Int, deflated: Array[Byte])

  /** 256×256 deflate tiling of a grid (edge tiles padded with nodata —
    * the TIFF tile convention). */
  def tile(g: Grid): Seq[Tile] = {
    val pad = g.nodata.getOrElse(0f)
    val tilesX = (g.width + TileSize - 1) / TileSize
    val tilesY = (g.height + TileSize - 1) / TileSize
    for {
      ty <- 0 until tilesY
      tx <- 0 until tilesX
    } yield {
      val buf = java.nio.ByteBuffer.allocate(TileSize * TileSize * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var r = 0
      while (r < TileSize) {
        var c = 0
        while (c < TileSize) {
          val gr = ty * TileSize + r
          val gc = tx * TileSize + c
          buf.putFloat(if (gr < g.height && gc < g.width) g(gr, gc) else pad)
          c += 1
        }
        r += 1
      }
      Tile(tx, ty, deflate(buf.array()))
    }
  }

  def deflate(bytes: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    d.setInput(bytes); d.finish()
    val out = new ByteArrayOutputStream()
    val chunk = new Array[Byte](8192)
    while (!d.finished()) out.write(chunk, 0, d.deflate(chunk))
    d.end()
    out.toByteArray
  }

  def inflate(bytes: Array[Byte], expectedLen: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(bytes)
    val out = new Array[Byte](expectedLen)
    var off = 0
    while (!inf.finished() && off < expectedLen)
      off += inf.inflate(out, off, expectedLen - off)
    inf.end()
    out
  }

  /** One task through the kernel: decode → fixups → extent → affine →
    * tile+deflate → write container. Multi-variable configs
    * (`bandVariables`) produce one multi-band COG; the per-collection
    * fixups apply to every band (they correct the grid orientation of
    * the shared container). */
  def cogifyOne(task: CogifyTask, config: CollectionConfig, reader: GridReader,
      outDir: String): CogifyResult = {
    val (raw, xs, ys) = reader.readBands(task, config)
    var bands = raw
    if (config.transposeFix) bands = bands.map(transpose) // handler.py:90-91
    if (config.flipudFix) bands = bands.map(flipud) // handler.py:92-93
    val grid = bands.head
    val extent = extentFromCoords(xs, ys) // handler.py:96-103
    val affine =
      if (config.useTopLeftRecipe) topLeftRecipe(extent, grid.width, grid.height)
      else defaultTransformTo3857(extent, grid.width, grid.height) // handler.py:113-131

    // rotated affines ride the GeoTIFF ModelTransformation tag (the
    // writer picks it over PixelScale+Tiepoint when b/d are nonzero),
    // so every payload — rotated or axis-aligned, single- or
    // multi-band — is a real COG
    val name = task.href.substring(task.href.lastIndexOf('/') + 1) + ".cog.tif"
    val outPath = s"${outDir.stripSuffix("/")}/${task.collection}/$name"
    // the top-left recipe keeps the source's geographic degrees; the
    // default recipe reprojects the extent to web-mercator meters
    val epsg = if (config.useTopLeftRecipe) 4326 else 3857
    // writeCogBands tiles every band itself — tile here only on the
    // single-band paths, and count multi-band tiles arithmetically
    // (dims are shared, so per-band tile counts are equal)
    val tilesPerBand = ((grid.width + TileSize - 1) / TileSize) *
      ((grid.height + TileSize - 1) / TileSize)
    val payload =
      if (bands.size == 1) writeTiff(outPath, grid, affine, tile(grid), epsg)
      else writeTiffBands(outPath, bands, affine, epsg)
    CogifyResult(task.collection, task.href, task.granule_id, outPath,
      grid.width, grid.height, bands.size,
      bands.size * tilesPerBand, payload,
      Seq(affine.a, affine.b, affine.c, affine.d, affine.e, affine.f),
      epsg, Some(gridStats(grid)), None)
  }

  /** Per-band raster statistics of the decoded grid (reference A12:
    * `rio_stac … with_raster=True` computes them from the COG it just
    * wrote, stac.py:33-48; here the grid is already in memory). Two
    * passes: min/max fix the histogram range, then the mergeable
    * [[BandStats.Agg]] buffer path produces the same Stats shape the
    * relational m03 query uses. */
  def gridStats(g: Grid): BandStats.Stats = {
    var mn = Double.PositiveInfinity
    var mx = Double.NegativeInfinity
    var i = 0
    while (i < g.data.length) {
      val v = g.data(i)
      if (!g.nodata.exists(_ == v) && !v.isNaN) {
        if (v < mn) mn = v
        if (v > mx) mx = v
      }
      i += 1
    }
    val agg =
      if (mn <= mx) BandStats.Agg(mn, mx, nodata = g.nodata)
      else BandStats.Agg(0.0, 1.0, nodata = g.nodata) // all-nodata grid
    agg.finish(agg.reduce(agg.zero, g.data))
  }

  /** Write the grid as a cloud-optimized GeoTIFF (the reference's
    * GTiff/deflate profile + `cog_translate` overviews, handler.py:25-29)
    * — IFD-first layout with a 2×-decimated overview pyramid; see
    * [[Tiff]]. */
  def writeTiff(path: String, g: Grid, affine: Affine, tiles: Seq[Tile],
      epsg: Int = 4326): Long =
    writeBytes(path, Tiff.writeCog(g, affine, tiles, Some(epsg)))

  /** Multi-band variant: one COG, `PlanarConfiguration=2` planes, the
    * overview pyramid decimated in lockstep (see [[Tiff.writeCogBands]]).
    */
  def writeTiffBands(path: String, bands: Seq[Grid], affine: Affine,
      epsg: Int = 4326): Long =
    writeBytes(path, Tiff.writeCogBands(bands, affine, Some(epsg)))

  private def writeBytes(path: String, bytes: Array[Byte]): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
    bytes.length.toLong
  }

  /** The distributed stage: tasks → results, per-partition reader, with
    * targeted bounded retry (B5: 5 attempts on retryable failures —
    * step_function_stack.py:167-171). Errors after retries become
    * DLQ-routable result rows, not task failures. */
  def run(tasks: Dataset[CogifyTask], configs: Map[String, CollectionConfig],
      outDir: String, maxAttempts: Int = 5,
      mkReader: () => GridReader = () => new FakeGridReader()): Dataset[CogifyResult] = {
    val spark = tasks.sparkSession
    import spark.implicits._
    val bcConfigs = spark.sparkContext.broadcast(configs)
    tasks.mapPartitions { it =>
      val reader = mkReader()
      it.map { task =>
        val config = bcConfigs.value.getOrElse(task.collection, CollectionConfig("data"))
        var attempt = 0
        var result: CogifyResult = null
        while (result == null) {
          attempt += 1
          try result = cogifyOne(task, config, reader, outDir)
          catch {
            case e: java.io.IOException if attempt < maxAttempts => // retryable
            case e: Throwable =>
              result = CogifyResult(task.collection, task.href, task.granule_id,
                "", 0, 0, 0, 0, 0L, Seq.empty, 0, None, Some(e.toString))
          }
        }
        result
      }
    }
  }
}
