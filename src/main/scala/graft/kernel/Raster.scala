package graft.kernel

/** Raster primitives for the cogify kernel (reference A8,
  * lambdas/cogify/handler.py:74-167): a row-major single-band grid, the
  * per-collection array fixups, extent derivation, affine recipes, and
  * the EPSG:4326→3857 forward transform. Pure JVM math — no GDAL.
  */
object Raster {

  /** Row-major single-band grid. */
  final case class Grid(width: Int, height: Int, data: Array[Float],
      nodata: Option[Float]) {
    require(data.length == width * height, s"data ${data.length} != $width x $height")
    def apply(row: Int, col: Int): Float = data(row * width + col)
  }

  /** `np.transpose` (GPM_3IMERGM fixup, handler.py:90-91). */
  def transpose(g: Grid): Grid = {
    val out = new Array[Float](g.data.length)
    var r = 0
    while (r < g.height) {
      var c = 0
      while (c < g.width) {
        out(c * g.height + r) = g.data(r * g.width + c)
        c += 1
      }
      r += 1
    }
    Grid(g.height, g.width, out, g.nodata)
  }

  /** `np.flipud` (OMDOAO3e fixup, handler.py:92-93). */
  def flipud(g: Grid): Grid = {
    val out = new Array[Float](g.data.length)
    var r = 0
    while (r < g.height) {
      System.arraycopy(g.data, r * g.width, out, (g.height - 1 - r) * g.width, g.width)
      r += 1
    }
    Grid(g.width, g.height, out, g.nodata)
  }

  /** (xmin, ymin, xmax, ymax). */
  final case class Extent(xmin: Double, ymin: Double, xmax: Double, ymax: Double)

  /** Extent from coordinate vectors' min/max (handler.py:96-103); absent
    * coords imply the global extent. */
  def extentFromCoords(xs: Option[Array[Double]], ys: Option[Array[Double]]): Extent =
    (xs, ys) match {
      case (Some(x), Some(y)) => Extent(x.min, y.min, x.max, y.max)
      case _ => Extent(-180, -90, 180, 90)
    }

  /** GDAL-style affine geotransform: x' = c + a·col + b·row,
    * y' = f + d·col + e·row. */
  final case class Affine(a: Double, b: Double, c: Double,
      d: Double, e: Double, f: Double) {
    def apply(col: Double, row: Double): (Double, Double) =
      (c + a * col + b * row, f + d * col + e * row)
  }

  /** The reference's per-collection recipe `(xmin, xres, 0, ymax, 0,
    * -yres)` (example.ini, applied via `Affine.from_gdal` at
    * handler.py:126-131) as a TYPED spec — the reference `eval`s the
    * tuple from INI text; we deliberately do not port the eval
    * (SURVEY §7.4). */
  def topLeftRecipe(extent: Extent, width: Int, height: Int): Affine = {
    val xres = (extent.xmax - extent.xmin) / width.toDouble
    val yres = (extent.ymax - extent.ymin) / height.toDouble
    Affine(xres, 0, extent.xmin, 0, -yres, extent.ymax)
  }

  /** EPSG:4326 → EPSG:3857 (Web-Mercator) forward transform — the
    * standard spherical formulas. */
  object Mercator {
    val R = 6378137.0
    val MaxLat = 85.06 // past this the projection diverges
    def forward(lon: Double, lat: Double): (Double, Double) = {
      val clampedLat = math.max(-MaxLat, math.min(MaxLat, lat))
      (math.toRadians(lon) * R,
        math.log(math.tan(math.Pi / 4 + math.toRadians(clampedLat) / 2)) * R)
    }
  }

  /** Default transform into 3857 keeping source pixel counts (the shape
    * of `calculate_default_transform`, handler.py:113-123, without
    * GDAL's resolution re-estimation). */
  def defaultTransformTo3857(extent: Extent, width: Int, height: Int): Affine = {
    val (xmin, ymin) = Mercator.forward(extent.xmin, extent.ymin)
    val (xmax, ymax) = Mercator.forward(extent.xmax, extent.ymax)
    topLeftRecipe(Extent(xmin, ymin, xmax, ymax), width, height)
  }
}
