package graft.sources.catalog

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Remote-catalog granule source (reference A4,
  * lambdas/cmr-query/handler.py:8-27) as a DataSourceV2 table with
  * **filter pushdown**: predicates on `collection`, `version`, the
  * temporal interval and the bounding box are translated into catalog
  * query parameters (the way python-cmr pushes `short_name`, `version`,
  * `temporal`, `bounding_box` into the CMR REST API) and applied by the
  * catalog client before rows enter Spark; everything else stays a
  * residual Spark filter.
  *
  * The client behind the surface is pluggable; offline it reads a
  * JSON-lines granule file (`option("path", ...)`) — the pushdown
  * contract and row production are identical to what an HTTP-paged
  * client would do, including split-by-range parallel "pages".
  *
  * Usage: `spark.read.format("graft.sources.catalog.GranuleCatalog")
  * .option("path", file).load().filter(...)`.
  */
class GranuleCatalog extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GranuleCatalog.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new GranuleTable(properties.get("path"),
      Option(properties.get("pagesize")).map(_.toInt).getOrElse(100))

  override def supportsExternalMetadata(): Boolean = false
}

object GranuleCatalog {
  val schema: StructType = StructType(Seq(
    StructField("collection", StringType),
    StructField("version", StringType),
    StructField("granule_id", StringType),
    StructField("time_start", TimestampType),
    StructField("time_end", TimestampType),
    StructField("lon_min", DoubleType), StructField("lat_min", DoubleType),
    StructField("lon_max", DoubleType), StructField("lat_max", DoubleType),
    StructField("links", ArrayType(StructType(Seq(
      StructField("rel", StringType), StructField("href", StringType)))))))

  /** The catalog "API" query parameters a scan pushes down. The bbox
    * intersection predicate `lon_min <= E ∧ lon_max >= W ∧ lat_min <= N ∧
    * lat_max >= S` arrives as four comparisons and becomes the API's
    * `bounding_box=(W,S,E,N)` parameter. */
  final case class CatalogQuery(
      collection: Option[String] = None,
      version: Option[String] = None,
      startAfterMicros: Option[Long] = None, // time_start lower bound
      startBeforeMicros: Option[Long] = None, // time_start upper bound
      endAfterMicros: Option[Long] = None, // time_end lower bound
      endBeforeMicros: Option[Long] = None, // time_end upper bound
      lonMinLe: Option[Double] = None, lonMaxGe: Option[Double] = None,
      latMinLe: Option[Double] = None, latMaxGe: Option[Double] = None)

  /** Last pushed query, for tests/diagnostics (driver-side planning). */
  @volatile var lastPushedQuery: CatalogQuery = CatalogQuery()
}

private[catalog] class GranuleTable(path: String, pageSize: Int)
    extends Table with SupportsRead {
  override def name(): String = s"granule_catalog($path)"
  override def schema(): StructType = GranuleCatalog.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GranuleScanBuilder(path, pageSize)
}

private[catalog] class GranuleScanBuilder(path: String, pageSize: Int)
    extends ScanBuilder with SupportsPushDownFilters {

  import GranuleCatalog.CatalogQuery
  private var query = CatalogQuery()
  private var pushed: Array[Filter] = Array.empty

  /** Translate what the catalog API can evaluate (equality on
    * collection/version, bounds on time, bbox ranges); return the rest
    * as residuals for Spark.
    *
    * Repeated predicates on the same column TIGHTEN the query parameter
    * rather than overwrite it (two lower bounds push their max, two upper
    * bounds their min, bbox bounds likewise); conflicting equalities keep
    * the second predicate in the residual set so Spark still enforces it
    * — accepting a filter whose effect was silently dropped would return
    * rows that violate a user predicate.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val residual = scala.collection.mutable.ArrayBuffer.empty[Filter]
    val accepted = scala.collection.mutable.ArrayBuffer.empty[Filter]
    // lower bounds tighten upward, upper bounds downward
    def lo(cur: Option[Long], v: Long) = Some(cur.fold(v)(math.max(_, v)))
    def hi(cur: Option[Long], v: Long) = Some(cur.fold(v)(math.min(_, v)))
    def dLo(cur: Option[Double], v: Double) = Some(cur.fold(v)(math.max(_, v)))
    def dHi(cur: Option[Double], v: Double) = Some(cur.fold(v)(math.min(_, v)))
    filters.foreach {
      case f @ EqualTo("collection", v: String) =>
        if (query.collection.forall(_ == v)) {
          query = query.copy(collection = Some(v)); accepted += f
        } else residual += f // conflicting equality: Spark re-applies it
      case f @ EqualTo("version", v: String) =>
        if (query.version.forall(_ == v)) {
          query = query.copy(version = Some(v)); accepted += f
        } else residual += f
      // both containment (time_start >= s ∧ time_end <= e) and the CMR
      // API's overlap semantics (time_end >= s ∧ time_start <= e) arrive
      // as comparisons on either column — push lower bounds of either
      // column into startAfterMicros-style params
      case f @ GreaterThanOrEqual(c @ ("time_start" | "time_end"), v) if micros(v).isDefined =>
        query = if (c == "time_start")
          query.copy(startAfterMicros = lo(query.startAfterMicros, micros(v).get))
        else query.copy(endAfterMicros = lo(query.endAfterMicros, micros(v).get))
        accepted += f
      case f @ GreaterThan(c @ ("time_start" | "time_end"), v) if micros(v).isDefined =>
        query = if (c == "time_start")
          query.copy(startAfterMicros = lo(query.startAfterMicros, micros(v).get + 1))
        else query.copy(endAfterMicros = lo(query.endAfterMicros, micros(v).get + 1))
        accepted += f
      case f @ LessThanOrEqual(c @ ("time_start" | "time_end"), v) if micros(v).isDefined =>
        query = if (c == "time_end")
          query.copy(endBeforeMicros = hi(query.endBeforeMicros, micros(v).get))
        else query.copy(startBeforeMicros = hi(query.startBeforeMicros, micros(v).get))
        accepted += f
      case f @ LessThan(c @ ("time_start" | "time_end"), v) if micros(v).isDefined =>
        query = if (c == "time_end")
          query.copy(endBeforeMicros = hi(query.endBeforeMicros, micros(v).get - 1))
        else query.copy(startBeforeMicros = hi(query.startBeforeMicros, micros(v).get - 1))
        accepted += f
      // bbox: `lon_min <= a ∧ lon_min <= b` ⇒ `lon_min <= min(a,b)` etc.
      case f @ LessThanOrEqual("lon_min", v: java.lang.Double) =>
        query = query.copy(lonMinLe = dHi(query.lonMinLe, v)); accepted += f
      case f @ GreaterThanOrEqual("lon_max", v: java.lang.Double) =>
        query = query.copy(lonMaxGe = dLo(query.lonMaxGe, v)); accepted += f
      case f @ LessThanOrEqual("lat_min", v: java.lang.Double) =>
        query = query.copy(latMinLe = dHi(query.latMinLe, v)); accepted += f
      case f @ GreaterThanOrEqual("lat_max", v: java.lang.Double) =>
        query = query.copy(latMaxGe = dLo(query.latMaxGe, v)); accepted += f
      case f => residual += f
    }
    pushed = accepted.toArray
    GranuleCatalog.lastPushedQuery = query
    residual.toArray
  }

  private def micros(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp => Some(t.getTime * 1000L + t.getNanos / 1000 % 1000)
    case i: java.time.Instant => Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
    case l: java.time.LocalDateTime => Some(l.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + l.getNano / 1000L)
    case _ => None
  }

  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new GranuleScan(path, pageSize, query)
}

private[catalog] class GranuleScan(path: String, pageSize: Int,
    query: GranuleCatalog.CatalogQuery) extends Scan with Batch {
  override def readSchema(): StructType = GranuleCatalog.schema
  override def description(): String = s"GranuleCatalogScan(pushed=$query)"
  override def toBatch: Batch = this

  /** One partition per catalog "page" — the paged-API shape. The driver
    * makes ONE plan-time request: page 0 plus the query's total match
    * count (the paged-API `hits` header — CMR returns it with every page
    * response). Page 0's rows ride along inside partition 0 so the
    * cluster never re-requests them; partitions 1..n each fetch exactly
    * their own page. */
  override def planInputPartitions(): Array[InputPartition] = {
    val (page0, hits) = CatalogClient.fetchWithHits(path, query, 0, pageSize)
    val pages = math.max(1, math.ceil(hits.toDouble / pageSize).toInt)
    (GranulePartition(0, page0.toArray) +:
      (1 until pages).map(p => GranulePartition(p, null))).map(p => p: InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GranuleReaderFactory(path, pageSize, query)
}

/** `prefetched` is non-null only for page 0 (the plan-time response
  * body); InternalRow trees here hold UTF8String/GenericArrayData —
  * all JVM-serializable — so the rows ship inside the task binary. */
private[catalog] case class GranulePartition(page: Int,
    prefetched: Array[InternalRow]) extends InputPartition

private[catalog] class GranuleReaderFactory(path: String, pageSize: Int,
    query: GranuleCatalog.CatalogQuery) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val gp = partition.asInstanceOf[GranulePartition]
    val page = gp.page
    new PartitionReader[InternalRow] {
      private val it =
        (if (gp.prefetched != null) gp.prefetched.toSeq
         else CatalogClient.fetch(path, query, page, pageSize)).iterator
      private var current: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { current = it.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

/** The pluggable catalog client: offline JSON-lines implementation with
  * server-side-style parameter filtering and paging. The paging contract
  * matches a real paged HTTP API (CMR `offset`/`page_size`): `fetch`
  * consumes the stream only until the requested page is full — it never
  * materializes the whole matching set, and a partition reading page k of
  * size m parses at most the records preceding its page end. */
object CatalogClient {
  private val mapper = new ObjectMapper()

  /** Diagnostics for tests (per-JVM): granule records parsed by `fetch`
    * since the last reset — asserts the early-termination contract. */
  val recordsParsed = new java.util.concurrent.atomic.AtomicLong()

  private def matches(g: JsonNode, q: GranuleCatalog.CatalogQuery): Boolean = {
    def ts(field: String): Long =
      java.time.Instant.parse(g.get(field).asText()).toEpochMilli * 1000L
    q.collection.forall(_ == g.get("collection").asText()) &&
      q.version.forall(_ == g.get("version").asText()) &&
      q.startAfterMicros.forall(ts("time_start") >= _) &&
      q.startBeforeMicros.forall(ts("time_start") <= _) &&
      q.endAfterMicros.forall(ts("time_end") >= _) &&
      q.endBeforeMicros.forall(ts("time_end") <= _) &&
      q.lonMinLe.forall(g.get("lon_min").asDouble() <= _) &&
      q.lonMaxGe.forall(g.get("lon_max").asDouble() >= _) &&
      q.latMinLe.forall(g.get("lat_min").asDouble() <= _) &&
      q.latMaxGe.forall(g.get("lat_max").asDouble() >= _)
  }

  /** Matching granules for one page, streamed: parsing stops as soon as
    * the page is full (`slice` + `toList` pull exactly `skip + limit`
    * matches out of the line iterator). */
  private def pagedMatches(path: String, q: GranuleCatalog.CatalogQuery,
      skip: Int, limit: Int): Seq[JsonNode] = {
    val src = scala.io.Source.fromFile(path)
    try src.getLines().filter(_.nonEmpty)
      .map { line => recordsParsed.incrementAndGet(); mapper.readTree(line) }
      .filter(matches(_, q))
      .slice(skip, skip + limit)
      .toList
    finally src.close()
  }

  /** Matching-granule count — the API's `hits` header equivalent; one
    * driver-side pass at planning time, never per partition. */
  def count(path: String, q: GranuleCatalog.CatalogQuery): Int = {
    val src = scala.io.Source.fromFile(path)
    try src.getLines().filter(_.nonEmpty).map(mapper.readTree).count(matches(_, q))
    finally src.close()
  }

  private def toRow(g: JsonNode): InternalRow = {
    def s(f: String) = UTF8String.fromString(g.get(f).asText())
    def ts(f: String) = java.lang.Long.valueOf(
      java.time.Instant.parse(g.get(f).asText()).toEpochMilli * 1000L)
    val links = g.get("links").elements().asScala.map { l =>
      InternalRow(UTF8String.fromString(l.get("rel").asText()),
        UTF8String.fromString(l.get("href").asText()))
    }.toArray
    InternalRow(s("collection"), s("version"), s("granule_id"),
      ts("time_start"), ts("time_end"),
      g.get("lon_min").asDouble(), g.get("lat_min").asDouble(),
      g.get("lon_max").asDouble(), g.get("lat_max").asDouble(),
      new GenericArrayData(links.map(_.asInstanceOf[Any])))
  }

  def fetch(path: String, q: GranuleCatalog.CatalogQuery, page: Int,
      pageSize: Int): Seq[InternalRow] =
    pagedMatches(path, q, page * pageSize, pageSize).map(toRow)

  /** One page's rows PLUS the query's total match count, in a single
    * pass — the paged-API shape where every page response carries a
    * `hits` header (CMR does). The planner calls this once for page 0,
    * so planning costs one request instead of a count pass plus a
    * page-0 fetch. */
  def fetchWithHits(path: String, q: GranuleCatalog.CatalogQuery, page: Int,
      pageSize: Int): (Seq[InternalRow], Int) = {
    val lo = page * pageSize
    val hi = lo + pageSize
    val rows = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var hits = 0
    val src = scala.io.Source.fromFile(path)
    try src.getLines().filter(_.nonEmpty).foreach { line =>
      recordsParsed.incrementAndGet()
      val g = mapper.readTree(line)
      if (matches(g, q)) {
        if (hits >= lo && hits < hi) rows += toRow(g)
        hits += 1
      }
    } finally src.close()
    (rows.toSeq, hits)
  }
}
