package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Batch publication sink (reference A19,
  * lambdas/submit-stac/handler.py:40-126): POST each resolved item to an
  * ingestion endpoint with a bearer token obtained once per process, or
  * short-circuit under `dry_run`.
  *
  * The transport is pluggable ([[ItemPoster]]) so the engine stays
  * testable offline; per-partition poster construction mirrors the
  * reference's module-scope session+token reuse (handler.py:112-115 — one
  * token per process ≈ one per executor partition). Failed posts become a
  * dead-letter side output (reference B7, queue_stack.py:25-29) instead
  * of failing the task.
  */
object PublishSink {

  /** One poster per partition; `post` returns an error message or None. */
  trait ItemPoster extends Serializable {
    def post(item: String): Option[String]
    def close(): Unit = ()
  }

  /** `dry_run` short-circuit (handler.py:121-124): record, don't send. */
  final class DryRunPoster(outDir: String) extends ItemPoster {
    private var opened: java.io.PrintWriter = _
    private def sink: java.io.PrintWriter = {
      if (opened == null) {
        val d = new java.io.File(outDir)
        d.mkdirs()
        opened = new java.io.PrintWriter(new java.io.FileWriter(
          new java.io.File(d, s"dryrun-${java.util.UUID.randomUUID()}.jsonl"), true))
      }
      opened
    }
    override def post(item: String): Option[String] = { sink.println(item); None }
    // don't force the sink open: empty partitions must not leave files
    override def close(): Unit = if (opened != null) opened.close()
  }

  /** OAuth2 client-credentials bearer poster (reference A19,
    * submit-stac/handler.py:57-93): one token per poster instance — the
    * reference fetches it once at module import, i.e. once per process;
    * here once per partition — via `tokenUrl` with HTTP-basic client
    * credentials and `grant_type=client_credentials`, then each item is
    * POSTed to `ingestUrl` with `Authorization: Bearer <token>`. Any
    * failure (token fetch included) returns an error instead of
    * throwing, so the item lands in the dead-letter side output
    * (reference B7) rather than failing the task.
    */
  final class BearerHttpPoster(tokenUrl: String, ingestUrl: String,
      clientId: String, clientSecret: String) extends ItemPoster {
    import java.net.http.{HttpClient, HttpRequest, HttpResponse}

    @transient private lazy val client: HttpClient = HttpClient.newBuilder().build()

    // one token per poster lifetime; Left = the failure message (kept so
    // every post of a token-less partition DLQs with the cause)
    @transient private lazy val token: Either[String, String] =
      try {
        val basic = java.util.Base64.getEncoder
          .encodeToString(s"$clientId:$clientSecret".getBytes("UTF-8"))
        val req = HttpRequest.newBuilder(java.net.URI.create(tokenUrl))
          .header("Authorization", s"Basic $basic")
          .header("Content-Type", "application/x-www-form-urlencoded")
          .POST(HttpRequest.BodyPublishers.ofString("grant_type=client_credentials"))
          .build()
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() / 100 != 2)
          Left(s"token fetch failed: HTTP ${resp.statusCode()}")
        else {
          val node = new com.fasterxml.jackson.databind.ObjectMapper()
            .readTree(resp.body())
          Option(node.get("access_token")).map(_.asText()) match {
            case Some(t) if t.nonEmpty => Right(t)
            case _ => Left("token fetch failed: no access_token in response")
          }
        }
      } catch { case e: Exception => Left(s"token fetch failed: $e") }

    override def post(item: String): Option[String] = token match {
      case Left(err) => Some(err)
      case Right(t) =>
        try {
          val req = HttpRequest.newBuilder(java.net.URI.create(ingestUrl))
            .header("Authorization", s"Bearer $t")
            .header("Content-Type", "application/json")
            .POST(HttpRequest.BodyPublishers.ofString(item))
            .build()
          val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
          // raise-on-non-2xx (handler.py:90-93) → DLQ row, not exception
          if (resp.statusCode() / 100 == 2) None
          else Some(s"HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
        } catch { case e: Exception => Some(e.toString) }
    }
  }

  /** Publish `itemCol` — EAGER, like any sink: the posts happen now,
    * exactly once, and the returned dead-letter DataFrame (item, error)
    * is materialized (a lazy version would re-post on every downstream
    * action, or never post inside foreachBatch).
    *
    * `makePoster` runs on executors — it must capture only serializable
    * state (e.g. endpoint Strings, not Path/connection objects).
    */
  def publish(items: DataFrame, itemCol: String, makePoster: () => ItemPoster): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val failed = items.select(col(itemCol).as("item"))
      .as[String]
      .mapPartitions { it =>
        val poster = makePoster()
        val out = it.flatMap { item =>
          poster.post(item).map(err => (item, err))
        }
        // exhaust before close: mapPartitions is lazy
        val buf = out.toVector
        poster.close()
        buf.iterator
      }
      .toDF("item", "error")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    failed.count() // force the posts
    failed
  }
}
