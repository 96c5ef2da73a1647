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
