package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Job-level attribution for a registered query (dev tool): runs the
  * query once warm, once measured, and prints per-job wall time, stage
  * and task counts, and summed executor task time — separating driver/
  * scheduling fixed cost from actual compute (guide §1/§7).
  *
  * usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32
  *   sbt "runMain graft.tools.JobProbe <name> [name...]"
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    final case class JobAgg(var start: Long = 0L, var end: Long = 0L,
      var stages: Int = 0, var tasks: Int = 0, var taskTimeMs: Long = 0L,
      var site: String = "")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobAgg]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    @volatile var collecting = false
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (collecting) {
        val a = new JobAgg(start = e.time,
          site = Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .getOrElse(""))
        jobs.put(e.jobId, a)
        e.stageIds.foreach(s => stageToJob.put(s, e.jobId))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val a = jobs.get(e.jobId); if (a != null) a.end = e.time
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val j = stageToJob.get(e.stageInfo.stageId)
        val a = if (j != null) jobs.get(j) else null
        if (a != null) {
          a.stages += 1
          a.tasks += e.stageInfo.numTasks
        }
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val j = stageToJob.get(e.stageId)
        val a = if (j != null) jobs.get(j) else null
        if (a != null && e.taskInfo != null)
          a.taskTimeMs += e.taskInfo.duration
      }
    }
    spark.sparkContext.addSparkListener(listener)

    args.toSeq.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      fn(spark, d).count(); spark.catalog.clearCache() // warm
      jobs.clear(); stageToJob.clear()
      collecting = true
      val t0 = System.nanoTime()
      fn(spark, d).count()
      val wall = (System.nanoTime() - t0) / 1e9
      collecting = false
      spark.catalog.clearCache()
      Thread.sleep(500) // let listener drain
      import scala.jdk.CollectionConverters._
      val js = jobs.asScala.toSeq.sortBy(_._1)
      val totJobWall = js.map(j => (j._2.end - j._2.start) / 1e3).sum
      val totTask = js.map(_._2.taskTimeMs).sum / 1e3
      println(f"[jobprobe] $n wall=$wall%.2fs jobs=${js.size} " +
        f"jobWallSum=$totJobWall%.2fs taskTimeSum=$totTask%.2fs " +
        f"stages=${js.map(_._2.stages).sum} tasks=${js.map(_._2.tasks).sum}")
      js.foreach { case (id, a) =>
        println(f"[jobprobe]   job $id%3d wall=${(a.end - a.start) / 1e3}%6.2fs " +
          f"stages=${a.stages}%2d tasks=${a.tasks}%4d taskTime=${a.taskTimeMs / 1e3}%6.2fs  ${a.site}")
      }
    }
    spark.stop()
  }
}
