// Per-query job/stage profiler (tooling, not engine code).
//   /opt/spark/bin/spark-shell --master local[32] \
//     --driver-class-path target/scala-2.13/classes \
//     --conf spark.ui.enabled=false ... -i scripts/profile_query.scala
// with -Dgraft.profile.query=q171f_hits_milli [-Dgraft.profile.passes=2]
// Prints one line per job: duration, #stages, #tasks, shuffle bytes.
import org.apache.spark.scheduler._
import scala.collection.mutable

val qname = sys.props.getOrElse("graft.profile.query", "q171f_hits_milli")
val passes = sys.props.getOrElse("graft.profile.passes", "2").toInt
val sfDir = sys.props.getOrElse("graft.profile.sf", "/root/testdata/sf0.1")

spark.sparkContext.setLogLevel("ERROR")
// mirror Bench session knobs
spark.conf.set("spark.sql.shuffle.partitions",
  sys.props.getOrElse("graft.profile.parts", "32"))
spark.conf.set("spark.sql.adaptive.enabled",
  sys.props.getOrElse("graft.profile.aqe", "true"))
spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
spark.conf.set("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (16L * 1024 * 1024).toString)
spark.conf.set("spark.sql.session.timeZone", "UTC")
spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")

case class JobRec(id: Int, var desc: String, var t0: Long = 0L, var t1: Long = 0L,
  var stages: Int = 0, var tasks: Int = 0, var shuffleRead: Long = 0L,
  var shuffleWrite: Long = 0L, var taskTimeMs: Long = 0L)
val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
val stageToJob = mutable.Map.empty[Int, Int]
val listener = new SparkListener {
  override def onJobStart(js: SparkListenerJobStart): Unit = {
    val r = JobRec(js.jobId, Option(js.properties)
      .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse(""))
    r.t0 = js.time; r.stages = js.stageInfos.size
    js.stageIds.foreach(sid => stageToJob(sid) = js.jobId)
    jobs(js.jobId) = r
  }
  override def onJobEnd(je: SparkListenerJobEnd): Unit =
    jobs.get(je.jobId).foreach(_.t1 = je.time)
  override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
    stageToJob.get(te.stageId).flatMap(jobs.get).foreach { r =>
      r.tasks += 1
      val m = te.taskMetrics
      if (m != null) {
        r.taskTimeMs += m.executorRunTime
        r.shuffleRead += m.shuffleReadMetrics.totalBytesRead
        r.shuffleWrite += m.shuffleWriteMetrics.bytesWritten
      }
    }
}
spark.sparkContext.addSparkListener(listener)

val fn = graft.SparkEntry.queries(qname)
(1 to passes).foreach { p =>
  jobs.clear(); stageToJob.clear()
  val t0 = System.nanoTime()
  fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
  val sec = (System.nanoTime() - t0) / 1e9
  Thread.sleep(500) // let listener events drain
  println(f"==== pass $p: $qname total ${sec}%.3f s, ${jobs.size} jobs ====")
  jobs.values.foreach { r =>
    val dur = (r.t1 - r.t0) / 1000.0
    println(f"job ${r.id}%3d ${dur}%7.3f s stages=${r.stages}%2d tasks=${r.tasks}%4d " +
      f"taskTime=${r.taskTimeMs / 1000.0}%7.2f s shRead=${r.shuffleRead / 1024}%8d KB " +
      f"shWrite=${r.shuffleWrite / 1024}%8d KB  ${r.desc.take(60)}")
  }
  val gap = jobs.values.toSeq.sortBy(_.t0)
  if (gap.size > 1) {
    val idle = gap.sliding(2).map { case Seq(a, b) => math.max(0L, b.t0 - a.t1) }.sum
    println(f"inter-job driver gaps total: ${idle / 1000.0}%.3f s")
  }
  // release leaked blocks like Bench.purge (no memo pinning here: this
  // profiler is for non-suffix queries; suffix-family profiling should
  // use the bench child mode instead)
  spark.catalog.clearCache()
  spark.sparkContext.getPersistentRDDs.foreach { case (_, rdd) =>
    rdd.unpersist(blocking = false) }
}
sys.exit(0)
