// 100x scale stress of the round-7 late additions: q154b substring-dedup
// rewrite and q151c Kneser-Ney LM. Reuses the /tmp/stress100 replicated
// fixture (build via stress100.scala if absent).
// Run:  /opt/spark/bin/spark-shell --master "local[32]" \
//         --driver-class-path /root/repo/target/scala-2.13/classes \
//         --driver-memory 100g \
//         --conf spark.sql.shuffle.partitions=32 \
//         --conf spark.sql.adaptive.enabled=true \
//         --conf spark.sql.autoBroadcastJoinThreshold=16777216 \
//         --conf spark.sql.session.timeZone=UTC \
//         --conf spark.ui.enabled=false \
//         -i /root/repo/scripts/stress_substr.scala
// NOTE the 100x fixture is a wholesale-duplication worst case for
// q154b: every doc has 100 verbatim copies, so ~all windows are
// duplicated and ~99% of text is excised -- the heaviest possible
// marked/cover volume for the op. Work must stay LINEAR regardless
// (occurrence lists are grouped, never paired).
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

val sf = "/root/testdata/sf0.1"
val out = "/tmp/stress100"

object M {
  @volatile var shuffleWrite = 0L
  @volatile var peakExecMem = 0L
}
spark.sparkContext.addSparkListener(new SparkListener {
  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) {
      M.shuffleWrite += m.shuffleWriteMetrics.bytesWritten
      M.peakExecMem = math.max(M.peakExecMem, m.peakExecutionMemory)
    }
  }
})

def run(tag: String, name: String, dir: String): Unit = {
  M.shuffleWrite = 0L; M.peakExecMem = 0L
  val t0 = System.nanoTime()
  graft.SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.foreach(_ => ())
  val sec = (System.nanoTime() - t0) / 1e9
  println(f"[stress] $tag%-8s $name%-24s $sec%8.2f s  " +
    f"shuffleWrite=${M.shuffleWrite / 1048576.0}%9.1f MiB  " +
    f"peakTaskMem=${M.peakExecMem / 1048576.0}%7.1f MiB")
}

run("warmup", "q154b_dedup_substrings", sf)
for (q <- Seq("q154b_dedup_substrings", "q151c_kn_lm")) {
  run("sf0.1", q, sf)
  run("100x", q, out)
}
System.exit(0)
