ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "daskcudfspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The driver parses Bench's JSON from the tail of stdout. sbt's default
// LoggedOutput strategy prefixes every forked-run line with "[info] ",
// which broke that parse two rounds running (BENCH_r01/r02 parsed:null).
// StdoutOutput pipes the child's stdout through verbatim.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// r18 (r17 VERDICT item 2): the full suite ran ~19 min wall in ONE
// forked JVM on one 4-core session and the driver's test gate timed
// out (`tests_ok:false` on a truncated, failure-free tail). Partition
// the suites across parallel forked JVMs — each group gets its own
// SparkSession (SparkSpec is JVM-scoped), its own java.io.tmpdir (so
// the Engine warehouse dir, derby home and streaming checkpoints never
// collide across groups), and the heavy suites are spread by name.
// GRAFT_TEST_GROUPS=1 restores the serial single-JVM mode.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val base = (Test / forkOptions).value
  val n = sys.env.getOrElse("GRAFT_TEST_GROUPS", "4").toInt.max(1)
  // the three suites measured heaviest get spread first, one per group;
  // everything else round-robins by stable name order
  val heavy = Seq("graft.StreamingSpec", "graft.CorpusSpec",
    "graft.PropertySpec", "graft.QueriesSmokeSpec")
  val (h, rest) = tests.partition(t => heavy.contains(t.name))
  val ordered = h.sortBy(t => heavy.indexOf(t.name)) ++ rest.sortBy(_.name)
  ordered.zipWithIndex.groupBy(_._2 % n).toSeq.sortBy(_._1).map {
    case (i, ts) =>
      val tmp = file(s"/tmp/graft-testg-$i")
      IO.createDirectory(tmp)
      val opts = base.withRunJVMOptions(base.runJVMOptions ++
        Vector(s"-Djava.io.tmpdir=${tmp.getAbsolutePath}"))
      Tests.Group(s"g$i", ts.map(_._1), Tests.SubProcess(opts))
  }
}
// allow the forked groups to actually run concurrently
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, sys.env.getOrElse("GRAFT_TEST_GROUPS", "4").toInt.max(1)),
  Tags.limitAll(8),
)
