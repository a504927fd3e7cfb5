ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hadoopwebgraphspark"
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
// r11: run the suite in PARALLEL FORKED JVMs — suites share nothing (each
// JVM gets its own local[4] SparkSession with a temp warehouse dir), and
// the wall-clock is max(group) instead of sum(suites): the round-10
// driver's sequential `sbt test` run timed out on a contended box
// (tests_ok=false) at ~31 min where the same suite runs 8 min quiet.
// Heavy suites get their own group; 6 groups x local[4] fits the
// 32-core box without oversubscription.
Test / testGrouping := {
  val heavy = Map(
    "graft.QuerySurfaceSpec" -> 0,
    "graft.PlanQualitySpec" -> 1,
    "graft.StreamingSpec" -> 2,
    "graft.CorenessLouvainSpec" -> 3,
    "graft.BvAdvisorSpec" -> 3,
    "graft.BvScaleSpec" -> 4,
    "graft.ScaleOpsSpec" -> 4,
    "graft.PipelineSpec" -> 1,
    "graft.TextScaleRehearsalSpec" -> 2,
    "graft.BvSourceSpec" -> 4)
  val opts = (Test / forkOptions).value
  (Test / definedTests).value
    .groupBy(t => heavy.getOrElse(t.name, 5))
    .map { case (i, ts) =>
      Tests.Group(s"group$i", ts, Tests.SubProcess(opts))
    }.toSeq
}
Global / concurrentRestrictions := Seq(Tags.limit(Tags.ForkedTestGroup, 6))
// each forked test JVM must size its GC/JIT/fork-join pools for its SLICE
// of the box, not the whole box — 6 unconstrained JVMs on 32 cores spent
// 29 CPU-minutes in sys time fighting each other's GC threads
Test / javaOptions += "-XX:ActiveProcessorCount=6"
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
