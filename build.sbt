ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "deltarsspark"
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
// The container locale is POSIX; sun.jnu.encoding follows the OS locale
// (JEP 400: the -D override is unsupported), so without this the forked
// JVM cannot create non-ASCII file names (UTF-8 partition-dir values).
Test / envVars += "LC_ALL" -> "C.utf8"
run / envVars += "LC_ALL" -> "C.utf8"
// Forward the forked run's stdout RAW (no "[info] " prefix): Bench's
// contract is ONE machine-parsable JSON line on stdout, and the log
// prefix breaks strict line parsers.
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
  "-Dfile.encoding=UTF-8",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// ---- Parallel forked test groups (r18, VERDICT #1) -------------------
// The suite outgrew the driver's verification window running sequentially
// in ONE forked JVM (r17: tests_ok:false was a timeout — 850/0 green in
// the report XMLs). Suites are greedily bin-packed into a fixed number of
// groups by their measured wall (the weights below are the r18 recorded
// times; unknown suites default to 10s), each group a separate forked JVM
// with its own SparkSession — no shared session state across groups, so
// per-suite behavior is unchanged. Wall drops from the suite SUM to the
// heaviest group (~6x). SPARK_GRAFT_TEST_GROUPS=1 restores serial runs.
val suiteWeights: Map[String, Double] = Map(
  "graft.ops.DedupIndexFoldSpec" -> 324, "graft.ops.DedupIndexSpec" -> 278,
  "graft.OrderTotalitySpec" -> 127, "graft.delta.CoordinatedProcessStormSpec" -> 105,
  "graft.delta.LifecycleFuzzSpec" -> 85, "graft.ops.IvfIndexSpec" -> 79,
  "graft.delta.ProcessStormSpec" -> 47, "graft.delta.RowTrackingFuzzSpec" -> 35,
  "graft.delta.DmlPropSpec" -> 33, "graft.delta.MergeSpec" -> 33,
  "graft.delta.ChangeDataFeedSpec" -> 32, "graft.delta.GraftDeltaSourceSpec" -> 29,
  "graft.delta.VersionLedgerPropSpec" -> 22, "graft.delta.ModernTierFuzzSpec" -> 20,
  "graft.delta.DmlStormSpec" -> 25, "graft.ops.SimilaritySpec" -> 18,
  "graft.delta.ConflictSpec" -> 15, "graft.delta.ObjectStoreSeamSpec" -> 15,
  "graft.delta.DeletionVectorsSpec" -> 15, "graft.delta.ColumnMappingSpec" -> 15,
)
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val fo = (Test / forkOptions).value
  val n = sys.env.get("SPARK_GRAFT_TEST_GROUPS")
    .flatMap(s => scala.util.Try(s.toInt).toOption)
    .getOrElse(6).max(1)
  val loads = Array.fill(n)(0.0)
  val groups = Array.fill(n)(Seq.newBuilder[TestDefinition])
  tests.sortBy(t => -suiteWeights.getOrElse(t.name, 10.0)).foreach { t =>
    val i = loads.indexOf(loads.min)
    loads(i) += suiteWeights.getOrElse(t.name, 10.0)
    groups(i) += t
  }
  groups.zipWithIndex.map { case (g, i) =>
    Tests.Group(s"group$i", g.result(), Tests.SubProcess(fo))
  }.toSeq
}
// REPLACE the defaults: sbt's default restrictions cap forked test groups
// at 1, and `+=` would leave that cap in force alongside ours
Global / concurrentRestrictions := Seq(
  Tags.limitAll(math.max(8, java.lang.Runtime.getRuntime.availableProcessors)),
  Tags.limit(Tags.ForkedTestGroup, 6))
