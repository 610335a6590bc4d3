ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "marketetlspark"
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
// Forked-process stdout goes straight through instead of being
// re-logged with "[info] " prefixes — the driver parses Bench's
// single JSON line from stdout and the prefix broke that in round 1
// (BENCH_r01.json: parsed=null).
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
// The 241-test suite outgrew the driver's wall window when run
// sequentially in one forked JVM (round 17: killed mid-EtlSpec).
// Suites are independent (each writes its own target/tmp/* paths and
// builds its own local[4] session), so run each in its own forked JVM,
// several at a time: wall clock drops to roughly the slowest suite.
// 6 groups x local[4] fits the 32-core box; -Xmx stays per-JVM.
Test / testGrouping := {
  val opts = (Test / javaOptions).value.toVector
  (Test / definedTests).value.map { t =>
    Tests.Group(t.name, Seq(t),
      Tests.SubProcess(ForkOptions().withRunJVMOptions(opts)))
  }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 6),
  Tags.limitAll(16),
)
