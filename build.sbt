ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ingestfilespark"
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
// ExpressionsSpec builds its OWN SparkSession to prove the
// spark.sql.extensions injection path; getOrCreate would silently reuse
// (and drop extensions from) the session the other suites share, so it
// runs in a dedicated forked JVM.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value.toVector
  val env = (Test / envVars).value
  val runPolicy = Tests.SubProcess(ForkOptions().withRunJVMOptions(opts).withEnvVars(env))
  val (solo, rest) = tests.partition(_.name.endsWith("ExpressionsSpec"))
  Seq(
    Tests.Group("extensions", solo, runPolicy),
    Tests.Group("main", rest, runPolicy),
  )
}
// POSIX locale would give the forked JVMs sun.jnu.encoding=ASCII, making
// non-ASCII fixture paths unrepresentable; the -D flags alone don't fix
// the path codec on JDK 17
Test / envVars ++= Map("LC_ALL" -> "C.utf8", "LANG" -> "C.utf8")
run / envVars ++= Map("LC_ALL" -> "C.utf8", "LANG" -> "C.utf8")
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
  // the container locale is POSIX → sun.jnu.encoding=ASCII, which makes
  // non-ASCII fixture paths (EDRM « filename) unrepresentable in NIO
  "-Dfile.encoding=UTF-8",
  "-Dsun.jnu.encoding=UTF-8",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // cap the G1 young generation: at local[32] the allocation rate of the
  // extraction stage otherwise grows young to tens of GB and multi-second
  // evacuation pauses dominate wall time (measured 23s of GC at 32 threads
  // vs 1.2s at 8 before the cap)
  "-Xmn4g",
)
