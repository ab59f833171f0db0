ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
// Sources carry UTF-8 literals (mojibake markers in t40); pin the
// encoding so compilation is locale-independent.
ThisBuild / scalacOptions += "-encoding"
ThisBuild / scalacOptions += "UTF-8"
name := "apachehadoopframeworkforpeptideidentificationspark"
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
// The bench/verify driver parses raw JSON lines from `sbt runMain` output;
// inherit the forked process's stdio so sbt's logger doesn't prefix every
// line with [info]/[error] (round 1's BENCH json failed to parse because
// of the decoration).
outputStrategy := Some(StdoutOutput)
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
) ++
  // Forward the catalog slot-claim committer choice into the forked JVM
  // (sbt -D flags stop at sbt's own JVM), so the whole Verify/test run
  // can be exercised under the conditional-put primitive:
  //   GRAFT_CATALOG_COMMITTER=createnew sbt -batch "runMain graft.Verify ..."
  sys.env.get("GRAFT_CATALOG_COMMITTER")
    .map(v => s"-Dgraft.catalog.committer=$v").toSeq
