ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "shared_solar_data_warehousespark"
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
  // 24g default: the box has 128 GiB and local[32] runs driver+executors in
  // this one JVM — at 8g the 90-query bench showed GC-driven 3-8× inflation
  // on the late n²-heavy queries (round-1 driver run).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // A 90-query bench Janino-compiles hundreds of generated classes in one
  // JVM; if the JIT code cache fills, HotSpot silently stops compiling and
  // every later query runs interpreted (matches the progressive 2-10×
  // late-query inflation seen only in full-suite runs). Double the cache and
  // let cold code be flushed instead of disabling the compiler.
  "-XX:ReservedCodeCacheSize=512m",
  "-XX:+UseCodeCacheFlushing",
)
