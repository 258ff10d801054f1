ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "eventstreammlspark"
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
// The bench driver parses the LAST stdout line as JSON; sbt's
// "[success] Total time ..." trailer otherwise lands after Bench's
// single JSON line and breaks that parse, and the default forked-run
// logger prefixes every line with "[info] " which breaks it too.
Global / showSuccess := false
run / outputStrategy := Some(StdoutOutput)
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
  // 32 executor threads + 43 queries in one JVM GC-thrash at 8g (bench
  // run-to-run variance ±35%); the driver box has 128 GiB
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // 144 queries' worth of whole-stage-codegen classes overflow the
  // JDK17 default 240 MB code cache mid-run; once it fills, the JIT
  // stops compiling and late queries run interpreted — measured as
  // multi-second rep spikes with near-zero GC time. Size it for the
  // full contract surface (re-raised at 170 queries: the 512m cache
  // re-saturated and the whole run measured a uniform 1.5×).
  "-XX:ReservedCodeCacheSize=1g",
  // parquet evaluates pushed IN or-chains recursively; the default
  // ~1 MB task-thread stack overflowed once at 1000 literals under a
  // deep codegen calling context. 4 MB gives the pushed-filter depth
  // 4× headroom (the code side also chunks at 1000, Hnsw.InlineChunk —
  // belt and braces).
  "-Xss4m",
) ++
  // ad-hoc JVM flags for GC experiments (space-separated), e.g.
  // SPARK_GRAFT_JVM="-XX:+UseParallelGC -Xmn16g"
  sys.env.get("SPARK_GRAFT_JVM").toSeq.flatMap(_.split("\\s+").toSeq)
