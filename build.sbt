ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "assignment2dataengineeringspark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // G1 GCLocker allocation-failure guard: a JNI critical section
  // (parquet/snappy native I/O) holding the GC locker while a task
  // thread asks for a HUMONGOUS allocation (Tungsten pages are 8-128MB
  // vs 4MB G1 regions) throws OutOfMemoryError after only 2 retries by
  // default — with ~100MB actually live on an 8GB heap. This killed a
  // 115-query sf10 dump mid-d12 (round 12); a GC-logged rerun showed
  // flat ~100MB retention at every query boundary and reproduced the
  // "Retried waiting for GCLocker too often" signature. More retries
  // make the allocation wait out the locker instead of dying. (The
  // flag is diagnostic on JDK 17, hence the unlock.)
  "-XX:+UnlockDiagnosticVMOptions",
  "-XX:GCLockerRetryAllocationCount=100",
) ++
  // Extra JVM flags for the forked run/test JVMs (GC logging, GCLocker
  // tuning experiments) without editing the build: space-separated in
  // GRAFT_JAVA_OPTS. Works with `sbt -batch`; `sbt --client` ignores
  // client env (see .claude/skills/verify).
  sys.env.get("GRAFT_JAVA_OPTS").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))
