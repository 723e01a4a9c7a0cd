ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dhtmlparserspark"
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
// forked run output goes straight to stdout, NOT through sbt's logger —
// the bench/verify contract is "print ONE JSON line"; an `[info] ` prefix
// breaks the driver's parse of that line
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
  // GC choice is a CORRECTNESS-of-measurement fix on this VM, not a tuning
  // whim. With a large -Xmx (the driver benches at ~90g) G1 allocates eden
  // from ever-new heap regions, marching first-touch page faults through
  // tens of GiB of never-committed memory — and this VM zeroes pages so
  // slowly that the faults ate 35-86% of wall as kernel system time with
  // monotonically degrading replicates (the round-2 q_gen_nodes anomaly,
  // 4.2 -> 56 -> 108 s; reproduced and attributed by Bench's new
  // sys_pct/rss_gib columns; G1MaxNewSizePercent/MaxNewSize caps did NOT
  // stop the region march, and -XX:+AlwaysPreTouch would need ~11 min to
  // pre-zero 90 GiB here). ParallelGC's eden is one fixed contiguous
  // range reused in place every cycle: committed pages stay warm, RSS
  // stabilizes at the live set, and the storm cannot happen. Young gen
  // capped at 6g: big enough that short-lived query output dies young (2g measured full-GC-bound on the string-heavy queries), small enough that the one-time eden commit stays cheap.
  "-XX:+UseParallelGC",
  // young-gen cap parameterised for measurement (round 6): 6g was the
  // round-2 pick (2g measured full-GC-bound, large eden feared for its
  // one-time commit cost); the extract-family queries still spend
  // 40-60% of wall in GC at 6g, so the cap is worth re-measuring per
  // environment. Local default stays the measured best (see
  // OPTIMIZATION_r06.md for the 6g vs 12g vs 16g numbers).
  s"-XX:MaxNewSize=${sys.env.getOrElse("SPARK_GRAFT_MAXNEW", "6g")}",
)
