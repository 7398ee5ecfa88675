package graft.exec

import org.scalatest.funsuite.AnyFunSuite

/** Task-retry determinism for the Rank two-job primitives (and the
  * q_exact_quantiles / q_ks_test gates built on them): a first task
  * attempt fails, the partition recomputes, and the output must be
  * byte-identical — never a silently shifted rank.
  *
  * `spark.task.maxFailures` is fixed at SparkContext construction and
  * the suite's shared session runs with no retries, so the actual
  * injection lives in [[graft.tools.RetryProbe]] (a main running under
  * `local[8,2]`) and this spec shells it out as a child JVM — the same
  * classpath-the-driver-uses pattern as tools/localcheck.py.
  */
class RetryDeterminismSpec extends AnyFunSuite {

  test("injected first-attempt task failures never change rank/prefix-sum output") {
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke", "java.base/java.lang.reflect",
      "java.base/java.io", "java.base/java.net", "java.base/java.nio", "java.base/java.util",
      "java.base/java.util.concurrent", "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs", "java.base/sun.security.action",
      "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val classesDir = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val testClasses = new java.io.File("target/scala-2.13/test-classes").getAbsolutePath
    val cmd = Seq("java") ++ addOpens ++ Seq(
      "-Xmx6g", "-Dspark.ui.enabled=false",
      "-cp", s"/opt/spark/jars/*:$classesDir:$testClasses",
      "graft.tools.RetryProbe", "/root/testdata/sf0.001")
    val out = new StringBuilder
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    var line = reader.readLine()
    while (line != null) {
      if (line.contains("[retryprobe]")) out.append(line).append('\n')
      line = reader.readLine()
    }
    val exit = proc.waitFor()
    val report = out.toString
    assert(exit == 0 && report.contains("ALL PASS"),
      s"RetryProbe failed (exit $exit):\n$report")
    // every individual check must be present AND pass — a probe that
    // silently skipped a case would otherwise still say ALL PASS
    Seq("rankGlobal/map-stage-retry", "rankGlobal/result-stage-retry",
      "runningSums/map-stage-retry", "runningSums/result-stage-retry",
      "q_exact_quantiles/poisoned-retry", "q_ks_test/poisoned-retry")
      .foreach(c => assert(report.contains(s"$c PASS"), s"missing check: $c\n$report"))
  }
}
