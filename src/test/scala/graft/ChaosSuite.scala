package graft

import org.scalatest.funsuite.AnyFunSuite

/** Worker-death chaos parity (reference: test_segfaulting_pipeline.py /
  * test_actor_pool_death_recovery.py). The probe needs `local[4,2]` —
  * task retries, which the shared spec session (`local[4]`, maxFailures
  * pinned to 1) cannot provide — so it runs in its own spawned JVM and
  * this spec asserts on its verdict line. See [[ChaosProbe]] for what the
  * probe itself checks (retry happened, output == no-failure oracle,
  * setup/destroy bracketing, node latch re-ran).
  */
class ChaosSuite extends AnyFunSuite {

  test("F23-chaos: task dying mid-batch recovers via Spark task retry; pipeline output intact") {
    val javaBin = java.nio.file.Paths
      .get(System.getProperty("java.home"), "bin", "java").toString
    // this (forked) test JVM carries the full compile+test classpath
    val cp = System.getProperty("java.class.path")
    // inherit THIS JVM's module options (build.sbt's jdk17AddOpens) so the
    // two lists cannot drift when a Spark upgrade needs one more open;
    // fall back to a minimal list if the MXBean reports none (unforked)
    import scala.jdk.CollectionConverters._
    val raw = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
    // the flag arrives either as one "--add-opens=x" token or a
    // ("--add-opens", "x") pair — keep both shapes intact
    val inherited = raw.zipWithIndex.flatMap { case (a, i) =>
      if (a == "--add-opens" || a == "--add-exports") Seq(a, raw(i + 1))
      else if (a.startsWith("--add-opens=") || a.startsWith("--add-exports=")) Seq(a)
      else Seq.empty
    }
    val addOpens =
      if (inherited.nonEmpty) inherited
      else Seq("java.base/java.lang", "java.base/java.nio", "java.base/sun.nio.ch",
        "java.base/java.util", "java.base/java.util.concurrent")
        .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false", "-cp", cp, "graft.ChaosProbe"))
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = scala.io.Source.fromInputStream(proc.getInputStream).mkString
    val code = proc.waitFor()
    assert(code == 0, s"chaos probe exited $code:\n${out.takeRight(4000)}")
    assert(out.contains("CHAOS_OK"), s"no verdict line:\n${out.takeRight(4000)}")
    // surface the verdict for the test log
    info(out.linesIterator.find(_.startsWith("CHAOS_OK")).getOrElse(""))
  }
}
