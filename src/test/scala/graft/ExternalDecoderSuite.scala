package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import graft.api._
import graft.operators.ExternalDecoderStage

/** The external-decoder stage pattern (the MP3/H.264 production swap
  * path): subprocess decode with the binary shipped via
  * downloadRequests, probed per-worker setup, bounded output, and the
  * corrupt-stream failure path feeding the pipeline failure machinery.
  * The "decoder" here is a stub shell binary (uppercases its stdin;
  * aborts with exit 3 on a BAD-magic payload) — the POINT is the stage
  * contract, which is identical under a real ffmpeg.
  */
object ExternalDecoderSuite {
  val setups = new AtomicInteger(0)
  val destroys = new AtomicInteger(0)

  final class CountingDecoder(d: DownloadRequest, batch: Int = 2)
      extends ExternalDecoderStage(d, batchSize = batch) {
    override def setup(ctx: WorkerContext): Unit = {
      setups.incrementAndGet(); super.setup(ctx)
    }
    override def destroy(): Unit = {
      destroys.incrementAndGet(); super.destroy()
    }
  }
}

class ExternalDecoderSuite extends SparkSpec {
  import ExternalDecoderSuite._
  import spark.implicits._

  private def writeScript(name: String, body: String): String = {
    val dir = Files.createTempDirectory("graft-extdec")
    val p = dir.resolve(name)
    Files.write(p, body.getBytes("UTF-8"))
    p.toFile.setExecutable(true, false)
    p.toString
  }

  private val stubBody =
    """#!/bin/sh
      |if [ "$1" = "--version" ]; then echo "stubdec 1.0"; exit 0; fi
      |input=$(cat)
      |case "$input" in
      |  BAD*) echo "corrupt stream at frame 0" >&2; exit 3;;
      |esac
      |printf '%s' "$input" | tr 'a-z' 'A-Z'
      |""".stripMargin

  private def msgs(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))

  test("decode via distributed stub binary: setup probe, process, teardown") {
    val script = writeScript("stubdec.sh", stubBody)
    val ds = Seq(("k1", "hello".getBytes("UTF-8")),
      ("k2", "world".getBytes("UTF-8")),
      ("k3", "spark".getBytes("UTF-8"))).toDS().repartition(2)
    setups.set(0); destroys.set(0)
    val out = Pipeline.from(ds)
      .stage(new CountingDecoder(DownloadRequest(script)))
      .run().collect().map { case (k, b) => k -> new String(b, "UTF-8") }.toMap
    assert(out == Map("k1" -> "HELLO", "k2" -> "WORLD", "k3" -> "SPARK"))
    assert(setups.get() >= 1, "per-worker setup (probe) must have run")
    assert(destroys.get() == setups.get(),
      "every worker setup must pair with a destroy at task completion")
  }

  test("corrupt stream: decoder exit surfaces with its stderr attached") {
    val script = writeScript("stubdec-c.sh", stubBody)
    val ds = Seq(("bad", ("BAD\u0000payload").getBytes("UTF-8"))).toDS()
    val e = intercept[Exception](
      Pipeline.from(ds)
        .stage(new ExternalDecoderStage(DownloadRequest(script)))
        .run().collect())
    val all = msgs(e).mkString(" | ")
    assert(all.contains("exited 3") && all.contains("corrupt stream"), all)
  }

  test("corrupt stream under ignoreFailures: bad sample drops, good ones survive") {
    val script = writeScript("stubdec-i.sh", stubBody)
    val ds = Seq(("g1", "alpha".getBytes("UTF-8")),
      ("bad", "BADx".getBytes("UTF-8")),
      ("g2", "bravo".getBytes("UTF-8"))).toDS()
    val out = Pipeline.from(ds, PipelineConfig(ignoreFailures = true))
      .stage(new ExternalDecoderStage(DownloadRequest(script),
        batchSize = 1)) // per-sample batches: only the bad SAMPLE drops
      .run().collect().map(_._1).toSet
    assert(out == Set("g1", "g2"))
  }

  test("broken binary fails the setup probe, inside the retry envelope") {
    val script = writeScript("deaddec.sh",
      "#!/bin/sh\necho 'no such codec' >&2\nexit 2\n")
    val ds = Seq(("k", "x".getBytes("UTF-8"))).toDS()
    val e = intercept[Exception](
      Pipeline.from(ds, PipelineConfig(numSetupAttempts = 2))
        .stage(new ExternalDecoderStage(DownloadRequest(script)))
        .run().collect())
    val all = msgs(e).mkString(" | ")
    assert(all.contains("probe") && all.contains("exited 2"), all)
  }

  test("hung decoder is killed at timeoutMs even while it holds stdout open") {
    val script = writeScript("hangdec.sh",
      "#!/bin/sh\nif [ \"$1\" = \"--version\" ]; then exit 0; fi\n" +
        "cat > /dev/null\nsleep 60\n")
    val ds = Seq(("k", "x".getBytes("UTF-8"))).toDS()
    val t0 = System.nanoTime()
    val e = intercept[Exception](
      Pipeline.from(ds)
        .stage(new ExternalDecoderStage(DownloadRequest(script),
          timeoutMs = 1500))
        .run().collect())
    assert(msgs(e).mkString(" | ").contains("timed out"))
    assert((System.nanoTime() - t0) / 1e9 < 30,
      "the watchdog must fire; stdout EOF alone would wait out the sleep")
  }

  test("group kill reaches a double-forked grandchild (out of the descendants() tree)") {
    import graft.operators.DecoderReaper
    // the grandchild double-forks: its subshell parent exits immediately,
    // so it reparents to init and ProcessHandle.descendants() can no
    // longer see it — only the process-GROUP kill (setsid spawn) reaches
    // it. It also inherits the stdout pipe, so an unkilled grandchild
    // would hold the reader open long past the decoder's own death.
    val pidFile = Files.createTempFile("graft-grandchild", ".pid")
    val script = writeScript("forkdec.sh",
      "#!/bin/sh\nif [ \"$1\" = \"--version\" ]; then exit 0; fi\n" +
        s"( sleep 300 & echo $$! > $pidFile )\n" +
        "cat > /dev/null\nsleep 300\n")
    val ds = Seq(("k", "x".getBytes("UTF-8"))).toDS()
    val e = intercept[Exception](
      Pipeline.from(ds)
        .stage(new ExternalDecoderStage(DownloadRequest(script),
          timeoutMs = 1500))
        .run().collect())
    assert(msgs(e).mkString(" | ").contains("timed out"))
    val gpid = new String(Files.readAllBytes(pidFile), "UTF-8").trim.toLong
    // give the SIGKILL a moment to land, then require the grandchild dead
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    def alive = ProcessHandle.of(gpid).map[Boolean](_.isAlive).orElse(false)
    while (alive && System.nanoTime() < deadline) Thread.sleep(50)
    assert(!alive, s"double-forked grandchild $gpid survived the group kill")
    // the decode completed (finally-block): nothing left in this JVM's ledger
    assert(DecoderReaper.reapOrphans() == 0)
  }

  test("node reap: dead-owner ledger groups die; start-time guard spares recycled pids") {
    import graft.operators.DecoderReaper
    // simulate a hard-killed executor JVM: a ledger file named by a DEAD
    // owner pid, listing a still-running setsid'd process group
    val deadOwner = {
      val p = new ProcessBuilder("/bin/true").start()
      p.waitFor(); p.pid()
    }
    val victim = new ProcessBuilder("setsid", "sleep", "300").start()
    val survivor = new ProcessBuilder("setsid", "sleep", "300").start()
    try {
      val vStart = victim.info().startInstant().get().toEpochMilli
      Files.createDirectories(DecoderReaper.ledgerDir.toPath)
      val ledger = DecoderReaper.ledgerDir.toPath.resolve(s"$deadOwner.pids")
      // victim: correct start time -> reaped. survivor: WRONG start time
      // (the recorded leader pid was recycled by an innocent process) ->
      // the guard must spare it, and the stale entry just drops.
      Files.write(ledger,
        (s"${victim.pid()} $vStart\n" +
          s"${survivor.pid()} ${vStart + 999999}\n").getBytes("UTF-8"))
      assert(DecoderReaper.reapOrphans() == 1)
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (victim.isAlive && System.nanoTime() < deadline) Thread.sleep(50)
      assert(!victim.isAlive, "dead-owner group must be reaped")
      assert(survivor.isAlive, "start-time mismatch (recycled pid) must not kill")
      assert(!Files.exists(ledger), "reaped ledger file must be deleted")
      // idempotent: nothing left to reap
      assert(DecoderReaper.reapOrphans() == 0)
    } finally {
      DecoderReaper.killGroupOwned(victim.pid())
      DecoderReaper.killGroupOwned(survivor.pid())
    }
  }

  test("stderr past the keep-cap drains instead of deadlocking the decoder") {
    val script = writeScript("chattydec.sh",
      "#!/bin/sh\nif [ \"$1\" = \"--version\" ]; then exit 0; fi\n" +
        "i=0\nwhile [ $i -lt 4000 ]; do echo \"warning: noisy decoder diagnostics line $i\" >&2; i=$((i+1)); done\n" +
        "input=$(cat)\nprintf '%s' \"$input\" | tr 'a-z' 'A-Z'\n")
    val ds = Seq(("k", "quiet".getBytes("UTF-8"))).toDS()
    val out = Pipeline.from(ds)
      .stage(new ExternalDecoderStage(DownloadRequest(script), timeoutMs = 60000))
      .run().collect()
    assert(new String(out.head._2, "UTF-8") == "QUIET",
      ">64 KiB of stderr must not wedge the pipes")
  }

  test("REAL system binary (gzip -dc): wire protocol pinned against foreign code") {
    // The stub specs prove the stage contract; this pins the wire
    // protocol (stdin payload → stdout bytes, non-zero exit + stderr on
    // corrupt input, --version probe) against a program we didn't
    // write. Skipped cleanly when the OS has no gzip.
    val gz = Seq("/usr/bin/gzip", "/bin/gzip")
      .find(p => Files.isExecutable(Paths.get(p)))
    assume(gz.isDefined, "no system gzip on this machine")
    def pack(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b); g.close(); bo.toByteArray
    }
    val big = Array.fill(100000)('x'.toByte)
    val ds = Seq(("k1", pack("hello graft".getBytes("UTF-8"))),
      ("k2", pack(big))).toDS()
    val out = Pipeline.from(ds)
      .stage(new ExternalDecoderStage(DownloadRequest(gz.get),
        decodeArgs = Seq("-dc")))
      .run().collect().toMap
    assert(new String(out("k1"), "UTF-8") == "hello graft")
    assert(java.util.Arrays.equals(out("k2"), big),
      "a 100 KB decompression must round-trip byte-exact")
    // corrupt-stream discipline against the real binary: garbage input
    // exits non-zero and the stage surfaces it
    val bad = Seq(("bad", "this is not a gzip stream".getBytes("UTF-8"))).toDS()
    val e = intercept[Exception](
      Pipeline.from(bad)
        .stage(new ExternalDecoderStage(DownloadRequest(gz.get),
          decodeArgs = Seq("-dc")))
        .run().collect())
    assert(msgs(e).mkString(" | ").contains("exited"),
      "real gzip must fail loud on a non-gzip payload")
  }

  test("probe tolerates a --version banner larger than the 8 KiB keep-buffer") {
    val script = writeScript("bannerdec.sh",
      "#!/bin/sh\nif [ \"$1\" = \"--version\" ]; then\n" +
        "  i=0\n  while [ $i -lt 1000 ]; do echo \"banner line $i with some padding text to exceed the cap\"; i=$((i+1)); done\n" +
        "  exit 0\nfi\n" +
        "input=$(cat)\nprintf '%s' \"$input\" | tr 'a-z' 'A-Z'\n")
    val ds = Seq(("k", "quiet".getBytes("UTF-8"))).toDS()
    val out = Pipeline.from(ds)
      .stage(new ExternalDecoderStage(DownloadRequest(script)))
      .run().collect()
    assert(new String(out.head._2, "UTF-8") == "QUIET",
      "a chatty but healthy --version banner must not fail setup")
  }

  test("runaway output fails loud at maxOutputBytes, not at executor OOM") {
    val script = writeScript("bombdec.sh",
      "#!/bin/sh\nif [ \"$1\" = \"--version\" ]; then exit 0; fi\n" +
        "cat /dev/zero | head -c 1048576\n")
    val ds = Seq(("k", "x".getBytes("UTF-8"))).toDS()
    val e = intercept[Exception](
      Pipeline.from(ds)
        .stage(new ExternalDecoderStage(DownloadRequest(script),
          maxOutputBytes = 1024))
        .run().collect())
    assert(msgs(e).mkString(" | ").contains("maxOutputBytes"))
  }
}
