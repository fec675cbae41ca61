package graft.operators

import java.io.{ByteArrayOutputStream, InputStream}
import java.util.concurrent.TimeUnit
import java.util.concurrent.atomic.AtomicReference

import graft.api.{DownloadRequest, Stage, WorkerContext}

/** The production swap path for the codecs the JVM genuinely lacks
  * (MP3, H.264 — see [[Multimodal]]'s FakeCodec note): decode through
  * an EXTERNAL subprocess (ffmpeg-shaped: payload on stdin, decoded
  * bytes on stdout, diagnostics on stderr, non-zero exit on failure)
  * instead of pretending a pure-JVM codec exists. The stage pattern
  * carries everything the in-JVM decoders get for free:
  *
  *  - **binary distribution**: the decoder executable ships through
  *    [[Stage.downloadRequests]] — fetched once per node by Spark's
  *    file distribution before `setup` runs (the reference
  *    download-requests contract), never baked into the image.
  *  - **per-worker setup**: `setup()` resolves the executor-local
  *    path, restores the executable bit (file distribution does not
  *    preserve mode), and PROBES the binary (`probeArgs`, e.g.
  *    `--version`) so a broken download fails inside the
  *    `numSetupAttempts` retry envelope, not on the first sample.
  *  - **bounded batch memory**: stdout is read into a capped buffer —
  *    a decoder gone wild (or a decompression bomb of a payload)
  *    fails loud at `maxOutputBytes` instead of OOMing the executor.
  *    Resident bytes are ≤ `batchSize × (payload + maxOutputBytes)`.
  *  - **corrupt-stream discipline**: non-zero exit, cap breach, or
  *    timeout throws with the decoder's stderr attached — so the
  *    pipeline's failure machinery (`numRunAttempts`,
  *    `ignoreFailures`, `failuresReturnNones`,
  *    `resetWorkersOnFailure`) applies to external decode exactly as
  *    to JVM stages.
  *  - **teardown**: `destroy()` force-kills any in-flight subprocess,
  *    so a cancelled task never leaks a decoder process on the node.
  *
  * One subprocess per payload, not a long-lived daemon: decode is
  * seconds-per-item work where fork cost is noise, and per-item
  * processes give hard memory/crash isolation (a decoder segfault
  * fails ONE sample). Wire format stays the decoder's own (PCM/PPM on
  * stdout) — parse with [[Multimodal]]'s existing walkers downstream.
  *
  * Reference anchor: the subprocess-worker pattern of
  * pipelines/v1 stages that shell out per batch, with
  * file_distribution supplying the binary.
  */
object ExternalDecoderStage {
  /** Absolute path of `setsid` if the node has it (util-linux —
    * effectively always on Linux; absent on e.g. macOS dev laptops,
    * where decoders fall back to plain spawn + descendants() kill and
    * the reap layer is inert). Resolved once per JVM from PATH.
    */
  private[operators] lazy val setsidPath: Option[String] =
    sys.env.getOrElse("PATH", "/usr/bin:/bin").split(java.io.File.pathSeparatorChar)
      .iterator
      .map(d => new java.io.File(d, "setsid"))
      .collectFirst { case f if f.isFile && f.canExecute => f.getAbsolutePath }
}

class ExternalDecoderStage(
    decoder: DownloadRequest,
    decodeArgs: Seq[String] = Seq.empty,
    probeArgs: Seq[String] = Seq("--version"),
    maxOutputBytes: Long = 256L << 20,
    timeoutMs: Long = 120000L,
    override val batchSize: Int = 4)
  extends Stage[(String, Array[Byte]), (String, Array[Byte])] {
  require(maxOutputBytes > 0, "maxOutputBytes must be positive")
  require(timeoutMs > 0, "timeoutMs must be positive")

  override def downloadRequests: Seq[DownloadRequest] = Seq(decoder)

  @transient private var binPath: String = _
  @transient private lazy val inFlight = new AtomicReference[Process](null)

  override def setup(ctx: WorkerContext): Unit = {
    // Node-level orphan reap (reference: ray_utils reap machinery): the
    // first decoder setup on this JVM kills any process group left by a
    // HARD-killed previous executor JVM on the node (lazy val = once).
    DecoderReaper.reapOnStart
    val f = new java.io.File(decoder.localPath)
    require(f.isFile, s"decoder binary not distributed: ${decoder.uri}")
    f.setExecutable(true, false)
    binPath = f.getAbsolutePath
    // The probe only needs the exit code + stderr; a --version banner
    // longer than the 8 KiB keep-buffer is fine — drain it to EOF and
    // keep a truncated prefix (truncateOk) rather than failing setup on
    // a chatty but healthy binary.
    val (code, _, err) = run(probeArgs, Array.emptyByteArray, 8192,
      truncateOk = true)
    require(code == 0,
      s"decoder probe `$binPath ${probeArgs.mkString(" ")}` exited $code: $err")
  }

  override def process(batch: Seq[(String, Array[Byte])]): Seq[(String, Array[Byte])] =
    batch.map { case (key, payload) =>
      val (code, out, err) = run(decodeArgs, payload, maxOutputBytes)
      if (code != 0)
        throw new IllegalStateException(
          s"decoder exited $code on key=$key: $err")
      key -> out
    }

  override def destroy(): Unit = {
    val p = inFlight.getAndSet(null)
    if (p != null && p.isAlive) kill(p)
  }

  /** Kill the decoder AND its descendants: a decoder that shells out
    * (ffmpeg via a wrapper script) leaves grandchildren holding the
    * stdout pipe open — killing only the direct child would leave the
    * reader blocked until the grandchild exits on its own. Under group
    * spawn (setsid, the default where available) the kill is a process-
    * GROUP kill, which also reaches double-forked grandchildren that
    * reparented to init and fell out of the descendants() tree.
    */
  private def kill(p: Process): Unit = {
    if (ExternalDecoderStage.setsidPath.isDefined)
      DecoderReaper.killGroupOwned(p.pid())
    p.descendants().forEach(h => { h.destroyForcibly(); () })
    p.destroyForcibly()
    ()
  }

  /** Launch `binPath args`, feed `stdin`, return (exit, stdout, stderr
    * snippet). stdin pumps from its own thread (a decoder that writes
    * before draining its input would deadlock a single-threaded pump);
    * stdout reads on the task thread under the byte cap; stderr drains
    * TO EOF concurrently, keeping only the first 64 KiB (stopping at
    * the cap would fill the pipe and deadlock a chatty decoder); a
    * watchdog kills the process at `timeoutMs` — the stdout read
    * happens BEFORE waitFor, so without the watchdog a hung decoder
    * that holds stdout open would block the task forever.
    */
  private def run(args: Seq[String], stdin: Array[Byte],
      outCap: Long, truncateOk: Boolean = false): (Int, Array[Byte], String) = {
    // Own process group (setsid keeps the pid: the spawned child is not
    // a group leader, so util-linux setsid exec's in place): group kills
    // reach every descendant, and the group is RECORDED so a node-level
    // reap can kill it if this JVM dies hard mid-decode.
    val grouped = ExternalDecoderStage.setsidPath
    val cmd = grouped.toSeq ++ (binPath +: args)
    val pb = new ProcessBuilder(cmd: _*)
    val p = pb.start()
    if (grouped.isDefined) DecoderReaper.record(p.pid())
    inFlight.set(p)
    val timedOut = new java.util.concurrent.atomic.AtomicBoolean(false)
    val watchdog = new Thread(() => {
      if (!p.waitFor(timeoutMs, TimeUnit.MILLISECONDS)) {
        timedOut.set(true)
        kill(p)
      }
    }, "graft-decoder-watchdog")
    watchdog.setDaemon(true)
    watchdog.start()
    try {
      val feeder = new Thread(() => {
        try { p.getOutputStream.write(stdin); p.getOutputStream.close() }
        catch { case _: java.io.IOException => () } // decoder died early: exit code tells
      }, "graft-decoder-stdin")
      feeder.setDaemon(true)
      feeder.start()
      val errBuf = new ByteArrayOutputStream()
      val errPump = new Thread(() => {
        try copyCapped(p.getErrorStream, errBuf, 65536, drainPastCap = true)
        catch { case _: java.io.IOException => () }
      }, "graft-decoder-stderr")
      errPump.setDaemon(true)
      errPump.start()
      val out = new ByteArrayOutputStream()
      val capped = copyCapped(p.getInputStream, out, outCap,
        drainPastCap = truncateOk)
      if (timedOut.get())
        throw new IllegalStateException(s"decoder timed out after ${timeoutMs}ms")
      if (capped && !truncateOk) {
        kill(p)
        throw new IllegalStateException(
          s"decoder output exceeded $outCap bytes (maxOutputBytes) — " +
            "runaway decode or bomb payload")
      }
      if (!p.waitFor(timeoutMs, TimeUnit.MILLISECONDS)) {
        kill(p)
        throw new IllegalStateException(s"decoder timed out after ${timeoutMs}ms")
      }
      errPump.join(1000)
      if (timedOut.get())
        throw new IllegalStateException(s"decoder timed out after ${timeoutMs}ms")
      (p.exitValue(), out.toByteArray,
        new String(errBuf.toByteArray, java.nio.charset.StandardCharsets.UTF_8).trim)
    } finally {
      inFlight.compareAndSet(p, null)
      if (p.isAlive) kill(p)
      if (grouped.isDefined) DecoderReaper.unrecord(p.pid())
    }
  }

  /** Copy until EOF or cap; true iff the cap was hit (cap+1 bytes seen).
    * `drainPastCap` keeps READING (discarding) after the cap — required
    * for stderr, where abandoning the pipe would block the child.
    */
  private def copyCapped(in: InputStream, out: ByteArrayOutputStream,
      cap: Long, drainPastCap: Boolean): Boolean = {
    val buf = new Array[Byte](65536)
    var total = 0L
    var hit = false
    var n = in.read(buf)
    while (n >= 0) {
      if (!hit) {
        if (total + n > cap) {
          val room = (cap - total).toInt
          if (room > 0) out.write(buf, 0, room)
          hit = true
          if (!drainPastCap) return true
        } else {
          out.write(buf, 0, n)
          total += n
        }
      }
      n = in.read(buf)
    }
    hit
  }
}
