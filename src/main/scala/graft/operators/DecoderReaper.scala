package graft.operators

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Node-level orphan-subprocess reaping for [[ExternalDecoderStage]]
  * (reference: ray_utils/actor_pool.py pid bookkeeping, pinned by
  * ray_utils/reap_pids_test.py — the node layer records worker-spawned
  * pids and kills the ones whose owner died).
  *
  * Decoders spawn in their OWN process group (`setsid`), and every live
  * group is recorded in a node-local ledger keyed by the owning JVM's
  * pid. Three layers close the orphan window:
  *
  *  1. **in-JVM** — `destroy()`/the run loop kill the group directly
  *     (task cancel, timeout, output cap). The group kill also catches
  *     double-forked grandchildren that `ProcessHandle.descendants`
  *     can no longer see (reparented to init, but pgid preserved).
  *  2. **JVM exit** — a shutdown hook kills every group this JVM still
  *     has in flight (graceful executor shutdown mid-decode) and
  *     removes the ledger file.
  *  3. **hard JVM death** (SIGKILL, OOM-kill — nothing in-JVM can run)
  *     — the next decoder `setup()` on the node calls [[reapOrphans]]:
  *     any ledger file whose owner pid is dead names groups to kill.
  *
  * Pid-recycling safety (the classic reaping hazard): each entry
  * carries the group LEADER's start-epoch-millis; a group is killed
  * only if the leader is alive AND its start time matches the recorded
  * one. A recycled pid never matches, so an innocent process is never
  * killed — at worst a stale entry is dropped without action (and the
  * kernel has already torn the real group down).
  *
  * The ledger lives under `java.io.tmpdir/graft-decoder-reap/` —
  * node-local by construction, exactly the scope the orphan problem
  * has. File writes are per-owner-JVM (no cross-process contention);
  * in-process access synchronizes on the object.
  */
object DecoderReaper {

  private[graft] def ledgerDir: File =
    new File(System.getProperty("java.io.tmpdir"), "graft-decoder-reap")

  private def myPid: Long = ProcessHandle.current().pid()
  // the file NAME carries the owner JVM's start time: a later process
  // that recycles this pid will not match it, so a recycled owner pid
  // can never make an orphaned ledger look alive forever
  private def myFile: Path = {
    val start = startMillisOf(myPid)
    ledgerDir.toPath.resolve(s"$myPid-$start.pids")
  }

  /** pgid -> leader start-epoch-millis, this JVM's in-flight groups. */
  private val live = mutable.LinkedHashMap.empty[Long, Long]
  private var hookInstalled = false

  /** Leader start time in epoch millis; 0 when the platform hides it
    * (entries recorded as 0 are reaped conservatively: never killed,
    * only dropped once the leader is gone).
    */
  private def startMillisOf(pid: Long): Long =
    ProcessHandle.of(pid).toScala
      .flatMap(_.info().startInstant().toScala)
      .map(_.toEpochMilli).getOrElse(0L)

  /** Three-way leader probe — None: pid absent; Some(0): alive but the
    * platform hides its start time; Some(t): alive, started at t. The
    * kill guard must NOT collapse the first two (startMillisOf does, for
    * recording): an absent leader means the group is ours-or-empty and
    * safe to kill, while an alive-but-unattributable leader could be a
    * recycled pid and must never be killed.
    */
  private def leaderStart(pid: Long): Option[Long] =
    ProcessHandle.of(pid).toScala.map(h =>
      h.info().startInstant().toScala.map(_.toEpochMilli).getOrElse(0L))

  /** Record a spawned group (leader pid == pgid under setsid). */
  def record(pgid: Long): Unit = synchronized {
    live.put(pgid, startMillisOf(pgid))
    if (!hookInstalled) {
      hookInstalled = true
      Runtime.getRuntime.addShutdownHook(new Thread(() => shutdownSweep(),
        "graft-decoder-reaper-hook"))
    }
    flush()
  }

  /** Drop a finished group from the ledger. */
  def unrecord(pgid: Long): Unit = synchronized {
    if (live.remove(pgid).isDefined) flush()
  }

  /** Kill an entire process group, SIGKILL, with the pid-recycling
    * guard: kill when the leader is alive with the RECORDED start time
    * (our group, still led), or when the leader pid no longer exists at
    * all — a live group keeps its pgid reserved (POSIX: a pid in use as
    * a pgid is not reassignable), so a leaderless kill can only reach
    * OUR surviving members (the double-forked ffmpeg case), and an
    * empty group is an ESRCH no-op. The one skip case is a leader pid
    * that exists with a DIFFERENT start time: the whole group died and
    * the pid was recycled by an innocent process — never kill that.
    * A leader that is ALIVE but whose start time the platform hides is
    * also skipped — it cannot be told apart from a recycled pid.
    * (The residual hazard — full group death, pid recycled as a NEW
    * group leader who then also dies leaving members — requires double
    * recycling inside one reap window; accepted, as in any
    * pid-bookkeeping reaper.)
    */
  def killGroup(pgid: Long, startMillis: Long): Boolean = {
    val ours = leaderStart(pgid) match {
      case None => true // leader pid absent: group is ours-or-empty
      // alive but the platform hides start times: identity unprovable —
      // honor the "recorded as 0 are never killed" contract and skip
      // (the caller drops the entry; a stray group here is the accepted
      // residual on start-time-less platforms). CONFIRMED TRADE (ADVICE
      // r12): the deployment target is Linux (/proc start times always
      // present — the Spark-executor platform), where this branch is
      // unreachable; on a hypothetical start-time-less platform we choose
      // leaking an orphan decoder over killing an unrelated process group
      // whose pgid was recycled — kills must be provably ours.
      case Some(0L) => false
      case Some(cur) => startMillis > 0 && cur == startMillis
    }
    if (ours) {
      // negative pid = the whole group; -- guards the leading dash
      val p = new ProcessBuilder("kill", "-9", "--", s"-$pgid").start()
      p.waitFor()
      true
    } else false
  }

  /** Unguarded group kill for the in-JVM path, where the caller OWNS
    * the pgid (it holds the Process object): while any group member
    * lives the kernel cannot recycle the pgid, and with no members the
    * kill is an ESRCH no-op — so no start-time guard is needed or
    * wanted here (the leader may already be dead while a double-forked
    * grandchild still holds the stdout pipe).
    */
  def killGroupOwned(pgid: Long): Unit = {
    val p = new ProcessBuilder("kill", "-9", "--", s"-$pgid").start()
    p.waitFor()
    ()
  }

  /** Kill every group whose owner JVM is dead (ledger files named by a
    * pid that no longer runs); returns the number of groups killed.
    * Runs once per JVM from [[ExternalDecoderStage]] setup via
    * [[reapOnStart]]; safe to call repeatedly (idempotent — reaped
    * files are deleted).
    */
  def reapOrphans(): Int = synchronized {
    val dir = ledgerDir
    if (!dir.isDirectory) return 0
    var killed = 0
    dir.listFiles((_, n) => n.endsWith(".pids")).foreach { f =>
      // name formats: "<pid>-<startMillis>.pids" (current) or
      // "<pid>.pids" (no start available — alive check is pid-only)
      val parts = f.getName.stripSuffix(".pids").split('-')
      val owner = parts.headOption.flatMap(_.toLongOption)
      val ownerStart = parts.lift(1).flatMap(_.toLongOption).filter(_ > 0)
      val ownerAlive = owner.exists { pid =>
        pid == myPid ||
          (ProcessHandle.of(pid).toScala.exists(_.isAlive) &&
            // a live process on a RECYCLED owner pid (start mismatch) is
            // not the owner: the real owner died hard — reap its groups
            ownerStart.forall(s => startMillisOf(pid) == s))
      }
      if (owner.isDefined && !ownerAlive) {
        Files.readAllLines(f.toPath, StandardCharsets.UTF_8).asScala.foreach { line =>
          line.trim.split("\\s+") match {
            case Array(pg, st) =>
              for (pgid <- pg.toLongOption; start <- st.toLongOption)
                if (killGroup(pgid, start)) killed += 1
            case _ => ()
          }
        }
        Files.deleteIfExists(f.toPath)
        ()
      }
    }
    killed
  }

  /** Once-per-JVM node reap, triggered from decoder setup. */
  lazy val reapOnStart: Int = reapOrphans()

  /** Shutdown-hook sweep: kill this JVM's in-flight groups, clear the
    * ledger (a clean exit leaves nothing for the next reaper).
    */
  private def shutdownSweep(): Unit = synchronized {
    // owned groups: unguarded kill (see killGroupOwned)
    live.foreach { case (pgid, _) => killGroupOwned(pgid) }
    live.clear()
    Files.deleteIfExists(myFile)
    ()
  }

  private def flush(): Unit = {
    Files.createDirectories(ledgerDir.toPath)
    if (live.isEmpty) { Files.deleteIfExists(myFile); () }
    else {
      val body = live.iterator.map { case (pg, st) => s"$pg $st" }
        .mkString("", "\n", "\n")
      Files.write(myFile, body.getBytes(StandardCharsets.UTF_8))
      ()
    }
  }

  implicit private final class OptionalOps[T](private val o: java.util.Optional[T]) {
    def toScala: Option[T] = if (o.isPresent) Some(o.get) else None
  }
}
