package graft

/** Liveness-marker tokens for the bench/gate overlap guards.
  *
  * Round-14 post-mortem (VERDICT r14, "What's wrong" #2, observed
  * live): the markers held a bare pid, and `pid_max` on the target
  * box is 32768, so a dead gate's pid was recycled mid-bench and a
  * provably-quiet bench recorded `gate_overlap:true` — the exact
  * false-discredit the liveness check exists to prevent. A pid alone
  * is not an identity; (pid, starttime) is: field 22 of
  * `/proc/<pid>/stat` is the process start tick since boot, unique
  * per (pid, boot), so a recycled pid can never match a dead writer's
  * token.
  *
  * Token format (shared verbatim with `tools/sf_gate.sh` and
  * `tools/check.py` — all three writers and all three readers must
  * agree): `"<pid>:<starttime>"`, with starttime `0` when `/proc` is
  * unavailable (non-Linux dev box → degrade to pid-only liveness).
  * A bare-pid token (no colon) is the pre-round-15 format and is
  * treated as STALE unconditionally: every current writer emits the
  * new format, so a legacy token is by definition from a dead run.
  */
object Markers {

  /** Start tick of `pid` (field 22 of `/proc/<pid>/stat`), or None
    * when the process is gone or `/proc` is unavailable. The comm
    * field (2) may contain spaces and parens, so fields are counted
    * from the LAST `)` — state is field 3, starttime is field 22,
    * i.e. index 19 of the post-paren split.
    */
  def starttime(pid: Long): Option[Long] =
    try {
      val stat = java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"/proc/$pid/stat"))
      val tail = stat.substring(stat.lastIndexOf(')') + 1).trim
      Some(tail.split("\\s+")(19).toLong)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Token identifying THIS process: `"<pid>:<starttime>"`. */
  def selfToken: String = {
    val pid = ProcessHandle.current().pid
    s"$pid:${starttime(pid).getOrElse(0L)}"
  }

  /** Is the writer of `token` still alive? True only when the pid is
    * alive AND its current starttime matches the recorded one (or
    * both sides lack /proc — the non-Linux degradation). Bare-pid
    * legacy tokens and unparsable content are stale, never live.
    */
  def writerLive(token: String): Boolean = token.trim.split(":") match {
    case Array(p, s) =>
      try {
        val pid = p.toLong
        val recorded = s.toLong
        starttime(pid) match {
          case Some(now) => now == recorded
          case None =>
            // /proc says gone — on Linux that IS the verdict. Only
            // when /proc itself is absent (recorded == 0 was written
            // by a non-Linux writer) fall back to pid liveness.
            recorded == 0L &&
              ProcessHandle.of(pid).map[Boolean](_.isAlive).orElse(false)
        }
      } catch { case scala.util.control.NonFatal(_) => false }
    case _ => false // legacy bare pid or garbage: stale by definition
  }

  /** Read a marker file; live-writer verdict plus the raw token.
    * (false, "") when the file is absent or unreadable.
    */
  def readLive(path: java.nio.file.Path): (Boolean, String) =
    try {
      if (!java.nio.file.Files.exists(path)) (false, "")
      else {
        val tok = java.nio.file.Files.readString(path).trim
        (writerLive(tok), tok)
      }
    } catch { case scala.util.control.NonFatal(_) => (false, "") }

  /** Write this process's token to `path`, deleting any STALE marker
    * first (a stale file left behind by a SIGKILLed writer must not
    * outlive the next legitimate writer — VERDICT r14 item 1 says
    * delete, don't just ignore). Returns true when we own the file.
    */
  def claim(path: java.nio.file.Path): Boolean =
    try {
      val (live, tok) = readLive(path)
      // A marker holding OUR token is ours to reclaim — Bench runs
      // inside the long-lived sbt server, so a previous invocation in
      // this same JVM that died mid-measure leaves a live-looking
      // token that would otherwise block every later claim (and every
      // gate) until the server restarts.
      if (live && tok != selfToken) false
      else {
        java.nio.file.Files.writeString(path, selfToken)
        true
      }
    } catch { case scala.util.control.NonFatal(_) => false }

  /** Delete `path` only if it still holds OUR token (a forced
    * concurrent writer may own it by now).
    */
  def release(path: java.nio.file.Path): Unit =
    try {
      if (java.nio.file.Files.exists(path) &&
          java.nio.file.Files.readString(path).trim == selfToken)
        java.nio.file.Files.delete(path)
    } catch { case scala.util.control.NonFatal(_) => () }
}
