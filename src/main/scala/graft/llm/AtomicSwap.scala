package graft.llm

import org.apache.hadoop.fs.{FileSystem, Path}

/** THE one implementation of the crash-safe table-swap primitives — the
  * two-rename stage-and-retire swap, its reader-side heal, and the
  * atomic exclusive-create that backs every lock/lease file.
  *
  * Extracted in round 18 from the two prior copies
  * ([[StandingState]]'s swapTable/healDir/withLease and
  * [[QualityLr]]'s swapDir/healDirFs/tryCreateLock) so the crash-shape
  * reasoning lives in one place, and because the second copy had
  * drifted: QualityLr's lock acquire used Hadoop
  * `fs.create(overwrite=false)`, which on RawLocalFileSystem is an
  * exists()-then-create (no O_EXCL) — two racing local writers could
  * both "win" — while StandingState had already routed the `file:`
  * scheme through `java.io.File.createNewFile` (atomic per the JDK
  * spec). Both now share [[atomicCreate]].
  *
  * Crash shapes handled (see callers for the protocol each runs):
  *  - crash BEFORE the first rename: live table untouched, staged dir
  *    orphaned (overwritten by the next write).
  *  - crash BETWEEN the renames: live missing, complete `__retired`
  *    present — [[heal]] renames it back on the next read/write.
  *  - crash AFTER the second rename: new table live, `__retired`
  *    orphaned — deleted by the next write's pre-clean.
  */
private[graft] object AtomicSwap {

  /** `<name><suffix>` next to `p` — the staged/retired/lock naming. */
  def sibling(p: Path, suffix: String): Path =
    new Path(p.getParent, p.getName + suffix)

  /** Atomic exclusive create of `path` carrying `content` (holder/owner
    * metadata). Returns false iff the file already exists. The `file:`
    * scheme routes through `java.io.File.createNewFile` —
    * RawLocalFileSystem implements `create(overwrite=false)` as
    * exists()-then-create (no O_EXCL), so two racing local creators
    * could otherwise both succeed. A failure WRITING the content after
    * a successful create deletes the file before rethrowing — a
    * half-born lock must not block forever. A missing parent directory
    * is created first (Hadoop `fs.create` auto-creates parents, so a
    * first-ever lock in a fresh tree must succeed on both branches),
    * and only an already-exists failure maps to `false` — permission or
    * transient IO errors propagate rather than masquerading as "held by
    * a concurrent writer". */
  def atomicCreate(fs: FileSystem, path: Path, content: String): Boolean = {
    def writeContent(write: => Unit): Boolean =
      try { write; true }
      catch {
        case e: Throwable =>
          try fs.delete(path, false) catch { case _: Exception => () }
          throw e
      }
    if (fs.getScheme == "file") {
      val f = new java.io.File(fs.makeQualified(path).toUri.getPath)
      val parent = f.getParentFile
      if (parent != null && !parent.exists()) parent.mkdirs()
      if (!f.createNewFile()) false
      else writeContent {
        val w = new java.io.FileOutputStream(f)
        try w.write(content.getBytes("UTF-8")) finally w.close()
      }
    } else {
      val out =
        try fs.create(path, false) // overwrite=false: fails iff present
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => return false
          case _: java.nio.file.FileAlreadyExistsException        => return false
        }
      writeContent {
        try out.write(content.getBytes("UTF-8")) finally out.close()
      }
    }
  }

  /** Break a (stale) lock file ATOMICALLY: rename it onto a
    * uniquely-named tombstone. Rename is atomic on every filesystem in
    * scope, so of N concurrent breakers exactly ONE wins the rename and
    * the losers see rename-failed/not-found — unlike the
    * check-then-delete it replaces, where breaker B could delete the
    * fresh lock breaker A had just re-created. The winner deletes its
    * tombstone. Returns true iff this caller won the break. */
  def breakByRename(fs: FileSystem, lock: Path, uniqueToken: String): Boolean =
    try {
      val tomb = sibling(lock, s"__tomb_$uniqueToken")
      if (fs.rename(lock, tomb)) { fs.delete(tomb, true); true } else false
    } catch { case _: java.io.IOException => false }

  /** Heal a crashed two-rename swap: live dir missing but a complete
    * `__retired` present — rename the known-good pre-swap state back.
    * Idempotent, one existence probe on the healthy path. Caller must
    * hold, or have excluded, the writer (healing under a live writer
    * races its renames — see [[commitStaged]]'s tolerance). */
  def heal(fs: FileSystem, live: Path): Unit = {
    val retired = sibling(live, "__retired")
    if (!fs.exists(live) && fs.exists(retired) && !fs.rename(retired, live))
      throw new java.io.IOException(
        s"heal: recovery rename $retired -> $live failed")
  }

  /** The two-rename swap: retire `live` (skipped on a first-ever write),
    * rename the fully-written `staged` in, drop the retired snapshot.
    *
    * Tolerates ONE reader heal landing inside the rename window: a
    * reader that sampled the lock as free just before this writer
    * acquired it can rename `__retired` back to `live` between our two
    * renames, failing the staged->live rename spuriously. The writer
    * re-retires and retries ONCE — the healed live is byte-identical to
    * the snapshot we just retired, so re-retiring loses nothing, and a
    * second interference inside the retry window means a genuinely
    * concurrent writer, which the lock already makes loud. */
  def commitStaged(fs: FileSystem, live: Path, staged: Path, op: String): Unit = {
    val retired = sibling(live, "__retired")
    if (fs.exists(retired)) fs.delete(retired, true)
    if (fs.exists(live) && !fs.rename(live, retired))
      throw new java.io.IOException(s"$op: rename $live -> $retired failed")
    if (!fs.rename(staged, live)) {
      val healedBack = fs.exists(live)
      val retriedOk = healedBack &&
        fs.rename(live, retired) && fs.rename(staged, live)
      if (!retriedOk)
        throw new java.io.IOException(
          s"$op: rename $staged -> $live failed" +
            (if (fs.exists(retired)) s" — pre-swap rows intact at $retired"
             else ""))
    }
    if (fs.exists(retired)) fs.delete(retired, true)
  }
}
