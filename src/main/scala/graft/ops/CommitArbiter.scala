package graft.ops

import java.nio.file.{FileAlreadyExistsException, Files, NoSuchFileException, Path, StandardCopyOption}

/** The commit protocol's single point of atomicity, abstracted: publish
  * `content` at `target` iff no file exists there yet, all-or-nothing.
  * [[Snapshots]] stakes its whole concurrency story on this one
  * primitive — the loser of a version race must fail LOUDLY (return
  * false) and the winner's manifest must appear complete or not at all,
  * never partially written.
  *
  * Two implementations ship, spanning the two storage worlds a 100 TB
  * table lives in:
  *
  *  - [[HardLinkArbiter]] (default): POSIX `link(2)` — EEXIST is the
  *    atomic create-if-absent verdict. The strongest and cheapest
  *    arbiter, but it REQUIRES a real filesystem (HDFS, NFS, local);
  *    object stores have no hard links.
  *  - [[LockFileArbiter]]: needs only atomic CREATE-IF-ABSENT of a
  *    small object (`O_CREAT|O_EXCL` here; a conditional
  *    `PUT If-None-Match: *` on S3-class stores, or a DynamoDB-style
  *    conditional-put row — the contract an object-store backend must
  *    provide). The manifest write happens under a short-lived lock
  *    object acquired with that primitive.
  *
  * Both are driven through the same N-appender + replacer torture
  * (`SnapshotConcurrencySpec`): linear version chain, no lost commit,
  * conflicts loud.
  */
trait CommitArbiter {
  /** Atomically create `target` with `content` iff absent.
    * @return true — this caller published; false — `target` already
    *         existed (the caller lost the race and must rebase/abort).
    *         A false return guarantees the existing file is some OTHER
    *         committer's complete manifest.
    */
  def putIfAbsent(target: Path, content: Array[Byte]): Boolean
}

/** `link(2)` arbiter: stage to a temp file in the target's directory,
  * hard-link to the final name. The link fails with EEXIST atomically if
  * the target already exists (unlike a POSIX rename, which silently
  * replaces, and unlike `Files.move`'s no-replace mode, which is
  * check-then-rename and can lose a cross-process race), and the linked
  * file appears fully written or not at all. Temp names carry the
  * `.stage_*.tmp` shape so a crash between create and cleanup leaves
  * debris [[Snapshots.vacuum]] reclaims.
  */
object HardLinkArbiter extends CommitArbiter {
  override def putIfAbsent(target: Path, content: Array[Byte]): Boolean = {
    val tmp = Files.createTempFile(target.getParent, ".stage_", ".tmp")
    Files.write(tmp, content)
    try {
      Files.createLink(target, tmp)
      true
    } catch {
      case _: FileAlreadyExistsException => false
    } finally Files.deleteIfExists(tmp): Unit
  }
}

/** Put-if-absent arbiter for stores WITHOUT hard links: the only atomic
  * primitive it uses is create-if-absent of a small lock object
  * (`Files.createFile` = `O_CREAT|O_EXCL`; on an object store this is
  * the conditional PUT). Protocol:
  *
  *  1. acquire `<target>.lock` via create-if-absent (spin; the hold
  *     time is one small write, milliseconds);
  *  2. under the lock, re-check the target — if it exists, some earlier
  *     holder published: release and lose;
  *  3. write the manifest to a temp file and atomically move it into
  *     place (the local-FS stand-in for the object store's atomic
  *     whole-object PUT — a reader never sees a torn manifest);
  *  4. release the lock.
  *
  * Crash recovery: a holder that dies between acquire and release
  * leaves the lock behind; waiters break locks older than
  * [[LockFileArbiter.StaleLockMillis]] (a real object-store
  * implementation uses the store's TTL or a heartbeat instead — the
  * breakout here is deliberately far above any real hold time, and the
  * residual break-vs-fresh-holder race is the documented gap this
  * EMULATION accepts that a true conditional PUT does not have). Lock
  * names carry the `.stage_*.tmp` shape so abandoned ones age out under
  * [[Snapshots.vacuum]] like any other staging debris.
  */
object LockFileArbiter extends CommitArbiter {
  /** Far above any real hold time (one small write) — the breakout only
    * ever fires for a genuinely crashed holder.
    */
  val StaleLockMillis: Long = 60000L

  override def putIfAbsent(target: Path, content: Array[Byte]): Boolean = {
    val lock = target.getParent.resolve(
      s".stage_${target.getFileName}.lock.tmp")
    var acquired = false
    while (!acquired) {
      try {
        Files.createFile(lock) // O_CREAT|O_EXCL — the one atomic primitive
        acquired = true
      } catch {
        case _: FileAlreadyExistsException =>
          // fast loss path: if the target is already published, no need
          // to wait for the lock at all
          if (Files.exists(target)) return false
          try {
            val age = System.currentTimeMillis() -
              Files.getLastModifiedTime(lock).toMillis
            if (age > StaleLockMillis) Files.deleteIfExists(lock): Unit
            else Thread.sleep(2)
          } catch { case _: NoSuchFileException => () /* freed; retry */ }
      }
    }
    try {
      if (Files.exists(target)) false
      else {
        val tmp = Files.createTempFile(target.getParent, ".stage_", ".tmp")
        Files.write(tmp, content)
        // atomic rename under the lock: only lock holders write, and this
        // holder re-checked absence above — the move is the stand-in for
        // the object store's atomic whole-object PUT
        Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
        true
      }
    } finally Files.deleteIfExists(lock): Unit
  }
}
