package graft.ops

import java.nio.file.{FileAlreadyExistsException, Files, NoSuchFileException, Path, Paths}

/** The commit protocol's single point of atomicity, abstracted: publish
  * `content` at `target` iff no file exists there yet, all-or-nothing.
  * [[Snapshots]] stakes its whole concurrency story on this one
  * primitive — the loser of a version race must fail LOUDLY (return
  * false) and the winner's manifest must appear complete or not at all,
  * never partially written. Targets are PATH STRINGS (same currency as
  * [[SnapIO]]) so arbiters can span local paths and `FileSystem` URIs.
  *
  * Three implementations ship, spanning the storage worlds a 100 TB
  * table lives in:
  *
  *  - [[HardLinkArbiter]] (default for local roots): POSIX `link(2)` —
  *    EEXIST is the atomic create-if-absent verdict. The strongest and
  *    cheapest arbiter, but it REQUIRES a real local filesystem;
  *    object stores have no hard links.
  *  - [[HadoopFsArbiter]] (default for `scheme://` roots): stage to a
  *    temp object, then `FileSystem.rename` to the final name — atomic
  *    and refuses-existing-destination on HDFS (the namenode settles the
  *    race), so the loser is loud and a reader never sees a torn
  *    manifest (a `create(overwrite=false)` stream would be atomic at
  *    CREATE but visible part-written while the content streams — the
  *    reason rename is the primitive here, same call the Delta HDFS log
  *    store makes). Same-JVM racers additionally serialize on a process
  *    lock, which is what makes the local-`file://` test harness sound:
  *    raw-local rename REPLACES (POSIX `rename(2)`), so cross-PROCESS
  *    atomicity on local filesystems belongs to [[HardLinkArbiter]] —
  *    this arbiter's cross-process guarantee is exactly the FS's
  *    rename-refuses-existing contract (HDFS: yes; raw local: no).
  *  - [[LockFileArbiter]]: needs only atomic CREATE-IF-ABSENT of a
  *    small object (`O_CREAT|O_EXCL` here; a conditional
  *    `PUT If-None-Match: *` on S3-class stores, or a DynamoDB-style
  *    conditional-put row — the contract an object-store backend must
  *    provide). The manifest write happens under a short-lived lock
  *    object acquired with that primitive.
  *
  * All are driven through the same N-appender + replacer torture
  * (`SnapshotConcurrencySpec`): linear version chain, no lost commit,
  * conflicts loud.
  *
  * SELECTION is per-scheme (`Snapshots.arbiterFor`) — an arbiter is
  * only safe where the storage actually provides its primitive:
  *
  * | root                                | arbiter              |
  * |-------------------------------------|----------------------|
  * | local path (no scheme)              | HardLinkArbiter      |
  * | hdfs:// webhdfs:// swebhdfs:// viewfs:// | HadoopFsArbiter |
  * | file:// (single-JVM test harness)   | HadoopFsArbiter      |
  * | s3a/s3/s3n/gs/abfs(s)/wasb(s)/oss/cosn/swift/obs | REFUSED loudly* |
  * | any other scheme                    | REFUSED loudly*      |
  *
  * *unless a conditional-PUT implementation is registered for the
  * scheme via `Snapshots.registerArbiter` — those stores' "rename" is a
  * non-atomic copy-then-delete that silently replaces, so defaulting
  * them to the rename protocol would turn the commit race into
  * last-writer-wins (a silent lost commit). The refusal is torture-
  * tested against a mock FileSystem whose rename replaces.
  */
trait CommitArbiter {
  /** Atomically create `target` with `content` iff absent.
    * @return true — this caller published; false — `target` already
    *         existed (the caller lost the race and must rebase/abort).
    *         A false return guarantees the existing file is some OTHER
    *         committer's complete manifest.
    */
  def putIfAbsent(target: String, content: Array[Byte]): Boolean
}

/** `link(2)` arbiter: stage to a temp file in the target's directory,
  * hard-link to the final name. The link fails with EEXIST atomically if
  * the target already exists (unlike a POSIX rename, which silently
  * replaces, and unlike `Files.move`'s no-replace mode, which is
  * check-then-rename and can lose a cross-process race), and the linked
  * file appears fully written or not at all. Temp names carry the
  * `.stage_*.tmp` shape so a crash between create and cleanup leaves
  * debris [[Snapshots.vacuum]] reclaims. Local paths only.
  */
object HardLinkArbiter extends CommitArbiter {
  override def putIfAbsent(target: String, content: Array[Byte]): Boolean = {
    val t = Paths.get(target)
    val tmp = Files.createTempFile(t.getParent, ".stage_", ".tmp")
    Files.write(tmp, content)
    try {
      Files.createLink(t, tmp)
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
  *  3. write the manifest to a temp file and publish it by CREATE-IF-
  *     ABSENT (`Files.createLink` — EEXIST loses loudly). Publishing
  *     under the lock with the same refuses-existing primitive means
  *     even the stale-break race below cannot silently REPLACE a
  *     committed manifest: if the broken-out holder was actually alive
  *     and published first, this holder's link fails with EEXIST — a
  *     loud loss, never a lost commit. (A no-replace `Files.move` would
  *     be check-then-rename; an `ATOMIC_MOVE` would replace silently —
  *     both weaker. A real object store's whole-object conditional PUT
  *     has exactly the createLink semantics: complete-or-absent AND
  *     refuses-existing.)
  *  4. release the lock.
  *
  * Crash recovery: a holder that dies between acquire and release
  * leaves the lock behind; waiters break locks older than
  * `staleLockMillis` (a real object-store implementation uses the
  * store's TTL or a heartbeat lease instead — the breakout here is
  * deliberately far above any real hold time, and thanks to step 3 the
  * residual break-vs-fresh-holder race costs at most a LOUD loss, never
  * a silent one). The clock is injectable (`now`) so the breakout is
  * deterministically testable. Lock names carry the `.stage_*.tmp`
  * shape so abandoned ones age out under [[Snapshots.vacuum]] like any
  * other staging debris. Local paths only (it is the local EMULATION of
  * the conditional-PUT contract).
  */
class LockFileArbiter(
    val staleLockMillis: Long = 60000L,
    now: () => Long = () => System.currentTimeMillis())
    extends CommitArbiter {

  override def putIfAbsent(target: String, content: Array[Byte]): Boolean = {
    val t = Paths.get(target)
    val lock = t.getParent.resolve(s".stage_${t.getFileName}.lock.tmp")
    var acquired = false
    while (!acquired) {
      try {
        Files.createFile(lock) // O_CREAT|O_EXCL — the one atomic primitive
        acquired = true
      } catch {
        case _: FileAlreadyExistsException =>
          // fast loss path: if the target is already published, no need
          // to wait for the lock at all
          if (Files.exists(t)) return false
          try {
            val age = now() - Files.getLastModifiedTime(lock).toMillis
            if (age > staleLockMillis) Files.deleteIfExists(lock): Unit
            else Thread.sleep(2)
          } catch { case _: NoSuchFileException => () /* freed; retry */ }
      }
    }
    try {
      if (Files.exists(t)) false
      else {
        val tmp = Files.createTempFile(t.getParent, ".stage_", ".tmp")
        Files.write(tmp, content)
        // create-if-absent publish (EEXIST = loud loss): even a holder
        // that was wrongly broken out of its lock cannot be silently
        // overwritten — see the protocol note above
        try { Files.createLink(t, tmp); true }
        catch { case _: FileAlreadyExistsException => false }
        finally Files.deleteIfExists(tmp): Unit
      }
    } finally Files.deleteIfExists(lock): Unit
  }
}

object LockFileArbiter
    extends LockFileArbiter(60000L, () => System.currentTimeMillis()) {
  /** Far above any real hold time (one small write) — the breakout only
    * ever fires for a genuinely crashed holder.
    */
  val StaleLockMillis: Long = 60000L
}

/** Arbiter over `org.apache.hadoop.fs.FileSystem` — the route for table
  * roots on HDFS-class stores: stage the manifest to a `.stage_*.tmp`
  * sibling (fully written and closed — a reader can never observe a
  * part-written target), then `rename` to the final name. The required
  * FS contract is RENAME-REFUSES-EXISTING-DESTINATION, which HDFS
  * provides atomically at the namenode (`rename` returns false when the
  * destination exists); same-JVM racers serialize on a process-wide
  * lock so the local-`file://` test harness (where raw-local rename
  * would replace) exercises the identical protocol deterministically.
  * S3-class stores without atomic rename should use a conditional-PUT
  * arbiter instead ([[LockFileArbiter]]'s contract).
  */
class HadoopFsArbiter(conf: => org.apache.hadoop.conf.Configuration)
    extends CommitArbiter {

  def this() = this(SnapIO.conf)

  override def putIfAbsent(target: String, content: Array[Byte]): Boolean =
    // stripe by the target's PARENT (the table's manifest dir): only
    // same-table racers contend, commits to unrelated tables never
    // serialize behind one another's store round-trips (the lock exists
    // for the raw-local harness, where rename replaces; on HDFS the
    // namenode already arbitrates)
    HadoopFsArbiter.lockFor(target).synchronized {
      val t = new org.apache.hadoop.fs.Path(target)
      val fs = t.getFileSystem(conf)
      if (fs.exists(t)) return false
      val tmp = new org.apache.hadoop.fs.Path(t.getParent,
        s".stage_${t.getName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
      val out = fs.create(tmp, false)
      try out.write(content) finally out.close()
      try {
        if (fs.rename(tmp, t)) true
        else { fs.delete(tmp, false): Unit; false }
      } catch { case scala.util.control.NonFatal(e) =>
        fs.delete(tmp, false): Unit; throw e
      }
    }
}

object HadoopFsArbiter extends HadoopFsArbiter() {
  /** Same-JVM serialization for the rename race, STRIPED by the
    * target's parent dir so unrelated tables commit concurrently —
    * see class doc.
    */
  private val stripes = Array.fill(64)(new Object)
  private[ops] def lockFor(target: String): Object = {
    val cut = target.lastIndexOf('/')
    val parent = if (cut <= 0) target else target.substring(0, cut)
    stripes(math.floorMod(parent.hashCode, stripes.length))
  }
}
