package graft.ops

import java.nio.file.{Files, Path, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Storage layer for the snapshot table format: every metadata byte
  * [[Snapshots]] reads or writes goes through here, keyed by PATH STRING
  * so a table root can be a plain local directory OR any Hadoop
  * `FileSystem` URI (`hdfs://`, `s3a://`, `file://`, ...) — the 100 TB
  * deployment target, where `java.io.File` cannot even address the
  * store. Scheme-less roots take the `java.nio` fast path (no Hadoop
  * `FileSystem` dispatch, no checksum shadow files — the local-bench
  * profile is unchanged); any `scheme://` root resolves through
  * `Path.getFileSystem(conf)`, which caches live FS instances per
  * scheme+authority.
  *
  * All methods are usable from EXECUTORS too (wide commits stat footers
  * in a distributed job): everything is static, and the Hadoop conf is
  * the DRIVER's — `sessionState.newHadoopConf()` (so `spark.hadoop.*`
  * credentials propagate) on the driver itself, and on executors the
  * driver's conf SHIPPED into the closure ([[ship]] → [[install]]):
  * the per-JVM lazy fallback would rebuild a bare `Configuration()`
  * there (`getActiveSession` is None on executors) and silently drop
  * every credential, so each distributed footer job carries the conf
  * explicitly and installs it before any FS dispatch.
  */
private[graft] object SnapIO {

  /** The driver's Hadoop conf as a serializable closure capture —
    * `Configuration` is a Hadoop `Writable`, not `Serializable`, so the
    * wrapper round-trips it through its own wire format (the same shape
    * as Spark's internal `SerializableConfiguration`, which is
    * `private[spark]` and therefore not usable here).
    */
  final class ShippedConf(@transient private var c: Configuration)
      extends Serializable {
    def value: Configuration = c
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      c.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      c = new Configuration(false)
      c.readFields(in)
    }
  }

  /** Capture the current (driver) conf for an executor-side closure.
    * Call on the DRIVER, pass the result into the closure, and call
    * [[install]] inside it before touching any `scheme://` path.
    */
  def ship(): ShippedConf = new ShippedConf(conf)

  // executor-side slot: the driver's shipped conf, installed once per
  // JVM by the first task of any distributed metadata job
  @volatile private var installed: Configuration = null

  /** Install a shipped driver conf as this JVM's [[conf]] — idempotent,
    * cheap enough to call per task.
    */
  def install(c: Configuration): Unit = installed = c

  /** One directory child: `path` is the FULL path string (root-joined),
    * `name` the basename.
    */
  final case class Stat(name: String, path: String, isFile: Boolean,
                        len: Long, mtime: Long)

  def isLocal(path: String): Boolean = !path.contains("://")

  /** Join a path and a relative child — both worlds use `/`. */
  def join(a: String, b: String): String = a.stripSuffix("/") + "/" + b

  @transient private lazy val hadoopConf: Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  /** This JVM's Hadoop conf: a shipped driver conf when one was
    * [[install]]ed (executors), else the active session's (driver).
    */
  private[graft] def conf: Configuration = {
    val i = installed
    if (i != null) i else hadoopConf
  }

  // through conf (NOT the raw lazy fallback): an executor-side install()
  // must govern every FS dispatch here — exists/len/list included, not
  // just footer opens — or the first uncredentialed instantiation
  // poisons Hadoop's per-scheme FS cache for the whole JVM
  private def fs(path: String): FileSystem =
    new HPath(path).getFileSystem(conf)

  private def nio(path: String): Path = Paths.get(path)

  def mkdirs(path: String): Unit =
    if (isLocal(path)) Files.createDirectories(nio(path)): Unit
    else fs(path).mkdirs(new HPath(path)): Unit

  def readAll(path: String): Array[Byte] =
    if (isLocal(path)) Files.readAllBytes(nio(path))
    else {
      val f = fs(path)
      val in = f.open(new HPath(path))
      try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
        out.toByteArray
      } finally in.close()
    }

  /** Plain write (fresh names only — the segment/tombstone route; the
    * version-manifest race goes through a [[CommitArbiter]]).
    */
  def write(path: String, bytes: Array[Byte]): Unit =
    if (isLocal(path)) Files.write(nio(path), bytes): Unit
    else {
      val out = fs(path).create(new HPath(path), true)
      try out.write(bytes) finally out.close()
    }

  def exists(path: String): Boolean =
    if (isLocal(path)) Files.exists(nio(path))
    else fs(path).exists(new HPath(path))

  def deleteIfExists(path: String): Unit =
    if (isLocal(path)) Files.deleteIfExists(nio(path)): Unit
    else fs(path).delete(new HPath(path), false): Unit

  /** Remove a DIRECTORY only if it is empty (rmdir semantics — a
    * non-empty directory is left untouched, never an error): the
    * race-safe cleanup primitive for abandoned scaffolding, where a
    * concurrent writer may be staging into the same tree.
    */
  def deleteDirIfEmpty(path: String): Unit =
    if (isLocal(path)) {
      try Files.deleteIfExists(nio(path)): Unit
      catch { case _: java.nio.file.DirectoryNotEmptyException => () }
    } else {
      val f = fs(path)
      val p = new HPath(path)
      try if (f.exists(p) && f.listStatus(p).isEmpty)
        f.delete(p, false): Unit
      catch { case _: java.io.IOException => () /* raced non-empty */ }
    }

  def deleteTree(path: String): Unit =
    if (isLocal(path)) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).toSeq.flatten.foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(path))
    } else fs(path).delete(new HPath(path), true): Unit

  def len(path: String): Long =
    if (isLocal(path)) new java.io.File(path).length()
    else fs(path).getFileStatus(new HPath(path)).getLen

  def mtime(path: String): Long =
    if (isLocal(path)) new java.io.File(path).lastModified()
    else fs(path).getFileStatus(new HPath(path)).getModificationTime

  /** Non-recursive children of `dir`; empty when the dir is absent. */
  def list(dir: String): Seq[Stat] =
    if (isLocal(dir))
      Option(new java.io.File(dir).listFiles()).map(_.toSeq)
        .getOrElse(Seq.empty).map { f =>
          Stat(f.getName, join(dir, f.getName), f.isFile, f.length(),
            f.lastModified())
        }
    else {
      val f = fs(dir)
      val p = new HPath(dir)
      if (!f.exists(p)) Seq.empty
      else f.listStatus(p).toSeq.map { s =>
        Stat(s.getPath.getName, join(dir, s.getPath.getName), s.isFile,
          s.getLen, s.getModificationTime)
      }
    }
}
