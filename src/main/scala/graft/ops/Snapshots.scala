package graft.ops

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A minimal snapshot-isolated table format — the transactional shell
  * around the engine's layout operators ([[Layout.zorderWriteN]],
  * [[Layout.compactionExec]], [[Reconcile.mergeTouched]] rewrite data;
  * THIS decides what a reader sees while they do). The design is the
  * published lakehouse-format core (Delta/Iceberg), reduced to its two
  * load-bearing moves:
  *
  *  - **data files are immutable**; every commit writes NEW files under
  *    `root/data/<uuid>/` and publishes a MANIFEST (`_graft_snaps/
  *    v<n>.json`) listing exactly the files that version comprises —
  *    O(files) text, never data;
  *  - **a commit IS the atomic creation of manifest v(n+1)**: the
  *    manifest is staged to a temp name and renamed with
  *    `ATOMIC_MOVE` (no replace) — if v(n+1) already exists the rename
  *    fails, the committer re-reads the now-latest version, REBASES and
  *    retries at v(n+2). Optimistic concurrency with the filesystem's
  *    atomic create as the arbiter; no lock is ever held while data
  *    writes (the slow part) run.
  *
  * What this buys at 100 TB: readers pin a version (time travel + a
  * consistent view while writers churn), writers never block readers,
  * and maintenance (compaction, merge, z-order rewrites) becomes a
  * REPLACE commit whose obsolete inputs stay readable until [[vacuum]]
  * retires versions past the retention window and deletes the data
  * files only they reference.
  */
object Snapshots {

  private val SnapDir = "_graft_snaps"
  private val DataDir = "data"

  /** One data file of a snapshot: path RELATIVE to the table root (a
    * table must survive being moved/mounted elsewhere), plus the row
    * count the committing write observed (statistics for free).
    */
  final case class FileEntry(path: String, rows: Long)

  final case class Snapshot(version: Long, parent: Long, note: String,
                            files: Seq[FileEntry])

  def init(root: String): String = {
    Files.createDirectories(Paths.get(root, SnapDir))
    Files.createDirectories(Paths.get(root, DataDir))
    root
  }

  // ---- manifest encoding ----------------------------------------------------
  // Dependency-free single-line-per-file text (the manifest is the
  // format's public contract — any tool must parse it without this jar):
  //   version=3
  //   parent=2
  //   note=replace
  //   file=data/<uuid>/part-...parquet|12345

  private def render(s: Snapshot): String =
    (Seq(s"version=${s.version}", s"parent=${s.parent}", s"note=${s.note}") ++
      s.files.map(f => s"file=${f.path}|${f.rows}")).mkString("", "\n", "\n")

  private def parse(text: String): Snapshot = {
    val lines = text.linesIterator.toSeq
    def one(k: String) = lines.collectFirst {
      case l if l.startsWith(s"$k=") => l.substring(k.length + 1) }.get
    val files = lines.filter(_.startsWith("file=")).map { l =>
      val body = l.substring(5)
      val cut = body.lastIndexOf('|')
      FileEntry(body.substring(0, cut), body.substring(cut + 1).toLong)
    }
    Snapshot(one("version").toLong, one("parent").toLong, one("note"), files)
  }

  private def manifestPath(root: String, v: Long): Path =
    Paths.get(root, SnapDir, f"v$v%08d.txt")

  /** All committed versions, ascending. O(versions) directory listing. */
  def versions(root: String): Seq[Long] =
    Option(new java.io.File(root, SnapDir).listFiles())
      .map(_.toSeq).getOrElse(Seq.empty)
      .map(_.getName).filter(n => n.startsWith("v") && n.endsWith(".txt"))
      .map(n => n.substring(1, n.length - 4).toLong).sorted

  def latestVersion(root: String): Option[Long] = versions(root).lastOption

  def snapshot(root: String, v: Long): Snapshot =
    parse(new String(Files.readAllBytes(manifestPath(root, v)), "UTF-8"))

  /** Read the table AS OF `version` (default: latest). The manifest's
    * file list feeds `spark.read.parquet(files)` directly — planning-time
    * scan scoping, so a pinned reader is untouched by any later commit,
    * REPLACE included. An empty table (no commits, or a version with no
    * files) is represented by an empty manifest and needs the caller's
    * schema to produce a typed empty frame.
    */
  def read(spark: SparkSession, root: String,
           version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(root)).getOrElse(
      throw new IllegalStateException(s"no committed version under $root"))
    val files = snapshot(root, v).files
    require(files.nonEmpty, s"version $v of $root lists no files; " +
      "read it with an explicit schema via spark.read.schema(...)")
    spark.read.parquet(files.map(f => s"$root/${f.path}"): _*)
  }

  /** Commit `df` as a new version. `replace = false` appends (new files
    * join the parent's), `replace = true` supersedes (the new version
    * lists ONLY the new files — the commit shape of compaction, merge
    * and every other rewrite). The data write runs FIRST, unserialized
    * (concurrent committers each write their own `data/<uuid>/` dir);
    * only the manifest create is the race, settled by `ATOMIC_MOVE`
    * without replace: the loser re-reads the new latest and retries —
    * an APPEND rebases losslessly on any winner (its files are its
    * own); a REPLACE aborts with the standard conflict error, because
    * it supersedes a parent that is no longer latest and blind retry
    * would silently drop the winner's commit.
    */
  def commit(root: String, df: DataFrame, note: String,
             replace: Boolean = false): Long = {
    val uuid = java.util.UUID.randomUUID().toString.take(12)
    val dataPath = s"$DataDir/$uuid"
    df.write.parquet(s"$root/$dataPath")
    val written = Option(new java.io.File(s"$root/$dataPath").listFiles())
      .map(_.toSeq).getOrElse(Seq.empty)
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    // per-file row counts from the footers — metadata only, never a re-scan
    val entries = written.map { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getPath),
        new org.apache.hadoop.conf.Configuration())
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try FileEntry(s"$dataPath/${f.getName}",
        r.getFooter.getBlocks.stream().mapToLong(_.getRowCount).sum())
      finally r.close()
    }
    val basedOn = latestVersion(root).getOrElse(0L)
    var parent = basedOn
    while (true) {
      val parentFiles =
        if (parent == 0L || replace) Seq.empty
        else snapshot(root, parent).files
      val v = parent + 1
      val snap = Snapshot(v, parent, note, parentFiles ++ entries)
      val tmp = Files.createTempFile(Paths.get(root, SnapDir), ".stage_", ".tmp")
      Files.write(tmp, render(snap).getBytes("UTF-8"))
      try {
        Files.move(tmp, manifestPath(root, v), StandardCopyOption.ATOMIC_MOVE)
        return v
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp): Unit
          val now = latestVersion(root).getOrElse(0L)
          if (replace && now != basedOn)
            throw new java.util.ConcurrentModificationException(
              s"replace commit on $root based on v$basedOn lost to v$now; " +
                "recompute against the new latest and re-commit")
          parent = now
      }
    }
    sys.error("unreachable")
  }

  /** Retire history: keep the newest `keepVersions` manifests, delete the
    * rest, then delete every file under `data/` that no RETAINED
    * manifest references — covering both files only old versions list
    * and crash debris (a data dir whose commit never published). The
    * reference set is O(files) strings; deletion is idempotent and safe
    * to re-run. Returns the deleted file count.
    *
    * The retention window is the reader contract: a reader pinned to a
    * vacuumed version loses its files — size `keepVersions` to cover the
    * longest-running reader, exactly as lakehouse formats document.
    */
  def vacuum(root: String, keepVersions: Int): Int = {
    require(keepVersions >= 1, "must retain at least the latest version")
    val vs = versions(root)
    val (drop, keep) = vs.splitAt(math.max(0, vs.size - keepVersions))
    val live: Set[String] =
      keep.flatMap(v => snapshot(root, v).files.map(_.path)).toSet
    drop.foreach(v => Files.deleteIfExists(manifestPath(root, v)): Unit)
    def walk(f: java.io.File): Seq[java.io.File] = {
      val cs = Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      cs.filter(_.isFile) ++ cs.filter(_.isDirectory).flatMap(walk)
    }
    val dataRoot = new java.io.File(root, DataDir)
    val rootPath = Paths.get(root)
    val dead = walk(dataRoot).filter { f =>
      val rel = rootPath.relativize(f.toPath).toString
      !live.contains(rel)
    }
    dead.foreach(f => f.delete(): Unit)
    // sweep now-empty data dirs (cosmetic; harmless if a writer races)
    Option(dataRoot.listFiles()).toSeq.flatten
      .filter(d => d.isDirectory && Option(d.listFiles()).forall(_.isEmpty))
      .foreach(d => d.delete(): Unit)
    dead.size
  }
}
