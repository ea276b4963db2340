package graft.ops

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, max}

/** A minimal snapshot-isolated table format — the transactional shell
  * around the engine's layout operators ([[Layout.zorderWriteN]],
  * [[Layout.compactionExec]], [[Reconcile.mergeTouched]] rewrite data;
  * THIS decides what a reader sees while they do). The design is the
  * published lakehouse-format core (Delta/Iceberg), reduced to its two
  * load-bearing moves:
  *
  *  - **data files are immutable**; every commit writes NEW files under
  *    `root/data/<uuid>/` and publishes a MANIFEST (`_graft_snaps/
  *    v<n>.txt`) listing exactly the files that version comprises —
  *    O(files) text, never data;
  *  - **a commit IS the atomic creation of manifest v(n+1)**: the
  *    manifest is staged to a temp name and HARD-LINKED to its final
  *    name — `link(2)` fails with EEXIST atomically if v(n+1) already
  *    exists (unlike a POSIX rename, which silently replaces, and
  *    unlike `Files.move`'s no-replace mode, which is check-then-rename
  *    and can lose a cross-process race), and the linked file appears
  *    complete or not at all. The loser re-reads the now-latest
  *    version, REBASES and retries at v(n+2). Optimistic concurrency
  *    with the filesystem's atomic link as the arbiter; no lock is ever
  *    held while data writes (the slow part) run.
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

  /** One file of a snapshot: path RELATIVE to the table root (a table
    * must survive being moved/mounted elsewhere), the row count the
    * committing write observed (statistics for free), and `seq` — the
    * version whose commit added the file. `seq` is what makes
    * merge-on-read deletes sound: an equality-delete tombstone applies
    * exactly to rows in data files with a SMALLER seq (the
    * sequence-number rule of the published formats), so a commit can
    * upsert a key by tombstoning it and appending the new row in the
    * same version without the tombstone eating its own row.
    */
  final case class FileEntry(path: String, rows: Long, seq: Long)

  /** `files` hold rows; `deletes` hold equality-delete KEYS (one-column
    * parquet tombstones) that suppress older rows of the same key at
    * read time — the merge-on-read half of the format, contrasting the
    * copy-on-write route ([[Reconcile.mergeTouched]] under a replace
    * commit): deletes cost O(batch) at write and a key anti-join at
    * read, until [[compactMerged]] materializes them away.
    */
  final case class Snapshot(version: Long, parent: Long, note: String,
                            files: Seq[FileEntry],
                            deletes: Seq[FileEntry] = Seq.empty)

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
  //   file=data/<uuid>/part-...parquet|12345|3
  //   delete=data/<uuid>/part-...parquet|17|3

  private def render(s: Snapshot): String =
    (Seq(s"version=${s.version}", s"parent=${s.parent}", s"note=${s.note}") ++
      s.files.map(f => s"file=${f.path}|${f.rows}|${f.seq}") ++
      s.deletes.map(f => s"delete=${f.path}|${f.rows}|${f.seq}"))
      .mkString("", "\n", "\n")

  private def parse(text: String): Snapshot = {
    val lines = text.linesIterator.toSeq
    def one(k: String) = lines.collectFirst {
      case l if l.startsWith(s"$k=") => l.substring(k.length + 1) }.get
    def entries(prefix: String) =
      lines.filter(_.startsWith(prefix)).map { l =>
        val parts = l.substring(prefix.length).split('|')
        // path never contains '|' (uuid + Spark part names); the last two
        // fields are rows and seq
        FileEntry(parts.dropRight(2).mkString("|"),
          parts(parts.length - 2).toLong, parts(parts.length - 1).toLong)
      }
    Snapshot(one("version").toLong, one("parent").toLong, one("note"),
      entries("file="), entries("delete="))
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
           version: Option[Long] = None,
           evolved: Boolean = false): DataFrame = {
    val v = version.orElse(latestVersion(root)).getOrElse(
      throw new IllegalStateException(s"no committed version under $root"))
    val files = snapshot(root, v).files
    require(files.nonEmpty, s"version $v of $root lists no files; " +
      "read it with an explicit schema via spark.read.schema(...)")
    // `evolved = true` turns on SCHEMA EVOLUTION for the scan: the read
    // schema becomes the union of every listed file's schema (Spark's
    // mergeSchema — a footer pass over the manifest's files at planning
    // time), so a commit that appended rows WITH A NEW COLUMN reads
    // alongside old files, whose rows surface NULL for it — additive
    // evolution exactly as the lakehouse formats define it. Off by
    // default: a single-schema table should not pay the extra footer
    // pass, and a reader pinned to a pre-evolution version sees the old
    // schema either way (its manifest lists only old files).
    val r = if (evolved) spark.read.option("mergeSchema", "true")
            else spark.read
    r.parquet(files.map(f => s"$root/${f.path}"): _*)
  }

  /** Scan-plan a snapshot version through the generic zone map: per-file
    * min/max stats from the MANIFEST'S files' footers (never a directory
    * listing — dead files from other versions are invisible), pruned by
    * [[Layout.zonePrune]]'s interval intersection, surviving files fed
    * straight to the scan. This is the composed lakehouse read path —
    * snapshot isolation picks WHICH files exist, file stats pick which
    * of those can matter — and both halves are O(files) metadata work.
    * Callers that scan repeatedly should build `stats` once via
    * [[zoneMap]] and prune per query.
    */
  def readPruned(spark: SparkSession, root: String,
                 preds: Seq[(String, Any, Any)],
                 version: Option[Long] = None): DataFrame = {
    val numeric = preds.filter(_._2.isInstanceOf[Number]).map(_._1)
    val strings = preds.filterNot(_._2.isInstanceOf[Number]).map(_._1)
    val survivors = Layout.zonePrune(
      zoneMap(spark, root, numeric, version, strings), preds)
    if (survivors.isEmpty) {
      // every zone misses: the result is PROVABLY empty — return an
      // empty frame with the table's schema (from one manifest file's
      // footer) instead of making the caller special-case it
      val v = version.orElse(latestVersion(root)).get
      val first = snapshot(root, v).files.head
      spark.read.parquet(s"$root/${first.path}").limit(0)
    } else spark.read.parquet(survivors: _*)
  }

  /** The zone-map stats table ([[Layout.zoneMapFooters]] semantics) for
    * one snapshot VERSION: stats come from the manifest's file list, so
    * they describe exactly what that version's scan would read.
    * `strCols` (after `version` for source compatibility) are the
    * string-statistics columns, as in [[Layout.zoneMapFootersFor]].
    */
  def zoneMap(spark: SparkSession, root: String, cols: Seq[String],
              version: Option[Long] = None,
              strCols: Seq[String] = Seq.empty): DataFrame = {
    val v = version.orElse(latestVersion(root)).getOrElse(
      throw new IllegalStateException(s"no committed version under $root"))
    Layout.zoneMapFootersFor(spark,
      snapshot(root, v).files.map(f => s"$root/${f.path}"), cols, strCols)
  }

  /** The table's commit HISTORY as a DataFrame (`DESCRIBE HISTORY`):
    * one row per retained version with its parent, note, file/tombstone
    * counts and the manifest row-count sum (an upper bound while
    * tombstones live — see [[countRows]]). Pure manifest reads,
    * O(versions · files) driver text — the audit-log surface every
    * lakehouse format exposes.
    */
  def history(spark: SparkSession, root: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = versions(root).map { v =>
      val s = snapshot(root, v)
      org.apache.spark.sql.Row(s.version, s.parent, s.note,
        s.files.size.toLong, s.deletes.size.toLong, s.files.map(_.rows).sum)
    }
    spark.createDataFrame(rows.asJava, org.apache.spark.sql.types.StructType(
      Seq("version", "parent").map(n =>
        org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.LongType)) ++
        Seq(org.apache.spark.sql.types.StructField("note",
          org.apache.spark.sql.types.StringType)) ++
        Seq("n_files", "n_tombstones", "manifest_rows").map(n =>
          org.apache.spark.sql.types.StructField(n,
            org.apache.spark.sql.types.LongType))))
  }

  /** Metadata-only `COUNT(*)`: the manifest already carries per-file row
    * counts (footer-read at commit time), so a full count is an O(files)
    * sum with ZERO data reads — the reason lakehouse engines answer
    * `SELECT COUNT(*)` instantly. Honest under merge-on-read: a version
    * with live tombstones returns None (the manifest sum counts
    * suppressed rows too — an upper bound, not a count; `readMerged(...)
    * .count()` is the truthful route until [[compactMerged]] retires the
    * tombstones and this becomes exact again).
    */
  def countRows(root: String, version: Option[Long] = None): Option[Long] = {
    val v = version.orElse(latestVersion(root)).getOrElse(
      throw new IllegalStateException(s"no committed version under $root"))
    val s = snapshot(root, v)
    if (s.deletes.nonEmpty) None else Some(s.files.map(_.rows).sum)
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
             replace: Boolean = false,
             basedOn: Option[Long] = None): Long =
    publish(root, writeData(root, df), Seq.empty, note, replace, basedOn)

  /** Write `df` into a fresh immutable `data/<uuid>/` dir and return its
    * file entries (seq assigned at publish time). Sidecars (_SUCCESS,
    * .crc) stay: hidden files are write infrastructure (they also keep
    * each commit dir a verifiable parquet write root for
    * ModelStore.verifyArtifact); the MANIFEST is this format's commit
    * marker and [[vacuum]] ignores hidden files when deciding what is
    * data. Per-file row counts come from the footers — metadata only,
    * never a re-scan.
    */
  private def writeData(root: String, df: DataFrame): Seq[FileEntry] = {
    val uuid = java.util.UUID.randomUUID().toString.take(12)
    val dataPath = s"$DataDir/$uuid"
    df.write.parquet(s"$root/$dataPath")
    val files = Option(new java.io.File(s"$root/$dataPath").listFiles())
      .map(_.toSeq).getOrElse(Seq.empty)
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .map(_.getName).sorted
    def footerRows(path: String): Long = {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(path),
        new org.apache.hadoop.conf.Configuration())
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFooter.getBlocks.stream().mapToLong(_.getRowCount).sum()
      finally r.close()
    }
    // wide commits (small-files regime) read footers as a DISTRIBUTED
    // job — a sequential driver loop over 4k+ footers is seconds of
    // driver time locally and minutes against an object store; narrow
    // commits skip the job-scheduling overhead
    val rowCounts: Seq[(String, Long)] =
      if (files.size <= 64) files.map(n => n -> footerRows(s"$root/$dataPath/$n"))
      else {
        val prefix = s"$root/$dataPath"
        df.sparkSession.sparkContext
          .parallelize(files, math.min(files.size, 256))
          .map(n => n -> footerRows(s"$prefix/$n")).collect().toSeq
      }
    rowCounts.map { case (name, rows) =>
      FileEntry(s"$dataPath/$name", rows, 0L) }
  }

  /** RESTORE: make version `toVersion`'s exact state the new LATEST — a
    * new commit whose manifest lists the old version's files and
    * tombstones VERBATIM (seqs preserved, so a merge-on-read state
    * replays identically), undoing a bad commit WITHOUT rewriting data
    * or losing history: the bad version stays readable and auditable
    * until [[vacuum]] retires it, and the restored files are referenced
    * by the new head, so even a `keepVersions = 1` vacuum keeps them.
    * The restore commit is pinned to the current latest — a concurrent
    * commit surfaces as a conflict rather than being silently undone.
    */
  def restore(root: String, toVersion: Long): Long = {
    val target = snapshot(root, toVersion)
    publish(root, target.files, target.deletes, s"restore-v$toVersion",
      replace = true, basedOn = None, stampSeq = false)
  }

  /** The manifest race: stage, hard-link to v(parent+1), rebase or
    * abort on loss. With `stampSeq` (every route except [[restore]]),
    * `newFiles`/`newDeletes` get `seq = v` stamped with the version
    * that finally wins — the sequence-number rule that keeps
    * merge-on-read tombstones from eating their own commit's rows;
    * restore carries old entries verbatim instead.
    */
  private def publish(root: String, newFiles: Seq[FileEntry],
                      newDeletes: Seq[FileEntry], note: String,
                      replace: Boolean, basedOn: Option[Long],
                      stampSeq: Boolean = true): Long = {
    // a REPLACE writer computed its output FROM some version; `basedOn`
    // pins it (the lakehouse transaction-version pattern) so the commit
    // can detect that the parent moved — whether before this call or
    // during it — and refuse to silently drop the interleaved commit.
    val basedOn0 = basedOn.getOrElse(latestVersion(root).getOrElse(0L))
    def conflict(now: Long) = new java.util.ConcurrentModificationException(
      s"replace commit on $root based on v$basedOn0 lost to v$now; " +
        "recompute against the new latest and re-commit")
    if (replace && latestVersion(root).getOrElse(0L) != basedOn0)
      throw conflict(latestVersion(root).getOrElse(0L))
    var parent = basedOn0
    while (true) {
      val (parentFiles, parentDeletes) =
        if (parent == 0L || replace) (Seq.empty[FileEntry], Seq.empty[FileEntry])
        else { val p = snapshot(root, parent); (p.files, p.deletes) }
      val v = parent + 1
      def stamped(es: Seq[FileEntry]) =
        if (stampSeq) es.map(_.copy(seq = v)) else es
      val snap = Snapshot(v, parent, note,
        parentFiles ++ stamped(newFiles),
        parentDeletes ++ stamped(newDeletes))
      val tmp = Files.createTempFile(Paths.get(root, SnapDir), ".stage_", ".tmp")
      Files.write(tmp, render(snap).getBytes("UTF-8"))
      // createLink, NOT Files.move: the no-replace move is implemented
      // as an existence check followed by rename(2), so two processes
      // racing for v(n+1) can both pass the check and the second rename
      // silently replaces the first manifest — a lost commit. link(2)
      // is the atomic create-if-absent the protocol needs: EEXIST loses
      // loudly, and the target appears fully written or not at all.
      try {
        Files.createLink(manifestPath(root, v), tmp)
        Files.deleteIfExists(tmp): Unit
        return v
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp): Unit
          val now = latestVersion(root).getOrElse(0L)
          if (replace && now != basedOn0) throw conflict(now)
          parent = now
      }
    }
    sys.error("unreachable")
  }

  /** MERGE-ON-READ change commit — the write-cheap alternative to the
    * copy-on-write rewrite ([[Reconcile.mergeTouched]] + replace
    * commit): upsert rows APPEND as ordinary data files, and the
    * affected keys (upserted AND deleted) land in an equality-delete
    * TOMBSTONE file that [[readMerged]] applies to OLDER rows only
    * (tombstone seq > data-file seq). Write cost is O(batch) no matter
    * where the keys live in the table — no target scan, no partition
    * rewrite; the price moves to read time (a key anti-join) until
    * [[compactMerged]] materializes the state back to plain files.
    * `upserts` and `deleteKeys` must each carry at most one row per key.
    */
  def commitChanges(root: String, upserts: DataFrame, deleteKeys: DataFrame,
                    keyCol: String, note: String): Long = {
    val dataEntries = writeData(root, upserts)
    val tombKeys = upserts.select(col(keyCol))
      .unionByName(deleteKeys.select(col(keyCol))).distinct()
    val tombEntries = writeData(root, tombKeys)
    publish(root, dataEntries, tombEntries, note,
      replace = false, basedOn = None)
  }

  /** Read AS OF `version` with merge-on-read semantics: data files union
    * (each stamped with its manifest `seq` — a literal per commit, no
    * filename juggling), tombstone keys reduce to their LATEST seq per
    * key (one small aggregate — tombstones are O(changed keys), so the
    * join side broadcasts in the common case), and a row survives iff no
    * tombstone for its key is NEWER than the row's file (`row seq >=
    * tombstone seq` keeps a commit's own upserts alive past its own
    * tombstone). With no tombstones this is exactly [[read]].
    */
  def readMerged(spark: SparkSession, root: String, keyCol: String,
                 version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(root)).getOrElse(
      throw new IllegalStateException(s"no committed version under $root"))
    val snap = snapshot(root, v)
    if (snap.deletes.isEmpty) return read(spark, root, Some(v))
    def bySeq(entries: Seq[FileEntry], seqName: String): DataFrame =
      entries.groupBy(_.seq).toSeq.sortBy(_._1).map { case (seq, fs) =>
        spark.read.parquet(fs.map(f => s"$root/${f.path}"): _*)
          .withColumn(seqName, lit(seq))
      }.reduce(_ unionByName _)
    val base = bySeq(snap.files, "_seq")
    val tomb = bySeq(snap.deletes, "_tseq")
      .groupBy(col(keyCol)).agg(max(col("_tseq")).as("_tseq"))
    base.join(tomb, Seq(keyCol), "left")
      .where(col("_tseq").isNull || col("_seq") >= col("_tseq"))
      .drop("_seq", "_tseq")
  }

  /** Materialize the merge-on-read state back to plain data files — the
    * compaction that retires tombstones: one [[readMerged]] scan, one
    * REPLACE commit pinned to the version it read (a concurrent change
    * commit surfaces as a conflict, never a lost update). Readers pinned
    * to older versions keep the tombstoned view until [[vacuum]].
    *
    * `clusterBy` re-establishes layout while it rewrites anyway (the
    * free ride every OPTIMIZE takes): MOR churn appends change batches
    * wherever they land, so each new file spans the whole key domain
    * and the [[zoneMap]] skip index stops biting; range-scattering the
    * materialized state into `nFiles` sorted files makes the zones
    * tight again. Empty `clusterBy` keeps the scan's natural
    * partitioning.
    */
  def compactMerged(spark: SparkSession, root: String, keyCol: String,
                    clusterBy: Seq[String] = Seq.empty,
                    nFiles: Int = 0): Long = {
    val base = latestVersion(root).getOrElse(
      throw new IllegalStateException(s"no committed version under $root"))
    val merged = readMerged(spark, root, keyCol, Some(base))
    val laid =
      if (clusterBy.isEmpty) merged
      else merged.repartitionByRange(math.max(1, nFiles),
          clusterBy.map(col): _*)
        .sortWithinPartitions(clusterBy.map(col): _*)
    commit(root, laid, s"compact-merged-v$base",
      replace = true, basedOn = Some(base))
  }

  /** Incremental read — the rows APPENDED in versions `(fromVersion,
    * toVersion]`: exactly the data files those commits added (an O(files)
    * manifest diff; no data diffing). The CDC-consumer surface: a
    * downstream pipeline remembers the last version it processed and
    * reads only the increment. Merge-on-read deletes in the window are
    * visible as the same window's tombstone KEYS via the manifests;
    * replace commits reset history and are rejected here (the increment
    * is no longer append-shaped — reprocess from the replace version).
    */
  def changesBetween(spark: SparkSession, root: String,
                     fromVersion: Long, toVersion: Long): DataFrame = {
    require(fromVersion < toVersion,
      s"need fromVersion < toVersion, got ($fromVersion, $toVersion]")
    // append-shaped window ⇔ everything fromVersion listed is still
    // listed at toVersion (an exact O(files) manifest check — a replace
    // anywhere in the window drops files and fails it)
    val fromFiles = if (fromVersion == 0L) Seq.empty[FileEntry]
                    else snapshot(root, fromVersion).files
    val toSnap = snapshot(root, toVersion)
    val toSet = toSnap.files.toSet
    require(fromFiles.forall(toSet.contains),
      s"($fromVersion, $toVersion] contains a replace commit — " +
        "the increment is not append-shaped; reprocess from the replace")
    val files = toSnap.files
      .filter(f => f.seq > fromVersion && f.seq <= toVersion)
    require(files.nonEmpty, s"no files appended in ($fromVersion, $toVersion]")
    spark.read.parquet(files.map(f => s"$root/${f.path}"): _*)
  }

  /** Retire history: keep the newest `keepVersions` manifests, delete the
    * rest, then delete every file under `data/` that no RETAINED
    * manifest references — covering both files only old versions list
    * and crash debris (a data dir whose commit never published). The
    * reference set is O(files) strings; deletion is idempotent and safe
    * to re-run. Returns the deleted DATA-file count (hidden sidecars
    * removed along with a dead commit dir are not counted — they are
    * infrastructure, not data).
    *
    * The retention window is the reader contract: a reader pinned to a
    * vacuumed version loses its files — size `keepVersions` to cover the
    * longest-running reader, exactly as lakehouse formats document.
    *
    * `minAgeMillis` is the IN-FLIGHT-COMMIT guard: an unreferenced file
    * younger than it is spared, because "unreferenced" cannot be told
    * apart from "a concurrent commit's data write whose manifest has not
    * published yet" by looking at the file system alone. The default
    * (1 h) comfortably covers any commit's write-to-publish window; a
    * file spared this round is reclaimed by the next vacuum once it
    * ages. Tests that build and reap in one breath pass 0 explicitly.
    */
  def vacuum(root: String, keepVersions: Int,
             minAgeMillis: Long = 60L * 60 * 1000): Int = {
    require(keepVersions >= 1, "must retain at least the latest version")
    val vs = versions(root)
    val (drop, keep) = vs.splitAt(math.max(0, vs.size - keepVersions))
    val live: Set[String] = keep.flatMap { v =>
      val s = snapshot(root, v); (s.files ++ s.deletes).map(_.path)
    }.toSet
    drop.foreach(v => Files.deleteIfExists(manifestPath(root, v)): Unit)
    val dataRoot = new java.io.File(root, DataDir)
    val rootPath = Paths.get(root)
    val youngCutoff = System.currentTimeMillis() - minAgeMillis
    def visible(f: java.io.File): Boolean = f.isFile &&
      !f.getName.startsWith("_") && !f.getName.startsWith(".")
    def walk(f: java.io.File): Seq[java.io.File] = {
      val cs = Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      cs.filter(_.isFile) ++ cs.filter(_.isDirectory).flatMap(walk)
    }
    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles()).toSeq.flatten.foreach(rmTree)
      f.delete(): Unit
    }
    var deleted = 0
    // per commit dir: if NO retained manifest references any of its data
    // files, the whole dir goes (sidecars included) — that covers both
    // superseded commits and crash debris whose publish never happened;
    // a dir with live files sheds only its dead visible files. Hidden
    // files (_SUCCESS, .crc) are write infrastructure, never "data", so
    // a vacuum that drops no version is a no-op.
    Option(dataRoot.listFiles()).toSeq.flatten
      .filter(_.isDirectory).foreach { sub =>
        val vis = walk(sub).filter(visible)
        val (liveF, deadF) = vis.partition(f =>
          live.contains(rootPath.relativize(f.toPath).toString))
        val (ripe, young) = deadF.partition(_.lastModified() <= youngCutoff)
        if (liveF.isEmpty && young.isEmpty) { deleted += ripe.size; rmTree(sub) }
        else ripe.foreach { f => f.delete(): Unit; deleted += 1 }
      }
    Option(dataRoot.listFiles()).toSeq.flatten.filter(visible)
      .filterNot(f => live.contains(rootPath.relativize(f.toPath).toString))
      .filter(_.lastModified() <= youngCutoff)
      .foreach { f => f.delete(): Unit; deleted += 1 }
    deleted
  }
}
