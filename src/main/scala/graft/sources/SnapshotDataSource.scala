package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path => HPath}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, SQLContext}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider}
import org.apache.spark.sql.types.StructType

import graft.ops.{SnapIO, Snapshots}

/** The SQL/DataFrame FRONT DOOR for the snapshot table format
  * ([[graft.ops.Snapshots]]) — the format as a first-class Spark source
  * instead of a Scala-only API:
  *
  * {{{
  *   // reads, with time travel
  *   spark.read.format("graft-snap").load(root)
  *   spark.read.format("graft-snap").option("versionAsOf", 3).load(root)
  *   spark.read.format("graft-snap")
  *     .option("timestampAsOf", "2026-08-16 12:00:00").load(root)
  *
  *   // writes publish COMMITS (append / replace via SaveMode)
  *   df.write.format("graft-snap").option("statsCols", "k").save(root)
  *
  *   // and plain SQL over the format
  *   CREATE TEMPORARY VIEW t USING `graft-snap`
  *     OPTIONS (path '<root>', versionAsOf '3');
  *   SELECT ... FROM t WHERE k BETWEEN 10 AND 20
  *
  *   // streaming reads tail the table's APPEND commits (exactly-once
  *   // via the engine's offset log; offsets ARE version numbers)
  *   spark.readStream.format("graft-snap").load(root)
  * }}}
  *
  * Architecture: the relation is a [[HadoopFsRelation]] over a custom
  * [[FileIndex]] whose file list IS the pinned version's manifest — the
  * Delta/Iceberg integration shape, chosen over a bespoke DSv2
  * `PartitionReader` because it rides Spark's OWN vectorized parquet
  * scan (whole-stage codegen, filter/projection pushdown into footers
  * and pages — a hand-rolled row-based reader would forfeit all three).
  * The index answers `listFiles(dataFilters)` by pruning against the
  * MANIFEST-EMBEDDED column stats (commits made with `statsCols`):
  * query-time file skipping with ZERO footer I/O, exactly
  * [[graft.ops.Snapshots.readPrunedManifest]]'s channel, now driven by
  * the predicates Spark itself pushes into the scan. Files without
  * embedded bounds are conservatively kept, never skipped.
  *
  * Contracts carried over from the Scala surface: a PLAIN read of a
  * version with live merge-on-read tombstones or rename/drop rules is
  * REFUSED loudly (one `HadoopFsRelation` cannot express the anti-join
  * / per-group rename union) — pass `option("readMerged", "true")`
  * (plus `keyCol` when equality tombstones live) to read the MERGED
  * state through the same front door, or compact; an
  * additive-evolution table reads with `option("mergeSchema", "true")`
  * exactly like plain parquet.
  */
class SnapshotDataSource extends RelationProvider
    with CreatableRelationProvider
    with org.apache.spark.sql.sources.StreamSourceProvider
    with org.apache.spark.sql.sources.StreamSinkProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-snap"

  /** The streaming schema: the CURRENT version's shape (a stream is a
    * forward-moving reader; pre-evolution versions are batch territory).
    */
  private def isCdc(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.trim.equalsIgnoreCase("true"))

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String])
      : (String, StructType) = {
    val root = rootOf(parameters)
    val base = schema.getOrElse {
      val v = Snapshots.latestVersion(root).getOrElse(
        throw new IllegalStateException(s"no committed version under $root"))
      val table =
        if (isCdc(parameters))
          // a CDC stream legally starts on a tombstone-bearing table —
          // the schema comes from the manifest's files' footers without
          // the front-door plain-files gate (only the DATA shape is
          // asked for here; the change rows themselves are computed
          // tombstone-aware by changeFeed per batch)
          SnapshotDataSource.cdcBaseSchema(sqlContext.sparkSession, root, v)
        else SnapshotDataSource.relation(sqlContext.sparkSession, root, v,
          parameters).schema
      if (isCdc(parameters) && schema.isEmpty)
        StructType(table.fields ++ Seq(
          org.apache.spark.sql.types.StructField("_commit_version",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("_change_type",
            org.apache.spark.sql.types.StringType)))
      else table
    }
    (shortName(), base)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source = {
    val root = rootOf(parameters)
    // Spark passes the schema it got from sourceSchema back in — only
    // build the (footer-inferring) relation again when it didn't
    val s = schema.getOrElse(
      sourceSchema(sqlContext, None, providerName, parameters)._2)
    val sv = parameters.get("startingVersion").map(_.trim.toLong).getOrElse(0L)
    val latest = Snapshots.latestVersion(root).getOrElse(0L)
    require(sv >= 0L && sv <= latest,
      s"startingVersion $sv is outside $root's committed range [0, " +
        s"$latest] — a stream from it would silently emit nothing")
    if (isCdc(parameters)) {
      val keyCol = parameters.getOrElse("keyCol",
        throw new IllegalArgumentException(
          "graft-snap CDC stream needs option keyCol (equality-delete " +
            "tombstones key the change rows back to their payloads)"))
      new GraftSnapCdcStreamSource(sqlContext.sparkSession, root, s, sv,
        keyCol)
    } else new GraftSnapStreamSource(sqlContext.sparkSession, root, s, sv)
  }

  /** The STREAMING write half: `writeStream.format("graft-snap")` —
    * each micro-batch publishes ONE append commit through the
    * optimistic protocol (rebases over concurrent committers), tagged
    * with its batchId so a REPLAYED batch (post-crash restart re-runs
    * the last epoch) is recognized and skipped: exactly-once into the
    * table, the same guarantee `foreachBatch` sinks build by hand.
    * Append output mode only (a commit is an append; use the CDC apply
    * sinks for update/complete semantics). `statsCols` rides through.
    */
  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    require(partitionColumns.isEmpty,
      "graft-snap is unpartitioned (layout comes from OPTIMIZE/z-order)")
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      s"graft-snap streams APPEND commits; got $outputMode — aggregating " +
        "sinks belong on the CDC apply path (StreamOps.cdcApplyStream*)")
    val root = rootOf(parameters)
    if (Snapshots.latestVersion(root).isEmpty) Snapshots.init(root): Unit
    // the idempotence marker is scoped by PIPELINE identity (two
    // different streams into one table must not collide on batchIds):
    // the checkpoint location is the natural identity, `txnAppId`
    // overrides it (the Delta idempotent-writes shape)
    val appId = parameters.getOrElse("txnAppId",
      parameters.getOrElse("checkpointLocation", ""))
    require(appId.nonEmpty,
      "graft-snap streaming sink needs a checkpointLocation (or an " +
        "explicit txnAppId) to scope its exactly-once batch markers")
    // pipeline identity must never COLLIDE (a collision makes one
    // pipeline skip its batches as "already committed" — silent data
    // loss): a cryptographic hash, not a 64-bit polynomial — 128 bits
    // of SHA-256 is collision-free for any realistic pipeline count
    val appTag = java.security.MessageDigest.getInstance("SHA-256")
      .digest(appId.getBytes("UTF-8")).take(16)
      .map(b => f"$b%02x").mkString
    // the tag format changed (64-bit poly → SHA-256): a pipeline that
    // committed batches under the OLD tag must still recover its
    // high-water across the upgrade, or the engine's replayed last
    // epoch re-commits — duplicate rows at exactly the upgrade boundary
    val legacyTag = java.lang.Long.toHexString(
      appId.foldLeft(1125899906842597L)((h, c) => 31 * h + c))
    new GraftSnapStreamSink(root, appTag, Seq(legacyTag),
      parameters.get("statsCols")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Seq.empty))
  }

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-snap needs a table root: .load(root) or OPTIONS (path '...')"))

  /** `versionAsOf` (a version number) or `timestampAsOf` (epoch millis,
    * or `yyyy-MM-dd HH:mm:ss` taken in the SESSION time zone —
    * `spark.sql.session.timeZone`, exactly how the session resolves any
    * other zone-less datetime literal — or an ISO-8601 instant) — at
    * most one; default latest.
    */
  private def resolveVersion(spark: SparkSession, root: String,
                             parameters: Map[String, String]): Long =
    (parameters.get("versionAsOf"), parameters.get("timestampAsOf")) match {
      case (Some(_), Some(_)) => throw new IllegalArgumentException(
        "give versionAsOf OR timestampAsOf, not both")
      case (Some(v), None) => v.trim.toLong
      case (None, Some(ts)) =>
        val t = ts.trim
        val millis =
          if (t.matches("[0-9]+")) t.toLong
          else if (t.contains("T")) java.time.Instant.parse(t).toEpochMilli
          else java.time.LocalDateTime.parse(t.replace(' ', 'T'))
            .atZone(java.time.ZoneId.of(
              spark.conf.get("spark.sql.session.timeZone")))
            .toInstant.toEpochMilli
        Snapshots.versionAsOf(root, millis)
      case (None, None) => Snapshots.latestVersion(root).getOrElse(
        throw new IllegalStateException(s"no committed version under $root"))
    }

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val root = rootOf(parameters)
    if (isCdc(parameters)) {
      // the BATCH change-feed read (the Delta `readChangeFeed` batch
      // shape): option("startingVersion", a) [exclusive] +
      // option("endingVersion", b) [inclusive, default latest] +
      // option("keyCol", k) — the relation IS the changeFeed frame
      // (insert/upsert/delete rows with _commit_version), so MOR
      // windows read as row-level changes through plain SQL views too
      require(!parameters.contains("versionAsOf") &&
        !parameters.contains("timestampAsOf"),
        "readChangeFeed reads a VERSION WINDOW (startingVersion, " +
          "endingVersion], not a point-in-time snapshot — drop " +
          "versionAsOf/timestampAsOf")
      val keyCol = parameters.getOrElse("keyCol",
        throw new IllegalArgumentException(
          "graft-snap readChangeFeed needs option keyCol"))
      val from = parameters.get("startingVersion").map(_.trim.toLong)
        .getOrElse(0L)
      val to = parameters.get("endingVersion").map(_.trim.toLong)
        .orElse(Snapshots.latestVersion(root)).getOrElse(
          throw new IllegalStateException(
            s"no committed version under $root"))
      val feed = Snapshots.changeFeed(spark, root, from, to, keyCol)
      val sqlc = sqlContext
      new BaseRelation with org.apache.spark.sql.sources.PrunedScan {
        override def sqlContext: SQLContext = sqlc
        override def schema: StructType = feed.schema
        // the internal-source bridge: the feed is already a planned
        // Spark frame, so hand its InternalRow RDD straight through
        // (needConversion=false) instead of a per-row external-Row
        // round trip on a potentially table-sized feed; PrunedScan
        // keeps select() pruning payload columns
        override def needConversion: Boolean = false
        override def buildScan(requiredColumns: Array[String])
            : org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
          // an empty projection (count(*)) must yield 0-field rows, and
          // select() with zero columns does exactly that
          feed.select(requiredColumns.toSeq.map(feed.col): _*)
            .queryExecution.toRdd
            .asInstanceOf[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]]
      }
    } else if (parameters.get("readMerged")
        .exists(_.trim.equalsIgnoreCase("true"))) {
      // the MERGE-ON-READ batch front door: option("readMerged","true")
      // serves a tombstone-bearing (or schema-rule) version as its
      // merged state — the option-route twin of the catalog's V1Scan
      // MOR read, for users without a configured catalog. keyCol is
      // needed only when EQUALITY tombstones live (position-only DML
      // states read without it); the relation hands the planned frame's
      // InternalRow RDD through unconverted, like the CDF relation.
      val v = resolveVersion(spark, root, parameters)
      val snap = Snapshots.snapshot(root, v)
      val keyCol = parameters.get("keyCol").getOrElse {
        require(snap.deletes.isEmpty,
          s"version $v of $root has equality tombstones — readMerged " +
            "needs option keyCol (the column the tombstones key on)")
        ""
      }
      val merged = Snapshots.readMerged(spark, root, keyCol, Some(v))
      val sqlc = sqlContext
      new BaseRelation with org.apache.spark.sql.sources.PrunedScan {
        override def sqlContext: SQLContext = sqlc
        override def schema: StructType = merged.schema
        override def needConversion: Boolean = false
        override def buildScan(requiredColumns: Array[String])
            : org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
          merged.select(requiredColumns.toSeq.map(merged.col): _*)
            .queryExecution.toRdd
            .asInstanceOf[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]]
      }
    } else SnapshotDataSource.relation(spark, root,
      resolveVersion(spark, root, parameters), parameters)
  }

  /** The write half: `df.write.format("graft-snap")` publishes a COMMIT
    * through the format's optimistic protocol — `Append` appends,
    * `Overwrite` is a replace commit pinned to the current head (a
    * concurrent commit conflicts loudly, never silently drops),
    * `ErrorIfExists`/`Ignore` follow their SaveMode contracts against
    * "the table has any committed version". `statsCols` embeds per-file
    * bounds for the pruned read path; `note` labels the commit in
    * `history()`.
    */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    val root = rootOf(parameters)
    val statsCols = parameters.get("statsCols")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val note = parameters.getOrElse("note", s"dfwriter-$mode")
    val existing = Snapshots.latestVersion(root).nonEmpty
    if (!existing) Snapshots.init(root): Unit
    mode match {
      case SaveMode.Append =>
        Snapshots.commit(root, data, note, statsCols = statsCols): Unit
      case SaveMode.Overwrite =>
        Snapshots.commit(root, data, note, replace = true,
          basedOn = Snapshots.latestVersion(root), statsCols = statsCols): Unit
      case SaveMode.ErrorIfExists =>
        if (existing) throw new IllegalStateException(
          s"graft-snap table $root already has commits " +
            "(SaveMode.ErrorIfExists); use append/overwrite")
        else Snapshots.commit(root, data, note, statsCols = statsCols): Unit
      case SaveMode.Ignore =>
        if (!existing)
          Snapshots.commit(root, data, note, statsCols = statsCols): Unit
    }
    // the returned relation is the TABLE the write landed in — strip
    // every read-shaping option: time travel (pin the post-write head)
    // and the CDC window options (a write carrying readChangeFeed must
    // not fail on a missing keyCol or eagerly plan a change feed just
    // to return the writer's result relation)
    createRelation(sqlContext,
      parameters -- SnapshotDataSource.ReadShapingOptions)
  }
}

object SnapshotDataSource {

  /** Options that shape READS only — a writer's post-commit result
    * relation must not inherit them.
    */
  private[sources] val ReadShapingOptions: Set[String] = Set(
    "versionAsOf", "timestampAsOf", "readChangeFeed", "readMerged",
    "keyCol", "startingVersion", "endingVersion")

  /** Relax every field to nullable (recursively): a file-source relation
    * schema must be nullable — Spark's own DataSource resolution does
    * the same — or the vectorized reader refuses files that lack a
    * parquet-`required` column under additive evolution.
    */
  private def asNullable(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      f.copy(dataType = asNullable(f.dataType), nullable = true)))
    case a: org.apache.spark.sql.types.ArrayType =>
      a.copy(elementType = asNullable(a.elementType), containsNull = true)
    case m: org.apache.spark.sql.types.MapType =>
      m.copy(valueType = asNullable(m.valueType), valueContainsNull = true)
    case other => other
  }

  /** The DATA shape a CDC stream's change rows carry: inferred from the
    * manifest's data files' footers like [[relation]], but WITHOUT the
    * front-door plain-files gate — a CDC stream legally starts on a
    * tombstone-bearing merge-on-read table (serving those states is its
    * whole point; [[graft.ops.Snapshots.changeFeed]] computes each
    * batch tombstone-aware).
    */
  private[sources] def cdcBaseSchema(spark: SparkSession, root: String,
                                     v: Long): StructType = {
    val snap = Snapshots.snapshot(root, v)
    require(snap.files.nonEmpty,
      s"version $v of $root lists no data files — nothing to stream")
    val index = new GraftSnapFileIndex(root, snap)
    val inferred = new ParquetFileFormat().inferSchema(spark,
      Map("mergeSchema" -> "true"), index.allStatuses).getOrElse(
      throw new IllegalStateException(
        s"version $v of $root lists no readable parquet files"))
    asNullable(inferred).asInstanceOf[StructType]
  }

  private[sources] def relation(spark: SparkSession, root: String, v: Long,
                                parameters: Map[String, String])
      : HadoopFsRelation = {
    val snap = Snapshots.snapshot(root, v)
    Snapshots.requireFrontDoor(snap, root)
    val index = new GraftSnapFileIndex(root, snap)
    // schema from the manifest's own files (never a directory listing —
    // dead files from other versions are invisible); one footer unless
    // mergeSchema asks for the additive-evolution union
    // asNullable: a file-source schema must be nullable (Spark's own
    // DataSource resolution does the same) — a parquet `required` field
    // inferred non-nullable would make the vectorized reader refuse any
    // OTHER file that lacks the column under additive evolution
    val inferred = new ParquetFileFormat().inferSchema(spark, parameters,
      index.allStatuses).getOrElse(throw new IllegalStateException(
      s"version $v of $root lists no readable parquet files"))
    val schema = asNullable(inferred).asInstanceOf[StructType]
    HadoopFsRelation(index, StructType(Nil), schema, None,
      new ParquetFileFormat(), parameters)(spark)
  }
}

/** [[FileIndex]] over one pinned snapshot version: `listFiles` = the
  * manifest's file list, pruned per query by the manifest-embedded
  * (min, max) bounds against the scan's pushed data filters. Planning
  * is a driver-side pass over in-memory entries — zero footer I/O, the
  * property that keeps a million-file table's scan planning off the
  * metadata service. Unprunable predicates (non-comparison shapes,
  * columns without embedded stats) conservatively keep every file.
  */
private[sources] class GraftSnapFileIndex(root: String,
                                          snap: Snapshots.Snapshot)
    extends FileIndex {

  /** Local roots become `file:` URIs (Spark's scan needs qualified
    * paths); `scheme://` roots pass through — the manifest stays
    * relative either way, so a table survives being mounted anywhere.
    */
  private def qualified(rel: String): HPath =
    if (SnapIO.isLocal(root)) new HPath(new java.io.File(root, rel).toURI)
    else new HPath(SnapIO.join(root, rel))

  private val entries: Seq[(Snapshots.FileEntry, FileStatus)] =
    snap.files.map { e =>
      // size from the manifest entry when embedded — zero per-file stat
      // calls at planning (one avoided HEAD per file on an object
      // store); pre-size entries fall back to a stat. mtime rides along
      // only when the stat happens anyway (nothing here depends on it).
      val full = SnapIO.join(root, e.path)
      val (len, mtime) =
        if (e.bytes >= 0) (e.bytes, snap.ts)
        else (SnapIO.len(full), SnapIO.mtime(full))
      e -> new FileStatus(len, false, 1, 128L * 1024 * 1024,
        mtime, qualified(e.path))
    }

  private[sources] def allStatuses: Seq[FileStatus] = entries.map(_._2)

  override def rootPaths: Seq[HPath] =
    if (SnapIO.isLocal(root)) Seq(new HPath(new java.io.File(root).toURI))
    else Seq(new HPath(root))
  override def partitionSchema: StructType = StructType(Nil)
  override def sizeInBytes: Long = entries.map(_._2.getLen).sum
  override def inputFiles: Array[String] =
    entries.map(_._2.getPath.toString).toArray
  override def refresh(): Unit = () // pinned version: nothing to refresh

  /** Decode a pushed filter into closed numeric bounds on one column —
    * the same conservative arithmetic as the zone maps: strict
    * comparisons widen to inclusive (keeping a boundary file is correct,
    * skipping it is not), non-numeric literals and complex shapes decode
    * to nothing (→ no pruning from that conjunct).
    */
  private def bounds(e: Expression): Seq[(String, Double, Double)] = {
    // NaN never enters a hull: any comparison against it is false, so a
    // NaN bound would make the keep test fail for EVERY stats-bearing
    // file and silently skip legitimately matching rows — decode to
    // "unprunable" instead
    def num(l: Literal): Option[Double] = l.value match {
      case n: java.lang.Number =>
        Some(n.doubleValue()).filterNot(_.isNaN)
      case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
      case _ => None
    }
    e match {
      case EqualTo(a: Attribute, l: Literal) =>
        num(l).map(x => (a.name, x, x)).toSeq
      case EqualTo(l: Literal, a: Attribute) =>
        num(l).map(x => (a.name, x, x)).toSeq
      case GreaterThan(a: Attribute, l: Literal) =>
        num(l).map(x => (a.name, x, Double.PositiveInfinity)).toSeq
      case GreaterThanOrEqual(a: Attribute, l: Literal) =>
        num(l).map(x => (a.name, x, Double.PositiveInfinity)).toSeq
      case LessThan(a: Attribute, l: Literal) =>
        num(l).map(x => (a.name, Double.NegativeInfinity, x)).toSeq
      case LessThanOrEqual(a: Attribute, l: Literal) =>
        num(l).map(x => (a.name, Double.NegativeInfinity, x)).toSeq
      case GreaterThan(l: Literal, a: Attribute) =>
        num(l).map(x => (a.name, Double.NegativeInfinity, x)).toSeq
      case GreaterThanOrEqual(l: Literal, a: Attribute) =>
        num(l).map(x => (a.name, Double.NegativeInfinity, x)).toSeq
      case LessThan(l: Literal, a: Attribute) =>
        num(l).map(x => (a.name, x, Double.PositiveInfinity)).toSeq
      case LessThanOrEqual(l: Literal, a: Attribute) =>
        num(l).map(x => (a.name, x, Double.PositiveInfinity)).toSeq
      case org.apache.spark.sql.catalyst.expressions.EqualNullSafe(
          a: Attribute, l: Literal) =>
        num(l).map(x => (a.name, x, x)).toSeq
      case org.apache.spark.sql.catalyst.expressions.EqualNullSafe(
          l: Literal, a: Attribute) =>
        num(l).map(x => (a.name, x, x)).toSeq
      // IN-list point lookups: the values' [min, max] hull is a
      // conservative zone interval (a file overlapping the hull but
      // holding none of the values is kept — never wrong, still prunes
      // the far files)
      case org.apache.spark.sql.catalyst.expressions.In(a: Attribute, vs)
          if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        val xs = vs.flatMap { case l: Literal => num(l) }
        if (xs.size == vs.size) Seq((a.name, xs.min, xs.max)) else Nil
      case org.apache.spark.sql.catalyst.expressions.InSet(a: Attribute, vs)
          if vs.nonEmpty =>
        val xs = vs.toSeq.flatMap {
          case n: java.lang.Number =>
            Some(n.doubleValue()).filterNot(_.isNaN)
          case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
          case _ => None
        }
        if (xs.size == vs.size) Seq((a.name, xs.min, xs.max)) else Nil
      case org.apache.spark.sql.catalyst.expressions.And(x, y) =>
        bounds(x) ++ bounds(y)
      case _ => Nil
    }
  }

  /** Decode a pushed filter into closed STRING bounds on one column —
    * the string twin of [[bounds]]. `None` on a side means unbounded.
    * Comparison currency is UTF-8 BYTES (Spark's `UTF8String` ordering
    * and parquet's unsigned binary stats order — java `String.compareTo`
    * is UTF-16 code units, which DISAGREES beyond the BMP, so the
    * literal goes to bytes once here and every comparison is byte-wise).
    */
  private def strBounds(e: Expression)
      : Seq[(String, Option[Array[Byte]], Option[Array[Byte]])] = {
    def s(l: Literal): Option[Array[Byte]] = l.value match {
      case u: org.apache.spark.unsafe.types.UTF8String => Some(u.getBytes)
      case _ => None
    }
    e match {
      case EqualTo(a: Attribute, l: Literal) =>
        s(l).map(x => (a.name, Some(x), Some(x))).toSeq
      case EqualTo(l: Literal, a: Attribute) =>
        s(l).map(x => (a.name, Some(x), Some(x))).toSeq
      case org.apache.spark.sql.catalyst.expressions.EqualNullSafe(
          a: Attribute, l: Literal) =>
        s(l).map(x => (a.name, Some(x), Some(x))).toSeq
      case org.apache.spark.sql.catalyst.expressions.EqualNullSafe(
          l: Literal, a: Attribute) =>
        s(l).map(x => (a.name, Some(x), Some(x))).toSeq
      case GreaterThan(a: Attribute, l: Literal) =>
        s(l).map(x => (a.name, Some(x), None)).toSeq
      case GreaterThanOrEqual(a: Attribute, l: Literal) =>
        s(l).map(x => (a.name, Some(x), None)).toSeq
      case LessThan(a: Attribute, l: Literal) =>
        s(l).map(x => (a.name, None, Some(x))).toSeq
      case LessThanOrEqual(a: Attribute, l: Literal) =>
        s(l).map(x => (a.name, None, Some(x))).toSeq
      case GreaterThan(l: Literal, a: Attribute) =>
        s(l).map(x => (a.name, None, Some(x))).toSeq
      case GreaterThanOrEqual(l: Literal, a: Attribute) =>
        s(l).map(x => (a.name, None, Some(x))).toSeq
      case LessThan(l: Literal, a: Attribute) =>
        s(l).map(x => (a.name, Some(x), None)).toSeq
      case LessThanOrEqual(l: Literal, a: Attribute) =>
        s(l).map(x => (a.name, Some(x), None)).toSeq
      case org.apache.spark.sql.catalyst.expressions.In(a: Attribute, vs)
          if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        val xs = vs.flatMap { case l: Literal => s(l) }
        if (xs.size == vs.size)
          Seq((a.name, Some(xs.min(GraftSnapFileIndex.byteOrd)),
            Some(xs.max(GraftSnapFileIndex.byteOrd))))
        else Nil
      case org.apache.spark.sql.catalyst.expressions.InSet(a: Attribute, vs)
          if vs.nonEmpty =>
        val xs = vs.toSeq.flatMap {
          case u: org.apache.spark.unsafe.types.UTF8String => Some(u.getBytes)
          case _ => None
        }
        if (xs.size == vs.size)
          Seq((a.name, Some(xs.min(GraftSnapFileIndex.byteOrd)),
            Some(xs.max(GraftSnapFileIndex.byteOrd))))
        else Nil
      case org.apache.spark.sql.catalyst.expressions.And(x, y) =>
        strBounds(x) ++ strBounds(y)
      case _ => Nil
    }
  }

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression])
      : Seq[PartitionDirectory] = {
    val preds = dataFilters.flatMap(bounds)
    val spreds = dataFilters.flatMap(strBounds)
    import GraftSnapFileIndex.{byteCmp, isAscii}
    val keep = entries.filter { case (e, _) =>
      preds.forall { case (c, lo, hi) =>
        e.stats.get(c) match {
          case Some((mn, mx)) => mx >= lo && mn <= hi
          case None => true // no embedded bounds: unprunable, never wrong
        }
      } && spreds.forall { case (c, lo, hi) =>
        e.strStats.get(c) match {
          // ASCII-only gate: the manifest's string bounds were merged
          // across row groups in UTF-16 order (Layout's kernel) — for
          // pure-ASCII bounds that order AGREES with the byte order the
          // comparisons here run in (an ASCII winner dominates every
          // candidate in both orders, since any non-ASCII byte exceeds
          // all ASCII bytes in both); non-ASCII bounds decode to
          // "unprunable", never to a wrong skip
          case Some((mn, mx)) if isAscii(mn) && isAscii(mx) =>
            val mnB = mn.getBytes("UTF-8"); val mxB = mx.getBytes("UTF-8")
            lo.forall(l => byteCmp(mxB, l) >= 0) &&
              hi.forall(h => byteCmp(mnB, h) <= 0)
          case _ => true
        }
      }
    }
    Seq(PartitionDirectory(InternalRow.empty, keep.map(_._2).toArray))
  }
}

private[sources] object GraftSnapFileIndex {
  /** Unsigned byte-wise lexicographic compare — `UTF8String` order. */
  def byteCmp(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }
  val byteOrd: Ordering[Array[Byte]] = (a, b) => byteCmp(a, b)
  def isAscii(s: String): Boolean = s.forall(_ < 0x80)
}

/** The STREAMING read half of the front door
  * (`spark.readStream.format("graft-snap")`): offsets ARE snapshot
  * version numbers — `getOffset` reports the table's latest committed
  * version, and a micro-batch `(start, end]` is exactly the data files
  * those commits appended (an O(files) manifest diff; the engine's
  * offset log makes consumption exactly-once across restarts, the same
  * guarantee every file source inherits). Windows that are not
  * append-shaped fail LOUDLY: a REPLACE (compaction/OPTIMIZE) resets
  * history — reprocess from it; rename/drop rules inside a window would
  * mix shapes mid-stream. `startingVersion` (default 0) lets a new
  * consumer skip history.
  *
  * The per-batch frame is the batch parquet plan over the window's
  * files re-tagged streaming ([[org.apache.spark.sql.GraftSqlShims]])
  * — vectorized scan included, nothing hand-rolled.
  */
/** Shared by both snapshot stream sources: offsets ARE version numbers
  * (a `SerializedOffset` arrives on restart and parses back).
  */
private[sources] object SnapStreamOffsets {
  import org.apache.spark.sql.execution.streaming.Offset
  import org.apache.spark.sql.execution.streaming.runtime.LongOffset

  def ver(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong // SerializedOffset on restart
  }

  def latestAfter(root: String, startingVersion: Long): Option[Offset] =
    Snapshots.latestVersion(root).filter(_ > startingVersion)
      .map(LongOffset(_))
}

private[sources] class GraftSnapStreamSource(
    spark: SparkSession, root: String, override val schema: StructType,
    startingVersion: Long)
    extends org.apache.spark.sql.execution.streaming.Source {

  import org.apache.spark.sql.execution.streaming.Offset
  import SnapStreamOffsets.ver

  override def getOffset: Option[Offset] =
    SnapStreamOffsets.latestAfter(root, startingVersion)

  override def getBatch(start: Option[Offset], end: Offset)
      : org.apache.spark.sql.classic.DataFrame = {
    val from = start.map(ver).getOrElse(startingVersion)
    val to = ver(end)
    // O(delta) planning: the window walk reads each version's manifest
    // HEADER plus only the window's own segments — never two full
    // manifest materializations per micro-batch (O(files) each; at a
    // million files and a 1 s trigger that was the planning
    // bottleneck). Same loud refusals: replace / schema-rule /
    // tombstone windows break the stream with the original messages
    // (checkpoint commits pass — entry-preserving). Files may legally
    // be replaced AFTER `to`; this batch still replays from the pinned
    // window until vacuum retires it.
    val files = Snapshots.windowAppends(root, from, to)
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val batch =
      if (files.isEmpty) // a metadata-only window (rename, checkpoint)
        cs.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          schema)
      else {
        // additive evolution mid-stream must break LOUDLY like rules do
        // (reading new files through the pinned schema would silently
        // clip the new column): one footer inference over the WINDOW's
        // files only — O(delta), never the table
        val read = cs.read.option("mergeSchema", "true") // union of the
          .parquet(files.map(f => s"$root/${f.path}"): _*) // window's shapes
        val winCols = read.schema.fieldNames.toSet
        val pinned = schema.fieldNames.toSet
        require(winCols == pinned,
          s"($from, $to] of $root changes the schema (window columns " +
            s"${winCols.mkString(",")} vs the stream's ${pinned.mkString(",")})" +
            " — restart the consumer on the new shape")
        cs.read.schema(schema).parquet(files.map(f => s"$root/${f.path}"): _*)
      }
    org.apache.spark.sql.GraftSqlShims.asStreamingFrame(cs, batch)
  }

  override def stop(): Unit = ()
}

/** The CDC half of the streaming front door
  * (`spark.readStream.format("graft-snap").option("readChangeFeed",
  * "true").option("keyCol", k)`): each micro-batch `(start, end]` is
  * the batch [[Snapshots.changeFeed]] over exactly that version window —
  * row-level changes with `_change_type` (insert / upsert / delete) and
  * `_commit_version`, so MERGE-ON-READ tables stream WITHOUT compaction:
  * a tombstone-bearing window that breaks the append source loudly is
  * this source's normal diet (an updateWhere feeds as delete(old) +
  * insert(new), deleted rows feed with their full recovered payload).
  * Offsets ARE versions, the window feed is deterministic, and the
  * engine's offset log makes consumption exactly-once — the Delta
  * `readChangeFeed` streaming shape. Replace commits and in-window
  * schema rules still refuse loudly (history resets are not
  * representable as row changes); both inherit [[Snapshots.changeFeed]]'s
  * checks.
  *
  * Planning is O(delta) per micro-batch, like the append source's: the
  * source caches the manifest state it planned the LAST batch against
  * and ADVANCES it by the window's own segments
  * ([[Snapshots.advanceSnapshot]] — header reads are doc-cached, each
  * segment is read once across the stream's life). The pre-window
  * tombstone CONTEXT the feed needs (pre-window equality/position
  * tombstones decide which deletes are already dead) therefore
  * materializes ONCE per stream — at start/restart — and incrementally
  * thereafter, never O(files) per 1 s trigger. Any non-append-shaped
  * step (replace / checkpoint / legacy inline manifests) falls back to
  * the full materialization; correctness never depends on the fast
  * path.
  */
private[graft] class GraftSnapCdcStreamSource(
    spark: SparkSession, root: String, override val schema: StructType,
    startingVersion: Long, keyCol: String)
    extends org.apache.spark.sql.execution.streaming.Source {

  import org.apache.spark.sql.execution.streaming.Offset
  import SnapStreamOffsets.ver

  override def getOffset: Option[Offset] =
    SnapStreamOffsets.latestAfter(root, startingVersion)

  // the manifest state the last getBatch planned against, keyed by its
  // version: a sequential stream's next window starts exactly there, so
  // planning advances it by the window's own segments instead of
  // re-materializing the head (engine calls are serialized per query;
  // volatile covers the engine's thread handoffs)
  @volatile private var cached: Option[(Long, Snapshots.Snapshot)] = None

  override def getBatch(start: Option[Offset], end: Offset)
      : org.apache.spark.sql.classic.DataFrame = {
    val from = start.map(ver).getOrElse(startingVersion)
    val to = ver(end)
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val base = cached match {
      case Some((v, s)) if v == from => s
      case _ if from == 0L => Snapshots.Snapshot(0L, -1L, "", Seq.empty)
      case _ => Snapshots.snapshot(root, from) // start/restart: once
    }
    val advanced =
      if (base.version < to) Snapshots.advanceSnapshot(root, base, to)
      else None // a degenerate (from == to) replay window plans empty
    val toSnap = advanced.getOrElse(Snapshots.snapshot(root, to))
    cached = Some((to, toSnap))
    val any = advanced match {
      // the fast path appended exactly the window's entries: emptiness
      // is a size compare, no O(files) seq scan
      case Some(s) => s.files.size + s.deletes.size + s.posDeletes.size >
        base.files.size + base.deletes.size + base.posDeletes.size
      case None => (toSnap.files ++ toSnap.deletes ++ toSnap.posDeletes)
        .exists(f => f.seq > from && f.seq <= to)
    }
    val batch =
      if (!any) // a metadata-only window (rename-free checkpoint etc.)
        cs.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          schema)
      else {
        val feed = Snapshots.changeFeedOn(cs, root, base.files, toSnap,
          from, to, keyCol)
        // pin the column ORDER to the stream's declared schema (the
        // feed's union order varies with which change kinds the window
        // holds); a column the feed cannot produce fails analysis loudly
        feed.select(schema.fieldNames.toSeq.map(feed.col): _*)
      }
    org.apache.spark.sql.GraftSqlShims.asStreamingFrame(cs,
      batch.asInstanceOf[org.apache.spark.sql.classic.DataFrame])
  }

  override def stop(): Unit = ()
}

/** The STREAMING write half of the front door: one append COMMIT per
  * micro-batch, exactly-once. The commit note carries the pipeline tag
  * and batchId (`stream-batch-<appTag>-<id>`) — after a crash,
  * Structured Streaming replays the last epoch, and a batchId at or
  * below THIS pipeline's table high-water is skipped (the manifest IS
  * the transaction log, so the idempotence marker lives in the same
  * atomic publish as the data: no separate ledger to drift; different
  * pipelines carry different tags and never suppress each other).
  * Appends rebase over concurrent committers — this sink coexists with
  * batch writers and other streams where a replace sink would conflict.
  */
private[sources] class GraftSnapStreamSink(root: String, appTag: String,
                                           legacyTags: Seq[String],
                                           statsCols: Seq[String])
    extends org.apache.spark.sql.execution.streaming.Sink {

  private val notePrefix = s"stream-batch-$appTag-"
  // markers written under this pipeline's PREVIOUS tag formats still
  // count toward the high-water (upgrade-boundary exactly-once)
  private val recoverPrefixes =
    notePrefix +: legacyTags.map(t => s"stream-batch-$t-")

  // THIS pipeline's high-water batchId already IN the table, recovered
  // from commit notes once at sink construction (post-crash restart
  // included); kept current in memory after each commit. HEADER reads
  // only (cached docs) — materializing full snapshots here would be
  // O(versions × files) segment parsing for a field the header carries.
  @volatile private var maxCommitted: Long =
    Snapshots.versions(root).flatMap { v =>
      val n = Snapshots.commitNote(root, v)
      recoverPrefixes.find(n.startsWith).flatMap(p =>
        scala.util.Try(n.substring(p.length).toLong).toOption)
    }.foldLeft(-1L)(math.max)

  override def addBatch(batchId: Long,
                        data: org.apache.spark.sql.DataFrame): Unit =
    synchronized {
      if (batchId <= maxCommitted) return // replayed epoch: already landed
      val cdf = data.asInstanceOf[org.apache.spark.sql.classic.DataFrame]
      val cs = cdf.sparkSession
      // the micro-batch frame is streaming-tagged (batch writers refuse
      // it); its planned RDD re-tags as a batch frame unchanged
      Snapshots.commit(root,
        org.apache.spark.sql.GraftSqlShims.asBatchFrame(cs, cdf),
        s"$notePrefix$batchId", statsCols = statsCols): Unit
      maxCommitted = batchId
    }

  override def toString: String = s"GraftSnapStreamSink($root, $appTag)"
}
