package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: how a 100 TB table is physically arranged so
  * later scans prune. The reference's only layout decision is its scatter
  * (`/root/reference/QuickInsertionHeap.c:164-187` — one sort key, one
  * range split); real lakehouse tables need MULTI-dimensional locality,
  * which a single-column range sort cannot give (sorting by `a` scatters
  * `b` uniformly through every file).
  */
object Layout {

  /** Z-order (Morton) value of `n` non-negative dimensions: bit i of
    * dimension j lands at position `i·n + (n−1−j)` — dimension 0 owns the
    * most-significant slot of each bit group, so for n=2 this is the
    * classic interleave (bit i of `a` at 2i+1, bit i of `b` at 2i), and
    * rows close in ALL dimensions get close z-values. Pure long
    * shift/mask arithmetic — an unrolled sum of `((x >> i) & 1) << p`
    * terms, codegen'd by Spark and replayable verbatim in any SQL engine
    * (`n·bits ≤ 62` keeps every position below the sign bit). Dimensions
    * are masked to `bits` (caller buckets wider domains first; real
    * lakehouse tables z-order 3–4 columns at 8–16 bits each).
    */
  def zValueN(dims: Seq[Column], bits: Int): Column = {
    val n = dims.size
    require(n >= 1, "at least one dimension")
    require(bits >= 1 && n * bits <= 62,
      s"n*bits = ${n * bits} must stay within a signed long")
    (0 until bits).flatMap { i =>
      dims.zipWithIndex.map { case (d, j) =>
        shiftleft(shiftright(d, i).bitwiseAND(lit(1L)),
          i * n + (n - 1 - j)): Column
      }
    }.reduce(_ + _)
  }

  /** Two-dimension [[zValueN]] — the layout most tables start with. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    zValueN(Seq(a, b), bits)

  /** Z-order clustering: range-scatter + sort the table by the interleaved
    * key. Downstream, a predicate on EITHER dimension touches only the
    * files whose z-range intersects it (parquet min/max on the original
    * columns stay tight because each file covers a small z-square) —
    * the standard multi-dim skip-index layout. One shuffle, same cost
    * shape as a plain global sort; `zval` is kept in the output so the
    * write can also partition on `zval div stripSize` if file-level
    * boundaries are wanted explicitly.
    */
  def zorderCluster(df: DataFrame, dimA: Column, dimB: Column,
                    bits: Int = 16): DataFrame =
    df.withColumn("zval", zValue(dimA, dimB, bits))
      .orderBy(col("zval"))

  /** The z-order SKIP INDEX mechanic: which strips (z-value prefixes,
    * `strip = zval >> (2·bits − stripTopBits)`) can contain ANY point of
    * the query box `[aLo,aHi] × [bLo,bHi]`. A strip fixes the top
    * interleaved bits, i.e. a prefix of each dimension — so it covers an
    * axis-aligned rectangle, and the intersection test is exact. This is
    * the driver-side translation every lakehouse z-order scan does:
    * a predicate on EITHER dimension (or both) becomes a partition
    * filter on the strip column, and Spark prunes the non-qualifying
    * strip directories at PLANNING time — the pruning a plain one-column
    * sort can only give for its own sort key. O(2^stripTopBits) driver
    * work, independent of table size.
    */
  def zStrips(aLo: Long, aHi: Long, bLo: Long, bHi: Long,
              bits: Int, stripTopBits: Int): Seq[Long] =
    zStripsN(Seq((aLo, aHi), (bLo, bHi)), bits, stripTopBits)

  /** n-dimensional [[zStrips]]: which strips (top `stripTopBits` z-bits)
    * can contain ANY point of the axis-aligned box `boxes(j) = (lo_j,
    * hi_j)`. A strip fixes a prefix of each dimension (the top z-bits
    * round-robin through the dimensions in [[zValueN]]'s order), so it
    * covers an n-rectangle and the intersection test is exact per
    * dimension. O(2^stripTopBits · n) driver arithmetic, independent of
    * table size.
    */
  def zStripsN(boxes: Seq[(Long, Long)], bits: Int,
               stripTopBits: Int): Seq[Long] = {
    val n = boxes.size
    require(n >= 1, "at least one dimension")
    require(stripTopBits >= 1 && stripTopBits <= n * bits,
      s"stripTopBits must cover 1..n*bits interleaved bits")
    val nb = stripTopBits
    (0L until (1L << nb)).filter { s =>
      val pre = Array.fill(n)(0L)
      val nBits = Array.fill(n)(0)
      var k = 0
      while (k < nb) {
        val pos = n * bits - 1 - k // z bit position, high to low
        val bit = (s >> (nb - 1 - k)) & 1L
        val j = n - 1 - (pos % n) // dimension owning this position
        pre(j) = (pre(j) << 1) | bit
        nBits(j) += 1
        k += 1
      }
      (0 until n).forall { j =>
        val mn = pre(j) << (bits - nBits(j))
        val mx = mn + (1L << (bits - nBits(j))) - 1
        mx >= boxes(j)._1 && mn <= boxes(j)._2
      }
    }
  }

  /** Name of the layout descriptor [[zorderWriteN]] leaves at the root
    * of a z-clustered table — what lets a scan-side rule
    * ([[graft.plans.ZOrderStripPrune]]) recognize the layout and apply
    * the [[zStripsN]] skip index WITHOUT the caller spelling the strip
    * filter. Properties format (dependency-free to read anywhere):
    * `dims=pk,sk` / `bits=10` / `stripTopBits=4`.
    */
  val ZLayoutMetaFile = "_graft_zlayout"

  /** The domain-checked z-value: every dimension is REQUIRED in
    * `[0, 2^bits)` and the expression fails on the first violator
    * (`raise_error` — negligible next to the exchange it rides): an
    * out-of-domain value would land in the strip of its masked low bits,
    * and any later strip pruning derived from a predicate on the REAL
    * value could then silently drop it. Layout descriptors and skip
    * indexes are only trusted because this holds.
    */
  private def zvalChecked(dims: Seq[String], bits: Int): Column = {
    val lim = 1L << bits
    val inDomain = dims.map(d => col(d) >= 0 && col(d) < lim).reduce(_ && _)
    when(inDomain, zValueN(dims.map(col), bits))
      .otherwise(raise_error(format_string(
        s"z-order dimension out of [0, $lim): " +
          dims.map(d => s"$d=%s").mkString(", "),
        dims.map(d => col(d).cast("string")): _*)))
  }

  /** Write the z-clustered LAYOUT over named dimension columns:
    * [[zValueN]]'s interleave, cut into `2^stripTopBits` strip
    * directories (`zstrip` partition column), one exchange on the strip,
    * rows z-sorted inside each file ([[zvalChecked]] enforces the
    * dimension domain — the descriptor is only written, and the skip
    * index only trusted, because it holds), plus a [[ZLayoutMetaFile]]
    * descriptor at the root. Scans then combine [[zStripsN]]'s strip
    * filter (directory pruning at planning time — self-applied by
    * [[graft.plans.ZOrderStripPrune]] when installed, or hand-injected
    * as in the `zorder_exec` query) with the original dimension
    * predicate (row-group pruning inside the surviving files).
    */
  def zorderWriteN(df: DataFrame, dims: Seq[String], bits: Int,
                   stripTopBits: Int, outDir: String): String = {
    val n = dims.size
    val shift = n * bits - stripTopBits
    // ONE exchange (on the strip), per-file z-sort — a global orderBy
    // would add a range exchange for ordering the strip dirs already give
    df.withColumn("zval", zvalChecked(dims, bits))
      .withColumn("zstrip", shiftright(col("zval"), shift))
      .repartition(col("zstrip"))
      .sortWithinPartitions(col("zval"))
      .write.mode("overwrite").partitionBy("zstrip").parquet(outDir)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outDir, ZLayoutMetaFile),
      s"dims=${dims.mkString(",")}\nbits=$bits\nstripTopBits=$stripTopBits\n"
        .getBytes("UTF-8")): Unit
    outDir
  }

  /** Two-dimension [[zorderWriteN]]. */
  def zorderWrite(df: DataFrame, dimA: String, dimB: String, bits: Int,
                  stripTopBits: Int, outDir: String): String =
    zorderWriteN(df, Seq(dimA, dimB), bits, stripTopBits, outDir)

  /** [[zorderWriteN]] INSIDE the snapshot format — layout maintenance as
    * a TRANSACTION: the z-clustered rewrite publishes as a REPLACE
    * commit ([[Snapshots.commit]]), so readers pinned to any version
    * never see a half-laid table, the rewrite is visible (and
    * revertible) in `DESCRIBE HISTORY`, and the superseded files stay
    * until [[Snapshots.vacuum]]. Under the format, strip DIRECTORIES
    * give way to manifest file statistics (the lakehouse way — no Hive
    * paths): `zval`/`zstrip` land as ordinary data columns,
    * `repartitionByRange(zval)` makes each file cover a contiguous
    * z-range (tight per-file `zstrip` footer stats), and a scan combines
    * [[zStripsN]]'s qualifying strip set with [[Snapshots.zoneMap]] +
    * [[zonePruneIn]] for the same planning-time file pruning the
    * directory layout gives outside the format. Returns the committed
    * version.
    */
  def zorderCommitN(root: String, df: DataFrame, dims: Seq[String],
                    bits: Int, stripTopBits: Int,
                    basedOn: Option[Long] = None): Long = {
    val n = dims.size
    val shift = n * bits - stripTopBits
    val laid = df
      .withColumn("zval", zvalChecked(dims, bits))
      .withColumn("zstrip", shiftright(col("zval"), shift))
      .repartitionByRange(1 << stripTopBits, col("zval"))
      .sortWithinPartitions(col("zval"))
    Snapshots.commit(root, laid, s"zorder-${dims.mkString(",")}",
      replace = true, basedOn = basedOn)
  }

  /** [[zonePrune]] for a SET predicate (`col ∈ values` — the shape a
    * z-strip skip set produces): a file survives iff ANY value falls in
    * its `[min, max]` zone, NULL stats conservatively kept. Driver-side
    * O(files · |values|) with |values| bounded by the strip count.
    */
  def zonePruneIn(stats: DataFrame, c: String, values: Seq[Long]): Seq[String] = {
    if (values.isEmpty) return Seq.empty // no qualifying strip: provably empty
    val keep = col(s"min_$c").isNull || col(s"max_$c").isNull ||
      values.map(v => lit(v) >= col(s"min_$c") && lit(v) <= col(s"max_$c"))
        .reduce(_ || _)
    stats.where(keep).select(col("file")).collect().map(_.getString(0)).toSeq
  }

  /** ZONE MAP: per-file min/max statistics over arbitrary columns — the
    * generic file-skipping channel (Delta/Iceberg file stats) that covers
    * what partition directories and the z-strip index cannot: pruning on
    * NON-partition columns of an existing layout. Output is one row per
    * physical file (`file`, `n_rows`, and `min_<c>` / `max_<c>` per
    * requested column) — O(files) rows regardless of table volume, the
    * manifest shape a scheduled stats pass maintains. This builder takes
    * one pass over the DATA (rides the write or an OPTIMIZE);
    * [[zoneMapFooters]] builds the identical table from parquet FOOTERS
    * alone — metadata reads only — for tables whose writes can't be
    * instrumented.
    */
  def zoneMap(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"),
        cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"),
          max(col(c)).as(s"max_$c"))): _*)

  /** [[zoneMap]] from parquet FOOTERS only — no data pages are read. The
    * file list is distributed over executors (`parallelize`, one footer
    * read per file — at a million files this is a metadata-only Spark job,
    * not a driver loop) and each footer's per-row-group column statistics
    * fold into one (min, max, rows) triple per file. Statistics are
    * decoded through parquet's typed Statistics API for the physical
    * types the engine stores its skip-relevant columns as (int32 / int64
    * / float / double — timestamps land as int64 micros); a file whose
    * footer lacks stats for a column yields NULL min/max, which
    * [[zonePrune]] treats as "cannot prune" (kept), never "prunable".
    */
  def zoneMapFooters(spark: org.apache.spark.sql.SparkSession,
                     dir: String, cols: Seq[String],
                     strCols: Seq[String] = Seq.empty): DataFrame =
    zoneMapFootersFor(spark,
      listParquetFiles(new java.io.File(dir)).map(_.getPath), cols, strCols)

  /** [[zoneMapFooters]] over an EXPLICIT file list — the form a manifest
    *-driven caller ([[Snapshots.zoneMap]]) uses, where the files of
    * interest are a subset of what a directory listing would see.
    *
    * `cols` are NUMERIC-statistics columns (min/max as doubles):
    * int32/int64/float/double physicals, including date (days) and
    * timestamp (micros) — monotone encodings whose interval test is
    * exact as long as the caller's bounds use the same unit. DECIMAL
    * columns are deliberately emitted as NULL stats (conservatively
    * KEPT by [[zonePrune]]): their physical stats are the UNSCALED
    * integer, and silently intersecting a caller's logical bounds
    * against unscaled values would prune files that match — the one
    * failure mode a skip index must never have.
    *
    * `strCols` are STRING columns (min/max as UTF-8 strings): parquet
    * binary stats may be TRUNCATED bounds (a prefix for min, an
    * incremented prefix for max) — still valid for interval
    * intersection, which only needs bounds, not exact extremes.
    */
  def zoneMapFootersFor(spark: org.apache.spark.sql.SparkSession,
                        files: Seq[String], cols: Seq[String],
                        strCols: Seq[String] = Seq.empty): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(
      StructField("file", StringType) +: StructField("n_rows", LongType) +:
        statFields(cols, strCols))
    // ship the driver's Hadoop conf: the executor-side lazy fallback is
    // a bare Configuration() that drops spark.hadoop.* credentials
    val shipped = SnapIO.ship()
    val rows = spark.sparkContext.parallelize(files,
      math.max(1, math.min(files.size, 64))).map { path =>
      SnapIO.install(shipped.value)
      val (nRows, mins, maxs, smins, smaxs) = fileFooterStats(path, cols, strCols)
      Row.fromSeq(path +: nRows +: statCells(cols, strCols,
        mins, maxs, smins, smaxs))
    }
    spark.createDataFrame(rows, schema)
  }

  /** ONE file's footer statistics, folded across its row groups — the
    * per-file kernel behind [[zoneMapFootersFor]], also called by the
    * snapshot format's commit path ([[Snapshots]]) to EMBED column
    * bounds in the manifest (the Iceberg manifest-stats shape) so later
    * scans prune from manifest text alone, zero footer I/O at planning.
    */
  private[ops] def fileFooterStats(path: String, cols: Seq[String],
                                   strCols: Seq[String]):
      (Long, Array[Option[Double]], Array[Option[Double]],
       Array[Option[String]], Array[Option[String]]) = {
    val reader = openFooter(path)
    try {
      val blocks = reader.getFooter.getBlocks
      var nRows = 0L
      val mins = Array.fill(cols.size)(Option.empty[Double])
      val maxs = Array.fill(cols.size)(Option.empty[Double])
      val smins = Array.fill(strCols.size)(Option.empty[String])
      val smaxs = Array.fill(strCols.size)(Option.empty[String])
      val it = blocks.iterator()
      while (it.hasNext) {
        val b = it.next()
        nRows += b.getRowCount
        val (bmins, bmaxs, bsmins, bsmaxs) = blockStats(b, cols, strCols)
        for (i <- cols.indices) {
          bmins(i).foreach(m => mins(i) = Some(mins(i).fold(m)(math.min(m, _))))
          bmaxs(i).foreach(m => maxs(i) = Some(maxs(i).fold(m)(math.max(m, _))))
        }
        for (j <- strCols.indices) {
          bsmins(j).foreach(m =>
            smins(j) = Some(smins(j).fold(m)(o => if (m < o) m else o)))
          bsmaxs(j).foreach(m =>
            smaxs(j) = Some(smaxs(j).fold(m)(o => if (m > o) m else o)))
        }
      }
      (nRows, mins, maxs, smins, smaxs)
    } finally reader.close()
  }

  /** [[zoneMapFootersFor]] at ROW-GROUP granularity: one stats row per
    * (file, row group) — `file`, `rg_idx`, `rg_start`/`rg_bytes` (the
    * group's byte extent, what a range-scoped read needs), `n_rows`, and
    * the same min/max columns. Parquet footers already carry per-group
    * statistics; the file-level map just folds them — this variant keeps
    * them apart, which is the skipping that matters once compaction
    * produces LARGE files: a predicate window inside a 1 GB sorted file
    * prunes nothing at file level but all-but-a-few row groups here.
    * Same cost shape (footer reads distributed over executors, O(groups)
    * output rows, no data pages) and the same conservative decode rules
    * (decimal → NULL stats, lossy INT64 widened).
    */
  def zoneMapRowGroups(spark: org.apache.spark.sql.SparkSession,
                       files: Seq[String], cols: Seq[String],
                       strCols: Seq[String] = Seq.empty): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(
      StructField("file", StringType) +: StructField("rg_idx", LongType) +:
        StructField("rg_start", LongType) +: StructField("rg_bytes", LongType) +:
        StructField("n_rows", LongType) +: statFields(cols, strCols))
    val shipped = SnapIO.ship() // executor-side credentialed footer reads
    val rows = spark.sparkContext.parallelize(files,
      math.max(1, math.min(files.size, 64))).flatMap { path =>
      SnapIO.install(shipped.value)
      val reader = openFooter(path)
      try {
        import scala.jdk.CollectionConverters._
        reader.getFooter.getBlocks.asScala.toSeq.zipWithIndex.map {
          case (b, idx) =>
            val (mins, maxs, smins, smaxs) = blockStats(b, cols, strCols)
            Row.fromSeq(path +: idx.toLong +: b.getStartingPos +:
              b.getCompressedSize +: b.getRowCount +:
              statCells(cols, strCols, mins, maxs, smins, smaxs))
        }
      } finally reader.close()
    }
    spark.createDataFrame(rows, schema)
  }

  /** [[zoneMapRowGroups]] over a directory's parquet files. */
  def zoneMapRowGroupsIn(spark: org.apache.spark.sql.SparkSession,
                         dir: String, cols: Seq[String],
                         strCols: Seq[String] = Seq.empty): DataFrame =
    zoneMapRowGroups(spark,
      listParquetFiles(new java.io.File(dir)).map(_.getPath), cols, strCols)

  private def openFooter(path: String) = {
    // SnapIO.conf, not a bare Configuration(): on s3a://-class roots the
    // credentials live in the session's spark.hadoop.* conf, and the
    // commit path stats footers through here — a bare conf would make
    // the very first credentialed commit fail
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new org.apache.hadoop.fs.Path(path), SnapIO.conf)
    org.apache.parquet.hadoop.ParquetFileReader.open(in)
  }

  private def statFields(cols: Seq[String], strCols: Seq[String]) = {
    import org.apache.spark.sql.types._
    cols.flatMap(c => Seq(StructField(s"min_$c", DoubleType),
      StructField(s"max_$c", DoubleType))) ++
      strCols.flatMap(c => Seq(StructField(s"min_$c", StringType),
        StructField(s"max_$c", StringType)))
  }

  private def statCells(cols: Seq[String], strCols: Seq[String],
                        mins: Array[Option[Double]],
                        maxs: Array[Option[Double]],
                        smins: Array[Option[String]],
                        smaxs: Array[Option[String]]): Seq[Any] =
    cols.indices.flatMap(i => Seq(mins(i).map(Double.box).orNull,
      maxs(i).map(Double.box).orNull)) ++
      strCols.indices.flatMap(j => Seq(smins(j).orNull, smaxs(j).orNull))

  /** Decode ONE row group's column statistics — the shared kernel of the
    * file-level and row-group-level zone maps. Numeric stats (int32 /
    * int64 / float / double physicals) land as doubles; INT64 values
    * whose long→double conversion is lossy (above 2^53 — snowflake ids,
    * nanosecond timestamps) are widened conservatively (nextDown on
    * mins, nextUp on maxs): round-to-nearest could RAISE a min or LOWER
    * a max, and a too-tight zone skips a file that contains matching
    * rows — the one failure a skip index must never have. DECIMAL
    * columns yield NULL stats (their physical stats are the UNSCALED
    * integer; intersecting logical bounds against them would prune
    * matches); string columns use parquet's (possibly truncated) binary
    * bounds, valid for interval intersection.
    */
  private def blockStats(b: org.apache.parquet.hadoop.metadata.BlockMetaData,
                         cols: Seq[String], strCols: Seq[String]):
      (Array[Option[Double]], Array[Option[Double]],
       Array[Option[String]], Array[Option[String]]) = {
    val mins = Array.fill(cols.size)(Option.empty[Double])
    val maxs = Array.fill(cols.size)(Option.empty[Double])
    val smins = Array.fill(strCols.size)(Option.empty[String])
    val smaxs = Array.fill(strCols.size)(Option.empty[String])
    val chunks = b.getColumns.iterator()
    while (chunks.hasNext) {
      val ch = chunks.next()
      val name = ch.getPath.toDotString
      val st = ch.getStatistics
      val hasStats = st != null && st.hasNonNullValue
      val isDecimal = ch.getPrimitiveType.getLogicalTypeAnnotation
        .isInstanceOf[org.apache.parquet.schema.LogicalTypeAnnotation.DecimalLogicalTypeAnnotation]
      val i = cols.indexOf(name)
      if (i >= 0 && hasStats && !isDecimal) {
        def num(v: Any, roundUp: Boolean): Option[Double] = v match {
          case l: java.lang.Long =>
            val d = l.doubleValue()
            if (math.abs(l.longValue()) <= (1L << 53)) Some(d)
            else Some(if (roundUp) Math.nextUp(d) else Math.nextDown(d))
          case n: java.lang.Number => Some(n.doubleValue())
          case _ => None // non-numeric physical under a numeric ask
        }
        mins(i) = num(st.genericGetMin: Any, roundUp = false)
        maxs(i) = num(st.genericGetMax: Any, roundUp = true)
      }
      val j = strCols.indexOf(name)
      if (j >= 0 && hasStats && !isDecimal) {
        def str(v: Any): Option[String] = v match {
          case bin: org.apache.parquet.io.api.Binary =>
            Some(bin.toStringUsingUTF8)
          case _ => None
        }
        smins(j) = str(st.genericGetMin: Any)
        smaxs(j) = str(st.genericGetMax: Any)
      }
    }
    (mins, maxs, smins, smaxs)
  }

  private def listParquetFiles(root: java.io.File): Seq[java.io.File] = {
    val here = Option(root.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
    here.filter(f => f.isFile && f.getName.endsWith(".parquet") &&
      !f.getName.startsWith(".") && !f.getName.startsWith("_")) ++
      here.filter(_.isDirectory).flatMap(listParquetFiles)
  }

  /** Which files of a zone-mapped layout can contain ANY row satisfying
    * the conjunction of closed-interval predicates `col ∈ [lo, hi]` —
    * a file survives iff every predicate's interval intersects the
    * file's `[min_col, max_col]` zone, with NULL stats conservatively
    * kept (a file the stats pass couldn't summarize must be scanned,
    * never skipped). Driver-side O(files) work over the stats table; the
    * survivors feed `spark.read.parquet(survivors: _*)` so the pruning
    * happens at PLANNING time — files that lose never appear in the scan,
    * which is strictly stronger than a post-hoc `input_file_name()`
    * filter (that still lists, opens and row-group-prunes every file).
    */
  def zonePrune(stats: DataFrame, preds: Seq[(String, Any, Any)]): Seq[String] = {
    val keep = preds.map { case (c, lo, hi) =>
      col(s"min_$c").isNull || col(s"max_$c").isNull ||
        (col(s"max_$c") >= lit(lo) && col(s"min_$c") <= lit(hi))
    }.reduceOption(_ && _).getOrElse(lit(true))
    stats.where(keep).select(col("file")).collect().map(_.getString(0)).toSeq
  }

  /** [[zonePrune]] over a [[zoneMapRowGroups]] stats table: which
    * (file, row-group byte range) triples can contain ANY matching row —
    * same interval test, NULL stats conservatively kept; survivors feed
    * [[readRowGroups]], whose range-scoped scans never open the losing
    * groups' pages.
    */
  def zonePruneRowGroups(stats: DataFrame,
                         preds: Seq[(String, Any, Any)]): Seq[(String, Long, Long)] = {
    val keep = preds.map { case (c, lo, hi) =>
      col(s"min_$c").isNull || col(s"max_$c").isNull ||
        (col(s"max_$c") >= lit(lo) && col(s"min_$c") <= lit(hi))
    }.reduceOption(_ && _).getOrElse(lit(true))
    stats.where(keep).select(col("file"), col("rg_start"), col("rg_bytes"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
  }

  /** Read EXACTLY the surviving row groups — the consume half of the
    * row-group zone map, via parquet's file-range scan option
    * (`ParquetReader.withFileRange`: a reader scoped to `[start, start +
    * bytes)` materializes only the row groups whose extent falls in the
    * range — the same mechanic MapReduce splits use). One task per
    * contiguous survivor run per file (adjacent groups coalesce — a
    * window over a sorted file reads as ONE ranged scan, not per-group
    * seeks), columns cut to `projection` via the parquet read-schema
    * projection, so the scan reads the surviving groups' requested
    * column chunks and nothing else.
    *
    * `projection` supports the engine's skip-relevant physicals (long /
    * int / double / float / string / boolean) — the columns a pruned
    * aggregate touches; wider reads belong to the whole-file path.
    */
  def readRowGroups(spark: org.apache.spark.sql.SparkSession,
                    survivors: Seq[(String, Long, Long)],
                    projection: org.apache.spark.sql.types.StructType): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // coalesce adjacent survivors of one file into maximal byte runs
    val runs: Seq[(String, Long, Long)] = survivors.groupBy(_._1).toSeq
      .flatMap { case (file, gs) =>
        gs.sortBy(_._2).foldLeft(Vector.empty[(String, Long, Long)]) {
          case (acc :+ ((f, s, b)), (_, s2, b2)) if s + b == s2 =>
            acc :+ ((f, s, b + b2))
          case (acc, (_, s2, b2)) => acc :+ ((file, s2, b2))
        }
      }
    projection.fields.foreach { f =>
      require(Seq(LongType, IntegerType, DoubleType, FloatType, BooleanType,
        StringType).contains(f.dataType),
        s"readRowGroups: unsupported projection type ${f.dataType} for ${f.name}")
    }
    val fieldNames = projection.fields.map(_.name)
    val fieldTypes = projection.fields.map(_.dataType)
    val shipped = SnapIO.ship() // executor-side credentialed range reads
    val rows = spark.sparkContext
      .parallelize(runs, math.max(1, runs.size))
      .flatMap { case (file, start, bytes) =>
        SnapIO.install(shipped.value)
        // a per-task COPY of the shipped conf: the read schema set below
        // is task-local and must not leak into the JVM-wide conf
        val conf = new org.apache.hadoop.conf.Configuration(SnapIO.conf)
        // cut the read schema from the FILE's own footer (repetition —
        // required vs optional — must match the file, which the caller's
        // Spark-side nullability cannot know)
        val footer = {
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new org.apache.hadoop.fs.Path(file), conf))
          try r.getFooter.getFileMetaData.getSchema finally r.close()
        }
        val cut = new org.apache.parquet.schema.MessageType("graft_projection",
          fieldNames.map(n =>
            footer.getType(Seq(n): _*)): _*)
        conf.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
          cut.toString)
        val reader = org.apache.parquet.hadoop.ParquetReader.builder(
            new org.apache.parquet.hadoop.example.GroupReadSupport(),
            new org.apache.hadoop.fs.Path(file))
          .withConf(conf)
          .withFileRange(start, start + bytes)
          .build()
        // close on task END, not only on iterator exhaustion: a limit/
        // take (or a failed task) stops pulling early, and a reader
        // closed only by the drained-iterator path would leak its open
        // stream until the executor hits the fd limit
        var closed = false
        def closeOnce(): Unit = if (!closed) { closed = true; reader.close() }
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => closeOnce()))
        new Iterator[Row] {
          private var nxt = reader.read()
          override def hasNext: Boolean = {
            if (nxt == null) closeOnce()
            nxt != null
          }
          override def next(): Row = {
            val g = nxt
            nxt = reader.read()
            Row.fromSeq(fieldTypes.indices.map { i =>
              if (g.getFieldRepetitionCount(i) == 0) null
              else fieldTypes(i) match {
                case LongType    => g.getLong(i, 0)
                case IntegerType => g.getInteger(i, 0)
                case DoubleType  => g.getDouble(i, 0)
                case FloatType   => g.getFloat(i, 0)
                case BooleanType => g.getBoolean(i, 0)
                case StringType  => g.getString(i, 0)
                case _ => null
              }
            })
          }
        }
      }
    spark.createDataFrame(rows, projection)
  }

  /** The BLOOM skip channel — the file-pruning min/max zones cannot
    * give: point lookups on a HIGH-CARDINALITY column of a layout not
    * sorted by it (a hash-bucketed key, a UUID, a join key after
    * compaction on time) have useless zones — every file spans the whole
    * domain — but parquet's per-column-chunk bloom filters (written with
    * `parquet.bloom.filter.enabled#col`) answer "definitely absent" per
    * block. A file survives iff ANY of its row groups maybe-contains ANY
    * probed value; a chunk without a bloom is conservatively
    * maybe-present (a plain write prunes nothing, never wrongly). False
    * positives keep extra files — correct, just less skipping. The probe
    * reads footer + bloom bitsets only (never data pages), distributed
    * over executors like the zone-map builders; cost O(files · values).
    */
  def bloomPrune(spark: org.apache.spark.sql.SparkSession,
                 files: Seq[String], c: String,
                 values: Seq[Any]): Seq[String] = {
    if (values.isEmpty) return Seq.empty // nothing probed: provably empty
    val shipped = SnapIO.ship() // executor-side credentialed footer reads
    spark.sparkContext.parallelize(files,
      math.max(1, math.min(files.size, 64))).filter { path =>
      SnapIO.install(shipped.value)
      val reader = openFooter(path)
      try {
        import scala.jdk.CollectionConverters._
        reader.getFooter.getBlocks.asScala.exists { b =>
          b.getColumns.asScala.find(_.getPath.toDotString == c) match {
            case None => true // column absent: cannot prune
            case Some(ch) =>
              val bloom = reader.getBloomFilterDataReader(b).readBloomFilter(ch)
              if (bloom == null) true // no bloom written: maybe-present
              else values.exists { v =>
                val h = v match {
                  case l: Long    => bloom.hash(l)
                  case i: Int     => bloom.hash(i)
                  case d: Double  => bloom.hash(d)
                  case f: Float   => bloom.hash(f)
                  case s: String  =>
                    bloom.hash(org.apache.parquet.io.api.Binary.fromString(s))
                  case other      => bloom.hash(other.asInstanceOf[AnyRef])
                }
                bloom.findHash(h)
              }
          }
        }
      } finally reader.close()
    }.collect().toSeq
  }

  /** Compaction PLAN: assign each partition's chunks (small files /
    * row-group slices, one row each with a byte size) to target-sized
    * output files — the planning pass behind every lakehouse OPTIMIZE /
    * rewrite job, where the small-files problem is measured in millions
    * of objects at 100 TB. Chunks are packed SEQUENTIALLY in `orderCol`
    * order (preserving any clustering the table already has — a
    * first-fit-decreasing packer would destroy z-order/sort locality):
    * file group = `(running_bytes_before_chunk) div targetBytes`, so
    * every group holds ~targetBytes (the last chunk of a group may
    * overflow it — the standard tolerance, since splitting a chunk means
    * rewriting rows, which is the EXECUTE step's job, not the plan's).
    *
    * Pure window arithmetic over the chunk MANIFEST (one row per chunk,
    * never the data): one exchange on the partition key, cost
    * O(chunks) regardless of table volume — exactly what lets the plan
    * run as a cheap scheduled pass over a million-file table. Output:
    * one row per planned output file `(partCols..., file_group,
    * n_chunks, file_bytes)`.
    */
  def compactionPlan(chunks: DataFrame, partCols: Seq[String],
                     orderCol: String, bytesCol: String,
                     targetBytes: Long): DataFrame =
    compactionAssign(chunks, partCols, orderCol, bytesCol, targetBytes)
      .groupBy(partCols.map(col) :+ col("file_group"): _*)
      .agg(count(lit(1)).as("n_chunks"),
        sum(col(bytesCol)).cast("long").as("file_bytes"))

  /** The per-chunk half of [[compactionPlan]]: every manifest row with
    * its assigned `file_group` — what the EXECUTE step joins back to the
    * data to route rows into their planned output files. Same cost
    * shape: window arithmetic over the manifest, never the data.
    */
  def compactionAssign(chunks: DataFrame, partCols: Seq[String],
                       orderCol: String, bytesCol: String,
                       targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val gcols = partCols.map(col)
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(gcols: _*).orderBy(col(orderCol))
      .rowsBetween(W.unboundedPreceding, -1)
    chunks
      .withColumn("_cp_before", coalesce(sum(col(bytesCol)).over(w), lit(0L)))
      // integer `div`, not `/`: long division must stay exact in every
      // engine (Spark's `/` on longs is a double divide)
      .withColumn("file_group", expr(s"_cp_before div ${targetBytes}L"))
      .drop("_cp_before")
  }

  /** EXECUTE the compaction plan — the write half of OPTIMIZE, matching
    * [[compactionPlan]]'s planner: route every data row to its chunk's
    * planned output file and rewrite, one physical file per planned
    * group, clustering preserved.
    *
    * Shape, by construction:
    *  - the chunk→group manifest is broadcast when it fits
    *    (`maxBroadcastChunks`, measured by one cheap count over the
    *    manifest — O(chunks) rows, never data); past that it becomes a
    *    SHUFFLE join on the chunk key — a 20M-chunk manifest is GB-scale
    *    serialized, which no driver should hold per-executor-copy. The
    *    kernel is otherwise unchanged and the outputs byte-identical
    *    (spec-asserted);
    *  - ONE exchange, on `(partCols, file_group)` — `repartition` by the
    *    planned file key, so each output file is written by exactly one
    *    task (the small-files cure: a million source chunks leave as
    *    `ceil(bytes/target)` files);
    *  - `sortWithinPartitions(orderCol)` keeps rows clustered INSIDE
    *    each file — a per-file in-memory/spill sort, never a global
    *    sort (sequential packing already guarantees file-level order:
    *    group g's chunks all precede group g+1's in `orderCol`).
    *
    * Returns the written root; callers verify by reading back (see the
    * `compaction_exec` query, whose oracle replays the expected
    * per-file row statistics from the source table).
    */
  def compactionExec(data: DataFrame, partCols: Seq[String],
                     orderCol: String, bytesCol: String,
                     targetBytes: Long, chunks: DataFrame,
                     outDir: String,
                     maxBroadcastChunks: Long = 4L * 1024 * 1024): String = {
    val assign = compactionAssign(chunks, partCols, orderCol, bytesCol,
      targetBytes).select((partCols :+ orderCol :+ "file_group").map(col): _*)
    val routed =
      if (chunks.count() <= maxBroadcastChunks) broadcast(assign) else assign
    data.join(routed, partCols :+ orderCol)
      .repartition((partCols :+ "file_group").map(col): _*)
      .sortWithinPartitions(col(orderCol))
      .write.mode("overwrite")
      .partitionBy(partCols :+ "file_group": _*)
      .parquet(outDir)
    outDir
  }
}
