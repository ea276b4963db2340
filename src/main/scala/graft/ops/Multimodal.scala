package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media lives in a DataFrame as an opaque `binary` payload
  * column plus typed metadata, and every transform is either a codegen'd
  * binary expression (metadata extraction, frame sampling) or a batched
  * partition-level decode (the shape a real codec needs).
  *
  * The container has no image/audio libraries, so the *codec* is a
  * deterministic stub ([[Multimodal.FakeCodec]]) — but everything Spark-
  * level is real: schemas, binary slicing, batch iteration, partition
  * parallelism, and the map-only plan shape. Swapping in libjpeg/ffmpeg
  * is a one-object change.
  *
  * Scale notes: every operator here is map-only — at 100 TB these run at
  * scan speed with zero shuffles, and payload bytes never serialize to the
  * driver. Binary slicing (`substr` on BinaryType) and `md5` are native
  * codegen'd expressions, so frame digests stay inside whole-stage codegen.
  */
object Multimodal {

  /** Deterministic fake payload: the document's UTF-8 bytes standing in
    * for real media bytes, with a modality tag cycling by doc_id. Real
    * pipelines read payloads from parquet/avro binary columns — the
    * downstream operators are agnostic to where the bytes came from.
    */
  def withPayload(docs: DataFrame, keep: Seq[String] = Nil): DataFrame =
    docs.select(col("doc_id") +: keep.map(col) :+
      encode(col("text"), "UTF-8").as("payload") :+
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"): _*)

  /** Hex prefix of the payload digest as a bigint (metadata derivation). */
  private def digestBits(payload: org.apache.spark.sql.Column, from: Int, len: Int) =
    conv(substring(md5(payload), from, len), 16, 10).cast("long")

  /** "Decode" the media header: byte length, content digest, and fake
    * intrinsic dimensions derived deterministically from the digest (a
    * real codec parses them from the bytes; the *columns* — widths,
    * heights, digests — are what a curation pipeline filters on).
    */
  def mediaMeta(docs: DataFrame): DataFrame =
    withPayload(docs).select(
      col("doc_id"), col("modality"),
      length(col("payload")).cast("long").as("byte_len"),
      md5(col("payload")).as("digest"),
      (digestBits(col("payload"), 1, 6) % 1920L + 1L).as("width"),
      (digestBits(col("payload"), 7, 6) % 1080L + 1L).as("height"))

  /** Payload quarantine: map-only integrity gating before any decode work
    * is spent — the first stage of a multimodal ingest at 100 TB, where a
    * corrupt payload that reaches the codec fleet wastes the most expensive
    * resource. Checks, first failure wins:
    *
    *  - `empty`        zero bytes
    *  - `too_small`    below any plausible container header
    *  - `len_mismatch` declared character count exceeds the byte length
    *                   (impossible for valid UTF-8 — a truncated payload)
    *  - `embedded_nul` NUL byte inside a text-declared payload
    *  - `ok`           passes all checks
    *
    * Pure per-row projection: no shuffle, payload never leaves its
    * partition, and the cheap checks run in whole-stage codegen so the
    * quarantine gate adds ~nothing to the scan.
    */
  def quarantine(docs: DataFrame, minBytes: Int = 16): DataFrame = {
    val p = withPayload(docs, keep = Seq("n_chars"))
    val byteLen = length(col("payload")).cast("long")
    p.select(col("doc_id"), col("modality"), byteLen.as("byte_len"),
        when(byteLen === 0, "empty")
          .when(byteLen < minBytes, "too_small")
          .when(byteLen < col("n_chars"), "len_mismatch")
          .when(locate("\u0000", col("payload").cast("string")) > 0,
            "embedded_nul")
          .otherwise("ok").as("status"))
      .withColumn("usable", col("status") === "ok")
  }

  /** Frame sampling: treat the payload as fixed-`frameBytes` frames, keep
    * every `stride`-th frame, and emit each kept frame's digest. This is
    * the video-pipeline "sample 1 frame per N" shape — a map-only
    * projection over binary slices; the payload is read once and never
    * shuffled.
    */
  def frameSample(docs: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0)
    val nFrames = ceil(length(col("payload")).cast("double") / frameBytes).cast("long")
    // `/` on Columns is double division; sequence needs integral bounds
    val lastIdx = ((nFrames - 1L) / stride).cast("long")
    val frames = when(nFrames > 0,
      transform(sequence(lit(0L), lastIdx),
        j => md5(substr(col("payload"), (j * stride * frameBytes + 1L).cast("int"),
          lit(frameBytes)))))
      .otherwise(array().cast("array<string>"))
    withPayload(docs).select(
      col("doc_id"),
      nFrames.as("n_frames"),
      frames.as("frame_digests"))
  }

  // ------------------------------------------------------- batched decode

  /** What a decoder returns: intrinsic dims + raw "pixels". */
  final case class Decoded(width: Int, height: Int, pixels: Array[Byte])

  /** Codec boundary. A real deployment implements this with libjpeg /
    * libsndfile / ffmpeg bindings; everything outside this trait is
    * engine code that does not change.
    */
  trait MediaCodec extends Serializable {
    def decode(payload: Array[Byte]): Decoded
  }

  /** STUB codec — deterministic fake standing in for a native decoder
    * (media libraries are unavailable in this environment). Derives dims
    * from the byte length and "decodes" the payload to itself.
    */
  object FakeCodec extends MediaCodec {
    override def decode(payload: Array[Byte]): Decoded = {
      val w = payload.length % 61 + 4
      val h = (payload.length / 7) % 37 + 4
      Decoded(w, h, payload)
    }
  }

  /** Decode → resize-to-`side`×`side` (nearest-neighbor over the fake
    * pixel buffer) → per-thumbnail checksum feature. Runs as a batched
    * `mapPartitions`: rows are processed `batchSize` at a time, the shape
    * a vectorized/native codec wants (amortized codec init, bounded
    * per-batch memory), and the plan stays a single map stage — no
    * shuffle, no driver collection.
    */
  def decodeResize(docs: DataFrame, codec: MediaCodec, side: Int = 8,
                   batchSize: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val in: Dataset[(Long, Array[Byte])] = withPayload(docs)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
    in.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { case (id, payload) =>
          val d = codec.decode(payload)
          // nearest-neighbor resample of the fake pixel plane to side×side
          val thumb = Array.tabulate(side * side) { p =>
            if (d.pixels.isEmpty) 0.toByte
            else {
              val y = (p / side) * d.height / side
              val x = (p % side) * d.width / side
              d.pixels((y * d.width + x) % d.pixels.length)
            }
          }
          val checksum = thumb.foldLeft(0L)((a, b) => (a * 131L + (b & 0xff)) % 1000000007L)
          (id, d.width, d.height, checksum)
        }
      }
    }.toDF("doc_id", "width", "height", "thumb_checksum")
  }
}
