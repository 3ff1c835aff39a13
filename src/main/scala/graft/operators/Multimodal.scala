package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video handled as opaque `binary`
  * payloads with typed metadata, processed batch-at-a-time on executors.
  *
  * The decode step is a clearly-marked STUB (no image/audio codecs in this
  * container): [[DecodeStub.decode]] derives deterministic fake features from
  * the raw bytes. Everything around it — the schema, the binary column
  * construction, the mapPartitions batch shape, partitioning behavior, and
  * the column-expression fast paths (byte length, magic bytes, frame
  * sampling by byte-range) — is real Spark plumbing, tested in
  * MultimodalSpec and oracle-checked where portable.
  *
  * Scale notes: payloads stay on executors end-to-end (no collect); decode
  * runs per-partition so a real codec would amortize native init per batch,
  * exactly like an mapInPandas/mapInArrow UDF batch; metadata-only queries
  * (byte length, magic) never touch payload internals thanks to parquet
  * column pruning of the struct.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  case class MediaRecord(media_id: Long, modality: String, payload: Array[Byte])

  /** Decoded (stub) features — the shape a real decoder would emit. */
  case class MediaFeatures(
      media_id: Long,
      modality: String,
      bytes: Long,
      magic: String,
      width: Int,
      height: Int,
      n_frames: Int
  )

  /** Read a directory of raw media files via Spark's `binaryFile` source —
    * the real on-ramp for image/audio/video blobs (each file becomes a row
    * with path/length/content; executors read the bytes, nothing passes
    * through the driver). Modality is inferred from the file extension.
    */
  def readMediaDir(spark: SparkSession, dir: String): DataFrame = {
    val ext = lower(element_at(split(col("path"), "\\."), -1))
    spark.read
      .format("binaryFile")
      .load(dir)
      .select(
        col("path"),
        when(ext.isin("png", "jpg", "jpeg", "gif", "bmp"), "image")
          .when(ext.isin("wav", "mp3", "flac", "ogg"), "audio")
          .when(ext.isin("mp4", "avi", "mkv", "webm"), "video")
          .otherwise("binary")
          .as("modality"),
        col("length").as("bytes"),
        col("content").as("payload")
      )
  }

  /** Build a media table from the documents corpus: UTF-8 payload bytes,
    * modality assigned round-robin. Binary columns are first-class — at scale
    * this is the parquet-backed blob-lake layout.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")
      ).as("modality"),
      encode(col("text"), "UTF-8").as("payload")
    )

  /** STUB decoder: deterministic fake features derived from payload bytes.
    * A production build replaces the body with a real codec call; the
    * signature, batch iteration, and schema stay identical.
    */
  object DecodeStub {
    def decode(r: MediaRecord): MediaFeatures = {
      val n = r.payload.length.toLong
      // ??? real codec goes here; deterministic fake below
      val magic = r.payload.take(4).map(b => f"$b%02X").mkString
      MediaFeatures(
        media_id = r.media_id,
        modality = r.modality,
        bytes = n,
        magic = magic,
        width = (64 + n % 512).toInt,
        height = (64 + (n * 7) % 384).toInt,
        n_frames = if (r.modality == "video") (1 + n % 240).toInt else 1
      )
    }
  }

  /** Batch decode via mapPartitions — per-partition iterator is where a real
    * decoder would hold its native context.
    */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(DecodeStub.decode))
  }

  /** Column-expression fast path for metadata-only queries (no row-by-row
    * JVM object churn): byte length, magic bytes, stub dimensions.
    */
  def metaColumns(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("modality"),
      octet_length(col("payload")).cast("bigint").as("bytes"),
      hex(substring(col("payload"), 1, 4)).as("magic"),
      (lit(64) + pmod(octet_length(col("payload")).cast("bigint"), lit(512L)))
        .cast("int")
        .as("width"),
      (lit(64) + pmod(octet_length(col("payload")).cast("bigint") * 7, lit(384L)))
        .cast("int")
        .as("height")
    )

  /** Per-asset byte histogram + Shannon entropy over the raw payload — the
    * codec-free screen a multimodal ingest runs FIRST: near-8-bits/byte
    * entropy says already-compressed (or encrypted) media, low entropy says
    * structured/padded payloads worth recompressing, and a wrong
    * entropy-for-magic combination flags mislabeled assets. Works on the
    * opaque bytes (no decode stub involved), so it is real production
    * compute, not plumbing.
    *
    * Shape: payload → hex → fixed 2-char slices (explode bounded by byte
    * length), one (asset, byte) partial-agg, then a per-asset rollup whose
    * state is ≤ 256 rows per asset at any corpus size. Entropy is the
    * q_entropy_groups ladder: -Σ p·log2 p rounded to 4 to absorb libm ulp
    * drift (counts and distinct-byte totals stay exact BIGINTs).
    */
  def payloadByteEntropy(media: DataFrame): DataFrame = {
    val bytes = media
      .select(col("media_id"), col("modality"), hex(col("payload")).as("_hx"))
      .select(
        col("media_id"),
        col("modality"),
        // single-pass pair split (codegen'd regexp + split) instead of a
        // per-element substring lambda — the interpreted transform() was
        // O(len) copies per byte and measured 3× slower at sf0.1. The
        // trailing separator yields one "" element; filtered below, which
        // also makes an empty payload contribute zero byte rows.
        explode_outer(split(regexp_replace(col("_hx"), "(..)", "$1,"), ",")).as("_b")
      )
      .filter(col("_b").isNull || col("_b") =!= "")
    val c = bytes
      .filter(col("_b").isNotNull)
      .groupBy("media_id", "modality", "_b")
      .agg(count(lit(1)).as("cnt"))
    val t = c
      .groupBy("media_id")
      .agg(sum("cnt").cast("long").as("n_bytes"), count(lit(1)).as("n_distinct"))
    val p = col("cnt").cast("double") / col("n_bytes")
    c.join(t, "media_id")
      .groupBy(col("media_id"), col("modality"), col("n_bytes"), col("n_distinct"))
      .agg(round(-sum(p * log2(p)), 4).as("entropy"))
  }

  /** Frame sampling: fixed-stride byte-range slices of the payload (a real
    * video path would seek keyframes; the slicing/fan-out shape is the same).
    * One row per sampled frame, md5 of the slice as the stand-in frame feature.
    */
  def frameSlices(media: DataFrame, frameBytes: Int, maxFrames: Int): DataFrame = {
    val n = octet_length(col("payload"))
    val nFrames = least(
      ceil(n.cast("double") / frameBytes).cast("int"),
      lit(maxFrames)
    )
    media
      // empty payload → nFrames=0 → sequence(0,-1) would generate DESCENDING
      // (two spurious rows); guard with an explicitly empty array instead
      .withColumn(
        "frame_idx",
        explode(
          when(nFrames > 0, sequence(lit(0), nFrames - 1))
            .otherwise(array().cast("array<int>"))
        )
      )
      .select(
        col("media_id"),
        col("frame_idx"),
        md5(
          expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)")
        ).as("frame_md5")
      )
  }

  /** Resize stub: truncate payload to `maxBytes` (a real image path would
    * re-encode; the byte-budget contract is the same).
    */
  def resizeTo(media: DataFrame, maxBytes: Int): DataFrame =
    media.withColumn("payload", substring(col("payload"), 1, maxBytes))

  /** OVERLAPPING strided windows over the payload — the spectrogram/STFT
    * frame shape for audio (`hopBytes` < `windowBytes` means consecutive
    * windows share bytes, unlike [[frameSlices]]' disjoint frames). Emits
    * per-window a stand-in feature pair a real DSP kernel would replace:
    * the window's md5 and its exact integer byte-sum "energy" (ASCII
    * payloads: one codepoint = one byte, which is what lets the oracle
    * mirror it). The fan-out is a per-row `explode` of ≤ `maxWindows`
    * indices — narrow, no shuffle; payload bytes never leave the executors.
    */
  def stridedWindows(
      media: DataFrame,
      windowBytes: Int,
      hopBytes: Int,
      maxWindows: Int
  ): DataFrame = {
    require(windowBytes > 0 && hopBytes > 0, "window and hop must be positive")
    val n = octet_length(col("payload")).cast("bigint")
    val full = ((n - windowBytes) / hopBytes) + 1
    val nWin = least(
      when(n >= windowBytes, full).when(n > 0, lit(1L)).otherwise(lit(0L)),
      lit(maxWindows.toLong)
    ).cast("int")
    val win = s"substring(payload, win_idx * $hopBytes + 1, $windowBytes)"
    media
      .withColumn(
        "win_idx",
        // empty payload → zero windows: sequence(0, -1) would descend
        explode(
          when(nWin > 0, sequence(lit(0), nWin - 1))
            .otherwise(array().cast("array<int>"))
        )
      )
      .select(
        col("media_id"),
        col("win_idx"),
        md5(expr(win)).as("win_md5"),
        expr(
          s"aggregate(split(decode($win, 'UTF-8'), ''), 0L, (acc, c) -> acc + ascii(c))"
        ).as("energy")
      )
  }

  /** Shot-boundary (scene-cut) detection over the frame stand-ins: a cut is
    * a jump of ≥ `minJump` quantization levels between CONSECUTIVE frames'
    * quantized energies (q = energy div `quantum`) — the codec-free analog
    * of the histogram-difference detector real video pipelines run. Exact
    * integer arithmetic end to end (byte-sum energy, integer division,
    * integer deltas), so the oracle replays it bit-for-bit.
    *
    * Per-media census output: frame count, cut count, shot count
    * (= cuts + 1). The lag window is keyed by media id over ≤ `maxFrames`
    * rows — bounded per-key state, shuffle key = window key, embarrassingly
    * parallel across media at any corpus size.
    */
  def sceneCuts(
      media: DataFrame,
      frameBytes: Int = 256,
      maxFrames: Int = 8,
      quantum: Long = 2048L,
      minJump: Long = 2L
  ): DataFrame = {
    require(quantum > 0 && minJump > 0, "quantum and minJump must be positive")
    val frames = stridedWindows(media, frameBytes, frameBytes, maxFrames)
      // `div`, not `/`: Column./ on longs is DOUBLE division, whose
      // truncation could land one level low for a non-power-of-two quantum
      .select(col("media_id"), col("win_idx"), expr(s"energy div $quantum").as("_q"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id")
      .orderBy("win_idx")
    frames
      .withColumn("_dq", abs(col("_q") - lag(col("_q"), 1).over(w)))
      .groupBy("media_id")
      .agg(
        count(lit(1)).as("n_frames"),
        sum(when(col("_dq") >= minJump, 1L).otherwise(0L)).cast("long").as("n_cuts")
      )
      .withColumn("n_shots", col("n_cuts") + 1L)
  }
}
