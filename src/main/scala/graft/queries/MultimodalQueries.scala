package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables._
import graft.operators.{Dedup, Multimodal}

/** Multimodal-column inventory: the binary payload table derived from
  * `documents` (UTF-8 bytes as the opaque payload), metadata extraction, and
  * frame sampling. The corpus text is pure ASCII (verified), so DuckDB's
  * string functions mirror Spark's binary functions byte-for-byte — the
  * oracle checks real binary-column plumbing, not a string shortcut.
  */
object MultimodalQueries {

  private val modalitySql =
    "(['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1]"

  /** Twin of MediaCodecs.dhash64 over the 8×h PPM rasters synthesized from
    * the ASCII text bytes: `row` maps the grid row index expression (bits
    * use rows i and i+1) to a SOURCE pixel row, so the same generator
    * renders the original (identity sampling at height h) and its factor-2
    * vertical resize (source row 2·y at height h//2). Cell gray = channel
    * sum of the 3 payload bytes at ((row·8 + k%8)·3 …) — byte-exact ord()
    * on the ASCII corpus.
    */
  private def dhashSqlWith(row: String => String): String = {
    def gray(r: String) =
      s"""(ord(substr(text, CAST((($r) * 8 + (k % 8)) * 3 + 1 AS INT), 1))
         | + ord(substr(text, CAST((($r) * 8 + (k % 8)) * 3 + 2 AS INT), 1))
         | + ord(substr(text, CAST((($r) * 8 + (k % 8)) * 3 + 3 AS INT), 1)))"""
        .stripMargin.replaceAll("\\s+", " ")
    s"""array_to_string(list_transform(range(0, 64), k ->
       |  CASE WHEN ${gray(row("(k // 8)"))} < ${gray(row("((k // 8) + 1)"))}
       |       THEN '1' ELSE '0' END), '')"""
      .stripMargin.replaceAll("\\s+", " ")
  }

  val entries: Seq[QEntry] = Seq(
    // Metadata-only pass over the media table: byte length + magic bytes
    // straight off the binary column. Payload bytes never leave the executors.
    QEntry.sql(
      "mm_binary_meta",
      s"""SELECT doc_id AS media_id, $modalitySql AS modality,
         |  octet_length(encode(text)) AS bytes,
         |  hex(substr(text, 1, 4)) AS magic
         |FROM documents""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) => Multimodal.metaColumns(Multimodal.fromDocuments(documents(s, d))) },

    // REAL decode: documents wrapped in genuine containers (PPM P6 for
    // image docs; 16-bit/16 kHz PCM WAV for audio docs; 8-bit/8 kHz PCM WAV
    // with an extra LIST/INFO chunk for video docs), then parsed back by
    // the chunk-walking RIFF decoder / PPM header parser. The twin computes
    // the identical container sizes and exact integer amplitude stats
    // directly from the source bytes — byte-level proof the codec decodes
    // what the encoder wrote. ASCII corpus ⇒ ord(char) = payload byte.
    QEntry.sql(
      "mm_decode_stats",
      """WITH t AS (SELECT doc_id, text, strlen(text) AS len,
        |    CAST(doc_id % 3 AS INT) AS m FROM documents),
        |a AS (SELECT doc_id, len, m,
        |    list_transform(
        |      range(1, CASE WHEN m = 0 THEN (len // 24) * 24 ELSE len END + 1),
        |      i -> ord(substr(text, CAST(i AS INT), 1))) AS bs
        |  FROM t)
        |SELECT doc_id AS media_id,
        |  CASE WHEN m = 0 THEN 'ppm' ELSE 'wav' END AS fmt,
        |  CAST(CASE WHEN m = 0
        |         THEN 10 + strlen(CAST(len // 24 AS VARCHAR)) + (len // 24) * 24
        |       WHEN m = 1 THEN 44 + 2 * len
        |       ELSE 70 + len + len % 2 END AS BIGINT) AS bytes,
        |  CAST(CASE WHEN m = 0 THEN 8 ELSE 0 END AS INT) AS width,
        |  CAST(CASE WHEN m = 0 THEN len // 24 ELSE 0 END AS INT) AS height,
        |  CAST(CASE WHEN m = 0 THEN 3 ELSE 1 END AS INT) AS channels,
        |  CAST(CASE WHEN m = 0 THEN 0 WHEN m = 1 THEN 16000 ELSE 8000 END AS INT)
        |    AS sample_rate,
        |  CAST(CASE WHEN m = 1 THEN 16 ELSE 8 END AS INT) AS bits,
        |  CAST(CASE WHEN m = 0 THEN (len // 24) * 24 ELSE len END AS BIGINT)
        |    AS n_samples,
        |  CAST(CASE WHEN m = 1 THEN (list_min(bs) - 128) * 256
        |       ELSE list_min(bs) END AS INT) AS amp_min,
        |  CAST(CASE WHEN m = 1 THEN (list_max(bs) - 128) * 256
        |       ELSE list_max(bs) END AS INT) AS amp_max,
        |  CAST(CASE WHEN m = 1 THEN (list_sum(bs) - 128 * len) * 256
        |       ELSE list_sum(bs) END AS BIGINT) AS amp_sum
        |FROM a""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Multimodal.decodeFeatures(Multimodal.synthesizeMedia(documents(s, d))).toDF()
    },

    // E432 audio QC report ([[Multimodal.audioQcReport]]): mean-crossing
    // rate, stuck-sample share, and 8-frame energy dynamics over the
    // DECODED PCM of every WAV asset — division-free integer centering
    // (t = n·s − Σs) makes the stats exact and depth-agnostic. The twin
    // recomputes every sample from the synthesis contract (text bytes →
    // 16-bit scaled / 8-bit raw PCM) and replays centering, sign-only
    // crossing detection, the frame split and both ppm divisions.
    QEntry.sql(
      "mm_audio_qc",
      """WITH t0 AS (SELECT doc_id, text, strlen(text) AS len,
        |    CAST(doc_id % 3 AS INT) AS m FROM documents),
        |a AS (SELECT doc_id, len, m,
        |    list_transform(range(1, len + 1),
        |      i -> ord(substr(text, CAST(i AS INT), 1))) AS bs
        |  FROM t0 WHERE m >= 1 AND len >= 1),
        |s AS (SELECT doc_id, CAST(len AS BIGINT) AS n,
        |    CASE WHEN m = 1
        |      THEN list_transform(bs, b -> CAST((b - 128) * 256 AS BIGINT))
        |      ELSE list_transform(bs, b -> CAST(b AS BIGINT)) END AS ss
        |  FROM a),
        |st AS (SELECT doc_id, n, ss, CAST(list_sum(ss) AS BIGINT) AS sm FROM s),
        |tt AS (SELECT doc_id, n, ss, list_transform(ss, x -> n * x - sm) AS ts
        |  FROM st),
        |f AS (SELECT doc_id, n,
        |    COALESCE(CAST(list_sum(list_transform(range(1, CAST(n AS INT)),
        |      i -> CASE WHEN (ts[i] > 0 AND ts[i+1] < 0)
        |             OR (ts[i] < 0 AND ts[i+1] > 0) THEN 1 ELSE 0 END))
        |      AS BIGINT), 0) AS crossings,
        |    COALESCE(CAST(list_sum(list_transform(range(1, CAST(n AS INT)),
        |      i -> CASE WHEN ss[i+1] = ss[i] THEN 1 ELSE 0 END)) AS BIGINT), 0)
        |      AS repeats,
        |    list_transform(range(0, 8), k -> COALESCE(CAST(list_sum(
        |      list_transform(range(1, CAST(n AS INT) + 1),
        |        i -> CASE WHEN ((i - 1) * 8) // n = k THEN abs(ts[i])
        |             ELSE 0 END)) AS BIGINT), 0)) AS fe
        |  FROM tt)
        |SELECT doc_id AS media_id, n AS n_samples, crossings AS mean_crossings,
        |  CASE WHEN n >= 2 THEN repeats * 1000000 // (n - 1) ELSE 0 END
        |    AS repeat_ppm,
        |  CAST(list_max(fe) AS BIGINT) AS max_frame_energy,
        |  CAST(list_min(fe) AS BIGINT) AS min_frame_energy,
        |  CASE WHEN list_max(fe) > 0
        |    THEN CAST(list_min(fe) AS BIGINT) * 1000000
        |      // CAST(list_max(fe) AS BIGINT)
        |    ELSE 1000000 END AS dyn_ppm
        |FROM f""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Multimodal.audioQcReport(Multimodal.synthesizeMedia(documents(s, d)))
    },

    // E416 ISO-BMFF (MP4) box walk ([[Multimodal.mp4BoxMeta]]): genuine
    // big-endian MP4 containers synthesized per doc (ftyp + moov(mvhd +
    // trak(tkhd)) + a free box the walker must skip + mdat = text bytes),
    // parsed back by the recursive box walker in the same executor pass —
    // the third real container format next to RIFF/WAVE and PPM. The twin
    // recomputes every extracted field from the source text length (the
    // synthesis contract), so a walker that misread a size, failed to
    // descend into moov/trak, or miscounted a skipped box hash-mismatches.
    QEntry.sql(
      "mm_mp4_meta",
      """SELECT doc_id AS media_id, 'isom' AS major_brand,
        |  CAST(1000 AS INT) AS timescale,
        |  CAST(strlen(text) AS INT) AS duration,
        |  CAST(320 AS INT) AS width,
        |  CAST(strlen(text) % 480 + 16 AS INT) AS height,
        |  CAST(7 AS INT) AS n_boxes,
        |  CAST(strlen(text) AS BIGINT) AS mdat_bytes,
        |  CAST(264 + strlen(text) AS BIGINT) AS total_bytes
        |FROM documents""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) => Multimodal.mp4BoxMeta(documents(s, d)).toDF() },

    // Codec-free payload screen: per-asset byte histogram + Shannon entropy
    // over the raw bytes (compressed/encrypted ≈ 8 bits/byte; structured
    // payloads much lower; entropy⊥magic mismatches flag mislabeled
    // assets). Bounded per-asset state (≤ 256 byte values); the twin
    // replays the hex slicing byte-for-byte.
    QEntry.sql(
      "mm_byte_entropy",
      s"""WITH hx AS (SELECT doc_id AS media_id, $modalitySql AS modality,
         |    hex(encode(text)) AS h FROM documents),
         |b AS (SELECT media_id, modality,
         |    unnest(list_transform(range(1, length(h) // 2 + 1),
         |      i -> substr(h, CAST(2 * i - 1 AS INT), 2))) AS byte
         |  FROM hx WHERE length(h) >= 2),
         |c AS (SELECT media_id, modality, byte, count(*) AS cnt
         |  FROM b GROUP BY media_id, modality, byte),
         |t AS (SELECT media_id, CAST(sum(cnt) AS BIGINT) AS n_bytes,
         |    count(*) AS n_distinct FROM c GROUP BY media_id)
         |SELECT c.media_id, c.modality, t.n_bytes, t.n_distinct,
         |  round(-sum((CAST(cnt AS DOUBLE) / n_bytes)
         |    * log2(CAST(cnt AS DOUBLE) / n_bytes)), 4) AS entropy
         |FROM c JOIN t ON c.media_id = t.media_id
         |GROUP BY c.media_id, c.modality, t.n_bytes, t.n_distinct"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Multimodal.payloadByteEntropy(Multimodal.fromDocuments(documents(s, d)))
    },

    // Frame sampling: fixed-stride 256-byte slices, ≤4 frames per payload,
    // md5 of each slice as the stand-in frame feature.
    QEntry.sql(
      "mm_frame_hashes",
      """SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
        |  md5(substr(text, CAST(frame_idx * 256 + 1 AS INT), 256)) AS frame_md5
        |FROM (
        |  SELECT doc_id AS media_id, text,
        |    unnest(range(0, CAST(least(ceil(octet_length(encode(text)) / 256.0), 4) AS BIGINT))) AS frame_idx
        |  FROM documents) t""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Multimodal.frameSlices(Multimodal.fromDocuments(documents(s, d)), 256, 4)
    },

    // Cross-media duplicate-frame detection: the sampled frames of
    // mm_frame_hashes, grouped by content hash across the whole corpus —
    // the "same intro/credits in every video" dedup a multimodal
    // pipeline runs before feature extraction. One hash-keyed partial
    // agg over the frame table (payload bytes never leave executors;
    // only 32-char digests shuffle); duplicate mass = Σ(count−1), all
    // exact BIGINTs in a single summary row.
    QEntry.sql(
      "mm_frame_dedup",
      """WITH fr AS (SELECT
        |    md5(substr(text, CAST(frame_idx * 256 + 1 AS INT), 256)) AS h
        |  FROM (SELECT text,
        |      unnest(range(0, CAST(least(ceil(octet_length(encode(text)) / 256.0), 4)
        |        AS BIGINT))) AS frame_idx
        |    FROM documents) t),
        |g AS (SELECT h, CAST(count(*) AS BIGINT) AS c FROM fr GROUP BY h)
        |SELECT CAST(sum(c) AS BIGINT) AS n_frames,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
        |  CAST(sum(c - 1) AS BIGINT) AS dup_frames
        |FROM g"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val g = Multimodal
        .frameSlices(Multimodal.fromDocuments(documents(s, d)), 256, 4)
        .groupBy("frame_md5")
        .agg(count(lit(1)).as("c"))
      g.agg(
        sum("c").cast("long").as("n_frames"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("c") >= 2, 1L).otherwise(0L)).cast("long").as("n_dup_groups"),
        sum(col("c") - 1).cast("long").as("dup_frames")
      )
    },

    // E258 perceptual image near-dup (dHash): every synthesized PPM image
    // plus its factor-2 nearest-neighbor vertical resize (re-ingested under
    // a shifted id — the planted re-encoded-duplicate scenario), hashed with
    // the 64-bit difference hash over DECODED pixels and paired through the
    // banded-Hamming kernel (Dedup.hammingBandPairs, the SimHash machinery
    // reused on image sketches). Relative-position grid sampling makes a
    // resize land at small-but-nonzero Hamming distance — caught here,
    // structurally missed by the exact digests of mm_frame_dedup. The twin
    // replays the decode → sample-grid → gradient → band → verify chain
    // byte-for-byte from the source text.
    QEntry.sql(
      "mm_dhash_pairs", {
        val dhOrig = dhashSqlWith(i => s"(($i * h) // 9)")
        val dhResz = dhashSqlWith(i => s"(2 * (($i * (h // 2)) // 9))")
        val ham =
          """CAST(list_sum(list_transform(range(1, 65), i ->
            |  CASE WHEN substr(x.dh, CAST(i AS INT), 1) != substr(y.dh, CAST(i AS INT), 1)
            |       THEN 1 ELSE 0 END)) AS BIGINT)""".stripMargin.replaceAll("\\s+", " ")
        s"""WITH t AS (SELECT doc_id, text, strlen(text) // 24 AS h
           |           FROM documents WHERE doc_id % 3 = 0),
           |o AS (SELECT doc_id AS media_id, $dhOrig AS dh FROM t WHERE h >= 9),
           |r AS (SELECT doc_id + 1000000 AS media_id, $dhResz AS dh
           |      FROM t WHERE h // 2 >= 9),
           |a AS (SELECT * FROM o UNION ALL SELECT * FROM r),
           |bb AS (SELECT media_id, dh, bidx,
           |         substr(dh, CAST(bidx * 16 + 1 AS INT), 16) AS bv
           |       FROM (SELECT media_id, dh, unnest(range(0, 4)) AS bidx FROM a) z)
           |SELECT DISTINCT id1, id2, hamming FROM (
           |  SELECT x.media_id AS id1, y.media_id AS id2, $ham AS hamming
           |  FROM bb x JOIN bb y
           |    ON x.bidx = y.bidx AND x.bv = y.bv AND x.media_id < y.media_id) p
           |WHERE hamming <= 6""".stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      import s.implicits._
      val images = Multimodal
        .synthesizeMedia(documents(s, d))
        .filter((r: Multimodal.MediaRecord) => r.modality == "image")
      val resized = Multimodal
        .resizeVertical(images, 2)
        .map(r => r.copy(media_id = r.media_id + 1000000L))
      Dedup.hammingBandPairs(
        Multimodal.imageDHashes(images.union(resized)),
        "media_id",
        "dhash",
        maxHamming = 6
      )
    },

    // E261 INCREMENTAL perceptual dedup — E257's persisted-index shape
    // composed with E258's image hashing: the corpus's dHashes persist once
    // (band-integer parquet index; decode+hash is per-asset-ever work), and
    // a new batch — the grid-ALIGNED images (h ≡ 0 mod 18: a factor-2
    // resize samples exactly the original's source rows, so each planted
    // copy pairs at Hamming 0) re-ingested as factor-2 resizes under
    // shifted ids — pairs against the on-disk bands without re-decoding
    // any corpus payload. The twin replays hash → band → join → Hamming
    // over corpus ∪ batch restricted to batch-touching pairs.
    QEntry.sql(
      "mm_dhash_incremental", {
        val dhOrig = dhashSqlWith(i => s"(($i * h) // 9)")
        val dhResz = dhashSqlWith(i => s"(2 * (($i * (h // 2)) // 9))")
        val ham =
          """CAST(list_sum(list_transform(range(1, 65), i ->
            |  CASE WHEN substr(x.dh, CAST(i AS INT), 1) != substr(y.dh, CAST(i AS INT), 1)
            |       THEN 1 ELSE 0 END)) AS BIGINT)""".stripMargin.replaceAll("\\s+", " ")
        s"""WITH t AS (SELECT doc_id, text, strlen(text) // 24 AS h
           |           FROM documents WHERE doc_id % 3 = 0),
           |o AS (SELECT doc_id AS media_id, $dhOrig AS dh FROM t WHERE h >= 9),
           |r AS (SELECT doc_id + 1000000 AS media_id, $dhResz AS dh
           |      FROM t WHERE h % 18 = 0 AND h >= 18),
           |a AS (SELECT * FROM o UNION ALL SELECT * FROM r),
           |ab AS (SELECT media_id, dh, bidx,
           |         substr(dh, CAST(bidx * 16 + 1 AS INT), 16) AS bv
           |       FROM (SELECT media_id, dh, unnest(range(0, 4)) AS bidx FROM a) z),
           |rb AS (SELECT media_id, dh, bidx,
           |         substr(dh, CAST(bidx * 16 + 1 AS INT), 16) AS bv
           |       FROM (SELECT media_id, dh, unnest(range(0, 4)) AS bidx FROM r) z)
           |SELECT DISTINCT least(id1r, id2r) AS id1, greatest(id1r, id2r) AS id2, hamming
           |FROM (
           |  SELECT x.media_id AS id1r, y.media_id AS id2r, $ham AS hamming
           |  FROM rb x JOIN ab y
           |    ON x.bidx = y.bidx AND x.bv = y.bv AND x.media_id != y.media_id) p
           |WHERE hamming <= 6""".stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      import s.implicits._
      val images = Multimodal
        .synthesizeMedia(documents(s, d))
        .filter((r: Multimodal.MediaRecord) => r.modality == "image")
      val dir = java.nio.file.Files
        .createTempDirectory("graft-dhidx").resolve("idx").toString
      Dedup.buildHammingIndex(Multimodal.imageDHashes(images), "media_id", "dhash", dir)
      val aligned = images.filter { (r: Multimodal.MediaRecord) =>
        val (_, h, _) = Multimodal.MediaCodecs.ppmHeader(r.media_id, r.payload)
        h % 18 == 0 && h >= 18
      }
      val batch = Multimodal
        .resizeVertical(aligned, 2)
        .map(r => r.copy(media_id = r.media_id + 1000000L))
      Dedup.incrementalHammingPairs(
        Multimodal.imageDHashes(batch), "media_id", "dhash", dir, maxHamming = 6)
    },

    // E264 perceptual cluster resolution: the mm_dhash_pairs universe
    // (corpus images ∪ their factor-2 resizes) through connected components
    // to one canonical cluster per asset — near-dup relations CHAIN (the
    // original pairs with its resize, the resize with its own re-encode),
    // so a keep-policy needs components, not pairs. Same iterative
    // min-label propagation as dedup_clusters; the twin computes the same
    // fixpoint as a recursive transitive-closure CTE over the banded-
    // Hamming edges.
    QEntry.sql(
      "mm_dhash_clusters", {
        val dhOrig = dhashSqlWith(i => s"(($i * h) // 9)")
        val dhResz = dhashSqlWith(i => s"(2 * (($i * (h // 2)) // 9))")
        val ham =
          """CAST(list_sum(list_transform(range(1, 65), i ->
            |  CASE WHEN substr(x.dh, CAST(i AS INT), 1) != substr(y.dh, CAST(i AS INT), 1)
            |       THEN 1 ELSE 0 END)) AS BIGINT)""".stripMargin.replaceAll("\\s+", " ")
        s"""WITH RECURSIVE t AS (SELECT doc_id, text, strlen(text) // 24 AS h
           |           FROM documents WHERE doc_id % 3 = 0),
           |o AS (SELECT doc_id AS media_id, $dhOrig AS dh FROM t WHERE h >= 9),
           |r AS (SELECT doc_id + 1000000 AS media_id, $dhResz AS dh
           |      FROM t WHERE h // 2 >= 9),
           |a AS (SELECT * FROM o UNION ALL SELECT * FROM r),
           |bb AS (SELECT media_id, dh, bidx,
           |         substr(dh, CAST(bidx * 16 + 1 AS INT), 16) AS bv
           |       FROM (SELECT media_id, dh, unnest(range(0, 4)) AS bidx FROM a) z),
           |pairs AS (SELECT DISTINCT id1, id2 FROM (
           |  SELECT x.media_id AS id1, y.media_id AS id2, $ham AS hamming
           |  FROM bb x JOIN bb y
           |    ON x.bidx = y.bidx AND x.bv = y.bv AND x.media_id < y.media_id) p
           |  WHERE hamming <= 6),
           |edges AS (SELECT id1 AS s2, id2 AS d2 FROM pairs
           |          UNION ALL SELECT id2, id1 FROM pairs),
           |cc(id, comp) AS (
           |  SELECT media_id, media_id FROM a
           |  UNION
           |  SELECT e.s2, c.comp FROM edges e JOIN cc c ON e.d2 = c.id)
           |SELECT id AS media_id, min(comp) AS cluster_id,
           |       count(*) OVER (PARTITION BY min(comp)) AS cluster_size
           |FROM cc GROUP BY id""".stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      import s.implicits._
      val images = Multimodal
        .synthesizeMedia(documents(s, d))
        .filter((r: Multimodal.MediaRecord) => r.modality == "image")
      val resized = Multimodal
        .resizeVertical(images, 2)
        .map(r => r.copy(media_id = r.media_id + 1000000L))
      Dedup.hammingClusters(
        Multimodal.imageDHashes(images.union(resized)), "media_id", "dhash", maxHamming = 6)
    },

    // E278 incremental PERCEPTUAL cluster maintenance — E273's contraction
    // engine composed with the Hamming sketch index: the corpus (images ∪
    // their resizes — real multi-member perceptual clusters) is clustered
    // once and persisted; a new ingest of grid-aligned re-resizes (fresh
    // +2M ids) is folded in by pairing against the on-disk bands and
    // contracting to cluster labels — per-ingest decode+hash work O(batch),
    // the corpus never re-hashed or re-clustered. The twin recomputes the
    // monolithic cluster fixpoint over all three generations, so the hash
    // match proves the incremental path lands every batch asset in its
    // family's canonical cluster (min id = the original image).
    QEntry.sql(
      "mm_dhash_inc_clusters", {
        val dhOrig = dhashSqlWith(i => s"(($i * h) // 9)")
        val dhResz = dhashSqlWith(i => s"(2 * (($i * (h // 2)) // 9))")
        val ham =
          """CAST(list_sum(list_transform(range(1, 65), i ->
            |  CASE WHEN substr(x.dh, CAST(i AS INT), 1) != substr(y.dh, CAST(i AS INT), 1)
            |       THEN 1 ELSE 0 END)) AS BIGINT)""".stripMargin.replaceAll("\\s+", " ")
        s"""WITH RECURSIVE t AS (SELECT doc_id, text, strlen(text) // 24 AS h
           |           FROM documents WHERE doc_id % 3 = 0),
           |o AS (SELECT doc_id AS media_id, $dhOrig AS dh FROM t WHERE h >= 9),
           |r AS (SELECT doc_id + 1000000 AS media_id, $dhResz AS dh
           |      FROM t WHERE h // 2 >= 9),
           |r2 AS (SELECT doc_id + 2000000 AS media_id, $dhResz AS dh
           |      FROM t WHERE h % 18 = 0 AND h >= 18),
           |a AS (SELECT * FROM o UNION ALL SELECT * FROM r UNION ALL SELECT * FROM r2),
           |bb AS (SELECT media_id, dh, bidx,
           |         substr(dh, CAST(bidx * 16 + 1 AS INT), 16) AS bv
           |       FROM (SELECT media_id, dh, unnest(range(0, 4)) AS bidx FROM a) z),
           |pairs AS (SELECT DISTINCT id1, id2 FROM (
           |  SELECT x.media_id AS id1, y.media_id AS id2, $ham AS hamming
           |  FROM bb x JOIN bb y
           |    ON x.bidx = y.bidx AND x.bv = y.bv AND x.media_id < y.media_id) p
           |  WHERE hamming <= 6),
           |edges AS (SELECT id1 AS s2, id2 AS d2 FROM pairs
           |          UNION ALL SELECT id2, id1 FROM pairs),
           |cc(id, comp) AS (
           |  SELECT media_id, media_id FROM a
           |  UNION
           |  SELECT e.s2, c.comp FROM edges e JOIN cc c ON e.d2 = c.id)
           |SELECT id AS media_id, min(comp) AS cluster_id,
           |       count(*) OVER (PARTITION BY min(comp)) AS cluster_size
           |FROM cc GROUP BY id""".stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      import s.implicits._
      val images = Multimodal
        .synthesizeMedia(documents(s, d))
        .filter((r: Multimodal.MediaRecord) => r.modality == "image")
      val resized = Multimodal
        .resizeVertical(images, 2)
        .map(r => r.copy(media_id = r.media_id + 1000000L))
      val corpus = Multimodal.imageDHashes(images.union(resized))
      val dir = java.nio.file.Files
        .createTempDirectory("graft-dhclu").toString
      Dedup.buildHammingIndex(corpus, "media_id", "dhash", s"$dir/idx")
      Dedup.writeClusterState(
        Dedup.hammingClusters(corpus, "media_id", "dhash", maxHamming = 6),
        "media_id", "cluster_id", s"$dir/state")
      val aligned = images.filter { (r: Multimodal.MediaRecord) =>
        val (_, h, _) = Multimodal.MediaCodecs.ppmHeader(r.media_id, r.payload)
        h % 18 == 0 && h >= 18
      }
      val batch = Multimodal
        .resizeVertical(aligned, 2)
        .map(r => r.copy(media_id = r.media_id + 2000000L))
      Dedup
        .incrementalHammingClusters(
          Multimodal.imageDHashes(batch), "media_id", "dhash",
          s"$dir/idx", s"$dir/state", maxHamming = 6)
        .select(col("id").as("media_id"), col("cluster_id"))
        .withColumn(
          "cluster_size",
          count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("cluster_id")))
        )
    },

    // E287 perceptual forget-repair: every second ORIGINAL (media_id % 6 =
    // 0 — the min-id member of its {original, resize} cluster) is deleted
    // from the Hamming sketch index (IndexMaintenance.deleteRows) and the
    // persisted cluster state is repaired from the POST-deletion band
    // integers — orphaned resizes relabel to themselves, untouched
    // clusters pass through. The twin recomputes the cluster fixpoint
    // monolithically over the post-deletion universe, so the hash match is
    // the perceptual-family repair ≡ full-recompute proof (the split case
    // is pinned on synthetic sketches in PipelineOpsSpec).
    QEntry.sql(
      "mm_dhash_forget_repair", {
        val dhOrig = dhashSqlWith(i => s"(($i * h) // 9)")
        val dhResz = dhashSqlWith(i => s"(2 * (($i * (h // 2)) // 9))")
        val ham =
          """CAST(list_sum(list_transform(range(1, 65), i ->
            |  CASE WHEN substr(x.dh, CAST(i AS INT), 1) != substr(y.dh, CAST(i AS INT), 1)
            |       THEN 1 ELSE 0 END)) AS BIGINT)""".stripMargin.replaceAll("\\s+", " ")
        s"""WITH RECURSIVE t AS (SELECT doc_id, text, strlen(text) // 24 AS h
           |           FROM documents WHERE doc_id % 3 = 0),
           |o AS (SELECT doc_id AS media_id, $dhOrig AS dh FROM t
           |      WHERE h >= 9 AND doc_id % 6 != 0),
           |r AS (SELECT doc_id + 1000000 AS media_id, $dhResz AS dh
           |      FROM t WHERE h // 2 >= 9),
           |a AS (SELECT * FROM o UNION ALL SELECT * FROM r),
           |bb AS (SELECT media_id, dh, bidx,
           |         substr(dh, CAST(bidx * 16 + 1 AS INT), 16) AS bv
           |       FROM (SELECT media_id, dh, unnest(range(0, 4)) AS bidx FROM a) z),
           |pairs AS (SELECT DISTINCT id1, id2 FROM (
           |  SELECT x.media_id AS id1, y.media_id AS id2, $ham AS hamming
           |  FROM bb x JOIN bb y
           |    ON x.bidx = y.bidx AND x.bv = y.bv AND x.media_id < y.media_id) p
           |  WHERE hamming <= 6),
           |edges AS (SELECT id1 AS s2, id2 AS d2 FROM pairs
           |          UNION ALL SELECT id2, id1 FROM pairs),
           |cc(id, comp) AS (
           |  SELECT media_id, media_id FROM a
           |  UNION
           |  SELECT e.s2, c.comp FROM edges e JOIN cc c ON e.d2 = c.id)
           |SELECT id AS media_id, min(comp) AS cluster_id,
           |       count(*) OVER (PARTITION BY min(comp)) AS cluster_size
           |FROM cc GROUP BY id""".stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      import s.implicits._
      val images = Multimodal
        .synthesizeMedia(documents(s, d))
        .filter((r: Multimodal.MediaRecord) => r.modality == "image")
      val resized = Multimodal
        .resizeVertical(images, 2)
        .map(r => r.copy(media_id = r.media_id + 1000000L))
      val corpus = Multimodal.imageDHashes(images.union(resized))
      val dir = java.nio.file.Files
        .createTempDirectory("graft-dhrep").toString
      Dedup.buildHammingIndex(corpus, "media_id", "dhash", s"$dir/idx")
      Dedup.writeClusterState(
        Dedup.hammingClusters(corpus, "media_id", "dhash", maxHamming = 6),
        "media_id", "cluster_id", s"$dir/state")
      val deleted = images
        .filter((r: Multimodal.MediaRecord) => r.media_id % 6 == 0)
        .map((r: Multimodal.MediaRecord) => r.media_id)
        .toDF("id")
      graft.operators.IndexMaintenance.deleteRows(s, deleted, s"$dir/idx", "id", Seq("band_pfx"))
      Dedup
        .repairHammingClusterState(s, deleted, s"$dir/idx", s"$dir/state", maxHamming = 6)
        .select(col("id").as("media_id"), col("cluster_id"))
        .withColumn(
          "cluster_size",
          count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("cluster_id")))
        )
    },

    // E266 media keep-policy: per perceptual cluster keep the HIGHEST-
    // RESOLUTION member (tallest decoded raster; ties to min id) — the
    // media analog of dedup_keep_policy's quality rule, and the decision
    // min-id alone gets exactly backwards here (the resized re-encode has
    // the smaller id space in a typical ingest, but the ORIGINAL is the
    // asset worth keeping). One row per cluster with the kept asset, its
    // height, and the cluster size; heights come off the decoded headers
    // executor-side, the twin derives them as h / h//2 per branch.
    QEntry.sql(
      "mm_keep_best_res", {
        val dhOrig = dhashSqlWith(i => s"(($i * h) // 9)")
        val dhResz = dhashSqlWith(i => s"(2 * (($i * (h // 2)) // 9))")
        val ham =
          """CAST(list_sum(list_transform(range(1, 65), i ->
            |  CASE WHEN substr(x.dh, CAST(i AS INT), 1) != substr(y.dh, CAST(i AS INT), 1)
            |       THEN 1 ELSE 0 END)) AS BIGINT)""".stripMargin.replaceAll("\\s+", " ")
        s"""WITH RECURSIVE t AS (SELECT doc_id, text, strlen(text) // 24 AS h
           |           FROM documents WHERE doc_id % 3 = 0),
           |o AS (SELECT doc_id AS media_id, CAST(h AS BIGINT) AS height, $dhOrig AS dh
           |      FROM t WHERE h >= 9),
           |r AS (SELECT doc_id + 1000000 AS media_id, CAST(h // 2 AS BIGINT) AS height,
           |        $dhResz AS dh
           |      FROM t WHERE h // 2 >= 9),
           |a AS (SELECT * FROM o UNION ALL SELECT * FROM r),
           |bb AS (SELECT media_id, dh, bidx,
           |         substr(dh, CAST(bidx * 16 + 1 AS INT), 16) AS bv
           |       FROM (SELECT media_id, dh, unnest(range(0, 4)) AS bidx FROM a) z),
           |pairs AS (SELECT DISTINCT id1, id2 FROM (
           |  SELECT x.media_id AS id1, y.media_id AS id2, $ham AS hamming
           |  FROM bb x JOIN bb y
           |    ON x.bidx = y.bidx AND x.bv = y.bv AND x.media_id < y.media_id) p
           |  WHERE hamming <= 6),
           |edges AS (SELECT id1 AS s2, id2 AS d2 FROM pairs
           |          UNION ALL SELECT id2, id1 FROM pairs),
           |cc(id, comp) AS (
           |  SELECT media_id, media_id FROM a
           |  UNION
           |  SELECT e.s2, c.comp FROM edges e JOIN cc c ON e.d2 = c.id)
           |SELECT cluster_id, media_id AS keep_id, height AS keep_height, cluster_size
           |FROM (
           |  SELECT cl.cluster_id, a.media_id, a.height,
           |    count(*) OVER (PARTITION BY cl.cluster_id) AS cluster_size,
           |    row_number() OVER (PARTITION BY cl.cluster_id
           |      ORDER BY a.height DESC, a.media_id) AS rn
           |  FROM (SELECT id, min(comp) AS cluster_id FROM cc GROUP BY id) cl
           |  JOIN a ON a.media_id = cl.id) w
           |WHERE rn = 1""".stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      import s.implicits._
      val images = Multimodal
        .synthesizeMedia(documents(s, d))
        .filter((r: Multimodal.MediaRecord) => r.modality == "image")
      val resized = Multimodal
        .resizeVertical(images, 2)
        .map(r => r.copy(media_id = r.media_id + 1000000L))
      val all = images.union(resized)
      val clusters = Dedup.hammingClusters(
        Multimodal.imageDHashes(all), "media_id", "dhash", maxHamming = 6)
      val heights = all
        .flatMap { r =>
          val b = r.payload
          if (b.length >= 2 && b(0) == 'P' && b(1) == '6') {
            val (_, h, _) = Multimodal.MediaCodecs.ppmHeader(r.media_id, b)
            if (h >= 9) Some((r.media_id, h.toLong)) else None
          } else None
        }
        .toDF("media_id", "height")
      clusters
        .join(heights, "media_id")
        .groupBy(col("cluster_id"))
        .agg(
          min(struct((-col("height")).as("nh"), col("media_id").as("mid"))).as("b"),
          count(lit(1)).as("cluster_size")
        )
        .select(
          col("cluster_id"),
          col("b.mid").as("keep_id"),
          (-col("b.nh")).cast("long").as("keep_height"),
          col("cluster_size")
        )
    },

    // E260 perceptual AUDIO near-dup (energy-gradient hash): every
    // synthesized 16-bit PCM WAV plus its POLARITY-INVERTED re-encode
    // (sample v → −v, re-ingested under a shifted id — every payload byte
    // changes, |sample| does not), hashed with the 64-bit frame-energy
    // gradient over DECODED samples and paired through the banded-Hamming
    // kernel — the audio sibling of mm_dhash_pairs. Comparing frame
    // energies (never thresholding) makes the hash exactly invariant to
    // polarity/uniform-gain re-encodes, so every planted copy pairs at
    // Hamming 0 while its exact digest diverges. The twin replays
    // decode → frame → energy → gradient → band → verify from the source
    // bytes; its inverted branch reuses the original energy expression
    // BECAUSE |−v| = |v| — the identity under test. (|ord−128| vs the
    // engine's |(ord−128)·256|: a positive scale factor on both sides of
    // every comparison, so bits agree exactly.)
    QEntry.sql(
      "mm_aphash_pairs", {
        def esSql(nExpr: String, pos: String => String) =
          s"""list_transform(range(0, 65), i ->
             |  list_sum(list_transform(
             |    range((i * ($nExpr)) // 65 + 1, ((i + 1) * ($nExpr)) // 65 + 1),
             |    j -> abs(ord(substr(text, CAST(${pos("j")} AS INT), 1)) - 128))))"""
            .stripMargin.replaceAll("\\s+", " ")
        val dh =
          """array_to_string(list_transform(range(0, 64), i ->
            |  CASE WHEN es[CAST(i + 1 AS INT)] < es[CAST(i + 2 AS INT)]
            |       THEN '1' ELSE '0' END), '')""".stripMargin.replaceAll("\\s+", " ")
        val ham =
          """CAST(list_sum(list_transform(range(1, 65), i ->
            |  CASE WHEN substr(x.dh, CAST(i AS INT), 1) != substr(y.dh, CAST(i AS INT), 1)
            |       THEN 1 ELSE 0 END)) AS BIGINT)""".stripMargin.replaceAll("\\s+", " ")
        s"""WITH t AS (SELECT doc_id, text, strlen(text) AS n
           |           FROM documents WHERE doc_id % 3 = 1),
           |o AS (SELECT media_id, $dh AS dh FROM (
           |  SELECT doc_id AS media_id, ${esSql("n", j => j)} AS es
           |  FROM t WHERE n >= 65) z1),
           |r AS (SELECT media_id, $dh AS dh FROM (
           |  SELECT doc_id + 1000000 AS media_id, ${esSql("n", j => j)} AS es
           |  FROM t WHERE n >= 65) z2),
           |a AS (SELECT * FROM o UNION ALL SELECT * FROM r),
           |bb AS (SELECT media_id, dh, bidx,
           |         substr(dh, CAST(bidx * 16 + 1 AS INT), 16) AS bv
           |       FROM (SELECT media_id, dh, unnest(range(0, 4)) AS bidx FROM a) z)
           |SELECT DISTINCT id1, id2, hamming FROM (
           |  SELECT x.media_id AS id1, y.media_id AS id2, $ham AS hamming
           |  FROM bb x JOIN bb y
           |    ON x.bidx = y.bidx AND x.bv = y.bv AND x.media_id < y.media_id) p
           |WHERE hamming <= 8""".stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      import s.implicits._
      val audio = Multimodal
        .synthesizeMedia(documents(s, d))
        .filter((r: Multimodal.MediaRecord) => r.modality == "audio")
      val inverted = Multimodal
        .invertAudio(audio)
        .map(r => r.copy(media_id = r.media_id + 1000000L))
      Dedup.hammingBandPairs(
        Multimodal.audioEnergyHashes(audio.union(inverted)),
        "media_id",
        "aphash",
        maxHamming = 8
      )
    },

    // Overlapping strided windows (hop < window — the spectrogram frame
    // shape) over the audio-modality payloads: md5 + exact integer byte-sum
    // energy per window. ASCII corpus ⇒ DuckDB's per-char ord() sums equal
    // Spark's per-byte sums exactly.
    QEntry.sql(
      "mm_audio_windows",
      """SELECT media_id, CAST(win_idx AS INT) AS win_idx,
        |  md5(substr(text, CAST(win_idx * 256 + 1 AS INT), 512)) AS win_md5,
        |  CAST(list_sum(list_transform(
        |    range(1, length(substr(text, CAST(win_idx * 256 + 1 AS INT), 512)) + 1),
        |    i -> ord(substr(substr(text, CAST(win_idx * 256 + 1 AS INT), 512),
        |                    CAST(i AS INT), 1)))) AS BIGINT) AS energy
        |FROM (
        |  SELECT doc_id AS media_id, text,
        |    unnest(range(0, least(
        |      CASE WHEN octet_length(encode(text)) >= 512
        |             THEN (octet_length(encode(text)) - 512) // 256 + 1
        |           WHEN octet_length(encode(text)) > 0 THEN 1 ELSE 0 END,
        |      6))) AS win_idx
        |  FROM documents WHERE doc_id % 3 = 1) t"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Multimodal.stridedWindows(
        Multimodal.fromDocuments(documents(s, d)).filter(col("modality") === "audio"),
        windowBytes = 512,
        hopBytes = 256,
        maxWindows = 6
      )
    },

    // Resize/byte-budget stub: payload truncated to 300 bytes (a real codec
    // would re-encode; the budget contract and plumbing are identical).
    // ASCII corpus ⇒ DuckDB's char-wise substr equals Spark's byte truncate.
    QEntry.sql(
      "mm_resize_budget",
      """SELECT doc_id AS media_id,
        |  octet_length(encode(substr(text, 1, 300))) AS bytes,
        |  md5(substr(text, 1, 300)) AS payload_md5
        |FROM documents""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Multimodal
        .resizeTo(Multimodal.fromDocuments(documents(s, d)), 300)
        .select(
          col("media_id"),
          octet_length(col("payload")).as("bytes"),
          md5(col("payload")).as("payload_md5")
        )
    },

    // Shot-boundary detection over the video-modality payloads: quantized
    // frame energy (exact byte sum div 2048), a cut where consecutive
    // frames jump ≥ 2 levels — the codec-free stand-in for histogram-diff
    // scene segmentation. Keyed lag window over ≤ 8 frames per media:
    // bounded per-key state, parallel across media at any corpus size.
    QEntry.sql(
      "mm_scene_cuts",
      """WITH f AS (
        |  SELECT media_id, win_idx,
        |    CAST(list_sum(list_transform(
        |      range(1, length(substr(text, CAST(win_idx * 256 + 1 AS INT), 256)) + 1),
        |      i -> ord(substr(substr(text, CAST(win_idx * 256 + 1 AS INT), 256),
        |                      CAST(i AS INT), 1)))) AS BIGINT) // 2048 AS q
        |  FROM (SELECT doc_id AS media_id, text,
        |      unnest(range(0, least(
        |        CASE WHEN octet_length(encode(text)) >= 256
        |               THEN (octet_length(encode(text)) - 256) // 256 + 1
        |             WHEN octet_length(encode(text)) > 0 THEN 1 ELSE 0 END,
        |        8))) AS win_idx
        |    FROM documents WHERE doc_id % 3 = 2) t),
        |l AS (SELECT media_id, q,
        |    lag(q) OVER (PARTITION BY media_id ORDER BY win_idx) AS pq FROM f)
        |SELECT media_id, CAST(count(*) AS BIGINT) AS n_frames,
        |  CAST(sum(CASE WHEN abs(q - pq) >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
        |  CAST(sum(CASE WHEN abs(q - pq) >= 2 THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_shots
        |FROM l GROUP BY media_id""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Multimodal.sceneCuts(
        Multimodal.fromDocuments(documents(s, d)).filter(col("modality") === "video")
      )
    },

    // E319 DCT pHash values ([[Multimodal.MediaCodecs.phash64]]): the twin
    // replays the ENTIRE integer pipeline — 32×32 nearest-neighbor gray
    // grid off the ASCII payload bytes, separable 8×8-of-32×32 DCT-II
    // using the IDENTICAL quantized cosine integers (interpolated from
    // [[Multimodal.MediaCodecs.PhashCos]], so libm never enters the
    // contract), 32nd-smallest median threshold, bit order 8u+v — and the
    // 64-char hash matches value-for-value per image.
    QEntry.sql(
      "mm_phash_values", {
        val coefVals = Multimodal.MediaCodecs.PhashCos.zipWithIndex
          .flatMap { case (row, u) =>
            row.zipWithIndex.map { case (c, t) => s"($u,$t,$c)" }
          }
          .mkString(",")
        def ch(k: Int) =
          s"""ord(substr(text, CAST((((yy.y * h) // 32) * 8
             | + (xx.x * 8) // 32) * 3 + $k AS INT), 1))""".stripMargin
        s"""WITH t AS (SELECT doc_id, text, strlen(text) // 24 AS h
           |  FROM documents WHERE doc_id % 3 = 0),
           |coef AS (SELECT * FROM (VALUES $coefVals) v(u, t, c)),
           |px AS (SELECT doc_id, yy.y AS y, xx.x AS x,
           |    (${ch(1)} + ${ch(2)} + ${ch(3)}) AS g
           |  FROM t, range(0, 32) yy(y), range(0, 32) xx(x) WHERE h >= 1),
           |gu AS (SELECT doc_id, cf.u AS u, px.y AS y, sum(px.g * cf.c) AS gv
           |  FROM px JOIN coef cf ON cf.t = px.x GROUP BY doc_id, cf.u, px.y),
           |fv AS (SELECT doc_id, gu.u AS u, c2.u AS v, sum(gu.gv * c2.c) AS f
           |  FROM gu JOIN coef c2 ON c2.t = gu.y GROUP BY doc_id, gu.u, c2.u),
           |md AS (SELECT doc_id, f AS med FROM (SELECT doc_id, f,
           |    row_number() OVER (PARTITION BY doc_id ORDER BY f) AS rn FROM fv) z
           |  WHERE rn = 32)
           |SELECT fv.doc_id AS media_id,
           |  string_agg(CASE WHEN fv.f > md.med THEN '1' ELSE '0' END, ''
           |    ORDER BY fv.u, fv.v) AS phash
           |FROM fv JOIN md ON fv.doc_id = md.doc_id
           |GROUP BY fv.doc_id""".stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      Multimodal.imagePHashes(
        Multimodal
          .synthesizeMedia(documents(s, d))
          .filter((r: Multimodal.MediaRecord) => r.modality == "image")
      )
    }
  )
}
