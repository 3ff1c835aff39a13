package graft.queries

import graft.Tables._
import graft.operators.Multimodal

/** Multimodal-column inventory: the binary payload table derived from
  * `documents` (UTF-8 bytes as the opaque payload), metadata extraction, and
  * frame sampling. The corpus text is pure ASCII (verified), so DuckDB's
  * string functions mirror Spark's binary functions byte-for-byte — the
  * oracle checks real binary-column plumbing, not a string shortcut.
  */
object MultimodalQueries {

  private val modalitySql =
    "(['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1]"

  val entries: Seq[QEntry] = Seq(
    // Metadata-only pass over the media table: byte length, magic bytes,
    // stub-decoded dimensions. Payload bytes never leave the executors.
    QEntry.sql(
      "mm_binary_meta",
      s"""SELECT doc_id AS media_id, $modalitySql AS modality,
         |  octet_length(encode(text)) AS bytes,
         |  hex(substr(text, 1, 4)) AS magic,
         |  CAST(64 + octet_length(encode(text)) % 512 AS INT) AS width,
         |  CAST(64 + (octet_length(encode(text)) * 7) % 384 AS INT) AS height
         |FROM documents""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) => Multimodal.metaColumns(Multimodal.fromDocuments(documents(s, d))) },

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
    }
  )
}
