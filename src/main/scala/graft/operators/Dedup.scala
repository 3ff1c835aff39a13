package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Deduplication operators for a training-data pipeline: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard. All are pure column-expression / join plans —
  * no UDFs, no driver-side loops — so they distribute and scale:
  *
  *   - exact dedup: one hash-shuffle on the content key (map-side partial agg
  *     makes the shuffle proportional to distinct keys, not rows);
  *   - MinHash LSH: signatures are a narrow projection; candidate generation
  *     is an equi-join on band keys (shuffle on band hash — the standard
  *     near-dup pattern at 100 TB, never an all-pairs product);
  *   - SimHash: narrow projection to a 64-bit sketch; candidates via banding
  *     the sketch the same way;
  *   - n-gram Jaccard: exact similarity, evaluated only within candidate
  *     blocks (never unblocked all-pairs).
  *
  * Hash choice: md5 — deterministic and identical across engines, which lets
  * the DuckDB oracle verify signatures bit-for-bit. For a throughput-critical
  * production path swap `md5` for `xxhash64` (same plan shape, cheaper hash);
  * semantics are unchanged.
  */
object Dedup {

  /** k-word shingles (default 3) over whitespace tokens; 1-based element_at
    * matches the SQL twin's 1-based list indexing.
    */
  def shingles(text: Column, k: Int = 3): Column = {
    val ws = TextAnalysis.tokens(text)
    // guard: sequence(1, 0) would run DESCENDING in Spark, so short docs get
    // an explicit empty array (matches the SQL twin's range(1, 1) = [])
    when(
      size(ws) >= k,
      transform(
        sequence(lit(1), size(ws) - (k - 1)),
        i => concat_ws(" ", (0 until k).map(o => element_at(ws, i + o)): _*)
      )
    ).otherwise(array().cast("array<string>"))
  }

  /** MinHash signature: perm j = min over shingles of md5(j || '|' || s).
    * Lexicographic min over md5 hex strings is a valid random permutation
    * proxy and is engine-portable.
    */
  def minhash(shingleCol: Column, numPerm: Int): Seq[Column] =
    (0 until numPerm).map { j =>
      array_min(transform(shingleCol, s => md5(concat(lit(s"$j|"), s)))).as(s"m$j")
    }

  /** LSH band keys: bands of `rowsPerBand` signature values hashed together.
    * Docs sharing any band key are near-dup candidates.
    */
  def bands(sig: Seq[Column], rowsPerBand: Int): Seq[Column] =
    sig.grouped(rowsPerBand).zipWithIndex.map { case (g, b) =>
      md5(concat_ws("|", g: _*)).as(s"band$b")
    }.toSeq

  /** doc_id + full MinHash signature + band keys — the narrow projection that
    * feeds LSH candidate generation.
    */
  def minhashSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numPerm: Int = 8,
      rowsPerBand: Int = 2
  ): DataFrame = {
    val sh = shingles(col(textCol))
    val sig = minhash(sh, numPerm)
    val named = sig.zipWithIndex.map { case (c, i) => c.as(s"m$i") }
    val withSig = df.select(col(idCol) +: named: _*)
    val bandCols = bands((0 until numPerm).map(i => col(s"m$i")), rowsPerBand)
    withSig.select(col(idCol) +: (0 until numPerm).map(i => col(s"m$i")) ++: bandCols: _*)
  }

  /** Candidate pairs: equi-join per band (shuffle on the band key — scales to
    * any corpus because only same-bucket docs meet), deduplicated across bands.
    */
  def minhashCandidatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numPerm: Int = 8,
      rowsPerBand: Int = 2
  ): DataFrame = {
    val sigs = minhashSignatures(df, idCol, textCol, numPerm, rowsPerBand)
    val nBands = numPerm / rowsPerBand
    val exploded = sigs.select(
      col(idCol).as("id"),
      explode(array((0 until nBands).map(b => col(s"band$b")): _*)).as("band")
    )
    val a = exploded.as("a")
    val b = exploded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
  }

  /** Exact dedup: group by content hash, keep the lowest id (one shuffle whose
    * width is the distinct-key count thanks to partial aggregation).
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("copies"))

  /** SimHash-64 as a 64-char bitstring. Bit j comes from nibble j/4 of each
    * token's md5; per-bit majority over tokens. Pure higher-order-function
    * arithmetic → portable to the SQL oracle and fully distributed.
    */
  def simhash(text: Column): Column = {
    val ws = TextAnalysis.tokens(text)
    val nTokens = size(ws)
    val bitSums = transform(
      sequence(lit(0), lit(63)),
      j => {
        val nibbleIdx = floor(j / 4).cast("int") + 1 // 1-based hex char index
        val shift = (lit(3) - pmod(j, lit(4))).cast("int")
        aggregate(
          ws,
          lit(0L),
          (acc, w) => {
            val nibble = conv(md5(w).substr(nibbleIdx, lit(1)), 16, 10).cast("long")
            // (nibble >> shift) & 1 with a Column shift amount
            acc + pmod(floor(nibble / pow(lit(2.0), shift)).cast("long"), lit(2L))
          }
        )
      }
    )
    concat_ws(
      "",
      transform(bitSums, s => when(s * 2 >= nTokens.cast("long"), lit("1")).otherwise(lit("0")))
    )
  }

  /** Exact n-gram Jaccard similarity within candidate blocks (here: matching
    * `blockCols`), id1 < id2, similarity rounded for cross-engine stability.
    * At scale the block key is an LSH band (see minhashCandidatePairs); the
    * join shape is identical.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCols: Seq[String]
  ): DataFrame = {
    val withSh = df.select(
      Seq(col(idCol).as("id"), array_distinct(shingles(col(textCol))).as("sh")) ++
        blockCols.map(col): _*
    )
    val a = withSh.as("a")
    val b = withSh.as("b")
    val joinCond = blockCols
      .map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _) && col("a.id") < col("b.id")
    a.join(b, joinCond)
      .select(
        col("a.id").as("id1"),
        col("b.id").as("id2"),
        round(
          size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
            (size(col("a.sh")) + size(col("b.sh")) -
              size(array_intersect(col("a.sh"), col("b.sh")))),
          4
        ).as("jaccard")
      )
  }
}
