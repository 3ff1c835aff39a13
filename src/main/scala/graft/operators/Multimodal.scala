package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video handled as opaque `binary`
  * payloads with typed metadata, processed batch-at-a-time on executors.
  *
  * The decode step is REAL for two public uncompressed formats:
  * [[MediaCodecs.decodeWav]] walks RIFF/WAVE chunks (`fmt ` + `data`,
  * skipping unknown chunks with odd-size padding, 8-bit unsigned and
  * 16-bit signed little-endian PCM) and [[MediaCodecs.decodePpm]] parses
  * binary PPM `P6` headers (whitespace- and `#`-comment-tolerant) —
  * formats per their public specs (RIFF: Microsoft/IBM Multimedia
  * Programming Interface 1991; PPM: netpbm `ppm(5)`). Compressed codecs
  * (JPEG/MP3/H.264) are out of scope for this container; the decode
  * surface, schema, and batch shape are exactly where they would plug in.
  *
  * Scale notes: payloads stay on executors end-to-end (no collect); decode
  * runs per-partition via typed mapPartitions so a real native codec would
  * amortize its init per batch, exactly like a mapInPandas/mapInArrow UDF
  * batch; metadata-only queries (byte length, magic) never touch payload
  * internals thanks to parquet column pruning.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  case class MediaRecord(media_id: Long, modality: String, payload: Array[Byte])

  /** Features extracted by the real decoders: container stats (bytes, fmt)
    * plus per-sample amplitude stats — exact integers end-to-end so the
    * oracle can replay them bit-for-bit. For WAV, `n_samples` counts sample
    * frames and amp_* range over decoded sample values (unsigned 0..255 for
    * 8-bit, signed −32768..32767 for 16-bit); for PPM, `n_samples` counts
    * pixel channel bytes (w·h·3) and amp_* range over 0..255 channel values.
    */
  case class DecodedMedia(
      media_id: Long,
      fmt: String,
      bytes: Long,
      width: Int,
      height: Int,
      channels: Int,
      sample_rate: Int,
      bits: Int,
      n_samples: Long,
      amp_min: Int,
      amp_max: Int,
      amp_sum: Long
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

  /** Real encoders/decoders for two public uncompressed media formats.
    * Pure JVM byte-level code (no native deps), deterministic, and exact —
    * which is what lets the driver hash-match decoded features against a
    * SQL oracle computing the same stats from the source bytes.
    */
  object MediaCodecs {
    private def leInt(v: Int): Array[Byte] =
      Array[Byte](v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    private def leShort(v: Int): Array[Byte] =
      Array[Byte](v.toByte, (v >>> 8).toByte)
    private def readLeInt(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    private def readLeShort(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    private def fourCC(b: Array[Byte], off: Int): String =
      new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Canonical RIFF/WAVE PCM container. `bits` ∈ {8, 16}; 8-bit data is
      * unsigned, 16-bit is signed little-endian (per the WAV spec). Optional
      * `extraChunks` (id → body) are emitted between `fmt ` and `data` so
      * decoders must genuinely walk the chunk list.
      */
    def encodeWavPcm(
        samples: Array[Byte],
        sampleRate: Int,
        bits: Int,
        channels: Int = 1,
        extraChunks: Seq[(String, Array[Byte])] = Nil
    ): Array[Byte] = {
      require(bits == 8 || bits == 16, s"PCM bits must be 8 or 16, got $bits")
      require(samples.length % (bits / 8 * channels) == 0, "ragged final frame")
      val blockAlign = channels * bits / 8
      val byteRate = sampleRate * blockAlign
      val fmt = new java.io.ByteArrayOutputStream()
      fmt.write(leShort(1)) // audioFormat = PCM
      fmt.write(leShort(channels)); fmt.write(leInt(sampleRate))
      fmt.write(leInt(byteRate)); fmt.write(leShort(blockAlign)); fmt.write(leShort(bits))
      // assemble the inner chunk list first so the RIFF size field is exact
      val inner = new java.io.ByteArrayOutputStream()
      def chunk(id: String, body: Array[Byte]): Unit = {
        inner.write(id.getBytes("US-ASCII")); inner.write(leInt(body.length))
        inner.write(body)
        if (body.length % 2 == 1) inner.write(0) // RIFF chunks are word-aligned
      }
      inner.write("WAVE".getBytes("US-ASCII"))
      chunk("fmt ", fmt.toByteArray)
      extraChunks.foreach { case (id, body) => chunk(id, body) }
      chunk("data", samples)
      val body = inner.toByteArray
      val out = new java.io.ByteArrayOutputStream()
      out.write("RIFF".getBytes("US-ASCII")); out.write(leInt(body.length)); out.write(body)
      out.toByteArray
    }

    /** Decode a RIFF/WAVE PCM payload by walking its chunk list: unknown
      * chunks are skipped (with odd-size pad bytes), `fmt ` supplies the
      * format fields, `data` the samples. Amplitude stats are exact integer
      * min/max/sum over decoded sample values.
      */
    def decodeWav(id: Long, b: Array[Byte]): DecodedMedia = {
      require(b.length >= 12 && fourCC(b, 0) == "RIFF" && fourCC(b, 8) == "WAVE",
        s"media $id: not a RIFF/WAVE payload")
      var off = 12
      var channels = 0; var sampleRate = 0; var bits = 0; var blockAlign = 0
      var nSamples = 0L; var ampMin = 0; var ampMax = 0; var ampSum = 0L
      var sawData = false
      while (off + 8 <= b.length) {
        val cid = fourCC(b, off)
        val sz = readLeInt(b, off + 4)
        val body = off + 8
        // a corrupt size of -8 would leave off unchanged (executor hang);
        // an oversized one would read past the payload
        require(sz >= 0 && body + sz <= b.length,
          s"media $id: corrupt $cid chunk size $sz at offset $off")
        cid match {
          case "fmt " =>
            require(readLeShort(b, body) == 1, s"media $id: not uncompressed PCM")
            channels = readLeShort(b, body + 2)
            sampleRate = readLeInt(b, body + 4)
            blockAlign = readLeShort(b, body + 12)
            bits = readLeShort(b, body + 14)
          case "data" =>
            require(bits != 0, s"media $id: data chunk before fmt")
            sawData = true
            nSamples = sz.toLong / blockAlign
            var mn = Int.MaxValue; var mx = Int.MinValue; var sum = 0L
            var i = body
            val end = body + sz
            if (bits == 8) {
              while (i < end) { // 8-bit PCM is unsigned 0..255
                val v = b(i) & 0xff
                if (v < mn) mn = v; if (v > mx) mx = v; sum += v; i += 1
              }
            } else {
              while (i + 1 < end) { // 16-bit PCM is signed LE
                val v = readLeShort(b, i).toShort.toInt
                if (v < mn) mn = v; if (v > mx) mx = v; sum += v; i += 2
              }
            }
            if (sz == 0) { mn = 0; mx = 0 }
            ampMin = mn; ampMax = mx; ampSum = sum
          case _ => () // unknown chunk (LIST, fact, …): skip
        }
        off = body + sz + (sz % 2) // word-aligned
      }
      require(sawData, s"media $id: no data chunk")
      DecodedMedia(id, "wav", b.length.toLong, 0, 0, channels, sampleRate, bits,
        nSamples, ampMin, ampMax, ampSum)
    }

    /** Decoded PCM samples of a RIFF/WAVE payload plus (sampleRate, bits) —
      * the raw-sample sibling of [[decodeWav]]'s stats (same chunk walk;
      * 8-bit unsigned, 16-bit signed LE, per the WAV spec).
      */
    def wavSamples(id: Long, b: Array[Byte]): (Int, Int, Array[Int]) = {
      require(b.length >= 12 && fourCC(b, 0) == "RIFF" && fourCC(b, 8) == "WAVE",
        s"media $id: not a RIFF/WAVE payload")
      var off = 12
      var sampleRate = 0; var bits = 0; var blockAlign = 0
      var out: Array[Int] = null
      while (off + 8 <= b.length) {
        val cid = fourCC(b, off)
        val sz = readLeInt(b, off + 4)
        val body = off + 8
        // same guard as decodeWav: a negative size stalls the walk, an
        // oversized one reads past the payload
        require(sz >= 0 && body + sz <= b.length,
          s"media $id: corrupt $cid chunk size $sz at offset $off")
        cid match {
          case "fmt " =>
            require(readLeShort(b, body) == 1, s"media $id: not uncompressed PCM")
            sampleRate = readLeInt(b, body + 4)
            blockAlign = readLeShort(b, body + 12)
            bits = readLeShort(b, body + 14)
          case "data" =>
            require(bits != 0, s"media $id: data chunk before fmt")
            val n = sz / (bits / 8)
            out = new Array[Int](n)
            var i = 0
            while (i < n) {
              out(i) =
                if (bits == 8) b(body + i) & 0xff
                else readLeShort(b, body + 2 * i).toShort.toInt
              i += 1
            }
          case _ => ()
        }
        off = body + sz + (sz % 2)
      }
      require(out != null, s"media $id: no data chunk")
      (sampleRate, bits, out)
    }

    /** 64-bit perceptual energy-gradient hash of a PCM sample stream — the
      * audio sibling of [[dhash64]]: 65 nearest-neighbor frames (frame i
      * covers samples [⌊i·n/65⌋, ⌊(i+1)·n/65⌋)), frame energy = Σ|sample|,
      * bit i = [E_i < E_{i+1}]. Relative-position framing survives
      * resampling; comparing energies (not thresholding them) survives
      * uniform amplitude scaling — the two re-encodes exact digests miss.
      * None below 65 samples (nothing to frame).
      */
    def audioEnergyHash(samples: Array[Int]): Option[String] = {
      val n = samples.length
      if (n < 65) None
      else {
        val es = new Array[Long](65)
        var i = 0
        while (i < 65) {
          var j = (i.toLong * n / 65).toInt
          val end = ((i + 1).toLong * n / 65).toInt
          var sum = 0L
          while (j < end) { sum += math.abs(samples(j).toLong); j += 1 }
          es(i) = sum
          i += 1
        }
        val sb = new java.lang.StringBuilder(64)
        i = 0
        while (i < 64) { sb.append(if (es(i) < es(i + 1)) '1' else '0'); i += 1 }
        Some(sb.toString)
      }
    }

    /** Canonical binary PPM (`P6`) with maxval 255: header then w·h·3 RGB
      * bytes. Requires exactly-sized pixel data.
      */
    def encodePpm(pixels: Array[Byte], width: Int, height: Int): Array[Byte] = {
      require(pixels.length == width * height * 3, "pixel buffer must be w*h*3")
      val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + pixels.length)
      System.arraycopy(header, 0, out, 0, header.length)
      System.arraycopy(pixels, 0, out, header.length, pixels.length)
      out
    }

    /** Decode a binary PPM payload: `P6`, then whitespace-separated width,
      * height, maxval tokens (with `#` comments legal anywhere between
      * tokens, per ppm(5)), one whitespace, then raster bytes. Amplitude
      * stats are exact integers over the w·h·3 channel bytes.
      */
    /** Parse a P6 header: returns (width, height, rasterOffset). `#`
      * comments are legal anywhere between tokens per ppm(5); exactly one
      * whitespace byte separates the maxval token from the raster.
      */
    def ppmHeader(id: Long, b: Array[Byte]): (Int, Int, Int) = {
      require(b.length >= 2 && b(0) == 'P' && b(1) == '6', s"media $id: not a P6 PPM")
      var off = 2
      def skipSpaceAndComments(): Unit = {
        var going = true
        while (going && off < b.length) {
          val c = b(off)
          if (c == ' ' || c == '\t' || c == '\n' || c == '\r') off += 1
          else if (c == '#') { while (off < b.length && b(off) != '\n') off += 1 }
          else going = false
        }
      }
      def token(): Int = {
        skipSpaceAndComments()
        var v = 0
        while (off < b.length && b(off) >= '0' && b(off) <= '9') {
          v = v * 10 + (b(off) - '0'); off += 1
        }
        v
      }
      val width = token(); val height = token(); val maxval = token()
      require(maxval == 255, s"media $id: only maxval 255 supported, got $maxval")
      (width, height, off + 1) // one whitespace byte separates header from raster
    }

    def decodePpm(id: Long, b: Array[Byte]): DecodedMedia = {
      val (width, height, off) = ppmHeader(id, b)
      val n = width * height * 3
      require(off + n <= b.length, s"media $id: truncated raster")
      var mn = Int.MaxValue; var mx = Int.MinValue; var sum = 0L
      var i = off
      val end = off + n
      while (i < end) {
        val v = b(i) & 0xff
        if (v < mn) mn = v; if (v > mx) mx = v; sum += v; i += 1
      }
      if (n == 0) { mn = 0; mx = 0 }
      DecodedMedia(id, "ppm", b.length.toLong, width, height, 3, 0, 8,
        n.toLong, mn, mx, sum)
    }

    /** 64-bit perceptual DIFFERENCE hash (dHash) of a decoded P6 raster,
      * as a 64-char bitstring: sample a fixed 8-column × 9-row grid by
      * nearest-neighbor (col j → pixel column ⌊j·w/8⌋, row i → ⌊i·h/9⌋),
      * take each cell's channel sum (3× luma — no division, exact), and
      * emit bit (8i + j) = [g(j, rᵢ) < g(j, rᵢ₊₁)] — the vertical gradient
      * sign. Relative-position sampling is what buys the PERCEPTUAL
      * property exact digests lack: a nearest-neighbor rescale of the same
      * image samples (nearly) the same source pixels, so re-encoded/resized
      * duplicates land at small Hamming distance instead of hashing to
      * unrelated digests. Requires h ≥ 9 (None below — nothing to gradient).
      */
    def dhash64(b: Array[Byte]): Option[String] = {
      val (w, h, off) = ppmHeader(-1L, b)
      if (h < 9 || w < 1 || off + w * h * 3 > b.length) None
      else {
        def gray(x: Int, y: Int): Int = {
          val o = off + (y * w + x) * 3
          (b(o) & 0xff) + (b(o + 1) & 0xff) + (b(o + 2) & 0xff)
        }
        val sb = new java.lang.StringBuilder(64)
        var i = 0
        while (i < 8) {
          val r0 = i * h / 9
          val r1 = (i + 1) * h / 9
          var j = 0
          while (j < 8) {
            val x = j * w / 8
            sb.append(if (gray(x, r0) < gray(x, r1)) '1' else '0')
            j += 1
          }
          i += 1
        }
        Some(sb.toString)
      }
    }

    /** 8×32 quantized DCT-II cosine table, shared VERBATIM with the oracle
      * twin (the SQL interpolates these exact integers): C(u,t) =
      * round(cos(π(2t+1)u/64)·1000). Quantizing once here removes libm
      * from the cross-engine contract entirely — both engines multiply and
      * sum the same BIGINTs, so the whole DCT is exact integer arithmetic.
      * Magnitude audit: gray ≤ 765, |C| ≤ 1000 → |G| ≤ 32·765·1000 ≈
      * 2.45e7, |F| ≤ 32·|G|·1000 ≈ 7.8e11 — comfortably inside int64.
      */
    val PhashCos: Array[Array[Long]] =
      Array.tabulate(8, 32)((u, t) =>
        math.round(math.cos(math.Pi * (2 * t + 1) * u / 64.0) * 1000.0)
      )

    /** 64-bit perceptual DCT hash (pHash) of a P6 raster, as a 64-char
      * bitstring: sample a 32×32 grid nearest-neighbor (row y → source row
      * ⌊y·h/32⌋, col x → ⌊x·w/32⌋; cell gray = channel sum, exact), run a
      * SEPARABLE integer 8×8-of-32×32 DCT-II with [[PhashCos]]
      * (G(u,y) = Σₓ gray·C(u,x), F(u,v) = Σ_y G·C(v,y)), and emit bit
      * (8u + v) = [F(u,v) > median], the median being the 32nd-smallest of
      * the 64 coefficients (0-based index 31 ascending). Comparing against
      * the own-image median is what dHash's fixed gradient lacks: the hash
      * is invariant under any monotone intensity scaling, and an ALIGNED
      * factor-2 vertical resize (h ≡ 0 mod 64) samples the identical
      * source grid, reproducing the hash bit-for-bit.
      */
    def phash64(b: Array[Byte]): Option[String] = {
      val (w, h, off) = ppmHeader(-1L, b)
      if (w < 1 || h < 1 || off + w * h * 3 > b.length) None
      else {
        val g = Array.ofDim[Long](32, 32) // g(y)(x)
        var y = 0
        while (y < 32) {
          val sy = y * h / 32
          var x = 0
          while (x < 32) {
            val sx = x * w / 32
            val o = off + (sy * w + sx) * 3
            g(y)(x) = (b(o) & 0xff) + (b(o + 1) & 0xff) + (b(o + 2) & 0xff)
            x += 1
          }
          y += 1
        }
        val gu = Array.ofDim[Long](8, 32) // G(u,y) = Σ_x g(y,x)·C(u,x)
        var u = 0
        while (u < 8) {
          y = 0
          while (y < 32) {
            var s = 0L
            var x = 0
            while (x < 32) { s += g(y)(x) * PhashCos(u)(x); x += 1 }
            gu(u)(y) = s
            y += 1
          }
          u += 1
        }
        val f = new Array[Long](64) // F(u,v) at index 8u+v
        u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            var s = 0L
            y = 0
            while (y < 32) { s += gu(u)(y) * PhashCos(v)(y); y += 1 }
            f(8 * u + v) = s
            v += 1
          }
          u += 1
        }
        val sorted = f.clone()
        java.util.Arrays.sort(sorted)
        val med = sorted(31)
        val sb = new java.lang.StringBuilder(64)
        var k = 0
        while (k < 64) { sb.append(if (f(k) > med) '1' else '0'); k += 1 }
        Some(sb.toString)
      }
    }

    /** Nearest-neighbor vertical downsample of a P6 payload by an integer
      * factor: keep source rows 0, factor, 2·factor, … (new height
      * ⌊h/factor⌋), re-encode. The pixel-level transform behind the
      * resized-duplicate scenario [[Multimodal.imageDHashes]] is built to
      * catch.
      */
    def resizePpmVertical(b: Array[Byte], factor: Int): Array[Byte] = {
      require(factor >= 1, s"factor must be >= 1, got $factor")
      val (w, h, off) = ppmHeader(-1L, b)
      val h2 = h / factor
      val out = new Array[Byte](w * h2 * 3)
      var y = 0
      while (y < h2) {
        System.arraycopy(b, off + (y * factor) * w * 3, out, y * w * 3, w * 3)
        y += 1
      }
      encodePpm(out, w, h2)
    }

    // ---------------------------------------------------- ISO-BMFF (MP4)

    private def beInt(v: Int): Array[Byte] =
      Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    private def readBeInt(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

    private def box(tpe: String, body: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(8 + body.length)
      out.write(beInt(8 + body.length))
      out.write(tpe.getBytes("US-ASCII"))
      out.write(body)
      out.toByteArray
    }

    /** Minimal genuine ISO-BMFF (MP4 family) container: `ftyp` (isom) +
      * `moov`(`mvhd` timescale/duration + `trak`(`tkhd` 16.16-fixed
      * width/height)) + a `free` box the walker must skip + `mdat` carrying
      * the payload. Version-0 boxes, spec sizes (mvhd 108, tkhd 92) — the
      * big-endian sibling of [[encodeWavPcm]]'s RIFF little-endian world.
      */
    def encodeIsoBmff(
        data: Array[Byte],
        timescale: Int,
        duration: Int,
        width: Int,
        height: Int
    ): Array[Byte] = {
      val ftyp = box("ftyp",
        "isom".getBytes("US-ASCII") ++ beInt(0x200) ++
          "isom".getBytes("US-ASCII") ++ "mp41".getBytes("US-ASCII"))
      val mvhd = {
        val b = new java.io.ByteArrayOutputStream(108)
        b.write(beInt(108)); b.write("mvhd".getBytes("US-ASCII"))
        b.write(beInt(0)) // version 0 + flags
        b.write(beInt(0)); b.write(beInt(0)) // creation, modification
        b.write(beInt(timescale)); b.write(beInt(duration))
        b.write(beInt(0x00010000)) // rate 1.0
        b.write(Array[Byte](1, 0)) // volume 1.0
        b.write(new Array[Byte](10)) // reserved
        // unity matrix
        b.write(beInt(0x00010000)); b.write(beInt(0)); b.write(beInt(0))
        b.write(beInt(0)); b.write(beInt(0x00010000)); b.write(beInt(0))
        b.write(beInt(0)); b.write(beInt(0)); b.write(beInt(0x40000000))
        b.write(new Array[Byte](24)) // pre_defined
        b.write(beInt(2)) // next_track_ID
        b.toByteArray
      }
      val tkhd = {
        val b = new java.io.ByteArrayOutputStream(92)
        b.write(beInt(92)); b.write("tkhd".getBytes("US-ASCII"))
        b.write(beInt(0x000007)) // version 0, flags: enabled|in_movie|in_preview
        b.write(beInt(0)); b.write(beInt(0)) // creation, modification
        b.write(beInt(1)) // track_ID
        b.write(beInt(0)) // reserved
        b.write(beInt(duration))
        b.write(new Array[Byte](8)) // reserved
        b.write(Array[Byte](0, 0, 0, 0, 0, 0, 0, 0)) // layer, alt_group, volume, reserved
        b.write(beInt(0x00010000)); b.write(beInt(0)); b.write(beInt(0))
        b.write(beInt(0)); b.write(beInt(0x00010000)); b.write(beInt(0))
        b.write(beInt(0)); b.write(beInt(0)); b.write(beInt(0x40000000))
        b.write(beInt(width << 16)); b.write(beInt(height << 16)) // 16.16 fixed
        b.toByteArray
      }
      val trak = box("trak", tkhd)
      val moov = box("moov", mvhd ++ trak)
      val free = box("free", "graftpad".getBytes("US-ASCII"))
      val mdat = box("mdat", data)
      ftyp ++ moov ++ free ++ mdat
    }

    /** Box-walk parse of an ISO-BMFF payload: iterate (size, fourcc)
      * headers, DESCEND into the container boxes that hold our metadata
      * (`moov`, `trak`), skip everything unknown by its declared size, and
      * extract (major_brand, timescale, duration, width, height,
      * mdat_bytes) plus the walked box count. 32-bit sizes only — size 0
      * ("to end of file") and 1 (64-bit largesize) refuse loudly, as does
      * any box whose declared size overruns its parent.
      *
      * @return (major_brand, timescale, duration, width, height, n_boxes,
      *         mdat_bytes)
      */
    def parseIsoBmff(id: Long, b: Array[Byte]): (String, Int, Int, Int, Int, Int, Long) = {
      var brand = ""
      var timescale = 0
      var duration = 0
      var width = 0
      var height = 0
      var mdatBytes = 0L
      var nBoxes = 0
      def walk(from: Int, to: Int): Unit = {
        var off = from
        while (off < to) {
          require(to - off >= 8, s"media $id: truncated box header at offset $off")
          val size = readBeInt(b, off)
          val tpe = fourCC(b, off + 4)
          require(size >= 8, s"media $id: unsupported box size $size for '$tpe'")
          require(off + size <= to, s"media $id: box '$tpe' overruns its parent")
          nBoxes += 1
          tpe match {
            case "ftyp" => brand = fourCC(b, off + 8)
            case "moov" | "trak" => walk(off + 8, off + size) // containers
            case "mvhd" =>
              timescale = readBeInt(b, off + 20)
              duration = readBeInt(b, off + 24)
            case "tkhd" =>
              width = readBeInt(b, off + size - 8) >>> 16
              height = readBeInt(b, off + size - 4) >>> 16
            case "mdat" => mdatBytes = size - 8L
            case _ => () // skip unknown boxes by declared size — free, etc.
          }
          off += size
        }
      }
      walk(0, b.length)
      (brand, timescale, duration, width, height, nBoxes, mdatBytes)
    }

    /** Magic-byte dispatch — the shape a real multi-codec ingest has. */
    def decode(r: MediaRecord): DecodedMedia = {
      val b = r.payload
      if (b.length >= 4 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F')
        decodeWav(r.media_id, b)
      else if (b.length >= 2 && b(0) == 'P' && b(1) == '6')
        decodePpm(r.media_id, b)
      else
        throw new IllegalArgumentException(
          s"media ${r.media_id}: unsupported container (magic ${b.take(4).map(x => f"$x%02X").mkString})")
    }
  }

  /** Synthesize real, decodable media payloads from the documents corpus —
    * the text bytes become the sample/pixel data, wrapped in genuine
    * containers: image docs → PPM P6 (8×⌊len/24⌋, data truncated to fit),
    * audio docs → 16-bit PCM WAV at 16 kHz (sample = (byte−128)·256), video
    * docs → 8-bit PCM WAV at 8 kHz carrying an extra LIST/INFO chunk the
    * decoder must skip. Runs as a typed map on executors; payload bytes
    * never touch the driver.
    */
  def synthesizeMedia(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val listInfo = {
      val body = new java.io.ByteArrayOutputStream()
      body.write("INFO".getBytes("US-ASCII"))
      body.write("ISFT".getBytes("US-ASCII"))
      val soft = "graft".getBytes("US-ASCII") // 5 bytes → odd, exercises padding
      body.write(Array[Byte](soft.length.toByte, 0, 0, 0))
      body.write(soft)
      body.write(0) // word-align pad
      body.toByteArray
    }
    docs
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("data"))
      .as[(Long, Array[Byte])]
      .map { case (docId, data) =>
        (docId % 3) match {
          case 0 =>
            val h = data.length / 24 // width 8, 3 channels → 24 bytes per row
            MediaRecord(docId, "image", MediaCodecs.encodePpm(data.take(h * 24), 8, h))
          case 1 =>
            val pcm16 = new Array[Byte](data.length * 2)
            var i = 0
            while (i < data.length) {
              val s = ((data(i) & 0xff) - 128) * 256 // center then scale to s16
              pcm16(2 * i) = s.toByte
              pcm16(2 * i + 1) = (s >> 8).toByte
              i += 1
            }
            MediaRecord(docId, "audio", MediaCodecs.encodeWavPcm(pcm16, 16000, 16))
          case _ =>
            MediaRecord(
              docId,
              "video",
              MediaCodecs.encodeWavPcm(data, 8000, 8, extraChunks = Seq("LIST" -> listInfo))
            )
        }
      }
  }

  /** Batch decode via mapPartitions — the per-partition iterator is where a
    * native codec would hold its context; here the pure-JVM RIFF/PPM
    * decoders run per record.
    */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(MediaCodecs.decode))
  }

  /** ISO-BMFF metadata extracted by the box walker (E416). */
  case class Mp4Meta(
      media_id: Long,
      major_brand: String,
      timescale: Int,
      duration: Int,
      width: Int,
      height: Int,
      n_boxes: Int,
      mdat_bytes: Long,
      total_bytes: Long
  )

  /** Synthesize genuine ISO-BMFF (MP4-family) payloads from the documents
    * corpus — text bytes become the `mdat`, the movie header carries a
    * 1000-tick timescale with duration = byte length (one "ms" per byte),
    * and the track header a 320 × ((len mod 480)+16) geometry — then parse
    * every payload back through the box walker ([[MediaCodecs.parseIsoBmff]])
    * in the same executor pass: bytes never shuffle and never touch the
    * driver, the big-endian sibling of [[synthesizeMedia]]'s RIFF/PPM
    * round trips.
    */
  def mp4BoxMeta(docs: DataFrame): Dataset[Mp4Meta] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("data"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (docId, data) =>
        val payload = MediaCodecs.encodeIsoBmff(
          data,
          timescale = 1000,
          duration = data.length,
          width = 320,
          height = (data.length % 480) + 16
        )
        val (brand, ts, dur, w, h, nb, mdat) = MediaCodecs.parseIsoBmff(docId, payload)
        Mp4Meta(docId, brand, ts, dur, w, h, nb, mdat, payload.length.toLong)
      })
  }

  /** Perceptual image hashes: one (media_id, dhash) row per decodable P6
    * image tall enough to gradient (h ≥ 9) — see [[MediaCodecs.dhash64]].
    * Runs as a typed flatMap on executors (payload bytes never shuffle;
    * only 64-char sketches leave the scan), so the downstream pair join —
    * [[Dedup.hammingBandPairs]] over the dhash column, the same
    * pigeonhole-banded machinery SimHash uses — is sketch-sized at any
    * corpus scale. This is what catches re-encoded/resized duplicates that
    * exact content digests (`mm_frame_dedup`) structurally miss.
    */
  def imageDHashes(media: Dataset[MediaRecord]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .flatMap { r =>
        val b = r.payload
        if (b.length >= 2 && b(0) == 'P' && b(1) == '6')
          MediaCodecs.dhash64(b).map(h => (r.media_id, h))
        else None
      }
      .toDF("media_id", "dhash")
  }

  /** Perceptual DCT hashes: one (media_id, phash) row per decodable P6
    * image — see [[MediaCodecs.phash64]]. Executor-side typed flatMap like
    * [[imageDHashes]] (payload bytes never shuffle; only 64-char sketches
    * leave the scan); pair downstream with [[Dedup.hammingBandPairs]] on
    * the `phash` column. Complements dHash: the own-image-median threshold
    * makes it invariant under monotone intensity scaling, where dHash's
    * pairwise gradients are invariant under per-column monotone maps.
    */
  def imagePHashes(media: Dataset[MediaRecord]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .flatMap { r =>
        val b = r.payload
        if (b.length >= 2 && b(0) == 'P' && b(1) == '6')
          MediaCodecs.phash64(b).map(h => (r.media_id, h))
        else None
      }
      .toDF("media_id", "phash")
  }

  /** Perceptual audio hashes: one (media_id, aphash) row per decodable
    * RIFF/WAVE payload with ≥ 65 samples — see
    * [[MediaCodecs.audioEnergyHash]]. Executor-side like [[imageDHashes]];
    * pair downstream with [[Dedup.hammingBandPairs]] on the `aphash`
    * column. Catches resampled / volume-scaled re-encodes whose exact
    * digests diverge.
    */
  def audioEnergyHashes(media: Dataset[MediaRecord]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .flatMap { r =>
        val b = r.payload
        if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') {
          val (_, bits, samples) = MediaCodecs.wavSamples(r.media_id, b)
          // center 8-bit unsigned PCM at its 128 midpoint so "energy" means
          // deviation from silence for both bit depths (16-bit is already
          // signed around 0)
          val centered = if (bits == 8) samples.map(_ - 128) else samples
          MediaCodecs.audioEnergyHash(centered).map(h => (r.media_id, h))
        } else None
      }
      .toDF("media_id", "aphash")
  }

  /** Audio QC report over decoded PCM — the per-asset screen a media
    * pipeline runs before spending feature-extraction compute: stuck or
    * silent streams, flatlined encoders and dynamic-range collapse are all
    * visible in four integer statistics, computed in the same executor-side
    * codec pass as [[audioEnergyHashes]] (payload bytes never shuffle, one
    * 7-column row per asset does):
    *
    *   - mean_crossings: sign changes of the MEAN-centered signal — the
    *     crossing count computed against the asset's own mean, not zero, so
    *     it reads activity for unsigned 8-bit and DC-offset streams alike;
    *     centering is division-free (t_i = n·s_i − Σs, exact integers) and
    *     crossings compare SIGNS, never products, so nothing can overflow
    *   - repeat_ppm: adjacent-equal sample share — stuck-encoder reading
    *   - min/max_frame_energy + dyn_ppm: Σ|t| over `frames` equal slices;
    *     min/max energy ratio ≈ 0 for bursty signals, 10⁶ for flat ones
    *     (an all-constant asset reports dyn_ppm = 10⁶ by convention)
    *
    * 16-bit signed and 8-bit unsigned PCM per the WAV spec (8-bit stays
    * raw 0..255 — mean-centering makes the statistics depth-agnostic
    * without an off-by-half centering convention). Zero-sample payloads
    * are skipped. |t| ≤ n·65536, frame sums ≤ n²·65536/frames — int64-exact
    * through ~10⁶ samples per asset.
    */
  def audioQcReport(media: Dataset[MediaRecord], frames: Int = 8): DataFrame = {
    require(frames >= 1, "frames >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    media
      .flatMap { r =>
        val b = r.payload
        if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') {
          val (_, _, samples) = MediaCodecs.wavSamples(r.media_id, b)
          val n = samples.length
          if (n == 0) None
          else {
            val s = samples.map(_.toLong)
            val sm = s.sum
            val t = s.map(x => n.toLong * x - sm)
            var crossings = 0L
            var repeats = 0L
            var i = 0
            while (i < n - 1) {
              if ((t(i) > 0 && t(i + 1) < 0) || (t(i) < 0 && t(i + 1) > 0)) crossings += 1
              if (s(i + 1) == s(i)) repeats += 1
              i += 1
            }
            val energy = new Array[Long](frames)
            i = 0
            while (i < n) {
              energy((i.toLong * frames / n).toInt) += math.abs(t(i))
              i += 1
            }
            val maxE = energy.max
            val minE = energy.min
            Some((
              r.media_id,
              n.toLong,
              crossings,
              if (n >= 2) repeats * 1000000L / (n - 1) else 0L,
              maxE,
              minE,
              if (maxE > 0) minE * 1000000L / maxE else 1000000L
            ))
          }
        } else None
      }
      .toDF("media_id", "n_samples", "mean_crossings", "repeat_ppm",
        "max_frame_energy", "min_frame_energy", "dyn_ppm")
  }

  /** Polarity inversion of every RIFF/WAVE payload (16-bit: v → −v, with
    * the one unrepresentable case −32768 saturating to 32767, the standard
    * DSP convention; 8-bit unsigned: v → 255 − v, a flip around 127.5) —
    * a real audio re-encode that changes every payload byte while
    * preserving 16-bit |sample| exactly, so [[audioEnergyHashes]] is
    * INVARIANT to it on 16-bit streams (8-bit centering is off by one per
    * sample, so 8-bit inversion is near- rather than exactly-invariant)
    * and exact digests are not. Non-WAV rows pass through unchanged.
    */
  def invertAudio(media: Dataset[MediaRecord]): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { r =>
      val b = r.payload
      if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') {
        val (rate, bits, samples) = MediaCodecs.wavSamples(r.media_id, b)
        val inv = samples.map { v =>
          if (bits == 8) 255 - v
          else if (v == -32768) 32767
          else -v
        }
        val bytes =
          if (bits == 8) inv.map(_.toByte)
          else inv.flatMap(v => Array(v.toByte, (v >> 8).toByte))
        r.copy(payload = MediaCodecs.encodeWavPcm(bytes, rate, bits))
      } else r
    }
  }

  /** Nearest-neighbor temporal downsample of every RIFF/WAVE payload by
    * `factor` (keep samples 0, factor, 2·factor, …; non-WAV rows pass
    * through unchanged), re-encoded at the same bit depth — the
    * resampled-duplicate scenario [[audioEnergyHashes]] is built to catch.
    */
  def downsampleAudio(media: Dataset[MediaRecord], factor: Int): Dataset[MediaRecord] = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = media.sparkSession
    import spark.implicits._
    media.map { r =>
      val b = r.payload
      if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') {
        val (rate, bits, samples) = MediaCodecs.wavSamples(r.media_id, b)
        val kept = Array.tabulate((samples.length + factor - 1) / factor)(i => samples(i * factor))
        val bytes =
          if (bits == 8) kept.map(_.toByte)
          else kept.flatMap(v => Array(v.toByte, (v >> 8).toByte))
        r.copy(payload = MediaCodecs.encodeWavPcm(bytes, rate, bits))
      } else r
    }
  }

  /** Nearest-neighbor vertical resize of every P6 payload in the frame by
    * `factor` (non-PPM rows pass through unchanged) — executor-side
    * byte-level work, driver sees nothing.
    */
  def resizeVertical(media: Dataset[MediaRecord], factor: Int): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { r =>
      val b = r.payload
      if (b.length >= 2 && b(0) == 'P' && b(1) == '6')
        r.copy(payload = MediaCodecs.resizePpmVertical(b, factor))
      else r
    }
  }

  /** Column-expression fast path for metadata-only queries (no row-by-row
    * JVM object churn): byte length and magic bytes straight off the binary
    * column — parquet prunes everything else.
    */
  def metaColumns(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("modality"),
      octet_length(col("payload")).cast("bigint").as("bytes"),
      hex(substring(col("payload"), 1, 4)).as("magic")
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
