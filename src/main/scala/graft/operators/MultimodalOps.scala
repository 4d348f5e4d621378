package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video as opaque `BINARY`
 * columns with typed metadata, processed in partition-local batches.
 *
 * The Spark-side shape is real and tested — schema, partitioning,
 * batch iteration, typed output — while the actual media decode is a
 * clearly-marked deterministic STUB (this container has no image/audio
 * libraries). Swapping [[stubDecode]] for a JNI/FFM call to a real
 * decoder changes nothing about the distributed plan.
 */
object MultimodalOps {

  /** Typed metadata a decoder emits per media payload. */
  final case class MediaMeta(
      doc_id: Long,
      bytes: Long,
      width: Int,
      height: Int,
      channels: Int,
      format: String)

  /** A (id, payload) media row. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  /**
   * Attach a fake binary payload derived from the text column — stands
   * in for real image bytes so the pipeline shape is exercised
   * end-to-end on the documents table.
   */
  def withPayload(df: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    df.select(col(idCol).as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"))

  /**
   * STUB decoder: deterministic pseudo-metadata from the payload size —
   * the fallback for payloads whose container [[realDecode]] does not
   * recognise. Deliberately expressible in SQL so the oracle can verify
   * the plumbing: width = len%640+16, height = (len*7)%480+16.
   */
  def stubDecode(id: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    MediaMeta(id, n,
      (n % 640 + 16).toInt,
      (n * 7 % 480 + 16).toInt,
      3, "stub")
  }

  // ----------------------------------------------------------------
  // Real (pure-JVM) container-header decoders. Pixel/sample decoding
  // would need codec libraries; the header fields a curation pipeline
  // filters on (dimensions, channels, sample rate) parse from a few
  // header bytes with no dependencies.
  // ----------------------------------------------------------------

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  private def beShort(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** PNG color type -> sample channels (PNG spec §11.2.2). */
  private def pngChannels(colorType: Int): Int = colorType match {
    case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    case _ => 0
  }

  /**
   * Parse real container headers: PNG IHDR, JPEG SOF0/1/2, WAV fmt.
   * Unrecognised payloads fall back to [[stubDecode]] (and say so in
   * `format`), so the operator never throws on dirty data — the
   * curation-pipeline contract. For WAV, `width` carries the sample
   * rate and `height` the bits per sample.
   */
  def realDecode(id: Long, p: Array[Byte]): MediaMeta = {
    val n = p.length.toLong
    // PNG: 8-byte signature, then the IHDR chunk must come first —
    // width/height at data offsets 16/20, depth/color at 24/25
    if (n >= 26 && (p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' &&
        p(3) == 'G' && p(12) == 'I' && p(13) == 'H' && p(14) == 'D' &&
        p(15) == 'R')
      MediaMeta(id, n, beInt(p, 16), beInt(p, 20),
        pngChannels(p(25) & 0xff), "png")
    // JPEG: FF D8, then marker segments; dimensions live in the first
    // start-of-frame marker (SOF0 baseline / SOF1 / SOF2 progressive)
    else if (n >= 4 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8) {
      var i = 2
      var out: MediaMeta = null
      while (out == null && i + 9 < p.length) {
        if ((p(i) & 0xff) != 0xff) return stubDecode(id, p) // not a marker: corrupt
        val marker = p(i + 1) & 0xff
        if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2)
          out = MediaMeta(id, n, beShort(p, i + 7), beShort(p, i + 5),
            p(i + 9) & 0xff, "jpeg")
        else if (marker == 0xd9 || marker == 0xda) i = p.length // no SOF before scan
        else i += 2 + beShort(p, i + 2) // skip the segment payload
      }
      if (out != null) out else stubDecode(id, p)
    }
    // WAV: RIFF....WAVE with the fmt chunk at offset 12
    else if (n >= 36 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' &&
        p(3) == 'F' && p(8) == 'W' && p(9) == 'A' && p(10) == 'V' &&
        p(11) == 'E' && p(12) == 'f' && p(13) == 'm' && p(14) == 't')
      MediaMeta(id, n, leInt(p, 24), leShort(p, 34), leShort(p, 22), "wav")
    else stubDecode(id, p)
  }

  /**
   * Batch decode: `mapPartitions` over typed rows, decoding in chunks
   * of `batchSize` — the shape a real vectorised decoder (or a Python
   * `mapInPandas` worker) needs: partition-local, no driver round-trip,
   * bounded memory per batch. Each payload goes through the pure-JVM
   * header parsers of [[realDecode]].
   */
  def decodeMeta(df: DataFrame, batchSize: Int = 64): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.as[MediaRow].mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // a vectorised decoder would take `batch.map(_.payload)` in one
        // call; header parsing is per-row either way
        batch.map(r => realDecode(r.doc_id, r.payload))
      }
    }
  }

  /**
   * Synthesize a REAL (signature + IHDR + tEXt + IEND) PNG payload per
   * document, dimensions derived from the text length with the same
   * arithmetic as [[stubDecode]] — so an oracle can recompute what the
   * header PARSER must extract: width = len%640+16, height =
   * (len*7)%480+16, RGB (channels=3), total bytes = len + 57.
   * CRCs are zeroed (valid layout, lazy checksums — header parsers,
   * ours included, do not verify them).
   */
  def withPngPayload(df: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .as[(Long, String)]
    rows.map { case (id, text) =>
      val body = text.getBytes("UTF-8")
      val w = body.length % 640 + 16
      val h = (body.length.toLong * 7 % 480 + 16).toInt
      val out = java.nio.ByteBuffer.allocate(body.length + 57)
      out.put(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
      out.putInt(13).put("IHDR".getBytes("US-ASCII"))
        .putInt(w).putInt(h)
        .put(8.toByte)  // bit depth
        .put(2.toByte)  // color type: truecolor RGB
        .put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
        .putInt(0)      // CRC (unchecked)
      out.putInt(body.length).put("tEXt".getBytes("US-ASCII"))
        .put(body).putInt(0)
      out.putInt(0).put("IEND".getBytes("US-ASCII")).putInt(0)
      MediaRow(id, out.array())
    }.toDF("doc_id", "payload")
  }

  /** Pure-column variant of the stub metadata (whole-stage codegen).
    * The oracle-checked gate runs the REAL parser path
    * ([[withPngPayload]] → [[decodeMeta]]); this variant remains as the
    * SQL-expressible twin the plumbing spec compares [[stubDecode]]
    * against. */
  def decodeMetaColumns(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
      length(col("payload")).cast("long").as("bytes"),
      (length(col("payload")) % 640 + 16).as("width"),
      (length(col("payload")).cast("long") * 7 % 480 + 16).cast("int").as("height"),
      lit(3).as("channels"),
      lit("stub").as("format"))

  /**
   * STUB resize: emits the metadata a resize would produce (target
   * box, preserved aspect) without touching pixels.
   */
  def resizeMeta(meta: Dataset[MediaMeta], maxSide: Int = 256)
                (implicit spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions.{greatest => fGreatest}
    meta.toDF()
      .withColumn("scale",
        lit(maxSide) / fGreatest(col("width"), col("height")).cast("double"))
      .withColumn("out_width",
        when(col("scale") >= 1, col("width"))
          .otherwise(floor(col("width") * col("scale"))).cast("int"))
      .withColumn("out_height",
        when(col("scale") >= 1, col("height"))
          .otherwise(floor(col("height") * col("scale"))).cast("int"))
      .drop("scale")
  }

  /**
   * STUB frame sampler for video payloads: deterministic frame indices
   * at a fixed stride — the explode pattern a real sampler uses (one
   * output row per sampled frame, partition-local decode).
   */
  def sampleFrames(df: DataFrame, everyNth: Int = 10,
                   maxFrames: Int = 8): DataFrame = {
    val frameCount = (length(col("payload")) % 300 + 1).cast("int")
    df.select(col("doc_id"), frameCount.as("frame_count"))
      .withColumn("frame_idx", explode(slice(
        sequence(lit(0), col("frame_count") - 1, lit(everyNth)),
        1, maxFrames)))
  }

  /**
   * Synthesize a REAL (RIFF/fmt/data) 8-bit mono PCM WAV payload per
   * document: the sample stream is the UTF-8 text bytes, the sample
   * rate derives from the text length (rate = len%32000+8000) — so an
   * oracle can recompute everything the audio ops extract. The 44-byte
   * canonical header is fully populated (sizes, rates, block align);
   * [[realDecode]] parses it back like any WAV.
   */
  def withWavPayload(df: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val body = text.getBytes("UTF-8")
        val rate = body.length % 32000 + 8000
        val out = java.nio.ByteBuffer.allocate(44 + body.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        out.put("RIFF".getBytes("US-ASCII")).putInt(36 + body.length)
          .put("WAVE".getBytes("US-ASCII"))
        out.put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1)          // PCM
          .putShort(1)          // mono
          .putInt(rate)
          .putInt(rate)         // byte rate (8-bit mono)
          .putShort(1)          // block align
          .putShort(8)          // bits per sample
        out.put("data".getBytes("US-ASCII")).putInt(body.length).put(body)
        MediaRow(id, out.array())
      }.toDF("doc_id", "payload")
  }

  /** Per-audio analysis row: integer frame energies over the 8-bit
    * PCM stream (|sample − 128| summed per `frameSamples` block). */
  final case class AudioProfile(doc_id: Long, sample_rate: Int,
                                n_samples: Long, n_frames: Long,
                                total_energy: Long, peak_frame: Long,
                                peak_energy: Long)

  /** Locate the RIFF `data` chunk by real chunk traversal (fall back
    * to the raw payload for non-WAV input — dirty-data contract). */
  def pcmData(p: Array[Byte]): Array[Byte] = {
    if (p.length < 12 || p(0) != 'R' || p(1) != 'I' || p(2) != 'F' ||
        p(3) != 'F') return p
    var i = 12
    while (i + 8 <= p.length) {
      val len = leInt(p, i + 4)
      if (p(i) == 'd' && p(i + 1) == 'a' && p(i + 2) == 't' &&
          p(i + 3) == 'a' && len >= 0 && i + 8 + len <= p.length)
        return java.util.Arrays.copyOfRange(p, i + 8, i + 8 + len)
      i += 8 + math.max(0, len) + (len & 1) // chunks are word-aligned
    }
    p
  }

  /**
   * Frame-energy audio analysis — the audio face of [[dHash]]'s
   * "real math over the stubbed stream" stance: REAL RIFF chunk
   * traversal finds the PCM data, and the per-frame energies
   * (Σ|sample−128| over `frameSamples`-sample blocks, 8-bit unsigned
   * center 128) are the integer-exact signal a silence/clipping
   * filter would gate on. Peak frame ties break to the earliest.
   * `mapPartitions` batch shape; sample rate from the real header
   * parser. All integers → full SQL oracle.
   */
  def audioProfile(df: DataFrame, frameSamples: Int = 256,
                   batchSize: Int = 64): Dataset[AudioProfile] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.as[MediaRow].mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val meta = realDecode(r.doc_id, r.payload)
        val pcm = pcmData(r.payload)
        val n = pcm.length
        val nFrames = (n + frameSamples - 1) / frameSamples
        var total = 0L
        var peakFrame = 0L
        var peakEnergy = -1L
        var f = 0
        while (f < nFrames) {
          var e = 0L
          var i = f * frameSamples
          val end = math.min(n, i + frameSamples)
          while (i < end) {
            e += math.abs((pcm(i) & 0xff) - 128)
            i += 1
          }
          total += e
          if (e > peakEnergy) { peakEnergy = e; peakFrame = f }
          f += 1
        }
        AudioProfile(r.doc_id, meta.width, n.toLong, nFrames.toLong,
          total, peakFrame, math.max(0L, peakEnergy))
      })
    }
  }

  // ----------------------------------------------------------------
  // Perceptual image hashing. The HASH math (gradient dHash, DCT
  // pHash) is real; the pixel SOURCE is the documented stub — the
  // grayscale buffer is the PNG's embedded tEXt chunk data, located
  // by REAL chunk traversal (length-prefixed chunk walking, the same
  // parsing a pixel decoder starts with). Swapping [[grayBuffer]] for
  // an IDAT inflate + luma conversion changes nothing downstream.
  // ----------------------------------------------------------------

  /** Walk the PNG chunk list and return the first tEXt chunk's data —
    * the synthesized payloads' stand-in for decoded pixel bytes. Any
    * non-PNG or tEXt-less payload falls back to the raw bytes. */
  def grayBuffer(p: Array[Byte]): Array[Byte] = {
    if (p.length < 8 || (p(0) & 0xff) != 0x89 || p(1) != 'P') return p
    var i = 8
    while (i + 8 <= p.length) {
      val len = beInt(p, i)
      val isText = p(i + 4) == 't' && p(i + 5) == 'E' &&
        p(i + 6) == 'X' && p(i + 7) == 't'
      if (isText && len >= 0 && i + 8 + len <= p.length)
        return java.util.Arrays.copyOfRange(p, i + 8, i + 8 + len)
      i += 12 + math.max(0, len) // length + type + data + CRC
    }
    p
  }

  /** Deterministic `w`×`h` grayscale sample of a byte buffer: cell
    * (x,y) reads byte ⌊(y·w+x)·n/(w·h)⌋ (0 for an empty buffer) — a
    * nearest-neighbor downscale of the buffer viewed as a scanline
    * image, integer-exact so a SQL oracle can recompute it. */
  def sampleGray(buf: Array[Byte], w: Int, h: Int): Array[Int] = {
    val n = buf.length.toLong
    Array.tabulate(w * h)(cell =>
      if (n == 0L) 0 else buf(((cell * n) / (w * h)).toInt) & 0xff)
  }

  /** Per-image hash row: 64 bits split into two unsigned 32-bit
    * halves (hi = bits 32..63), sign-safe in every engine. */
  final case class ImageHash(doc_id: Long, width: Int, height: Int,
                             dhash_hi: Long, dhash_lo: Long)

  /**
   * Difference hash (dHash): 9×8 grayscale grid, bit (y·8+x) set iff
   * cell (x+1,y) is strictly brighter than (x,y). Integer-exact —
   * byte sampling + comparisons only — so the gate has a full DuckDB
   * oracle. Near-duplicate images differ in few bits; pair them with
   * [[imageNearDup]]. `mapPartitions` batch shape as [[decodeMeta]];
   * width/height come from the REAL header parser.
   */
  def dHash(df: DataFrame, batchSize: Int = 64): Dataset[ImageHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.as[MediaRow].mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val meta = realDecode(r.doc_id, r.payload)
        val g = sampleGray(grayBuffer(r.payload), 9, 8)
        var hi = 0L; var lo = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            if (g(y * 9 + x + 1) > g(y * 9 + x)) {
              val b = y * 8 + x
              if (b >= 32) hi |= 1L << (b - 32) else lo |= 1L << b
            }
            x += 1
          }
          y += 1
        }
        ImageHash(r.doc_id, meta.width, meta.height, hi, lo)
      })
    }
  }

  /**
   * Perceptual hash (pHash): 32×32 grayscale sample → 2-D DCT-II →
   * top-left 8×8 coefficient block → bit set iff the coefficient
   * exceeds the block's median. Robust to scaling/brightness where
   * dHash tracks local gradients. Float DCT is engine-specific, so
   * this op is spec-verified (determinism, self-similarity,
   * discrimination) rather than oracle-gated — the same policy as the
   * sketch profiles.
   */
  def pHash(df: DataFrame, batchSize: Int = 64): Dataset[ImageHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = 32
    df.as[MediaRow].mapPartitions { rows =>
      val cos = Array.tabulate(8, n)((u, i) =>
        math.cos((2 * i + 1) * u * math.Pi / (2.0 * n)))
      rows.grouped(batchSize).flatMap(_.map { r =>
        val meta = realDecode(r.doc_id, r.payload)
        val g = sampleGray(grayBuffer(r.payload), n, n)
        // 2-D DCT-II restricted to the 8×8 output block: row pass
        // (8×32 sums per image) then column pass
        val rowPass = Array.ofDim[Double](n, 8) // [y][u]
        var y = 0
        while (y < n) {
          var u = 0
          while (u < 8) {
            var s = 0.0; var i = 0
            while (i < n) { s += g(y * n + i) * cos(u)(i); i += 1 }
            rowPass(y)(u) = s; u += 1
          }
          y += 1
        }
        val coef = new Array[Double](64) // [v*8+u]
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            var s = 0.0; var j = 0
            while (j < n) { s += rowPass(j)(u) * cos(v)(j); j += 1 }
            coef(v * 8 + u) = s; u += 1
          }
          v += 1
        }
        val sorted = coef.sorted
        val median = (sorted(31) + sorted(32)) / 2.0
        var hi = 0L; var lo = 0L
        var b = 0
        while (b < 64) {
          if (coef(b) > median) {
            if (b >= 32) hi |= 1L << (b - 32) else lo |= 1L << b
          }
          b += 1
        }
        ImageHash(r.doc_id, meta.width, meta.height, hi, lo)
      })
    }
  }

  /**
   * Near-duplicate image pairs at Hamming distance ≤ `maxDist` over a
   * 64-bit perceptual hash — the pigeonhole band join of
   * `DedupOps.simhash` applied to image hashes: the 64 bits are cut
   * into `maxDist+1` blocks; any pair within `maxDist` agrees on at
   * least one whole block, so the per-block equi-join is lossless.
   * Input is the output of [[dHash]]/[[pHash]]; candidates are
   * verified with exact `bit_count` Hamming distance.
   */
  def imageNearDup(hashes: DataFrame, maxDist: Int = 4): DataFrame = {
    val blocks = maxDist + 1
    val h = shiftleft(col("dhash_hi"), 32).bitwiseOR(col("dhash_lo"))
    val width = 64 / blocks
    val withBlocks = hashes.select(col("doc_id"), h.as("__h"),
      posexplode(array((0 until blocks).map { b =>
        // block b covers bits [b*width, next) — last block absorbs
        // the 64 % blocks remainder
        val lo = b * width
        val hi = if (b == blocks - 1) 64 else lo + width
        shiftrightunsigned(shiftleft(h, 64 - hi), 64 - hi + lo)
      }: _*)).as(Seq("__blk", "__bv")))
    val l = withBlocks.select(col("doc_id").as("id_a"),
      col("__h").as("__ha"), col("__blk"), col("__bv"))
    val r = withBlocks.select(col("doc_id").as("id_b"),
      col("__h").as("__hb"), col("__blk"), col("__bv"))
    l.join(r, Seq("__blk", "__bv"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("__ha").bitwiseXOR(col("__hb"))))
      .filter(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming").distinct()
  }
}
