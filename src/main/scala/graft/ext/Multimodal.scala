package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Portable._

/** Multimodal-column handling: media as opaque `binary` payloads with
  * typed metadata, decoded/feature-extracted in batches.
  *
  * The IMAGE path is real: [[PngCodec]] encodes and decodes actual PNG
  * files through `javax.imageio` (in the JDK — no external dependency),
  * and m5 drives encode → binary column → decode → pixel statistics
  * end-to-end with a DuckDB oracle computing the SAME statistics
  * directly from the source bytes — a hash-match proves the codec
  * round-trip is bit-exact. For codecs the JDK lacks (JPEG is present
  * but lossy — no bit-exact oracle; audio/video need native libs), the
  * deterministic [[StubCodec]] remains, clearly marked, behind the same
  * partition-batched call shape a JNI codec would slot into.
  *
  * Payloads are synthesized from `documents.text` so the pipeline runs
  * on the driver-provided tables only.
  */
object Multimodal {

  type Q = (SparkSession, String) => DataFrame

  /** A media row: payload + metadata the pipeline carries untouched. */
  case class MediaRecord(doc_id: Long, data: Array[Byte], mime: String,
      width: Int, height: Int)

  /** Decoded features per media row. */
  case class MediaFeatures(doc_id: Long, n_bytes: Int, luma: Double,
      histogram: Array[Long])

  /** The stub decode kernel: deterministic byte statistics standing in
    * for a real image decode. Swap body for an actual codec; the
    * partition-batched call shape in [[decodeFeatures]] stays.
    */
  object StubCodec {
    def decode(rec: MediaRecord): MediaFeatures = {
      val hist = new Array[Long](16)
      var sum = 0L
      var i = 0
      while (i < rec.data.length) {
        val b = rec.data(i) & 0xff
        hist(b % 16) += 1
        sum += b
        i += 1
      }
      MediaFeatures(rec.doc_id, rec.data.length,
        if (rec.data.isEmpty) 0.0 else sum.toDouble / rec.data.length, hist)
    }
  }

  /** A REAL image codec on `javax.imageio` (JDK-built-in): grayscale
    * PNG encode/decode plus exact pixel statistics. PNG is lossless and
    * 8-bit gray has one sample per pixel, so the decoded samples are
    * bit-identical to the encoded ones — which is what lets m5 put a
    * DuckDB oracle on a genuine image round-trip: the oracle computes
    * the expected statistics from the source values directly, and only
    * an exact codec hash-matches it.
    */
  object PngCodec {
    /** Encode a row-major byte-per-pixel gray image as a real PNG. */
    def encodeGray(w: Int, h: Int, pixels: Array[Int]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, pixels(y * w + x) & 0xff)
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** Decode a PNG payload and compute exact pixel statistics: true
      * decoded dimensions, integer luma sum, and a 16-bin luma histogram
      * (bin = sample >> 4). Integer arithmetic throughout — no float
      * accumulation order to disagree with the oracle about.
      */
    def decode(rec: MediaRecord): MediaFeatures = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(rec.data))
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      val hist = new Array[Long](16)
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = raster.getSample(x, y, 0) & 0xff
          hist(v >> 4) += 1
          sum += v
          x += 1
        }
        y += 1
      }
      MediaFeatures(rec.doc_id, rec.data.length,
        if (w * h == 0) 0.0 else sum.toDouble / (w * h), hist)
    }
  }

  /** documents → REAL PNG payloads: each document renders to a small
    * grayscale image (pixel i = the document's (i mod len)-th character
    * code, low byte; empty text → all-zero image), encoded through
    * [[PngCodec]] inside `mapPartitions` — per-partition batching is
    * where a native codec amortizes its init, and the produced binary
    * column contains genuine PNG files (magic bytes spec-checked).
    * Dimensions are small and deterministic from doc_id so the m5
    * oracle's per-pixel reconstruction stays cheap at test scale.
    */
  def pngRecords(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"),
        ((col("doc_id") % 4 + 1) * 8).cast("int").as("width"),
        ((col("doc_id") % 3 + 1) * 6).cast("int").as("height"))
      // EXPLICIT fan-out before the codec pass (x23's argument): the
      // text frame is byte-tiny — a whole corpus shard fits one
      // maxPartitionBytes split, so without this every encode/decode
      // runs in ONE task — but codec work is CPU-dense per row. The
      // round-7 sweep measured m7 at exp 1.37 (serial tail) without the
      // repartition, 10x-parallel with it. At 100 TB byte volume forces
      // the fan-out anyway; this keeps the parallelism floor at test
      // byte sizes.
      .repartition(spark.sessionState.conf.numShufflePartitions)
      .as[(Long, String, Int, Int)]
      .mapPartitions { batch =>
        javax.imageio.ImageIO.setUseCache(false) // per-partition init
        batch.map { case (id, text, w, h) =>
          val cps = text.codePoints().toArray
          val px = Array.tabulate(w * h)(i =>
            if (cps.isEmpty) 0 else cps(i % cps.length) & 0xff)
          MediaRecord(id, PngCodec.encodeGray(w, h, px), "image/png", w, h)
        }
      }
  }

  /** documents → MediaRecord dataset (text bytes as payload; synthetic
    * but deterministic dimensions).
    */
  def mediaRecords(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("data"),
        lit("text/plain").as("mime"),
        ((col("doc_id") % 4 + 1) * 160).cast("int").as("width"),
        ((col("doc_id") % 3 + 1) * 120).cast("int").as("height"))
      .as[MediaRecord]
  }

  /** m3 — the typed decode pipeline: one `mapPartitions` pass, so a real
    * codec amortizes per-partition init (native lib load, scratch
    * buffers) across the batch — the shape that matters at 100 TB where
    * a per-row UDF would re-init per call. Dispatches on the mime
    * column: PNG payloads decode through the REAL [[PngCodec]]; other
    * types fall back to the byte-statistics stub.
    */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      javax.imageio.ImageIO.setUseCache(false) // per-partition init
      batch.map { rec =>
        if (rec.mime == "image/png") PngCodec.decode(rec)
        else StubCodec.decode(rec)
      }
    }
  }

  /** m3 (registered) — the mime DISPATCH through one decode pass: a
    * MIXED media column (even doc_ids render to genuine PNGs, odd ones
    * to raw 8-bit gray payloads of the same pixels) goes through
    * [[decodeFeatures]], whose per-partition batch dispatches each row
    * on `mime` — PNG through the real [[PngCodec]], raw bytes through
    * the [[StubCodec]] byte statistics. The pixel SUM is
    * branch-independent (both decoders see the same sample values), but
    * the histogram BINNING differs (codec bins by `v >> 4`, stub by
    * `b % 16`), so the checksum pins which decoder ran per row: a
    * misrouted mime cannot hash-match. The oracle reconstructs both
    * branches from the source characters with a CASE on the parity.
    */
  def decodeDispatch(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"),
        ((col("doc_id") % 4 + 1) * 8).cast("int").as("width"),
        ((col("doc_id") % 3 + 1) * 6).cast("int").as("height"))
      // same explicit fan-out as [[pngRecords]]: codec work is CPU-dense
      // while the text frame is byte-tiny
      .repartition(spark.sessionState.conf.numShufflePartitions)
      .as[(Long, String, Int, Int)]
      .mapPartitions { batch =>
        javax.imageio.ImageIO.setUseCache(false)
        batch.map { case (id, text, w, h) =>
          val cps = text.codePoints().toArray
          val px = Array.tabulate(w * h)(i =>
            if (cps.isEmpty) 0 else cps(i % cps.length) & 0xff)
          if (id % 2 == 0)
            MediaRecord(id, PngCodec.encodeGray(w, h, px), "image/png", w, h)
          else MediaRecord(id, px.map(_.toByte), "image/x-gray", w, h)
        }
      }
    decodeFeatures(media)
      .map { f =>
        (f.doc_id,
          // luma·Σhist recovers the exact integer sample sum (≤ 255·576,
          // exactly representable; the division ulp stays under round's
          // 0.5 — m5's argument)
          math.round(f.luma * f.histogram.sum),
          f.histogram.foldLeft(0L)((acc, h) => (acc * 31 + h) % P))
      }
      .toDF("doc_id", "luma_sum", "hist_checksum")
  }

  /** m8 — PERCEPTUAL image dedup (dHash through the real codec): decode
    * every PNG, reduce it to a 4×3 grid of tile luma sums inside the
    * decode pass, derive the 17-bit difference hash (9 horizontal + 8
    * vertical neighbor comparisons of tile sums), and assign each image
    * the MIN doc_id among same-dimension images with an identical hash —
    * the image-side twin of d1/d7's canonical assignment, and the step a
    * multimodal training pipeline runs to drop visually-duplicate crawl
    * images before captioning. Comparing tile SUMS is exact mean
    * comparison: the grid tiles an image of constant dims into
    * equal-pixel cells (w ≡ 0 mod 4, h ≡ 0 mod 3 by construction), so
    * the denominator cancels — no floats anywhere, the hash is
    * bit-portable. Scale shape mirrors m6: per-image work happens inside
    * `mapPartitions` where the codec batch-amortizes, only (doc_id, w,
    * h, 17-bit sig) rows reach the shuffle, and the canonical is one
    * window-min over the (w, h, sig) key — the same bucket-then-reduce
    * discipline as the LSH families (a hash bucket can never go
    * quadratic here because the reduction is min, not pairing). The
    * oracle reconstructs tile sums from the source characters by index
    * arithmetic (m6's technique) and re-derives the hash bit-for-bit:
    * a match proves decode, tile geometry, AND comparison order.
    */
  def phashDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sigs = pngRecords(spark, sfDir)
      .mapPartitions { batch =>
        javax.imageio.ImageIO.setUseCache(false)
        batch.map { rec =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(rec.data))
          val (w, h) = (img.getWidth, img.getHeight)
          val raster = img.getRaster
          val s = Array.ofDim[Long](3, 4)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              s(y * 3 / h)(x * 4 / w) += raster.getSample(x, y, 0) & 0xff
              x += 1
            }
            y += 1
          }
          var sig = 0L
          for (r <- 0 until 3; c <- 0 until 3)
            if (s(r)(c) > s(r)(c + 1)) sig |= 1L << (r * 3 + c)
          for (r <- 0 until 2; c <- 0 until 4)
            if (s(r)(c) > s(r + 1)(c)) sig |= 1L << (9 + r * 4 + c)
          (rec.doc_id, w.toLong, h.toLong, sig)
        }
      }
      .toDF("doc_id", "w", "h", "phash")
    sigs.withColumn("canonical",
      min("doc_id").over(Window.partitionBy("w", "h", "phash")))
  }

  // ---- oracle-checked projection queries --------------------------------

  /** m1 — media metadata extraction: byte length, header byte, synthetic
    * dimensions, and a content fingerprint feature. Pure scan projection.
    */
  def mediaMeta(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
      ascii(substring(col("text"), 1, 1)).cast("long").as("header_byte"),
      ((col("doc_id") % 4 + 1) * 160).as("width"),
      ((col("doc_id") % 3 + 1) * 120).as("height"),
      (tokenHash(col("text")) % 1000).as("content_feat"))

  /** m2 — frame sampling: every 8th byte position (a fixed-stride
    * keyframe grab), returning the sample count and an order-sensitive
    * checksum of the sampled bytes. A zero-length document yields an
    * empty frame list: Spark's `sequence` throws on start>stop with a
    * positive step, while DuckDB's `range(1, 1, 8)` is just empty — the
    * `when` guard keeps the engines in parity instead of crashing.
    */
  def frameSample(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        when(length(col("text")) > 0,
          transform(sequence(lit(1), length(col("text")), lit(8)),
            i => ascii(col("text").substr(i, lit(1))).cast("long")))
          .otherwise(array().cast("array<long>")).as("frames"))
      .select(col("doc_id"),
        size(col("frames")).cast("long").as("n_frames"),
        fold31(col("frames")).as("frame_checksum"))

  /** m5 — the REAL-codec round trip, oracle-checked: every document is
    * rendered to a genuine grayscale PNG ([[pngRecords]]), the PNG
    * binary column is decoded back through `javax.imageio`
    * ([[decodeFeatures]] → [[PngCodec.decode]]), and the query returns
    * the DECODED statistics — true width/height from the image header,
    * integer luma sum, and an order-sensitive checksum of the 16-bin
    * histogram. The DuckDB oracle never sees a PNG: it recomputes the
    * same statistics from the source characters directly, so the hash
    * only matches if the encode→decode round trip reproduced every
    * pixel exactly. PNG byte size is NOT emitted — encoder compression
    * levels are legitimately engine-specific, the pixels are the
    * contract (same discipline as r6's sketch bounds).
    */
  def pngRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    decodeFeatures(pngRecords(spark, sfDir))
      .map { f =>
        (f.doc_id, f.histogram.length.toLong,
          // luma·n_pixels recovers the exact integer sample sum: the sum
          // is ≤ 255·576 (exactly representable), so the division's ulp
          // error stays far under the 0.5 round() absorbs
          math.round(f.luma * f.histogram.sum),
          // same ordered polynomial fold as Portable.fold31 / fold31Sql
          f.histogram.foldLeft(0L)((acc, h) => (acc * 31 + h) % P))
      }
      .toDF("doc_id", "n_bins", "luma_sum", "hist_checksum")
  }

  /** m6 — REAL tile/patch extraction (the ViT-style patching step of an
    * image training pipeline): decode the PNG column, split every image
    * into its four half-width × half-height quadrants, and emit one row
    * per (doc, tile) with the tile's pixel count and integer luma sum.
    * All rendered dimensions are even, so the quadrants partition the
    * pixel grid exactly. Tiling happens INSIDE the decode
    * `mapPartitions` pass — at 100 TB the payload is decoded once and
    * every derived patch row leaves the codec batch already reduced
    * (count + sum), instead of materializing per-patch pixel arrays
    * into the shuffle. The oracle reconstructs each quadrant from the
    * source characters by index arithmetic — a hash match proves decode
    * + tile geometry, not just totals (tile sums pin WHERE every pixel
    * landed, modulo within-tile permutations m5's total already
    * constrains).
    */
  def tileStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    pngRecords(spark, sfDir)
      .mapPartitions { batch =>
        javax.imageio.ImageIO.setUseCache(false)
        batch.flatMap { rec =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(rec.data))
          val (w, h) = (img.getWidth, img.getHeight)
          val raster = img.getRaster
          val n = new Array[Long](4)
          val s = new Array[Long](4)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val t = (if (y >= h / 2) 2 else 0) + (if (x >= w / 2) 1 else 0)
              n(t) += 1
              s(t) += raster.getSample(x, y, 0) & 0xff
              x += 1
            }
            y += 1
          }
          (0 until 4).map(t => (rec.doc_id, t.toLong, n(t), s(t)))
        }
      }
      .toDF("doc_id", "tile", "tile_px", "tile_luma")
  }

  /** m7 — REAL resize through the real codec: decode the PNG, 2x
    * nearest-neighbor downscale (output pixel (x,y) = source pixel
    * (2x,2y) — an actual image-scaling kernel, exactly the deterministic
    * member of the resize family), re-encode the result as a genuine
    * PNG, decode THAT, and emit the resized dimensions, integer luma
    * sum, and an order-sensitive checksum of the resized pixels. Two
    * full encode→decode trips guard the second round too. The oracle
    * reconstructs the expected resized pixels straight from the source
    * characters (source index (2y)·w + 2x), so the hash only matches if
    * both codec passes and the sampling geometry are exact.
    */
  def resizeReal(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    pngRecords(spark, sfDir)
      .mapPartitions { batch =>
        javax.imageio.ImageIO.setUseCache(false)
        batch.map { rec =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(rec.data))
          val (w, h) = (img.getWidth, img.getHeight)
          val (w2, h2) = (w / 2, h / 2)
          val raster = img.getRaster
          val small = Array.tabulate(w2 * h2) { i =>
            raster.getSample((i % w2) * 2, (i / w2) * 2, 0) & 0xff
          }
          // the real re-encode: the resized image goes through the codec
          val png2 = PngCodec.encodeGray(w2, h2, small)
          val img2 = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(png2))
          val r2 = img2.getRaster
          var sum = 0L
          var chk = 0L
          var i = 0
          while (i < w2 * h2) {
            val v = r2.getSample(i % w2, i / w2, 0) & 0xff
            sum += v
            chk = (chk * 31 + v) % P
            i += 1
          }
          (rec.doc_id, img2.getWidth.toLong, img2.getHeight.toLong, sum, chk)
        }
      }
      .toDF("doc_id", "out_w", "out_h", "luma_sum", "px_checksum")
  }

  /** m9 — MEDIA INTEGRITY AUDIT through the REAL codec: deterministic
    * fault injection (every 13th payload truncated mid-header, every
    * 13th-shifted-by-5 with its magic bytes flipped) over genuine PNG
    * payloads, then a decode pass that CLASSIFIES each row — `ok` only
    * if the payload decodes AND the decoded dimensions match the
    * declared metadata. The multimodal twin of o15's parse-DLQ: a crawl
    * delivers corrupt bytes; the ingest must find them BEFORE a
    * training job does, and the classification must come from the
    * codec, not from trusting the metadata.
    *
    * Corruption classes are chosen to fail differently inside the
    * decoder (truncation kills the stream mid-IHDR; a flipped magic
    * leaves no registered reader → `ImageIO.read` returns null), so
    * the catch-all classification is exercised on both paths. The
    * oracle states the fault-injection schedule — a hash match proves
    * the codec caught EXACTLY the injected faults, no false alarms.
    * Same mapPartitions batching + explicit fan-out as every codec
    * pass (CPU-dense, byte-tiny input).
    */
  def decodeAudit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"),
        ((col("doc_id") % 4 + 1) * 8).cast("int").as("width"),
        ((col("doc_id") % 3 + 1) * 6).cast("int").as("height"))
      .repartition(spark.sessionState.conf.numShufflePartitions)
      .as[(Long, String, Int, Int)]
      .mapPartitions { batch =>
        javax.imageio.ImageIO.setUseCache(false)
        batch.map { case (id, text, w, h) =>
          val cps = text.codePoints().toArray
          val px = Array.tabulate(w * h)(i =>
            if (cps.isEmpty) 0 else cps(i % cps.length) & 0xff)
          val clean = PngCodec.encodeGray(w, h, px)
          val data =
            if (id % 13 == 0) clean.take(12) // truncated mid-IHDR
            else if (id % 13 == 5) {         // magic bytes flipped
              val d = clean.clone(); d(0) = (d(0) ^ 0xff).toByte; d
            } else clean
          val status =
            try {
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(data))
              if (img == null) "corrupt"
              else if (img.getWidth == w && img.getHeight == h) "ok"
              else "dim_mismatch"
            } catch { case scala.util.control.NonFatal(_) => "corrupt" }
          (id, status)
        }
      }
      .toDF("doc_id", "status")
  }

  /** m10 threshold: images whose mean per-edge gradient falls below this
    * fraction of full scale (ppm of 255) are flagged blurry — the
    * low-information screen an image-curation pass runs before training.
    */
  private[graft] val BlurPpm = 120000L

  /** m10 — SHARPNESS/BLUR audit through the REAL codec: decode the PNG
    * and accumulate the image's TOTAL VARIATION — Σ |p(x+1,y) − p(x,y)|
    * + Σ |p(x,y+1) − p(x,y)| over the pixel grid — the integral
    * gradient-energy proxy every image-quality filter uses (the
    * variance-of-Laplacian family, in its exactly-integer member).
    * `sharp_ppm` normalizes by the edge count × 255 (the maximum
    * possible per-edge gradient) so the verdict is size-independent;
    * `blurry` flags images under [[BlurPpm]]. The oracle re-derives
    * every gradient from the source characters by index arithmetic
    * (m6's technique) — a hash match proves the codec path AND the
    * neighbor geometry, not just a total.
    *
    * Scale: the reduction happens inside the decode `mapPartitions`
    * batch — per image only a 6-column row leaves the codec pass, so at
    * 100 TB the shuffle carries statistics, never pixels.
    */
  def blurAudit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    pngRecords(spark, sfDir)
      .mapPartitions { batch =>
        javax.imageio.ImageIO.setUseCache(false)
        batch.map { rec =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(rec.data))
          val (w, h) = (img.getWidth, img.getHeight)
          val raster = img.getRaster
          var tv = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = raster.getSample(x, y, 0) & 0xff
              if (x < w - 1)
                tv += math.abs((raster.getSample(x + 1, y, 0) & 0xff) - v)
              if (y < h - 1)
                tv += math.abs((raster.getSample(x, y + 1, 0) & 0xff) - v)
              x += 1
            }
            y += 1
          }
          val edges = (w - 1).toLong * h + w.toLong * (h - 1)
          val ppm = if (edges == 0) 0L else tv * 1000000L / (edges * 255L)
          (rec.doc_id, w.toLong, h.toLong, tv, ppm)
        }
      }
      .toDF("doc_id", "w", "h", "tv", "sharp_ppm")
      .withColumn("blurry", col("sharp_ppm") < BlurPpm)
  }

  // ---- m11: REAL audio (WAV) path ----------------------------------------

  /** A REAL audio codec on `javax.sound.sampled` (JDK-built-in, no audio
    * hardware needed for stream I/O): 16-bit mono little-endian PCM
    * encode/decode through genuine RIFF/WAVE files. PCM-in-WAV is
    * lossless, so decoded samples are bit-identical to the encoded ones
    * — the same property that lets m5 oracle a PNG round trip lets m11
    * oracle an AUDIO one: the DuckDB side recomputes the frame
    * statistics from the synthesis arithmetic, and only an exact codec
    * round trip hash-matches.
    */
  object WavCodec {
    // 8 kHz, 16-bit, mono, signed, little-endian PCM
    private val SampleRate = 8000
    private val BitsPerSample = 16
    private val BlockAlign = 2 // mono * 16-bit

    /** Encode as a canonical 44-byte-header RIFF/WAVE file — the exact
      * byte layout `javax.sound.sampled.AudioSystem.write(…, WAVE, …)`
      * produces for this format (`MultimodalSpec` proves byte equality
      * against the JDK writer). Hand-rolled rather than routed through
      * `AudioSystem` because the JDK entry points re-resolve their
      * provider registry on EVERY call (`JDK13Services.getProviders`
      * takes a global lock and re-instantiates providers): under
      * local[32] the m11/m12 codec passes measured 32 threads running
      * encode+decode SLOWER than one thread (1.7 s vs 1.0 s wall for the
      * sf0.1 volume — ~55 s of task time for ~1 s of actual work). A
      * plain byte-layout writer has no shared state at all.
      */
    def encodePcm(samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val out = new Array[Byte](44 + dataLen)
      def putTag(off: Int, s: String): Unit = {
        out(off) = s.charAt(0).toByte; out(off + 1) = s.charAt(1).toByte
        out(off + 2) = s.charAt(2).toByte; out(off + 3) = s.charAt(3).toByte
      }
      def putIntLE(off: Int, v: Int): Unit = {
        out(off) = (v & 0xff).toByte
        out(off + 1) = ((v >> 8) & 0xff).toByte
        out(off + 2) = ((v >> 16) & 0xff).toByte
        out(off + 3) = ((v >> 24) & 0xff).toByte
      }
      def putShortLE(off: Int, v: Int): Unit = {
        out(off) = (v & 0xff).toByte
        out(off + 1) = ((v >> 8) & 0xff).toByte
      }
      putTag(0, "RIFF"); putIntLE(4, 36 + dataLen); putTag(8, "WAVE")
      putTag(12, "fmt "); putIntLE(16, 16) // PCM fmt chunk is 16 bytes
      putShortLE(20, 1) // audio format: PCM
      putShortLE(22, 1) // channels: mono
      putIntLE(24, SampleRate)
      putIntLE(28, SampleRate * BlockAlign) // byte rate
      putShortLE(32, BlockAlign)
      putShortLE(34, BitsPerSample)
      putTag(36, "data"); putIntLE(40, dataLen)
      var i = 0
      while (i < samples.length) {
        out(44 + 2 * i) = (samples(i) & 0xff).toByte
        out(44 + 2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      out
    }

    /** Decode a RIFF/WAVE payload: validate the RIFF/WAVE magic, walk
      * the chunk list (chunks may appear in any order and carry padding,
      * per the RIFF spec — the JDK writer emits fmt then data, but the
      * reader must not assume that), and pull the 16-bit LE samples out
      * of the `data` chunk. Same chunk-walking contract as the JDK
      * reader, minus its per-call provider-registry lock (see
      * [[encodePcm]]).
      */
    def decodePcm(wav: Array[Byte]): Array[Short] = {
      def tag(off: Int): String =
        new String(wav, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      def intLE(off: Int): Int =
        (wav(off) & 0xff) | ((wav(off + 1) & 0xff) << 8) |
          ((wav(off + 2) & 0xff) << 16) | ((wav(off + 3) & 0xff) << 24)
      require(wav.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE",
        "not a RIFF/WAVE payload")
      var off = 12
      while (off + 8 <= wav.length) {
        val chunkLen = intLE(off + 4)
        if (tag(off) == "data") {
          val dataOff = off + 8
          val len = math.min(chunkLen, wav.length - dataOff)
          val samples = new Array[Short](len / 2)
          var i = 0
          while (i < samples.length) {
            samples(i) = (((wav(dataOff + 2 * i + 1) & 0xff) << 8) |
              (wav(dataOff + 2 * i) & 0xff)).toShort
            i += 1
          }
          return samples
        }
        off += 8 + chunkLen + (chunkLen & 1) // chunks are word-aligned
      }
      throw new IllegalArgumentException("WAVE payload has no data chunk")
    }
  }

  private val WavFrame = 256
  /** A frame is silent when its mean |amplitude| < 100 — masked frames
    * are exactly zero and active frames average ~2^14, so the margin is
    * ~160x on both sides.
    */
  private val WavSilentSum = 100L * WavFrame

  /** documents → REAL WAV payloads: each document synthesizes
    * `(doc_id mod 4 + 1)·512` PCM samples — sample i =
    * `((cp(i mod len)·257 + i·31) mod 65536) − 32768` gated by an
    * every-third-frame silence mask (`(i DIV 256) mod 3 = 0` → 0) — so
    * every clip carries both silent and active frames, and the whole
    * signal is integer arithmetic the oracle can replay. Encoded through
    * [[WavCodec]] inside `mapPartitions` after the same explicit fan-out
    * as [[pngRecords]] (codec work is CPU-dense per row while the text
    * frame is byte-tiny).
    */
  def wavRecords(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"),
        ((col("doc_id") % 4 + 1) * 512).cast("int").as("n"))
      .repartition(spark.sessionState.conf.numShufflePartitions)
      .as[(Long, String, Int)]
      .mapPartitions { batch =>
        batch.map { case (id, text, n) =>
          val cps = text.codePoints().toArray
          val samples = Array.tabulate(n) { i =>
            if ((i / WavFrame) % 3 == 0) 0.toShort
            else {
              val cp = if (cps.isEmpty) 0 else cps(i % cps.length) & 0xff
              ((cp * 257 + i * 31) % 65536 - 32768).toShort
            }
          }
          MediaRecord(id, WavCodec.encodePcm(samples), "audio/wav", n, 1)
        }
      }
  }

  /** m11 — WAV frame-energy audit (the VAD/silence screen of an audio
    * training pipeline): decode the WAV column through the real codec
    * and emit per clip the frame count, silent-frame count, total
    * absolute amplitude, and peak — the numbers that drive
    * keep/trim/drop decisions on speech corpora. Statistics are
    * integers accumulated INSIDE the decode batch (like m6): only five
    * longs per clip leave the codec pass, never sample arrays. The
    * oracle replays the synthesis arithmetic per (doc, frame) and
    * aggregates the same stats — a hash match proves the encode → RIFF
    * container → decode loop returned every sample bit-exactly.
    */
  def wavEnergy(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    wavRecords(spark, sfDir)
      .mapPartitions { batch =>
        batch.map { rec =>
          val s = WavCodec.decodePcm(rec.data)
          var (sumAbs, peak, nSilent) = (0L, 0L, 0L)
          var f = 0
          while (f < s.length / WavFrame) {
            var fs = 0L
            var i = f * WavFrame
            while (i < (f + 1) * WavFrame) {
              val a = math.abs(s(i).toLong)
              fs += a
              if (a > peak) peak = a
              i += 1
            }
            if (fs < WavSilentSum) nSilent += 1
            sumAbs += fs
            f += 1
          }
          (rec.doc_id, s.length.toLong, (s.length / WavFrame).toLong,
            nSilent, sumAbs, peak)
        }
      }
      .toDF("doc_id", "n_samples", "n_frames", "n_silent", "sum_abs",
        "peak_abs")
  }

  /** documents → tonal WAV payloads for m12: each frame carries a SQUARE
    * wave of period `4·2^((doc_id+frame) mod 4)` ∈ {4,8,16,32} samples at
    * amplitude `8000 + (doc_id mod 7)·1000` — periodic integer signals
    * whose true pitch the oracle knows from the synthesis rule alone.
    * Frame length 256 is a multiple of every period, so the CIRCULAR
    * autocorrelation at the true period equals the zero-lag energy
    * exactly, and at no smaller lag (a half-high/half-low square's
    * minimal period is its full period) — the argmax-with-smallest-lag
    * detector is provably exact on this family.
    */
  def wavToneRecords(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), ((col("doc_id") % 4 + 1) * 512).cast("int").as("n"))
      .repartition(spark.sessionState.conf.numShufflePartitions)
      .as[(Long, Int)]
      .mapPartitions { batch =>
        batch.map { case (id, n) =>
          val amp = (8000 + (id % 7) * 1000).toInt
          val samples = Array.tabulate(n) { i =>
            val f = i / WavFrame
            val p = 4 << ((id + f) % 4).toInt
            (if (i % p < p / 2) amp else -amp).toShort
          }
          MediaRecord(id, WavCodec.encodePcm(samples), "audio/wav", n, 1)
        }
      }
  }

  /** m12 — PITCH detection through the real audio codec: decode each
    * clip, and per 256-sample frame run an integer circular-
    * autocorrelation argmax over lags 1..32 (smallest lag attaining the
    * max wins — the textbook pitch tracker, in exact 64-bit arithmetic:
    * no FFT, no floats). Output is the clip's pitch histogram
    * (detected period → frame count) plus the peak amplitude seen at
    * that pitch. The oracle computes the TRUE period and amplitude from
    * the synthesis rule per (doc, frame) — so a hash match proves the
    * encode → RIFF → decode loop is bit-exact AND the detector recovers
    * every frame's pitch, the m5 round-trip discipline extended to a
    * real DSP kernel. Cost shape is m11's: ~256·32 multiplies per frame
    * inside the decode batch, four longs per (clip, period) leaving it.
    */
  /** The per-frame pitch kernel: circular autocorrelation argmax over
    * lags 1..32, smallest lag wins ties; returns (period, peak |amp|).
    * Exposed so the spec can drive it on waveforms OUTSIDE the synthesis
    * family (proof it measures the signal, not the generation rule).
    */
  private[ext] def detectPeriod(s: Array[Short], base: Int): (Long, Long) = {
    var bestLag = 0L
    var bestR = Long.MinValue
    var peak = 0L
    var lag = 1
    while (lag <= 32) {
      var r = 0L
      var i = 0
      while (i < WavFrame) {
        val a = s(base + i).toLong
        val b = s(base + (i + lag) % WavFrame).toLong
        r += a * b
        if (lag == 1 && math.abs(a) > peak) peak = math.abs(a)
        i += 1
      }
      if (r > bestR) { bestR = r; bestLag = lag.toLong }
      lag += 1
    }
    (bestLag, peak)
  }

  def pitchDetect(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    wavToneRecords(spark, sfDir)
      .mapPartitions { batch =>
        batch.flatMap { rec =>
          val s = WavCodec.decodePcm(rec.data)
          val nFrames = s.length / WavFrame
          val hist = scala.collection.mutable.Map.empty[Long, (Long, Long)]
          var f = 0
          while (f < nFrames) {
            val (p, peak) = detectPeriod(s, f * WavFrame)
            val (n0, p0) = hist.getOrElse(p, (0L, 0L))
            hist(p) = (n0 + 1L, math.max(p0, peak))
            f += 1
          }
          hist.toSeq.map { case (p, (n, pk)) => (rec.doc_id, p, n, pk) }
        }
      }
      .toDF("doc_id", "period", "n_frames", "peak_abs")
  }

  val queries: Map[String, Q] = Map(
    "m12_pitch_detect" -> (pitchDetect _),
    "m11_wav_energy" -> (wavEnergy _),
    "m10_blur_audit" -> (blurAudit _),
    "m9_decode_audit" -> (decodeAudit _),
    "m1_media_meta" -> (mediaMeta _),
    "m2_frame_sample" -> (frameSample _),
    "m3_decode_dispatch" -> (decodeDispatch _),
    "m5_png_roundtrip" -> (pngRoundtrip _),
    "m6_tile_stats" -> (tileStats _),
    "m7_resize_real" -> (resizeReal _),
    "m8_phash_dedup" -> (phashDedup _)
  )

  val oracle: Map[String, String] = Map(
    // the synthesis arithmetic replayed per (doc, sample), aggregated at
    // frame then clip grain — matches only if the WAV loop is bit-exact
    // the TRUTH side of m12: period and amplitude straight from the
    // synthesis rule — matching means codec round trip AND detector are
    // both exact on every frame
    "m12_pitch_detect" ->
      """WITH f AS (
        |  SELECT doc_id, t.f AS frame,
        |    CASE CAST((doc_id + t.f) % 4 AS INTEGER)
        |      WHEN 0 THEN 4 WHEN 1 THEN 8 WHEN 2 THEN 16 ELSE 32
        |    END AS period
        |  FROM documents, range(8) t(f)
        |  WHERE t.f < (doc_id % 4 + 1) * 2)
        |SELECT doc_id, CAST(period AS BIGINT) AS period,
        |  CAST(count(*) AS BIGINT) AS n_frames,
        |  CAST(8000 + (doc_id % 7) * 1000 AS BIGINT) AS peak_abs
        |FROM f GROUP BY doc_id, period""".stripMargin,
    "m11_wav_energy" ->
      s"""WITH d AS (
         |  SELECT doc_id, text, (doc_id % 4 + 1) * 512 AS n FROM documents),
         |s AS (SELECT doc_id, text, unnest(range(0, n)) AS i FROM d),
         |v AS (
         |  SELECT doc_id, i // $WavFrame AS frame,
         |    CASE WHEN (i // $WavFrame) % 3 = 0 THEN 0
         |         ELSE (((CASE WHEN length(text) = 0 THEN 0
         |                  ELSE ascii(substring(text,
         |                    CAST(i % length(text) AS INTEGER) + 1, 1)) % 256
         |                  END)
         |                * 257 + i * 31) % 65536) - 32768 END AS samp
         |  FROM s),
         |f AS (
         |  SELECT doc_id, frame, sum(abs(samp)) AS fsum,
         |    max(abs(samp)) AS fpeak
         |  FROM v GROUP BY 1, 2)
         |SELECT doc_id,
         |  CAST(count(*) * $WavFrame AS BIGINT) AS n_samples,
         |  CAST(count(*) AS BIGINT) AS n_frames,
         |  CAST(sum(CASE WHEN fsum < $WavSilentSum THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_silent,
         |  CAST(sum(fsum) AS BIGINT) AS sum_abs,
         |  CAST(max(fpeak) AS BIGINT) AS peak_abs
         |FROM f GROUP BY doc_id""".stripMargin,
    // every gradient re-derived from the source characters by index
    // arithmetic; p is the 1-based pixel list, pixel i = p[i+1]
    "m10_blur_audit" ->
      s"""WITH d AS (
         |  SELECT doc_id, text, len(text) AS n,
         |    (doc_id % 4 + 1) * 8 AS w, (doc_id % 3 + 1) * 6 AS h
         |  FROM documents),
         |px AS (
         |  SELECT doc_id, w, h,
         |    list_transform(range(0, w * h), i ->
         |      CASE WHEN n = 0 THEN 0
         |           ELSE CAST(ascii(substring(text, CAST(i % n + 1 AS INTEGER), 1)) % 256 AS BIGINT)
         |           END) AS p
         |  FROM d),
         |tvc AS (
         |  SELECT doc_id, CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
         |    CAST(list_sum(list_transform(range(0, w * h), i ->
         |      (CASE WHEN i % w < w - 1 THEN abs(p[CAST(i + 2 AS INTEGER)] - p[CAST(i + 1 AS INTEGER)]) ELSE 0 END)
         |      + (CASE WHEN i // w < h - 1 THEN abs(p[CAST(i + w + 1 AS INTEGER)] - p[CAST(i + 1 AS INTEGER)]) ELSE 0 END)))
         |      AS BIGINT) AS tv
         |  FROM px)
         |SELECT doc_id, w, h, tv,
         |  tv * 1000000 // (((w - 1) * h + w * (h - 1)) * 255) AS sharp_ppm,
         |  tv * 1000000 // (((w - 1) * h + w * (h - 1)) * 255) < $BlurPpm AS blurry
         |FROM tvc""".stripMargin,
    // the fault-injection schedule IS the oracle: the codec must flag
    // exactly the injected rows (no false alarms, no misses)
    "m9_decode_audit" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 13 IN (0, 5) THEN 'corrupt' ELSE 'ok' END AS status
        |FROM documents""".stripMargin,
    "m1_media_meta" ->
      s"""SELECT doc_id,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |  CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS header_byte,
         |  (doc_id % 4 + 1) * 160 AS width,
         |  (doc_id % 3 + 1) * 120 AS height,
         |  ${tokenHashSql("text")} % 1000 AS content_feat
         |FROM documents""".stripMargin,
    "m2_frame_sample" ->
      s"""SELECT doc_id,
         |  CAST(len(frames) AS BIGINT) AS n_frames,
         |  ${fold31Sql("frames")} AS frame_checksum
         |FROM (
         |  SELECT doc_id,
         |    list_transform(range(1, len(text) + 1, 8),
         |      i -> CAST(ascii(substring(text, CAST(i AS INTEGER), 1)) AS BIGINT)) AS frames
         |  FROM documents)""".stripMargin,
    // both dispatch branches reconstructed from the source characters:
    // the pixel sum is branch-independent, the histogram binning CASEs
    // on the parity (codec `v // 16` vs stub `v % 16`) — a misrouted
    // mime cannot hash-match
    "m3_decode_dispatch" -> {
      val binsPng = "list_transform(range(0, 16), b -> " +
        "CAST(len(list_filter(pixels, v -> v // 16 = b)) AS BIGINT))"
      val binsStub = "list_transform(range(0, 16), b -> " +
        "CAST(len(list_filter(pixels, v -> v % 16 = b)) AS BIGINT))"
      s"""WITH d AS (
         |  SELECT doc_id, text, len(text) AS n,
         |    (doc_id % 4 + 1) * 8 * ((doc_id % 3 + 1) * 6) AS n_px
         |  FROM documents),
         |p AS (
         |  SELECT doc_id,
         |    list_transform(range(0, n_px),
         |      i -> CASE WHEN n = 0 THEN 0
         |           ELSE ascii(substring(text, CAST(i % n + 1 AS INTEGER), 1)) % 256
         |           END) AS pixels
         |  FROM d)
         |SELECT doc_id,
         |  CAST(list_sum(list_transform(pixels, v -> CAST(v AS BIGINT))) AS BIGINT)
         |    AS luma_sum,
         |  CASE WHEN doc_id % 2 = 0 THEN ${fold31Sql(binsPng)}
         |       ELSE ${fold31Sql(binsStub)} END AS hist_checksum
         |FROM p""".stripMargin
    },
    // the oracle never decodes a PNG: it reconstructs the pixel list
    // from the source characters (pixel i = codepoint at i mod len, low
    // byte — exactly how pngRecords rendered the image) and computes the
    // same integer statistics; only an exact codec round trip matches
    "m5_png_roundtrip" -> {
      val bins = "list_transform(range(0, 16), b -> " +
        "CAST(len(list_filter(pixels, v -> v // 16 = b)) AS BIGINT))"
      s"""WITH d AS (
         |  SELECT doc_id, text, len(text) AS n,
         |    (doc_id % 4 + 1) * 8 * ((doc_id % 3 + 1) * 6) AS n_px
         |  FROM documents),
         |p AS (
         |  SELECT doc_id,
         |    list_transform(range(0, n_px),
         |      i -> CASE WHEN n = 0 THEN 0
         |           ELSE ascii(substring(text, CAST(i % n + 1 AS INTEGER), 1)) % 256
         |           END) AS pixels
         |  FROM d)
         |SELECT doc_id,
         |  CAST(16 AS BIGINT) AS n_bins,
         |  CAST(list_sum(list_transform(pixels, v -> CAST(v AS BIGINT))) AS BIGINT)
         |    AS luma_sum,
         |  ${fold31Sql(bins)} AS hist_checksum
         |FROM p""".stripMargin
    },
    // quadrant membership from index arithmetic over the reconstructed
    // pixel list: row = i // w, col = i % w
    "m6_tile_stats" ->
      s"""WITH d AS (
         |  SELECT doc_id, text, len(text) AS n,
         |    (doc_id % 4 + 1) * 8 AS w, (doc_id % 3 + 1) * 6 AS h
         |  FROM documents),
         |t AS (
         |  SELECT doc_id, text, n, w, h, r.tile,
         |    list_filter(range(0, w * h), i ->
         |      (CASE WHEN i // w >= h // 2 THEN 2 ELSE 0 END
         |       + CASE WHEN i % w >= w // 2 THEN 1 ELSE 0 END) = r.tile) AS idx
         |  FROM d CROSS JOIN range(4) r(tile))
         |SELECT doc_id, CAST(tile AS BIGINT) AS tile,
         |  CAST(len(idx) AS BIGINT) AS tile_px,
         |  CAST(list_sum(list_transform(idx, i ->
         |    CASE WHEN n = 0 THEN 0
         |         ELSE CAST(ascii(substring(text, CAST(i % n + 1 AS INTEGER), 1)) % 256 AS BIGINT)
         |         END)) AS BIGINT) AS tile_luma
         |FROM t""".stripMargin,
    // tile sums from index arithmetic (m6's technique), then the same 17
    // neighbor comparisons in the same bit positions; `ss` is the
    // tile-sum list in tile order (tile = row*4 + col, 1-based indexing)
    "m8_phash_dedup" -> {
      val hbits = (for (r <- 0 until 3; c <- 0 until 3) yield
        s"(CASE WHEN ss[${r * 4 + c + 1}] > ss[${r * 4 + c + 2}] THEN ${1L << (r * 3 + c)} ELSE 0 END)")
        .mkString(" + ")
      val vbits = (for (r <- 0 until 2; c <- 0 until 4) yield
        s"(CASE WHEN ss[${r * 4 + c + 1}] > ss[${(r + 1) * 4 + c + 1}] THEN ${1L << (9 + r * 4 + c)} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH d AS (
         |  SELECT doc_id, text, len(text) AS n,
         |    (doc_id % 4 + 1) * 8 AS w, (doc_id % 3 + 1) * 6 AS h
         |  FROM documents),
         |t AS (
         |  SELECT doc_id, w, h, r.t AS tile,
         |    CAST(list_sum(list_transform(
         |      list_filter(range(0, w * h), i ->
         |        ((i // w) * 3 // h) * 4 + ((i % w) * 4 // w) = r.t),
         |      i -> CASE WHEN n = 0 THEN 0
         |           ELSE CAST(ascii(substring(text, CAST(i % n + 1 AS INTEGER), 1)) % 256 AS BIGINT)
         |           END)) AS BIGINT) AS s
         |  FROM d CROSS JOIN range(12) r(t)),
         |sig AS (
         |  SELECT doc_id, CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
         |    CAST($hbits + $vbits AS BIGINT) AS phash
         |  FROM (SELECT doc_id, w, h, list(s ORDER BY tile) AS ss
         |        FROM t GROUP BY doc_id, w, h))
         |SELECT doc_id, w, h, phash,
         |  min(doc_id) OVER (PARTITION BY w, h, phash) AS canonical
         |FROM sig""".stripMargin
    },
    // expected resized pixel i = source pixel at (2·(i//w2))·w + 2·(i%w2)
    "m7_resize_real" -> {
      val px = "px"
      s"""WITH d AS (
         |  SELECT doc_id, text, len(text) AS n,
         |    (doc_id % 4 + 1) * 8 AS w, (doc_id % 3 + 1) * 6 AS h
         |  FROM documents),
         |p AS (
         |  SELECT doc_id, w // 2 AS w2, h // 2 AS h2,
         |    list_transform(range(0, (w // 2) * (h // 2)),
         |      i -> CASE WHEN n = 0 THEN 0
         |           ELSE ascii(substring(text,
         |             CAST(((i // (w // 2)) * 2 * w + (i % (w // 2)) * 2) % n + 1 AS INTEGER),
         |             1)) % 256
         |           END) AS px
         |  FROM d)
         |SELECT doc_id, CAST(w2 AS BIGINT) AS out_w, CAST(h2 AS BIGINT) AS out_h,
         |  CAST(list_sum(list_transform(px, v -> CAST(v AS BIGINT))) AS BIGINT)
         |    AS luma_sum,
         |  ${fold31Sql(px)} AS px_checksum
         |FROM p""".stripMargin
    }
  )
}
