package graft.llm

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract
  * run as batched per-partition functions (the JVM analog of arrow-batched
  * Python UDFs — same batch shape, same schema contract).
  *
  * Image and audio decode are REAL: payloads whose magic bytes identify a
  * JDK-decodable format go through `javax.imageio` (PNG/BMP/GIF/JPEG →
  * pixel stats) or `javax.sound.sampled` (RIFF/WAVE PCM → sample stats);
  * any other payload falls back to a deterministic byte-signature (the
  * plumbing-test path — video codecs don't ship with the JDK, so video
  * stays signature + frame-sampling plumbing).
  *
  * Scale notes: payload bytes never pass through a shuffle — media
  * operators are projection-shaped (mapPartitions after pruning to the
  * columns needed), so a 100 TB media table streams partition-by-partition
  * with memory bounded by one batch. Repartition BEFORE attaching payloads
  * when the downstream needs a different layout.
  */
object Multimodal {

  val mediaMetaType: StructType = new StructType()
    .add("kind", StringType)        // image | audio | video
    .add("width", IntegerType)      // image/video
    .add("height", IntegerType)
    .add("sample_rate_hz", IntegerType) // audio
    .add("n_frames", IntegerType)   // video

  /** Attach a synthetic binary payload + metadata to a text table — a
    * stand-in for reading real media files; gives the pipeline real
    * binary-typed columns to exercise.
    *
    * `mirrorableDims = true` derives width/height from the text's
    * character count instead of xxhash64 so a cross-engine oracle can
    * reproduce them (DuckDB has no xxhash64); the plumbing is identical.
    */
  def withSyntheticMedia(df: DataFrame, idCol: String, textCol: String,
                         mirrorableDims: Boolean = false): DataFrame = {
    val (w, h) =
      if (mirrorableDims)
        (pmod(length(col(textCol)), lit(512)) + 32,
          pmod(length(col(textCol)) * 7, lit(512)) + 32)
      else
        (pmod(xxhash64(col(idCol)), lit(512)) + 32,
          pmod(xxhash64(col(idCol), lit(1)), lit(512)) + 32)
    df.withColumn("media", col(textCol).cast("binary"))
      .withColumn("media_meta", struct(
        lit("image").as("kind"),
        w.cast("int").as("width"),
        h.cast("int").as("height"),
        lit(null).cast("int").as("sample_rate_hz"),
        lit(null).cast("int").as("n_frames")))
  }

  /** Magic-byte sniff: true iff the payload starts like a format the JDK's
    * ImageIO can decode (PNG / BMP / GIF / JPEG). Sniffing first keeps the
    * non-image fast path free of ImageIO reader-registry scans.
    */
  private[llm] def looksLikeImage(p: Array[Byte]): Boolean =
    p.length >= 4 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
      (p(0) == 'B' && p(1) == 'M') ||
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') ||
      (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte && p(2) == 0xFF.toByte))

  /** Real decode via `javax.imageio` (zero extra dependencies): 8 pixel-stat
    * features `[width, height, meanR, meanG, meanB, meanLuma, minLuma,
    * maxLuma]` (means over all pixels, luma = (r+g+b)/3, channels 0-255).
    * None when ImageIO cannot decode the bytes despite the image-like magic.
    */
  private[llm] def decodeImageFeatures(payload: Array[Byte]): Option[Array[Float]] = {
    val img = try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
              catch { case _: java.io.IOException => null }
    if (img == null) None
    else {
      val w = img.getWidth; val h = img.getHeight
      var sr = 0L; var sg = 0L; var sb = 0L
      var minL = Float.MaxValue; var maxL = Float.MinValue
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
          sr += r; sg += g; sb += b
          val l = (r + g + b) / 3.0f
          if (l < minL) minL = l
          if (l > maxL) maxL = l
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toFloat
      Some(Array(w.toFloat, h.toFloat, sr / n, sg / n, sb / n,
        (sr + sg + sb) / (3.0f * n), minL, maxL))
    }
  }

  /** RIFF/WAVE magic sniff for the audio decode path. */
  private[llm] def looksLikeWav(p: Array[Byte]): Boolean =
    p.length >= 12 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  /** Real audio decode via `javax.sound.sampled` (WAV/AIFF/AU ship with
    * the JDK): 8 sample-stat features `[sample_rate, channels, n_samples,
    * mean, mean_abs, rms, min, max]` over the signed PCM samples (raw
    * sample units, all channels interleaved). None when the payload isn't
    * decodable 8/16-bit signed PCM.
    */
  private[llm] def decodeAudioFeatures(payload: Array[Byte]): Option[Array[Float]] = {
    val in = try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException |
                   _: java.io.IOException => null }
    if (in == null) None
    else try {
      val fmt = in.getFormat
      val bits = fmt.getSampleSizeInBits
      if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          (bits != 8 && bits != 16)) None
      else {
        val bytes = in.readAllBytes()
        val big = fmt.isBigEndian
        val n = if (bits == 8) bytes.length else bytes.length / 2
        if (n == 0) None
        else {
          var sum = 0.0; var sumAbs = 0.0; var sumSq = 0.0
          var minV = Int.MaxValue; var maxV = Int.MinValue
          var i = 0
          while (i < n) {
            val s: Int =
              if (bits == 8) bytes(i).toInt
              else {
                val b0 = bytes(2 * i) & 0xFF; val b1 = bytes(2 * i + 1) & 0xFF
                val v = if (big) (b0 << 8) | b1 else (b1 << 8) | b0
                v.toShort.toInt
              }
            sum += s; sumAbs += math.abs(s); sumSq += s.toDouble * s
            if (s < minV) minV = s
            if (s > maxV) maxV = s
            i += 1
          }
          Some(Array(fmt.getSampleRate, fmt.getChannels.toFloat, n.toFloat,
            (sum / n).toFloat, (sumAbs / n).toFloat, math.sqrt(sumSq / n).toFloat,
            minV.toFloat, maxV.toFloat))
        }
      }
    } finally in.close()
  }

  /** Deterministic byte-signature features for payloads with no JDK codec
    * (synthetic fixtures, video): folded byte sums per lane, dims in
    * lanes 0/1 — keeps non-decodable media testable end-to-end with the
    * same 8-float output shape as the decoded paths.
    */
  private def byteSignatureFeatures(payload: Array[Byte], width: Int, height: Int): Array[Float] = {
    val n = 8
    val out = new Array[Float](n)
    var i = 0
    while (i < payload.length) {
      out(i % n) += (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    var j = 0
    while (j < n) { out(j) = out(j) / math.max(1, payload.length / n).toFloat; j += 1 }
    out(0) += width * 0.001f; out(1) += height * 0.001f
    out
  }

  /** Feature dispatch: real ImageIO decode for decodable images, real
    * javax.sound decode for WAV payloads, byte-signature otherwise.
    */
  private def decodeFeatures(payload: Array[Byte], width: Int, height: Int): Array[Float] =
    if (looksLikeImage(payload)) decodeImageFeatures(payload)
      .getOrElse(byteSignatureFeatures(payload, width, height))
    else if (looksLikeWav(payload)) decodeAudioFeatures(payload)
      .getOrElse(byteSignatureFeatures(payload, width, height))
    else byteSignatureFeatures(payload, width, height)

  /** Batched feature extraction over the media column: prunes to
    * (id, media, meta), streams each partition through the decoder, and
    * returns (id, features array<float>). The pruned projection keeps the
    * scan narrow (ReadSchema excludes every other column).
    */
  def extractFeatures(df: DataFrame, idCol: String): DataFrame = {
    val pruned = df.select(col(idCol).cast("long").as("id"),
      col("media"), col("media_meta.width").as("w"), col("media_meta.height").as("h"))
    val outSchema = new StructType()
      .add("id", LongType).add("features", ArrayType(FloatType))
    implicit val enc = Encoders.row(outSchema)
    pruned.mapPartitions { it =>
      it.map { r =>
        val feats = decodeFeatures(r.getAs[Array[Byte]]("media"),
          r.getAs[Int]("w"), r.getAs[Int]("h"))
        Row(r.getLong(0), feats.toSeq)
      }
    }
  }

  /** Hash-checkable twin of `extractFeatures`: the same pruned-scan →
    * mapPartitions → decode plumbing, but the stub feature math is pure
    * integer arithmetic (per-lane code-point sums of the decoded payload,
    * dims folded into lanes 0/1) so the output is bit-exact across engines
    * — this is the variant the DuckDB oracle verifies; `extractFeatures`
    * (float features) is the production shape.
    *
    * Output: (doc_id, n_bytes, f0..f7 all BIGINT). Lane j sums the code
    * points at 0-based positions ≡ j (mod 8) of the UTF-8-decoded payload.
    */
  def extractFeaturesChecked(df: DataFrame, idCol: String): DataFrame = {
    val pruned = df.select(col(idCol).cast("long").as("doc_id"),
      col("media"), col("media_meta.width").as("w"), col("media_meta.height").as("h"))
    val outSchema = StructType(
      StructField("doc_id", LongType) +: StructField("n_bytes", LongType) +:
        (0 until 8).map(j => StructField(s"f$j", LongType)))
    implicit val enc = Encoders.row(outSchema)
    pruned.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]]("media")
        val lanes = new Array[Long](8)
        val cps = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
          .codePoints().toArray
        var i = 0
        while (i < cps.length) { lanes(i % 8) += cps(i); i += 1 }
        lanes(0) += r.getAs[Int]("w")
        lanes(1) += r.getAs[Int]("h")
        Row.fromSeq(r.getLong(0) +: payload.length.toLong +: lanes.toSeq)
      }
    }
  }

  /** Bilinear scale to (w, h) — shared by resize and the perceptual
    * hashes. Identity dims return the input untouched (also removes
    * resampling from the oracle path: a fixture generated AT the hash
    * grid size reaches the luma comparisons pixel-exact).
    */
  private[llm] def bilinearScale(img: java.awt.image.BufferedImage,
                                 w: Int, h: Int): java.awt.image.BufferedImage =
    if (img.getWidth == w && img.getHeight == h) img
    else {
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      out
    }

  /** Integer luma grid of an image: L(x,y) = (r+g+b)/3, integer
    * division — exact on any engine, and equal to the channel value on
    * gray pixels.
    */
  private def lumaGrid(img: java.awt.image.BufferedImage): Array[Array[Int]] = {
    val w = img.getWidth; val h = img.getHeight
    val l = Array.ofDim[Int](h, w)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        l(y)(x) = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3
        x += 1
      }
      y += 1
    }
    l
  }

  /** 64-bit dHash of one decoded image: bilinear-downscale to 9×8,
    * integer luma, bit (y*8+x) set iff L(x+1,y) > L(x,y). Shared by
    * [[imageHashes]] (per-image) and [[videoFrameHashes]] (per-frame).
    */
  private[llm] def dhash64(img: java.awt.image.BufferedImage): Long = {
    val dg = lumaGrid(bilinearScale(img, 9, 8))
    var dhash = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (dg(y)(x + 1) > dg(y)(x)) dhash |= (1L << (y * 8 + x))
        x += 1
      }
      y += 1
    }
    dhash
  }

  /** 64-bit aHash of one decoded image: downscale to 8×8, bit set iff
    * L(x,y) > floor(mean) (integer mean over the 64 cells).
    */
  private[llm] def ahash64(img: java.awt.image.BufferedImage): Long = {
    val ag = lumaGrid(bilinearScale(img, 8, 8))
    var sum = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) { sum += ag(y)(x); x += 1 }
      y += 1
    }
    val mean = sum / 64
    var ahash = 0L
    y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (ag(y)(x) > mean) ahash |= (1L << (y * 8 + x))
        x += 1
      }
      y += 1
    }
    ahash
  }

  /** PERCEPTUAL IMAGE HASHES — the image-dedup ladder's fingerprint
    * stage (dHash/aHash, the standard CLIP-era pre-filter before
    * embedding-level semantic dedup): decode the `media` payload, then
    *
    *   - `dhash` (difference hash): bilinear-downscale to 9×8, integer
    *     luma, bit (y*8+x) set iff L(x+1,y) > L(x,y) — horizontal
    *     gradient signs, robust to uniform brightness shifts;
    *   - `ahash` (average hash): downscale to 8×8, bit set iff
    *     L(x,y) > floor(mean) (integer mean over the 64 cells).
    *
    * Output (id, dhash, ahash); undecodable / null payloads yield null
    * hashes (route or drop downstream — never silently zero, which
    * would near-dup all broken files together). Projection-shaped like
    * [[extractFeatures]]: pruned scan, per-partition decode, payload
    * bytes never cross a shuffle; downstream [[graft.llm.TextDedup
    * .hammingHashPairs]] ships only (id, hash) pairs. 100 TB: the only
    * full-corpus pass is this decode projection.
    */
  def imageHashes(df: DataFrame, idCol: String): DataFrame = {
    val pruned = df.select(col(idCol).cast("long").as("id"), col("media"))
    val outSchema = new StructType()
      .add("id", LongType).add("dhash", LongType).add("ahash", LongType)
    implicit val enc = Encoders.row(outSchema)
    pruned.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]]("media")
        val img =
          if (payload == null || !looksLikeImage(payload)) null
          else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
               catch { case _: java.io.IOException => null }
        if (img == null) Row(r.getLong(0), null, null)
        else Row(r.getLong(0), dhash64(img), ahash64(img))
      }
    }
  }

  /** Oracle-mirrorable image fixture: a (gridW × gridH — default the
    * 9×8 dHash grid; pass 8×8 to make aHash the identity-resize one)
    * GRAY pattern BMP per row, every pixel derived from the id by pure
    * integer arithmetic — the cross-engine contract for the image
    * near-dup tier (a DuckDB oracle re-derives [[imageHashes]]' hash
    * without decoding pixels, because the fixture is generated AT the
    * hash grid size, so the decode → scale path is pixel-exact):
    *
    *   base   = id % baseMod + 1   (default 32 — the oracle contract)
    *   v      = (id / baseMod) % 3                 (variant)
    *   raw(x,y) = (base * (x*7 + y*13 + 3)) % 251  (gray level)
    *   flipped at (2,3) when v ≥ 1, and also (5,1) when v = 2,
    *   where flipping sets L = 250 − raw
    *
    * ids sharing `base` are exact or near duplicates (each flipped
    * pixel perturbs ≤ 2 dhash bits); different bases are unrelated —
    * the three regimes an image near-dup fixture needs. BMP (24-bit)
    * is lossless, so the gray levels survive the encode → ImageIO
    * decode round-trip exactly.
    */
  def withSyntheticPatternImages(df: DataFrame, idCol: String,
                                 gridW: Int = 9, gridH: Int = 8,
                                 baseMod: Long = 32L): DataFrame = {
    require(gridW > 0 && gridH > 0, s"grid dims must be positive, got ${gridW}x$gridH")
    require(baseMod > 0, s"baseMod must be positive, got $baseMod")
    val pruned = df.select(col(idCol).cast("long").as(idCol))
    val outSchema = new StructType()
      .add(idCol, LongType).add("media", BinaryType)
    implicit val enc = Encoders.row(outSchema)
    pruned.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val base = (id % baseMod) + 1
        val v = (id / baseMod) % 3
        val img = new java.awt.image.BufferedImage(gridW, gridH,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < gridH) {
          var x = 0
          while (x < gridW) {
            val raw = ((base * (x * 7 + y * 13 + 3)) % 251).toInt
            val flip = (v >= 1 && x == 2 && y == 3) || (v == 2 && x == 5 && y == 1)
            val l = if (flip) 250 - raw else raw
            img.setRGB(x, y, (l << 16) | (l << 8) | l)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "bmp", bos)
        new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
          Array(id, bos.toByteArray), outSchema): Row
      }
    }
  }

  /** Decode a WAV payload to its signed 16-bit MONO sample stream, or
    * null when the payload is undecodable, not PCM_SIGNED 16-bit, or
    * MULTICHANNEL — a stereo file's interleaved L/R stream would make
    * window sums mix channels and quietly break the documented mono-
    * envelope semantics, so multichannel payloads take the same null
    * contract as undecodables (downmix upstream if needed). Shared by
    * [[audioHashes]] and [[audioSegmentHashes]].
    */
  private[llm] def decodePcm16Mono(payload: Array[Byte]): Array[Int] = {
    if (payload == null || !looksLikeWav(payload)) return null
    val in = try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException |
                   _: java.io.IOException => null }
    if (in == null) null
    else try {
      val fmt = in.getFormat
      if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) null
      else {
        val bytes = in.readAllBytes()
        val big = fmt.isBigEndian
        val n = bytes.length / 2
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          val b0 = bytes(2 * i) & 0xFF; val b1 = bytes(2 * i + 1) & 0xFF
          out(i) = (if (big) (b0 << 8) | b1 else (b1 << 8) | b0).toShort.toInt
          i += 1
        }
        out
      }
    } finally in.close()
  }

  /** WAVEFORM FINGERPRINT — the audio rung of the perceptual-dedup
    * ladder (the dHash idea applied to PCM): decode the `media` payload
    * via `javax.sound.sampled` (16-bit signed PCM, mono — multichannel
    * payloads hash to null like undecodables, see [[decodePcm16Mono]]),
    * split the sample stream into 64 equal windows (remainder
    * truncated), take each window's INTEGER sample sum, and set bit k
    * (k = 0..62) iff sum(k+1) > sum(k) — the envelope's gradient signs,
    * robust to uniform gain changes exactly as dHash is to brightness.
    * 63 meaningful bits (no sign-bit arithmetic anywhere), integer-exact
    * on any engine. Output (id, whash); null for undecodable /
    * non-PCM-16 / multichannel / sub-64-sample payloads. Pairs/dedup
    * reuse [[graft.llm.TextDedup.hammingHashPairs]] / `dedupByPairs`
    * unchanged — the hash column is the whole interface.
    *
    * ALIGNMENT CONTRACT: the 64 windows are cut by dividing the WHOLE
    * file, so this hash is a rigid, alignment-sensitive fingerprint —
    * a duplicate offset by even one window width (leading silence, a
    * trimmed intro) shifts every window boundary and will NOT pair at
    * any useful radius (`AudioOffsetSpec` pins the miss on a planted
    * offset duplicate). It is the right tool for byte-near re-encodes
    * and gain changes only; for time-shifted duplicates use
    * [[audioSegmentHashes]], whose fixed-width overlapping segments
    * re-align at any offset that is a multiple of the segment hop.
    */
  def audioHashes(df: DataFrame, idCol: String): DataFrame = {
    val pruned = df.select(col(idCol).cast("long").as("id"), col("media"))
    val outSchema = new StructType()
      .add("id", LongType).add("whash", LongType)
    implicit val enc = Encoders.row(outSchema)
    pruned.mapPartitions { it =>
      it.map { r =>
        val samples = decodePcm16Mono(r.getAs[Array[Byte]]("media"))
        if (samples == null || samples.length < 64) Row(r.getLong(0), null)
        else {
          val win = samples.length / 64
          val sums = new Array[Long](64)
          var k = 0
          while (k < 64) {
            var j = 0; var s = 0L
            while (j < win) { s += samples(k * win + j); j += 1 }
            sums(k) = s
            k += 1
          }
          var h = 0L
          k = 0
          while (k < 63) {
            if (sums(k + 1) > sums(k)) h |= (1L << k)
            k += 1
          }
          Row(r.getLong(0), h)
        }
      }
    }
  }

  /** Oracle-mirrorable AUDIO fixture: a 16-bit signed PCM mono WAV per
    * row, every sample derived from the id by pure integer arithmetic —
    * the audio twin of [[withSyntheticPatternImages]] (16-bit PCM WAV
    * is lossless, so the encode → javax.sound decode round-trip returns
    * the exact formula values and a DuckDB oracle re-derives
    * [[audioHashes]]' window sums without decoding):
    *
    *   base    = id % baseMod + 1   (default 32 — the oracle contract)
    *   v       = (id / baseMod) % 3
    *   s(i)    = ((base * (i*7 + 3)) % 251) - 125          (i = 0..n-1)
    *   v ≥ 1 adds +40 to every sample of window 5 (i in [5w, 6w),
    *   w = n/64), and v = 2 also to window 11
    *
    * ids sharing base are exact or near duplicates (a shifted window
    * perturbs ≤ 2 gradient-sign bits); different bases are unrelated.
    */
  def withSyntheticWavs(df: DataFrame, idCol: String, nSamples: Int = 2048,
                        baseMod: Long = 32L): DataFrame = {
    require(nSamples >= 64, s"nSamples must be >= 64, got $nSamples")
    require(baseMod > 0, s"baseMod must be positive, got $baseMod")
    val pruned = df.select(col(idCol).cast("long").as(idCol))
    val outSchema = new StructType()
      .add(idCol, LongType).add("media", BinaryType)
    implicit val enc = Encoders.row(outSchema)
    pruned.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val base = (id % baseMod) + 1
        val v = (id / baseMod) % 3
        val win = nSamples / 64
        val pcm = new Array[Byte](nSamples * 2)
        var i = 0
        while (i < nSamples) {
          var s = ((base * (i.toLong * 7 + 3)) % 251).toInt - 125
          val w = i / win
          if (w < 64 && ((v >= 1 && w == 5) || (v == 2 && w == 11))) s += 40
          pcm(2 * i) = (s & 0xFF).toByte          // little-endian
          pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
          Array(id, bos.toByteArray), outSchema): Row
      }
    }
  }

  /** Oracle-mirrorable OFFSET-AUDIO fixture — the time-shift regime the
    * alignment contract on [[audioHashes]] documents: same 16-bit PCM
    * mono WAV per row as [[withSyntheticWavs]], but the variant axis
    * plants TIME-SHIFTED duplicates instead of gain bumps:
    *
    *   base   = id % baseMod + 1,  v = (id / baseMod) % 3
    *   s0(i)  = ((base * (i*7 + 3)) % 251) - 125      (the base clip)
    *   v = 0: s = s0
    *   v = 1: s(i) = s0(i) + 7                        (uniform gain — a
    *          control that both hash tiers must still catch)
    *   v = 2: s(i) = 0 for i < off, s0(i - off) after (leading silence
    *          of `offsetSamples`, tail truncated — the planted offset
    *          duplicate the whole-file hash MISSES and the segment tier
    *          catches when off is a multiple of the segment hop)
    */
  def withSyntheticOffsetWavs(df: DataFrame, idCol: String, nSamples: Int = 2048,
                              offsetSamples: Int = 256, baseMod: Long = 32L): DataFrame = {
    require(nSamples >= 64, s"nSamples must be >= 64, got $nSamples")
    require(offsetSamples >= 0 && offsetSamples < nSamples,
      s"offsetSamples must be in [0, nSamples), got $offsetSamples")
    require(baseMod > 0, s"baseMod must be positive, got $baseMod")
    val pruned = df.select(col(idCol).cast("long").as(idCol))
    val outSchema = new StructType()
      .add(idCol, LongType).add("media", BinaryType)
    implicit val enc = Encoders.row(outSchema)
    pruned.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val base = (id % baseMod) + 1
        val v = (id / baseMod) % 3
        def s0(i: Int): Int = ((base * (i.toLong * 7 + 3)) % 251).toInt - 125
        val pcm = new Array[Byte](nSamples * 2)
        var i = 0
        while (i < nSamples) {
          val s =
            if (v == 2) { if (i < offsetSamples) 0 else s0(i - offsetSamples) }
            else if (v == 1) s0(i) + 7
            else s0(i)
          pcm(2 * i) = (s & 0xFF).toByte          // little-endian
          pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
          Array(id, bos.toByteArray), outSchema): Row
      }
    }
  }

  /** SHIFT-TOLERANT AUDIO FINGERPRINTS — per-SEGMENT waveform hashes
    * (the Shazam-era fix for [[audioHashes]]' alignment fragility):
    * decode to mono PCM-16 ([[decodePcm16Mono]] contract), cut the
    * stream into FIXED-width windows of `winSamples` (absolute units,
    * NOT length-relative — shift tolerance requires that the grid not
    * depend on file length), sum each window, then hash every segment
    * of `segWindows` consecutive windows starting at multiples of
    * `hopWindows`: bit k (k = 0..segWindows-2) set iff
    * sum(start+k+1) > sum(start+k) — the same gain-robust gradient-sign
    * scheme, localized. Output (id, seg_idx, shash), one row per
    * segment; undecodable / multichannel / shorter-than-one-segment
    * payloads yield a single (id, null, null) row (never a silent
    * drop).
    *
    * MATCHING CONTRACT: a duplicate delayed by any multiple of
    * `hopWindows * winSamples` samples reproduces the original's
    * segment hashes verbatim (at shifted seg_idx — which is why
    * [[graft.llm.TextDedup.sharedKeyPairs]] matches on hash VALUES,
    * not positions); sub-hop offsets still shift every window and miss,
    * exactly like the whole-file hash. Smaller hops buy finer shift
    * tolerance at linearly more rows.
    */
  def audioSegmentHashes(df: DataFrame, idCol: String, winSamples: Int = 32,
                         segWindows: Int = 16, hopWindows: Int = 8): DataFrame = {
    require(winSamples >= 1, s"winSamples must be positive, got $winSamples")
    require(segWindows >= 2 && segWindows <= 64,
      s"segWindows must be in [2, 64], got $segWindows")
    require(hopWindows >= 1, s"hopWindows must be positive, got $hopWindows")
    val pruned = df.select(col(idCol).cast("long").as("id"), col("media"))
    val outSchema = new StructType()
      .add("id", LongType).add("seg_idx", IntegerType).add("shash", LongType)
    implicit val enc = Encoders.row(outSchema)
    pruned.mapPartitions { it =>
      it.flatMap { r =>
        val samples = decodePcm16Mono(r.getAs[Array[Byte]]("media"))
        val nWin = if (samples == null) 0 else samples.length / winSamples
        if (nWin < segWindows) Iterator.single(Row(r.getLong(0), null, null))
        else {
          val sums = new Array[Long](nWin)
          var k = 0
          while (k < nWin) {
            var j = 0; var s = 0L
            while (j < winSamples) { s += samples(k * winSamples + j); j += 1 }
            sums(k) = s
            k += 1
          }
          val id = r.getLong(0)
          Iterator.range(0, (nWin - segWindows) / hopWindows + 1).map { seg =>
            val start = seg * hopWindows
            var h = 0L
            var b = 0
            while (b < segWindows - 1) {
              if (sums(start + b + 1) > sums(start + b)) h |= (1L << b)
              b += 1
            }
            Row(id, seg, h)
          }
        }
      }
    }
  }

  /** IMAGE → EMBEDDING bridge for the semantic-dedup tier: real decode,
    * bilinear-downscale to (gridW × gridH), and the row-major integer
    * luma grid as an `array<double>` feature vector — the composition
    * point that feeds images into [[graft.llm.Similarity.semDedup]] /
    * the ANN tier, giving the image ladder a SEMANTIC rung beside the
    * perceptual hashes (dHash keeps gradient SIGNS only; this keeps the
    * magnitudes, so ε-cosine sees structure the hash flattens).
    * Output (id, features dim gridW*gridH); null payload / undecodable
    * → null features (filter before the dedup — the null contract of
    * the hash tier). Deterministic and engine-mirrorable on fixtures
    * generated AT the grid size, where the resize is the identity.
    */
  def imageLumaFeatures(df: DataFrame, idCol: String,
                        gridW: Int = 8, gridH: Int = 8): DataFrame = {
    require(gridW > 0 && gridH > 0, s"grid dims must be positive, got ${gridW}x$gridH")
    val pruned = df.select(col(idCol).cast("long").as("id"), col("media"))
    val outSchema = new StructType()
      .add("id", LongType).add("features", ArrayType(DoubleType))
    implicit val enc = Encoders.row(outSchema)
    pruned.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]]("media")
        val img =
          if (payload == null || !looksLikeImage(payload)) null
          else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
               catch { case _: java.io.IOException => null }
        if (img == null) Row(r.getLong(0), null)
        else {
          val g = lumaGrid(bilinearScale(img, gridW, gridH))
          val out = new Array[Double](gridW * gridH)
          var y = 0
          while (y < gridH) {
            var x = 0
            while (x < gridW) { out(y * gridW + x) = g(y)(x).toDouble; x += 1 }
            y += 1
          }
          Row(r.getLong(0), out.toSeq)
        }
      }
    }
  }

  /** Trivial length-prefixed FRAME CONTAINER for the video tier: each
    * frame is [4-byte big-endian length][frame bytes]. The JDK has no
    * video codec, so clips travel as packed per-frame images (an
    * MJPEG-style container reduced to its essence); the per-frame bytes
    * are real ImageIO-decodable images, which keeps the decode path
    * real end-to-end.
    */
  private[graft] def packFrames(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    frames.foreach { f => out.writeInt(f.length); out.write(f) }
    bos.toByteArray
  }

  /** Parse the [[packFrames]] container; null on any malformation
    * (negative length, truncated frame, trailing garbage).
    */
  private[graft] def unpackFrames(payload: Array[Byte]): Array[Array[Byte]] = {
    if (payload == null) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var off = 0
    while (off < payload.length) {
      if (off + 4 > payload.length) return null
      val len = ((payload(off) & 0xFF) << 24) | ((payload(off + 1) & 0xFF) << 16) |
        ((payload(off + 2) & 0xFF) << 8) | (payload(off + 3) & 0xFF)
      if (len < 0 || off + 4 + len > payload.length) return null
      out += java.util.Arrays.copyOfRange(payload, off + 4, off + 4 + len)
      off += 4 + len
    }
    out.toArray
  }

  /** Oracle-mirrorable VIDEO fixture: a packed-frame clip per row
    * ([[packFrames]] of 9×8 gray-pattern BMPs — each frame pixel-exact
    * under the real decode → dHash path, like
    * [[withSyntheticPatternImages]]), with the three regimes a video
    * near-dup fixture needs derived from the id by pure integer
    * arithmetic:
    *
    *   base     = id % baseMod + 1           (clip family)
    *   v        = (id / baseMod) % 3         (variant)
    *   nf0      = base % 4 + 5               (5..8 frames)
    *   luma(x,y,f) = (base * (x*7 + y*13 + 29*f + 3)) % 251
    *   v = 0: frames 0..nf0-1 as above       (the original clip)
    *   v = 1: same frames, but frame 0's pixel (2,3) flipped to
    *          250 - luma                     (one re-encoded frame)
    *   v = 2: frames 1..nf0-1 (nf0 - 1 frames — the original minus its
    *          first frame: a TRIMMED clip, every remaining frame
    *          identical to the original's)
    *
    * ids sharing base are sequence near-duplicates (v1 perturbs one
    * frame hash; v2 shifts the sequence); different bases are
    * unrelated. The trimmed variant is exactly the case that defeats
    * position-aligned frame comparison and that shingled frame-hash
    * matching ([[graft.llm.TextDedup.frameSequencePairs]]) survives.
    */
  def withSyntheticVideoClips(df: DataFrame, idCol: String,
                              baseMod: Long = 32L): DataFrame = {
    require(baseMod > 0, s"baseMod must be positive, got $baseMod")
    val pruned = df.select(col(idCol).cast("long").as(idCol))
    val outSchema = new StructType()
      .add(idCol, LongType).add("media", BinaryType)
    implicit val enc = Encoders.row(outSchema)
    pruned.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val base = (id % baseMod) + 1
        val v = (id / baseMod) % 3
        val nf0 = (base % 4 + 5).toInt
        val fStart = if (v == 2) 1 else 0
        val frames = (fStart until nf0).map { f =>
          val img = new java.awt.image.BufferedImage(9, 8,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 9) {
              val raw = ((base * (x * 7 + y * 13 + 29L * f + 3)) % 251).toInt
              val flip = v == 1 && f == 0 && x == 2 && y == 3
              val l = if (flip) 250 - raw else raw
              img.setRGB(x, y, (l << 16) | (l << 8) | l)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "bmp", bos)
          bos.toByteArray
        }
        new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
          Array(id, packFrames(frames)), outSchema): Row
      }
    }
  }

  /** PER-FRAME VIDEO HASHES — the video rung of the perceptual-dedup
    * ladder: parse the `media` payload as a [[packFrames]] container,
    * REAL-decode each frame via ImageIO, and emit its [[dhash64]].
    * Output (id, frame_idx, fhash), one row per frame in container
    * order; an undecodable frame yields (id, frame_idx, null) and an
    * unparseable / null container a single (id, null, null) row —
    * never a silent drop, never a zero hash that would cluster broken
    * clips together.
    *
    * Projection-shaped like [[imageHashes]]: pruned scan, per-partition
    * decode, payload bytes never cross a shuffle — downstream sequence
    * matching ships only (id, frame_idx, 8-byte hash) rows, so at
    * 100 TB the only full-corpus pass over video bytes is this decode
    * projection.
    */
  def videoFrameHashes(df: DataFrame, idCol: String): DataFrame = {
    val pruned = df.select(col(idCol).cast("long").as("id"), col("media"))
    val outSchema = new StructType()
      .add("id", LongType).add("frame_idx", IntegerType).add("fhash", LongType)
    implicit val enc = Encoders.row(outSchema)
    pruned.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val frames = unpackFrames(r.getAs[Array[Byte]]("media"))
        if (frames == null) Iterator.single(Row(id, null, null))
        else Iterator.range(0, frames.length).map { f =>
          val img =
            if (!looksLikeImage(frames(f))) null
            else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frames(f)))
                 catch { case _: java.io.IOException => null }
          if (img == null) Row(id, f, null) else Row(id, f, dhash64(img))
        }
      }
    }
  }

  /** PER-DOC VIDEO SHINGLE SETS — the streaming-friendly projection of
    * the video sequence tier: parse + decode like [[videoFrameHashes]],
    * but emit each clip's DISTINCT `shingleK`-consecutive-frame-hash
    * shingle strings as one array row (id, shingles array<string>) —
    * exactly the per-doc key set [[graft.llm.TextDedup
    * .frameSequencePairs]] builds relationally, computed in the decode
    * pass so a STREAMING consumer ([[graft.streaming.NearDupStream
    * .videoShardedEdges]]) gets the band-code array without a window
    * shuffle. Frames that fail decode break every shingle they touch
    * (same rule as the batch path); unparseable containers yield an
    * empty array.
    */
  def videoShingles(df: DataFrame, idCol: String, shingleK: Int = 2): DataFrame = {
    require(shingleK >= 1, s"shingleK must be positive, got $shingleK")
    val pruned = df.select(col(idCol).cast("long").as("id"), col("media"))
    val outSchema = new StructType()
      .add("id", LongType).add("shingles", ArrayType(StringType))
    implicit val enc = Encoders.row(outSchema)
    val k = shingleK
    pruned.mapPartitions { it =>
      it.map { r =>
        val frames = unpackFrames(r.getAs[Array[Byte]]("media"))
        if (frames == null) Row(r.getLong(0), Seq.empty[String])
        else {
          val hs: Array[java.lang.Long] = frames.map { f =>
            val img =
              if (!looksLikeImage(f)) null
              else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
                   catch { case _: java.io.IOException => null }
            if (img == null) null else java.lang.Long.valueOf(dhash64(img))
          }
          val sh = scala.collection.mutable.LinkedHashSet.empty[String]
          var i = 0
          while (i + k <= hs.length) {
            var ok = true
            var j = 0
            while (j < k) { if (hs(i + j) == null) ok = false; j += 1 }
            if (ok) sh += (0 until k).map(j => hs(i + j).toString).mkString(":")
            i += 1
          }
          Row(r.getLong(0), sh.toSeq)
        }
      }
    }
  }

  /** CROP-TOLERANT IMAGE TILE HASHES — the audio-segment idea applied
    * to images (the whole-image dHash/aHash are brightness-robust but
    * ALIGNMENT-rigid: a crop/scroll shifts every downscale cell and
    * misses at any radius): decode WITHOUT resizing, cut 8×8-pixel
    * tiles on a fixed ABSOLUTE grid with hop `hopPx` (default 4 —
    * overlapping, like the audio hop), and hash each tile with the
    * integer-mean aHash rule (bit py*8+px set iff L > floor(mean) —
    * uniform brightness shifts move L and mean equally, so tiles stay
    * brightness-robust). Output (id, tile_x, tile_y, thash), one row
    * per fully-inside tile; undecodable / smaller-than-one-tile
    * payloads yield a single (id, null, null, null) row.
    *
    * MATCHING CONTRACT (the [[audioSegmentHashes]] contract, spatial):
    * a duplicate cropped/scrolled by any multiple of `hopPx` in either
    * axis reproduces the surviving tiles' hashes verbatim at shifted
    * indices — [[graft.llm.TextDedup.sharedKeyPairs]] matches on hash
    * VALUES, so the pair survives. Sub-hop offsets lose the GUARANTEE
    * (every tile origin shifts off-grid) — though unlike the
    * whole-image hash they can still match ACCIDENTALLY on smooth
    * content, where a sub-tile shift approximates a uniform luma shift
    * that the mean-threshold rule absorbs (ImageCropSpec measures 13
    * accidental vs 22 guaranteed shared tiles on the linear fixture).
    * Smaller hops buy finer guaranteed tolerance at quadratically more
    * rows.
    */
  def imageTileHashes(df: DataFrame, idCol: String, tilePx: Int = 8,
                      hopPx: Int = 4): DataFrame = {
    require(tilePx >= 2, s"tilePx must be >= 2, got $tilePx")
    require(hopPx >= 1, s"hopPx must be positive, got $hopPx")
    val pruned = df.select(col(idCol).cast("long").as("id"), col("media"))
    val outSchema = new StructType()
      .add("id", LongType).add("tile_x", IntegerType)
      .add("tile_y", IntegerType).add("thash", LongType)
    implicit val enc = Encoders.row(outSchema)
    pruned.mapPartitions { it =>
      it.flatMap { r =>
        val payload = r.getAs[Array[Byte]]("media")
        val img =
          if (payload == null || !looksLikeImage(payload)) null
          else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
               catch { case _: java.io.IOException => null }
        if (img == null || img.getWidth < tilePx || img.getHeight < tilePx)
          Iterator.single(Row(r.getLong(0), null, null, null))
        else {
          val g = lumaGrid(img)
          val id = r.getLong(0)
          val nx = (img.getWidth - tilePx) / hopPx + 1
          val ny = (img.getHeight - tilePx) / hopPx + 1
          for {
            ty <- Iterator.range(0, ny)
            tx <- Iterator.range(0, nx)
          } yield {
            var sum = 0L
            var py = 0
            while (py < tilePx) {
              var px = 0
              while (px < tilePx) {
                sum += g(ty * hopPx + py)(tx * hopPx + px)
                px += 1
              }
              py += 1
            }
            val mean = sum / (tilePx * tilePx)
            var h = 0L
            py = 0
            while (py < tilePx) {
              var px = 0
              while (px < tilePx) {
                if (g(ty * hopPx + py)(tx * hopPx + px) > mean)
                  h |= (1L << (py * tilePx + px))
                px += 1
              }
              py += 1
            }
            Row(id, tx, ty, h)
          }
        }
      }
    }
  }

  /** Oracle-mirrorable CROP fixture: a 32×32 gray BMP per row viewing
    * an infinite id-derived pattern, with the variant axis planting
    * the regimes the tile tier exists for:
    *
    *   base     = id % baseMod + 1,  v = (id / baseMod) % 3
    *   L0(x,y)  = (base * (x*7 + y*13 + 3)) % 251
    *   v = 0: L = L0(x, y)                  (the original view)
    *   v = 1: L = L0(x, y) + 4              (uniform brightness — the
    *          control both hash tiers must catch; +4 keeps every level
    *          ≤ 254, no clamping, and integer tile means shift exactly
    *          +4 so tile bits are provably unchanged)
    *   v = 2: L = L0(x, y + 8)              (the view scrolled one tile
    *          down — a CROP: the whole-image hash misses it, tiles at
    *          hop-multiple offsets re-align and catch it)
    */
  def withSyntheticCropImages(df: DataFrame, idCol: String,
                              baseMod: Long = 32L): DataFrame = {
    require(baseMod > 0, s"baseMod must be positive, got $baseMod")
    val pruned = df.select(col(idCol).cast("long").as(idCol))
    val outSchema = new StructType()
      .add(idCol, LongType).add("media", BinaryType)
    implicit val enc = Encoders.row(outSchema)
    pruned.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val base = (id % baseMod) + 1
        val v = (id / baseMod) % 3
        val img = new java.awt.image.BufferedImage(32, 32,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 32) {
          var x = 0
          while (x < 32) {
            val ySrc = if (v == 2) y + 8 else y
            val raw = ((base * (x * 7 + ySrc * 13 + 3)) % 251).toInt
            val l = if (v == 1) raw + 4 else raw
            img.setRGB(x, y, (l << 16) | (l << 8) | l)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "bmp", bos)
        new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
          Array(id, bos.toByteArray), outSchema): Row
      }
    }
  }

  /** Bilinear resize of one decodable image payload, re-encoded as PNG
    * (lossless, always ImageIO-writable). None when the bytes don't
    * decode.
    */
  private[llm] def resizeToPng(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    val img = try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
              catch { case _: java.io.IOException => null }
    if (img == null) None
    else {
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      Some(bos.toByteArray)
    }
  }

  /** Real image resize (the decode → transform → re-encode stage of a
    * media curation pipeline): JDK-decodable payloads are scaled to
    * (targetW, targetH) with bilinear interpolation and re-encoded as
    * PNG; anything else yields a null `media` with null dims (route or
    * drop downstream). Projection-shaped like `extractFeatures` — pruned
    * scan, per-partition streaming, payload bytes never cross a shuffle;
    * output (id, media, width, height).
    */
  def resizeImages(df: DataFrame, idCol: String, targetW: Int, targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0,
      s"target dims must be positive, got ${targetW}x$targetH")
    val pruned = df.select(col(idCol).cast("long").as("id"), col("media"))
    val outSchema = new StructType()
      .add("id", LongType).add("media", BinaryType)
      .add("width", IntegerType).add("height", IntegerType)
    implicit val enc = Encoders.row(outSchema)
    pruned.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]]("media")
        val resized =
          if (payload != null && looksLikeImage(payload)) resizeToPng(payload, targetW, targetH)
          else None
        resized match {
          case Some(bytes) => Row(r.getLong(0), bytes, targetW, targetH)
          case None => Row(r.getLong(0), null, null, null)
        }
      }
    }
  }

  /** Frame-sampling plan for video payloads: yields (id, frame_idx) rows
    * for every k-th frame — the fan-out stage a real video pipeline feeds
    * into the decoder. Pure expressions; no payload copy per frame (the
    * payload column is carried by reference within the row).
    */
  def sampleFrames(df: DataFrame, idCol: String, everyK: Int): DataFrame =
    df.filter(col("media_meta.kind") === "video")
      .select(col(idCol), col("media"),
        explode(sequence(lit(0), greatest(col("media_meta.n_frames") - 1, lit(0)), lit(everyK)))
          .as("frame_idx"))

  /** Synthetic VIDEO metadata (frame count derived from the id so a
    * cross-engine oracle can mirror it): kind='video', n_frames =
    * id % 40 + 1, no payload — the minimum a [[sampleFrames]] pipeline
    * needs. The oracle twin of [[withSyntheticMedia]]'s image path.
    */
  def withSyntheticVideoMeta(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("media", lit(null).cast("binary"))
      .withColumn("media_meta", struct(
        lit("video").as("kind"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("int").as("sample_rate_hz"),
        (pmod(col(idCol), lit(40)) + 1).cast("int").as("n_frames")))

  /** Hash-checkable twin of [[resizeImages]] — runs the REAL encode →
    * decode → bilinear-resize → PNG re-encode → decode pipeline, on
    * solid-color BMP payloads whose color and source dims derive from
    * the id (so a cross-engine oracle can predict the observable
    * output without decoding pixels): bilinear resampling of a constant
    * image is exact, so the resized PNG must be the same solid color at
    * the target dims. Output (doc_id, out_w, out_h, n_colors, r0, g0,
    * b0) all BIGINT — n_colors pins "every output pixel equals the
    * source color" (1), r0/g0/b0 the color itself; decode failure
    * surfaces as a -1 row rather than a silent drop.
    */
  def resizeChecked(df: DataFrame, idCol: String, targetW: Int, targetH: Int): DataFrame = {
    val pruned = df.select(col(idCol).cast("long").as("id"))
    val srcSchema = new StructType().add("id", LongType).add("media", BinaryType)
    val encSrc: org.apache.spark.sql.Encoder[Row] = Encoders.row(srcSchema)
    val withMedia = pruned.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val w0 = (id % 16).toInt + 4
        val h0 = ((id * 3) % 16).toInt + 4
        val rgb = ((id % 256).toInt << 16) | (((id * 7) % 256).toInt << 8) |
          ((id * 13) % 256).toInt
        val img = new java.awt.image.BufferedImage(w0, h0,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h0) {
          var x = 0
          while (x < w0) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "bmp", bos)
        // schema-carrying rows: EliminateSerialization pipelines this
        // iterator STRAIGHT into resizeImages' mapPartitions (no
        // serialize/deserialize boundary), whose lambda reads fields by
        // name — a bare GenericRow would throw on fieldIndex
        new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
          Array(id, bos.toByteArray), srcSchema): Row
      }
    }(encSrc)
    val resized = resizeImages(withMedia, "id", targetW, targetH)
    val outSchema = new StructType()
      .add("doc_id", LongType).add("out_w", LongType).add("out_h", LongType)
      .add("n_colors", LongType).add("r0", LongType).add("g0", LongType)
      .add("b0", LongType)
    implicit val enc: org.apache.spark.sql.Encoder[Row] = Encoders.row(outSchema)
    resized.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        // positional: resizeImages' own output rows are schema-less and
        // arrive here un-reserialized (same pipelining as above)
        val bytes = r.getAs[Array[Byte]](1)
        val img = if (bytes == null) null
          else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) Row(id, -1L, -1L, -1L, -1L, -1L, -1L)
        else {
          val colors = scala.collection.mutable.HashSet.empty[Int]
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) { colors += (img.getRGB(x, y) & 0xFFFFFF); x += 1 }
            y += 1
          }
          val c0 = img.getRGB(0, 0)
          Row(id, img.getWidth.toLong, img.getHeight.toLong, colors.size.toLong,
            ((c0 >> 16) & 0xFF).toLong, ((c0 >> 8) & 0xFF).toLong, (c0 & 0xFF).toLong)
        }
      }
    }
  }
}
