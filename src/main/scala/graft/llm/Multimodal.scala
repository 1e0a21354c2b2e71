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
        else {
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
          val ag = lumaGrid(bilinearScale(img, 8, 8))
          var sum = 0L
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) { sum += ag(yy)(xx); xx += 1 }
            yy += 1
          }
          val mean = sum / 64
          var ahash = 0L
          yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              if (ag(yy)(xx) > mean) ahash |= (1L << (yy * 8 + xx))
              xx += 1
            }
            yy += 1
          }
          Row(r.getLong(0), dhash, ahash)
        }
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

  /** WAVEFORM FINGERPRINT — the audio rung of the perceptual-dedup
    * ladder (the dHash idea applied to PCM): decode the `media` payload
    * via `javax.sound.sampled` (16-bit signed PCM), split the sample
    * stream into 64 equal windows (remainder truncated), take each
    * window's INTEGER sample sum, and set bit k (k = 0..62) iff
    * sum(k+1) > sum(k) — the envelope's gradient signs, robust to
    * uniform gain changes exactly as dHash is to brightness. 63
    * meaningful bits (no sign-bit arithmetic anywhere), integer-exact
    * on any engine. Output (id, whash); null for undecodable /
    * non-PCM-16 / sub-64-sample payloads. Pairs/dedup reuse
    * [[graft.llm.TextDedup.hammingHashPairs]] / `dedupByPairs`
    * unchanged — the hash column is the whole interface.
    */
  def audioHashes(df: DataFrame, idCol: String): DataFrame = {
    val pruned = df.select(col(idCol).cast("long").as("id"), col("media"))
    val outSchema = new StructType()
      .add("id", LongType).add("whash", LongType)
    implicit val enc = Encoders.row(outSchema)
    pruned.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]]("media")
        val samples: Array[Int] =
          if (payload == null || !looksLikeWav(payload)) null
          else {
            val in = try javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(payload))
              catch { case _: javax.sound.sampled.UnsupportedAudioFileException |
                           _: java.io.IOException => null }
            if (in == null) null
            else try {
              val fmt = in.getFormat
              if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
                  fmt.getSampleSizeInBits != 16) null
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
