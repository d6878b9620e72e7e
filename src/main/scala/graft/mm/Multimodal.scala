package graft.mm

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

/** Typed multimodal plumbing: opaque binary payloads + typed metadata
  * flowing through per-partition decode kernels.
  *
  * BOTH media paths are real JDK codecs, zero extra dependencies:
  * images are decoded with `javax.imageio.ImageIO` (PNG/JPEG/GIF/BMP
  * readers in java.desktop), producing true pixel dimensions, channel
  * counts, and a Rec.601 luma histogram, and resize really resamples
  * pixels and re-encodes PNG; audio is decoded with
  * `javax.sound.sampled.AudioSystem` (WAV/AIFF/AU readers, same
  * module) — the fixture corpus synthesizes true RIFF/WAVE payloads
  * through the JDK *encoder* and the kernel parses the container
  * header and PCM frames back with the JDK *decoder*, so a codec bug
  * on either side breaks the oracle match, exactly like the PNG path.
  * Formats outside 16-bit PCM (µ-law, float WAV, compressed) would
  * need an ffmpeg-style bridge in production and fail loud here.
  *
  * Everything around the kernels is the real engine surface: typed
  * schemas (case-class Encoders → Tungsten rows), per-partition batch
  * iteration (`mapPartitions` — the Scala analog of Python's
  * `mapInPandas`: one kernel instantiation per partition, streaming
  * rows through it), and the partitioning contract (payloads never
  * shuffle unless the caller repartitions; feature rows are small and
  * shuffle freely).
  */
object Multimodal {

  // ImageIO defaults to spooling ImageInputStreams through temp FILES;
  // payloads here are in-memory byte arrays, so the disk cache is pure
  // overhead (and temp-dir churn across 32 executor threads).
  ImageIO.setUseCache(false)

  /** One media item: modality tag + opaque bytes + open metadata. */
  final case class MediaItem(
      item_id: Long,
      modality: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      meta: Map[String, String])

  final case class ImageFeatures(
      item_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      mean_intensity: Double,
      histogram: Array[Long]) // 16 luminance bins

  /** Audio features as exact integers (peak/|sum|/energy instead of a
    * float RMS) so the DuckDB oracle can recompute them bit-for-bit
    * from the fixture's generative sample formula — the same
    * determinism posture as the image histogram. RMS is
    * `sqrt(energy / n_samples)` when a caller wants it; the sqrt stays
    * OUT of the declared query. */
  final case class AudioFeatures(
      item_id: Long,
      sample_rate: Int,
      channels: Int,
      n_samples: Long,
      peak: Long,
      sum_abs: Long,
      energy: Long)

  final case class VideoFrame(
      item_id: Long,
      frame_index: Int,
      frame_payload: Array[Byte])

  /** 8×8 block-average perceptual hash, as 8 byte-band values (band j =
    * grid row j, bit i = grid column i) — banded for LSH-style pairing
    * without ever materializing a single 64-bit value (bit 63 would
    * collide with the sign bit in both engines). */
  final case class ImageHash(item_id: Long, bands: Array[Long])

  implicit val mediaItemEnc: Encoder[MediaItem] = Encoders.product[MediaItem]
  implicit val imageHashEnc: Encoder[ImageHash] = Encoders.product[ImageHash]
  implicit val imageFeaturesEnc: Encoder[ImageFeatures] = Encoders.product[ImageFeatures]
  implicit val audioFeaturesEnc: Encoder[AudioFeatures] = Encoders.product[AudioFeatures]
  implicit val videoFrameEnc: Encoder[VideoFrame] = Encoders.product[VideoFrame]

  // ------------------------------------------------------------------
  // Image kernels — REAL JDK ImageIO codecs.
  // ------------------------------------------------------------------

  /** Integer Rec.601 luma in [0, 255] from a packed ARGB pixel —
    * integer arithmetic so the histogram is bit-deterministic across
    * JVMs (no float rounding in the hot loop). */
  @inline private def luma(argb: Int): Int = {
    val r = (argb >> 16) & 0xff
    val g = (argb >> 8) & 0xff
    val b = argb & 0xff
    (299 * r + 587 * g + 114 * b) / 1000
  }

  /** Real image decode: parse the payload with ImageIO, emit true
    * dimensions, channel count (gray=1, RGB=3, RGBA=4 — the color
    * model's component count), mean luma, and a 16-bin luma histogram
    * whose mass equals the pixel count. Fail-loud on undecodable
    * payloads (validation posture: a corrupt image aborts the batch
    * rather than producing silent garbage rows). */
  def decodeImage(item: MediaItem): ImageFeatures = {
    val img = ImageIO.read(new ByteArrayInputStream(item.payload))
    require(img != null,
      s"item ${item.item_id}: payload is not a decodable image " +
        s"(${item.payload.length} bytes)")
    val w = img.getWidth
    val h = img.getHeight
    // One bulk getRGB: ImageIO converts any source layout (palette,
    // gray, 16-bit) to packed sRGB ARGB, so the luma path is uniform.
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    val hist = new Array[Long](16)
    var sum = 0L
    var i = 0
    while (i < px.length) {
      val v = luma(px(i))
      hist(v >> 4) += 1
      sum += v
      i += 1
    }
    ImageFeatures(
      item.item_id, w, h,
      channels = img.getColorModel.getNumComponents,
      mean_intensity = if (px.isEmpty) 0.0 else sum.toDouble / px.length,
      histogram = hist)
  }

  /** Perceptual hash (aHash family) over the REAL decode path: decode
    * the payload, map each pixel to grid block (⌊8x/W⌋, ⌊8y/H⌋), and
    * set block bit = "block mean luma > image mean luma" — compared by
    * integer cross-multiplication (blockSum·totalCount > totalSum·
    * blockCount), so there is NO division and NO float anywhere: the
    * hash is bit-deterministic across JVMs and exactly recomputable by
    * the DuckDB oracle from the fixture's generative pixel formula.
    * Empty blocks (images narrower/shorter than 8px leave grid gaps)
    * hash to 0. Robust to uniform rescaling by construction — the grid
    * is relative to the dimensions. */
  def imageAHash(item: MediaItem): ImageHash = {
    val img = ImageIO.read(new ByteArrayInputStream(item.payload))
    require(img != null,
      s"item ${item.item_id}: payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    val bSum = new Array[Long](64) // index bj*8 + bi
    val bCnt = new Array[Long](64)
    var tSum = 0L
    var i = 0
    while (i < px.length) {
      val v = luma(px(i))
      val x = i % w
      val y = i / w
      val b = (y * 8 / h) * 8 + (x * 8 / w)
      bSum(b) += v
      bCnt(b) += 1
      tSum += v
      i += 1
    }
    val tCnt = px.length.toLong
    val bands = Array.tabulate(8) { bj =>
      var band = 0L
      var bi = 0
      while (bi < 8) {
        val b = bj * 8 + bi
        if (bSum(b) * tCnt > tSum * bCnt(b)) band |= (1L << bi)
        bi += 1
      }
      band
    }
    ImageHash(item.item_id, bands)
  }

  /** Real resize: decode, resample onto a canvas whose longest side is
    * `maxSide` (aspect preserved, bilinear), re-encode as PNG. Identity
    * when the image already fits — re-encoding a byte-identical payload
    * would only churn. */
  def resizeImage(item: MediaItem, maxSide: Int): MediaItem = {
    val img = ImageIO.read(new ByteArrayInputStream(item.payload))
    require(img != null, s"item ${item.item_id}: payload is not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    if (w <= maxSide && h <= maxSide) item
    else {
      val scale = maxSide.toDouble / math.max(w, h)
      val nw = math.max(1, math.round(w * scale).toInt)
      val nh = math.max(1, math.round(h * scale).toInt)
      val out = new BufferedImage(nw, nh, BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, nw, nh, null)
      } finally g.dispose()
      item.copy(payload = encodePng(out))
    }
  }

  /** Oracle-exact resize: nearest-neighbor resample with pure integer
    * coordinate mapping — dst(x,y) = src((x·w) div nw, (y·h) div nh),
    * nw = max(1, (w·maxSide) div max(w,h)) — then re-encode PNG.
    * Unlike the bilinear [[resizeImage]] (whose Java2D filter weights
    * are not portably recomputable), every resized pixel here is a
    * closed-form function of the source pixels, so a DuckDB oracle can
    * recompute the resized image from the fixture's generative formula
    * and pin the full resample→encode→decode roundtrip bit-exactly.
    * Identity when the image already fits (no re-encode churn). */
  def resizeImageNN(item: MediaItem, maxSide: Int): MediaItem = {
    val img = ImageIO.read(new ByteArrayInputStream(item.payload))
    require(img != null, s"item ${item.item_id}: payload is not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    if (w <= maxSide && h <= maxSide) item
    else {
      val long = math.max(w, h)
      val nw = math.max(1, w * maxSide / long)
      val nh = math.max(1, h * maxSide / long)
      val out = new BufferedImage(nw, nh, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < nh) {
        var x = 0
        while (x < nw) {
          out.setRGB(x, y, img.getRGB(x * w / nw, y * h / nh))
          x += 1
        }
        y += 1
      }
      item.copy(payload = encodePng(out))
    }
  }

  /** Post-resize pixel reduction for the declared query: exact-integer
    * luma sum plus a position-weighted checksum Σ v·(1 + x + y·w) —
    * the histogram pins the pixel multiset, pos_sum pins the LAYOUT,
    * so a transposed or row-permuted resample cannot slip through. */
  final case class ResizedImageFeatures(
      item_id: Long,
      width: Int,
      height: Int,
      n_pixels: Long,
      sum_luma: Long,
      pos_sum: Long)

  implicit val resizedImageFeaturesEnc: Encoder[ResizedImageFeatures] =
    Encoders.product[ResizedImageFeatures]

  def resizedImageStats(item: MediaItem): ResizedImageFeatures = {
    val img = ImageIO.read(new ByteArrayInputStream(item.payload))
    require(img != null, s"item ${item.item_id}: payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    var sum = 0L
    var pos = 0L
    var i = 0
    while (i < px.length) {
      val v = luma(px(i)).toLong
      sum += v
      pos += v * (1L + (i % w) + (i / w).toLong * w)
      i += 1
    }
    ResizedImageFeatures(item.item_id, w, h, px.length.toLong, sum, pos)
  }

  /** Per-partition exact resize — narrow, payload-in/payload-out. */
  def resizeImagesNN(items: Dataset[MediaItem], maxSide: Int): Dataset[MediaItem] =
    items.mapPartitions(it => it.map(resizeImageNN(_, maxSide)))

  /** PNG-encode a buffered image (PNG writer ships in the JDK). */
  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, "png", bos), "JDK PNG writer missing")
    bos.toByteArray
  }

  // ------------------------------------------------------------------
  // Video kernels — REAL JDK codec over an animated-GIF container.
  // GIF is the one multi-frame format the JDK can both write and read
  // (javax.imageio's GIF plugin supports writeToSequence), so "video"
  // items carry true multi-frame payloads: a container a real decoder
  // must parse frame-by-frame — not a byte buffer pretending. Frames
  // with ≤256 distinct colors (our gray fixtures) round-trip
  // losslessly through the palette.
  // ------------------------------------------------------------------

  final case class VideoFrameStats(
      item_id: Long,
      frame_index: Int,
      width: Int,
      height: Int,
      sum_luma: Long)

  implicit val videoFrameStatsEnc: Encoder[VideoFrameStats] =
    Encoders.product[VideoFrameStats]

  /** Deterministic synthetic "video": an animated GIF whose frame f has
    * gray pixel v = (7x + 13y + seed + 11f) mod 256, written through
    * the JDK's own GIF sequence writer. Frames are TYPE_BYTE_INDEXED
    * over an explicit 256-level gray palette: handing the writer an
    * already-indexed image makes the encoding lossless by construction
    * (an RGB frame would go through the writer's own quantizer, which
    * degrades some gray levels — measured as sum_luma drift on
    * sampled frames). */
  def syntheticGif(seed: Long, width: Int, height: Int, nFrames: Int): Array[Byte] = {
    val grays = Array.tabulate(256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      // No interlacing: the JDK writer's default may emit progressive
      // (interlaced) frames, which reorders rows on decode for readers
      // honoring the flag differently per frame height — measured as
      // row-permuted pixels on short frames.
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      var f = 0
      while (f < nFrames) {
        val img = new BufferedImage(
          width, height, BufferedImage.TYPE_BYTE_INDEXED, icm)
        val raster = img.getRaster
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            val v = ((x * 7 + y * 13 + (seed % 251) + 11L * f) % 256).toInt
            raster.setSample(x, y, 0, v)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), param)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      ios.close()
      writer.dispose()
    }
    bos.toByteArray
  }

  /** Real video frame sampling: parse the container with the JDK GIF
    * reader, decode every `stride`-th frame (frames the sampler skips
    * are never pixel-decoded — the point of sampling), and reduce each
    * to integer luma statistics. Fail-loud on undecodable payloads. */
  def sampleVideoFrames(item: MediaItem, stride: Int): Seq[VideoFrameStats] = {
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(item.payload))
    try {
      // NOT seek-forward-only: getNumImages(allowSearch=true) must
      // scan the stream, and sampling then seeks to every stride-th
      // frame.
      reader.setInput(iis, false)
      val n = reader.getNumImages(true)
      require(n > 0, s"item ${item.item_id}: payload is not a decodable video container")
      (0 until n by stride).map { f =>
        val img = reader.read(f)
        val w = img.getWidth
        val h = img.getHeight
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        var sum = 0L
        var i = 0
        while (i < px.length) { sum += luma(px(i)); i += 1 }
        VideoFrameStats(item.item_id, f, w, h, sum)
      }
    } finally {
      iis.close()
      reader.dispose()
    }
  }

  /** Per-partition video frame sampling — narrow one-to-many, payloads
    * never shuffle, only small per-frame stat rows emerge. */
  def sampleVideos(items: Dataset[MediaItem], stride: Int): Dataset[VideoFrameStats] =
    items.flatMap(sampleVideoFrames(_, stride))

  /** Deterministic synthetic image: gray gradient + seed-striped
    * pattern, real PNG bytes. The fixture generator for corpora without
    * actual media columns — every downstream step decodes it with the
    * REAL codec path. */
  def syntheticPng(seed: Long, width: Int, height: Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = (x * 7 + y * 13 + (seed % 251).toInt) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    encodePng(img)
  }

  // ------------------------------------------------------------------
  // Audio kernels — REAL JDK javax.sound codecs (WAV container).
  // ------------------------------------------------------------------

  /** Real audio decode: parse the payload with the JDK's
    * `AudioSystem` (RIFF/WAVE container + format chunk), then reduce
    * the PCM frames to exact integer statistics — peak amplitude,
    * summed |amplitude|, and energy (Σ v²) — all in Long arithmetic
    * (16-bit samples: energy ≤ 2³⁰ per sample, so >10⁹ samples fit
    * without overflow). Fail-loud on anything but 16-bit signed PCM:
    * a production deployment would route other encodings to a
    * transcode step, not silently misread them. */
  def decodeAudio(item: MediaItem): AudioFeatures = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(item.payload))
    val fmt = ais.getFormat
    require(
      fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED && fmt.getSampleSizeInBits == 16,
      s"item ${item.item_id}: unsupported audio format $fmt (need 16-bit signed PCM)")
    val bytes =
      try ais.readAllBytes()
      finally ais.close()
    val channels = fmt.getChannels
    val total = bytes.length / 2
    var peak = 0L
    var sumAbs = 0L
    var energy = 0L
    var i = 0
    while (i < total) {
      // 16-bit sample; hi byte sign-extends through Byte→Int.
      val v =
        if (fmt.isBigEndian) (bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xff)
        else (bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)
      val a = math.abs(v.toLong)
      if (a > peak) peak = a
      sumAbs += a
      energy += v.toLong * v
      i += 1
    }
    AudioFeatures(
      item.item_id,
      sample_rate = math.round(fmt.getSampleRate),
      channels = channels,
      n_samples = total.toLong / channels,
      peak = peak, sum_abs = sumAbs, energy = energy)
  }

  /** Zero-crossing count over a decoded PCM stream — the cheapest
    * useful audio feature (voiced/unvoiced and noisiness proxy) and,
    * like the other audio stats, exactly integral: a crossing is a
    * strict sign change between adjacent samples (`v(i−1)·v(i) < 0`;
    * zero samples are crossings for neither neighbor), so the count is
    * engine-recomputable from the fixture's generative sample formula
    * with no float anywhere. Decodes through the same real JDK codec
    * path as [[decodeAudio]]. */
  final case class AudioZcr(
      item_id: Long,
      n_samples: Long,
      crossings: Long)

  implicit val audioZcrEnc: Encoder[AudioZcr] = Encoders.product[AudioZcr]

  def audioZcr(item: MediaItem): AudioZcr = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(item.payload))
    val fmt = ais.getFormat
    require(
      fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED && fmt.getSampleSizeInBits == 16,
      s"item ${item.item_id}: unsupported audio format $fmt (need 16-bit signed PCM)")
    val bytes =
      try ais.readAllBytes()
      finally ais.close()
    val total = bytes.length / 2
    var crossings = 0L
    var prev = 0
    var i = 0
    while (i < total) {
      val v =
        if (fmt.isBigEndian) (bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xff)
        else (bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)
      if (i > 0 && prev.toLong * v < 0) crossings += 1
      prev = v
      i += 1
    }
    AudioZcr(item.item_id, total.toLong / fmt.getChannels, crossings)
  }

  def audioZcrs(items: Dataset[MediaItem]): Dataset[AudioZcr] =
    items.map(audioZcr)

  /** 64-bit audio energy fingerprint for near-dup detection: the PCM
    * stream is cut into 16 equal temporal windows (w = i·16 div n —
    * duration-normalized, so a re-sampled copy maps windows alike),
    * each reduced to its Σ|v| energy, quantized to a nibble on the
    * track's own energy scale (q = min(15, s·128 div (total+1)) — the
    * relative energy envelope, invariant to uniform gain), and packed
    * into FOUR 16-bit band keys for pigeonhole bucketing: ≤ 3 flipped
    * bits can touch at most 3 of 4 bands, so hamming ≤ 2 pairs (the
    * declared threshold) always share a band. All arithmetic is exact
    * int64 — the DuckDB oracle replays it from the generative PCM
    * formula, proving the real WAV decode underneath. */
  final case class AudioHash(item_id: Long, bands: Array[Long])

  implicit val audioHashEnc: Encoder[AudioHash] = Encoders.product[AudioHash]

  def audioFingerprint(item: MediaItem): AudioHash = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(item.payload))
    val fmt = ais.getFormat
    require(
      fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED && fmt.getSampleSizeInBits == 16,
      s"item ${item.item_id}: unsupported audio format $fmt (need 16-bit signed PCM)")
    val bytes =
      try ais.readAllBytes()
      finally ais.close()
    val total = bytes.length / 2
    require(total >= 16, s"item ${item.item_id}: too few samples for a fingerprint")
    val sw = new Array[Long](16)
    var i = 0
    while (i < total) {
      val v =
        if (fmt.isBigEndian) (bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xff)
        else (bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)
      // Long arithmetic: i·16 wraps Int beyond ~134M samples (~4.6 h
      // at 8 kHz) — and the documented formula the oracle replays is
      // int64 `w = i·16 div n`.
      sw((i.toLong * 16 / total).toInt) += math.abs(v.toLong)
      i += 1
    }
    val t = sw.sum
    val q = sw.map(s => math.min(15L, s * 128 / (t + 1)))
    AudioHash(item.item_id, packNibbleBands(q))
  }

  /** 16 nibbles → four 16-bit band keys (big-endian within a band) —
    * the banding both temporal fingerprints (audio, video) share. */
  private def packNibbleBands(q: Array[Long]): Array[Long] =
    Array.tabulate(4) { b =>
      q(4 * b) * 4096 + q(4 * b + 1) * 256 + q(4 * b + 2) * 16 + q(4 * b + 3)
    }

  /** Per-partition fingerprinting — narrow; payloads never move, only
    * the 4-key hash flows downstream (the image-phash shape). */
  def audioFingerprints(items: Dataset[MediaItem]): Dataset[AudioHash] =
    items.mapPartitions(it => it.map(audioFingerprint))

  /** 64-bit video fingerprint: the per-frame mean-luma sequence,
    * nearest-neighbor-resampled onto 16 temporal slots (slot w reads
    * frame w·nf div 16 — duration-normalized like the audio windows),
    * each slot quantized to its frame's mean luma in 16ths of the
    * 8-bit range (q = Σluma div (16·w·h), exactly 0..15) and packed
    * into the shared four 16-bit band keys. Every frame decodes
    * through the real GIF codec; the oracle replays the generative
    * pixel formula. */
  final case class VideoHash(item_id: Long, bands: Array[Long])

  implicit val videoHashEnc: Encoder[VideoHash] = Encoders.product[VideoHash]

  def videoFingerprint(item: MediaItem): VideoHash = {
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(item.payload))
    try {
      reader.setInput(iis, false)
      val nf = reader.getNumImages(true)
      require(nf > 0, s"item ${item.item_id}: payload is not a decodable video container")
      var w0 = 0
      var h0 = 0
      val sums = new Array[Long](nf)
      var f = 0
      while (f < nf) {
        val img = reader.read(f)
        // Constant frame dims are a CONTRACT, not an assumption: the
        // quantizer below divides every slot by frame 0's area, and GIF
        // legally allows per-frame sub-rectangles — silently quantizing
        // an earlier frame's sum by a later frame's area would corrupt
        // the fingerprint (mirrors audioFingerprint's format require).
        if (f == 0) { w0 = img.getWidth; h0 = img.getHeight }
        else require(img.getWidth == w0 && img.getHeight == h0,
          s"item ${item.item_id}: frame $f dims ${img.getWidth}x${img.getHeight} != frame 0 ${w0}x$h0")
        val px = img.getRGB(0, 0, w0, h0, null, 0, w0)
        var s = 0L
        var i = 0
        while (i < px.length) { s += luma(px(i)); i += 1 }
        sums(f) = s
        f += 1
      }
      val q = Array.tabulate(16)(w => sums(w * nf / 16) / (16L * w0 * h0))
      VideoHash(item.item_id, packNibbleBands(q))
    } finally {
      iis.close()
      reader.dispose()
    }
  }

  def videoFingerprints(items: Dataset[MediaItem]): Dataset[VideoHash] =
    items.mapPartitions(it => it.map(videoFingerprint))

  /** Per-adjacent-frame luma difference — shot-boundary (scene cut)
    * detection, the frame-selection pass a video curation pipeline
    * runs before sampling keyframes. Every frame is decoded (diffing
    * needs both neighbors, unlike [[sampleVideoFrames]]' stride skip)
    * and reduced to Σ|luma−prev_luma| as an exact integer; the cut
    * decision is a pure integer comparison against a mean-diff
    * threshold, so the oracle recomputes both from the generative
    * pixel formula. */
  final case class SceneCut(
      item_id: Long,
      frame_index: Int,
      width: Int,
      height: Int,
      diff_sum: Long,
      is_cut: Int)

  implicit val sceneCutEnc: Encoder[SceneCut] = Encoders.product[SceneCut]

  /** Mean-abs-diff threshold for a cut, in luma units per pixel. */
  final val SceneCutMeanDiff = 21

  def videoSceneCuts(item: MediaItem): Seq[SceneCut] = {
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(item.payload))
    try {
      reader.setInput(iis, false)
      val n = reader.getNumImages(true)
      require(n > 0, s"item ${item.item_id}: payload is not a decodable video container")
      var prev: Array[Int] = null
      (0 until n).flatMap { f =>
        val img = reader.read(f)
        val w = img.getWidth
        val h = img.getHeight
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        val lum = new Array[Int](px.length)
        var i = 0
        while (i < px.length) { lum(i) = luma(px(i)); i += 1 }
        val out =
          if (prev == null || prev.length != lum.length) None
          else {
            var d = 0L
            var j = 0
            while (j < lum.length) { d += math.abs(lum(j) - prev(j)); j += 1 }
            Some(SceneCut(item.item_id, f, w, h, d,
              if (d > SceneCutMeanDiff.toLong * w * h) 1 else 0))
          }
        prev = lum
        out
      }
    } finally {
      iis.close()
      reader.dispose()
    }
  }

  def videoSceneCutsOf(items: Dataset[MediaItem]): Dataset[SceneCut] =
    items.flatMap(videoSceneCuts(_))

  /** Deterministic synthetic audio: 16-bit signed PCM mono whose
    * sample i is `((2731·i + 17·seed) mod 65536) − 32768`, encoded
    * into a true RIFF/WAVE container by the JDK's own encoder
    * (`AudioSystem.write`) — every downstream step decodes it with
    * the real codec path, mirroring [[syntheticPng]]. */
  def syntheticWav(seed: Long, nSamples: Int, sampleRate: Int): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = (((i.toLong * 2731 + seed * 17) % 65536) - 32768).toInt
      pcm(2 * i) = (v & 0xff).toByte // little-endian
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  // ------------------------------------------------------------------
  // Spark plumbing (schema, batching, partition behavior).
  //
  // MEMORY POSTURE (the contract that keeps a 100 TB media scan inside
  // executor memory): every kernel below streams items through
  // mapPartitions ONE AT A TIME — no payload ever enters an
  // aggregation buffer or a collect_list, and no kernel holds more
  // than the current item plus (video only) one previous luma plane.
  // So a task's live set is
  //     input split (≤ spark.sql.files.maxPartitionBytes of encoded
  //     payload pages, 128 MiB default)
  //   + ONE item's decoded footprint:
  //     image ≈ 8 B/px  (ARGB int raster + the px copy)
  //     video ≈ 12 B/px (raster + current & previous luma planes)
  //     audio ≈ 6 B/sample (byte PCM + widened ints)
  // — a bound that depends only on the LARGEST SINGLE ITEM, never on
  // corpus size, partition count, or rows per split. Sizing rule for
  // a real cluster: maxPartitionBytes + 12·max_item_pixels must fit
  // the per-task memory share; an 8K video frame (33 MP) peaks ~400
  // MiB and is the item class to cap at ingest validation, not at
  // query time. MultimodalSpec pins the measured worst-item footprint
  // on the driver corpus against these constants.
  // ------------------------------------------------------------------

  /** Per-partition image decode — one kernel per partition, rows
    * streamed through it (the mapInPandas batch shape). Narrow: no
    * shuffle; payload bytes stay where they were read. */
  def decodeImages(items: Dataset[MediaItem]): Dataset[ImageFeatures] =
    items.mapPartitions(it => it.map(decodeImage))

  def decodeAudios(items: Dataset[MediaItem]): Dataset[AudioFeatures] =
    items.mapPartitions(it => it.map(decodeAudio))

  /** Per-partition perceptual hashing — narrow; payloads never move,
    * only the 8-band hash (64 bytes/item) flows downstream. */
  def imageAHashes(items: Dataset[MediaItem]): Dataset[ImageHash] =
    items.mapPartitions(it => it.map(imageAHash))

  /** Per-partition resize — narrow, payload-in/payload-out. */
  def resizeImages(items: Dataset[MediaItem], maxSide: Int): Dataset[MediaItem] =
    items.mapPartitions(it => it.map(resizeImage(_, maxSide)))

  /** Frame sampling: every `stride`-th chunk of `frameSize` bytes
    * becomes a frame row (one-to-many, still narrow). */
  def sampleFrames(items: Dataset[MediaItem], frameSize: Int, stride: Int): Dataset[VideoFrame] =
    items.flatMap { item =>
      val n = item.payload.length / frameSize
      (0 until n by stride).map { i =>
        VideoFrame(
          item.item_id, i,
          item.payload.slice(i * frameSize, (i + 1) * frameSize))
      }
    }

  /** The fixture's modality rule: doc_id mod 3 → modality tag. */
  private val ModalityMod: Map[String, Int] =
    Map("image" -> 0, "audio" -> 1, "video" -> 2)

  /** Deterministic media corpus off the documents table — every
    * modality now carries a REAL container: PNG for images, RIFF/WAVE
    * for audio, animated GIF for video, all synthesized through the
    * JDK encoders and decoded downstream by the JDK codec kernels.
    * Lets the full pipeline run at any scale factor without a
    * media-bearing source table.
    *
    * `modality` (when given) filters the DOCUMENTS scan before the
    * typed map — a typed `.filter` after the map cannot push through
    * it, so without the pre-filter every caller would pay the other
    * two modalities' encoders for payloads it immediately drops
    * (measured as a 3× image-family regression in round 6). */
  def fakeMediaFromDocuments(spark: SparkSession, sfDir: String,
      modality: Option[String] = None): Dataset[MediaItem] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables(spark, sfDir).documents
      .select("doc_id", "text", "source")
    val wanted = modality.fold(docs) { m =>
      docs.filter(col("doc_id") % 3 === ModalityMod(m))
    }
    wanted
      .as[(Long, String, String)]
      .map { case (id, text, source) =>
        val payload = (id % 3) match {
          case 0 =>
            syntheticPng(id, width = 4 + (id % 29).toInt, height = 4 + (id % 17).toInt)
          case 1 =>
            // audio ids are ≡1 (mod 3), so (id%9)/3 cycles 0,1,2
            syntheticWav(id % 251, nSamples = 64 + (id % 97).toInt,
              sampleRate = 8000 + ((id % 9) / 3).toInt * 4000)
          case _ =>
            syntheticGif(id % 251, width = 4 + (id % 13).toInt,
              height = 4 + (id % 11).toInt, nFrames = 4 + (id % 9).toInt)
        }
        val modality = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        MediaItem(id, modality, payload, Map("source" -> source))
      }
  }

  // ------------------------------------------------------------------
  // Stored media layout: the production shape. A real corpus HAS its
  // bytes in storage; queries read payloads and pay decode, they do
  // not re-encode the corpus. The synthesized corpus is therefore
  // materialized ONCE per sfDir as a parquet BLOB table partitioned
  // by modality — each modality's query partition-prunes to its own
  // files, and the one-time encode cost is amortized over every
  // later query exactly like the bucketed/partitioned layouts in
  // StorageQueries.ensureLayouts.
  // ------------------------------------------------------------------

  /** Stable per-sfDir suffix (same convention as StorageQueries) so
    * layouts from different scale factors never collide in tmp. */
  private def digest(dir: String): String = graft.util.Digests.short(dir)

  /** Write (once, idempotent) the media corpus as a parquet BLOB
    * table partitioned by modality; returns the layout root. */
  def mediaLayout(spark: SparkSession, sfDir: String): String = {
    val root = new org.apache.hadoop.fs.Path(
      System.getProperty("java.io.tmpdir"),
      s"graft_media_items_${digest(sfDir)}")
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(new org.apache.hadoop.fs.Path(root, "_SUCCESS"))) {
      fakeMediaFromDocuments(spark, sfDir)
        .write.partitionBy("modality").mode("overwrite")
        .parquet(root.toString)
    }
    root.toString
  }

  /** Stored media payloads for one modality: a partition-pruned BLOB
    * scan (the modality predicate lands in PartitionFilters — zero
    * non-matching files are opened), built the first time any media
    * query at this sfDir runs. */
  def mediaItems(spark: SparkSession, sfDir: String,
      modality: String): Dataset[MediaItem] = {
    import org.apache.spark.sql.functions.col
    require(ModalityMod.contains(modality), s"unknown modality $modality")
    spark.read.parquet(mediaLayout(spark, sfDir))
      .filter(col("modality") === modality)
      .select("item_id", "modality", "payload", "meta")
      .as[MediaItem]
  }
}
