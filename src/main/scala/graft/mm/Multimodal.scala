package graft.mm

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

/** Typed multimodal plumbing: opaque binary payloads + typed metadata
  * flowing through per-partition decode kernels.
  *
  * The actual image/audio codecs are NOT present in this environment, so
  * the decode kernels are STUBBED with deterministic fakes (clearly
  * marked below). Everything around them is real and tested: the typed
  * schemas (case-class Encoders → Tungsten rows), the per-partition
  * batch iteration (`mapPartitions` — the Scala analog of Python's
  * `mapInPandas`: one kernel instantiation per partition, streaming
  * rows through it), and the partitioning contract (payloads never
  * shuffle unless the caller repartitions; feature rows are small and
  * shuffle freely).
  */
object Multimodal {

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

  final case class AudioFeatures(
      item_id: Long,
      sample_rate: Int,
      n_samples: Long,
      rms: Double)

  final case class VideoFrame(
      item_id: Long,
      frame_index: Int,
      frame_payload: Array[Byte])

  implicit val mediaItemEnc: Encoder[MediaItem] = Encoders.product[MediaItem]
  implicit val imageFeaturesEnc: Encoder[ImageFeatures] = Encoders.product[ImageFeatures]
  implicit val audioFeaturesEnc: Encoder[AudioFeatures] = Encoders.product[AudioFeatures]
  implicit val videoFrameEnc: Encoder[VideoFrame] = Encoders.product[VideoFrame]

  // ------------------------------------------------------------------
  // STUB KERNELS — deterministic fakes standing in for real codecs.
  // A production build swaps the bodies for javax.imageio / ffmpeg
  // bindings; signatures, schemas and call sites stay identical.
  // ------------------------------------------------------------------

  /** STUB image decode: derives dimensions and a 16-bin "luminance
    * histogram" from the payload bytes deterministically. */
  def decodeImage(item: MediaItem): ImageFeatures = {
    val bs = item.payload
    val w = 1 + (math.abs(bs.headOption.getOrElse(0: Byte).toInt) % 64)
    val h = 1 + (math.abs(bs.lift(1).getOrElse(0: Byte).toInt) % 64)
    val hist = new Array[Long](16)
    var sum = 0L
    bs.foreach { b =>
      val v = b & 0xff
      hist(v >> 4) += 1
      sum += v
    }
    ImageFeatures(
      item.item_id, w, h, channels = 3,
      mean_intensity = if (bs.isEmpty) 0.0 else sum.toDouble / bs.length,
      histogram = hist)
  }

  /** STUB audio decode: payload bytes as 8-bit "samples". */
  def decodeAudio(item: MediaItem): AudioFeatures = {
    val bs = item.payload
    val rms =
      if (bs.isEmpty) 0.0
      else math.sqrt(bs.map(b => { val v = (b & 0xff) - 128.0; v * v }).sum / bs.length)
    AudioFeatures(item.item_id, sample_rate = 16000, n_samples = bs.length.toLong, rms = rms)
  }

  /** STUB resize: re-derive features at a clamped size (a real kernel
    * would resample pixels; the fake clamps the fake dimensions). */
  def resize(f: ImageFeatures, maxSide: Int): ImageFeatures =
    f.copy(
      width = math.min(f.width, maxSide),
      height = math.min(f.height, maxSide))

  // ------------------------------------------------------------------
  // Real Spark plumbing (schema, batching, partition behavior).
  // ------------------------------------------------------------------

  /** Per-partition image decode — one kernel per partition, rows
    * streamed through it (the mapInPandas batch shape). Narrow: no
    * shuffle; payload bytes stay where they were read. */
  def decodeImages(items: Dataset[MediaItem]): Dataset[ImageFeatures] =
    items.mapPartitions(it => it.map(decodeImage))

  def decodeAudios(items: Dataset[MediaItem]): Dataset[AudioFeatures] =
    items.mapPartitions(it => it.map(decodeAudio))

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

  /** Deterministic fake corpus off the documents table: payload = the
    * UTF-8 text bytes (stands in for decoded media bytes), modality by
    * id. Lets the plumbing run at any scale factor without codecs. */
  def fakeMediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaItem] = {
    import spark.implicits._
    graft.Tables(spark, sfDir).documents
      .select("doc_id", "text", "source")
      .as[(Long, String, String)]
      .map { case (id, text, source) =>
        val modality = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        MediaItem(id, modality, text.getBytes("UTF-8"), Map("source" -> source))
      }
  }
}
