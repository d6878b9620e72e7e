package graft.mm

import graft.SparkSpec
import Multimodal._

/** Multimodal plumbing tests: the decode kernels are deterministic
  * stubs, but the schemas, per-partition batching, one-to-many frame
  * sampling and partitioning behavior under test are the real thing. */
class MultimodalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val media = fakeMediaFromDocuments(spark, sf)

  test("typed media schema round-trips through Tungsten encoders") {
    val first = media.orderBy("item_id").head()
    assert(first.item_id == 0L)
    assert(Set("image", "audio", "video").contains(first.modality))
    assert(first.payload.nonEmpty)
    assert(first.meta.contains("source"))
  }

  test("image decode: schema, determinism, histogram mass = payload bytes") {
    val imgs = decodeImages(media.filter(_.modality == "image"))
    val rows = imgs.collect()
    assert(rows.nonEmpty)
    rows.foreach { f =>
      assert(f.histogram.length == 16)
      assert(f.histogram.sum == media.filter(_.item_id == f.item_id)
        .head().payload.length.toLong)
      assert(f.width >= 1 && f.height >= 1 && f.channels == 3)
    }
    // Determinism: same input → bit-identical features
    val again = decodeImages(media.filter(_.modality == "image")).collect()
    assert(rows.map(_.mean_intensity).toSeq == again.map(_.mean_intensity).toSeq)
  }

  test("decode is narrow: partition count is preserved (no shuffle)") {
    val p = media.repartition(7)
    assert(decodeImages(p).rdd.getNumPartitions == 7)
  }

  test("audio decode: rms positive for non-silent payloads") {
    val auds = decodeAudios(media.filter(_.modality == "audio")).collect()
    assert(auds.nonEmpty)
    auds.foreach { a =>
      assert(a.n_samples > 0 && a.rms > 0.0 && a.sample_rate == 16000)
    }
  }

  test("frame sampling: every stride-th frame, correct sizes") {
    val frames = sampleFrames(
      media.filter(_.modality == "video"), frameSize = 32, stride = 4)
      .collect()
    assert(frames.nonEmpty)
    frames.foreach { f =>
      assert(f.frame_index % 4 == 0)
      assert(f.frame_payload.length == 32)
    }
  }

  test("resize clamps dimensions, keeps identity") {
    val f = decodeImages(media.filter(_.modality == "image")).head()
    val r = resize(f, 16)
    assert(r.width <= 16 && r.height <= 16 && r.item_id == f.item_id)
  }
}
