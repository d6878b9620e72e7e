package graft.mm

import java.awt.image.BufferedImage

import graft.SparkSpec
import Multimodal._

/** Multimodal kernel + plumbing tests. The image path decodes REAL PNG
  * bytes with the JDK ImageIO codec and the audio path REAL RIFF/WAVE
  * bytes with the JDK AudioSystem codec (fixture corpus synthesizes
  * true payloads per doc through the JDK encoders). The schemas,
  * per-partition batching, one-to-many frame sampling and partitioning
  * behavior under test are the production shapes. */
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

  test("codec memory posture: task peak = one input split + ONE decoded item") {
    // The kernels stream items one at a time (see the MEMORY POSTURE
    // note in Multimodal): a task's live set is its input split plus a
    // single decoded item. This pins the measured worst-item footprint
    // on the real corpus against the documented per-pixel/per-sample
    // constants, and the resulting task peak against a 1 GiB share —
    // the bound is per-ITEM, so it does not move with corpus size.
    val imgs = decodeImages(media.filter(_.modality == "image")).collect()
    val maxImgBytes = imgs.map(f => f.width.toLong * f.height * 8).max
    val cuts = videoSceneCutsOf(media.filter(_.modality == "video")).collect()
    val maxVidBytes = cuts.map(c => c.width.toLong * c.height * 12).max
    val auds = decodeAudios(media.filter(_.modality == "audio")).collect()
    val maxAudBytes = auds.map(_.n_samples * 6).max
    val worstItem = Seq(maxImgBytes, maxVidBytes, maxAudBytes).max
    info(f"worst decoded-item footprint: $worstItem%,d bytes")
    // Fixture items are small; the contract holds with orders of
    // magnitude to spare — and the assertion documents the budget a
    // production ingest validator must enforce per item.
    val splitBytes = 128L << 20 // spark.sql.files.maxPartitionBytes default
    assert(worstItem < (64L << 20), "a single decoded item must stay in tens of MiB")
    assert(splitBytes + worstItem < (1L << 30),
      "task peak (split + one decoded item) must fit a 1 GiB task share")
  }

  test("image payloads are real PNGs: magic bytes + ImageIO decode") {
    val img = media.filter(_.modality == "image").head()
    // PNG signature: 0x89 'P' 'N' 'G'
    assert((img.payload(0) & 0xff) == 0x89 && img.payload(1) == 'P'.toByte &&
      img.payload(2) == 'N'.toByte && img.payload(3) == 'G'.toByte)
    val decoded = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(img.payload))
    assert(decoded != null && decoded.getWidth >= 4 && decoded.getHeight >= 4)
  }

  test("image decode: true dimensions, histogram mass = pixel count, determinism") {
    val imgs = decodeImages(media.filter(_.modality == "image"))
    val rows = imgs.collect()
    assert(rows.nonEmpty)
    rows.foreach { f =>
      // Dimensions must equal what the fixture generator drew.
      assert(f.width == 4 + (f.item_id % 29).toInt)
      assert(f.height == 4 + (f.item_id % 17).toInt)
      assert(f.channels == 3)
      assert(f.histogram.length == 16)
      assert(f.histogram.sum == f.width.toLong * f.height)
      assert(f.mean_intensity >= 0.0 && f.mean_intensity <= 255.0)
    }
    val again = decodeImages(media.filter(_.modality == "image")).collect()
    assert(rows.map(_.mean_intensity).toSeq == again.map(_.mean_intensity).toSeq)
  }

  test("decode of a hand-built PNG yields exact pixel statistics") {
    // 2×2 gray image: luma of (v,v,v) is exactly v, so bins and mean
    // are known in closed form: 0,15 → bin 0; 16 → bin 1; 255 → bin 15.
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    def gray(v: Int) = (v << 16) | (v << 8) | v
    img.setRGB(0, 0, gray(0)); img.setRGB(1, 0, gray(15))
    img.setRGB(0, 1, gray(16)); img.setRGB(1, 1, gray(255))
    val item = MediaItem(42L, "image", encodePng(img), Map.empty)
    val f = decodeImage(item)
    assert(f.width == 2 && f.height == 2 && f.channels == 3)
    assert(f.mean_intensity == (0 + 15 + 16 + 255) / 4.0)
    val expected = new Array[Long](16)
    expected(0) = 2; expected(1) = 1; expected(15) = 1
    assert(f.histogram.toSeq == expected.toSeq)
  }

  test("undecodable payload fails loud with the item id") {
    val bad = MediaItem(7L, "image", Array[Byte](1, 2, 3), Map.empty)
    val e = intercept[IllegalArgumentException](decodeImage(bad))
    assert(e.getMessage.contains("item 7"))
  }

  test("decode is narrow: partition count is preserved (no shuffle)") {
    val p = media.repartition(7)
    assert(decodeImages(p).rdd.getNumPartitions == 7)
  }

  test("audio payloads are real WAVs: RIFF magic + AudioSystem decode") {
    val aud = media.filter(_.modality == "audio").head()
    assert(new String(aud.payload.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(aud.payload.slice(8, 12), "US-ASCII") == "WAVE")
    val f = decodeAudio(aud)
    assert(f.item_id == aud.item_id && f.channels == 1 && f.n_samples > 0)
  }

  test("audio decode: JDK codec roundtrip is sample-exact vs the formula") {
    val auds = decodeAudios(media.filter(_.modality == "audio")).collect()
    assert(auds.nonEmpty)
    auds.foreach { a =>
      val id = a.item_id
      assert(a.sample_rate == 8000 + ((id % 9) / 3).toInt * 4000)
      assert(a.n_samples == 64 + id % 97)
      val seed = id % 251
      // Recompute the integer stats straight from the generative
      // formula — must match what came back through the WAV container.
      var peak = 0L; var sumAbs = 0L; var energy = 0L
      (0L until a.n_samples).foreach { i =>
        val v = ((i * 2731 + seed * 17) % 65536) - 32768
        val ab = math.abs(v)
        if (ab > peak) peak = ab
        sumAbs += ab
        energy += v * v
      }
      assert(a.peak == peak && a.sum_abs == sumAbs && a.energy == energy)
    }
  }

  test("video payloads are real animated GIFs: magic + multi-frame decode") {
    val vid = media.filter(_.modality == "video").head()
    assert(new String(vid.payload.slice(0, 4), "US-ASCII") == "GIF8")
    val frames = sampleVideoFrames(vid, stride = 1)
    assert(frames.size == 4 + (vid.item_id % 9).toInt,
      s"frame count ${frames.size}")
  }

  test("video decode: GIF codec roundtrip is pixel-exact per frame vs the formula") {
    val stats = sampleVideos(media.filter(_.modality == "video"), stride = 4)
      .collect()
    assert(stats.nonEmpty)
    stats.foreach { fs =>
      val id = fs.item_id
      assert(fs.width == 4 + (id % 13).toInt && fs.height == 4 + (id % 11).toInt)
      assert(fs.frame_index % 4 == 0)
      val seed = id % 251
      var sum = 0L
      (0 until fs.height).foreach { y =>
        (0 until fs.width).foreach { x =>
          sum += ((x * 7 + y * 13 + seed + 11L * fs.frame_index) % 256)
        }
      }
      assert(fs.sum_luma == sum,
        s"item $id frame ${fs.frame_index}: ${fs.sum_luma} != $sum")
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

  test("resize really resamples: decoded output dims shrink, aspect kept") {
    val big = media.filter(m => m.modality == "image")
      .collect().find(m => decodeImage(m).width > 16).get
    val before = decodeImage(big)
    val after = decodeImage(resizeImage(big, 16))
    assert(after.item_id == before.item_id)
    assert(math.max(after.width, after.height) == 16)
    val aspectBefore = before.width.toDouble / before.height
    val aspectAfter = after.width.toDouble / after.height
    assert(math.abs(aspectBefore - aspectAfter) < 0.2,
      s"aspect drifted: $aspectBefore -> $aspectAfter")
    // Identity when the image already fits.
    val small = resizeImage(resizeImage(big, 16), 16)
    assert(small.payload.sameElements(resizeImage(big, 16).payload))
  }

  test("distributed resize is narrow and keeps the dataset typed") {
    val resized = resizeImages(media.filter(_.modality == "image"), 8)
    val feats = decodeImages(resized).collect()
    assert(feats.nonEmpty)
    feats.foreach(f => assert(f.width <= 8 && f.height <= 8))
  }

  /** Half-dark/half-bright w×h PNG: left half gray 0, right half 255. */
  private def halfBright(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0 else 0xffffff)
    encodePng(img)
  }

  test("aHash of a half-bright image is f0 per band, at any resolution") {
    // Bright pixels (255) exceed the mean (127.5); with the split on the
    // grid midline every band is exactly 0b11110000 = 0xf0 — and because
    // the grid is relative to the dimensions, the 8×8 and 16×16 and
    // 32×16 renderings all hash identically (scale robustness).
    for ((w, h) <- Seq((8, 8), (16, 16), (32, 16))) {
      val hash = imageAHash(MediaItem(1L, "image", halfBright(w, h), Map()))
      assert(hash.bands.toSeq == Seq.fill(8)(0xf0L), s"dims ${w}x$h")
    }
  }

  test("aHash of a uniform image is all zero bands (no block exceeds the mean)") {
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, 0x808080)
    val hash = imageAHash(MediaItem(2L, "image", encodePng(img), Map()))
    assert(hash.bands.toSeq == Seq.fill(8)(0L))
  }

  test("image dedup pair expansion is bounded on a pathological all-identical corpus") {
    import org.apache.spark.sql.functions._
    // doc_ids that are multiples of 3·lcm(29,17,251) = 371229 are all
    // image items with IDENTICAL dimensions and seed — byte-identical
    // PNGs, identical aHashes, one over-cap bucket per band. The
    // uncapped pairing would emit C(100,2) = 4950 pairs; the cap must
    // bound it to C(64,2) all-pairs + one star edge per tail item,
    // with every item still attached (so components stay connected).
    val n = 100
    val dir = tmpDir("imgdedup-patho")
    spark.range(n).select(
      (col("id") * 371229L).as("doc_id"),
      lit("x").as("text"), lit("en").as("lang"),
      lit("src0").as("source"), lit(1).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = graft.SparkEntry.queries("mm_image_dedup")(spark, dir).collect()
    val cap = 64
    assert(pairs.length == cap * (cap - 1) / 2 + (n - cap),
      s"expected bounded ${cap * (cap - 1) / 2 + (n - cap)} pairs, got ${pairs.length}")
    pairs.foreach(r => assert(r.getAs[Long]("hamming") == 0L))
    val covered = pairs.flatMap(r =>
      Seq(r.getAs[Long]("item_a"), r.getAs[Long]("item_b"))).toSet
    assert(covered.size == n)
  }

  test("modality pre-filter synthesizes only the requested modality") {
    val auds = fakeMediaFromDocuments(spark, sf, Some("audio")).collect()
    assert(auds.nonEmpty && auds.forall(_.modality == "audio"))
    assert(auds.map(_.item_id).toSet ==
      media.filter(_.modality == "audio").collect().map(_.item_id).toSet)
  }

  test("media layout: stored payloads roundtrip byte-exact, scan prunes by modality") {
    val stored = mediaItems(spark, sf, "image").collect().sortBy(_.item_id)
    val direct = fakeMediaFromDocuments(spark, sf, Some("image"))
      .collect().sortBy(_.item_id)
    assert(stored.nonEmpty && stored.length == direct.length)
    stored.zip(direct).foreach { case (a, b) =>
      assert(a.item_id == b.item_id && a.modality == "image")
      assert(a.payload.sameElements(b.payload), s"payload drift at ${a.item_id}")
      assert(a.meta == b.meta)
    }
    // The modality predicate must land in the scan's PartitionFilters:
    // a query for one modality opens zero files of the other two.
    val plan = mediaItems(spark, sf, "image")
      .queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
    assert(pf.exists(_.contains("modality")), s"no partition pruning in:\n$plan")
  }

  test("image near-dup pairs equal the brute-force hamming<=2 set") {
    // sf0.001's largest band bucket (57) is under the 64 cap, so the
    // banded pairing must have EXACT recall at hamming <= 2 (pigeonhole
    // guarantees it up to hamming 7 with 8 bands).
    val hashes = imageAHashes(media.filter(_.modality == "image"))
      .collect().sortBy(_.item_id)
    def ham(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y).toLong }.sum
    val brute = (for {
      i <- hashes.indices; j <- (i + 1) until hashes.length
      d = ham(hashes(i).bands, hashes(j).bands) if d <= 2
    } yield (hashes(i).item_id, hashes(j).item_id, d)).toSet
    val queried = graft.SparkEntry.queries("mm_image_dedup")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("item_a"), r.getAs[Long]("item_b"),
        r.getAs[Long]("hamming"))).toSet
    assert(queried == brute,
      s"banded=${queried.size} brute=${brute.size}")
    assert(brute.nonEmpty)
  }

  test("audio ZCR: crossing count matches the formula through the WAV codec") {
    val zcrs = audioZcrs(media.filter(_.modality == "audio")).collect()
    assert(zcrs.nonEmpty)
    zcrs.foreach { z =>
      val seed = z.item_id % 251
      var prev = 0L; var expect = 0L
      (0L until z.n_samples).foreach { i =>
        val v = ((i * 2731 + seed * 17) % 65536) - 32768
        if (i > 0 && prev * v < 0) expect += 1
        prev = v
      }
      assert(z.crossings == expect,
        s"item ${z.item_id}: ${z.crossings} != $expect")
      assert(z.crossings < z.n_samples)
    }
  }

  test("scene cuts: adjacent-frame diffs match the formula, threshold is exact") {
    val cuts = videoSceneCutsOf(media.filter(_.modality == "video")).collect()
    assert(cuts.nonEmpty)
    cuts.foreach { c =>
      val id = c.item_id
      assert(c.frame_index >= 1) // frame 0 has no predecessor
      assert(c.width == 4 + (id % 13).toInt && c.height == 4 + (id % 11).toInt)
      val seed = id % 251
      var d = 0L
      (0 until c.height).foreach { y =>
        (0 until c.width).foreach { x =>
          val a = (x * 7 + y * 13 + seed + 11L * c.frame_index) % 256
          val b = (x * 7 + y * 13 + seed + 11L * (c.frame_index - 1)) % 256
          d += math.abs(a - b)
        }
      }
      assert(c.diff_sum == d, s"item $id frame ${c.frame_index}: ${c.diff_sum} != $d")
      assert((c.is_cut == 1) ==
        (c.diff_sum > SceneCutMeanDiff.toLong * c.width * c.height))
    }
    // Every non-initial frame of every video item is diffed.
    val perItem = cuts.groupBy(_.item_id)
    perItem.foreach { case (id, fs) =>
      assert(fs.length == 3 + (id % 9).toInt) // nf - 1
    }
  }

  test("NN resize: integer coordinate mapping is pixel-exact, identity when it fits") {
    // 16×4 at maxSide 8 → 8×2, dst(x,y) = src(2x, 2y)
    val item = MediaItem(7L, "image", syntheticPng(7L, 16, 4), Map.empty)
    val feats = resizedImageStats(resizeImageNN(item, 8))
    assert(feats.width == 8 && feats.height == 2 && feats.n_pixels == 16)
    val seed = (7L % 251).toInt
    var sum = 0L
    var pos = 0L
    for (y <- 0 until 2; x <- 0 until 8) {
      val v = ((2 * x) * 7 + (2 * y) * 13 + seed) % 256
      sum += v
      pos += v.toLong * (1 + x + y * 8)
    }
    assert(feats.sum_luma == sum)
    assert(feats.pos_sum == pos)
    // aspect: long side pinned to maxSide, short side floor-scaled ≥ 1
    val tall = MediaItem(8L, "image", syntheticPng(8L, 4, 20), Map.empty)
    val tf = resizedImageStats(resizeImageNN(tall, 8))
    assert(tf.width == 1 && tf.height == 8) // (4*8) div 20 = 1
    // identity: payload object untouched when both sides already fit
    val small = MediaItem(1L, "image", syntheticPng(1L, 5, 4), Map.empty)
    assert(resizeImageNN(small, 8) eq small)
  }

  test("audio fingerprint: identical tracks collide, gain-independence, pigeonhole recall") {
    import graft.mm.Multimodal._
    def item(id: Long, seed: Long, n: Int) =
      MediaItem(id, "audio", syntheticWav(seed, n, 8000), Map.empty)
    // Identical PCM (same seed+length, different item ids) → same hash.
    val a = audioFingerprint(item(1L, 7L, 96))
    val b = audioFingerprint(item(2L, 7L, 96))
    assert(a.bands.toSeq == b.bands.toSeq)
    // A different track has a different envelope.
    val c = audioFingerprint(item(3L, 101L, 131))
    assert(c.bands.toSeq != a.bands.toSeq)
    // Pigeonhole: any hash within hamming ≤ 3 of `a` shares ≥ 1 of the
    // 4 bands — even when the 3 corruptions land in 3 DIFFERENT bands,
    // the worst case for band-bucket recall.
    val flipped = a.bands.clone()
    flipped(0) = flipped(0) ^ 1L
    flipped(1) = flipped(1) ^ 2L
    flipped(3) = flipped(3) ^ 8L
    assert(flipped.zip(a.bands).count { case (x, y) => x == y } >= 1)
    // And exhaustively: 3 flips can never cover 4 bands.
    assert(Seq(0, 1, 3).distinct.size < a.bands.length)
  }

  test("mm_image_resize query emits one row per image item with consistent pixels") {
    val rows = graft.SparkEntry.queries("mm_image_resize")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val w = r.getAs[Int]("width")
      val h = r.getAs[Int]("height")
      assert(w >= 1 && w <= 8 && h >= 1 && h <= 8)
      assert(r.getAs[Long]("n_pixels") == w.toLong * h)
      // mean luma bounded by the 8-bit domain
      assert(r.getAs[Long]("sum_luma") <= 255L * w * h)
    }
  }
}
