package graft.mm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.util.Det
import graft.{Q, Tables}

/** Multimodal-column operators (north-star extensions): treat non-text
  * modalities as opaque binary + typed metadata. The IMAGE decode is
  * real JDK ImageIO (see [[Multimodal.decodeImage]] and the
  * `mm_image_decode` query below, whose oracle recomputes the expected
  * pixel statistics from the fixture's generative formula — so a codec
  * bug, not just a plumbing bug, breaks the hash match). Audio decode
  * remains a disclosed deterministic stub ([[Multimodal.decodeAudio]]).
  *
  * Scale posture: all ops are narrow per-row transforms plus one
  * low-cardinality groupBy — no shuffle beyond the final small
  * aggregates, and binary payloads never leave the executor (only scalar
  * metadata is aggregated or sorted).
  */
object MultimodalQueries {

  /** Modality dispatch: parse the typed metadata out of the events
    * `props` JSON document and route rows by modality, aggregating per
    * modality (the "which decoder do I send this batch to" step). */
  private val mmModalityDispatch = Q(
    "mm_modality_dispatch",
    s"""SELECT CASE CAST(json_extract_string(props, '$$.k') AS INTEGER) % 3
       |            WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'text' END AS modality,
       |       count(*) AS n_items,
       |       ${Det.sqlDsum("value")} AS sum_value,
       |       CAST(min(CAST(json_extract_string(props, '$$.k') AS INTEGER)) AS INTEGER) AS min_k,
       |       CAST(max(CAST(json_extract_string(props, '$$.k') AS INTEGER)) AS INTEGER) AS max_k
       |FROM events
       |GROUP BY 1
       |ORDER BY modality""".stripMargin) { (s, dir) =>
    val k = from_json(col("props"), StructType.fromDDL("k INT")).getField("k")
    Tables(s, dir).events
      .select(
        when(k % 3 === 0, "image")
          .when(k % 3 === 1, "audio")
          .otherwise("text").as("modality"),
        col("value"), k.as("k"))
      .groupBy(col("modality"))
      .agg(
        count(lit(1)).as("n_items"),
        Det.dsum(col("value")).as("sum_value"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("modality")
  }

  /** Fake image "decode": a deterministic binary payload (md5 bytes of
    * the text — stands in for real image bytes) flows through real
    * binary-column plumbing: byte length, content hash of the *binary*,
    * and header fields parsed from the leading bytes. */
  private val mmBinaryMeta = Q(
    "mm_binary_meta",
    """SELECT doc_id,
      |       CAST(octet_length(from_hex(md5(text))) AS BIGINT) AS n_bytes,
      |       md5(md5(text)) AS blob_hash,
      |       CAST(CAST('0x' || substr(md5(text), 1, 4) AS UINTEGER) % 1920 AS BIGINT) AS width,
      |       CAST(CAST('0x' || substr(md5(text), 5, 4) AS UINTEGER) % 1080 AS BIGINT) AS height
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val blob = unhex(md5(col("text")))
    Tables(s, dir).documents
      .select(
        col("doc_id"),
        length(blob).cast("long").as("n_bytes"),
        // DuckDB 1.0 md5() only takes VARCHAR, so the content hash is
        // over the hex form on both engines (bytes themselves exercised
        // by n_bytes via the real BLOB).
        md5(md5(col("text"))).as("blob_hash"),
        (conv(substring(md5(col("text")), 1, 4), 16, 10).cast("long") % 1920)
          .as("width"),
        (conv(substring(md5(col("text")), 5, 4), 16, 10).cast("long") % 1080)
          .as("height"))
      .orderBy("doc_id")
  }

  /** Frame sampling: treat the 64-dim embedding as a 64-frame signal and
    * sample every 8th frame (stride slicing on an array column — the
    * same shape as sampling video frames out of a decoded buffer),
    * reducing each sample to scalar features with explicit left folds. */
  private val mmFrameSample = Q(
    "mm_frame_sample",
    """SELECT vec_id, label,
      |       list_max(list_transform(range(1, 9), i -> CAST(embedding[(i-1)*8 + 1] AS DOUBLE))) AS frame_max,
      |       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |           list_transform(range(1, 9), i -> CAST(embedding[(i-1)*8 + 1] AS DOUBLE))),
      |         (acc, x) -> acc + x) / 8.0 AS frame_avg
      |FROM embeddings
      |ORDER BY vec_id""".stripMargin) { (s, dir) =>
    val frames: Column =
      transform(sequence(lit(0), lit(7)),
        i => get(col("embedding"), i * 8).cast("double"))
    Tables(s, dir).embeddings
      .select(
        col("vec_id"), col("label"),
        array_max(frames).as("frame_max"),
        (aggregate(frames, lit(0.0), (acc, x) => acc + x) / lit(8.0))
          .as("frame_avg"))
      .orderBy("vec_id")
  }

  /** Real image decode as a declared, oracle-checked query. Spark
    * synthesizes a true PNG per image item ([[Multimodal.syntheticPng]]:
    * gray pixel v = (7x + 13y + seed) mod 256), then decodes the BYTES
    * with the JDK ImageIO codec and reduces to pixel statistics. The
    * DuckDB oracle never sees the PNG — it recomputes the same
    * statistics from the generative formula over a range() pixel grid.
    * The hash match therefore proves the encode→decode roundtrip is
    * pixel-exact (PNG is lossless), not merely that two copies of one
    * formula agree. Narrow: one per-row kernel, no shuffle; the
    * histogram travels as a canonical comma-joined string because the
    * driver's hash compare is defined over scalar columns. */
  private val mmImageDecode = Q(
    "mm_image_decode",
    """WITH d AS (
      |  SELECT doc_id AS item_id,
      |         CAST(4 + doc_id % 29 AS INTEGER) AS width,
      |         CAST(4 + doc_id % 17 AS INTEGER) AS height,
      |         doc_id % 251 AS seed
      |  FROM documents WHERE doc_id % 3 = 0
      |), px AS (
      |  SELECT item_id, (x*7 + y*13 + seed) % 256 AS v
      |  FROM d, range(0, 32) tx(x), range(0, 20) ty(y)
      |  WHERE x < width AND y < height
      |), stats AS (
      |  SELECT item_id, CAST(sum(v) AS DOUBLE) / count(*) AS mean_intensity
      |  FROM px GROUP BY item_id
      |), bins AS (
      |  SELECT item_id, CAST(v // 16 AS INTEGER) AS bin, count(*) AS c
      |  FROM px GROUP BY 1, 2
      |), fullbins AS (
      |  SELECT d.item_id, rb.bin, coalesce(b.c, 0) AS c
      |  FROM d CROSS JOIN range(0, 16) rb(bin)
      |  LEFT JOIN bins b ON b.item_id = d.item_id AND b.bin = rb.bin
      |), hist AS (
      |  SELECT item_id, string_agg(CAST(c AS VARCHAR), ',' ORDER BY bin) AS hist
      |  FROM fullbins GROUP BY item_id
      |)
      |SELECT d.item_id, d.width, d.height, CAST(3 AS INTEGER) AS channels,
      |       s.mean_intensity, h.hist
      |FROM d JOIN stats s USING (item_id) JOIN hist h USING (item_id)
      |ORDER BY item_id""".stripMargin) { (s, dir) =>
    val feats = Multimodal.decodeImages(
      Multimodal.fakeMediaFromDocuments(s, dir).filter(_.modality == "image"))
    feats.toDF()
      .select(
        col("item_id"), col("width"), col("height"), col("channels"),
        col("mean_intensity"),
        array_join(transform(col("histogram"), _.cast("string")), ",")
          .as("hist"))
      .orderBy("item_id")
  }

  val queries: Seq[Q] =
    Seq(mmModalityDispatch, mmBinaryMeta, mmFrameSample, mmImageDecode)
}
