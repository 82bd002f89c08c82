package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata carried next to every media payload. */
final case class MediaMeta(
    mime: String, width: Int, height: Int, durationMs: Long)

/** A multimodal record: opaque binary payload + typed metadata. */
final case class MediaRecord(
    media_id: Long, kind: String, payload: Array[Byte], meta: MediaMeta)

/** Extracted features for one media item. */
final case class MediaFeatures(
    media_id: Long, kind: String, dim: Int, features: Array[Float])

/** Multimodal (image/audio/video) column plumbing for the training-data
  * pipeline (BASELINE.json north_star; SURVEY §4.3.4): payloads are opaque
  * `binary` columns with a typed metadata struct, processed per-partition
  * in batches.
  *
  * The actual codecs are STUBBED (this container has no image/audio
  * libraries): `decodeStub` produces a deterministic fake feature vector
  * from the payload bytes. Everything around the stub is real Spark:
  * the schema (`binary` + struct metadata), the partition-batched
  * `mapPartitions` execution shape (one codec init per partition, not per
  * row — the same shape a vectorized/Arrow-batched UDF gives), and the
  * downstream feature pipeline (the vectors feed Similarity's ANN ops).
  *
  * At 100 TB: payloads never shuffle — decode/featurize is a narrow map
  * on the scan partitioning; only the (id, features) rows (fixed size)
  * move. Repartition BEFORE attaching payloads if skewed.
  */
object Multimodal {

  /** STUB — deterministic fake decoder. A real deployment replaces this
    * body (and only this body) with the codec call; signature, batching,
    * and schema stay as-is. */
  def decodeStub(payload: Array[Byte], dim: Int = 16): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L // deterministic FNV-ish fold over bytes
    var i = 0
    while (i < payload.length) {
      h = h * 31 + (payload(i) & 0xff); i += 1
    }
    var j = 0
    while (j < dim) {
      val x = h ^ (j * 0x9e3779b97f4a7c15L)
      val m = ((x % 2000001L) + 2000001L) % 2000001L
      out(j) = ((m - 1000000L).toFloat / 1000000.0f)
      j += 1
    }
    out
  }

  /** Decode + featurize, one partition at a time. The `mapPartitions`
    * boundary is where a real codec would be initialized once per task. */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl: val codec = Codec.open() — once per partition
      it.map(r => MediaFeatures(r.media_id, r.kind, dim, decodeStub(r.payload, dim)))
    }
  }

  /** Metadata-only pruning never touches payload bytes: Parquet column
    * pruning means a filter on `meta` reads only the struct column. */
  def filterByMeta(df: DataFrame, minW: Int, minH: Int): DataFrame =
    df.filter(col("meta.width") >= minW && col("meta.height") >= minH)

  /** Resize: STUB transform — a real codec would re-encode the payload;
    * here the payload is truncated deterministically and the metadata
    * updated, preserving the narrow (no-shuffle) per-partition shape. */
  def resize(media: Dataset[MediaRecord], maxW: Int, maxH: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      if (r.meta.width <= maxW && r.meta.height <= maxH) r
      else {
        val scale = math.min(maxW.toDouble / r.meta.width, maxH.toDouble / r.meta.height)
        val keep = math.max(1, (r.payload.length * scale).toInt)
        r.copy(payload = r.payload.take(keep),
          meta = r.meta.copy(
            width = math.max(1, (r.meta.width * scale).toInt),
            height = math.max(1, (r.meta.height * scale).toInt)))
      }
    })
  }

  /** Frame sampling for video-kind records: one output row per sampled
    * frame at a fixed interval. Implemented as a flatMap (narrow); frames
    * are deterministic byte slices standing in for decoded frames. The
    * per-record fan-out is bounded by maxFrames, so row growth is
    * controlled — the knob that matters when a 2-hour video would
    * otherwise explode into 200k rows. */
  def sampleFrames(
      media: Dataset[MediaRecord],
      intervalMs: Long,
      maxFrames: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      val n = math.min(maxFrames,
        math.max(1, (r.meta.durationMs / math.max(1, intervalMs)).toInt))
      (0 until n).map { i =>
        val tsMs = i * intervalMs
        // STUB frame decode: a deterministic slice of the payload
        val off = if (r.payload.isEmpty) 0 else (i * 31) % math.max(1, r.payload.length)
        val frame = r.payload.slice(off, math.min(off + 16, r.payload.length))
        (r.media_id, i, tsMs, frame)
      }
    }.toDF("media_id", "frame_idx", "ts_ms", "frame")
  }

  /** Deterministic synthetic media table derived from `documents` (the
    * container has no real media): payload = utf8 bytes, metadata derived
    * from sizes. Lets every downstream op run end-to-end in tests. */
  def syntheticMedia(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.load(spark, sfDir, "documents")
      .select(
        col("doc_id").as("media_id"),
        when(pmod(col("doc_id"), lit(3)) === 0, "image")
          .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
          .otherwise("video").as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        struct(
          lit("application/x-graft-fake").as("mime"),
          (pmod(col("doc_id"), lit(1920)) + 1).cast("int").as("width"),
          (pmod(col("doc_id"), lit(1080)) + 1).cast("int").as("height"),
          (col("n_chars") * 10).cast("long").as("durationMs")).as("meta"))
      .as[MediaRecord]
  }

  /** The multimodal pipeline's metadata surface as an ORACLED corpus
    * query: binary payloads flow through the real plumbing (encode →
    * byte length → digest; video frame sampling through the flatMap
    * path) and every output number is pure arithmetic DuckDB reproduces
    * from `documents` — so the payload/metadata/fan-out machinery is
    * hash-checked, with only the codec stub left spec-only. Payloads
    * never shuffle: per-item rows reduce to (kind, … ) aggregates
    * map-side. */
  val all: Seq[GraftQuery] = Seq(
    GraftQuery("q94_multimodal_meta",
      (s, d) => {
        val media = syntheticMedia(s, d).toDF()
        val frames = sampleFrames(syntheticMedia(s, d),
            intervalMs = 1000, maxFrames = 32)
          .groupBy("media_id").agg(count(lit(1)).as("nf"))
        media.select(col("media_id"), col("kind"),
            length(col("payload")).cast("long").as("n_bytes"),
            md5(col("payload")).as("digest"))
          .join(frames, Seq("media_id"), "left")
          .groupBy("kind")
          .agg(count(lit(1)).as("n_items"),
            sum("n_bytes").cast("long").as("total_bytes"),
            countDistinct("digest").cast("long").as("n_digests"),
            sum(coalesce(col("nf"), lit(0L))).cast("long").as("total_frames"))
          .orderBy("kind")
      },
      Some("WITH m AS (SELECT doc_id AS media_id, " +
        "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind, " +
        "strlen(text) AS n_bytes, md5(text) AS digest, n_chars * 10 AS dur FROM documents), " +
        "f AS (SELECT media_id, LEAST(32, GREATEST(1, dur // 1000)) AS nf FROM m WHERE kind = 'video') " +
        "SELECT kind, COUNT(*) AS n_items, CAST(SUM(n_bytes) AS BIGINT) AS total_bytes, " +
        "CAST(COUNT(DISTINCT digest) AS BIGINT) AS n_digests, " +
        "CAST(SUM(COALESCE(f.nf, 0)) AS BIGINT) AS total_frames " +
        "FROM m LEFT JOIN f USING (media_id) GROUP BY kind ORDER BY kind"))
  )
}
