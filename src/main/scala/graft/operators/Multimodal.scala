package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads as opaque `BINARY` columns
  * with a typed metadata struct, plus batch-shaped decode/feature-extract
  * over `mapPartitions`.
  *
  * The Spark-side plumbing is real — schema, partition-wise batched
  * processing, feature array output ready for [[Similarity]] — while the
  * actual codec is a clearly marked deterministic STUB ([[fakeDecode]]):
  * image/audio libraries are not available in this environment, and a real
  * deployment swaps `fakeDecode` for (e.g.) a JNI JPEG decoder without
  * touching any of the distribution logic. The fixture corpus has no
  * binary column, so media is synthesized from `documents.text` bytes —
  * deterministic and schema-faithful.
  *
  * Scale notes: payloads stay in executors end-to-end (no collect); decode
  * is a narrow per-partition pass, so it pipelines with the scan and
  * parallelizes with input splits. Partition sizing for ~MB-scale blobs is
  * controlled by `spark.sql.files.maxPartitionBytes`.
  */
object Multimodal {

  /** A media row: payload + typed metadata (what a real pipeline carries). */
  final case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, sample_rate: Int)

  final case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Int,
      features: Array[Float])

  /** Synthesize the media table: binary payload from text bytes, kind and
    * metadata derived deterministically from doc_id. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("doc_id") % 640 + 32).cast("int").as("width"),
      (col("doc_id") % 480 + 32).cast("int").as("height"),
      when(col("doc_id") % 3 === 1, 16000).otherwise(0).cast("int").as("sample_rate"))

  /** STUB decoder: a real implementation would JPEG/PCM-decode `payload`;
    * this deterministic fake emits an 8-bin byte histogram, L1-normalized.
    * The *shape* (bytes → fixed-dim float vector, computed per partition
    * with no driver round-trip) is exactly what the real decoder needs. */
  private[operators] def fakeDecode(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](8)
    var i = 0
    while (i < payload.length) { hist((payload(i) & 0xff) >> 5) += 1f; i += 1 }
    val n = math.max(payload.length, 1).toFloat
    var k = 0
    while (k < 8) { hist(k) /= n; k += 1 }
    hist
  }

  /** Batched per-partition decode/feature-extract. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // partition = one batch; a real codec would allocate its native
      // context once here and reuse it across the iterator
      rows.map { r =>
        MediaFeatures(r.doc_id, r.kind, r.payload.length, fakeDecode(r.payload))
      }
    }
  }

  /** Deterministic frame sampling for "video" payloads: every `stride`-th
    * 16-byte block stands in for a frame. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      r.payload.grouped(16).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (block, idx) => (r.doc_id, idx, block.length) }
    }.toDF("doc_id", "frame_idx", "frame_bytes")
  }

  private def mediaDs(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    mediaTable(Tables.load(s, dir, "documents")).as[MediaRow]
  }

  val queries: Seq[Q] = Seq(

    // ---- m01: binary payload + metadata projection (oracle-checked) ----
    Q("m01_media_meta",
      (s, dir) => mediaTable(Tables.load(s, dir, "documents"))
        .select(col("doc_id"), col("kind"),
          octet_length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("payload_md5"),
          col("width"), col("height"), col("sample_rate"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
             |  octet_length(encode(text)) AS n_bytes,
             |  md5(text) AS payload_md5,
             |  (doc_id % 640 + 32)::INT AS width,
             |  (doc_id % 480 + 32)::INT AS height,
             |  (CASE WHEN doc_id % 3 = 1 THEN 16000 ELSE 0 END)::INT AS sample_rate
             |FROM documents
             |ORDER BY doc_id""".stripMargin)),

    // ---- m02: batched feature extraction (stubbed codec; rows-only) ----
    Q("m02_media_features",
      (s, dir) => {
        import s.implicits._
        extractFeatures(mediaDs(s, dir))
          .select(col("doc_id"), col("kind"), col("n_bytes"),
            round(element_at(col("features"), 1).cast("double"), 4).as("f0"),
            round(element_at(col("features"), 2).cast("double"), 4).as("f1"))
          .orderBy(col("doc_id"))
      },
      None),

    // ---- m03: frame sampling (rows-only) -------------------------------
    Q("m03_frame_sample",
      (s, dir) => sampleFrames(mediaDs(s, dir))
        .orderBy(col("doc_id"), col("frame_idx")),
      None),
  )
}
