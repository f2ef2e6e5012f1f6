package graft.ops


import graft.Q
import graft.schema.Tables.t

/** Multimodal-column plumbing: opaque binary payloads with typed metadata,
  * processed per-partition through a typed Dataset (SURVEY.md north star).
  *
  * The decode step is a clearly-marked STUB — image/audio codecs are not in
  * this container — but everything Spark-side is real: binary column,
  * case-class schema in/out, `mapPartitions` batch shape (one iterator per
  * partition, so a real decoder would amortize codec init per partition,
  * not per row), and deterministic metadata the oracle reproduces.
  *
  * At 100 TB: payloads stay where they are scanned (no shuffle — this is a
  * pure map), `spark.sql.files.maxPartitionBytes` sizes each task's batch,
  * and decode parallelism = partition count across executors.
  */
object Multimodal {

  /** Input projection: payload is the document text's UTF-8 bytes standing
    * in for an image/audio/video blob. */
  final case class BinDoc(doc_id: Long, payload: Array[Byte])

  /** Extracted metadata row. */
  final case class MediaMeta(
      doc_id: Long,
      modality: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      duration_s: Double)

  /** STUB decoder: a real implementation would parse container headers /
    * decode frames here (per-partition, reusing a codec instance). The fake
    * is deterministic in payload length so correctness is still checkable. */
  private def decodeStub(id: Long, payload: Array[Byte]): MediaMeta = {
    val nb = payload.length.toLong
    val modality = (id % 3) match {
      case 0 => "image"
      case 1 => "audio"
      case _ => "video"
    }
    val isImage = modality == "image"
    MediaMeta(
      doc_id = id,
      modality = modality,
      n_bytes = nb,
      width = if (isImage) (64 + nb % 128).toInt else 0,
      height = if (isImage) (64 + (nb * 7) % 128).toInt else 0,
      duration_s = if (isImage) 0.0 else nb / 16.0)
  }

  val qs: Seq[Q] = Seq(
    Q("q50_multimodal_meta",
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio'
        |       ELSE 'video' END AS modality,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(CASE WHEN doc_id % 3 = 0
        |       THEN 64 + octet_length(encode(text)) % 128 ELSE 0 END AS INTEGER) AS width,
        |  CAST(CASE WHEN doc_id % 3 = 0
        |       THEN 64 + (octet_length(encode(text)) * 7) % 128 ELSE 0 END AS INTEGER) AS height,
        |  round(CASE WHEN doc_id % 3 = 0 THEN 0.0
        |       ELSE octet_length(encode(text)) / 16.0 END, 4) AS duration_s
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.functions.{col, round}
      t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[BinDoc]
        .mapPartitions(_.map(d => decodeStub(d.doc_id, d.payload)))
        .toDF()
        .select(col("doc_id"), col("modality"), col("n_bytes"),
          col("width"), col("height"), round(col("duration_s"), 4).as("duration_s"))
        .orderBy(col("doc_id"))
    }
  )
}
