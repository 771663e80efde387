package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed output of the per-document media-metadata extraction. */
case class MediaMeta(
    doc_id: Long,
    byte_len: Int,
    content_md5: String,
    format: String,
    head_codes: Seq[Int],
    n_frames: Int)

/** Multimodal-column plumbing (SURVEY.md north-star): treat media as
  * opaque `binary` payloads + typed metadata, with decode / feature
  * extraction as partition-wise batch processing.
  *
  * The Spark-side plumbing is real — binary column, explicit output
  * schema via a case-class Encoder, `mapPartitions` with per-partition
  * "decoder" init (the pattern a real codec/model handle needs: init once
  * per partition, reuse across rows, never serialize to the driver). The
  * decode itself is a STUB (this container has no image/audio libs): a
  * deterministic function of the bytes, which keeps the whole pipeline
  * oracle-checkable end-to-end.
  */
object Multimodal {

  /** Deterministic fake "decoder" — stands in for a jpeg/png decode +
    * feature extraction. Real implementation would decode `payload` here. */
  private final class StubDecoder {
    // per-partition init (constructor runs once per partition, not per row)
    private val md = java.security.MessageDigest.getInstance("MD5")
    def decode(docId: Long, payload: Array[Byte]): MediaMeta = {
      md.reset()
      val hex = md.digest(payload).map("%02x".format(_)).mkString
      val fmt = (payload.length % 3) match {
        case 0 => "jpeg"
        case 1 => "png"
        case _ => "webp"
      }
      MediaMeta(
        doc_id = docId,
        byte_len = payload.length,
        content_md5 = hex,
        format = fmt,
        head_codes = payload.take(4).map(b => (b & 0xff)).toSeq,
        n_frames = payload.length / 32)
    }
  }

  /** documents.text reinterpreted as an opaque binary media payload. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** Partition-wise decode: one StubDecoder per partition (the expensive
    * init happens #partitions times, not #rows times), rows streamed
    * through it — the exact shape a Pandas-UDF/mapInPandas media pipeline
    * has, in typed Scala form. */
  def mediaMeta(spark: SparkSession, dir: String): Dataset[MediaMeta] = {
    import spark.implicits._
    mediaTable(spark, dir)
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val decoder = new StubDecoder // per-partition init
        rows.map { case (id, payload) => decoder.decode(id, payload) }
      }
  }

  /** Driver-compared face of mediaMeta: array outputs crash the driver's
    * pandas sort, so head_codes is serialized to a comma-joined string. */
  def mediaMetaDf(spark: SparkSession, dir: String): DataFrame =
    mediaMeta(spark, dir).toDF()
      .withColumn("head_codes",
        expr("array_join(transform(head_codes, x -> CAST(x AS STRING)), ',')"))

  /** Frame sampling stub: every 32-byte "frame" at a fixed stride,
    * emitted one row per sampled frame with its offset — the
    * explode-shaped half of a video pipeline. */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("doc_id"), col("payload"),
        expr("octet_length(payload)").as("byte_len"))
      .select(col("doc_id"),
        explode(expr(
          """CASE WHEN byte_len >= 32
            |  THEN transform(sequence(0, CAST(byte_len / 32 AS INT) - 1),
            |         i -> struct(i AS frame_idx,
            |                     md5(substring(payload, i*32 + 1, 32)) AS frame_md5))
            |  ELSE array() END""".stripMargin)).as("f"))
      .select(col("doc_id"), col("f.frame_idx"), col("f.frame_md5"))

  val oracle: Map[String, String] = Map(
    "q32_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS INT) AS byte_len,
        |  md5(text) AS content_md5,
        |  CASE octet_length(CAST(text AS BLOB)) % 3
        |    WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format,
        |  array_to_string(list_transform(range(0, 4),
        |    i -> CAST(ascii(substr(text, CAST(i + 1 AS INT), 1)) AS VARCHAR)), ',') AS head_codes,
        |  CAST(octet_length(CAST(text AS BLOB)) // 32 AS INT) AS n_frames
        |FROM documents""".stripMargin,
    "q33_frame_sample" ->
      """SELECT doc_id, f AS frame_idx,
        |  md5(substr(text, CAST(f * 32 + 1 AS INT), 32)) AS frame_md5
        |FROM documents, (SELECT unnest(range(0, 100)) AS f)
        |WHERE f < octet_length(CAST(text AS BLOB)) // 32""".stripMargin,
  )
}
