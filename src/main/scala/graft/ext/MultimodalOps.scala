package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.Canon

/** Multimodal-column plumbing: opaque `BINARY` payloads + typed metadata,
  * the layout for image/audio/video at corpus scale (content stays an
  * opaque blob; all relational work happens on extracted metadata).
  *
  * The harness container has no image/audio codecs, so `decodeStub` is a
  * DETERMINISTIC FAKE decoder (parses dimensions from payload bytes, never
  * a real codec) — clearly marked; the Spark-side plumbing around it is
  * real and tested: binary column construction, per-partition batched
  * decode through a typed Dataset (the mapPartitions seam where a codec
  * library would be called), metadata schema, and frame-sampling index
  * arithmetic.
  *
  * The fixture has no binary table, so payloads derive from `documents`
  * text bytes — the binary-column machinery (octet lengths, byte slicing,
  * hex, content hashing) is identical for real media bytes.
  */
object MultimodalOps {

  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long,
                       height: Long, n_frames: Long,
                       sampled_frames: Seq[Long])

  /** Binary payloads + relational metadata, fully oracle-expressible
    * (byte length, first-8-bytes hex, md5, fake dimensions from the lead
    * byte — all byte arithmetic both engines implement identically).
    */
  def binaryMeta(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.load(spark, sfDir, "documents")
      .withColumn("content", col("text").cast("binary"))
    Canon.canonicalize(d.select(
      col("doc_id"),
      length(col("content")).as("n_bytes"),
      lower(hex(substring(col("content"), 1, 8))).as("head_hex"),
      md5(col("content")).as("content_md5"),
      // FAKE dimensions — lead-byte arithmetic standing in for a codec
      (ascii(col("text")) % 64 + 1).as("fake_width"),
      (ascii(col("text")) % 48 + 1).as("fake_height")))
  }

  val binaryMetaOracle: String =
    """SELECT doc_id,
      |       octet_length(encode(text)) AS n_bytes,
      |       lower(substring(hex(encode(text)), 1, 16)) AS head_hex,
      |       md5(text) AS content_md5, -- VARCHAR md5 hashes UTF-8 bytes = the payload
      |       CAST(ascii(text) % 64 + 1 AS BIGINT) AS fake_width,
      |       CAST(ascii(text) % 48 + 1 AS BIGINT) AS fake_height
      |FROM documents""".stripMargin

  val frameBytes = 16
  val frameSampleStep = 10

  /** Frame sampling over binary payloads as a RELATIONAL op: the payload
    * is a sequence of fixed-width frames (stand-in for a real container
    * format's frame index); every `frameSampleStep`-th frame gets its
    * byte offset and a content fingerprint of its slice. This is the
    * shape of video/audio sampling at corpus scale — pure byte arithmetic
    * + explode, linear, no codec needed until the decode seam below —
    * and every step is DuckDB-expressible, so the op is hash-verified.
    *
    * The fingerprint hashes the LOWERCASE HEX of the frame slice (not the
    * raw bytes) so both engines hash an identical string regardless of
    * their blob-digest support.
    */
  def frameSamples(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.load(spark, sfDir, "documents")
      .withColumn("content", col("text").cast("binary"))
      .withColumn("n_frames",
        (length(col("content")) / frameBytes).cast("long"))
      .filter(col("n_frames") > 0)
    val frames = d.select(col("doc_id"), col("n_frames"), col("content"),
        explode(sequence(lit(0L), col("n_frames") - 1,
          lit(frameSampleStep.toLong))).as("frame_idx"))
      .withColumn("frame_off", col("frame_idx") * frameBytes)
      .withColumn("frame_md5",
        md5(lower(hex(col("content")
          .substr(col("frame_off").cast("int") + 1, lit(frameBytes))))))
    Canon.canonicalize(frames
      .select("doc_id", "n_frames", "frame_idx", "frame_off", "frame_md5"))
  }

  val frameSamplesOracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, hex(encode(text)) AS content_hex,
       |         octet_length(encode(text)) // $frameBytes AS n_frames
       |  FROM documents),
       |f AS (
       |  SELECT doc_id, n_frames, i AS frame_idx, i * $frameBytes AS frame_off,
       |         md5(lower(substring(content_hex,
       |           CAST(i * ${frameBytes * 2} + 1 AS INT),
       |           ${frameBytes * 2}))) AS frame_md5
       |  FROM d, UNNEST(range(0, n_frames, $frameSampleStep)) AS t(i)
       |  WHERE n_frames > 0)
       |SELECT doc_id, n_frames, frame_idx, frame_off, frame_md5 FROM f""".stripMargin

  /** ??? in spirit: the decode seam. Batched per partition exactly like a
    * real codec call (one library handle per partition, vectorized loop);
    * the decode itself is a deterministic fake over the payload bytes.
    */
  def decodeStub(spark: SparkSession, payloads: DataFrame,
                 frameSampleEvery: Int = frameSampleStep): Dataset[MediaMeta] = {
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"),
        col("content").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real codec integration point: open the library handle HERE, once
        // per partition, and feed it each payload below.
        it.map { case (id, bytes) =>
          val lead = if (bytes.nonEmpty) bytes(0) & 0xff else 0
          val width = lead % 64 + 1
          val height = lead % 48 + 1
          val nFrames = bytes.length / frameBytes.toLong
          val sampled = (0L until nFrames by frameSampleEvery.toLong).toSeq
          MediaMeta(id, bytes.length.toLong, width.toLong, height.toLong,
            nFrames, sampled)
        }
      }
  }
}
