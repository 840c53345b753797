package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.BinaryOps

/** §2.6 — multimodal binary-column plumbing, using the documents'
  * UTF-8 bytes as the opaque payload stand-in (pure ASCII, so the
  * DuckDB oracle can mirror byte ops with text ops).
  */
object MultimodalQueries {

  val queries: Map[String, Q] = Map(
    "m1_binary_meta" -> ((s, dir) =>
      BinaryOps.withMeta(
        table(s, dir, "documents").withColumn("payload", col("text").cast("binary")),
        "payload")
        .select(col("doc_id"), col("n_bytes").cast("long").as("n_bytes"),
          col("format"), col("n_frames"))
        .orderBy("doc_id")),

    "m2_frame_sample" -> ((s, dir) =>
      BinaryOps.sampleFrames(
        table(s, dir, "documents").withColumn("payload", col("text").cast("binary")),
        "payload", "doc_id", stride = 4)
        .withColumn("frame_len", col("frame_len").cast("long"))
        .orderBy("id", "frame_idx")))

  val oracleSql: Map[String, String] = Map(
    "m1_binary_meta" ->
      """SELECT doc_id, octet_length(text::BLOB) AS n_bytes,
        |CASE WHEN substring(text, 1, 3) = 'the' THEN 'type_the'
        |     WHEN substring(text, 1, 2) = 'a ' THEN 'type_a'
        |     ELSE 'type_raw' END AS format,
        |(octet_length(text::BLOB) + 255) // 256 AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m2_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id AS id, text, (octet_length(text::BLOB) + 255) // 256 AS n_frames FROM documents
        |), fr AS (
        |  SELECT id, unnest(generate_series(0, n_frames - 1, 4)) AS frame_idx, text FROM f
        |)
        |SELECT id, frame_idx, frame_idx * 256 AS frame_off,
        |octet_length(substring(text, (frame_idx * 256 + 1)::INT, 256)::BLOB) AS frame_len,
        |md5(substring(text, (frame_idx * 256 + 1)::INT, 256)) AS frame_feature
        |FROM fr ORDER BY id, frame_idx""".stripMargin)
}
