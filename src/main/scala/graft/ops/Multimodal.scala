package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata.
  *
  * The container has no image/audio codecs, so the *decode* step is a
  * clearly-marked deterministic stand-in (md5-derived pseudo-features);
  * everything around it — binary schema, batched columnar pipeline,
  * per-row metadata extraction, exploded feature rows — is the real
  * plumbing a decode UDF would plug into. At 100 TB these are map-only
  * stages over the payload column with full column pruning (the scan
  * reads only the bytes + id).
  */
object Multimodal {

  /** STUB: stands in for a real image decode. Derives fake dimensions
    * from the byte length — deterministic and engine-reproducible.
    */
  private def fakeDims = Seq(
    (octet_length(col("payload")) % 64 + 1).cast("long").as("width"),
    // `div` = truncating integer division (DuckDB's `//`); a plain
    // double-divide + CAST differs across engines (DuckDB rounds casts,
    // Spark truncates)
    (expr("octet_length(payload) div 64") % 64 + 1).cast("long").as("height"))

  def entries: Map[String, Q] = Map(
    // metadata extraction over a binary payload column
    "multimodal_meta" -> Q((s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .select(Seq(col("doc_id"),
          octet_length(col("payload")).cast("long").as("n_bytes")) ++ fakeDims: _*),
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |  octet_length(encode(text)) % 64 + 1 AS width,
        |  (octet_length(encode(text)) // 64) % 64 + 1 AS height
        |FROM documents""".stripMargin),

    // STUB feature extraction: 8 pseudo-features per payload from the
    // md5 of the bytes (where a real pipeline would run the decoder),
    // exploded to (doc_id, feat_idx, value) rows — the shape an
    // embedding table ingests
    "multimodal_features" -> Q((s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
        .select(col("doc_id"), posexplode(
          transform(sequence(lit(1), lit(8)),
            j => round(conv(substring(col("h"), j, lit(1)), 16, 10)
              .cast("double") / 15.0, 4)))
          .as(Seq("feat_idx", "value")))
        .withColumn("feat_idx", col("feat_idx").cast("long")),
      """SELECT doc_id, j - 1 AS feat_idx,
        |  round((strpos('0123456789abcdef', substr(md5(text), j, 1)) - 1) / 15.0, 4) AS value
        |FROM documents, generate_series(1, 8) g(j)""".stripMargin),

    // STUB frame sampling: 3 evenly-spaced fixed-width "frames" from
    // each payload (where video decode would yield real frames) —
    // payload slicing + per-frame fingerprint is the real plumbing
    "multimodal_frame_sample" -> Q((s, dir) => {
      val frameLen = 256
      val d = Tables.load(s, dir, "documents")
        .filter(length(col("text")) >= frameLen)
        .select(col("doc_id"), col("text"),
          (length(col("text")) - frameLen).as("span"))
      d.select(col("doc_id"),
        explode(sequence(lit(0), lit(2))).as("frame_idx"), col("text"), col("span"))
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          (col("frame_idx") * expr("span div 2")).cast("long").as("off"),
          md5(substring(col("text"),
            (col("frame_idx") * expr("span div 2")) + 1, lit(frameLen))).as("frame_fp"))
    },
      """SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
        |  CAST(f * ((length(text) - 256) // 2) AS BIGINT) AS off,
        |  md5(substr(text, f * ((length(text) - 256) // 2) + 1, 256)) AS frame_fp
        |FROM documents, generate_series(0, 2) g(f)
        |WHERE length(text) >= 256""".stripMargin)
  )
}
