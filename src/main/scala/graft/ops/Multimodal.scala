package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata.
  *
  * The decode step sits behind the [[MediaDecoder]] seam: the engine
  * pipeline (binary schema, column-pruned scans, per-row metadata,
  * exploded feature rows, frame slicing) is decoder-agnostic, and a
  * real codec plugs in by implementing the trait — as a codegen'd
  * column expression if the codec is expressible, or a UDF /
  * mapPartitions batch over the payload bytes if not. This container
  * ships no image/audio codecs, so the default implementation is the
  * clearly-marked deterministic md5 stand-in; every query below runs
  * through the seam, not the stub directly. At 100 TB these are
  * map-only stages over the payload column with full column pruning
  * (the scan reads only the bytes + id).
  */
object Multimodal {

  /** Pluggable decode seam. All methods are column-level so a stub or
    * a real codec UDF slot into the same (codegen-friendly) pipeline.
    */
  trait MediaDecoder extends Serializable {
    /** (width, height) metadata derived from a binary payload. */
    def dims(payload: Column): (Column, Column)
    /** `n` pseudo/real features of the payload, as ordered columns of
      * (index, value) after explosion — returns the array column.
      */
    def features(payload: Column, n: Int): Column
    /** Fingerprint of one fixed-width frame slice starting at `off`
      * (1-based) — video decode stand-in.
      */
    def frameFingerprint(payload: Column, off: Column, len: Int): Column
    /** Downsample the payload to ~`targetN` samples (the image-resize /
      * audio-downsample stand-in): nearest-neighbor = every stride-th
      * unit, stride = max(1, len div targetN).
      */
    def resize(payload: Column, targetN: Int): Column
  }

  /** STUB decoder: deterministic, engine-reproducible stand-ins (the
    * sandbox has no codecs). Dimensions from byte length, features
    * from the md5 of the bytes, frame fingerprints from md5 of the
    * slice. A real implementation replaces exactly this object.
    */
  object Md5StubDecoder extends MediaDecoder {
    def dims(payload: Column): (Column, Column) = (
      (octet_length(payload) % 64 + 1).cast("long"),
      // shiftright(x, 6) = truncating x div 64 for the non-negative
      // octet_length (DuckDB's `// 64`); a plain double-divide + CAST
      // differs across engines (DuckDB rounds casts, Spark truncates).
      // Built from the PARAMETER — an expr("... payload ...") string
      // would capture whatever column happens to be named `payload`
      // at the call site instead of the one passed in
      (shiftright(octet_length(payload), 6) % 64 + 1).cast("long"))

    def features(payload: Column, n: Int): Column = {
      val h = md5(payload)
      transform(sequence(lit(1), lit(n)),
        j => round(conv(substring(h, j, lit(1)), 16, 10)
          .cast("double") / 15.0, 4))
    }

    def frameFingerprint(payload: Column, off: Column, len: Int): Column =
      md5(substring(payload, off, lit(len)))

    def resize(payload: Column, targetN: Int): Column = {
      val stride = greatest(lit(1),
        (length(payload) / lit(targetN)).cast("int"))
      // sequence(1, 0, 1) throws "illegal sequence boundaries" on an
      // empty payload where DuckDB's generate_series yields [] — guard
      // so one empty document can't fail the whole query
      when(length(payload) === 0, lit("")).otherwise(
        aggregate(sequence(lit(1), length(payload), stride), lit(""),
          (acc, i) => concat(acc, payload.substr(i, lit(1)))))
    }
  }

  /** The decoder every entry runs through (swap point for real codecs). */
  val decoder: MediaDecoder = Md5StubDecoder

  def entries: Map[String, Q] = Map(
    // metadata extraction over a binary payload column
    "multimodal_meta" -> Q((s, dir) => {
      val dims = decoder.dims(col("payload"))
      val (w, h) = (dims._1.as("width"), dims._2.as("height"))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .select(col("doc_id"),
          octet_length(col("payload")).cast("long").as("n_bytes"), w, h)
    },
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |  octet_length(encode(text)) % 64 + 1 AS width,
        |  (octet_length(encode(text)) // 64) % 64 + 1 AS height
        |FROM documents""".stripMargin),

    // feature extraction through the decoder seam, exploded to
    // (doc_id, feat_idx, value) rows — the shape an embedding table
    // ingests
    "multimodal_features" -> Q((s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .select(col("doc_id"),
          posexplode(decoder.features(col("payload"), 8))
            .as(Seq("feat_idx", "value")))
        .withColumn("feat_idx", col("feat_idx").cast("long")),
      """SELECT doc_id, j - 1 AS feat_idx,
        |  round((strpos('0123456789abcdef', substr(md5(text), j, 1)) - 1) / 15.0, 4) AS value
        |FROM documents, generate_series(1, 8) g(j)""".stripMargin),

    // resize (nearest-neighbor downsample) through the decoder seam:
    // stride-sampled payload to ~64 samples per row — the image
    // thumbnail / audio downsample plumbing (map-only, column-pruned;
    // a real codec swaps the sampling for pixel-space interpolation)
    "multimodal_resize" -> Q((s, dir) => {
      val resized = decoder.resize(col("text"), 64)
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          length(resized).cast("long").as("n_samples"),
          md5(resized).as("fp"))
    },
      """SELECT doc_id,
        |  len([substr(text, i, 1) for i in generate_series(1, length(text), greatest(1, length(text) // 64))])::BIGINT AS n_samples,
        |  md5(list_aggregate([substr(text, i, 1) for i in generate_series(1, length(text), greatest(1, length(text) // 64))], 'string_agg', '')) AS fp
        |FROM documents""".stripMargin),

    // frame sampling through the decoder seam: 3 evenly-spaced
    // fixed-width "frames" per payload — payload slicing + per-frame
    // fingerprint is the real plumbing video decode plugs into
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
          decoder.frameFingerprint(col("text"),
            (col("frame_idx") * expr("span div 2")) + 1, frameLen).as("frame_fp"))
    },
      """SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
        |  CAST(f * ((length(text) - 256) // 2) AS BIGINT) AS off,
        |  md5(substr(text, f * ((length(text) - 256) // 2) + 1, 256)) AS frame_fp
        |FROM documents, generate_series(0, 2) g(f)
        |WHERE length(text) >= 256""".stripMargin)
  )
}
