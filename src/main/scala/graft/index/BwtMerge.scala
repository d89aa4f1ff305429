package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming BWT merge: interleaves two (or more) built BWT indexes
  * into one WITHOUT re-reading or re-sorting the corpus — the Spark
  * re-expression of the reference's 2-way bitvector-refinement
  * interleave (reference: src/lava/substring/merge.rs:115-183 computes
  * which side supplies each merged position by iteratively refining an
  * interleave vector with LF steps; 185-407 streams the merged chunks).
  *
  * Where the reference refines a driver-held bitvector sequentially,
  * the distributed formulation is prefix doubling over ψ (the inverse
  * LF permutation, recovered from each index's own BWT by rank
  * arithmetic): after k rounds every position carries a key ordering it
  * by its first 2^k window symbols, and ψ^{2^k} — both computed by
  * equi-joins, never by comparing strings. The merged order is the
  * EXACT build order: keys are composed to exactly W symbols (binary
  * decomposition of W, e.g. 10 = 8 + 2), and full-window ties break by
  * (side, original position) — within a side that is the original
  * (rid, i) order and across sides it is constant, so the tie-break is
  * preserved by the LF step exactly like the build's (see
  * [[FmIndex]]'s exactness argument).
  *
  * Cost: log₂(W) self-joins + one range-partitioned sort of n rows of
  * small fixed-width keys — no corpus scan, no suffix-window
  * materialization, no W-char string sort keys. That is the point at
  * 100 TB: compaction pays O(n log W) narrow shuffles instead of the
  * full build (corpus read + explode + wide-key sort) every time.
  */
object BwtMerge {

  private val utf8Ord: Ordering[String] = (a: String, b: String) =>
    org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))

  /** Interleave per-position frames `(pos, bwtc, uid, lf)` of
    * already-built indexes (uids already re-based by the caller; `lf`
    * computed chunk-locally by each encoding's decode — the chunk's
    * own `cum` map plus a running local count, so recovering the LF
    * permutation costs NO shuffle) into one merged ranked frame
    * `(rank, uid, bwtc, fc, chunk, off)` — the same shape the builds
    * consume, cached like theirs.
    *
    * `w` must be the indexes' common suffix-window length.
    */
  def interleave(spark: SparkSession, sides: Seq[DataFrame], w: Int,
      chunkSize: Int): DataFrame = {
    import spark.implicits._
    require(sides.nonEmpty)
    val all = sides.zipWithIndex.map { case (df, i) =>
      df.select(lit(i).as("src"), col("pos"), col("bwtc"), col("uid"),
        col("lf"))
    }.reduce(_ unionByName _).persist()

    // merged symbol ranks (shared across sides), UTF-8 binary order
    // (= the build's sort order); σ rows, broadcast
    val syms = all.select("bwtc").distinct()
      .collect().map(_.getString(0)).sorted(utf8Ord).zipWithIndex.toSeq
    val symDf = broadcast(syms.toDF("bwtc", "srank"))

    // Inverting LF gives both ψ and the first symbol in one map-only
    // pass: ψ(LF(p)) = p and fs(LF(p)) = bwtc(p).
    val p1 = all.join(symDf, Seq("bwtc"))
      .select(col("src"), col("lf").as("pos"),
        col("srank").as("grp"), col("pos").as("nxt"),
        col("bwtc").as("fc")).persist()
    val fsF = p1.select(col("src"), col("pos"), col("fc"))

    // power frames: grp orders by the first k symbols, nxt = ψ^k
    var powers = List(1 -> p1.select("src", "pos", "grp", "nxt"))
    while (powers.head._1 * 2 <= w) {
      val (k, pk) = powers.head
      val partner = pk.select(col("src"), col("pos").as("nxt"),
        col("grp").as("g2"), col("nxt").as("nxt2"))
      // hash join, not sort-merge: the doubling rounds don't need
      // their intermediate frames sorted, only co-partitioned
      val p2k = pk.join(partner.hint("shuffle_hash"), Seq("src", "nxt"))
        .select(col("src"), col("pos"),
          struct(col("grp"), col("g2")).as("grp"), col("nxt2").as("nxt"))
        .persist()
      powers = (k * 2) -> p2k :: powers
    }

    // compose the key to EXACTLY w symbols (greedy binary
    // decomposition): more would break the tie-break's LF-consistency,
    // fewer would under-sort vs the build
    var remaining = w
    var asm: DataFrame = null // (src, pos, parts..., nxt)
    var nParts = 0
    powers.foreach { case (k, pk) =>
      if (remaining >= k) {
        remaining -= k; nParts += 1
        asm =
          if (asm == null)
            pk.select(col("src"), col("pos"),
              col("grp").as(s"k$nParts"), col("nxt"))
          else asm.join(
            pk.select(col("src"), col("pos").as("nxt"),
              col("grp").as(s"k$nParts"), col("nxt").as("nxt2"))
              .hint("shuffle_hash"),
            Seq("src", "nxt"))
            .drop("nxt").withColumnRenamed("nxt2", "nxt")
      }
    }
    val key = struct((1 to nParts).map(i => col(s"k$i")): _*)

    // merged order: exact-W window key, then (side, original position)
    val full = all.drop("lf")
      .join(fsF.hint("shuffle_hash"), Seq("src", "pos"))
      .join(asm.select(col("src"), col("pos"), key.as("key"))
        .hint("shuffle_hash"), Seq("src", "pos"))
    val sorted = full
      .repartitionByRange(col("key"), col("src"), col("pos"))
      .sortWithinPartitions("key", "src", "pos")
    val ranked = sorted.select("uid", "bwtc", "fc").rdd.zipWithIndex()
      .map { case (r, rank) =>
        (rank, r.getLong(0), r.getString(1), r.getString(2))
      }.toDF("rank", "uid", "bwtc", "fc")
      .withColumn("chunk", expr(s"rank div $chunkSize"))
      .withColumn("off", col("rank") % chunkSize)
      .cache()
    ranked.count() // materialize before the lineage below is unpersisted
    powers.foreach(_._2.unpersist())
    p1.unpersist()
    all.unpersist()
    ranked
  }
}
