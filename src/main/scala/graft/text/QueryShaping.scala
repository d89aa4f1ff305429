package graft.text

/** Query shaping for substring probes.
  *
  * The reference bounds index-probe cost on long queries: it keeps only
  * the last `token_viable_limit` tokens of the query for the FM probe
  * (reference: src/lava/substring/search.rs:512-524) and, for sampled
  * indexes, issues one sub-query per offset residue
  * (reference: search.rs:493-507). Both preserve correctness because a
  * probe on a SUBSET of the query's grams yields a candidate SUPERSET —
  * the mandatory refine restores exactness.
  *
  * The gram analogue here: cap the number of distinct grams used for
  * the posting probe. Fewer grams = fewer pruned-partition reads and a
  * cheaper intersection, at the cost of more candidates to refine.
  */
object QueryShaping {

  val DefaultGramLimit = 24

  /** Keep at most `limit` grams, preferring the LAST ones (the
    * reference keeps the query's token suffix). Deterministic.
    */
  def viableGrams(grams: Seq[String], limit: Int = DefaultGramLimit): Seq[String] =
    if (grams.size <= limit) grams else grams.takeRight(limit)
}
