package graft.index

import graft.core.IndexStore
import graft.ops.Similarity
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vamana (DiskANN-style) graph ANN index — the reference's alternate
  * vector path (reference: src/vamana/vamana.rs, 949 LoC; disk access
  * layout src/vamana/access.rs:34-80 stores vector + adjacency
  * together, which `graph/` mirrors as one parquet row per node).
  *
  * Spark re-expression of the reference's own parallel strategy
  * (`build_index_par`, vamana.rs:528-600): k-means the corpus into
  * overlapping partitions — every vector lands in its TWO nearest
  * cells — build an independent in-memory Vamana graph per partition
  * with HALVED degree, then stitch each node's two edge lists by
  * concat + dedup. That per-partition build is `flatMapGroups` (each
  * group is bounded at ~[[PartTarget]] vectors, so executor memory is
  * bounded at ANY corpus size — partition count grows with the data,
  * the reference's `2 × num_threads` generalized); the stitch is one
  * `groupBy(vec_id)` shuffle of id-lists. Nothing data-scale ever
  * reaches the driver.
  *
  * In-memory build per group follows the reference exactly: random
  * R-regular edgelist init (vamana.rs:377-395), two passes over a
  * shuffled node order with alpha = 1.0 then [[Alpha]]
  * (vamana.rs:498-526 `for prune in [1.0, pruning_threshold]`), each
  * visit = greedy search from the medoid (vamana.rs:261-305) → robust
  * prune over the visited set (vamana.rs:306-346, keep rule
  * `alpha·d(kept, e) < d(q, kept)` drops e) → backward edges with
  * prune-on-overflow (vamana.rs:348-369). One deliberate deviation:
  * the navigation metric is COSINE distance, not the reference's
  * EuclideanF32 (access.rs:117-121) — the graph must be built in the
  * metric the final rerank uses (the same pre-metric/final-metric
  * argument as the IVF ADC cosine table), and every other searcher in
  * this library ranks by cosine. One addition: after the two passes
  * each partition appends a reachability patch (edges medoid →
  * unreached component) so a full-frontier traversal provably visits
  * every node — that makes the probe-everything configuration EXACT
  * and oracle-gateable, where the reference's random-init graph is
  * only connected with high probability.
  *
  * Search is the reference's beam search (vamana.rs:135-168) run on
  * the driver with BATCHED node fetches — per round the top-[[BeamW]]
  * unexpanded frontier nodes' neighbor rows are fetched in ONE
  * parquet point-lookup job (`vec_id IN`, pruned by the sorted-by-id
  * row-group stats), the BwtDriver chunk-fetch discipline applied to
  * graph hops. Fetched nodes are LRU-cached across searches,
  * version-keyed by the graph dir.
  */
object VamanaIndex {

  val R = 32          // stitched max degree (per-partition builds use R/2,
                      // reference: vamana.rs:546 `num_neighbors / 2`)
  val Alpha = 1.2     // pruning threshold (DiskANN's published default)
  val BuildL = 64     // build-time search frontier size
  val SearchL = 64    // query-time beam width (frontier cap)
  val BeamW = 8       // nodes expanded per batched fetch round
  val SeedProbe = 8   // production entry points: nearest cell medoids
  val Seed = 42L

  /** Vectors per build partition. Each vector is assigned to 2 cells,
    * so partition count = 2n / PartTarget — grows with the corpus
    * while per-group memory stays ~PartTarget × dim × 8 B.
    */
  val PartTarget = 100000

  def numPartitions(n: Long, partTarget: Int = PartTarget): Int =
    math.max(4, math.ceil(2.0 * n / partTarget).toInt)

  // ---- metric -------------------------------------------------------

  private def cosDist(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    if (na == 0.0 || nb == 0.0) 1.0 else 1.0 - dot / math.sqrt(na * nb)
  }

  private def l2sq(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  // ---- in-memory per-partition build --------------------------------

  /** Greedy beam search over the local graph (reference:
    * vamana.rs:261-305): expand the closest unvisited frontier node,
    * push its neighbors, sort + dedup + truncate to `L`. Returns the
    * expanded (visited) list with distances — the robust-prune
    * candidate set. Ties break on id for determinism.
    */
  private def greedyLocal(vecs: Array[Array[Double]],
      adj: Array[scala.collection.mutable.ArrayBuffer[Int]], start: Int,
      q: Array[Double], L: Int): Seq[(Int, Double)] = {
    val visited = new java.util.HashSet[Int]()
    val expanded = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    var frontier = Vector((start, cosDist(q, vecs(start))))
    var continue = true
    while (continue) {
      frontier.find(f => !visited.contains(f._1)) match {
        case None => continue = false
        case Some(c) =>
          visited.add(c._1)
          expanded += c
          val added = adj(c._1).iterator
            .filterNot(n => frontier.exists(_._1 == n))
            .map(n => (n, cosDist(q, vecs(n)))).toVector
          frontier = (frontier ++ added)
            .sortBy { case (id, d) => (d, id) }
            .distinctBy(_._1).take(L)
      }
    }
    expanded.toSeq
  }

  /** Robust prune (reference: vamana.rs:306-346): candidates sorted by
    * distance to `q`; greedily keep the closest remaining `v`, then
    * drop every later candidate `e` with `alpha · d(v, e) < d(q, v)`
    * (the reference's literal rule — stricter than the DiskANN paper's
    * `≤ d(q, e)`, i.e. it prunes less). Stops at `r` kept.
    */
  private def robustPrune(vecs: Array[Array[Double]], q: Int,
      cands: Seq[(Int, Double)], alpha: Double,
      r: Int): scala.collection.mutable.ArrayBuffer[Int] = {
    val sorted = cands.filter(_._1 != q).distinctBy(_._1)
      .sortBy { case (id, d) => (d, id) }.toArray
    val eligible = Array.fill(sorted.length)(true)
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < sorted.length && out.size < r) {
      if (eligible(i)) {
        val (v, d) = sorted(i)
        out += v
        var j = i + 1
        while (j < sorted.length) {
          if (eligible(j) &&
              alpha * cosDist(vecs(v), vecs(sorted(j)._1)) < d)
            eligible(j) = false
          j += 1
        }
      }
      i += 1
    }
    out
  }

  /** One partition's full Vamana build (reference: vamana.rs:498-526).
    * Returns (adjacency, medoid). Deterministic: seeded shuffles, tie
    * breaks on id.
    */
  private[graft] def buildLocal(vecs: Array[Array[Double]], r: Int,
      buildL: Int, seed: Long): (Array[Array[Int]], Int) = {
    val m = vecs.length
    if (m == 1) return (Array(Array.empty[Int]), 0)
    val rEff = math.min(r, m - 1)
    val rnd = new scala.util.Random(seed)
    // medoid = closest to the mean (reference: vamana.rs:419-450)
    val mean = Array.tabulate(vecs(0).length)(d =>
      vecs.map(_(d)).sum / m)
    val medoid = (0 until m).minBy(i => (cosDist(vecs(i), mean), i))
    // random rEff-regular init (reference: vamana.rs:377-395)
    val adj = Array.fill(m)(scala.collection.mutable.ArrayBuffer.empty[Int])
    for (v <- 0 until m) {
      val picked = scala.collection.mutable.LinkedHashSet.empty[Int]
      while (picked.size < rEff) {
        val c = rnd.nextInt(m)
        if (c != v) picked += c
      }
      adj(v) ++= picked
    }
    // two passes, alpha = 1.0 then Alpha (reference: vamana.rs:515)
    for ((alpha, pass) <- Seq((1.0, 0), (Alpha, 1))) {
      val order = rnd.shuffle((0 until m).toVector)
      for (v <- order) {
        val vis = greedyLocal(vecs, adj, medoid, vecs(v), buildL)
        val cands = vis ++ adj(v).map(n => (n, cosDist(vecs(v), vecs(n))))
        adj(v) = robustPrune(vecs, v, cands, alpha, rEff)
        // backward edges (reference: vamana.rs:348-369)
        for (n <- adj(v).toSeq) {
          if (!adj(n).contains(v)) {
            if (adj(n).size < rEff) adj(n) += v
            else {
              val cands2 = (adj(n).toSeq :+ v)
                .map(x => (x, cosDist(vecs(n), vecs(x))))
              adj(n) = robustPrune(vecs, n, cands2, alpha, rEff)
            }
          }
        }
      }
      val _ = pass
    }
    // reachability patch: BFS from the medoid; link each unreached
    // component once so a full-frontier traversal is provably total
    // (the exact-configuration guarantee; see class doc)
    val reached = Array.fill(m)(false)
    def bfs(from: Int): Unit = {
      val q = scala.collection.mutable.Queue(from)
      reached(from) = true
      while (q.nonEmpty) {
        val c = q.dequeue()
        for (n <- adj(c)) if (!reached(n)) { reached(n) = true; q += n }
      }
    }
    bfs(medoid)
    for (u <- 0 until m) if (!reached(u)) { adj(medoid) += u; bfs(u) }
    (adj.map(_.toArray), medoid)
  }

  // ---- distributed build -------------------------------------------

  /** `emb` must have (vec_id: long, v: array<double>). Writes
    * `graph/` (vec_id, nbrs, v — one row per node, sorted by vec_id
    * for point-lookup row-group pruning), `head/` (global + per-cell
    * medoids with vectors: the search seeds, driver-cached), and
    * `info/` (n).
    */
  def build(spark: SparkSession, emb: DataFrame, path: String,
      partTarget: Int = PartTarget): Unit = {
    import spark.implicits._
    val src = emb.select(col("vec_id").cast("long"),
      col("v").cast("array<double>")).cache()
    val n = src.count()
    // min/max on Long BEFORE the narrowing: n/2 for a multi-billion-row
    // corpus overflows an eager .toInt to 0 or negative, crashing setK
    val k = math.min(numPartitions(n, partTarget).toLong,
      math.max(2L, n / 2)).toInt
    // k-means cells for the overlapping partition assignment
    // (reference: vamana.rs:532 kmeans into 2×threads partitions)
    val model = new KMeans().setK(k).setSeed(Seed).setMaxIter(10)
      .fit(src.withColumn("features", array_to_vector(col("v"))))
    val centers = model.clusterCenters.map(_.toArray)
    val bc = spark.sparkContext.broadcast(centers)
    // each vector → its TWO nearest cells (L2, the k-means metric;
    // reference: kmeans.rs assignment) — a map-only linear scan over
    // the broadcast centers, never an n × k explode
    val assigned = src.as[(Long, Seq[Double])].mapPartitions { it =>
      val cs = bc.value
      it.flatMap { case (id, v) =>
        val a = v.toArray
        var b1 = -1; var b2 = -1
        var d1 = Double.MaxValue; var d2 = Double.MaxValue
        var c = 0
        while (c < cs.length) {
          val d = l2sq(a, cs(c))
          if (d < d1) { d2 = d1; b2 = b1; d1 = d; b1 = c }
          else if (d < d2) { d2 = d; b2 = c }
          c += 1
        }
        if (cs.length == 1) Seq((b1, id, v))
        else Seq((b1, id, v), (b2, id, v))
      }
    }.persist()
    // per-partition in-memory Vamana with halved degree
    // (reference: vamana.rs:541-552). k-means gives NO per-cell size
    // bound — a skewed corpus (millions of near-identical embeddings)
    // can collapse into one cell — so count each cell (one k-row agg)
    // and salt oversized cells by vec_id into ceil(size/PartTarget)
    // sub-groups: flatMapGroups' toArray is then genuinely bounded at
    // ~PartTarget rows at any corpus size or skew. Each sub-group gets
    // its own medoid + reachability patch, so the exact-configuration
    // totality guarantee survives the split.
    val cellSizes = assigned.groupByKey(_._1).count().collect().toMap
    val splits = cellSizes.map { case (c, sz) =>
      c -> math.max(1L, math.ceil(sz.toDouble / partTarget).toLong)
    }
    val stride = splits.values.foldLeft(1L)(math.max)
    val bcSplits = spark.sparkContext.broadcast(splits)
    val parts = assigned.groupByKey { case (c, id, _) =>
      val s = bcSplits.value.getOrElse(c, 1L)
      c * stride + (if (s <= 1L) 0L else java.lang.Long.remainderUnsigned(id, s))
    }.flatMapGroups { (pid, rows) =>
      val buf = rows.toArray.sortBy(_._2)
      val ids = buf.map(_._2)
      val vecs = buf.map(_._3.toArray)
      val (adj, med) = buildLocal(vecs, R / 2, BuildL, Seed + pid)
      adj.zipWithIndex.iterator.map { case (ns, i) =>
        (ids(i), ns.map(ids(_)).toSeq.sorted, i == med, pid)
      }
    }.toDF("vec_id", "nbrs", "med", "part")
    parts.cache()
    // stitch: concat both copies' edge lists, dedup
    // (reference: vamana.rs:556-583)
    // honor the caller's partTarget, like the build partitioning above
    // (the constant would silently override a tuned physical layout)
    val nFiles = math.max(1, (n / partTarget).toInt)
    parts.groupBy("vec_id")
      .agg(array_sort(array_distinct(flatten(collect_list("nbrs"))))
        .as("nbrs"))
      .join(src, Seq("vec_id"))
      .repartitionByRange(nFiles, col("vec_id"))
      .sortWithinPartitions("vec_id")
      .write.mode("overwrite").option("compression", "zstd")
      .parquet(s"$path/graph")
    // head: per-cell medoids + the global medoid (closest to the
    // corpus mean, reference: vamana.rs:419-450,594) — the search seeds
    val dim = src.select(size(col("v"))).head().getInt(0)
    val mean = src.select(posexplode(col("v")).as(Seq("i", "x")))
      .groupBy("i").agg(avg("x").as("x")).orderBy("i")
      .collect().map(_.getDouble(1)).toSeq
    require(mean.size == dim, s"ragged embedding column (dim $dim)")
    val gm = src
      .withColumn("d", lit(1.0) -
        graft.GraftExtensions.cosineSim(spark, col("v"), typedLit(mean)))
      .orderBy(col("d"), col("vec_id")).limit(1)
      .select(lit(-1L).as("part"), col("vec_id"), col("v"))
    parts.filter(col("med")).select(col("part"), col("vec_id"))
      .join(src, Seq("vec_id")).select(col("part"), col("vec_id"), col("v"))
      .unionByName(gm)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/head")
    Seq(n).toDF("n").coalesce(1).write.mode("overwrite")
      .parquet(s"$path/info")
    parts.unpersist(); assigned.unpersist(); src.unpersist()
  }

  // ---- driver-side beam search with batched fetches -----------------

  private case class Node(nbrs: Array[Long], v: Array[Double])

  // head (seed medoids + n) cached keep-latest per path like the IVF
  // centroid head — byte-accounted under the shared serve budget: the
  // medoid array grows as 2n/100k × dim, real driver memory at 100 TB
  private val headCache = graft.index.Serve
    .budgeted[String, (Long, Array[(Long, Long, Array[Double])], Long)]({
      case (_, meds, _) =>
        64L + meds.iterator.map(m => 56L + 8L * m._3.length).sum
    }, maxShare = 1) // keep-latest head: admit up to the full budget
  // byte-accounted under the ONE shared serve budget (Serve.Budget):
  // a node is vector + adjacency, so 65536 max-degree nodes of a
  // high-dim index were an unbounded number of BYTES under the old
  // entry-count cap
  private val nodeCache =
    graft.index.Serve.budgeted[(String, Long, Long), Node](nd =>
      64L + 8L * nd.nbrs.length + 8L * nd.v.length)

  private def headOf(spark: SparkSession,
      path: String): (Long, Array[(Long, Long, Array[Double])], Long) = {
    val ver = graft.core.Fs.dirSignature(spark, s"$path/graph")
    headCache.get(path) match {
      case Some(h @ (v, _, _)) if v == ver => h
      case _ =>
        val meds = spark.read.parquet(s"$path/head").collect()
          .map(r => (r.getLong(0), r.getLong(1),
            r.getSeq[Double](2).toArray))
        val n = spark.read.parquet(s"$path/info").head().getLong(0)
        // re-stat before caching: an in-place rebuild completing
        // between the stat and the reads would cache the NEW build's
        // head under the OLD signature (the BwtDriver.headAt
        // discipline; node fetches are already version-keyed)
        require(try graft.core.Fs.dirSignature(spark, s"$path/graph") == ver
          catch { case _: Exception => false },
          s"index at $path changed during the operation — retry")
        val h = (ver, meds, n)
        headCache.put(path, h)
        h
    }
  }

  /** Node count of the graph at `path` (driver-cached with the head). */
  private[graft] def nodeCount(spark: SparkSession, path: String): Long =
    headOf(spark, path)._3

  /** ONE point-lookup job fetches every missing node row of a batch;
    * rows land in the shared LRU cache. The Spark collect runs outside
    * any lock (racing duplicate fetches insert identical rows). The
    * returned map is assembled from the cache HITS read under the lock
    * plus the fetched rows themselves — never re-read from the cache —
    * so eviction during this call (by its own inserts or a concurrent
    * search's) cannot silently drop a requested id from the result.
    */
  private def fetchNodes(spark: SparkSession, path: String, ver: Long,
      ids: Seq[Long]): Map[Long, Node] = {
    val distinct = ids.distinct
    val hits = distinct.flatMap { id =>
      nodeCache.get((path, ver, id)).map(id -> _)
    }.toMap
    val missing = distinct.filterNot(hits.contains)
    if (missing.isEmpty) hits
    else {
      val fetched = spark.read.parquet(s"$path/graph")
        .filter(col("vec_id").isin(missing: _*))
        .select("vec_id", "nbrs", "v").collect()
        .map(r => r.getLong(0) ->
          Node(r.getSeq[Long](1).toArray, r.getSeq[Double](2).toArray))
        .toMap
      // re-stat: never insert rows read AFTER an in-place rebuild under
      // the pre-rebuild version key (see headOf)
      require(try graft.core.Fs.dirSignature(spark, s"$path/graph") == ver
        catch { case _: Exception => false },
        s"index at $path changed during the operation — retry")
      fetched.foreach { case (id, nd) =>
        nodeCache.put((path, ver, id), nd)
      }
      hits ++ fetched
    }
  }

  /** Pre-warm seam for [[Serve.populateRows]]: cache the head and EVERY
    * graph node (one full-graph read into the budgeted node cache), so
    * the first beam after deploy walks entirely driver-side. Returns
    * the node count warmed.
    */
  private[graft] def populateNodes(spark: SparkSession,
      path: String): Long = {
    val (ver, _, _) = headOf(spark, path)
    val ids = spark.read.parquet(s"$path/graph")
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    fetchNodes(spark, path, ver, ids)
    ids.length.toLong
  }

  /** Beam search (reference: vamana.rs:135-168, batched): per round the
    * top-[[BeamW]]-equivalent `w` unexpanded frontier nodes' neighbors
    * are fetched in one job, scored, and merged; the frontier is
    * truncated to `l`. Stops when every frontier node is expanded.
    * Returns (candidate ids = final frontier, expanded count).
    *
    * `seedAll = true` seeds every cell medoid instead of just the
    * global one; with `l >= n` the traversal then provably visits the
    * whole graph (each cell's nodes are reachable from its medoid by
    * the build's reachability patch) — the exact configuration.
    */
  private[graft] def beam(spark: SparkSession, path: String,
      q: Array[Double], l: Int, w: Int,
      seedAll: Boolean): (Seq[Long], Long) = {
    val (ver, meds, _) = headOf(spark, path)
    // production seeds: the global medoid PLUS the [[SeedProbe]] cell
    // medoids nearest the query (IVF-style entry probing against the
    // driver-cached head — zero extra jobs). A lone global seed starts
    // the walk in one build partition and cross-cell edges only exist
    // where the overlapping assignment made them, which left recall on
    // a wide query panel below the floor.
    val seeds = if (seedAll)
      meds.toSeq.map { case (_, id, v) => (id, cosDist(q, v)) }
        .sortBy { case (id, d) => (d, id) }.distinctBy(_._1)
    else prodSeeds(meds, q)
    val dist = scala.collection.mutable.HashMap(seeds: _*)
    val expanded = scala.collection.mutable.HashSet.empty[Long]
    var frontier = seeds.toVector
    var continue = true
    while (continue) {
      val batch = frontier.filterNot(f => expanded.contains(f._1)).take(w)
      if (batch.isEmpty) continue = false
      else {
        val nodes = fetchNodes(spark, path, ver, batch.map(_._1))
        val pending = batch.flatMap { case (id, _) =>
          nodes.get(id).fold(Array.empty[Long])(_.nbrs)
        }.distinct.filterNot(dist.contains)
        val fetched = fetchNodes(spark, path, ver, pending)
        val scored = pending.flatMap(id =>
          fetched.get(id).map(nd => (id, cosDist(q, nd.v))))
        scored.foreach { case (id, d) => dist(id) = d }
        batch.foreach { case (id, _) => expanded += id }
        frontier = (frontier ++ scored)
          .sortBy { case (id, d) => (d, id) }.take(l)
      }
    }
    (frontier.map(_._1), expanded.size.toLong)
  }

  /** Production entry points for one query: the global medoid plus the
    * [[SeedProbe]] nearest cell medoids, scored and deduped.
    */
  private def prodSeeds(meds: Array[(Long, Long, Array[Double])],
      q: Array[Double]): Seq[(Long, Double)] =
    (meds.toSeq.filter(_._1 == -1L) ++
      meds.toSeq.filter(_._1 != -1L)
        .sortBy { case (_, id, v) => (cosDist(q, v), id) }
        .take(SeedProbe))
      .map { case (_, id, v) => (id, cosDist(q, v)) }
      .sortBy { case (id, d) => (d, id) }.distinctBy(_._1)

  /** Batched production beam: every query's frontier advances in
    * LOCK-STEP and each round's node needs are unioned into ONE
    * point-lookup fetch — the graph-hop analogue of
    * [[VectorIndex.searchBatch]]'s one-scan-per-panel shape. Per-query
    * results are identical to running [[beam]] per query (same
    * frontier arithmetic, shared cache); what changes is the job
    * count: rounds, not queries × rounds.
    */
  private[graft] def beamBatch(spark: SparkSession, path: String,
      qs: Seq[Array[Double]], l: Int, w: Int): Seq[Seq[Long]] = {
    val (ver, meds, _) = headOf(spark, path)
    final class St(seeds: Seq[(Long, Double)]) {
      var frontier: Vector[(Long, Double)] = seeds.toVector
      val dist = scala.collection.mutable.HashMap(seeds: _*)
      val expanded = scala.collection.mutable.HashSet.empty[Long]
    }
    val states = qs.map(q => new St(prodSeeds(meds, q)))
    var continue = true
    while (continue) {
      val batches = states.map(st =>
        st.frontier.filterNot(f => st.expanded.contains(f._1)).take(w))
      if (batches.forall(_.isEmpty)) continue = false
      else {
        val nodes = fetchNodes(spark, path, ver,
          batches.flatten.map(_._1).distinct)
        val pendings = states.zip(batches).map { case (st, b) =>
          b.flatMap { case (id, _) =>
            nodes.get(id).fold(Array.empty[Long])(_.nbrs)
          }.distinct.filterNot(st.dist.contains)
        }
        val fetched = fetchNodes(spark, path, ver,
          pendings.flatten.distinct)
        states.indices.foreach { i =>
          val (st, q) = (states(i), qs(i))
          val scored = pendings(i).flatMap(id =>
            fetched.get(id).map(nd => (id, cosDist(q, nd.v))))
          scored.foreach { case (id, d) => st.dist(id) = d }
          batches(i).foreach { case (id, _) => st.expanded += id }
          st.frontier = (st.frontier ++ scored)
            .sortBy { case (id, d) => (d, id) }.take(l)
        }
      }
    }
    states.map(_.frontier.map(_._1))
  }

  /** Batched top-k over a query panel: lock-step beams, then ONE
    * pruned graph fetch of the candidate union and a per-qid cosine
    * rerank window — (qid, vec_id, cos) like the IVF batch searchers.
    */
  def searchBatch(spark: SparkSession, path: String,
      queries: Seq[Seq[Double]], k: Int, l: Int = SearchL): DataFrame = {
    import spark.implicits._
    val cands = beamBatch(spark, path, queries.map(_.toArray), l, BeamW)
    val pairs = cands.zipWithIndex.flatMap { case (ids, qid) =>
      ids.map(id => (qid, id))
    }
    val ids = pairs.map(_._2).distinct
    val pdf = broadcast(pairs.toDF("qid", "vec_id"))
    val qdf = broadcast(queries.zipWithIndex.map(_.swap).toDF("qid", "qv"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    spark.read.parquet(s"$path/graph")
      .filter(col("vec_id").isin(ids: _*))
      .join(pdf, Seq("vec_id")).join(qdf, Seq("qid"))
      .select(col("qid"), col("vec_id"),
        round(graft.GraftExtensions.cosineSim(spark, col("v"), col("qv")), 6)
          .as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
      .orderBy(col("qid"), col("cos").desc, col("vec_id"))
  }

  /** Top-k cosine search. Production shape: global-medoid seed, beam
    * `l`; the final top-k is an exact cosine rerank of the ≤`l`
    * frontier candidates via one point-lookup plan. With `exact =
    * true` (all-medoid seed, unbounded beam) the traversal must visit
    * every node — enforced, so the result EQUALS brute force and the
    * rerank scans the whole graph table instead of an id list.
    */
  def search(spark: SparkSession, path: String, q: Seq[Double], k: Int,
      l: Int = SearchL, exact: Boolean = false): DataFrame = {
    val qa = q.toArray
    val (_, _, n) = headOf(spark, path)
    val g = spark.read.parquet(s"$path/graph")
    val qc = typedLit(q)
    val base =
      if (exact) {
        val (_, visited) = beam(spark, path, qa, Int.MaxValue, 1024,
          seedAll = true)
        require(visited == n,
          s"exact traversal visited $visited of $n nodes — graph at " +
            s"$path is not fully reachable; rebuild it")
        g
      } else {
        val (cands, _) = beam(spark, path, qa, l, BeamW, seedAll = false)
        g.filter(col("vec_id").isin(cands: _*))
      }
    base.select(col("vec_id"),
      round(graft.GraftExtensions.cosineSim(spark, col("v"), qc), 6)
        .as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** Driver-local single-query serving path: same beam, same
    * candidates, but the final top-k rerank happens on the driver from
    * the very Node vectors the beam just fetched — no rerank Spark job
    * at all. Against a warm [[nodeCache]] (the steady state of a
    * serving process: the beam's working set is the graph's high-degree
    * core, which the LRU keeps resident) a query runs ZERO Spark jobs;
    * cold misses cost one batched point-lookup per hop round exactly
    * like [[search]]. Results are bit-identical to [[search]]: the
    * rerank reuses [[CosineSim]]'s accumulation order
    * (`dot/(√na·√nb)`, sequential fold) and Spark's ROUND_HALF_UP
    * semantics, and every candidate's vector is already driver-resident
    * because the beam terminates only after expanding (hence fetching)
    * its whole final frontier.
    */
  def searchFast(spark: SparkSession, path: String, q: Seq[Double],
      k: Int, l: Int = SearchL): DataFrame = {
    import spark.implicits._
    val qa = q.toArray
    val (cands, _) = beam(spark, path, qa, l, BeamW, seedAll = false)
    val (ver, _, _) = headOf(spark, path)
    val nodes = fetchNodes(spark, path, ver, cands)
    cands.flatMap(id => nodes.get(id).map(nd =>
        (id, round6(cosExact(qa, nd.v)))))
      .sortBy { case (id, c) => (-c, id) }.take(k)
      .toDF("vec_id", "cos")
  }

  /** [[CosineSim]]'s exact arithmetic (same accumulation order, same
    * `√na·√nb` denominator — NOT `√(na·nb)`, which differs in the last
    * ulp), so the driver rerank cannot drift from the Spark rerank.
    */
  private def cosExact(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Spark's `round(col, 6)` (RoundingMode.HALF_UP over the canonical
    * decimal form), driver-side.
    */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Merge = rebuild over the union of both graphs' stored vectors
    * (duplicate vec_ids keep one copy). The reference's parallel merge
    * re-inserts every node of `b` one by one under per-node locks
    * (vamana.rs:888-949) — a sequential-insert shape with no Spark
    * analogue; rebuilding runs the same distributed build at the cost
    * of one corpus-sized pass over data the graphs already store
    * (SURVEY §7.5's rebuild-on-merge argument).
    */
  def merge(spark: SparkSession, a: String, b: String,
      out: String): Unit = {
    val va = spark.read.parquet(s"$a/graph").select("vec_id", "v")
    val vb = spark.read.parquet(s"$b/graph").select("vec_id", "v")
    build(spark, va.unionByName(vb).dropDuplicates("vec_id"), out)
  }

  // ---- entries ------------------------------------------------------

  def ensureBuilt(s: SparkSession, dir: String): String = {
    val p = IndexStore.indexPath(dir, "vamana_embeddings")
    IndexStore.ensure(p) { build(s, Similarity.embeddings(s, dir), p) }
    p
  }

  /** Panel exact top-k ground truth, persisted beside the index via
    * the shared [[VectorIndex.persistedPanel]] store (one recall
    * convention across all ANN gates); the exact side here is one
    * brute-force batched window plan (this index has no probe-all
    * searcher to reuse).
    */
  private def panelTruth(s: SparkSession, dir: String, path: String,
      n: Int, k: Int): Seq[(Seq[Double], Set[Long])] = {
    import s.implicits._
    val panel = VectorIndex.queryPanel(s, dir, n)
    // n in the store name: a widened panel must rebuild its truth, not
    // inherit a narrower fixture whose missing qids read as recall 0
    VectorIndex.persistedPanel(s, s"$path/panel_k${k}_n$n", panel) {
      val qdf = broadcast(panel.zipWithIndex.map(_.swap).toDF("qid", "qv"))
      val w = Window.partitionBy("qid")
        .orderBy(col("cos").desc, col("vec_id"))
      Similarity.embeddings(s, dir).join(qdf)
        .select(col("qid"), col("vec_id"),
          round(graft.GraftExtensions.cosineSim(s, col("v"), col("qv")), 6)
            .as("cos"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
    }
  }

  def entries: Map[String, graft.Q] = Map(
    // exact configuration: all-medoid seed + unbounded beam must visit
    // every node (enforced) ⇒ result equals the brute-force oracle
    // while exercising head → batched graph hops → rerank
    "vamana_search_exact" -> graft.Q((s, dir) => {
      val p = ensureBuilt(s, dir)
      search(s, p, VectorIndex.queryVec(s, dir), Similarity.K, exact = true)
    }, Similarity.knnSql),
    // production shape: global-medoid seed, beam SearchL — approximate
    // by design ⇒ gate-style oracle over the exact invariants
    // (VectorIndex.probeGate); the 0.9 mean bound is vamana_recall
    "vamana_search" -> graft.Q((s, dir) => {
      val p = ensureBuilt(s, dir)
      VectorIndex.probeGate(s, dir, Similarity.K,
        search(s, p, VectorIndex.queryVec(s, dir), Similarity.K))
    }, VectorIndex.probeGateSql(Similarity.K)),
    // quantitative gate: mean recall@10 over the fixed query panel at
    // the production beam must clear the same 0.9 floor as IVF; the
    // panel runs through the BATCHED searcher (lock-step beams, one
    // fetch per hop round for the whole panel) — the serving shape
    "vamana_recall" -> graft.Q((s, dir) => {
      import s.implicits._
      val p = ensureBuilt(s, dir)
      val truth = panelTruth(s, dir, p, VectorIndex.PanelN, Similarity.K)
      val approx = searchBatch(s, p, truth.map(_._1), Similarity.K)
      Seq(VectorIndex.meanRecallBatch(truth.map(_._2), approx, Similarity.K)
        >= VectorIndex.RecallFloor).toDF("recall_ok")
    }, "SELECT true AS recall_ok")
  )
}
