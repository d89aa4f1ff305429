package graft

import org.apache.spark.sql.SparkSession

/** Serving-latency micro-bench: per-query latency of the point-lookup
  * serving paths against the indexes the correctness entries build —
  *
  * ANN (20-query recall panel):
  *   - `ivf_probe`    — IVF half-cells probe ([[graft.index.VectorIndex.search]])
  *   - `vamana_spark` — graph beam + Spark rerank ([[graft.index.VamanaIndex.search]])
  *   - `vamana_fast`  — graph beam + driver rerank, warm node cache
  *                      ([[graft.index.VamanaIndex.searchFast]]) — the
  *                      zero-Spark-jobs steady-state serving shape
  *
  * Lexical (20-query corpus-derived panels), each as the Spark path
  * AND its warm twin ([[graft.index.Serve]], bit-identical results
  * pinned by ServeSpec):
  *   - `bm25_spark` / `bm25_warm`   — top-k ranked lookup
  *   - `ngram_spark` / `ngram_warm` — exact-contains point lookup
  *   - `key_spark` / `key_warm`     — exact key lookup
  *
  * Prints one JSON line with mean/min per-query seconds per path
  * (panel pass 2 of 2, pass 1 warms JIT + caches). Feeds the SCALE.md
  * serving-latency table; correctness of every path is pinned by the
  * CORRECTNESS entries, VamanaSpec's bit-identical fast-path test, and
  * ServeSpec's bit-identical lexical fast-path tests.
  */
object ServeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val k = graft.ops.Similarity.K
    val ivf = graft.index.VectorIndex.ensureBuilt(spark, sfDir)
    val vam = graft.index.VamanaIndex.ensureBuilt(spark, sfDir)
    val np = graft.index.VectorIndex.probeCount(spark, ivf)
    val panel = graft.index.VectorIndex.queryPanel(spark, sfDir, 20)

    // ---- lexical fixtures (ensure-gated, shared with Verify runs) ----
    import graft.core.{IndexStore, Lake}
    val docFiles = Lake.ensureSplit(spark, sfDir, "documents", "doc_id", 4)
    val custFiles = Lake.ensureSplit(spark, sfDir, "customer", "c_custkey", 4)
    val bm25P = IndexStore.indexPath(sfDir, "bm25_documents_text")
    IndexStore.ensure(bm25P) {
      graft.index.Bm25Index.build(spark, docFiles, "text", "doc_id", bm25P)
    }
    // substring serving is measured over customer NAMES: the synthetic
    // documents table is ~40 template words over a 30-word vocabulary,
    // so every 3-gram bag exists in every retrieval unit and a
    // substring lookup is a scan at ANY tier — names' digit tails are
    // the selective point-lookup shape the serving path exists for
    val ngramP = IndexStore.indexPath(sfDir, "serve_ngram_customer_name")
    IndexStore.ensure(ngramP) {
      graft.index.NgramIndex.build(spark, custFiles, "c_name", ngramP)
    }
    val keyP = IndexStore.indexPath(sfDir, "key_customer_name")
    IndexStore.ensure(keyP) {
      graft.index.KeyIndex.build(spark, custFiles, "c_name", keyP)
    }
    val fuzzyP = IndexStore.indexPath(sfDir, "serve_fuzzy_customer_name")
    IndexStore.ensure(fuzzyP) {
      graft.index.FuzzyIndex.build(spark, custFiles, "c_name", fuzzyP)
    }

    // corpus-derived query panels (deterministic samples)
    val texts = Tables.load(spark, sfDir, "documents")
      .orderBy("doc_id").select("text").limit(400).collect()
      .map(_.getString(0))
    val sampled = texts.zipWithIndex.collect {
      case (t, i) if i % 20 == 0 && t.length > 40 => t
    }.take(20).toSeq
    val bm25Panel = sampled.map(_.split("\\s+").filter(_.length > 3)
      .slice(2, 4).mkString(" ")).filter(_.nonEmpty)
    val keyPanel = Tables.load(spark, sfDir, "customer")
      .orderBy("c_custkey").select("c_name").limit(400).collect()
      .zipWithIndex.collect { case (r, i) if i % 20 == 0 => r.getString(0) }
      .take(20).toSeq
    val ngramPanel = keyPanel.map(_.takeRight(12)) // selective digit tails
    val suggestPanel = bm25Panel.map(_.split(" ").head)
      .filter(_.length > 3).map(t => t.dropRight(1) + "x") // 1-edit typos
    // 2-char prefixes of bm25 panel terms: each expands to >=1 vocab
    // token, so the wildcard path does real expansion + scoring work
    val wildcardPanel = bm25Panel.map(_.split(" ").head)
      .filter(_.length > 3).map(_.take(2)).distinct

    import org.apache.spark.sql.functions._
    def suggestSpark(q: String): org.apache.spark.sql.DataFrame =
      spark.read.parquet(s"$bm25P/postings")
        .select(col("token"), col("tf").cast("long").as("tf"))
        .filter(length(col("token")).between(q.length - 1, q.length + 1))
        .filter(levenshtein(col("token"), lit(q)) <= 1)
        .groupBy(col("token")).agg(sum(col("tf")).as("freq"))
        .orderBy(col("freq").desc, col("token"))

    // panels are derived through data-dependent filters — an unusual
    // SF dir must fail with a clear message, not empty.min
    Seq("bm25" -> bm25Panel, "ngram" -> ngramPanel, "key" -> keyPanel,
        "suggest" -> suggestPanel).foreach { case (n, p) =>
      require(p.nonEmpty, s"[servebench] empty $n panel for $sfDir")
    }
    require(keyPanel.forall(_.contains('#')),
      s"[servebench] keyPanel names lack '#' (fuzzy panel derivation)")

    def lat[A](panel: Seq[A], f: A => Unit): (Double, Double) = {
      val ts = panel.map { q =>
        val t0 = System.nanoTime(); f(q); (System.nanoTime() - t0) / 1e9
      }
      (ts.sum / ts.size, ts.min)
    }

    val vecPaths = Seq[(String, Seq[Seq[Double]], Seq[Double] => Unit)](
      ("ivf_probe", panel, q =>
        graft.index.VectorIndex.search(spark, ivf, q, k, np).collect()),
      ("ivf_pq_spark", panel, q =>
        graft.index.VectorIndex.searchPq(spark, ivf, q, k, np, 50)
          .collect()),
      // the warm vector serving tier: ADC over driver-cached code
      // slices + exact rerank from cached vec slices — zero Spark jobs
      // once the probed cells are resident (bit-identical rows to
      // ivf_pq_spark, pinned by VectorSpec)
      ("ivf_pq_warm", panel, q =>
        graft.index.Serve.ivfPq(spark, ivf, q, k, np, 50).collect()),
      ("vamana_spark", panel, q =>
        graft.index.VamanaIndex.search(spark, vam, q, k).collect()),
      ("vamana_fast", panel, q =>
        graft.index.VamanaIndex.searchFast(spark, vam, q, k).collect()))
    val strPaths = Seq[(String, Seq[String], String => Unit)](
      ("bm25_spark", bm25Panel, q =>
        graft.index.Bm25Index.search(spark, bm25P, q, 10).collect()),
      ("bm25_warm", bm25Panel, q =>
        graft.index.Serve.bm25(spark, bm25P, q, 10).collect()),
      ("ngram_spark", ngramPanel, q =>
        graft.index.NgramIndex.search(spark, ngramP, "c_name", q).collect()),
      ("ngram_warm", ngramPanel, q =>
        graft.index.Serve.ngram(spark, ngramP, "c_name", q).collect()),
      ("key_spark", keyPanel, q =>
        graft.index.KeyIndex.searchExact(spark, keyP, "c_name", q).collect()),
      ("key_warm", keyPanel, q =>
        graft.index.Serve.keyExact(spark, keyP, "c_name", q).collect()),
      ("suggest_spark", suggestPanel, q => suggestSpark(q).collect()),
      ("suggest_warm", suggestPanel, q =>
        graft.index.Serve.suggest(spark, bm25P, q).collect()),
      // typo-tolerant lookup on the selective id-token panel (the
      // customer-name digit tokens; a 1-sub typo per query)
      ("fuzzy_spark", keyPanel.map(_.split("#")(1).dropRight(1) + "x"),
        (q: String) => graft.index.FuzzyIndex
          .search(spark, fuzzyP, "c_name", q).collect()),
      ("fuzzy_warm", keyPanel.map(_.split("#")(1).dropRight(1) + "x"),
        (q: String) => graft.index.Serve
          .fuzzy(spark, fuzzyP, "c_name", q).collect()),
      ("wildcard_spark", wildcardPanel, (q: String) => {
        val terms = spark.read.parquet(s"$bm25P/postings")
          .filter(col("token").startsWith(q))
          .select("token").distinct()
          .collect().map(_.getString(0)).sorted.toSeq
        graft.index.Bm25Index.searchWeighted(spark, bm25P,
          terms.map(_ -> 1.0), 10).collect()
      }),
      ("wildcard_warm", wildcardPanel, (q: String) =>
        graft.index.Serve.wildcard(spark, bm25P, q, 10).collect()))

    vecPaths.foreach { case (_, p, f) => lat(p, f) } // pass 1: warm
    strPaths.foreach { case (_, p, f) => lat(p, f) }
    val out =
      vecPaths.map { case (name, p, f) =>
        val (mean, min) = lat(p, f) // pass 2: timed
        f""""$name":{"mean_s":$mean%.4f,"min_s":$min%.4f}"""
      } ++ strPaths.map { case (name, p, f) =>
        val (mean, min) = lat(p, f)
        f""""$name":{"mean_s":$mean%.4f,"min_s":$min%.4f}"""
      }
    println(s"""{"metric":"ann_serving_latency","sf":"$sfDir",${out.mkString(",")}}""")

    // sustained throughput of the warm tier: T driver threads hammer
    // the zero-job serving paths concurrently (the caches are
    // lock-guarded; contention is part of the number). This is the
    // search-box capacity figure — a single driver JVM's QPS ceiling
    // before the deployment needs replica serving processes.
    def qps[A](panel: Seq[A], f: A => Unit,
        threads: Int = 8, iters: Int = 200): Double = {
      val t0 = System.nanoTime()
      val ts = (1 to threads).map { ti =>
        val th = new Thread(() => {
          var i = 0
          while (i < iters) { f(panel((ti + i) % panel.size)); i += 1 }
        })
        th.start(); th
      }
      ts.foreach(_.join())
      (threads.toLong * iters) / ((System.nanoTime() - t0) / 1e9)
    }
    val qpsPaths = Seq[(String, () => Double)](
      ("bm25_warm_qps", () => qps[String](bm25Panel, q =>
        graft.index.Serve.bm25(spark, bm25P, q, 10).collect())),
      ("ngram_warm_qps", () => qps[String](ngramPanel, q =>
        graft.index.Serve.ngram(spark, ngramP, "c_name", q).collect())),
      ("key_warm_qps", () => qps[String](keyPanel, q =>
        graft.index.Serve.keyExact(spark, keyP, "c_name", q).collect())),
      ("vamana_fast_qps", () => qps[Seq[Double]](panel, q =>
        graft.index.VamanaIndex.searchFast(spark, vam, q, k).collect())),
      ("wildcard_warm_qps", () => qps[String](wildcardPanel, q =>
        graft.index.Serve.wildcard(spark, bm25P, q, 10).collect())))
    val qout = qpsPaths.map { case (name, f) =>
      f() // pass 1: warm the contended paths under concurrency
      f""""$name":${f()}%.1f"""
    }
    println(s"""{"metric":"warm_serving_qps","sf":"$sfDir","threads":8,${qout.mkString(",")}}""")
    spark.stop()
  }
}
