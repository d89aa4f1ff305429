package graft.plans

import graft.core.{IndexStore, Layout}
import graft.index.NgramIndex
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Contains, Literal, Lower, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions.{col, countDistinct}
import org.apache.spark.sql.types.StringType

/** Transparent index acceleration for PLAIN Spark reads — the SURVEY
  * §7.4 stretch: an optimizer rule that rewrites
  * `spark.read.parquet(lake).filter(col.contains(q))` into the same
  * filter over ONLY the files the ngram index cannot rule out, without
  * the caller ever touching the graft API (the app-level routing the
  * reference does in `search_parquet_lake`, lifted into Catalyst).
  *
  * Soundness: the gram-intersection candidate set is a SUPERSET of the
  * matching rows per covered file (lowercased grams ⊇ case-sensitive
  * matches), uncovered files are always kept, and the original Filter
  * stays on top as the refine — the rewrite can only remove files that
  * provably contain no match. A no-prune outcome leaves the plan
  * untouched.
  *
  * Enable per session with `IndexPruneRule.enable(spark)` (uses the
  * public `experimental.extraOptimizations` seam) or session-wide via
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class IndexPruneRule(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  import IndexPruneRule._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (probing.get()) return plan // the probe's own reads skip the rule
    plan.transform {
      case f @ Filter(_, l: LogicalRelation)
          if l.relation.isInstanceOf[HadoopFsRelation] =>
        try rewrite(f, l).getOrElse(f)
        catch { case _: Throwable => f } // never fail a user query
    }
  }

  private def rewrite(f: Filter, l: LogicalRelation): Option[Filter] = {
    val fsRel = l.relation.asInstanceOf[HadoopFsRelation]
    if (!fsRel.fileFormat.isInstanceOf[ParquetFileFormat]) return None
    if (fsRel.partitionSchema.nonEmpty) return None
    val roots = fsRel.location.rootPaths
    if (roots.size != 1) return None
    val prefix = Layout.canonPath(roots.head.toString)
    if (prefix.startsWith(IndexStore.root)) return None // index tables
    // first contains-predicate over a plain column (bare or lower())
    val contains = splitConjunctivePredicates(f.condition).collectFirst {
      case Contains(a: AttributeReference, Literal(q, StringType))
          if q != null => (a.name, q.toString)
      case Contains(Lower(a: AttributeReference), Literal(q, StringType))
          if q != null => (a.name, q.toString)
    }
    contains.flatMap { case (colName, query) =>
      if (query.isEmpty) return None
      val idx = IndexStore.metadataRowsCached(spark, prefix)
        .filter(r => r.column == colName && r.indexType == "ngram")
      if (idx.isEmpty) return None
      val allFiles = fsRel.location.inputFiles.map(Layout.canonPath).toSet
      val covered = idx.flatMap(_.files).map(Layout.canonPath).toSet & allFiles
      if (covered.isEmpty) return None
      probing.set(true)
      val hits =
        try probe(idx.map(_.indexFile), query)
        finally probing.set(false)
      val keep = (allFiles -- covered) ++ (hits & allFiles)
      if (keep.size >= allFiles.size) return None // nothing pruned
      val pruned = new InMemoryFileIndex(spark,
        keep.toSeq.sorted.map(new Path(_)), Map.empty,
        Some(fsRel.dataSchema))
      val newRel = fsRel.copy(location = pruned)(spark)
      // output attribute ids are reused — schema is unchanged, only the
      // file listing shrank; the full original filter stays as the refine
      Some(f.copy(child = l.copy(relation = newRel)))
    }
  }

  /** Files of the covering indexes whose gram postings intersect every
    * query gram (driver-side candidate resolution via the cached metas;
    * one small Spark job per covering index set).
    */
  private def probe(paths: Seq[String], query: String): Set[String] = {
    val q = query.toLowerCase
    val qgrams =
      if (q.length >= NgramIndex.N) graft.text.QueryShaping.viableGrams(
        q.sliding(NgramIndex.N).toSeq.distinct)
      else Seq(q)
    val qbuckets = qgrams.map(NgramIndex.bucketOfString).distinct
    paths.flatMap { p =>
      val cands = spark.read.parquet(s"$p/postings")
        .filter(col("bucket").isin(qbuckets: _*) &&
          col("gram").isin(qgrams: _*))
        .groupBy(col("uid"))
        .agg(countDistinct(col("gram")).as("ng"))
        .filter(col("ng") === qgrams.size)
        .select("uid").collect().map(_.getLong(0)).toSet
      graft.api.IndexKind.metaRows(spark, p)
        .filter(r => cands.contains(r._1)).map(r => Layout.canonPath(r._2))
    }.toSet
  }
}

object IndexPruneRule {
  private val probing = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }

  /** Attach the rule to an existing session (idempotent). */
  def enable(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[IndexPruneRule]))
      spark.experimental.extraOptimizations = cur :+ new IndexPruneRule(spark)
  }
}
