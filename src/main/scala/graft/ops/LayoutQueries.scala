package graft.ops

import graft.{Q, Tables}
import graft.core.{IndexStore, Lake, Layout}
import graft.index.ZoneMapIndex
import org.apache.spark.sql.functions._

/** Physical-layout scan and virtual-mode zone-map queries. */
object LayoutQueries {

  def entries: Map[String, Q] = Map(
    // footer-only layout scan (reference: get_parquet_layout,
    // src/formats/parquet.rs:243-419): totals must agree with the data
    "parquet_layout" -> Q((s, dir) => {
      val layout = Layout.scan(s,
        Seq(Tables.path(dir, "documents"), Tables.path(dir, "lineitem")))
      layout
        .withColumn("table_name",
          regexp_extract(col("file_path"), "([a-z]+)\\.parquet$", 1))
        .groupBy(col("table_name"))
        .agg(sum(col("num_rows")).as("n_rows"))
    },
      """SELECT 'documents' AS table_name, count(*) AS n_rows FROM documents
        |UNION ALL SELECT 'lineitem', count(*) FROM lineitem""".stripMargin),

    // virtual-mode zone map (reference: backends/utils.py:110-126):
    // range query pruned by per-row-group min/max, then refined
    "zonemap_range_search" -> Q((s, dir) => {
      val files = Lake.ensureSplit(s, dir, "orders", "o_orderkey", 4)
      val p = IndexStore.indexPath(dir, "zonemap_orders_orderkey")
      IndexStore.ensure(p) { ZoneMapIndex.build(s, files, "o_orderkey", p) }
      ZoneMapIndex.searchRange(s, p, "o_orderkey", 1000L, 1200L)
        .select(col("o_orderkey"), col("o_custkey"))
        .orderBy(col("o_orderkey"))
    },
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_orderkey BETWEEN 1000 AND 1200 ORDER BY o_orderkey""".stripMargin),

    // SURVEY §7.4 stretch, range flavor: a PLAIN spark.read.parquet +
    // range filter — no graft API in the query — transparently
    // file-pruned by the Catalyst IndexPruneRule via the committed
    // zone-map index; the refine filter stays so semantics are exact
    "catalyst_zonemap_prune" -> Q((s, dir) => {
      Lake.ensureSplit(s, dir, "orders", "o_orderkey", 4)
      val prefix = Lake.splitPath(dir, "orders")
      graft.api.GraftLake(s, prefix).index(graft.api.ZoneMapKind, "o_orderkey")
      graft.plans.IndexPruneRule.enable(s)
      s.read.parquet(prefix)
        .filter(col("o_orderkey") >= 1000 && col("o_orderkey") <= 1200)
        .select(col("o_orderkey"), col("o_custkey"))
        .orderBy(col("o_orderkey"))
    },
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_orderkey BETWEEN 1000 AND 1200 ORDER BY o_orderkey""".stripMargin)
  )
}
