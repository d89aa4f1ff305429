package graft.ops

import graft.{Q, Tables}
import graft.text.Text
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The relational operators the reference embeds in its orchestration code
  * (SURVEY §2.6: equi-join, anti-join, group-by agg, explode, union,
  * sort/top-k, distinct, row numbering, isin filters), expressed as
  * Catalyst-optimized DataFrame plans over the driver testdata.
  *
  * Float discipline: every aggregated money/quantity value is computed in
  * exact DECIMAL arithmetic (order-independent, engine-independent) and
  * cast to DOUBLE only at the end, so the DuckDB oracle hash-matches
  * bit-for-bit. Ratios divide two exact values in double and round.
  */
object Relational {

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  private def dec4(c: Column): Column = c.cast(DecimalType(8, 4))

  /** Pricing summary (TPC-H Q1 flavor) — groupBy/agg with map-side
    * partial aggregation; one shuffle on the two low-cardinality keys.
    */
  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE) AS sum_disc_price,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_qty,
      |  count(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Shipping-priority join (TPC-H Q3 flavor): two shuffled equi-joins at
    * lake scale (orders/lineitem both large → sort-merge join; AQE picks
    * broadcast when one side is small), then top-10.
    */
  private val q3Sql =
    """SELECT l_orderkey,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE) AS revenue,
      |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** Anti-join: orders with no lineitems (reference pattern:
    * unindexed-file diff, reference: python/rottnest/backends/
    * delta.py:31-32). Non-empty at every scale factor, so the check is
    * never vacuous.
    */
  private val antiSql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  /** Top-K with deterministic tie-break (reference pattern: score sort +
    * take-k, reference: src/lava/bm25/bm25.rs:557-565).
    */
  private val topkSql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  private val distinctSql =
    """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
      |FROM events GROUP BY event_type""".stripMargin

  /** Row-numbering window (reference pattern: with_row_count,
    * reference: python/rottnest/backends/utils.py:119,172): top-2 orders
    * per customer.
    */
  private val windowSql =
    """SELECT o_custkey, o_orderkey, rn FROM (
      |  SELECT o_custkey, o_orderkey,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t WHERE rn <= 2""".stripMargin

  /** Explode/unnest (reference: iceberg.py:126) — token frequency top-20
    * over documents; the tokenize→explode→groupBy shape is the skeleton of
    * every text index build.
    */
  private val explodeSql =
    """SELECT tok, count(*) AS cnt FROM (
      |  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS tok
      |  FROM documents) u
      |GROUP BY tok ORDER BY cnt DESC, tok LIMIT 20""".stripMargin

  /** Tumbling-window aggregation over the events stream table (hourly).
    * Batch plan here; graft.streaming mirrors it with readStream +
    * watermark for the true streaming path.
    */
  private val hourlySql =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
      |  event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Union + distinct (reference pattern: polars.concat + unique,
    * reference: backends/utils.py:105-108,153): nations appearing as
    * customer or supplier home.
    */
  private val unionSql =
    """SELECT DISTINCT n_nationkey, n_name FROM nation
      |WHERE n_nationkey IN (SELECT c_nationkey FROM customer)
      |   OR n_nationkey IN (SELECT s_nationkey FROM supplier)
      |ORDER BY n_nationkey""".stripMargin

  def entries: Map[String, Q] = Map(
    "q1_agg" -> Q((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(8, 4)) - dec4(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        round(sum(dec2(col("l_quantity"))).cast("double") / count(lit(1)), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
    }, q1Sql),

    "q3_join_topk" -> Q((s, dir) => {
      val c = Tables.load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.load(s, dir, "orders")
      val li = Tables.load(s, dir, "lineitem")
      // selective customer filter FIRST: joining orders to the
      // BUILDING segment (~1/5 of customers) before the big
      // lineitem⋈orders shuffle shrinks its probe side ~5×. NO
      // broadcast hint: the segment scales with the lake, and a forced
      // broadcast would bypass autoBroadcastJoinThreshold and OOM at
      // 100 TB (the q_anti_join hazard below) — AQE picks broadcast on
      // its own whenever the filtered side actually fits
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(8, 4)) - dec4(col("l_discount"))))
          .cast("double").as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }, q3Sql),

    "q_anti_join" -> Q((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val li = Tables.load(s, dir, "lineitem")
      // the probe side (lineitem) is the BIG side: left-anti can only
      // build on the right, and Spark would broadcast all of it —
      // shuffle-hash keeps the build partitioned (and is 2x faster
      // here); at 100 TB a big-side broadcast is a driver OOM
      o.join(li.hint("shuffle_hash"),
          col("o_orderkey") === col("l_orderkey"), "left_anti")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }, antiSql),

    "q_topk" -> Q((s, dir) =>
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10), topkSql),

    "q_distinct_agg" -> Q((s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events")), distinctSql),

    "q_window_rownum" -> Q((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.load(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 2)
        .select(col("o_custkey"), col("o_orderkey"), col("rn"))
    }, windowSql),

    "q_token_explode" -> Q((s, dir) =>
      Tables.load(s, dir, "documents")
        .select(explode(Text.tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok"))
        .limit(20), explodeSql),

    "q_events_hourly" -> Q((s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("value"))).cast("double").as("sum_value")), hourlySql),

    // sessionization: 30-min-gap sessions per user (lag + gap flag +
    // per-key running sum — the batch twin of stateful streaming)
    "q_sessionize" -> Q((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      Tables.load(s, dir, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
        .withColumn("prev", lag(col("us"), 1).over(w))
        .withColumn("new_s",
          when(col("prev").isNull || col("us") - col("prev") > 1800000000L, 1)
            .otherwise(0))
        .groupBy(col("user_id"))
        .agg(sum(col("new_s")).as("n_sessions"))
    },
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |g AS (SELECT user_id,
        |  CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
        |         OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us) > 1800000000 THEN 1
        |       ELSE 0 END AS new_s FROM e)
        |SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions
        |FROM g GROUP BY user_id""".stripMargin),

    // as-of join: each click matched to the SAME USER's latest purchase
    // at or before it. Spark has no asof operator; the scalable
    // formulation is union-the-tagged-streams + one per-user window
    // with last_value(ignoreNulls) — ONE shuffle on user_id, state
    // bounded by the window frame, no per-key explode and no
    // range-condition nested-loop join (which is what a naive
    // `p.ts >= b.ts` join degenerates to at 100 TB). Build rows sort
    // BEFORE probe rows at equal ts (tag ordering) for the asof
    // convention's inclusive match. (user_id, ts) is unique in the
    // data, so the match is deterministic.
    "q_asof_join" -> Q((s, dir) => asofClickPurchase(
      Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"), col("event_type"), col("value"))),
      """SELECT p.event_id, p.user_id, epoch_us(p.ts) AS click_us,
        |  epoch_us(b.ts) AS purchase_us, b.value AS purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') p
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
        |  ON p.user_id = b.user_id AND p.ts >= b.ts
        |ORDER BY p.event_id""".stripMargin),

    // bounded-interval range join: per purchase, count the same user's
    // clicks within the following hour. A raw inequality join is a
    // nested-loop cross per user at scale; bucketizing both sides by
    // the interval length turns it into an EQUI-join on (user, bucket)
    // — each purchase probes exactly 2 buckets, so the join is
    // shuffle-hash-able and the blowup is a constant ×2, independent
    // of data size or key skew. A (pid, click) pair matches in at most
    // one bucket (the click's own), so no double counting.
    "q_range_join" -> Q((s, dir) => rangeJoinCounts(
      Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"), col("event_type"))),
      """WITH p AS (SELECT event_id AS pid, user_id, epoch_us(ts) AS pus
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_us(ts) AS cus
        |      FROM events WHERE event_type = 'click')
        |SELECT p.pid, count(c.cus) AS n_clicks
        |FROM p LEFT JOIN c
        |  ON p.user_id = c.user_id
        | AND c.cus > p.pus AND c.cus <= p.pus + 3600000000
        |GROUP BY p.pid ORDER BY p.pid""".stripMargin),

    // (asof/range cores live below as functions so their boundary
    // semantics — inclusive ties, bucket edges — are unit-testable
    // against a naive in-memory oracle, not just the sf0.01 data)

    // hierarchical totals in one pass: rollup emits (status, priority),
    // (status, NULL), (NULL, NULL) grouping sets from a single shuffle
    // with partial aggregation — the OLAP reporting shape
    "q_rollup" -> Q((s, dir) =>
      Tables.load(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("o_totalprice"))).cast("double").as("sum_price")),
      """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""".stripMargin),

    // cube = all 2^d grouping sets in one pass — like rollup, one
    // shuffle with partial aggregation, the expansion happens in the
    // Expand operator before the shuffle (never d separate scans)
    "q_cube" -> Q((s, dir) =>
      Tables.load(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("o_totalprice"))).cast("double").as("sum_price")),
      """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin),

    // explicit grouping sets (the general form rollup/cube specialize):
    // same single-pass Expand-then-shuffle plan, but only the requested
    // sets are expanded — (status) and (priority) here, never the
    // combined fine-grained set a cube would pay for
    "q_grouping_sets" -> Q((s, dir) =>
      Tables.load(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("o_totalprice"))).cast("double").as("sum_price")),
      """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""".stripMargin),

    // pivot = conditional aggregation: one shuffle on the grouping key,
    // the pivot values pinned explicitly (an unpinned pivot pays a
    // distinct-values job and is non-deterministic in column order)
    "q_pivot" -> Q((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val pivoted = Tables.load(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
      pivoted.select(col("user_id") +:
        types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy("user_id")
    },
      """SELECT user_id,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'error') AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),

    "q_union_distinct" -> Q((s, dir) => {
      val n = Tables.load(s, dir, "nation")
      val c = Tables.load(s, dir, "customer").select(col("c_nationkey").as("k"))
      val sup = Tables.load(s, dir, "supplier").select(col("s_nationkey").as("k"))
      n.join(c.union(sup).distinct(), col("n_nationkey") === col("k"), "left_semi")
        .select(col("n_nationkey"), col("n_name")).distinct()
        .orderBy(col("n_nationkey"))
    }, unionSql)
  )

  /** As-of join core: each click row of `e` matched to the SAME USER's
    * latest purchase at or before it (inclusive at equal timestamps —
    * build rows sort before probe rows via the tag). `e` must carry
    * (event_id, user_id, us, event_type, value). One shuffle on
    * user_id; no per-key explode, no range nested loop.
    */
  private[graft] def asofClickPurchase(e: DataFrame): DataFrame = {
    val probe = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("us"), lit(1).as("tag"),
        lit(null).cast("struct<bus:bigint,bvalue:double>").as("b"))
    val build = e.filter(col("event_type") === "purchase")
      .select(lit(null).cast("long").as("event_id"), col("user_id"),
        col("us"), lit(0).as("tag"),
        struct(col("us").as("bus"), col("value").as("bvalue")).as("b"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    probe.unionByName(build)
      .withColumn("m", last(col("b"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1 && col("m").isNotNull)
      .select(col("event_id"), col("user_id"), col("us").as("click_us"),
        col("m.bus").as("purchase_us"),
        col("m.bvalue").as("purchase_value"))
      .orderBy(col("event_id"))
  }

  /** Bounded-interval range-join core: per purchase of `e`, the count
    * of the same user's clicks in `(pus, pus + intervalUs]`. Bucketized
    * by the interval length into an equi-join on (user, bucket) — each
    * purchase probes exactly 2 buckets, and a (purchase, click) pair
    * matches in at most one bucket (the click's own), so counts are
    * exact with a constant ×2 blowup at any scale or skew.
    */
  private[graft] def rangeJoinCounts(e: DataFrame,
      intervalUs: Long = 3600000000L): DataFrame = {
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"), col("us").as("pus"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("us").as("cus"),
        expr(s"us div $intervalUs").as("bucket"))
    val pb = p.withColumn("bucket", explode(array(
      expr(s"pus div $intervalUs"), expr(s"pus div $intervalUs") + 1L)))
    val counts = pb.join(c, Seq("user_id", "bucket"))
      .filter(col("cus") > col("pus") && col("cus") <= col("pus") + intervalUs)
      .groupBy(col("pid")).agg(count(lit(1)).as("n_clicks"))
    p.join(counts, Seq("pid"), "left")
      .select(col("pid"), coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
      .orderBy(col("pid"))
  }
}
