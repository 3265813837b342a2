package graft.rel

import graft.QueryDef
import graft.util.Det._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational operator inventory over the star schema (SURVEY.md §2.2–§2.7
  * harness extensions). Every query is a declarative DataFrame plan —
  * filters and projections reach the parquet scan, joins pick broadcast
  * sides automatically (nation/region/customer are dimension-sized), and
  * aggregations do map-side partial aggregation. No collect() anywhere.
  */
object RelQueries {

  /** Scan + reduce shape (SURVEY §2.1 S1): full-table scan feeding a
    * single global aggregate. At scale this is a pure map-side pipeline:
    * parquet column pruning keeps the scan to 3 columns. */
  def scanLineitem(s: SparkSession, d: String): DataFrame =
    // countDistinct plans through Expand (a per-distinct-column row
    // replica) inside the SCAN stage; on the single-row-group fixture
    // files that stage is serial — spread the 4 needed columns first
    // (identity at production row-group counts, Fanout scaladoc)
    graft.util.Fanout.spreadScan(
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_quantity", "l_partkey"),
      col("l_orderkey"), s"$d/lineitem.parquet").agg(
      count(lit(1)).as("n_rows"),
      sumMoney(col("l_quantity")).as("sum_qty"),
      min("l_orderkey").as("min_orderkey"),
      max("l_orderkey").as("max_orderkey"),
      countDistinct("l_partkey").as("n_parts"))

  private val scanLineitemSql =
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  min(l_orderkey) AS min_orderkey,
      |  max(l_orderkey) AS max_orderkey,
      |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
      |FROM lineitem""".stripMargin

  /** Filter + project (SURVEY §2.2 P1): both predicates push down to the
    * parquet reader (`PushedFilters` in explain), projection prunes the
    * scan to 5 of 11 columns. */
  def filterProject(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") < lit("1995-06-01").cast("timestamp") &&
        col("l_discount") > 0.05)
      .select(
        col("l_orderkey"),
        col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_extendedprice"),
        col("l_returnflag"),
        col("l_shipdate").cast("date").as("ship_date"))
      .orderBy("l_orderkey", "l_linenumber")

  private val filterProjectSql =
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |  l_extendedprice, l_returnflag, CAST(l_shipdate AS DATE) AS ship_date
      |FROM lineitem
      |WHERE l_shipdate < TIMESTAMP '1995-06-01' AND l_discount > 0.05
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Fact-to-dimension join chain (orders ⋈ customer ⋈ nation) + group.
    * customer and nation are dimension tables: Spark broadcasts them
    * (auto under autoBroadcastJoinThreshold; explicit hint keeps the plan
    * stable at any scale factor — orders never shuffles). */
  def joinOrdersCustomer(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        count(lit(1)).as("n_orders"),
        sumMoney(col("o_totalprice")).as("total_price"),
        avgMoney(col("o_totalprice")).as("avg_price"))
      .orderBy("n_name")

  private val joinOrdersCustomerSql =
    """SELECT n_name, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** LEFT SEMI join (EXISTS): customers that placed at least one
    * high-value order. Semi joins never duplicate the left side and only
    * ship the join key of the right side across the shuffle. */
  def semiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(
        Tables.orders(s, d).filter(col("o_totalprice") > 150000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"),
        col("c_nationkey").cast("long").as("c_nationkey"))
      .orderBy("c_custkey")

  private val semiJoinSql =
    """SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT) AS c_nationkey
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 150000)
      |ORDER BY c_custkey""".stripMargin

  /** LEFT ANTI join (NOT EXISTS): customers with no order on file. */
  def antiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"),
        "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy("c_custkey")

  private val antiJoinSql =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** TPC-H Q1 shape (SURVEY §2.4 harness extension): wide grouped
    * aggregation with derived measures. All sums run in DECIMAL so they
    * are exact and reduction-order independent; means are exact-sum /
    * count. Map-side partial aggregation collapses 600k rows to 8 groups
    * before the (tiny) shuffle. */
  def aggPricingSummary(s: SparkSession, d: String): DataFrame = {
    val qty  = col("l_quantity").cast(DecimalType(12, 2))
    val ext  = col("l_extendedprice").cast(DecimalType(12, 2))
    val disc = col("l_discount").cast(DecimalType(4, 2))
    val tax  = col("l_tax").cast(DecimalType(4, 2))
    val oneMinusDisc = (lit(1).cast(DecimalType(1, 0)) - disc)
      .cast(DecimalType(4, 2))
    val onePlusTax = (lit(1).cast(DecimalType(1, 0)) + tax)
      .cast(DecimalType(4, 2))
    // the DECIMAL partial aggregation fuses into the scan stage, which
    // is serial on the single-row-group fixture file (measured: one
    // 936 ms task = the whole query) — spread the 7 needed columns
    // first (identity at production row-group counts, Fanout scaladoc)
    graft.util.Fanout.spreadScan(Tables.lineitem(s, d)
        .select("l_orderkey", "l_returnflag", "l_linestatus", "l_quantity",
          "l_extendedprice", "l_discount", "l_tax"),
        col("l_orderkey"), s"$d/lineitem.parquet")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(qty).cast("double").as("sum_qty"),
        sum(ext).cast("double").as("sum_base_price"),
        sum(ext * oneMinusDisc).cast("double").as("sum_disc_price"),
        sum(ext * oneMinusDisc * onePlusTax).cast("double").as("sum_charge"),
        round(sum(qty).cast("double") / count(lit(1)), 6).as("avg_qty"),
        round(sum(ext).cast("double") / count(lit(1)), 6).as("avg_price"),
        round(sum(disc).cast("double") / count(lit(1)), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  private val aggPricingSummarySql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |           * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |           * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))
      |           * CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_price,
      |  round(CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*), 6) AS avg_disc,
      |  CAST(count(*) AS BIGINT) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** UNION ALL with provenance tag (SURVEY §2.3 J1 relational shape). */
  def unionAll(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val hi = o.filter(col("o_totalprice") >= 300000)
      .select(lit("high").as("src"), col("o_orderkey"), col("o_totalprice"))
    val lo = o.filter(col("o_totalprice") < 30000)
      .select(lit("low").as("src"), col("o_orderkey"), col("o_totalprice"))
    hi.unionByName(lo).orderBy("src", "o_orderkey")
  }

  private val unionAllSql =
    """SELECT * FROM (
      |  SELECT 'high' AS src, o_orderkey, o_totalprice FROM orders
      |  WHERE o_totalprice >= 300000
      |  UNION ALL
      |  SELECT 'low' AS src, o_orderkey, o_totalprice FROM orders
      |  WHERE o_totalprice < 30000
      |) u ORDER BY src, o_orderkey""".stripMargin

  /** INTERSECT / EXCEPT (set semantics, SURVEY §2.6): nations that have
    * both customers and suppliers vs customers only. */
  def setOps(s: SparkSession, d: String): DataFrame = {
    val custN = Tables.customer(s, d)
      .select(col("c_nationkey").cast("long").as("nationkey"))
    val suppN = Tables.supplier(s, d)
      .select(col("s_nationkey").cast("long").as("nationkey"))
    val both = custN.intersect(suppN).select(lit("both").as("tag"),
      col("nationkey"))
    val custOnly = custN.except(suppN).select(lit("cust_only").as("tag"),
      col("nationkey"))
    both.unionByName(custOnly).orderBy("tag", "nationkey")
  }

  private val setOpsSql =
    """SELECT * FROM (
      |  SELECT 'both' AS tag, nationkey FROM (
      |    SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
      |    INTERSECT
      |    SELECT CAST(s_nationkey AS BIGINT) FROM supplier) i
      |  UNION ALL
      |  SELECT 'cust_only' AS tag, nationkey FROM (
      |    SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
      |    EXCEPT
      |    SELECT CAST(s_nationkey AS BIGINT) FROM supplier) e
      |) u ORDER BY tag, nationkey""".stripMargin

  /** Ranking window (SURVEY §2.5 extension): top-3 orders per customer.
    * The window shuffles once on o_custkey; ties broken by o_orderkey so
    * row_number is deterministic. */
  def windowTopkOrders(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy("o_custkey", "rn")
  }

  private val windowTopkOrdersSql =
    """SELECT o_custkey, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) r
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  /** Per-key top-k via the partial-aggregatable `topk_pairs` aggregate
    * (graft.functions.TopKPairs) — same answer as the window form
    * above, radically different plan: ObjectHashAggregate with a
    * MAP-SIDE partial bounds each input partition to ≤ k entries per
    * local key before the shuffle, so the exchange carries
    * O(keys × k) instead of every row (the window form shuffles and
    * sorts the full table). At 100 TB this is the difference between
    * shuffling ~100 TB and shuffling ~the answer. The oracle is the
    * window SQL — both engines must produce identical ranked rows
    * (ties are impossible in the order (o_totalprice DESC,
    * o_orderkey ASC), which is total). */
  def topkAgg(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(expr("topk_pairs(o_totalprice, o_orderkey, 3)").as("top"))
      .select(col("o_custkey"), posexplode(col("top")))
      .select(col("o_custkey"), (col("pos") + 1).cast("long").as("rn"),
        col("col.id").as("o_orderkey"), col("col.v").as("o_totalprice"))
      .orderBy("o_custkey", "rn")
  }

  /** Batch twin of the STREAMING windowed top-k (EventStreams
    * .windowTopK drives the same plan under readStream in
    * EventStreamsSpec): top-k events by value per (hour, event_type)
    * via the bounded-heap aggregate — O(windows × keys × k) state in
    * both engines' execution modes. */
  def eventsWindowTopk(s: SparkSession, d: String): DataFrame =
    graft.streaming.EventStreams
      .windowTopK(Tables.events(s, d), streaming = false)
      .orderBy("hour_epoch", "event_type", "rn")

  private val eventsWindowTopkSql =
    """SELECT hour_epoch, event_type, rn, v, event_id FROM (
      |  SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT)
      |      AS hour_epoch,
      |    event_type,
      |    CAST(row_number() OVER (
      |      PARTITION BY date_trunc('hour', ts), event_type
      |      ORDER BY value DESC, event_id) AS BIGINT) AS rn,
      |    value AS v, event_id
      |  FROM events) t
      |WHERE rn <= 3
      |ORDER BY hour_epoch, event_type, rn""".stripMargin

  /** Running-total analytic window with an explicit ROWS frame; the sum
    * runs over DECIMAL so the prefix sums are exact in both engines. */
  def windowRunningSum(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_total"),
        row_number().over(w).cast("long").as("order_seq"))
      .orderBy("o_custkey", "order_seq")
  }

  private val windowRunningSumSql =
    """SELECT o_custkey, o_orderkey,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS running_total,
      |  CAST(row_number() OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS order_seq
      |FROM orders
      |ORDER BY o_custkey, order_seq""".stripMargin

  /** ROLLUP over the region → nation hierarchy (SURVEY §2.4 extension). */
  // Spark SQL (not the Dataset rollup API): Dataset.rollup + a downstream
  // select of the grouping keys trips Spark 4's ambiguous-self-join
  // detection. The SQL form plans identically (Expand + Aggregate).
  def rollupRegion(s: SparkSession, d: String): DataFrame =
    s.sql(
      s"""SELECT coalesce(r_name, 'ALL') AS region,
         |  coalesce(n_name, 'ALL') AS nation,
         |  CAST(count(*) AS BIGINT) AS n_customers,
         |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
         |FROM parquet.`$d/customer.parquet`
         |JOIN parquet.`$d/nation.parquet` ON c_nationkey = n_nationkey
         |JOIN parquet.`$d/region.parquet` ON n_regionkey = r_regionkey
         |GROUP BY ROLLUP (r_name, n_name)
         |ORDER BY region, nation""".stripMargin)

  private val rollupRegionSql =
    """SELECT coalesce(r_name, 'ALL') AS region,
      |  coalesce(n_name, 'ALL') AS nation,
      |  CAST(count(*) AS BIGINT) AS n_customers,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY region, nation""".stripMargin

  /** String / date / JSON scalar functions (SURVEY §2.7 extension).
    * JSON extraction uses regexp_extract rather than a JSON parser so the
    * exact same expression runs in DuckDB (whose json extension may not
    * be loadable offline). */
  def stringDateJson(s: SparkSession, d: String): DataFrame =
    // the per-row regexp/date/concat work fuses into the serial
    // single-row-group scan stage — spread first (identity at
    // production row-group counts, Fanout.spreadScan scaladoc)
    graft.util.Fanout.spreadScan(Tables.events(s, d),
      col("event_id"), s"$d/events.parquet").select(
      col("event_id"),
      upper(col("event_type")).as("et_upper"),
      substring(col("event_type"), 1, 3).as("et_pre"),
      length(col("props")).cast("long").as("props_len"),
      regexp_extract(col("props"), """"k":\s*(-?\d+)""", 1)
        .cast("long").as("k_val"),
      year(col("ts")).cast("long").as("yr"),
      date_trunc("day", col("ts")).cast("date").as("day"),
      concat(col("event_type"), lit("#"), col("user_id").cast("string"))
        .as("tag"))
      .orderBy("event_id")

  private val stringDateJsonSql =
    """SELECT event_id, upper(event_type) AS et_upper,
      |  substring(event_type, 1, 3) AS et_pre,
      |  CAST(length(props) AS BIGINT) AS props_len,
      |  CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS k_val,
      |  CAST(year(ts) AS BIGINT) AS yr,
      |  CAST(date_trunc('day', ts) AS DATE) AS day,
      |  concat(event_type, '#', CAST(user_id AS VARCHAR)) AS tag
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** Tumbling event-time window (SURVEY §2.8): batch form of the
    * streaming aggregation, via Spark's window() so the identical plan
    * runs under Structured Streaming (graft.streaming.EventStreams).
    * Output key is the window start as epoch seconds (BIGINT), never a
    * raw timestamp. */
  def eventsTumbling(s: SparkSession, d: String): DataFrame =
    graft.streaming.EventStreams
      // batch arm only: spread the serial single-row-group scan so the
      // window partial aggregation parallelizes (Fanout.spreadScan
      // scaladoc); the streaming arm's micro-batches are source-split
      .tumblingCounts(graft.util.Fanout.spreadScan(Tables.events(s, d),
        col("event_id"), s"$d/events.parquet"), streaming = false)
      .orderBy("hour_epoch", "event_type")

  private val eventsTumblingSql =
    """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_epoch,
      |  event_type, CAST(count(*) AS BIGINT) AS n,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS total_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY hour_epoch, event_type""".stripMargin

  /** Sessionization (gap > 30 min ⇒ new session): the lag/flag/prefix-sum
    * islands pattern (SURVEY §2.8). All time math in epoch seconds. */
  def eventsSessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("e"), col("event_id"))
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("e"),
        col("value"))
    val flagged = ev.withColumn("is_new",
      when(lag(col("e"), 1).over(byUser).isNull ||
        col("e") - lag(col("e"), 1).over(byUser) > 1800, 1L).otherwise(0L))
    flagged
      .withColumn("session_id",
        sum(col("is_new")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("e")).as("session_start"),
        (max(col("e")) - min(col("e"))).as("duration_sec"),
        round(sum(col("value").cast(DecimalType(18, 6))).cast("double"), 6)
          .as("total_value"))
      .orderBy("user_id", "session_id")
  }

  private val eventsSessionizeSql =
    """WITH ev AS (
      |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS e, value
      |  FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN lag(e) OVER w IS NULL
      |                   OR e - lag(e) OVER w > 1800
      |                 THEN 1 ELSE 0 END AS is_new
      |  FROM ev
      |  WINDOW w AS (PARTITION BY user_id ORDER BY e, event_id)),
      |sessions AS (
      |  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY e, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM flagged)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  min(e) AS session_start,
      |  max(e) - min(e) AS duration_sec,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS total_value
      |FROM sessions
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** Exactly-once event dedup (batch twin of
    * graft.streaming.EventStreams.dedupEvents): an at-least-once
    * delivery is simulated by doubling the stream; dropDuplicates on
    * event_id restores one row per event (replayed rows are identical,
    * so the kept-row choice is value-deterministic), then a per-type
    * summary. */
  def eventsDedup(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    graft.streaming.EventStreams
      .dedupEvents(e.unionByName(e), streaming = false)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"),
        round(sum(col("value").cast(DecimalType(18, 6))).cast("double"), 6)
          .as("total_value"))
      .orderBy("event_type")
  }

  private val eventsDedupSql =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
      |    AS total_value
      |FROM (SELECT DISTINCT * FROM (
      |  SELECT * FROM events UNION ALL SELECT * FROM events) u) d
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Fixed-width value histogram (binning operator): bucket
    * l_extendedprice into 5000-unit bins with exact per-bucket stats.
    * Bucket identity is computed in INTEGER space —
    * floor(price) DIV 5000 — so no float division can flip an edge
    * value across buckets between engines (2-decimal money doubles
    * floor deterministically; exact multiples of 5000 are
    * integer-representable). One map-side-combined aggregation whose
    * output cardinality is the number of buckets, not rows — the
    * binned-statistics shape (feature histograms, length
    * distributions) a training pipeline runs corpus-wide. */
  def histogramPrice(s: SparkSession, d: String): DataFrame =
    // serial-scan partial aggregation, same treatment as
    // aggPricingSummary (Fanout.spreadScan scaladoc)
    graft.util.Fanout.spreadScan(
      Tables.lineitem(s, d).select("l_orderkey", "l_extendedprice"),
      col("l_orderkey"), s"$d/lineitem.parquet")
      .withColumn("bucket",
        expr("CAST(floor(l_extendedprice) AS BIGINT) DIV 5000"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_items"),
        sumMoney(col("l_extendedprice")).as("sum_price"),
        min("l_extendedprice").as("min_price"),
        max("l_extendedprice").as("max_price"))
      .select(col("bucket"), (col("bucket") * 5000).as("lo"),
        col("n_items"), col("sum_price"), col("min_price"),
        col("max_price"))
      .orderBy("bucket")

  private val histogramPriceSql =
    """SELECT bucket, bucket * 5000 AS lo,
      |  CAST(count(*) AS BIGINT) AS n_items,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS sum_price,
      |  min(l_extendedprice) AS min_price,
      |  max(l_extendedprice) AS max_price
      |FROM (SELECT l_extendedprice,
      |        CAST(floor(l_extendedprice) AS BIGINT) // 5000 AS bucket
      |      FROM lineitem) t
      |GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Purchase←view attribution interval join (batch twin of
    * graft.streaming.EventStreams.attributionJoin — the stream-stream
    * join face of §2.8): one row per (purchase, same-user view within
    * the preceding 30 minutes). The transformation is shared verbatim
    * with the streaming path; EventStreamsSpec drives the same plan
    * through two watermarked readStreams. */
  def eventsAttribution(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    graft.streaming.EventStreams.attributionJoin(
      e.filter(col("event_type") === "purchase"),
      e.filter(col("event_type") === "view"),
      streaming = false)
      .orderBy("purchase_id", "view_id")
  }

  private val eventsAttributionSql =
    """SELECT p.event_id AS purchase_id, p.user_id,
      |  CAST(floor(epoch(p.ts)) AS BIGINT) AS p_epoch,
      |  v.event_id AS view_id,
      |  CAST(floor(epoch(v.ts)) AS BIGINT) AS v_epoch,
      |  CAST(floor(epoch(p.ts)) - floor(epoch(v.ts)) AS BIGINT) AS gap_sec
      |FROM events p JOIN events v
      |  ON p.user_id = v.user_id
      | AND p.event_type = 'purchase' AND v.event_type = 'view'
      | AND v.ts BETWEEN p.ts - INTERVAL 30 MINUTE AND p.ts
      |ORDER BY purchase_id, view_id""".stripMargin

  /** Content hashing (SURVEY §2.7 F8): md5 over a canonicalized row
    * string — the content-identity replacement for the reference's
    * plan-identity __hash__ (core/dask_traj.py:661-669). Only strings,
    * ints and formatted dates go into the hash (float formatting differs
    * across engines). */
  def contentHash(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey"),
      md5(concat_ws("|",
        col("o_orderkey").cast("string"),
        col("o_custkey").cast("string"),
        col("o_orderstatus"),
        col("o_orderpriority"),
        date_format(col("o_orderdate"), "yyyy-MM-dd"))).as("row_hash"))
      .orderBy("o_orderkey")

  private val contentHashSql =
    """SELECT o_orderkey,
      |  md5(concat_ws('|', CAST(o_orderkey AS VARCHAR),
      |    CAST(o_custkey AS VARCHAR), o_orderstatus, o_orderpriority,
      |    strftime(o_orderdate, '%Y-%m-%d'))) AS row_hash
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** CUBE over two independent order dimensions (SURVEY §2.4 grouping
    * sets family, complementing the rollup hierarchy). */
  def cubeStatus(s: SparkSession, d: String): DataFrame =
    s.sql(
      s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
         |  coalesce(o_orderpriority, 'ALL') AS priority,
         |  CAST(count(*) AS BIGINT) AS n_orders,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
         |FROM parquet.`$d/orders.parquet`
         |GROUP BY CUBE (o_orderstatus, o_orderpriority)
         |ORDER BY status, priority""".stripMargin)

  private val cubeStatusSql =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(o_orderpriority, 'ALL') AS priority,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  /** Explicit GROUPING SETS (SURVEY §2.4 grouping-sets family,
    * complementing ROLLUP's hierarchy and CUBE's full lattice): the
    * region-level and nation-level marginals plus the grand total,
    * WITHOUT the (region, nation) detail — a set ROLLUP/CUBE cannot
    * express. */
  def groupingSets(s: SparkSession, d: String): DataFrame =
    s.sql(
      s"""SELECT coalesce(r_name, 'ALL') AS region,
         |  coalesce(n_name, 'ALL') AS nation,
         |  CAST(count(*) AS BIGINT) AS n_customers,
         |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
         |FROM parquet.`$d/customer.parquet`
         |JOIN parquet.`$d/nation.parquet` ON c_nationkey = n_nationkey
         |JOIN parquet.`$d/region.parquet` ON n_regionkey = r_regionkey
         |GROUP BY GROUPING SETS ((r_name), (n_name), ())
         |ORDER BY region, nation""".stripMargin)

  private val groupingSetsSql =
    """SELECT coalesce(r_name, 'ALL') AS region,
      |  coalesce(n_name, 'ALL') AS nation,
      |  CAST(count(*) AS BIGINT) AS n_customers,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY GROUPING SETS ((r_name), (n_name), ())
      |ORDER BY region, nation""".stripMargin

  /** RANGE-frame analytic window (SURVEY §2.5): per order, the rolling
    * 30-day spend of the same customer — a VALUE-range frame over epoch
    * days, not a row-count frame. Time lives as an integer day number
    * so the range arithmetic is identical in both engines. */
  def windowRangeFrame(s: SparkSession, d: String): DataFrame = {
    val day = (unix_timestamp(col("o_orderdate")) / 86400L).cast("long")
    val w = Window.partitionBy("o_custkey").orderBy("day")
      .rangeBetween(-30, Window.currentRow)
    Tables.orders(s, d)
      .withColumn("day", day)
      .select(col("o_custkey"), col("o_orderkey"), col("day"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
          .cast("double").as("spend_30d"))
      .orderBy("o_custkey", "day", "o_orderkey")
  }

  private val windowRangeFrameSql =
    """SELECT o_custkey, o_orderkey,
      |  CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS day,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey
      |    ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400
      |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS spend_30d
      |FROM orders
      |ORDER BY o_custkey, day, o_orderkey""".stripMargin

  /** Sliding event-time window (1h window, 15min slide): each event
    * lands in 4 overlapping windows. The transformation is shared with
    * the Structured Streaming drive (graft.streaming.EventStreams
    * .slidingCounts); the oracle reproduces the window family
    * arithmetically on epoch seconds. */
  def eventsSliding(s: SparkSession, d: String): DataFrame =
    graft.streaming.EventStreams
      // batch arm only — see eventsTumbling: the ×4 window explode +
      // partial aggregation otherwise run inside the serial scan stage
      .slidingCounts(graft.util.Fanout.spreadScan(Tables.events(s, d),
        col("event_id"), s"$d/events.parquet"), streaming = false)
      .orderBy("win_epoch", "event_type")

  private val eventsSlidingSql =
    """WITH ev AS (
      |  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS e, event_type, value
      |  FROM events),
      |exploded AS (
      |  SELECT (e // 900) * 900 - k * 900 AS win_epoch, event_type, value
      |  FROM ev, (SELECT unnest(range(4)) AS k) ks)
      |SELECT win_epoch, event_type, CAST(count(*) AS BIGINT) AS n,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS total_value
      |FROM exploded
      |GROUP BY win_epoch, event_type
      |ORDER BY win_epoch, event_type""".stripMargin

  /** Sketch aggregation: HyperLogLog++ approximate distinct counts.
    * DuckDB can't reproduce Spark's HLL sketch, so the oracle-checkable
    * surface is: the exact distinct counts (both engines compute those)
    * plus a Spark-computed integer-exact 5%-error bound flag
    * (|approx − exact| · 20 ≤ exact) that the oracle pins to 1. The HLL
    * run uses rsd = 0.02 so the bound has wide margin; the sketch is
    * deterministic for fixed data, so a local pass ⇒ a driver pass. */
  def approxDistinct(s: SparkSession, d: String): DataFrame = {
    // NOT spread (r20-opt, measured): countDistinct's Expand partials
    // collapse map-side in the scan stage and a pre-agg spread
    // exchange made the query ~0.5 s SLOWER (0.80 → 1.3) — the
    // opposite verdict from aggPricingSummary's unexpandable DECIMAL
    // partials, so the serial-scan rule is per-operator, not blanket
    val li = Tables.lineitem(s, d)
    // exact counts and sketches aggregate SEPARATELY: countDistinct
    // plans through Expand (one replica per distinct column), and an
    // HLL sketch evaluated inside that expanded aggregate allocates its
    // register array per partial-agg group — measured 235 s at sf0.1.
    // Two global aggregates + a 1-row cross join keep the sketch pass
    // a plain accumulate-merge over the scan.
    val exact = li.agg(
      countDistinct("l_orderkey").as("exact_orders"),
      countDistinct("l_partkey").as("exact_parts"),
      countDistinct("l_suppkey").as("exact_supps"))
    // rsd 0.02: measured ≤ 1.0% error on every column at every SF (5×
    // margin under the pinned 5% bound) at a fraction of rsd=0.01's
    // sketch cost; deterministic for fixed data, so a local pass is a
    // driver pass
    val approx = li.agg(
      approx_count_distinct(col("l_orderkey"), 0.02).as("a_o"),
      approx_count_distinct(col("l_partkey"), 0.02).as("a_p"),
      approx_count_distinct(col("l_suppkey"), 0.02).as("a_s"))
    exact.crossJoin(broadcast(approx))
      .select(col("exact_orders"), col("exact_parts"), col("exact_supps"),
        (abs(col("a_o") - col("exact_orders")) * 20 <= col("exact_orders") &&
          abs(col("a_p") - col("exact_parts")) * 20 <= col("exact_parts") &&
          abs(col("a_s") - col("exact_supps")) * 20 <= col("exact_supps"))
          .cast("long").as("within_5pct"))
  }

  private val approxDistinctSql =
    """SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
      |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
      |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS exact_supps,
      |  CAST(1 AS BIGINT) AS within_5pct
      |FROM lineitem""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_scan_lineitem", scanLineitem, Some(scanLineitemSql)),
    QueryDef("q_filter_project", filterProject, Some(filterProjectSql)),
    QueryDef("q_join_orders_customer", joinOrdersCustomer,
      Some(joinOrdersCustomerSql)),
    QueryDef("q_semi_join", semiJoin, Some(semiJoinSql)),
    QueryDef("q_anti_join", antiJoin, Some(antiJoinSql)),
    QueryDef("q_agg_pricing_summary", aggPricingSummary,
      Some(aggPricingSummarySql)),
    QueryDef("q_union_all", unionAll, Some(unionAllSql)),
    QueryDef("q_set_ops", setOps, Some(setOpsSql)),
    QueryDef("q_window_topk_orders", windowTopkOrders,
      Some(windowTopkOrdersSql)),
    QueryDef("q_topk_agg", topkAgg, Some(windowTopkOrdersSql)),
    QueryDef("q_window_running_sum", windowRunningSum,
      Some(windowRunningSumSql)),
    QueryDef("q_rollup_region", rollupRegion, Some(rollupRegionSql)),
    QueryDef("q_cube_status", cubeStatus, Some(cubeStatusSql)),
    QueryDef("q_grouping_sets", groupingSets, Some(groupingSetsSql)),
    QueryDef("q_window_range_frame", windowRangeFrame,
      Some(windowRangeFrameSql)),
    QueryDef("q_events_sliding", eventsSliding, Some(eventsSlidingSql)),
    QueryDef("q_string_date_json", stringDateJson, Some(stringDateJsonSql)),
    QueryDef("q_events_tumbling", eventsTumbling, Some(eventsTumblingSql)),
    QueryDef("q_events_window_topk", eventsWindowTopk,
      Some(eventsWindowTopkSql)),
    QueryDef("q_events_sessionize", eventsSessionize,
      Some(eventsSessionizeSql)),
    QueryDef("q_events_dedup", eventsDedup, Some(eventsDedupSql)),
    QueryDef("q_events_attribution", eventsAttribution,
      Some(eventsAttributionSql)),
    QueryDef("q_histogram_price", histogramPrice,
      Some(histogramPriceSql)),
    QueryDef("q_content_hash", contentHash, Some(contentHashSql)),
    QueryDef("q_approx_distinct", approxDistinct, Some(approxDistinctSql)))
}
