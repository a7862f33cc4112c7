package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One named query: a Spark DataFrame program plus (optionally) the
  * equivalent ANSI SQL for the DuckDB oracle. Column names and row
  * content must match exactly between the two.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Exact-arithmetic helper: synthetic money/quantity columns are doubles
    * with <=2 decimals; summing doubles is order-dependent, so both engines
    * aggregate in decimal (exact, associative). Decimal AGGREGATES are then
    * emitted as scale-pinned STRINGS (a decimal→double cast double-rounds
    * in DuckDB and raw decimal columns hash-mismatch the comparator — see
    * q1); the double cast remains only for ratio columns like avg_qty,
    * whose operands stay in exactly-representable range.
    */
  def dec(c: Column): Column = c.cast("decimal(18,4)")

  /** q45's bucketed gate tables, written once per SF dir and per-dir
    * named — bucketing is one-shuffle-at-ingest, so repeated query runs
    * must reuse the tables, not re-write them.
    */
  private[queries] val bucketedGateTables =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()
}

/** Relational operator pack over the TESTDATA star schema.
  *
  * Coverage map to SURVEY.md §2 (reference ops re-expressed on the
  * synthetic tables): scans S5/S7/S9, projections P1-P5, filters F1-F4,
  * joins J1-J4 (left/equi, broadcast), aggregations A1-A5
  * (dropDuplicates, collect_set, countDistinct), §2.7 engine
  * capabilities (window, sort/limit, set ops, rollup, pivot), and the
  * scalar-function inventory of §2.8.
  */
object Relational {
  import Q.dec

  val all: Seq[Q] = Seq(
    // A2/A3-style hash aggregation with partial (map-side) combine.
    // TPC-H Q1 shape: wide agg over the fact table, tiny group count.
    Q(
      "q1_agg",
      (s, dir) => {
        val l = graft.Tables.lineitem(s, dir)
        // Large-magnitude money sums aggregate in DECIMAL (exact,
        // associative) and emit as STRING: casting the decimal to double
        // double-rounds in DuckDB (int128→double, then /10^scale — 1 ulp
        // at sf0.1), and raw decimal columns hash-mismatch the driver's
        // comparator (Spark decimal(28,4) vs DuckDB decimal(38,4)).
        // A scale-pinned string renders identically in both engines.
        l.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(dec(col("l_quantity"))).cast("string").as("sum_qty"),
            sum(dec(col("l_extendedprice"))).cast("string").as("sum_base_price"),
            sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
              .cast("string").as("sum_disc_price"),
            (sum(dec(col("l_quantity"))).cast("double") / count(lit(1)).cast("double"))
              .as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS sum_base_price,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS sum_disc_price,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
             |  COUNT(*) AS count_order
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // F1-F3 + P1: filter + per-row computed projection. The date and
    // discount predicates reach the parquet scan as PushedFilters.
    Q(
      "q2_filter_project",
      (s, dir) => {
        val l = graft.Tables.lineitem(s, dir)
        l.where(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
            col("l_shipdate") < to_timestamp(lit("1997-01-01")) &&
            col("l_discount") > lit(0.05))
          .select(
            col("l_orderkey"), col("l_linenumber"),
            (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
              .cast("double").as("net_price"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS net_price
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
             |  AND l_discount > 0.05
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // J1-style left-outer equi-join on a key column list.
    Q(
      "q3_join_left",
      (s, dir) => {
        val o = graft.Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey").as("c_custkey"), col("o_totalprice"))
        val c = graft.Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        o.join(c, Seq("c_custkey"), "left")
          .select(col("o_orderkey"), col("c_custkey"), col("o_totalprice"),
            col("c_name"), col("c_mktsegment"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey AS c_custkey, o_totalprice, c_name, c_mktsegment
             |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_orderkey""".stripMargin)),

    // Multi-way join: fact ⋈ orders ⋈ customer ⋈ nation ⋈ region with
    // explicit broadcast of the small dimensions (TPC-H Q5 shape).
    Q(
      "q4_join_multi",
      (s, dir) => {
        val l = graft.Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        val o = graft.Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
        val c = graft.Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
        val n = graft.Tables.nation(s, dir)
        val r = graft.Tables.region(s, dir)
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .where(col("r_name") === "ASIA")
          .groupBy(col("n_name"))
          .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .as("revenue_d"))
          // order on the exact decimal, then emit it as a string (see q1)
          .orderBy(col("revenue_d").desc, col("n_name"))
          .select(col("n_name"), col("revenue_d").cast("string").as("revenue"))
      },
      Some("""SELECT n_name,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |GROUP BY n_name
             |ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) DESC, n_name""".stripMargin)),

    // A1: dropDuplicates on a column subset == DISTINCT over those cols.
    Q(
      "q5_distinct",
      (s, dir) => {
        graft.Tables.lineitem(s, dir)
          .select(col("l_returnflag"), col("l_linestatus"))
          .dropDuplicates(Seq("l_returnflag", "l_linestatus"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // A4: global agg + multi-column exact countDistinct ×3 (Expand-based).
    Q(
      "q6_count_distinct",
      (s, dir) => {
        graft.Tables.lineitem(s, dir).agg(
          countDistinct(col("l_orderkey")).as("cd_orders"),
          countDistinct(col("l_orderkey"), col("l_linenumber")).as("cd_lineitems"),
          countDistinct(col("l_partkey"), col("l_suppkey")).as("cd_partsupp"))
      },
      Some("""SELECT
             |  (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS cd_orders,
             |  (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)) AS cd_lineitems,
             |  (SELECT COUNT(*) FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)) AS cd_partsupp""".stripMargin)),

    // A2/A3: collect_set folded per group, canonicalized with sort_array
    // (reference: ImportVcfToDataLakeByRanges.java:64-76; determinism
    // deviation documented in SURVEY §7).
    Q(
      "q7_collect_set",
      (s, dir) => {
        val c = graft.Tables.customer(s, dir).select(col("c_mktsegment"), col("c_nationkey"))
        val n = graft.Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
        c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_mktsegment"))
          // array outputs are serialized to a delimited string: the
          // driver's comparator sorts rows with pandas, which cannot hash
          // ndarray cells (observed harness crash in round 1)
          .agg(array_join(sort_array(collect_set(col("n_name"))), "|").as("nations"),
            count(lit(1)).as("n_customers"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment,
             |  array_to_string(list_sort(list(DISTINCT n_name)), '|') AS nations,
             |  COUNT(*) AS n_customers
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin)),

    // §2.7 window functions: deterministic top-3 orders per customer.
    Q(
      "q8_window_topn",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        graft.Tables.orders(s, dir)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .where(col("rn") <= 3)
          .orderBy(col("o_custkey"), col("rn"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders) t
             |WHERE rn <= 3
             |ORDER BY o_custkey, rn""".stripMargin)),

    // §2.7 global sort + limit (top-K with tie-break).
    Q(
      "q9_topk",
      (s, dir) => {
        graft.Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10)
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    // §2.7 set operations: (click ∩ purchase) \ error users.
    Q(
      "q10_setops",
      (s, dir) => {
        val e = graft.Tables.events(s, dir)
        def users(t: String): DataFrame =
          e.where(col("event_type") === t).select(col("user_id"))
        val noisy = e.where(col("event_type") === "error")
          .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
          .where(col("n") >= 15).select(col("user_id"))
        users("click").intersect(users("purchase")).except(noisy)
          .orderBy(col("user_id"))
      },
      Some("""(SELECT user_id FROM events WHERE event_type = 'click'
             | INTERSECT
             | SELECT user_id FROM events WHERE event_type = 'purchase')
             |EXCEPT
             |SELECT user_id FROM events WHERE event_type = 'error'
             |GROUP BY user_id HAVING COUNT(*) >= 15
             |ORDER BY user_id""".stripMargin)),

    // F2: when/otherwise chain (the AlphaMissense-decode idiom, M:212-228).
    Q(
      "q11_case_when",
      (s, dir) => {
        graft.Tables.orders(s, dir)
          .withColumn("price_band",
            when(col("o_totalprice") < 10000, "small")
              .when(col("o_totalprice") < 100000, "medium")
              .otherwise("large"))
          .groupBy(col("price_band"))
          .agg(count(lit(1)).as("n_orders"),
            sum(dec(col("o_totalprice"))).cast("string").as("total"))
          .orderBy(col("price_band"))
      },
      Some("""SELECT
             |  CASE WHEN o_totalprice < 10000 THEN 'small'
             |       WHEN o_totalprice < 100000 THEN 'medium'
             |       ELSE 'large' END AS price_band,
             |  COUNT(*) AS n_orders,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS total
             |FROM orders GROUP BY 1 ORDER BY price_band""".stripMargin)),

    // §2.8 scalar string functions: concat/upper/trim/split/
    // substring_index/regexp_replace (all call sites cited in SURVEY).
    Q(
      "q12_string_funcs",
      (s, dir) => {
        graft.Tables.part(s, dir)
          .select(
            col("p_partkey"),
            upper(col("p_brand")).as("brand_u"),
            split(col("p_type"), " ").getItem(0).as("type_head"),
            substring_index(col("p_name"), " ", 2).as("name_2w"),
            regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowel"),
            concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey,
             |  UPPER(p_brand) AS brand_u,
             |  split_part(p_type, ' ', 1) AS type_head,
             |  array_to_string(list_slice(string_split(p_name, ' '), 1, 2), ' ') AS name_2w,
             |  regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
             |  p_brand || '#' || p_type AS brand_type
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // D5: manual range bucketing — floor(key/width) (the "ByRanges"
    // scheme, PARTITION_SIZE idiom at M:18/M:75).
    Q(
      "q13_bucket",
      (s, dir) => {
        graft.Tables.orders(s, dir)
          .withColumn("price_bucket", floor(col("o_totalprice") / 1000).cast("long"))
          .groupBy(col("price_bucket"))
          .agg(count(lit(1)).as("n_orders"))
          .orderBy(col("price_bucket"))
      },
      Some("""SELECT CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS price_bucket,
             |  COUNT(*) AS n_orders
             |FROM orders GROUP BY 1 ORDER BY price_bucket""".stripMargin)),

    // Time-bucketed aggregation over the events table (batch analog of a
    // tumbling window; streaming variant lives in graft.streaming).
    Q(
      "q14_events_hourly",
      (s, dir) => {
        graft.Tables.events(s, dir)
          .groupBy(date_trunc("hour", col("ts")).as("hour"))
          .agg(count(lit(1)).as("n_events"),
            sum(dec(col("value"))).cast("double").as("sum_value"))
          .orderBy(col("hour"))
      },
      Some("""SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n_events,
             |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1 ORDER BY hour""".stripMargin)),

    // Left-semi / left-anti joins (EXISTS / NOT EXISTS).
    Q(
      "q15_semi_anti",
      (s, dir) => {
        val c = graft.Tables.customer(s, dir).select(col("c_custkey"))
        val o = graft.Tables.orders(s, dir).select(col("o_custkey"))
        val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .withColumn("status", lit("has_orders"))
        val anti = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .withColumn("status", lit("no_orders"))
        semi.union(anti).orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, 'has_orders' AS status FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |UNION ALL
             |SELECT c_custkey, 'no_orders' AS status FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // Engine capability: ROLLUP grouping sets (§2.6 note).
    Q(
      "q16_rollup",
      (s, dir) => {
        val c = graft.Tables.customer(s, dir).select(col("c_mktsegment"), col("c_nationkey"))
        val n = graft.Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
        c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .rollup(col("c_mktsegment"), col("n_name"))
          .agg(count(lit(1)).as("n_customers"))
          .select(
            coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
            coalesce(col("n_name"), lit("ALL")).as("nation"),
            col("n_customers"))
          .orderBy(col("segment"), col("nation"))
      },
      Some("""SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
             |  COALESCE(n_name, 'ALL') AS nation,
             |  COUNT(*) AS n_customers
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY ROLLUP (c_mktsegment, n_name)
             |ORDER BY segment, nation""".stripMargin)),

    // Engine capability: CUBE grouping sets (all 4 key combinations).
    Q(
      "q37_cube",
      (s, dir) => {
        graft.Tables.orders(s, dir)
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"))
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("n_orders"))
          .orderBy(col("status"), col("priority"))
      },
      Some("""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
             |  COALESCE(o_orderpriority, 'ALL') AS priority,
             |  COUNT(*) AS n_orders
             |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
             |ORDER BY status, priority""".stripMargin)),

    // Engine capability: pivot with an explicit value list.
    Q(
      "q17_pivot",
      (s, dir) => {
        graft.Tables.events(s, dir)
          .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .count()
          .na.fill(0L)
          .orderBy(col("day"))
      },
      Some("""SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             |  COUNT(*) FILTER (event_type = 'click') AS click,
             |  COUNT(*) FILTER (event_type = 'error') AS error,
             |  COUNT(*) FILTER (event_type = 'purchase') AS purchase,
             |  COUNT(*) FILTER (event_type = 'signup') AS signup,
             |  COUNT(*) FILTER (event_type = 'view') AS view
             |FROM events GROUP BY 1 ORDER BY day""".stripMargin)),

    // Unpivot (melt) — the inverse of q17's pivot: wide per-part
    // metrics to long (metric, value) rows. Values pass through
    // untouched (stored doubles, no arithmetic), names come from the
    // column list on both engines.
    Q(
      "q65_unpivot",
      (s, dir) => {
        graft.Tables.part(s, dir)
          .select(col("p_partkey"),
            col("p_size").cast("double").as("size"),
            col("p_retailprice").as("retailprice"))
          .unpivot(Array(col("p_partkey")),
            Array(col("size"), col("retailprice")), "metric", "value")
          .orderBy(col("p_partkey"), col("metric"))
      },
      Some("""SELECT p_partkey, metric, value FROM (
             |  SELECT p_partkey, CAST(p_size AS DOUBLE) AS size,
             |         p_retailprice AS retailprice
             |  FROM part)
             |UNPIVOT (value FOR metric IN (size, retailprice))
             |ORDER BY p_partkey, metric""".stripMargin)),

    // Map-typed columns + map higher-order functions: per-user
    // event-type counts as a MAP, filtered (map_filter) and re-scaled
    // (transform_values), then serialized through the sorted-entries
    // recipe. The oracle mirrors the VALUES relationally — DuckDB's MAP
    // dialect differs, but the gate pins semantics, not storage.
    Q(
      "q66_map_funcs",
      (s, dir) => {
        val m = map_from_entries(sort_array(collect_list(
          struct(col("event_type"), col("cnt")))))
        graft.Tables.events(s, dir)
          .groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy(col("user_id"))
          .agg(m.as("m"))
          .select(
            col("user_id"),
            size(col("m")).cast("long").as("n_types"),
            coalesce(element_at(col("m"), "click"), lit(0L)).as("clicks"),
            array_join(
              transform(
                map_entries(transform_values(
                  map_filter(col("m"), (_, v) => v >= 2), (_, v) => v * 10)),
                e => concat_ws(":", e.getField("key"), e.getField("value"))),
              "|").as("hot_types"))
          .orderBy(col("user_id"))
      },
      Some("""WITH c AS (
             |  SELECT user_id, event_type, count(*) AS cnt
             |  FROM events GROUP BY user_id, event_type)
             |SELECT user_id,
             |  count(*) AS n_types,
             |  coalesce(min(cnt) FILTER (event_type = 'click'), 0) AS clicks,
             |  coalesce(string_agg(event_type || ':' || CAST(cnt * 10 AS VARCHAR), '|'
             |    ORDER BY event_type) FILTER (cnt >= 2), '') AS hot_types
             |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // S9: file-provenance-as-data via input_file_name() (reference M:87
    // derives the sample id from the file basename).
    Q(
      "q18_provenance",
      (s, dir) => {
        // distinct the per-file-constant BEFORE deriving from it: the
        // regexp then runs once per file instead of once per row of the
        // fact table (provenance harvesting at 100 TB = millions of
        // files but billions of rows)
        graft.Tables.lineitem(s, dir)
          .select(input_file_name().as("f"))
          .distinct()
          .select(regexp_extract(col("f"), "([^/]+)$", 1).as("file_name"))
          .distinct()
          .orderBy(col("file_name"))
      },
      Some("SELECT 'lineitem.parquet' AS file_name")),

    // Batch sessionization: gaps-and-islands with lag + running sum
    // (30-minute inactivity gap). The streaming variant lives in
    // graft.streaming as a session_window / flatMapGroupsWithState.
    Q(
      "q30_sessionize",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        // gap comparison in integer MICROSECONDS on both sides: casting
        // timestamps to whole seconds would widen the boundary to a
        // 1-second disagreement window vs the oracle's fractional epoch.
        // unix_micros requires TIMESTAMP while the current events
        // generation loads as TIMESTAMP_NTZ — the cast interprets the
        // naive value in the session tz (pinned UTC), exactly DuckDB's
        // epoch_us reading of the same naive parquet value, and is a
        // no-op on the older TIMESTAMP generation. Only the gap math
        // casts; the output columns keep the loaded type.
        val gapMicros = 1800L * 1000000L
        val tsUtc = col("ts").cast("timestamp")
        val lagUtc = lag(tsUtc, 1).over(w)
        val newSession = when(
          lagUtc.isNull || unix_micros(tsUtc) - unix_micros(lagUtc) > gapMicros, 1L)
          .otherwise(0L)
        graft.Tables.events(s, dir)
          .withColumn("new_sess", newSession)
          .withColumn("session_id",
            sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
            min(col("ts")).as("sess_start"),
            max(col("ts")).as("sess_end"))
          .orderBy(col("user_id"), col("session_id"))
      },
      Some("""WITH flagged AS (
             |  SELECT user_id, event_id, ts,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
             |         THEN 1 ELSE 0 END AS new_sess
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sessions AS (
             |  SELECT user_id, event_id, ts,
             |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
             |  FROM flagged)
             |SELECT user_id, session_id, COUNT(*) AS n_events,
             |  MIN(ts) AS sess_start, MAX(ts) AS sess_end
             |FROM sessions GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin)),

    // Exact percentiles (sort-based, deterministic linear interpolation).
    Q(
      "q31_percentiles",
      (s, dir) => {
        graft.Tables.orders(s, dir)
          .groupBy(col("o_orderstatus"))
          .agg(
            round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
            round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
            count(lit(1)).as("n"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus,
             |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
             |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
             |  COUNT(*) AS n
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // Array construction + higher-order functions over aggregated arrays
    // (slice / transform / left-fold aggregate). Quantities are
    // integer-valued doubles, so sums are exact in any order.
    Q(
      "q34_array_hof",
      (s, dir) => {
        graft.Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey"))
          .agg(sort_array(collect_list(col("l_quantity"))).as("qtys"))
          .select(
            col("l_orderkey"),
            size(col("qtys")).cast("long").as("n_items"),
            // array cells crash the driver comparator's pandas sort, so
            // the HOF results are serialized; elements are integer-valued
            // doubles <= 200, which both engines render identically
            // ("74.0"). Magnitude bound matters: at >= 1e7 Spark's
            // Double.toString switches to scientific notation while
            // DuckDB stays positional — for price-scale columns, cast
            // elements through a pinned decimal before stringifying
            // instead of copying this pattern
            array_join(transform(slice(col("qtys"), 1, 3), x => x.cast("string")), "|")
              .as("smallest3"),
            array_join(transform(col("qtys"), x => (x * 2).cast("string")), "|")
              .as("doubled"),
            aggregate(col("qtys"), lit(0.0), (a, x) => a + x).as("total_qty"))
          .orderBy(col("l_orderkey"))
      },
      Some("""WITH a AS (
             |  SELECT l_orderkey, list_sort(list(l_quantity)) AS qtys
             |  FROM lineitem GROUP BY l_orderkey)
             |SELECT l_orderkey,
             |  len(qtys) AS n_items,
             |  array_to_string(qtys[1:3], '|') AS smallest3,
             |  array_to_string(list_transform(qtys, x -> x * 2), '|') AS doubled,
             |  list_reduce(qtys, (acc, x) -> acc + x) AS total_qty
             |FROM a ORDER BY l_orderkey""".stripMargin)),

    // Approximate aggregates — the 100 TB fallbacks for exact
    // count-distinct/percentiles (SURVEY §2.6 note). Rows-only: HLL and
    // KLL sketch internals differ across engines by design, so there is
    // no hash-matchable oracle. The row is SELF-EVIDENCING instead:
    // each sketch value is emitted beside its exact counterpart and a
    // relative error, so the gate's rows-only entry still shows the
    // approximation is tight (HLL default rsd 5%; KLL at accuracy 1000
    // lands within 1/1000 rank of the true median).
    Q(
      "q38_approx",
      (s, dir) => {
        graft.Tables.lineitem(s, dir).agg(
          approx_count_distinct(col("l_orderkey")).as("acd_orders"),
          countDistinct(col("l_orderkey")).as("exact_orders"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
            .cast("double").as("p50_price"),
          expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.5)")
            .as("exact_p50_price"),
          count(lit(1)).as("n"))
          .select(
            col("acd_orders"), col("exact_orders"),
            round(abs(col("acd_orders") - col("exact_orders"))
              .cast("double") / col("exact_orders"), 4).as("acd_rel_err"),
            col("p50_price"), col("exact_p50_price"),
            round(abs(col("p50_price") - col("exact_p50_price"))
              / col("exact_p50_price"), 4).as("p50_rel_err"),
            col("n"))
      },
      None),

    // §2.9 UDAF capability: typed Aggregator — deterministic BOUNDED
    // collect_set (state never exceeds the bound, even in map-side
    // partials; SURVEY §7's 100 TB candidate).
    Q(
      "q32_bounded_set",
      (s, dir) => {
        val bounded = udaf(graft.functions.BoundedSortedSetAgg(5))
        graft.Tables.customer(s, dir)
          .groupBy(col("c_mktsegment"))
          .agg(array_join(bounded(col("c_name")), "|").as("first_names"),
            count(lit(1)).as("n_customers"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment,
             |  array_to_string(list_sort(list(DISTINCT c_name))[1:5], '|') AS first_names,
             |  COUNT(*) AS n_customers
             |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // Semi-structured extraction from a JSON string column.
    Q(
      "q19_json_extract",
      (s, dir) => {
        graft.Tables.events(s, dir)
          .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
          .groupBy(col("event_type"))
          .agg(sum(col("k")).cast("long").as("sum_k"),
            count(lit(1)).as("n"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type,
             |  CAST(SUM(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT)) AS BIGINT) AS sum_k,
             |  COUNT(*) AS n
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // §2.10 bucketed co-location through the gate: both sides are
    // written bucketed on the join key (the one-shuffle-at-ingest
    // pattern), then joined and aggregated — the join itself runs with
    // no Exchange (asserted in BucketingSpec); here the ORACLE pins that
    // the zero-shuffle path returns exactly what the plain join does.
    // The writes are memoized per SF dir (and named per dir): bucketing
    // IS one-shuffle-at-ingest, so repeated runs — Bench's min-of-two —
    // measure the join, not re-ingest.
    Q(
      "q45_bucketed_join",
      (s, dir) => {
        val (ordersTable, customerTable) = Q.bucketedGateTables.computeIfAbsent(dir, d => {
          val tag = java.lang.Integer.toHexString(d.hashCode)
          val o = graft.Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          val c = graft.Tables.customer(s, d)
            .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
          val (ot, ct) = (s"gate_orders_bucketed_$tag", s"gate_customer_bucketed_$tag")
          graft.ops.Bucketing.writeBucketed(o, ot, "o_custkey", 8)
          graft.ops.Bucketing.writeBucketed(c, ct, "o_custkey", 8)
          (ot, ct)
        })
        s.table(ordersTable)
          .join(s.table(customerTable), Seq("o_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(
            sum(dec(col("o_totalprice"))).cast("string").as("sum_price"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS sum_price,
             |  COUNT(*) AS n_orders
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // AS-OF join (operator Spark lacks; ops.AsOf implements it as
    // tag + union + one window pass — no per-key cross product). The
    // oracle is DuckDB's NATIVE ASOF JOIN, pinning our window
    // formulation against an independent first-class implementation.
    // (The fixture has no click/purchase timestamp ties, so the
    // inclusive-boundary case is pinned by the OpsSpec unit test, not
    // by this gate row. Both engines compare at MICROsecond precision:
    // Tables.events floors the nanos column with integer div 1000 and
    // DuckDB truncates TIMESTAMP(NANOS) to its µs TIMESTAMP on read;
    // the fixture timestamps are µs-aligned, so no boundary skew.)
    Q(
      "q46_asof_join",
      (s, dir) => {
        val e = graft.Tables.events(s, dir)
        val clicks = e.where(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = e.where(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("pval"))
        graft.ops.AsOf.asofJoin(clicks, purchases, "user_id", "ts", "pval",
          as = "last_purchase")
          .select(col("event_id"), col("user_id"), col("last_purchase"))
          .orderBy(col("event_id"))
      },
      Some("""WITH l AS (
             |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
             |r AS (
             |  SELECT user_id, ts, max(value) AS pval FROM events
             |  WHERE event_type = 'purchase' GROUP BY user_id, ts)
             |SELECT l.event_id, l.user_id, r.pval AS last_purchase
             |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
             |ORDER BY l.event_id""".stripMargin)),

    // Range (interval-containment) join via bin replication (ops.
    // RangeJoin) — the scale path for a predicate Spark would otherwise
    // plan as a nested loop. The oracle runs the plain BETWEEN theta
    // join, pinning that the binned equi-join + residual filter finds
    // exactly the same pairs. unit price = extendedprice/quantity is
    // the same IEEE division in both engines, so the BETWEEN boundary
    // decisions are bit-identical.
    Q(
      "q47_range_join",
      (s, dir) => {
        val pts = graft.Tables.lineitem(s, dir)
          .select((col("l_extendedprice") / col("l_quantity")).as("unit_price"))
        val bands = graft.Tables.part(s, dir)
          .groupBy(col("p_brand"))
          .agg(min(col("p_retailprice")).as("lo"), max(col("p_retailprice")).as("hi"))
        graft.ops.RangeJoin.binned(pts, bands, "unit_price", "lo", "hi", binWidth = 1.0)
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_in_band"))
          .orderBy(col("p_brand"))
      },
      Some("""WITH bands AS (
             |  SELECT p_brand, min(p_retailprice) AS lo, max(p_retailprice) AS hi
             |  FROM part GROUP BY p_brand)
             |SELECT p_brand, COUNT(*) AS n_in_band
             |FROM lineitem JOIN bands
             |  ON l_extendedprice / l_quantity BETWEEN lo AND hi
             |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // Fuzzy (edit-distance <= 1) key join via deletion-neighborhood
    // blocking (ops.FuzzyJoin) — the entity-resolution join. The
    // oracle runs the naive quadratic levenshtein theta-join on the
    // probe x table cross space, pinning that the blocked equi-join +
    // exact verify finds exactly the same pairs; Spark's plan is the
    // linear explode + one hash shuffle that survives corpus scale.
    Q(
      "q85_fuzzy_join",
      (s, dir) => {
        val names = graft.Tables.customer(s, dir).select(col("c_name"))
        val probe = names.orderBy(col("c_name")).limit(100)
          .select(col("c_name").as("name_a"))
        graft.ops.FuzzyJoin.editDistance1Join(
          probe, "name_a", names.select(col("c_name").as("name_b")), "name_b")
          .where(col("name_a") < col("name_b"))
          .orderBy(col("name_a"), col("name_b"))
      },
      Some("""WITH probe AS (
             |  SELECT c_name AS name_a FROM customer ORDER BY c_name LIMIT 100)
             |SELECT name_a, c_name AS name_b, levenshtein(name_a, c_name) AS dist
             |FROM probe JOIN customer
             |  ON name_a < c_name AND levenshtein(name_a, c_name) <= 1
             |ORDER BY name_a, name_b""".stripMargin)),

    // ROW-CARRYING fuzzy join at distance 2 (ops.FuzzyJoin.fuzzyJoinRows)
    // — the entity-resolution output: matched ROWS with payload columns
    // from both sides, not just key pairs, over the depth-2 deletion
    // neighborhood. Oracle is again the naive quadratic levenshtein
    // theta-join, certifying both the d=2 blocking (no pair missed) and
    // the fan-out back to rows (payloads land on the right pairs).
    Q(
      "q86_fuzzy_join_rows",
      (s, dir) => {
        val c = graft.Tables.customer(s, dir)
        val probe = c.orderBy(col("c_name")).limit(100)
          .select(col("c_custkey").as("a_key"), col("c_name").as("name_a"),
            col("c_mktsegment").as("seg_a"))
        val full = c.select(col("c_custkey").as("b_key"), col("c_name").as("name_b"))
        graft.ops.FuzzyJoin.fuzzyJoinRows(probe, "name_a", full, "name_b", maxDist = 2)
          .where(col("name_a") < col("name_b"))
          .select(col("a_key"), col("name_a"), col("seg_a"),
            col("b_key"), col("name_b"), col("dist"))
          .orderBy(col("name_a"), col("name_b"))
      },
      Some("""WITH probe AS (
             |  SELECT c_custkey AS a_key, c_name AS name_a, c_mktsegment AS seg_a
             |  FROM customer ORDER BY c_name LIMIT 100)
             |SELECT a_key, name_a, seg_a, c_custkey AS b_key, c_name AS name_b,
             |  levenshtein(name_a, c_name) AS dist
             |FROM probe JOIN customer
             |  ON name_a < c_name AND levenshtein(name_a, c_name) <= 2
             |ORDER BY name_a, name_b""".stripMargin)),

    // SCD Type-2 + point-in-time snapshot (ops.Temporal): the events
    // stream becomes a per-user change log, scd2 materializes validity
    // intervals with one per-key window, and the snapshot at
    // min(ts)+15 days is a pure filter. The oracle replays the lead()
    // interval build and the same instant arithmetic — pinning the
    // half-open [valid_from, valid_to) semantics end-to-end.
    Q(
      "q91_scd2_snapshot",
      (s, dir) => {
        val e = graft.Tables.events(s, dir)
        val log = e.groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("value"))
        val hist = graft.ops.Temporal.scd2(log, "user_id", "ts")
        val tRow = e.agg(min(col("ts")).as("__m"))
          .select((col("__m") + expr("INTERVAL 15 DAYS")).as("__t"))
        graft.ops.Temporal.snapshotAt(hist.crossJoin(broadcast(tRow)), col("__t"))
          .select(col("user_id"), col("value"))
          .orderBy(col("user_id"))
      },
      Some("""WITH log AS (
             |  SELECT user_id, ts, max(value) AS value FROM events GROUP BY 1, 2),
             |hist AS (
             |  SELECT user_id, ts AS valid_from,
             |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
             |    value
             |  FROM log),
             |t AS (SELECT min(ts) + INTERVAL 15 DAY AS t0 FROM events)
             |SELECT user_id, value FROM hist, t
             |WHERE valid_from <= t0 AND (valid_to IS NULL OR valid_to > t0)
             |ORDER BY user_id""".stripMargin)),

    // FULL OUTER join — the one join type the inventory lacked: both
    // sides filtered so each has nations the other misses, and the
    // grouped counts ride through null-producing sides. coalesce on
    // the key makes the output key total.
    Q(
      "q58_full_outer",
      (s, dir) => {
        val c = graft.Tables.customer(s, dir)
          .where(col("c_mktsegment") === "BUILDING")
          .groupBy(col("c_nationkey").as("ck")).agg(count(lit(1)).as("n_cust"))
        val su = graft.Tables.supplier(s, dir)
          .where(col("s_acctbal") > 4500)
          .groupBy(col("s_nationkey").as("sk")).agg(count(lit(1)).as("n_supp"))
        c.join(su, col("ck") === col("sk"), "full_outer")
          .select(
            coalesce(col("ck"), col("sk")).as("nationkey"),
            col("n_cust"), col("n_supp"))
          .orderBy(col("nationkey"))
      },
      Some("""WITH c AS (
             |  SELECT c_nationkey AS ck, COUNT(*) AS n_cust FROM customer
             |  WHERE c_mktsegment = 'BUILDING' GROUP BY 1),
             |s AS (
             |  SELECT s_nationkey AS sk, COUNT(*) AS n_supp FROM supplier
             |  WHERE s_acctbal > 4500 GROUP BY 1)
             |SELECT coalesce(ck, sk) AS nationkey, n_cust, n_supp
             |FROM c FULL OUTER JOIN s ON ck = sk
             |ORDER BY nationkey""".stripMargin)),

    // Ranking/distribution window suite: ntile, percent_rank,
    // cume_dist, lag, and a RANGE frame over a day-number sort key
    // (trailing 7-day count: 6 preceding days plus the current one —
    // RANGE -6..current spans exactly 7 calendar days inclusive).
    // The ranked windows order by the UNIQUE
    // o_orderkey — ranking over a tied sort key is engine-arbitrary and
    // can never hash-match; the RANGE frame orders by the tied day
    // number precisely because frames (unlike ranks) are
    // peer-insensitive. lag passes the stored double through untouched
    // (no arithmetic → no float-determinism risk).
    Q(
      "q53_window_suite",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val byKey = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_orderkey"))
        val byDay = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("__day"))
          .rangeBetween(-6, Window.currentRow)
        graft.Tables.orders(s, dir)
          .withColumn("__day", datediff(col("o_orderdate"), lit("1970-01-01")))
          .select(
            col("o_orderkey"), col("o_orderstatus"),
            ntile(4).over(byKey).cast("long").as("quartile"),
            round(percent_rank().over(byKey), 6).as("pct_rank"),
            round(cume_dist().over(byKey), 6).as("cum_dist"),
            lag(col("o_totalprice"), 1).over(byKey).as("prev_price"),
            count(lit(1)).over(byDay).as("trailing_7d"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_orderstatus,
             |  ntile(4) OVER w AS quartile,
             |  round(percent_rank() OVER w, 6) AS pct_rank,
             |  round(cume_dist() OVER w, 6) AS cum_dist,
             |  lag(o_totalprice, 1) OVER w AS prev_price,
             |  count(*) OVER (PARTITION BY o_orderstatus
             |    ORDER BY (CAST(o_orderdate AS DATE) - DATE '1970-01-01')
             |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS trailing_7d
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey)
             |ORDER BY o_orderkey""".stripMargin)),

    // GROUPING SETS — the general form rollup/cube (q16/q37) specialize;
    // grouping() flags distinguish "NULL because aggregated" from data
    // NULLs. Money sums follow the decimal→string emit convention.
    Q(
      "q54_grouping_sets",
      (s, dir) => {
        val o = graft.Tables.orders(s, dir)
        o.groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")), Seq.empty),
          col("o_orderstatus"), col("o_orderpriority"))
          .agg(
            grouping(col("o_orderstatus")).cast("long").as("g_status"),
            grouping(col("o_orderpriority")).cast("long").as("g_priority"),
            count(lit(1)).as("n_orders"),
            sum(dec(col("o_totalprice"))).cast("string").as("sum_price"))
          .orderBy(col("g_status"), col("g_priority"),
            col("o_orderstatus"), col("o_orderpriority"))
      },
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
             |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
             |  COUNT(*) AS n_orders,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS sum_price
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
             |ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority""".stripMargin)),

    // Declarative data-quality validation (Deequ/dbt-tests shape):
    // row predicates fold into one shared scan, uniqueness is a
    // count-distinct, referential integrity a left-anti count. The
    // rule mix includes both passing and failing rules so the gate
    // pins real violation counts, not a wall of zeros.
    Q(
      "q82_validation",
      (s, dir) => {
        import graft.ops.Validation
        import graft.ops.Validation.{ForeignKey, Predicate, Unique}
        Validation.check(graft.Tables.orders(s, dir), Seq(
          Predicate("totalprice_positive", col("o_totalprice") > 0),
          Predicate("totalprice_under_400k", col("o_totalprice") < 400000),
          Predicate("status_open_or_final", col("o_orderstatus").isin("O", "F")),
          Unique("orderkey_unique", Seq("o_orderkey")),
          ForeignKey("custkey_fk", Seq("o_custkey"),
            graft.Tables.customer(s, dir), Seq("c_custkey"))))
          .orderBy(col("rule"))
      },
      Some("""SELECT * FROM (
             |  SELECT 'totalprice_positive' AS rule, count(*) AS n_checked,
             |    CAST(sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_violations
             |  FROM orders
             |  UNION ALL
             |  SELECT 'totalprice_under_400k', count(*),
             |    CAST(sum(CASE WHEN o_totalprice < 400000 THEN 0 ELSE 1 END) AS BIGINT)
             |  FROM orders
             |  UNION ALL
             |  SELECT 'status_open_or_final', count(*),
             |    CAST(sum(CASE WHEN o_orderstatus IN ('O', 'F') THEN 0 ELSE 1 END) AS BIGINT)
             |  FROM orders
             |  UNION ALL
             |  SELECT 'orderkey_unique', count(*),
             |    -- ROW() mirrors Unique's pinned null-safe key equality:
             |    -- a bare count(DISTINCT col) would drop null keys
             |    count(*) - count(DISTINCT ROW(o_orderkey))
             |  FROM orders
             |  UNION ALL
             |  SELECT 'custkey_fk', count(*),
             |    CAST(sum(CASE WHEN o_custkey IN (SELECT c_custkey FROM customer)
             |              THEN 0 ELSE 1 END) AS BIGINT)
             |  FROM orders)
             |ORDER BY rule""".stripMargin))
  )
}
