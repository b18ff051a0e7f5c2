package graft.queries

import graft.{Q, Tables}
import graft.dsl._
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Advanced aggregations: SURVEY.md §2.4 (A4-A14).
  *
  * Scale notes (100 TB): distinct counts run as Spark's two-phase
  * expand+hash aggregate; approx_count_distinct is HLL++ with constant
  * per-group state (the only sane form at 1e12 rows); rollup/cube expand
  * partial aggregates map-side so the shuffle carries pre-combined groups;
  * the typed Aggregator ships a tiny buffer per key, not rows. The
  * flatMapGroups variant (q31) exists for API coverage — its window twin
  * (q22) is the plan you'd run at scale because it keeps codegen.
  */
object Aggs extends Q.Module {

  // --- q23: exact distinct counts. Ops: A4.
  private val q23 = Q(
    "q23_agg_distinct",
    "A4 nunique: exact distinct counts, grouped + multi-distinct",
    (s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_suppkey")).as("n_suppliers"),
          countDistinct(col("l_partkey"), col("l_suppkey")).as("n_part_supp"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
      COUNT(DISTINCT l_orderkey) AS n_orders,
      COUNT(DISTINCT l_suppkey) AS n_suppliers,
      COUNT(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // --- q24: approximate distinct (HLL++). Ops: A5. The sketch estimate is
  //     engine-specific, so no DuckDB oracle — driver records rows>0.
  private val q24 = Q(
    "q24_agg_approx_distinct",
    "A5 nunique_approx: HyperLogLog++ distinct per group (no oracle: sketch)",
    (s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_linestatus"))
        .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_linestatus"))
    },
    None)

  // --- q25: value_counts / frequencies. Ops: A6, A14.
  private val q25 = Q(
    "q25_agg_value_counts",
    "A6/A14 value_counts: frequency table ordered by count desc",
    (s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS cnt FROM orders
    GROUP BY o_orderpriority ORDER BY cnt DESC, o_orderpriority"""))

  // --- q26: quantiles/median. Ops: A9. Exact percentile with linear
  //     interpolation matches DuckDB quantile_cont on integral doubles.
  //     LIMIT: the builtin exact `percentile` buffers an OpenHashMap of
  //     DISTINCT (value, count) pairs per group — safe here ONLY because
  //     l_quantity's value domain is ~50 integral values, so the buffer
  //     is bounded regardless of corpus size. On a continuous/near-unique
  //     column (prices, floats) distinct ≈ rows and this becomes the
  //     unbounded-buffer trap; use the distributed value-histogram rank
  //     instead — q150 (global) / q153 (per group) are the scale forms.
  private val q26 = Q(
    "q26_agg_quantile",
    "A9 quantile: exact percentiles + median of l_quantity per returnflag",
    (s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.25)").as("p25"),
          expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.75)").as("p75"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
      quantile_cont(l_quantity, 0.25) AS p25,
      quantile_cont(l_quantity, 0.5) AS p50,
      quantile_cont(l_quantity, 0.75) AS p75
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // --- q27: dispersion + correlation from exact moment sums. Ops: A1, A10.
  // Stats surface as values rounded to fixed decimals ON BOTH ENGINES:
  // the moment sums are exact decimals, but once a sum's scaled integer
  // exceeds 2^53 (price² sums do at sf0.1 — ~6e21 micro-units) the
  // decimal→double cast itself rounds, and Spark (BigDecimal, correctly
  // rounded) vs DuckDB (int128→double, then scale divide) can land 1 ulp
  // apart — the cross-SF sweep caught exactly that in corr's hidden
  // stddev(price) factor. Rounding well inside the agreeing digits makes
  // the comparison scale-independent (q80's established pattern); the
  // retained digits are still ~9 significant.
  private val q27 = Q(
    "q27_agg_stats",
    "A1/A10 std/var/corr/cov via deterministic decimal moment sums",
    (s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_linestatus"))
        .agg(
          round(dvar(col("l_quantity")), 6).as("var_qty"),
          round(dstddev(col("l_quantity")), 6).as("std_qty"),
          round(dcov(col("l_quantity"), col("l_extendedprice")), 6).as("cov_qty_price"),
          round(dcov(col("l_quantity"), col("l_extendedprice"))
            / (dstddev(col("l_quantity")) * dstddev(col("l_extendedprice"))), 12).as("corr_qty_price"))
        .orderBy(col("l_linestatus"))
    },
    Some(s"""SELECT l_linestatus,
      ROUND(${dvarSql("l_quantity")}, 6) AS var_qty,
      ROUND(${dstddevSql("l_quantity")}, 6) AS std_qty,
      ROUND(${dcovSql("l_quantity", "l_extendedprice")}, 6) AS cov_qty_price,
      ROUND((${dcovSql("l_quantity", "l_extendedprice")}
        / (${dstddevSql("l_quantity")} * ${dstddevSql("l_extendedprice")})), 12) AS corr_qty_price
    FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"""))

  // --- q28: rollup with grouping indicators. Ops: A11.
  private val q28 = Q(
    "q28_agg_rollup",
    "A11 rollup: year × mktsegment revenue with subtotal rows",
    (s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .withColumn("yr", year(col("o_orderdate")))
        .rollup(col("yr"), col("c_mktsegment"))
        .agg(dsum(col("o_totalprice")).as("revenue"),
          grouping(col("yr")).as("g_yr"),
          grouping(col("c_mktsegment")).as("g_seg"))
        .orderBy(col("g_yr"), col("g_seg"), col("yr"), col("c_mktsegment"))
    },
    Some(s"""SELECT CAST(year(o_orderdate) AS INT) AS yr, c_mktsegment,
      ${dsumSql("o_totalprice")} AS revenue,
      CAST(GROUPING(yr) AS TINYINT) AS g_yr,
      CAST(GROUPING(c_mktsegment) AS TINYINT) AS g_seg
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY ROLLUP(yr, c_mktsegment)
    ORDER BY g_yr, g_seg, yr, c_mktsegment"""))

  // --- q29: cube. Ops: A11.
  private val q29 = Q(
    "q29_agg_cube",
    "A11 cube: returnflag × linestatus counts over all subtotal combos",
    (s, d) => {
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"),
          grouping(col("l_returnflag")).as("g_rf"),
          grouping(col("l_linestatus")).as("g_ls"))
        .orderBy(col("g_rf"), col("g_ls"), col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
      CAST(GROUPING(l_returnflag) AS TINYINT) AS g_rf,
      CAST(GROUPING(l_linestatus) AS TINYINT) AS g_ls
    FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    ORDER BY g_rf, g_ls, l_returnflag, l_linestatus"""))

  // --- q30: deduplication, deterministic "keep first by explicit order".
  //     Ops: A8. (`dropDuplicates(keys)` keeps an arbitrary row — the
  //     row_number idiom is the deterministic, oracle-checkable form.)
  private val q30 = Q(
    "q30_dedup_first_per_key",
    "A8 drop_duplicates: earliest order per customer (deterministic keep)",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        .orderBy(col("o_custkey"))
    },
    Some("""SELECT o_custkey, o_orderkey, o_orderdate FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
        ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders) WHERE rn = 1
    ORDER BY o_custkey"""))

  // --- q31: exact-duplicate removal on a projection. Ops: A8.
  private val q31 = Q(
    "q31_dedup_distinct_rows",
    "A8 distinct(): exact duplicate row removal on a projection",
    (s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderstatus"), col("o_orderpriority"))
        .distinct()
        .orderBy(col("o_orderstatus"), col("o_orderpriority"))
    },
    Some("""SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    ORDER BY o_orderstatus, o_orderpriority"""))

  // --- q32: describe/summary equivalent from explicit aggs. Ops: A3, A7.
  private val q32 = Q(
    "q32_agg_describe",
    "A7 describe: global count/mean/std/min/max for two measures",
    (s, d) => {
      Tables.lineitem(s, d).agg(
        count(lit(1)).as("n"),
        dmean(col("l_quantity")).as("mean_qty"),
        dstddev(col("l_quantity")).as("std_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        dmean(col("l_extendedprice")).as("mean_price"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))
    },
    Some(s"""SELECT COUNT(*) AS n,
      ${dmeanSql("l_quantity")} AS mean_qty,
      ${dstddevSql("l_quantity")} AS std_qty,
      MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
      ${dmeanSql("l_extendedprice")} AS mean_price,
      MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price
    FROM lineitem"""))

  // --- q33: arbitrary per-group function via the typed API. Ops: A12.
  //     Per-customer order-date span + spend, computed in flatMapGroups.
  private val q33 = Q(
    "q33_typed_flatmapgroups",
    "A12 groupby.apply: per-group fn via groupByKey.flatMapGroups",
    (s, d) => {
      import s.implicits._
      val rows = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("timestamp").cast("long").as("ots"),
          col("o_totalprice").cast(Money).as("price"))
        .as[(Long, Long, Long, BigDecimal)]
      rows.groupByKey(_._1)
        .flatMapGroups { (k, it) =>
          var n = 0L; var lo = Long.MaxValue; var hi = Long.MinValue
          var spend = BigDecimal(0)
          it.foreach { case (_, _, ts, p) =>
            n += 1; if (ts < lo) lo = ts; if (ts > hi) hi = ts; spend += p
          }
          Iterator((k, n, (hi - lo) / 86400, spend.doubleValue))
        }
        .toDF("o_custkey", "n_orders", "span_days", "total_spend")
        .orderBy(col("o_custkey"))
    },
    Some(s"""SELECT o_custkey, COUNT(*) AS n_orders,
      CAST((CAST(epoch(MAX(o_orderdate)) AS BIGINT) - CAST(epoch(MIN(o_orderdate)) AS BIGINT)) / 86400
        AS BIGINT) AS span_days,
      ${dsumSql("o_totalprice")} AS total_spend
    FROM orders GROUP BY o_custkey ORDER BY o_custkey"""))

  // --- q34: custom typed Aggregator (foldby-style reduction). Ops: A13.
  //     Discount-weighted mean price per ship mode from a single buffer.
  private val q34 = Q(
    "q34_typed_aggregator",
    "A13 foldby: custom Aggregator[IN,BUF,OUT] weighted mean",
    (s, d) => {
      import s.implicits._
      // (sum(price_cents*disc_cents), sum(disc_cents)) folded per partition
      // and merged exactly in Long — same tree-reduction shape as Dask
      // foldby. Integer cents (prices/discounts carry ≤2 true decimals)
      // keep every intermediate exactly representable, so the single final
      // double division is bit-identical in any engine. A decimal-sum →
      // CAST(AS DOUBLE) ratio is NOT: DuckDB's wide-decimal→double cast
      // rounds twice and drifts 1 ulp from Java's correctly-rounded one.
      val wmean = new Aggregator[(Long, Long), (Long, Long), Double] {
        def zero = (0L, 0L)
        def reduce(b: (Long, Long), a: (Long, Long)) =
          (b._1 + a._1 * a._2, b._2 + a._2)
        def merge(x: (Long, Long), y: (Long, Long)) =
          (x._1 + y._1, x._2 + y._2)
        def finish(b: (Long, Long)) =
          if (b._2 == 0) 0.0 else b._1.toDouble / (100.0 * b._2.toDouble)
        def bufferEncoder = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
        def outputEncoder = Encoders.scalaDouble
      }
      val cents: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        c => (c.cast("decimal(18,2)") * lit(100)).cast("long")
      val rows = Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          cents(col("l_extendedprice")).as("pc"),
          cents(col("l_discount")).as("dc"))
        .as[(String, Long, Long)]
      rows.groupByKey(_._1)
        .mapValues(r => (r._2, r._3))
        .agg(wmean.toColumn.name("wmean_price"))
        .toDF("l_returnflag", "wmean_price")
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
      CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             * CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE)
        / (100.0 * CAST(SUM(CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE))
        AS wmean_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // --- q107: grouped CO-processing of two frames — Dask/pandas per-key
  //     apply over two aligned frames (train/test alignment, order-vs-
  //     items reconciliation), Spark's `Dataset.groupByKey.cogroup`.
  //     Ops: A12/§2.10. Each side is FILTERED differently so keys appear
  //     left-only, right-only, and both — the full-outer semantics
  //     cogroup gives for free (an orderkey absent from one side arrives
  //     as an empty iterator). Per-side sums fold in BigDecimal over the
  //     decimal(18,6)-cast values (exact, order-independent — the
  //     iterator order inside a cogroup bucket is not deterministic),
  //     with one correctly-rounded toDouble at the end: the q33/dsl
  //     cross-engine money rule. Scale: cogroup plans one shuffle per
  //     side on the key + a co-partitioned sort-based group-walk; per-key
  //     state is that key's rows only (≤ a few line items per order), and
  //     the output is one row per key — never a driver collect.
  private val q107 = Q(
    "q107_cogroup",
    "A12 ✦ cogroup: per-orderkey co-processing of two filtered frames",
    (s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d)
        .filter(year(col("o_orderdate")) === 1995)
        .select(col("o_orderkey"), col("o_totalprice").cast(Money))
        .as[(Long, BigDecimal)]
      val l = Tables.lineitem(s, d)
        .filter(col("l_quantity") >= 30)
        .select(col("l_orderkey"), col("l_extendedprice").cast(Money))
        .as[(Long, BigDecimal)]
      o.groupByKey(_._1).cogroup(l.groupByKey(_._1)) { (k, os, ls) =>
        var no = 0L; var so = BigDecimal(0)
        os.foreach { r => no += 1; so += r._2 }
        var nl = 0L; var sl = BigDecimal(0)
        ls.foreach { r => nl += 1; sl += r._2 }
        Iterator((k, no, so.doubleValue, nl, sl.doubleValue))
      }.toDF("orderkey", "n_orders", "orders_total", "n_items", "items_total")
        .orderBy(col("orderkey"))
    },
    Some(s"""WITH o AS (SELECT o_orderkey AS k, COUNT(*) AS n_orders,
        ${dsumSql("o_totalprice")} AS orders_total
      FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1),
    l AS (SELECT l_orderkey AS k, COUNT(*) AS n_items,
        ${dsumSql("l_extendedprice")} AS items_total
      FROM lineitem WHERE l_quantity >= 30 GROUP BY 1)
    SELECT COALESCE(o.k, l.k) AS orderkey,
      COALESCE(n_orders, 0) AS n_orders,
      COALESCE(orders_total, 0.0) AS orders_total,
      COALESCE(n_items, 0) AS n_items,
      COALESCE(items_total, 0.0) AS items_total
    FROM o FULL OUTER JOIN l ON o.k = l.k ORDER BY orderkey"""))

  // --- q79: approximate quantiles via the GK sketch (approx_percentile)
  //     — the scale path beside q26's exact interpolated quantile, and the
  //     semantics the reference's default (t-digest-style approximate
  //     quantile) actually has. Sketch internals are engine-specific → no
  //     oracle (driver rows-only check), but the sanity bound — approx
  //     within max-min of exact — is asserted in the result itself.
  private val q79 = Q(
    "q79_agg_approx_quantile",
    "A9 approx quantile: GK sketch p50/p95 per returnflag (no oracle: sketch)",
    (s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50_approx"),
          percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000)).as("p95_approx"),
          min(col("l_extendedprice")).as("lo"),
          max(col("l_extendedprice")).as("hi"))
        .withColumn("sane",
          col("p50_approx").between(col("lo"), col("hi")) &&
            col("p95_approx").between(col("p50_approx"), col("hi")))
        .orderBy(col("l_returnflag"))
    },
    None)

  // --- q121: GROUPBY.TRANSFORM — pandas/Dask `groupby().transform()`:
  //     a per-group statistic joined back onto every row (z-score here),
  //     the normalize-within-group idiom. Shape: one grouped aggregate +
  //     a join back on the group key — Catalyst broadcasts the
  //     aggregate-sized stats frame at fixture scale; at 1e9 groups the
  //     same plan is a co-partitioned shuffle join, which is still the
  //     right shape (never a window sort over the fact table for an
  //     unbounded frame).
  //     Exactness: z is SCALE-INVARIANT, so it is computed over exact
  //     integer price CENTS — sums of cents and cents² are exact longs
  //     (identical in both engines; dsl's decimal path is NOT usable
  //     here: totalprice² ≈ 3e11 has double ulp > 1e-6, and the
  //     double→decimal(30,6) cast of such values rounds differently
  //     across engines — shortest-repr vs exact-binary). Every remaining
  //     op (long→double casts, one fixed formula, sqrt) is correctly
  //     rounded from identical inputs. Guards make the result total:
  //     n>=2 (a lone order has no sample std) and sigma>0, spelled
  //     identically on both sides so the row set matches exactly.
  //     The cents² SUM runs in decimal(38,0) (q131's idiom): each product
  //     fits a LONG but the per-group sum crosses 2^63 around 2.5e3
  //     rows·(6e7 cents)² — Spark under ANSI would error where DuckDB
  //     silently widens to HUGEINT. Both engines cast their exact integer
  //     sum to double with one correctly-rounded op, so the hash match
  //     survives any group size (OperatorPropertySpec pins a >2^63 case).
  private val q121 = Q(
    "q121_group_transform_zscore",
    "A12 groupby.transform: per-customer z-score joined back to rows",
    (s, d) => {
      val cents = (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
      val o = Tables.orders(s, d).withColumn("cents", cents)
      val stats = o.groupBy(col("o_custkey"))
        .agg(sum(col("cents")).cast("double").as("sx"),
          sum((col("cents") * col("cents")).cast("decimal(38,0)"))
            .cast("double").as("sxx"),
          count(lit(1)).cast("double").as("n"))
        .select(col("o_custkey"), (col("sx") / col("n")).as("mu"),
          sqrt((col("sxx") - col("sx") * col("sx") / col("n"))
            / (col("n") - lit(1.0))).as("sigma"), col("n"))
        .filter(col("n") >= 2 && col("sigma") > 0)
      o.join(stats, Seq("o_custkey"))
        .select(col("o_orderkey"), col("o_custkey"),
          ((col("cents") - col("mu")) / col("sigma")).as("z"))
        .orderBy(col("o_orderkey"))
    },
    Some("""WITH c AS (SELECT o_orderkey, o_custkey,
        CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders),
    raw AS (SELECT o_custkey,
        CAST(SUM(cents) AS DOUBLE) AS sx,
        CAST(SUM(cents * cents) AS DOUBLE) AS sxx,
        CAST(COUNT(*) AS DOUBLE) AS n
      FROM c GROUP BY o_custkey),
    stats AS (SELECT o_custkey, sx / n AS mu,
        SQRT((sxx - sx * sx / n) / (n - 1.0)) AS sigma, n
      FROM raw)
    SELECT o_orderkey, c.o_custkey AS o_custkey,
      (cents - mu) / sigma AS z
    FROM c JOIN stats USING(o_custkey)
    WHERE n >= 2 AND sigma > 0
    ORDER BY o_orderkey"""))

  // --- q122: DROP_DUPLICATES(keep='last') — q30 keeps the FIRST row per
  //     key via a window sort; keep='last' here deliberately takes the
  //     OTHER physical path: max_by over a composite integer comparator
  //     (q68's idiom — epoch days scaled past the key range, orderkey as
  //     tie-break) compiles to a two-phase HashAggregate with map-side
  //     partial max_by — no Exchange+Sort+Window, and at 100 TB the
  //     map-side combine collapses each partition to one row per key
  //     before the shuffle. This is the plan drop_duplicates SHOULD run
  //     when only the kept row (not a rank) is needed.
  private val q122 = Q(
    "q122_dedup_keep_last",
    "A8 drop_duplicates(keep='last'): latest order per customer via max_by",
    (s, d) => {
      val cmp = datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
        .multiply(lit(10000000L)) + col("o_orderkey")
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(max_by(col("o_orderkey"), cmp).as("o_orderkey"),
          max_by(col("o_orderdate"), cmp).as("o_orderdate"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("o_custkey"))
    },
    Some("""SELECT o_custkey,
      arg_max(o_orderkey, date_diff('day', DATE '1970-01-01', o_orderdate) * 10000000 + o_orderkey) AS o_orderkey,
      arg_max(o_orderdate, date_diff('day', DATE '1970-01-01', o_orderdate) * 10000000 + o_orderkey) AS o_orderdate,
      COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey ORDER BY o_custkey"""))

  // --- q126: MERGEABLE SKETCHES — the property that makes approximate
  //     aggregation work at 100 TB: per-shard HLL sketches (here one per
  //     event_type) are UNIONED into the corpus-wide distinct estimate
  //     without ever rescanning the raw data — the incremental pattern
  //     (daily shard → sketch → union with yesterday's) that q24's
  //     one-shot approx_count_distinct cannot express. HLL union is
  //     register-wise max, so the union of sub-sketches over a partition
  //     of the data IS the global sketch: the query carries that
  //     self-check in-result (`merge_equals_global` must be true, and
  //     the driver's rows-only gate plus `SketchMergeSpec`-style
  //     assertions in CurationGateSpec pin it). No oracle: sketch
  //     internals are engine-specific (q24's category).
  private val q126 = Q(
    "q126_hll_mergeable",
    "A5 ✦ mergeable HLL sketches: per-shard union == global (no oracle: sketch)",
    (s, d) => {
      val e = Tables.events(s, d)
      val perShard = e.groupBy(col("event_type"))
        .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      val merged = perShard
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("merged_estimate"))
      val global = e.agg(
        expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("global_estimate"),
        countDistinct(col("user_id")).as("exact_distinct"))
      merged.crossJoin(global)
        .withColumn("merge_equals_global",
          col("merged_estimate") === col("global_estimate"))
    },
    None)

  // --- q130: DATA-PROFILING REPORT — per-column rows / nulls / distinct
  //     count / min / max / top value in ONE pass, the deequ/dbt-style
  //     quality report run before any pipeline trusts a new dataset.
  //     Values profile as strings so heterogeneous columns share one
  //     long-format frame (q69's melt idiom); a null is injected into
  //     `segment` via nullif so the null accounting is non-vacuous.
  //     Shape: explode ×ncols, one shuffle to (column, value) counts
  //     with map-side combine, then column-level rollup + a broadcast
  //     join of the rank-1 top values (deterministic tie-break: count
  //     desc, value asc). At 100 TB the exact per-column distinct is the
  //     expensive part — the sketch variant swaps the (col, val) count
  //     frame for per-column HLLs (q126's mergeable path), same shape.
  private val q130 = Q(
    "q130_profile",
    "A3/A7 ✦ one-pass per-column profiling: rows/nulls/distinct/min/max/top",
    (s, d) => {
      val long = Tables.customer(s, d).select(explode(array(
          struct(lit("c_custkey").as("col_name"),
            col("c_custkey").cast("string").as("val")),
          struct(lit("c_name").as("col_name"), col("c_name").as("val")),
          struct(lit("c_nationkey").as("col_name"),
            col("c_nationkey").cast("string").as("val")),
          struct(lit("segment").as("col_name"),
            expr("nullif(c_mktsegment, 'BUILDING')").as("val")))).as("u"))
        .select(col("u.col_name").as("col_name"), col("u.val").as("val"))
      val vc = long.groupBy(col("col_name"), col("val"))
        .agg(count(lit(1)).as("n"))
      val top = vc.filter(col("val").isNotNull)
        .withColumn("rk", row_number().over(Window.partitionBy(col("col_name"))
          .orderBy(col("n").desc, col("val"))))
        .filter(col("rk") === 1)
        .select(col("col_name"), col("val").as("top_value"), col("n").as("top_n"))
      vc.groupBy(col("col_name"))
        .agg(sum(col("n")).as("n_rows"),
          coalesce(sum(when(col("val").isNull, col("n"))), lit(0L)).as("n_nulls"),
          count(when(col("val").isNotNull, lit(1))).as("n_distinct"),
          min(col("val")).as("min_val"), max(col("val")).as("max_val"))
        .join(broadcast(top), Seq("col_name"))
        .orderBy(col("col_name"))
    },
    Some("""WITH long AS (
      SELECT u.col_name, u.val FROM customer, LATERAL (VALUES
        ('c_custkey', CAST(c_custkey AS VARCHAR)),
        ('c_name', c_name),
        ('c_nationkey', CAST(c_nationkey AS VARCHAR)),
        ('segment', NULLIF(c_mktsegment, 'BUILDING'))) u(col_name, val)),
    vc AS (SELECT col_name, val, COUNT(*) AS n FROM long GROUP BY 1, 2),
    top AS (SELECT col_name, val AS top_value, n AS top_n,
        ROW_NUMBER() OVER (PARTITION BY col_name
          ORDER BY n DESC, val ASC) AS rk
      FROM vc WHERE val IS NOT NULL)
    SELECT v.col_name AS col_name,
      CAST(SUM(n) AS BIGINT) AS n_rows,
      CAST(COALESCE(SUM(CASE WHEN val IS NULL THEN n END), 0) AS BIGINT) AS n_nulls,
      COUNT(CASE WHEN val IS NOT NULL THEN 1 END) AS n_distinct,
      MIN(val) AS min_val, MAX(val) AS max_val,
      ANY_VALUE(t.top_value) AS top_value,
      CAST(ANY_VALUE(t.top_n) AS BIGINT) AS top_n
    FROM vc v JOIN (SELECT * FROM top WHERE rk = 1) t USING (col_name)
    GROUP BY v.col_name ORDER BY col_name"""))

  // --- q150: QUANTILE BINNING (pandas `qcut`) — q132 covers `cut` with
  //     explicit edges; qcut derives the edges FROM the data (quartiles
  //     here), the equal-population binning analysts reach for first.
  //     The builtin exact `percentile` is deliberately NOT used for the
  //     edges: it buffers DISTINCT (value, count) pairs in ONE
  //     aggregation buffer — for a near-unique column like prices,
  //     distinct ≈ rows, i.e. the global-collect trap at 100 TB (q26's
  //     LIMIT note is the bounded-domain case where the builtin is
  //     fine). Instead the edges come from a
  //     distributed VALUE HISTOGRAM: group by the integer cents value
  //     (shuffle bounded by the VALUE DOMAIN, not the row count, with
  //     map-side combine), then the q135 two-phase cumulative rank over
  //     the histogram (per-block partials + a tiny offsets window), then
  //     value-at-rank selection and the explicit linear interpolation
  //     q = lo + frac·(hi − lo) — which the oracle spells IDENTICALLY
  //     over its own histogram, so exactness never depends on matching
  //     some builtin's internal interpolation. All ranks are integers;
  //     lo/hi are integer cents; frac = (n−1)p − floor((n−1)p) is the
  //     same double in both engines. Edges fold back as a broadcast
  //     1-row frame (no driver scalar); bin = 1 + #edges exceeded
  //     (q132's counted-comparison idiom). Per-bin counts in the output
  //     make the equal-population property visible.
  //     pandas `duplicates` parity: on degenerate distributions quantile
  //     edges COINCIDE (constant column → e1=e2=e3). pandas' default
  //     raises ValueError; duplicates='drop' merges the bins. This takes
  //     the drop-like path without raising: every coincident edge's
  //     `cents > edge` test fails together, upper bins come out EMPTY
  //     (absent from the grouped output), and the surviving bins form
  //     pandas' merged partition under the original 1-based labels
  //     (PandasParitySpec pins the constant-column single-bin result).
  private val q150 = Q(
    "q150_qcut",
    "A1/A9 pandas.qcut: histogram-derived quartile edges, per-bin stats",
    (s, d) => {
      val cents = (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
      val o = Tables.orders(s, d).withColumn("cents", cents)
      // distributed exact ranks: value histogram + two-phase cumsum
      val vc = o.groupBy(col("cents")).agg(count(lit(1)).as("cnt"))
        .withColumn("block", expr("cents div 1048576"))
      val wB = Window.orderBy(col("block"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val off = vc.groupBy(col("block")).agg(sum(col("cnt")).as("bn"))
        .withColumn("boff", sum(col("bn")).over(wB) - col("bn"))
        .select(col("block"), col("boff"))
      val wIn = Window.partitionBy(col("block")).orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = vc.join(broadcast(off), Seq("block"))
        .withColumn("cumend", col("boff") + sum(col("cnt")).over(wIn))
        .select(col("cents"), col("cumend"))
      // n from the histogram, not a second corpus scan
      val nF = vc.agg(sum(col("cnt")).as("n"))
      val ks = nF.select(explode(array(lit(0.25), lit(0.5), lit(0.75))).as("p"),
          col("n"))
        .select(col("p"),
          (floor((col("n") - 1) * col("p")).cast("long") + 1).as("klo"),
          ((col("n") - 1) * col("p") - floor((col("n") - 1) * col("p")))
            .as("frac"))
      val qq = cum.crossJoin(broadcast(ks))
        .groupBy(col("p"), col("frac"))
        .agg(min(when(col("cumend") >= col("klo"), col("cents"))).as("lo_v"),
          min(when(col("cumend") >= col("klo") + 1, col("cents"))).as("hi_v"))
        .select(col("p"),
          (col("lo_v") + col("frac")
            * (coalesce(col("hi_v"), col("lo_v")) - col("lo_v"))).as("qval"))
      val edges = qq.agg(
        max(when(col("p") === 0.25, col("qval"))).as("e1"),
        max(when(col("p") === 0.5, col("qval"))).as("e2"),
        max(when(col("p") === 0.75, col("qval"))).as("e3"))
      o.crossJoin(broadcast(edges))
        .withColumn("bin",
          (lit(1) + when(col("cents") > col("e1"), 1).otherwise(0)
            + when(col("cents") > col("e2"), 1).otherwise(0)
            + when(col("cents") > col("e3"), 1).otherwise(0)).cast("long"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("bin"))
    },
    Some(s"""WITH c AS (SELECT o_totalprice,
        CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders),
    vc AS (SELECT cents, COUNT(*) AS cnt FROM c GROUP BY cents),
    cum AS (SELECT cents, CAST(SUM(cnt) OVER (ORDER BY cents) AS BIGINT)
        AS cumend FROM vc),
    nn AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM vc),
    ks AS (SELECT p, CAST(floor((n - 1) * p) AS BIGINT) + 1 AS klo,
        (n - 1) * p - floor((n - 1) * p) AS frac
      FROM (SELECT unnest([0.25, 0.5, 0.75]) AS p) t, nn),
    qq AS (SELECT p, frac,
        MIN(CASE WHEN cumend >= klo THEN cents END) AS lo_v,
        MIN(CASE WHEN cumend >= klo + 1 THEN cents END) AS hi_v
      FROM cum, ks GROUP BY p, frac),
    e AS (SELECT
        MAX(CASE WHEN p = 0.25 THEN lo_v + frac * (COALESCE(hi_v, lo_v) - lo_v) END) AS e1,
        MAX(CASE WHEN p = 0.5 THEN lo_v + frac * (COALESCE(hi_v, lo_v) - lo_v) END) AS e2,
        MAX(CASE WHEN p = 0.75 THEN lo_v + frac * (COALESCE(hi_v, lo_v) - lo_v) END) AS e3
      FROM qq),
    b AS (SELECT o_totalprice,
        1 + CASE WHEN cents > e1 THEN 1 ELSE 0 END
          + CASE WHEN cents > e2 THEN 1 ELSE 0 END
          + CASE WHEN cents > e3 THEN 1 ELSE 0 END AS bin
      FROM c, e)
    SELECT CAST(bin AS BIGINT) AS bin, COUNT(*) AS n,
      MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
      ${dsumSql("o_totalprice")} AS total
    FROM b GROUP BY bin ORDER BY bin"""))

  // --- q153: GROUPED QUANTILES AT SCALE (pandas `groupby.quantile`) —
  //     q26's surface on a CONTINUOUS column (o_totalprice: near-unique,
  //     so the builtin `percentile`'s distinct-value buffer would grow
  //     with the corpus — its LIMIT note). This is q150's value-histogram
  //     rank with the group key threaded through every stage: histogram
  //     on (grp, cents) — shuffle bounded by groups × value domain, with
  //     map-side combine — then the two-phase cumulative rank per group
  //     (per-(grp,block) partials + an offsets window over the
  //     blocks-per-group frame; every window partition is bounded by the
  //     2^20-cent block span, never by group row count), then per-group
  //     value-at-rank selection with the SAME explicit interpolation
  //     spelled in the oracle. All ranks and cents are integers; the
  //     single /100.0 at the end is one identical double op per engine.
  //     High-cardinality groups cost nothing extra: every stage is keyed
  //     by (grp, ...) — no per-group loop, no driver state.
  private val q153 = Q(
    "q153_groupby_quantile",
    "A9✦ groupby.quantile on a continuous column via per-group histogram rank",
    (s, d) => {
      val cents = (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
      val o = Tables.orders(s, d)
        .select(col("o_orderpriority"), cents.as("cents"))
      val vc = o.groupBy(col("o_orderpriority"), col("cents"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("block", expr("cents div 1048576"))
      val wB = Window.partitionBy(col("o_orderpriority")).orderBy(col("block"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val off = vc.groupBy(col("o_orderpriority"), col("block"))
        .agg(sum(col("cnt")).as("bn"))
        .withColumn("boff", sum(col("bn")).over(wB) - col("bn"))
        .select(col("o_orderpriority"), col("block"), col("boff"))
      val wIn = Window.partitionBy(col("o_orderpriority"), col("block"))
        .orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = vc.join(broadcast(off), Seq("o_orderpriority", "block"))
        .withColumn("cumend", col("boff") + sum(col("cnt")).over(wIn))
        .select(col("o_orderpriority"), col("cents"), col("cumend"))
      val ks = vc.groupBy(col("o_orderpriority")).agg(sum(col("cnt")).as("n"))
        .select(col("o_orderpriority"),
          explode(array(lit(0.25), lit(0.5), lit(0.75))).as("p"), col("n"))
        .select(col("o_orderpriority"), col("p"),
          (floor((col("n") - 1) * col("p")).cast("long") + 1).as("klo"),
          ((col("n") - 1) * col("p") - floor((col("n") - 1) * col("p")))
            .as("frac"))
      cum.join(broadcast(ks), Seq("o_orderpriority"))
        .groupBy(col("o_orderpriority"), col("p"), col("frac"))
        .agg(min(when(col("cumend") >= col("klo"), col("cents"))).as("lo_v"),
          min(when(col("cumend") >= col("klo") + 1, col("cents"))).as("hi_v"))
        .select(col("o_orderpriority"), col("p"),
          ((col("lo_v") + col("frac")
            * (coalesce(col("hi_v"), col("lo_v")) - col("lo_v"))) / 100.0)
            .as("quantile"))
        .orderBy(col("o_orderpriority"), col("p"))
    },
    Some("""WITH c AS (SELECT o_orderpriority,
        CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders),
    vc AS (SELECT o_orderpriority, cents, COUNT(*) AS cnt
      FROM c GROUP BY o_orderpriority, cents),
    cum AS (SELECT o_orderpriority, cents,
        CAST(SUM(cnt) OVER (PARTITION BY o_orderpriority ORDER BY cents)
          AS BIGINT) AS cumend
      FROM vc),
    nn AS (SELECT o_orderpriority, CAST(SUM(cnt) AS BIGINT) AS n
      FROM vc GROUP BY o_orderpriority),
    ks AS (SELECT o_orderpriority, p,
        CAST(floor((n - 1) * p) AS BIGINT) + 1 AS klo,
        (n - 1) * p - floor((n - 1) * p) AS frac
      FROM (SELECT unnest([0.25, 0.5, 0.75]) AS p) t, nn),
    qq AS (SELECT cum.o_orderpriority, p, frac,
        MIN(CASE WHEN cumend >= klo THEN cents END) AS lo_v,
        MIN(CASE WHEN cumend >= klo + 1 THEN cents END) AS hi_v
      FROM cum JOIN ks ON cum.o_orderpriority = ks.o_orderpriority
      GROUP BY cum.o_orderpriority, p, frac)
    SELECT o_orderpriority, p,
      (lo_v + frac * (COALESCE(hi_v, lo_v) - lo_v)) / 100.0 AS quantile
    FROM qq ORDER BY o_orderpriority, p"""))

  // --- q131: A/B EXPERIMENT READOUT — deterministic variant assignment
  //     (q102's multiplicative-hash idiom: reproducible across engines,
  //     runs, and retries — the property an experiment system needs) and
  //     a Welch's t-statistic computed from EXACT integer-cents moment
  //     sums (q121's idiom: totalprice² exceeds the engine-stable range
  //     of the decimal path, integer sums are identically rounded
  //     everywhere). Shape: one scan, one two-group aggregate, one tiny
  //     self-join of the 2-row stats frame — the readout never reshuffles
  //     the fact table.
  private val q131 = Q(
    "q131_ab_test",
    "✦ A/B readout: hash-assigned variants, Welch t from exact moments",
    (s, d) => {
      val cents = (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
      val stats = Tables.orders(s, d)
        .select(when(hashMod(col("o_orderkey"), 100) < 50, "A")
          .otherwise("B").as("variant"), cents.as("cents"))
        .groupBy(col("variant"))
        .agg(count(lit(1)).cast("double").as("n"),
          sum(col("cents")).cast("double").as("sx"),
          // each cents² fits a LONG (≤ ~2.5e15) but the SUM does not at
          // sf0.1 (75k rows × 2e15 ≈ 1.5e20): sum in decimal, exactly —
          // DuckDB is safe without this only because SUM(BIGINT) widens
          // to HUGEINT. Caught by the cross-SF sweep (ANSI overflow).
          sum((col("cents") * col("cents")).cast("decimal(38,0)"))
            .cast("double").as("sxx"))
        .select(col("variant"), col("n"), (col("sx") / col("n")).as("mu"),
          ((col("sxx") - col("sx") * col("sx") / col("n"))
            / (col("n") - lit(1.0))).as("variance"))
      val a = stats.filter(col("variant") === "A")
        .select(col("n").as("n_a"), col("mu").as("mean_a"), col("variance").as("var_a"))
      val b = stats.filter(col("variant") === "B")
        .select(col("n").as("n_b"), col("mu").as("mean_b"), col("variance").as("var_b"))
      a.crossJoin(b)
        .select(col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"),
          (col("mean_a") / 100.0).as("mean_a"), (col("mean_b") / 100.0).as("mean_b"),
          ((col("mean_a") - col("mean_b"))
            / sqrt(col("var_a") / col("n_a") + col("var_b") / col("n_b"))).as("t_stat"))
    },
    Some("""WITH t AS (SELECT
        CASE WHEN (CAST(o_orderkey AS HUGEINT) * 2654435761) % 100 < 50 THEN 'A' ELSE 'B' END AS variant,
        CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders),
    stats AS (SELECT variant,
        CAST(COUNT(*) AS DOUBLE) AS n,
        CAST(SUM(cents) AS DOUBLE) AS sx,
        CAST(SUM(cents * cents) AS DOUBLE) AS sxx
      FROM t GROUP BY variant),
    m AS (SELECT variant, n, sx / n AS mu,
        (sxx - sx * sx / n) / (n - 1.0) AS variance FROM stats)
    SELECT CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
      a.mu / 100.0 AS mean_a, b.mu / 100.0 AS mean_b,
      (a.mu - b.mu) / SQRT(a.variance / a.n + b.variance / b.n) AS t_stat
    FROM (SELECT * FROM m WHERE variant = 'A') a,
         (SELECT * FROM m WHERE variant = 'B') b"""))

  // --- q132: EXPLICIT-EDGE BINNING — pandas `cut(bins=[...])` with
  //     arbitrary edges (q114's histogram covers the uniform-width case,
  //     `width_bucket`'s limit). The bucket index is a counted HOF over
  //     the broadcast edges array — codegen-free but O(|edges|) per row
  //     with zero shuffle; labels resolve by array index, so edge list
  //     and label list live in one place in both engines.
  private val q132 = Q(
    "q132_cut_bins",
    "A1 pandas.cut: explicit bin edges + labels, per-bin count and total",
    (s, d) => {
      val edges = Seq(0L, 50000L, 150000L, 300000L, 450000L)
      val labels = Seq("<0", "0-50k", "50k-150k", "150k-300k", "300k-450k", "450k+")
      val edgeArr = array(edges.map(lit(_)): _*)
      val labelArr = array(labels.map(lit(_)): _*)
      Tables.orders(s, d)
        .select(col("o_totalprice"),
          size(filter(edgeArr, e => col("o_totalprice") >= e)).as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .select(col("bucket").cast("long").as("bucket"),
          element_at(labelArr, col("bucket") + 1).as("label"),
          col("n"), col("total"))
        .orderBy(col("bucket"))
    },
    Some(s"""WITH b AS (SELECT o_orderkey, o_totalprice,
        len(list_filter([0, 50000, 150000, 300000, 450000],
          x -> o_totalprice >= x)) AS bucket
      FROM orders)
    SELECT CAST(bucket AS BIGINT) AS bucket,
      ['<0','0-50k','50k-150k','150k-300k','300k-450k','450k+'][bucket + 1]
        AS label,
      COUNT(*) AS n, ${dsumSql("o_totalprice")} AS total
    FROM b GROUP BY bucket ORDER BY bucket"""))

  // --- q138: PIVOT TABLE WITH MULTIPLE AGGS (pandas `pivot_table` with
  //     aggfunc=['count','sum']) — Catalyst rewrites an explicit-values
  //     pivot into ONE wide two-phase hash aggregate (a filtered
  //     count/sum pair per pivot value): one shuffle on the grouping
  //     key, no per-cell pass. The explicit value list (`F`/`O`/`P`)
  //     keeps the plan static — omitting it triggers a distinct-values
  //     inference job first, a full extra scan at 100 TB. Decimal sums
  //     are cast back to double after the pivot (dsum's cast cannot sit
  //     inside `.pivot().agg(...)`, which requires bare aggregates), and
  //     empty-cell counts are coalesced to 0: Spark's pivot rewrite
  //     yields NULL for a cell with no rows where SQL COUNT FILTER
  //     yields 0 — the fixture never hits this, but the randomized
  //     parity test does (empty cells stay NULL for sums, 0 for counts,
  //     matching pandas pivot_table margins semantics).
  private val q138 = Q(
    "q138_pivot_table_multi",
    "A-variant: pivot_table with simultaneous count+sum aggregations",
    (s, d) => {
      val p = Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(Money)).as("total"))
      Seq("F", "O", "P").foldLeft(p) { (df, v) =>
        df.withColumn(s"${v}_total", col(s"${v}_total").cast("double"))
          .withColumn(s"${v}_n", coalesce(col(s"${v}_n"), lit(0L)))
      }.orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority,
      COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F_n",
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
        FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS "F_total",
      COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O_n",
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
        FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS "O_total",
      COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P_n",
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
        FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS "P_total"
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  // --- q160: per-group MODE + SHANNON ENTROPY of a categorical
  //     distribution — pandas `groupby().agg(pd.Series.mode)` plus the
  //     distribution-skew readout a mixture audit wants (how concentrated
  //     is each language's source mix?). Mode ties are broken
  //     DETERMINISTICALLY (highest count, then lexicographically smallest
  //     source) via a rank-1 window over the (lang, source) count frame —
  //     engine-identical, unlike both engines' built-in mode()/arg_max()
  //     whose tie choice is unspecified. Entropy is −Σ p·ln p: the count
  //     frame per lang is collected into a SOURCE-SORTED list and folded
  //     sequentially (q141's ordered-fold idiom), so the double addition
  //     order is identical in Spark and DuckDB — a bare SUM over groups
  //     would be partial-aggregation-order dependent. ln() itself is the
  //     one non-bit-identical primitive across the engines (Java Math.log
  //     vs C libm can differ 1 ulp — q162's sweep caught it live), so the
  //     compared value is rounded to 9 decimals on both sides, q27's
  //     established pattern; ~9 significant digits retained. Scale: everything
  //     downstream of the first groupBy is aggregate-sized (langs ×
  //     sources); the corpus shuffles once, map-side combined. Per-lang
  //     list state is bounded by the source-domain size, never rows.
  private val q160 = Q(
    "q160_group_mode_entropy",
    "A ✦ groupby mode (deterministic tie-break) + Shannon entropy of source mix per lang",
    (s, d) => {
      val counts = Tables.documents(s, d)
        .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("cnt").desc, col("source"))
      val mode = counts
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("lang"), col("source").as("mode_source"),
          col("cnt").as("mode_cnt"))
      val ent = counts.groupBy(col("lang"))
        .agg(sum(col("cnt")).as("n_docs"),
          count(lit(1)).as("n_sources"),
          sort_array(collect_list(struct(col("source"), col("cnt")))).as("cs"))
        .select(col("lang"), col("n_docs"), col("n_sources"),
          round(-aggregate(
            transform(col("cs"), x =>
              (x.getField("cnt").cast("double") / col("n_docs").cast("double")) *
                log(x.getField("cnt").cast("double") / col("n_docs").cast("double"))),
            lit(0.0), (a, x) => a + x), 9).as("entropy_nats"))
      ent.join(mode, Seq("lang")).orderBy(col("lang"))
    },
    Some("""WITH c AS (
      SELECT lang, source, COUNT(*) AS cnt FROM documents GROUP BY lang, source),
    m AS (SELECT lang, source AS mode_source, cnt AS mode_cnt FROM (
      SELECT lang, source, cnt,
        ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, source) AS rn
      FROM c) WHERE rn = 1),
    e0 AS (SELECT lang, SUM(cnt) AS n_docs, COUNT(*) AS n_sources,
        list(cnt ORDER BY source) AS cs
      FROM c GROUP BY lang),
    e AS (SELECT lang, n_docs, n_sources,
        ROUND(-list_sum(list_transform(cs,
          x -> (CAST(x AS DOUBLE) / CAST(n_docs AS DOUBLE))
            * ln(CAST(x AS DOUBLE) / CAST(n_docs AS DOUBLE)))), 9) AS entropy_nats
      FROM e0)
    SELECT e.lang, CAST(e.n_docs AS BIGINT) AS n_docs,
      e.n_sources, e.entropy_nats, m.mode_source, m.mode_cnt
    FROM e JOIN m USING (lang) ORDER BY lang"""))

  // --- q174: MERGEABLE PARTIAL AGGREGATES — the lambda/kappa
  //     re-aggregation contract: a pipeline that materializes DAILY
  //     partials (count + decimal sum per type/day) must be able to
  //     roll them into MONTHLY totals that are EXACTLY what a direct
  //     monthly pass over the raw events would produce — else daily
  //     snapshotting changes answers. The partials stay DECIMAL(18,6)
  //     (never cast through double mid-pipeline: decimal addition is
  //     associative, so partial-of-partial == direct regardless of how
  //     rows landed in days or batches — the same property that makes
  //     them safe to merge across late-arriving backfills). The oracle
  //     computes the monthly totals DIRECTLY from raw events — the hash
  //     match IS the decomposition proof (q135's pattern, aggregate
  //     form). Scale: the raw corpus shuffles once into day partials
  //     (map-side combined); the month rollup re-shuffles only the
  //     tiny partial frame. 30-day epoch buckets keep the bucketing
  //     pure integer arithmetic.
  private val q174 = Q(
    "q174_partial_agg_merge",
    "A ✦ mergeable partials: daily decimal partials → monthly == direct monthly",
    (s, d) => {
      val dayUs = 86400000000L
      val daily = Tables.events(s, d)
        .select(col("event_type"),
          expr(s"(ts div 1000) div $dayUs").as("day"), col("value"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("pn"),
          sum(col("value").cast(Money)).as("psum")) // partial STAYS decimal
      daily
        .groupBy(col("event_type"), expr("day div 30").as("m30"))
        .agg(count(lit(1)).as("n_days"), sum(col("pn")).as("n_events"),
          sum(col("psum")).cast("double").as("total"))
        .orderBy(col("event_type"), col("m30"))
    },
    Some(s"""SELECT event_type,
      (epoch_us(ts) // 86400000000) // 30 AS m30,
      CAST(COUNT(DISTINCT epoch_us(ts) // 86400000000) AS BIGINT) AS n_days,
      COUNT(*) AS n_events,
      ${dsumSql("value")} AS total
    FROM events GROUP BY 1, 2 ORDER BY event_type, m30"""))

  // --- q175: JOIN-KEY SKEW AUDIT — the diagnostic run before a big join
  //     ships: per-key row counts for the hottest keys plus the global
  //     imbalance ratio (hot key count ÷ mean count), the number that
  //     decides between a plain shuffle join, AQE skew splitting, and
  //     q92's salting. One map-side-combined groupBy over the fact
  //     table; the top-10 is orderBy+limit → TakeOrderedAndProject; the
  //     (total, n_keys) stats frame is 1-row broadcast. cum_share runs
  //     over the 10-row result — the only unpartitioned window is
  //     top-k-sized. All shares are single divisions of exact integers,
  //     fpTrunc-presented.
  private val q175 = Q(
    "q175_skew_audit",
    "A ✦ ops: join-key skew audit — top-10 heavy hitters + imbalance ratio",
    (s, d) => {
      val counts = Tables.lineitem(s, d)
        .groupBy(col("l_suppkey")).agg(count(lit(1)).as("cnt"))
      val stats = counts.agg(sum(col("cnt")).as("total"),
        count(lit(1)).as("n_keys"))
      val wCum = Window.orderBy(col("cnt").desc, col("l_suppkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      counts.orderBy(col("cnt").desc, col("l_suppkey")).limit(10)
        .crossJoin(broadcast(stats))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("cnt").desc, col("l_suppkey"))))
        .select(col("rk").cast("long").as("rk"), col("l_suppkey"),
          col("cnt"),
          fpTrunc(col("cnt").cast("double") / col("total").cast("double"), 9)
            .as("share"),
          fpTrunc(sum(col("cnt")).over(wCum).cast("double")
            / col("total").cast("double"), 9).as("cum_share"),
          fpTrunc(col("cnt").cast("double") * col("n_keys").cast("double")
            / col("total").cast("double"), 9).as("ratio_to_mean"))
        .orderBy(col("rk"))
    },
    Some("""WITH c AS (
      SELECT l_suppkey, COUNT(*) AS cnt FROM lineitem GROUP BY 1),
    s AS (SELECT SUM(cnt) AS total, COUNT(*) AS n_keys FROM c),
    top AS (SELECT l_suppkey, cnt FROM c
      ORDER BY cnt DESC, l_suppkey LIMIT 10)
    SELECT CAST(ROW_NUMBER() OVER w AS BIGINT) AS rk, l_suppkey,
      CAST(cnt AS BIGINT) AS cnt,
      FLOOR((CAST(cnt AS DOUBLE) / CAST(s.total AS DOUBLE)) * 1e9) / 1e9
        AS share,
      FLOOR((CAST(SUM(cnt) OVER (ORDER BY cnt DESC, l_suppkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        / CAST(s.total AS DOUBLE)) * 1e9) / 1e9 AS cum_share,
      FLOOR((CAST(cnt AS DOUBLE) * CAST(s.n_keys AS DOUBLE)
        / CAST(s.total AS DOUBLE)) * 1e9) / 1e9 AS ratio_to_mean
    FROM top CROSS JOIN s
    WINDOW w AS (ORDER BY cnt DESC, l_suppkey)
    ORDER BY rk"""))

  // --- q176: MIXTURE RATE SOLVER — given target shares t_s over
  //     sources, find the LARGEST corpus you can draw WITHOUT
  //     replacement that hits the mixture exactly: the binding scale is
  //     K = min_s cnt_s / t_s (the scarcest source relative to its
  //     target); keep_s = ⌊K·t_s⌋ docs, rate_s = keep_s / cnt_s. This is
  //     the planning step ABOVE q102/q141's samplers — it computes the
  //     rates they consume. Targets here ∝ (source index + 1),
  //     normalized — exact rational doubles both engines build the same
  //     way. Everything after the per-source count (one map-combined
  //     shuffle) is a sources-sized frame: the K and Σkeep aggregates
  //     are 1-row broadcasts. FLOOR(K·t) is the q167 integer-unit
  //     class; shares present via fpTrunc.
  private val q176 = Q(
    "q176_mixture_solver",
    "A ✦ curation: mixture rate solver — max corpus at target shares, per-source keep/rate",
    (s, d) => {
      val counts = Tables.documents(s, d)
        .groupBy(col("source")).agg(count(lit(1)).as("cnt"))
        .withColumn("idx", substring(col("source"), 4, 10).cast("long"))
      val tsum = counts.agg(sum(col("idx") + 1).as("tden"))
      val t = counts.crossJoin(broadcast(tsum))
        .withColumn("target",
          (col("idx") + 1).cast("double") / col("tden").cast("double"))
        .withColumn("ratio", col("cnt").cast("double") / col("target"))
      val k = t.agg(min(col("ratio")).as("k"))
      val kept = t.crossJoin(broadcast(k))
        .withColumn("keep", floor(col("k") * col("target")))
      val ktot = kept.agg(sum(col("keep")).as("ksum"))
      kept.crossJoin(broadcast(ktot))
        .select(col("source"), col("cnt"),
          fpTrunc(col("target"), 9).as("target_share"),
          col("keep"),
          fpTrunc(col("keep").cast("double") / col("cnt").cast("double"), 9)
            .as("rate"),
          fpTrunc(col("keep").cast("double") / col("ksum").cast("double"), 9)
            .as("achieved_share"))
        .orderBy(col("source"))
    },
    Some("""WITH c AS (
      SELECT source, COUNT(*) AS cnt,
        CAST(SUBSTR(source, 4, 10) AS BIGINT) AS idx
      FROM documents GROUP BY 1),
    ts AS (SELECT SUM(idx + 1) AS tden FROM c),
    t AS (SELECT source, cnt,
        CAST(idx + 1 AS DOUBLE) / CAST(ts.tden AS DOUBLE) AS target,
        CAST(cnt AS DOUBLE)
          / (CAST(idx + 1 AS DOUBLE) / CAST(ts.tden AS DOUBLE)) AS ratio
      FROM c CROSS JOIN ts),
    k AS (SELECT MIN(ratio) AS k FROM t),
    kept AS (SELECT source, cnt, target,
        FLOOR(k.k * target) AS keep FROM t CROSS JOIN k),
    kt AS (SELECT SUM(keep) AS ksum FROM kept)
    SELECT source, cnt,
      FLOOR(target * 1e9) / 1e9 AS target_share,
      CAST(keep AS BIGINT) AS keep,
      FLOOR((keep / CAST(cnt AS DOUBLE)) * 1e9) / 1e9 AS rate,
      FLOOR((keep / CAST(kt.ksum AS DOUBLE)) * 1e9) / 1e9 AS achieved_share
    FROM kept CROSS JOIN kt ORDER BY source"""))

  // --- q177: BENFORD'S-LAW DIGIT AUDIT — the forensic sanity check on a
  //     money column: organically-generated amounts follow
  //     P(d) = log10(1 + 1/d); fabricated or truncated feeds don't. The
  //     leading digit is extracted WITHOUT float formatting or log10():
  //     prices carry ≤2 decimals, so CAST to DECIMAL(18,2) is exact and
  //     the scaled integer's VARCHAR rendering — engine-identical for
  //     integers, unlike double→string — yields the digit. Expected
  //     shares are the nine literal constants written with identical
  //     digits on both sides (shortest-repr parse → the same double).
  //     One map-combined groupBy over the corpus; everything after is a
  //     9-row frame. Deviation presents via fpTrunc.
  private val q177 = Q(
    "q177_benford_audit",
    "A ✦ quality: Benford leading-digit audit of o_totalprice (exact digit extraction)",
    (s, d) => {
      val benford = Map(1 -> "0.301029995663981", 2 -> "0.176091259055681",
        3 -> "0.124938736608300", 4 -> "0.096910013008056",
        5 -> "0.079181246047625", 6 -> "0.066946789630613",
        7 -> "0.057991946977687", 8 -> "0.051152522447381",
        9 -> "0.045757490560675")
      val expCol = benford.toSeq.sortBy(_._1).tail
        .foldLeft(when(col("digit") === 1, lit(benford(1).toDouble))) {
          case (acc, (dg, sh)) => acc.when(col("digit") === dg, lit(sh.toDouble))
        }.otherwise(lit(0.0))
      val counts = Tables.orders(s, d)
        .select(substring(col("o_totalprice").cast("decimal(18,2)")
          .cast("string"), 1, 1).cast("int").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      counts.crossJoin(broadcast(counts.agg(sum(col("n")).as("tot"))))
        .withColumn("obs", col("n").cast("double") / col("tot").cast("double"))
        .withColumn("exp", expCol)
        .select(col("digit"), col("n"),
          fpTrunc(col("obs"), 9).as("obs_share"),
          fpTrunc(col("exp"), 9).as("benford_share"),
          fpTrunc(col("obs") - col("exp"), 9).as("dev"))
        .orderBy(col("digit"))
    },
    Some("""WITH c AS (
      SELECT CAST(SUBSTR(CAST(CAST(o_totalprice AS DECIMAL(18,2))
          AS VARCHAR), 1, 1) AS INT) AS digit, COUNT(*) AS n
      FROM orders GROUP BY 1),
    t AS (SELECT SUM(n) AS tot FROM c),
    e AS (SELECT digit, n,
        CAST(n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS obs,
        CASE digit WHEN 1 THEN 0.301029995663981
          WHEN 2 THEN 0.176091259055681 WHEN 3 THEN 0.124938736608300
          WHEN 4 THEN 0.096910013008056 WHEN 5 THEN 0.079181246047625
          WHEN 6 THEN 0.066946789630613 WHEN 7 THEN 0.057991946977687
          WHEN 8 THEN 0.051152522447381 WHEN 9 THEN 0.045757490560675
          ELSE 0.0 END AS exp
      FROM c CROSS JOIN t)
    SELECT digit, n,
      FLOOR(obs * 1e9) / 1e9 AS obs_share,
      FLOOR(exp * 1e9) / 1e9 AS benford_share,
      FLOOR((obs - exp) * 1e9) / 1e9 AS dev
    FROM e ORDER BY digit"""))

  // --- q178: CONTINGENCY TABLE + STANDARDIZED RESIDUALS — are market
  //     segment and order priority independent? Long-format chi-square
  //     workup: observed cell counts, expected = row_total·col_total/N,
  //     residual = (obs − exp)/√exp. One corpus groupBy; the margins
  //     join back as aggregate-sized broadcasts. √ is IEEE
  //     correctly-rounded (unlike ln) so the residual is
  //     engine-identical from exact integer inputs; fpTrunc presents.
  private val q178 = Q(
    "q178_contingency_chi2",
    "A ✦ stats: segment × priority contingency cells with standardized residuals",
    (s, d) => {
      val base = Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .select(col("c_mktsegment").as("seg"),
          col("o_orderpriority").as("prio"))
      val cells = base.groupBy(col("seg"), col("prio"))
        .agg(count(lit(1)).as("n"))
      val rows = cells.groupBy(col("seg")).agg(sum(col("n")).as("row_n"))
      val cols = cells.groupBy(col("prio")).agg(sum(col("n")).as("col_n"))
      val tot = cells.agg(sum(col("n")).as("tot"))
      cells.join(broadcast(rows), Seq("seg"))
        .join(broadcast(cols), Seq("prio"))
        .crossJoin(broadcast(tot))
        .withColumn("exp",
          col("row_n").cast("double") * col("col_n").cast("double")
            / col("tot").cast("double"))
        .select(col("seg"), col("prio"), col("n"),
          fpTrunc(col("exp"), 6).as("expected"),
          fpTrunc((col("n").cast("double") - col("exp")) / sqrt(col("exp")), 6)
            .as("std_residual"))
        .orderBy(col("seg"), col("prio"))
    },
    Some("""WITH b AS (
      SELECT c_mktsegment AS seg, o_orderpriority AS prio
      FROM customer JOIN orders ON c_custkey = o_custkey),
    cells AS (SELECT seg, prio, COUNT(*) AS n FROM b GROUP BY 1, 2),
    r AS (SELECT seg, SUM(n) AS row_n FROM cells GROUP BY 1),
    co AS (SELECT prio, SUM(n) AS col_n FROM cells GROUP BY 1),
    t AS (SELECT SUM(n) AS tot FROM cells),
    e AS (SELECT cells.seg, cells.prio, cells.n,
        CAST(r.row_n AS DOUBLE) * CAST(co.col_n AS DOUBLE)
          / CAST(t.tot AS DOUBLE) AS exp
      FROM cells JOIN r USING (seg) JOIN co USING (prio) CROSS JOIN t)
    SELECT seg, prio, n,
      FLOOR(exp * 1e6) / 1e6 AS expected,
      FLOOR(((CAST(n AS DOUBLE) - exp) / SQRT(exp)) * 1e6) / 1e6
        AS std_residual
    FROM e ORDER BY seg, prio"""))

  // --- q179: A/B PROPORTION TEST — conversion-rate comparison between
  //     two deterministic assignment arms (user_id parity — the no-rand
  //     assignment a reproducible experiment pipeline uses): the unit is
  //     a (user, day) visit — clicked that day → did they purchase that
  //     day? — and the pooled two-proportion z-statistic compares arms.
  //     (User-level units are degenerate in this fixture: every user
  //     eventually purchases, p₀ = p₁ = 1, pooled variance 0 — and
  //     Spark 4 under ANSI throws on the resulting 0/0 where DuckDB
  //     yields NaN, so the zero-variance guard below is load-bearing,
  //     emitting NULL on BOTH engines.) Everything reduces to exact
  //     integer unit counts (two map-combined aggregates over events);
  //     the z arithmetic is one identically-parenthesized expression —
  //     √ is IEEE-exact, so z is engine-identical; fpTrunc presents.
  private val q179 = Q(
    "q179_ab_proportion_z",
    "A ✦ stats: two-arm conversion A/B test with pooled z-statistic",
    (s, d) => {
      val perUnit = Tables.events(s, d)
        .groupBy(pmod(col("user_id"), lit(2L)).as("arm"), col("user_id"),
          expr("(ts div 1000) div 86400000000").as("day"))
        .agg(max(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("clicked"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("converted"))
        .filter(col("clicked") === 1)
      val arms = perUnit.groupBy(col("arm"))
        .agg(count(lit(1)).as("n"), sum(col("converted")).as("conv"))
      val wide = arms.filter(col("arm") === 0)
        .select(col("n").as("n0"), col("conv").as("c0"))
        .crossJoin(arms.filter(col("arm") === 1)
          .select(col("n").as("n1"), col("conv").as("c1")))
        .withColumn("p0", col("c0").cast("double") / col("n0").cast("double"))
        .withColumn("p1", col("c1").cast("double") / col("n1").cast("double"))
        .withColumn("pp",
          (col("c0") + col("c1")).cast("double")
            / (col("n0") + col("n1")).cast("double"))
      wide
        .withColumn("varz",
          col("pp") * (lit(1.0) - col("pp")) *
            (lit(1.0) / col("n0").cast("double")
              + lit(1.0) / col("n1").cast("double")))
        .select(col("n0"), col("c0"), fpTrunc(col("p0"), 9).as("p0"),
          col("n1"), col("c1"), fpTrunc(col("p1"), 9).as("p1"),
          when(col("varz") > 0,
            fpTrunc((col("p1") - col("p0")) / sqrt(col("varz")), 9))
            .otherwise(lit(null).cast("double")).as("z"))
    },
    Some("""WITH pu AS (
      SELECT user_id % 2 AS arm, user_id,
        epoch_us(ts) // 86400000000 AS day,
        MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicked,
        MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY 1, 2, 3),
    arms AS (SELECT arm, COUNT(*) AS n, SUM(conv) AS conv FROM pu
      WHERE clicked = 1 GROUP BY 1),
    w AS (SELECT a0.n AS n0, a0.conv AS c0, a1.n AS n1, a1.conv AS c1,
        CAST(a0.conv AS DOUBLE) / CAST(a0.n AS DOUBLE) AS p0,
        CAST(a1.conv AS DOUBLE) / CAST(a1.n AS DOUBLE) AS p1,
        CAST(a0.conv + a1.conv AS DOUBLE)
          / CAST(a0.n + a1.n AS DOUBLE) AS pp
      FROM (SELECT * FROM arms WHERE arm = 0) a0
        CROSS JOIN (SELECT * FROM arms WHERE arm = 1) a1)
    SELECT CAST(n0 AS BIGINT) AS n0, CAST(c0 AS BIGINT) AS c0,
      FLOOR(p0 * 1e9) / 1e9 AS p0,
      CAST(n1 AS BIGINT) AS n1, CAST(c1 AS BIGINT) AS c1,
      FLOOR(p1 * 1e9) / 1e9 AS p1,
      CASE WHEN pp * (1.0 - pp)
          * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE)) > 0
        THEN FLOOR(((p1 - p0) / SQRT(pp * (1.0 - pp)
          * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE)))) * 1e9)
          / 1e9
        ELSE NULL END AS z
    FROM w"""))

  // --- q181: MERGEABLE QUANTILE SKETCH — q126's lambda/kappa
  //     re-aggregation story for QUANTILES: per-ingest-shard value
  //     HISTOGRAMS are the mergeable partials (histogram merge =
  //     element-wise count sum — associative and commutative, so any
  //     shard grouping yields the same union, the property
  //     percentile_approx's opaque internal sketch has but cannot
  //     expose through SQL), and the quantile is read off the MERGED
  //     histogram's cumulative counts. The query materializes the
  //     decomposed path (8 deterministic hash shards → per-shard
  //     histogram → merge); the DuckDB twin computes the DIRECT global
  //     histogram — the hash-match IS the decomposition proof, q174's
  //     idiom. Everything is exact integers (2-decimal prices → cents
  //     → $100 bins; ranks via CEIL of an identical IEEE product), so
  //     the merged sketch is not approximately-but-exactly equal to the
  //     direct one. The cumulative window runs over the merged
  //     histogram, bounded by the VALUE DOMAIN (~1,050 $100-bins at any
  //     SF — price range, not row count); at an unbounded domain you'd
  //     swap in q150's two-phase block cumsum, same plan otherwise.
  //     A shard-count-invariance + naive-replica property test lives in
  //     OperatorPropertySpec.
  private val q181 = Q(
    "q181_quantile_sketch_merge",
    "A5/A9 ✦ mergeable quantile sketch: per-shard histograms merged == direct global quantiles",
    (s, d) => {
      val li = Tables.lineitem(s, d).select(
        pmod(xxhash64(col("l_orderkey")), lit(8L)).as("shard"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
          .as("c"))
        .withColumn("bin", expr("c div 10000"))
      // phase 1: one histogram per shard (the mergeable partial)
      val perShard = li.groupBy(col("shard"), col("bin"))
        .agg(count(lit(1)).as("cnt"))
      // phase 2: sketch union = element-wise sum across shards
      val merged = perShard.groupBy(col("bin")).agg(sum(col("cnt")).as("cnt"))
      val wCum = Window.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = merged.withColumn("cumend", sum(col("cnt")).over(wCum))
      val tot = merged.agg(sum(col("cnt")).as("n"))
      val qs = s.range(1).select(
        explode(array(lit(0.25), lit(0.5), lit(0.9), lit(0.99))).as("q"))
      val tgt = qs.crossJoin(broadcast(tot))
        .withColumn("target_rank", ceil(col("q") * col("n")))
      tgt.join(broadcast(cum), col("cumend") >= col("target_rank"))
        .groupBy(col("q"), col("target_rank"), col("n"))
        .agg(min(col("bin")).as("bin"))
        .select(col("q"), col("target_rank"), col("bin"),
          (col("bin") * 10000).as("lo_cents"),
          (col("bin") * 10000 + 9999).as("hi_cents"),
          col("n").as("n_total"))
        .orderBy(col("q"))
    },
    Some("""WITH cents AS (
      SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      FROM lineitem),
    hist AS (
      SELECT c // 10000 AS bin, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM cents GROUP BY bin),
    cum AS (
      SELECT bin, CAST(SUM(cnt) OVER (ORDER BY bin) AS BIGINT) AS cumend
      FROM hist),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM hist),
    qs AS (SELECT CAST(q AS DOUBLE) AS q
      FROM (VALUES (0.25), (0.5), (0.9), (0.99)) t(q)),
    tgt AS (SELECT q, CAST(CEIL(q * n) AS BIGINT) AS target_rank, n
      FROM qs, tot)
    SELECT t.q, t.target_rank, MIN(c.bin) AS bin,
      MIN(c.bin) * 10000 AS lo_cents,
      MIN(c.bin) * 10000 + 9999 AS hi_cents,
      t.n AS n_total
    FROM tgt t JOIN cum c ON c.cumend >= t.target_rank
    GROUP BY t.q, t.target_rank, t.n
    ORDER BY t.q"""))

  // --- q184: QUANTILE NORMALIZATION — map a feature to its global
  //     percent-rank in [0,1] (the rank-based feature transform that
  //     makes heterogeneous sources comparable before mixing). The
  //     naive form is ONE GLOBAL WINDOW over every row — the classic
  //     scale-killer — so this runs q150's two-phase machinery
  //     instead: exact cents VALUE HISTOGRAM (shuffle bounded by the
  //     value domain with map-side combine), per-block cumulative
  //     partials + a tiny block-offset window, then percent_rank =
  //     (rank−1)/(n−1) with rank = cum-before + 1 read off the
  //     histogram and joined back to the (deterministically sampled)
  //     rows. All-integer numerators; ONE double division shared with
  //     the oracle. The ORACLE is DuckDB's builtin PERCENT_RANK() over
  //     the raw rows — a different algorithm (true global sort) — so
  //     the hash-match proves the decomposed rank IS percent_rank,
  //     ties included (both give tied values the min rank).
  private val q184 = Q(
    "q184_quantile_normalize",
    "A9/W6 ✦ quantile normalization: exact global percent_rank via two-phase histogram rank",
    (s, d) => {
      val o = Tables.orders(s, d).withColumn("cents",
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      val vc = o.groupBy(col("cents")).agg(count(lit(1)).as("cnt"))
        .withColumn("block", expr("cents div 1048576"))
      val wB = Window.orderBy(col("block"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val off = vc.groupBy(col("block")).agg(sum(col("cnt")).as("bn"))
        .withColumn("boff", sum(col("bn")).over(wB) - col("bn"))
        .select(col("block"), col("boff"))
      val wIn = Window.partitionBy(col("block")).orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = vc.join(broadcast(off), Seq("block"))
        .withColumn("cumend", col("boff") + sum(col("cnt")).over(wIn))
        .select(col("cents"), col("cnt"), col("cumend"))
      val tot = cum.agg(sum(col("cnt")).as("n"))
      o.filter(col("o_orderkey") % 97 === 0)
        .join(cum, Seq("cents"))
        .crossJoin(broadcast(tot))
        .select(col("o_orderkey"), col("o_totalprice"),
          fpTrunc((col("cumend") - col("cnt")).cast("double")
            / (col("n") - 1).cast("double"), 9).as("pr"))
        .orderBy(col("o_orderkey"))
    },
    Some("""WITH c AS (
      SELECT o_orderkey, o_totalprice,
        CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders),
    r AS (
      SELECT o_orderkey, o_totalprice,
        PERCENT_RANK() OVER (ORDER BY cents) AS pr
      FROM c)
    SELECT o_orderkey, o_totalprice, FLOOR(pr * 1e9) / 1e9 AS pr
    FROM r WHERE o_orderkey % 97 = 0 ORDER BY o_orderkey"""))

  // --- q187: PER-GROUP WINSORIZED ROBUST STATS — clip each nation's
  //     account balances at that group's exact p05/p95 and report the
  //     clipped (winsorized) mean/std plus clip tallies: the outlier-
  //     robust feature-preprocessing step run before z-scoring a
  //     heavy-tailed column. Group thresholds come from a per-group
  //     VALUE HISTOGRAM + PARTITIONED cumulative window (frames bounded
  //     by each group's distinct-value count, never the corpus) and
  //     value-at-rank selection with rank = ceil(p·n) — all integers.
  //     Balances are negative-capable, so cents stay plain longs and no
  //     `div`-flooring is involved (Spark `div` truncates toward zero,
  //     DuckDB `//` floors — a sign-dependent trap this query's design
  //     avoids entirely). Clipped values are still 2-decimal data
  //     values → decimal-exact dsum/dvar moments; the oracle computes
  //     thresholds by a DIFFERENT algorithm (ROW_NUMBER over raw rows)
  //     and the identical clipped-moment formulas via the shared dsl
  //     twins. fpTrunc presents the two derived doubles.
  private val q187 = Q(
    "q187_winsorized_stats",
    "A9/A12 ✦ robust stats: per-group exact-quantile winsorized mean/std + clip tallies",
    (s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").as("nk"),
        (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      val vc = c.groupBy(col("nk"), col("cents")).agg(count(lit(1)).as("cnt"))
      val wCum = Window.partitionBy(col("nk")).orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = vc.withColumn("cumend", sum(col("cnt")).over(wCum))
      val n = vc.groupBy(col("nk")).agg(sum(col("cnt")).as("n"))
      // rank = ⌈p·n⌉ in EXACT INTEGER arithmetic ((5n+99) div 100):
      // a double 0.05·n crosses the next integer for n divisible by 20
      // (0.05 is not a binary fraction; Spark's double literal rounds
      // up where DuckDB's DECIMAL(3,2) stays exact) — integer
      // ceil-division is engine-identical by construction.
      val ranked = cum.join(broadcast(n), Seq("nk"))
        .withColumn("r05", expr("(n * 5 + 99) div 100"))
        .withColumn("r95", expr("(n * 95 + 99) div 100"))
      val lo = ranked.filter(col("cumend") >= col("r05"))
        .groupBy(col("nk")).agg(min(col("cents")).as("lo_cents"))
      val hi = ranked.filter(col("cumend") >= col("r95"))
        .groupBy(col("nk")).agg(min(col("cents")).as("hi_cents"))
      c.join(broadcast(lo), Seq("nk")).join(broadcast(hi), Seq("nk"))
        .select(col("nk"), col("lo_cents"), col("hi_cents"),
          greatest(least(col("cents"), col("hi_cents")), col("lo_cents"))
            .as("w"),
          when(col("cents") < col("lo_cents"), 1L).otherwise(0L).as("clo"),
          when(col("cents") > col("hi_cents"), 1L).otherwise(0L).as("chi"))
        .groupBy(col("nk"), col("lo_cents"), col("hi_cents"))
        .agg(count(lit(1)).as("n"),
          sum(col("clo")).as("n_clipped_lo"),
          sum(col("chi")).as("n_clipped_hi"),
          fpTrunc(dmean(col("w").cast("double") / 100), 9).as("win_mean"),
          fpTrunc(dstddev(col("w").cast("double") / 100), 9).as("win_std"))
        .orderBy(col("nk"))
    },
    Some(s"""WITH c AS (
      SELECT c_nationkey AS nk,
        CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM customer),
    ranked AS (
      SELECT nk, cents,
        ROW_NUMBER() OVER (PARTITION BY nk ORDER BY cents) AS rn,
        COUNT(*) OVER (PARTITION BY nk) AS n
      FROM c),
    thr AS (
      SELECT nk,
        MIN(CASE WHEN rn = (n * 5 + 99) // 100 THEN cents END) AS lo_cents,
        MIN(CASE WHEN rn = (n * 95 + 99) // 100 THEN cents END) AS hi_cents
      FROM ranked GROUP BY nk),
    clipped AS (
      SELECT c.nk, t.lo_cents, t.hi_cents,
        GREATEST(LEAST(c.cents, t.hi_cents), t.lo_cents) AS w,
        CASE WHEN c.cents < t.lo_cents THEN 1 ELSE 0 END AS clo,
        CASE WHEN c.cents > t.hi_cents THEN 1 ELSE 0 END AS chi
      FROM c JOIN thr t ON c.nk = t.nk)
    SELECT nk, lo_cents, hi_cents, COUNT(*) AS n,
      CAST(SUM(clo) AS BIGINT) AS n_clipped_lo,
      CAST(SUM(chi) AS BIGINT) AS n_clipped_hi,
      ${fpTruncSql(dmeanSql("CAST(w AS DOUBLE) / 100"), 9)} AS win_mean,
      ${fpTruncSql(dstddevSql("CAST(w AS DOUBLE) / 100"), 9)} AS win_std
    FROM clipped GROUP BY nk, lo_cents, hi_cents ORDER BY nk"""))

  // --- q189: MUTUAL INFORMATION between two categoricals — the
  //     information-theoretic complement to q178's chi²: how many nats
  //     does knowing a document's language tell you about its source?
  //     (The feature-selection / mixture-dependence readout.) MI =
  //     Σ p(x,y)·ln(p(x,y)/(p(x)p(y))) plus the marginal entropies and
  //     the normalized MI/√(H(x)H(y)). Every probability ratio is built
  //     from EXACT INTEGER counts (cell n, margins, N) with identically
  //     parenthesized double arithmetic; the Σ over cells is q160's
  //     ordered fold — cells sorted by (lang, source), folded
  //     sequentially — because a relational SUM of double terms is
  //     partial-order dependent. ln() can differ 1 ulp across engines,
  //     so outputs present at round-9 (q27's pattern — safe here: O(1)
  //     magnitude, one row). Scale: ONE corpus groupBy (map-side
  //     combined); margins/total/fold all run on the ≤|X|·|Y| cell
  //     frame. List state is domain-sized, never rows.
  private val q189 = Q(
    "q189_mutual_information",
    "A ✦ stats: lang×source mutual information + marginal entropies + normalized MI",
    (s, d) => {
      val c = Tables.documents(s, d)
        .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n"))
      val nx = c.groupBy(col("lang")).agg(sum(col("n")).as("xn"))
      val ny = c.groupBy(col("source")).agg(sum(col("n")).as("yn"))
      val tot = c.agg(sum(col("n")).as("nn"))
      val cells = c.join(broadcast(nx), Seq("lang"))
        .join(broadcast(ny), Seq("source"))
        .crossJoin(broadcast(tot))
        .select(col("lang"), col("source"),
          ((col("n").cast("double") / col("nn"))
            * log((col("n").cast("double") * col("nn"))
              / (col("xn").cast("double") * col("yn")))).as("term"))
      val hx = nx.crossJoin(broadcast(tot))
        .select(col("lang"),
          (negate(col("xn").cast("double") / col("nn"))
            * log(col("xn").cast("double") / col("nn"))).as("t"))
        .agg(aggregate(transform(sort_array(
          collect_list(struct(col("lang"), col("t")))), _.getField("t")),
          lit(0.0), (a, x) => a + x).as("hx"))
      val hy = ny.crossJoin(broadcast(tot))
        .select(col("source"),
          (negate(col("yn").cast("double") / col("nn"))
            * log(col("yn").cast("double") / col("nn"))).as("t"))
        .agg(aggregate(transform(sort_array(
          collect_list(struct(col("source"), col("t")))), _.getField("t")),
          lit(0.0), (a, x) => a + x).as("hy"))
      cells
        .agg(count(lit(1)).as("n_cells"),
          aggregate(transform(sort_array(collect_list(
            struct(col("lang"), col("source"), col("term")))),
            _.getField("term")), lit(0.0), (a, x) => a + x).as("mi"))
        .crossJoin(broadcast(hx)).crossJoin(broadcast(hy))
        .select(col("n_cells"),
          round(col("mi"), 9).as("mi"),
          round(col("hx"), 9).as("hx"),
          round(col("hy"), 9).as("hy"),
          round(col("mi") / sqrt(col("hx") * col("hy")), 9).as("nmi"))
    },
    Some("""WITH c AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY lang, source),
    nx AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS xn FROM c GROUP BY lang),
    ny AS (SELECT source, CAST(SUM(n) AS BIGINT) AS yn FROM c GROUP BY source),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM c),
    cells AS (
      SELECT c.lang, c.source,
        (CAST(c.n AS DOUBLE) / t.nn)
          * LN((CAST(c.n AS DOUBLE) * t.nn)
            / (CAST(nx.xn AS DOUBLE) * ny.yn)) AS term
      FROM c JOIN nx USING (lang) JOIN ny USING (source), tot t),
    mi AS (
      SELECT COUNT(*) AS n_cells,
        list_sum(list(term ORDER BY lang, source)) AS mi
      FROM cells),
    hx AS (
      SELECT list_sum(list(t ORDER BY lang)) AS hx FROM (
        SELECT lang, -(CAST(xn AS DOUBLE) / t.nn)
          * LN(CAST(xn AS DOUBLE) / t.nn) AS t FROM nx, tot t)),
    hy AS (
      SELECT list_sum(list(t ORDER BY source)) AS hy FROM (
        SELECT source, -(CAST(yn AS DOUBLE) / t.nn)
          * LN(CAST(yn AS DOUBLE) / t.nn) AS t FROM ny, tot t))
    SELECT n_cells, ROUND(mi, 9) AS mi, ROUND(hx, 9) AS hx,
      ROUND(hy, 9) AS hy, ROUND(mi / SQRT(hx * hy), 9) AS nmi
    FROM mi, hx, hy"""))

  // --- q191: MEDIAN ABSOLUTE DEVIATION — the robust dispersion scale
  //     (MAD, and the 1.4826·MAD consistent σ-estimate) for a
  //     heavy-tailed money column. Both medians are EXACT lower-medians
  //     (rank (n+1) div 2 — integer arithmetic, no float ranks) read
  //     off VALUE HISTOGRAMS, and the second pass never rescans the
  //     corpus: the DEVIATION histogram derives from the value
  //     histogram itself (dev = |cents − med|, counts re-grouped) —
  //     value-domain-sized input, value-domain-sized output. So the
  //     whole statistic costs ONE corpus aggregate + two
  //     histogram-sized reductions, the shape that holds at 100 TB
  //     where a sort-based median (or a rescan for deviations) would
  //     not. The oracle computes both medians by a DIFFERENT algorithm
  //     (ROW_NUMBER over raw rows, twice). σ = (mad/100)·1.4826 is one
  //     shared-literal IEEE chain; fpTrunc presents.
  private val q191 = Q(
    "q191_mad",
    "A9 ✦ robust stats: exact median absolute deviation + consistent sigma via dual histograms",
    (s, d) => {
      // two-phase cumulative count over a (value, cnt) histogram: block
      // partials + tiny offset window + block-local window — q150/q184's
      // machinery, shared here for both passes so no window frame ever
      // exceeds the 2^20-unit block span.
      def cumHist(vc: DataFrame, v: String): DataFrame = {
        val blocked = vc.withColumn("block", expr(s"$v div 1048576"))
        val wB = Window.orderBy(col("block"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val off = blocked.groupBy(col("block")).agg(sum(col("cnt")).as("bn"))
          .withColumn("boff", sum(col("bn")).over(wB) - col("bn"))
          .select(col("block"), col("boff"))
        val wIn = Window.partitionBy(col("block")).orderBy(col(v))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        blocked.join(broadcast(off), Seq("block"))
          .withColumn("cumend", col("boff") + sum(col("cnt")).over(wIn))
          .select(col(v), col("cnt"), col("cumend"))
      }
      // NOT persisted, unlike q196's histogram: q191's vc is ~150k rows
      // of near-unique cents, and caching it measured 2.2 -> 4.2 s at
      // sf0.1 (the InMemoryRelation scan under the two window legs costs
      // more than the re-run corpus aggregates it saves — exchange reuse
      // already dedups the identical aggregate subtrees here).
      val vc = Tables.orders(s, d)
        .select((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
        .groupBy(col("cents")).agg(count(lit(1)).as("cnt"))
      val n = vc.agg(sum(col("cnt")).as("n"))
      val med = cumHist(vc, "cents")
        .crossJoin(broadcast(n))
        .filter(col("cumend") >= expr("(n + 1) div 2"))
        .agg(min(col("cents")).as("med"))
      // deviation histogram FROM the value histogram — no corpus rescan
      val dev = vc.crossJoin(broadcast(med))
        .select(abs(col("cents") - col("med")).as("dv"), col("cnt"))
        .groupBy(col("dv")).agg(sum(col("cnt")).as("cnt"))
      val mad = cumHist(dev, "dv")
        .crossJoin(broadcast(n))
        .filter(col("cumend") >= expr("(n + 1) div 2"))
        .agg(min(col("dv")).as("mad"))
      n.crossJoin(broadcast(med)).crossJoin(broadcast(mad))
        .select(col("n"), col("med").as("med_cents"),
          col("mad").as("mad_cents"),
          fpTrunc((col("mad").cast("double") / 100) * lit(1.4826), 6)
            .as("sigma_t"))
    },
    Some("""WITH c AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        AS cents FROM orders),
    r1 AS (
      SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rn,
        COUNT(*) OVER () AS n
      FROM c),
    med AS (SELECT MIN(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS med,
      CAST(ANY_VALUE(n) AS BIGINT) AS n FROM r1),
    r2 AS (
      SELECT ABS(c.cents - m.med) AS dv,
        ROW_NUMBER() OVER (ORDER BY ABS(c.cents - m.med)) AS rn,
        m.n
      FROM c, med m),
    mad AS (SELECT MIN(CASE WHEN rn = (n + 1) // 2 THEN dv END) AS mad
      FROM r2)
    SELECT m.n, m.med AS med_cents, d.mad AS mad_cents,
      FLOOR(((CAST(d.mad AS DOUBLE) / 100) * 1.4826) * 1e6) / 1e6 AS sigma_t
    FROM med m, mad d"""))

  // --- q193: SKETCHED AUDIENCE OVERLAP — |A∩B| for two user segments
  //     by INCLUSION–EXCLUSION over mergeable HLL sketches:
  //     |A∩B| ≈ |A| + |B| − |A∪B|, with |A∪B| from the REGISTER-WISE
  //     UNION of the two segment sketches (q126's mergeable property —
  //     union is the one set operation HLLs support natively; there is
  //     no intersection sketch, which is exactly why this identity is
  //     the standard production answer). At 100 TB each segment sketch
  //     is built shard-local and merged (q126's path); the exact
  //     distinct-intersection twin computed alongside costs a real
  //     corpus shuffle and exists here as the in-result SELF-CHECK
  //     (`within_tol`: estimate within 10% — generous vs HLL-12's
  //     ~1.6% σ, so the gate is not flaky). No oracle: sketch
  //     internals are engine-specific (q24/q126's category).
  private val q193 = Q(
    "q193_hll_overlap",
    "A5 ✦ sketched audience overlap via inclusion-exclusion (no oracle: sketch)",
    (s, d) => {
      // Proper-subset segments (plain click∩purchase is degenerate on
      // this fixture — every user has both): big-ticket purchasers vs
      // high-value clickers, measured to overlap at ~50-80% of either.
      val e = Tables.events(s, d)
      val segA = col("event_type") === "purchase" && col("value") > 100
      val segB = col("event_type") === "click" && col("value") > 150
      val sk = e.filter(segA || segB)
        .select(when(segA, lit("a")).otherwise(lit("b")).as("seg"),
          col("user_id"))
        .groupBy(col("seg"))
        .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      val ests = sk.agg(
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_union"),
        min(when(col("seg") === "a",
          expr("hll_sketch_estimate(sk)"))).as("est_a"),
        min(when(col("seg") === "b",
          expr("hll_sketch_estimate(sk)"))).as("est_b"))
      val exact = e.filter(segA).select(col("user_id")).distinct()
        .join(e.filter(segB).select(col("user_id")).distinct(),
          Seq("user_id"), "semi")
        .agg(count(lit(1)).as("exact_overlap"))
      ests.crossJoin(broadcast(exact))
        .withColumn("est_overlap",
          col("est_a") + col("est_b") - col("est_union"))
        .select(col("est_a"), col("est_b"), col("est_union"),
          col("est_overlap"), col("exact_overlap"),
          (abs(col("est_overlap") - col("exact_overlap"))
            <= col("exact_overlap") * 0.10).as("within_tol"))
    },
    None)

  // --- q195: TWO-SAMPLE KOLMOGOROV–SMIRNOV TEST — the distribution-
  //     drift gate (did URGENT orders' price distribution drift from
  //     LOW's? same machinery answers "did this week's corpus drift
  //     from last week's?"). D = max |F₁−F₂| is computed EXACTLY:
  //     both empirical CDFs live on the shared integer-cents support
  //     (one histogram with per-side counts, ONE two-phase cumulative
  //     pass carrying both columns), and the sup-gap is maximized in
  //     CROSS-MULTIPLIED INTEGER form — max |cum₁·n₂ − cum₂·n₁| — so
  //     the only float ops are the final D division and the α=0.05
  //     threshold chain (c·√((n₁+n₂)/(n₁n₂)), IEEE-identical from
  //     exact integers; the reject boolean compares two identical
  //     doubles and cannot split engines). The oracle computes the
  //     same statistic off a plain single-window CDF — the naive shape
  //     — cross-checking the two-phase decomposition. max|·| over the
  //     histogram is a map-combined aggregate; nothing here scales
  //     with rows beyond the first groupBy.
  private val q195 = Q(
    "q195_ks_test",
    "A ✦ drift: exact two-sample KS statistic (integer cross-multiplied sup-gap) + α=.05 gate",
    (s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(when(col("o_orderpriority") === "1-URGENT", lit(1L))
            .otherwise(lit(0L)).as("isa"),
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
      val vc = o.groupBy(col("cents"))
        .agg(sum(col("isa")).as("ca"), sum(lit(1L) - col("isa")).as("cb"))
        .withColumn("block", expr("cents div 1048576"))
      val wB = Window.orderBy(col("block"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val off = vc.groupBy(col("block"))
        .agg(sum(col("ca")).as("ba"), sum(col("cb")).as("bb"))
        .withColumn("boffa", sum(col("ba")).over(wB) - col("ba"))
        .withColumn("boffb", sum(col("bb")).over(wB) - col("bb"))
        .select(col("block"), col("boffa"), col("boffb"))
      val wIn = Window.partitionBy(col("block")).orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = vc.join(broadcast(off), Seq("block"))
        .withColumn("cuma", col("boffa") + sum(col("ca")).over(wIn))
        .withColumn("cumb", col("boffb") + sum(col("cb")).over(wIn))
      val tot = vc.agg(sum(col("ca")).as("n1"), sum(col("cb")).as("n2"))
      cum.crossJoin(broadcast(tot))
        .agg(max(abs(col("cuma") * col("n2") - col("cumb") * col("n1")))
          .as("d_num"), min(col("n1")).as("n1"), min(col("n2")).as("n2"))
        .select(col("n1"), col("n2"), col("d_num"),
          fpTrunc(col("d_num").cast("double")
            / (col("n1") * col("n2")).cast("double"), 9).as("d_stat"),
          (col("d_num").cast("double") / (col("n1") * col("n2")).cast("double")
            > lit(1.358) * sqrt((col("n1") + col("n2")).cast("double")
              / (col("n1") * col("n2")).cast("double"))).as("reject_05"))
    },
    Some("""WITH o AS (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS isa,
        CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
    vc AS (
      SELECT cents, CAST(SUM(isa) AS BIGINT) AS ca,
        CAST(SUM(1 - isa) AS BIGINT) AS cb
      FROM o GROUP BY cents),
    cum AS (
      SELECT cents, ca, cb,
        CAST(SUM(ca) OVER (ORDER BY cents) AS BIGINT) AS cuma,
        CAST(SUM(cb) OVER (ORDER BY cents) AS BIGINT) AS cumb
      FROM vc),
    tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS n1,
      CAST(SUM(cb) AS BIGINT) AS n2 FROM vc),
    agg AS (
      SELECT MAX(ABS(cuma * t.n2 - cumb * t.n1)) AS d_num,
        MIN(t.n1) AS n1, MIN(t.n2) AS n2
      FROM cum, tot t)
    SELECT n1, n2, d_num,
      FLOOR((CAST(d_num AS DOUBLE) / CAST(n1 * n2 AS DOUBLE)) * 1e9) / 1e9
        AS d_stat,
      (CAST(d_num AS DOUBLE) / CAST(n1 * n2 AS DOUBLE)
        > 1.358 * SQRT(CAST(n1 + n2 AS DOUBLE) / CAST(n1 * n2 AS DOUBLE)))
        AS reject_05
    FROM agg"""))

  // --- q196: GROUPED WEIGHTED MEDIAN — the quantity-weighted price
  //     median per return flag (the "typical unit price paid" readout
  //     where a 50-unit line must count 50× a 1-unit line). Weighted
  //     quantiles have no Spark builtin; the exact distributed form is
  //     q150's histogram machinery with WEIGHT SUMS in place of counts:
  //     per-(group, value) integer weight totals, a two-phase
  //     cumulative pass (per-group block offsets + block-local window —
  //     frames bounded by the 2²⁰-cent block span), and the lower
  //     weighted median read at threshold (W+1) div 2 — all integer
  //     arithmetic (quantities are integral). The oracle computes the
  //     same statistic off plain per-group windows (the naive shape),
  //     cross-checking the two-phase decomposition like q195.
  private val q196 = Q(
    "q196_weighted_median",
    "A9 ✦ grouped weighted median: per-group weight histograms + two-phase rank",
    (s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_returnflag").as("g"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"),
        col("l_quantity").cast("long").as("w"))
      // persist: the weight histogram feeds three legs (off, cum, tot) —
      // the q191 rule; histogram-sized, harness-released.
      val vc = li.groupBy(col("g"), col("cents")).agg(sum(col("w")).as("wt"))
        .withColumn("block", expr("cents div 1048576"))
        .persist()
      val wB = Window.partitionBy(col("g")).orderBy(col("block"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val off = vc.groupBy(col("g"), col("block"))
        .agg(sum(col("wt")).as("bw"))
        .withColumn("boff", sum(col("bw")).over(wB) - col("bw"))
        .select(col("g"), col("block"), col("boff"))
      val wIn = Window.partitionBy(col("g"), col("block"))
        .orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = vc.join(broadcast(off), Seq("g", "block"))
        .withColumn("cumw", col("boff") + sum(col("wt")).over(wIn))
      val tot = vc.groupBy(col("g")).agg(sum(col("wt")).as("tw"))
      cum.join(broadcast(tot), Seq("g"))
        .filter(col("cumw") >= expr("(tw + 1) div 2"))
        .groupBy(col("g"))
        .agg(min(col("cents")).as("wmedian_cents"), min(col("tw")).as("total_w"))
        .orderBy(col("g"))
    },
    Some("""WITH li AS (
      SELECT l_returnflag AS g,
        CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        CAST(l_quantity AS BIGINT) AS w
      FROM lineitem),
    vc AS (
      SELECT g, cents, CAST(SUM(w) AS BIGINT) AS wt
      FROM li GROUP BY g, cents),
    cum AS (
      SELECT g, cents,
        CAST(SUM(wt) OVER (PARTITION BY g ORDER BY cents) AS BIGINT) AS cumw
      FROM vc),
    tot AS (SELECT g, CAST(SUM(wt) AS BIGINT) AS tw FROM vc GROUP BY g)
    SELECT c.g, MIN(c.cents) AS wmedian_cents, MIN(t.tw) AS total_w
    FROM cum c JOIN tot t ON c.g = t.g
    WHERE c.cumw >= (t.tw + 1) // 2
    GROUP BY c.g ORDER BY c.g"""))

  // --- q199: PARETO / ABC CLASSIFICATION — the inventory-analytics
  //     staple: rank parts by revenue, classify A (top ~80% of revenue),
  //     B (next ~15%), C (tail) off the CUMULATIVE share. Revenue is
  //     exact integer 1e-4-dollar units (price·(1−disc) carries ≤4
  //     decimal digits — the dsl decimal rule), and the class boundary
  //     test is CROSS-MULTIPLIED in DECIMAL(38,0)/HUGEINT —
  //     cum·100 ≤ total·80 — so no share is ever floated before the
  //     boolean (the q195 sup-gap idiom; long·100 would overflow near
  //     ~9e16 total units, well inside 100 TB range). The descending
  //     cumulative sum is the q196 two-phase decomposition on the
  //     PART-sized aggregate: block = u div 2^30 (monotone in u, so
  //     block-desc + in-block u-desc ≡ global u-desc; ties broken by
  //     partkey inside one block since the block key depends only on u),
  //     block offsets via a blocks-sized window, in-block windows
  //     bounded by the $107k revenue span per block. The oracle computes
  //     the same classification off a single naive global window,
  //     cross-checking the decomposition. Shape at 100 TB: one
  //     map-combined lineitem aggregate is the only corpus-scale
  //     shuffle; everything after runs on the parts frame.
  private val q199 = Q(
    "q199_pareto_abc",
    "✦ A ✦ Pareto/ABC revenue classification: two-phase desc prefix sum + cross-multiplied boundaries",
    (s, d) => {
      val rev = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")
            * (lit(1) - col("l_discount").cast("decimal(4,2)")) * 10000)
          .cast("long").as("u"))
        .withColumn("block", expr("u div 1073741824"))
      val wB = Window.orderBy(col("block").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val off = rev.groupBy(col("block")).agg(sum(col("u")).as("bu"))
        .withColumn("boff", sum(col("bu")).over(wB) - col("bu"))
        .select(col("block"), col("boff"))
      val wIn = Window.partitionBy(col("block"))
        .orderBy(col("u").desc, col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = rev.join(broadcast(off), Seq("block"))
        .withColumn("cum", col("boff") + sum(col("u")).over(wIn))
      val tot = rev.agg(sum(col("u")).as("tu"))
      cum.crossJoin(broadcast(tot))
        .withColumn("cls",
          when(col("cum").cast("decimal(38,0)") * 100
            <= col("tu").cast("decimal(38,0)") * 80, "A")
            .when(col("cum").cast("decimal(38,0)") * 100
              <= col("tu").cast("decimal(38,0)") * 95, "B")
            .otherwise("C"))
        .groupBy(col("cls"))
        .agg(count(lit(1)).as("n_parts"), sum(col("u")).as("rev_units"),
          min(col("tu")).as("tu"))
        .select(col("cls"), col("n_parts"), col("rev_units"),
          fpTrunc(col("rev_units").cast("double") / col("tu").cast("double"),
            9).as("rev_share"))
        .orderBy(col("cls"))
    },
    Some(s"""WITH r AS (
      SELECT l_partkey,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
          * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000) AS BIGINT) AS u
      FROM lineitem GROUP BY 1),
    c AS (SELECT l_partkey, u,
      CAST(SUM(u) OVER (ORDER BY u DESC, l_partkey) AS BIGINT) AS cum
      FROM r),
    t AS (SELECT CAST(SUM(u) AS BIGINT) AS tu FROM r),
    k AS (SELECT CASE
        WHEN CAST(cum AS HUGEINT) * 100 <= CAST(t.tu AS HUGEINT) * 80
          THEN 'A'
        WHEN CAST(cum AS HUGEINT) * 100 <= CAST(t.tu AS HUGEINT) * 95
          THEN 'B'
        ELSE 'C' END AS cls, u, t.tu AS tu FROM c, t)
    SELECT cls, COUNT(*) AS n_parts, CAST(SUM(u) AS BIGINT) AS rev_units,
      ${fpTruncSql(
        "CAST(CAST(SUM(u) AS BIGINT) AS DOUBLE) / CAST(MIN(tu) AS DOUBLE)",
        9)} AS rev_share
    FROM k GROUP BY cls ORDER BY cls"""))

  // --- q202: GINI COEFFICIENT of customer spend — the inequality /
  //     concentration readout (how skewed is revenue across the customer
  //     base; the same statistic audits token-count concentration across
  //     training sources). G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx) over spend
  //     sorted ascending. The global rank i is NOT a global window: it
  //     is the q135/q164 two-phase rank — COUNT offsets per 2²⁰-cent
  //     block (blocks-sized window) + in-block row_number bounded by the
  //     block span, ties broken (x, custkey) inside one block since the
  //     block key depends only on x. Every aggregate is an exact long
  //     (2·Σi·x ≈ 6e15 at sf0.1 — inside both long range and double-
  //     exact 2^53; a 100 TB deployment promotes Σi·x to DECIMAL(38,0));
  //     the Gini itself is ONE double division of two exact integers.
  //     The oracle ranks with a naive global ROW_NUMBER, cross-checking
  //     the decomposition.
  private val q202 = Q(
    "q202_gini",
    "✦ A ✦ Gini coefficient of customer spend: two-phase global rank, exact integer Σi·x",
    (s, d) => {
      val spend = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long")).as("x"))
        .withColumn("block", expr("x div 1048576"))
      val wB = Window.orderBy(col("block"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val off = spend.groupBy(col("block")).agg(count(lit(1)).as("bn"))
        .withColumn("boff", sum(col("bn")).over(wB) - col("bn"))
        .select(col("block"), col("boff"))
      val wIn = Window.partitionBy(col("block"))
        .orderBy(col("x"), col("o_custkey"))
      val ranked = spend.join(broadcast(off), Seq("block"))
        .withColumn("i", col("boff") + row_number().over(wIn))
      ranked.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("i") * col("x")).as("six"))
        .select(col("n"), col("sx").as("total_cents"),
          ((lit(2L) * col("six") - (col("n") + lit(1L)) * col("sx"))
            .cast("double")
            / (col("n") * col("sx")).cast("double")).as("gini"))
    },
    Some("""WITH s AS (SELECT o_custkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS x
      FROM orders GROUP BY 1),
    r AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x, o_custkey) AS i FROM s),
    a AS (SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx,
        CAST(SUM(i * x) AS BIGINT) AS six FROM r)
    SELECT n, sx AS total_cents,
      CAST(2 * six - (n + 1) * sx AS DOUBLE) / CAST(n * sx AS DOUBLE)
        AS gini
    FROM a"""))

  // --- q205: COUNT-MIN SKETCH HEAVY HITTERS — the streaming frequency
  //     sketch beside the HLL (q24/q126/q193) and quantile (q181)
  //     families: a 4×1024 integer counter matrix answers "how often did
  //     item x appear" within ε·N overcount, in O(w·d) space per shard,
  //     mergeable by element-wise sum (kappa re-aggregation). Unlike
  //     engine HLL the whole sketch is DETERMINISTIC here — rows are
  //     hashed with dsl.hashMod2 (seeded per depth row by +r·1000003) —
  //     so the ORACLE REBUILDS THE IDENTICAL SKETCH in DuckDB from the
  //     shared hash builder: full hash-match gate, not a rows-only
  //     check (what q126 could not have). The estimate for the exact
  //     top-10 parts is min over the 4 probed counters; `overcount ≥ 0`
  //     surfaces the one-sided CMS error in-result. Shape at 100 TB:
  //     the sketch build is one map-combined groupBy onto d·w = 4096
  //     cells regardless of corpus size; probes are a broadcast join
  //     against those cells.
  private val q205 = Q(
    "q205_cms_heavy_hitters",
    "A5 ✦ count-min sketch heavy hitters: deterministic seeded hashes, oracle rebuilds the sketch",
    (s, d) => {
      val depth = 4
      val width = 1024L
      val stream = Tables.lineitem(s, d).select(col("l_partkey").as("item"))
      val rs = array((0 until depth).map(r => lit(r.toLong)): _*)
      val cms = stream.withColumn("r", explode(rs))
        .withColumn("bucket",
          hashMod2L(col("item") + col("r") * lit(1000003L), lit(width)))
        .groupBy(col("r"), col("bucket")).agg(count(lit(1)).as("c"))
      val exact = stream.groupBy(col("item")).agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("item")).limit(10)
      val n = stream.agg(count(lit(1)).as("n_stream"))
      exact.withColumn("r", explode(rs))
        .withColumn("bucket",
          hashMod2L(col("item") + col("r") * lit(1000003L), lit(width)))
        .join(broadcast(cms), Seq("r", "bucket"))
        .groupBy(col("item"), col("exact_n")).agg(min(col("c")).as("cms_est"))
        .crossJoin(broadcast(n))
        .select(col("item"), col("exact_n"), col("cms_est"),
          (col("cms_est") - col("exact_n")).as("overcount"), col("n_stream"))
        .orderBy(col("exact_n").desc, col("item"))
    },
    Some(s"""WITH st AS (SELECT l_partkey AS item FROM lineitem),
    rs AS (SELECT CAST(r AS BIGINT) AS r
      FROM (VALUES (0), (1), (2), (3)) t(r)),
    cms AS (SELECT r,
        ${hashMod2LSql("(item + r * 1000003)", "1024")} AS bucket,
        COUNT(*) AS c
      FROM st CROSS JOIN rs GROUP BY 1, 2),
    ex AS (SELECT item, COUNT(*) AS exact_n FROM st GROUP BY 1
      ORDER BY exact_n DESC, item LIMIT 10),
    pr AS (SELECT ex.item, ex.exact_n, rs.r,
        ${hashMod2LSql("(ex.item + rs.r * 1000003)", "1024")} AS bucket
      FROM ex CROSS JOIN rs),
    est AS (SELECT pr.item, pr.exact_n,
        CAST(MIN(cms.c) AS BIGINT) AS cms_est
      FROM pr JOIN cms ON pr.r = cms.r AND pr.bucket = cms.bucket
      GROUP BY 1, 2),
    n AS (SELECT COUNT(*) AS n_stream FROM st)
    SELECT est.item AS item, est.exact_n AS exact_n, est.cms_est AS cms_est,
      CAST(est.cms_est - est.exact_n AS BIGINT) AS overcount,
      n.n_stream AS n_stream
    FROM est, n ORDER BY exact_n DESC, item"""))

  // --- q207: ORDER→SHIP LAG PERCENTILES PER PRIORITY — the SLA readout
  //     (how long until goods ship, p50/p90/p99 by priority class) and
  //     the one quantile query here whose INPUT is a fact-fact join:
  //     lineitem⋈orders on the order key, the canonical corpus-scale
  //     shuffle join that AQE plans (and can skew-split) — no dimension
  //     broadcast shortcut exists. Lags are exact integer DAYS (both
  //     engines difference date-valued timestamps exactly), so the
  //     distribution collapses to a per-priority value histogram ~100
  //     values wide — the cumulative window runs on that tiny frame with
  //     no block decomposition needed (unlike q150's cent-grained
  //     support). Ranks use the round-10 integer ceil-division rule
  //     ((p·n+99) div 100 — never a double CEIL, the r10 ledger trap).
  //     The oracle reads the same ranks off a naive ROW_NUMBER over raw
  //     rows, cross-checking the histogram path.
  private val q207 = Q(
    "q207_ship_lag_percentiles",
    "A9 ✦ order→ship lag p50/p90/p99 per priority: fact-fact equi-join + histogram rank",
    (s, d) => {
      val lag = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_shipdate"))
        .join(Tables.orders(s, d).select(col("o_orderkey"),
          col("o_orderdate"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority").as("pri"),
          datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
            .as("lag"))
      val vc = lag.groupBy(col("pri"), col("lag")).agg(count(lit(1)).as("c"))
      val wC = Window.partitionBy(col("pri")).orderBy(col("lag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = vc.withColumn("cum", sum(col("c")).over(wC))
      val tot = vc.groupBy(col("pri")).agg(sum(col("c")).as("n"))
      val j = cum.join(broadcast(tot), Seq("pri"))
      def pick(p: Int, name: String) =
        j.filter(col("cum") >= expr(s"($p * n + 99) div 100"))
          .groupBy(col("pri")).agg(min(col("lag")).as(name))
      pick(50, "p50").join(pick(90, "p90"), Seq("pri"))
        .join(pick(99, "p99"), Seq("pri"))
        .join(broadcast(tot), Seq("pri"))
        .orderBy(col("pri"))
    },
    Some("""WITH l AS (
      SELECT o.o_orderpriority AS pri,
        CAST(date_diff('day', o.o_orderdate, li.l_shipdate) AS BIGINT)
          AS lag
      FROM lineitem li JOIN orders o ON li.l_orderkey = o.o_orderkey),
    r AS (SELECT pri, lag,
        ROW_NUMBER() OVER (PARTITION BY pri ORDER BY lag) AS rn,
        COUNT(*) OVER (PARTITION BY pri) AS n
      FROM l)
    SELECT pri,
      CAST(MIN(CASE WHEN rn = (50 * n + 99) // 100 THEN lag END)
        AS BIGINT) AS p50,
      CAST(MIN(CASE WHEN rn = (90 * n + 99) // 100 THEN lag END)
        AS BIGINT) AS p90,
      CAST(MIN(CASE WHEN rn = (99 * n + 99) // 100 THEN lag END)
        AS BIGINT) AS p99,
      MIN(n) AS n
    FROM r GROUP BY pri ORDER BY pri"""))

  // --- q222: DETERMINISTIC PERMUTATION (randomization) TEST — the
  //     nonparametric significance gate beside q179's z and q195's KS:
  //     is the click-vs-error mean-value gap larger than chance? The 16
  //     re-randomizations are HASH permutations (hashMod2L over
  //     event_id, seeded per replicate — the no-rand() rule, so the
  //     p-value is reproducible to the bit), each reduced map-side to
  //     four integer sums in one 16×-exploded pass. The "as extreme"
  //     comparison NEVER floats a mean: |ps_a·pn_b − ps_b·pn_a|·n_a·n_b
  //     ≥ |s_a·n_b − s_b·n_a|·pn_a·pn_b in DECIMAL(38,0)/HUGEINT
  //     (~28 digits at sf0.1 — past long, inside both engines' exact
  //     range). p = (n_extreme+1)/(B+1), the standard add-one estimate,
  //     one exact division.
  private val q222 = Q(
    "q222_permutation_test",
    "A ✦ deterministic permutation test: click-vs-error mean gap, 16 hash re-randomizations",
    (s, d) => {
      val e = Tables.events(s, d)
        .filter(col("event_type").isin("click", "error"))
        .select(col("event_id"),
          when(col("event_type") === "click", lit(1L)).otherwise(lit(0L))
            .as("isa"),
          (col("value").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
      val obs = e.agg(
        sum(when(col("isa") === 1, col("cents"))).as("sa"),
        sum(col("isa")).as("na"),
        sum(when(col("isa") === 0, col("cents"))).as("sb"),
        sum(lit(1L) - col("isa")).as("nb"))
      val bs = array((1 to 16).map(b => lit(b.toLong)): _*)
      val perms = e.withColumn("b", explode(bs))
        .withColumn("pa", hashMod2L(col("event_id") * 32 + col("b"),
          lit(2L)))
        .groupBy(col("b")).agg(
          sum(when(col("pa") === 1, col("cents"))).as("psa"),
          sum(col("pa")).as("pna"),
          sum(when(col("pa") === 0, col("cents"))).as("psb"),
          sum(lit(1L) - col("pa")).as("pnb"))
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val extreme = perms.crossJoin(broadcast(obs))
        .withColumn("lhs",
          abs(dec(col("psa")) * col("pnb") - dec(col("psb")) * col("pna"))
            * (dec(col("na")) * col("nb")))
        .withColumn("rhs",
          abs(dec(col("sa")) * col("nb") - dec(col("sb")) * col("na"))
            * (dec(col("pna")) * col("pnb")))
        .agg(sum(when(col("lhs") >= col("rhs"), lit(1L)).otherwise(lit(0L)))
          .as("n_extreme"))
      extreme.crossJoin(broadcast(obs))
        .select(col("n_extreme"),
          fpTrunc(col("sa").cast("double") / col("na").cast("double")
            - col("sb").cast("double") / col("nb").cast("double"), 9)
            .as("diff_obs_cents"),
          ((col("n_extreme") + 1).cast("double") / lit(17.0)).as("p_value"))
    },
    Some(s"""WITH e AS (
      SELECT event_id,
        CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS isa,
        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events WHERE event_type IN ('click', 'error')),
    obs AS (SELECT
        CAST(SUM(CASE WHEN isa = 1 THEN cents END) AS BIGINT) AS sa,
        CAST(SUM(isa) AS BIGINT) AS na,
        CAST(SUM(CASE WHEN isa = 0 THEN cents END) AS BIGINT) AS sb,
        CAST(SUM(1 - isa) AS BIGINT) AS nb
      FROM e),
    bs AS (SELECT CAST(b AS BIGINT) AS b FROM (VALUES (1), (2), (3), (4),
      (5), (6), (7), (8), (9), (10), (11), (12), (13), (14), (15), (16))
      t(b)),
    perms AS (SELECT b,
        CAST(SUM(CASE WHEN pa = 1 THEN cents END) AS BIGINT) AS psa,
        CAST(SUM(pa) AS BIGINT) AS pna,
        CAST(SUM(CASE WHEN pa = 0 THEN cents END) AS BIGINT) AS psb,
        CAST(SUM(1 - pa) AS BIGINT) AS pnb
      FROM (SELECT e.cents, bs.b,
          ${hashMod2LSql("e.event_id * 32 + bs.b", "2")} AS pa
        FROM e CROSS JOIN bs)
      GROUP BY b),
    x AS (SELECT CAST(SUM(CASE WHEN
        ABS(CAST(psa AS HUGEINT) * pnb - CAST(psb AS HUGEINT) * pna)
          * (CAST(na AS HUGEINT) * nb)
        >= ABS(CAST(sa AS HUGEINT) * nb - CAST(sb AS HUGEINT) * na)
          * (CAST(pna AS HUGEINT) * pnb)
        THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
      FROM perms CROSS JOIN obs)
    SELECT x.n_extreme,
      ${fpTruncSql(
        "CAST(o.sa AS DOUBLE) / CAST(o.na AS DOUBLE) - CAST(o.sb AS DOUBLE) / CAST(o.nb AS DOUBLE)",
        9)} AS diff_obs_cents,
      CAST(x.n_extreme + 1 AS DOUBLE) / 17.0 AS p_value
    FROM x CROSS JOIN obs o"""))

  // --- q257: ORDER-OF-MAGNITUDE HISTOGRAM — the log-scale distribution
  //     profile WITHOUT log(): the decade bucket of an exact integer is
  //     its DIGIT COUNT (length of the decimal rendering), and both
  //     engines render a BIGINT identically — so the histogram that
  //     would normally be floor(log10(x)) (ln() is engine-unstable,
  //     ledger rule) is pure string arithmetic on exact cents. The
  //     profile that catches unit-confusion bugs (a 100× price error
  //     shifts two buckets) in one map-combined aggregate pass.
  private val q257 = Q(
    "q257_magnitude_histogram",
    "A7 ✦ order-of-magnitude (digit-count) histogram of order totals — log-free decade buckets",
    (s, d) => {
      val c = Tables.orders(s, d)
        .select((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
      c.groupBy(length(col("cents").cast("string")).cast("long")
          .as("digits"))
        .agg(count(lit(1)).as("n"), min(col("cents")).as("min_cents"),
          max(col("cents")).as("max_cents"),
          sum(col("cents")).as("sum_cents"))
        .orderBy(col("digits"))
    },
    Some("""SELECT CAST(length(CAST(cents AS VARCHAR)) AS BIGINT)
        AS digits,
      CAST(COUNT(*) AS BIGINT) AS n,
      MIN(cents) AS min_cents, MAX(cents) AS max_cents,
      CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        AS BIGINT) AS cents FROM orders)
    GROUP BY 1 ORDER BY digits"""))

  // --- q249: ABC × XYZ INVENTORY MATRIX — q199's revenue Pareto class
  //     crossed with the demand-VARIABILITY class (XYZ): per part, the
  //     coefficient of variation of monthly demand decides X (steady,
  //     cv ≤ 0.5), Y (cv ≤ 1) or Z (erratic). Missing months count as
  //     zero demand, which costs nothing extra: with the global month
  //     count M broadcast, Σx and Σx² over all M months equal the sums
  //     over present months, so cv² = M·Σx²/(Σx)² − 1 needs no
  //     densification. Both class boundaries are CROSS-MULTIPLIED
  //     integer comparisons in wide decimal (4·M·Σx² ≤ 5·(Σx)² for X;
  //     M·Σx² ≤ 2·(Σx)² for Y) — no sqrt, no division, no float
  //     boundary. The ABC leg reuses q199's two-phase desc prefix-sum
  //     rank verbatim. Output is the 9-cell planning matrix.
  private val q249 = Q(
    "q249_abc_xyz",
    "✦ inventory: ABC×XYZ matrix — Pareto revenue class × integer-CV variability class",
    (s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_partkey"),
        (year(col("l_shipdate")) * 12 + month(col("l_shipdate")))
          .cast("long").as("m"),
        (col("l_quantity").cast("decimal(18,2)") * 100).cast("long")
          .as("qc"),
        (col("l_extendedprice").cast("decimal(18,2)")
          * (lit(1) - col("l_discount").cast("decimal(4,2)")) * 10000)
          .as("ru"))
      // ONE lineitem pass (r18): the r18 stage profile showed the fact
      // table scanned three times (pm, rev, mTot) at ~0.9 s of
      // decimal-projection CPU each — the monthly grain subsumes all
      // three readouts (revenue per part = exact decimal sum of its
      // monthly sums; distinct months ride the same frame), so the
      // scan+shuffle happens once and the (part × month) cache serves
      // the rest. persist is harness-owned (q47's rule).
      val pm = li.groupBy(col("l_partkey"), col("m"))
        .agg(sum(col("qc")).as("x"), sum(col("ru")).as("rum"))
        .persist()
      val mTot = pm.select(col("m")).distinct()
        .agg(count(lit(1)).as("mm"))
      val xyz = pm.groupBy(col("l_partkey"))
        .agg(sum(col("x")).as("sx"),
          sum(col("x") * col("x")).as("sx2"))
        .crossJoin(broadcast(mTot))
        .withColumn("xyz",
          when(col("mm").cast("decimal(38,0)") * col("sx2") * 4
            <= col("sx").cast("decimal(38,0)") * col("sx") * 5, "X")
            .when(col("mm").cast("decimal(38,0)") * col("sx2")
              <= col("sx").cast("decimal(38,0)") * col("sx") * 2, "Y")
            .otherwise("Z"))
        .select(col("l_partkey"), col("xyz"))
      val rev = pm.groupBy(col("l_partkey"))
        .agg(sum(col("rum")).cast("long").as("u"))
        .withColumn("block", expr("u div 1073741824"))
      val wB = Window.orderBy(col("block").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val off = rev.groupBy(col("block")).agg(sum(col("u")).as("bu"))
        .withColumn("boff", sum(col("bu")).over(wB) - col("bu"))
        .select(col("block"), col("boff"))
      val wIn = Window.partitionBy(col("block"))
        .orderBy(col("u").desc, col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = rev.join(broadcast(off), Seq("block"))
        .withColumn("cum", col("boff") + sum(col("u")).over(wIn))
      val tot = rev.agg(sum(col("u")).as("tu"))
      val abc = cum.crossJoin(broadcast(tot))
        .withColumn("abc",
          when(col("cum").cast("decimal(38,0)") * 100
            <= col("tu").cast("decimal(38,0)") * 80, "A")
            .when(col("cum").cast("decimal(38,0)") * 100
              <= col("tu").cast("decimal(38,0)") * 95, "B")
            .otherwise("C"))
        .select(col("l_partkey"), col("abc"))
      abc.join(xyz, Seq("l_partkey"))
        .groupBy(col("abc"), col("xyz"))
        .agg(count(lit(1)).as("n_parts"))
        .orderBy(col("abc"), col("xyz"))
    },
    Some("""WITH li AS (SELECT l_partkey,
        YEAR(l_shipdate) * 12 + MONTH(l_shipdate) AS m,
        CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qc,
        CAST(l_extendedprice AS DECIMAL(18,2))
          * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS ru
      FROM lineitem),
    pm AS (SELECT l_partkey, m, CAST(SUM(qc) AS BIGINT) AS x
      FROM li GROUP BY 1, 2),
    mt AS (SELECT COUNT(DISTINCT m) AS mm FROM li),
    st AS (SELECT l_partkey, CAST(SUM(x) AS BIGINT) AS sx,
        CAST(SUM(x * x) AS BIGINT) AS sx2
      FROM pm GROUP BY 1),
    xyz AS (SELECT l_partkey, CASE
        WHEN CAST(mm AS HUGEINT) * sx2 * 4 <= CAST(sx AS HUGEINT) * sx * 5
          THEN 'X'
        WHEN CAST(mm AS HUGEINT) * sx2 <= CAST(sx AS HUGEINT) * sx * 2
          THEN 'Y'
        ELSE 'Z' END AS xyz
      FROM st, mt),
    r AS (SELECT l_partkey, CAST(SUM(ru) AS BIGINT) AS u
      FROM li GROUP BY 1),
    c AS (SELECT l_partkey, u,
        CAST(SUM(u) OVER (ORDER BY u DESC, l_partkey) AS BIGINT) AS cum
      FROM r),
    t AS (SELECT CAST(SUM(u) AS BIGINT) AS tu FROM r),
    abc AS (SELECT l_partkey, CASE
        WHEN CAST(cum AS HUGEINT) * 100 <= CAST(t.tu AS HUGEINT) * 80
          THEN 'A'
        WHEN CAST(cum AS HUGEINT) * 100 <= CAST(t.tu AS HUGEINT) * 95
          THEN 'B'
        ELSE 'C' END AS abc
      FROM c, t)
    SELECT abc, xyz, CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM abc JOIN xyz USING (l_partkey)
    GROUP BY 1, 2 ORDER BY 1, 2"""))

  // --- q245: RFM SEGMENTATION — the classic marketing cube: every
  //     purchasing user scored 1–5 on Recency (days since last purchase,
  //     5 = most recent), Frequency (purchase count) and Monetary
  //     (lifetime cents), then bucketed into R×F×M segments. Each score
  //     is an independent q202-style TWO-PHASE GLOBAL RANK (value-range
  //     blocks; tiny block-offset frame; in-block ROW_NUMBER) with the
  //     quintile as pure integer arithmetic on the rank — ((i−1)·5)
  //     div n — so bin edges are engine-exact and no dimension ever
  //     sorts on one task. The reference day is the corpus's own max
  //     purchase day (a 1-row broadcast), keeping the query
  //     fixture-relative. Output is the non-empty segment histogram
  //     with exact cents totals; avg is the one presentation division.
  private val q245 = Q(
    "q245_rfm_segmentation",
    "✦ marketing: RFM quintile segmentation via three two-phase global ranks",
    (s, d) => {
      val p = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
          expr("(ts div 1000) div 86400000000").as("dd"),
          (col("value").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
      // agg persists (r18): five subplans read it (three score5 ranks,
      // the final join, dmax's sibling) and each un-cached reference
      // re-ran the events scan + filter + user aggregate — the r18
      // profile showed four redundant single-split event scans at
      // ~0.3 s each. User-grain rows are corpus-bounded; the cache is
      // harness-owned (q47's rule). dmax reads agg too: the max of
      // per-user maxima is the corpus max, one cache read instead of a
      // fifth scan.
      val agg = p.groupBy(col("user_id"))
        .agg(max(col("dd")).as("last_dd"), count(lit(1)).as("f"),
          sum(col("cents")).as("m"))
        .persist()
      val dmax = agg.agg(max(col("last_dd")).as("dmax"))
      // score5: two-phase rank of (user_id, v) asc; quintile from rank.
      def score5(vals: DataFrame, blockDiv: Long, hi: Boolean,
          name: String): DataFrame = {
        val b = vals.withColumn("block", expr(s"v div $blockDiv"))
        val wB = Window.orderBy(col("block"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val off = b.groupBy(col("block")).agg(count(lit(1)).as("bn"))
          .withColumn("boff", sum(col("bn")).over(wB) - col("bn"))
          .select(col("block"), col("boff"))
        val wIn = Window.partitionBy(col("block"))
          .orderBy(col("v"), col("user_id"))
        val ranked = b.join(broadcast(off), Seq("block"))
          .withColumn("i", col("boff") + row_number().over(wIn))
        val n1 = ranked.agg(count(lit(1)).as("n"))
        val base = ranked.crossJoin(broadcast(n1))
        (if (hi) base.select(col("user_id"),
          (expr("((i - 1) * 5) div n") + lit(1L)).as(name))
        else base.select(col("user_id"),
          (lit(5L) - expr("((i - 1) * 5) div n")).as(name)))
      }
      val rs = score5(agg.crossJoin(broadcast(dmax))
        .select(col("user_id"), (col("dmax") - col("last_dd")).as("v")),
        8L, hi = false, "r_score")
      val fs = score5(agg.select(col("user_id"), col("f").as("v")),
        8L, hi = true, "f_score")
      val ms = score5(agg.select(col("user_id"), col("m").as("v")),
        1048576L, hi = true, "m_score")
      rs.join(fs, Seq("user_id")).join(ms, Seq("user_id"))
        .join(agg.select(col("user_id"), col("m")), Seq("user_id"))
        .groupBy(col("r_score"), col("f_score"), col("m_score"))
        .agg(count(lit(1)).as("n_users"), sum(col("m")).as("m_cents"))
        .select(col("r_score"), col("f_score"), col("m_score"),
          col("n_users"), col("m_cents"),
          (col("m_cents").cast("double") / col("n_users"))
            .as("avg_m_cents"))
        .orderBy(col("r_score"), col("f_score"), col("m_score"))
    },
    Some("""WITH p AS (SELECT user_id,
        epoch_us(ts) // 86400000000 AS dd,
        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'),
    agg AS (SELECT user_id, MAX(dd) AS last_dd,
        CAST(COUNT(*) AS BIGINT) AS f, CAST(SUM(cents) AS BIGINT) AS m
      FROM p GROUP BY 1),
    mx AS (SELECT MAX(dd) AS dmax FROM p),
    rr AS (SELECT user_id,
        ROW_NUMBER() OVER (ORDER BY dmax - last_dd, user_id) AS i,
        COUNT(*) OVER () AS n
      FROM agg, mx),
    rs AS (SELECT user_id, 5 - ((i - 1) * 5) // n AS r_score FROM rr),
    fr AS (SELECT user_id,
        ROW_NUMBER() OVER (ORDER BY f, user_id) AS i,
        COUNT(*) OVER () AS n FROM agg),
    fs AS (SELECT user_id, ((i - 1) * 5) // n + 1 AS f_score FROM fr),
    mr AS (SELECT user_id,
        ROW_NUMBER() OVER (ORDER BY m, user_id) AS i,
        COUNT(*) OVER () AS n FROM agg),
    ms AS (SELECT user_id, ((i - 1) * 5) // n + 1 AS m_score FROM mr)
    SELECT r_score, f_score, m_score,
      CAST(COUNT(*) AS BIGINT) AS n_users,
      CAST(SUM(m) AS BIGINT) AS m_cents,
      CAST(SUM(m) AS DOUBLE) / COUNT(*) AS avg_m_cents
    FROM rs JOIN fs USING (user_id) JOIN ms USING (user_id)
      JOIN agg USING (user_id)
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""))

  // --- q241: EMPIRICAL CDF EVALUATION — the inverse of the quantile
  //     family (q26/q150/q153 answer "what value sits at percentile p";
  //     this answers "what percentile is value X"): evaluate the customer
  //     lifetime-spend ECDF at fixed business thresholds. The thresholds
  //     are a 4-row inline frame broadcast against the customer-spend
  //     aggregate, so the evaluation is one conditional-sum pass over
  //     customers — never a rank/sort of the data, which is what makes
  //     "where does $X fall" O(scan) instead of O(global sort) at any
  //     scale. Counts are exact integers; each ecdf is one double
  //     division.
  private val q241 = Q(
    "q241_ecdf_eval",
    "A9-inverse ✦: empirical CDF of customer spend evaluated at fixed thresholds",
    (s, d) => {
      import s.implicits._
      val spend = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long")).as("x"))
      val th = Seq(10000L, 1000000L, 10000000L, 30000000L).toDF("t_cents")
      spend.crossJoin(broadcast(th))
        .groupBy(col("t_cents"))
        .agg(sum(when(col("x") <= col("t_cents"), 1L).otherwise(0L))
          .as("n_le"), count(lit(1)).as("n"))
        .select(col("t_cents"), col("n_le"), col("n"),
          (col("n_le").cast("double") / col("n")).as("ecdf"))
        .orderBy(col("t_cents"))
    },
    Some("""WITH s AS (SELECT o_custkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS x
      FROM orders GROUP BY 1),
    th(t0) AS (VALUES (10000), (1000000), (10000000), (30000000))
    SELECT CAST(t0 AS BIGINT) AS t_cents,
      CAST(SUM(CASE WHEN x <= t0 THEN 1 ELSE 0 END) AS BIGINT) AS n_le,
      CAST(COUNT(*) AS BIGINT) AS n,
      CAST(SUM(CASE WHEN x <= t0 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
        AS ecdf
    FROM s, th GROUP BY t0 ORDER BY t_cents"""))

  // --- q240: DECILE LIFT / GAINS TABLE — the model-evaluation readout
  //     (score deciles × conversion): users ranked by total purchase
  //     spend, split into 10 equal-count bins, per-bin signup-conversion
  //     rate, lift vs the base rate, and cumulative capture — the gains
  //     chart every targeting model ships with. Ranking is q202's
  //     two-phase global rank (value-range blocks + tiny block-offset
  //     frame + in-block ROW_NUMBER — no single-partition window over
  //     users); the decile is pure integer arithmetic on the rank,
  //     10 − ((i−1)·10) div n, so bin edges are engine-exact; rates,
  //     lift and capture are single double divisions of exact integer
  //     counts (lift = conv_d·N / (n_d·CONV), cross-multiplied before
  //     the one cast). The cumulative window runs over the 10-row
  //     decile frame only.
  private val q240 = Q(
    "q240_decile_lift",
    "✦ model eval: spend-decile lift/gains table (two-phase rank, integer bin edges)",
    (s, d) => {
      val ev = Tables.events(s, d)
      val spend = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
          .as("x"))
      val conv = ev.filter(col("event_type") === "signup")
        .select(col("user_id")).distinct().withColumn("converted", lit(1L))
      val scored = spend.join(conv, Seq("user_id"), "left")
        .withColumn("converted", coalesce(col("converted"), lit(0L)))
        .withColumn("block", expr("x div 1048576"))
      val wB = Window.orderBy(col("block"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val off = scored.groupBy(col("block")).agg(count(lit(1)).as("bn"))
        .withColumn("boff", sum(col("bn")).over(wB) - col("bn"))
        .select(col("block"), col("boff"))
      val wIn = Window.partitionBy(col("block"))
        .orderBy(col("x"), col("user_id"))
      val ranked = scored.join(broadcast(off), Seq("block"))
        .withColumn("i", col("boff") + row_number().over(wIn))
      val tot = ranked.agg(count(lit(1)).as("n"),
        sum(col("converted")).as("cv"))
      val dec = ranked.crossJoin(broadcast(tot))
        .withColumn("decile",
          lit(10L) - expr("((i - 1) * 10) div n"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_users"), sum(col("converted")).as("n_conv"),
          max(col("n")).as("n"), max(col("cv")).as("cv"))
      val wCum = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dec
        .withColumn("cum_conv", sum(col("n_conv")).over(wCum))
        .select(col("decile"), col("n_users"), col("n_conv"),
          (col("n_conv").cast("double") / col("n_users")).as("conv_rate"),
          ((col("n_conv") * col("n")).cast("double")
            / (col("n_users") * col("cv"))).as("lift"),
          (col("cum_conv").cast("double") / col("cv")).as("cum_capture"))
        .orderBy(col("decile"))
    },
    Some("""WITH spend AS (SELECT user_id,
        CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
          AS BIGINT) AS x
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    conv AS (SELECT DISTINCT user_id, CAST(1 AS BIGINT) AS converted
      FROM events WHERE event_type = 'signup'),
    scored AS (SELECT s.user_id, x, COALESCE(converted, 0) AS converted
      FROM spend s LEFT JOIN conv USING (user_id)),
    r AS (SELECT x, converted,
        ROW_NUMBER() OVER (ORDER BY x, user_id) AS i FROM scored),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(converted) AS BIGINT) AS cv FROM r),
    dec AS (SELECT 10 - ((i - 1) * 10) // n AS decile,
        CAST(COUNT(*) AS BIGINT) AS n_users,
        CAST(SUM(converted) AS BIGINT) AS n_conv,
        MAX(n) AS n, MAX(cv) AS cv
      FROM r, t GROUP BY 1)
    SELECT decile, n_users, n_conv,
      CAST(n_conv AS DOUBLE) / n_users AS conv_rate,
      CAST(n_conv * n AS DOUBLE) / (n_users * cv) AS lift,
      CAST(SUM(n_conv) OVER (ORDER BY decile
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / cv
        AS cum_capture
    FROM dec ORDER BY decile"""))

  // --- q272: POPULATION STABILITY INDEX — the model-monitoring drift
  //     metric beside q195's KS: bucket the CURRENT period's price
  //     distribution by the REFERENCE period's decile edges and score
  //     PSI = Σ (pᵢ−qᵢ)·ln(pᵢ/qᵢ). Reference decile edges are EXACT
  //     lower-quantile integers off the blocked two-phase histogram
  //     rank (the q150 construction — no global window); bucket
  //     assignment is a broadcast 9-element sorted-edge array probed by
  //     a HOF count (cents > e fold) — a codegen'd projection, no ×9
  //     row blowup. Shares are Laplace-(+1)-smoothed so an empty
  //     current bucket cannot produce ±∞ — counts stay exact integers
  //     until the two share divisions. ln() is not bit-identical across
  //     engines (the q161 ulp note), so per-bucket contributions AND
  //     the bin-ordered sequential-fold total are presented through
  //     fpTrunc(·, 9) — same discipline as q189's MI.
  private val q272 = Q(
    "q272_psi_drift",
    "✦ drift: population stability index — reference-decile buckets, smoothed shares, exact-integer machinery",
    (s, d) => {
      val cents = (col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
      val o = Tables.orders(s, d)
        .select(year(col("o_orderdate")).as("yy"), cents.as("cents"))
      val ref = o.filter(col("yy").between(1995, 1996))
      val cur = o.filter(col("yy").between(1997, 1998))
      val vc = ref.groupBy(col("cents")).agg(count(lit(1)).as("cnt"))
        .withColumn("block", expr("cents div 1048576"))
      val wB = Window.orderBy(col("block"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val off = vc.groupBy(col("block")).agg(sum(col("cnt")).as("bn"))
        .withColumn("boff", sum(col("bn")).over(wB) - col("bn"))
        .select(col("block"), col("boff"))
      val wIn = Window.partitionBy(col("block")).orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = vc.join(broadcast(off), Seq("block"))
        .withColumn("cumend", col("boff") + sum(col("cnt")).over(wIn))
        .select(col("cents"), col("cumend"))
      val nF = vc.agg(sum(col("cnt")).as("n"))
      val edges = cum.crossJoin(broadcast(nF))
        .select(col("cents"), col("cumend"),
          explode(sequence(lit(1L), lit(9L))).as("k"), col("n"))
        .groupBy(col("k"))
        .agg(min(when(col("cumend") * 10 >= col("k") * col("n"),
          col("cents"))).as("e"))
        .agg(array_sort(collect_list(col("e"))).as("es"))
      def bucketed(df: DataFrame, name: String) =
        df.crossJoin(broadcast(edges))
          .select((lit(1L) + aggregate(col("es"), lit(0L),
            (acc, e) => acc + when(col("cents") > e, 1L).otherwise(0L)))
            .as("bin"))
          .groupBy(col("bin")).agg(count(lit(1)).as(name))
      val bins = ref.sparkSession.range(1, 11)
        .select(col("id").as("bin"))
      val counts = bins
        .join(bucketed(ref, "ref_n"), Seq("bin"), "left")
        .join(bucketed(cur, "cur_n"), Seq("bin"), "left")
        .na.fill(0L, Seq("ref_n", "cur_n"))
        .crossJoin(broadcast(ref.agg(count(lit(1)).as("nr"))))
        .crossJoin(broadcast(cur.agg(count(lit(1)).as("nc"))))
        .withColumn("pr", (col("ref_n") + 1).cast("double")
          / (col("nr") + 10))
        .withColumn("pc", (col("cur_n") + 1).cast("double")
          / (col("nc") + 10))
        .withColumn("part", (col("pr") - col("pc"))
          * log(col("pr") / col("pc")))
      val tot = counts
        .agg(aggregate(array_sort(collect_list(struct(col("bin"),
          col("part")))), lit(0.0),
          (acc, x) => acc + x.getField("part")).as("psi"))
      counts.crossJoin(broadcast(tot))
        .select(col("bin"), col("ref_n"), col("cur_n"),
          fpTrunc(col("part"), 9).as("psi_part"),
          fpTrunc(col("psi"), 9).as("psi_total"))
        .orderBy(col("bin"))
    },
    Some("""WITH o AS (SELECT year(o_orderdate) AS yy,
        CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders),
    ref AS (SELECT cents FROM o WHERE yy BETWEEN 1995 AND 1996),
    cur AS (SELECT cents FROM o WHERE yy BETWEEN 1997 AND 1998),
    vc AS (SELECT cents, COUNT(*) AS cnt FROM ref GROUP BY cents),
    cum AS (SELECT cents, CAST(SUM(cnt) OVER (ORDER BY cents) AS BIGINT)
        AS cumend FROM vc),
    nn AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM vc),
    ed AS (SELECT k, MIN(CASE WHEN cumend * 10 >= k * n THEN cents END)
        AS e
      FROM cum, nn, generate_series(1, 9) g(k) GROUP BY k),
    es AS (SELECT list(e ORDER BY e) AS es FROM ed),
    rb AS (SELECT 1 + list_sum(list_transform(es,
          e -> CASE WHEN cents > e THEN 1 ELSE 0 END)) AS bin
      FROM ref, es),
    cb AS (SELECT 1 + list_sum(list_transform(es,
          e -> CASE WHEN cents > e THEN 1 ELSE 0 END)) AS bin
      FROM cur, es),
    rc AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS ref_n FROM rb GROUP BY bin),
    cc AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS cur_n FROM cb GROUP BY bin),
    base AS (SELECT g.bin, COALESCE(rc.ref_n, 0) AS ref_n,
        COALESCE(cc.cur_n, 0) AS cur_n,
        CAST(COALESCE(rc.ref_n, 0) + 1 AS DOUBLE)
          / ((SELECT COUNT(*) FROM ref) + 10) AS pr,
        CAST(COALESCE(cc.cur_n, 0) + 1 AS DOUBLE)
          / ((SELECT COUNT(*) FROM cur) + 10) AS pc
      FROM generate_series(1, 10) g(bin)
        LEFT JOIN rc ON rc.bin = g.bin LEFT JOIN cc ON cc.bin = g.bin),
    parts AS (SELECT bin, ref_n, cur_n,
        (pr - pc) * ln(pr / pc) AS part FROM base),
    tot AS (SELECT list_sum(list(part ORDER BY bin)) AS psi FROM parts)
    SELECT CAST(bin AS BIGINT) AS bin, ref_n, cur_n,
      FLOOR(part * 1e9) / 1e9 AS psi_part,
      FLOOR(psi * 1e9) / 1e9 AS psi_total
    FROM parts, tot ORDER BY bin"""))

  // --- q273: EXPECTATION SUITE — the deequ/great-expectations gate a
  //     pipeline runs before trusting a new drop: seven declarative
  //     constraints evaluated as ONE map-combined aggregate pass over
  //     orders (completeness, uniqueness-by-count, value range,
  //     accepted set, freshness, minimum volume) plus ONE anti-join
  //     count for referential integrity against customer (the oracle
  //     uses NOT EXISTS, not NOT IN, so both engines share anti-join
  //     NULL semantics: a NULL key is an orphan in both) — then pivoted
  //     to the long-format (check, observed, threshold, pass) report a
  //     CI gate consumes. Everything is exact integer counting; `pass`
  //     is an integer comparison, so the report cannot split engines.
  //     The uniqueness check counts DISTINCT keys against rows (exact —
  //     the HLL variant is q24's sketch family); at 100 TB that's the
  //     one expensive constraint and the place a production suite would
  //     swap in the sketch.
  private val q273 = Q(
    "q273_expectation_suite",
    "✦ data quality: 7-constraint declarative expectation report (one agg pass + one anti-join)",
    (s, d) => {
      val o = Tables.orders(s, d)
      val agg = o.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("n_null_cust"),
        countDistinct(col("o_orderkey")).as("n_distinct_key"),
        sum(when(col("o_totalprice") <= 0
          || col("o_totalprice") > 1000000, 1L).otherwise(0L))
          .as("n_price_oob"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH",
          "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"), 0L).otherwise(1L))
          .as("n_bad_priority"),
        max(expr("datediff(o_orderdate, date'1992-01-01')")).cast("long")
          .as("max_day"))
      val orphans = o.join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      val r = agg.crossJoin(broadcast(orphans))
      def check(name: String, observed: org.apache.spark.sql.Column,
          threshold: Long,
          passIf: (org.apache.spark.sql.Column, org.apache.spark.sql.Column)
            => org.apache.spark.sql.Column) =
        r.select(lit(name).as("check"), observed.as("observed"),
          lit(threshold).as("threshold"),
          passIf(observed, lit(threshold)).as("pass"))
      check("completeness_custkey", col("n_null_cust"), 0L, _ <= _)
        .unionByName(check("uniqueness_orderkey",
          col("n_rows") - col("n_distinct_key"), 0L, _ <= _))
        .unionByName(check("range_totalprice", col("n_price_oob"), 0L, _ <= _))
        .unionByName(check("accepted_priority", col("n_bad_priority"), 0L,
          _ <= _))
        .unionByName(check("referential_custkey", col("n_orphans"), 0L,
          _ <= _))
        .unionByName(check("freshness_orderdate", col("max_day"), 3200L,
          _ >= _))
        .unionByName(check("min_volume", col("n_rows"), 100L, _ >= _))
        .orderBy(col("check"))
    },
    Some("""WITH a AS (SELECT
        CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_null_cust,
        CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct_key,
        CAST(SUM(CASE WHEN o_totalprice <= 0 OR o_totalprice > 1000000
          THEN 1 ELSE 0 END) AS BIGINT) AS n_price_oob,
        CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH',
          '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW') THEN 0 ELSE 1 END)
          AS BIGINT) AS n_bad_priority,
        CAST(MAX(date_diff('day', DATE '1992-01-01',
          CAST(o_orderdate AS DATE))) AS BIGINT) AS max_day
      FROM orders),
    orph AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_orphans FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM customer c
        WHERE c.c_custkey = o.o_custkey)),
    r AS (SELECT * FROM a, orph)
    SELECT * FROM (
      SELECT 'completeness_custkey' AS "check", n_null_cust AS observed,
        CAST(0 AS BIGINT) AS threshold, n_null_cust <= 0 AS pass FROM r
      UNION ALL
      SELECT 'uniqueness_orderkey', n_rows - n_distinct_key,
        CAST(0 AS BIGINT), n_rows - n_distinct_key <= 0 FROM r
      UNION ALL
      SELECT 'range_totalprice', n_price_oob, CAST(0 AS BIGINT),
        n_price_oob <= 0 FROM r
      UNION ALL
      SELECT 'accepted_priority', n_bad_priority, CAST(0 AS BIGINT),
        n_bad_priority <= 0 FROM r
      UNION ALL
      SELECT 'referential_custkey', n_orphans, CAST(0 AS BIGINT),
        n_orphans <= 0 FROM r
      UNION ALL
      SELECT 'freshness_orderdate', max_day, CAST(3200 AS BIGINT),
        max_day >= 3200 FROM r
      UNION ALL
      SELECT 'min_volume', n_rows, CAST(100 AS BIGINT),
        n_rows >= 100 FROM r)
    ORDER BY "check""""))

  // --- q288: AUC RANKING AUDIT (Mann–Whitney, tie-aware) — the
  //     evaluation every heuristic quality scorer needs before it gates
  //     a corpus: how well does the score RANK the positive class?
  //     Here: n_chars as a ranking signal for lang = 'en' (the q113/q51
  //     quality-gate family's score axis scored against a weak label).
  //     Tie-aware closed form without any per-row ranking: collapse the
  //     corpus to the DISTINCT-SCORE frame (one map-combined groupBy —
  //     the only corpus-sized pass), then
  //       U·2 = Σ_s pos(s) · (2·cumneg(<s) + neg(s)),
  //     an EXACT BIGINT (ties contribute the half via the uncleared
  //     neg(s) term), and AUC = U2/(2·P·N), Gini = 2·AUC − 1 as the
  //     only floating steps (fpTrunc). The running cumneg is a window
  //     over the collapsed frame only — bounded by distinct score
  //     values (the q114 length-histogram bound), NOT the corpus, so
  //     the single-partition window is aggregate-sized by construction.
  private val q288 = Q(
    "q288_auc_ranking",
    "✦ ML eval: tie-aware Mann–Whitney AUC + Gini of a quality score vs a weak label",
    (s, d) => {
      val g = Tables.documents(s, d)
        .groupBy(col("n_chars").as("score"))
        .agg(sum(when(col("lang") === "en", 1L).otherwise(0L)).as("pos"),
          sum(when(col("lang") === "en", 0L).otherwise(1L)).as("neg"))
      val w = Window.orderBy(col("score"))
        .rowsBetween(Window.unboundedPreceding, -1)
      g.withColumn("cumneg", coalesce(sum(col("neg")).over(w), lit(0L)))
        .agg(sum(col("pos")).as("n_pos"), sum(col("neg")).as("n_neg"),
          sum(col("pos") * (col("cumneg") * 2 + col("neg"))).as("u2"))
        .select(col("n_pos"), col("n_neg"), col("u2"),
          fpTrunc(col("u2").cast("double")
            / (lit(2.0) * col("n_pos") * col("n_neg")), 9).as("auc"),
          fpTrunc(col("u2").cast("double")
            / (col("n_pos").cast("double") * col("n_neg")) - lit(1.0), 9)
            .as("gini"))
    },
    Some(s"""WITH g AS (
      SELECT n_chars AS score,
        CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
          AS pos,
        CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT)
          AS neg
      FROM documents GROUP BY 1),
    c AS (SELECT pos, neg,
        COALESCE(SUM(neg) OVER (ORDER BY score
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumneg
      FROM g),
    t AS (SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
        CAST(SUM(neg) AS BIGINT) AS n_neg,
        CAST(SUM(pos * (cumneg * 2 + neg)) AS BIGINT) AS u2
      FROM c)
    SELECT n_pos, n_neg, u2,
      ${fpTruncSql("CAST(u2 AS DOUBLE) / (2.0 * n_pos * n_neg)", 9)}
        AS auc,
      ${fpTruncSql(
        "CAST(u2 AS DOUBLE) / (CAST(n_pos AS DOUBLE) * n_neg) - 1.0",
        9)} AS gini
    FROM t"""))

  // --- q295: CALIBRATION AUDIT (reliability bins + Brier + ECE) —
  //     q288 grades how a score RANKS; this grades whether the score,
  //     read as a probability, MEANS what it says. The probability is
  //     the exact rational p̂ = n_chars/M (M = corpus max — one
  //     broadcast), kept UNevaluated so every metric clears to
  //     integers: per decile bin b = min((n_chars·10) div M, 9) the
  //     frame carries (n_b, pos_b, Σnc_b); mean-confidence is
  //     Σnc_b/(n_b·M), empirical rate pos_b/n_b, the Brier score is
  //     Σ(nc − y·M)²/(n·M²) with an exact BIGINT numerator (one
  //     conditional square per row — bound: rows·M² < 2⁶³, assert
  //     before reusing on wider scores), and ECE's weighted-|gap| sum
  //     telescopes to Σ_b|Σnc_b − pos_b·M| / (n·M) — every |·| of
  //     exact integers. One corpus pass → 10-row frame → fpTrunc
  //     readouts; the globals ride every bin row via a broadcast
  //     cross join (constant columns, same hash both engines).
  private val q295 = Q(
    "q295_calibration_bins",
    "✦ ML eval: reliability deciles + Brier + ECE of a probability score, exact-integer numerators",
    (s, d) => {
      val m = Tables.documents(s, d).agg(max(col("n_chars")).as("m"))
      val base = Tables.documents(s, d).crossJoin(broadcast(m))
        .select(col("n_chars").as("nc"), col("m"),
          when(col("lang") === "en", 1L).otherwise(0L).as("y"))
        .withColumn("bin", least(expr("(nc * 10) div m"), lit(9L)))
      val bins = base.groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"),
          sum(col("nc")).as("snc"), max(col("m")).as("m"))
      val glob = base.agg(count(lit(1)).as("n_tot"),
        sum((col("nc") - col("y") * col("m"))
          * (col("nc") - col("y") * col("m"))).as("brier_num"),
        max(col("m")).as("mg"))
      val ece = bins
        .agg(sum(abs(col("snc") - col("pos") * col("m"))).as("ece_num"))
      bins.crossJoin(broadcast(glob)).crossJoin(broadcast(ece))
        .select(col("bin"), col("n"), col("pos"),
          fpTrunc(col("snc").cast("double")
            / (col("n") * col("m")).cast("double"), 9).as("mean_conf"),
          fpTrunc(col("pos").cast("double") / col("n").cast("double"), 9)
            .as("emp_rate"),
          fpTrunc(col("brier_num").cast("double")
            / (col("n_tot") * col("mg") * col("mg")).cast("double"), 9)
            .as("brier"),
          fpTrunc(col("ece_num").cast("double")
            / (col("n_tot") * col("mg")).cast("double"), 9).as("ece"))
        .orderBy(col("bin"))
    },
    Some(s"""WITH mm AS (SELECT MAX(n_chars) AS m FROM documents),
    base AS (SELECT n_chars AS nc, (SELECT m FROM mm) AS m,
        CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents),
    b2 AS (SELECT nc, m, y,
        LEAST((nc * 10) // m, 9) AS bin FROM base),
    bins AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(y) AS BIGINT) AS pos,
        CAST(SUM(nc) AS BIGINT) AS snc, MAX(m) AS m
      FROM b2 GROUP BY 1),
    gstats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tot,
        CAST(SUM((nc - y * m) * (nc - y * m)) AS BIGINT) AS brier_num,
        MAX(m) AS mg
      FROM b2),
    ece AS (SELECT CAST(SUM(ABS(snc - pos * m)) AS BIGINT) AS ece_num
      FROM bins)
    SELECT bin, n, pos,
      ${fpTruncSql(
        "CAST(snc AS DOUBLE) / CAST(n * m AS DOUBLE)", 9)} AS mean_conf,
      ${fpTruncSql(
        "CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)", 9)} AS emp_rate,
      ${fpTruncSql(
        "CAST(brier_num AS DOUBLE) / CAST(n_tot * mg * mg AS DOUBLE)",
        9)} AS brier,
      ${fpTruncSql(
        "CAST(ece_num AS DOUBLE) / CAST(n_tot * mg AS DOUBLE)",
        9)} AS ece
    FROM bins, gstats, ece ORDER BY bin"""))

  // --- q296: SPLIT-CONFORMAL COVERAGE GATE — the distribution-free
  //     threshold rule for turning any score into a gate with a
  //     coverage guarantee: on a deterministic calibration half
  //     (doc_id parity — the q149 split discipline) take the
  //     ⌈(1−α)(n+1)⌉-th smallest nonconformity score (α = 0.1), then
  //     measure what fraction of the held-out half the threshold
  //     actually covers. The order statistic needs NO corpus sort:
  //     scores collapse to the distinct-value frame (q288's bound),
  //     the rank is a running count over that collapsed frame, and the
  //     threshold is the first value whose cumulative count reaches k
  //     — min over a filter, exact integers throughout. The eval leg
  //     is one conditional count against the broadcast 1-row
  //     threshold. Coverage lands at ≥ 1−α by the conformal guarantee
  //     (exchangeability); the spec asserts the finite-sample band.
  private val q296 = Q(
    "q296_conformal_coverage",
    "✦ ML eval: split-conformal threshold (exact order statistic) + held-out coverage",
    (s, d) => {
      val scores = Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars").as("score"),
          (col("doc_id") % 2 === 0).as("cal"))
      val g = scores.filter(col("cal"))
        .groupBy(col("score")).agg(count(lit(1)).as("c"))
      val w = Window.orderBy(col("score"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val nCal = scores.filter(col("cal")).agg(count(lit(1)).as("n_cal"))
      val thr = g.withColumn("cum", sum(col("c")).over(w))
        .crossJoin(broadcast(nCal))
        .withColumn("k", expr("((n_cal + 1) * 9 + 9) div 10"))
        .filter(col("cum") >= col("k"))
        .groupBy(col("n_cal"), col("k"))
        .agg(min(col("score")).as("threshold"))
      scores.filter(!col("cal")).crossJoin(broadcast(thr))
        .agg(max(col("n_cal")).as("n_cal"), max(col("k")).as("k"),
          max(col("threshold")).as("threshold"),
          count(lit(1)).as("n_eval"),
          sum(when(col("score") <= col("threshold"), 1L).otherwise(0L))
            .as("n_covered"))
        .select(col("n_cal"), col("k"), col("threshold"), col("n_eval"),
          col("n_covered"),
          fpTrunc(col("n_covered").cast("double")
            / col("n_eval").cast("double"), 9).as("coverage"))
    },
    Some(s"""WITH s AS (SELECT doc_id, n_chars AS score,
        doc_id % 2 = 0 AS cal FROM documents),
    g AS (SELECT score, CAST(COUNT(*) AS BIGINT) AS c
      FROM s WHERE cal GROUP BY 1),
    nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal FROM s WHERE cal),
    cum AS (SELECT score,
        SUM(c) OVER (ORDER BY score
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        (SELECT n_cal FROM nc) AS n_cal,
        (((SELECT n_cal FROM nc) + 1) * 9 + 9) // 10 AS k
      FROM g),
    thr AS (SELECT n_cal, k, MIN(score) AS threshold
      FROM cum WHERE cum >= k GROUP BY 1, 2)
    SELECT CAST(t.n_cal AS BIGINT) AS n_cal, CAST(t.k AS BIGINT) AS k,
      CAST(t.threshold AS BIGINT) AS threshold,
      CAST(COUNT(*) AS BIGINT) AS n_eval,
      CAST(SUM(CASE WHEN s.score <= t.threshold THEN 1 ELSE 0 END)
        AS BIGINT) AS n_covered,
      ${fpTruncSql(
        "CAST(SUM(CASE WHEN s.score <= t.threshold THEN 1 ELSE 0 END)" +
          " AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)", 9)} AS coverage
    FROM s, thr t WHERE NOT s.cal
    GROUP BY t.n_cal, t.k, t.threshold"""))


  // --- q307: PINBALL-LOSS QUANTILE-FORECAST EVALUATION — quality
  //     gates and SLOs run on predicted QUANTILES (q113's cut, q296's
  //     conformal threshold); pinball (quantile) loss is the proper
  //     scoring rule that says whether a p90 estimate was any good.
  //     Train/test by doc parity: per-source exact p90 on the
  //     calibration half (the ⌈0.9·n⌉-th order statistic via the
  //     per-source distinct-score collapse — windows partitioned by
  //     source over COLLAPSED rows only), then on the held-out half
  //     the loss clears to exact integers: 10·pinball(y, ŷ) =
  //     Σ [y ≥ ŷ] 9(y−ŷ) + [y < ŷ] (ŷ−y) — one conditional sum, no
  //     floats until the mean readout. Empirical coverage rides along
  //     (a well-calibrated p90 covers ~90%).
  private val q307 = Q(
    "q307_pinball_eval",
    "✦ ML eval: integer-cleared pinball loss + coverage of a per-source p90 forecast",
    (s, d) => {
      val base = Tables.documents(s, d)
        .select(col("source"), col("n_chars").as("y"),
          (col("doc_id") % 2 === 0).as("cal"))
      val g = base.filter(col("cal"))
        .groupBy(col("source"), col("y")).agg(count(lit(1)).as("c"))
      val wCum = Window.partitionBy(col("source")).orderBy(col("y"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val nCal = base.filter(col("cal"))
        .groupBy(col("source")).agg(count(lit(1)).as("n_cal"))
      val yhat = g.withColumn("cum", sum(col("c")).over(wCum))
        .join(broadcast(nCal), Seq("source"))
        .filter(col("cum") * 10 >= col("n_cal") * 9)
        .groupBy(col("source"), col("n_cal"))
        .agg(min(col("y")).as("yhat"))
      base.filter(!col("cal"))
        .join(broadcast(yhat), Seq("source"))
        .groupBy(col("source"), col("n_cal"), col("yhat"))
        .agg(count(lit(1)).as("n_eval"),
          sum(when(col("y") >= col("yhat"),
              (col("y") - col("yhat")) * 9)
            .otherwise(col("yhat") - col("y"))).as("pinball10"),
          sum(when(col("y") <= col("yhat"), 1L).otherwise(0L))
            .as("n_covered"))
        .select(col("source"), col("n_cal"), col("yhat"), col("n_eval"),
          col("pinball10"),
          fpTrunc(col("pinball10").cast("double")
            / (col("n_eval") * 10).cast("double"), 9)
            .as("mean_pinball"),
          fpTrunc(col("n_covered").cast("double")
            / col("n_eval").cast("double"), 9).as("coverage"))
        .orderBy(col("source"))
    },
    Some(s"""WITH base AS (
      SELECT source, n_chars AS y, doc_id % 2 = 0 AS cal
      FROM documents),
    g AS (SELECT source, y, CAST(COUNT(*) AS BIGINT) AS c
      FROM base WHERE cal GROUP BY 1, 2),
    nc AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_cal
      FROM base WHERE cal GROUP BY 1),
    cum AS (SELECT g.source, y,
        SUM(c) OVER (PARTITION BY g.source ORDER BY y
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        nc.n_cal
      FROM g JOIN nc ON g.source = nc.source),
    yh AS (SELECT source, n_cal, CAST(MIN(y) AS BIGINT) AS yhat
      FROM cum WHERE cum * 10 >= n_cal * 9 GROUP BY 1, 2)
    SELECT b.source, yh.n_cal, yh.yhat,
      CAST(COUNT(*) AS BIGINT) AS n_eval,
      CAST(SUM(CASE WHEN b.y >= yh.yhat THEN (b.y - yh.yhat) * 9
        ELSE yh.yhat - b.y END) AS BIGINT) AS pinball10,
      ${fpTruncSql(
        "CAST(SUM(CASE WHEN b.y >= yh.yhat THEN (b.y - yh.yhat) * 9" +
          " ELSE yh.yhat - b.y END) AS DOUBLE)" +
          " / CAST(COUNT(*) * 10 AS DOUBLE)", 9)} AS mean_pinball,
      ${fpTruncSql(
        "CAST(SUM(CASE WHEN b.y <= yh.yhat THEN 1 ELSE 0 END)" +
          " AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)", 9)} AS coverage
    FROM base b JOIN yh ON b.source = yh.source
    WHERE NOT b.cal
    GROUP BY b.source, yh.n_cal, yh.yhat ORDER BY b.source"""))

  // --- q326: ROC CURVE POINTS — q288 gives the area; operating a
  //     quality gate needs the CURVE: at each score-decile threshold,
  //     the exact TPR/FPR/precision of "keep documents with score ≥ t"
  //     against the weak label. Thresholds are the q296 order
  //     statistics (deciles of the score distribution — data-driven,
  //     not magic numbers), and every rate is a ratio of exact BIGINT
  //     conditional counts off ONE corpus pass joined against the
  //     broadcast 9-row threshold frame. Youden's J (TPR − FPR) rides
  //     along — its argmax row is the gate a pipeline would actually
  //     deploy.
  private val q326 = Q(
    "q326_roc_curve",
    "✦ ML eval: exact ROC/precision points at score-decile thresholds + Youden's J",
    (s, d) => {
      val base = Tables.documents(s, d)
        .select(col("n_chars").as("score"),
          when(col("lang") === "en", 1L).otherwise(0L).as("y"))
      val g = base.groupBy(col("score"))
        .agg(count(lit(1)).as("c"))
      val tot = base.agg(count(lit(1)).as("n"),
        sum(col("y")).as("n_pos"))
      val wCum = Window.orderBy(col("score"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = g.withColumn("cum", sum(col("c")).over(wCum))
        .crossJoin(broadcast(tot))
      val thresholds = cum
        .withColumn("dec", explode(sequence(lit(1L), lit(9L))))
        .filter(col("cum") * 10 >= col("n") * col("dec"))
        .groupBy(col("dec")).agg(min(col("score")).as("t"))
      base.crossJoin(broadcast(thresholds))
        .groupBy(col("dec"), col("t"))
        .agg(
          sum(when(col("score") >= col("t") && col("y") === 1, 1L)
            .otherwise(0L)).as("tp"),
          sum(when(col("score") >= col("t") && col("y") === 0, 1L)
            .otherwise(0L)).as("fp"),
          sum(when(col("score") < col("t") && col("y") === 1, 1L)
            .otherwise(0L)).as("fn"),
          sum(when(col("score") < col("t") && col("y") === 0, 1L)
            .otherwise(0L)).as("tn"))
        .select(col("dec"), col("t"), col("tp"), col("fp"), col("fn"),
          col("tn"),
          fpTrunc(col("tp").cast("double")
            / (col("tp") + col("fn")).cast("double"), 9).as("tpr"),
          fpTrunc(col("fp").cast("double")
            / (col("fp") + col("tn")).cast("double"), 9).as("fpr"),
          fpTrunc(col("tp").cast("double")
            / (col("tp") + col("fp")).cast("double"), 9).as("precision"),
          fpTrunc(col("tp").cast("double")
            / (col("tp") + col("fn")).cast("double")
            - col("fp").cast("double")
            / (col("fp") + col("tn")).cast("double"), 9).as("youden_j"))
        .orderBy(col("dec"))
    },
    Some(s"""WITH base AS (
      SELECT n_chars AS score,
        CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents),
    g AS (SELECT score, CAST(COUNT(*) AS BIGINT) AS c
      FROM base GROUP BY 1),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
    cum AS (SELECT score,
        SUM(c) OVER (ORDER BY score
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        (SELECT n FROM tot) AS n
      FROM g),
    th AS (SELECT dec, CAST(MIN(score) AS BIGINT) AS t FROM (
      SELECT score, cum, n, unnest(generate_series(1, 9)) AS dec
      FROM cum) WHERE cum * 10 >= n * dec GROUP BY 1),
    cf AS (SELECT th.dec, th.t,
        CAST(SUM(CASE WHEN score >= t AND y = 1 THEN 1 ELSE 0 END)
          AS BIGINT) AS tp,
        CAST(SUM(CASE WHEN score >= t AND y = 0 THEN 1 ELSE 0 END)
          AS BIGINT) AS fp,
        CAST(SUM(CASE WHEN score < t AND y = 1 THEN 1 ELSE 0 END)
          AS BIGINT) AS fn,
        CAST(SUM(CASE WHEN score < t AND y = 0 THEN 1 ELSE 0 END)
          AS BIGINT) AS tn
      FROM base, th GROUP BY 1, 2)
    SELECT dec, t, tp, fp, fn, tn,
      ${fpTruncSql(
        "CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)", 9)} AS tpr,
      ${fpTruncSql(
        "CAST(fp AS DOUBLE) / CAST(fp + tn AS DOUBLE)", 9)} AS fpr,
      ${fpTruncSql(
        "CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)", 9)}
        AS precision,
      ${fpTruncSql(
        "CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)" +
          " - CAST(fp AS DOUBLE) / CAST(fp + tn AS DOUBLE)",
        9)} AS youden_j
    FROM cf ORDER BY dec"""))

  // --- q322: PARTIAL CORRELATION (confounding audit) — the question
  //     behind every "quality correlates with X" claim: does the
  //     relationship survive controlling for LENGTH? r(words, distinct
  //     | chars) from the first-order formula
  //       r_xy.z = (r_xy − r_xz·r_yz) / √((1−r_xz²)(1−r_yz²)),
  //     where all three pairwise correlations come from the repo's
  //     decimal-exact moment helpers (dcov/dvar — exact decimal sums,
  //     IEEE-identical doubles after), so the whole chain is one
  //     map-combined aggregate pass and deterministic arithmetic on
  //     top. The raw r_xy rides along: the GAP between raw and partial
  //     is the confounding mass the audit exists to expose.
  private val q322 = Q(
    "q322_partial_correlation",
    "✦ stats: partial correlation r(words, distinct | chars) from exact moment sums",
    (s, d) => {
      val base = Tables.documents(s, d).select(
        size(split(col("text"), " ")).cast("double").as("x"),
        size(array_distinct(split(col("text"), " "))).cast("double")
          .as("y"),
        col("n_chars").cast("double").as("z"))
      def r(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        dcov(a, b) / sqrt(dvar(a) * dvar(b))
      base.agg(count(lit(1)).as("n"),
          r(col("x"), col("y")).as("r_xy"),
          r(col("x"), col("z")).as("r_xz"),
          r(col("y"), col("z")).as("r_yz"))
        .select(col("n"),
          fpTrunc(col("r_xy"), 9).as("r_raw"),
          fpTrunc(col("r_xz"), 9).as("r_xz"),
          fpTrunc(col("r_yz"), 9).as("r_yz"),
          fpTrunc((col("r_xy") - col("r_xz") * col("r_yz"))
            / sqrt((lit(1.0) - col("r_xz") * col("r_xz"))
              * (lit(1.0) - col("r_yz") * col("r_yz"))), 9)
            .as("r_partial"))
    },
    Some {
      def rSql(a: String, b: String) =
        s"(${dcovSql(a, b)} / SQRT(${dvarSql(a)} * ${dvarSql(b)}))"
      s"""WITH base AS (
        SELECT CAST(len(string_split(text, ' ')) AS DOUBLE) AS x,
          CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
            AS y,
          CAST(n_chars AS DOUBLE) AS z
        FROM documents),
      m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          ${rSql("x", "y")} AS r_xy,
          ${rSql("x", "z")} AS r_xz,
          ${rSql("y", "z")} AS r_yz
        FROM base)
      SELECT n, ${fpTruncSql("r_xy", 9)} AS r_raw,
        ${fpTruncSql("r_xz", 9)} AS r_xz,
        ${fpTruncSql("r_yz", 9)} AS r_yz,
        ${fpTruncSql(
          "(r_xy - r_xz * r_yz) / SQRT((1.0 - r_xz * r_xz)" +
            " * (1.0 - r_yz * r_yz))", 9)} AS r_partial
      FROM m"""
    })

  // --- q310: JOIN-SIZE ESTIMATION AUDIT (CMS inner product vs exact)
  //     — the cardinality estimate a cost-based planner needs BEFORE
  //     running a fact-fact join: |A⋈B| = Σ_k cA(k)·cB(k), estimated
  //     by the count-min INNER PRODUCT est_r = Σ_b cmsA[r][b]·cmsB[r][b]
  //     (min over the 4 rows — a one-sided overestimate, like q205's
  //     point lookups), audited against the exact key-count dot
  //     product. Everything is integer: both sketches are q205's
  //     deterministic seeded-hash 4×1024 frames (two map-combined
  //     passes), the exact size is one collapsed key-count join —
  //     never the join itself — and the single fpTrunc is the
  //     overestimate factor. At 100 TB the sketch passes are the only
  //     corpus-sized work and the estimate costs O(depth·width), the
  //     point of sketched planning.
  private val q310 = Q(
    "q310_join_size_estimate",
    "✦ planner ops: count-min inner-product join-size estimate vs exact key-count dot product",
    (s, d) => {
      val depth = 4
      val width = 1024L
      val rs = array((0 until depth).map(r => lit(r.toLong)): _*)
      def cmsOf(keys: DataFrame) = keys
        .withColumn("r", explode(rs))
        .withColumn("bucket",
          hashMod2L(col("k") + col("r") * lit(1000003L), lit(width)))
        .groupBy(col("r"), col("bucket")).agg(count(lit(1)).as("c"))
      val a = Tables.lineitem(s, d).select(col("l_orderkey").as("k"))
      val b = Tables.orders(s, d).select(col("o_orderkey").as("k"))
      val exact = a.groupBy(col("k")).agg(count(lit(1)).as("ca"))
        .join(b.groupBy(col("k")).agg(count(lit(1)).as("cb")), Seq("k"))
        .agg(sum(col("ca") * col("cb")).as("exact_size"),
          count(lit(1)).as("n_join_keys"))
      val est = cmsOf(a).withColumnRenamed("c", "ca")
        .join(cmsOf(b).withColumnRenamed("c", "cb"), Seq("r", "bucket"))
        .groupBy(col("r")).agg(sum(col("ca") * col("cb")).as("ip"))
        .agg(min(col("ip")).as("cms_est"))
      val sizes = a.agg(count(lit(1)).as("n_a"))
        .crossJoin(b.agg(count(lit(1)).as("n_b")))
      exact.crossJoin(broadcast(est)).crossJoin(broadcast(sizes))
        .select(col("n_a"), col("n_b"), col("n_join_keys"),
          col("exact_size"), col("cms_est"),
          (col("cms_est") - col("exact_size")).as("overcount"),
          fpTrunc(col("cms_est").cast("double")
            / col("exact_size").cast("double"), 9).as("over_factor"))
    },
    Some(s"""WITH ka AS (SELECT l_orderkey AS k FROM lineitem),
    kb AS (SELECT o_orderkey AS k FROM orders),
    rs AS (SELECT CAST(r AS BIGINT) AS r
      FROM (VALUES (0), (1), (2), (3)) t(r)),
    ca AS (SELECT r, ${hashMod2LSql("(k + r * 1000003)", "1024")}
        AS bucket, CAST(COUNT(*) AS BIGINT) AS c
      FROM ka CROSS JOIN rs GROUP BY 1, 2),
    cb AS (SELECT r, ${hashMod2LSql("(k + r * 1000003)", "1024")}
        AS bucket, CAST(COUNT(*) AS BIGINT) AS c
      FROM kb CROSS JOIN rs GROUP BY 1, 2),
    est AS (SELECT CAST(MIN(ip) AS BIGINT) AS cms_est FROM (
      SELECT ca.r, SUM(ca.c * cb.c) AS ip
      FROM ca JOIN cb ON ca.r = cb.r AND ca.bucket = cb.bucket
      GROUP BY 1)),
    ex AS (SELECT CAST(SUM(a.c * b.c) AS BIGINT) AS exact_size,
        CAST(COUNT(*) AS BIGINT) AS n_join_keys
      FROM (SELECT k, COUNT(*) AS c FROM ka GROUP BY 1) a
      JOIN (SELECT k, COUNT(*) AS c FROM kb GROUP BY 1) b USING (k)),
    sz AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ka) AS n_a,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM kb) AS n_b)
    SELECT n_a, n_b, n_join_keys, exact_size, cms_est,
      CAST(cms_est - exact_size AS BIGINT) AS overcount,
      ${fpTruncSql(
        "CAST(cms_est AS DOUBLE) / CAST(exact_size AS DOUBLE)",
        9)} AS over_factor
    FROM ex, est, sz"""))

  // --- q300: K-ANONYMITY / L-DIVERSITY GOVERNANCE AUDIT — the
  //     re-identification screen run before a corpus ships: under the
  //     quasi-identifier (source, lang, n_chars div 100), how small is
  //     the smallest equivalence class (k-anonymity level), how much
  //     of the corpus sits in classes below k = 5 (the at-risk mass),
  //     and — dropping lang from the QI to treat it as the SENSITIVE
  //     attribute — what is the minimum distinct-sensitive-value count
  //     per class (l-diversity)? Shape: one groupBy to the QI-class
  //     frame (the corpus-sized pass), every readout an aggregate of
  //     that collapsed frame; the l-diversity leg is a second
  //     aggregate over the coarser (source, bucket) classes. All
  //     counts exact BIGINTs; one fpTrunc share.
  private val q300 = Q(
    "q300_k_anonymity",
    "✦ governance: k-anonymity level, at-risk mass below k=5, l-diversity of lang",
    (s, d) => {
      val base = Tables.documents(s, d)
        .select(col("source"), col("lang"),
          expr("n_chars div 100").as("bucket"))
      val classes = base.groupBy(col("source"), col("lang"), col("bucket"))
        .agg(count(lit(1)).as("sz"))
      val kStats = classes.agg(count(lit(1)).as("n_classes"),
        sum(col("sz")).as("n_docs"),
        min(col("sz")).as("k_anonymity"),
        sum(when(col("sz") < 5, col("sz")).otherwise(0L))
          .as("n_docs_at_risk"))
      val lDiv = base.groupBy(col("source"), col("bucket"))
        .agg(countDistinct(col("lang")).as("l"))
        .agg(min(col("l")).as("l_diversity"))
      kStats.crossJoin(broadcast(lDiv))
        .select(col("n_docs"), col("n_classes"), col("k_anonymity"),
          col("n_docs_at_risk"),
          graft.dsl.fpTrunc(col("n_docs_at_risk").cast("double")
            / col("n_docs").cast("double"), 9).as("at_risk_share"),
          col("l_diversity"))
    },
    Some(s"""WITH base AS (
      SELECT source, lang, n_chars // 100 AS bucket FROM documents),
    classes AS (SELECT source, lang, bucket,
        CAST(COUNT(*) AS BIGINT) AS sz
      FROM base GROUP BY 1, 2, 3),
    ks AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
        CAST(SUM(sz) AS BIGINT) AS n_docs,
        CAST(MIN(sz) AS BIGINT) AS k_anonymity,
        CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
          AS n_docs_at_risk
      FROM classes),
    ld AS (SELECT CAST(MIN(l) AS BIGINT) AS l_diversity FROM (
      SELECT source, bucket, COUNT(DISTINCT lang) AS l
      FROM base GROUP BY 1, 2))
    SELECT n_docs, n_classes, k_anonymity, n_docs_at_risk,
      ${graft.dsl.fpTruncSql(
        "CAST(n_docs_at_risk AS DOUBLE) / CAST(n_docs AS DOUBLE)",
        9)} AS at_risk_share,
      l_diversity
    FROM ks, ld"""))

  def defs: Seq[Q] = Seq(q23, q24, q25, q26, q27, q28, q29, q30, q31, q32,
    q33, q34, q79, q107, q121, q122, q126, q130, q131, q132, q138, q150,
    q153, q160, q174, q175, q176, q177, q178, q179, q181, q184, q187, q189,
    q191, q193, q195, q196, q199, q202, q205, q207, q222, q240, q241, q245,
    q249, q257, q272, q273, q288, q295, q296, q300, q307, q310, q322,
    q326)
}
