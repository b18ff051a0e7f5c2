package graft.queries

import graft.{Q, Tables}
import graft.dsl._
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window / ordered-frame functions: SURVEY.md §2.5 (W1-W6).
  *
  * Scale notes (100 TB): every window here partitions by a high-cardinality
  * key (customer), so a window is one shuffle on that key followed by a
  * partition-local sort — no global sort, no driver materialization. Running
  * sums are computed over decimal-cast values: window frames define a total
  * order, but engines may still regroup double additions (segment trees for
  * sliding frames), so decimal is the only way to stay engine-independent.
  */
object Windows extends Q.Module {

  private def wCust = Window.partitionBy(col("o_custkey"))
    .orderBy(col("o_orderdate"), col("o_orderkey"))

  // --- q18: cumulative per-group running aggregates. Ops: W1, W5.
  private val q18 = Q(
    "q18_window_cumulative",
    "W1 cumsum/cummax, W5 cumcount per customer order history",
    (s, d) => {
      val w = wCust.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        sum(col("o_totalprice").cast(Money)).over(w).cast("double").as("cum_spend"),
        max(col("o_totalprice")).over(w).as("cum_max_price"),
        (row_number().over(wCust) - lit(1)).as("cum_prior_orders"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
        OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_spend,
      MAX(o_totalprice)
        OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_max_price,
      CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) - 1 AS INT)
        AS cum_prior_orders
    FROM orders ORDER BY o_custkey, o_orderkey"""))

  // --- q19: rolling frames, row-count and time-range. Ops: W2, W3.
  private val q19 = Q(
    "q19_window_rolling",
    "W2 3-row moving avg, W3 30-day range-frame sum per customer",
    (s, d) => {
      val wRows = wCust.rowsBetween(-2, Window.currentRow)
      val wRange = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-30L * 86400, 0)
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        (sum(col("o_totalprice").cast(Money)).over(wRows).cast("double")
          / count(lit(1)).over(wRows)).as("mavg3_price"),
        sum(col("o_totalprice").cast(Money)).over(wRange).cast("double").as("sum_30d"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    // DuckDB RANGE frames need an orderable numeric: use epoch seconds on
    // both sides. Ties on (date) inside a RANGE frame include all peers on
    // both engines (ANSI), so results agree even with same-day orders.
    Some("""SELECT o_custkey, o_orderkey,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
        OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
        / COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mavg3_price,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
        OVER (PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
              RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_30d
    FROM orders ORDER BY o_custkey, o_orderkey"""))

  // --- q20: lag/lead offsets. Ops: W4.
  private val q20 = Q(
    "q20_window_lag_lead",
    "W4 diff/shift: gap in days to previous/next order per customer",
    (s, d) => {
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(wCust)).as("days_since_prev"),
        datediff(lead(col("o_orderdate"), 1).over(wCust), col("o_orderdate")).as("days_to_next"),
        (col("o_totalprice") - lag(col("o_totalprice"), 1).over(wCust))
          .cast("decimal(18,6)").cast("double").as("price_delta"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
      CAST(date_diff('day',
        LAG(o_orderdate, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        o_orderdate) AS INT) AS days_since_prev,
      CAST(date_diff('day', o_orderdate,
        LEAD(o_orderdate, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)) AS INT)
        AS days_to_next,
      CAST(CAST(o_totalprice - LAG(o_totalprice, 1)
        OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        AS DECIMAL(18,6)) AS DOUBLE) AS price_delta
    FROM orders ORDER BY o_custkey, o_orderkey"""))

  // --- q21: ranking family. Ops: W6.
  private val q21 = Q(
    "q21_window_rank",
    "W6 rank/dense_rank/percent_rank/ntile/first/last per customer by price",
    (s, d) => {
      val wPrice = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val wAll = wPrice.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        rank().over(wPrice).as("rnk"),
        dense_rank().over(wPrice).as("drnk"),
        percent_rank().over(wPrice).as("prnk"),
        ntile(4).over(wPrice).as("quartile"),
        first(col("o_orderkey")).over(wAll).as("best_order"),
        last(col("o_orderkey")).over(wAll).as("worst_order"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
      CAST(RANK() OVER w AS INT) AS rnk,
      CAST(DENSE_RANK() OVER w AS INT) AS drnk,
      PERCENT_RANK() OVER w AS prnk,
      CAST(NTILE(4) OVER w AS INT) AS quartile,
      FIRST_VALUE(o_orderkey) OVER
        (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS best_order,
      LAST_VALUE(o_orderkey) OVER
        (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS worst_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_custkey, o_orderkey"""))

  // --- q22: top-k per group via window (the distributed nlargest-per-key
  //     idiom; O3 at group granularity).
  private val q22 = Q(
    "q22_window_topk_per_group",
    "O3/W6 top-2 orders per customer (row_number filter)",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    },
    Some("""SELECT o_custkey, CAST(rn AS INT) AS rn, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
        ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) WHERE rn <= 2
    ORDER BY o_custkey, rn"""))

  // --- q77: distribution ranks — ntile / percent_rank / cume_dist over
  //     per-customer spend within segment. percent_rank = (rank-1)/(n-1)
  //     and cume_dist = peers/n are each ONE double division of exact
  //     integers, so both engines agree bitwise; the compound (spend,
  //     custkey) order makes every rank deterministic under ties.
  private val q77 = Q(
    "q77_window_distribution",
    "W6 ntile/percent_rank/cume_dist of customer spend within segment",
    (s, d) => {
      val spend = Tables.orders(s, d)
        .groupBy(col("o_custkey")).agg(dsum(col("o_totalprice")).as("spend"))
      val c = Tables.customer(s, d)
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("spend"), col("c_custkey"))
      c.join(spend, c("c_custkey") === spend("o_custkey"))
        .select(col("c_mktsegment"), col("c_custkey"), col("spend"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cdist"))
        .orderBy(col("c_mktsegment"), col("c_custkey"))
    },
    Some(s"""WITH spend AS (
      SELECT o_custkey, ${dsumSql("o_totalprice")} AS spend
      FROM orders GROUP BY o_custkey)
    SELECT c_mktsegment, c_custkey, spend,
      CAST(NTILE(4) OVER w AS INT) AS quartile,
      PERCENT_RANK() OVER w AS pct_rank,
      CUME_DIST() OVER w AS cdist
    FROM customer JOIN spend ON c_custkey = o_custkey
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY spend, c_custkey)
    ORDER BY c_mktsegment, c_custkey"""))

  // --- q80: cumprod + cummin — the W1 forms Spark has no builtin for
  //     (cumprod) or that q18 didn't cover (cummin). Spark lacks a window
  //     product aggregate, so cumprod is a sequential left-to-right HOF
  //     fold over the running frame's collect_list — frame order is the
  //     window order, so the fold order is total and both engines multiply
  //     the same doubles in the same sequence (bit-identical; same rule as
  //     the vector dot products). Growth stays bounded: (1+l_tax) per row,
  //     ≤ ~60 rows per order.
  private val q80 = Q(
    "q80_window_cumprod_cummin",
    "W1 cumprod (HOF fold over running frame) + cummin per order",
    (s, d) => {
      // lineitem has no unique key: (l_orderkey, l_linenumber) repeats, so
      // the frame order adds l_tax and l_quantity — remaining ties are
      // rows identical in every consumed column, which contribute equal
      // factors in either order.
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_tax"), col("l_quantity"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // The compared product is rounded to 6 digits on BOTH engines: the
      // sequential Spark fold is bit-exact, but DuckDB's product() OVER a
      // running frame is free to segment-tree-combine, which may differ in
      // the last ulp on other fixtures/versions — rounding makes the
      // oracle robust to the combine order (ties in the ORDER BY then see
      // the same rounded value on both sides).
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(aggregate(collect_list(lit(1.0) + col("l_tax")).over(w),
            lit(1.0), (acc, v) => acc * v), 6).as("cum_tax_factor"),
          min(col("l_quantity")).over(w).as("cum_min_qty"))
        .orderBy(col("l_orderkey"), col("l_linenumber"),
          col("cum_tax_factor"), col("cum_min_qty"))
    },
    Some("""SELECT l_orderkey, l_linenumber,
      ROUND(product(1.0 + l_tax) OVER w, 6) AS cum_tax_factor,
      MIN(l_quantity) OVER w AS cum_min_qty
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_tax, l_quantity
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY l_orderkey, l_linenumber, cum_tax_factor, cum_min_qty"""))

  // --- q86: first/last/nth over an ordered frame — the W6 value-picking
  //     functions (first order price, latest price, second order) per
  //     customer. last_value needs the full-partition frame (the default
  //     running frame would just echo the current row).
  private val q86 = Q(
    "q86_window_first_last_nth",
    "W6 first_value/last_value/nth_value of order price per customer",
    (s, d) => {
      val wRun = wCust.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = wCust.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        first(col("o_totalprice")).over(wRun).as("first_price"),
        last(col("o_totalprice")).over(wAll).as("latest_price"),
        nth_value(col("o_totalprice"), 2).over(wAll).as("second_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
      FIRST_VALUE(o_totalprice) OVER wr AS first_price,
      LAST_VALUE(o_totalprice) OVER wa AS latest_price,
      NTH_VALUE(o_totalprice, 2) OVER wa AS second_price
    FROM orders
    WINDOW wr AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wa AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey, o_orderkey"""))

  // --- q105: EMA (pandas `ewm(alpha).mean()` shape) — the recursive
  //     ema_i = α·x_i + (1−α)·ema_{i−1} is not a frame-expressible window
  //     aggregate (each row depends on the previous OUTPUT). The naive
  //     distributed form (collect the whole series per key, fold once)
  //     holds O(series length) state in one aggregation buffer: at 100 TB
  //     a hot key with 1e8+ events is a single task materializing the
  //     whole series — the global-cumsum trap in per-key clothing. This
  //     runs the TWO-PHASE decomposition instead (emaTwoPhase below, the
  //     q104 pattern): bounded per-block folds + a per-key carry over the
  //     series/blockRows-sized block frame. The oracle stays the NAIVE
  //     sequential fold, so the correctness row PROVES the decomposition
  //     equals the one-pass recurrence. Exactness: the algebra is exact,
  //     but regrouped double arithmetic differs from the sequential fold
  //     in the last few ulps (~1e-13 relative), so the compared column is
  //     rounded to 6 digits on both engines — same robustness rule as
  //     q80's cumprod; a wrong decomposition would be off by whole digits.
  private val q105 = Q(
    "q105_ema_fold",
    "W-family ✦: per-key EMA via two-phase block fold (bounded state)",
    (s, d) => {
      val t = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      emaTwoPhase(t, alpha = 0.25, blockRows = 64)
        .select(col("user_id"), col("n_events"), round(col("ema"), 6).as("ema"))
        .orderBy(col("user_id"))
    },
    Some("""WITH l AS (SELECT user_id,
        list(value ORDER BY ts, event_id) AS xs, COUNT(*) AS n
      FROM events GROUP BY user_id)
    SELECT user_id, CAST(n AS BIGINT) AS n_events,
      ROUND(list_reduce(xs, (acc, x) -> acc * 0.75::DOUBLE + x * 0.25::DOUBLE), 6)
        AS ema
    FROM l ORDER BY user_id"""))

  // --- q145: EWM VARIANCE / STD (pandas `ewm(alpha, adjust=False).var()`,
  //     bias=False) — the next thing a q105 user types. Same two-phase
  //     block fold, now over all three moment sums (ewmMomentsTwoPhase):
  //     var = (Σw·x² − (Σw·x)²) / (1 − Σw²) since Σw = 1 — the debias
  //     factor (Σw)²/((Σw)²−Σw²) with the weight-squared sum folded
  //     exactly like the mean (decay (1−α)² instead of (1−α)). The
  //     oracle stays the NAIVE sequential recurrence (list_reduce seeded
  //     by the first element), so the hash match PROVES the three-fold
  //     decomposition equals the one-pass form; compared columns are
  //     rounded to 6 digits on both engines (q105's regrouped-double
  //     rule), with variance clamped at 0 BEFORE rounding (Σw·x² ≥
  //     (Σw·x)² can dip an ulp under 0 on constant series, and sqrt
  //     must never see it). Single-event keys report NULL (no sample
  //     variance), spelled identically in both engines.
  private val q145 = Q(
    "q145_ewm_var",
    "W-family ✦: per-key EWM variance/std via two-phase moment fold",
    (s, d) => {
      val t = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      val varRaw = (col("ems2") - col("ema") * col("ema")) /
        (lit(1.0) - col("sw2"))
      val varCol = when(col("n_events") >= 2,
        round(greatest(varRaw, lit(0.0)), 6))
      ewmMomentsTwoPhase(t, alpha = 0.25, blockRows = 64)
        .select(col("user_id"), col("n_events"),
          varCol.as("ewm_var"), round(sqrt(varCol), 6).as("ewm_std"))
        .orderBy(col("user_id"))
    },
    Some("""WITH l AS (SELECT user_id,
        list(value ORDER BY ts, event_id) AS xs, COUNT(*) AS n
      FROM events GROUP BY user_id),
    m AS (SELECT user_id, n,
      list_reduce(xs, (acc, x) -> acc * 0.75::DOUBLE + x * 0.25::DOUBLE) AS ema,
      list_reduce(list_transform(xs, x -> x * x),
        (acc, x) -> acc * 0.75::DOUBLE + x * 0.25::DOUBLE) AS ems2,
      list_reduce(list_concat([1.0::DOUBLE],
          list_transform(xs[2:], x -> 0.0625::DOUBLE)),
        (acc, w) -> acc * 0.5625::DOUBLE + w) AS sw2
      FROM l),
    v AS (SELECT user_id, n,
      CASE WHEN n >= 2 THEN
        ROUND(GREATEST((ems2 - ema * ema) / (1.0 - sw2), 0.0), 6) END AS ewm_var
      FROM m)
    SELECT user_id, CAST(n AS BIGINT) AS n_events, ewm_var,
      ROUND(SQRT(ewm_var), 6) AS ewm_std
    FROM v ORDER BY user_id"""))

  // --- q147: pandas-DEFAULT EWM (`ewm(alpha).mean()/var()/std()` with
  //     adjust=True, the form users actually get without flags) — the
  //     un-adjusted q105/q145 recurrences seed on the first value, while
  //     adjust=True is a plain decaying weighted average: w_i = (1−α)^{n−i},
  //     mean = Σw·x / Σw, var = (Σw·x²/Σw − mean²)·(Σw)²/((Σw)²−Σw²).
  //     All four sums (S, W, S2, W2) are geometric folds FROM ZERO — no
  //     seed corrections at all — so the q105 block decomposition applies
  //     verbatim (ewmAdjustedTwoPhase). The oracle runs the naive
  //     fold-from-0 recurrences (list_reduce with a prepended 0 as init);
  //     compared columns rounded to 6 digits, variance clamped at 0
  //     before rounding, single-event keys NULL — q145's conventions.
  private val q147 = Q(
    "q147_ewm_adjusted",
    "W-family ✦: pandas-default ewm (adjust=True) mean/var/std, two-phase",
    (s, d) => {
      val t = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      val mean = col("sx") / col("sw")
      val varRaw = (col("sx2") / col("sw") - mean * mean) *
        (col("sw") * col("sw")) /
        (col("sw") * col("sw") - col("sw2"))
      val varCol = when(col("n_events") >= 2,
        round(greatest(varRaw, lit(0.0)), 6))
      ewmAdjustedTwoPhase(t, alpha = 0.25, blockRows = 64)
        .select(col("user_id"), col("n_events"),
          round(mean, 6).as("ewm_mean"),
          varCol.as("ewm_var"), round(sqrt(varCol), 6).as("ewm_std"))
        .orderBy(col("user_id"))
    },
    Some("""WITH l AS (SELECT user_id,
        list(value ORDER BY ts, event_id) AS xs, COUNT(*) AS n
      FROM events GROUP BY user_id),
    m AS (SELECT user_id, n,
      list_reduce(list_concat([0.0::DOUBLE], xs),
        (acc, x) -> acc * 0.75::DOUBLE + x) AS sx,
      list_reduce(list_concat([0.0::DOUBLE],
          list_transform(xs, x -> 1.0::DOUBLE)),
        (acc, x) -> acc * 0.75::DOUBLE + x) AS sw,
      list_reduce(list_concat([0.0::DOUBLE], list_transform(xs, x -> x * x)),
        (acc, x) -> acc * 0.75::DOUBLE + x) AS sx2,
      list_reduce(list_concat([0.0::DOUBLE],
          list_transform(xs, x -> 1.0::DOUBLE)),
        (acc, x) -> acc * 0.5625::DOUBLE + x) AS sw2
      FROM l),
    v AS (SELECT user_id, n, sx / sw AS mean,
      CASE WHEN n >= 2 THEN
        ROUND(GREATEST((sx2 / sw - (sx / sw) * (sx / sw))
          * (sw * sw) / (sw * sw - sw2), 0.0), 6) END AS ewm_var
      FROM m)
    SELECT user_id, CAST(n AS BIGINT) AS n_events,
      ROUND(mean, 6) AS ewm_mean, ewm_var,
      ROUND(SQRT(ewm_var), 6) AS ewm_std
    FROM v ORDER BY user_id"""))

  // --- q151: TIME-INDEXED EWM — pandas `ewm(halflife='1h',
  //     times=ts).mean()`, the form a real event stream needs: q105/q145/
  //     q147 weight by ROW COUNT (unit-spaced observations), but events
  //     arrive irregularly, and pandas' `times` variant decays by the
  //     actual gap — weight 0.5^{Δt/halflife}. (pandas defines only
  //     mean() over `times`, so that is the surface here.) Two-phase
  //     block fold with a STRUCT accumulator carrying the previous
  //     timestamp (ewmHalflifeTwoPhase); the oracle is the NAIVE
  //     timestamp-aware recurrence (DuckDB list_reduce over struct_pack
  //     state), so the hash match proves the per-gap decay decomposition
  //     equals the sequential scan. Both engines compute each decay as
  //     pow(0.5, Δµs/3.6e9) on IDENTICAL double inputs; compared columns
  //     round to 6 digits (q105's regrouped-double rule — exponent
  //     regrouping across blocks is ulp-level). Timestamps convert ns→µs
  //     by explicit floor division (q146's pmod spelling).
  private val q151 = Q(
    "q151_ewm_halflife_times",
    "W-family ✦: time-indexed ewm(halflife=1h, times=ts) mean, two-phase",
    (s, d) => {
      val t = Tables.events(s, d)
        .select(col("user_id"),
          expr("(ts - pmod(ts, 1000)) div 1000").as("ts"),
          col("event_id"), col("value"))
      ewmHalflifeTwoPhase(t, halflife = 3600000000.0, blockRows = 64)
        .select(col("user_id"), col("n_events"),
          round(col("sx") / col("sw"), 6).as("ewm_mean"))
        .orderBy(col("user_id"))
    },
    Some("""WITH l AS (SELECT user_id,
        list(struct_pack(t := epoch_us(ts), v := value)
             ORDER BY ts, event_id) AS xs,
        COUNT(*) AS n
      FROM events GROUP BY user_id),
    r AS (SELECT user_id, n,
      list_reduce(
        list_transform(xs, x ->
          struct_pack(s := x.v, w := 1.0::DOUBLE, t := x.t)),
        (acc, x) -> struct_pack(
          s := acc.s * pow(0.5::DOUBLE,
                 CAST(x.t - acc.t AS DOUBLE) / 3600000000.0) + x.s,
          w := acc.w * pow(0.5::DOUBLE,
                 CAST(x.t - acc.t AS DOUBLE) / 3600000000.0) + x.w,
          t := x.t)) AS f
      FROM l)
    SELECT user_id, CAST(n AS BIGINT) AS n_events,
      ROUND(f.s / f.w, 6) AS ewm_mean
    FROM r ORDER BY user_id"""))

  /** adjust=True EWM sums via the q105 two-phase block fold: returns
    * (user_id, n_events, sx, sw, sx2, sw2) where over the key's values in
    * (ts, event_id) order sx = Σ(1−α)^{n−i}·xᵢ, sw = Σ(1−α)^{n−i},
    * sx2 the same over xᵢ², and sw2 = Σ(1−α)^{2(n−i)}. Every sum is the
    * geometric fold f(acc,s) = d·acc + s from 0 (d = 1−α, or (1−α)² for
    * sw2), so each decomposes over blocks as acc₀·d^m + fold-from-0 with
    * NO seed corrections — per-task state bounded by blockRows. */
  private[graft] def ewmAdjustedTwoPhase(events: org.apache.spark.sql.DataFrame,
      alpha: Double, blockRows: Int): org.apache.spark.sql.DataFrame = {
    val d1 = 1 - alpha
    val d2 = d1 * d1
    val blk = ewmBlockFrame(events, blockRows)
      .select(col("user_id"), col("block"),
        size(col("xs")).cast("long").as("m"),
        aggregate(col("xs"), lit(0.0),
          (acc, x) => acc * lit(d1) + x.getField("value")).as("psx"),
        aggregate(col("xs"), lit(0.0), (acc, _) => acc * lit(d1) + lit(1.0))
          .as("psw"),
        aggregate(col("xs"), lit(0.0),
          (acc, x) => acc * lit(d1)
            + x.getField("value") * x.getField("value")).as("psx2"),
        aggregate(col("xs"), lit(0.0), (acc, _) => acc * lit(d2) + lit(1.0))
          .as("psw2"),
        aggregate(col("xs"), lit(1.0), (acc, _) => acc * lit(d1)).as("decay"),
        aggregate(col("xs"), lit(1.0), (acc, _) => acc * lit(d2)).as("decay2"))
    def fold(part: String, decay: String) =
      aggregate(col("bs"), lit(0.0),
        (acc, b) => acc * b.getField(decay) + b.getField(part))
    blk.groupBy(col("user_id"))
      .agg(sum(col("m")).as("n_events"),
        array_sort(collect_list(
          struct(col("block"), col("psx"), col("psw"), col("psx2"),
            col("psw2"), col("decay"), col("decay2")))).as("bs"))
      .select(col("user_id"), col("n_events"),
        fold("psx", "decay").as("sx"), fold("psw", "decay").as("sw"),
        fold("psx2", "decay").as("sx2"), fold("psw2", "decay2").as("sw2"))
  }

  /** Time-indexed EWM sums (pandas `ewm(halflife=h, times=ts).mean()`,
    * the only op pandas defines over `times`): returns
    * (user_id, n_events, sx, sw) where, over the key's rows in
    * (ts, event_id) order with t_n the key's LAST timestamp,
    *   sx = Σ xᵢ·0.5^{(t_n−tᵢ)/h},  sw = Σ 0.5^{(t_n−tᵢ)/h},
    * so mean = sx/sw. `ts` and `halflife` share one caller-chosen unit.
    *
    * Unlike the row-indexed folds above, the decay is PER GAP —
    * dᵢ = 0.5^{(tᵢ−tᵢ₋₁)/h} — so the accumulator must carry the previous
    * timestamp: both phases fold a STRUCT (s, w, t) instead of a scalar.
    * The block algebra still holds because re-anchoring is multiplicative:
    * a block's partial sums are anchored at the block's LAST timestamp,
    * and phase 2 re-anchors the running sums across blocks with one decay
    * 0.5^{(L_b−L_{b−1})/h} per block (exponent regrouping is the usual
    * ulp-level difference vs the naive scanLeft — same rounding rule as
    * q105). Per-task state stays bounded by blockRows; the block frame is
    * series/blockRows structs. Seeding needs NO correction: the first
    * element enters with gap 0 (d=1, weight 1), exactly the naive
    * recurrence's init. */
  private[graft] def ewmHalflifeTwoPhase(events: org.apache.spark.sql.DataFrame,
      halflife: Double, blockRows: Int): org.apache.spark.sql.DataFrame = {
    def decay(gapFrom: Column, gapTo: Column): Column =
      pow(lit(0.5), (gapTo - gapFrom).cast("double") / lit(halflife))
    val blk = ewmBlockFrame(events, blockRows)
      .select(col("user_id"), col("block"),
        size(col("xs")).cast("long").as("m"),
        element_at(col("xs"), -1).getField("ts").as("last_ts"),
        aggregate(col("xs"),
          struct(lit(0.0).as("s"), lit(0.0).as("w"),
            element_at(col("xs"), 1).getField("ts").as("t")),
          (acc, x) => {
            val d = decay(acc.getField("t"), x.getField("ts"))
            struct((acc.getField("s") * d + x.getField("value")).as("s"),
              (acc.getField("w") * d + lit(1.0)).as("w"),
              x.getField("ts").as("t"))
          }).as("p"))
      .select(col("user_id"), col("block"), col("m"), col("last_ts"),
        col("p").getField("s").as("ps"), col("p").getField("w").as("pw"))
    blk.groupBy(col("user_id"))
      .agg(sum(col("m")).as("n_events"),
        array_sort(collect_list(struct(col("block"), col("ps"), col("pw"),
          col("last_ts")))).as("bs"))
      .select(col("user_id"), col("n_events"),
        aggregate(col("bs"),
          struct(lit(0.0).as("s"), lit(0.0).as("w"),
            element_at(col("bs"), 1).getField("last_ts").as("t")),
          (acc, b) => {
            val d = decay(acc.getField("t"), b.getField("last_ts"))
            struct((acc.getField("s") * d + b.getField("ps")).as("s"),
              (acc.getField("w") * d + b.getField("pw")).as("w"),
              b.getField("last_ts").as("t"))
          }).as("f"))
      .select(col("user_id"), col("n_events"),
        col("f").getField("s").as("sx"), col("f").getField("w").as("sw"))
  }

  /** Scale-safe per-key EMA over (user_id, ts, event_id, value) rows:
    * returns (user_id, n_events, ema) where ema equals the sequential
    * recurrence ema_i = α·x_i + (1−α)·ema_{i−1} seeded with the key's
    * first value in (ts, event_id) order.
    *
    * Decomposition (exact in real arithmetic): a fold of f(acc,x) =
    * (1−α)·acc + α·x over a block of length m starting from acc₀ equals
    * acc₀·(1−α)^m + part, where part is the same fold started from 0.
    * So phase 1 computes per (key, block): `part` (fold from 0) and
    * `decay` = (1−α)^m — BOTH as sequential HOF folds over at most
    * `blockRows` rows, so per-task state is bounded by blockRows, not by
    * series length. Phase 2 folds acc = acc·decay_b + part_b across the
    * key's blocks in order (a frame of ceil(n/blockRows) rows — at 1e8
    * events/key and blockRows=4096 that is ~24k tiny structs; an
    * adversarial series deeper than that applies the same decomposition
    * recursively). Seeding: the uniform fold-from-0 gives x₁ weight
    * α·(1−α)^{n−1} but the recurrence seeds with weight (1−α)^{n−1};
    * the difference is exactly x₁·(1−α)^n = x₁·Π decay_b, added at the
    * end. Blocks are assigned by per-key row_number — a partitioned
    * window (one shuffle + partition-local sort, O(1) state), giving a
    * HARD blockRows bound per block regardless of timestamp skew. */
  private[graft] def emaTwoPhase(events: org.apache.spark.sql.DataFrame,
      alpha: Double, blockRows: Int): org.apache.spark.sql.DataFrame =
    ewmMomentsTwoPhase(events, alpha, blockRows)
      .select(col("user_id"), col("n_events"), col("ema"))

  /** The q105 two-phase block fold generalized to ALL three EWM moment
    * sums (q145 consumes the full set; q105 selects just `ema`):
    * returns (user_id, n_events, ema, ems2, sw2) where, over the key's
    * values x in (ts, event_id) order with adjust=False weights
    * (w₁ = (1−α)^{n−1}, wᵢ = α(1−α)^{n−i}, Σw = 1):
    *   ema  = Σ wᵢ·xᵢ   (the q105 recurrence),
    *   ems2 = Σ wᵢ·xᵢ²  (same fold on squares — same decay (1−α)),
    *   sw2  = Σ wᵢ²     (fold with decay (1−α)², step α², seed 1).
    * Each is a fold f(acc,·) = d·acc + s whose block decomposition is
    * the q105 algebra verbatim (acc₀·d^m + fold-from-0), so per-task
    * state stays bounded by blockRows. Seed corrections: the fold from 0
    * gives the first element step-weight α (resp. α²) where the
    * recurrence seeds with weight 1, so the difference — x₁(1−α)·Πdecay
    * factors as x₁·Πdecay with Πdecay = (1−α)^n (q105's note), x₁²
    * likewise over decay, and for sw2 the weight-squared gap
    * (1−α)^{2(n−1)}(1−α²) = Πdecay2·(1−α²)/(1−α)². (1−α)^m runs as m
    * sequential multiplies, not pow(): bit-stable, no libm. */
  /** (user_id, block, xs): the per-key series cut into blockRows-bounded
    * blocks with the block's rows as a (ts, event_id, value)-sorted
    * array — the shared phase-1 frame of every EWM fold (q105/q145/q147).
    * Blocks come from a per-key row_number (one shuffle + partition-local
    * sort, O(1) state), so the blockRows bound holds under any timestamp
    * skew. */
  private def ewmBlockFrame(events: org.apache.spark.sql.DataFrame,
      blockRows: Int): org.apache.spark.sql.DataFrame = {
    val wKey = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events.withColumn("block",
      ((row_number().over(wKey) - 1) / blockRows).cast("long"))
      .groupBy(col("user_id"), col("block"))
      .agg(array_sort(collect_list(
        struct(col("ts"), col("event_id"), col("value")))).as("xs"))
  }

  private[graft] def ewmMomentsTwoPhase(events: org.apache.spark.sql.DataFrame,
      alpha: Double, blockRows: Int): org.apache.spark.sql.DataFrame = {
    val d1 = 1 - alpha
    val d2 = d1 * d1
    val a2 = alpha * alpha
    val blk = ewmBlockFrame(events, blockRows)
      .select(col("user_id"), col("block"),
        size(col("xs")).cast("long").as("m"),
        aggregate(col("xs"), lit(0.0),
          (acc, x) => acc * lit(d1) + x.getField("value") * lit(alpha))
          .as("part1"),
        aggregate(col("xs"), lit(0.0),
          (acc, x) => acc * lit(d1)
            + x.getField("value") * x.getField("value") * lit(alpha))
          .as("part2"),
        aggregate(col("xs"), lit(0.0), (acc, _) => acc * lit(d2) + lit(a2))
          .as("partw2"),
        aggregate(col("xs"), lit(1.0), (acc, _) => acc * lit(d1))
          .as("decay"),
        aggregate(col("xs"), lit(1.0), (acc, _) => acc * lit(d2))
          .as("decay2"),
        when(col("block") === 0, element_at(col("xs"), 1).getField("value"))
          .as("x1"))
    val x1 = element_at(col("bs"), 1).getField("x1")
    def foldPart(part: String, decay: String) =
      aggregate(col("bs"), lit(0.0),
        (acc, b) => acc * b.getField(decay) + b.getField(part))
    def foldDecay(decay: String) =
      aggregate(col("bs"), lit(1.0), (acc, b) => acc * b.getField(decay))
    blk.groupBy(col("user_id"))
      .agg(sum(col("m")).as("n_events"),
        array_sort(collect_list(
          struct(col("block"), col("part1"), col("part2"), col("partw2"),
            col("decay"), col("decay2"), col("x1")))).as("bs"))
      .select(col("user_id"), col("n_events"),
        (foldPart("part1", "decay") + x1 * foldDecay("decay")).as("ema"),
        (foldPart("part2", "decay") + x1 * x1 * foldDecay("decay")).as("ems2"),
        (foldPart("partw2", "decay2")
          + foldDecay("decay2") * lit((1 - alpha * alpha) / d2)).as("sw2"))
  }

  // --- q120: ROLLING MEDIAN — pandas `rolling(5).median()` per customer.
  //     Median is not sum-decomposable, so the frame is recomputed per row
  //     — fine at any corpus scale because the FRAME is bounded (5 rows)
  //     and the partition sort is the same single disk-backed
  //     Exchange+Sort every window here pays; a large-frame/unbounded
  //     rolling quantile would swap in a sketch (q79's path).
  //     Cross-engine exactness: the median interpolates between two frame
  //     values, which is only bit-stable if they are integers — so the
  //     percentile runs over exact price CENTS (q68's idiom: the
  //     double→decimal(18,2) cast is exact for 2-digit fixture prices),
  //     and the single /100.0 at the end is one identical double op in
  //     both engines.
  private val q120 = Q(
    "q120_rolling_median",
    "W2 rolling median over a 5-row frame (pandas rolling().median())",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-4, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("cents",
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .withColumn("rolling_median", expr("percentile(cents, 0.5)").over(w) / 100.0)
        .select(col("o_orderkey"), col("o_custkey"), col("rolling_median"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, o_custkey,
      quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT), 0.5)
        OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) / 100.0 AS rolling_median
    FROM orders ORDER BY o_orderkey"""))

  // --- q142: ROLLING CORRELATION (pandas `rolling(7).corr(other)`) —
  //     bivariate stats over a sliding frame, the indicator-analytics op
  //     rolling mean/median (q19/q120) can't express. All five rolling
  //     moment sums (n, Σx, Σy, Σx², Σy², Σxy) come from ONE window pass
  //     in exact decimals (the 7-row sums stay far under 2^53 scaled
  //     units, so decimal→double is exact); corr is then a single
  //     identical double expression tree on both engines. Frames
  //     partition by suppkey — one shuffle + partition-local sort, no
  //     global sort. Short frames (n < 2) and zero-variance frames
  //     surface as NULL on both sides.
  private val q142 = Q(
    "q142_rolling_corr",
    "W2 rolling(7) corr of quantity vs extendedprice per supplier",
    (s, d) => {
      // lineitem has NO unique key — (orderkey, linenumber) repeats with
      // different measures — so the window order includes BOTH measure
      // columns: any remaining ties are rows identical in every moment
      // input, whose frame multisets (hence corr) are order-invariant.
      // The output sort carries the same columns for the same reason.
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"))
        .rowsBetween(-6, Window.currentRow)
      // dsl's moment idiom: squares/products multiply in DOUBLE (one
      // identical IEEE op per row on both engines) and cast ONCE to a
      // wide decimal — a decimal×decimal square would need int128
      // physicals DuckDB only applies after an explicit widening cast,
      // and would also compute a (slightly) different exact value than
      // the double product. Scale 4, not dsl.Wide's 6: the products
      // carry ≤4 true decimals, and at scale 6 a 7-row price² sum
      // (~1.8e10) already passes 2^53 scaled units, where the
      // decimal→double cast itself rounds differently per engine (the
      // dsl LIMIT note) — at scale 4 every window sum stays exact.
      Tables.lineitem(s, d).select(
        col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        count(lit(1)).over(w).cast("double").as("n"),
        sum(col("l_quantity").cast(Money)).over(w).cast("double").as("sx"),
        sum(col("l_extendedprice").cast(Money)).over(w).cast("double").as("sy"),
        sum((col("l_quantity") * col("l_quantity")).cast("decimal(30,4)"))
          .over(w).cast("double").as("sxx"),
        sum((col("l_extendedprice") * col("l_extendedprice")).cast("decimal(30,4)"))
          .over(w).cast("double").as("syy"),
        sum((col("l_quantity") * col("l_extendedprice")).cast("decimal(30,4)"))
          .over(w).cast("double").as("sxy"))
        .select(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
          col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
          // n>=2 AND both variances > 0: a constant series has no defined
          // correlation — and under ANSI mode the division would (rightly)
          // error instead of minting an Infinity. Both engines take the
          // identical branch because the moment doubles are identical.
          when(col("n") >= 2
            && col("sxx") - col("sx") * col("sx") / col("n") > 0
            && col("syy") - col("sy") * col("sy") / col("n") > 0,
            (col("sxy") - col("sx") * col("sy") / col("n"))
              / (sqrt(col("sxx") - col("sx") * col("sx") / col("n"))
                * sqrt(col("syy") - col("sy") * col("sy") / col("n"))))
            .as("roll_corr"))
        .orderBy(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
          col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
    },
    Some("""WITH m AS (SELECT l_suppkey, l_shipdate, l_orderkey,
        l_linenumber, l_quantity, l_extendedprice,
        CAST(COUNT(*) OVER w AS DOUBLE) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sx,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sy,
        CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,4))) OVER w
          AS DOUBLE) AS sxx,
        CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,4))) OVER w
          AS DOUBLE) AS syy,
        CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(30,4))) OVER w
          AS DOUBLE) AS sxy
      FROM lineitem
      WINDOW w AS (PARTITION BY l_suppkey
        ORDER BY l_shipdate, l_orderkey, l_linenumber,
          l_quantity, l_extendedprice
        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
    SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
      l_quantity, l_extendedprice,
      CASE WHEN n >= 2 AND sxx - sx * sx / n > 0
             AND syy - sy * sy / n > 0 THEN
        (sxy - sx * sy / n)
          / (SQRT(sxx - sx * sx / n) * SQRT(syy - sy * sy / n))
      END AS roll_corr
    FROM m ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber,
      l_quantity, l_extendedprice"""))

  // --- q206: ROLLING Z-SCORE ANOMALY DAYS — the pointwise-outlier
  //     complement of q204's level-shift CUSUM: flag days whose total is
  //     >2 trailing-7-day standard deviations from the trailing mean.
  //     Floating μ/σ per frame would make the flag engine-dependent near
  //     the threshold, so the test |x−μ| > 2σ is CROSS-MULTIPLIED to
  //     exact integers: with S=Σ₇x, SS=Σ₇x² (integer-cent window sums),
  //     flag ⟺ 3·(7x−S)² > 14·(7·SS−S²) — algebra: (x−S/7)² > 4·(7SS−S²)/(7·6)
  //     scaled by 147. Bounds ≈3e17 at sf0.1 (inside long; DECIMAL at
  //     larger SF). The presented z uses the same exact integers through
  //     one sqrt/divide chain + fpTrunc. Windows are 7-row frames per
  //     event_type on the days-sized series (the q200 shape); rows
  //     without a full 7-day history are not scored (cnt=7 guard), the
  //     pandas min_periods contract. Output: the flagged days only —
  //     the alarm feed, not the whole series.
  private val q206 = Q(
    "q206_rolling_zscore_anomaly",
    "W2 ✦ rolling 7-day z-score anomaly days (cross-multiplied integer threshold, exact window moments)",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("(ts div 1000) div 86400000000").as("day"))
        .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
          .as("x"))
      val w7 = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-6, Window.currentRow)
      daily
        .withColumn("s7", sum(col("x")).over(w7))
        .withColumn("ss7", sum(col("x") * col("x")).over(w7))
        .withColumn("cnt", count(lit(1)).over(w7))
        .filter(col("cnt") === 7)
        .withColumn("dev", lit(7L) * col("x") - col("s7"))
        .withColumn("varn", lit(7L) * col("ss7") - col("s7") * col("s7"))
        .filter(lit(3L) * col("dev") * col("dev") > lit(14L) * col("varn"))
        .select(col("event_type"), col("day"), col("x").as("cents"),
          fpTrunc(col("dev").cast("double")
            / sqrt(col("varn").cast("double") * lit(7.0) / lit(6.0)), 9)
            .as("z"))
        .orderBy(col("event_type"), col("day"))
    },
    Some(s"""WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS x
      FROM events GROUP BY 1, 2),
    r AS (
      SELECT event_type, day, x,
        CAST(SUM(x) OVER w AS BIGINT) AS s7,
        CAST(SUM(x * x) OVER w AS BIGINT) AS ss7,
        COUNT(*) OVER w AS cnt
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
    f AS (SELECT event_type, day, x, 7 * x - s7 AS dev,
        7 * ss7 - s7 * s7 AS varn
      FROM r WHERE cnt = 7)
    SELECT event_type, day, x AS cents,
      ${fpTruncSql(
        "CAST(dev AS DOUBLE) / SQRT(CAST(varn AS DOUBLE) * 7.0 / 6.0)", 9)} AS z
    FROM f WHERE 3 * dev * dev > 14 * varn
    ORDER BY event_type, day"""))

  // --- q235: CLAMPED RUNNING BALANCE — the inventory/wallet scan
  //     s_t = max(0, s_{t−1} + x_t), the canonical NON-LINEAR prefix
  //     recursion that looks sequential but is not: the closed form
  //     s_t = cum_t − min(0, min_{k≤t} cum_k) (withdrawals that would
  //     overdraw are forfeited, which is exactly the running-min deficit)
  //     turns it into TWO ordinary window passes — cumulative sum, then
  //     running min — both partitioned by user, so the whole scan
  //     distributes with zero cross-key traffic and no sequential state.
  //     Here only the per-user FINAL state is reported, which needs just
  //     cum's per-key MIN and SUM: one window pass + one hash aggregate.
  //     Everything is exact integer cents (credits: purchase/signup;
  //     debits: all other event types). The oracle runs the NAIVE
  //     sequential recurrence (list_reduce greatest(acc+x, 0) over the
  //     (ts, event_id)-ordered list) — a genuinely different algorithm,
  //     certifying the closed form.
  private val q235 = Q(
    "q235_clamped_running_balance",
    "✦ non-linear scan: clamp-at-zero running balance via cumsum − running-min identity",
    (s, d) => {
      val tx = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          (when(col("event_type").isin("purchase", "signup"), lit(1))
            .otherwise(lit(-1))
            * (col("value").cast("decimal(18,2)") * 100).cast("long"))
            .as("cents"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tx.withColumn("cum", sum(col("cents")).over(w))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_tx"),
          sum(col("cents")).as("net_cents"),
          min(col("cum")).as("min_prefix_cents"))
        .select(col("user_id"), col("n_tx"), col("net_cents"),
          col("min_prefix_cents"),
          (col("net_cents") - least(col("min_prefix_cents"), lit(0L)))
            .as("end_balance_cents"))
        .orderBy(col("user_id"))
    },
    Some("""WITH tx AS (SELECT user_id, ts, event_id,
        (CASE WHEN event_type IN ('purchase', 'signup') THEN 1 ELSE -1 END)
          * CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events),
    l AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_tx,
        CAST(SUM(cents) AS BIGINT) AS net_cents,
        list(cents ORDER BY ts, event_id) AS xs
      FROM tx GROUP BY user_id),
    mn AS (SELECT user_id, CAST(MIN(cum) AS BIGINT) AS min_prefix_cents FROM (
        SELECT user_id, SUM(cents) OVER (PARTITION BY user_id
          ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM tx) GROUP BY user_id)
    SELECT l.user_id, n_tx, net_cents, min_prefix_cents,
      list_reduce(list_concat([CAST(0 AS BIGINT)], xs),
        (acc, x) -> GREATEST(acc + x, CAST(0 AS BIGINT)))
        AS end_balance_cents
    FROM l JOIN mn ON l.user_id = mn.user_id
    ORDER BY l.user_id"""))

  def defs: Seq[Q] = Seq(q18, q19, q20, q21, q22, q77, q80, q86, q105, q120,
    q142, q145, q147, q151, q206, q235)
}
