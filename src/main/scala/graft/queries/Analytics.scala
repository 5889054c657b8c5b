package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational analytics battery over the driver's TPC-H-ish tables and
  * the events table (the reference has no relational workload — SURVEY.md
  * §2.H — but the engine runs on a general Spark cluster, and these rows
  * give the gate hard oracle signal for join / partitioned-window /
  * rollup / time-window shapes; the events query is the batch mirror of
  * StreamingCorrection.eventWindowAgg).
  *
  * Determinism across engines: every money aggregate is folded to integer
  * CENTS per row BEFORE summing — `CAST(round(x * 100) AS BIGINT)` is a
  * per-row double op (identical IEEE result in Spark and DuckDB), and
  * integer sums are order-independent, unlike double sums whose value
  * depends on partial-aggregation order. Ratios are then derived from the
  * exact integer sums. */
object Analytics {

  /** Fact-table read. Measured (round 6, interleaved A/B at sf0.1):
    * these scans' map stages (date parse, cents fold) are light enough
    * that the adaptive fan-out's extra exchange costs MORE than the
    * parallelism gains at single-split local sizes (e.g. q_scd_current
    * 0.19 s raw vs 0.70 s fanned, q_events_window 0.25 vs 0.72), so —
    * unlike the CPU-heavy document scans — they read raw; at real
    * scale the inputs are well-split anyway. */
  private def fact(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Money column -> integer cents (deterministic per row). */
  private def cents(colExpr: String) =
    expr(s"CAST(round(($colExpr) * 100) AS BIGINT)")

  /** TPC-H Q1 shape: pricing summary over lineitem (scan + filter +
    * 2-key hash agg; partial+final, no joins). */
  def qTpchPricing(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    fact(s, dir, "lineitem")
      .where($"l_shipdate".cast("date") <= lit("1998-09-02").cast("date"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity".cast("long")).as("sum_qty"),
        sum(cents("l_extendedprice")).as("sum_base_c"),
        sum(cents("l_extendedprice * (1 - l_discount)")).as("sum_disc_c"),
        sum(cents("l_extendedprice * (1 - l_discount) * (1 + l_tax)"))
          .as("sum_charge_c"),
        count(lit(1)).as("count_order"))
      .select($"l_returnflag", $"l_linestatus", $"sum_qty", $"sum_base_c",
        $"sum_disc_c", $"sum_charge_c", $"count_order",
        round($"sum_qty" / $"count_order", 6).as("avg_qty"),
        round($"sum_base_c" / lit(100.0) / $"count_order", 6).as("avg_price"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Top-3 customers by revenue per nation: 3-way join (dimensions
    * broadcast) + a PARTITIONED window (rank per nation — bounded
    * partitions, unlike a global window). */
  def qTpchTopCustomers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l = fact(s, dir, "lineitem")
      .select($"l_orderkey", cents("l_extendedprice * (1 - l_discount)").as("rev_c"))
    val o = fact(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey")
    val c = s.read.parquet(s"$dir/customer.parquet")
      .select($"c_custkey", $"c_name", $"c_nationkey")
    val n = s.read.parquet(s"$dir/nation.parquet")
      .select($"n_nationkey", $"n_name")
    // customer is a FACT-scaling table (sf100 ~ 15M rows) — no forced
    // broadcast; AQE picks broadcast at small scale and falls back to a
    // shuffle join past the threshold. nation (25 rows) stays hinted.
    val rev = l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name", $"c_custkey", $"c_name")
      .agg(sum($"rev_c").as("revenue_c"))
    rev.select($"n_name", $"c_custkey", $"c_name", $"revenue_c",
        rank().over(org.apache.spark.sql.expressions.Window
          .partitionBy($"n_name")
          .orderBy($"revenue_c".desc, $"c_custkey".asc)).as("rnk"))
      .where($"rnk" <= 3)
      .orderBy($"n_name", $"rnk", $"c_custkey")
  }

  /** Revenue by region/nation with ROLLUP subtotals (grouping sets over
    * a 5-way join; 'ALL' labels the rollup levels). */
  def qTpchRevenueRollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l = fact(s, dir, "lineitem")
      .select($"l_orderkey", cents("l_extendedprice * (1 - l_discount)").as("rev_c"))
    val o = fact(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey")
    val c = s.read.parquet(s"$dir/customer.parquet")
      .select($"c_custkey", $"c_nationkey")
    val n = s.read.parquet(s"$dir/nation.parquet")
      .select($"n_nationkey", $"n_regionkey", $"n_name")
    val r = s.read.parquet(s"$dir/region.parquet")
      .select($"r_regionkey", $"r_name")
    // customer scales with the corpus — leave its join to AQE (see
    // qTpchTopCustomers); nation/region are constant-size dims.
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", $"n_name")
      .agg(sum($"rev_c").as("revenue_c"), count(lit(1)).as("n_items"))
      .select(coalesce($"r_name", lit("ALL")).as("region"),
        coalesce($"n_name", lit("ALL")).as("nation"),
        $"revenue_c", $"n_items")
      .orderBy($"region", $"nation")
  }

  /** TPC-H Q14 shape: monthly promo revenue share over lineitem x part.
    * part scales with the corpus (sf100 ~ 20M rows) so its join carries
    * NO broadcast hint — AQE broadcasts at small scale and shuffles
    * past the threshold; the month key is the wall-clock yyyy-MM (the
    * session runs UTC, so Spark and DuckDB read the same parquet value). */
  def qTpchPromo(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l = fact(s, dir, "lineitem")
      .select(date_format($"l_shipdate", "yyyy-MM").as("month"),
        $"l_partkey", cents("l_extendedprice * (1 - l_discount)").as("rev_c"))
    val p = s.read.parquet(s"$dir/part.parquet")
      .select($"p_partkey", ($"p_type" === "PROMO").as("is_promo"))
    l.join(p, $"l_partkey" === $"p_partkey")
      .groupBy($"month")
      .agg(sum(when($"is_promo", $"rev_c").otherwise(0L)).as("promo_rev_c"),
        sum($"rev_c").as("rev_c"))
      .select($"month", $"promo_rev_c", $"rev_c",
        round(lit(100.0) * $"promo_rev_c" / $"rev_c", 6).as("promo_pct"))
      .orderBy($"month")
  }

  /** ANTI-join shape: parts with NO bulk sale (no lineitem of quantity
    * > 45) — the filter runs BEFORE the join so the anti probe side is
    * already pruned, and the LeftAnti join needs only l_partkey from
    * the fact table (column pruning reaches the scan). */
  def qPartsCold(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bulk = fact(s, dir, "lineitem")
      .where($"l_quantity" > 45).select($"l_partkey")
    s.read.parquet(s"$dir/part.parquet")
      .join(bulk, $"p_partkey" === $"l_partkey", "left_anti")
      .select($"p_partkey", $"p_name", $"p_brand", $"p_size")
      .orderBy($"p_partkey")
  }

  /** SEMI-join shape: suppliers with at least one recent bulk shipment
    * (quantity > 49 shipped on/after 2001-06-01). LeftSemi keeps the
    * supplier row without duplicating it per matching lineitem — no
    * post-join distinct. acctbal is emitted as integer cents
    * (per-row cast, engine-independent). */
  def qSuppliersHot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val recent = fact(s, dir, "lineitem")
      .where($"l_quantity" > 49 &&
        $"l_shipdate".cast("date") >= lit("2001-06-01").cast("date"))
      .select($"l_suppkey")
    s.read.parquet(s"$dir/supplier.parquet")
      .join(recent, $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_suppkey", $"s_name", $"s_nationkey",
        cents("s_acctbal").as("acctbal_c"))
      .orderBy($"s_suppkey")
  }

  /** AS-OF join (purchase -> most recent prior view by the same user),
    * an operator Spark lacks natively. Implemented the 100-TB way: tag
    * both sides, union, ONE shuffle on user_id, and carry the last
    * view forward with a running `last(..., ignoreNulls)` window —
    * never a range self-join (whose output explodes quadratically in
    * events-per-user). Ties (view.ts == purchase.ts) match, like
    * DuckDB's ASOF `ON p.ts >= v.ts` (the side column orders views
    * before purchases at equal ts). Inner form: purchases with no
    * prior view are dropped. */
  def qEventsAsof(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = fact(s, dir, "events")
      .withColumn("ts", $"ts".cast("timestamp"))
    val tagged = ev.where($"event_type".isin("view", "purchase"))
      .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"),
        cents("value").as("value_c"),
        when($"event_type" === "purchase", 1).otherwise(0).as("side"))
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts_us".asc, $"side".asc, $"event_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_view", last(
        when($"side" === 0, struct($"ts_us", $"value_c")),
        ignoreNulls = true).over(w))
      .where($"side" === 1 && $"last_view".isNotNull)
      .select($"event_id", $"user_id", $"ts_us".as("p_ts_us"),
        $"value_c".as("p_value_c"),
        $"last_view.ts_us".as("v_ts_us"),
        $"last_view.value_c".as("v_value_c"))
      .orderBy($"event_id")
  }

  /** GAP-BASED SESSIONIZATION — the classic clickstream shape: a new
    * session starts when a user is idle > 30 minutes. Session boundary
    * = lag window, session id = running sum of boundaries, both over
    * the SAME (user_id, ordered by ts_us, event_id) window — one
    * user_id Exchange serves both, and the deterministic compound sort
    * key means the default RANGE frame has no peers on either engine.
    * The per-session rollup groups on (user_id, sess_id): its exchange
    * moves only session-sized partial aggregates (map-side combine
    * compresses events to sessions before the shuffle). Timestamps are
    * compared and emitted as epoch MICROS (BIGINT) — no timezone or
    * interval dialect in the cross-engine surface; money folds to
    * integer cents per row. At 100 TB user_id is the natural
    * partition key and a hot user costs one window buffer, never a
    * corpus-sized group. */
  def qSessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val GAP_US = 30L * 60 * 1000000
    val ev = fact(s, dir, "events")
      .select($"user_id", $"event_id",
        unix_micros($"ts".cast("timestamp")).as("us"),
        cents("value").as("value_c"))
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    ev.withColumn("new_sess",
        when(coalesce($"us" - lag($"us", 1).over(w), lit(Long.MaxValue))
          > GAP_US, 1L).otherwise(0L))
      .withColumn("sess_id", sum($"new_sess").over(w))
      .groupBy($"user_id", $"sess_id")
      .agg(count(lit(1)).as("n_events"),
        min($"us").as("start_us"), max($"us").as("end_us"),
        sum($"value_c").as("total_c"))
      .select($"user_id", $"sess_id", $"n_events", $"start_us", $"end_us",
        expr("(end_us - start_us) div 1000000").as("dur_s"), $"total_c")
      .orderBy($"user_id", $"sess_id")
  }

  /** SCD "current state" view — the latest-wins compaction every CDC /
    * lakehouse pipeline runs (the relational face of
    * [[graft.pipeline.TableIO.mergeDocs]]'s upsert semantics): per
    * user, the most recent event by (ts, event_id) decides the row.
    *
    * Scale shape: ONE max(struct(ts, event_id, ...)) hash aggregate —
    * map-side combinable, per-group state is a single struct. The
    * row_number()-over-user window formulation (what the oracle uses,
    * deliberately independent) would buffer and sort whole partitions
    * to keep rank 1; the struct-max agg never holds more than one row
    * per group per task. Tie-break is total because event_id is
    * unique; ts emits as epoch micros (BIGINT, timezone-free on both
    * engines) and value as integer cents. */
  def qScdCurrent(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    fact(s, dir, "events")
      .withColumn("ts", $"ts".cast("timestamp")) // NTZ -> LTZ (UTC session)
      .groupBy($"user_id")
      .agg(max(struct($"ts", $"event_id", $"event_type",
        cents("value").as("c"))).as("m"))
      .select($"user_id", unix_micros($"m.ts").as("last_us"),
        $"m.event_id".as("last_event_id"), $"m.event_type".as("last_type"),
        $"m.c".as("last_c"))
      .orderBy($"user_id")
  }

  /** Batch mirror of the streaming 5-minute window aggregation
    * (StreamingCorrection.eventWindowAgg): tumbling window per
    * event_type, epoch-aligned; window start emitted as epoch seconds
    * (BIGINT) so the value is timezone-free on both engines. */
  def qEventsWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    fact(s, dir, "events")
      .withColumn("ts", $"ts".cast("timestamp")) // NTZ -> LTZ (UTC session)
      .groupBy(window($"ts", "5 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"), sum(cents("value")).as("total_c"))
      .select(unix_timestamp($"window.start").as("w_start"),
        $"event_type", $"n", $"total_c")
      .orderBy($"w_start", $"event_type")
  }
}
