package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import RelationalOps.{exactMoneySum, round6}

/** Supply-chain analytics: the six TPC-H query shapes the engine did not
  * yet cover — Q6 (q91), Q12 (q92), Q9 (q93), Q2 (q94), Q11 (q95),
  * Q20 (q96). The testdata star schema has no `partsupp` table, so the
  * Q2/Q11/Q20 family runs over [[derivedPartSupp]], a part×supplier
  * catalog derived deterministically from `lineitem` (cost = min unit
  * price in integer cents, qty = total shipped units — both exact
  * integers, so every downstream min/sum/compare is bit-identical
  * across engines and partitionings). The SHAPES — correlated min
  * decorrelated to a partitioned window, scalar-subquery threshold as a
  * 1-row broadcast, EXISTS chain as LEFT SEMI — are the TPC-H ones.
  *
  * 100 TB notes: the derivation is one partial→final aggregate on
  * (partkey, suppkey) — the natural shuffle key family for everything
  * downstream, so a real deployment would materialize it bucketed by
  * partkey and every query here reuses that partitioning. All dimension
  * joins (part/supplier/nation/region) broadcast; the only O(fact)
  * shuffles are the q92 orderkey join and the q93 orderkey join, both
  * unavoidable fact-fact joins with the smaller side pre-filtered.
  */
object SupplyChainOps {

  // ---------------------------------------------------------------- ps
  /** Derived part-supplier catalog (partsupp stand-in):
    * ps_cost_cents = min unit price over that supplier's shipments of
    * the part, in integer cents (min of identically-rounded longs —
    * exact); ps_qty = total units shipped (quantities are integral
    * doubles ≤ 50, cast to long before summing — exact). One
    * partial→final hash aggregate; at scale this is the artifact you
    * bucket by ps_partkey and persist.
    */
  def derivedPartSupp(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_partkey".as("ps_partkey"), $"l_suppkey".as("ps_suppkey"))
      .agg(
        min(round($"l_extendedprice" / $"l_quantity" * 100, 0).cast("long"))
          .as("ps_cost_cents"),
        sum($"l_quantity".cast("long")).as("ps_qty"))
  }

  /** Oracle-side twin of [[derivedPartSupp]] (identical arithmetic:
    * the unit-price division is one IEEE double op on identical
    * inputs, then round-half-away + integer min/sum).
    */
  val psCte: String =
    """ps AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |         min(CAST(round(l_extendedprice / l_quantity * 100, 0) AS BIGINT)) AS ps_cost_cents,
      |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS ps_qty
      |  FROM lineitem GROUP BY 1, 2)""".stripMargin

  // ---------------------------------------------------------------- q91
  /** Forecast-revenue scan (TPC-H Q6): the pure-pushdown showcase — a
    * single-table scan whose three predicates ALL reach the parquet
    * reader (PushedFilters: shipdate range, discount range, quantity
    * bound; plan-asserted in SupplyChainSpec), one partial→final
    * scalar aggregate, zero joins, zero row-level shuffle. At 100 TB
    * this is min/max-pruned row groups + a 32-byte partial per task.
    */
  val FcStart = "1997-01-01"
  val FcEnd = "1998-01-01"

  def q91ForecastRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= lit(FcStart).cast("timestamp_ntz") &&
        $"l_shipdate" < lit(FcEnd).cast("timestamp_ntz") &&
        $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
      .agg(
        round(exactMoneySum($"l_extendedprice" * $"l_discount"), 6).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val q91Sql: String =
    s"""SELECT
       |  round(CAST(sum(CAST(round(l_extendedprice*l_discount*10000, 0) AS BIGINT)) AS DOUBLE)/10000.0, 6) AS revenue,
       |  count(*) AS n_lines
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '$FcStart 00:00:00'
       |  AND l_shipdate <  TIMESTAMP '$FcEnd 00:00:00'
       |  AND l_discount BETWEEN 0.05 AND 0.07
       |  AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------- q92
  /** Shipping-delay priority split (TPC-H Q12 shape). The testdata has
    * no l_shipmode/l_receiptdate, so the "mode" is a derived
    * ship-delay bucket (days between order and ship date); the shape —
    * a fact-fact orderkey join feeding conditional counts per mode —
    * is Q12's. The join shuffles both sides on orderkey once; the
    * conditional aggregation is partial→final on 3 groups.
    */
  val DelayYear = "1997"

  def q92ShipDelayModes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val delay = datediff($"l_shipdate", $"o_orderdate")
    val highPri = $"o_orderpriority" === "1-URGENT" || $"o_orderpriority" === "2-HIGH"
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= lit(s"$DelayYear-01-01").cast("timestamp_ntz") &&
        $"l_shipdate" < lit(s"${DelayYear.toInt + 1}-01-01").cast("timestamp_ntz"))
      .select($"l_orderkey", $"l_shipdate")
      .join(Tables.orders(s, dir)
        .select($"o_orderkey", $"o_orderdate", $"o_orderpriority"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy(
        when(delay < 30, "FAST").when(delay < 90, "MEDIUM").otherwise("SLOW")
          .as("delay_mode"))
      .agg(
        sum(when(highPri, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(highPri, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy($"delay_mode")
  }

  val q92Sql: String =
    s"""SELECT
       |  CASE WHEN datediff('day', o_orderdate, l_shipdate) < 30 THEN 'FAST'
       |       WHEN datediff('day', o_orderdate, l_shipdate) < 90 THEN 'MEDIUM'
       |       ELSE 'SLOW' END AS delay_mode,
       |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE l_shipdate >= TIMESTAMP '$DelayYear-01-01 00:00:00'
       |  AND l_shipdate <  TIMESTAMP '${DelayYear.toInt + 1}-01-01 00:00:00'
       |GROUP BY delay_mode ORDER BY delay_mode""".stripMargin

  // ---------------------------------------------------------------- q93
  /** Product-line profit by nation and year (TPC-H Q9 shape). The
    * schema has no ps_supplycost; cost is the deterministic synthetic
    * 60% of p_retailprice — the same expression on both engines, so
    * the scaled-long profit sum stays exact. Join order: the part cut
    * (name substring) shrinks lineitem FIRST via broadcast, then the
    * 100-row supplier+nation dimensions broadcast, and only the
    * surviving fragment pays the orderkey shuffle against orders.
    */
  val ProfitNoun = "gear"

  def q93ProductProfit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val amount = $"l_extendedprice" * (lit(1.0) - $"l_discount") -
      lit(0.6) * $"p_retailprice" * $"l_quantity"
    Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_partkey", $"l_suppkey",
        $"l_quantity", $"l_extendedprice", $"l_discount")
      .join(broadcast(Tables.part(s, dir)
        .filter($"p_name".contains(ProfitNoun))
        .select($"p_partkey", $"p_retailprice")),
        $"l_partkey" === $"p_partkey")
      .join(broadcast(Tables.supplier(s, dir).select($"s_suppkey", $"s_nationkey")
        .join(broadcast(Tables.nation(s, dir).select($"n_nationkey", $"n_name")),
          $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"n_name")),
        $"l_suppkey" === $"s_suppkey")
      .join(Tables.orders(s, dir).select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"n_name".as("nation"), year($"o_orderdate").as("o_year"))
      .agg(round(exactMoneySum(amount), 6).as("sum_profit"))
      .orderBy($"nation", $"o_year".desc)
  }

  val q93Sql: String =
    s"""SELECT n_name AS nation, year(o_orderdate) AS o_year,
       |  round(CAST(sum(CAST(round((l_extendedprice*(1.0-l_discount) - 0.6*p_retailprice*l_quantity)*10000, 0) AS BIGINT)) AS DOUBLE)/10000.0, 6) AS sum_profit
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN orders ON l_orderkey = o_orderkey
       |WHERE p_name LIKE '%$ProfitNoun%'
       |GROUP BY n_name, o_year ORDER BY nation, o_year DESC""".stripMargin

  // ---------------------------------------------------------------- q94
  /** Minimum-cost supplier (TPC-H Q2 shape): for each STANDARD part of
    * size ≤ 10, the EUROPE supplier(s) offering the minimum derived
    * cost. The correlated min subquery is decorrelated to a window min
    * partitioned by part — one partitioned shuffle, no per-part
    * subquery execution — and the equality compares integer cents, so
    * ties survive identically in both engines (all tied suppliers are
    * kept, like Q15's argmax contract).
    */
  val MinCostRegion = "EUROPE"
  val MinCostType = "STANDARD"
  val MinCostMaxSize = 10

  def q94MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val eurSupp = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_name", $"s_acctbal", $"s_nationkey")
      .join(broadcast(Tables.nation(s, dir)
        .join(Tables.region(s, dir).filter($"r_name" === MinCostRegion),
          $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey", $"n_name")),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
    val scoped = derivedPartSupp(s, dir)
      .join(broadcast(Tables.part(s, dir)
        .filter($"p_type" === MinCostType && $"p_size" <= MinCostMaxSize)
        .select($"p_partkey", $"p_name")),
        $"ps_partkey" === $"p_partkey")
      .join(broadcast(eurSupp), $"ps_suppkey" === $"s_suppkey")
    scoped
      .withColumn("min_cost",
        min($"ps_cost_cents").over(Window.partitionBy($"ps_partkey")))
      .filter($"ps_cost_cents" === $"min_cost")
      .select($"p_partkey", $"p_name", $"s_name", $"s_acctbal", $"n_name",
        round($"ps_cost_cents" / 100.0, 6).as("supply_cost"))
      .orderBy($"s_acctbal".desc, $"n_name", $"s_name", $"p_partkey")
  }

  val q94Sql: String =
    s"""WITH $psCte,
       |eur AS (
       |  SELECT s_suppkey, s_name, s_acctbal, n_name
       |  FROM supplier
       |  JOIN nation ON s_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey
       |  WHERE r_name = '$MinCostRegion'),
       |scoped AS (
       |  SELECT p_partkey, p_name, s_name, s_acctbal, n_name, ps_cost_cents,
       |         min(ps_cost_cents) OVER (PARTITION BY ps_partkey) AS min_cost
       |  FROM ps
       |  JOIN part ON ps_partkey = p_partkey
       |  JOIN eur ON ps_suppkey = s_suppkey
       |  WHERE p_type = '$MinCostType' AND p_size <= $MinCostMaxSize)
       |SELECT p_partkey, p_name, s_name, s_acctbal, n_name,
       |       round(ps_cost_cents / 100.0, 6) AS supply_cost
       |FROM scoped WHERE ps_cost_cents = min_cost
       |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""".stripMargin

  // ---------------------------------------------------------------- q95
  /** Important-stock parts (TPC-H Q11 shape): inventory value per part
    * held by one nation's suppliers, keeping parts whose value exceeds
    * 1.2× the mean part value. The threshold is TPC-H's scalar
    * subquery — here a 1-row aggregate broadcast against the grouped
    * values, never a window over everything. Values are
    * cents×units LONGs: sums, the mean, and the comparison are exact.
    */
  val StockNation = "NATION_7"

  def q95ImportantStock(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val natSupp = Tables.supplier(s, dir).select($"s_suppkey", $"s_nationkey")
      .join(broadcast(Tables.nation(s, dir)
        .filter($"n_name" === StockNation).select($"n_nationkey")),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey")
    val value = derivedPartSupp(s, dir)
      .join(broadcast(natSupp), $"ps_suppkey" === $"s_suppkey")
      .groupBy($"ps_partkey")
      .agg(sum($"ps_cost_cents" * $"ps_qty").as("value_cents"))
    value
      .join(broadcast(value.agg((avg($"value_cents") * 1.2).as("threshold"))))
      .filter($"value_cents" > $"threshold")
      .select($"ps_partkey", $"value_cents")
      .orderBy($"value_cents".desc, $"ps_partkey")
  }

  val q95Sql: String =
    s"""WITH $psCte,
       |nat AS (
       |  SELECT s_suppkey FROM supplier
       |  JOIN nation ON s_nationkey = n_nationkey
       |  WHERE n_name = '$StockNation'),
       |val AS (
       |  SELECT ps_partkey, CAST(sum(ps_cost_cents * ps_qty) AS BIGINT) AS value_cents
       |  FROM ps JOIN nat ON ps_suppkey = s_suppkey
       |  GROUP BY ps_partkey)
       |SELECT ps_partkey, value_cents
       |FROM val
       |WHERE value_cents > (SELECT avg(value_cents) * 1.2 FROM val)
       |ORDER BY value_cents DESC, ps_partkey""".stripMargin

  // ---------------------------------------------------------------- q96
  /** Concentrated-shipper detection (TPC-H Q20 shape): suppliers in
    * one region who shipped more than 1.5× the per-supplier average
    * quantity of some 'small…' part during [[ConcYear]]. The original's
    * nested EXISTS chain becomes: per-(part,supplier) 1997 totals, a
    * window average per part, and a LEFT SEMI join from `supplier` to
    * the qualifying pairs — supplier rows never duplicate no matter
    * how many parts qualify. Quantities are exact longs; the 1.5×
    * average compares an identical double on both engines.
    */
  val ConcYear = "1997"
  val ConcPrefix = "small"
  val ConcRegion = "ASIA"
  val ConcFactor = 1.5

  def q96ConcentratedShippers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ps97 = Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= lit(s"$ConcYear-01-01").cast("timestamp_ntz") &&
        $"l_shipdate" < lit(s"${ConcYear.toInt + 1}-01-01").cast("timestamp_ntz"))
      .join(broadcast(Tables.part(s, dir)
        .filter($"p_name".startsWith(ConcPrefix)).select($"p_partkey")),
        $"l_partkey" === $"p_partkey")
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(sum($"l_quantity".cast("long")).as("qty"))
    val qualifying = ps97
      .withColumn("avg_qty",
        avg($"qty").over(Window.partitionBy($"l_partkey")))
      .filter($"qty" > lit(ConcFactor) * $"avg_qty")
      .select($"l_suppkey")
    Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_name", $"s_nationkey")
      .join(broadcast(Tables.nation(s, dir)
        .join(Tables.region(s, dir).filter($"r_name" === ConcRegion),
          $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey", $"n_name")),
        $"s_nationkey" === $"n_nationkey")
      .join(qualifying, $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_suppkey", $"s_name", $"n_name")
      .orderBy($"s_suppkey")
  }

  val q96Sql: String =
    s"""WITH ps97 AS (
       |  SELECT l_partkey, l_suppkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE p_name LIKE '$ConcPrefix%'
       |    AND l_shipdate >= TIMESTAMP '$ConcYear-01-01 00:00:00'
       |    AND l_shipdate <  TIMESTAMP '${ConcYear.toInt + 1}-01-01 00:00:00'
       |  GROUP BY l_partkey, l_suppkey),
       |qual AS (
       |  SELECT l_suppkey FROM (
       |    SELECT l_suppkey, qty,
       |           avg(qty) OVER (PARTITION BY l_partkey) AS avg_qty
       |    FROM ps97)
       |  WHERE qty > $ConcFactor * avg_qty)
       |SELECT s_suppkey, s_name, n_name
       |FROM supplier
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = '$ConcRegion'
       |  AND EXISTS (SELECT 1 FROM qual WHERE qual.l_suppkey = s_suppkey)
       |ORDER BY s_suppkey""".stripMargin

  /** Query + oracle registry contributed by this module. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q91_forecast_revenue" -> (q91ForecastRevenue _),
    "q92_ship_delay_modes" -> (q92ShipDelayModes _),
    "q93_product_profit" -> (q93ProductProfit _),
    "q94_min_cost_supplier" -> (q94MinCostSupplier _),
    "q95_important_stock" -> (q95ImportantStock _),
    "q96_concentrated_shippers" -> (q96ConcentratedShippers _),
  )

  val oracles: Map[String, String] = Map(
    "q91_forecast_revenue" -> q91Sql,
    "q92_ship_delay_modes" -> q92Sql,
    "q93_product_profit" -> q93Sql,
    "q94_min_cost_supplier" -> q94Sql,
    "q95_important_stock" -> q95Sql,
    "q96_concentrated_shippers" -> q96Sql,
  )
}
