package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-10 additions (driver round 4, batch 11): the exact-distinct
  * bitmap aggregate family Spark added in 3.5/4.x, plus four
  * product-analytics / feature-store staples — point-in-time dimension
  * enrichment, multi-touch attribution, activity streaks, and an A/B
  * experiment readout on exact moments.
  *
  * Same determinism contract as every gated family: integer-exact
  * carriers (milli-unit longs, decimal partial sums) through every
  * aggregate, ONE double excursion in the identical expression form on
  * both engines, deterministic orderings with unique-id tie-breaks,
  * md5 (never rand()) for any "random" assignment.
  */
object Round10Queries {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).withColumn("ts_us", unix_micros(col("ts")))

  // ---------------------------------------------------------------- q196
  /** Exact distinct counting via the bitmap aggregate family
    * (`bitmap_bucket_number` / `bitmap_bit_position` /
    * `bitmap_construct_agg` / `bitmap_or_agg` / `bitmap_count`, added
    * in Spark 3.5) — the MERGEABLE exact-distinct pattern: ids are
    * bucketed into 32k-bit bitmaps, per-(type, day, bucket) bitmaps
    * are built once, and BOTH readouts derive from those same bitmaps
    * — per-day distincts as `bitmap_count` sums, and the per-type
    * distinct as `bitmap_or_agg` across days (count(DISTINCT) can
    * never be re-aggregated; OR-ing bitmaps is the whole point — a
    * precomputed daily cube rolls up to any coarser grain without
    * touching raw data). That rollup-from-sketch step is exactly what
    * a 100 TB daily-active-users pipeline materializes; unlike HLL the
    * answer is EXACT, so the plain-count(DISTINCT) DuckDB oracle gates
    * it hash-exact. Memory is bounded by id-range/8 bits per group —
    * the reason for the bucket dimension (sparse id spaces cost one
    * small bitmap per occupied 32k bucket, not one giant bitmap).
    */
  def q196BitmapDistinct(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir).createOrReplaceTempView("events")
    s.sql(
      """WITH e AS (
        |  SELECT event_type, unix_micros(ts) DIV 86400000000 AS day, user_id
        |  FROM events),
        |b AS (
        |  SELECT event_type, day, bitmap_bucket_number(user_id) AS bk,
        |         bitmap_construct_agg(bitmap_bit_position(user_id)) AS bm
        |  FROM e GROUP BY event_type, day, bk),
        |daily AS (
        |  SELECT event_type, day, sum(bitmap_count(bm)) AS d_cnt
        |  FROM b GROUP BY event_type, day),
        |d2 AS (
        |  SELECT event_type, count(*) AS n_days,
        |         CAST(sum(d_cnt) AS BIGINT) AS daily_distinct_sum
        |  FROM daily GROUP BY event_type),
        |tot AS (
        |  SELECT event_type, CAST(sum(c) AS BIGINT) AS distinct_users
        |  FROM (SELECT event_type, bk, bitmap_count(bitmap_or_agg(bm)) AS c
        |        FROM b GROUP BY event_type, bk)
        |  GROUP BY event_type)
        |SELECT d2.event_type, d2.n_days, d2.daily_distinct_sum,
        |       tot.distinct_users
        |FROM d2 JOIN tot ON d2.event_type = tot.event_type
        |ORDER BY event_type""".stripMargin)
  }

  val q196Sql: String =
    """WITH e AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day, user_id
      |  FROM events),
      |daily AS (
      |  SELECT event_type, day, count(DISTINCT user_id) AS d_cnt
      |  FROM e GROUP BY event_type, day),
      |d2 AS (
      |  SELECT event_type, count(*) AS n_days,
      |         CAST(sum(d_cnt) AS BIGINT) AS daily_distinct_sum
      |  FROM daily GROUP BY event_type),
      |tot AS (
      |  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT)
      |           AS distinct_users
      |  FROM e GROUP BY event_type)
      |SELECT d2.event_type, d2.n_days, d2.daily_distinct_sum,
      |       tot.distinct_users
      |FROM d2 JOIN tot ON d2.event_type = tot.event_type
      |ORDER BY d2.event_type""".stripMargin

  // ---------------------------------------------------------------- q197
  /** Point-in-time dimension enrichment — join each fact row to the
    * dimension VERSION that was valid at the fact's event time, the
    * feature-store staple that prevents label leakage (training
    * features must reflect what was knowable at event time, never a
    * later version). The dimension is the q123 SCD-2 build (signup
    * events → half-open validity intervals [valid_from, valid_to) per
    * user, version chain tie-free on (ts_us, event_id)); facts are
    * purchases. The join is an equi-join on user_id with the interval
    * predicate as a residual condition — a SortMergeJoin at scale
    * (PlanSpec locks out BroadcastNestedLoopJoin), correct because
    * versions per key are few and intervals within a key partition
    * time, so each fact matches at most one version. Facts before the
    * first version keep version −1 (LEFT join): the leakage-proof
    * answer is "no dimension existed yet", never "use a later one".
    */
  def q197PitJoin(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val dim = ev(s, dir).filter(col("event_type") === "signup")
      .select(col("user_id").as("d_user"), col("ts_us"), col("event_id"))
      .withColumn("version", row_number().over(
        Window.partitionBy(col("d_user")).orderBy(col("ts_us"), col("event_id"))))
      .withColumn("valid_to_us", lead(col("ts_us"), 1).over(
        Window.partitionBy(col("d_user")).orderBy(col("ts_us"), col("event_id"))))
      .select(col("d_user"), col("version"),
        col("ts_us").as("valid_from_us"), col("valid_to_us"))
    val fact = ev(s, dir).filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"),
        round(col("value") * 1000, 0).cast("long").as("v_milli"))
    fact.join(dim,
        fact("user_id") === dim("d_user") &&
          dim("valid_from_us") <= fact("ts_us") &&
          (dim("valid_to_us").isNull || fact("ts_us") < dim("valid_to_us")),
        "left")
      .groupBy(coalesce(col("version").cast("long"), lit(-1L)).as("version"))
      .agg(count(lit(1)).as("n_purchases"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("v_milli")).cast("long").as("revenue_milli"))
      .orderBy(col("version"))
  }

  val q197Sql: String =
    """WITH dim AS (
      |  SELECT user_id AS d_user,
      |         CAST(row_number() OVER (PARTITION BY user_id
      |                                 ORDER BY ts_us, event_id) AS BIGINT)
      |           AS version,
      |         ts_us AS valid_from_us,
      |         lead(ts_us) OVER (PARTITION BY user_id
      |                           ORDER BY ts_us, event_id) AS valid_to_us
      |  FROM (SELECT user_id, epoch_us(ts) AS ts_us, event_id
      |        FROM events WHERE event_type = 'signup')),
      |fact AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us,
      |         CAST(round(value * 1000, 0) AS BIGINT) AS v_milli
      |  FROM events WHERE event_type = 'purchase')
      |SELECT coalesce(d.version, -1) AS version,
      |       count(*) AS n_purchases,
      |       count(DISTINCT f.user_id) AS n_users,
      |       CAST(sum(f.v_milli) AS BIGINT) AS revenue_milli
      |FROM fact f LEFT JOIN dim d
      |  ON f.user_id = d.d_user AND d.valid_from_us <= f.ts_us
      | AND (d.valid_to_us IS NULL OR f.ts_us < d.valid_to_us)
      |GROUP BY 1 ORDER BY version""".stripMargin

  // ---------------------------------------------------------------- q198
  /** Multi-touch attribution, U-shaped (position-based 40/20/40) —
    * credit each user's pre-conversion touch path: 40% to the first
    * touch, 40% to the last, the middle 20% split evenly. All credit
    * arithmetic is INTEGER basis points (n=1 → 10000; n=2 → 5000 each;
    * n≥3 → 4000/4000 at the ends, 2000 div (n−2) per middle with the
    * division remainder assigned to the first touch) so per-channel
    * sums are reduce-order-free — the float version of this query
    * cannot pass a hash gate, and in production drifts between reruns.
    * Conversion is the user's FIRST purchase instant; touches are
    * strictly earlier non-purchase events, ordered tie-free on
    * (ts_us, event_id). One broadcastable conversion-time join, one
    * per-user window, one channel-sized aggregate.
    */
  def q198Attribution(s: SparkSession, dir: String): DataFrame = {
    val conv = ev(s, dir).filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("conv_ts"))
    val w = Window.partitionBy(col("user_id"))
    ev(s, dir).filter(col("event_type") =!= "purchase")
      .join(conv, Seq("user_id"))
      .filter(col("ts_us") < col("conv_ts"))
      .select(col("user_id"), col("event_type").as("channel"),
        col("ts_us"), col("event_id"))
      .withColumn("pos",
        row_number().over(w.orderBy(col("ts_us"), col("event_id"))).cast("long"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("bp", expr(
        """CASE WHEN n = 1 THEN 10000
          |     WHEN n = 2 THEN 5000
          |     WHEN pos = 1 THEN 4000 + 2000 % (n - 2)
          |     WHEN pos = n THEN 4000
          |     ELSE 2000 DIV (n - 2) END""".stripMargin))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("bp")).cast("long").as("credit_bp"))
      .orderBy(col("channel"))
  }

  val q198Sql: String =
    """WITH conv AS (
      |  SELECT user_id, min(epoch_us(ts)) AS conv_ts
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
      |t AS (
      |  SELECT e.user_id, e.event_type AS channel,
      |         epoch_us(e.ts) AS ts_us, e.event_id
      |  FROM events e JOIN conv c ON e.user_id = c.user_id
      |  WHERE e.event_type <> 'purchase' AND epoch_us(e.ts) < c.conv_ts),
      |r AS (
      |  SELECT user_id, channel,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY ts_us, event_id) AS pos,
      |         count(*) OVER (PARTITION BY user_id) AS n
      |  FROM t)
      |SELECT channel, count(*) AS n_touches,
      |       CAST(sum(CASE WHEN n = 1 THEN 10000
      |                     WHEN n = 2 THEN 5000
      |                     WHEN pos = 1 THEN 4000 + 2000 % (n - 2)
      |                     WHEN pos = n THEN 4000
      |                     ELSE 2000 // (n - 2) END) AS BIGINT) AS credit_bp
      |FROM r GROUP BY channel ORDER BY channel""".stripMargin

  // ---------------------------------------------------------------- q199
  /** Longest activity streak per user — consecutive-CALENDAR-DAY runs,
    * the engagement metric behind "7-day streak" product features and
    * a different islands problem from q31's time-gap sessions: the
    * grouping key is `day − row_number()` over each user's distinct
    * active days (constant exactly while days are consecutive — the
    * classic gaps-and-islands identity on an integer domain, no gap
    * threshold to tune). Day ids are integer epoch-day division (the
    * q177 rule — no calendar/timezone surface near the gate). The
    * distinct-day table is ≤ users × days — tiny relative to raw
    * events at any scale — and everything after the dedup rides one
    * user-keyed window plus two user-keyed aggregates: corpus-sized
    * work is the dedup scan only.
    */
  def q199Streaks(s: SparkSession, dir: String): DataFrame = {
    val days = ev(s, dir)
      .selectExpr("user_id", "ts_us DIV 86400000000 AS day").distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    days.withColumn("grp", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("grp")).agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(max(col("len")).as("longest_streak"),
        count(lit(1)).as("n_streaks"),
        sum(col("len")).cast("long").as("active_days"))
      .orderBy(col("user_id"))
  }

  val q199Sql: String =
    """WITH d AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
      |  FROM events),
      |g AS (
      |  SELECT user_id, day,
      |         day - row_number() OVER (PARTITION BY user_id ORDER BY day)
      |           AS grp
      |  FROM d),
      |st AS (SELECT user_id, grp, count(*) AS len FROM g GROUP BY user_id, grp)
      |SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak,
      |       count(*) AS n_streaks, CAST(sum(len) AS BIGINT) AS active_days
      |FROM st GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q200
  /** A/B experiment readout — deterministic variant assignment (md5
    * parity over user_id, the standing no-rand() rule: assignment is
    * reproducible, auditable, and stable under retries — rand() here
    * silently reassigns users between reruns) and Welch's t statistic
    * over EXACT per-variant moments: per-user purchase totals in
    * milli-units, (n, Σx, Σx²) with Σx² carried as DECIMAL(38,0)
    * (milli-scale squares overflow a long at large sf — the q195
    * decimal-carrier rule; DuckDB's HUGEINT sum is the twin), then ONE
    * double excursion for means, sample variances, and t in the
    * identical expression form on both engines, rounded 1e-6. The
    * built-in variance/stddev aggregates are float accumulators —
    * reduce-order-dependent, unusable under a hash gate and
    * irreproducible across cluster runs; exact moments are how an
    * experimentation platform gets the same answer twice. One corpus
    * scan → per-user aggregate → 2-variant conditional rollup.
    */
  def q200AbTest(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir).createOrReplaceTempView("events")
    s.sql(
      """WITH u AS (
        |  SELECT user_id,
        |         sum(CAST(round(value * 1000, 0) AS BIGINT)) AS tot_milli,
        |         max(CASE WHEN value > 400 THEN 1 ELSE 0 END) AS conv
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        |v AS (
        |  SELECT CASE WHEN CAST(conv(substring(md5(
        |                concat('ab42|', CAST(user_id AS STRING))), 1, 2),
        |                16, 10) AS BIGINT) % 2 = 0
        |              THEN 'A' ELSE 'B' END AS variant,
        |         tot_milli, conv
        |  FROM u),
        |m AS (
        |  SELECT
        |    sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS n_a,
        |    sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS n_b,
        |    sum(CASE WHEN variant = 'A' THEN conv ELSE 0 END) AS conv_a,
        |    sum(CASE WHEN variant = 'B' THEN conv ELSE 0 END) AS conv_b,
        |    sum(CASE WHEN variant = 'A' THEN tot_milli ELSE 0 END) AS sx_a,
        |    sum(CASE WHEN variant = 'B' THEN tot_milli ELSE 0 END) AS sx_b,
        |    sum(CASE WHEN variant = 'A'
        |             THEN CAST(tot_milli AS DECIMAL(38,0)) * tot_milli
        |             ELSE 0 END) AS sxx_a,
        |    sum(CASE WHEN variant = 'B'
        |             THEN CAST(tot_milli AS DECIMAL(38,0)) * tot_milli
        |             ELSE 0 END) AS sxx_b
        |  FROM v)
        |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |       CAST(conv_a AS BIGINT) AS conv_a,
        |       CAST(conv_b AS BIGINT) AS conv_b,
        |       round(CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6)
        |         AS mean_a_milli,
        |       round(CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6)
        |         AS mean_b_milli,
        |       round((CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) -
        |              CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE)) /
        |             sqrt((CAST(n_a AS DOUBLE) * CAST(sxx_a AS DOUBLE) -
        |                   CAST(sx_a AS DOUBLE) * CAST(sx_a AS DOUBLE)) /
        |                  (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0)) /
        |                  CAST(n_a AS DOUBLE) +
        |                  (CAST(n_b AS DOUBLE) * CAST(sxx_b AS DOUBLE) -
        |                   CAST(sx_b AS DOUBLE) * CAST(sx_b AS DOUBLE)) /
        |                  (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0)) /
        |                  CAST(n_b AS DOUBLE)), 6) AS t_stat
        |FROM m""".stripMargin)
  }

  val q200Sql: String =
    """WITH u AS (
      |  SELECT user_id,
      |         sum(CAST(round(value * 1000, 0) AS BIGINT)) AS tot_milli,
      |         max(CASE WHEN value > 400 THEN 1 ELSE 0 END) AS conv
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
      |v AS (
      |  SELECT CASE WHEN CAST(concat('0x', substr(md5(
      |                concat('ab42|', CAST(user_id AS VARCHAR))), 1, 2))
      |                AS BIGINT) % 2 = 0
      |              THEN 'A' ELSE 'B' END AS variant,
      |         tot_milli, conv
      |  FROM u),
      |m AS (
      |  SELECT
      |    sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS n_a,
      |    sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS n_b,
      |    sum(CASE WHEN variant = 'A' THEN conv ELSE 0 END) AS conv_a,
      |    sum(CASE WHEN variant = 'B' THEN conv ELSE 0 END) AS conv_b,
      |    sum(CASE WHEN variant = 'A' THEN tot_milli ELSE 0 END) AS sx_a,
      |    sum(CASE WHEN variant = 'B' THEN tot_milli ELSE 0 END) AS sx_b,
      |    sum(CASE WHEN variant = 'A' THEN tot_milli * tot_milli
      |             ELSE 0 END) AS sxx_a,
      |    sum(CASE WHEN variant = 'B' THEN tot_milli * tot_milli
      |             ELSE 0 END) AS sxx_b
      |  FROM v)
      |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
      |       CAST(conv_a AS BIGINT) AS conv_a,
      |       CAST(conv_b AS BIGINT) AS conv_b,
      |       round(CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6)
      |         AS mean_a_milli,
      |       round(CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6)
      |         AS mean_b_milli,
      |       round((CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) -
      |              CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE)) /
      |             sqrt((CAST(n_a AS DOUBLE) * CAST(sxx_a AS DOUBLE) -
      |                   CAST(sx_a AS DOUBLE) * CAST(sx_a AS DOUBLE)) /
      |                  (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0)) /
      |                  CAST(n_a AS DOUBLE) +
      |                  (CAST(n_b AS DOUBLE) * CAST(sxx_b AS DOUBLE) -
      |                   CAST(sx_b AS DOUBLE) * CAST(sx_b AS DOUBLE)) /
      |                  (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0)) /
      |                  CAST(n_b AS DOUBLE)), 6) AS t_stat
      |FROM m""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q196_bitmap_distinct" -> (q196BitmapDistinct _),
    "q197_pit_join" -> (q197PitJoin _),
    "q198_attribution" -> (q198Attribution _),
    "q199_streaks" -> (q199Streaks _),
    "q200_ab_test" -> (q200AbTest _),
  )

  val oracles: Map[String, String] = Map(
    "q196_bitmap_distinct" -> q196Sql,
    "q197_pit_join" -> q197Sql,
    "q198_attribution" -> q198Sql,
    "q199_streaks" -> q199Sql,
    "q200_ab_test" -> q200Sql,
  )
}
