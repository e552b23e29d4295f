package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query registries. Every entry in [[queries]]
  * has a matching DuckDB oracle in [[oracleSql]] unless the operation is
  * not SQL-expressible (those get the driver's weaker rows-only check and
  * a ScalaTest spec instead).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.RelationalOps.q2RevenueByNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.RelationalOps.queries ++ operators.SupplyChainOps.queries ++
      operators.DocQueries.queries ++
      operators.DedupQueries.queries ++ operators.AnnQueries.queries ++
      operators.TextStatsQueries.queries ++ operators.EventQueries.queries ++
      operators.MultimodalQueries.queries ++ operators.Lab2Queries.queries ++
      operators.GraphQueries.queries ++ operators.Round7Queries.queries ++
      operators.Round8Queries.queries ++ operators.Round9Queries.queries ++
      operators.Round10Queries.queries ++ operators.Round11Queries.queries ++
      operators.Round12Queries.queries ++ operators.Round13Queries.queries ++
      operators.Round14Queries.queries ++ operators.Round15Queries.queries ++
      operators.Round16Queries.queries ++ operators.UnigramQueries.queries ++
      operators.Round17Queries.queries ++ operators.Round18Queries.queries ++
      operators.Round19Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = oracleSqlFor("/root/testdata/sf0.01")

  /** Oracle SQL parameterized by the gate's actual sf dir — q43's
    * oracle reads the IVF index materialized FOR that dir, so Verify
    * must dump the SQL for the dir it actually ran (a baked-in default
    * dir would read a missing/stale index under any other gate dir). */
  def oracleSqlFor(sfDir: String): Map[String, String] =
    operators.RelationalOps.oracles ++ operators.SupplyChainOps.oracles ++
      operators.DocQueries.oracles ++
      operators.DedupQueries.oracles ++ operators.AnnQueries.oraclesFor(sfDir) ++
      operators.TextStatsQueries.oracles ++ operators.EventQueries.oracles ++
      operators.MultimodalQueries.oracles ++ operators.Lab2Queries.oracles ++
      operators.GraphQueries.oracles ++ operators.Round7Queries.oracles ++
      operators.Round8Queries.oracles ++ operators.Round9Queries.oracles ++
      operators.Round10Queries.oracles ++ operators.Round11Queries.oracles ++
      operators.Round12Queries.oracles ++ operators.Round13Queries.oracles ++
      operators.Round14Queries.oracles ++ operators.Round15Queries.oracles ++
      operators.Round16Queries.oracles ++ operators.UnigramQueries.oracles ++
      operators.Round17Queries.oraclesFor(sfDir) ++
      operators.Round18Queries.oracles ++ operators.Round19Queries.oracles
}
