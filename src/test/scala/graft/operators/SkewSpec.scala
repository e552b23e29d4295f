package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  // 90% of fact rows on one hot key — the salting target shape
  private lazy val fact = ((1 to 900).map(i => (1L, s"hot$i")) ++
    (1 to 100).map(i => ((i % 7 + 2).toLong, s"cold$i"))).toDF("k", "payload")
  private lazy val dim = (1L to 10L).map(k => (k, s"dim$k")).toDF("k", "attr")

  test("saltedJoin == plain join (inner)") {
    val plain = fact.join(dim, Seq("k")).select($"k", $"payload", $"attr")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), saltBuckets = 8)
      .select($"k", $"payload", $"attr")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(salted === plain)
    assert(salted.size === 1000)
  }

  test("saltedJoin == plain join (left outer, unmatched fact keys kept once)") {
    val factPlus = fact.unionByName(Seq((99L, "orphan")).toDF("k", "payload"))
    val plain = factPlus.join(dim, Seq("k"), "left")
      .select($"k", $"payload", $"attr")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
    val salted = Skew.saltedJoin(factPlus, dim, Seq("k"), saltBuckets = 8, joinType = "left")
      .select($"k", $"payload", $"attr")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(salted === plain)
    assert(salted.exists { case (k, _, a) => k == 99L && a.isEmpty })
  }

  test("salting actually spreads the hot key across buckets") {
    val salts = fact.filter($"k" === 1L)
      .withColumn("s", pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(8L)))
      .select($"s").distinct().count()
    assert(salts >= 6, s"hot key only landed in $salts of 8 buckets")
  }

  test("inputs carrying the reserved salt column name are rejected") {
    val bad = fact.withColumnRenamed("payload", "__graft_salt")
    val e = intercept[IllegalArgumentException] {
      Skew.saltedJoin(bad, dim, Seq("k"), 4)
    }
    assert(e.getMessage.contains("reserved"), e.getMessage)
  }

  test("outer-preserving the replicated side is rejected") {
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(fact, dim, Seq("k"), 4, joinType = "right")
    }
  }

  test("saltedJoinHotKeys == plain join (inner), hot key detected and salted") {
    val plain = fact.join(dim, Seq("k")).select($"k", $"payload", $"attr")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    // sampleFraction 1.0 → detection is exact: k=1 (900 rows) is hot,
    // the 7 cold keys (≤15 rows each) are not
    val hot = Skew.saltedJoinHotKeys(fact, dim, Seq("k"), saltBuckets = 8,
      sampleFraction = 1.0, minSampledCount = 100L)
      .select($"k", $"payload", $"attr")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(hot === plain)
  }

  test("saltedJoinHotKeys == plain join (left), orphans and all-cold both covered") {
    val factPlus = fact.unionByName(Seq((99L, "orphan")).toDF("k", "payload"))
    val plain = factPlus.join(dim, Seq("k"), "left")
      .select($"k", $"payload", $"attr")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
    val hot = Skew.saltedJoinHotKeys(factPlus, dim, Seq("k"), saltBuckets = 8,
      sampleFraction = 1.0, minSampledCount = 100L, joinType = "left")
      .select($"k", $"payload", $"attr")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(hot === plain)
    assert(hot.exists { case (k, _, a) => k == 99L && a.isEmpty })
    // threshold nothing clears → pure cold path, still exact
    val allCold = Skew.saltedJoinHotKeys(factPlus, dim, Seq("k"), saltBuckets = 8,
      sampleFraction = 1.0, minSampledCount = 100000L, joinType = "left")
      .select($"k", $"payload", $"attr")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(allCold === plain)
  }

  test("saltedJoinHotKeys replicates only the hot slice of the small side") {
    // detected hot set = {1}: the hot branch's small side must be the
    // single matching dim row (×saltBuckets), not the whole table
    val hotKeys = fact.select($"k").sample(withReplacement = false, 1.0, 42L)
      .groupBy($"k").count().filter($"count" >= 100).drop("count")
    val smallHot = dim.join(hotKeys, Seq("k"), "left_semi")
    assert(smallHot.count() === 1)
  }
}
