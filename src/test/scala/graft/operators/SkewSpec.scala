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

  test("outer-preserving the replicated side is rejected") {
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(fact, dim, Seq("k"), 4, joinType = "right")
    }
  }
}
