package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = graft.Tables.documents(spark, sf001)

  test("train/test split: disjoint, complete, near the requested fraction") {
    val (train, test) = Sampling.trainTestSplit(docs, "doc_id", 0.2)
    val n = docs.count()
    assert(train.count() + test.count() === n)
    assert(train.join(test, Seq("doc_id"), "inner").count() === 0)
    val frac = test.count().toDouble / n
    assert(math.abs(frac - 0.2) <= 0.06, s"test fraction $frac")
  }

  test("split is deterministic across invocations and stable under data growth") {
    val (_, test1) = Sampling.trainTestSplit(docs, "doc_id", 0.2)
    val (_, test2) = Sampling.trainTestSplit(docs, "doc_id", 0.2)
    val ids1 = test1.select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 === test2.select($"doc_id").collect().map(_.getLong(0)).toSet)
    // growth stability: splitting a SUBSET assigns the shared rows
    // identically (no dependence on what else is in the table)
    val (_, testSub) = Sampling.trainTestSplit(docs.filter($"doc_id" < 250), "doc_id", 0.2)
    val subIds = testSub.select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(subIds === ids1.filter(_ < 250))
  }

  test("different seeds give different splits") {
    val (_, a) = Sampling.trainTestSplit(docs, "doc_id", 0.2, seed = 1L)
    val (_, b) = Sampling.trainTestSplit(docs, "doc_id", 0.2, seed = 2L)
    val idsA = a.select($"doc_id").collect().map(_.getLong(0)).toSet
    val idsB = b.select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(idsA !== idsB)
  }

  test("stratified sampling respects per-stratum fractions; unlisted strata dropped") {
    val byLang = docs.groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val twoLangs = byLang.keys.toSeq.sorted.take(2)
    val fractions = Map(twoLangs.head -> 0.5, twoLangs(1) -> 0.1)
    val sampled = Sampling.stratified(docs, "lang", fractions)
      .groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sampled.keySet.subsetOf(fractions.keySet)) // others dropped
    fractions.foreach { case (lang, f) =>
      val got = sampled.getOrElse(lang, 0L).toDouble / byLang(lang)
      assert(math.abs(got - f) <= 0.15, s"$lang: wanted ~$f got $got")
    }
  }

  test("stratifiedByHash: deterministic, per-stratum rates, boundary settings") {
    val fractions = Map("en" -> 128, "de" -> 192, "zh" -> 256)
    val sampled = Sampling.stratifiedByHash(docs, "lang", "doc_id", fractions)
    val byLang = docs.groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = sampled.groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // unlisted strata drop entirely
    assert(got.keySet.subsetOf(fractions.keySet))
    // 256/256 keeps EVERY row (not ~every row)
    assert(got("zh") === byLang("zh"))
    // listed strata keep ≈ v/256 of their rows
    Seq("en" -> 0.5, "de" -> 0.75).foreach { case (lang, f) =>
      val frac = got.getOrElse(lang, 0L).toDouble / byLang(lang)
      // ±0.15: the de/es/fr strata have only ~70 rows at sf0.001/0.01
      assert(math.abs(frac - f) <= 0.15, s"$lang: wanted ~$f got $frac")
    }
    // pure function of (id, seed): identical row set on re-run and
    // under repartitioning (the property sampleBy cannot give)
    val ids1 = sampled.select($"doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.stratifiedByHash(docs.repartition(7), "lang", "doc_id", fractions)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2)
    // 0/256 drops the stratum
    assert(Sampling.stratifiedByHash(docs, "lang", "doc_id", Map("en" -> 0))
      .count() === 0)
    // out-of-range rates rejected
    intercept[IllegalArgumentException] {
      Sampling.stratifiedByHash(docs, "lang", "doc_id", Map("en" -> 300))
    }
  }

  test("md5Split: content-deterministic, duplicates co-assigned, fraction near 14/16") {
    val docs = graft.Tables.documents(spark, sf001)
    val split = docs.select($"doc_id", $"text", Sampling.md5Split("text").as("split"))
    // every row labeled, fraction near the 14/16 target
    val counts = split.groupBy($"split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum
    assert(counts.keySet === Set("train", "test"))
    assert(math.abs(counts("train").toDouble / n - 14.0 / 16) <= 0.08)
    // byte-identical texts always land on the same side (the
    // contamination-proofing property)
    assert(split.groupBy($"text").agg(countDistinct($"split").as("s"))
      .filter($"s" > 1).count() === 0)
    // pure function of content: a second invocation agrees row-for-row
    val again = docs.select($"doc_id", Sampling.md5Split("text").as("split2"))
    assert(split.join(again, Seq("doc_id"))
      .filter($"split" =!= $"split2").count() === 0)
    // boundary settings
    assert(docs.select(Sampling.md5Split("text", 16).as("s"))
      .filter($"s" =!= "train").count() === 0)
    assert(docs.select(Sampling.md5Split("text", 0).as("s"))
      .filter($"s" =!= "test").count() === 0)
    // NULL content is "test" at EVERY setting — widening the train
    // share to 16/16 must not flip NULL rows across the boundary
    val withNull = Seq((1L, Some("abc")), (2L, None))
      .toDF("doc_id", "text")
    Seq(0, 14, 15, 16).foreach { six =>
      val got = withNull.select($"doc_id", Sampling.md5Split("text", six).as("s"))
        .filter($"doc_id" === 2L).head.getString(1)
      assert(got === "test", s"NULL content at trainSixteenths=$six")
    }
  }
}
