package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(day: Int, hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  test("bucketed point-in-interval join == naive non-equi join") {
    val points = Seq(
      (1L, ts(1, 5)), (2L, ts(1, 23)), (3L, ts(2, 0)),
      (4L, ts(3, 12)), (5L, ts(9, 1))).toDF("pid", "pt")
    val intervals = Seq(
      (10L, ts(1, 0), ts(1, 6)),    // catches p1
      (11L, ts(1, 22), ts(2, 2)),   // catches p2, p3 (spans midnight)
      (12L, ts(3, 0), ts(4, 0)),    // catches p4
      (13L, ts(5, 0), ts(6, 0))).toDF("iid", "s", "e") // catches nothing
    val bucketed = RangeJoin.pointInInterval(points, "pt", intervals, "s", "e",
        bucketMs = 3600 * 1000)
      .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals, $"pt" >= $"s" && $"pt" < $"e")
      .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed === naive)
    assert(bucketed === Set((1L, 10L), (2L, 11L), (3L, 11L), (4L, 12L)))
  }

  test("end is exclusive; each pair appears exactly once across buckets") {
    val points = Seq((1L, ts(1, 6))).toDF("pid", "pt") // == interval end
    val intervals = Seq((10L, ts(1, 0), ts(1, 6))).toDF("iid", "s", "e")
    assert(RangeJoin.pointInInterval(points, "pt", intervals, "s", "e", 3600 * 1000)
      .count() === 0)
    // a long interval spanning many buckets still yields one row per point
    val wide = Seq((11L, ts(1, 0), ts(8, 0))).toDF("iid", "s", "e")
    val hit = Seq((2L, ts(4, 12))).toDF("pid", "pt")
    assert(RangeJoin.pointInInterval(hit, "pt", wide, "s", "e", 3600 * 1000)
      .count() === 1)
  }

  test("pathological interval spans fail fast instead of exploding") {
    val points = Seq((1L, ts(1, 5))).toDF("pid", "pt")
    val openEnded = Seq((10L, ts(1, 0), Timestamp.valueOf("9999-12-31 00:00:00")))
      .toDF("iid", "s", "e")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, "pt", openEnded, "s", "e",
        bucketMs = 3600 * 1000, maxSpanBuckets = 1000).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("spans more than")), e.toString)
  }

  test("inverted intervals drop instead of generating descending buckets") {
    val points = Seq((1L, ts(1, 5))).toDF("pid", "pt")
    // end < start (1970-sentinel shape): negative span must NOT pass the
    // one-sided guard nor feed sequence() a descending range
    val inverted = Seq((10L, ts(5, 0), ts(1, 0))).toDF("iid", "s", "e")
    assert(RangeJoin.pointInInterval(points, "pt", inverted, "s", "e",
      3600 * 1000).count() === 0)
  }

  test("intervalOverlap == naive overlap join; each pair exactly once") {
    val l = Seq(
      (1L, "u1", ts(1, 0), ts(3, 0)),
      (2L, "u1", ts(2, 0), ts(5, 0)),
      (3L, "u1", ts(6, 0), ts(7, 0)),
      (4L, "u2", ts(1, 0), ts(9, 0))).toDF("l_id", "k", "l_s", "l_e")
    val r = Seq(
      (10L, "u1", ts(2, 12), ts(4, 0)),  // overlaps 1 and 2
      (11L, "u1", ts(5, 0), ts(6, 12)),  // overlaps 3 only (l2 end exclusive)
      (12L, "u2", ts(8, 0), ts(12, 0)),  // overlaps 4
      (13L, "u3", ts(1, 0), ts(9, 0))).toDF("r_id", "k", "r_s", "r_e")
    val bucketed = RangeJoin.intervalOverlap(l, "l_s", "l_e", r, "r_s", "r_e",
        Seq("k"), bucketMs = 3600 * 1000)
      .select($"l_id", $"r_id").collect()
    // exactly once: no per-shared-bucket duplicates
    assert(bucketed.length === bucketed.toSet.size)
    val naive = l.join(r, l("k") === r("k") && $"l_s" < $"r_e" && $"r_s" < $"l_e")
      .select($"l_id", $"r_id").collect()
      .map(row => (row.getLong(0), row.getLong(1))).toSet
    assert(bucketed.map(row => (row.getLong(0), row.getLong(1))).toSet === naive)
    assert(naive === Set((1L, 10L), (2L, 10L), (3L, 11L), (4L, 12L)))
  }

  test("intervalOverlap: empty and inverted intervals match nothing") {
    // [x, x) is empty under half-open semantics — even when it sits
    // inside a covering interval (where the naive pairwise predicate
    // alone would wrongly fire); inverted intervals likewise
    val l = Seq(
      (1L, "u1", ts(2, 0), ts(2, 0)),   // empty, inside r-interval
      (2L, "u1", ts(5, 0), ts(1, 0))).toDF("l_id", "k", "l_s", "l_e") // inverted
    val r = Seq((10L, "u1", ts(1, 0), ts(9, 0))).toDF("r_id", "k", "r_s", "r_e")
    assert(RangeJoin.intervalOverlap(l, "l_s", "l_e", r, "r_s", "r_e",
      Seq("k"), bucketMs = 3600 * 1000).count() === 0)
  }

  test("colliding column names fail the contract check, not deep in analysis") {
    val l = Seq((1L, "u1", ts(1, 0), ts(3, 0))).toDF("l_id", "k", "s", "e")
    val r = Seq((10L, "u1", ts(2, 0), ts(4, 0))).toDF("r_id", "k", "s", "e")
    val e1 = intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(l, "s", "e", r, "s", "e", Seq("k"), 3600 * 1000)
    }
    assert(e1.getMessage.contains("pairwise distinct"), e1.getMessage)
    val pts = Seq((1L, ts(1, 5))).toDF("pid", "t")
    val iv = Seq((10L, ts(1, 0), ts(1, 6))).toDF("iid", "t", "e")
    val e2 = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pts, "t", iv, "t", "e", 3600 * 1000)
    }
    assert(e2.getMessage.contains("pairwise distinct"), e2.getMessage)
    // the internal bucket column name is reserved
    val e3 = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(
        pts.withColumnRenamed("pid", "__graft_bucket"), "t", iv, "s2", "e", 3600 * 1000)
    }
    assert(e3.getMessage.contains("reserved") || e3.getMessage.contains("distinct"),
      e3.getMessage)
  }

  test("bucketed plan is a hash equi-join, not a nested-loop join") {
    val points = Seq((1L, ts(1, 5))).toDF("pid", "pt")
    val intervals = Seq((10L, ts(1, 0), ts(1, 6))).toDF("iid", "s", "e")
    val p = RangeJoin.pointInInterval(points, "pt", intervals, "s", "e", 3600 * 1000)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
