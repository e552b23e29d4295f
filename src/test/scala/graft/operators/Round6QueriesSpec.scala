package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Specs for the round-6 additions: CDC merge (q122), SCD Type-2
  * (q123), compaction planning (q124), data-skipping manifest (q125),
  * BPE encode (q126), OOV rate (q127), split-leakage audit (q128).
  * Each gets an independent driver-side re-derivation plus the
  * invariants that matter for its contract.
  */
class Round6QueriesSpec extends SparkTestBase {
  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def tokens(t: String): Vector[String] =
    t.toLowerCase.replaceAll("(\\d|\\W)+", " ").trim
      .split(" ").filter(_.nonEmpty).toVector

  // ------------------------------------------------------------- q122
  test("q122: tombstones survive intermediate compaction (no resurrection)") {
    // user 1's latest PRE-cut record is a tombstone and the delta has
    // nothing newer: the merged snapshot must NOT resurrect the older
    // purchase — which is exactly what would happen if compaction
    // dropped error rows before the merge.
    val log = Seq(
      (1L, 10L, 1L, "purchase", 1.0),
      (1L, 20L, 2L, "error", 0.0),
      (2L, 15L, 3L, "view", 2.0)
    ).toDF("user_id", "ts_ms", "event_id", "event_type", "value")
    val merged = EventQueries.cdcMerge(
      EventQueries.cdcCompact(log.filter($"ts_ms" < 25)),
      EventQueries.cdcCompact(log.filter($"ts_ms" >= 25)))
    val alive = merged.filter($"last.event_type" =!= "error")
      .select($"user_id").as[Long].collect().toSet
    assert(alive === Set(2L))
  }

  test("q122: merge picks the newer struct even when sides overlap in time") {
    val snapSide = Seq((1L, 30L, 5L, "view", 1.0))
      .toDF("user_id", "ts_ms", "event_id", "event_type", "value")
    val deltaSide = Seq((1L, 20L, 4L, "purchase", 9.0)) // OLDER than snapshot
      .toDF("user_id", "ts_ms", "event_id", "event_type", "value")
    val merged = EventQueries.cdcMerge(
        EventQueries.cdcCompact(snapSide), EventQueries.cdcCompact(deltaSide))
      .select($"user_id", $"last.event_id").as[(Long, Long)].collect()
    assert(merged.toSeq === Seq((1L, 5L))) // snapshot row wins: it is newer
  }

  test("q122: incremental merge equals whole-log compaction (sf0.001)") {
    val rows = Tables.events(spark, sf0001)
      .withColumn("ts_ms", unix_millis(col("ts")))
      .select("user_id", "ts_ms", "event_id", "event_type", "value")
      .as[(Long, Long, Long, String, Double)].collect()
    val expected = rows.groupBy(_._1).flatMap { case (_, es) =>
      val last = es.maxBy(e => (e._2, e._3))
      if (last._4 == "error") None else Some(last)
    }.toSet
    val got = EventQueries.q122CdcMerge(spark, sf0001)
      .as[(Long, Long, Long, String, Double)].collect().toSet
    assert(got === expected)
  }

  // ------------------------------------------------------------- q123
  test("q123: intervals match per-user purchase history; contiguous; one current") {
    val rows = Tables.events(spark, sf0001)
      .withColumn("ts_ms", unix_millis(col("ts")))
      .filter($"event_type" === "purchase")
      .select("user_id", "ts_ms", "event_id", "value")
      .as[(Long, Long, Long, Double)].collect()
    val expected = rows.groupBy(_._1).flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      sorted.zipWithIndex.toSeq.map { case (e, i) =>
        val to = if (i + 1 < sorted.length) Some(sorted(i + 1)._2) else None
        (u, i + 1, e._2, to, e._4, to.isEmpty)
      }
    }.toSet
    val got = EventQueries.q123Scd2(spark, sf0001).collect().map { r =>
      (r.getLong(0), r.getInt(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getDouble(4), r.getBoolean(5))
    }.toSet
    assert(got === expected)
    // exactly one open (current) interval per user
    val currents = got.toSeq.filter(_._6).groupBy(_._1).values.map(_.size)
    assert(currents.forall(_ == 1))
    assert(currents.size === rows.map(_._1).distinct.length)
  }

  // ------------------------------------------------------------- q124
  test("q124: plan matches a driver-side greedy re-derivation (sf0.001)") {
    val rows = Tables.events(spark, sf0001)
      .withColumn("ts_ms", unix_millis(col("ts")))
      .select($"event_type", expr("ts_ms div 86400000").as("day"),
        expr("octet_length(props)").cast("long").as("plen"))
      .as[(String, Long, Long)].collect()
    val files = rows.groupBy(r => (r._1, r._2)).map { case ((t, d), es) =>
      (t, d, es.length.toLong, 64L * es.length + es.map(_._3).sum)
    }.toSeq
    val target =
      EventQueries.CompactionTargetFactor * files.map(_._4).sum / files.length
    val expected = files.groupBy(_._1).flatMap { case (t, fs) =>
      val ordered = fs.sortBy(_._2)
      val cums = ordered.scanLeft(0L)(_ + _._4).init // prefix sums BEFORE each
      ordered.zip(cums).map { case ((_, d, n, b), cum) => (t, cum / target, d, n, b) }
        .groupBy(_._2).map { case (bin, members) =>
          (t, bin, members.size.toLong, members.map(_._5).sum,
            members.map(_._4).sum, members.map(_._3).min, members.map(_._3).max)
        }
    }.toSet
    val got = EventQueries.q124CompactionPlan(spark, sf0001)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got === expected)
    // bins are contiguous, non-overlapping day ranges within each type
    got.groupBy(_._1).foreach { case (_, bins) =>
      val ordered = bins.toSeq.sortBy(_._2)
      ordered.sliding(2).foreach {
        case Seq(a, b) => assert(a._7 < b._6) // max_day(bin) < min_day(next)
        case _ =>
      }
    }
  }

  // ------------------------------------------------------------- q125
  test("q125: pruning is sound and z-order prunes the user band (sf0.01)") {
    val manifest = EventQueries.q125SkippingManifest(spark, sf001)
      .collect().map { r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getBoolean(7), r.getBoolean(8))
      }
    val rows = Tables.events(spark, sf001)
      .withColumn("ts_ms", unix_millis(col("ts")))
      .select(($"user_id" % 65536L).as("u"),
        (expr("ts_ms div 60000") % 65536L).as("t"))
      .as[(Long, Long)].collect()
    def interleave(u: Long, t: Long): Long =
      (0 until 16).map(i =>
        (((u >> i) & 1L) << (2 * i)) | (((t >> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
    // soundness: every row matching the u band sits in a hit_u block
    val hitU = manifest.filter(_._8).map(m => (m._1, m._2)).toSet
    rows.filter(r => r._1 >= EventQueries.UBandLo && r._1 <= EventQueries.UBandHi)
      .foreach { case (u, t) =>
        assert(hitU(("zorder", interleave(u, t) / EventQueries.ZBlockDiv)))
        assert(hitU(("linear", t / EventQueries.LinearBlockMinutes)))
      }
    // mass conservation per layout
    Seq("zorder", "linear").foreach { lay =>
      assert(manifest.filter(_._1 == lay).map(_._3).sum === rows.length.toLong)
    }
    // effectiveness: the z-layout prunes blocks for the u band; the
    // time-linear layout cannot (each time block spans every user)
    def hitFrac(lay: String) = {
      val m = manifest.filter(_._1 == lay)
      m.count(_._8).toDouble / m.length
    }
    assert(hitFrac("zorder") < hitFrac("linear"))
    assert(hitFrac("linear") === 1.0)
  }

  // ------------------------------------------------------------- q126
  test("q126: encode matches a driver-side BPE train+encode re-derivation (sf0.001)") {
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => id -> tokens(t) }
    def mergePair(toks: Vector[String], a: String, b: String): Vector[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      toks.foreach { t =>
        if (out.nonEmpty && out.last == a && t == b)
          out(out.length - 1) = a + " " + b
        else out += t
      }
      out.toVector
    }
    var corpus = docs.toMap
    for (_ <- 1 to TextStatsQueries.BpeRounds) {
      val counts = corpus.values.flatMap(ts =>
        ts.sliding(2).collect { case Seq(a, b) => a + "" + b })
        .groupBy(identity).map { case (k, v) => k -> v.size }
      val top = counts.toSeq.minBy { case (p, c) => (-c, p) }._1
      val Array(a, b) = top.split('')
      corpus = corpus.map { case (id, ts) => id -> mergePair(ts, a, b) }
    }
    val vocab = corpus.values.flatten.groupBy(identity)
      .map { case (k, v) => k -> v.size }.toSeq
      .sortBy { case (tok, c) => (-c, tok) }
      .zipWithIndex.map { case ((tok, _), i) => tok -> (i + 1).toLong }.toMap
    val expected = corpus.map { case (id, ts) =>
      (id, ts.length.toLong,
        ts.headOption.map(vocab), md5Hex(ts.map(vocab).mkString(",")))
    }.toSet
    val got = TextStatsQueries.q126BpeEncode(spark, sf0001).collect().map { r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getString(3))
    }.toSet
    assert(got === expected)
  }

  test("q126: empty-id-sequence projection is ANSI-safe (NULL first_id, md5(''))") {
    // pins the exact final-projection expressions q126 applies to a doc
    // whose normalized text is empty: under Spark 4's default ANSI mode
    // a plain element_at(array(), 1) would ABORT the query; the
    // contract (matching the DuckDB oracle) is first_id = NULL and the
    // empty-sequence hash
    val out = Seq(42L).toDF("doc_id")
      .withColumn("ids", expr("array()"))
      .select(expr("try_element_at(ids, 1)").as("first_id"),
        md5(concat_ws(",",
          expr("transform(ids, i -> cast(i as string))")).cast("binary"))
          .as("ids_hash"))
      .collect().head
    assert(out.isNullAt(0))
    assert(out.getString(1) === md5Hex(""))
  }

  // ------------------------------------------------------------- q127
  test("q127: OOV rates match a driver-side vocabulary re-derivation (sf0.001)") {
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => id -> tokens(t) }
    val vocab = docs.flatMap(_._2).groupBy(identity)
      .map { case (k, v) => k -> v.size }.toSeq
      .sortBy { case (tok, c) => (-c, tok) }
      .take(TextStatsQueries.VocabTopK).map(_._1).toSet
    val expected = docs.map { case (id, ts) =>
      val oov = ts.count(!vocab(_))
      val rate =
        if (ts.isEmpty) None
        else Some(BigDecimal(oov.toDouble / ts.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      (id, ts.length.toLong, oov.toLong, rate)
    }.toSet
    val got = TextStatsQueries.q127OovRate(spark, sf0001).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    }.toSet
    assert(got === expected)
  }

  // ------------------------------------------------------------- q129
  test("q129: purge audit matches a driver-side cascade re-derivation (sf0.001)") {
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", $"source", $"text").as[(Long, String, String)].collect()
    val dels = docs.filter(d => md5Hex(d._3).startsWith("0")).map(_._1).toSet
    assert(dels.nonEmpty, "fixture must exercise a non-empty deletion list")
    val T = TextStatsQueries.ChunkTokens
    val S = TextStatsQueries.ChunkStride
    def nChunks(t: String): Long = {
      val n = tokens(t).length
      if (n == 0) 0L
      else (0 until n by S).count(st => st == 0 || st + (T - S) < n).toLong
    }
    val expected = docs.groupBy(_._2).map { case (src, ds) =>
      (src, ds.length.toLong,
        ds.count(d => !dels(d._1)).toLong,
        ds.map(d => nChunks(d._3)).sum,
        ds.filter(d => !dels(d._1)).map(d => nChunks(d._3)).sum)
    }.toSet
    val got = TextStatsQueries.q129DeletePropagation(spark, sf0001)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got === expected)
    // the cascade is complete: chunk mass of deleted docs is gone
    val totals = got.toSeq
    assert(totals.map(_._4).sum - totals.map(_._5).sum ===
      docs.filter(d => dels(d._1)).map(d => nChunks(d._3)).sum)
  }

  // ------------------------------------------------------------- q130
  test("q130: moment-state merge law holds for ANY disjoint split") {
    val docs = Seq(
      ("s1", 10L), ("s1", 20L), ("s1", 30L), ("s2", 5L), ("s2", 7L), ("s3", 100L)
    ).zipWithIndex.map { case ((src, n), i) => (i.toLong, src, n) }
      .toDF("doc_id", "source", "n_chars")
    val direct = TextStatsQueries.momentState(docs)
      .as[(String, Long, Long, Long)].collect().toSet
    // split by doc_id parity — a different partition than q130's hash
    // band, proving the law is split-agnostic
    val a = TextStatsQueries.momentState(docs.filter($"doc_id" % 2 === 0))
      .as[(String, Long, Long, Long)].collect()
    val b = TextStatsQueries.momentState(docs.filter($"doc_id" % 2 === 1))
      .as[(String, Long, Long, Long)].collect()
    val merged = (a ++ b).groupBy(_._1).map { case (s, st) =>
      (s, st.map(_._2).sum, st.map(_._3).sum, st.map(_._4).sum)
    }.toSet
    assert(merged === direct)
  }

  test("q130: merged stats match a driver-side direct computation (sf0.001)") {
    val docs = Tables.documents(spark, sf0001)
      .select($"source", $"n_chars").as[(String, Long)].collect()
    val expected = docs.groupBy(_._1).map { case (src, ds) =>
      val n = ds.length.toLong
      val sx = ds.map(_._2).sum
      val sxx = ds.map(d => d._2 * d._2).sum
      def r6(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (src, n, r6(sx.toDouble / n),
        r6(math.sqrt((n * sxx - sx * sx).toDouble / (n.toDouble * n))))
    }.toSet
    val got = TextStatsQueries.q130IncrementalStats(spark, sf0001)
      .as[(String, Long, Double, Double)].collect().toSet
    assert(got === expected)
  }

  // ------------------------------------------------------------- q131
  test("q131: recompute covers exactly the dirty groups, values match q30 semantics") {
    val rows = Tables.events(spark, sf0001)
      .withColumn("ts_ms", unix_millis(col("ts")))
      .select("event_id", "user_id", "event_type", "value", "ts_ms")
      .as[(Long, Long, String, Double, Long)].collect()
    val winMs = EventQueries.WindowSecs * 1000
    val dirty = rows.filter(_._1 % EventQueries.LateEventMod == 0)
      .map(r => (r._5 / winMs, r._3)).toSet
    assert(dirty.nonEmpty)
    val expected = rows.groupBy(r => (r._5 / winMs, r._3))
      .filter { case (k, _) => dirty(k) }
      .map { case ((w, t), es) =>
        val sum6 = BigDecimal(es.map(_._4).sum)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (w, t, es.length.toLong, sum6, es.map(_._2).distinct.length.toLong)
      }.toSet
    val got = EventQueries.q131DirtyWindowRecompute(spark, sf0001)
      .as[(Long, String, Long, Double, Long)].collect().toSet
    assert(got.map(r => (r._1, r._2)) === dirty)
    assert(got === expected)
    // selectivity: the refresh touches a strict subset of all groups
    val allGroups = rows.map(r => (r._5 / winMs, r._3)).distinct.length
    assert(dirty.size < allGroups)
  }

  // ------------------------------------------------------------- q133
  test("q133: text-lake round-trip is row- and byte-faithful per source (sf0.001)") {
    val docs = Tables.documents(spark, sf0001)
      .select($"source", $"text").as[(String, String)].collect()
    // precondition the corpus must satisfy for a line-oriented lake
    assert(docs.forall(d => !d._2.contains('\n') && !d._2.contains('\r')))
    val expected = docs.groupBy(_._1).map { case (src, ds) =>
      (src, ds.length.toLong, ds.map(_._2.length.toLong).sum,
        ds.map(_._2.length).min, ds.map(_._2.length).max)
    }.toSet
    val got = TextStatsQueries.q133TextLake(spark, sf0001)
      .as[(String, Long, Long, Int, Int)].collect().toSet
    assert(got === expected)
  }

  // ------------------------------------------------------------- q134
  test("q134: mergeSchema read keeps gen-1 rows with NULL evolved column (sf0.001)") {
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", $"lang", $"n_chars").as[(Long, String, Long)].collect()
    val expected = docs.groupBy(_._2).map { case (lang, ds) =>
      val evolved = ds.filter(_._1 % 2 == 1)
      (lang, ds.length.toLong, evolved.length.toLong,
        evolved.map(_._3 % 7).sum)
    }.toSet
    val got = TextStatsQueries.q134SchemaEvolution(spark, sf0001)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === expected)
    // the merged read really surfaces BOTH generations
    val totalDocs = got.toSeq.map(_._2).sum
    assert(totalDocs === docs.length.toLong)
    assert(got.toSeq.map(_._3).sum < totalDocs) // gen-1 rows present too
  }

  // ------------------------------------------------------------- q135
  test("q135: custom aggregate matches driver quantized arithmetic; partition-invariant") {
    val docs = Tables.documents(spark, sf0001)
      .select($"source", $"n_chars").as[(String, Long)].collect()
    val expected = docs.groupBy(_._1).map { case (src, ds) =>
      val sumNano = ds.map(d => math.round(math.log(1.0 + d._2) * 1e9)).sum
      val gm = BigDecimal(math.exp(sumNano.toDouble / ds.length / 1e9))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (src, ds.length.toLong, gm)
    }.toSet
    val got = TextStatsQueries.q135GeoMeanLength(spark, sf0001)
      .as[(String, Long, Double)].collect().toSet
    assert(got === expected)
    // bit-identical under a different partitioning (exact long buffer)
    spark.udf.register("geo_mean1p", udaf(graft.functions.ExactGeoMean))
    Tables.documents(spark, sf0001).repartition(13)
      .createOrReplaceTempView("documents_q135_repart")
    val repart = spark.sql(
      """SELECT source, count(*) AS n_docs, geo_mean1p(n_chars) AS g
        |FROM documents_q135_repart GROUP BY source""".stripMargin)
      .as[(String, Long, Double)].collect().toSet
    assert(repart === got)
  }

  // ------------------------------------------------------------- q136
  test("q136: k-core peel matches a driver-side re-derivation (sf0.001)") {
    val edges = DedupQueries.synthEdges(spark, sf0001)
      .as[(Long, Long)].collect()
    var sym = (edges ++ edges.map { case (a, b) => (b, a) }).toSeq
    val before = sym.map(_._1).distinct.size
    for (_ <- 1 to GraphQueries.CoreRounds) {
      val deg = sym.groupBy(_._1).map { case (v, es) => v -> es.size }
      val keep = deg.filter(_._2 >= GraphQueries.CoreK).keySet
      sym = sym.filter(e => keep(e._1) && keep(e._2))
    }
    val expected = sym.groupBy(_._1)
      .map { case (v, es) => (v, es.size.toLong) }.toSet
    val got = GraphQueries.q136KCore(spark, sf0001)
      .as[(Long, Long)].collect().toSet
    assert(got === expected)
    // the peel actually removed periphery on this fixture
    assert(got.size < before)
    assert(got.nonEmpty)
  }

  // ------------------------------------------------------------- q128
  test("q128: rollup matches the q16 pair set joined to md5 splits (sf0.001)") {
    val pairs = DedupQueries.q16LshNearDups(spark, sf0001)
      .select($"a", $"b", $"jaccard").as[(Long, Long, Double)].collect()
    val splits = Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) =>
        id -> (if (md5Hex(t).charAt(0) < 'e') "train" else "test")
      }.toMap
    val expected = pairs.map { case (a, b, j) =>
      val (sa, sb) = (splits(a), splits(b))
      val key = Seq(sa, sb).sorted.mkString("/")
      (key, math.round(j * 1e6))
    }.groupBy(_._1).map { case (k, ms) =>
      val n = ms.length.toLong
      (k, n,
        BigDecimal(ms.map(_._2).sum.toDouble / n / 1e6)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val got = DedupQueries.q128SplitLeakage(spark, sf0001)
      .as[(String, Long, Double)].collect().toSet
    assert(got === expected)
    // conservation: every q16 pair lands in exactly one split bucket
    assert(got.toSeq.map(_._2).sum === pairs.length.toLong)
  }
}
