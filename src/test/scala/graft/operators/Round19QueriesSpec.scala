package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Round-19 laws: the corpus card's incremental ensure — file-append
  * ingests merge batch-sized (never a lake re-tokenize), and every
  * state the pure plan cannot prove append-safe rebuilds cleanly.
  */
class Round19QueriesSpec extends SparkTestBase {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("ensureCorpusCardIncremental: cold builds once, warm is a no-verb read, a file append MERGES (≡ one-shot), a removed file rebuilds") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cardinc")
      .toFile.getAbsolutePath
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "lang", "source", "text").localCheckpoint()
    docs.filter(col("doc_id") % 3 =!= 0)
      .write.parquet(s"$tmp/documents.parquet")
    var builds = 0; var appends = 0
    def ensure(): String = Round19Queries.ensureCorpusCardIncremental(
      spark, tmp, onBuild = () => builds += 1,
      onAppend = _ => appends += 1)
    val card = ensure() // cold
    assert((builds, appends) === ((1, 0)))
    ensure() // warm — provably no verb
    assert((builds, appends) === ((1, 0)))
    // an ingest lands as NEW files: the ensure must merge the batch,
    // never re-tokenize the lake
    docs.filter(col("doc_id") % 3 === 0)
      .write.mode("append").parquet(s"$tmp/documents.parquet")
    ensure()
    assert((builds, appends) === ((1, 1)))
    // merged card ≡ the one-shot card over the grown corpus
    val oneShot = s"$tmp/oneshot"
    Round18Queries.cardWrite(spark, oneShot,
      spark.read.parquet(s"$tmp/documents.parquet"))
    assert(rows(Round18Queries.cardServe(spark, card))
      === rows(Round18Queries.cardServe(spark, oneShot)))
    // ...and warm again after the merge
    ensure()
    assert((builds, appends) === ((1, 1)))
    // a REMOVED file breaks the intact rule: the plan must rebuild —
    // appending onto a ledger describing vanished bytes would serve
    // volumes for documents that no longer exist
    val victim = new java.io.File(s"$tmp/documents.parquet").listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_")
        && !f.getName.startsWith(".")).head
    assert(victim.delete())
    val crc = new java.io.File(victim.getParentFile,
      s".${victim.getName}.crc")
    if (crc.exists()) assert(crc.delete())
    ensure()
    assert((builds, appends) === ((2, 1)), "a shrunk lake must rebuild")
    val oneShot2 = s"$tmp/oneshot2"
    Round18Queries.cardWrite(spark, oneShot2,
      spark.read.parquet(s"$tmp/documents.parquet"))
    assert(rows(Round18Queries.cardServe(spark, card))
      === rows(Round18Queries.cardServe(spark, oneShot2)))
  }

  test("corpus card crash window: a merge that dies before meta leaves the card torn; the next incremental ensure REBUILDS, never re-adds the batch") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cardinc2")
      .toFile.getAbsolutePath
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "lang", "source", "text").localCheckpoint()
    docs.filter(col("doc_id") % 3 =!= 0)
      .write.parquet(s"$tmp/documents.parquet")
    var builds = 0; var appends = 0
    val card = Round19Queries.ensureCorpusCardIncremental(spark, tmp,
      onBuild = () => builds += 1, onAppend = _ => appends += 1)
    // the ingest merge crashes in the old double-count window
    docs.filter(col("doc_id") % 3 === 0)
      .write.mode("append").parquet(s"$tmp/documents.parquet")
    intercept[RuntimeException] {
      Round18Queries.cardAppendBatch(spark, card,
        docs.filter(col("doc_id") % 3 === 0), crashBeforeMeta = true)
    }
    assert(Round18Queries.cardTorn(spark, card))
    // the incremental ensure resolves torn via REBUILD (stateOk=false
    // forces it through the plan), and the result is the one-shot card
    Round19Queries.ensureCorpusCardIncremental(spark, tmp,
      onBuild = () => builds += 1, onAppend = _ => appends += 1)
    assert((builds, appends) === ((2, 0)),
      "a torn card must rebuild, never merge")
    val oneShot = s"$tmp/oneshot"
    Round18Queries.cardWrite(spark, oneShot,
      spark.read.parquet(s"$tmp/documents.parquet"))
    assert(rows(Round18Queries.cardServe(spark, card))
      === rows(Round18Queries.cardServe(spark, oneShot)))
  }

  test("cardDrift: the full status matrix — new/vanished strata come from raw presence, deltas and term drift from the card tables") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-carddrift")
      .toFile.getAbsolutePath
    // release A: four strata
    val a = Seq(
      (1L, "en", "s1", "alpha beta"), (2L, "en", "s1", "beta gamma"),
      (3L, "en", "s2", "same text here"),
      (4L, "fr", "s3", "rouge vert"), (5L, "fr", "s3", "bleu"),
      (6L, "de", "s4", "eins")
    ).toDF("doc_id", "lang", "source", "text")
    // release B: s1 grows (+1 doc, new term), s2 flat, s3 shrinks
    // (terms vanish), s4 vanishes, s5 is new
    val b = Seq(
      (1L, "en", "s1", "alpha beta"), (2L, "en", "s1", "beta gamma"),
      (7L, "en", "s1", "delta"),
      (3L, "en", "s2", "same text here"),
      (4L, "fr", "s3", "rouge"),
      (8L, "es", "s5", "hola mundo")
    ).toDF("doc_id", "lang", "source", "text")
    Round18Queries.cardEnsure(spark, s"$tmp/cardA", a)
    Round18Queries.cardEnsure(spark, s"$tmp/cardB", b)
    val drift = Round19Queries.cardDrift(spark, s"$tmp/cardA",
        s"$tmp/cardB")
      .select("lang", "source", "a_docs", "b_docs", "d_docs",
        "new_terms", "gone_terms", "status")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getString(7)))).toMap
    assert(drift(("en", "s1")) === ((2L, 3L, 1L, 1L, 0L, "grown")))
    assert(drift(("en", "s2")) === ((1L, 1L, 0L, 0L, 0L, "flat")))
    assert(drift(("fr", "s3")) === ((2L, 1L, -1L, 0L, 2L, "shrunk")))
    assert(drift(("de", "s4")) === ((1L, 0L, -1L, 0L, 1L, "vanished")))
    assert(drift(("es", "s5")) === ((0L, 1L, 1L, 2L, 0L, "new")))
    assert(drift.size === 5)
    // the TVF is the verb, byte-exact, from one SQL text — and both
    // cards' plan-time discipline rides in (literal/arity boundaries)
    assert(spark.sql(s"SELECT * FROM graft_card_drift('$tmp/cardA', " +
        s"'$tmp/cardB')").collect().map(_.toSeq).toSet
      === Round19Queries.cardDrift(spark, s"$tmp/cardA", s"$tmp/cardB")
        .collect().map(_.toSeq).toSet)
    val e1 = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_card_drift('$tmp/cardA')").collect()
    }
    assert(e1.getMessage.contains("2 argument"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_card_drift('$tmp/cardA', " +
        s"concat('$tmp/cardB', ''))").collect()
    }
    assert(e2.getMessage.contains("literal"), e2.getMessage)
    // a torn card on the B side refuses at PLAN time through SQL
    intercept[Exception] {
      Round18Queries.cardAppendBatch(spark, s"$tmp/cardB",
        Seq((99L, "en", "s1", "boom")).toDF("doc_id", "lang", "source",
          "text"), crashBeforeMeta = true)
    }
    val e3 = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_card_drift('$tmp/cardA', " +
        s"'$tmp/cardB')").collect()
    }
    assert(e3.getMessage.contains("TORN"), e3.getMessage)
  }

  test("cardDrift duality laws: drift(A,A) is the all-flat zero report; drift(B,A) mirrors drift(A,B) exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-driftdual")
      .toFile.getAbsolutePath
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "lang", "source", "text").localCheckpoint()
    Round18Queries.cardEnsure(spark, s"$tmp/a",
      docs.filter(col("doc_id") % 4 < 2))
    Round18Queries.cardEnsure(spark, s"$tmp/b", docs)
    // identity: a release diffed against itself reports nothing
    Round19Queries.cardDrift(spark, s"$tmp/a", s"$tmp/a")
      .collect().foreach { r =>
        assert(r.getAs[String]("status") === "flat", r)
        for (c <- Seq("d_docs", "d_bytes", "d_tokens", "d_terms",
            "new_terms", "gone_terms"))
          assert(r.getAs[Long](c) === 0L, s"$c in $r")
      }
    // duality: swapping the releases negates every delta, swaps
    // new↔gone terms and new↔vanished / grown↔shrunk verdicts
    val fwd = Round19Queries.cardDrift(spark, s"$tmp/a", s"$tmp/b")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val bwd = Round19Queries.cardDrift(spark, s"$tmp/b", s"$tmp/a")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(fwd.keySet === bwd.keySet)
    val mirror = Map("new" -> "vanished", "vanished" -> "new",
      "grown" -> "shrunk", "shrunk" -> "grown", "flat" -> "flat")
    fwd.foreach { case (k, f) =>
      val b = bwd(k)
      assert(b.getAs[Long]("a_docs") === f.getAs[Long]("b_docs"), k)
      assert(b.getAs[Long]("b_docs") === f.getAs[Long]("a_docs"), k)
      for (c <- Seq("d_docs", "d_bytes", "d_tokens", "d_terms"))
        assert(b.getAs[Long](c) === -f.getAs[Long](c), s"$c at $k")
      assert(b.getAs[Long]("new_terms") === f.getAs[Long]("gone_terms"), k)
      assert(b.getAs[Long]("gone_terms") === f.getAs[Long]("new_terms"), k)
      assert(b.getAs[String]("status")
        === mirror(f.getAs[String]("status")), k)
    }
  }
}
