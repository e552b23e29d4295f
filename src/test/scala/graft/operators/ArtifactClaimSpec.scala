package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.io.ArtifactClaim

/** The cross-process claim fence at the artifact ensure verbs (round-14
  * verdict #2): [[graft.operators.EnsureLock]] serializes cold builders
  * in-process only, so a second JVM cold-ensuring the same artifact
  * could interleave overwrite phases. Each artifact family's MUTATING
  * phase now runs under [[graft.io.ArtifactClaim]] — a held foreign
  * claim (simulated by its O_EXCL file) fails LOUDLY and never tears;
  * a WARM ensure is a pure read that ignores the claim entirely; the
  * loser's retry after the claim clears re-ensures cleanly.
  */
class ArtifactClaimSpec extends SparkTestBase {

  /** An isolated corpus replica: claim tests must never contend on the
    * shared per-sfdir artifacts other suites warm. */
  private def freshCorpus(tag: String): String = {
    val tmp = java.nio.file.Files.createTempDirectory(s"graft-$tag")
      .toFile.getAbsolutePath
    spark.read.parquet(s"$sf0001/documents.parquet")
      .write.parquet(s"$tmp/documents.parquet")
    tmp
  }

  private def foreignClaim(artifactPath: String): java.io.File = {
    val f = new java.io.File(ArtifactClaim.claimPath(artifactPath))
    f.getParentFile.mkdirs()
    assert(f.createNewFile(), s"could not simulate a foreign claim at $f")
    f
  }

  test("postings index: a foreign claim blocks the COLD ensure loudly; cleared, the retry builds; the warm ensure never touches the claim") {
    val dir = freshCorpus("claim-idx")
    val idxPath = Round15Queries.bm25IndexPath(dir)
    val claim = foreignClaim(idxPath)
    val e = intercept[IllegalArgumentException] {
      Round15Queries.ensureBm25IndexIncremental(spark, dir)
    }
    assert(e.getMessage.contains(".lock"), e.getMessage)
    // nothing was torn: no index materialized behind the refusal
    assert(Round15Queries.bm25IndexRead(spark, idxPath).isEmpty)
    assert(claim.delete())
    val m = Round15Queries.ensureBm25IndexIncremental(spark, dir)
    assert(m.docRows > 0L)
    assert(!claim.exists(), "the builder must release its own claim")
    // warm path: a foreign claim is irrelevant to a pure read
    val claim2 = foreignClaim(idxPath)
    val m2 = Round15Queries.ensureBm25IndexIncremental(spark, dir)
    assert(m2 === m)
    assert(claim2.exists(), "a warm ensure must not delete a claim")
    assert(claim2.delete())
  }

  test("masked-df: the cold ensure is claim-fenced; warm ignores the claim") {
    val dir = freshCorpus("claim-md")
    Round15Queries.ensureBm25IndexIncremental(spark, dir)
    val idxPath = Round15Queries.bm25IndexPath(dir)
    val tombstones = spark.read.parquet(s"$idxPath/dl")
      .select(col("doc_id"))
      .filter(col("doc_id") % Round15Queries.Bm25DeleteMod
        === Round15Queries.Bm25DeleteRem)
      .localCheckpoint()
    val mdPath = Round15Queries.maskedDfPath(idxPath)
    val claim = foreignClaim(mdPath)
    val e = intercept[IllegalArgumentException] {
      Round15Queries.ensureBm25MaskedDf(spark, idxPath, tombstones)
    }
    assert(e.getMessage.contains(".lock"), e.getMessage)
    assert(claim.delete())
    var computes = 0
    Round15Queries.ensureBm25MaskedDf(spark, idxPath, tombstones,
      onCompute = () => computes += 1)
    assert(computes === 1)
    // warm re-ensure under a foreign claim: a read, no contention
    val claim2 = foreignClaim(mdPath)
    Round15Queries.ensureBm25MaskedDf(spark, idxPath, tombstones,
      onCompute = () => computes += 1)
    assert(computes === 1, "warm must not recompute")
    assert(claim2.delete())
  }

  test("dataset card: build and merge are claim-fenced; the warm cardEnsure ignores the claim") {
    val dir = freshCorpus("claim-card")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
    val card = s"$dir/card"
    val claim = foreignClaim(card)
    val e1 = intercept[IllegalArgumentException] {
      Round18Queries.cardWrite(spark, card, docs)
    }
    assert(e1.getMessage.contains(".lock"), e1.getMessage)
    assert(claim.delete())
    Round18Queries.cardWrite(spark, card,
      docs.filter(col("doc_id") % 3 =!= 0))
    val e2Claim = foreignClaim(card)
    val e2 = intercept[IllegalArgumentException] {
      Round18Queries.cardAppendBatch(spark, card,
        docs.filter(col("doc_id") % 3 === 0))
    }
    assert(e2.getMessage.contains(".lock"), e2.getMessage)
    // the refused merge never advanced the ledger: the card is NOT torn
    assert(!Round18Queries.cardTorn(spark, card))
    // warm ensure under the held claim: a pure read, succeeds
    Round18Queries.cardEnsure(spark, card,
      docs.filter(col("doc_id") % 3 =!= 0),
      onBuild = () => fail("warm ensure must not build"))
    assert(e2Claim.delete())
    Round18Queries.cardAppendBatch(spark, card,
      docs.filter(col("doc_id") % 3 === 0))
    assert(Round18Queries.cardServe(spark, card).collect().nonEmpty)
  }

  test("incremental card ensure: plan AND verb share ONE claim — a foreign claim refuses the APPEND path before the file ledger advances") {
    val dir = freshCorpus("claim-cardinc")
    // replace the replica with a half corpus, cold-ensure, then land
    // an ingest as new files → the ensure's next plan is CardAppend
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
      .localCheckpoint()
    docs.filter(col("doc_id") % 3 =!= 0).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val card = Round19Queries.ensureCorpusCardIncremental(spark, dir)
    docs.filter(col("doc_id") % 3 === 0).write.mode("append")
      .parquet(s"$dir/documents.parquet")
    val ledgerBefore = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(Round19Queries.cardFilesLedgerPath(card)))
    val claim = foreignClaim(card)
    val e = intercept[IllegalArgumentException] {
      Round19Queries.ensureCorpusCardIncremental(spark, dir,
        onBuild = () => fail("refused ensure must not build"),
        onAppend = _ => fail("refused ensure must not merge"))
    }
    assert(e.getMessage.contains(".lock"), e.getMessage)
    // the refusal wrote NOTHING: the file ledger still describes the
    // pre-ingest state (a half-advanced ledger would turn the retry's
    // append into a rebuild), and the card is not torn
    assert(java.util.Arrays.equals(ledgerBefore,
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        Round19Queries.cardFilesLedgerPath(card)))),
      "a refused ensure must not advance the files ledger")
    assert(!Round18Queries.cardTorn(spark, card))
    assert(claim.delete())
    // the retry still sees the append-shaped plan and merges the batch
    var builds = 0; var appends = 0
    Round19Queries.ensureCorpusCardIncremental(spark, dir,
      onBuild = () => builds += 1, onAppend = _ => appends += 1)
    assert((builds, appends) === ((0, 1)),
      "the retry must APPEND — the refusal preserved the plan's state")
    val oneShot = s"$dir/oneshot"
    Round18Queries.cardWrite(spark, oneShot,
      spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("lang"), col("source"), col("text")))
    assert(Round18Queries.cardServe(spark, card).collect().map(_.toSeq).toSet
      === Round18Queries.cardServe(spark, oneShot).collect()
        .map(_.toSeq).toSet)
  }

  test("ANN index: the per-JVM prepare's cold build is claim-fenced; the retry after clearing builds and probes") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-claim-ann")
      .toFile.getAbsolutePath
    spark.read.parquet(s"$sf0001/embeddings.parquet")
      .write.parquet(s"$tmp/embeddings.parquet")
    // the prepare memo is per-JVM and keyed by index path — a fresh
    // corpus dir guarantees the cold branch; the foreign claim must
    // block it BEFORE any overwrite starts
    val idx = new java.io.File(
      s"target/ivf-index/${PathTag.tagFor(tmp)}").getAbsolutePath
    val claim = foreignClaim(idx)
    val e = intercept[IllegalArgumentException] {
      AnnQueries.prepareIvf(spark, tmp)
    }
    assert(e.getMessage.contains(".lock"), e.getMessage)
    assert(!new java.io.File(s"$idx/centroids").exists(),
      "the refused build must not have started writing")
    assert(claim.delete())
    assert(AnnQueries.prepareIvf(spark, tmp) === idx)
    assert(new java.io.File(s"$idx/centroids").exists())
    assert(!claim.exists())
  }

  test("choice artifacts: the cold sweep is claim-fenced and the refusal leaves no artifact behind") {
    val dir = freshCorpus("claim-choice")
    val path = Round15Queries.bm25ChoicePath(dir)
    val claim = foreignClaim(path)
    // a stamped foreign claim names its holder in the refusal — the
    // operator affordance for the manual staleness call
    java.nio.file.Files.write(claim.toPath,
      "4242@otherhost since 2026-01-01T00:00:00Z".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      Round15Queries.ensureBm25ParamsChoice(spark, dir,
        () => fail("the refused ensure must not start the sweep"))
    }
    assert(e.getMessage.contains(".lock"), e.getMessage)
    assert(e.getMessage.contains("held by 4242@otherhost"), e.getMessage)
    assert(claim.delete())
    // retry: the sweep runs once, the artifact lands, the claim is gone
    val c = Round15Queries.ensureBm25ParamsChoice(spark, dir,
      () => Round15Queries.bm25GridPoints.map { case (k1, b) =>
        (k1, b, k1 + b) })
    assert(c.k1Micro > 0L)
    assert(!new java.io.File(ArtifactClaim.claimPath(path)).exists())
  }
}
