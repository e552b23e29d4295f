package graft.io

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ann.Ann
import graft.operators.ChoiceStore

/** The round-12 equivalence laws for the per-file stamp sidecar: the
  * metadata-scale warm path must be EXACTLY the content fold — same
  * triple on every file-set state a lifecycle verb can produce — and
  * must provably read zero data when no file moved (the trust
  * boundary is (path, length, mtime), pinned here the way the corpus
  * stamp's length-preserving-edit escape is).
  */
class StampSidecarSpec extends SparkTestBase {

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf); f.delete(); ()
  }

  private def foldStamp(path: String): (Long, Long) =
    ChoiceStore.documentsStamp(
      spark.read.parquet(path).select(col("doc_id"), col("text")))

  test("documents sidecar stamp ≡ content fold across ingest, append, and delete") {
    val dir = new java.io.File("target/spec-stamp-docs").getAbsolutePath
    val side = s"$dir-sidecar.tsv"
    rmrf(new java.io.File(dir)); rmrf(new java.io.File(side))
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    // multi-file layout — per-file partial sums must compose
    docs.filter(col("doc_id") % 3 =!= 0).repartition(3)
      .write.mode("overwrite").parquet(dir)
    val s1 = ChoiceStore.documentsStampCached(spark, dir, side)
    assert(s1 === foldStamp(dir), "cold build ≡ fold")
    // warm call: same stamp, sidecar unchanged
    assert(ChoiceStore.documentsStampCached(spark, dir, side) === s1)
    // APPEND a batch (new files, existing files untouched): only the
    // new files are unknown to the sidecar; the stamp still ≡ fold
    docs.filter(col("doc_id") % 3 === 0).repartition(2)
      .write.mode("append").parquet(dir)
    val s2 = ChoiceStore.documentsStampCached(spark, dir, side)
    assert(s2 === foldStamp(dir), "post-append ≡ fold")
    assert(s2 !== s1, "append must move the stamp")
    // DELETE a data file (a retention pass): the sidecar must DROP the
    // removed file's cached rows, not keep counting them
    val part = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") &&
        !f.getName.startsWith("_")).head
    assert(part.delete())
    val s3 = ChoiceStore.documentsStampCached(spark, dir, side)
    assert(s3 === foldStamp(dir), "post-delete ≡ fold")
    assert(s3 !== s2, "delete must move the stamp")
  }

  test("warm validation reads ZERO data: the sidecar is trusted on (path, len, mtime) — the pinned fidelity boundary") {
    val dir = new java.io.File("target/spec-stamp-trust").getAbsolutePath
    val side = s"$dir-sidecar.tsv"
    rmrf(new java.io.File(dir)); rmrf(new java.io.File(side))
    graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
      .repartition(2).write.mode("overwrite").parquet(dir)
    val honest = ChoiceStore.documentsStampCached(spark, dir, side)
    // TAMPER the sidecar's cached residues (lengths/mtimes intact),
    // through the API — a raw byte edit would trip the Hadoop local
    // FS checksum and force a rescan, which is itself a safety net,
    // but the law under test is the TRUST boundary: if the warm path
    // re-read any data file, the tampering would be corrected;
    // serving the tampered values PROVES zero data reads.
    val tampered = StampSidecar.read(spark, side).values.toSeq
      .map(s => s.copy(rows = s.rows + 1, content = s.content + 7))
    assert(tampered.nonEmpty)
    StampSidecar.write(spark, side, tampered)
    val served = ChoiceStore.documentsStampCached(spark, dir, side)
    val nFiles = new java.io.File(dir).listFiles()
      .count(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(served === ((honest._1 + nFiles, honest._2 + 7L * nFiles)),
      "warm path must serve the sidecar verbatim — zero data reads")
    // ...and ANY file-set change rescans the moved files and heals:
    // this is exactly the corpus stamp's fidelity discipline — the
    // cheap key can serve stale only while nothing it watches moved
    graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).limit(5)
      .repartition(1).write.mode("append").parquet(dir)
    val healedPlus = ChoiceStore.documentsStampCached(spark, dir, side)
    // the appended file is honest; the untouched files' tampered
    // entries persist (they still match on len/mtime) — heal them by
    // removing the sidecar (the documented recovery: a sidecar is a
    // CACHE, deleting it is always safe)
    rmrf(new java.io.File(side))
    assert(ChoiceStore.documentsStampCached(spark, dir, side)
      === foldStamp(dir), "sidecar delete = full rescan = fold")
    assert(healedPlus !== served, "append moved the stamp")
  }

  test("torn or missing sidecar degrades to a full rescan, never a wrong stamp") {
    val dir = new java.io.File("target/spec-stamp-torn").getAbsolutePath
    val side = s"$dir-sidecar.tsv"
    rmrf(new java.io.File(dir)); rmrf(new java.io.File(side))
    graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
      .repartition(2).write.mode("overwrite").parquet(dir)
    val fold = foldStamp(dir)
    assert(ChoiceStore.documentsStampCached(spark, dir, side) === fold)
    java.nio.file.Files.write(java.nio.file.Paths.get(side),
      "garbage\tnot\tenough".getBytes("UTF-8"))
    assert(ChoiceStore.documentsStampCached(spark, dir, side) === fold,
      "torn sidecar = rescan")
    // and the rescan rewrote a good sidecar
    assert(ChoiceStore.documentsStampCached(spark, dir, side) === fold)
  }

  test("IVF-PQ generation sidecar stamp ≡ content fold across build, append, retrain, and the empty sentinel") {
    import org.apache.spark.sql.functions.col
    val e = graft.Tables.embeddings(spark, sf0001)
    val idx = new java.io.File("target/spec-stamp-idx").getAbsolutePath
    rmrf(new java.io.File(idx))
    Ann.ivfPqBuild(e.filter(col("vec_id") % 5 =!= 3), idx, 4, 8, 16)
    val s1 = Ann.ivfPqGenerationStampCached(spark, idx)
    assert(s1 === Ann.ivfPqGenerationStamp(spark, idx), "build ≡ fold")
    assert(Ann.ivfPqGenerationStampCached(spark, idx) === s1, "warm ≡")
    // APPEND: new inverted-list files under existing cluster dirs —
    // the hive partition column must survive the leaf-file rescan
    // (the basePath contract)
    Ann.ivfPqAppend(e.filter(col("vec_id") % 5 === 3), idx)
    val s2 = Ann.ivfPqGenerationStampCached(spark, idx)
    assert(s2 === Ann.ivfPqGenerationStamp(spark, idx), "append ≡ fold")
    assert(s2 !== s1)
    // RETRAIN rewrites the whole generation into a fresh dir
    val r = new java.io.File("target/spec-stamp-idx-retr").getAbsolutePath
    rmrf(new java.io.File(r))
    Ann.ivfPqRetrain(e, idx, r, 4, 8, 16)
    assert(Ann.ivfPqGenerationStampCached(spark, r)
      === Ann.ivfPqGenerationStamp(spark, r), "retrain ≡ fold")
    // EMPTY generation: listed file contributes zero rows — both sides
    // stamp (0, 0, 0) (the files component counts only files with rows
    // on BOTH sides; round-11 advice's NPE state)
    val z = new java.io.File("target/spec-stamp-idx-empty").getAbsolutePath
    rmrf(new java.io.File(z))
    Ann.ivfPqWriteEmptyGeneration(spark, z)
    assert(Ann.ivfPqGenerationStampCached(spark, z) === ((0L, 0L, 0L)))
    assert(Ann.ivfPqGenerationStamp(spark, z) === ((0L, 0L, 0L)))
  }
}
