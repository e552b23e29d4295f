package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.Tables
import graft.operators.UnigramQueries

/** Full local replay of the unigram-LM trainer (the q259/q260 spec
  * discipline: re-derive the whole artifact in plain Scala and compare
  * piece for piece), plus the segmentation laws.
  */
class UnigramLmSpec extends SparkTestBase {

  // plain-Scala reference trainer, independent of the Spark plans
  private def substrEnds(w: String): Seq[(Int, Int)] =
    for { j <- 1 to w.length; l <- 1 to math.min(UnigramLm.MaxPieceLen, j) }
      yield (j, l)

  private def refScores(cnts: Map[String, Long]): Map[String, Long] = {
    val tot = cnts.values.sum.toDouble
    cnts.map { case (p, c) => p -> math.round(1e6 * math.log(c / tot)) }
  }

  private def refViterbi(w: String,
      s: Map[String, Long]): (List[String], Long) = {
    val dp = Array.fill(w.length + 1)((0L, 0L, 0L))
    for (j <- 1 to w.length) {
      val cands = for {
        l <- 1 to math.min(UnigramLm.MaxPieceLen, j)
        p = w.substring(j - l, j) if s.contains(p)
      } yield (dp(j - l)._1 - s(p), dp(j - l)._2 + 1, -l.toLong)
      dp(j) = cands.min // Tuple3 lexicographic = the engine's struct sort
    }
    var pos = w.length
    val parts = scala.collection.mutable.ListBuffer.empty[String]
    while (pos > 0) {
      val l = (-dp(pos)._3).toInt
      parts.prepend(w.substring(pos - l, pos))
      pos -= l
    }
    (parts.toList, -dp(w.length)._1)
  }

  /** The full plain-Scala EM replay, shared by the trainer and encode
    * tests: (word counts, final segmentations, final raw piece counts).
    * Asserts the seed cap does not bind on the fixture — the uncapped
    * local replay would diverge by construction if it did. */
  private def localEm(): (Map[String, Long],
      Map[String, (List[String], Long)], Map[String, Long]) = {
    val wc = UnigramLm.wordCounts(Tables.documents(spark, sf0001)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wc.nonEmpty)
    val seedAll = wc.toSeq
      .flatMap { case (w, n) =>
        substrEnds(w).map { case (j, l) => w.substring(j - l, j) -> n } }
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
    // the broadcastability cap must not bind on this fixture, or the
    // uncapped local replay would diverge by construction
    assert(seedAll.count(_._1.length > 1) < UnigramLm.MaxSeedPieces)
    val seed = seedAll.filter { case (p, c) =>
      p.length == 1 || c >= UnigramLm.MinSeedCount }
    var sc = refScores(seed)
    var segs: Map[String, (List[String], Long)] = Map.empty
    var raw: Map[String, Long] = Map.empty
    for (_ <- 1 to UnigramLm.EmRounds) {
      segs = wc.keys.map(w => w -> refViterbi(w, sc)).toMap
      raw = segs.toSeq
        .flatMap { case (w, (ps, _)) => ps.map(_ -> wc(w)) }
        .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      sc = refScores(seed.map { case (p, _) => p -> (raw.getOrElse(p, 0L) + 1L) })
    }
    (wc, segs, raw)
  }

  test("unigram trainer: full local EM replay matches engine segmentation and vocab") {
    val (wc, segs, raw) = localEm()
    val got = UnigramQueries.q267UnigramSegment(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet === wc.keySet)
    got.foreach { case (w, (np, sm)) =>
      assert(np === segs(w)._1.length.toLong, s"n_pieces diverges for '$w'")
      assert(sm === segs(w)._2, s"viterbi score diverges for '$w'")
    }
    val gotV = UnigramQueries.q266UnigramVocab(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(2))).toSeq
    val expV = raw.toSeq.sortBy { case (p, c) => (-c, p) }
      .take(UnigramLm.VocabSize)
    assert(gotV === expV, "final vocab ranking diverges from the local replay")
    // segmentation laws: pieces concatenate back to the word, every
    // piece within the length cap, coverage total (no word dropped)
    segs.foreach { case (w, (ps, _)) =>
      assert(ps.mkString === w, s"'$w' does not reassemble")
      assert(ps.forall(p => p.nonEmpty && p.length <= UnigramLm.MaxPieceLen))
    }
  }

  test("q269 encode: per-doc id sequences match the local replay end to end") {
    val (_, segs, raw) = localEm()
    // dense ids over the model's used pieces: (count desc, piece asc)
    val ids: Map[String, Long] = raw.toSeq
      .sortBy { case (p, c) => (-c, p) }
      .zipWithIndex.map { case ((p, _), i) => p -> (i + 1L) }.toMap
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def toks(text: String): Vector[String] =
      text.toLowerCase.replaceAll("(\\d|\\W)+", " ").trim
        .split(" ").toVector.filter(_.nonEmpty)
    val expected = docs.map { case (id, text) =>
      val ws = toks(text)
      val seq = ws.flatMap(w => segs(w)._1.map(ids))
      // n_oov = 0 by construction: the batch gate encodes the corpus
      // the model was trained on
      (id, ws.size.toLong, 0L, seq.size.toLong, seq.headOption,
        md5hex(seq.mkString(",")))
    }.sortBy(_._1)
    val got = UnigramQueries.q269UnigramEncode(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(5)).map(_.asInstanceOf[Long]), r.getString(6)))
    assert(got.toSeq === expected.toSeq)
    // fertility column: n_pieces per encoded word, round-6, NULL when
    // nothing encodes
    UnigramQueries.q269UnigramEncode(spark, sf0001).collect().foreach { r =>
      if (r.getLong(1) - r.getLong(2) == 0L) assert(r.isNullAt(4))
      else assert(math.abs(r.getDouble(4) -
        r.getLong(3).toDouble / (r.getLong(1) - r.getLong(2))) < 1e-6)
    }
  }

  test("q270 decode: every doc round-trips, and the decode rides the ids, not the words") {
    val (_, segs, _) = localEm()
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def toks(text: String): Vector[String] =
      text.toLowerCase.replaceAll("(\\d|\\W)+", " ").trim
        .split(" ").toVector.filter(_.nonEmpty)
    // the local replay: decoded text = normalized text IF AND ONLY IF
    // each word's pieces reassemble (UnigramLmSpec's segmentation law),
    // so the expected row is computable from the original text alone
    val expected = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map { r =>
        val norm = toks(r.getString(1)).mkString(" ")
        (r.getLong(0), norm.getBytes("UTF-8").length.toLong,
          md5hex(norm), 1L)
      }.sortBy(_._1)
    val got = UnigramQueries.q270UnigramDecode(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === expected.toSeq)
    // and the law the round-trip rests on, re-pinned at the artifact:
    // every trained word's piece sequence concatenates back to it
    segs.foreach { case (w, (ps, _)) => assert(ps.mkString === w) }
  }

  test("unigram trainer: EM reduces (or holds) the corpus piece count vs round 1") {
    // hard-EM with re-estimated scores should not fragment the corpus
    // MORE than the seed-frequency segmentation on this fixture — the
    // measured don't-get-worse check (not a theorem; a regression here
    // means the M-step stopped informing the E-step)
    val m = UnigramLm.train(spark, sf0001)
    val finalPieces = m.seg
      .agg(sum(col("n") * col("n_pieces"))).head().getLong(0)
    val wc = UnigramLm.wordCounts(Tables.documents(spark, sf0001))
      .localCheckpoint()
    val seed = UnigramLm.seedCounts(wc)
    val round1 = UnigramLm.viterbiSegment(wc, UnigramLm.scoresFromCounts(seed))
      .agg(sum(col("n") * col("n_pieces"))).head().getLong(0)
    assert(finalPieces <= round1,
      s"EM fragmented the corpus: round1 $round1 -> final $finalPieces")
  }

  test("vocab-size sweep: coverage floor, prune-ladder nesting, fertility saturation, serve ≡ pruned segmentation, fallback branch") {
    val m = UnigramLm.train(spark, sf0001)
    val singles = m.seed.filter(length(col("piece")) === 1)
      .collect().map(_.getString(0)).toSet
    // coverage floor: a nominal size under the alphabet serves the
    // whole alphabet (required-chars are never traded away)
    val v1 = UnigramLm.prunedVocab(m.seed, m.counts, 1)
      .collect().map(_.getString(0)).toSet
    assert(v1 === singles)
    // prune-ladder nesting: every swept vocabulary contains the
    // previous one (one training run, a ladder of prunes)
    val ladder = UnigramLm.VocabSweep.map(v =>
      UnigramLm.prunedVocab(m.seed, m.counts, v)
        .collect().map(_.getString(0)).toSet)
    ladder.sliding(2).foreach { case Seq(a, b) =>
      assert(a.subsetOf(b), "prune ladder must nest") }
    assert(ladder.forall(singles.subsetOf(_)))
    // fertility is nonincreasing along the ladder on this fixture
    // (more vocabulary never fragments more), and saturates once the
    // ladder includes every used piece
    val curve = UnigramLm.VocabSweep.map { v =>
      val (num, den) = UnigramLm.fertilityAt(m.wc, m.seed, m.counts, v)
      (v, num, den)
    }
    curve.sliding(2).foreach { case Seq((_, n1, d1), (_, n2, d2)) =>
      assert(d1 === d2, "denominator is v-invariant (total corpus words)")
      assert(n2 <= n1, "fertility must not rise along the prune ladder")
    }
    // the gated serve: choice replays the rule; rows carry it; the
    // segmentation IS viterbiSegment under the chosen pruned scores
    val chosen = UnigramLm.chooseVocabSize(curve, UnigramLm.MaxFertilityMicro)
    assert(chosen === 64, "sf0.001's 48-point misses the budget (2.3392)")
    val out = UnigramQueries.q275VocabSizeAuto(spark, sf0001).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getLong(0)).toSet === Set(chosen.toLong))
    val expected = UnigramLm.viterbiSegment(m.wc,
        UnigramLm.vocabScores(m.seed, m.counts,
          UnigramLm.prunedVocab(m.seed, m.counts, chosen)))
      .select(col("word"), col("n"), col("n_pieces"), col("score_micro"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    assert(out.map(r => (r.getString(1), r.getLong(2), r.getLong(3),
      r.getLong(4))).toSeq === expected)
    // fallback branch: a budget below the compressibility floor serves
    // the largest swept size
    assert(UnigramLm.chooseVocabSize(curve, 1000000L)
      === UnigramLm.VocabSweep.max)
  }

  test("q277: persisted vocabulary choice — cold trains once, warm serves at zero training jobs, artifact fidelity, stamp staleness") {
    val path = UnigramQueries.vocabChoicePath(sf0001)
    // COLD: wipe the artifact, ensure with a counting thunk — training
    // is forced exactly once
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    var forced = 0
    val c = UnigramQueries.ensureVocabChoice(spark, sf0001,
      () => { forced += 1; UnigramLm.train(spark, sf0001) })
    assert(forced === 1)
    // the persisted decision replays the rule on the measured curve
    val m = UnigramLm.train(spark, sf0001)
    val curve = UnigramLm.VocabSweep.map { v =>
      val (num, den) = UnigramLm.fertilityAt(m.wc, m.seed, m.counts, v)
      (v, num, den)
    }
    assert(c.chosen ===
      UnigramLm.chooseVocabSize(curve, UnigramLm.MaxFertilityMicro))
    assert(c.curve === curve.sortBy(_._1))
    // WARM: the throwing thunk proves the warm path never trains or
    // sweeps (the q272 thunk law applied to the tokenizer dial)
    val w = UnigramQueries.ensureVocabChoice(spark, sf0001,
      () => sys.error("warm vocab choice must not retrain: train forced"))
    assert(w === c)
    // ARTIFACT FIDELITY: the persisted serving scores ARE the chosen
    // pruned vocabulary's renormalized scores, piece for piece
    val persisted = spark.read.parquet(s"$path/vocab").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val recomputed = UnigramLm.vocabScores(m.seed, m.counts,
        UnigramLm.prunedVocab(m.seed, m.counts, c.chosen)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(persisted === recomputed)
    // the gated serve rides the artifact and equals q275's
    // measure-every-call rows (same fixture → same choice), plus the
    // stamp columns
    val r275 = UnigramQueries.q275VocabSizeAuto(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5))).toSeq
    val r277full = UnigramQueries.q277VocabChoicePersist(spark, sf0001)
      .collect()
    val r277 = r277full.map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getString(5))).toSeq
    assert(r277 === r275)
    assert(r277full.map(r => (r.getAs[Long]("doc_rows"),
      r.getAs[Long]("doc_content"))).toSet ===
      Set((c.docRows, c.docContent)))
    // STALENESS: a moved corpus stamp makes the artifact cold — the
    // curve rewritten under a perturbed stamp forces one re-measure,
    // which restores the true stamp and the same choice
    import spark.implicits._
    c.curve.map { case (v, num, den) =>
      (c.docRows + 1, c.docContent, c.budgetMicro, v, num, den,
        v == c.chosen)
    }.toDF("doc_rows", "doc_content", "budget_micro", "vocab_size",
        "fert_num", "fert_den", "chosen")
      .repartition(1).write.mode("overwrite").parquet(s"$path/curve")
    var forced2 = 0
    val c2 = UnigramQueries.ensureVocabChoice(spark, sf0001,
      () => { forced2 += 1; UnigramLm.train(spark, sf0001) })
    assert(forced2 === 1)
    assert(c2 === c)
  }

  test("q279: artifact-only encode — score-rank ids ≡ count-rank ids, zero OOV on the training corpus, and an unseen alphabet-covered word still encodes") {
    UnigramQueries.prepareVocabChoice(spark, sf0001)
    val path = UnigramQueries.vocabChoicePath(sf0001)
    val c = UnigramQueries.vocabChoiceRead(spark, path).get
    val scores = spark.read.parquet(s"$path/vocab")
    // ID-EQUIVALENCE LAW (the q279 scaladoc claim, pinned): ranking
    // the artifact's scores (s desc, piece asc) assigns the SAME ids
    // as ranking the pruned vocabulary's restricted smoothed counts
    // (cnt desc, piece asc — the q269 convention) — the micro-
    // quantized ln-score is monotone in the count
    val m = UnigramLm.train(spark, sf0001)
    val byScore = scores.collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (p, s) => (-s, p) }.map(_._1).toSeq
    val byCount = UnigramLm.smoothed(m.seed, m.counts)
      .join(UnigramLm.prunedVocab(m.seed, m.counts, c.chosen),
        Seq("piece"), "left_semi")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (p, n) => (-n, p) }.map(_._1).toSeq
    assert(byScore === byCount)
    // the gated encode: chosen size on every row, zero OOV on the
    // training corpus (every corpus word is over the trained alphabet)
    val out = UnigramQueries.q279VocabChoiceEncode(spark, sf0001).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getLong(0)).toSet === Set(c.chosen.toLong))
    assert(out.forall(_.getAs[Long]("n_oov") == 0L))
    // DEPLOY LAW: an unseen word over the trained alphabet encodes to
    // ids from the ARTIFACT ALONE (no trainer in the loop) — the id
    // sequence equals the segmentation's pieces mapped through the
    // score-rank table
    import spark.implicits._
    val unseen = "qywqyw"
    val wi = UnigramQueries.vocabWordIds(Seq(unseen).toDF("word"), scores)
      .collect()
    assert(wi.length === 1)
    val gotIds = wi.head.getSeq[Long](1).toList
    val pieces = UnigramLm.viterbiSegment(
        Seq((unseen, 1L)).toDF("word", "n"), scores)
      .collect().head.getSeq[String](2).toList
    val idOf = byScore.zipWithIndex.map { case (p, i) => p -> (i + 1L) }.toMap
    assert(gotIds === pieces.map(idOf))
    assert(gotIds.nonEmpty)
  }

  test("hard-EM vs full-EM: Viterbi-count support is a STRICT subset of forward–backward expected-count support (the documented divergence, non-vacuous on the gate fixture)") {
    // The trainer is Viterbi-/hard-EM by design (integer determinism —
    // see the UnigramLm scaladoc note); Kudo 2018's reference computes
    // forward–backward EXPECTED counts over ALL segmentations. This
    // law pins the divergence on the real fixture: under the SAME
    // score model the engine's final M-step consumed,
    //   (a) every Viterbi-counted piece carries positive expected mass
    //       (the best path is one of the summed segmentations), and
    //   (b) some piece carries ≥1 word-weighted unit of expected mass
    //       yet a hard count of ZERO (it rides only non-best paths) —
    //       exactly the mass the Laplace floor in `smoothed` keeps
    //       alive, which is why (c) full EM's support never leaves the
    //       seed support the floor covers.
    val wc = UnigramLm.wordCounts(Tables.documents(spark, sf0001)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val seedAll = wc.toSeq
      .flatMap { case (w, n) =>
        substrEnds(w).map { case (j, l) => w.substring(j - l, j) -> n } }
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
    assert(seedAll.count(_._1.length > 1) < UnigramLm.MaxSeedPieces)
    val seed = seedAll.filter { case (p, c) =>
      p.length == 1 || c >= UnigramLm.MinSeedCount }
    // replay EM, keeping the scores that ENTERED the final E-step —
    // `raw` below is then exactly the engine's final M-step output
    // (the trainer-replay law above pins the engine to these counts)
    var sc = refScores(seed)
    var scPrev = sc
    var raw: Map[String, Long] = Map.empty
    for (_ <- 1 to UnigramLm.EmRounds) {
      scPrev = sc
      val segs = wc.keys.map(w => w -> refViterbi(w, sc)).toMap
      raw = segs.toSeq
        .flatMap { case (w, (ps, _)) => ps.map(_ -> wc(w)) }
        .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      sc = refScores(seed.map { case (p, _) =>
        p -> (raw.getOrElse(p, 0L) + 1L) })
    }
    val probs = scPrev.map { case (p, s) => p -> math.exp(s / 1e6) }
    val lmax = UnigramLm.MaxPieceLen
    // forward–backward expected piece counts for one word (plain
    // Double — the law is about which pieces carry mass, not about
    // replaying the engine's integers; Z>0 guards underflow)
    def expected(w: String, n: Long): Map[String, Double] = {
      val len = w.length
      val alpha = Array.fill(len + 1)(0.0); alpha(0) = 1.0
      for (j <- 1 to len; l <- 1 to math.min(lmax, j))
        probs.get(w.substring(j - l, j)).foreach(p =>
          alpha(j) += alpha(j - l) * p)
      val beta = Array.fill(len + 1)(0.0); beta(len) = 1.0
      for (j <- (len - 1) to 0 by -1; l <- 1 to math.min(lmax, len - j))
        probs.get(w.substring(j, j + l)).foreach(p =>
          beta(j) += p * beta(j + l))
      val z = alpha(len)
      assert(z > 0, s"underflow/unreachable word in the fb replay: $w")
      val m = scala.collection.mutable.Map.empty[String, Double]
        .withDefaultValue(0.0)
      for (j <- 1 to len; l <- 1 to math.min(lmax, j))
        probs.get(w.substring(j - l, j)).foreach(p =>
          m(w.substring(j - l, j)) += n * alpha(j - l) * p * beta(j) / z)
      m.toMap
    }
    val full = wc.toSeq.flatMap { case (w, n) => expected(w, n).toSeq }
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
    // (a) hard support ⊆ full support, with positive mass everywhere
    val hardSupport = raw.keySet
    assert(hardSupport.forall(p => full.getOrElse(p, 0.0) > 0.0),
      "every Viterbi-counted piece must carry positive expected mass")
    // (b) the inclusion is STRICT with non-trivial mass — the
    // estimators genuinely diverge on this corpus
    val onlyFull = full.filter { case (p, m) =>
      !hardSupport.contains(p) && m >= 1.0 }
    assert(onlyFull.nonEmpty,
      "divergence must be non-vacuous: some piece with ≥1 expected " +
        "word-weighted occurrence rides only non-best paths")
    // (c) that divergent mass never leaves the seed support — the
    // Laplace floor in `smoothed` covers exactly these pieces, so
    // hard-EM loses resolution on them, never reachability
    assert(full.keySet.subsetOf(seed.keySet))
  }
}
