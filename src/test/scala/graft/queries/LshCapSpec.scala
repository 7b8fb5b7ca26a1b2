package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** MinHash-LSH hot-bucket cap: a degenerate all-duplicates corpus must not
  * produce O(n^2) candidate pairs on one task — oversized buckets are
  * dropped (and counted) before the pair join.
  */
class LshCapSpec extends AnyFunSuite with SharedSpark {

  private def corpus(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("degenerate corpus: all buckets over the cap are dropped, not exploded") {
    // 3000 identical documents: every band maps all docs to one bucket.
    val docs = corpus((0L until 3000L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog again and again")))
    val pairs = LlmQueries.minhashCandidatePairs(docs, maxBucket = 100)
    // 16 bands x one degenerate bucket each, all over the cap -> no pairs
    // (identical docs are still caught by exact dedup / other corpora bands).
    assert(pairs.count() == 0, "capped run must drop the degenerate buckets")
  }

  test("simhash: degenerate corpus buckets over the cap are dropped, not exploded") {
    // 3000 identical docs: every block-pair key collides for all docs.
    val docs = corpus((0L until 3000L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog again and again")))
    val pairs = LlmQueries.simhashCandidatePairs(docs, maxBucket = 100)
    assert(pairs.count() == 0, "capped run must drop the degenerate buckets")
  }

  test("image LSH: buckets over the cap are dropped, not exploded") {
    val d = "/root/testdata/sf0.001"
    // cap of 1 drops EVERY multi-doc bucket (the within-group bands are
    // k=2..4 at this scale) -> zero candidates survive
    assert(LlmQueries.imagePairs(spark, d, maxBucket = 1, failOnDrop = false)
      .count() == 0, "capped run must drop the degenerate buckets")
    // default cap doesn't bind: the full truth (125 groups x C(4,2)) comes back
    assert(LlmQueries.imagePairs(spark, d).count() == 750)
  }

  test("minhash/simhash graded mode also fails loudly when the cap binds") {
    val docs = corpus((0L until 300L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog again and again")))
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    val e1 = intercept[Exception] {
      LlmQueries.minhashCandidatePairs(docs, maxBucket = 100,
        failOnDrop = true).count()
    }
    assert(messages(e1).exists(_.contains("LSH bucket over the 100 cap")), e1.toString)
    val e2 = intercept[Exception] {
      LlmQueries.simhashCandidatePairs(docs, maxBucket = 100,
        failOnDrop = true).count()
    }
    assert(messages(e2).exists(_.contains("LSH bucket over the 100 cap")), e2.toString)
  }

  test("graded runs fail LOUDLY when the LSH bucket cap binds (oracle models no cap)") {
    val d = "/root/testdata/sf0.001"
    // failOnDrop (the graded default) must raise through assert_true
    // instead of silently dropping the bucket and diverging from the oracle
    val ex = intercept[Exception] {
      LlmQueries.imagePairs(spark, d, maxBucket = 1).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("LSH bucket over the 1 cap")),
      s"expected the cap assertion, got: $ex")
  }

  test("audio LSH: same cap discipline, same full truth at sf0.001") {
    val d = "/root/testdata/sf0.001"
    assert(LlmQueries.audioPairs(spark, d, maxBucket = 1, failOnDrop = false)
      .count() == 0, "capped run must drop the degenerate buckets")
    // groups of 4 with within-group hamming <= 4: the full 125 x C(4,2)
    // truth minus any cross-group collisions is what the oracle grades;
    // here we only pin the structural floor (at least every within-group pair)
    assert(LlmQueries.audioPairs(spark, d).count() >= 750)
  }

  test("spark.graft.codec.parallelism feeds the codec-stage repartition") {
    val d = "/root/testdata/sf0.001"
    spark.conf.set("spark.graft.codec.parallelism", "7")
    try {
      val plan = LlmQueries.queries("l10_image_decode")(spark, d)
        .queryExecution.executedPlan.toString
      assert(plan.contains("RoundRobinPartitioning(7)"), plan)
    } finally spark.conf.unset("spark.graft.codec.parallelism")
    // default: executor core count
    val plan2 = LlmQueries.queries("l10_image_decode")(spark, d)
      .queryExecution.executedPlan.toString
    assert(plan2.contains(
      s"RoundRobinPartitioning(${spark.sparkContext.defaultParallelism})"), plan2)
  }

  test("simhash: block-pair banding has total recall at hamming <= 6") {
    // Synthetic corpus around one base fingerprint: flip k in-block-spread
    // bits for k = 0..8. Pairs at hamming <= 6 MUST all surface as
    // candidates (pigeonhole over 8 blocks / 2-block keys); pairs beyond
    // the threshold may or may not — the exact filter decides.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    // Deterministic word edits: replacing a word flips a handful of
    // simhash bits; measure true hamming directly and cross-check banding.
    val variants = (0 until 40).map { i =>
      (i.toLong, if (i == 0) base else base.split(" ").updated(i % 20, s"w$i").mkString(" "))
    }
    val sh = variants.map { case (id, t) => id -> graft.functions.TextOps.simhash64(t) }.toMap
    val expected = (for {
      a <- variants.map(_._1); b <- variants.map(_._1) if a < b
      if graft.functions.TextOps.hamming64(sh(a), sh(b)) <= 6
    } yield (a, b)).toSet
    assert(expected.nonEmpty, "fixture must contain near pairs")
    val got = LlmQueries.simhashCandidatePairs(corpus(variants))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.subsetOf(got),
      s"banding missed near pairs: ${(expected -- got).take(5)}")
  }

  test("simhash: block-pair keys cut candidate density vs single-chunk banding") {
    // Random fingerprints: expected random-collision candidates are
    // 28/2^16 per pair for block-pair keys vs 7/2^9 for 9-bit chunks.
    // With n=2000 (~2M pairs), expect ~850 vs ~27300 — assert the
    // measured candidate count is far below the single-chunk expectation.
    val rnd = new java.util.Random(11)
    val n = 2000
    val fps = Array.fill(n)(rnd.nextLong())
    val byKey = scala.collection.mutable.Map.empty[(Int, Int), Int]
    var cands = 0L
    fps.foreach { f =>
      graft.functions.TextOps.simhashBlockKeys(f).iterator.zipWithIndex.foreach {
        case (k, c) =>
          val sz = byKey.getOrElse((c, k), 0)
          cands += sz // pairs added by this doc joining the bucket
          byKey((c, k)) = sz + 1
      }
    }
    val singleChunkExpect = 7.0 * n * (n - 1) / 2 / 512
    assert(cands < singleChunkExpect / 8,
      s"block-pair candidates $cands not far below single-chunk ~$singleChunkExpect")
  }

  test("delta-frontier propagation: broadcast and shuffle frontier paths match union-find") {
    import spark.implicits._
    // Random component mix PLUS a chain tail: the chain keeps exactly one
    // label changing per round, so late rounds run with a 1-row frontier —
    // the semi-naive shape the optimization exists for.
    val rnd = new scala.util.Random(43)
    val edges = (Seq.fill(150)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b } ++
      (200L until 212L).map(i => (i, i + 1))).distinct
    val pairs = edges.toDF("ida", "idb")
    // union-find oracle (min node id per component)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
    val comps = nodes.groupBy(find)
    val expect = nodes.map(n => n -> comps(find(n)).min).toMap
    val gotBcast = LlmQueries.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(gotBcast == expect)
    // force the shuffle-join arm for every round (frontier never small
    // enough to broadcast): results must be identical
    spark.conf.set("spark.graft.cc.broadcastFrontierRows", "0")
    try {
      val gotShuffle = LlmQueries.connectedComponents(pairs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(gotShuffle == expect)
    } finally spark.conf.unset("spark.graft.cc.broadcastFrontierRows")
  }

  test("connected components: transitivity across chained pairs, disjoint clusters") {
    import spark.implicits._
    // A~B~C chained (A!~C directly), D~E separate, F isolated (no pair).
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("ida", "idb")
    val got = LlmQueries.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connected components: long chain needs diameter rounds, converges") {
    import spark.implicits._
    val chain = (0L until 20L).map(i => (i, i + 1)).toDF("ida", "idb")
    val got = LlmQueries.connectedComponents(chain)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 21 && got.forall(_._2 == 0L))
  }

  test("connected components: reliable-checkpoint mode matches, writes file-backed cuts") {
    import spark.implicits._
    val ckpt = graft.TestTmp.dir("graft_cc_ckpt").toString
    // Diameter ~ maxRounds: a 24-edge chain under the default 25-round cap
    // exercises the convergence bound in the mode a 100 TB run would use.
    val chain = (0L until 24L).map(i => (i, i + 1)).toDF("ida", "idb")
    val got = LlmQueries.connectedComponents(chain, checkpointDir = Some(ckpt))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 25 && got.forall(_._2 == 0L))
    // the reliable cut is a parquet round-trip (one job, no RDD-checkpoint
    // write-pass recompute): the invariant is FILE-BACKED per-round cuts
    // under the given dir, not the RDD-checkpoint mechanism
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
      .filter(p => p.getFileName.toString.startsWith("cut_")).count()
    assert(wrote > 0, "reliable mode did not write any file-backed cuts")
  }

  test("star contraction matches min-label propagation on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // 100 nodes, 120 random edges: mix of big components, pairs, chains
    val pairs = Seq.fill(120)((rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
      .filter { case (a, b) => a != b }
      .toDF("ida", "idb")
    val prop = LlmQueries.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val star = LlmQueries.connectedComponentsStar(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(star == prop)
  }

  test("star contraction converges in O(log^2) rounds where propagation cannot") {
    import spark.implicits._
    // diameter-120 chain: propagation would need 120 rounds (its default
    // cap is 25); star contraction collapses it within 20
    val chain = (0L until 120L).map(i => (i, i + 1)).toDF("ida", "idb")
    val got = LlmQueries.connectedComponentsStar(chain)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 121 && got.forall(_._2 == 0L))
    assertThrows[IllegalArgumentException](
      LlmQueries.connectedComponents(chain).collect())
  }

  test("star contraction: two components, singleton edge, reliable checkpoints") {
    import spark.implicits._
    val ckpt = graft.TestTmp.dir("graft_ccstar_ckpt").toString
    val pairs = Seq((5L, 9L), (9L, 2L), (30L, 40L)).toDF("ida", "idb")
    val got = LlmQueries.connectedComponentsStar(pairs, checkpointDir = Some(ckpt))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(5L -> 2L, 9L -> 2L, 2L -> 2L, 30L -> 30L, 40L -> 30L))
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
      .filter(p => p.getFileName.toString.startsWith("cut_")).count()
    assert(wrote > 0, "reliable mode did not write any file-backed cuts")
  }

  test("simhash banding finds every real hamming<=6 pair on sf0.01 documents") {
    // brute-force ground truth on the actual corpus (500 docs — fine to
    // fold on the driver in a test), vs the l05 banded candidate path
    val d01 = "/root/testdata/sf0.01"
    val fps = Tables.documents(spark, d01)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), graft.functions.TextOps.simhash64(r.getString(1))))
    val exact = (for {
      i <- fps.indices.iterator
      j <- (i + 1) until fps.length
      if java.lang.Long.bitCount(fps(i)._2 ^ fps(j)._2) <= 6
    } yield {
      val (a, b) = (fps(i)._1, fps(j)._1)
      (math.min(a, b), math.max(a, b))
    }).toSet
    val banded = LlmQueries.queries("l05_simhash_pairs")(spark, d01)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture has no near-dup pairs; test is vacuous")
    assert(banded == exact,
      s"banding missed ${(exact -- banded).size} / extra ${(banded -- exact).size}")
  }

  test("connected components: empty pairs input converges to an empty result") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("ida", "idb")
    assert(LlmQueries.connectedComponents(empty).count() == 0)
  }

  test("IVF ANN recall vs exact brute force (nprobe=4 of 16 cells)") {
    val d = "/root/testdata/sf0.001"
    def pairs(name: String): Set[(Long, Long)] =
      LlmQueries.queries(name)(spark, d)
        .select("qid", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs("l06_ann_bruteforce")
    val ivf = pairs("l15_ann_ivf")
    assert(exact.nonEmpty)
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    // probing 4 of 16 coarse cells: structural floor for this corpus —
    // drops below mean the assignment or probe-ranking regressed
    assert(recall >= 0.6, s"IVF recall@5 degraded: $recall (${ivf.size} of ${exact.size})")
  }

  test("cap does not change results when no bucket is hot") {
    val docs = corpus(Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "one two three four five six seven eight nine ten"),
      (4L, "one two three four five six seven eight nine ten eleven"),
      (5L, "completely different words with no overlap whatsoever here now")))
    val capped = LlmQueries.minhashCandidatePairs(docs, maxBucket = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = LlmQueries.minhashCandidatePairs(docs, maxBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == uncapped)
    assert(capped.contains((1L, 2L)), "identical docs must be candidates")
  }
}
