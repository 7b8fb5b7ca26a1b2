package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SharedSpark

/** Pins for the l76/l77/l78 additions.
  *
  * l76's DuckDB oracle is the PLAIN exact join (the Bloom prefilter is a
  * superset filter + exact confirm, so the output is Bloom-independent);
  * what the oracle cannot see is the prefilter itself — these tests pin
  * the superset property (no false negatives: every truly-shared
  * (doc, sh) pair survives) and measure the false-positive rate against
  * the 2^20-bit / k=3 design point. l77/l78 get independent in-memory
  * recomputations of the full arithmetic.
  */
class BloomDecontSpec extends AnyFunSuite with SharedSpark {

  private val d = "/root/testdata/sf0.001"

  private def posts = {
    val s = spark
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        graft.functions.TextOps.wordShingles(t, 3).iterator.map(sh => (id, sh))
      }.toDF("doc_id", "sh")
  }

  test("l76 bloom prefilter: superset of true matches (no false negatives)") {
    val evalSh = posts.filter(col("doc_id") % 97 === 0).select(col("sh")).distinct()
    val corpus = posts.filter(col("doc_id") % 97 =!= 0).distinct()
    val cand = LlmQueries.bloomPrefilter(corpus, evalSh, 1L << 20)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val truth = corpus.join(evalSh, Seq("sh"))
      .select(col("doc_id"), col("sh"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(truth.subsetOf(cand),
      s"bloom dropped ${(truth -- cand).take(5)} — false negatives are impossible by construction")
    // FP accounting: with n eval shingles in m=2^20 bits, k=3, the
    // expected FP rate is (1 - e^{-3n/m})^3 — tiny at this SF. Allow a
    // generous margin; the point is the prefilter prunes almost everything
    // that the exact confirm would reject.
    val corpusN = corpus.count()
    val fp = cand.size - truth.size
    assert(fp <= math.max(10L, corpusN / 100),
      s"false positives $fp out of $corpusN corpus pairs — bloom not pruning")
  }

  test("l76 output is bloom-independent: equals the plain exact join") {
    val got = LlmQueries.queries("l76_bloom_decontamination")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val evalSh = posts.filter(col("doc_id") % 97 === 0).select(col("sh")).distinct()
    val want = posts.filter(col("doc_id") % 97 =!= 0).distinct()
      .join(evalSh, Seq("sh"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
    assert(got.nonEmpty, "no contaminated docs at sf0.001 — test has no signal")
  }

  test("l76 bloom sizing: >= 16 bits per eval shingle, power of two, 2^20 floor") {
    assert(LlmQueries.bloomBits(0) == (1L << 20))
    assert(LlmQueries.bloomBits(65536) == (1L << 20)) // 16*65536 = 2^20 exactly
    assert(LlmQueries.bloomBits(65537) == (1L << 21))
    assert(LlmQueries.bloomBits(2500000L) == (1L << 26)) // the 5M-doc ratchet point
    for (n <- Seq(1L, 1000L, 123456L, 999999999L)) {
      val m = LlmQueries.bloomBits(n)
      assert(java.lang.Long.bitCount(m) == 1 && m >= 16 * n)
    }
  }

  test("l77 int8 quantized ANN matches an independent in-memory recomputation") {
    val emb = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val qv = emb.map { case (id, v) =>
      val dv = v.map(_.toDouble)
      val maxabs = dv.map(math.abs).max
      id -> (maxabs, dv.map(x =>
        BigDecimal(x * 127.0 / maxabs)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
    }.filter(_._2._1 > 0).map { case (id, (_, q)) => id -> q }.toMap
    val queries = qv.filter(_._1 < 4)
    val expected = queries.toSeq.flatMap { case (qid, qq) =>
      qv.toSeq.filter(_._1 != qid).map { case (vid, vv) =>
        val idot = qq.zip(vv).map { case (a, b) => a * b }.sum
        (qid, vid, idot)
      }.sortBy { case (_, vid, idot) => (-idot, vid) }.take(5)
    }.sortBy { case (qid, vid, idot) => (qid, -idot, vid) }
    val got = LlmQueries.queries("l77_int8_quant_ann")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // quantized values stay in int8 range by construction (scale = 127/max)
    assert(qv.values.forall(_.forall(q => q >= -127 && q <= 127)))
  }

  test("l79 k-means matches an independent in-memory Lloyd recomputation") {
    val emb = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    def rd(x: Double, s: Int): Double =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    var cents: Map[Long, Array[Double]] =
      emb.filter(_._1 < 8).map { case (id, v) => id -> v }.toMap
    def cellOf(v: Array[Double]): Long =
      cents.toSeq.map { case (cid, cv) =>
        (v.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
      }.minBy { case (dist, cid) => (dist, cid) }._2
    for (_ <- 0 until 3) {
      val byCell = emb.groupBy { case (_, v) => cellOf(v) }
      cents = cents.map { case (cid, old) =>
        cid -> byCell.get(cid).map { members =>
          val n = members.length
          Array.tabulate(old.length)(i =>
            rd(members.map(_._2(i)).sum / n, 6))
        }.getOrElse(old)
      }
    }
    val expected = emb.groupBy { case (_, v) => cellOf(v) }.toSeq
      .map { case (cid, members) =>
        val cv = cents(cid)
        (cid, members.length.toLong, rd(cv(0), 4),
          rd(math.sqrt(cv.map(x => x * x).sum), 4))
      }.sortBy(_._1)
    val got = LlmQueries.queries("l79_kmeans_train")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    assert(got == expected)
    // every centroid must actually move off its seed: training happened
    val seeds = emb.filter(_._1 < 8).map { case (id, v) => id -> v }.toMap
    assert(cents.exists { case (cid, cv) => !cv.sameElements(seeds(cid)) })
  }

  test("l78 recall eval: truth arm is exact; recall in [0, 1000]") {
    val rows = LlmQueries.queries("l78_ann_recall_eval")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == (0L until 8L).toSeq)
    assert(rows.forall { case (_, h, p) => h >= 0 && h <= 5 && p == h * 200 })
    // nprobe=1 on 16 cells should still find SOMETHING overall — an
    // all-zero recall means the probe or assignment arm is broken
    assert(rows.map(_._2).sum > 0, rows.mkString(", "))
  }
}
