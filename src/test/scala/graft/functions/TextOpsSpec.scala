package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class TextOpsSpec extends AnyFunSuite {

  test("lang_id stopword vote with priority ties") {
    assert(TextOps.langId("the cat sat on a mat") == "en")
    assert(TextOps.langId("der hund ist nicht da") == "de")
    assert(TextOps.langId("xyzzy plugh") == "und")
    // 'es' contains 'es'/'y'; english priority on equal hits
    assert(TextOps.langId("the y") == "en")
  }

  test("quality and stopword ratio are deterministic and bounded") {
    val t = "the quick brown fox jumps over a lazy dog in the yard"
    assert(TextOps.stopwordRatio(t) == TextOps.stopwordRatio(t))
    assert(TextOps.qualityScore(t) > 0.0 && TextOps.qualityScore(t) <= 1.0)
    assert(TextOps.stopwordRatio("") == 0.0)
  }

  test("simhash: identical texts collide, similar texts are close") {
    val a = "spark batch window agg join table row column value"
    val b = "spark batch window agg join table row column values" // 1 word edit
    val c = "completely different words entirely unrelated content here"
    assert(TextOps.simhash64(a) == TextOps.simhash64(a))
    assert(TextOps.hamming64(TextOps.simhash64(a), TextOps.simhash64(b)) <
      TextOps.hamming64(TextOps.simhash64(a), TextOps.simhash64(c)))
  }

  test("minhash: equal sets equal signatures; similar sets share bands") {
    val s1 = (1 to 100).map(i => s"sh$i")
    val s2 = (1 to 98).map(i => s"sh$i") ++ Seq("x1", "x2") // j ~= 0.96
    val s3 = (200 to 300).map(i => s"sh$i")
    assert(TextOps.minhashSignature(s1).toSeq == TextOps.minhashSignature(s1).toSeq)
    val shared12 = TextOps.minhashBands(s1).zip(TextOps.minhashBands(s2)).count(p => p._1 == p._2)
    val shared13 = TextOps.minhashBands(s1).zip(TextOps.minhashBands(s3)).count(p => p._1 == p._2)
    assert(shared12 > 0, "high-jaccard pair must share at least one LSH band")
    assert(shared13 == 0)
  }

  test("winnowing fingerprint: stable, shift-tolerant hashing primitive") {
    val t = "the quick brown fox jumps over the lazy dog"
    assert(TextOps.winnowFingerprint(t) == TextOps.winnowFingerprint(t))
    assert(TextOps.winnowFingerprint(t) != TextOps.winnowFingerprint(t + " extra words here"))
  }

  test("cosine similarity") {
    assert(VectorOps.cosine(Seq(1f, 0f), Seq(1f, 0f)) == 1.0)
    assert(math.abs(VectorOps.cosine(Seq(1f, 0f), Seq(0f, 1f))) < 1e-12)
    assert(math.abs(VectorOps.cosine(Seq(1f, 0f), Seq(1f, 1f)) - 1 / math.sqrt(2)) < 1e-12)
    assert(VectorOps.cosine(Seq(0f, 0f), Seq(1f, 1f)) == 0.0)
  }

  test("lsh bucket: deterministic, scale-free, similar vectors collide") {
    val v = Seq.fill(64)(0.5f)
    assert(VectorOps.hyperplaneBucket(v) == VectorOps.hyperplaneBucket(v))
    assert(VectorOps.hyperplaneBucket(v) == VectorOps.hyperplaneBucket(v.map(_ * 3f)))
    assert(VectorOps.hyperplaneBucket(v) >= 0 && VectorOps.hyperplaneBucket(v) < 256)
  }
}
