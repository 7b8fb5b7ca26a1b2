package graft.sources

import graft.{SharedSpark, TestTmp}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Gates on the columnar string path (RefColumnVector):
  *  - nulls survive the columnar path and numNulls() reports the real count
  *  - per-batch values are stable (the no-buffer-reuse contract on
  *    GraftFormat.records — a reused backing buffer would make every cell
  *    in a batch read as the last record's value)
  */
class ColumnarPathSpec extends AnyFunSuite with SharedSpark {

  test("RefColumnVector tracks the real null count and resets per batch") {
    val v = new RefColumnVector(StringType, 8)
    assert(v.numNulls() == 0 && !v.hasNull)
    v.put(0, UTF8String.fromString("a"))
    v.putNull(1)
    v.putNull(2)
    assert(v.numNulls() == 2 && v.hasNull)
    assert(!v.isNullAt(0) && v.isNullAt(1) && v.isNullAt(2))
    assert(v.getUTF8String(0).toString == "a")
    v.resetNulls()
    assert(v.numNulls() == 0 && !v.hasNull)
  }

  test("null description column flows through the columnar scan path") {
    val dir = TestTmp.dir("colnull")
    val fa = dir.resolve("mix.fasta")
    val txt = new StringBuilder
    // alternate records WITH and WITHOUT a description → nullable strings
    (0 until 50).foreach { i =>
      if (i % 2 == 0) txt.append(s">id$i desc$i\nACGT\n")
      else txt.append(s">id$i\nTTAA\n")
    }
    java.nio.file.Files.write(fa, txt.toString.getBytes)
    val df = spark.read.format("fasta").load(fa.toString)
      .select("id", "description")
    assert(df.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      df.queryExecution.executedPlan.toString)
    val rows = df.collect().sortBy(_.getString(0))
    assert(rows.length == 50)
    rows.foreach { r =>
      val i = r.getString(0).stripPrefix("id").toInt
      if (i % 2 == 0) assert(r.getString(1) == s"desc$i", r)
      else assert(r.isNullAt(1), r)
    }
  }

  test("string values are batch-stable across string-bearing formats (no buffer reuse)") {
    val dir = TestTmp.dir("colstable")
    // FASTA: 300 records with distinct sequences in one columnar batch
    val fa = dir.resolve("many.fasta")
    val fasta = (0 until 300).map(i => s">r$i\n${"ACGT" * (1 + i % 7)}CC${i}\n").mkString
    java.nio.file.Files.write(fa, fasta.getBytes)
    val seqs = spark.read.format("fasta").load(fa.toString)
      .select("id", "sequence").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(seqs.size == 300)
    (0 until 300).foreach { i =>
      assert(seqs(s"r$i") == s"${"ACGT" * (1 + i % 7)}CC${i}", s"r$i")
    }

    // FASTQ: distinct sequence + quality per record
    val fq = dir.resolve("many.fastq")
    val fastq = (0 until 200).map { i =>
      val s = "ACGT" * (1 + i % 5)
      s"@q$i\n$s\n+\n${"I" * s.length}"
    }.mkString("", "\n", "\n")
    java.nio.file.Files.write(fq, fastq.getBytes)
    val qs = spark.read.format("fastq").load(fq.toString)
      .select("name", "sequence").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(qs.size == 200)
    (0 until 200).foreach { i => assert(qs(s"q$i") == "ACGT" * (1 + i % 5)) }

    // GFF: distinct seqname per line through its string projection
    val gf = dir.resolve("many.gff")
    val gff = (0 until 200).map(i =>
      s"chr$i\tsrc\tgene\t${i + 1}\t${i + 100}\t.\t+\t.\tID=g$i").mkString("\n")
    java.nio.file.Files.write(gf, gff.getBytes)
    val gnames = spark.read.format("gff").load(gf.toString)
      .select("seqname").collect().map(_.getString(0)).toSet
    assert(gnames == (0 until 200).map(i => s"chr$i").toSet)

    // VCF: chrom/ref string projection through the byte-span parser
    val vf = dir.resolve("many.vcf")
    val vcf = "##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n" +
      (0 until 200).map(i =>
        s"c$i\t${i + 1}\t.\tA${i % 7}\tG\t50\tPASS\tAC=$i").mkString("\n")
    java.nio.file.Files.write(vf, vcf.getBytes)
    val vrows = spark.read.format("vcf").load(vf.toString)
      .select("chrom", "ref", "info").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(vrows.size == 200)
    (0 until 200).foreach { i =>
      assert(vrows(s"c$i") == (s"A${i % 7}", s"AC=$i"), s"c$i")
    }

    // SAM: name/cigar string projection through the byte-span parser
    val sf = dir.resolve("many.sam")
    val sam = "@HD\tVN:1.6\n" + (0 until 200).map(i =>
      s"r$i\t0\tc${i % 5}\t${i + 1}\t60\t${4 + i % 9}M\t*\t0\t0\tACGT\tIIII").mkString("\n")
    java.nio.file.Files.write(sf, sam.getBytes)
    val srows = spark.read.format("sam").load(sf.toString)
      .select("name", "cigar").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(srows.size == 200)
    (0 until 200).foreach { i => assert(srows(s"r$i") == s"${4 + i % 9}M", s"r$i") }

    // GTF: seqname/type through the byte-span parser
    val tf = dir.resolve("many.gtf")
    val gtf = (0 until 200).map(i =>
      s"""g$i\tsrc\tkind$i\t${i + 1}\t${i + 50}\t.\t+\t.\tgene_id "x$i";""").mkString("\n")
    java.nio.file.Files.write(tf, gtf.getBytes)
    val trows = spark.read.format("gtf").load(tf.toString)
      .select("seqname", "type").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(trows.size == 200)
    (0 until 200).foreach { i => assert(trows(s"g$i") == s"kind$i", s"g$i") }

    // BED: name column (nullable string) through the byte-span parser
    val bf = dir.resolve("many.bed")
    val bed = (0 until 200).map(i =>
      s"b${i % 7}\t${i * 10}\t${i * 10 + 5}\t${if (i % 3 == 0) "." else s"feat$i"}")
      .mkString("\n")
    java.nio.file.Files.write(bf, bed.getBytes)
    val brows = spark.read.format("bed").load(bf.toString)
      .select("start", "name").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(brows.size == 200)
    (0 until 200).foreach { i =>
      assert(brows(i * 10L) == (if (i % 3 == 0) null else s"feat$i"), s"bed $i")
    }

    // HMMDOMTAB: target/query names through the whitespace-run byte parser
    val hf = dir.resolve("many.domtblout")
    val hmm = (0 until 100).map(i =>
      s"t$i acc$i 100 q$i . 200 1e-5 12.5 0.1 1 2 1e-4 1e-3 11.0 0.2 " +
        s"1 50 ${i + 1} ${i + 60} 1 70 0.9 desc $i").mkString("\n")
    java.nio.file.Files.write(hf, hmm.getBytes)
    val hrows = spark.read.format("hmmdomtab").load(hf.toString)
      .select("target_name", "query_name", "ali_from").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(hrows.size == 100)
    (0 until 100).foreach { i =>
      assert(hrows(s"t$i") == ((s"q$i", (i + 1).toLong)), s"hmm $i")
    }
  }
}
