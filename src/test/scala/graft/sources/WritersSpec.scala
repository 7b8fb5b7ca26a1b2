package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark
import org.apache.spark.sql.Row

/** Round-trip goldens per fasta-copy-tests.slt / fastq-copy-tests.slt. */
class WritersSpec extends AnyFunSuite with SharedSpark {
  private val fx = "/root/reference/exon/exon-core/test-data/datasources"

  test("fasta round trip, plain and gzip") {
    val dir = graft.TestTmp.dir("fasta_rt").toString
    val src = spark.read.format("fasta").load(s"$fx/fasta/test.fasta")
    src.write.format("fasta").mode("overwrite").save(s"$dir/plain")
    val back = spark.read.format("fasta").load(s"$dir/plain").orderBy("id")
    assert(back.collect().toSeq == Seq(
      Row("a", "description", "ATCG"), Row("b", "description2", "ATCG")))

    src.write.format("fasta").mode("overwrite").option("compression", "gzip")
      .save(s"$dir/gz")
    val backGz = spark.read.format("fasta").load(s"$dir/gz").orderBy("id")
    assert(backGz.count() == 2)
    assert(backGz.head() == Row("a", "description", "ATCG"))
  }

  test("vcf bgzf sink: per-part .tbi siblings; the sink's own output prunes by region") {
    import org.apache.spark.sql.functions._
    val dir = graft.TestTmp.dir("vcf_sink").toString + "/t"
    val n = 30000L // ~780 KB uncompressed per part: a dozen BGZF blocks
    val df = spark.range(0, 3 * n)
      .select(
        concat(lit("chr"), (col("id") / n).cast("long").cast("string")).as("chrom"),
        ((col("id") % n) * 200 + 1).as("pos"),
        lit(null).cast("array<string>").as("id"),
        lit("A").as("ref"),
        array(lit("T")).as("alt"),
        lit(30f).as("qual"),
        lit(null).cast("array<string>").as("filter"),
        lit("DP=1").as("info"),
        lit(null).cast("string").as("formats"))
      .repartitionByRange(3, col("chrom"), col("pos"))
      .sortWithinPartitions("chrom", "pos")
    df.write.format("vcf").mode("overwrite").option("compression", "bgzf").save(dir)

    // every data part has a sibling .tbi
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith("_"))
    val parts = files.filter(_.endsWith(".vcf.gz"))
    assert(parts.nonEmpty, files.toSeq)
    parts.foreach(p => assert(files.contains(p + ".tbi"), s"no .tbi for $p"))

    // full fidelity
    val back = spark.read.format("vcf").load(dir)
    assert(back.count() == 3 * n)
    assert(back.filter(col("chrom") === "chr1").agg(sum(col("pos"))).head.getLong(0) ==
      (0L until n).map(_ * 200 + 1).sum)

    // region read agrees with a row filter AND seeks: the written .tbi
    // must point mid-file (compressed offset > 0), not replay from byte 0
    val got = spark.read.format("vcf").option("region", "chr1:1000001-1400000")
      .load(dir).count()
    val exp = back.filter(col("chrom") === "chr1" &&
      col("pos").between(1000001L, 1400000L)).count()
    assert(got == exp && got > 0, s"region=$got filter=$exp")
    val conf = new org.apache.hadoop.conf.Configuration()
    val chr1Chunks = parts.toSeq.flatMap { p =>
      val idx = TabixIndex.read(
        new org.apache.hadoop.fs.Path(s"$dir/$p.tbi"), conf)
      idx.query("chr1", 1000000L, 1400000L)
    }
    assert(chr1Chunks.nonEmpty)
    assert(chr1Chunks.exists { case (s, _) => (s >> 16) > 0 },
      s"region mid-chromosome must seek past compressed offset 0: $chr1Chunks")

    // unsorted input is refused loudly (a silent bad index is worse)
    val e = intercept[org.apache.spark.SparkException] {
      df.orderBy(col("pos").desc)
        .write.format("vcf").mode("overwrite").option("compression", "bgzf")
        .save(graft.TestTmp.dir("vcf_sink_bad").toString + "/t")
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => String.valueOf(t.getMessage)).mkString(" | ")
    assert(msgs.contains("sorted by (chrom, pos)"), msgs)
  }

  test("gff bgzf sink: full row fidelity through write+read, incl. attribute maps") {
    import org.apache.spark.sql.functions._
    val dir = graft.TestTmp.dir("gff_sink").toString + "/t"
    val src = spark.read.format("gff").load(s"$fx/gff/test.gff")
    src.repartitionByRange(1, col("seqname"), col("start"))
      .sortWithinPartitions("seqname", "start")
      .write.format("gff").mode("overwrite").option("compression", "bgzf").save(dir)
    val back = spark.read.format("gff").load(dir)
    val key = Seq("seqname", "start", "end", "type")
    assert(back.orderBy(key.head, key.tail: _*).collect().toSeq ==
      src.orderBy(key.head, key.tail: _*).collect().toSeq)
    // sibling index present and GFF-preset
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith("_"))
    val part = files.find(_.endsWith(".gff.gz")).get
    assert(files.contains(part + ".tbi"), files.toSeq)
  }

  test("gff sink percent-encodes reserved attribute characters (dirty round trip)") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val dir = graft.TestTmp.dir("gff_dirty").toString + "/t"
    // values containing every reserved char: ';' '=' ',' '%' tab newline
    val dirty = Seq(
      ("chr1", 10L, 20L, "note", "a;b=c,d%e"),
      ("chr1", 30L, 40L, "desc", "tab\there\nand newline")
    ).toDF("seqname", "start", "end", "key", "value")
      .select(col("seqname"), lit("src").as("source"), lit("gene").as("type"),
        col("start"), col("end"), lit(null).cast("float").as("score"),
        lit("+").as("strand"), lit(null).cast("string").as("phase"),
        map(col("key"), array(col("value"))).as("attributes"))
    dirty.repartitionByRange(1, col("seqname"), col("start"))
      .sortWithinPartitions("seqname", "start")
      .write.format("gff").mode("overwrite").save(dir)
    val back = spark.read.format("gff").load(dir).orderBy("start")
      .select(col("start"), map_keys(col("attributes"))(0).as("k"),
        map_values(col("attributes"))(0)(0).as("v"))
      .collect()
    assert(back(0).getString(1) == "note" && back(0).getString(2) == "a;b=c,d%e",
      back.toSeq.toString)
    assert(back(1).getString(2) == "tab\there\nand newline", back.toSeq.toString)
    // on disk the reserved chars are encoded — no raw tab/newline/semicolon
    // inside column 9 values, so framing and any .tbi offsets stay valid
    val raw = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".gff"))
      .map(f => new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
      .mkString
    assert(raw.contains("a%3Bb%3Dc%2Cd%25e"), raw)
    assert(raw.contains("tab%09here%0Aand newline"), raw)
  }

  test("sam sink: schema-faithful round trip incl. re-inferred tag types") {
    import org.apache.spark.sql.functions._
    val dir = graft.TestTmp.dir("sam_sink").toString
    val src = spark.read.format("sam").load(s"$fx/sam/test.sam")
    src.write.format("sam").mode("overwrite").save(s"$dir/plain")
    val back = spark.read.format("sam").load(s"$dir/plain")
    val key = Seq("name", "flag")
    assert(back.orderBy(key.head, key.tail: _*).collect().toSeq ==
      src.orderBy(key.head, key.tail: _*).collect().toSeq)

    // bgzf sink on mapped, coordinate-sorted records: .tbi sibling + its own
    // region read-back
    val mapped = src.filter(col("reference").isNotNull)
      .repartitionByRange(1, col("reference"), col("start"))
      .sortWithinPartitions("reference", "start")
    mapped.write.format("sam").mode("overwrite")
      .option("compression", "bgzf").save(s"$dir/bgzf")
    val files = new java.io.File(s"$dir/bgzf").listFiles().map(_.getName)
      .filterNot(_.startsWith("_"))
    val part = files.find(_.endsWith(".sam.gz")).get
    assert(files.contains(part + ".tbi"), files.toSeq)
    val full = spark.read.format("sam").load(s"$dir/bgzf")
    assert(full.count() == mapped.count())
    val r1 = spark.read.format("sam").option("region", "ref1")
      .load(s"$dir/bgzf").count()
    assert(r1 == src.filter(col("reference") === "ref1").count(), r1)

    // unmapped records under bgzf must refuse loudly, not mis-index
    val unmapped = src.limit(1)
      .withColumn("reference", lit(null).cast("string"))
      .withColumn("start", lit(null).cast("long"))
      .withColumn("end", lit(null).cast("long"))
    val err = intercept[org.apache.spark.SparkException] {
      mapped.unionByName(unmapped).coalesce(1)
        .sortWithinPartitions(col("reference").asc_nulls_last, col("start"))
        .write.format("sam").mode("overwrite")
        .option("compression", "bgzf").save(s"$dir/bad")
    }
    assert(err.getMessage != null)
  }

  test("bed sink: prefix-truncated round trip; bgzf + .tbi region read-back") {
    import org.apache.spark.sql.functions._
    val dir = graft.TestTmp.dir("bed_sink").toString
    val src = spark.read.format("bed").load(s"$fx/bed/test.bed")
    src.write.format("bed").mode("overwrite").save(s"$dir/plain")
    val back = spark.read.format("bed").load(s"$dir/plain")
    val key = Seq("reference_sequence_name", "start", "end")
    assert(back.orderBy(key.head, key.tail: _*).collect().toSeq ==
      src.orderBy(key.head, key.tail: _*).collect().toSeq)
    // prefix truncation: test.bed is 6-column, the sink must not emit
    // 6 trailing dots
    val raw = new java.io.File(s"$dir/plain").listFiles()
      .filter(_.getName.endsWith(".bed")).map(f => new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")).mkString
    assert(raw.linesIterator.next().count(_ == '\t') == 5, raw.take(200))

    val sorted = src.repartitionByRange(1, col("reference_sequence_name"),
        col("start"))
      .sortWithinPartitions("reference_sequence_name", "start")
    sorted.write.format("bed").mode("overwrite")
      .option("compression", "bgzf").save(s"$dir/bgzf")
    val files = new java.io.File(s"$dir/bgzf").listFiles().map(_.getName)
      .filterNot(_.startsWith("_"))
    val part = files.find(_.endsWith(".bed.gz")).get
    assert(files.contains(part + ".tbi"), files.toSeq)
    val hit = spark.read.format("bed").option("region", "chr1:11874-12300")
      .load(s"$dir/bgzf")
    assert(hit.count() ==
      src.filter(col("reference_sequence_name") === "chr1" &&
        col("start") < 12300 && col("end") > 11873).count(), hit.count())
  }

  test("gtf sink: attribute round trip; bgzf + .tbi region read-back") {
    import org.apache.spark.sql.functions._
    val dir = graft.TestTmp.dir("gtf_sink").toString
    val src = spark.read.format("gtf").load(s"$fx/gtf/test.gtf")
    src.write.format("gtf").mode("overwrite").save(s"$dir/plain")
    val back = spark.read.format("gtf").load(s"$dir/plain")
    val key = Seq("seqname", "start", "end", "type")
    assert(back.orderBy(key.head, key.tail: _*).collect().toSeq ==
      src.orderBy(key.head, key.tail: _*).collect().toSeq)

    src.repartitionByRange(1, col("seqname"), col("start"))
      .sortWithinPartitions("seqname", "start")
      .write.format("gtf").mode("overwrite")
      .option("compression", "bgzf").save(s"$dir/bgzf")
    val files = new java.io.File(s"$dir/bgzf").listFiles().map(_.getName)
      .filterNot(_.startsWith("_"))
    val part = files.find(_.endsWith(".gtf.gz")).get
    assert(files.contains(part + ".tbi"), files.toSeq)
    val hit = spark.read.format("gtf").option("region", "chr1:12000-12999")
      .load(s"$dir/bgzf").count()
    assert(hit == src.filter(col("seqname") === "chr1" &&
      col("start") <= 12999 && col("end") >= 12000).count(), hit)
  }

  test("fasta sink commits .fai siblings; region reads seek the sink's own output") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val dir = graft.TestTmp.dir("fasta_fai_sink").toString + "/t"
    val src = Seq(
      ("s1", "first", "ACGTACGTAC"),
      ("s2", null, "TTTTGGGGCCCCAAAA"),
      ("s3", "third", "GATTACA")
    ).toDF("id", "description", "sequence")
    src.coalesce(1).write.format("fasta").mode("overwrite").save(dir)
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith("_"))
    val part = files.find(_.endsWith(".fasta")).get
    assert(files.contains(part + ".fai"), files.toSeq)
    // offsets in the .fai must address the true sequence bytes
    val data = java.nio.file.Files.readAllBytes(
      new java.io.File(dir, part).toPath)
    val fai = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, part + ".fai").toPath), "UTF-8")
    fai.linesIterator.foreach { l =>
      val Array(name, len, off, _, _) = l.split('\t')
      val seq = new String(data, off.toInt, len.toInt, "UTF-8")
      val want = src.filter(col("id") === name).head().getString(2)
      assert(seq == want, s"$name: fai-addressed '$seq' != '$want'")
    }
    // region subsequence extraction through the sink's own .fai
    val sub = spark.read.format("fasta").option("region", "s2:5-8")
      .load(dir).head()
    assert(sub.getString(2) == "GGGG", sub.toString)
  }

  test("fastq round trip preserves quality strings") {
    val dir = graft.TestTmp.dir("fastq_rt").toString
    val src = spark.read.format("fastq").load(s"$fx/fastq/test.fastq")
    src.write.format("fastq").mode("overwrite").save(s"$dir/out")
    val back = spark.read.format("fastq").load(s"$dir/out").orderBy("name")
    val orig = src.orderBy("name").collect().toSeq
    assert(back.collect().toSeq == orig)
    // null description round-trips as null
    assert(back.collect()(1).isNullAt(1))
  }

  test("write then append accumulates records") {
    val dir = graft.TestTmp.dir("fasta_app").toString + "/t"
    val src = spark.read.format("fasta").load(s"$fx/fasta/test.fasta")
    src.write.format("fasta").mode("overwrite").save(dir)
    src.write.format("fasta").mode("append").save(dir)
    assert(spark.read.format("fasta").load(dir).count() == 4)
  }

  test("SQL sink: CREATE TABLE USING fasta + INSERT INTO / INSERT OVERWRITE") {
    // the Spark shape of the reference's COPY ... STORED AS FASTA
    val dir = graft.TestTmp.dir("fasta_sql_sink").toString + "/t"
    spark.sql("DROP TABLE IF EXISTS fasta_sink")
    spark.sql(s"CREATE TABLE fasta_sink USING fasta LOCATION '$dir'")
    spark.sql(
      s"""INSERT INTO fasta_sink
         |SELECT id, description, sequence
         |FROM fasta_scan('$fx/fasta/test.fasta')""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM fasta_sink").head().getLong(0) == 2)
    spark.sql(
      "INSERT INTO fasta_sink VALUES ('c', 'third', 'GGGG')")
    assert(spark.sql("SELECT count(*) FROM fasta_sink").head().getLong(0) == 3)
    // overwrite truncates via the TRUNCATE capability
    spark.sql(
      "INSERT OVERWRITE fasta_sink VALUES ('z', NULL, 'TTTT')")
    val rows = spark.sql("SELECT * FROM fasta_sink").collect()
    assert(rows.length == 1 && rows(0).getString(0) == "z" && rows(0).isNullAt(1))
    spark.sql("DROP TABLE fasta_sink")
  }

  test("SQL copy-to-parquet: CTAS from a FASTA scan (parquet-copy-test.slt)") {
    // reference: COPY fasta_table TO '...' STORED AS PARQUET, then read it
    // back (exon-core/tests/sqllogictests/slt/parquet-copy-test.slt)
    val dir = graft.TestTmp.dir("fasta_parquet_copy").toString + "/t"
    spark.sql("DROP TABLE IF EXISTS fasta_parquet_copy")
    spark.sql(
      s"""CREATE TABLE fasta_parquet_copy USING parquet LOCATION '$dir'
         |AS SELECT * FROM fasta_scan('$fx/fasta/test.fasta')""".stripMargin)
    val rows = spark.sql(
      "SELECT id, description, sequence FROM fasta_parquet_copy ORDER BY id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq(("a", "description", "ATCG"),
      ("b", "description2", "ATCG")))
    spark.sql("DROP TABLE fasta_parquet_copy")
  }
}
