package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SharedSpark

/** Regression: with nestedSchemaPruning (Spark default ON), extracting a
  * NON-FIRST field of a struct inside an array must stay ordinal-correct.
  * Spark hands pruneColumns a schema whose struct element types are
  * subsets (e.g. genbank features -> struct<qualifiers> with kind and
  * location dropped); the parsers emit full structs, so the scan must
  * re-widen kept top-level fields to their full types or generated code
  * reads `kind` (UTF8String) where the plan expects `qualifiers`
  * (ArrayData) — the exact CCE this spec reproduced before the fix.
  * Formats whose extracted field happened to sit at ordinal 0 (mzml's
  * single-field mz struct) worked by luck; these cases extract later
  * ordinals on two formats.
  */
class NestedPruningSpec extends AnyFunSuite with SharedSpark {
  private val fx = "/root/reference/exon/exon-core/test-data/datasources"

  test("genbank: qualifiers (ordinal 2 of the feature struct) via nested pruning") {
    val dir = graft.TestTmp.dir("nested_pruning_gb")
    val f = new java.io.File(dir.toFile, "r.gb")
    val w = new java.io.BufferedWriter(new java.io.FileWriter(f))
    (0 until 50).foreach { k =>
      w.write(f"LOCUS       SEQ$k%d             100 bp    DNA     linear   CON 24-APR-2019\n")
      w.write("FEATURES             Location/Qualifiers\n")
      w.write("     gene            1..100\n")
      w.write(s"""                     /locus_tag="LT$k"\n""")
      w.write("ORIGIN\n")
      w.write(f"${1}%9d ${"acgt" * 15}\n")
      w.write("//\n")
    }
    w.close()
    // selects sequence + name + features(0).qualifiers(0).values ONLY —
    // the shape that makes SchemaPruning drop kind/location
    val r = spark.read.format("genbank").load(f.getAbsolutePath)
      .agg(
        count(lit(1)),
        sum(length(col("sequence"))),
        sum(when(col("features")(0)("qualifiers")(0)("values")
          === concat(lit("LT"), regexp_extract(col("name"), "SEQ(\\d+)", 1)), 1L)
          .otherwise(0L))).head
    assert(r.getLong(0) == 50)
    assert(r.getLong(1) == 50 * 60)
    assert(r.getLong(2) == 50, "qualifier values misread under nested pruning")
  }

  private def multiset(xs: Seq[Any]): Map[Any, Int] =
    xs.groupBy(identity).map { case (k, v) => k -> v.size }

  private def withNestedPruning[T](body: => T): T = {
    val key = "spark.sql.optimizer.nestedSchemaPruning.enabled"
    val saved = spark.conf.getOption(key)
    try { spark.conf.set(key, "true"); body }
    finally saved.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("vcf typed: info subfield (non-first ordinal) via nested pruning") {
    withNestedPruning {
      val vcf = s"$fx/vcf/index.vcf"
      def rd = spark.read.format("vcf")
        .option("parseInfo", "true").option("parseFormats", "true").load(vcf)
      val infoT = rd.schema("info").dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      assert(infoT.fieldIndex("MQ0F") > 0, "MQ0F must be a later ordinal to pin the bug")
      // pruned plan: SchemaPruning hands the scan struct<MQ0F> only
      val pruned = rd.select(col("info.MQ0F").as("v")).collect()
        .map(r => if (r.isNullAt(0)) null else r.getFloat(0)).toSeq
      // full struct materialized, field extracted on the driver
      val full = rd.select(col("info")).collect().map { r =>
        if (r.isNullAt(0)) null
        else {
          val s = r.getStruct(0); val i = infoT.fieldIndex("MQ0F")
          if (s.isNullAt(i)) null else s.getFloat(i)
        }
      }.toSeq
      assert(pruned.nonEmpty && multiset(pruned) == multiset(full),
        "info.MQ0F misread under nested pruning")
    }
  }

  test("vcf typed: per-sample FORMAT subfield (array<struct>, non-first ordinal)") {
    withNestedPruning {
      val vcf = s"$fx/vcf/index.vcf"
      def rd = spark.read.format("vcf").option("parseFormats", "true").load(vcf)
      val fmtT = rd.schema("formats").dataType
        .asInstanceOf[org.apache.spark.sql.types.ArrayType]
        .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
      assert(fmtT.fieldIndex("PL") > 0, "PL must be a later ordinal to pin the bug")
      val pruned = rd.select(explode(col("formats")).as("f"))
        .select(col("f.PL")).collect()
        .map(r => if (r.isNullAt(0)) null else r.getSeq[Int](0)).toSeq
      val full = rd.select(col("formats")).collect().flatMap { r =>
        r.getSeq[org.apache.spark.sql.Row](0).map { s =>
          val i = fmtT.fieldIndex("PL")
          if (s.isNullAt(i)) null else s.getSeq[Int](i)
        }
      }.toSeq
      assert(pruned.nonEmpty && multiset(pruned) == multiset(full),
        "formats.PL misread under nested pruning")
    }
  }

  test("sam typed tags: single later-ordinal tag via nested pruning") {
    withNestedPruning {
      val sam = s"$fx/sam/test.sam"
      def rd = spark.read.format("sam").option("parseTags", "true").load(sam)
      val tagT = rd.schema("tags").dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      assert(tagT.fieldIndex("za") > 0, "za must be a later ordinal to pin the bug")
      val pruned = rd.select(col("tags.za").as("v")).collect()
        .map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
      val full = rd.select(col("tags")).collect().map { r =>
        if (r.isNullAt(0)) null
        else {
          val s = r.getStruct(0); val i = tagT.fieldIndex("za")
          if (s.isNullAt(i)) null else s.getString(i)
        }
      }.toSeq
      assert(pruned.contains("Hello world!") && multiset(pruned) == multiset(full),
        "tags.za misread under nested pruning")
    }
  }

  test("bam tags: value (ordinal 1 of the tag struct) via nested pruning") {
    withNestedPruning {
      val bam = s"$fx/bam/test.bam"
      def rd = spark.read.format("bam").load(bam)
      val pruned = rd.select(explode(col("tags")).as("t"))
        .select(col("t.value")).collect()
        .map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
      val full = rd.select(col("tags")).collect().flatMap {
        _.getSeq[org.apache.spark.sql.Row](0).map(s =>
          if (s.isNullAt(1)) null else s.getString(1))
      }.toSeq
      assert(pruned.nonEmpty && multiset(pruned) == multiset(full),
        "bam tag values misread under nested pruning (tag names in their slot?)")
      assert(!multiset(pruned).keySet.contains("PG"),
        "a tag NAME surfaced as a value — ordinal shift")
    }
  }

  test("cram tags: value (ordinal 1 of the tag struct) via nested pruning") {
    withNestedPruning {
      val cram = s"$fx/cram/test_input_1_a.cram"
      def rd = spark.read.format("cram").load(cram)
      val pruned = rd.select(explode(col("tags")).as("t"))
        .select(col("t.value")).collect()
        .map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
      val full = rd.select(col("tags")).collect().flatMap {
        _.getSeq[org.apache.spark.sql.Row](0).map(s =>
          if (s.isNullAt(1)) null else s.getString(1))
      }.toSeq
      // golden: the fixture's only tag is PG=bull — value must be "bull",
      // never the shifted tag name "PG"
      assert(pruned.contains("bull") && !pruned.contains("PG"))
      assert(multiset(pruned) == multiset(full),
        "cram tag values misread under nested pruning")
    }
  }

  test("sdf: data subfield (non-first ordinal) via nested pruning") {
    withNestedPruning {
      val sdf = s"$fx/sdf/tox_benchmark_N6512.sdf.gz"
      def rd = spark.read.format("sdf").load(sdf)
      val dataT = rd.schema("data").dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      assert(dataT.fields.length >= 2, "fixture data struct must have 2+ fields")
      val k = dataT.fields(1).name // a later ordinal by construction
      val pruned = rd.select(col("data")(k).as("v")).collect()
        .map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
      val full = rd.select(col("data")).collect().map { r =>
        if (r.isNullAt(0)) null
        else { val s = r.getStruct(0); if (s.isNullAt(1)) null else s.getString(1) }
      }.toSeq
      assert(pruned.nonEmpty && multiset(pruned) == multiset(full),
        s"data.$k misread under nested pruning")
    }
  }

  /** Structural pin for the whole bug class: whatever subset Spark's
    * SchemaPruning requests, every graft scan's readSchema must carry the
    * FULL declared type for each kept top-level field — the parsers emit
    * full-typed values, so a narrower nested type in the scan schema is by
    * definition an ordinal-corruption hazard, whether or not today's query
    * happens to surface it.
    */
  test("structural: scan readSchema re-widens kept fields to full top-level types") {
    withNestedPruning {
      val cases: Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)] = Seq(
        ("genbank", (d: org.apache.spark.sql.DataFrame) =>
          d.select(col("features")(0)("qualifiers")(0)("values")),
          spark.read.format("genbank").load(s"$fx/genbank/test.gb")),
        ("vcf", (d: org.apache.spark.sql.DataFrame) => d.select(col("info.MQ0F")),
          spark.read.format("vcf").option("parseInfo", "true").load(s"$fx/vcf/index.vcf")),
        ("sam", (d: org.apache.spark.sql.DataFrame) => d.select(col("tags.za")),
          spark.read.format("sam").option("parseTags", "true").load(s"$fx/sam/test.sam")),
        ("bam", (d: org.apache.spark.sql.DataFrame) =>
          d.select(explode(col("tags")).as("t")).select(col("t.value")),
          spark.read.format("bam").load(s"$fx/bam/test.bam")),
        ("mzml", (d: org.apache.spark.sql.DataFrame) =>
          d.select(explode(col("cv_params")).as("c")).select(col("c.value")),
          spark.read.format("mzml").load(s"$fx/mzml/test.mzML")))
      cases.foreach { case (name, q, base) =>
        val full = base.schema
        val scans = q(base).queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
        }
        assert(scans.nonEmpty, s"$name: no BatchScanExec in the plan")
        scans.foreach { s =>
          s.readSchema().fields.foreach { f =>
            val declared = full(f.name).dataType
            assert(f.dataType == declared,
              s"$name: scan readSchema narrows $f.name to ${f.dataType.sql} " +
                s"(declared ${declared.sql}) — nested-pruning ordinal hazard")
          }
        }
      }
    }
  }

  test("mzml: cv_params value (ordinal 2 of the cv struct) via nested pruning") {
    val df = spark.read.format("mzml").load(s"$fx/mzml/test.mzML")
      .select(explode(col("cv_params")).as("cv"))
      .select(col("cv")("value").as("v"))
    // values must be the strings the full-struct read yields, not
    // accession strings shifted into their slot
    val full = spark.read.format("mzml").load(s"$fx/mzml/test.mzML")
      .select(explode(col("cv_params")).as("cv"))
      .select(col("cv.accession"), col("cv.name"), col("cv.value"))
      .select(col("value").as("v"))
    assert(df.count() == full.count() && df.count() > 0)
    assert(df.except(full).count() == 0 && full.except(df).count() == 0,
      "cv_params.value misread under nested pruning")
  }
}
