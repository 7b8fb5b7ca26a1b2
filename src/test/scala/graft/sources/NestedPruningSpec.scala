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
