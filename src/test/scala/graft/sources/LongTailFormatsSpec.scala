package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark
import org.apache.spark.sql.functions._

/** SDF / FCS / GenBank / mzML reader goldens from the reference slt corpus
  * and fixture facts.
  */
class LongTailFormatsSpec extends AnyFunSuite with SharedSpark {
  private val fx = "/root/reference/exon/exon-core/test-data/datasources"

  test("sdf: 6512 records, header/count golden, inferred data struct") {
    val df = spark.read.format("sdf").load(s"$fx/sdf/tox_benchmark_N6512.sdf.gz")
    assert(df.count() == 6512)
    val r = df.select("header", "atom_count", "bond_count").head()
    assert(r.getString(0) == "SciTegic02060916132D")
    assert(r.getInt(1) == 50 && r.getInt(2) == 60)
    val smiles = df.select(col("data.canonical_smiles")).head().getString(0)
    assert(smiles.startsWith("O=C1c2ccccc2C(=O)"))
  }

  // The reference's fcs/ fixture is not shipped in this checkout, so the
  // reader is exercised against a synthesized FCS3.0 file with the same
  // structure (header offsets, /-delimited TEXT segment, float32 DATA).
  test("fcs: inferred parameter columns and float rows (synthetic fixture)") {
    val dir = graft.TestTmp.dir("fcs_fix")
    val f = dir.resolve("synth.fcs").toFile
    val text = "/$PAR/3/$TOT/2/$DATATYPE/F/$BYTEORD/1,2,3,4" +
      "/$P1S/FSC-A/$P2S/SSC-A/$P3S/FL1-A/"
    val textStart = 58
    val textEnd = textStart + text.length - 1
    val dataStart = textStart + text.length
    val dataEnd = dataStart + 2 * 3 * 4 - 1
    val header = f"FCS3.0    $textStart%8d$textEnd%8d$dataStart%8d$dataEnd%8d${0}%8d${0}%8d"
    val out = new java.io.DataOutputStream(new java.io.FileOutputStream(f))
    out.writeBytes(header)
    out.writeBytes(text)
    // little-endian float32 rows: (1.5, 2.5, 3.5), (4.0, 5.0, 6.0)
    Seq(1.5f, 2.5f, 3.5f, 4.0f, 5.0f, 6.0f).foreach { v =>
      out.writeInt(Integer.reverseBytes(java.lang.Float.floatToIntBits(v)))
    }
    out.close()

    val df = spark.read.format("fcs").load(f.getAbsolutePath)
    assert(df.columns.toSeq == Seq("FSC-A", "SSC-A", "FL1-A"))
    assert(df.schema.fields.forall(_.dataType.typeName == "float"))
    val rows = df.collect().toSeq
    assert(rows.map(r => (r.getFloat(0), r.getFloat(1), r.getFloat(2))) ==
      Seq((1.5f, 2.5f, 3.5f), (4.0f, 5.0f, 6.0f)))
  }

  test("genbank: records, LOCUS fields, sequence, features") {
    val df = spark.read.format("genbank").load(s"$fx/genbank/test.gb")
    assert(df.count() == 1)
    val r = df.select("name", "accession", "division", "topology", "molecule_type").head()
    assert(r.getString(0) == "BGC0002746")
    assert(r.getString(1) == "BGC0002746")
    assert(r.getString(2) == "CON")
    assert(r.getString(3) == "linear")
    assert(r.getString(4) == "DNA")
    assert(df.select(length(col("sequence"))).head().getInt(0) == 38658)
    val nFeatures = df.select(size(col("features"))).head().getInt(0)
    assert(nFeatures > 0)
    // gzip variant reads identically
    assert(spark.read.format("genbank").load(s"$fx/genbank/test.gb.gz").count() == 1)
  }

  test("mzml: 2 spectra, peak + binning goldens (mzml-functions.slt)") {
    graft.GraftSession.registerAll(spark)
    val df = spark.read.format("mzml").load(s"$fx/mzml-pyoteomics/pyoteomics.mzML")
    assert(df.count() == 2)
    df.createOrReplaceTempView("mzml_t")
    val r = spark.sql(
      """SELECT contains_peak(mz.mz, 200.0D, 1.0D) AS p1,
        |       contains_peak(mz.mz, 0.0D, 1.0D) AS p2,
        |       bin_vectors(mz.mz, intensity.intensity, 200.0D, 10, 1.0D) AS bins
        |FROM mzml_t LIMIT 1""".stripMargin).head()
    assert(r.getBoolean(0))
    assert(!r.getBoolean(1))
    assert(r.getSeq[Double](2) ==
      Seq(0.0, 0.0, 0.0, 0.0, 203667.40002441406, 0.0, 0.0, 0.0, 0.0, 0.0))
  }

  test("mzml: gzip variant") {
    assert(spark.read.format("mzml").load(s"$fx/mzml/test.mzML.gz").count() == 2)
  }
}
