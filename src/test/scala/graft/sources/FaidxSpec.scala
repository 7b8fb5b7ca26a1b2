package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** graft.tools.Faidx — the `samtools faidx` equivalent for EXTERNAL files:
  * builds `.fai` (+ `.gzi` for bgzf) siblings, byte-identical to what the
  * engine's own sink commits, unlocking region seeks / splits / metadata
  * counts on data the engine didn't write.
  */
class FaidxSpec extends AnyFunSuite with SharedSpark {

  private def conf = spark.sparkContext.hadoopConfiguration

  test("bgzf: tool-built .fai/.gzi equal the sink's own, and unlock region+count") {
    // engine-written corpus WITH sink indexes as ground truth
    val sink = graft.TestTmp.dir("faidx_sink").toString + "/t"
    spark.range(0, 500).select(
        concat(lit("s"), format_string("%03d", col("id"))).as("id"),
        lit(null).cast("string").as("description"),
        substring(lit("ACGTG" * 42), lit(1),
          (lit(180) + col("id") % 11).cast("int")).as("sequence"))
      .coalesce(1).sortWithinPartitions("id")
      .write.format("fasta").mode("overwrite")
      .option("compression", "bgzf").save(sink)
    val part = new java.io.File(sink).listFiles
      .filter(_.getName.endsWith(".fasta.gz")).head
    // external-looking copy: data file only, no indexes
    val ext = graft.TestTmp.dir("faidx_ext")
    val dst = new java.io.File(ext.toFile, "ref.fasta.gz")
    java.nio.file.Files.copy(part.toPath, dst.toPath)

    val n = graft.tools.Faidx.index(
      new org.apache.hadoop.fs.Path(dst.getAbsolutePath), conf)
    assert(n == 500)
    // byte-identical .fai to the sink's own
    val sinkFai = java.nio.file.Files.readAllBytes(
      new java.io.File(part.getAbsolutePath + ".fai").toPath)
    val toolFai = java.nio.file.Files.readAllBytes(
      new java.io.File(dst.getAbsolutePath + ".fai").toPath)
    assert(java.util.Arrays.equals(sinkFai, toolFai),
      ".fai built by the tool diverges from the sink's own")
    val sinkGzi = java.nio.file.Files.readAllBytes(
      new java.io.File(part.getAbsolutePath + ".gzi").toPath)
    val toolGzi = java.nio.file.Files.readAllBytes(
      new java.io.File(dst.getAbsolutePath + ".gzi").toPath)
    assert(java.util.Arrays.equals(sinkGzi, toolGzi),
      ".gzi built by the tool diverges from the sink's own")

    // the indexed surface now works on the external file
    val sub = spark.read.format("fasta")
      .option("region", "s123:6-25").load(dst.getAbsolutePath)
      .select("sequence").head.getString(0)
    assert(sub == ("ACGTG" * 42).substring(5, 25))
    val counted = spark.read.format("fasta").load(ext.toString).groupBy().count()
    assert(counted.queryExecution.executedPlan.toString.contains("GraftCountScan"))
    assert(counted.head.getLong(0) == 500L)
  }

  test("uncompressed: tool .fai matches the sink's and refuses ragged lines") {
    val sink = graft.TestTmp.dir("faidx_plain").toString + "/t"
    spark.range(0, 50).select(
        concat(lit("p"), col("id").cast("string")).as("id"),
        lit(null).cast("string").as("description"),
        substring(lit("TTGCA" * 30), lit(1),
          (lit(60) + col("id") % 5).cast("int")).as("sequence"))
      .coalesce(1).sortWithinPartitions("id")
      .write.format("fasta").mode("overwrite").save(sink)
    val part = new java.io.File(sink).listFiles
      .filter(f => f.getName.endsWith(".fasta")).head
    val ext = graft.TestTmp.dir("faidx_plain_ext")
    val dst = new java.io.File(ext.toFile, "p.fasta")
    java.nio.file.Files.copy(part.toPath, dst.toPath)
    graft.tools.Faidx.index(new org.apache.hadoop.fs.Path(dst.getAbsolutePath), conf)
    val sinkFai = java.nio.file.Files.readAllBytes(
      new java.io.File(part.getAbsolutePath + ".fai").toPath)
    val toolFai = java.nio.file.Files.readAllBytes(
      new java.io.File(dst.getAbsolutePath + ".fai").toPath)
    assert(java.util.Arrays.equals(sinkFai, toolFai))

    // ragged interior lines refuse loudly
    val bad = new java.io.File(ext.toFile, "bad.fasta")
    java.nio.file.Files.writeString(bad.toPath,
      ">r1\nACGTACGT\nACG\nACGTACGT\n")
    val e = intercept[IllegalArgumentException] {
      graft.tools.Faidx.index(new org.apache.hadoop.fs.Path(bad.getAbsolutePath), conf)
    }
    assert(e.getMessage.contains("irregular"))

    // a FINAL line LONGER than the interior width is just as
    // line-address-breaking as a short interior line — refuse, don't
    // write an index that returns the next record's bytes as bases
    val bad2 = new java.io.File(ext.toFile, "bad2.fasta")
    java.nio.file.Files.writeString(bad2.toPath,
      ">r1\nACGTAC\nACGTAC\nACGTACGTAC\n")
    val e2 = intercept[IllegalArgumentException] {
      graft.tools.Faidx.index(new org.apache.hadoop.fs.Path(bad2.getAbsolutePath), conf)
    }
    assert(e2.getMessage.contains("longer"))
  }

  test("plain gzip refuses with a recompress hint") {
    val ext = graft.TestTmp.dir("faidx_gzip")
    val f = new java.io.File(ext.toFile, "x.fasta.gz")
    val o = new java.util.zip.GZIPOutputStream(new java.io.FileOutputStream(f))
    o.write(">a\nACGT\n".getBytes("UTF-8")); o.close()
    val e = intercept[IllegalArgumentException] {
      graft.tools.Faidx.index(new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
    }
    assert(e.getMessage.contains("bgzip"))
  }
}
