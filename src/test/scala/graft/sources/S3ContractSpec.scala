package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** Object-store contract: every path in this engine goes through the Hadoop
  * FileSystem API (open/seek/listStatus/globStatus), so `s3a://` URLs work
  * exactly like `file://` once the connector jars are on the classpath —
  * the reference validates the same surface against localstack
  * (slt/fasta-scan-s3-tests.slt, cram-remote-tests.slt).
  *
  * This environment ships no hadoop-aws jar and has no network, so the live
  * test self-cancels unless both the connector class and a GRAFT_S3_TEST
  * endpoint (e.g. a MinIO/localstack URL with a pre-loaded `graft-test`
  * bucket holding fasta/test.fasta) are present. The FS-indirection test
  * below runs everywhere and pins the property the S3 path depends on: no
  * code path assumes local files.
  */
/** RawLocalFileSystem re-registered under a foreign scheme (see below). */
class GraftFsForTest extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")
}

class S3ContractSpec extends AnyFunSuite with SharedSpark {

  private def s3aPresent: Boolean =
    try { Class.forName("org.apache.hadoop.fs.s3a.S3AFileSystem"); true }
    catch { case _: ClassNotFoundException => false }

  test("s3a live read (cancels without connector + GRAFT_S3_TEST endpoint)") {
    assume(s3aPresent, "hadoop-aws not on classpath")
    val endpoint = sys.env.get("GRAFT_S3_TEST")
    assume(endpoint.isDefined, "GRAFT_S3_TEST endpoint not configured")
    spark.conf.set("spark.hadoop.fs.s3a.endpoint", endpoint.get)
    spark.conf.set("spark.hadoop.fs.s3a.path.style.access", "true")
    val n = spark.read.format("fasta").load("s3a://graft-test/fasta/test.fasta").count()
    assert(n == 2)
  }

  test("all file access goes through the Hadoop FileSystem API") {
    // A non-default Hadoop scheme backed by RawLocalFileSystem: if any part
    // of listing/reading bypassed the FS API for java.io, this would fail.
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.graftfs.impl", classOf[GraftFsForTest].getName)
    val fx = "/root/reference/exon/exon-core/test-data/datasources"
    val n = spark.read.format("fasta").load(s"graftfs://$fx/fasta/test.fasta").count()
    assert(n == 2)
    val vcf = spark.read.format("vcf").option("region", "1:9999919-10000000")
      .load(s"graftfs://$fx/vcf/index.vcf.gz").count()
    assert(vcf == 82, "index lookup + BGZF seek must also go through the FS API")
  }
}
