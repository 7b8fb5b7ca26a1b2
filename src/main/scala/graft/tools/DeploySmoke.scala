package graft.tools

import org.apache.spark.sql.SparkSession

/** Fresh-JVM deployment smoke: run via `scripts/deploy_smoke.sh`, which
  * spark-submits the packaged jar with ONLY
  * `--conf spark.sql.extensions=graft.GraftExtensions` — this main
  * deliberately never calls GraftSession.registerAll, so every function,
  * table function and format it uses must have arrived through the
  * extension injection + META-INF/services registration, exactly as they
  * would on a shared cluster where users add one conf line (the
  * reference's session install, exon_context_ext.rs:190-258, as a
  * zero-code deployment).
  */
object DeploySmoke {
  def main(args: Array[String]): Unit = {
    val fx = "/root/reference/exon/exon-core/test-data/datasources"
    val spark = SparkSession.builder()
      .appName("graft-deploy-smoke")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()

    var failures = 0
    def check(name: String)(cond: => Boolean): Unit = {
      val ok = try cond catch {
        case e: Throwable =>
          println(s"SMOKE FAIL $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
          false
      }
      if (ok) println(s"SMOKE PASS $name") else failures += 1
    }

    // scalar UDF through the extension-injected FunctionRegistry
    check("scalar reverse_complement") {
      spark.sql("SELECT reverse_complement('ATCG') AS rc")
        .collect().head.getString(0) == "CGAT"
    }
    // SQL table function (UDTF) through the TableFunctionRegistry
    check("fasta_scan table function") {
      spark.sql(s"SELECT count(*) FROM fasta_scan('$fx/fasta/test.fasta')")
        .collect().head.getLong(0) == 2L
    }
    // indexed UDTF with region pruning
    check("bam_indexed_scan region") {
      spark.sql(
        s"SELECT count(*) FROM bam_indexed_scan('$fx/bam/test.bam', 'chr1:1-12209145')")
        .collect().head.getLong(0) == 7L
    }
    // DSv2 format via META-INF/services (DataSourceRegister)
    check("format(\"bam\") read") {
      spark.read.format("bam").load(s"$fx/bam/test.bam").count() == 61L
    }
    // a relational query over the smoke SF if present (proves general SQL
    // unaffected by the extension)
    check("sql over parquet") {
      val d = args.headOption.getOrElse("/root/testdata/sf0.001")
      spark.read.parquet(s"$d/lineitem.parquet").createOrReplaceTempView("lineitem")
      spark.sql("SELECT count(*) FROM lineitem").collect().head.getLong(0) > 0
    }

    spark.stop()
    if (failures > 0) {
      println(s"SMOKE RESULT: $failures failure(s)")
      sys.exit(1)
    }
    println("SMOKE RESULT: all passed")
  }
}
