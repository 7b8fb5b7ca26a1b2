package graft.tools

/** Dev helper: assert two SparkEntry queries return identical result sets
  * (schema-order-insensitive, row-order-insensitive) at SPARK_GRAFT_SF_DIR.
  *
  *   sbt "runMain graft.tools.CrossCheck l03_ngram_jaccard_pairs l04_minhash_lsh_dedup"
  *
  * The flagship use: LSH recall vs the exact pair set at scale factors the
  * sf0.01 driver gate never sees.
  */
object CrossCheck {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: CrossCheck <queryA> <queryB>")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.LocalSession.buildBench(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val qs = graft.SparkEntry.queries
    def rows(name: String): Set[String] =
      qs(name)(spark, sfDir).collect().map(_.toString).toSet
    val (a, b) = (rows(args(0)), rows(args(1)))
    val onlyA = a.diff(b)
    val onlyB = b.diff(a)
    println(s"CROSSCHECK ${args(0)}=${a.size} ${args(1)}=${b.size} " +
      s"onlyA=${onlyA.size} onlyB=${onlyB.size}")
    (onlyA.take(5) ++ onlyB.take(5)).foreach(r => println(s"  DIFF $r"))
    spark.stop()
    if (onlyA.nonEmpty || onlyB.nonEmpty) sys.exit(1)
  }
}
