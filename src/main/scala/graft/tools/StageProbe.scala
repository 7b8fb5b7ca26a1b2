package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe: decompose the expensive l-pack pipelines into stages and time
  * each with the same noop forcing as Bench, so optimization work targets
  * the stage that actually costs (guide §1: measure first).
  *
  * Usage: runMain graft.tools.StageProbe [image|audio|jaccard|all]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  * SPARK_GRAFT_REPS (default 3).
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val what = if (args.isEmpty) "all" else args(0)
    val spark = graft.LocalSession.buildBench(cpus)
    graft.GraftSession.registerAll(spark)
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    def force(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    def time(name: String)(mk: => DataFrame): Unit = {
      force(mk) // warm-up (codegen)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); force(mk); (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name min=${ts.min}%.3f reps=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    val qs = graft.SparkEntry.queries

    if (what == "image" || what == "all") {
      time("image_hashes")(graft.queries.LlmQueries.imageHashes(spark, sfDir))
      time("image_pairs")(graft.queries.LlmQueries.imagePairs(spark, sfDir,
        failOnDrop = true))
      time("l67_full")(qs("l67_image_neardup")(spark, sfDir))
      time("l68_full")(qs("l68_image_dedup_keep")(spark, sfDir))
      val n = new java.util.concurrent.atomic.AtomicInteger
      time("l68_cc_only") {
        val p = graft.queries.LlmQueries.imagePairs(spark, sfDir,
          failOnDrop = true).select(col("ida"), col("idb")).localCheckpoint()
        graft.queries.LlmQueries.connectedComponentsStar(p, roundsOut = Some(n))
      }
      println(s"PROBE l68_cc_rounds=${n.get}")
    }
    if (what == "audio" || what == "all") {
      time("l70_pairs")(qs("l70_audio_neardup")(spark, sfDir))
      time("l73_full")(qs("l73_audio_dedup_keep")(spark, sfDir))
    }
    if (what == "starplan") {
      // Before/after plan evidence for the star-contraction round rewrite:
      // the BEFORE shape is the pre-r17 groupBy+join round, reconstructed
      // verbatim; the AFTER shape is the shipped windowed round.
      import org.apache.spark.sql.expressions.Window
      def largeStarOld(e: DataFrame): DataFrame = {
        val nbrs = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
        val mins = nbrs.groupBy(col("u"))
          .agg(least(min(col("v")), col("u")).as("m"))
          .select(col("u").as("lu"), col("m"))
        nbrs.join(mins, col("u") === col("lu"))
          .filter(col("v") > col("u"))
          .select(col("v").as("u"), col("m").as("v"))
          .filter(col("u") =!= col("v")).distinct()
      }
      def smallStarOld(e: DataFrame): DataFrame = {
        val mins = e.groupBy(col("u")).agg(min(col("v")).as("m"))
          .select(col("u").as("su"), col("m"))
        val relinked = e.join(mins, col("u") === col("su"))
        relinked.select(col("u"), col("m").as("v"))
          .unionAll(relinked.filter(col("v") =!= col("m"))
            .select(col("v").as("u"), col("m").as("v")))
          .filter(col("u") =!= col("v")).distinct()
      }
      val edges = graft.queries.LlmQueries.imagePairs(spark, sfDir,
          failOnDrop = true)
        .select(greatest(col("ida"), col("idb")).as("u"),
          least(col("ida"), col("idb")).as("v"))
        .filter(col("u") =!= col("v")).distinct().localCheckpoint()
      def fmt(df: DataFrame): String = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println("===== STAR ROUND BEFORE (groupBy+join, r16 shape) =====")
      println(fmt(smallStarOld(largeStarOld(edges))))
      println("===== STAR ROUND AFTER (windowed, r17 shape) =====")
      println(fmt(graft.queries.LlmQueries.smallStar(
        graft.queries.LlmQueries.largeStar(edges))))
    }
    if (what == "propplan") {
      // Before/after plan evidence for the delta-frontier propagation
      // rewrite (r18): BEFORE is the r17 full-join round reconstructed
      // verbatim; AFTER is the shipped frontier round (broadcast arm, the
      // steady-state shape once the observed changed-count is small).
      // Same cut edge/label inputs for both.
      val pairs = graft.queries.LlmQueries.jaccardPairs(spark, sfDir)
        .select(col("ida"), col("idb"))
      val edges = pairs.select(col("ida").as("src"), col("idb").as("dst"))
        .unionAll(pairs.select(col("idb").as("src"), col("ida").as("dst")))
        .localCheckpoint()
      val labels = edges.select(col("src").as("doc_id")).distinct()
        .withColumn("label", col("doc_id")).localCheckpoint()
      def fmt(df: DataFrame): String = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val propOld = edges.join(labels, edges("dst") === labels("doc_id"))
        .select(edges("src").as("doc_id"), col("label"))
      val roundOld = labels.unionAll(propOld)
        .groupBy("doc_id").agg(min(col("label")).as("label"))
      println("===== PROP ROUND BEFORE (full edges-x-labels join, r17 shape) =====")
      println(fmt(roundOld))
      val frontier = labels // round-1 frontier; late rounds: the chg subset
        .select(col("doc_id").as("dst"), col("label").as("nl"))
      val propNew = edges.join(broadcast(frontier), "dst")
        .select(col("src").as("doc_id"), col("nl").as("label"),
          lit(false).as("old"))
      val roundNew = labels
        .select(col("doc_id"), col("label"), lit(true).as("old"))
        .unionAll(propNew)
        .groupBy("doc_id").agg(min(col("label")).as("label"),
          min(when(col("old"), col("label"))).as("lold"))
        .select(col("doc_id"), col("label"),
          (col("label") < col("lold")).as("chg"))
      println("===== PROP ROUND AFTER (broadcast-frontier union, r18 shape) =====")
      println(fmt(roundNew))
    }
    if (what == "l50") {
      // Decompose the l50 binary search: replicate longestDupSpan's probe
      // internals (private[queries]) and time the token cut, each dupAt
      // probe at the binary-search midpoints, and the final dupGrams.
      import spark.implicits._
      val t0 = System.nanoTime()
      val toks = graft.queries.Tables.documents(spark, sfDir)
        .select(col("text")).as[String]
        .map(_.split(" ")).toDF("w").localCheckpoint()
      println(f"PROBE l50_toks_cut=${(System.nanoTime() - t0) / 1e9}%.3f")
      def grams(n: Int) = toks.as[Seq[String]].flatMap { w =>
        if (w.length < n) Iterator.empty
        else (0 to w.length - n).iterator.map(i => w.slice(i, i + n).mkString(" "))
      }.toDF("g")
      def dupAt(n: Int): Boolean = {
        val tA = System.nanoTime()
        val g = grams(n).withColumn("h", xxhash64(col("g")))
        val dupH = g.groupBy(col("h")).agg(count(lit(1)).as("c"))
          .filter(col("c") >= 2).select(col("h")).localCheckpoint()
        val nh = dupH.count()
        val tB = System.nanoTime()
        val r = nh > 0 && !g.join(dupH, Seq("h"), "left_semi")
          .groupBy(col("g")).agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") >= 2).isEmpty
        val tC = System.nanoTime()
        println(f"PROBE l50_dupAt n=$n%d dupH=$nh%d hashPhase=${(tB - tA) / 1e9}%.3f confirmPhase=${(tC - tB) / 1e9}%.3f dup=$r")
        r
      }
      val maxLen = toks.select(max(size(col("w")))).head().getInt(0)
      println(s"PROBE l50_maxLen=$maxLen")
      if (dupAt(1)) {
        var lo = 1; var hi = maxLen
        while (lo < hi) {
          val mid = (lo + hi + 1) / 2
          if (dupAt(mid)) lo = mid else hi = mid - 1
        }
        println(s"PROBE l50_answer=$lo")
      }
    }
    if (what == "jaccard" || what == "all") {
      time("l03_pairs")(qs("l03_ngram_jaccard_pairs")(spark, sfDir))
      time("l14_prop")(qs("l14_dup_clusters")(spark, sfDir))
      time("l21_star")(qs("l21_dup_clusters_star")(spark, sfDir))
    }
    spark.stop()
  }
}
