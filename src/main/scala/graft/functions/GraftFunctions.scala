package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Registers every Graft SQL function on a session.
  *
  * Two registration paths, chosen per function:
  *
  *  1. Scalar compute functions (sequence/quality/mass-spec) register as
  *     typed Scala UDFs over the pure kernels in [[SeqOps]].
  *  2. The region predicate family (`region_match`, `chrom_match`,
  *     `interval_match`, `*_region_filter`) registers as plan-time
  *     FunctionRegistry builders that REWRITE the call into plain Catalyst
  *     comparisons (`chrom = name AND pos BETWEEN a AND b`). The rewritten
  *     predicates stay inside whole-stage codegen and — crucially — are
  *     pushable by Spark into any DSv2/parquet scan, which is the Spark-first
  *     equivalent of the reference's region-pushdown tokens
  *     (/root/reference/exon/exon-core/src/datasources/vcf/table_provider.rs:299-441).
  *
  * Function surface mirrors the reference's registration hub
  * (/root/reference/exon/exon-core/src/session_context/exon_context_ext.rs:190-215).
  */
object GraftFunctions {

  def registerAll(spark: SparkSession): Unit = {
    registerScalarUdfs(spark)
    registerSamFlagUdfs(spark)
    registerRegionFunctions(spark)
    org.apache.spark.sql.graftexpr.GraftTableFunctions.registerAll(spark)
  }

  private def registerScalarUdfs(spark: SparkSession): Unit = {
    val u = spark.udf
    // Hot-path sequence functions are native Catalyst expressions with
    // codegen over UTF8String bytes (registered as builders below):
    // reverse_complement, gc_content, quality_scores_to_list.
    u.register("trim_polya",
      (s: String) => if (s == null) null else SeqOps.trimPolyA(s))
    u.register("quality_scores_to_string",
      (xs: Seq[Int]) => if (xs == null) null else SeqOps.qualityScoresToString(xs))
    u.register("integer_encoding",
      (s: String, alphabet: String) =>
        if (s == null || alphabet == null) null else SeqOps.integerEncoding(s, alphabet))
    u.register("locate_regex",
      (s: String, pattern: String) =>
        if (s == null || pattern == null) null else SeqOps.locateRegex(s, pattern))
    // alignment_score supports (a, b) and (a, b, gap_open) like the
    // reference; Spark UDFs can't overload, so an arity-dispatching builder
    // below routes to these internal registrations.
    u.register("alignment_score_2p",
      (a: String, b: String) =>
        if (a == null || b == null) None else Some(SeqOps.alignmentScore(a, b)))
    u.register("alignment_score_3p",
      (a: String, b: String, gapOpen: Int) =>
        if (a == null || b == null) None
        else Some(SeqOps.alignmentScore(a, b, gapOpen = gapOpen)))
    u.register("contains_peak",
      (mz: Seq[Double], target: Double, tol: Double) =>
        if (mz == null) None else Some(SeqOps.containsPeak(mz, target, tol)))
    u.register("bin_vectors",
      (mz: Seq[Double], intensity: Seq[Double], binStart: Double, numBins: Long, binWidth: Double) =>
        if (mz == null || intensity == null) null
        else SeqOps.binVectors(mz, intensity, binStart, numBins, binWidth))

    // ---- training-data pipeline pack (text + vectors) ----
    u.register("lang_id",
      (s: String) => if (s == null) null else TextOps.langId(s))
    u.register("stopword_ratio",
      (s: String) => if (s == null) None else Some(TextOps.stopwordRatio(s)))
    u.register("quality_score",
      (s: String) => if (s == null) None else Some(TextOps.qualityScore(s)))
    u.register("simhash64",
      (s: String) => if (s == null) None else Some(TextOps.simhash64(s)))
    u.register("winnow_fingerprint",
      (s: String) => if (s == null) None else Some(TextOps.winnowFingerprint(s)))
    u.register("minhash_bands",
      (shingles: Seq[String]) =>
        if (shingles == null) null else TextOps.minhashBands(shingles))
    u.register("lsh_bucket",
      (v: Seq[Float]) => if (v == null) None else Some(VectorOps.hyperplaneBucket(v)))
  }

  /** The 13 SAM-flag predicates. `is_properly_aligned` and
    * `is_properly_segmented` are intentionally the same bit (0x2), as in the
    * reference (udfs/sam/samflags.rs:113-121).
    */
  private val samFlagBits: Seq[(String, Int)] = Seq(
    "is_segmented" -> 0x1,
    "is_properly_aligned" -> 0x2,
    "is_properly_segmented" -> 0x2,
    "is_unmapped" -> 0x4,
    "is_mate_unmapped" -> 0x8,
    "is_reverse_complemented" -> 0x10,
    "is_mate_reverse_complemented" -> 0x20,
    "is_first_segment" -> 0x40,
    "is_last_segment" -> 0x80,
    "is_secondary" -> 0x100,
    "is_qc_fail" -> 0x200,
    "is_duplicate" -> 0x400,
    "is_supplementary" -> 0x800
  )

  private def registerSamFlagUdfs(spark: SparkSession): Unit = {
    // Registered as builders composing native bitwise expressions so the
    // predicates are codegen'd and foldable, not UDF black boxes.
    samFlagBits.foreach { case (name, bit) =>
      registerBuilder(spark, name, { args =>
        require(args.length == 1, s"$name takes one argument (the SAM flag)")
        Not(EqualTo(BitwiseAnd(args.head, Literal(bit)), Literal(0)))
      })
    }
  }

  // ----- region predicate family (plan-time rewrites) -----

  private def registry(spark: SparkSession) =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry

  private def registerBuilder(spark: SparkSession, name: String,
                              builder: Seq[Expression] => Expression): Unit =
    registry(spark).createOrReplaceTempFunction(name, builder, "built-in")

  /** The region argument must be a literal string — same restriction as the
    * reference, which parses it from a scalar at plan time.
    */
  private def literalString(name: String, e: Expression): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case other if other.foldable =>
      Option(other.eval(null)) match {
        case Some(s: UTF8String) => s.toString
        case _ => throw new IllegalArgumentException(
          s"$name: region/interval argument must be a non-null string literal")
      }
    case _ => throw new IllegalArgumentException(
      s"$name: region/interval argument must be a string literal, got: $e")
  }

  private def containsPos(r: GenomicRegion, pos: Expression): Expression = {
    val conds = Seq(
      r.start.map(s => GreaterThanOrEqual(pos, Literal(s))),
      r.end.map(e => LessThanOrEqual(pos, Literal(e)))
    ).flatten
    conds.reduceOption(And).getOrElse(Literal.TrueLiteral)
  }

  private def overlapsInterval(r: GenomicRegion, start: Expression, end: Expression,
                               zeroBasedHalfOpen: Boolean = false): Expression = {
    // Region bounds are 1-based inclusive. For 1-based inclusive record
    // columns overlap is end >= lo && start <= hi; for 0-based half-open
    // columns (BigWig/BED) a record [s, e) overlaps iff e >= lo && s <= hi-1
    // (mirrors GraftPartitionReader.inRegion).
    val conds = Seq(
      r.start.map(s => GreaterThanOrEqual(end, Literal(s))),
      r.end.map(e => LessThanOrEqual(start, Literal(if (zeroBasedHalfOpen) e - 1 else e)))
    ).flatten
    conds.reduceOption(And).getOrElse(Literal.TrueLiteral)
  }

  private def nameEq(r: GenomicRegion, chrom: Expression): Expression =
    EqualTo(chrom, Literal(UTF8String.fromString(r.name), StringType))

  /** Overlap-style filter: `f(region, name)` or `f(region, name, start, end)`.
    * BAM/CRAM/GFF/BigWig semantics (interval overlap) — see SURVEY §7.4 #6.
    */
  private def overlapFilterBuilder(name: String, zeroBasedHalfOpen: Boolean = false)
                                  (args: Seq[Expression]): Expression = {
    val r = GenomicRegion.parse(literalString(name, args.head))
    args.length match {
      case 2 => nameEq(r, args(1))
      case 4 => And(nameEq(r, args(1)), overlapsInterval(r, args(2), args(3), zeroBasedHalfOpen))
      case n => throw new IllegalArgumentException(
        s"$name takes (region, name) or (region, name, start, end); got $n args")
    }
  }

  private def registerRegionFunctions(spark: SparkSession): Unit = {
    registerBuilder(spark, "reverse_complement", { args =>
      require(args.length == 1, "reverse_complement takes one argument")
      org.apache.spark.sql.graftexpr.ReverseComplementExpr(args.head)
    })
    registerBuilder(spark, "gc_content", { args =>
      require(args.length == 1, "gc_content takes one argument")
      org.apache.spark.sql.graftexpr.GcContentExpr(args.head)
    })
    registerBuilder(spark, "quality_scores_to_list", { args =>
      require(args.length == 1, "quality_scores_to_list takes one argument")
      org.apache.spark.sql.graftexpr.QualityScoresToListExpr(args.head)
    })
    registerBuilder(spark, "cosine_similarity", { args =>
      require(args.length == 2, "cosine_similarity takes two array arguments")
      org.apache.spark.sql.graftexpr.CosineSimilarityExpr(args(0), args(1))
    })
    registerBuilder(spark, "dot_long", { args =>
      require(args.length == 2, "dot_long takes two bigint-array arguments")
      org.apache.spark.sql.graftexpr.DotLongExpr(args(0), args(1))
    })
    registerBuilder(spark, "sqdist_long", { args =>
      require(args.length == 2, "sqdist_long takes two bigint-array arguments")
      org.apache.spark.sql.graftexpr.SqDistLongExpr(args(0), args(1))
    })
    registerBuilder(spark, "minhash_agg", { args =>
      require(args.length == 1, "minhash_agg takes one string argument")
      org.apache.spark.sql.graftexpr.MinHashAggExpr(args.head)
    })

    registerBuilder(spark, "alignment_score", { args =>
      val target = args.length match {
        case 2 => "alignment_score_2p"
        case 3 => "alignment_score_3p"
        case n => throw new IllegalArgumentException(
          s"alignment_score takes (a, b) or (a, b, gap_open); got $n args")
      }
      org.apache.spark.sql.catalyst.analysis.UnresolvedFunction(
        Seq(target), args, isDistinct = false)
    })

    // region_match(chrom, pos, region): containment of pos in the region.
    registerBuilder(spark, "region_match", { args =>
      require(args.length == 3, "region_match takes (chrom, pos, region)")
      val r = GenomicRegion.parse(literalString("region_match", args(2)))
      And(nameEq(r, args(0)), containsPos(r, args(1)))
    })

    // chrom_match(chrom, region): name equality only.
    registerBuilder(spark, "chrom_match", { args =>
      require(args.length == 2, "chrom_match takes (chrom, region)")
      val r = GenomicRegion.parse(literalString("chrom_match", args(1)))
      nameEq(r, args(0))
    })

    // interval_match(pos, interval): pos within [lo, hi].
    registerBuilder(spark, "interval_match", { args =>
      require(args.length == 2, "interval_match takes (pos, interval)")
      val (lo, hi) = GenomicRegion.parseInterval(literalString("interval_match", args(1)))
      And(GreaterThanOrEqual(args(0), Literal(lo)), LessThanOrEqual(args(0), Literal(hi)))
    })

    // vcf_region_filter(region, chrom [, pos]): POINT CONTAINMENT.
    registerBuilder(spark, "vcf_region_filter", { args =>
      val r = GenomicRegion.parse(literalString("vcf_region_filter", args.head))
      args.length match {
        case 2 => nameEq(r, args(1))
        case 3 => And(nameEq(r, args(1)), containsPos(r, args(2)))
        case n => throw new IllegalArgumentException(
          s"vcf_region_filter takes (region, chrom) or (region, chrom, pos); got $n args")
      }
    })

    // INTERVAL OVERLAP family. BAM/CRAM/GFF expose 1-based inclusive
    // coordinates; BigWig (like BED) is 0-based half-open.
    Seq("bam_region_filter", "cram_region_filter", "gff_region_filter")
      .foreach(n => registerBuilder(spark, n, overlapFilterBuilder(n)))
    registerBuilder(spark, "bigwig_region_filter",
      overlapFilterBuilder("bigwig_region_filter", zeroBasedHalfOpen = true))
  }
}
