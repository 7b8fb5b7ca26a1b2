package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import graft.sources._
import graft.sources.formats._

/** Literal SQL table functions — `SELECT * FROM fasta_scan('/path')` — the
  * exact UDTF surface of the reference
  * (exon_context_ext.rs:216-258, datasources/scan_function.rs:14-52).
  * Each builder turns its literal arguments into a GraftTable and returns a
  * DataSourceV2Relation, so the full scan machinery (pushdown, splits,
  * indexes) applies unchanged.
  *
  * Signatures: `<fmt>_scan(path [, compression])` and
  * `<fmt>_indexed_scan(path, region-or-regionFile [, compression])`.
  */
object GraftTableFunctions {

  private val plainScans: Map[String, GraftFormat] = Map(
    "fasta_scan" -> FastaFormat,
    "fastq_scan" -> FastqFormat,
    "gff_scan" -> GffFormat,
    "gtf_scan" -> GtfFormat,
    "bed_scan" -> BedFormat,
    "hmm_dom_tab_scan" -> HmmDomTabFormat,
    "genbank_scan" -> GenBankFormat,
    "fcs_scan" -> FcsFormat,
    "mzml_scan" -> MzMlFormat,
    "sam_scan" -> SamFormat,
    "vcf_scan" -> VcfFormat,
    "bcf_scan" -> BcfFormat,
    "bam_scan" -> BamFormat)

  private val indexedScans: Map[String, GraftFormat] = Map(
    "gff_indexed_scan" -> GffFormat,
    "vcf_indexed_scan" -> VcfFormat,
    "bam_indexed_scan" -> BamFormat,
    // beyond the reference's 17: BCF prunes via its .csi like the others
    "bcf_indexed_scan" -> BcfFormat)

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.tableFunctionRegistry

    plainScans.foreach { case (name, fmt) =>
      reg.createOrReplaceTempFunction(name, { args =>
        require(args.length <= 2, s"$name takes (path [, compression])")
        val path = literal(name, args, 0)
        val opts = Map("path" -> path) ++
          (if (args.length > 1) Map("compression" -> literal(name, args, 1)) else Map.empty)
        relation(fmt, opts)
      }, "built-in")
    }

    indexedScans.foreach { case (name, fmt) =>
      reg.createOrReplaceTempFunction(name, { args =>
        require(args.length >= 2, s"$name takes (path, region-or-regionFile [, compression])")
        val path = literal(name, args, 0)
        // Like the reference's indexed UDTFs (fasta_indexed_scan.rs:62-125),
        // the second argument is a region literal OR a file of regions —
        // resolved through the Hadoop FS API so hdfs://s3a:// region files
        // work too (region strings like 'chr1:1-100' fail Path parsing or
        // existence and fall through to the literal branch).
        val regionArg = literal(name, args, 1)
        require(args.length <= 3, s"$name takes (path, region-or-regionFile [, compression])")
        val opts = Map("path" -> path, regionKey(regionArg) -> regionArg) ++
          (if (args.length > 2) Map("compression" -> literal(name, args, 2)) else Map.empty)
        relation(fmt, opts)
      }, "built-in")
    }

    // CRAM scans (beyond the reference's 17 — it has no cram UDTF): the
    // optional trailing argument is a FASTA reference for base
    // reconstruction, not a compression codec (CRAM compression is
    // internal). The indexed variant prunes containers via `.crai` and
    // header coordinates exactly like `.option("region", ...)` reads.
    reg.createOrReplaceTempFunction("cram_scan", { args =>
      require(args.length <= 2, "cram_scan takes (path [, fastaReference])")
      val path = literal("cram_scan", args, 0)
      val opts = Map("path" -> path) ++
        (if (args.length > 1)
          Map("fastaReference" -> literal("cram_scan", args, 1))
        else Map.empty)
      relation(CramFormat, opts)
    }, "built-in")
    reg.createOrReplaceTempFunction("cram_indexed_scan", { args =>
      require(args.length >= 2 && args.length <= 3,
        "cram_indexed_scan takes (path, region-or-regionFile [, fastaReference])")
      val path = literal("cram_indexed_scan", args, 0)
      val regionArg = literal("cram_indexed_scan", args, 1)
      val opts = Map("path" -> path, regionKey(regionArg) -> regionArg) ++
        (if (args.length > 2)
          Map("fastaReference" -> literal("cram_indexed_scan", args, 2))
        else Map.empty)
      relation(CramFormat, opts)
    }, "built-in")

    // BigWig TVFs (beyond the reference — it exposes bigwig only as table
    // providers): the indexed variant and the zoom's optional region
    // argument prune the bbi R-tree, so `SELECT ... FROM
    // bigwig_value_indexed_scan(p, 'chr1:1-100')` reads only overlapping
    // blocks.
    reg.createOrReplaceTempFunction("bigwig_value_scan", { args =>
      require(args.length == 1, "bigwig_value_scan takes (path)")
      relation(BigWigValueFormat,
        Map("path" -> literal("bigwig_value_scan", args, 0)))
    }, "built-in")
    reg.createOrReplaceTempFunction("bigwig_value_indexed_scan", { args =>
      require(args.length == 2,
        "bigwig_value_indexed_scan takes (path, region-or-regionFile)")
      val path = literal("bigwig_value_indexed_scan", args, 0)
      val regionArg = literal("bigwig_value_indexed_scan", args, 1)
      val opts = Map("path" -> path, regionKey(regionArg) -> regionArg)
      val bounds = graft.functions.GenomicRegion.boundsFromOptions(opts,
        SparkSession.active.sparkContext.hadoopConfiguration)
      DataSourceV2Relation.create(
        new GraftTable(new BigWigValueFormat(bounds), opts), None, None)
    }, "built-in")
    reg.createOrReplaceTempFunction("bigwig_zoom_scan", { args =>
      require(args.length >= 2 && args.length <= 3,
        "bigwig_zoom_scan takes (path, reductionLevel [, region-or-regionFile])")
      val path = literal("bigwig_zoom_scan", args, 0)
      val level = intLiteral("bigwig_zoom_scan", args, 1)
      val regionOpts: Map[String, String] =
        if (args.length > 2) {
          val regionArg = literal("bigwig_zoom_scan", args, 2)
          Map(regionKey(regionArg) -> regionArg)
        } else Map.empty
      val opts = Map("path" -> path,
        "reductionlevel" -> level.toString) ++ regionOpts
      val bounds = graft.functions.GenomicRegion.boundsFromOptions(opts,
        SparkSession.active.sparkContext.hadoopConfiguration)
      DataSourceV2Relation.create(
        new GraftTable(new BigWigZoomFormat(Some(level), bounds), opts),
        None, None)
    }, "built-in")

    // FASTA indexed scan extracts subsequences; the second argument is a
    // region string OR a path to a file of regions.
    reg.createOrReplaceTempFunction("fasta_indexed_scan", { args =>
      require(args.length >= 2, "fasta_indexed_scan takes (path, region [, compression])")
      val path = literal("fasta_indexed_scan", args, 0)
      val regionArg = literal("fasta_indexed_scan", args, 1)
      val conf = SparkSession.active.sparkContext.hadoopConfiguration
      val regions: Seq[String] =
        if (regionKey(regionArg) == "regionfile")
          graft.functions.GenomicRegion.readRegionFile(regionArg, conf)
        else Seq(regionArg)
      val table = new GraftTable(new FastaIndexedFormat(regions), Map("path" -> path))
      DataSourceV2Relation.create(table, None, None)
    }, "built-in")
  }

  private def relation(fmt: GraftFormat, opts: Map[String, String]): LogicalPlan =
    DataSourceV2Relation.create(new GraftTable(fmt, opts), None, None)

  /** "regionfile" when the argument looks like a path (has a separator or
    * URI scheme — hdfs:///s3a:// work too) AND resolves to an existing
    * file through the Hadoop FS API, else "region". Bare chromosome names
    * like '2' or 'X' are valid relative paths, so existence alone must
    * never decide — a stray file named `X` in the working directory would
    * silently reinterpret the region as a region file. Both silent
    * misreads are ruled out by failing loud at the two sharp edges:
    * a path-like argument whose file is missing (typo'd region file would
    * otherwise become a never-matching chromosome name -> 0 rows), and a
    * bare coordinate-less name that collides with an existing local file
    * (`'regions.txt'` without `./` -> 0 rows the other way).
    */
  private def regionKey(regionArg: String): String = {
    val hasCoords = graft.functions.GenomicRegion.parse(regionArg).start.isDefined
    val looksLikePath = regionArg.contains("://") ||
      (regionArg.contains('/') && !hasCoords)
    def isFile: Boolean = scala.util.Try {
      val rp = new org.apache.hadoop.fs.Path(regionArg)
      rp.getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration)
        .getFileStatus(rp).isFile
    }.getOrElse(false)
    if (looksLikePath) {
      if (isFile) "regionfile"
      else throw new IllegalArgumentException(
        s"region file not found: '$regionArg' (a path-like region argument " +
          "must resolve to an existing file; use 'name:start-end' for a " +
          "literal region)")
    } else if (hasCoords) {
      // 'name:lo-hi' is always a literal region — the SAM spec allows '/'
      // (and ':') in reference names, so coordinates, not separators,
      // decide; a file named like that cannot shadow it.
      "region"
    } else {
      if (isFile)
        throw new IllegalArgumentException(
          s"ambiguous region argument '$regionArg': a file with that name " +
            "exists in the working directory — prefix it with './' to read " +
            "it as a region file, or add coordinates ('name:1-') to force a " +
            "region")
      "region"
    }
  }

  private def intLiteral(name: String, args: Seq[Expression], i: Int): Int = {
    require(args.length > i, s"$name: missing argument ${i + 1}")
    val e = args(i)
    require(e.foldable && (e.dataType == org.apache.spark.sql.types.IntegerType ||
        e.dataType == org.apache.spark.sql.types.LongType),
      s"$name: argument ${i + 1} must be an integer literal, got $e")
    e.eval(null) match {
      case n: java.lang.Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$name: argument ${i + 1} must be an integer literal, got $other")
    }
  }

  private def literal(name: String, args: Seq[Expression], i: Int): String = {
    require(args.length > i, s"$name: missing argument ${i + 1}")
    args(i) match {
      case Literal(s: UTF8String, StringType) if s != null => s.toString
      case e if e.foldable && e.dataType == StringType =>
        e.eval(null) match {
          case null => throw new IllegalArgumentException(
            s"$name: argument ${i + 1} must be a non-null string literal")
          case v => v.toString
        }
      case other => throw new IllegalArgumentException(
        s"$name: argument ${i + 1} must be a string literal, got $other")
    }
  }
}
