package graft.sources.formats

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable
import org.apache.hadoop.fs.FSDataInputStream
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.sources._
import graft.sources.FormatUtil._

/** BigWig (bbi) reader primitives: common header, chromosome B+ tree,
  * R-tree block enumeration, optional zlib section decompression. The format
  * is public (Kent et al., "BigWig and BigBed: enabling browsing of large
  * distributed datasets"); decoded by hand — the reference delegates to the
  * bigtools crate.
  */
private[graft] object BbiFile {
  val BigWigMagic = 0x888FFC26

  /** Test instrumentation: blocks actually read+inflated (proves R-tree
    * region pruning skips non-overlapping blocks).
    */
  private[graft] val blocksDecoded = new java.util.concurrent.atomic.AtomicInteger

  /** Regions by chrom NAME — [lo, hi] 1-based inclusive, the engine-wide
    * convention — resolved to an id-space R-tree overlap predicate via the
    * file's chrom tree, matching the row filter's arithmetic exactly (see
    * regionPred). A region naming an absent chromosome contributes
    * nothing; all regions absent → constant-false predicate (no blocks
    * read at all).
    */
  private[formats] def resolveRegionPred(regions: Seq[(String, Long, Long)],
                                         names: Map[Int, String])
      : Option[(Int, Int, Int, Int) => Boolean] =
    if (regions.isEmpty) None
    else {
      val idOf = names.map(_.swap)
      Some(regionPred(regions.flatMap { case (c, lo, hi) =>
        idOf.get(c).map(cx => (cx, lo, hi))
      }))
    }

  private[formats] def regionPred(qs: Seq[(Int, Long, Long)])
      : (Int, Int, Int, Int) => Boolean = {
    (sc, sb, ec, eb) =>
      qs.exists { case (qc, lo, hi) =>
        val startsBeforeEnd =
          sc < qc || (sc == qc && sb.toLong <= hi - 1)
        val endsAfterStart =
          ec > qc || (ec == qc && eb.toLong >= lo)
        startsBeforeEnd && endsAfterStart
      }
  }

  final case class ZoomLevel(reductionLevel: Int, dataOffset: Long, indexOffset: Long)
  final case class Header(version: Int, zooms: Seq[ZoomLevel], chromTreeOffset: Long,
                          fullDataOffset: Long, fullIndexOffset: Long,
                          uncompressBufSize: Int)

  final class Reader(in: FSDataInputStream) {
    def readAt(offset: Long, n: Int): ByteBuffer = {
      val b = new Array[Byte](n)
      in.readFully(offset, b)
      ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    }

    lazy val header: Header = {
      val b = readAt(0, 64)
      val magic = b.getInt
      require(magic == BigWigMagic, "not a BigWig file")
      val version = b.getShort & 0xffff
      val zoomLevels = b.getShort & 0xffff
      val chromTreeOffset = b.getLong
      val fullDataOffset = b.getLong
      val fullIndexOffset = b.getLong
      b.getShort; b.getShort // fieldCount, definedFieldCount
      b.getLong; b.getLong // autoSql, totalSummary
      val uncompressBufSize = b.getInt
      val zb = readAt(64, zoomLevels * 24)
      val zooms = (0 until zoomLevels).map { _ =>
        val rl = zb.getInt; zb.getInt
        ZoomLevel(rl, zb.getLong, zb.getLong)
      }
      Header(version, zooms, chromTreeOffset, fullDataOffset, fullIndexOffset,
        uncompressBufSize)
    }

    /** chromId -> name, via B+ tree traversal. */
    lazy val chromNames: Map[Int, String] = {
      val head = readAt(header.chromTreeOffset, 32)
      require(head.getInt == 0x78CA8C91, "bad chrom tree magic")
      head.getInt // blockSize
      val keySize = head.getInt
      head.getInt // valSize
      val out = mutable.Map[Int, String]()
      def walk(offset: Long): Unit = {
        val nh = readAt(offset, 4)
        val isLeaf = nh.get() != 0
        nh.get()
        val count = nh.getShort & 0xffff
        val itemSize = if (isLeaf) keySize + 8 else keySize + 8
        val items = readAt(offset + 4, count * itemSize)
        (0 until count).foreach { _ =>
          val key = new Array[Byte](keySize)
          items.get(key)
          if (isLeaf) {
            val chromId = items.getInt
            items.getInt // chromSize
            out(chromId) = new String(key, java.nio.charset.StandardCharsets.US_ASCII)
              .takeWhile(_ != 0)
          } else {
            walk(items.getLong)
          }
        }
      }
      walk(header.chromTreeOffset + 32)
      out.toMap
    }

    /** All (dataOffset, dataSize) blocks under an R-tree index whose
      * (chromIx, base) bounds satisfy `pred` — THE point of the R-tree:
      * with a region predicate, non-overlapping subtrees are never
      * descended and their blocks never read or inflated. `pred` takes
      * (startChromIx, startBase, endChromIx, endBase); None keeps all.
      */
    def rTreeBlocks(indexOffset: Long,
                    pred: Option[(Int, Int, Int, Int) => Boolean] = None)
        : Seq[(Long, Long)] = {
      val head = readAt(indexOffset, 48)
      require(head.getInt == 0x2468ACE0, "bad r-tree magic")
      val out = mutable.ArrayBuffer[(Long, Long)]()
      def walk(offset: Long): Unit = {
        val nh = readAt(offset, 4)
        val isLeaf = nh.get() != 0
        nh.get()
        val count = nh.getShort & 0xffff
        val itemSize = if (isLeaf) 32 else 24
        val items = readAt(offset + 4, count * itemSize)
        (0 until count).foreach { _ =>
          val sc = items.getInt; val sb = items.getInt
          val ec = items.getInt; val eb = items.getInt
          val keep = pred.forall(p => p(sc, sb, ec, eb))
          if (isLeaf) {
            val off = items.getLong; val sz = items.getLong
            if (keep) out += ((off, sz))
          } else {
            val child = items.getLong
            if (keep) walk(child)
          }
        }
      }
      walk(indexOffset + 48)
      out.toSeq
    }

    def blockBytes(offset: Long, size: Long): ByteBuffer = {
      BbiFile.blocksDecoded.incrementAndGet()
      val raw = new Array[Byte](size.toInt)
      in.readFully(offset, raw)
      val bytes =
        if (header.uncompressBufSize > 0) {
          val inf = new java.util.zip.Inflater()
          inf.setInput(raw)
          val out = new Array[Byte](header.uncompressBufSize)
          val n = inf.inflate(out)
          inf.end()
          java.util.Arrays.copyOf(out, n)
        } else raw
      ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    }
  }
}

/** BIGWIG_VALUE: one row per wig interval (bedgraph/var-step/fixed-step
  * sections), 0-based half-open coordinates
  * (bigwig-tests.slt golden: 6 rows in test.bw). With `regions`
  * (from `.option("region"/"regionFile")`), the R-tree walk descends
  * only overlapping subtrees — non-overlapping blocks are never read or
  * inflated; the generic row filter then trims within-block rows.
  */
class BigWigValueFormat(val regions: Seq[(String, Long, Long)])
  extends GraftFormat {
  override def shortName: String = "bigwig_value"
  override def defaultExtensions: Seq[String] = Seq("bw", "bigwig")
  override val dataSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("start", IntegerType, nullable = false),
    StructField("end", IntegerType, nullable = false),
    StructField("value", FloatType, nullable = false)))
  override def regionColumns: Option[(String, String, String)] =
    Some(("name", "start", "end"))
  override def zeroBasedHalfOpen: Boolean = true

  override def records(input: RecordInput, required: Array[Int]): Iterator[Array[Any]] = {
    // input.stream IS the raw seekable handle for this uncompressed binary
    // whole-file format; the partition reader owns and closes it, so a
    // partially-consumed iterator (pushed limit, task abort) cannot leak
    // a reopened descriptor.
    val fsIn = input.stream.asInstanceOf[FSDataInputStream]
    val r = new BbiFile.Reader(fsIn)
    val names = r.chromNames
    val pred = BbiFile.resolveRegionPred(regions, names)
    // Block list is offsets only (small); block DECODE is lazy, one block
    // resident at a time, so memory is bounded by a block, not the file.
    val blocks = r.rTreeBlocks(r.header.fullIndexOffset, pred)
    val rowIt = blocks.iterator.flatMap { case (off, size) =>
      val b = r.blockBytes(off, size)
      val rows = mutable.ArrayBuffer[Array[Any]]()
      while (b.remaining() >= 24) {
        val chromId = b.getInt
        val chromStart = b.getInt
        b.getInt // chromEnd
        val itemStep = b.getInt
        val itemSpan = b.getInt
        val typ = b.get() & 0xff
        b.get()
        val itemCount = b.getShort & 0xffff
        val name = utf8(names.getOrElse(chromId, chromId.toString))
        (0 until itemCount).foreach { i =>
          val (s, e, v) = typ match {
            case 1 => (b.getInt, b.getInt, b.getFloat)
            case 2 => val s0 = b.getInt; (s0, s0 + itemSpan, b.getFloat)
            case 3 => val s0 = chromStart + i * itemStep; (s0, s0 + itemSpan, b.getFloat)
            case other => throw new IllegalStateException(s"bigwig: bad section type $other")
          }
          rows += required.map {
            case 0 => name
            case 1 => s: Any
            case 2 => e: Any
            case 3 => v: Any
          }
        }
      }
      rows
    }
    rowIt
  }
}

object BigWigValueFormat extends BigWigValueFormat(Nil)

/** BIGWIG_ZOOM: summary records at one reduction level, selected with
  * `.option("reductionLevel", n)` (exact match, like the reference's
  * `reduction_level` table option). Golden rows in bigwig-tests.slt:5-10.
  * Regions prune the zoom R-tree exactly as in [[BigWigValueFormat]].
  */
final class BigWigZoomFormat(reductionLevel: Option[Int],
                             regions: Seq[(String, Long, Long)] = Nil)
  extends GraftFormat {
  override def shortName: String = "bigwig_zoom"
  override def defaultExtensions: Seq[String] = Seq("bw", "bigwig")
  override val dataSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("start", IntegerType, nullable = false),
    StructField("end", IntegerType, nullable = false),
    StructField("total_items", IntegerType, nullable = false),
    StructField("bases_covered", IntegerType, nullable = false),
    StructField("max_value", DoubleType, nullable = false),
    StructField("min_value", DoubleType, nullable = false),
    StructField("sum_squares", DoubleType, nullable = false),
    StructField("sum", DoubleType, nullable = false)))
  override def regionColumns: Option[(String, String, String)] =
    Some(("name", "start", "end"))
  override def zeroBasedHalfOpen: Boolean = true

  override def records(input: RecordInput, required: Array[Int]): Iterator[Array[Any]] = {
    val rl = reductionLevel.getOrElse(
      throw new IllegalArgumentException("bigwig_zoom requires option reductionLevel"))
    val fsIn = input.stream.asInstanceOf[FSDataInputStream]
    val r = new BbiFile.Reader(fsIn)
    val zoom = r.header.zooms.find(_.reductionLevel == rl).getOrElse(
      throw new IllegalArgumentException(
        s"bigwig_zoom: no zoom level $rl (available: ${r.header.zooms.map(_.reductionLevel).mkString(",")})"))
    val names = r.chromNames
    val pred = BbiFile.resolveRegionPred(regions, names)
    val rowIt = r.rTreeBlocks(zoom.indexOffset, pred).iterator.flatMap { case (off, size) =>
      val b = r.blockBytes(off, size)
      val rows = mutable.ArrayBuffer[Array[Any]]()
      while (b.remaining() >= 32) {
        val chromId = b.getInt
        val s = b.getInt; val e = b.getInt
        val valid = b.getInt
        val minV = b.getFloat; val maxV = b.getFloat
        val sumData = b.getFloat; val sumSq = b.getFloat
        rows += required.map {
          case 0 => utf8(names.getOrElse(chromId, chromId.toString))
          case 1 => s: Any
          case 2 => e: Any
          case 3 => 0: Any // total_items (the reference reports 0 here too)
          case 4 => valid: Any
          case 5 => maxV.toDouble: Any
          case 6 => minV.toDouble: Any
          case 7 => sumSq.toDouble: Any
          case 8 => sumData.toDouble: Any
        }
      }
      rows
    }
    rowIt
  }
}
