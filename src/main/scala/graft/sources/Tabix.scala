package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Tabix (.tbi) index reader + region query. The format is public (tabix
  * paper / htslib spec): BGZF-compressed, little-endian, UCSC binning scheme
  * with a 16 kb linear index. The query returns merged BGZF virtual-position
  * chunks that may contain records overlapping the region — the scan then
  * seeks straight to those chunks instead of reading the file
  * (the reference's flagship pushdown, datasources/indexed_file/
  * indexed_bgzf_file.rs:34-140, re-expressed for DSv2 partition planning).
  */
final case class TabixIndex(names: Seq[String],
                            bins: Seq[Map[Int, Seq[(Long, Long)]]],
                            linear: Seq[Array[Long]]) {

  def refId(name: String): Int = names.indexOf(name)

  /** Merged virtual chunks possibly overlapping [beg0, end0) on `chrom`. */
  def query(chrom: String, beg0: Long, end0: Long): Seq[(Long, Long)] = {
    val rid = refId(chrom)
    if (rid < 0) return Nil
    val refBins = bins(rid)
    val lin = linear(rid)
    val minOffset = {
      val i = (beg0 >> 14).toInt
      if (lin.isEmpty) 0L
      else lin(math.min(math.max(i, 0), lin.length - 1))
    }
    val cand = TabixIndex.reg2bins(beg0, end0).flatMap(refBins.get).flatten
      .filter { case (_, e) => e > minOffset }
      .sortBy(_._1)
    // merge overlapping/adjacent chunks
    val merged = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    cand.foreach { case (s, e) =>
      if (merged.nonEmpty && s <= merged.last._2) {
        val (ls, le) = merged.last
        merged(merged.length - 1) = (ls, math.max(le, e))
      } else merged += ((s, e))
    }
    merged.toSeq
  }
}

object TabixIndex {

  /** UCSC binning: bins overlapping [beg, end), 0-based half-open. */
  def reg2bins(beg: Long, end0: Long): Seq[Int] = {
    val end = math.min(math.max(end0, beg + 1), 1L << 29) - 1
    val b = math.min(math.max(beg, 0), 1L << 29)
    val out = Seq.newBuilder[Int]
    out += 0
    var k = 1 + (b >> 26); while (k <= 1 + (end >> 26)) { out += k.toInt; k += 1 }
    k = 9 + (b >> 23); while (k <= 9 + (end >> 23)) { out += k.toInt; k += 1 }
    k = 73 + (b >> 20); while (k <= 73 + (end >> 20)) { out += k.toInt; k += 1 }
    k = 585 + (b >> 17); while (k <= 585 + (end >> 17)) { out += k.toInt; k += 1 }
    k = 4681 + (b >> 14); while (k <= 4681 + (end >> 14)) { out += k.toInt; k += 1 }
    out.result()
  }

  def read(tbiPath: Path, conf: Configuration): TabixIndex = {
    val fs = tbiPath.getFileSystem(conf)
    val in = new MultiMemberGzipInputStream(fs.open(tbiPath))
    val bytes = try in.readAllBytes() finally in.close()
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4); b.get(magic)
    require(new String(magic, 0, 3) == "TBI", s"not a tabix index: $tbiPath")
    val nRef = b.getInt
    b.getInt; b.getInt; b.getInt; b.getInt; b.getInt; b.getInt // format..skip
    val lNm = b.getInt
    val nameBytes = new Array[Byte](lNm); b.get(nameBytes)
    val names = new String(nameBytes, java.nio.charset.StandardCharsets.UTF_8)
      .split(0.toChar).toSeq.filter(_.nonEmpty)
    val bins = Seq.newBuilder[Map[Int, Seq[(Long, Long)]]]
    val linear = Seq.newBuilder[Array[Long]]
    (0 until nRef).foreach { _ =>
      val nBin = b.getInt
      val m = Map.newBuilder[Int, Seq[(Long, Long)]]
      (0 until nBin).foreach { _ =>
        val bin = b.getInt
        val nChunk = b.getInt
        val chunks = (0 until nChunk).map(_ => (b.getLong, b.getLong))
        m += bin -> chunks
      }
      val nIntv = b.getInt
      val ioff = Array.fill(nIntv)(b.getLong)
      bins += m.result()
      linear += ioff
    }
    TabixIndex(names, bins.result(), linear.result())
  }

  /** Sibling .tbi path if present. */
  def forFile(dataPath: Path, conf: Configuration): Option[TabixIndex] = {
    val tbi = new Path(dataPath.getParent, dataPath.getName + ".tbi")
    val fs = tbi.getFileSystem(conf)
    if (fs.exists(tbi)) Some(read(tbi, conf)) else None
  }
}

/** BAM .bai index: same binning structures as tabix but stored raw
  * (uncompressed) and without a name table — reference ids resolve through
  * the BAM header. Exposed as a TabixIndex so region queries share one code
  * path.
  */
object BaiIndex {

  def forBam(bamPath: Path, conf: Configuration): Option[TabixIndex] = {
    val bai = new Path(bamPath.getParent, bamPath.getName + ".bai")
    val fs = bai.getFileSystem(conf)
    if (!fs.exists(bai)) return None

    val headerIn = new MultiMemberGzipInputStream(fs.open(bamPath))
    val names = try formats.BamFormat.readHeaderRefs(headerIn) finally headerIn.close()

    val in = fs.open(bai)
    val bytes = try in.readAllBytes() finally in.close()
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4); b.get(magic)
    require(new String(magic, 0, 3) == "BAI", s"not a .bai index: $bai")
    val nRef = b.getInt
    val bins = Seq.newBuilder[Map[Int, Seq[(Long, Long)]]]
    val linear = Seq.newBuilder[Array[Long]]
    (0 until nRef).foreach { _ =>
      val nBin = b.getInt
      val m = Map.newBuilder[Int, Seq[(Long, Long)]]
      (0 until nBin).foreach { _ =>
        val bin = b.getInt
        val nChunk = b.getInt
        val chunks = (0 until nChunk).map(_ => (b.getLong, b.getLong))
        // 37450 is the unmapped-count pseudo-bin, not real chunks.
        if (bin != 37450) m += bin -> chunks
      }
      val nIntv = b.getInt
      linear += Array.fill(nIntv)(b.getLong)
      bins += m.result()
    }
    Some(TabixIndex(names.toSeq, bins.result(), linear.result()))
  }
}
