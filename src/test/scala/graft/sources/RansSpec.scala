package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** rANS 4x8 decoder known-answer tests against streams produced by
  * tools/rans4x8.py — an INDEPENDENT encoder written from the CRAM 3.0
  * spec, not from the Scala decoder. The order-0 vectors also pass
  * through the fixture-proven order-0 path, tying the Python encoder to
  * a second independent implementation; the order-1 vectors are then the
  * known answers for the new order-1 path (samtools' default codec).
  */
class RansSpec extends AnyFunSuite {
  private def b64(s: String): Array[Byte] = java.util.Base64.getDecoder.decode(s)
  private def rans(enc: String): Array[Byte] =
    graft.sources.formats.CramFormat.decompress(4, b64(enc))

  // "the quick brown fox jumps over the lazy dog " * 10 (len 440)
  private val pA = ("the quick brown fox jumps over the lazy dog " * 10)
    .getBytes("US-ASCII")
  // seed-7 random bytes in [64,80), len 257 (mod-4 tail of 1)
  private val pB = b64(
    "SkRMQUJDS0FGQUJNTUJHQk1BQ0dBTEFHQURJTURDSUVDRktDQkFGT01KTk5LSUdFR0JJT0pOSUJDTUVKRE9NQUJKSktPTkJCSE9CQUlOSUxLQE5LRUNPQUZJREdMTE9CRU5MSERNSE1LTEdEQkVER0dAT0VISUBETUtKREFOTExMTENPTEFGQkZORUNKQUNARENLQEJGTERIS0tPQ0NPTk9PSUJEQ0pIT0VARktEQElCSEtFS0dKR0ZHTEdGT0tAQEhPSEZLTktLQkdDR09GSkZPQE9LQkNMRk9FTUpCTE5MQkVFREBETkRPS0REQEBDRE1GRkBIRklHSkhNREFLTk0=")
  private val pC = "AB".getBytes("US-ASCII") // shorter than 4: all-tail decode
  private val pD = Array.fill[Byte](100)('z'.toByte) // single-symbol alphabet

  test("order-0: python-encoded streams decode on the fixture-proven path") {
    assert(rans(
      "ACQBAAC4AQAAIINFYV1iGF1dXYEXXV2Aul1dXV1dXYF0XV2Aul2AuoC6XV1dXWEAQo3lALXW5ABXxcQVIBKjJGDZT229+SbeGBnmg7VS2eNuhqR4azelI3ZTCQH3ZbP3q+iYVNBfnudaZHYKoW3cd9FOR8jXptoqIvTio3c3Hs+w5eGvego7qJY+sOMfaITqqcgMXD2/S5CUeZFerIAiyhYaFMgLoz6qU/MLFNcya/a7YNsAnqM+kehXFbFw3OAwHqDigFMsx2dLVTuNkD1KB3EY9OiQiyMFHuKB7FlJgstk6ZjTeizpdE7A/qOaNyL06Dp31KjT81+UoUoNiA+WwTukvAOTWJ6T+LyMH0pBzuCP/EG3rnk4JJJRTNVfLfgD1giDgXQp7NH33mR6NQ==")
      .sameElements(pA))
    assert(rans(
      "ALAAAAABAQAAQIDfQQ6A74FOgQ6BToDPgQ6A/4CvgL+Az4FOgQ6A34DfgVUAchpOKr9k8jfOfMxUBZGdYhEd8U63eRj55aynjSLoIrT/TjCZRCd+NtQXFvSL4RqLeCjS/07SF4s7t2Gr0mRvmgaqGKynO3K+8pj1EUiyrsLrDfO2NpD3f4jAS5TWM01iOrG2JM3oP1IO7zFReSjAV+w+AXMAEuivCCUrY/aQ3VPIxDBqwoxhOjKZV90=")
      .sameElements(pB))
    assert(rans("ABgAAAACAAAAQYgAQgCIAAAAAAABAAgAAQAAgAAAAIAA").sameElements(pC))
    assert(rans("ABQAAABkAAAAepAAAAAAgAAAAIAAAACAAAAAgAA=").sameElements(pD))
  }

  test("order-1: known-answer streams decode (text, random, tail, degenerate)") {
    assert(rans(
      "AeAAAAC4AQAAAG2IAHSIAAAgYoHRZIHRZoHRaoHRbIHRb4HRcYHRdINJAGF6kAAAYhhykAAAa5AAAG+QAAAgiqpyhVYAb5AAACCQAABlkAAAY5AAAHWQAAAgkAAAYZAAAHCQAAAgkAAAZ4QAdoQAdwGEAIQAAHOQAAB1kAAAIIgAb4gAACCQAABokAAAaYjjbYcdAGWQAABukAAAIJAAACCQAAB5kAAAABAJBTEqUiQtEAkFMSpSJC0oKD09GRmurkdHsLDj47CwLNMs03JyUFAHBz8/m5tfX6WlBQXem96bWfNZ8/Hxe3s=")
      .sameElements(pA))
    assert(rans(
      "AX4CAAABAQAAAECEAEKEAEqEAEyEAABAQIE7QoE7QwGBO4OxRoE7SIJ2SQCBO06BO08AgncAQQ5CgklDAYJJgSRGhJJHAIEkSYEkS4EkTACBJE6BKABBgYZCCIDDgkmAw4JJgYaBhoGGgMOAw0yAw00AgYcAQIDwQoDwQwGA8IDwRoDwRwCB4UmA8EoDgeGB4YDwgPBPgt0AQIJJQQOBhoDDgkmAw0eBhkgBgMOAw0yAw00CgkmAw4GHAECBO0ODsUQBgnaBO0eBO0gAgTtKgTtLAIE7TYE7TgCBPABAgPBBAYDwgPBGgPBHAIDwSYHhSgKA8ILSgPBOgPBPAIPNAECBAEEGggCCAIEAgQCBAIIAgQBKggBMggBPgQAARIF0RoLoSYF0S4LoTYLoT4RgAECBVUKEAESBVUUAgVVHgqpMgVVNAoFVgVWBWABBgTtCAIE7RIOxRoE7RwGBO4J2SoE7SwCBO06CdwBAgklBBIDDgYaAw4GGgYZHgMNJgMNKAoDDgYaAw06Bhk8AgYcAQYMAQgKBAIEAgQBGgQBHAYIAgQBLgQBMAIMAToEATwCBAABBgnZCAIE7RIJ2RQGBO4E7SIE7SoJ2SwCCdk2BPABCgSREgSRFAIEkSYJJS4NtTAODbYEkgSSBKQBAgMNBAoDDgYaAw0WCSUYAgMNIgMNJBoDDgMOCSYDDgYaBhoDEAABt2CwZF3UjSG+9rS9+YcEJ6u7U2TuxXfWbHa/XNZfSavSHdJKM9yeeNQDIN1V50lS9c923S6UXDEkZrCwxvw6lNtZ7fR8qyL8UXXTbb0WRSN/DOMPU2E6WkkAWnlA68UFrdN1h3zWtRHl3iHCMYpI/x8lCVHQ=")
      .sameElements(pB))
    assert(rans("ARsAAAACAAAAAEGQAABBQpAAAAAAAIAAAACAAAAAgAAAAIAA").sameElements(pC))
    assert(rans("ARsAAABkAAAAAHqQAAB6epAAAAAAAIAAAACAAAAAgAAAAIAA").sameElements(pD))
  }

  test("unsupported rANS order is rejected loudly") {
    val bad = Array[Byte](2, 0, 0, 0, 0, 0, 0, 0, 0)
    val e = intercept[IllegalArgumentException](
      graft.sources.formats.CramFormat.decompress(4, bad))
    assert(e.getMessage.contains("order"))
  }

  test("bzip2 and lzma/xz block payloads decode") {
    val data = ("bzip2 and lzma round " * 8).getBytes("US-ASCII")
    val bz = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream(bos)
      out.write(data); out.close(); bos.toByteArray
    }
    assert(graft.sources.formats.CramFormat.decompress(2, bz).sameElements(data))
    val xz = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new org.apache.commons.compress.compressors.xz.XZCompressorOutputStream(bos)
      out.write(data); out.close(); bos.toByteArray
    }
    assert(graft.sources.formats.CramFormat.decompress(3, xz).sameElements(data))
    val lzma = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new org.apache.commons.compress.compressors.lzma.LZMACompressorOutputStream(bos)
      out.write(data); out.close(); bos.toByteArray
    }
    assert(graft.sources.formats.CramFormat.decompress(3, lzma).sameElements(data))
  }
}
