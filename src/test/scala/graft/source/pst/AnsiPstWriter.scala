package graft.source.pst

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration

/** Test-side Unicode→ANSI PST re-emitter.
  *
  * There is no public ANSI (pre-Outlook-2003) PST fixture to test the
  * reader's ANSI branch against — the reference's checked-in
  * `test/unittest.pst` is Unicode — so this tool re-emits that file's
  * complete logical NDB content (every node, its data-block leaf
  * sequence, and its subnode tree) in the ANSI on-disk layout of the
  * public MS-PST specification: 512-byte ANSI header, 32-bit BIDs/IBs,
  * 12-byte block/page trailers, 496-byte BTPAGE entry regions, and
  * narrow XBLOCK/SLBLOCK entries. Leaf data-block boundaries are
  * preserved exactly (the heap-on-node layer addresses blocks by
  * index), so the LTP/messaging layers read back bit-identically.
  *
  * Trailers carry honest checksums: the spec's CRC (raw CRC-32,
  * polynomial 0xEDB88320, init 0, no final complement — verified
  * against every stored block and b-tree page of the Unicode fixture)
  * and the block/page signature word sig(ib, bid). Allocation maps are
  * not emitted; the header marks them invalid (fAMapValid = 0), which
  * readers must treat as "rebuild before trusting" per the spec.
  *
  * Not part of the shipped library: PST *write* support is out of
  * scope (the reference is read-only too) — this exists solely to
  * manufacture the ANSI fixture used by PstAnsiSpec and the
  * `q_pst_ansi_*` registry queries.
  */
object AnsiPstWriter {
  import Lit._

  /** Inverse of the NDB_CRYPT_PERMUTE decode table. */
  private lazy val encodeTable: Array[Byte] = {
    val enc = new Array[Byte](256)
    var i = 0
    while (i < 256) { enc(PstCrypt.decodeTable(i)) = i.toByte; i += 1 }
    enc
  }

  private def encodePermute(data: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](data.length)
    var i = 0
    while (i < data.length) { out(i) = encodeTable(data(i) & 0xFF); i += 1 }
    out
  }

  // raw CRC-32: poly 0xEDB88320, init 0, no final xor (MS-PST §5.3;
  // verified against dwCRCPartial, every block trailer and every
  // b-tree page trailer of the reference's Unicode fixture)
  private lazy val crcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i
      var k = 0
      while (k < 8) { c = (c >>> 1) ^ (if ((c & 1) != 0) 0xEDB88320 else 0); k += 1 }
      t(i) = c; i += 1
    }
    t
  }

  def crc(d: Array[Byte], from: Int, len: Int): Int = {
    var c = 0
    var i = from
    while (i < from + len) { c = crcTable((c ^ d(i)) & 0xFF) ^ (c >>> 8); i += 1 }
    c
  }

  /** Block/page signature word (MS-PST §5.5). */
  private def sig(ib: Long, bid: Long): Int = {
    val x = ib ^ bid
    (((x >> 16) ^ x) & 0xFFFF).toInt
  }

  private def put16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
  }
  private def put32(b: Array[Byte], o: Int, v: Long): Unit = {
    var i = 0
    while (i < 4) { b(o + i) = (v >> (8 * i)).toByte; i += 1 }
  }

  private final case class Blk(bid: Long, stored: Array[Byte])

  def convert(src: String, dst: String): Unit = {
    val pst = PstFile.open(src, new Configuration())
    try write(pst, dst)
    finally pst.close()
  }

  private def write(pst: PstFile, dst: String): Unit = {
    require(!pst.ansi, "source must be a Unicode PST")

    val blocks = mutable.ArrayBuffer[Blk]()
    var nextBid = 4L
    def alloc(internal: Boolean): Long = {
      val b = nextBid | (if (internal) 2L else 0L); nextBid += 4; b
    }
    def addBlock(internal: Boolean, stored: Array[Byte]): Long = {
      val bid = alloc(internal); blocks += Blk(bid, stored); bid
    }

    def putLeaf(decoded: Array[Byte]): Long =
      addBlock(internal = false,
        if (pst.cryptMethod == 1) encodePermute(decoded) else decoded)

    // memoized per source bid: Unicode files share blocks across nodes
    val dataMemo = mutable.HashMap[Long, Long]()
    val subMemo  = mutable.HashMap[Long, Long]()

    /** Data tree → ANSI: same leaf sequence, one-level XBLOCK if >1
      * (ANSI XBLOCK holds 2043 leaves ≈ 16 MiB of data; the multi-level
      * case cannot arise from a fixture this size).
      */
    def convData(bidU: Long): Long =
      if (bidU == 0) 0L
      else dataMemo.getOrElseUpdate(bidU, {
        val leaves = pst.dataBlocks(bidU)
        if (leaves.isEmpty) 0L
        else if (leaves.length == 1) putLeaf(leaves.head)
        else {
          val kids = leaves.map(putLeaf)
          val d = new Array[Byte](8 + 4 * kids.length)
          d(0) = 1; d(1) = 1 // btype=XBLOCK, cLevel=1
          put16(d, 2, kids.length)
          put32(d, 4, leaves.map(_.length.toLong).sum) // lcbTotal
          kids.zipWithIndex.foreach { case (k, i) => put32(d, 8 + 4 * i, k) }
          addBlock(internal = true, d)
        }
      })

    /** Subnode tree → one flat ANSI SLBLOCK, entries sorted by nid
      * ((nid, bidData, bidSub) at 4-byte widths, array base 4 — ANSI
      * has no dwPadding).
      */
    def convSub(bidU: Long): Long =
      if (bidU == 0) 0L
      else subMemo.getOrElseUpdate(bidU, {
        val entries = pst.subnodes(bidU).toSeq.sortBy(_._1).map {
          case (nid, (bd, bs)) => (nid, convData(bd), convSub(bs))
        }
        if (entries.isEmpty) 0L
        else {
          val d = new Array[Byte](4 + 12 * entries.length)
          d(0) = 2; d(1) = 0 // btype=SLBLOCK, cLevel=0
          put16(d, 2, entries.length)
          entries.zipWithIndex.foreach { case ((nid, bd, bs), i) =>
            put32(d, 4 + 12 * i, nid)
            put32(d, 4 + 12 * i + 4, bd)
            put32(d, 4 + 12 * i + 8, bs)
          }
          addBlock(internal = true, d)
        }
      })

    val newNodes = pst.nodes.values.toSeq.sortBy(_.nid).map { e =>
      (e.nid, convData(e.bidData), convSub(e.bidSub), e.nidParent)
    }

    // ── physical layout: header | blocks (64-aligned) | pages (512) ──
    var off = 512L
    val placedBlocks = blocks.map { blk =>
      val slot = ((blk.stored.length + 12 + 63) / 64) * 64
      val p = (blk, off, slot); off += slot; p
    }
    val pagesStart = ((off + 511) / 512) * 512

    // b-tree pages, built bottom-up so child ibs are known
    val pages = mutable.ArrayBuffer[(Long, Array[Byte])]() // (ib, 500-byte body sans trailer-tail)
    var nextPageBid = nextBid
    def addPage(entries: Seq[Array[Byte]], cbEnt: Int, cLevel: Int, ptype: Int): (Long, Long, Long) = {
      val body = new Array[Byte](500)
      entries.zipWithIndex.foreach { case (e, i) =>
        System.arraycopy(e, 0, body, i * cbEnt, cbEnt)
      }
      body(496) = entries.length.toByte
      body(497) = (496 / cbEnt).toByte // cEntMax
      body(498) = cbEnt.toByte
      body(499) = cLevel.toByte
      val ib = pagesStart + 512L * pages.length
      val bid = nextPageBid; nextPageBid += 4
      // trailer (ptype, ptypeRepeat, wSig, bid, dwCRC) appended at write
      pages += ((ib, body :+ ptype.toByte))
      (bid, ib, ib)
    }

    /** Build one ANSI b-tree over sorted leaf entries (btkey = first 4
      * bytes of each entry); returns the root BREF.
      */
    def buildTree(leafEntries: Seq[Array[Byte]], cbEnt: Int, ptype: Int): (Long, Long) = {
      val perLeaf = 496 / cbEnt
      var level = leafEntries.grouped(perLeaf).toSeq.map { grp =>
        val (bid, ib, _) = addPage(grp, cbEnt, 0, ptype)
        (grp.head.take(4), bid, ib) // (first key, page bid, page ib)
      }
      var cLevel = 1
      while (level.length > 1) {
        val perPage = 496 / 12
        level = level.grouped(perPage).toSeq.map { grp =>
          val ents = grp.map { case (key, bid, ib) =>
            val e = new Array[Byte](12)
            System.arraycopy(key, 0, e, 0, 4)
            put32(e, 4, bid); put32(e, 8, ib)
            e
          }
          val (bid, ib, _) = addPage(ents, 12, cLevel, ptype)
          (grp.head._1, bid, ib)
        }
        cLevel += 1
      }
      (level.head._2, level.head._3)
    }

    val bbtEntries = placedBlocks.map { case (blk, ib, _) =>
      val e = new Array[Byte](12)
      put32(e, 0, blk.bid); put32(e, 4, ib)
      put16(e, 8, blk.stored.length); put16(e, 10, 2) // cRef
      e
    }.toSeq
    val nbtEntries = newNodes.map { case (nid, bd, bs, parent) =>
      val e = new Array[Byte](16)
      put32(e, 0, nid); put32(e, 4, bd); put32(e, 8, bs); put32(e, 12, parent)
      e
    }
    val (bbtBid, bbtIb) = buildTree(bbtEntries, 12, 0x80)
    val (nbtBid, nbtIb) = buildTree(nbtEntries, 16, 0x81)

    val fileEof = pagesStart + 512L * pages.length
    val out = new Array[Byte](fileEof.toInt)

    // ── ANSI header (MS-PST §2.2.2.6) ────────────────────────────────
    out(0) = '!'; out(1) = 'B'; out(2) = 'D'; out(3) = 'N'
    out(8) = 'S'; out(9) = 'M' // wMagicClient
    put16(out, 10, 15)         // wVer: ANSI
    put16(out, 12, 12)         // wVerClient
    out(14) = 1; out(15) = 1   // bPlatformCreate/Access
    put32(out, 24, nextBid)     // bidNextB
    put32(out, 28, nextPageBid) // bidNextP
    put32(out, 32, 1L)          // dwUnique
    // rgnid[32]: copy the Unicode header's allocation counters verbatim
    // (Unicode @44, ANSI @36, 128 bytes in both)
    System.arraycopy(pst.rgnid, 0, out, 36, 128)
    // ROOT @164
    put32(out, 168, fileEof)    // ibFileEof
    put32(out, 172, 0L)         // ibAMapLast (fAMapValid=0: maps absent)
    put32(out, 184, nbtBid); put32(out, 188, nbtIb)
    put32(out, 192, bbtBid); put32(out, 196, bbtIb)
    out(200) = 0                // fAMapValid
    java.util.Arrays.fill(out, 204, 460, 0xFF.toByte) // rgbFM + rgbFP
    out(460) = 0x80.toByte      // bSentinel
    out(461) = pst.cryptMethod.toByte
    put32(out, 4, crc(out, 8, 471)) // dwCRCPartial

    // ── blocks: stored bytes + 12-byte trailer at slot end ───────────
    placedBlocks.foreach { case (blk, ib, slot) =>
      System.arraycopy(blk.stored, 0, out, ib.toInt, blk.stored.length)
      val t = (ib + slot - 12).toInt
      put16(out, t, blk.stored.length)
      put16(out, t + 2, sig(ib, blk.bid))
      put32(out, t + 4, crc(blk.stored, 0, blk.stored.length))
      put32(out, t + 8, blk.bid)
    }

    // ── pages: 500-byte body + (ptype, ptypeRepeat, wSig, bid, dwCRC) ─
    pages.zipWithIndex.foreach { case ((ib, bodyAndType), i) =>
      val ptype = bodyAndType(500)
      System.arraycopy(bodyAndType, 0, out, ib.toInt, 500)
      val pageBid = nextBid + 4L * i // same sequence addPage used
      out(ib.toInt + 500) = ptype; out(ib.toInt + 501) = ptype
      put16(out, ib.toInt + 502, sig(ib, pageBid))
      put32(out, ib.toInt + 504, pageBid)
      put32(out, ib.toInt + 508, crc(out, ib.toInt, 500))
    }

    val p = new java.io.FileOutputStream(dst)
    try p.write(out) finally p.close()
  }
}

/** One-off fixture generator: `sbt "Test/runMain graft.source.pst.AnsiGen"`
  * writes `fixtures/mailbox/unittest_ansi.pst` from the reference's
  * Unicode fixture.
  */
object AnsiGen {
  def main(args: Array[String]): Unit = {
    val dst = if (args.nonEmpty) args(0) else "fixtures/mailbox/unittest_ansi.pst"
    AnsiPstWriter.convert("/root/reference/test/unittest.pst", dst)
    println(s"wrote $dst")
  }
}
