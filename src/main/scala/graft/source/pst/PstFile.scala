package graft.source.pst

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, Path}

/** Node Database (NDB) layer of the PST binary format — the same layer
  * the reference consumes through pstsdk (typed_bag.hpp:116-152,
  * table_function.cpp:100-212). Parses BOTH on-disk formats: Unicode
  * (wVer ≥ 23, 64-bit BIDs/IBs) and ANSI (wVer 14/15, the pre-Outlook-
  * 2003 32-bit layout) — header, node/block b-trees (NBT/BBT), block
  * data trees (XBLOCK/XXBLOCK), subnode b-trees (SLBLOCK/SIBLOCK), and
  * the NDB_CRYPT_PERMUTE byte-substitution coding of external data
  * blocks. The LTP layer above ([[PstLtp]]) is byte-identical across
  * the two formats, so format width is confined to this file.
  *
  * The layout follows the public MS-PST specification; all offsets and
  * structures were additionally validated against the reference's
  * checked-in `test/unittest.pst` fixture (CRC of every block verified
  * with the spec's CRC algorithm — see PstFileSpec), and the ANSI
  * branch against a structurally re-emitted ANSI twin of that fixture
  * (see AnsiPstWriter / PstAnsiSpec).
  */
object PstCrypt {

  /** Decode table for NDB_CRYPT_PERMUTE (bCryptMethod = 1): stored byte
    * → plain byte. This is the permutative-coding byte-substitution
    * table published in the open MS-PST specification (§5.1, "Permutative
    * Encoding"); the same table ships in open-source PST readers
    * (libpff, java-libpst). Independently cross-validated against the
    * reference's checked-in `test/unittest.pst` fixture by
    * known-plaintext analysis: 222 entries were recovered purely from
    * structural constants of the heap/BTH/PC/TC layers, UTF-16/STRING8
    * text, JPEG quantization/Huffman tables and public property-set
    * GUIDs, and a full structural re-parse of the fixture (monotonic
    * heap page maps, valid BTH/PC records, clean text in every string
    * property) passes with this table only.
    */
  val decodeTable: Array[Int] = Array(
    0x47, 0xf1, 0xb4, 0xe6, 0x0b, 0x6a, 0x72, 0x48, 0x85, 0x4e, 0x9e, 0xeb,
    0xe2, 0xf8, 0x94, 0x53, 0xe0, 0xbb, 0xa0, 0x02, 0xe8, 0x5a, 0x09, 0xab,
    0xdb, 0xe3, 0xba, 0xc6, 0x7c, 0xc3, 0x10, 0xdd, 0x39, 0x05, 0x96, 0x30,
    0xf5, 0x37, 0x60, 0x82, 0x8c, 0xc9, 0x13, 0x4a, 0x6b, 0x1d, 0xf3, 0xfb,
    0x8f, 0x26, 0x97, 0xca, 0x91, 0x17, 0x01, 0xc4, 0x32, 0x2d, 0x6e, 0x31,
    0x95, 0xff, 0xd9, 0x23, 0xd1, 0x00, 0x5e, 0x79, 0xdc, 0x44, 0x3b, 0x1a,
    0x28, 0xc5, 0x61, 0x57, 0x20, 0x90, 0x3d, 0x83, 0xb9, 0x43, 0xbe, 0x67,
    0xd2, 0x46, 0x42, 0x76, 0xc0, 0x6d, 0x5b, 0x7e, 0xb2, 0x0f, 0x16, 0x29,
    0x3c, 0xa9, 0x03, 0x54, 0x0d, 0xda, 0x5d, 0xdf, 0xf6, 0xb7, 0xc7, 0x62,
    0xcd, 0x8d, 0x06, 0xd3, 0x69, 0x5c, 0x86, 0xd6, 0x14, 0xf7, 0xa5, 0x66,
    0x75, 0xac, 0xb1, 0xe9, 0x45, 0x21, 0x70, 0x0c, 0x87, 0x9f, 0x74, 0xa4,
    0x22, 0x4c, 0x6f, 0xbf, 0x1f, 0x56, 0xaa, 0x2e, 0xb3, 0x78, 0x33, 0x50,
    0xb0, 0xa3, 0x92, 0xbc, 0xcf, 0x19, 0x1c, 0xa7, 0x63, 0xcb, 0x1e, 0x4d,
    0x3e, 0x4b, 0x1b, 0x9b, 0x4f, 0xe7, 0xf0, 0xee, 0xad, 0x3a, 0xb5, 0x59,
    0x04, 0xea, 0x40, 0x55, 0x25, 0x51, 0xe5, 0x7a, 0x89, 0x38, 0x68, 0x52,
    0x7b, 0xfc, 0x27, 0xae, 0xd7, 0xbd, 0xfa, 0x07, 0xf4, 0xcc, 0x8e, 0x5f,
    0xef, 0x35, 0x9c, 0x84, 0x2b, 0x15, 0xd5, 0x77, 0x34, 0x49, 0xb6, 0x12,
    0x0a, 0x7f, 0x71, 0x88, 0xfd, 0x9d, 0x18, 0x41, 0x7d, 0x93, 0xd8, 0x58,
    0x2c, 0xce, 0xfe, 0x24, 0xaf, 0xde, 0xb8, 0x36, 0xc8, 0xa1, 0x80, 0xa6,
    0x99, 0x98, 0xa8, 0x2f, 0x0e, 0x81, 0x65, 0x73, 0xe4, 0xc2, 0xa2, 0x8a,
    0xd4, 0xe1, 0x11, 0xd0, 0x08, 0x8b, 0x2a, 0xf2, 0xed, 0x9a, 0x64, 0x3f,
    0xc1, 0x6c, 0xf9, 0xec)

  def decodePermute(data: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](data.length)
    var i = 0
    while (i < data.length) {
      out(i) = decodeTable(data(i) & 0xFF).toByte
      i += 1
    }
    out
  }
}

/** Little-endian primitive reads over byte arrays. */
object Lit {
  def u8(b: Array[Byte], o: Int): Int  = b(o) & 0xFF
  def u16(b: Array[Byte], o: Int): Int = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) | ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
  def u32(b: Array[Byte], o: Int): Long = i32(b, o) & 0xFFFFFFFFL
  def i64(b: Array[Byte], o: Int): Long = {
    var v = 0L
    var k = 7
    while (k >= 0) { v = (v << 8) | (b(o + k) & 0xFF); k -= 1 }
    v
  }
}

final case class NbtEntry(nid: Long, bidData: Long, bidSub: Long, nidParent: Long) {
  def nidType: Int = (nid & 0x1F).toInt
}
final case class BbtEntry(bid: Long, ib: Long, cb: Int)

/** One open PST file. Thread-unsafe; each Spark task opens its own. */
final class PstFile(in: FSDataInputStream, val length: Long) extends AutoCloseable {
  import Lit._

  /** Bytes read through this handle (scan-metric support). */
  var bytesRead: Long = 0L

  private def readAt(off: Long, len: Int): Array[Byte] = {
    val buf = new Array[Byte](len)
    in.readFully(off, buf, 0, len)
    bytesRead += len
    buf
  }

  // ── header (MS-PST §2.2.2.6; Unicode and ANSI layouts) ─────────────
  private val header = readAt(0L, 600)
  require(header(0) == '!' && header(1) == 'B' && header(2) == 'D' && header(3) == 'N',
    "not a PST file (missing !BDN magic)")
  val wVer: Int = u16(header, 10)
  /** ANSI (pre-Outlook-2003, wVer 14/15) vs Unicode (wVer ≥ 23): the
    * two on-disk formats differ only in field widths (32- vs 64-bit
    * BIDs/IBs) and the resulting header/page/entry offsets — pstsdk
    * gives the reference the same dual support (typed_bag.hpp consumes
    * pstsdk::pst, which handles both header versions).
    */
  val ansi: Boolean = wVer == 14 || wVer == 15
  require(ansi || wVer >= 23,
    s"unrecognized PST format version wVer=$wVer (ANSI is 14/15, Unicode is >=23)")
  val cryptMethod: Int = u8(header, if (ansi) 461 else 513)
  require(cryptMethod <= 1,
    s"unsupported bCryptMethod=$cryptMethod (only none/permute)")
  val fileEof: Long = if (ansi) u32(header, 168) else i64(header, 184)
  /** rgnid[32] per-nid-type allocation counters (Unicode @44, ANSI @36). */
  val rgnid: Array[Byte] =
    java.util.Arrays.copyOfRange(header, if (ansi) 36 else 44, (if (ansi) 36 else 44) + 128)
  // ROOT BREFs: ANSI root@164 → NBT (bid@184, ib@188), BBT (bid@192,
  // ib@196), 4 bytes each; Unicode root@180 → NBT (216, 224), BBT
  // (232, 240), 8 bytes each.
  private val nbtRoot =
    if (ansi) (u32(header, 184), u32(header, 188))
    else (i64(header, 216), i64(header, 224)) // (bid, ib)
  private val bbtRoot =
    if (ansi) (u32(header, 192), u32(header, 196))
    else (i64(header, 232), i64(header, 240))

  /** BID/IB at `o`: 4 bytes in ANSI, 8 in Unicode. */
  private def ref(b: Array[Byte], o: Int): Long = if (ansi) u32(b, o) else i64(b, o)
  /** BTPAGE metadata block: rgentries is 496 bytes in ANSI (no
    * dwPadding, 12-byte trailer), 488 in Unicode — so cEnt/cEntMax/
    * cbEnt/cLevel sit at 496.. vs 488.., and ptype at 500 vs 496.
    */
  private val pgMeta: Int  = if (ansi) 496 else 488
  private val pgType: Int  = if (ansi) 500 else 496

  // ── node / block b-trees (pages are never encoded) ─────────────────

  /** Full NBT enumeration — plan-time node discovery and folder child
    * counting. Readers doing row work use [[nodeEntry]]/[[blockEntry]]
    * point lookups instead, so a task touching k nodes reads O(k · tree
    * depth) pages, not the whole index.
    */
  lazy val nodes: Map[Long, NbtEntry] = {
    val m = mutable.LinkedHashMap[Long, NbtEntry]()
    walkBt(nbtRoot._2, 0x81)(e => { val n = decodeNbt(e); m(n.nid) = n })
    m.toMap
  }

  /** Leaf NBTENTRY: ANSI packs nid/bidData/bidSub at 4-byte stride,
    * Unicode at 8 (nidParent is 4 bytes in both).
    */
  private def decodeNbt(e: Array[Byte]): NbtEntry =
    if (ansi) NbtEntry(u32(e, 0), u32(e, 4), u32(e, 8), u32(e, 12))
    else NbtEntry(i64(e, 0), i64(e, 8), i64(e, 16), u32(e, 24))

  /** Leaf BBTENTRY: BREF (bid, ib) then cb — 4+4+2 ANSI, 8+8+2 Unicode. */
  private def decodeBbt(e: Array[Byte]): BbtEntry =
    if (ansi) BbtEntry(u32(e, 0), u32(e, 4), u16(e, 8))
    else BbtEntry(i64(e, 0), i64(e, 8), u16(e, 16))

  private def walkBt(ib: Long, ptype: Int)(leaf: Array[Byte] => Unit): Unit = {
    val page = btPage(ib, ptype)
    val cEnt   = u8(page, pgMeta)
    val cbEnt  = u8(page, pgMeta + 2)
    val cLevel = u8(page, pgMeta + 3)
    var i = 0
    while (i < cEnt) {
      val off = i * cbEnt
      // intermediate BTENTRY: btkey then BREF → child ib at key-width +
      // bid-width (8 in ANSI, 16 in Unicode)
      if (cLevel > 0) walkBt(ref(page, off + (if (ansi) 8 else 16)), ptype)(leaf)
      else leaf(java.util.Arrays.copyOfRange(page, off, off + cbEnt))
      i += 1
    }
  }

  // b-tree pages touched by this handle (bounded by the task's working
  // set; one 512-byte page per entry)
  private val pageCache = mutable.HashMap[Long, Array[Byte]]()
  private def btPage(ib: Long, ptype: Int): Array[Byte] = {
    val page = pageCache.getOrElseUpdate(ib, readAt(ib, 512))
    require(u8(page, pgType) == ptype, s"unexpected page type at $ib")
    page
  }

  /** Descend one b-tree to the leaf entry with the exact `key`
    * (MS-PST §2.2.2.7.7: entries sorted ascending, internal entries
    * carry the subtree's first key).
    */
  private def btSearch(rootIb: Long, ptype: Int, key: Long): Option[Array[Byte]] = {
    var ib = rootIb
    while (true) {
      val page   = btPage(ib, ptype)
      val cEnt   = u8(page, pgMeta)
      val cbEnt  = u8(page, pgMeta + 2)
      val cLevel = u8(page, pgMeta + 3)
      if (cEnt == 0) return None
      // greatest entry with btkey <= key (keys are unsigned but share a
      // sign region in practice; compare unsigned to be safe)
      var lo = 0
      var hi = cEnt - 1
      var pos = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val k = if (ansi) u32(page, mid * cbEnt) else i64(page, mid * cbEnt)
        if (java.lang.Long.compareUnsigned(k, key) <= 0) {
          pos = mid; lo = mid + 1
        } else hi = mid - 1
      }
      if (pos < 0) return None
      val off = pos * cbEnt
      if (cLevel > 0) ib = ref(page, off + (if (ansi) 8 else 16))
      else {
        val k = if (ansi) u32(page, off) else i64(page, off)
        return if (k == key)
          Some(java.util.Arrays.copyOfRange(page, off, off + cbEnt))
        else None
      }
    }
    None // unreachable
  }

  /** Point lookup in the node b-tree. */
  def nodeEntry(nid: Long): Option[NbtEntry] =
    btSearch(nbtRoot._2, 0x81, nid).map(decodeNbt)

  /** Point lookup in the block b-tree. */
  def blockEntry(bid: Long): Option[BbtEntry] =
    btSearch(bbtRoot._2, 0x80, bid).map(decodeBbt)

  // ── blocks ────────────────────────────────────────────────────────
  /** Raw stored bytes of one block (trailer removed, no decode). */
  private def blockRaw(bid: Long): Array[Byte] = {
    val e = blockEntry(bid).getOrElse(
      throw new IllegalStateException(s"unknown bid $bid"))
    readAt(e.ib, e.cb)
  }

  private def isInternal(bid: Long): Boolean = (bid & 2L) != 0

  /** Leaf (external) data block, decoded per bCryptMethod. */
  private def leafData(bid: Long): Array[Byte] = {
    val raw = blockRaw(bid)
    if (cryptMethod == 1) PstCrypt.decodePermute(raw) else raw
  }

  /** Resolve a data bid (possibly an XBLOCK/XXBLOCK tree) to its leaf
    * blocks in order.
    */
  def dataBlocks(bid: Long): Seq[Array[Byte]] = {
    if (bid == 0) Nil
    else if (!isInternal(bid)) Seq(leafData(bid))
    else {
      val d = blockRaw(bid) // internal blocks are never encoded
      require(u8(d, 0) == 1, "expected XBLOCK/XXBLOCK")
      val cLevel = u8(d, 1)
      val cEnt   = u16(d, 2)
      // rgbid starts at 8 (after lcbTotal) in both formats; entries are
      // 4-byte bids in ANSI, 8-byte in Unicode
      val w = if (ansi) 4 else 8
      (0 until cEnt).flatMap { i =>
        val sub = ref(d, 8 + w * i)
        if (cLevel > 1) dataBlocks(sub) else Seq(leafData(sub))
      }
    }
  }

  def nodeData(bid: Long): Array[Byte] = {
    val parts = dataBlocks(bid)
    if (parts.isEmpty) Array.emptyByteArray
    else if (parts.length == 1) parts.head
    else {
      val out = new Array[Byte](parts.map(_.length).sum)
      var o = 0
      parts.foreach { p => System.arraycopy(p, 0, out, o, p.length); o += p.length }
      out
    }
  }

  /** Subnode b-tree (SLBLOCK/SIBLOCK) → nid → (bidData, bidSub). */
  def subnodes(bidSub: Long): Map[Long, (Long, Long)] = {
    val m = mutable.HashMap[Long, (Long, Long)]()
    def walk(bid: Long): Unit = {
      if (bid == 0) return
      val d = blockRaw(bid)
      require(u8(d, 0) == 2, "expected SLBLOCK/SIBLOCK")
      val cLevel = u8(d, 1)
      val cEnt   = u16(d, 2)
      // Unicode has a 4-byte dwPadding before the entry array (start 8)
      // that ANSI lacks (start 4); SLENTRY is (nid, bidData, bidSub)
      // and SIENTRY (nid, bid) at the format's field width
      val base = if (ansi) 4 else 8
      val fw   = if (ansi) 4 else 8
      var i = 0
      while (i < cEnt) {
        if (cLevel == 0) {
          val o = base + 3 * fw * i
          val nid = u32(d, o) // low 32 bits are the subnode nid
          m(nid) = (ref(d, o + fw), ref(d, o + 2 * fw))
        } else walk(ref(d, base + 2 * fw * i + fw))
        i += 1
      }
    }
    walk(bidSub)
    m.toMap
  }

  override def close(): Unit = in.close()
}

object PstFile {
  def open(path: String, conf: Configuration): PstFile = {
    // b-tree walks are seek-based: length-less remote schemes (http/s)
    // resolve to a JVM-cached local copy (graft.source.LocalBuffer)
    val p  = graft.source.LocalBuffer.resolvePath(path, conf)
    val fs = p.getFileSystem(conf)
    new PstFile(fs.open(p), fs.getFileStatus(p).getLen)
  }
}
