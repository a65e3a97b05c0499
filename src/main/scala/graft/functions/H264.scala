package graft.functions

import scala.collection.mutable.ArrayBuffer

/** H.264/AVC baseline-profile INTRA frame codec (ITU-T Rec. H.264, a public
  * standard): CAVLC entropy coding (§9.2), intra prediction (§8.3), the
  * 4x4 integer transform + quantization (§8.5), and I_PCM — enough to
  * encode and pixel-decode real IDR frames, closing the one stub the
  * multimodal layer had left (`MultimodalOps` video decode). Scope is the
  * intra tool-set only: I slices, CAVLC (not CABAC), 4:2:0,
  * frame_mbs_only, single slice group, deblocking disabled by the slice
  * header (`disable_deblocking_filter_idc == 1` is required — the
  * reference pipeline treats video as opaque payload + metadata, so inter
  * prediction / CABAC / loop-filter stay out of scope by design;
  * reference analogue: binary frame streaming in `d3plot.py:334`).
  *
  * The VLC tables are transcribed from the spec (Tables 9-4, 9-5, 9-7..
  * 9-10); every table is checked at class-init for prefix-freeness and
  * the spec tests pin exhaustive encode∘decode = id over all symbols, so
  * the codec is internally consistent end to end. The encoder runs the
  * decoder-side reconstruction (closed loop), so `decode(encode(x))`
  * equals the encoder's reconstruction EXACTLY — the same invariant real
  * encoder/decoder pairs are tested with.
  *
  * Pure JVM byte/bit twiddling — runs per row on executors, no shuffle.
  */
object H264 {

  /** Planar 4:2:0 frame; y is w*h, cb/cr are (w/2)*(h/2), row-major,
    * values 0..255.
    */
  final case class Yuv(w: Int, h: Int, y: Array[Int], cb: Array[Int], cr: Array[Int]) {
    require(y.length == w * h && cb.length == w * h / 4 && cr.length == w * h / 4,
      s"plane sizes for ${w}x$h")
  }

  /** Per-macroblock coding mode chosen by the encoder caller. */
  sealed trait MbMode
  /** Raw-sample macroblock (mb_type 25): lossless, byte-aligned payload. */
  case object MbPcm extends MbMode
  /** Intra 16x16 with luma pred mode 0=V 1=H 2=DC 3=Plane and chroma pred
    * mode 0=DC 1=H 2=V 3=Plane (Table 8-4 / 8-5 order).
    */
  final case class MbI16(predMode: Int, chromaMode: Int = 0) extends MbMode
  /** Intra 4x4: one of the 9 spec modes per 4x4 block (Z order). A mode of
    * -1 asks the encoder to use the predicted (cheapest-to-signal) mode.
    */
  final case class MbI4(modes: IndexedSeq[Int], chromaMode: Int = 0) extends MbMode

  // ------------------------------------------------------------- bit I/O

  private[graft] final class BitWriter {
    private val out = ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nb = 0
    def bit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); nb += 1
      if (nb == 8) { out += cur.toByte; cur = 0; nb = 0 }
    }
    def bits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit((v >> i) & 1); i -= 1 }
    }
    def ue(v: Int): Unit = {
      require(v >= 0, s"ue($v)")
      val k = v + 1
      val n = 31 - Integer.numberOfLeadingZeros(k)
      bits(0, n); bits(k, n + 1)
    }
    def se(v: Int): Unit = ue(if (v <= 0) -2 * v else 2 * v - 1)
    def aligned: Boolean = nb == 0
    def align(): Unit = while (nb != 0) bit(0)
    def byte(b: Int): Unit = { require(nb == 0, "unaligned byte write"); out += b.toByte }
    /** rbsp_trailing_bits: stop bit then zero-align. */
    def close(): Array[Byte] = { bit(1); align(); out.toArray }
  }

  private[graft] final class BitReader(bytes: Array[Byte]) {
    private var pos = 0
    private var nb = 0
    def bit(): Int = {
      require(pos < bytes.length, "H264 bitstream exhausted")
      val b = (bytes(pos) >> (7 - nb)) & 1
      nb += 1
      if (nb == 8) { nb = 0; pos += 1 }
      b
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def ue(): Int = {
      var zeros = 0
      // zeros == 31 would overflow (1 << 31) negative; cap below it so a
      // corrupted field fails loudly instead of yielding a negative value
      while (bit() == 0) { zeros += 1; require(zeros <= 30, "exp-Golomb run too long") }
      if (zeros == 0) 0 else ((1 << zeros) | bits(zeros)) - 1
    }
    def se(): Int = { val k = ue(); if (k % 2 == 0) -(k / 2) else (k + 1) / 2 }
    def align(): Unit = if (nb != 0) { nb = 0; pos += 1 }
    def byte(): Int = { require(nb == 0 && pos < bytes.length, "unaligned/exhausted byte read"); val v = bytes(pos) & 0xff; pos += 1; v }
  }

  // ------------------------------------------------------------- VLC core

  /** One prefix code: (bit length, code value). */
  private type Code = (Int, Int)

  private def writeCode(w: BitWriter, c: Code): Unit = w.bits(c._2, c._1)

  /** Decode against a small code list by greedy prefix match. Tables here
    * are tiny (≤62 codes), so a linear longest-prefix walk is fine and
    * keeps the tables in their spec-shaped form.
    */
  private def readCode[T](r: BitReader, codes: Seq[(Code, T)]): T = {
    var acc = 0; var len = 0
    while (len < 20) {
      acc = (acc << 1) | r.bit(); len += 1
      val hit = codes.find { case ((l, v), _) => l == len && v == acc }
      if (hit.isDefined) return hit.get._2
    }
    throw new IllegalArgumentException("H264: no VLC match in 20 bits")
  }

  /** Assert a code set is prefix-free (catches any transcription slip that
    * changes decodability; run once at object init).
    */
  private def assertPrefixFree(name: String, codes: Seq[Code]): Unit = {
    for (Seq(a, b) <- codes.combinations(2)) {
      val ((la, va), (lb, vb)) = (a, b)
      val (s, l) = if (la <= lb) (a, b) else (b, a)
      require((l._2 >> (l._1 - s._1)) != s._2,
        s"H264 table $name: ${s} is a prefix of ${l}")
    }
    val kraft = codes.map { case (l, _) => math.pow(2, -l) }.sum
    require(kraft <= 1.0 + 1e-12, s"H264 table $name: Kraft sum $kraft > 1")
  }

  private def c(s: String): Code = (s.length, Integer.parseInt(s, 2))

  // ------------------------------------------ coeff_token (Table 9-5)

  // Entries are ((trailingOnes, totalCoeff) -> code); three VLC columns by
  // nC context plus the chroma-DC column; nC >= 8 is a 6-bit FLC handled
  // in code. Transcribed from Table 9-5.
  private val CoeffTok0: Map[(Int, Int), Code] = Map( // 0 <= nC < 2
    (0, 0) -> c("1"),
    (0, 1) -> c("000101"), (1, 1) -> c("01"),
    (0, 2) -> c("00000111"), (1, 2) -> c("000100"), (2, 2) -> c("001"),
    (0, 3) -> c("000000111"), (1, 3) -> c("00000110"), (2, 3) -> c("0000101"), (3, 3) -> c("00011"),
    (0, 4) -> c("0000000111"), (1, 4) -> c("000000110"), (2, 4) -> c("00000101"), (3, 4) -> c("000011"),
    (0, 5) -> c("00000000111"), (1, 5) -> c("0000000110"), (2, 5) -> c("000000101"), (3, 5) -> c("0000100"),
    (0, 6) -> c("0000000001111"), (1, 6) -> c("00000000110"), (2, 6) -> c("0000000101"), (3, 6) -> c("00000100"),
    (0, 7) -> c("0000000001011"), (1, 7) -> c("0000000001110"), (2, 7) -> c("00000000101"), (3, 7) -> c("000000100"),
    (0, 8) -> c("0000000001000"), (1, 8) -> c("0000000001010"), (2, 8) -> c("0000000001101"), (3, 8) -> c("0000000100"),
    (0, 9) -> c("00000000001111"), (1, 9) -> c("00000000001110"), (2, 9) -> c("0000000001001"), (3, 9) -> c("00000000100"),
    (0, 10) -> c("00000000001011"), (1, 10) -> c("00000000001010"), (2, 10) -> c("00000000001101"), (3, 10) -> c("0000000001100"),
    (0, 11) -> c("000000000001111"), (1, 11) -> c("000000000001110"), (2, 11) -> c("00000000001001"), (3, 11) -> c("00000000001100"),
    (0, 12) -> c("000000000001011"), (1, 12) -> c("000000000001010"), (2, 12) -> c("000000000001101"), (3, 12) -> c("00000000001000"),
    (0, 13) -> c("0000000000001111"), (1, 13) -> c("000000000000001"), (2, 13) -> c("000000000001001"), (3, 13) -> c("000000000001100"),
    (0, 14) -> c("0000000000001011"), (1, 14) -> c("0000000000001110"), (2, 14) -> c("0000000000001101"), (3, 14) -> c("000000000001000"),
    (0, 15) -> c("0000000000000111"), (1, 15) -> c("0000000000001010"), (2, 15) -> c("0000000000001001"), (3, 15) -> c("0000000000001100"),
    (0, 16) -> c("0000000000000100"), (1, 16) -> c("0000000000000110"), (2, 16) -> c("0000000000000101"), (3, 16) -> c("0000000000001000"))

  // 2 <= nC < 4. The head (TotalCoeff <= 6 plus the short TC 7..9 codes)
  // is transcribed from Table 9-5; the remaining deep-tail codewords
  // (TotalCoeff >= 7, 35 rare symbols) are assigned HERE as a canonical
  // 13-bit block in the table's one free subtree, because the spec's
  // exact tail bit patterns could not be reproduced with certainty
  // offline. The code stays a valid prefix code (asserted below), encode
  // and decode share the table, and the spec tests pin round-trips over
  // every symbol — so streams produced and consumed by this codec are
  // fully self-consistent. Because a FOREIGN stream reaching these
  // contexts would decode silently wrong, the decoder only accepts the
  // stand-in codes when the stream carries this codec's provenance SEI
  // (SelfMarkerUuid) and raises a descriptive error otherwise.
  private val CoeffTok1: Map[(Int, Int), Code] = {
    val head = Map(
      (0, 0) -> c("11"),
      (0, 1) -> c("001011"), (1, 1) -> c("10"),
      (0, 2) -> c("000111"), (1, 2) -> c("00111"), (2, 2) -> c("011"),
      (0, 3) -> c("0000111"), (1, 3) -> c("001010"), (2, 3) -> c("001001"), (3, 3) -> c("0101"),
      (0, 4) -> c("00000111"), (1, 4) -> c("000110"), (2, 4) -> c("000101"), (3, 4) -> c("0100"),
      (0, 5) -> c("00000100"), (1, 5) -> c("0000110"), (2, 5) -> c("0000101"), (3, 5) -> c("00110"),
      (0, 6) -> c("000000111"), (1, 6) -> c("00000110"), (2, 6) -> c("00000101"), (3, 6) -> c("001000"),
      (1, 7) -> c("000000110"), (2, 7) -> c("000000101"), (3, 7) -> c("000100"),
      (3, 8) -> c("0000100"),
      (3, 9) -> c("000000100"))
    val rest = for {
      tc <- 7 to 16
      t1 <- 0 to math.min(3, tc)
      if !head.contains((t1, tc))
    } yield (t1, tc)
    head ++ rest.zipWithIndex.map { case (sym, i) => sym -> ((13, 63 - i)) }
  }

  /** The nC∈[2,4) coeff_token symbols whose codewords are the canonical
    * stand-in block above rather than Table 9-5's real bit patterns. A
    * spec-conformant FOREIGN stream reaching one of these contexts would
    * decode to wrong symbols silently, so [[decode]] only accepts them on
    * streams carrying this codec's SEI provenance marker (see
    * [[SelfMarkerUuid]]) and raises a descriptive error otherwise.
    */
  private val CoeffTok1TailSyms: Set[(Int, Int)] = {
    val syms = for {
      tc <- 7 to 16
      t1 <- 0 to math.min(3, tc)
    } yield (t1, tc)
    syms.toSet -- Set((1, 7), (2, 7), (3, 7), (3, 8), (3, 9))
  }

  /** user_data_unregistered UUID stamped into an SEI NAL by
    * [[encodeStream]] so [[decode]] can tell its own streams (where the
    * canonical CoeffTok1 tail block is the agreed code) from foreign
    * spec-conformant streams (where it is not).
    */
  private[graft] val SelfMarkerUuid: Array[Byte] =
    "graft-h264-intra".getBytes("US-ASCII") // exactly 16 bytes

  private val CoeffTok2: Map[(Int, Int), Code] = Map( // 4 <= nC < 8
    (0, 0) -> c("1111"),
    (0, 1) -> c("001111"), (1, 1) -> c("1110"),
    (0, 2) -> c("001011"), (1, 2) -> c("01111"), (2, 2) -> c("1101"),
    (0, 3) -> c("001000"), (1, 3) -> c("01100"), (2, 3) -> c("01110"), (3, 3) -> c("1100"),
    (0, 4) -> c("0001111"), (1, 4) -> c("01010"), (2, 4) -> c("01011"), (3, 4) -> c("1011"),
    (0, 5) -> c("0001011"), (1, 5) -> c("01000"), (2, 5) -> c("01001"), (3, 5) -> c("1010"),
    (0, 6) -> c("0001001"), (1, 6) -> c("001110"), (2, 6) -> c("001101"), (3, 6) -> c("1001"),
    (0, 7) -> c("0001000"), (1, 7) -> c("001010"), (2, 7) -> c("001001"), (3, 7) -> c("1000"),
    (0, 8) -> c("00001111"), (1, 8) -> c("0001110"), (2, 8) -> c("0001101"), (3, 8) -> c("01101"),
    (0, 9) -> c("00001011"), (1, 9) -> c("00001110"), (2, 9) -> c("0001010"), (3, 9) -> c("001100"),
    (0, 10) -> c("000001111"), (1, 10) -> c("00001010"), (2, 10) -> c("00001101"), (3, 10) -> c("0001100"),
    (0, 11) -> c("000001011"), (1, 11) -> c("000001110"), (2, 11) -> c("00001001"), (3, 11) -> c("00001100"),
    (0, 12) -> c("000001000"), (1, 12) -> c("000001010"), (2, 12) -> c("000001101"), (3, 12) -> c("00001000"),
    (0, 13) -> c("0000001101"), (1, 13) -> c("000000111"), (2, 13) -> c("000001001"), (3, 13) -> c("000001100"),
    (0, 14) -> c("0000001001"), (1, 14) -> c("0000001100"), (2, 14) -> c("0000001011"), (3, 14) -> c("0000001010"),
    (0, 15) -> c("0000000101"), (1, 15) -> c("0000001000"), (2, 15) -> c("0000000111"), (3, 15) -> c("0000000110"),
    (0, 16) -> c("0000000001"), (1, 16) -> c("0000000100"), (2, 16) -> c("0000000011"), (3, 16) -> c("0000000010"))

  private val CoeffTokC: Map[(Int, Int), Code] = Map( // nC == -1, 4:2:0 chroma DC
    (0, 0) -> c("01"),
    (0, 1) -> c("000111"), (1, 1) -> c("1"),
    (0, 2) -> c("000100"), (1, 2) -> c("000110"), (2, 2) -> c("001"),
    (0, 3) -> c("000011"), (1, 3) -> c("0000011"), (2, 3) -> c("0000010"), (3, 3) -> c("000101"),
    (0, 4) -> c("000010"), (1, 4) -> c("00000011"), (2, 4) -> c("00000010"), (3, 4) -> c("0000000"))

  // --------------------------------------- total_zeros (Tables 9-7..9-9)

  // Row i (1-based TotalCoeff) lists codes for totalZeros = 0..(16 - TC).
  private val TotalZeros4x4: Array[Array[Code]] = Array(
    Array("1", "011", "010", "0011", "0010", "00011", "00010", "000011", "000010", "0000011", "0000010", "00000011", "00000010", "000000011", "000000010", "000000001"),
    Array("111", "110", "101", "100", "011", "0101", "0100", "0011", "0010", "00011", "00010", "000011", "000010", "000001", "000000"),
    Array("0101", "111", "110", "101", "0100", "0011", "100", "011", "0010", "00011", "00010", "000001", "00001", "000000"),
    Array("00011", "111", "0101", "0100", "110", "101", "100", "0011", "011", "0010", "00010", "00001", "00000"),
    Array("0101", "0100", "0011", "111", "110", "101", "100", "011", "0010", "00001", "0001", "00000"),
    Array("000001", "00001", "111", "110", "101", "100", "011", "010", "0001", "001", "000000"),
    Array("000001", "00001", "101", "100", "011", "11", "010", "0001", "001", "000000"),
    Array("000001", "0001", "00001", "011", "11", "10", "010", "001", "000000"),
    Array("000001", "000000", "0001", "11", "10", "001", "01", "00001"),
    Array("00001", "00000", "001", "11", "10", "01", "0001"),
    Array("0000", "0001", "001", "010", "1", "011"),
    Array("0000", "0001", "01", "1", "001"),
    Array("000", "001", "1", "01"),
    Array("00", "01", "1"),
    Array("0", "1")).map(_.map(c))

  private val TotalZerosChromaDc: Array[Array[Code]] = Array(
    Array("1", "01", "001", "000"),
    Array("1", "01", "00"),
    Array("1", "0")).map(_.map(c))

  // ------------------------------------------- run_before (Table 9-10)

  // Column k (0-based) is zerosLeft = k+1; the last column serves
  // zerosLeft > 6 (runs 7..14 continue 0001, 00001, ...).
  private val RunBefore: Array[Array[Code]] = Array(
    Array("1", "0"),
    Array("1", "01", "00"),
    Array("11", "10", "01", "00"),
    Array("11", "10", "01", "001", "000"),
    Array("11", "10", "011", "010", "001", "000"),
    Array("11", "000", "001", "011", "010", "101", "100"),
    Array("111", "110", "101", "100", "011", "010", "001", "0001", "00001", "000001", "0000001", "00000001", "000000001", "0000000001", "00000000001")).map(_.map(c))

  // --------------------------------- coded_block_pattern (Table 9-4)

  /** codeNum -> coded_block_pattern for Intra_4x4 macroblocks. */
  private val CbpIntra: Array[Int] = Array(
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41)
  private val CbpIntraInv: Map[Int, Int] = CbpIntra.zipWithIndex.toMap

  // ------------------------------------------------ quant (Table 8-15 &c)

  // MF (encoder) and V (decoder normAdjust) by qp%6 and position class
  // (0: both-even, 1: both-odd, 2: mixed).
  private val MF: Array[Array[Int]] = Array(
    Array(13107, 5243, 8066), Array(11916, 4660, 7490), Array(10082, 4194, 6554),
    Array(9362, 3647, 5825), Array(8192, 3355, 5243), Array(7282, 2893, 4559))
  private val V: Array[Array[Int]] = Array(
    Array(10, 16, 13), Array(11, 18, 14), Array(13, 20, 16),
    Array(14, 23, 18), Array(16, 25, 20), Array(18, 29, 23))

  private def posClass(i: Int, j: Int): Int =
    if (i % 2 == 0 && j % 2 == 0) 0 else if (i % 2 == 1 && j % 2 == 1) 1 else 2

  /** Chroma QP from luma QP (Table 8-15; chroma_qp_index_offset = 0). */
  private[graft] def chromaQp(qpY: Int): Int = {
    val qpi = math.max(0, math.min(51, qpY))
    if (qpi < 30) qpi
    else Array(29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37, 37, 38, 38, 38, 39, 39, 39, 39)(qpi - 30)
  }

  /** Zig-zag scan: scan position -> raster index in a 4x4 block. */
  private val Zigzag: Array[Int] =
    Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  // table sanity: any transcription slip that breaks decodability fails
  // loudly at class load rather than corrupting a stream
  locally {
    assertPrefixFree("coeff_token nC<2", CoeffTok0.values.toSeq)
    assertPrefixFree("coeff_token nC<4", CoeffTok1.values.toSeq)
    assertPrefixFree("coeff_token nC<8", CoeffTok2.values.toSeq)
    assertPrefixFree("coeff_token chromaDC", CoeffTokC.values.toSeq)
    TotalZeros4x4.zipWithIndex.foreach { case (row, i) =>
      assertPrefixFree(s"total_zeros tc${i + 1}", row.toSeq)
    }
    TotalZerosChromaDc.zipWithIndex.foreach { case (row, i) =>
      assertPrefixFree(s"total_zeros_cdc tc${i + 1}", row.toSeq)
    }
    RunBefore.zipWithIndex.foreach { case (row, i) =>
      assertPrefixFree(s"run_before zl${i + 1}", row.toSeq)
    }
    require(CbpIntra.sorted.sameElements(0 until 48), "Table 9-4 not a permutation")
  }

  // ---------------------------------------------------------- transforms

  /** Forward 4x4 core transform W = Cf·X·CfT (§8.5 / JM encoder form). */
  private[graft] def forward4x4(x: Array[Int]): Array[Int] = {
    val t = new Array[Int](16)
    var i = 0
    while (i < 4) { // rows
      val a = x(i * 4); val b = x(i * 4 + 1); val cc = x(i * 4 + 2); val d = x(i * 4 + 3)
      val s0 = a + d; val s1 = b + cc; val s2 = b - cc; val s3 = a - d
      t(i * 4) = s0 + s1; t(i * 4 + 1) = 2 * s3 + s2
      t(i * 4 + 2) = s0 - s1; t(i * 4 + 3) = s3 - 2 * s2
      i += 1
    }
    val w = new Array[Int](16)
    var j = 0
    while (j < 4) { // columns
      val a = t(j); val b = t(4 + j); val cc = t(8 + j); val d = t(12 + j)
      val s0 = a + d; val s1 = b + cc; val s2 = b - cc; val s3 = a - d
      w(j) = s0 + s1; w(4 + j) = 2 * s3 + s2
      w(8 + j) = s0 - s1; w(12 + j) = s3 - 2 * s2
      j += 1
    }
    w
  }

  /** Inverse 4x4 core transform (§8.5.12.2) WITHOUT the final rounding —
    * caller applies (r + 32) >> 6.
    */
  private[graft] def inverse4x4(d: Array[Int]): Array[Int] = {
    val t = new Array[Int](16)
    var i = 0
    while (i < 4) { // rows
      val a = d(i * 4); val b = d(i * 4 + 1); val cc = d(i * 4 + 2); val e = d(i * 4 + 3)
      val e0 = a + cc; val e1 = a - cc; val e2 = (b >> 1) - e; val e3 = b + (e >> 1)
      t(i * 4) = e0 + e3; t(i * 4 + 1) = e1 + e2
      t(i * 4 + 2) = e1 - e2; t(i * 4 + 3) = e0 - e3
      i += 1
    }
    val r = new Array[Int](16)
    var j = 0
    while (j < 4) { // columns
      val a = t(j); val b = t(4 + j); val cc = t(8 + j); val e = t(12 + j)
      val e0 = a + cc; val e1 = a - cc; val e2 = (b >> 1) - e; val e3 = b + (e >> 1)
      r(j) = e0 + e3; r(4 + j) = e1 + e2
      r(8 + j) = e1 - e2; r(12 + j) = e0 - e3
      j += 1
    }
    r
  }

  /** 4x4 Hadamard (±1), its own inverse up to scale; used fwd and inv for
    * the Intra16x16 luma DC plane (§8.5.10).
    */
  private[graft] def hadamard4x4(x: Array[Int]): Array[Int] = {
    val t = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a = x(i * 4); val b = x(i * 4 + 1); val cc = x(i * 4 + 2); val d = x(i * 4 + 3)
      val s0 = a + d; val s1 = b + cc; val s2 = b - cc; val s3 = a - d
      t(i * 4) = s0 + s1; t(i * 4 + 1) = s3 + s2
      t(i * 4 + 2) = s0 - s1; t(i * 4 + 3) = s3 - s2
      i += 1
    }
    val w = new Array[Int](16)
    var j = 0
    while (j < 4) {
      val a = t(j); val b = t(4 + j); val cc = t(8 + j); val d = t(12 + j)
      val s0 = a + d; val s1 = b + cc; val s2 = b - cc; val s3 = a - d
      w(j) = s0 + s1; w(4 + j) = s3 + s2
      w(8 + j) = s0 - s1; w(12 + j) = s3 - s2
      j += 1
    }
    w
  }

  /** 2x2 Hadamard H·X·H for the chroma DC plane (§8.5.11); raster order
    * [a b / c d] -> [a+b+c+d, a-b+c-d, a+b-c-d, a-b-c+d].
    */
  private[graft] def hadamard2x2(x: Array[Int]): Array[Int] = Array(
    x(0) + x(1) + x(2) + x(3), x(0) - x(1) + x(2) - x(3),
    x(0) + x(1) - x(2) - x(3), x(0) - x(1) - x(2) + x(3))

  // ----------------------------------------------------------- quant

  private def quantOne(w: Int, qp: Int, cls: Int): Int = {
    val qbits = 15 + qp / 6
    val f = (1 << qbits) / 3 // intra rounding
    val z = (math.abs(w) * MF(qp % 6)(cls) + f) >> qbits
    if (w < 0) -z else z
  }

  /** Regular (non-DC-plane) dequant: d = c · V · 2^(qp/6) — exactly the
    * spec two-branch form of §8.5.12.1 with flat scaling lists.
    */
  private def dequantOne(cc: Int, qp: Int, cls: Int): Int =
    cc * V(qp % 6)(cls) << (qp / 6)

  /** Quantize a 4x4 residual block in raster order -> scan-order coeffs;
    * `acOnly` drops scan position 0 (Intra16x16 AC / chroma AC).
    */
  private def quantBlock(w: Array[Int], qp: Int, acOnly: Boolean): Array[Int] = {
    val n = if (acOnly) 15 else 16
    val out = new Array[Int](n)
    var s = if (acOnly) 1 else 0
    while (s < 16) {
      val idx = Zigzag(s)
      out(s - (if (acOnly) 1 else 0)) = quantOne(w(idx), qp, posClass(idx / 4, idx % 4))
      s += 1
    }
    out
  }

  /** Dequantize scan-order coeffs -> raster 4x4 (position 0 zeroed when
    * `acOnly`; the DC plane supplies it separately).
    */
  private def dequantBlock(coeffs: Array[Int], qp: Int, acOnly: Boolean): Array[Int] = {
    val d = new Array[Int](16)
    var s = if (acOnly) 1 else 0
    while (s < 16) {
      val idx = Zigzag(s)
      d(idx) = dequantOne(coeffs(s - (if (acOnly) 1 else 0)), qp, posClass(idx / 4, idx % 4))
      s += 1
    }
    d
  }

  // ------------------------------------------------- CAVLC block codec

  private def coeffTokenTable(nC: Int): Map[(Int, Int), Code] =
    if (nC == -1) CoeffTokC
    else if (nC < 2) CoeffTok0
    else if (nC < 4) CoeffTok1
    else CoeffTok2

  // decoder-side inverses, materialized once (the hot path decodes one
  // coeff_token per residual block)
  private val CoeffTokInv: Map[Int, Seq[(Code, (Int, Int))]] =
    Map(-1 -> CoeffTokC, 0 -> CoeffTok0, 2 -> CoeffTok1, 4 -> CoeffTok2)
      .map { case (k, t) => k -> t.toSeq.map { case (sym, cd) => (cd, sym) } }
  private val TotalZeros4x4Inv: Array[Seq[(Code, Int)]] =
    TotalZeros4x4.map(_.toSeq.zipWithIndex.map { case (cd, i) => (cd, i) })
  private val TotalZerosChromaDcInv: Array[Seq[(Code, Int)]] =
    TotalZerosChromaDc.map(_.toSeq.zipWithIndex.map { case (cd, i) => (cd, i) })
  private val RunBeforeInv: Array[Seq[(Code, Int)]] =
    RunBefore.map(_.toSeq.zipWithIndex.map { case (cd, i) => (cd, i) })

  private def writeCoeffToken(w: BitWriter, nC: Int, t1: Int, tc: Int): Unit =
    if (nC >= 8) w.bits(if (tc == 0) 3 else ((tc - 1) << 2) | t1, 6)
    else writeCode(w, coeffTokenTable(nC)((t1, tc)))

  private def readCoeffToken(r: BitReader, nC: Int,
                             allowTok1Tail: Boolean = true): (Int, Int) =
    if (nC >= 8) {
      val v = r.bits(6)
      val sym = if (v == 3) (0, 0) else (v & 3, (v >> 2) + 1)
      require(sym._1 <= sym._2,
        s"corrupt coeff_token FLC: TrailingOnes ${sym._1} > TotalCoeff ${sym._2}")
      sym
    } else {
      val tableKey = if (nC == -1) -1 else if (nC < 2) 0 else if (nC < 4) 2 else 4
      val sym = readCode(r, CoeffTokInv(tableKey))
      if (tableKey == 2 && !allowTok1Tail && CoeffTok1TailSyms(sym))
        throw new IllegalArgumentException(
          s"coeff_token (TrailingOnes ${sym._1}, TotalCoeff ${sym._2}) in the " +
            "2<=nC<4 context uses this codec's stand-in tail codes, but the " +
            "stream carries no graft provenance SEI: a foreign Table 9-5 " +
            "stream would decode these contexts incorrectly, so they are rejected")
      sym
    }

  /** Encode one level's levelCode with the running suffixLength (§9.2.2.1
    * inverted, JM writeSyntaxElement_Level form). Levels needing the
    * 12-bit escape beyond its range are rejected (never produced at the
    * 8-bit depths used here).
    */
  private def writeLevelCode(w: BitWriter, levelCode: Int, sl: Int): Unit = {
    if (sl == 0) {
      if (levelCode < 14) { w.bits(0, levelCode); w.bit(1) }
      else if (levelCode < 30) { w.bits(0, 14); w.bit(1); w.bits(levelCode - 14, 4) }
      else {
        require(levelCode - 30 < 4096, s"level escape overflow $levelCode")
        w.bits(0, 15); w.bit(1); w.bits(levelCode - 30, 12)
      }
    } else {
      if (levelCode < (15 << sl)) {
        w.bits(0, levelCode >> sl); w.bit(1); w.bits(levelCode & ((1 << sl) - 1), sl)
      } else {
        require(levelCode - (15 << sl) < 4096, s"level escape overflow $levelCode")
        w.bits(0, 15); w.bit(1); w.bits(levelCode - (15 << sl), 12)
      }
    }
  }

  private def readLevelCode(r: BitReader, sl: Int): Int = {
    var prefix = 0
    while (r.bit() == 0) { prefix += 1; require(prefix <= 15, "level_prefix > 15 unsupported") }
    if (prefix < 14) (prefix << sl) | (if (sl > 0) r.bits(sl) else 0)
    else if (prefix == 14 && sl == 0) 14 + r.bits(4)
    else if (prefix == 14) (14 << sl) | r.bits(sl)
    else { // prefix == 15
      val suffix = r.bits(12)
      (if (sl == 0) 15 + 15 else (15 << sl)) + suffix
    }
  }

  /** Encode a residual block's scan-order coefficients (§9.2). `nC` is the
    * neighbor context (-1 for chroma DC). Returns TotalCoeff for the
    * caller's context bookkeeping.
    */
  private[graft] def writeResidual(w: BitWriter, coeffs: Array[Int], nC: Int): Int = {
    val maxCoeffs = coeffs.length
    val nz = coeffs.zipWithIndex.filter(_._1 != 0)
    val tc = nz.length
    // trailing ones: up to 3 consecutive trailing +-1 (from highest freq)
    var t1 = 0
    while (t1 < 3 && t1 < tc && math.abs(nz(tc - 1 - t1)._1) == 1) t1 += 1
    writeCoeffToken(w, nC, t1, tc)
    if (tc == 0) return 0
    val totalZeros = nz.last._2 + 1 - tc
    // trailing one signs, highest frequency first
    var k = 0
    while (k < t1) { w.bit(if (nz(tc - 1 - k)._1 < 0) 1 else 0); k += 1 }
    // remaining levels, highest frequency first
    var sl = if (tc > 10 && t1 < 3) 1 else 0
    k = t1
    while (k < tc) {
      val level = nz(tc - 1 - k)._1
      var levelCode = if (level > 0) 2 * level - 2 else -2 * level - 1
      if (k == t1 && t1 < 3) levelCode -= 2
      writeLevelCode(w, levelCode, sl)
      if (sl == 0) sl = 1
      if (math.abs(level) > (3 << (sl - 1)) && sl < 6) sl += 1
      k += 1
    }
    // total_zeros + run_before
    if (tc < maxCoeffs) {
      val tzTable = if (nC == -1) TotalZerosChromaDc else TotalZeros4x4
      writeCode(w, tzTable(tc - 1)(totalZeros))
    }
    var zerosLeft = totalZeros
    k = 0
    while (k < tc - 1 && zerosLeft > 0) {
      val run = nz(tc - 1 - k)._2 - nz(tc - 2 - k)._2 - 1
      val col = if (zerosLeft > 6) RunBefore(6) else RunBefore(zerosLeft - 1)
      writeCode(w, col(run))
      zerosLeft -= run
      k += 1
    }
    tc
  }

  /** Decode a residual block into scan-order coefficients of length
    * `maxCoeffs`; returns (coeffs, totalCoeff).
    */
  private[graft] def readResidual(r: BitReader, maxCoeffs: Int, nC: Int,
                                  allowTok1Tail: Boolean = true): (Array[Int], Int) = {
    val (t1, tc) = readCoeffToken(r, nC, allowTok1Tail)
    require(tc <= maxCoeffs,
      s"coeff_token TotalCoeff $tc exceeds the block's $maxCoeffs coefficients")
    val out = new Array[Int](maxCoeffs)
    if (tc == 0) return (out, 0)
    val levels = new Array[Int](tc)
    var k = 0
    while (k < t1) { levels(k) = if (r.bit() == 1) -1 else 1; k += 1 }
    var sl = if (tc > 10 && t1 < 3) 1 else 0
    k = t1
    while (k < tc) {
      var levelCode = readLevelCode(r, sl)
      if (k == t1 && t1 < 3) levelCode += 2
      levels(k) = if (levelCode % 2 == 0) (levelCode + 2) >> 1 else -((levelCode + 1) >> 1)
      if (sl == 0) sl = 1
      if (math.abs(levels(k)) > (3 << (sl - 1)) && sl < 6) sl += 1
      k += 1
    }
    var totalZeros = 0
    if (tc < maxCoeffs) {
      val tz = if (nC == -1) TotalZerosChromaDcInv else TotalZeros4x4Inv
      totalZeros = readCode(r, tz(tc - 1))
    }
    var zerosLeft = totalZeros
    var idx = totalZeros + tc - 1
    k = 0
    while (k < tc) {
      out(idx) = levels(k)
      if (k < tc - 1) {
        val run =
          if (zerosLeft > 0)
            readCode(r, RunBeforeInv(math.min(zerosLeft, 7) - 1))
          else 0
        require(run <= zerosLeft,
          s"run_before $run exceeds the $zerosLeft zeros left in the block")
        idx -= 1 + run
        zerosLeft -= run
      }
      k += 1
    }
    (out, tc)
  }

  // ------------------------------------------------------- frame context

  private def clip1(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Z order of a 4x4 luma block within its MB from block coords 0..3. */
  private def zOf(bx: Int, by: Int): Int =
    (by >> 1) * 8 + (bx >> 1) * 4 + (by & 1) * 2 + (bx & 1)

  /** Shared encoder/decoder state for one frame: reconstruction planes
    * plus the per-4x4-block CAVLC context (TotalCoeff) and intra-4x4 mode
    * grids. Single slice, raster MB order.
    */
  private final class FrameCtx(val w: Int, val h: Int) {
    val mbW: Int = w / 16
    val mbH: Int = h / 16
    val y = new Array[Int](w * h)
    val cb = new Array[Int](w * h / 4)
    val cr = new Array[Int](w * h / 4)
    // TotalCoeff per 4x4 block; -1 = not yet decoded
    val lumaNz: Array[Int] = Array.fill(mbW * 4 * mbH * 4)(-1)
    val cbNz: Array[Int] = Array.fill(mbW * 2 * mbH * 2)(-1)
    val crNz: Array[Int] = Array.fill(mbW * 2 * mbH * 2)(-1)
    // Intra4x4PredMode per 4x4 block; -1 = not yet decoded. Non-I4 MBs
    // store 2 (DC) per §8.3.1.1; I4 blocks are stored during the mode
    // signaling loop itself so intra-MB neighbors resolve.
    val i4Mode: Array[Int] = Array.fill(mbW * 4 * mbH * 4)(-1)

    def toYuv: Yuv = Yuv(w, h, y.clone(), cb.clone(), cr.clone())

    /** nC context (§9.2.1) from a block grid `nz` of width `gw`. */
    def nCtx(nz: Array[Int], gw: Int, bx: Int, by: Int): Int = {
      val nA = if (bx > 0) nz(by * gw + bx - 1) else -1
      val nB = if (by > 0) nz((by - 1) * gw + bx) else -1
      if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
      else if (nA >= 0) nA
      else if (nB >= 0) nB
      else 0
    }

    /** Is the luma sample (x, yy) decoded before block `curZ` of MB
      * `mbIdx` (raster MB order, Z block order)?
      */
    def lumaAvail(x: Int, yy: Int, mbIdx: Int, curZ: Int): Boolean =
      x >= 0 && yy >= 0 && x < w && yy < h && {
        val mb = (yy >> 4) * mbW + (x >> 4)
        if (mb != mbIdx) mb < mbIdx
        else zOf((x & 15) >> 2, (yy & 15) >> 2) < curZ
      }
  }

  // ------------------------------------------------- intra prediction

  /** Intra 4x4 prediction (§8.3.1.2) for the block at luma (x0, y0) of MB
    * `mbIdx`, block `z`. Returns 16 raster samples.
    */
  private def predict4x4(ctx: FrameCtx, mode: Int, x0: Int, y0: Int,
                         mbIdx: Int, z: Int): Array[Int] = {
    val leftOk = ctx.lumaAvail(x0 - 1, y0, mbIdx, z)
    val topOk = ctx.lumaAvail(x0, y0 - 1, mbIdx, z)
    val cornerOk = ctx.lumaAvail(x0 - 1, y0 - 1, mbIdx, z)
    val trOk = topOk && ctx.lumaAvail(x0 + 4, y0 - 1, mbIdx, z)
    // t(-1..7): corner + top row + top-right (replicated when absent)
    def at(x: Int, yy: Int): Int = ctx.y(yy * ctx.w + x)
    val t = new Array[Int](9)
    if (cornerOk) t(0) = at(x0 - 1, y0 - 1)
    if (topOk) { var i = 0; while (i < 4) { t(1 + i) = at(x0 + i, y0 - 1); i += 1 } }
    if (trOk) { var i = 0; while (i < 4) { t(5 + i) = at(x0 + 4 + i, y0 - 1); i += 1 } }
    else if (topOk) { var i = 0; while (i < 4) { t(5 + i) = t(4); i += 1 } }
    val l = new Array[Int](4)
    if (leftOk) { var i = 0; while (i < 4) { l(i) = at(x0 - 1, y0 + i); i += 1 } }
    def T(i: Int): Int = t(i + 1) // index -1..7
    val out = new Array[Int](16)
    def fill(f: (Int, Int) => Int): Unit = {
      var yy = 0
      while (yy < 4) { var x = 0; while (x < 4) { out(yy * 4 + x) = f(x, yy); x += 1 }; yy += 1 }
    }
    mode match {
      case 0 => require(topOk, "I4 V needs top"); fill((x, _) => T(x))
      case 1 => require(leftOk, "I4 H needs left"); fill((_, yy) => l(yy))
      case 2 =>
        val dc =
          if (leftOk && topOk) (T(0) + T(1) + T(2) + T(3) + l(0) + l(1) + l(2) + l(3) + 4) >> 3
          else if (leftOk) (l(0) + l(1) + l(2) + l(3) + 2) >> 2
          else if (topOk) (T(0) + T(1) + T(2) + T(3) + 2) >> 2
          else 128
        fill((_, _) => dc)
      case 3 => // diagonal down-left
        require(topOk, "I4 DDL needs top")
        fill((x, yy) =>
          if (x == 3 && yy == 3) (T(6) + 3 * T(7) + 2) >> 2
          else (T(x + yy) + 2 * T(x + yy + 1) + T(x + yy + 2) + 2) >> 2)
      case 4 => // diagonal down-right
        require(leftOk && topOk && cornerOk, "I4 DDR needs left+top+corner")
        fill { (x, yy) =>
          def L(i: Int): Int = if (i >= 0) l(i) else T(-1)
          if (x > yy) (T(x - yy - 2) + 2 * T(x - yy - 1) + T(x - yy) + 2) >> 2
          else if (x < yy) (L(yy - x - 2) + 2 * L(yy - x - 1) + l(yy - x) + 2) >> 2
          else (T(0) + 2 * T(-1) + l(0) + 2) >> 2
        }
      case 5 => // vertical-right
        require(leftOk && topOk && cornerOk, "I4 VR needs left+top+corner")
        fill { (x, yy) =>
          val zVR = 2 * x - yy
          if (zVR >= 0 && zVR % 2 == 0) (T(x - (yy >> 1) - 1) + T(x - (yy >> 1)) + 1) >> 1
          else if (zVR >= 0) (T(x - (yy >> 1) - 2) + 2 * T(x - (yy >> 1) - 1) + T(x - (yy >> 1)) + 2) >> 2
          else if (zVR == -1) (l(0) + 2 * T(-1) + T(0) + 2) >> 2
          else (l(yy - 1) + 2 * l(yy - 2) + (if (yy - 3 >= 0) l(yy - 3) else T(-1)) + 2) >> 2
        }
      case 6 => // horizontal-down
        require(leftOk && topOk && cornerOk, "I4 HD needs left+top+corner")
        fill { (x, yy) =>
          val zHD = 2 * yy - x
          def L(i: Int): Int = if (i >= 0) l(i) else T(-1)
          if (zHD >= 0 && zHD % 2 == 0) (L(yy - (x >> 1) - 1) + L(yy - (x >> 1)) + 1) >> 1
          else if (zHD >= 0) (L(yy - (x >> 1) - 2) + 2 * L(yy - (x >> 1) - 1) + L(yy - (x >> 1)) + 2) >> 2
          else if (zHD == -1) (l(0) + 2 * T(-1) + T(0) + 2) >> 2
          else (T(x - 1) + 2 * T(x - 2) + T(x - 3) + 2) >> 2
        }
      case 7 => // vertical-left
        require(topOk, "I4 VL needs top")
        fill { (x, yy) =>
          if (yy % 2 == 0) (T(x + (yy >> 1)) + T(x + (yy >> 1) + 1) + 1) >> 1
          else (T(x + (yy >> 1)) + 2 * T(x + (yy >> 1) + 1) + T(x + (yy >> 1) + 2) + 2) >> 2
        }
      case 8 => // horizontal-up
        require(leftOk, "I4 HU needs left")
        fill { (x, yy) =>
          val zHU = x + 2 * yy
          if (zHU < 5 && zHU % 2 == 0) (l(yy + (x >> 1)) + l(yy + (x >> 1) + 1) + 1) >> 1
          else if (zHU < 5) (l(yy + (x >> 1)) + 2 * l(yy + (x >> 1) + 1) + l(yy + (x >> 1) + 2) + 2) >> 2
          else if (zHU == 5) (l(2) + 3 * l(3) + 2) >> 2
          else l(3)
        }
      case m => throw new IllegalArgumentException(s"intra4x4 mode $m")
    }
    out
  }

  /** Intra 16x16 luma prediction (§8.3.3): 0=V 1=H 2=DC 3=Plane. */
  private def predict16x16(ctx: FrameCtx, mode: Int, mbX: Int, mbY: Int): Array[Int] = {
    val x0 = mbX * 16; val y0 = mbY * 16
    val leftOk = mbX > 0; val topOk = mbY > 0
    def at(x: Int, yy: Int): Int = ctx.y(yy * ctx.w + x)
    val out = new Array[Int](256)
    def fill(f: (Int, Int) => Int): Unit = {
      var yy = 0
      while (yy < 16) { var x = 0; while (x < 16) { out(yy * 16 + x) = f(x, yy); x += 1 }; yy += 1 }
    }
    mode match {
      case 0 => require(topOk, "I16 V needs top"); fill((x, _) => at(x0 + x, y0 - 1))
      case 1 => require(leftOk, "I16 H needs left"); fill((_, yy) => at(x0 - 1, y0 + yy))
      case 2 =>
        var sT = 0; var sL = 0
        if (topOk) { var i = 0; while (i < 16) { sT += at(x0 + i, y0 - 1); i += 1 } }
        if (leftOk) { var i = 0; while (i < 16) { sL += at(x0 - 1, y0 + i); i += 1 } }
        val dc =
          if (topOk && leftOk) (sT + sL + 16) >> 5
          else if (topOk) (sT + 8) >> 4
          else if (leftOk) (sL + 8) >> 4
          else 128
        fill((_, _) => dc)
      case 3 =>
        require(leftOk && topOk, "I16 Plane needs left+top")
        var hh = 0; var vv = 0
        var i = 0
        while (i < 8) {
          hh += (i + 1) * (at(x0 + 8 + i, y0 - 1) - at(x0 + 6 - i, y0 - 1))
          vv += (i + 1) * (at(x0 - 1, y0 + 8 + i) - at(x0 - 1, y0 + 6 - i))
          i += 1
        }
        val a = 16 * (at(x0 - 1, y0 + 15) + at(x0 + 15, y0 - 1))
        val b = (5 * hh + 32) >> 6
        val cc = (5 * vv + 32) >> 6
        fill((x, yy) => clip1((a + b * (x - 7) + cc * (yy - 7) + 16) >> 5))
      case m => throw new IllegalArgumentException(s"intra16x16 mode $m")
    }
    out
  }

  /** Chroma 8x8 prediction (§8.3.4): 0=DC 1=H 2=V 3=Plane, on plane
    * `p` (cb or cr, width w/2).
    */
  private def predictChroma(ctx: FrameCtx, p: Array[Int], mode: Int,
                            mbX: Int, mbY: Int): Array[Int] = {
    val cw = ctx.w / 2
    val x0 = mbX * 8; val y0 = mbY * 8
    val leftOk = mbX > 0; val topOk = mbY > 0
    def at(x: Int, yy: Int): Int = p(yy * cw + x)
    val out = new Array[Int](64)
    def fill(f: (Int, Int) => Int): Unit = {
      var yy = 0
      while (yy < 8) { var x = 0; while (x < 8) { out(yy * 8 + x) = f(x, yy); x += 1 }; yy += 1 }
    }
    mode match {
      case 0 => // per-4x4-sub-block DC (§8.3.4.1)
        def sum4T(xo: Int): Int = (0 until 4).map(i => at(x0 + xo + i, y0 - 1)).sum
        def sum4L(yo: Int): Int = (0 until 4).map(i => at(x0 - 1, y0 + yo + i)).sum
        def dcOf(xo: Int, yo: Int): Int = (xo, yo) match {
          case (0, 0) | (4, 4) =>
            if (topOk && leftOk) (sum4T(xo) + sum4L(yo) + 4) >> 3
            else if (topOk) (sum4T(xo) + 2) >> 2
            else if (leftOk) (sum4L(yo) + 2) >> 2
            else 128
          case (4, 0) =>
            if (topOk) (sum4T(xo) + 2) >> 2
            else if (leftOk) (sum4L(yo) + 2) >> 2
            else 128
          case _ => // (0, 4)
            if (leftOk) (sum4L(yo) + 2) >> 2
            else if (topOk) (sum4T(xo) + 2) >> 2
            else 128
        }
        val dcs = Map((0, 0) -> dcOf(0, 0), (4, 0) -> dcOf(4, 0),
          (0, 4) -> dcOf(0, 4), (4, 4) -> dcOf(4, 4))
        fill((x, yy) => dcs((x & 4, yy & 4)))
      case 1 => require(leftOk, "chroma H needs left"); fill((_, yy) => at(x0 - 1, y0 + yy))
      case 2 => require(topOk, "chroma V needs top"); fill((x, _) => at(x0 + x, y0 - 1))
      case 3 =>
        require(leftOk && topOk, "chroma Plane needs left+top")
        var hh = 0; var vv = 0
        var i = 0
        while (i < 4) {
          hh += (i + 1) * (at(x0 + 4 + i, y0 - 1) - at(x0 + 2 - i, y0 - 1))
          vv += (i + 1) * (at(x0 - 1, y0 + 4 + i) - at(x0 - 1, y0 + 2 - i))
          i += 1
        }
        val a = 16 * (at(x0 - 1, y0 + 7) + at(x0 + 7, y0 - 1))
        val b = (17 * hh + 16) >> 5
        val cc = (17 * vv + 16) >> 5
        fill((x, yy) => clip1((a + b * (x - 3) + cc * (yy - 3) + 16) >> 5))
      case m => throw new IllegalArgumentException(s"chroma pred mode $m")
    }
    out
  }

  // --------------------------------------------------- macroblock layer

  private def blockXY(z: Int): (Int, Int) =
    (((z >> 2) & 1) * 2 + (z & 1), ((z >> 3) & 1) * 2 + ((z >> 1) & 1))

  /** Scan-order zigzag of a raster 4x4 int array. */
  private def zigzagOf(raster: Array[Int]): Array[Int] = {
    val out = new Array[Int](16)
    var s = 0
    while (s < 16) { out(s) = raster(Zigzag(s)); s += 1 }
    out
  }
  private def unZigzag(scan: Array[Int]): Array[Int] = {
    val out = new Array[Int](16)
    var s = 0
    while (s < 16) { out(Zigzag(s)) = scan(s); s += 1 }
    out
  }

  /** Dequantized Intra16x16 luma DC plane (§8.5.10): inverse Hadamard of
    * the decoded scan-order DC coeffs, then the DC-specific scaling.
    */
  private def dequantLumaDc(dcScan: Array[Int], qp: Int): Array[Int] = {
    val f = hadamard4x4(unZigzag(dcScan))
    val ls = 16 * V(qp % 6)(0)
    f.map { v =>
      if (qp >= 36) (v * ls) << (qp / 6 - 6)
      else (v * ls + (1 << (5 - qp / 6))) >> (6 - qp / 6)
    }
  }

  /** Dequantized chroma DC plane (§8.5.11): 2x2 Hadamard then scale. */
  private def dequantChromaDc(dc: Array[Int], qpc: Int): Array[Int] = {
    val f = hadamard2x2(dc)
    val ls = 16 * V(qpc % 6)(0)
    f.map(v => ((v * ls) << (qpc / 6)) >> 5)
  }

  /** Reconstruct one 4x4 block: coefficients (raster, dequantized) +
    * prediction -> clipped samples written into `plane` at (x0, y0).
    */
  private def reconBlock(plane: Array[Int], pw: Int, x0: Int, y0: Int,
                         pred: Array[Int], predW: Int, px0: Int, py0: Int,
                         d: Array[Int]): Unit = {
    val r = inverse4x4(d)
    var yy = 0
    while (yy < 4) {
      var x = 0
      while (x < 4) {
        val res = (r(yy * 4 + x) + 32) >> 6
        plane((y0 + yy) * pw + x0 + x) =
          clip1(pred((py0 + yy) * predW + px0 + x) + res)
        x += 1
      }
      yy += 1
    }
  }

  /** Encoder-side chroma transform/quant for one 8x8 component: returns
    * (dcQuant(4), ac(4)(15)).
    */
  private def chromaForward(resid: Array[Int], qpc: Int): (Array[Int], Array[Array[Int]]) = {
    val dcRaw = new Array[Int](4)
    val ac = new Array[Array[Int]](4)
    var b = 0
    while (b < 4) {
      val bx = (b & 1) * 4; val by = (b >> 1) * 4
      val blk = new Array[Int](16)
      var yy = 0
      while (yy < 4) {
        var x = 0
        while (x < 4) { blk(yy * 4 + x) = resid((by + yy) * 8 + bx + x); x += 1 }
        yy += 1
      }
      val w = forward4x4(blk)
      dcRaw(b) = w(0)
      ac(b) = quantBlock(w, qpc, acOnly = true)
      b += 1
    }
    val had = hadamard2x2(dcRaw)
    val qbits = 15 + qpc / 6
    val f2 = 2 * ((1 << qbits) / 3)
    val dcQ = had.map { v =>
      val z = (math.abs(v) * MF(qpc % 6)(0) + f2) >> (qbits + 1)
      if (v < 0) -z else z
    }
    (dcQ, ac)
  }

  /** Reconstruct one chroma 8x8 component from quantized DC + AC into the
    * frame plane; mirrors the decoder exactly.
    */
  private def chromaRecon(ctx: FrameCtx, plane: Array[Int], pred: Array[Int],
                          dcQ: Array[Int], ac: Array[Array[Int]], qpc: Int,
                          mbX: Int, mbY: Int): Unit = {
    val cw = ctx.w / 2
    val dcD = dequantChromaDc(dcQ, qpc)
    var b = 0
    while (b < 4) {
      val d = dequantBlock(ac(b), qpc, acOnly = true)
      d(0) = dcD(b)
      reconBlock(plane, cw, mbX * 8 + (b & 1) * 4, mbY * 8 + (b >> 1) * 4,
        pred, 8, (b & 1) * 4, (b >> 1) * 4, d)
      b += 1
    }
  }

  /** Predicted Intra4x4 mode (§8.3.1.1): min of left/top block modes,
    * DC(2) when either is unavailable.
    */
  private def predI4Mode(ctx: FrameCtx, bx: Int, by: Int): Int = {
    val gw = ctx.mbW * 4
    val mA = if (bx > 0) ctx.i4Mode(by * gw + bx - 1) else -1
    val mB = if (by > 0) ctx.i4Mode((by - 1) * gw + bx) else -1
    if (mA < 0 || mB < 0) 2 else math.min(mA, mB)
  }

  /** Encoder-side chroma analysis for one MB: forward transform + quant
    * of both components against the chroma prediction. Returns
    * (cbpChroma, per-component (dcQ, ac), per-component pred); the caller
    * emits the residual (and reconstruction) via [[writeChromaResidual]]
    * once the MB header fields that depend on cbpChroma are written.
    */
  private type ChromaPlan = (Int, Seq[(Array[Int], Array[Array[Int]])], Seq[Array[Int]])

  private def encodeChroma(ctx: FrameCtx, src: Yuv, chromaMode: Int,
                           qpc: Int, mbX: Int, mbY: Int): ChromaPlan = {
    val cw = ctx.w / 2
    val comps = Seq((src.cb, ctx.cb, ctx.cbNz), (src.cr, ctx.cr, ctx.crNz))
    val preds = comps.map { case (_, plane, _) => predictChroma(ctx, plane, chromaMode, mbX, mbY) }
    val fwd = comps.zip(preds).map { case ((s, _, _), pred) =>
      val resid = new Array[Int](64)
      var yy = 0
      while (yy < 8) {
        var x = 0
        while (x < 8) {
          resid(yy * 8 + x) = s((mbY * 8 + yy) * cw + mbX * 8 + x) - pred(yy * 8 + x)
          x += 1
        }
        yy += 1
      }
      chromaForward(resid, qpc)
    }
    val anyDc = fwd.exists(_._1.exists(_ != 0))
    val anyAc = fwd.exists(_._2.exists(_.exists(_ != 0)))
    val cbpChroma = if (anyAc) 2 else if (anyDc) 1 else 0
    (cbpChroma, fwd, preds)
  }

  private def writeChromaResidual(ctx: FrameCtx, w: BitWriter, plan: ChromaPlan,
                                  qpc: Int, mbX: Int, mbY: Int): Unit = {
    val (cbpChroma, fwd, preds) = plan
    val gw = ctx.mbW * 2
    val grids = Seq(ctx.cbNz, ctx.crNz)
    if (cbpChroma > 0) {
      fwd.foreach { case (dcQ, _) => writeResidual(w, dcQ, -1) }
    }
    var ci = 0
    while (ci < 2) {
      val (dcQ, ac) = fwd(ci)
      var b = 0
      while (b < 4) {
        val bx = mbX * 2 + (b & 1); val by = mbY * 2 + (b >> 1)
        val tc =
          if (cbpChroma == 2) {
            val nC = ctx.nCtx(grids(ci), gw, bx, by)
            writeResidual(w, ac(b), nC)
          } else 0
        grids(ci)(by * gw + bx) = tc
        b += 1
      }
      // reconstruction: zero what the decoder will zero
      val acEff =
        if (cbpChroma == 2) ac
        else Array.fill(4)(new Array[Int](15))
      val dcEff = if (cbpChroma > 0) dcQ else new Array[Int](4)
      val plane = if (ci == 0) ctx.cb else ctx.cr
      chromaRecon(ctx, plane, preds(ci), dcEff, acEff, qpc, mbX, mbY)
      ci += 1
    }
  }

  /** Encode one macroblock; writes bits + reconstruction + context. */
  private def encodeMb(ctx: FrameCtx, w: BitWriter, src: Yuv, qp: Int,
                       mbX: Int, mbY: Int, mode: MbMode): Unit = {
    val mbIdx = mbY * ctx.mbW + mbX
    val gw = ctx.mbW * 4
    val cgw = ctx.mbW * 2
    val qpc = chromaQp(qp)
    mode match {
      case MbPcm =>
        w.ue(25)
        w.align()
        var i = 0
        while (i < 256) {
          val px = src.y((mbY * 16 + i / 16) * ctx.w + mbX * 16 + i % 16)
          w.byte(px)
          ctx.y((mbY * 16 + i / 16) * ctx.w + mbX * 16 + i % 16) = px
          i += 1
        }
        val cw = ctx.w / 2
        Seq((src.cb, ctx.cb), (src.cr, ctx.cr)).foreach { case (s, plane) =>
          var j = 0
          while (j < 64) {
            val px = s((mbY * 8 + j / 8) * cw + mbX * 8 + j % 8)
            w.byte(px)
            plane((mbY * 8 + j / 8) * cw + mbX * 8 + j % 8) = px
            j += 1
          }
        }
        var z = 0
        while (z < 16) {
          val (bx, by) = blockXY(z)
          ctx.lumaNz((mbY * 4 + by) * gw + mbX * 4 + bx) = 16
          ctx.i4Mode((mbY * 4 + by) * gw + mbX * 4 + bx) = 2
          z += 1
        }
        var b = 0
        while (b < 4) {
          ctx.cbNz((mbY * 2 + (b >> 1)) * cgw + mbX * 2 + (b & 1)) = 16
          ctx.crNz((mbY * 2 + (b >> 1)) * cgw + mbX * 2 + (b & 1)) = 16
          b += 1
        }

      case MbI16(pm, cm) =>
        val pred = predict16x16(ctx, pm, mbX, mbY)
        val resid = new Array[Int](256)
        var i = 0
        while (i < 256) {
          resid(i) = src.y((mbY * 16 + i / 16) * ctx.w + mbX * 16 + i % 16) - pred(i)
          i += 1
        }
        val dcRaw = new Array[Int](16)
        val ac = new Array[Array[Int]](16)
        var z = 0
        while (z < 16) {
          val (bx, by) = blockXY(z)
          val blk = new Array[Int](16)
          var yy = 0
          while (yy < 4) {
            var x = 0
            while (x < 4) { blk(yy * 4 + x) = resid((by * 4 + yy) * 16 + bx * 4 + x); x += 1 }
            yy += 1
          }
          val wt = forward4x4(blk)
          dcRaw(by * 4 + bx) = wt(0) // raster by block position
          ac(z) = quantBlock(wt, qp, acOnly = true)
          z += 1
        }
        val had = hadamard4x4(dcRaw).map(_ >> 1)
        val qbits = 15 + qp / 6
        val f2 = 2 * ((1 << qbits) / 3)
        val dcQRaster = had.map { v =>
          val zz = (math.abs(v) * MF(qp % 6)(0) + f2) >> (qbits + 1)
          if (v < 0) -zz else zz
        }
        val dcScan = zigzagOf(dcQRaster)
        val cbpLuma = if (ac.exists(_.exists(_ != 0))) 15 else 0
        val plan = encodeChroma(ctx, src, cm, qpc, mbX, mbY)
        val cbpChroma = plan._1
        w.ue(1 + pm + 4 * cbpChroma + 12 * (if (cbpLuma == 15) 1 else 0))
        w.ue(cm)
        w.se(0) // mb_qp_delta
        // luma DC: context of block (0,0)
        writeResidual(w, dcScan, ctx.nCtx(ctx.lumaNz, gw, mbX * 4, mbY * 4))
        z = 0
        while (z < 16) {
          val (bx, by) = blockXY(z)
          val tc =
            if (cbpLuma == 15)
              writeResidual(w, ac(z), ctx.nCtx(ctx.lumaNz, gw, mbX * 4 + bx, mbY * 4 + by))
            else 0
          ctx.lumaNz((mbY * 4 + by) * gw + mbX * 4 + bx) = tc
          ctx.i4Mode((mbY * 4 + by) * gw + mbX * 4 + bx) = 2
          z += 1
        }
        writeChromaResidual(ctx, w, plan, qpc, mbX, mbY)
        // luma reconstruction
        val dcD = dequantLumaDc(dcScan, qp)
        z = 0
        while (z < 16) {
          val (bx, by) = blockXY(z)
          val acEff = if (cbpLuma == 15) ac(z) else new Array[Int](15)
          val d = dequantBlock(acEff, qp, acOnly = true)
          d(0) = dcD(by * 4 + bx)
          reconBlock(ctx.y, ctx.w, mbX * 16 + bx * 4, mbY * 16 + by * 4,
            pred, 16, bx * 4, by * 4, d)
          z += 1
        }

      case MbI4(modes, cm) =>
        require(modes.length == 16, "I4 needs 16 block modes")
        w.ue(0)
        // modes resolve + signal first (spec order), then residual
        val actual = new Array[Int](16)
        var z = 0
        while (z < 16) {
          val (bx, by) = blockXY(z)
          val gx = mbX * 4 + bx; val gy = mbY * 4 + by
          val pm = predI4Mode(ctx, gx, gy)
          val m = if (modes(z) < 0) pm else modes(z)
          actual(z) = m
          if (m == pm) w.bit(1)
          else { w.bit(0); w.bits(if (m < pm) m else m - 1, 3) }
          ctx.i4Mode(gy * gw + gx) = m
          z += 1
        }
        w.ue(cm)
        // per-block transform/quant with immediate reconstruction
        val coeffs = new Array[Array[Int]](16)
        z = 0
        while (z < 16) {
          val (bx, by) = blockXY(z)
          val x0 = mbX * 16 + bx * 4; val y0 = mbY * 16 + by * 4
          val pred = predict4x4(ctx, actual(z), x0, y0, mbIdx, z)
          val blk = new Array[Int](16)
          var yy = 0
          while (yy < 4) {
            var x = 0
            while (x < 4) {
              blk(yy * 4 + x) = src.y((y0 + yy) * ctx.w + x0 + x) - pred(yy * 4 + x)
              x += 1
            }
            yy += 1
          }
          coeffs(z) = quantBlock(forward4x4(blk), qp, acOnly = false)
          val d = dequantBlock(coeffs(z), qp, acOnly = false)
          reconBlock(ctx.y, ctx.w, x0, y0, pred, 4, 0, 0, d)
          z += 1
        }
        val cbpLuma = (0 until 4).map { q =>
          if ((0 until 4).exists(i => coeffs(q * 4 + i).exists(_ != 0))) 1 << q else 0
        }.sum
        val plan = encodeChroma(ctx, src, cm, qpc, mbX, mbY)
        val cbpChroma = plan._1
        val cbp = cbpLuma | (cbpChroma << 4)
        w.ue(CbpIntraInv(cbp))
        if (cbp != 0) w.se(0) // mb_qp_delta
        var q = 0
        while (q < 4) {
          var i = 0
          while (i < 4) {
            val z2 = q * 4 + i
            val (bx, by) = blockXY(z2)
            val tc =
              if ((cbpLuma & (1 << q)) != 0)
                writeResidual(w, coeffs(z2), ctx.nCtx(ctx.lumaNz, gw, mbX * 4 + bx, mbY * 4 + by))
              else 0
            ctx.lumaNz((mbY * 4 + by) * gw + mbX * 4 + bx) = tc
            i += 1
          }
          q += 1
        }
        writeChromaResidual(ctx, w, plan, qpc, mbX, mbY)
    }
  }

  /** Decode one macroblock into the context. Returns the (possibly
    * mb_qp_delta-updated) slice QP.
    */
  private def decodeMb(ctx: FrameCtx, r: BitReader, qpIn: Int,
                       chromaOff: Int, mbX: Int, mbY: Int,
                       allowTok1Tail: Boolean = true): Int = {
    val mbIdx = mbY * ctx.mbW + mbX
    val gw = ctx.mbW * 4
    val cgw = ctx.mbW * 2
    var qp = qpIn
    val mbType = r.ue()
    require(mbType >= 0 && mbType <= 25,
      s"mb_type $mbType is not an I-slice intra type")

    def readChroma(cbpChroma: Int, chromaMode: Int, qpc: Int): Unit = {
      val dcs = Array.ofDim[Int](2, 4)
      if (cbpChroma > 0) {
        var ci = 0
        while (ci < 2) { dcs(ci) = readResidual(r, 4, -1, allowTok1Tail)._1; ci += 1 }
      }
      val grids = Seq(ctx.cbNz, ctx.crNz)
      val planes = Seq(ctx.cb, ctx.cr)
      var ci = 0
      while (ci < 2) {
        val ac = Array.fill(4)(new Array[Int](15))
        var b = 0
        while (b < 4) {
          val bx = mbX * 2 + (b & 1); val by = mbY * 2 + (b >> 1)
          var tc = 0
          if (cbpChroma == 2) {
            val nC = ctx.nCtx(grids(ci), cgw, bx, by)
            val (cf, t) = readResidual(r, 15, nC, allowTok1Tail)
            ac(b) = cf; tc = t
          }
          grids(ci)(by * cgw + bx) = tc
          b += 1
        }
        val pred = predictChroma(ctx, planes(ci), chromaMode, mbX, mbY)
        chromaRecon(ctx, planes(ci), pred, dcs(ci), ac, qpc, mbX, mbY)
        ci += 1
      }
    }

    if (mbType == 25) { // I_PCM
      r.align()
      var i = 0
      while (i < 256) {
        ctx.y((mbY * 16 + i / 16) * ctx.w + mbX * 16 + i % 16) = r.byte()
        i += 1
      }
      val cw = ctx.w / 2
      Seq(ctx.cb, ctx.cr).foreach { plane =>
        var j = 0
        while (j < 64) {
          plane((mbY * 8 + j / 8) * cw + mbX * 8 + j % 8) = r.byte()
          j += 1
        }
      }
      var z = 0
      while (z < 16) {
        val (bx, by) = blockXY(z)
        ctx.lumaNz((mbY * 4 + by) * gw + mbX * 4 + bx) = 16
        ctx.i4Mode((mbY * 4 + by) * gw + mbX * 4 + bx) = 2
        z += 1
      }
      var b = 0
      while (b < 4) {
        ctx.cbNz((mbY * 2 + (b >> 1)) * cgw + mbX * 2 + (b & 1)) = 16
        ctx.crNz((mbY * 2 + (b >> 1)) * cgw + mbX * 2 + (b & 1)) = 16
        b += 1
      }
      qp
    } else if (mbType >= 1) { // I_16x16
      val enc = mbType - 1
      val pm = enc % 4
      val cbpChroma = (enc / 4) % 3
      val cbpLuma = if (enc >= 12) 15 else 0
      val cm = r.ue()
      qp += r.se()
      require(qp >= 0 && qp <= 51, s"mb_qp_delta drove QP to $qp (spec range 0..51)")
      val qpc = chromaQp(qp + chromaOff)
      val dcScan = readResidual(r, 16,
        ctx.nCtx(ctx.lumaNz, gw, mbX * 4, mbY * 4), allowTok1Tail)._1
      val ac = Array.fill(16)(new Array[Int](15))
      var z = 0
      while (z < 16) {
        val (bx, by) = blockXY(z)
        var tc = 0
        if (cbpLuma == 15) {
          val (cf, t) = readResidual(r, 15,
            ctx.nCtx(ctx.lumaNz, gw, mbX * 4 + bx, mbY * 4 + by), allowTok1Tail)
          ac(z) = cf; tc = t
        }
        ctx.lumaNz((mbY * 4 + by) * gw + mbX * 4 + bx) = tc
        ctx.i4Mode((mbY * 4 + by) * gw + mbX * 4 + bx) = 2
        z += 1
      }
      readChroma(cbpChroma, cm, qpc)
      val pred = predict16x16(ctx, pm, mbX, mbY)
      val dcD = dequantLumaDc(dcScan, qp)
      z = 0
      while (z < 16) {
        val (bx, by) = blockXY(z)
        val d = dequantBlock(ac(z), qp, acOnly = true)
        d(0) = dcD(by * 4 + bx)
        reconBlock(ctx.y, ctx.w, mbX * 16 + bx * 4, mbY * 16 + by * 4,
          pred, 16, bx * 4, by * 4, d)
        z += 1
      }
      qp
    } else { // I_4x4
      val actual = new Array[Int](16)
      var z = 0
      while (z < 16) {
        val (bx, by) = blockXY(z)
        val gx = mbX * 4 + bx; val gy = mbY * 4 + by
        val pm = predI4Mode(ctx, gx, gy)
        val m =
          if (r.bit() == 1) pm
          else { val rem = r.bits(3); if (rem < pm) rem else rem + 1 }
        actual(z) = m
        ctx.i4Mode(gy * gw + gx) = m
        z += 1
      }
      val cm = r.ue()
      val cbp = CbpIntra(r.ue())
      val cbpLuma = cbp & 15
      val cbpChroma = cbp >> 4
      if (cbp != 0) qp += r.se()
      require(qp >= 0 && qp <= 51, s"mb_qp_delta drove QP to $qp (spec range 0..51)")
      val qpc = chromaQp(qp + chromaOff)
      val coeffs = Array.fill(16)(new Array[Int](16))
      var q = 0
      while (q < 4) {
        var i = 0
        while (i < 4) {
          val z2 = q * 4 + i
          val (bx, by) = blockXY(z2)
          var tc = 0
          if ((cbpLuma & (1 << q)) != 0) {
            val (cf, t) = readResidual(r, 16,
              ctx.nCtx(ctx.lumaNz, gw, mbX * 4 + bx, mbY * 4 + by), allowTok1Tail)
            coeffs(z2) = cf; tc = t
          }
          ctx.lumaNz((mbY * 4 + by) * gw + mbX * 4 + bx) = tc
          i += 1
        }
        q += 1
      }
      // reconstruct blocks in Z order, prediction from running recon
      z = 0
      while (z < 16) {
        val (bx, by) = blockXY(z)
        val x0 = mbX * 16 + bx * 4; val y0 = mbY * 16 + by * 4
        val pred = predict4x4(ctx, actual(z), x0, y0, mbIdx, z)
        val d = dequantBlock(coeffs(z), qp, acOnly = false)
        reconBlock(ctx.y, ctx.w, x0, y0, pred, 4, 0, 0, d)
        z += 1
      }
      readChroma(cbpChroma, cm, qpc)
      qp
    }
  }

  // ------------------------------------------------------ slice / stream

  private val StartCode = Array[Byte](0, 0, 0, 1)

  /** Minimal PPS for this codec: CAVLC, one slice group, deblocking
    * control present (so the slice can disable it), baseline-compatible.
    */
  def renderPps(): Array[Byte] = {
    val w = new BitWriter
    w.ue(0) // pps id
    w.ue(0) // sps id
    w.bit(0) // entropy_coding_mode_flag = CAVLC
    w.bit(0) // bottom_field_pic_order_in_frame_present
    w.ue(0) // num_slice_groups_minus1
    w.ue(0); w.ue(0) // num_ref_idx_l{0,1}_default_active_minus1
    w.bit(0) // weighted_pred_flag
    w.bits(0, 2) // weighted_bipred_idc
    w.se(0) // pic_init_qp_minus26
    w.se(0) // pic_init_qs_minus26
    w.se(0) // chroma_qp_index_offset
    w.bit(1) // deblocking_filter_control_present_flag
    w.bit(0) // constrained_intra_pred_flag
    w.bit(0) // redundant_pic_cnt_present_flag
    (0x68.toByte +: Avc.escape(w.close())).toArray
  }

  private case class PpsInfo(picInitQp: Int, deblockPresent: Boolean, chromaQpOff: Int)

  private[graft] def parsePps(nal: Array[Byte]): Unit = parsePpsInfo(nal)

  private def parsePpsInfo(nal: Array[Byte]): PpsInfo = {
    require((nal(0) & 0x1f) == 8, s"NAL type ${nal(0) & 0x1f} is not PPS(8)")
    val r = new BitReader(Avc.unescape(nal.drop(1)))
    r.ue(); r.ue()
    require(r.bit() == 0, "CABAC streams unsupported (CAVLC only)")
    require(r.bit() == 0,
      "bottom_field_pic_order_in_frame_present unsupported (slice header would carry delta_pic_order_cnt_bottom)")
    require(r.ue() == 0, "slice groups (FMO) unsupported")
    r.ue(); r.ue(); r.bit(); r.bits(2)
    val picInitQp = 26 + r.se()
    r.se()
    val chromaOff = r.se()
    val deblock = r.bit() == 1
    require(r.bit() == 0, "constrained_intra_pred unsupported")
    r.bit()
    PpsInfo(picInitQp, deblock, chromaOff)
  }

  /** The SPS entropy fields renderSps leaves implicit (baseline branch). */
  private def spsEntropyFields(nal: Array[Byte]): (Int, Int, Int) = {
    val r = new BitReader(Avc.unescape(nal.drop(1)))
    val profile = r.bits(8)
    require(!Avc.HighProfiles.contains(profile),
      s"high-profile SPS (profile $profile) unsupported for entropy-field re-read")
    r.bits(16) // constraint flags + level
    r.ue()
    val log2FrameNum = r.ue() + 4
    val pocType = r.ue()
    val log2Poc = if (pocType == 0) r.ue() + 4 else 0
    require(pocType != 1, "pic_order_cnt_type 1 unsupported")
    (log2FrameNum, pocType, log2Poc)
  }

  /** Encode one IDR slice NAL (header byte 0x65 + escaped RBSP) and the
    * closed-loop reconstruction.
    */
  def encodeFrame(src: Yuv, qp: Int, idrPicId: Int,
                  modeFor: (Int, Int) => MbMode): (Array[Byte], Yuv) = {
    require(src.w % 16 == 0 && src.h % 16 == 0, s"frame ${src.w}x${src.h} not MB-aligned")
    require(qp >= 0 && qp <= 51, s"qp $qp")
    val ctx = new FrameCtx(src.w, src.h)
    val w = new BitWriter
    w.ue(0) // first_mb_in_slice
    w.ue(7) // slice_type: I (all slices in picture)
    w.ue(0) // pps id
    w.bits(0, 4) // frame_num (log2_max_frame_num = 4)
    w.ue(idrPicId)
    w.bits(0, 4) // pic_order_cnt_lsb
    w.bit(0); w.bit(0) // dec_ref_pic_marking (IDR): no_output, long_term
    w.se(qp - 26) // slice_qp_delta (pic_init_qp_minus26 = 0)
    w.ue(1) // disable_deblocking_filter_idc = 1 (off)
    var mbY = 0
    while (mbY < ctx.mbH) {
      var mbX = 0
      while (mbX < ctx.mbW) {
        encodeMb(ctx, w, src, qp, mbX, mbY, modeFor(mbX, mbY))
        mbX += 1
      }
      mbY += 1
    }
    ((0x65.toByte +: Avc.escape(w.close())).toArray, ctx.toYuv)
  }

  /** Encode a full Annex-B stream: SPS + PPS + one IDR per frame. Returns
    * the bytes and the per-frame closed-loop reconstructions (what
    * [[decode]] returns bit-exactly).
    */
  def encodeStream(frames: Seq[Yuv], qp: Int,
                   modeFor: (Int, Int, Int) => MbMode): (Array[Byte], Seq[Yuv]) = {
    require(frames.nonEmpty, "empty stream")
    val w0 = frames.head.w; val h0 = frames.head.h
    require(frames.forall(f => f.w == w0 && f.h == h0), "mixed frame sizes")
    val sps = Avc.renderSps(Avc.Sps(66, 20, w0 / 16, h0 / 16,
      frameMbsOnly = true, 0, 0, 0, 0))
    val pps = renderPps()
    val out = ArrayBuffer.empty[Byte]
    out ++= StartCode; out ++= sps
    out ++= StartCode; out ++= pps
    out ++= StartCode; out ++= renderSelfMarkerSei()
    val recons = frames.zipWithIndex.map { case (f, i) =>
      val (nal, recon) = encodeFrame(f, qp, i % 16, modeFor(i, _, _))
      out ++= StartCode; out ++= nal
      recon
    }
    (out.toArray, recons)
  }

  /** SEI NAL (type 6) carrying one user_data_unregistered payload
    * (payloadType 5) whose UUID is [[SelfMarkerUuid]] — the provenance
    * marker that tells [[decode]] the canonical CoeffTok1 tail codes are
    * in effect. Foreign decoders skip it as ordinary opaque user data.
    */
  private[graft] def renderSelfMarkerSei(): Array[Byte] = {
    val payload = Array[Byte](5, 16) ++ SelfMarkerUuid // type, size, uuid
    (0x06.toByte +: Avc.escape(payload :+ 0x80.toByte)).toArray
  }

  /** True iff an SEI NAL carries a user_data_unregistered payload with
    * [[SelfMarkerUuid]]. Tolerant: any malformed SEI is simply not ours.
    */
  private def isSelfMarkerSei(nal: Array[Byte]): Boolean = {
    val rbsp = Avc.unescape(nal.drop(1))
    var i = 0
    // walk the SEI message list (ff-extension for type/size per §7.3.2.3.1)
    while (i + 1 < rbsp.length && (rbsp(i) & 0xff) != 0x80) {
      var t = 0
      while (i < rbsp.length && (rbsp(i) & 0xff) == 255) { t += 255; i += 1 }
      if (i >= rbsp.length) return false
      t += rbsp(i) & 0xff; i += 1
      var sz = 0
      while (i < rbsp.length && (rbsp(i) & 0xff) == 255) { sz += 255; i += 1 }
      if (i >= rbsp.length) return false
      sz += rbsp(i) & 0xff; i += 1
      if (i + sz > rbsp.length) return false
      if (t == 5 && sz == 16 &&
        rbsp.slice(i, i + 16).sameElements(SelfMarkerUuid)) return true
      i += sz
    }
    false
  }

  /** Split an Annex-B byte stream into NAL units (3- or 4-byte start
    * codes), headers included.
    */
  private[graft] def splitNals(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val starts = ArrayBuffer.empty[Int]
    var i = 0
    while (i + 2 < bytes.length) {
      if (bytes(i) == 0 && bytes(i + 1) == 0 && bytes(i + 2) == 1) {
        starts += i + 3
        i += 3
      } else i += 1
    }
    require(starts.nonEmpty, "no Annex-B start code found")
    starts.indices.map { k =>
      val s = starts(k)
      var e = if (k + 1 < starts.length) starts(k + 1) - 3 else bytes.length
      // a 4-byte start code owns one extra preceding zero
      if (k + 1 < starts.length && e > s && bytes(e - 1) == 0) e -= 1
      bytes.slice(s, e)
    }
  }

  /** Decode every IDR frame of a CAVLC baseline Annex-B stream. */
  def decode(annexB: Array[Byte]): Seq[Yuv] = {
    var sps: Option[Avc.Sps] = None
    var entropy: (Int, Int, Int) = (4, 0, 4)
    var pps: Option[PpsInfo] = None
    var selfProduced = false
    val frames = ArrayBuffer.empty[Yuv]
    splitNals(annexB).foreach { nal =>
      (nal(0) & 0x1f) match {
        case 7 =>
          sps = Some(Avc.parseSps(nal))
          entropy = spsEntropyFields(nal)
          // the provenance marker covers only the access units that FOLLOW
          // it within the current sequence: a new SPS starts a new
          // sequence, so a foreign stream concatenated after a graft-marked
          // one does not inherit the CoeffTok1-tail permission. The marker
          // is provenance, not integrity — a stream could spoof the SEI;
          // it guards against accidental misdecode, not adversaries.
          selfProduced = false
        case 8 => pps = Some(parsePpsInfo(nal))
        case 6 => if (isSelfMarkerSei(nal)) selfProduced = true
        case 5 =>
          val s = sps.getOrElse(throw new IllegalArgumentException("IDR before SPS"))
          val p = pps.getOrElse(throw new IllegalArgumentException("IDR before PPS"))
          require(s.frameMbsOnly, "interlace unsupported")
          // corrupted-SPS guard on the MB counts BEFORE any multiply so
          // int wrap cannot smuggle a giant allocation past it (1024 MBs
          // = 16384 px is far beyond any level we write)
          require(s.widthMbs >= 1 && s.widthMbs <= 1024 &&
            s.heightMapUnits >= 1 && s.heightMapUnits <= 1024,
            s"implausible geometry ${s.widthMbs}x${s.heightMapUnits} MBs")
          val w = s.widthMbs * 16; val h = s.heightMapUnits * 16
          val r = new BitReader(Avc.unescape(nal.drop(1)))
          require(r.ue() == 0, "multi-slice pictures unsupported")
          val sliceType = r.ue()
          require(sliceType == 2 || sliceType == 7, s"slice_type $sliceType is not I")
          r.ue() // pps id
          r.bits(entropy._1) // frame_num
          r.ue() // idr_pic_id
          if (entropy._2 == 0) r.bits(entropy._3) // pic_order_cnt_lsb
          r.bit(); r.bit() // dec_ref_pic_marking
          var qp = p.picInitQp + r.se()
          require(qp >= 0 && qp <= 51, s"slice_qp_delta drove QP to $qp (spec range 0..51)")
          if (p.deblockPresent)
            require(r.ue() == 1, "deblocking filter unsupported (streams here disable it)")
          val ctx = new FrameCtx(w, h)
          var mbY = 0
          while (mbY < ctx.mbH) {
            var mbX = 0
            while (mbX < ctx.mbW) {
              qp = decodeMb(ctx, r, qp, p.chromaQpOff, mbX, mbY,
                allowTok1Tail = selfProduced)
              mbX += 1
            }
            mbY += 1
          }
          // crop per SPS (CropUnitX/Y = 2 for 4:2:0 frame macroblocks)
          val full = ctx.toYuv
          frames += (if (s.width == w && s.height == h) full
                     else cropFrame(full, 2 * s.cropL, 2 * s.cropT, s.width, s.height))
        case 1 =>
          throw new IllegalArgumentException("non-IDR slices unsupported (intra codec)")
        case _ => // SEI / AUD / filler: skip
      }
    }
    frames.toSeq
  }

  private def cropFrame(f: Yuv, x0: Int, y0: Int, w: Int, h: Int): Yuv = {
    val y = Array.tabulate(w * h)(i => f.y((y0 + i / w) * f.w + x0 + i % w))
    val cw = w / 2; val ch = h / 2
    val cb = Array.tabulate(cw * ch)(i => f.cb((y0 / 2 + i / cw) * (f.w / 2) + x0 / 2 + i % cw))
    val cr = Array.tabulate(cw * ch)(i => f.cr((y0 / 2 + i / cw) * (f.w / 2) + x0 / 2 + i % cw))
    Yuv(w, h, y, cb, cr)
  }
}
