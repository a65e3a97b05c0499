package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal Ansys `.rst` results-file codec.
  *
  * The reference does NOT parse `.rst` itself — `ansys_rst.py:187` drives
  * the ansys-dpf-core service, which needs a licensed Ansys install; that
  * remote/vendor boundary is unreachable here. This module implements a
  * small standalone subset of the file's public layout conventions
  * (Fortran-unformatted sequential records — 4-byte length framing — and
  * the pointer-table structure: standard header → results header → data-set
  * index → per-set solution headers → solution payloads, as documented by
  * the open-source pymapdl-reader project) so that locally-produced result
  * files decode end-to-end without DPF. Real vendor files carry many more
  * tables (geometry, equivalence, boundary conditions); those still route
  * through the DPF boundary, and this codec rejects them loudly rather
  * than guessing.
  *
  * Subset layout (little-endian, every record framed `[i32 nbytes] payload
  * [i32 nbytes]`):
  *  - standard header: 100 × i32 — [0] file id (12 = results), [1]
  *    analysis type (0 structural / 1 thermal), [2] byte offset of the
  *    results header;
  *  - results header: i32 [nnod, nelm, nsets, ptrDSI, ptrNOD, ptrELM]
  *    (legacy 4-int headers decode with no geometry; 0 pointer = absent);
  *  - data-set index (DSI): nsets × i32 byte offsets of solution headers;
  *  - NOD record: nnod × 3 f64 node coordinates, node-major — the
  *    geometry-table subset (vendor files hold this in their geometry
  *    section; pymapdl-reader's `ptrGEO`→`ptrLOC` chain);
  *  - ELM record: nelm × 9 i32 — [nverts, v0..v7 zero-padded], 0-based
  *    connectivity (the element-table subset);
  *  - solution header: i32 [ldstep, substep, ndof, nElemComp, ptrNSL,
  *    ptrESL] (0 pointer = record absent);
  *  - NSL record: nnod·ndof × f64, node-major;
  *  - ESL record: nelm·nElemComp × f64, element-major.
  *
  * Result naming follows the analysis type the way DPF discovery does:
  * thermal → nodal `temperature` (ndof 1) + elemental `heat_flux`;
  * structural → nodal `displacement` (vector) + elemental `stress`.
  */
object AnsysRst {

  val FileIdResults = 12
  val AnalysisStructural = 0
  val AnalysisThermal = 1

  /** One result set: `nodal` is nnod × ndof, `elemental` nelm × nComp
    * (either may be empty = record absent).
    */
  final case class RstSet(ldstep: Int, substep: Int,
                          nodal: Array[Array[Double]],
                          elemental: Array[Array[Double]])

  /** One decoded value: 0-based node/element `idx`; `component` is null
    * for scalar results — the same long shape `AnsysResults.route` takes.
    */
  final case class RstRow(ldstep: Int, substep: Int, result: String,
                          idx: Long, component: String, value: Double)

  final case class RstFile(analysis: Int, nnod: Int, nelm: Int, rows: Seq[RstRow],
                           nodes: Array[Array[Double]] = Array.empty, // nnod × 3
                           elems: Array[Array[Int]] = Array.empty)    // 0-based conn

  private def recBytes(payload: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + payload.length).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(payload.length).put(payload).putInt(payload.length)
    b.array()
  }

  private def ints(vs: Int*): Array[Byte] = {
    val b = ByteBuffer.allocate(vs.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(b.putInt)
    b.array()
  }

  def render(analysis: Int, nnod: Int, nelm: Int, sets: Seq[RstSet],
             nodes: Array[Array[Double]] = Array.empty,
             elems: Array[Array[Int]] = Array.empty): Array[Byte] = {
    require(analysis == AnalysisStructural || analysis == AnalysisThermal,
      s"analysis type $analysis not in the supported subset")
    require(sets.nonEmpty, "a results file needs at least one result set")
    require(nodes.isEmpty || (nodes.length == nnod && nodes.forall(_.length == 3)),
      s"node table must be $nnod x 3 coordinates")
    require(elems.isEmpty || elems.length == nelm,
      s"element table has ${elems.length} rows, want nelm $nelm")
    elems.foreach(e => require(e.nonEmpty && e.length <= 8 &&
      e.forall(v => v >= 0 && v < nnod),
      s"element connectivity ${e.mkString(",")} outside 1..8 verts in [0, $nnod)"))
    sets.foreach { st =>
      require(st.nodal.isEmpty || st.nodal.length == nnod,
        s"set ${st.ldstep}: ${st.nodal.length} nodal rows != nnod $nnod")
      require(st.elemental.isEmpty || st.elemental.length == nelm,
        s"set ${st.ldstep}: ${st.elemental.length} elemental rows != nelm $nelm")
      require(st.nodal.map(_.length).distinct.length <= 1 &&
        st.elemental.map(_.length).distinct.length <= 1,
        s"set ${st.ldstep}: ragged component arrays")
      if (analysis == AnalysisThermal && st.nodal.nonEmpty)
        require(st.nodal.head.length == 1,
          s"thermal nodal solution must have 1 dof, got ${st.nodal.head.length}")
    }

    val stdSize = 8 + 400
    val rstSize = 8 + 24
    val dsiSize = 8 + 4 * sets.length
    val ptrRst = stdSize
    val ptrDsi = stdSize + rstSize
    var cursor = ptrDsi + dsiSize
    val ptrNod = if (nodes.nonEmpty) { val p = cursor; cursor += 8 + nnod * 24; p } else 0
    val ptrElm = if (elems.nonEmpty) { val p = cursor; cursor += 8 + nelm * 36; p } else 0
    val setPtrs = sets.map { st =>
      val p = cursor
      cursor += 8 + 24 // solution header record
      if (st.nodal.nonEmpty) cursor += 8 + st.nodal.length * st.nodal.head.length * 8
      if (st.elemental.nonEmpty) cursor += 8 + st.elemental.length * st.elemental.head.length * 8
      p
    }

    val out = new java.io.ByteArrayOutputStream(cursor)
    val std = new Array[Int](100)
    std(0) = FileIdResults
    std(1) = analysis
    std(2) = ptrRst
    out.write(recBytes(ints(std.toIndexedSeq: _*)))
    out.write(recBytes(ints(nnod, nelm, sets.length, ptrDsi, ptrNod, ptrElm)))
    out.write(recBytes(ints(setPtrs.map(_.toInt): _*)))
    if (nodes.nonEmpty) {
      val b = ByteBuffer.allocate(nnod * 24).order(ByteOrder.LITTLE_ENDIAN)
      nodes.foreach(_.foreach(b.putDouble))
      out.write(recBytes(b.array()))
    }
    if (elems.nonEmpty) {
      val b = ByteBuffer.allocate(nelm * 36).order(ByteOrder.LITTLE_ENDIAN)
      elems.foreach { e =>
        b.putInt(e.length)
        e.foreach(b.putInt)
        (e.length until 8).foreach(_ => b.putInt(0))
      }
      out.write(recBytes(b.array()))
    }
    sets.zipWithIndex.foreach { case (st, si) =>
      var p = setPtrs(si) + 8 + 24
      val ptrNsl = if (st.nodal.nonEmpty) p else 0
      if (st.nodal.nonEmpty) p += 8 + st.nodal.length * st.nodal.head.length * 8
      val ptrEsl = if (st.elemental.nonEmpty) p else 0
      out.write(recBytes(ints(st.ldstep, st.substep,
        if (st.nodal.nonEmpty) st.nodal.head.length else 0,
        if (st.elemental.nonEmpty) st.elemental.head.length else 0,
        ptrNsl, ptrEsl)))
      def f64Rec(rows: Array[Array[Double]]): Unit = {
        val b = ByteBuffer.allocate(rows.length * rows.head.length * 8)
          .order(ByteOrder.LITTLE_ENDIAN)
        rows.foreach(_.foreach(b.putDouble))
        out.write(recBytes(b.array()))
      }
      if (st.nodal.nonEmpty) f64Rec(st.nodal)
      if (st.elemental.nonEmpty) f64Rec(st.elemental)
    }
    out.toByteArray
  }

  def decode(bytes: Array[Byte]): RstFile = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def recAt(off: Int, what: String): (Int, Int) = { // (payload offset, nbytes)
      require(off >= 0 && off + 8 <= bytes.length, s"$what record offset $off out of range")
      val n = buf.getInt(off)
      require(n >= 0 && off + 8 + n <= bytes.length &&
        buf.getInt(off + 4 + n) == n,
        s"$what record at $off: bad Fortran framing")
      (off + 4, n)
    }
    val (stdOff, stdLen) = recAt(0, "standard header")
    require(stdLen == 400, s"standard header has ${stdLen / 4} ints, want 100")
    require(buf.getInt(stdOff) == FileIdResults,
      s"file id ${buf.getInt(stdOff)} is not a results file (12)")
    val analysis = buf.getInt(stdOff + 4)
    require(analysis == AnalysisStructural || analysis == AnalysisThermal,
      s"analysis type $analysis outside the supported subset (structural/thermal)")
    val (rstOff, rstLen) = recAt(buf.getInt(stdOff + 8), "results header")
    require(rstLen == 16 || rstLen == 24,
      s"results header has ${rstLen / 4} ints, want 4 (legacy) or 6")
    val nnod = buf.getInt(rstOff)
    val nelm = buf.getInt(rstOff + 4)
    val nsets = buf.getInt(rstOff + 8)
    val (dsiOff, dsiLen) = recAt(buf.getInt(rstOff + 12), "data-set index")
    require(dsiLen == 4 * nsets, s"DSI has ${dsiLen / 4} pointers, want $nsets")
    val (ptrNod, ptrElm) =
      if (rstLen == 24) (buf.getInt(rstOff + 16), buf.getInt(rstOff + 20))
      else (0, 0)
    val nodes =
      if (ptrNod == 0) Array.empty[Array[Double]]
      else {
        val (off, len) = recAt(ptrNod, "node table")
        require(len == nnod * 24, s"node table: ${len / 8} doubles, want $nnod x 3")
        Array.tabulate(nnod)(i => Array.tabulate(3)(c => buf.getDouble(off + (i * 3 + c) * 8)))
      }
    val elems =
      if (ptrElm == 0) Array.empty[Array[Int]]
      else {
        val (off, len) = recAt(ptrElm, "element table")
        require(len == nelm * 36, s"element table: ${len / 4} ints, want $nelm x 9")
        Array.tabulate(nelm) { e =>
          val n = buf.getInt(off + e * 36)
          require(n >= 1 && n <= 8, s"element $e has $n verts (want 1..8)")
          Array.tabulate(n) { k =>
            val v = buf.getInt(off + e * 36 + 4 + k * 4)
            require(v >= 0 && v < nnod, s"element $e vertex $v outside [0, $nnod)")
            v
          }
        }
      }

    val (nodalName, elementalName) =
      if (analysis == AnalysisThermal) ("temperature", "heat_flux")
      else ("displacement", "stress")

    val rows = (0 until nsets).flatMap { si =>
      val (sh, shLen) = recAt(buf.getInt(dsiOff + si * 4), s"solution header $si")
      require(shLen == 24, s"solution header $si has ${shLen / 4} ints, want 6")
      val ldstep = buf.getInt(sh)
      val substep = buf.getInt(sh + 4)
      val ndof = buf.getInt(sh + 8)
      val nComp = buf.getInt(sh + 12)
      val ptrNsl = buf.getInt(sh + 16)
      val ptrEsl = buf.getInt(sh + 20)
      def payload(ptr: Int, n: Int, comps: Int, name: String,
                  what: String): Seq[RstRow] =
        if (ptr == 0) Nil
        else {
          val (off, len) = recAt(ptr, what)
          require(len == n * comps * 8,
            s"$what: ${len / 8} doubles, want $n x $comps")
          (0 until n).flatMap { i =>
            (0 until comps).map { c =>
              RstRow(ldstep, substep, name, i.toLong,
                if (comps == 1) null else c.toString,
                buf.getDouble(off + (i * comps + c) * 8))
            }
          }
        }
      payload(ptrNsl, nnod, ndof, nodalName, s"set $si NSL") ++
        payload(ptrEsl, nelm, nComp, elementalName, s"set $si ESL")
    }
    RstFile(analysis, nnod, nelm, rows, nodes, elems)
  }
}

/** Distributed `.rst` ingestion: `binaryFile` over the directory, per-file
  * decode on executors, one long results table — the decoded side of the
  * `AnsysResults` routing contract, with per-file mesh_id and set columns.
  */
object AnsysRstSource {

  def read(spark: SparkSession, dir: String,
           globFilter: String = "*.rst"): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", globFilter).load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val stem = path.split("/").last.stripSuffix(".rst")
        val f = AnsysRst.decode(bytes)
        f.rows.map(r => (stem, r.ldstep, r.substep, r.result, r.idx,
          r.component, r.value))
      }
      .toDF("mesh_id", "ldstep", "substep", "result", "idx", "component", "value")
  }

  /** Geometry tables from the node/element records (files without them
    * yield empty frames): points (mesh_id, node_id, x, y, z) and cells
    * (mesh_id, elem_id, vertices) — joinable to `read`'s results on
    * (mesh_id, idx), the mesh+results shape DPF discovery exposes.
    */
  def readGeometry(spark: SparkSession, dir: String,
                   globFilter: String = "*.rst"): (DataFrame, DataFrame) = {
    import spark.implicits._
    val parsed = spark.read.format("binaryFile")
      .option("pathGlobFilter", globFilter).load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        val stem = path.split("/").last.stripSuffix(".rst")
        val f = AnsysRst.decode(bytes)
        (stem, f.nodes.map(_.toSeq), f.elems.map(_.map(_.toLong).toSeq))
      }.persist() // both frames project from one decode; caller releases
    val points = parsed.flatMap { case (mesh, nodes, _) =>
      nodes.iterator.zipWithIndex.map { case (c, i) =>
        (mesh, i.toLong, c(0), c(1), c(2))
      }
    }.toDF("mesh_id", "node_id", "x", "y", "z")
    val cells = parsed.flatMap { case (mesh, _, elems) =>
      elems.iterator.zipWithIndex.map { case (vs, e) => (mesh, e.toLong, vs) }
    }.toDF("mesh_id", "elem_id", "vertices")
    (points, cells)
  }
}
