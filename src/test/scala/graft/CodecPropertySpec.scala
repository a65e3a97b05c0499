package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{NetCdfSource, StlSource, VtkXmlSource}

/** Property tests for the pure byte-level codecs: layout invariance and
  * write→parse identities under randomized shapes, sizes and encodings —
  * the block-boundary / padding / header-width edge cases a fixed fixture
  * can miss. Pure JVM (no Spark session), so hundreds of cases are cheap.
  */
class CodecPropertySpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  // exact binary fractions: equality-safe through float32 and text round trips
  private val exactD: Gen[Double] =
    Gen.chooseNum(-(1 << 20), 1 << 20).map(_ / 1024.0)

  // ------------------------------------------------------------------ VTK

  /** The same arrays must decode identically through EVERY DataArray
    * layout: ascii, inline base64 ± zlib, appended raw/base64 ± zlib,
    * UInt32/UInt64 headers — including sizes that straddle the 32 KiB
    * zlib block boundary.
    */
  test("VTK: decoded arrays are layout-invariant") {
    def b64(b: Array[Byte]) = java.util.Base64.getEncoder.encodeToString(b)
    def le(doubles: Seq[Double]): Array[Byte] = {
      val bb = ByteBuffer.allocate(doubles.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      doubles.foreach(bb.putDouble); bb.array()
    }
    def header(ht: String, n: Long): Array[Byte] = {
      val w = if (ht == "UInt64") 8 else 4
      val bb = ByteBuffer.allocate(w).order(ByteOrder.LITTLE_ENDIAN)
      if (ht == "UInt64") bb.putLong(n) else bb.putInt(n.toInt)
      bb.array()
    }
    def deflate(b: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(); d.setInput(b); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    def zlibLayout(raw: Array[Byte], ht: String): (Array[Byte], Array[Byte]) = {
      val block = 32768
      val blocks = if (raw.isEmpty) Array.empty[Array[Byte]]
                   else raw.grouped(block).toArray
      val comp = blocks.map(deflate)
      val w = if (ht == "UInt64") 8 else 4
      val hb = ByteBuffer.allocate(w * (3 + comp.length)).order(ByteOrder.LITTLE_ENDIAN)
      def put(n: Long): Unit = if (ht == "UInt64") hb.putLong(n) else hb.putInt(n.toInt)
      put(blocks.length.toLong); put(block.toLong)
      put(if (blocks.isEmpty) 0L else blocks.last.length.toLong)
      comp.foreach(c => put(c.length.toLong))
      (hb.array(), comp.flatten)
    }

    val gen = for {
      n <- Gen.chooseNum(1, 6000) // up to ~47 KB of doubles → 2 zlib blocks
      vals <- Gen.listOfN(n, exactD)
      ht <- Gen.oneOf("UInt32", "UInt64")
      layout <- Gen.oneOf("ascii", "binary", "binary-zlib", "appended-raw",
        "appended-raw-zlib", "appended-b64")
    } yield (vals, ht, layout)

    check(Prop.forAllNoShrink(gen) { case (vals, ht, layout) =>
      val raw = le(vals)
      val comp = if (layout.endsWith("zlib")) """ compressor="vtkZLibDataCompressor"""" else ""
      val xml = layout match {
        case "ascii" =>
          s"""<VTKFile type="UnstructuredGrid" header_type="$ht">
             |<UnstructuredGrid><Piece><PointData>
             |<DataArray type="Float64" Name="v" format="ascii">${vals.mkString(" ")}</DataArray>
             |</PointData></Piece></UnstructuredGrid></VTKFile>""".stripMargin.getBytes("UTF-8")
        case "binary" =>
          val payload = b64(header(ht, raw.length.toLong) ++ raw)
          s"""<VTKFile type="UnstructuredGrid" header_type="$ht">
             |<UnstructuredGrid><Piece><PointData>
             |<DataArray type="Float64" Name="v" format="binary">$payload</DataArray>
             |</PointData></Piece></UnstructuredGrid></VTKFile>""".stripMargin.getBytes("UTF-8")
        case "binary-zlib" =>
          val (h, d) = zlibLayout(raw, ht)
          val payload = b64(h) + b64(d)
          s"""<VTKFile type="UnstructuredGrid" header_type="$ht"$comp>
             |<UnstructuredGrid><Piece><PointData>
             |<DataArray type="Float64" Name="v" format="binary">$payload</DataArray>
             |</PointData></Piece></UnstructuredGrid></VTKFile>""".stripMargin.getBytes("UTF-8")
        case "appended-raw" | "appended-raw-zlib" =>
          val data = if (layout.endsWith("zlib")) {
            val (h, d) = zlibLayout(raw, ht); h ++ d
          } else header(ht, raw.length.toLong) ++ raw
          val head =
            s"""<VTKFile type="UnstructuredGrid" header_type="$ht"$comp>
               |<UnstructuredGrid><Piece><PointData>
               |<DataArray type="Float64" Name="v" format="appended" offset="0"/>
               |</PointData></Piece></UnstructuredGrid>
               |<AppendedData encoding="raw">_""".stripMargin
          head.getBytes("UTF-8") ++ data ++ "</AppendedData></VTKFile>".getBytes("UTF-8")
        case "appended-b64" =>
          val payload = b64(header(ht, raw.length.toLong) ++ raw)
          s"""<VTKFile type="UnstructuredGrid" header_type="$ht">
             |<UnstructuredGrid><Piece><PointData>
             |<DataArray type="Float64" Name="v" format="appended" offset="0"/>
             |</PointData></Piece></UnstructuredGrid>
             |<AppendedData encoding="base64">_$payload</AppendedData></VTKFile>""".stripMargin.getBytes("UTF-8")
      }
      val got = VtkXmlSource.parseVtu(xml).pointData("v").toSeq
      Prop(got == vals) :| s"layout=$layout ht=$ht n=${vals.length}"
    }, n = 60)
  }

  // ------------------------------------------------------------------ STL

  test("STL: binary render → parse identity; ascii agrees") {
    val triGen = Gen.listOfN(9, exactD.map(_.toFloat))
    val meshGen = for {
      nf <- Gen.chooseNum(1, 40)
      tris <- Gen.listOfN(nf, triGen)
    } yield tris

    check(Prop.forAllNoShrink(meshGen) { tris =>
      val bb = ByteBuffer.allocate(84 + 50 * tris.length).order(ByteOrder.LITTLE_ENDIAN)
      bb.position(80); bb.putInt(tris.length)
      tris.foreach { t =>
        bb.putFloat(0f).putFloat(0f).putFloat(1f)
        t.foreach(bb.putFloat)
        bb.putShort(0.toShort)
      }
      val bin = StlSource.parse(bb.array())
      // print the DOUBLE value: Float.toString's shortest form round-trips
      // through float parsing, not the double parsing the ascii reader does
      val ascii =
        ("solid g\n" + tris.map { t =>
          " facet normal 0 0 1\n  outer loop\n" +
            t.grouped(3).map(v =>
              s"   vertex ${v(0).toDouble} ${v(1).toDouble} ${v(2).toDouble}").mkString("\n") +
            "\n  endloop\n endfacet"
        }.mkString("\n") + "\nendsolid g").getBytes("US-ASCII")
      val asc = StlSource.parse(ascii)
      Prop(bin.vertices.map(_.toSeq).toSeq == tris.flatMap(_.grouped(3).map(_.map(_.toDouble).toSeq)) &&
        asc.vertices.map(_.toSeq).toSeq == bin.vertices.map(_.toSeq).toSeq)
    })
  }

  // --------------------------------------------------------------- NetCDF

  test("NetCDF: random record grids render → values identity") {
    val gen = for {
      nLat <- Gen.chooseNum(1, 4)
      nLon <- Gen.chooseNum(1, 5)
      nRecs <- Gen.chooseNum(0, 3)
      vals <- Gen.listOfN(nRecs * nLat * nLon, exactD)
    } yield (nLat, nLon, nRecs, vals)

    check(Prop.forAllNoShrink(gen) { case (nLat, nLon, nRecs, vals) =>
      val bos = new java.io.ByteArrayOutputStream()
      val o = new java.io.DataOutputStream(bos)
      def nm(s: String): Unit = {
        val b = s.getBytes("UTF-8"); o.writeInt(b.length); o.write(b)
        val r = b.length % 4; if (r != 0) o.write(new Array[Byte](4 - r))
      }
      def hdr(begin: Int): Unit = {
        o.write("CDF".getBytes); o.write(1)
        o.writeInt(nRecs)
        o.writeInt(0x0A); o.writeInt(3)
        nm("time"); o.writeInt(0)
        nm("lat"); o.writeInt(nLat)
        nm("lon"); o.writeInt(nLon)
        o.writeInt(0); o.writeInt(0)
        o.writeInt(0x0B); o.writeInt(1)
        nm("v"); o.writeInt(3)
        o.writeInt(0); o.writeInt(1); o.writeInt(2)
        o.writeInt(0); o.writeInt(0)
        o.writeInt(6); o.writeInt(nLat * nLon * 8); o.writeInt(begin)
      }
      hdr(0); val len = bos.size(); bos.reset(); hdr(len)
      vals.foreach(o.writeDouble); o.flush()
      val got = NetCdfSource.values(bos.toByteArray)
        .filter(_._1 == "v").sortBy(_._2).map(_._3)
      Prop(got == vals) :| s"$nRecs×$nLat×$nLon"
    })
  }

  test("NetCDF CDF-5: 64-bit-classic render → values identity") {
    val gen = for {
      nLat <- Gen.chooseNum(1, 4)
      nLon <- Gen.chooseNum(1, 5)
      nRecs <- Gen.chooseNum(0, 3)
      vals <- Gen.listOfN(nRecs * nLat * nLon, exactD)
    } yield (nLat, nLon, nRecs, vals)

    check(Prop.forAllNoShrink(gen) { case (nLat, nLon, nRecs, vals) =>
      val bos = new java.io.ByteArrayOutputStream()
      val o = new java.io.DataOutputStream(bos)
      def nm(s: String): Unit = { // CDF-5: name length is INT64
        val b = s.getBytes("UTF-8"); o.writeLong(b.length.toLong); o.write(b)
        val r = b.length % 4; if (r != 0) o.write(new Array[Byte](4 - r))
      }
      def hdr(begin: Long): Unit = {
        o.write("CDF".getBytes); o.write(5)
        o.writeLong(nRecs.toLong)
        o.writeInt(0x0A); o.writeLong(3L)      // tag INT, count INT64
        nm("time"); o.writeLong(0L)
        nm("lat"); o.writeLong(nLat.toLong)
        nm("lon"); o.writeLong(nLon.toLong)
        o.writeInt(0); o.writeLong(0L)
        o.writeInt(0x0B); o.writeLong(1L)
        nm("v"); o.writeLong(3L)
        o.writeLong(0L); o.writeLong(1L); o.writeLong(2L) // dimids INT64
        o.writeInt(0); o.writeLong(0L)
        o.writeInt(6); o.writeLong(nLat * nLon * 8L); o.writeLong(begin)
      }
      hdr(0L); val len = bos.size(); bos.reset(); hdr(len.toLong)
      vals.foreach(o.writeDouble); o.flush()
      val got = NetCdfSource.values(bos.toByteArray)
        .filter(_._1 == "v").sortBy(_._2).map(_._3)
      Prop(got == vals) :| s"cdf5 $nRecs×$nLat×$nLon"
    })
  }

  // ----------------------------------------------------------------- HDF5

  test("HDF5: random dataset sets render → parse identity") {
    val dsGen = for {
      n <- Gen.chooseNum(1, 5)
      specs <- Gen.listOfN(n, for {
        rank <- Gen.chooseNum(1, 3)
        dims <- Gen.listOfN(rank, Gen.chooseNum(1L, 4L))
        vals <- Gen.listOfN(dims.product.toInt, exactD)
      } yield (dims, vals))
    } yield specs.zipWithIndex.map { case ((dims, vals), i) =>
      (s"var_$i", dims: Seq[Long], vals.toArray)
    }

    check(Prop.forAllNoShrink(dsGen) { datasets =>
      val img = graft.sinks.Hdf5Store.render(datasets)
      val back = graft.sinks.Hdf5Store.parse(img)
      Prop(back.map(_._1) == datasets.map(_._1).sorted &&
        datasets.forall { case (n, dims, vals) =>
          back.find(_._1 == n).exists { case (_, d2, v2) =>
            d2 == dims && v2.toSeq == vals.toSeq
          }
        }) :| s"${datasets.length} datasets"
    })
  }

  test("HDF5 chunked+deflate: render → parse identity incl. edge chunks") {
    import graft.sinks.Hdf5Store
    val dsGen = for {
      n <- Gen.chooseNum(1, 4)
      specs <- Gen.listOfN(n, for {
        rank <- Gen.chooseNum(1, 3)
        dims <- Gen.listOfN(rank, Gen.chooseNum(1L, 6L))
        // chunk extents independent of dims → edge chunks get fill-padded
        chunks <- Gen.listOfN(rank, Gen.chooseNum(1L, 4L))
        deflate <- Gen.oneOf(true, false)
        vals <- Gen.listOfN(dims.product.toInt, exactD)
      } yield (dims, chunks, deflate, vals))
    } yield specs.zipWithIndex.map { case ((dims, chunks, deflate, vals), i) =>
      Hdf5Store.H5Dataset(s"var_$i", dims, vals.toArray, Some(chunks), deflate)
    }

    check(Prop.forAllNoShrink(dsGen) { datasets =>
      val img = Hdf5Store.renderDatasets(datasets)
      val back = Hdf5Store.parse(img)
      Prop(datasets.forall { d =>
        back.find(_._1 == d.name).exists { case (_, d2, v2) =>
          d2 == d.dims && v2.toSeq == d.values.toSeq
        }
      }) :| s"${datasets.length} chunked datasets"
    })
  }

  test("HDF5: >8 datasets span multiple symbol-table nodes") {
    import graft.sinks.Hdf5Store
    val datasets = (0 until 21).map { i =>
      Hdf5Store.H5Dataset(f"v$i%02d", Seq(3L), Array(i * 1.0, i * 2.0, i * 3.0))
    }
    val back = Hdf5Store.parse(Hdf5Store.renderDatasets(datasets))
    assert(back.map(_._1) == datasets.map(_.name).sorted)
    assert(back.forall { case (n, dims, vals) =>
      val i = n.drop(1).toInt
      dims == Seq(3L) && vals.toSeq == Seq(i * 1.0, i * 2.0, i * 3.0)
    })
  }

  test("HDF5: netCDF-4 dimension scales and DIMENSION_LIST round trip") {
    import graft.sinks.Hdf5Store
    val img = Hdf5Store.renderDatasets(Seq(
      Hdf5Store.H5Dataset("temp", Seq(2L, 3L), Array.tabulate(6)(_ * 0.5),
        chunkDims = Some(Seq(1L, 3L)), deflate = true,
        dimNames = Seq("time", "x")),
      Hdf5Store.H5Dataset("time", Seq(2L), Array(0.0, 1.0),
        scaleName = Some("time"), dimId = 0),
      Hdf5Store.H5Dataset("x", Seq(3L), Array(0.0, 0.5, 1.0),
        scaleName = Some("x"), dimId = 1)))
    val back = Hdf5Store.parseVars(img)
    assert(back.map(_.name) == Seq("temp", "time", "x"))
    val temp = back.find(_.name == "temp").get
    assert(!temp.isScale && temp.dimNames == Seq("time", "x"))
    assert(temp.values.toSeq == Seq(0.0, 0.5, 1.0, 1.5, 2.0, 2.5))
    val time = back.find(_.name == "time").get
    assert(time.isScale && time.scaleName == "time" && time.dimId == 0)
    assert(time.dimNames.isEmpty)
    val x = back.find(_.name == "x").get
    assert(x.isScale && x.scaleName == "x" && x.dimId == 1)
    // a mix: scales referenced by a second variable in the same file
    val img2 = Hdf5Store.renderDatasets(Seq(
      Hdf5Store.H5Dataset("a", Seq(3L), Array(1.0, 2.0, 3.0), dimNames = Seq("x")),
      Hdf5Store.H5Dataset("b", Seq(3L, 3L), Array.fill(9)(7.0),
        dimNames = Seq("x", "x")),
      Hdf5Store.H5Dataset("x", Seq(3L), Array(0.0, 0.5, 1.0),
        scaleName = Some("x"), dimId = 0)))
    val back2 = Hdf5Store.parseVars(img2)
    assert(back2.find(_.name == "b").get.dimNames == Seq("x", "x"))
    assert(back2.find(_.name == "a").get.dimNames == Seq("x"))
  }

  test("HDF5 typed datasets: f32/i32/i64 round trip, contiguous and chunked") {
    import graft.sinks.Hdf5Store
    val f32Vals = Array(1.5, -2.25, 0.125, 100.0) // exactly representable in f32
    val i32Vals = Array(0.0, -7.0, 2147483647.0, 42.0)
    val i64Vals = Array(1.0, -9007199254740992.0, 9007199254740992.0, 0.0)
    val img = Hdf5Store.renderDatasets(Seq(
      Hdf5Store.H5Dataset("a_f32", Seq(4L), f32Vals, dtype = "f32"),
      Hdf5Store.H5Dataset("b_i32", Seq(4L), i32Vals, dtype = "i32"),
      Hdf5Store.H5Dataset("c_i64", Seq(2L, 2L), i64Vals, dtype = "i64",
        chunkDims = Some(Seq(1L, 2L)), deflate = true),
      Hdf5Store.H5Dataset("d_f32c", Seq(4L), f32Vals, dtype = "f32",
        chunkDims = Some(Seq(3L)), deflate = true)))
    val back = Hdf5Store.parseVars(img)
    def by(n: String) = back.find(_.name == n).get
    assert(by("a_f32").dtype == "f32" && by("a_f32").values.toSeq == f32Vals.toSeq)
    assert(by("b_i32").dtype == "i32" && by("b_i32").values.toSeq == i32Vals.toSeq)
    assert(by("c_i64").dtype == "i64" && by("c_i64").values.toSeq == i64Vals.toSeq)
    assert(by("d_f32c").values.toSeq == f32Vals.toSeq)
    // non-integral / out-of-range values are rejected, not truncated
    intercept[IllegalArgumentException] {
      Hdf5Store.renderDatasets(Seq(
        Hdf5Store.H5Dataset("x", Seq(1L), Array(1.5), dtype = "i32")))
    }
    intercept[IllegalArgumentException] {
      Hdf5Store.renderDatasets(Seq(
        Hdf5Store.H5Dataset("x", Seq(1L), Array(3e16), dtype = "i64")))
    }
  }

  test("HDF5 chunked: many chunks span a two-level B-tree") {
    import graft.sinks.Hdf5Store
    // 299 elements / chunk 2 → 150 chunks → 3 leaf nodes + internal root
    val vals = Array.tabulate(299)(i => i * 0.5 - 70.25)
    val img = Hdf5Store.renderDatasets(Seq(
      Hdf5Store.H5Dataset("big", Seq(299L), vals, Some(Seq(2L)), deflate = true)))
    val back = Hdf5Store.parse(img)
    assert(back.length == 1)
    assert(back.head._2 == Seq(299L))
    assert(back.head._3.toSeq == vals.toSeq)
  }

  // --------------------------------------------------------------- d3plot

  test("PNG: random RGB/RGBA images render → decode identity (all filters)") {
    val gen = for {
      w <- Gen.chooseNum(1, 12)
      h <- Gen.chooseNum(1, 11) // ≥ 6 rows exercises every filter type
      ch <- Gen.oneOf(3, 4)
      samples <- Gen.listOfN(w * h * ch, Gen.chooseNum(0, 255))
    } yield (w, h, ch, samples)
    check(Prop.forAllNoShrink(gen) { case (w, h, ch, samples) =>
      val png = graft.functions.Media.renderPng(w, h, ch, samples.toArray)
      val d = graft.functions.Media.decodePng(png)
      Prop(d.width == w && d.height == h && d.channels == ch &&
        d.samples.toSeq == samples) :| s"${w}x$h x$ch"
    })
  }

  test("JPEG: random flat-block grids render → decode bit-exactly") {
    // Any grid of constant 8×8 blocks is DC-only and the DC quant step
    // divides the level-shifted DC exactly, so baseline encode → decode is
    // lossless — across grayscale/color, grid shapes, and restart intervals
    // (including intervals that do and don't divide the MCU count).
    val gen = for {
      bw <- Gen.chooseNum(1, 5)
      bh <- Gen.chooseNum(1, 4)
      ch <- Gen.oneOf(1, 3)
      dri <- Gen.chooseNum(0, 7)
      vals <- Gen.listOfN(bw * bh * ch, Gen.chooseNum(0, 255))
    } yield (bw, bh, ch, dri, vals)
    check(Prop.forAllNoShrink(gen) { case (bw, bh, ch, dri, vals) =>
      val w = bw * 8; val h = bh * 8
      val samples = new Array[Int](w * h * ch)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
        samples((y * w + x) * ch + c) = vals(((y / 8) * bw + x / 8) * ch + c)
      val d = graft.functions.Media.decodeJpeg(
        graft.functions.Media.renderJpeg(w, h, ch, samples, restartInterval = dri))
      Prop(d.width == w && d.height == h && d.channels == ch &&
        d.samples.toSeq == samples.toSeq) :| s"${bw}x$bh blocks x$ch dri=$dri"
    }, n = 60)
  }

  test("JPEG 4:2:0: random flat-MCU grids render → decode bit-exactly") {
    // Under 4:2:0 the exactness unit is the 16×16 MCU (the chroma box
    // filter spans 2×2 luma blocks): per-MCU constants survive the
    // subsampled pipeline bit-exactly, across grid shapes and restarts.
    val gen = for {
      mw <- Gen.chooseNum(1, 3)
      mh <- Gen.chooseNum(1, 2)
      dri <- Gen.chooseNum(0, 4)
      vals <- Gen.listOfN(mw * mh * 3, Gen.chooseNum(0, 255))
    } yield (mw, mh, dri, vals)
    check(Prop.forAllNoShrink(gen) { case (mw, mh, dri, vals) =>
      val w = mw * 16; val h = mh * 16
      val samples = new Array[Int](w * h * 3)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        samples((y * w + x) * 3 + c) = vals(((y / 16) * mw + x / 16) * 3 + c)
      val d = graft.functions.Media.decodeJpeg(graft.functions.Media.renderJpeg(
        w, h, 3, samples, restartInterval = dri, subsample420 = true))
      Prop(d.width == w && d.height == h && d.channels == 3 &&
        d.samples.toSeq == samples.toSeq) :| s"${mw}x$mh MCUs dri=$dri"
    }, n = 40)
  }

  test("NetCDF CF packing: scale/offset/fill attributes unpack at decode") {
    val fill = -32768
    val gen = for {
      nLat <- Gen.chooseNum(1, 4)
      nLon <- Gen.chooseNum(1, 4)
      nRecs <- Gen.chooseNum(1, 3)
      codes <- Gen.listOfN(nRecs * nLat * nLon,
        Gen.frequency(4 -> Gen.chooseNum(-32767, 32767), 1 -> Gen.const(fill)))
      scale <- Gen.oneOf(0.01, 0.5, 2.0)
      offset <- Gen.oneOf(0.0, 0.5, -4.0)
    } yield (nLat, nLon, nRecs, codes, scale, offset)
    check(Prop.forAllNoShrink(gen) { case (nLat, nLon, nRecs, codes, scale, offset) =>
      val bos = new java.io.ByteArrayOutputStream()
      val o = new java.io.DataOutputStream(bos)
      def nm(s: String): Unit = {
        val b = s.getBytes("UTF-8"); o.writeInt(b.length); o.write(b)
        val r = b.length % 4; if (r != 0) o.write(new Array[Byte](4 - r))
      }
      def hdr(begin: Int): Unit = {
        o.write("CDF".getBytes); o.write(1)
        o.writeInt(nRecs)
        o.writeInt(0x0A); o.writeInt(3)
        nm("time"); o.writeInt(0)
        nm("lat"); o.writeInt(nLat)
        nm("lon"); o.writeInt(nLon)
        o.writeInt(0); o.writeInt(0)
        o.writeInt(0x0B); o.writeInt(1)
        nm("v"); o.writeInt(3)
        o.writeInt(0); o.writeInt(1); o.writeInt(2)
        o.writeInt(0x0C); o.writeInt(3) // CF packing attrs
        nm("scale_factor"); o.writeInt(6); o.writeInt(1); o.writeDouble(scale)
        nm("add_offset"); o.writeInt(6); o.writeInt(1); o.writeDouble(offset)
        nm("_FillValue"); o.writeInt(3); o.writeInt(1)
        o.writeShort(fill); o.write(new Array[Byte](2))
        o.writeInt(3) // nc_type short
        o.writeInt(nLat * nLon * 2); o.writeInt(begin)
      }
      hdr(0); val len = bos.size(); bos.reset(); hdr(len)
      codes.foreach(o.writeShort); o.flush()
      val bytes = bos.toByteArray
      val raw = NetCdfSource.values(bytes).sortBy(_._2).map(_._3)
      val cf = NetCdfSource.values(bytes, decodeCf = true).sortBy(_._2).map(_._3)
      val wantCf = codes.map(c =>
        if (c == fill) Double.NaN else c * scale + offset)
      Prop(raw == codes.map(_.toDouble) &&
        cf.zip(wantCf).forall { case (g, w) =>
          (g.isNaN && w.isNaN) || g == w
        }) :| s"$nRecs×$nLat×$nLon scale=$scale offset=$offset"
    })
  }

  test("d3plot: random shell runs render → parse identity") {
    val gen = for {
      numnp <- Gen.chooseNum(4, 20)
      nel4 <- Gen.chooseNum(0, 5)
      maxint <- Gen.chooseNum(1, 3)
      nStates <- Gen.chooseNum(0, 3)
      coords <- Gen.listOfN(numnp * 3, exactD.map(_.toFloat))
      stateVals <- Gen.listOfN(nStates * (numnp * 3 + nel4 * maxint * 7),
        exactD.map(_.toFloat))
    } yield (numnp, nel4, maxint, nStates, coords, stateVals)

    check(Prop.forAllNoShrink(gen) { case (numnp, nel4, maxint, nStates, coords, stateVals) =>
      val nv2d = maxint * 7
      val stateWords = 1 + numnp * 3 + nel4 * nv2d
      val total = 64 + numnp * 3 + nel4 * 5 + nStates * stateWords + 1
      val bb = ByteBuffer.allocate(total * 4).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("prop".padTo(40, ' ').getBytes("US-ASCII"))
      (10 until 64).foreach {
        case 15 => bb.putInt(4)
        case 16 => bb.putInt(numnp)
        case 20 => bb.putInt(1)
        case 31 => bb.putInt(nel4)
        case 32 => bb.putInt(1)
        case 33 => bb.putInt(if (nel4 > 0) nv2d else 0)
        case 36 => bb.putInt(if (nel4 > 0) maxint else 0)
        case _  => bb.putInt(0)
      }
      coords.foreach(bb.putFloat)
      (0 until nel4).foreach { e =>
        Seq(1, 2, 3, 4).foreach(bb.putInt); bb.putInt(e + 1)
      }
      val perState = stateVals.grouped(numnp * 3 + nel4 * nv2d).toSeq
      perState.zipWithIndex.foreach { case (vs, t) =>
        bb.putFloat(t * 1.0f)
        vs.foreach(bb.putFloat)
      }
      bb.putFloat(-999999.0f)
      val f = graft.sources.D3PlotSource.parse(bb.array())
      val coordsOk = f.coords.flatten.toSeq == coords
      val statesOk = f.states.length == nStates &&
        f.states.zipWithIndex.forall { case (st, t) =>
          val vs = perState(t)
          st.nodeVec.flatten.toSeq == vs.take(numnp * 3) &&
            st.shellStress.flatten.flatten.toSeq ++ Seq.empty ==
              (0 until nel4).flatMap(e => (0 until maxint).flatMap(l =>
                vs.slice(numnp * 3 + e * nv2d + l * 7, numnp * 3 + e * nv2d + l * 7 + 6)))
        }
      Prop(coordsOk && statesOk) :| s"numnp=$numnp nel4=$nel4 maxint=$maxint states=$nStates"
    }, n = 60)
  }

  test("d3plot SPH: random flag configurations decode at the right strides") {
    val widthGen = Gen.oneOf(0, 1)
    val gen = for {
      nmsph <- Gen.chooseNum(1, 5)
      numnp <- Gen.chooseNum(1, 4)
      radius <- widthGen; pressure <- widthGen
      stress <- Gen.oneOf(0, 6); epsp <- widthGen
      density <- widthGen; energy <- widthGen
      neigh <- widthGen; strain <- Gen.oneOf(0, 6)
      mass <- widthGen; hist <- Gen.chooseNum(0, 3)
      nStates <- Gen.chooseNum(1, 2)
    } yield (nmsph, numnp,
      Seq(radius, pressure, stress, epsp, density, energy, neigh, strain, mass, hist),
      nStates)
    check(Prop.forAllNoShrink(gen) { case (nmsph, numnp, counts, nStates) =>
      val numSphVars = 1 + counts.sum
      val stateWords = 1 + numnp * 3 + nmsph * numSphVars
      val total = 64 + 11 + numnp * 3 + nmsph * 2 + nStates * stateWords + 1
      val bb = ByteBuffer.allocate(total * 4).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("sph prop".padTo(40, ' ').getBytes("US-ASCII"))
      (10 until 64).foreach {
        case 15 => bb.putInt(4)
        case 16 => bb.putInt(numnp)
        case 20 => bb.putInt(1)          // IU
        case 37 => bb.putInt(nmsph)      // NMSPH
        case _  => bb.putInt(0)
      }
      bb.putInt(11); counts.foreach(bb.putInt)            // flags block
      (0 until numnp * 3).foreach(i => bb.putFloat(i.toFloat))
      (0 until nmsph).foreach { i =>                      // node & material list
        bb.putInt(i % numnp + 1); bb.putInt(i + 1)
      }
      def sphVal(t: Int, i: Int, w: Int): Float = (t * 1000 + i * 100 + w).toFloat
      (0 until nStates).foreach { t =>
        bb.putFloat(t + 0.5f)
        (0 until numnp * 3).foreach(i => bb.putFloat(i * 2.0f))
        (0 until nmsph).foreach(i =>
          (0 until numSphVars).foreach(w => bb.putFloat(sphVal(t, i, w))))
      }
      bb.putFloat(-999999.0f)
      val f = graft.sources.D3PlotSource.parse(bb.array())
      val listOk = f.sphParticles.toSeq ==
        (0 until nmsph).map(i => ((i % numnp).toLong, (i + 1).toLong))
      val labelsOk = f.sphLabels.length == numSphVars &&
        f.sphLabels.head == "material"
      val valsOk = f.states.length == nStates && f.states.zipWithIndex.forall {
        case (st, t) => st.sph.length == nmsph && st.sph.zipWithIndex.forall {
          case (p, i) => p.toSeq == (0 until numSphVars).map(sphVal(t, i, _))
        }
      }
      Prop(listOk && labelsOk && valsOk) :|
        s"nmsph=$nmsph counts=${counts.mkString(",")} states=$nStates"
    }, n = 60)
  }

  // ------------------------------------------- binary-quantization kernels

  private def hamming(a: Array[Byte], b: Array[Byte]): Long = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.BinaryType
    graft.functions.ByteVecHamming(Literal.create(a, BinaryType),
      Literal.create(b, BinaryType)).eval(null).asInstanceOf[Long]
  }

  private def pack(v: Array[Float], thr: Array[Double],
                   const: Array[Boolean]): Array[Byte] = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    graft.functions.PackSignBits(Literal.create(v, ArrayType(FloatType)),
      thr, const).eval(null).asInstanceOf[Array[Byte]]
  }

  /** ByteVecHamming is a metric on equal-length codes: identity, symmetry,
    * triangle inequality, and agreement with the per-byte popcount census.
    */
  test("ByteVecHamming: metric axioms and popcount identity") {
    val bytesGen = Gen.choose(1, 16).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-128, 127).map(_.toByte)).map(_.toArray))
    check(Prop.forAll(bytesGen, bytesGen, bytesGen) { (a0, b0, c0) =>
      val n = math.min(a0.length, math.min(b0.length, c0.length))
      val (a, b, c) = (a0.take(n), b0.take(n), c0.take(n))
      val census = (0 until n).map(i =>
        java.lang.Integer.bitCount((a(i) ^ b(i)) & 0xFF)).sum.toLong
      Prop(hamming(a, a) == 0L) :| "identity" &&
        Prop(hamming(a, b) == hamming(b, a)) :| "symmetry" &&
        Prop(hamming(a, c) <= hamming(a, b) + hamming(b, c)) :| "triangle" &&
        Prop(hamming(a, b) == census) :| "popcount census"
    })
  }

  /** PackSignBits ∘ ByteVecHamming equals the per-dimension threshold
    * mismatch count — the end-to-end contract (pad bits cancel, const
    * dims contribute nothing) that makes packed Hamming search exact.
    */
  test("PackSignBits: packed Hamming == per-dim threshold mismatch count") {
    val dimGen = Gen.choose(1, 40)
    check(Prop.forAll(dimGen, Gen.long) { (dim, seed) =>
      val rnd = new scala.util.Random(seed)
      val u = Array.fill(dim)(rnd.nextInt(2000) / 1000.0f - 1.0f)
      val v = Array.fill(dim)(rnd.nextInt(2000) / 1000.0f - 1.0f)
      val thr = Array.fill(dim)(rnd.nextInt(2000) / 1000.0 - 1.0)
      val const = Array.fill(dim)(rnd.nextInt(4) == 0)
      def bit(x: Array[Float], d: Int): Int =
        if (const(d)) 0 else if (x(d).toDouble > thr(d)) 1 else 0
      val want = (0 until dim).count(d => bit(u, d) != bit(v, d)).toLong
      val got = hamming(pack(u, thr, const), pack(v, thr, const))
      Prop(got == want) :| s"dim=$dim want=$want got=$got"
    })
  }
}
