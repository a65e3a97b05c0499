package graft.sinks

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal HDF5 container codec — the storage layer of the reference's
  * NETCDF4 output (`domains/da/sinks/netcdf_writer.py:75` writes via the
  * netCDF4 lib, whose on-disk container is HDF5; this is an independent
  * implementation of the PUBLIC "HDF5 File Format Specification" v0
  * layout). Scope: one root group holding up to 8 contiguous IEEE-f64
  * little-endian datasets — the record-grid shape the da sinks emit.
  * NetCDF-4's dimension-scale annotations are attribute sugar on top of
  * this container and are out of scope.
  *
  * Layout written (all structures 8-aligned, offsets/lengths 8 bytes):
  *  - superblock v0 (96 B) with the root symbol-table entry caching the
  *    group B-tree and local-heap addresses;
  *  - root group object header v1 with a Symbol Table message;
  *  - group B-tree v1 (one leaf) → one SNOD symbol-table node (≤ 8
  *    entries, name-ordered) → per-dataset object headers;
  *  - each dataset object header v1: Dataspace (v1, simple), Datatype
  *    (class 1 float, f64 LE), Fill Value (v2, undefined), Data Layout
  *    (v3 contiguous → address + size);
  *  - contiguous f64 data blobs.
  *
  * The parser walks the same structures generically (any B-tree level,
  * multiple SNODs, unknown header messages skipped by size), so it reads
  * a superset of what `render` writes.
  */
object Hdf5Store {

  private val Signature = Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n')
  private val Undef = -1L // 0xFFFF_FFFF_FFFF_FFFF: "undefined address"

  private val MsgDataspace = 0x0001
  private val MsgDatatype = 0x0003
  private val MsgFillValue = 0x0005
  private val MsgLayout = 0x0008
  private val MsgSymbolTable = 0x0011

  private def align8(n: Int): Int = (n + 7) & ~7

  // ------------------------------------------------------------- writer

  /** Render datasets (name, dims, row-major f64 values) into a complete
    * HDF5 file image.
    */
  def render(datasets: Seq[(String, Seq[Long], Array[Double])]): Array[Byte] = {
    require(datasets.nonEmpty, "HDF5 file needs at least one dataset")
    require(datasets.length <= 8,
      s"${datasets.length} datasets exceed one symbol-table node (max 8)")
    datasets.foreach { case (name, dims, vals) =>
      require(name.nonEmpty && !name.contains("/"), s"bad dataset name '$name'")
      require(dims.product == vals.length,
        s"dataset '$name': dims ${dims.mkString("x")} != ${vals.length} values")
    }
    val ds = datasets.sortBy(_._1) // SNOD entries must be name-ordered

    // local heap data: offset 0 holds the empty string (root link name)
    val heapBuf = new java.io.ByteArrayOutputStream()
    heapBuf.write(new Array[Byte](8)) // "" + pad
    val nameOffsets = ds.map { case (name, _, _) =>
      val off = heapBuf.size()
      val b = name.getBytes("US-ASCII")
      heapBuf.write(b); heapBuf.write(0)
      (0 until (align8(b.length + 1) - b.length - 1)).foreach(_ => heapBuf.write(0))
      off.toLong
    }
    val heapData = heapBuf.toByteArray

    def dsHeaderMessagesSize(rank: Int): Int =
      (8 + 8 + rank * 8) + (8 + 24) + (8 + 8) + (8 + 24)

    // ---- address plan (sequential, 8-aligned)
    val sbAddr = 0
    val rootOhAddr = 96
    val rootOhSize = 16 + 8 + 16 // prefix(12+4 pad) + msg hdr + symbol table msg
    val btreeAddr = rootOhAddr + rootOhSize
    val btreeSize = align8(24 + 8 + 8 + 8) // hdr + key0, child0, key1
    val heapHdrAddr = btreeAddr + btreeSize
    val heapHdrSize = 32
    val heapDataAddr = heapHdrAddr + heapHdrSize
    val snodAddr = heapDataAddr + heapData.length
    val snodSize = align8(8 + 40 * ds.length)
    var cursor = snodAddr + snodSize
    val ohAddrs = ds.map { case (_, dims, _) =>
      val a = cursor
      cursor += 16 + dsHeaderMessagesSize(dims.length)
      a
    }
    val dataAddrs = ds.map { case (_, _, vals) =>
      val a = cursor
      cursor += align8(vals.length * 8)
      a
    }
    val eof = cursor

    val img = ByteBuffer.allocate(eof).order(ByteOrder.LITTLE_ENDIAN)

    // ---- superblock v0
    img.put(Signature)
    img.put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte) // versions + reserved
    img.put(0.toByte).put(8.toByte).put(8.toByte).put(0.toByte) // shm ver, offsets, lengths, reserved
    img.putShort(4.toShort).putShort(16.toShort)                // group leaf/internal k
    img.putInt(0)                                               // consistency flags
    img.putLong(0L).putLong(Undef).putLong(eof.toLong).putLong(Undef)
    // root symbol table entry: name offset 0, root OH, cached btree+heap
    img.putLong(0L).putLong(rootOhAddr.toLong).putInt(1).putInt(0)
    img.putLong(btreeAddr.toLong).putLong(heapHdrAddr.toLong)
    require(img.position() == 96, s"superblock is ${img.position()} bytes")

    def msgHeader(tpe: Int, size: Int): Unit = {
      img.putShort(tpe.toShort).putShort(size.toShort)
      img.put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    }

    // ---- root group object header
    img.position(rootOhAddr)
    img.put(1.toByte).put(0.toByte).putShort(1.toShort)
    img.putInt(1).putInt(8 + 16)
    img.putInt(0) // v1 prefix pad to 8-align the messages
    msgHeader(MsgSymbolTable, 16)
    img.putLong(btreeAddr.toLong).putLong(heapHdrAddr.toLong)

    // ---- group B-tree v1: one leaf entry -> the SNOD
    img.position(btreeAddr)
    img.put("TREE".getBytes("US-ASCII"))
    img.put(0.toByte).put(0.toByte).putShort(1.toShort)
    img.putLong(Undef).putLong(Undef)
    img.putLong(nameOffsets.head)  // key 0: lowest name in child
    img.putLong(snodAddr.toLong)   // child 0
    img.putLong(nameOffsets.last)  // key 1: highest name in child

    // ---- local heap
    img.position(heapHdrAddr)
    img.put("HEAP".getBytes("US-ASCII"))
    img.put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    img.putLong(heapData.length.toLong).putLong(Undef).putLong(heapDataAddr.toLong)
    img.put(heapData)

    // ---- SNOD
    img.position(snodAddr)
    img.put("SNOD".getBytes("US-ASCII"))
    img.put(1.toByte).put(0.toByte).putShort(ds.length.toShort)
    ds.zipWithIndex.foreach { case (_, i) =>
      img.putLong(nameOffsets(i)).putLong(ohAddrs(i).toLong)
      img.putInt(0).putInt(0).putLong(0L).putLong(0L) // no cache, scratch 0
    }

    // ---- dataset object headers
    ds.zipWithIndex.foreach { case ((_, dims, vals), i) =>
      img.position(ohAddrs(i))
      img.put(1.toByte).put(0.toByte).putShort(4.toShort)
      img.putInt(1).putInt(dsHeaderMessagesSize(dims.length))
      img.putInt(0) // prefix pad
      // dataspace v1: version, rank, flags, 5 reserved, dims
      msgHeader(MsgDataspace, 8 + dims.length * 8)
      img.put(1.toByte).put(dims.length.toByte).put(0.toByte)
      img.put(new Array[Byte](5))
      dims.foreach(img.putLong)
      // datatype: class 1 (float) v1, f64 LE (bit field: LE order,
      // implied-MSB mantissa norm, sign bit 63), 12 property bytes
      msgHeader(MsgDatatype, 24)
      img.put(0x11.toByte).put(0x20.toByte).put(63.toByte).put(0.toByte)
      img.putInt(8) // datatype size in bytes
      img.putShort(0.toShort).putShort(64.toShort) // bit offset, precision
      img.put(52.toByte).put(11.toByte).put(0.toByte).put(52.toByte)
      img.putInt(1023) // exponent bias
      img.putInt(0)    // pad 20 -> 24
      // fill value v2, undefined
      msgHeader(MsgFillValue, 8)
      img.put(2.toByte).put(2.toByte).put(0.toByte).put(0.toByte)
      img.putInt(0)
      // data layout v3, contiguous
      msgHeader(MsgLayout, 24)
      img.put(3.toByte).put(1.toByte)
      img.putLong(dataAddrs(i).toLong).putLong(vals.length * 8L)
      img.put(new Array[Byte](6)) // pad 18 -> 24
    }

    // ---- data blobs
    ds.zipWithIndex.foreach { case ((_, _, vals), i) =>
      img.position(dataAddrs(i))
      vals.foreach(img.putDouble)
    }
    img.array()
  }

  // ------------------------------------------------------------- reader

  /** Parse an HDF5 image written to the supported subset back into
    * (name, dims, values) datasets (name-ordered).
    */
  def parse(bytes: Array[Byte]): Seq[(String, Seq[Long], Array[Double])] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length > 96 && Signature.indices.forall(i => bytes(i) == Signature(i)),
      "not an HDF5 file (signature mismatch)")
    require(bytes(8) == 0, s"unsupported superblock version ${bytes(8)}")
    require(bytes(13) == 8 && bytes(14) == 8,
      "only 8-byte offsets/lengths supported")
    // root STE: after 24-byte prefix + 32 bytes of addresses
    val steBase = 24 + 32
    val cacheType = buf.getInt(steBase + 16)
    require(cacheType == 1, s"root symbol-table entry cache type $cacheType unsupported")
    val btreeAddr = buf.getLong(steBase + 24)
    val heapAddr = buf.getLong(steBase + 32)

    // local heap: name strings live in its data segment
    require(new String(bytes, heapAddr.toInt, 4, "US-ASCII") == "HEAP", "bad heap signature")
    val heapDataAddr = buf.getLong(heapAddr.toInt + 24)
    def heapName(off: Long): String = {
      var p = (heapDataAddr + off).toInt
      val sb = new StringBuilder
      while (bytes(p) != 0) { sb.append(bytes(p).toChar); p += 1 }
      sb.toString
    }

    // group B-tree walk (any level) -> SNOD symbol-table entries
    val entries = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    def walkBtree(addr: Long): Unit = {
      val a = addr.toInt
      require(new String(bytes, a, 4, "US-ASCII") == "TREE", "bad B-tree signature")
      require(bytes(a + 4) == 0, "not a group B-tree")
      val level = bytes(a + 5)
      val used = buf.getShort(a + 6) & 0xffff
      var p = a + 24 + 8 // skip siblings + key 0
      (0 until used).foreach { _ =>
        val child = buf.getLong(p)
        if (level > 0) walkBtree(child) else readSnod(child)
        p += 16 // child + next key
      }
    }
    def readSnod(addr: Long): Unit = {
      val a = addr.toInt
      require(new String(bytes, a, 4, "US-ASCII") == "SNOD", "bad SNOD signature")
      val n = buf.getShort(a + 6) & 0xffff
      (0 until n).foreach { i =>
        val e = a + 8 + i * 40
        entries += ((heapName(buf.getLong(e)), buf.getLong(e + 8)))
      }
    }
    walkBtree(btreeAddr)

    // per-dataset object header: find dataspace + datatype + layout
    entries.toSeq.map { case (name, ohAddr) =>
      val a = ohAddr.toInt
      require(bytes(a) == 1, s"dataset '$name': unsupported object header version ${bytes(a)}")
      val nMsgs = buf.getShort(a + 2) & 0xffff
      val headerSize = buf.getInt(a + 8)
      var p = a + 16 // prefix 12 + 4 pad
      val end = p + headerSize
      var dims = Seq.empty[Long]
      var dataAddr = Undef
      var dataSize = 0L
      var sawF64 = false
      var seen = 0
      while (p < end && seen < nMsgs) {
        val tpe = buf.getShort(p) & 0xffff
        val size = buf.getShort(p + 2) & 0xffff
        val body = p + 8
        tpe match {
          case MsgDataspace =>
            val rank = bytes(body + 1).toInt
            dims = (0 until rank).map(r => buf.getLong(body + 8 + r * 8))
          case MsgDatatype =>
            val cls = bytes(body) & 0x0f
            val sz = buf.getInt(body + 4)
            require(cls == 1 && sz == 8,
              s"dataset '$name': only f64 supported (class $cls size $sz)")
            sawF64 = true
          case MsgLayout =>
            require(bytes(body) == 3 && bytes(body + 1) == 1,
              s"dataset '$name': only v3 contiguous layout supported")
            dataAddr = buf.getLong(body + 2)
            dataSize = buf.getLong(body + 10)
          case _ => () // fill value / unknown: skip by size
        }
        p = body + size
        seen += 1
      }
      require(sawF64 && dataAddr != Undef, s"dataset '$name': incomplete object header")
      val n = (dataSize / 8).toInt
      require(dims.product == n.toLong, s"dataset '$name': dims/data size mismatch")
      val vals = Array.tabulate(n)(i => buf.getDouble((dataAddr + i * 8L).toInt))
      (name, dims, vals)
    }.sortBy(_._1)
  }
}
