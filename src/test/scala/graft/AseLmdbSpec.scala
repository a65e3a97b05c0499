package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.AseLmdbSource

/** LMDB walker + ASE row decode: a fixture built page-by-page per the
  * public LMDB layout (dual meta pages, branch → leaf descent, inline and
  * overflow values) must decode into the long row model and the typed
  * systems table.
  */
class AseLmdbSpec extends SparkSpec {

  private val psize = 4096

  private def zlib(s: String): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(s.getBytes("UTF-8")); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end(); out.toByteArray
  }

  private val row1 =
    """{"numbers":{"__ndarray__":[[2],"int64",[1,8]]},
      |"positions":{"__ndarray__":[[2,3],"float64",[0.0,0.0,0.0,1.5,0.0,0.0]]},
      |"energy":-3.25,"pbc":[true,true,false]}""".stripMargin.replaceAll("\n", "")
  private val row2 =
    """{"numbers":[6,6,8],"positions":{"__ndarray__":[[3,3],"float64",
      |[0,0,0,1,1,1,2,2,2]]},"energy":7.5,"pbc":{"__ndarray__":[[3],"bool",
      |[true,true,true]]}}""".stripMargin.replaceAll("\n", "")

  /** Build a single-file LMDB image: meta 0/1, leaf pages 2 (keys "1",
    * "nextid") and 3 (key "2" as BIGDATA → overflow 5), branch root 4.
    */
  private def lmdbBytes(): Array[Byte] = {
    val img = ByteBuffer.allocate(psize * 6).order(ByteOrder.LITTLE_ENDIAN)

    def pageHeader(pgno: Int, flags: Int, nKeys: Int): Unit = {
      img.position(pgno * psize)
      img.putLong(pgno.toLong).putShort(0.toShort).putShort(flags.toShort)
      img.putShort((16 + 2 * nKeys).toShort).putShort(psize.toShort)
    }
    def putLeafNode(pgno: Int, slot: Int, off: Int, key: String,
                    data: Array[Byte], bigOvfPgno: Int = -1): Unit = {
      img.putShort(pgno * psize + 16 + 2 * slot, off.toShort)
      val base = pgno * psize + off
      img.position(base)
      val size = data.length
      img.putShort((size & 0xffff).toShort).putShort((size >> 16).toShort)
      img.putShort((if (bigOvfPgno >= 0) 1 else 0).toShort) // F_BIGDATA
      img.putShort(key.length.toShort)
      img.put(key.getBytes("US-ASCII"))
      if (bigOvfPgno >= 0) img.putLong(bigOvfPgno.toLong) else img.put(data)
    }
    def putBranchNode(pgno: Int, slot: Int, off: Int, key: String, child: Int): Unit = {
      img.putShort(pgno * psize + 16 + 2 * slot, off.toShort)
      img.position(pgno * psize + off)
      img.putShort((child & 0xffff).toShort).putShort(((child >> 16) & 0xffff).toShort)
      img.putShort(0.toShort).putShort(key.length.toShort)
      img.put(key.getBytes("US-ASCII"))
    }
    def meta(pgno: Int, txnid: Long, root: Long): Unit = {
      pageHeader(pgno, 0x08, 0) // P_META
      val m = pgno * psize + 16
      img.position(m)
      img.putInt(0xBEEFC0DE).putInt(1)   // magic, version
      img.putLong(0L).putLong(psize * 6L) // address, mapsize
      img.putInt(psize).putShort(0.toShort).putShort(0.toShort) // dbs[0] pad=psize
      img.putLong(0L).putLong(0L).putLong(0L).putLong(0L).putLong(-1L) // free db
      img.putInt(0).putShort(0.toShort).putShort(2.toShort)     // dbs[1], depth 2
      img.putLong(1L).putLong(2L).putLong(1L).putLong(3L)
      img.putLong(root)                   // md_root @ meta+112
      img.putLong(5L).putLong(txnid)      // last_pg, txnid @ meta+128
    }

    val z1 = zlib(row1); val z2 = zlib(row2)
    meta(0, 0L, root = 2L) // stale meta points at a leaf; ignored (lower txnid)
    meta(1, 1L, root = 4L)
    pageHeader(2, 0x02, 2) // leaf: "1" inline, "nextid" inline (reserved)
    putLeafNode(2, 0, 100, "1", z1)
    putLeafNode(2, 1, 100 + 8 + 1 + z1.length + 6, "nextid", "3".getBytes)
    pageHeader(3, 0x02, 1) // leaf: "2" as BIGDATA → overflow page 5
    putLeafNode(3, 0, 100, "2", z2, bigOvfPgno = 5)
    pageHeader(4, 0x01, 2) // branch root → leaves 2 and 3
    putBranchNode(4, 0, 100, "", 2)
    putBranchNode(4, 1, 120, "2", 3)
    img.position(5 * psize)
    img.putLong(5L).putShort(0.toShort).putShort(0x04.toShort) // P_OVERFLOW
    img.putInt(1)
    img.position(5 * psize + 16)
    img.put(z2)
    img.array()
  }

  test("parse walks branch -> leaf -> overflow and meta txnid selection") {
    val kv = AseLmdbSource.parse(lmdbBytes()).toMap
    assert(kv.keySet == Set("1", "2", "nextid"))
    assert(new String(kv("nextid"), "US-ASCII") == "3")
    // values round-trip through zlib
    def inflate(b: Array[Byte]) = {
      val i = new java.util.zip.Inflater(); i.setInput(b)
      val out = new Array[Byte](65536); val n = i.inflate(out); i.end()
      new String(out, 0, n, "UTF-8")
    }
    assert(inflate(kv("1")) == row1)
    assert(inflate(kv("2")) == row2)
    // non-LMDB bytes fail loudly
    intercept[IllegalArgumentException] {
      AseLmdbSource.parse(Array.fill[Byte](8192)(7))
    }
  }

  test("parseAll: named sub-databases, DUPSORT sub-pages and dup sub-trees") {
    val psz = 4096
    val img = ByteBuffer.allocate(psz * 8).order(ByteOrder.LITTLE_ENDIAN)
    def pageHeader(pgno: Int, flags: Int, nKeys: Int): Unit = {
      img.position(pgno * psz)
      img.putLong(pgno.toLong).putShort(0.toShort).putShort(flags.toShort)
      img.putShort((16 + 2 * nKeys).toShort).putShort(psz.toShort)
    }
    def putNode(pgno: Int, slot: Int, off: Int, key: String,
                data: Array[Byte], nflags: Int): Unit = {
      img.putShort(pgno * psz + 16 + 2 * slot, off.toShort)
      val base = pgno * psz + off
      img.position(base)
      img.putShort((data.length & 0xffff).toShort)
        .putShort((data.length >> 16).toShort)
      img.putShort(nflags.toShort).putShort(key.length.toShort)
      img.put(key.getBytes("US-ASCII")).put(data)
    }
    def dbDescriptor(root: Long): Array[Byte] = {
      val b = ByteBuffer.allocate(48).order(ByteOrder.LITTLE_ENDIAN)
      b.putLong(40, root)
      b.array()
    }
    def meta(pgno: Int, txnid: Long, root: Long): Unit = {
      pageHeader(pgno, 0x08, 0)
      val m = pgno * psz + 16
      img.position(m)
      img.putInt(0xBEEFC0DE).putInt(1)
      img.putLong(0L).putLong(psz * 8L)
      img.putInt(psz).putShort(0.toShort).putShort(0.toShort)
      img.putLong(0L).putLong(0L).putLong(0L).putLong(0L).putLong(-1L)
      img.position(m + 112)
      img.putLong(root)
      img.putLong(7L).putLong(txnid)
    }
    // embedded DUPSORT sub-page (offsets relative to sub-page start):
    // two dup items "a1", "b22"
    val subPage = {
      val b = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
      b.putLong(0L).putShort(0.toShort).putShort((0x40 | 0x02).toShort)
      b.putShort((16 + 4).toShort).putShort(64.toShort)
      b.putShort(16, 24.toShort); b.putShort(18, 36.toShort)
      b.position(24); b.putShort(0.toShort).putShort(0.toShort)
      b.putShort(0.toShort).putShort(2.toShort); b.put("a1".getBytes)
      b.position(36); b.putShort(0.toShort).putShort(0.toShort)
      b.putShort(0.toShort).putShort(3.toShort); b.put("b22".getBytes)
      b.array()
    }
    // LEAF2 sub-page: fixed 4-byte dup items "AAAA", "BBBB" packed at
    // ksize stride from offset 16; mp_pad = ksize, lower = 16 + 2*n
    val leaf2Sub = {
      val b = ByteBuffer.allocate(32).order(ByteOrder.LITTLE_ENDIAN)
      b.putLong(0L).putShort(4.toShort)                 // pgno, mp_pad=ksize
      b.putShort((0x40 | 0x20).toShort)                 // P_SUBP | P_LEAF2
      b.putShort((16 + 2 * 2).toShort).putShort(32.toShort)
      b.position(16); b.put("AAAA".getBytes).put("BBBB".getBytes)
      b.array()
    }
    meta(0, 0L, 2L); meta(1, 1L, 2L)
    pageHeader(2, 0x02, 6) // main leaf
    putNode(2, 0, 120, "dup", subPage, nflags = 0x04)            // F_DUPDATA
    putNode(2, 1, 120 + 8 + 3 + subPage.length + 5, "dupt",
      dbDescriptor(4L), nflags = 0x06)                           // dup sub-tree
    putNode(2, 2, 320, "plain", "hello".getBytes, nflags = 0)
    putNode(2, 3, 340, "side", dbDescriptor(3L), nflags = 0x02)  // named sub-DB
    putNode(2, 4, 400, "dupf", leaf2Sub, nflags = 0x04)          // LEAF2 dups
    pageHeader(3, 0x02, 2) // sub-DB leaf
    putNode(3, 0, 100, "s1", "v1".getBytes, nflags = 0)
    putNode(3, 1, 120, "s2", "v2".getBytes, nflags = 0)
    putNode(2, 5, 460, "dupt2", dbDescriptor(5L), nflags = 0x06) // LEAF2 tree
    pageHeader(4, 0x02, 2) // dup sub-tree leaf: keys ARE the data items
    putNode(4, 0, 100, "x9", Array.empty[Byte], nflags = 0)
    putNode(4, 1, 120, "y10", Array.empty[Byte], nflags = 0)
    // full LEAF2 page (DUPFIXED dup sub-tree grown past its embedded
    // sub-page): flags P_LEAF|P_LEAF2, raw 3-byte items from offset 16
    pageHeader(5, 0x02 | 0x20, 2)
    img.putShort(5 * psz + 8, 3.toShort) // mp_pad = fixed item size
    img.position(5 * psz + 16); img.put("cc1".getBytes).put("dd2".getBytes)

    val all = AseLmdbSource.parseAll(img.array())
    def vals(db: String, key: String): Set[String] =
      all.filter(e => e.db == db && e.key == key)
        .map(e => new String(e.value, "US-ASCII")).toSet
    assert(vals("", "dup") == Set("a1", "b22"))
    assert(vals("", "dupf") == Set("AAAA", "BBBB")) // LEAF2 fixed-size dups
    assert(vals("", "dupt") == Set("x9", "y10"))
    assert(vals("", "dupt2") == Set("cc1", "dd2")) // full LEAF2 tree page
    assert(vals("", "plain") == Set("hello"))
    assert(vals("side", "s1") == Set("v1") && vals("side", "s2") == Set("v2"))
    // main-DB view hides descriptor nodes but keeps dup expansions
    val mainKeys = AseLmdbSource.parse(img.array()).map(_._1).toSet
    assert(mainKeys == Set("dup", "dupf", "dupt", "dupt2", "plain"))
  }

  test("AseLmdbSink.buildImage round-trips through parse: inline, overflow, multi-leaf") {
    val rng = new scala.util.Random(11)
    // values spanning inline (< page/4) and BIGDATA overflow (> page) sizes,
    // enough entries to force multiple leaves under a branch root
    val entries = (1 to 120).map { i =>
      val len = if (i % 17 == 0) 9000 + rng.nextInt(3000) else 40 + rng.nextInt(800)
      val v = Array.fill[Byte](len)((i % 97).toByte)
      i.toString -> v
    }
    val img = graft.sinks.AseLmdbSink.buildImage(entries)
    val back = AseLmdbSource.parse(img).toMap
    assert(back.keySet == entries.map(_._1).toSet)
    entries.foreach { case (k, v) =>
      assert(java.util.Arrays.equals(back(k), v), s"value mismatch at key $k")
    }
  }

  test("AseLmdbSink.write -> AseLmdbSource.read round trip on executors") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("asew").toString + "/store"
    val df = (1L to 50L).map(i => (i, s"""{"energy":$i.5}""")).toDF("row_id", "json")
      .repartition(3)
    val paths = graft.sinks.AseLmdbSink.write(df, dir)
    assert(paths.nonEmpty && paths.forall(_.endsWith(".aselmdb")))
    val rows = AseLmdbSource.read(spark, dir)
    assert(rows.count() == 50)
    val e = rows.select(col("row_id"),
      get_json_object(col("json"), "$.energy").cast("double").as("energy"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert((1L to 50L).forall(i => e(i) == i + 0.5))
  }

  test("branch-page cycle fails descriptively, not StackOverflowError") {
    val img = lmdbBytes()
    // re-point the branch root's first child (u16 lo at page4+100) at the
    // root itself, forming a 4 -> 4 cycle
    ByteBuffer.wrap(img).order(ByteOrder.LITTLE_ENDIAN)
      .putShort(4 * psize + 100, 4.toShort)
    val e = intercept[IllegalArgumentException] { AseLmdbSource.parse(img) }
    assert(e.getMessage.contains("cycle"))
  }

  test("read + systems: reserved keys skipped, ndarray/plain forms decode") {
    val dir = Files.createTempDirectory("ase").toString
    Files.write(Paths.get(dir, "db0.aselmdb"), lmdbBytes())
    val rows = AseLmdbSource.read(spark, dir)
    assert(rows.count() == 2) // nextid skipped
    val sys = AseLmdbSource.systems(rows).orderBy("sys_id").collect()
    assert(sys(0).getAs[scala.collection.Seq[Int]]("atomic_numbers") == Seq(1, 8))
    assert(sys(0).getAs[scala.collection.Seq[Double]]("positions") == Seq(0.0, 0.0, 0.0, 1.5, 0.0, 0.0))
    assert(sys(0).getAs[Double]("energy") == -3.25)
    assert(sys(0).getAs[scala.collection.Seq[Boolean]]("pbc") == Seq(true, true, false))
    // plain-list numbers + ndarray pbc on row 2
    assert(sys(1).getAs[scala.collection.Seq[Int]]("atomic_numbers") == Seq(6, 6, 8))
    assert(sys(1).getAs[Double]("energy") == 7.5)
    assert(sys(1).getAs[scala.collection.Seq[Boolean]]("pbc") == Seq(true, true, true))
    // composes with the atm operators
    val info = graft.graph.GraphOps.atomicInfo(
      AseLmdbSource.systems(rows)
        .withColumn("edge_index_src", col("atomic_numbers"))
        .withColumnRenamed("db_id", "ignore"))
    assert(info.count() == 2)
  }
}
