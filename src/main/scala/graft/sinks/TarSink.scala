package graft.sinks

import java.io.ByteArrayOutputStream
import java.util.zip.GZIPOutputStream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WebDataset-style tar shard writer — the counterpart of
  * [[graft.sources.TarSource]]. Members arrive as (shard, name, payload)
  * rows; each shard's members are assembled into one POSIX ustar archive
  * ON AN EXECUTOR (collect_list per shard — a shard is sized to fit a
  * task by construction, same working assumption as the per-mesh VTU
  * writes) and written via the Hadoop filesystem, so the driver never
  * sees file bytes. `.gz` shard names gzip on the fly.
  *
  * Determinism: members are laid out in the caller-provided `seq` order,
  * mtime is a fixed argument, uid/gid/uname/gname are zeroed — two runs
  * produce byte-identical shards (gzip with fixed mtime included), which
  * is what lets a round-trip query hash-match an oracle.
  */
object TarSink {

  private val Block = 512

  private def octal(v: Long, len: Int): Array[Byte] = {
    // len-1 octal digits + NUL, zero-padded — the most portable form
    val s = java.lang.Long.toOctalString(v)
    val digits = len - 1
    require(s.length <= digits, s"value $v overflows $digits octal digits")
    (("0" * (digits - s.length)) + s).getBytes("US-ASCII") :+ 0.toByte
  }

  /** One ustar header block. Names longer than 100 bytes take the
    * prefix/name split when a '/' allows it, else a GNU 'L' record is
    * emitted by [[render]] before this header.
    */
  private def header(name: String, size: Long, mtime: Long,
                     typeflag: Char, truncateName: Boolean = false): Array[Byte] = {
    val hdr = new Array[Byte](Block)
    val nb = name.getBytes("UTF-8")
    var (nameField, prefixField) = (nb, Array.emptyByteArray)
    if (nb.length > 100) {
      if (truncateName) {
        // a GNU 'L' record preceding this header carries the full name;
        // the header field holds the conventional 100-byte truncation
        nameField = java.util.Arrays.copyOf(nb, 100)
      } else {
        val cut = name.lastIndexOf('/', 154)
        require(cut > 0, s"unsplittable long name '$name' must go via 'L' record")
        nameField = name.substring(cut + 1).getBytes("UTF-8")
        prefixField = name.substring(0, cut).getBytes("UTF-8")
        require(nameField.length <= 100 && prefixField.length <= 155,
          s"name '$name' exceeds ustar prefix split")
      }
    }
    System.arraycopy(nameField, 0, hdr, 0, nameField.length)
    System.arraycopy(octal(420, 8), 0, hdr, 100, 8)    // mode 0644
    System.arraycopy(octal(0, 8), 0, hdr, 108, 8)      // uid
    System.arraycopy(octal(0, 8), 0, hdr, 116, 8)      // gid
    System.arraycopy(octal(size, 12), 0, hdr, 124, 12)
    System.arraycopy(octal(mtime, 12), 0, hdr, 136, 12)
    java.util.Arrays.fill(hdr, 148, 156, 0x20.toByte)  // checksum = spaces
    hdr(156) = typeflag.toByte
    // POSIX magic "ustar" NUL + version "00"
    System.arraycopy(Array[Byte](0x75, 0x73, 0x74, 0x61, 0x72, 0, 0x30, 0x30),
      0, hdr, 257, 8)
    System.arraycopy(prefixField, 0, hdr, 345, prefixField.length)
    var sum = 0L
    var i = 0
    while (i < Block) { sum += hdr(i) & 0xff; i += 1 }
    // 6 octal digits + NUL + space — the historical checksum layout
    val cs = java.lang.Long.toOctalString(sum)
    val padded = ("0" * (6 - cs.length)) + cs
    System.arraycopy(padded.getBytes("US-ASCII"), 0, hdr, 148, 6)
    hdr(154) = 0
    hdr(155) = 0x20
    hdr
  }

  /** Assemble an archive in member order; gzip when asked (fixed header,
    * no OS/mtime variance → deterministic bytes).
    */
  def render(members: Seq[(String, Array[Byte])], mtime: Long = 0L,
             gzip: Boolean = false, zstd: Boolean = false): Array[Byte] = {
    val raw = new ByteArrayOutputStream(members.map(_._2.length + 2 * Block).sum + 2 * Block)
    members.foreach { case (name, bytes) =>
      val needsLongLink =
        name.getBytes("UTF-8").length > 100 && name.lastIndexOf('/', 154) <= 0
      if (needsLongLink) {
        val nb = name.getBytes("UTF-8")
        raw.write(header("././@LongLink", nb.length.toLong, mtime, 'L'))
        raw.write(nb)
        raw.write(new Array[Byte](pad(nb.length)))
      }
      raw.write(header(name, bytes.length.toLong, mtime, '0',
        truncateName = needsLongLink))
      raw.write(bytes)
      raw.write(new Array[Byte](pad(bytes.length)))
    }
    raw.write(new Array[Byte](2 * Block))
    val plain = raw.toByteArray
    if (gzip) {
      val out = new ByteArrayOutputStream(plain.length / 2 + 64)
      val gz = new GZIPOutputStream(out)
      gz.write(plain)
      gz.close()
      out.toByteArray
    } else if (zstd) {
      // RFC 8878 frame via Spark's own zstd-jni (no new dependency)
      com.github.luben.zstd.Zstd.compress(plain, 3)
    } else plain
  }

  private def pad(n: Int): Int = (Block - n % Block) % Block

  /** Size-aware shard PLANNING — the step before [[writeShards]] in a real
    * WebDataset export: samples are assigned to shards so each shard holds
    * ≈ `targetBytes` of payload, in stable `orderCol` order (training
    * dataloaders rely on shard-level determinism). shard_id =
    * ⌊exclusive-prefix-sum(size) / target⌋ via the two-pass distributed
    * prefix sum (range partition → local cumsum → broadcast bases — never
    * one global window task), so the plan itself scales to corpus-sized
    * sample lists. An oversized sample still gets a shard of its own.
    */
  def planShards(df: DataFrame, orderCol: String, sizeCol: String,
                 targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes $targetBytes must be positive")
    graft.graph.GraphOps.exclusivePrefixSum(
      df.select(col(orderCol), col(sizeCol).cast("long").as(sizeCol)),
      orderCol, sizeCol)
      .withColumn("shard_id", floor(col("offset") / targetBytes).cast("long"))
  }

  /** df(shardCol, nameCol, payloadCol [, seqCol]) → one tar file per
    * shard under `dir`, members in ascending seq order. Shard names
    * ending `.gz` are gzipped. Returns (shard, n_members, n_bytes) —
    * written-file facts, one row per shard.
    */
  def writeShards(df: DataFrame, dir: String, shardCol: String = "shard",
                  nameCol: String = "name", payloadCol: String = "payload",
                  seqCol: String = "seq", mtime: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    df.select(col(shardCol).cast("string"), col(nameCol).cast("string"),
        col(payloadCol), col(seqCol).cast("long"))
      .as[(String, String, Array[Byte], Long)]
      .groupByKey(_._1)
      .mapGroups { (shard, it) =>
        val members = it.toArray.sortBy(_._4).map(r => (r._2, r._3))
        val bytes = render(members.toSeq, mtime,
          gzip = shard.endsWith(".gz"), zstd = shard.endsWith(".zst"))
        val p = new Path(dir, shard)
        val fs = p.getFileSystem(conf.value)
        val out = fs.create(p, true)
        out.write(bytes)
        out.close()
        (shard, members.length.toLong, bytes.length.toLong)
      }
      .toDF("shard", "n_members", "n_bytes")
  }
}
