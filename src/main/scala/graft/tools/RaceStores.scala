package graft.tools

import org.apache.spark.sql.SparkSession

/** Store selection for the race soaks: `file` = the local filesystem with
  * the default create-exclusive lock provider; `naf` = the simulated
  * non-atomic object store ([[NonAtomicFileSystem]] — check-then-create
  * with a widened race window, last-writer-wins PUT) with the
  * fencing-token LEASE provider and a short settle window. Running
  * WorkerRace/CompactRace under `naf` proves the claim and maintenance
  * protocols hold where atomic create-exclusive does not exist.
  */
object RaceStores {
  def ledgerDir(spark: SparkSession, store: String, prefix: String): String = {
    val tmp = java.nio.file.Files.createTempDirectory(prefix).toString
    store match {
      case "file" => tmp
      case "naf" =>
        val hc = spark.sparkContext.hadoopConfiguration
        hc.set("fs.naf.impl", classOf[NonAtomicFileSystem].getName)
        hc.set("fs.naf.impl.disable.cache", "true")
        hc.set("graft.lock.provider.naf", "lease")
        hc.set("graft.lock.lease.settle.ms", "60")
        s"naf://$tmp"
      case other => sys.error(s"unknown store '$other' (file | naf)")
    }
  }
}
