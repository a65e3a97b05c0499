package graft.core

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Content-addressed read-through cache (reference `core/cache.py`): a
  * computed DataFrame is persisted under `<dir>/<sha256(key)>` once and read
  * back on every later request with the same key. Keys are caller-chosen
  * strings (source URL, config hash, …) — pair with `Pipeline.configHash`
  * for plan-identity caching.
  */
object CacheStore {

  private def keyHash(key: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)

  private def exists(spark: SparkSession, p: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
  }

  def path(dir: String, key: String): String = s"$dir/${keyHash(key)}"

  /** Return the cached frame for `key`, computing and persisting it on miss.
    * The parquet write is all-or-nothing (Spark's commit protocol), so a
    * killed compute never leaves a readable half-cache.
    */
  def readThrough(spark: SparkSession, dir: String, key: String)
                 (compute: => DataFrame): DataFrame = {
    val p = path(dir, key)
    if (!exists(spark, p)) compute.write.mode("overwrite").parquet(p)
    spark.read.parquet(p)
  }

  def invalidate(spark: SparkSession, dir: String, key: String): Unit = {
    val hp = new org.apache.hadoop.fs.Path(path(dir, key))
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(hp)) { fs.delete(hp, true); () }
  }
}
