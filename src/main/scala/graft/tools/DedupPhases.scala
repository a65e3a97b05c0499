package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** Phase-level wall breakdown for the LSH→verify→CC composite (the
  * q_keep_best / q_leakage_safe_splits shape) — which stage owns the wall.
  *
  * Usage: `runMain graft.tools.DedupPhases [sfDir] [reps]`
  */
object DedupPhases {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val docs = graft.sources.Tables.documents(spark, dir)
    (1 to reps).foreach { rep =>
      println(s"--- rep $rep ---")
      spark.catalog.clearCache()
      val shingles = t("shingleSet+persist") {
        val s = DedupOps.shingleSet(docs, "doc_id", "text", 5)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        s.count(); s
      }
      val sigs = t("minhashSignatures") {
        val x = DedupOps.minhashSignatures(shingles, "doc_id")
        x.write.format("noop").mode("overwrite").save(); x
      }
      val cands = t("bandPairs") {
        val c = DedupOps.bandPairs(sigs, "doc_id")
        c.write.format("noop").mode("overwrite").save(); c
      }
      val pairs = t("jaccardPairs(verify)") {
        val p = DedupOps.jaccardPairs(shingles, "doc_id", tau = 0.5,
          candidates = Some(DedupOps.bandPairs(
            DedupOps.minhashSignatures(shingles, "doc_id"), "doc_id")),
          maxDocFreq = Some(1000))
          .select(col("da"), col("db"))
        p.write.format("noop").mode("overwrite").save(); p
      }
      t("resolveClustersBest(CC)") {
        DedupOps.resolveClustersBest(
          docs.select(col("doc_id"), col("n_chars")), "doc_id", pairs, "n_chars")
          .write.format("noop").mode("overwrite").save()
      }
      t("ccRounds probe") {
        val (_, rounds) = DedupOps.connectedComponentsRounds(
          docs.select(col("doc_id")), "doc_id", pairs)
        println(s"[phase]   min-label rounds = $rounds")
      }
    }
    spark.stop()
  }
}
