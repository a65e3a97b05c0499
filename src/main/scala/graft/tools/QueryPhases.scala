package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** Phase-level wall breakdown for the composite ANN queries — the
  * measure-first instrument behind the r16 optimization pass: each trained
  * structure and the final search run under their own timer in one warm
  * session, so the expensive phase is identified instead of guessed.
  *
  * Usage: `runMain graft.tools.QueryPhases [sfDir] [reps]`
  */
object QueryPhases {
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
    val emb = graft.sources.Tables.embeddings(spark, dir)

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    (1 to reps).foreach { rep =>
      println(s"--- rep $rep ---")
      spark.catalog.clearCache()
      val cents = t("ivfCentroids k=8 it=2") {
        SimilarityOps.ivfCentroids(emb, "vec_id", "embedding",
          k = 8, iters = 2, dimHint = 64)
      }
      val rf = SimilarityOps.residualFrame(emb, "vec_id", "embedding", cents)
      t("residualFrame count") { rf.write.format("noop").mode("overwrite").save() }
      val books = t("pqCodebooks m=8 k=16 it=2") {
        SimilarityOps.pqCodebooks(rf, "vec_id", "resid",
          m = 8, k = 16, iters = 2, dimHint = 64)
      }
      t("ivfPqResidualCosineTopK") {
        SimilarityOps.ivfPqResidualCosineTopK(emb, "vec_id", "embedding",
          k = 5, maxQueryId = 20L, cents, books, nProbe = 3, dimHint = 64)
          .write.format("noop").mode("overwrite").save()
      }
      t("ivfPqTopK (non-residual)") {
        SimilarityOps.ivfPqTopK(emb, "vec_id", "embedding",
          k = 5, maxQueryId = 20L, cents, books, nProbe = 3, dimHint = 64)
          .write.format("noop").mode("overwrite").save()
      }
      t("pqCodebooks on emb (it=2)") {
        SimilarityOps.pqCodebooks(emb, "vec_id", "embedding",
          m = 8, k = 16, iters = 2, dimHint = 64)
      }
    }
    spark.stop()
  }
}
