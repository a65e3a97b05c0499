package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.SimilarityOps

/** Recall@k-vs-nProbe curve over a testdata embeddings table — the tuning
  * table a retrieval deployment reads before picking its probe budget
  * (recall rises with lists probed; cost is the probed fraction of the
  * corpus). Composes [[SimilarityOps.annRecallReport]] at each nProbe.
  *
  * Usage: `runMain graft.tools.AnnCurve [sfDir] [k] [nQueries] [nlist]`
  * Prints one JSON line: per-nProbe recall for every tier.
  */
object AnnCurve {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val nq = args.lift(2).map(_.toLong).getOrElse(8L)
    val nlist = args.lift(3).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = graft.sources.Tables.embeddings(spark, dir)
    val cents = SimilarityOps.ivfCentroids(emb, "vec_id", "embedding",
      k = nlist, iters = 3, dimHint = 64)
    val books = SimilarityOps.pqCodebooks(emb, "vec_id", "embedding",
      m = 8, k = 16, iters = 2, dimHint = 64)
    val probes = Iterator.iterate(1)(_ * 2).takeWhile(_ <= nlist).toSeq
    val rows = probes.map { np =>
      val t0 = System.nanoTime()
      val rep = SimilarityOps.annRecallReport(emb, "vec_id", "embedding",
        k, nq, cents, np, books, dimHint = 64)
        .collect().map(r => r.getAs[String]("tier") ->
          r.getAs[Double]("recall")).toMap
      val sec = (System.nanoTime() - t0) / 1e9
      s"""{"n_probe":$np,"ivf":${rep("ivf")},"pq":${rep("pq")},""" +
        s""""sq8":${rep("sq8")},"binary":${rep("binary")},"sec":$sec}"""
    }
    println(s"""{"tool":"ann_curve","sf_dir":"$dir","k":$k,""" +
      s""""n_queries":$nq,"nlist":$nlist,"curve":[${rows.mkString(",")}]}""")
    spark.stop()
  }
}
