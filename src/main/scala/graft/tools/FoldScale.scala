package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.StreamingDedup

/** Folding-index ingestion-cadence soak (VERDICT r14 "what's wrong" item 1):
  * drives `applyIncrementalBatch` for N batches with the index fold ON vs
  * OFF and measures the per-batch wall at the head and tail of the run.
  * Without compaction the standing index accretes one-plus files per batch
  * and re-lists/re-plans the WHOLE directory every batch — per-batch wall
  * grows with batch count (the one-file-per-commit listing wall); with the
  * fold the read set stays ≤ threshold and the tail batch costs what the
  * head batch did.
  *
  * Usage: `runMain graft.tools.FoldScale [nBatches] [docsPerBatch]
  * [maxIndexFiles]`. Prints one JSON line with head/tail per-batch means
  * and the final index file counts for both arms.
  */
object FoldScale {
  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.map(_.toInt).getOrElse(120)
    val perBatch = args.lift(1).map(_.toInt).getOrElse(200)
    val maxFiles = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def batchDf(b: Int) = spark.range(perBatch)
      .select((lit(b.toLong * 1000000L) + col("id")).as("doc_id"),
        concat(lit(s"document batch $b row "), col("id"),
          lit(" about topic "), col("id") % 13,
          lit(" with deterministic filler text for shingles")).as("text"))

    def arm(fold: Boolean): (Double, Double, Int, Double) = {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_foldscale_$fold").toString
      StreamingDedup.seedIndex(
        Seq((1L, "seed document about the standing corpus")).toDF("doc_id", "text"),
        "doc_id", "text", 3, s"$root/idx")
      val walls = (0 until nBatches).map { b =>
        val t0 = System.nanoTime()
        StreamingDedup.applyIncrementalBatch(batchDf(b), b.toLong,
          "doc_id", "text", 3, s"$root/idx", s"$root/out",
          maxIndexFiles = if (fold) maxFiles else 0)
        (System.nanoTime() - t0) / 1e9
      }
      val head = walls.slice(2, 12)        // skip warmup batches 0-1
      val tail = walls.takeRight(10)
      val files = new java.io.File(s"$root/idx").listFiles()
        .count(_.getName.endsWith(".parquet"))
      (head.sum / head.size, tail.sum / tail.size, files, walls.sum)
    }

    val (fh, ft, ffiles, fwall) = arm(fold = true)
    val (uh, ut, ufiles, uwall) = arm(fold = false)
    println(f"""{"tool":"fold_scale","n_batches":$nBatches,""" +
      f""""docs_per_batch":$perBatch,"max_index_files":$maxFiles,""" +
      f""""fold_head_s":$fh%.3f,"fold_tail_s":$ft%.3f,"fold_files":$ffiles,""" +
      f""""fold_total_s":$fwall%.1f,""" +
      f""""nofold_head_s":$uh%.3f,"nofold_tail_s":$ut%.3f,""" +
      f""""nofold_files":$ufiles,"nofold_total_s":$uwall%.1f,""" +
      f""""fold_tail_over_head":${ft / fh}%.2f,""" +
      f""""nofold_tail_over_head":${ut / uh}%.2f}""")
    spark.stop()
  }
}
