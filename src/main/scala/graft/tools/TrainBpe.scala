package graft.tools

import org.apache.spark.sql.SparkSession

import graft.functions.Bpe

/** Regenerates `graft.functions.BpeVocab` from the driver's documents
  * corpus (`runMain graft.tools.TrainBpe [sfDir] [numMerges]`): ONE
  * distributed word-histogram aggregation, then the driver-local merge
  * loop (Bpe.train). Prints the Scala source of the learned table —
  * paste over BpeVocab.scala to refresh the embedded vocab.
  */
object TrainBpe {
  def main(args: Array[String]): Unit = {
    // defaults == the parameters that produced the committed BpeVocab
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val numMerges = if (args.length > 1) args(1).toInt else 200
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-train-bpe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try {
      val docs = graft.Tables(spark, dir, "documents")
      val merges = Bpe.train(docs, "text", numMerges)
      Bpe.validate(merges)
      println("// ---- paste into BpeVocab.scala ----")
      println(s"  // learned from $dir documents, numMerges=$numMerges, minFrequency=2")
      println("  val merges: IndexedSeq[(String, String)] = IndexedSeq(")
      println(merges.grouped(4).map(g =>
        "    " + g.map { case (l, r) => s"""("$l", "$r")""" }.mkString(", ")
      ).mkString(",\n"))
      println("  )")
    } finally spark.stop()
  }
}
