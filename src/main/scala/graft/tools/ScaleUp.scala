package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Synthesizes a larger scale factor from the driver's sf0.1 tables for
  * LOCAL scaling measurement (`runMain graft.tools.ScaleUp [src] [dst]
  * [factor]` → BENCH's sf1 section): the driver provides no sf1 data, and
  * naive row duplication would corrupt exactly the workloads whose scaling
  * matters most (dedup/ANN pair counts grow quadratically in duplicate
  * multiplicity). Per-table strategy:
  *
  *  - TPC-H facts (lineitem/orders/customer/supplier/part, events):
  *    `factor` copies with CONSISTENT key shifts — copy c's foreign keys
  *    point at copy c's dimension rows — so join fan-outs, group counts,
  *    and per-key row counts scale exactly as a real SF increase does.
  *    nation/region stay fixed (constant across SF, as in TPC-H itself).
  *  - documents: copy 0 verbatim; copies 1+ shuffle each text's words by
  *    a position-keyed permutation (same permutation for every doc within
  *    a copy, different across copies). Word histograms — and therefore
  *    BPE, langid, token stats — are preserved exactly; exact-duplicate
  *    pairs and substitution-type near-dups stay near-dups WITHIN a copy;
  *    across copies the 3-token shingles are destroyed, so the LSH/
  *    Jaccard workload scales linearly instead of exploding on
  *    cross-copy duplicates. (Insertion-type near-dups shift positions
  *    and may not survive the shuffle — dup density in copies 1+ is a
  *    modest undercount, stated here rather than hidden.)
  *  - embeddings: copy 0 verbatim; copies 1+ apply a copy-specific SIGNED
  *    COORDINATE PERMUTATION — an orthogonal transform, so norms and all
  *    within-copy pairwise cosines (including the natural high-cosine
  *    tail the dedup/ANN queries feed on) are preserved bit-for-bit in
  *    structure, while cross-copy cosines are ~N(0, 1/64) noise. ANN and
  *    cosine-dedup candidate load scales linearly.
  *
  * Writes under /root/repo (gitignored) — never /root/testdata.
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/root/repo/testdata_sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    require(factor >= 1, s"factor must be >= 1: $factor")
    val spark = graft.Sessions.local(appName = "graft-scaleup")
    import spark.implicits._
    try {
      def tbl(n: String): DataFrame = graft.Tables(spark, src, n)
      def write(df: DataFrame, n: String): Unit =
        df.write.mode("overwrite").parquet(s"$dst/$n.parquet")
      def keyBase(df: DataFrame, key: String): Long =
        df.agg(max(col(key))).head().getLong(0) + 1L

      // key-domain sizes at the source SF — copy c shifts key k to
      // k + c*base so copies never collide and joins stay copy-local
      val ordBase = keyBase(tbl("orders"), "o_orderkey")
      val custBase = keyBase(tbl("customer"), "c_custkey")
      val partBase = keyBase(tbl("part"), "p_partkey")
      val suppBase = keyBase(tbl("supplier"), "s_suppkey")
      val evBase = keyBase(tbl("events"), "event_id")
      val usrBase = keyBase(tbl("events"), "user_id")

      val copyCol = explode(array((0 until factor).map(lit): _*)).as("copy")
      def copies(df: DataFrame)(shifts: (String, Long)*): DataFrame = {
        val withC = df.select(col("*"), copyCol)
        shifts.foldLeft(withC) { case (d, (k, base)) =>
          d.withColumn(k, col(k) + col("copy") * base)
        }.drop("copy")
      }

      write(tbl("region"), "region")
      write(tbl("nation"), "nation")
      write(copies(tbl("customer"))("c_custkey" -> custBase), "customer")
      write(copies(tbl("supplier"))("s_suppkey" -> suppBase), "supplier")
      write(copies(tbl("part"))("p_partkey" -> partBase), "part")
      write(copies(tbl("orders"))(
        "o_orderkey" -> ordBase, "o_custkey" -> custBase), "orders")
      write(copies(tbl("lineitem"))(
        "l_orderkey" -> ordBase, "l_partkey" -> partBase,
        "l_suppkey" -> suppBase), "lineitem")
      write(copies(tbl("events"))(
        "event_id" -> evBase, "user_id" -> usrBase), "events")

      // documents: position-keyed word shuffle per copy (see scaladoc)
      val docs = tbl("documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .as[(Long, String, String, String, Long)]
      val docBase = keyBase(tbl("documents"), "doc_id")
      val f = factor
      val scaledDocs = docs.flatMap { case (id, text, lang, source, nChars) =>
        (0 until f).iterator.map { c =>
          if (c == 0) (id, text, lang, source, nChars)
          else {
            val words = text.split(" ", -1)
            val shuffled = words.zipWithIndex.sortBy { case (_, i) =>
              ((i.toLong * 2654435761L + c * 40503L) % 1000003L, i.toLong)
            }.map(_._1)
            val t2 = shuffled.mkString(" ")
            (id + c * docBase, t2, lang, source, t2.length.toLong)
          }
        }
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      write(scaledDocs, "documents")

      // embeddings: signed coordinate permutation per copy (see scaladoc)
      val embs = tbl("embeddings")
        .select("vec_id", "embedding", "label")
        .as[(Long, Array[Float], Int)]
      val vecBase = keyBase(tbl("embeddings"), "vec_id")
      val dim = embs.head()._2.length
      val transforms: IndexedSeq[(Array[Int], Array[Int])] =
        (0 until factor).map { c =>
          val rnd = new scala.util.Random(c * 7919 + 13)
          (rnd.shuffle((0 until dim).toVector).toArray,
            Array.fill(dim)(if (rnd.nextBoolean()) 1 else -1))
        }
      val scaledEmbs = embs.flatMap { case (id, v, label) =>
        (0 until f).iterator.map { c =>
          if (c == 0) (id, v, label)
          else {
            val (perm, sign) = transforms(c)
            val out = new Array[Float](v.length)
            var k = 0
            while (k < v.length) { out(k) = sign(k) * v(perm(k)); k += 1 }
            (id + c * vecBase, out, label)
          }
        }
      }.toDF("vec_id", "embedding", "label")
      write(scaledEmbs, "embeddings")

      println(s"wrote ${graft.Tables.names.size} tables x$factor to $dst")
    } finally spark.stop()
  }
}
