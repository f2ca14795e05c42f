package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Invariant battery for Curation.packSequences on randomized corpora
  * (sizes incl. zeros and window-sized docs): per shard the offsets are
  * gapless, window bookkeeping is arithmetic-consistent with the
  * offsets, and the output is a permutation-stable function of the
  * (id, size) multiset — the properties the packing manifest contract
  * rests on beyond the oracle's one fixed corpus.
  */
class CurationSpec extends SparkSuite {
  import spark.implicits._

  test("packSequences invariants hold on randomized corpora") {
    val rng = new scala.util.Random(31)
    for (trial <- 1 to 3) {
      val budget = Seq(64L, 100L, 8192L)(trial - 1)
      val docs = (1 to 500).map { i =>
        val size = rng.nextInt(5) match {
          case 0 => 0L // empty doc
          case 1 => budget // exactly one window
          case _ => rng.nextInt(2 * budget.toInt).toLong
        }
        (i.toLong, size)
      }
      def run(rows: Seq[(Long, Long)]) = Curation.packSequences(
          rows.toDF("doc_id", "sz"), "doc_id", "sz", 4L, budget)
        .select($"doc_id", $"sz", $"shard", $"seq_start", $"window_id",
          $"window_offset", $"n_windows")
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      val out = run(docs)
      assert(out.length == docs.length)
      out.groupBy(_._3).foreach { case (shard, rows) =>
        var expect = 0L
        rows.sortBy(_._1).foreach { case (id, sz, sh, start, win, off, nw) =>
          assert(sh == id % 4, s"trial $trial doc $id shard")
          assert(start == expect, s"trial $trial doc $id gapless offsets")
          expect += sz
          assert(win == start / budget && off == start % budget,
            s"trial $trial doc $id window bookkeeping")
          // straddle count from an INDEPENDENT model (not the production
          // formula): a doc with bytes spans first-byte window .. last-
          // byte window; an empty doc occupies its start window, except
          // exactly ON a later window boundary where it owns no offset
          val wantNw =
            if (sz > 0) (start + sz - 1) / budget - start / budget + 1
            else if (start > 0 && start % budget == 0) 0L
            else 1L
          assert(nw == wantNw, s"trial $trial doc $id straddle count")
        }
      }
      // permutation stability: the manifest is a function of the
      // (id, size) multiset — input row order must not matter
      val shuffled = run(rng.shuffle(docs))
      assert(shuffled.toSet == out.toSet, s"trial $trial permutation stability")
    }
  }
}
