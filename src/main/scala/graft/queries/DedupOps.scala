package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF, native}

/** Deduplication operators for training-data pipelines (north star):
  * exact hash-dedup, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Hashing uses md5 (identical across Spark/DuckDB/everything), with the
  * classic min-of-keyed-hash construction standing in for random
  * permutations. Scale design:
  *  - exact dedup = one hash-aggregate on the text (or a digest of it);
  *  - shingles, MinHash signatures, LSH band hashes, and SimHash are all
  *    computed *in-row* (TextFunctions.shingles3 + the native
  *    graft.functions expressions) — the per-document work is a single
  *    narrow scan with zero shuffles; the only shuffle in the whole LSH
  *    pipeline is the equi-join on (band, band_hash), whose key is
  *    uniformly distributed by construction;
  *  - the raw n-gram Jaccard query is the *oracle* for the LSH variant
  *    (exact but quadratic in the worst case; usable because candidate
  *    pairs are pre-blocked on a shared shingle).
  */
object DedupOps extends QueryGroup {

  private val NumHashes = 8
  private val BandSize = 2 // 4 bands of 2 → candidates at jaccard ≳ 0.5
  private val NumBands = NumHashes / BandSize
  // hot-shingle bound for the exact-Jaccard self-join: a shingle in d docs
  // yields d(d-1)/2 pairs, so df is capped (standard posting-list cap)
  private val MaxShingleDf = 100

  /** (doc_id, sharr): distinct 3-token shingles per document, in-row. */
  private def shingleArrays(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    spread(t(s, dir, "documents"))
      .select($"doc_id", TF.shingles3($"text").as("sharr"))
      .filter(size($"sharr") >= 1)
  }

  private val SQL_SHINGLES =
    """SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
      |FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |      FROM documents
      |      WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) >= 3),
      |  UNNEST(generate_series(1, len(toks) - 2)) t(i)""".stripMargin

  override def queries: Map[String, Q] = Map(
    // exact dedup: hash-groupBy on content; keeper = min doc_id.
    "dedup_exact" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .groupBy(md5($"text").as("content_hash"))
        .agg(count(lit(1)).as("n_copies"), min($"doc_id").as("keeper"))
    }),

    // exact n-gram Jaccard on candidate pairs sharing ≥1 shingle. The
    // shingle explode + self-join is the blocking step; a document-
    // frequency cap bounds it: a shingle shared by d docs contributes
    // d(d-1)/2 candidate pairs, so one boilerplate sentence in 10⁶ docs
    // would be ~10¹² pairs. Shingles with df > MaxShingleDf carry no
    // discriminative signal and are dropped from the representation
    // (blocking, intersection AND sizes — consistently, so jaccard stays
    // well-defined); the per-shingle pair count is then ≤ MaxShingleDf²/2.
    "dedup_ngram_jaccard" -> ((s, dir) => {
      import s.implicits._
      val docs = shingleArrays(s, dir)
      // materialize the exploded form once (it feeds the df computation and
      // the anti-join) — localCheckpoint, not cache: an eager checkpoint is
      // computed exactly once, truncates lineage for every consumer, and is
      // NOT pinned in the CacheManager, so its blocks are released after the
      // query instead of occupying executor memory for the rest of a
      // multi-query session
      val sh0 = docs.select($"doc_id", explode($"sharr").as("shingle")).localCheckpoint()
      // sharr is distinct-per-doc, so count(*) per shingle = document
      // frequency. hot's cardinality is only bounded by
      // total_shingle_rows / MaxShingleDf — small in practice but not
      // guaranteed tiny on a boilerplate-heavy corpus, so no forced
      // broadcast: let AQE pick the anti-join strategy from actual sizes.
      val hot = sh0.groupBy($"shingle").agg(count(lit(1)).as("df"))
        .filter($"df" > MaxShingleDf).select($"shingle")
      // the df-capped relation feeds THREE consumers (sizes + both sides of
      // the self-join): checkpoint it so the anti-join runs once, not 3×
      val sh = sh0.join(hot, Seq("shingle"), "left_anti").localCheckpoint()
      val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n_sh"))
      val pairs = sh.as("a").join(sh.as("b"), col("a.shingle") === col("b.shingle"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter"))
      // sizes is corpus-sized (one row per doc): plain equi-joins — AQE
      // may still broadcast at small scale, but nothing forces a
      // driver-collected broadcast of a billion-row table at 100 TB
      pairs
        .join(sizes.select($"doc_id".as("doc_a"), $"n_sh".as("na")), "doc_a")
        .join(sizes.select($"doc_id".as("doc_b"), $"n_sh".as("nb")), "doc_b")
        .withColumn("jaccard",
          $"inter".cast("double") / ($"na" + $"nb" - $"inter").cast("double"))
        .filter($"jaccard" >= 0.5)
        .select($"doc_a", $"doc_b", $"jaccard")
    }),

    // MinHash signatures + LSH banding → candidate pairs + estimated
    // jaccard. Signatures (native.minhash_sigs) and band hashes are in-row;
    // band blocking is the only wide step; the signature-agreement estimate
    // is computed by zipping the two 8-element arrays, not a re-join per h.
    "dedup_minhash_lsh" -> ((s, dir) => {
      import s.implicits._
      // sigs feeds the banding and both sides of the estimate join —
      // localCheckpoint the 8-string-per-doc signatures rather than
      // re-hashing shingles (eager, computed once, and unlike cache() not
      // pinned in the CacheManager after the query finishes)
      val sigs = shingleArrays(s, dir)
        .select($"doc_id", native.minhash_sigs($"sharr", NumHashes).as("sigs"))
        .localCheckpoint()
      // band b (0-based) = md5 of its ordered "h:sig" components
      val banded = sigs.select($"doc_id", posexplode(
        transform(sequence(lit(0), lit(NumBands - 1)), b =>
          md5(array_join(array_sort(
            transform(sequence(lit(1), lit(BandSize)), j =>
              concat((b * BandSize + j).cast("string"), lit(":"),
                element_at($"sigs", b * BandSize + j)))), ",")))))
        .toDF("doc_id", "band", "band_hash")
      val cand = banded.as("x").join(banded.as("y"),
          col("x.band") === col("y.band") && col("x.band_hash") === col("y.band_hash"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      // sigs is corpus-sized — equi-join, don't force a broadcast (see
      // the sizes join above); the bucket-blocked cand side is the small one
      cand
        .join(sigs.select($"doc_id".as("doc_a"), $"sigs".as("sa")), "doc_a")
        .join(sigs.select($"doc_id".as("doc_b"), $"sigs".as("sb")), "doc_b")
        .select($"doc_a", $"doc_b",
          (size(filter(zip_with($"sa", $"sb", (x, y) => x === y), m => m))
            .cast("double") / lit(NumHashes.toDouble)).as("est_jaccard"))
    }),

    // SimHash: 16-bit native expression (graft.functions.SimHash; bit j of
    // the result votes on bit j of each token's md5, MSB-first). One narrow
    // scan, no shuffle; the same expression serves 64-bit at scale.
    "dedup_simhash" -> ((s, dir) => {
      import s.implicits._
      spread(t(s, dir, "documents"))
        .select($"doc_id", TF.tokens($"text").as("toks"))
        .filter(size($"toks") >= 1)
        .select($"doc_id", native.simhash($"toks", 16).as("simhash16"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, COUNT(*) AS n_copies, MIN(doc_id) AS keeper
        |FROM documents GROUP BY md5(text)""".stripMargin,

    "dedup_ngram_jaccard" ->
      s"""WITH sh0 AS ($SQL_SHINGLES),
         |hot AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) > $MaxShingleDf),
         |sh AS (SELECT * FROM sh0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
         |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT doc_a, doc_b,
         |  CAST(inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE) AS jaccard
         |FROM pairs
         |JOIN sizes sa ON sa.doc_id = doc_a
         |JOIN sizes sb ON sb.doc_id = doc_b
         |WHERE CAST(inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE) >= 0.5""".stripMargin,

    "dedup_minhash_lsh" ->
      s"""WITH sh AS ($SQL_SHINGLES),
         |sigs AS (
         |  SELECT doc_id, i AS h, MIN(md5(CAST(i AS VARCHAR) || '|' || shingle)) AS sig
         |  FROM sh, UNNEST(generate_series(1, $NumHashes)) t(i)
         |  GROUP BY doc_id, i),
         |bands AS (
         |  SELECT doc_id, CAST((h - 1) // $BandSize AS INTEGER) AS band,
         |    md5(string_agg(CAST(h AS VARCHAR) || ':' || sig, ',' ORDER BY CAST(h AS VARCHAR) || ':' || sig)) AS band_hash
         |  FROM sigs GROUP BY doc_id, CAST((h - 1) // $BandSize AS INTEGER)),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id)
         |SELECT doc_a, doc_b,
         |  CAST(SUM(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END) AS DOUBLE) / $NumHashes.0
         |    AS est_jaccard
         |FROM cand
         |JOIN sigs sa ON sa.doc_id = doc_a
         |JOIN sigs sb ON sb.doc_id = doc_b AND sb.h = sa.h
         |GROUP BY doc_a, doc_b""".stripMargin,

    // bit j (1-based, MSB-first) of each token's md5: hex digit (j+3)//4,
    // bit 3-(j-1)%4 within the nibble.
    "dedup_simhash" ->
      """SELECT doc_id,
        |  CAST(SUM(CASE WHEN bal >= 0 THEN CAST(POWER(2, j - 1) AS BIGINT) ELSE 0 END) AS BIGINT)
        |    AS simhash16
        |FROM (
        |  SELECT doc_id, j, SUM(bit * 2 - 1) AS bal
        |  FROM (
        |    SELECT doc_id, j,
        |      (('0x' || substr(md5(token), (j + 3) // 4, 1))::BIGINT >> (3 - (j - 1) % 4)) & 1
        |        AS bit
        |    FROM (
        |      SELECT doc_id, unnest(toks) AS token
        |      FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |            FROM documents)
        |      WHERE len(toks) >= 1),
        |      UNNEST(generate_series(1, 16)) t(j))
        |  GROUP BY doc_id, j)
        |GROUP BY doc_id""".stripMargin
  )
}
