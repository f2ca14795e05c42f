package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (north star):
  * exact hash-dedup, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Hashing uses md5 (identical across Spark/DuckDB/everything), with the
  * classic min-of-keyed-hash construction standing in for random
  * permutations. Scale design:
  *  - exact dedup = one hash-aggregate on the text (or a digest of it);
  *  - MinHash signatures are one map + one per-doc aggregate; LSH banding
  *    turns the O(n²) pair search into an equi-join on (band, band_hash)
  *    — the only shuffle is by band key, which is uniformly distributed;
  *  - the raw n-gram Jaccard query is the *oracle* for the LSH variant
  *    (exact but quadratic in the worst case; usable because candidate
  *    pairs are pre-blocked on a shared shingle).
  */
object DedupOps extends QueryGroup {

  private val NumHashes = 8
  private val BandSize = 2 // 4 bands of 2 → candidates at jaccard ≳ 0.5

  /** (doc_id, shingle): distinct 3-token shingles per document. */
  private def shingles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .withColumn("toks", filter(split($"text", " "), x => x =!= ""))
      .filter(size($"toks") >= 3)
      .withColumn("i", explode(sequence(lit(1), size($"toks") - 2)))
      .select($"doc_id", concat_ws(" ",
        element_at($"toks", $"i"),
        element_at($"toks", $"i" + 1),
        element_at($"toks", $"i" + 2)).as("shingle"))
      .distinct()
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

    // exact n-gram Jaccard on candidate pairs sharing ≥1 shingle.
    "dedup_ngram_jaccard" -> ((s, dir) => {
      import s.implicits._
      val sh = shingles(s, dir).cache()
      val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n_sh"))
      val pairs = sh.as("a").join(sh.as("b"), col("a.shingle") === col("b.shingle"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter"))
      pairs
        .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
        .withColumn("jaccard",
          $"inter".cast("double") / ($"na" + $"nb" - $"inter").cast("double"))
        .filter($"jaccard" >= 0.5)
        .select($"doc_a", $"doc_b", $"jaccard")
    }),

    // MinHash signatures + LSH banding → candidate pairs + estimated jaccard.
    "dedup_minhash_lsh" -> ((s, dir) => {
      import s.implicits._
      val sh = shingles(s, dir)
      // signature_i(doc) = min over shingles of md5(i || '|' || shingle)
      val sigs = sh
        .withColumn("h", explode(sequence(lit(1), lit(NumHashes))))
        .groupBy($"doc_id", $"h")
        .agg(min(md5(concat($"h".cast("string"), lit("|"), $"shingle"))).as("sig"))
      // band id = (h-1) / BandSize; band hash = md5 of its ordered sigs
      val bands = sigs
        .withColumn("band", expr(s"CAST((h - 1) DIV $BandSize AS INT)"))
        .groupBy($"doc_id", $"band")
        .agg(md5(array_join(array_sort(collect_list(concat($"h".cast("string"), lit(":"), $"sig"))), ",")).as("band_hash"))
      val cand = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.band_hash") === col("y.band_hash"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      // estimated jaccard = fraction of matching signature components
      val est = cand
        .join(sigs.select($"doc_id".as("doc_a"), $"h", $"sig".as("sig_a")), Seq("doc_a"))
        .join(sigs.select($"doc_id".as("doc_b"), $"h".as("h"), $"sig".as("sig_b")), Seq("doc_b", "h"))
        .groupBy($"doc_a", $"doc_b")
        .agg((sum(when($"sig_a" === $"sig_b", 1L).otherwise(0L)).cast("double")
          / lit(NumHashes.toDouble)).as("est_jaccard"))
      est.select($"doc_a", $"doc_b", $"est_jaccard")
    }),

    // SimHash (16-bit here; 64-bit native version in graft.functions):
    // bit_j = sign of Σ_tokens (parity of md5 hex digit j)·2 - 1.
    "dedup_simhash" -> ((s, dir) => {
      import s.implicits._
      val tok = t(s, dir, "documents")
        .select($"doc_id", explode(filter(split($"text", " "), x => x =!= "")).as("token"))
        .withColumn("hh", md5($"token"))
      val bits = tok
        .withColumn("j", explode(sequence(lit(1), lit(16))))
        .withColumn("bit", conv(expr("substring(hh, j, 1)"), 16, 10).cast("long") % 2)
        .groupBy($"doc_id", $"j")
        .agg(sum($"bit" * 2 - 1).as("bal"))
      bits.groupBy($"doc_id")
        .agg(sum(when($"bal" >= 0, pow(lit(2.0), $"j" - 1).cast("long")).otherwise(0L))
          .as("simhash16"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, COUNT(*) AS n_copies, MIN(doc_id) AS keeper
        |FROM documents GROUP BY md5(text)""".stripMargin,

    "dedup_ngram_jaccard" ->
      s"""WITH sh AS ($SQL_SHINGLES),
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

    "dedup_simhash" ->
      """SELECT doc_id,
        |  CAST(SUM(CASE WHEN bal >= 0 THEN CAST(POWER(2, j - 1) AS BIGINT) ELSE 0 END) AS BIGINT)
        |    AS simhash16
        |FROM (
        |  SELECT doc_id, j, SUM(bit * 2 - 1) AS bal
        |  FROM (
        |    SELECT doc_id, j,
        |      ('0x' || substr(md5(token), j, 1))::BIGINT % 2 AS bit
        |    FROM (
        |      SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
        |      FROM documents),
        |      UNNEST(generate_series(1, 16)) t(j))
        |  GROUP BY doc_id, j)
        |GROUP BY doc_id""".stripMargin
  )
}
