package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Oracle-checked queries for the in-engine ML surface: the online-ML
  * layer's least squares (SURVEY §2.7, `graft.streaming.River`), the
  * hashing-trick text vectorizer, and embedding-free document
  * clustering over those hashed features.
  *
  * Bit-parity design (QueryGroup scaladoc): river_ols sums go through
  * the DECIMAL(38,s) cast so they are order-independent and identical
  * in both engines; the vectorizer and clustering are PURE INTEGER
  * (md5 buckets, token counts, squared-distance arithmetic), so their
  * outputs hash-match with no floating point anywhere.
  */
object MlOps extends QueryGroup {

  // hashing-trick feature dimension: 64 buckets (first 8 md5 hex chars
  // of the token, mod 64) — small enough that the DuckDB oracle stays
  // cheap, large enough that docs separate; the operator is dim-generic
  private val HashDim = 64
  // coarse "centroids": the hashed feature vectors of a fixed doc
  // sample (doc_id % 101 == 0, capped at NCent) — the similarity_ivf
  // deterministic-quantizer convention, so the oracle reproduces the
  // model exactly. The cap is what keeps the operator LINEAR in corpus
  // size: k is a model constant (a real run trains k centroids with
  // functions.Kmeans), not a function of the data — without it the
  // sparse-dot join grows |docs|x|cents| ~ quadratically (measured
  // 22.8x at 10x data before the cap; 48 centroids pin it linear)
  private val CentMod = 101
  private val NCent = 48
  private val CentPred = s"doc_id % $CentMod = 0 AND doc_id DIV $CentMod < $NCent"
  private val CentPredSql = s"doc_id % $CentMod = 0 AND doc_id // $CentMod < $NCent"

  override def queries: Map[String, Q] = Map(
    // y = l_extendedprice regressed on x = l_quantity
    "river_ols" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .agg(
          count(lit(1)).as("n"),
          dsum($"l_quantity").as("sx"),
          dsum($"l_extendedprice").as("sy"),
          dsum($"l_quantity" * $"l_extendedprice", 4).as("sxy"),
          dsum($"l_quantity" * $"l_quantity", 4).as("sxx"))
        .select($"n",
          (($"n" * $"sxy" - $"sx" * $"sy") /
            ($"n" * $"sxx" - $"sx" * $"sx")).as("slope"),
          ((($"sy" - (($"n" * $"sxy" - $"sx" * $"sy") /
            ($"n" * $"sxx" - $"sx" * $"sx")) * $"sx")) / $"n").as("intercept"))
    }),

    // Hashing-trick vectorizer (the fastText/VW featurization): each doc
    // becomes a sparse 64-dim term-frequency vector, feature index =
    // md5(token) mod 64 — seedless, vocabulary-free, engine-identical.
    // Output is the sparse relation (doc_id, feature_idx, cnt): one
    // token explode + one keyed count, partial-agg-friendly; the dense
    // form is a pivot the caller applies if needed. Pure integers.
    "text_hash_features" -> ((s, dir) => {
      import s.implicits._
      spread(t(s, dir, "documents"))
        .select($"doc_id",
          explode(graft.functions.native.tokens($"text")).as("tok"))
        .select($"doc_id",
          (conv(substring(md5($"tok"), 1, 8), 16, 10).cast("long") % HashDim)
            .as("feature_idx"))
        .groupBy($"doc_id", $"feature_idx")
        .agg(count(lit(1)).as("cnt"))
    }),

    // Embedding-free document clustering: assign every doc to its
    // nearest coarse centroid in hashed-TF space by EXACT INTEGER
    // squared distance — ‖x−c‖² = ‖x‖² + ‖c‖² − 2⟨x,c⟩ over the sparse
    // features, ties broken by centroid id. The centroid set is the
    // fixed doc sample (similarity_ivf's deterministic-quantizer
    // convention; a production run trains it with functions.Kmeans).
    //
    // Plan: one feature build (keyed count), one broadcast join on
    // feature_idx for the sparse dots, one per-doc argmin over ≤ ncent+t
    // candidate rows. The argmin deliberately does NOT densify: a doc's
    // candidates are its dots rows (score = c2 − 2·dot) plus the GLOBAL
    // min-(c2, cid) centroid rows standing in for every zero-overlap
    // centroid — sufficient because a dot only LOWERS a score, so any
    // zero-overlap centroid that could win must itself be a min-c2 row
    // (ties included: all min-c2 rows are kept, so the (dist2, cid)
    // tie-break is exact). A dense corpus×ncent outer join here — the
    // obvious formulation, and the DuckDB oracle's — would sort-merge
    // ncent copies of the corpus at scale.
    "cluster_docs_hashed" -> ((s, dir) => {
      import s.implicits._
      val feats = spread(t(s, dir, "documents"))
        .select($"doc_id",
          explode(graft.functions.native.tokens($"text")).as("tok"))
        .select($"doc_id",
          (conv(substring(md5($"tok"), 1, 8), 16, 10).cast("long") % HashDim)
            .as("idx"))
        .groupBy($"doc_id", $"idx").agg(count(lit(1)).as("cnt"))
        .transform(graft.functions.Materialize.cut) // feeds centroids, norms, and dots once
      val cent = feats.filter(expr(CentPred))
        .select($"doc_id".as("cid"), $"idx", $"cnt".as("ccnt"))
      val cnorm = cent.groupBy($"cid").agg(sum($"ccnt" * $"ccnt").as("c2"))
      val docs = feats.filter(not(expr(CentPred)))
      val dnorm = docs.groupBy($"doc_id").agg(sum($"cnt" * $"cnt").as("x2"))
      val scored = docs.join(broadcast(cent), Seq("idx"))
        .groupBy($"doc_id", $"cid").agg(sum($"cnt" * $"ccnt").as("dot"))
        .join(broadcast(cnorm), Seq("cid"))
        .select($"doc_id", $"cid", ($"c2" - lit(2L) * $"dot").as("score"))
      val gmin = cnorm.agg(min($"c2").as("c2min"))
      val gbest = cnorm.crossJoin(broadcast(gmin))
        .filter($"c2" === $"c2min")
        .select($"cid", $"c2".as("score"))
      val cand = scored.unionByName(
        dnorm.select($"doc_id").crossJoin(broadcast(gbest)))
      val w = Window.partitionBy($"doc_id").orderBy($"score", $"cid")
      cand.withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .join(dnorm, Seq("doc_id"))
        .select($"doc_id", $"cid".as("cluster_id"),
          ($"x2" + $"score").as("dist2"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "river_ols" ->
      s"""SELECT n,
         |  (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
         |  (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept
         |FROM (
         |  SELECT COUNT(*) AS n,
         |    ${DSUM("l_quantity")} AS sx,
         |    ${DSUM("l_extendedprice")} AS sy,
         |    ${DSUM("l_quantity * l_extendedprice")} AS sxy,
         |    ${DSUM("l_quantity * l_quantity")} AS sxx
         |  FROM lineitem)""".stripMargin,

    "text_hash_features" ->
      s"""SELECT doc_id,
         |  CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % $HashDim AS feature_idx,
         |  COUNT(*) AS cnt
         |FROM (
         |  SELECT doc_id,
         |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
         |  FROM documents)
         |GROUP BY doc_id, feature_idx""".stripMargin,

    "cluster_docs_hashed" ->
      s"""WITH feats AS (
         |  SELECT doc_id,
         |    CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % $HashDim AS idx,
         |    COUNT(*) AS cnt
         |  FROM (
         |    SELECT doc_id,
         |      unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
         |    FROM documents)
         |  GROUP BY doc_id, idx),
         |cent AS (
         |  SELECT doc_id AS cid, idx, cnt AS ccnt FROM feats
         |  WHERE $CentPredSql),
         |cnorm AS (
         |  SELECT cid, CAST(SUM(ccnt * ccnt) AS BIGINT) AS c2
         |  FROM cent GROUP BY cid),
         |docs AS (SELECT * FROM feats WHERE NOT ($CentPredSql)),
         |dnorm AS (
         |  SELECT doc_id, CAST(SUM(cnt * cnt) AS BIGINT) AS x2
         |  FROM docs GROUP BY doc_id),
         |dots AS (
         |  SELECT d.doc_id, c.cid, CAST(SUM(d.cnt * c.ccnt) AS BIGINT) AS dot
         |  FROM docs d JOIN cent c USING (idx)
         |  GROUP BY d.doc_id, c.cid),
         |dist AS (
         |  SELECT dn.doc_id, cn.cid,
         |    dn.x2 + cn.c2 - 2 * COALESCE(dt.dot, 0) AS dist2
         |  FROM dnorm dn CROSS JOIN cnorm cn
         |  LEFT JOIN dots dt ON dt.doc_id = dn.doc_id AND dt.cid = cn.cid)
         |SELECT doc_id, cid AS cluster_id, CAST(dist2 AS BIGINT) AS dist2
         |FROM (
         |  SELECT doc_id, cid, dist2,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY dist2, cid) AS rn
         |  FROM dist)
         |WHERE rn = 1""".stripMargin
  )
}
