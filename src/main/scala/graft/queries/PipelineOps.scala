package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-construction operators a training-data pipeline runs after
  * dedup/quality filtering: budget-constrained selection and
  * deterministic source mixing. Both are single-pass, key-partitioned
  * plans (one shuffle on the stratification key), and both are
  * hash-exact against the DuckDB oracle.
  */
object PipelineOps extends QueryGroup {

  // per-language char budget for budget_sample (chars stand in for
  // tokens in the oracle-simple variant; the BPE-true budget is the
  // pipeline example's job)
  private val CharBudget = 20000L
  // per-source mixing weights in millionths (md5-derived uniform — the
  // standard deterministic mixture-sampling trick, engine-identical):
  // the corpus's src0..src19 get 200k/400k/600k/800k cyclically, the
  // shape of a real mix (sources up- and down-weighted around parity)
  private val Weights: Seq[(String, Long)] =
    (0 until 20).map(i => s"src$i" -> ((i % 4) + 1) * 200000L)

  override def queries: Map[String, Q] = Map(
    // Budget-constrained selection: per language, admit docs in
    // deterministic priority order (doc_id) while the running character
    // total stays within budget. One window over the language partition —
    // the partition key IS the stratification key, so the plan is one
    // shuffle however large the corpus.
    "budget_sample" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"lang").orderBy($"doc_id")
      t(s, dir, "documents")
        .withColumn("cum_chars", sum($"n_chars").over(w))
        .filter($"cum_chars" <= CharBudget)
        .select($"doc_id", $"lang", $"n_chars", $"cum_chars")
    }),

    // Deterministic weighted source mixing: doc admitted iff its
    // md5-derived uniform (first 8 hex digits of md5(doc_id), scaled to
    // millionths) falls under its source's weight. Stateless, seedless,
    // reproducible on any engine that has md5 — the property a data-mix
    // audit needs. Narrow: no shuffle at all.
    "mix_weighted" -> ((s, dir) => {
      import s.implicits._
      val u = conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
        .cast("long") % 1000000L
      val keep = Weights.foldLeft(lit(false)) { case (acc, (src, wt)) =>
        acc || ($"source" === src && u < wt)
      }
      t(s, dir, "documents")
        .withColumn("u_millionths", u)
        .filter(keep)
        .select($"doc_id", $"source", $"u_millionths")
    }),

    // Per-language corpus report — the numbers a training run plans
    // against: docs, chars, tokens, and EXACT p50/p90 document lengths.
    // The percentiles are computed from the (lang, n_chars) histogram —
    // counts + a running sum over the DISTINCT length values, then "first
    // value whose cumulative count reaches rank ceil(q·n)" — not by
    // sorting documents: the only per-doc shuffle is the count
    // aggregation, and the window runs over ≤ |distinct lengths| rows per
    // language, which stays tiny at any corpus size (the scalable exact
    // order statistic; a per-language document sort would be the 100 TB
    // regression). Ranks are pure integer arithmetic, engine-identical.
    "corpus_stats" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .withColumn("n_toks",
          size(graft.functions.native.tokens($"text")).cast("long"))
      val tot = docs.groupBy($"lang").agg(
        count(lit(1)).as("n_docs"),
        sum($"n_chars").as("total_chars"),
        sum($"n_toks").as("total_tokens"))
      val hist = docs.groupBy($"lang", $"n_chars").agg(count(lit(1)).as("c"))
      val wc = Window.partitionBy($"lang").orderBy($"n_chars")
      hist.withColumn("cc", sum($"c").over(wc))
        .join(tot, "lang")
        .groupBy($"lang", $"n_docs", $"total_chars", $"total_tokens")
        .agg(
          min(when($"cc" >= expr("(n_docs + 1) DIV 2"), $"n_chars"))
            .as("p50_chars"),
          min(when($"cc" >= expr("(9 * n_docs + 9) DIV 10"), $"n_chars"))
            .as("p90_chars"))
    }),

    // Temperature-scaled source mixing — the multilingual-corpus rebalance
    // (the mT5/XLM-R move): source shares p_s are flattened to
    // q_s ∝ p_s^α and each doc is admitted with probability
    // rate_s = (q_s/p_s) / max_rate, so the rarest source keeps 100% and
    // dominant sources are downsampled toward parity. α = 1/2 ON PURPOSE:
    // p^0.5 is sqrt — IEEE-754 correctly rounded in every engine — where
    // a general pow() is libm-dependent (the text_lm_surprisal rationale),
    // so every rate is bit-identical cross-engine; the one multi-term sum
    // (Z = Σ√p_s) runs through the exact decimal cast. The corpus's real
    // sources are EXACTLY uniform (25 docs each — flattening would be a
    // no-op, every rate 1.0), so the mix key is a CONSTRUCTED skewed
    // label floor(sqrt(doc_id % 100)): buckets 0..9 with 1:3:...:19
    // populations (the pii_redact pattern) — the downsampling genuinely
    // bites, bucket 9 keeps ~23%. Admission reuses the mix_weighted
    // md5-uniform. Plan: one tiny count agg (10 rows), three 1-row
    // broadcasts, then a narrow broadcast-join scan — the corpus never
    // shuffles at any scale.
    "mix_temperature" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .withColumn("mix_src",
          floor(sqrt(($"doc_id" % 100L).cast("double"))).cast("long"))
      // ≤ 10 rows by construction, but feeding FOUR downstream aggregate/
      // broadcast jobs (tot, z, mx, and the final join's build side) — cut
      // so each derives from the in-memory rows instead of re-running the
      // corpus scan + count per job
      val counts = docs.groupBy($"mix_src").agg(count(lit(1)).as("n_s"))
        .transform(graft.functions.Materialize.cut)
      val tot = counts.agg(sum($"n_s").as("n_total"))
      val w = counts.crossJoin(broadcast(tot))
        .withColumn("w_s", sqrt($"n_s".cast("double") / $"n_total"))
      val z = w.agg(sum(dec($"w_s", 18)).cast("double").as("z"))
      val rates = w.crossJoin(broadcast(z))
        .withColumn("rate", $"w_s" / $"z" * $"n_total" / $"n_s")
      val mx = rates.agg(max($"rate").as("max_rate"))
      val rateM = rates.crossJoin(broadcast(mx))
        .withColumn("rate_millionths",
          floor($"rate" / $"max_rate" * 1000000.0).cast("long"))
        .select($"mix_src", $"rate_millionths")
      val u = conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
        .cast("long") % 1000000L
      docs.join(broadcast(rateM), "mix_src")
        .withColumn("u_millionths", u)
        .filter($"u_millionths" < $"rate_millionths")
        .select($"doc_id", $"mix_src", $"rate_millionths", $"u_millionths")
    }),

    // Deterministic corpus shuffle — the last step every training
    // pipeline runs: a seeded, restart-stable global permutation. Sort
    // key = md5(seed|doc_id), so the order is a pseudo-random function
    // of (seed, id) alone: any re-run, any partitioning, any engine
    // reproduces it bit-for-bit (ShuffleDeterminismSpec pins re-run
    // equality; the oracle pins the engine-independence). Position comes
    // from GlobalOrder.withRowNumber — a range-partitioned parallel
    // numbering, ONE wide sort and no single-task window, the same
    // machinery slice_rows trusts at scale.
    "shuffle_deterministic" -> ((s, dir) => {
      import s.implicits._
      val keyed = t(s, dir, "documents")
        .select($"doc_id",
          md5(concat_ws("|", lit(ShuffleSeed), $"doc_id")).as("skey"))
      graft.functions.GlobalOrder.withRowNumber(keyed, "pos", $"skey", $"doc_id")
        .select($"doc_id", $"skey", $"pos")
    })
  )

  // the training-run shuffle seed: changing it is a new epoch's order
  private val ShuffleSeed = "epoch-0"

  override def oracle: Map[String, String] = Map(
    "budget_sample" ->
      s"""SELECT doc_id, lang, n_chars, cum_chars
         |FROM (
         |  SELECT doc_id, lang, n_chars,
         |    CAST(SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id) AS BIGINT)
         |      AS cum_chars
         |  FROM documents)
         |WHERE cum_chars <= $CharBudget""".stripMargin,

    "mix_weighted" ->
      s"""SELECT doc_id, source, u_millionths
         |FROM (
         |  SELECT doc_id, source,
         |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |      % 1000000 AS u_millionths
         |  FROM documents)
         |WHERE ${Weights.map { case (s0, w) =>
             s"(source = '$s0' AND u_millionths < $w)" }.mkString(" OR ")}""".stripMargin,

    "corpus_stats" ->
      """WITH docs AS (
        |  SELECT lang, n_chars,
        |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_toks
        |  FROM documents),
        |tot AS (
        |  SELECT lang, COUNT(*) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |    CAST(SUM(n_toks) AS BIGINT) AS total_tokens
        |  FROM docs GROUP BY lang),
        |hist AS (
        |  SELECT lang, n_chars, COUNT(*) AS c FROM docs GROUP BY lang, n_chars),
        |cum AS (
        |  SELECT lang, n_chars,
        |    CAST(SUM(c) OVER (PARTITION BY lang ORDER BY n_chars) AS BIGINT) AS cc
        |  FROM hist)
        |SELECT t.lang, t.n_docs, t.total_chars, t.total_tokens,
        |  MIN(CASE WHEN cc >= (t.n_docs + 1) // 2 THEN n_chars END) AS p50_chars,
        |  MIN(CASE WHEN cc >= (9 * t.n_docs + 9) // 10 THEN n_chars END) AS p90_chars
        |FROM cum JOIN tot t USING (lang)
        |GROUP BY t.lang, t.n_docs, t.total_chars, t.total_tokens""".stripMargin,

    "mix_temperature" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    CAST(FLOOR(sqrt(CAST(doc_id % 100 AS DOUBLE))) AS BIGINT) AS mix_src
        |  FROM documents),
        |counts AS (
        |  SELECT mix_src, COUNT(*) AS n_s FROM docs GROUP BY mix_src),
        |tot AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n_total FROM counts),
        |w AS (
        |  SELECT mix_src, n_s, n_total,
        |    sqrt(CAST(n_s AS DOUBLE) / n_total) AS w_s
        |  FROM counts CROSS JOIN tot),
        |z AS (SELECT CAST(SUM(CAST(w_s AS DECIMAL(38,18))) AS DOUBLE) AS z FROM w),
        |rates AS (
        |  SELECT mix_src, n_s, n_total, w_s / z * n_total / n_s AS rate
        |  FROM w CROSS JOIN z),
        |mx AS (SELECT MAX(rate) AS max_rate FROM rates),
        |rm AS (
        |  SELECT mix_src,
        |    CAST(FLOOR(rate / max_rate * 1000000.0) AS BIGINT) AS rate_millionths
        |  FROM rates CROSS JOIN mx)
        |SELECT d.doc_id, d.mix_src, rm.rate_millionths, d.u_millionths
        |FROM (
        |  SELECT doc_id, mix_src,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      % 1000000 AS u_millionths
        |  FROM docs) d
        |JOIN rm USING (mix_src)
        |WHERE d.u_millionths < rm.rate_millionths""".stripMargin,

    "shuffle_deterministic" ->
      s"""SELECT doc_id,
         |  md5('$ShuffleSeed|' || CAST(doc_id AS VARCHAR)) AS skey,
         |  CAST(ROW_NUMBER() OVER (
         |    ORDER BY md5('$ShuffleSeed|' || CAST(doc_id AS VARCHAR)), doc_id)
         |    AS BIGINT) AS pos
         |FROM documents""".stripMargin
  )
}
