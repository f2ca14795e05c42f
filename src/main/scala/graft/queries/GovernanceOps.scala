package graft.queries

import org.apache.spark.sql.functions._

/** Data-governance operators a 100 TB corpus run needs around the pipeline
  * proper: a Deequ-style column profile (the constraint report a data
  * contract validates against) and the RefinedWeb-style per-domain
  * document cap (no single domain may dominate the corpus).
  *
  * Scale design:
  *  - `profile_constraints` is ONE scan: every per-column metric
  *    (completeness, exact distinct count, min/max) is computed in a
  *    single aggregate and then unpivoted with `stack` on the 1-row
  *    result. Multiple exact COUNT(DISTINCT)s make Catalyst plan an
  *    Expand (input ×|columns| into the partial aggregate) — that is the
  *    honest cost of EXACT distinct counts; the at-scale approximate twin
  *    is `sketch_hll_distinct` (same report from mergeable HLL state,
  *    no Expand). Exact here because the oracle hash-compares.
  *  - `domain_cap` is a rank-bounded window: `row_number <= N` over the
  *    domain partition lets Spark plan a WindowGroupLimit — each map task
  *    keeps only its local top-N per domain BEFORE the shuffle, so a
  *    domain with 10^9 documents ships ≤ N·tasks rows, not 10^9
  *    (PlanSpec pins the WindowGroupLimit). Priority is an md5 of
  *    (seed, doc_id): which N documents survive is a deterministic,
  *    engine-independent pseudo-random choice, not an ingest-order
  *    artifact.
  */
object GovernanceOps extends QueryGroup {

  /** Max documents admitted per source domain (binds at every SF: the
    * corpus has ~25 docs/source at sf0.01 and grows linearly). */
  private val DomainCap = 20L
  /** Seed for the cap's keep-priority; a new seed is a new draw. */
  private val CapSeed = "cap-0"

  /** Columns profiled. The corpus carries no natural nulls (every
    * completeness would be a trivial 1.0), so the profile runs over a
    * derived view with one planted-null column — lang nulled for
    * doc_id % 7 == 0 — proving the completeness metric actually reads
    * non-null fractions. The operator itself is column-generic. */
  private val Cols = Seq("doc_id", "text", "lang", "source", "n_chars", "lang_or_null")

  override def queries: Map[String, Q] = Map(
    // Deequ-style profile: one row per column with completeness
    // (non-null fraction), exact distinct count, and min/max rendered as
    // strings (one report schema across column types). Single scan,
    // single aggregate, stack-unpivot of the 1-row result.
    "profile_constraints" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
        .withColumn("lang_or_null",
          when($"doc_id" % 7L === 0L, lit(null)).otherwise($"lang"))
      val aggs = Seq(count(lit(1)).as("n_rows")) ++ Cols.flatMap { c =>
        Seq(count(col(c)).as(s"nn_$c"),
          count_distinct(col(c)).as(s"nd_$c"),
          min(col(c)).cast("string").as(s"mn_$c"),
          max(col(c)).cast("string").as(s"mx_$c"))
      }
      val one = d.agg(aggs.head, aggs.tail: _*)
      val stackArgs = Cols.map(c => s"'$c', nn_$c, nd_$c, mn_$c, mx_$c")
        .mkString(", ")
      one.selectExpr("n_rows",
          s"stack(${Cols.size}, $stackArgs) AS (col_name, nn, n_distinct, min_repr, max_repr)")
        .select($"col_name", $"n_rows",
          ($"nn".cast("double") / $"n_rows".cast("double")).as("completeness"),
          $"n_distinct", $"min_repr", $"max_repr")
    }),

    // Per-domain cap: admit at most DomainCap docs per source, chosen by
    // deterministic md5 priority — the shared combinator
    // (functions.Governance.capPerDomain), whose `rk <= N` filter is
    // the WindowGroupLimit trigger: the shuffle carries only each
    // task's local top-N per domain.
    "domain_cap" -> ((s, dir) => {
      import s.implicits._
      graft.functions.Governance
        .capPerDomain(t(s, dir, "documents"), "source", "doc_id",
          DomainCap, CapSeed, prioCol = "prio", rkCol = "rk")
        .select($"doc_id", $"source", $"prio", $"rk")
    })
  )

  override def oracle: Map[String, String] = Map(
    "profile_constraints" -> {
      val aggSql = Cols.map { c =>
        s"""COUNT($c) AS nn_$c, COUNT(DISTINCT $c) AS nd_$c,
           |  CAST(MIN($c) AS VARCHAR) AS mn_$c, CAST(MAX($c) AS VARCHAR) AS mx_$c""".stripMargin
      }.mkString(",\n  ")
      val rows = Cols.map { c =>
        s"""SELECT '$c' AS col_name, n_rows,
           |  CAST(nn_$c AS DOUBLE) / CAST(n_rows AS DOUBLE) AS completeness,
           |  nd_$c AS n_distinct, mn_$c AS min_repr, mx_$c AS max_repr FROM a""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH d AS (
         |  SELECT *, CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang_or_null
         |  FROM documents),
         |a AS (SELECT COUNT(*) AS n_rows,
         |  $aggSql
         |FROM d)
         |$rows""".stripMargin
    },

    "domain_cap" ->
      s"""SELECT doc_id, source, prio, rk FROM (
         |  SELECT doc_id, source,
         |    md5('$CapSeed|' || CAST(doc_id AS VARCHAR)) AS prio,
         |    CAST(ROW_NUMBER() OVER (
         |      PARTITION BY source
         |      ORDER BY md5('$CapSeed|' || CAST(doc_id AS VARCHAR)), doc_id)
         |      AS BIGINT) AS rk
         |  FROM documents)
         |WHERE rk <= $DomainCap""".stripMargin
  )
}
