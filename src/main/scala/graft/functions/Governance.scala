package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch governance combinators — the single implementation behind the
  * `domain_cap` query, the pipeline example's govern stage, and (by
  * greedy analogy) `streaming.Governance.domainCap`, so the semantics
  * cannot drift between surfaces.
  */
object Governance {

  /** Per-domain keep-N: admit at most `cap` rows per `domainCol`,
    * chosen by deterministic md5(seed|id) priority — which N survive is
    * a pseudo-random function of (seed, id) alone, not an ingest-order
    * artifact; a new seed is a fresh draw. Adds `prioCol` (the md5 hex)
    * and `rkCol` (1-based long rank within the domain); the defaults
    * are collision-safe internal names a caller can simply drop, and
    * choosing a name the frame already has is a loud error, never a
    * silent overwrite. The `rk <= cap` filter over the window rank is
    * the WindowGroupLimit trigger: every map task pre-prunes to its
    * local top-N per domain BEFORE the shuffle, so a domain with 10⁹
    * rows ships ≤ N·tasks rows (PlanSpec + TrainingDataPipelineSpec
    * pin the plan). */
  def capPerDomain(df: DataFrame, domainCol: String, idCol: String,
                   cap: Long, seed: String,
                   prioCol: String = "__graft_prio",
                   rkCol: String = "__graft_rk"): DataFrame = {
    require(cap >= 1, s"cap must be >= 1: $cap")
    Seq(prioCol, rkCol).foreach { c =>
      require(!df.columns.contains(c),
        s"output column '$c' already exists — pass a different prioCol/rkCol")
    }
    val w = Window.partitionBy(col(domainCol)).orderBy(col(prioCol), col(idCol))
    df.withColumn(prioCol, md5(concat_ws("|", lit(seed), col(idCol))))
      .withColumn(rkCol, row_number().over(w).cast("long"))
      .filter(col(rkCol) <= cap)
  }
}
