package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}

/** Streaming governance — the unbounded counterpart of
  * `queries.GovernanceOps.domain_cap`: documents arrive continuously and
  * each domain may admit at most `cap` of them, forever. Built on
  * [[Stateful.scan]] (a per-key running fold), so restart-resume,
  * RocksDB spillability, and in-batch `seq` ordering are the proven
  * machinery. State per domain is ONE long (its admission count) —
  * bounded however long the stream runs and however hot the domain.
  *
  * Greedy-vs-batch semantics: the batch query picks the N docs with the
  * smallest md5 priority; the stream, which cannot see the future,
  * admits the FIRST N in arrival (`seq`) order. The two agree exactly
  * when arrival order is the priority order (a backfill feeding sorted
  * shards — GovernanceStreamSpec pins that parity) and differ only in
  * WHICH N survive otherwise — never in the cap itself.
  */
object Governance {

  /** Admit at most `cap` elements per key, in `seq` order, across
    * micro-batches and restarts. Emits admitted elements with their
    * admission rank (1-based); later arrivals of the key are dropped.
    */
  def domainCap[K: Encoder, V](ds: Dataset[(K, Long, V)], cap: Long)(
      implicit kvr: Encoder[(K, Long, (V, Long))],
      kv: Encoder[(K, Long, V)],
      st: Encoder[Long]): Dataset[(K, Long, (V, Long))] = {
    require(cap >= 1, s"cap must be >= 1: $cap")
    Stateful.scan(ds, 0L) { (n: Long, v: V) => (n + 1L, (v, n + 1L)) }
      .filter(_._3._2 <= cap)
  }
}
