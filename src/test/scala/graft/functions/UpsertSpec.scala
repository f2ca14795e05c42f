package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[TableLog.applyDelta]] / [[TableLog.upsertByKey]]: the one-commit
  * CDC apply — delete-by-key + append + ledger entry as a single
  * manifest version, with the delete family's re-plan-under-race
  * behavior and the append family's fencing, and CDC surfaces that
  * treat the overwritten rows as deletes and the new rows as appends. */
class UpsertSpec extends SparkSuite {
  import spark.implicits._

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft_ups").toString + "/t"

  private def rows(ids: Range, tag: String): DataFrame =
    ids.map(i => (i.toLong, tag)).toDF("id", "v").coalesce(1)

  test("upsert replaces existing keys and inserts new ones in ONE version; replay fences") {
    val dir = fresh()
    TableLog.appendBatch(rows(0 until 100, "old"), dir, "r", 0L) // v1? (v numbering internal)
    val v0 = TableLog.latest(spark, dir).get.version
    // keys 90..109: 10 updates + 10 inserts
    assert(TableLog.upsertByKey(spark, dir,
      rows(90 until 110, "new"), "id", "cdc", 7L))
    val m = TableLog.latest(spark, dir).get
    assert(m.version == v0 + 1, "an upsert must be exactly one commit")
    assert(m.op == "upsert")
    assert(m.commits("cdc") == 7L)
    assert(m.rows == 110L)
    val got = TableLog.read(spark, dir)
    assert(got.count() == 110L)
    assert(got.filter($"v" === "new").count() == 20L)
    assert(got.filter($"id".between(90, 109) && $"v" =!= "new").count() == 0L,
      "an overwritten key's old row survived")
    assert(got.select($"id").distinct().count() == 110L)
    // replayed delta: fenced, nothing changes
    assert(!TableLog.upsertByKey(spark, dir,
      rows(90 until 110, "replayed"), "id", "cdc", 7L))
    assert(TableLog.read(spark, dir).filter($"v" === "replayed").count() == 0L)
    assert(TableLog.latest(spark, dir).get.version == v0 + 1)
  }

  test("CDC surfaces: appends-only consumers get ONLY the new rows; the change feed folds the upsert exactly") {
    val dir = fresh()
    TableLog.appendBatch(rows(0 until 50, "old"), dir, "r", 0L)
    val before = TableLog.latest(spark, dir).get.version
    TableLog.upsertByKey(spark, dir, rows(40 until 60, "new"), "id", "cdc", 0L)
    // appendsSince: the 20 new rows, never the survivor rewrites
    val (delta, _) = TableLog.appendsSince(spark, dir, before)
    val deltaRows = delta.get.select($"id", $"v").as[(Long, String)].collect()
    assert(deltaRows.length == 20 && deltaRows.forall(_._2 == "new"),
      s"appends-only consumers must see exactly the upsert's new rows: " +
        s"${deltaRows.length}")
    // change feed: overwritten rows as deletes, new rows as appends,
    // and the fold reproduces the table
    val feed = TableLog.readChanges(spark, dir, before)._1.get
    assert(feed.filter($"_change_type" === "delete").count() == 10L)
    assert(feed.filter($"_change_type" === "append").count() == 20L)
    val apps = feed.filter($"_change_type" === "append")
      .drop("_change_type", "_commit_version")
    val dels = feed.filter($"_change_type" === "delete")
      .drop("_change_type", "_commit_version")
    val folded = TableLog.readAt(spark, dir, before)
      .unionByName(apps).exceptAll(dels)
    assert(folded.exceptAll(TableLog.read(spark, dir)).isEmpty &&
      TableLog.read(spark, dir).exceptAll(folded).isEmpty,
      "folding the upsert's change rows diverges from the table")
  }

  test("an upsert re-plans over a racing compact instead of resurrecting or failing") {
    val dir = fresh()
    (0 until 4).foreach(b =>
      TableLog.appendBatch(rows(b * 100 until (b + 1) * 100, s"b$b"), dir, "r", b.toLong))
    // stall the upsert's commit long enough for a compact to swap the
    // files its rewrite plan was built on — it must re-plan and land
    TableLog.casHook = () => Thread.sleep(400)
    val racer = new Thread(() => TableLog.compact(spark, dir, 1L << 20))
    try {
      racer.start()
      assert(TableLog.upsertByKey(spark, dir,
        rows(150 until 250, "upd"), "id", "cdc", 0L))
    } finally {
      TableLog.casHook = () => ()
      racer.join()
    }
    val got = TableLog.read(spark, dir)
    assert(got.count() == 400L)
    assert(got.filter($"v" === "upd").count() == 100L)
    assert(got.select($"id").distinct().count() == 400L,
      "a raced upsert doubled or resurrected rows")
  }

  test("an append racing an upsert with rows of its delete keys forces a re-plan — no duplicate keys survive") {
    val dir = fresh()
    TableLog.appendBatch(rows(0 until 100, "old"), dir, "warm", 0L)
    // between the upsert's rewrite PLAN and its CAS, a concurrent
    // writer appends MORE rows for key 7 — snapshot-isolation write
    // skew: without conflict detection the upsert commits over the new
    // file, leaving two rows behind a replace-by-key primitive
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    TableLog.casHook = () =>
      if (fired.compareAndSet(false, true)) {
        TableLog.appendBatch(Seq((7L, "stale-racer")).toDF("id", "v")
          .coalesce(1), dir, "racer", 0L)
      }
    try {
      assert(TableLog.upsertByKey(spark, dir,
        Seq((7L, "new")).toDF("id", "v").coalesce(1), "id", "up", 0L))
    } finally TableLog.casHook = () => ()
    assert(fired.get(), "the race never fired — the test drove nothing")
    val k7 = TableLog.read(spark, dir).filter($"id" === 7L).collect()
    assert(k7.length == 1 && k7(0).getString(1) == "new",
      s"replace-by-key left duplicates behind a racing append: ${k7.mkString(", ")}")
    // nothing else lost: 100 distinct keys, the racer's ledger recorded
    assert(TableLog.read(spark, dir).select($"id").distinct().count() == 100L)
    assert(TableLog.latest(spark, dir).get.commits.contains("racer"))
  }

  test("readChangesWithUpdates: an upsert's replaced keys arrive as pre/post image pairs; inserts and plain deletes keep their tags") {
    val dir = fresh()
    TableLog.appendBatch(rows(0 until 50, "old"), dir, "r", 0L) // v0
    // keys 40..49 updated (they exist), 50..54 inserted — ONE upsert (v1)
    assert(TableLog.upsertByKey(spark, dir,
      rows(40 until 55, "new"), "id", "cdc", 0L))
    TableLog.deleteIn(spark, dir, "id", Seq(3L)) // v2: a plain delete
    val (feed, v) = TableLog.readChangesWithUpdates(spark, dir, -1L,
      keyColumn = "id")
    assert(v == 2L)
    val f = feed.get.persist()
    try {
      val byType = f.groupBy($"_change_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // v0: 50 appends; v1: 10 pre + 10 post + 5 inserts-as-appends;
      // v2: 1 delete
      assert(byType == Map("append" -> 55L, "update_preimage" -> 10L,
        "update_postimage" -> 10L, "delete" -> 1L), s"got $byType")
      val pre = f.filter($"_change_type" === "update_preimage")
      val post = f.filter($"_change_type" === "update_postimage")
      assert(pre.select($"id").collect().map(_.getLong(0)).sorted.toSeq ==
        (40L until 50L).toSeq)
      assert(pre.filter($"v" =!= "old").count() == 0L,
        "a preimage must carry the REPLACED row's values")
      assert(post.select($"id").collect().map(_.getLong(0)).sorted.toSeq ==
        (40L until 50L).toSeq)
      assert(post.filter($"v" =!= "new").count() == 0L,
        "a postimage must carry the replacement row's values")
      assert(pre.select($"_commit_version").distinct().head().getLong(0) == 1L)
      // the plain-tag fold still converges when images are re-folded as
      // delete/append — the mirror contract survives the retag view
      val apps = f.filter($"_change_type".isin("append", "update_postimage"))
        .select($"id", $"v")
      val dels = f.filter($"_change_type".isin("delete", "update_preimage"))
        .select($"id", $"v")
      val folded = apps.exceptAll(dels).collect()
        .map(_.toSeq.mkString("|")).sorted.toSeq
      val snapshot = TableLog.read(spark, dir).select($"id", $"v").collect()
        .map(_.toSeq.mkString("|")).sorted.toSeq
      assert(folded == snapshot, "fold-equals-snapshot broke under images")
    } finally f.unpersist()
  }

  test("upsertByKey rejects a key list over the BYTE budget before collecting it") {
    val dir = fresh()
    TableLog.appendBatch(Seq(("warm", "v")).toDF("k", "v").coalesce(1),
      dir, "r", 0L)
    // 100k distinct ~700-byte string keys ≈ 70 MB of keys — under the
    // 1M count bound but over MirrorMaxDeleteKeyBytes; the distributed
    // pre-measure must reject it loudly WITHOUT a driver collect
    val wide = spark.range(100000).select(
      concat(lpad($"id".cast("string"), 6, "0"), lit("x" * 694)).as("k"),
      lit("v").as("v"))
    val e = intercept[IllegalArgumentException] {
      TableLog.upsertByKey(spark, dir, wide, "k", "r", 1L)
    }
    assert(e.getMessage.contains("bytes of keys"), e.getMessage)
    assert(TableLog.rows(spark, dir) == 1L, "nothing may have landed")
  }

  test("pure-delete and pure-insert deltas work; an empty delta is a no-op returning false") {
    val dir = fresh()
    TableLog.appendBatch(rows(0 until 30, "b0"), dir, "r", 0L)
    val empty = rows(0 until 0, "x")
    assert(TableLog.applyDelta(spark, dir, empty, "id", Seq(0L, 1L), "cdc", 0L))
    assert(TableLog.read(spark, dir).count() == 28L)
    assert(TableLog.latest(spark, dir).get.commits("cdc") == 0L,
      "a pure-delete delta must still advance the ledger")
    assert(TableLog.applyDelta(spark, dir, rows(100 until 110, "ins"),
      "id", Nil, "cdc", 1L))
    assert(TableLog.read(spark, dir).count() == 38L)
    assert(!TableLog.applyDelta(spark, dir, empty, "id", Nil, "cdc", 2L),
      "an empty delta must be a no-op")
    assert(TableLog.latest(spark, dir).get.commits("cdc") == 1L)
  }
}
