#!/usr/bin/env python3
"""Pure-Python end-to-end smoke of the graft lake surfaces.

Proves the "a Python-only operator needs no Scala" claim as an executed
artifact, not an argument: from a stock pyspark session (the graft
classes on the driver classpath, GraftExtensions as the SQL extension),
drive ingest -> read -> GRAFT DELETE -> GRAFT UPSERT -> change feed ->
named-catalog maintenance, asserting row counts at every step.

Usage:
    python3 tools/pyspark_smoke.py [<classes-dir>]

<classes-dir> defaults to target/scala-2.13/classes relative to the
repo root (run `sbt compile` first). Exits 0 on success, 1 on any
assertion failure.
"""
import os
import sys
import tempfile

from pyspark.sql import SparkSession

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
classes = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    repo, "target", "scala-2.13", "classes")
assert os.path.isdir(classes), f"compiled classes not found at {classes}"

warehouse = tempfile.mkdtemp(prefix="graft_pysmoke_wh")
spark = (
    SparkSession.builder
    .master("local[4]")
    .appName("graft-pyspark-smoke")
    .config("spark.driver.extraClassPath", classes)
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .config("spark.sql.catalog.gpy", "graft.sources.GraftCatalog")
    .config("spark.sql.catalog.gpy.warehouse", warehouse)
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate())

d = tempfile.mkdtemp(prefix="graft_pysmoke") + "/t"

# ingest through the DSv2 write path
spark.range(100).selectExpr("id", "concat('r', id) AS v") \
    .write.format("tablelogv2").mode("append").save(d)
assert spark.read.format("tablelogv2").load(d).count() == 100

# schema evolution from Python: mergeSchema maps add-only drift to evolve
spark.range(100, 110).selectExpr("id", "concat('r', id) AS v", "1 AS extra") \
    .write.format("tablelogv2").option("mergeSchema", "true") \
    .mode("append").save(d)
got = spark.read.format("tablelogv2").load(d)
assert got.count() == 110 and got.columns == ["id", "v", "extra"]

# maintenance from pure SQL
assert spark.sql(f"GRAFT DELETE FROM '{d}' WHERE id IN (1, 2, 3)") \
    .head()[0] == 3
committed, n_up = spark.sql(
    f"GRAFT UPSERT INTO '{d}' KEY (id) "
    "SELECT id, 'up' AS v, CAST(NULL AS INT) AS extra FROM RANGE(5)").head()
assert committed and n_up == 5
assert spark.read.format("tablelogv2").load(d) \
    .where("v = 'up'").count() == 5

# the row-level change feed, batch face
feed = spark.read.format("tablelog") \
    .option("readChangeFeed", "true").option("since", "-1").load(d)
by_type = {r[0]: r[1] for r in
           feed.groupBy("_change_type").count().collect()}
# appends: 100 + 10 + 5 upsert rows; deletes: 3 deleted + 2 replaced
assert by_type == {"append": 115, "delete": 5}, by_type

# time travel — by version, and by clock through GRAFT HISTORY's own
# committed_at column (the exact timeline timestampAsOf resolves on)
assert spark.read.format("tablelogv2").option("versionAsOf", "0") \
    .load(d).count() == 100
assert spark.sql(f"GRAFT TRACK BLOOM '{d}' ON (id)").head()[0] > 0
hist = spark.sql(f"GRAFT HISTORY '{d}'").collect()
assert [r["version"] for r in hist] == list(range(len(hist))), hist
t0 = hist[0]["committed_at"]  # v0's commit instant, a datetime
assert spark.read.format("tablelogv2") \
    .option("timestampAsOf", str(int(t0.timestamp() * 1000))) \
    .load(d).count() == 100

# layout maintenance from pure SQL: COMPACT re-bins the small files the
# appends above left behind, without changing a row
# live-file counts come from the manifest (inputFiles), not the
# directory: a compact is copy-on-write, the superseded files stay on
# disk until VACUUM reclaims them
n_files_before = len(spark.read.format("tablelogv2").load(d).inputFiles())
rewritten = spark.sql(f"GRAFT COMPACT '{d}'").head()[0]
assert rewritten >= 1, rewritten
n_files_after = len(spark.read.format("tablelogv2").load(d).inputFiles())
assert n_files_after <= n_files_before, (n_files_before, n_files_after)
assert spark.read.format("tablelogv2").load(d).count() == 110

# the named-catalog face, Python-only: create, insert, GRAFT by name
spark.sql("CREATE TABLE gpy.ops.t (id BIGINT, v STRING) USING tablelogv2")
spark.sql("INSERT INTO gpy.ops.t SELECT id, concat('x', id) FROM RANGE(50)")
assert spark.sql("SELECT count(*) FROM gpy.ops.t").head()[0] == 50
assert spark.sql("GRAFT DELETE FROM gpy.ops.t WHERE id = 7").head()[0] == 1
spark.sql("GRAFT RESTORE gpy.ops.t TO VERSION 1")
assert spark.read.table("gpy.ops.t").count() == 50
assert spark.sql("GRAFT COMPACT gpy.ops.t").head()[0] >= 1
assert spark.read.table("gpy.ops.t").count() == 50
spark.sql("DROP TABLE gpy.ops.t")

# native kernels are SQL-callable from Python too
toks = spark.sql("SELECT graft_tokens('a b c')").head()[0]
assert list(toks) == ["a", "b", "c"], toks

print("PYSPARK_SMOKE_OK")
spark.stop()
