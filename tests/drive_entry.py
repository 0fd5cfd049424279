"""Drive the driver contract exactly as the verify harness would:
vanilla SparkSession (none of the engine's tuned configs), sf0.01,
import __spark_entry__, run entry() + every queries() entry, compare
each against oracle_sql() via DuckDB.
"""
import sys, time, os

# repo root derived from THIS file (tests/..), like every other tool —
# a hardcoded /root/repo broke the sim for any other checkout location
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .appName("driver-sim")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E

t0 = time.time()
edf = E.entry(spark)
rows = edf.collect()
print(f"entry(): {len(rows)} rows, schema={[f.name for f in edf.schema.fields]}, {time.time()-t0:.1f}s")
assert len(rows) > 0

qs = E.queries()
qs2 = E.queries()  # idempotency probe
assert qs.keys() == qs2.keys()
oracles = E.oracle_sql()
print(f"{len(qs)} queries, {len(oracles)} oracles")

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
sys.path.insert(0, os.path.join(REPO, "tests"))
# duck_connection registers views for every table in sources.io.TABLES —
# reusing it (instead of a hardcoded list here) means a table added to
# the engine is automatically visible to the oracles in this sim too
from oracle_harness import compare_frames, duck_connection

con = duck_connection(SF)

fails = []
rows_only = []
for name in sorted(qs):
    t0 = time.time()
    try:
        sdf = qs[name](spark, SF).toPandas()
    except Exception as ex:
        fails.append((name, f"SPARK ERROR: {ex}"))
        print(f"  {name}: SPARK ERROR {str(ex)[:120]}")
        continue
    dt = time.time() - t0
    if name not in oracles:
        rows_only.append(name)
        print(f"  {name}: rows-only, {len(sdf)} rows, {dt:.1f}s")
        continue
    try:
        ddf = con.execute(oracles[name]).fetchdf()
    except Exception as ex:
        fails.append((name, f"DUCK ERROR: {ex}"))
        print(f"  {name}: DUCK ERROR {str(ex)[:120]}")
        continue
    try:
        problems = compare_frames(sdf, ddf)
    except Exception as ex:  # a compare crash records one query's failure,
        problems = [f"COMPARE ERROR: {ex}"]  # not an aborted sim
    status = "OK" if not problems else f"MISMATCH {problems[:2]}"
    if problems:
        fails.append((name, status))
    print(f"  {name}: {status} ({len(sdf)} rows, {dt:.1f}s)")

n_checked = len(qs) - len(rows_only)
print(
    f"\n{'='*60}\n{n_checked - len(fails)}/{n_checked} oracle-checked "
    f"queries verified, {len(rows_only)} rows-only (no oracle), "
    f"{len(fails)} failures"
)
for n, p in fails:
    print(f"FAIL {n}: {str(p)[:300]}")
sys.exit(1 if fails else 0)
