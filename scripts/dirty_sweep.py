"""Registry-wide dirty-input differential sweep (maintenance tool).

Builds a schema-preserving adversarial twin of an sf fixture dir (per
table: every column NULLed one at a time against row 0, one all-NULL
row, an empty-string row per string column, an empty-list row per list
column), then runs EVERY registry key's Spark query against its DuckDB
oracle on the SAME dirty data and reports per key:

    PASS         engine and oracle agree even on adversarial input
    MISMATCH     value/row divergence — adjudicate (dialect NULL-order,
                 NULL-group membership, duplicate-PK artifacts are the
                 known-benign classes; see COVERAGE.md M9)
    ENGINE_*     the Spark side ABORTED — always a real bug: one dirty
                 row must never kill a 100 TB job (ANSI DIVIDE_BY_ZERO /
                 CAST_INVALID_INPUT / INVALID_INDEX_OF_ZERO, pandas
                 int(NaN), ragged np.asarray are the classes found and
                 fixed in round 10; tests/test_dirty_contracts.py pins
                 them)
    ORACLE_ERR   DuckDB raised — also run the engine side alone before
                 concluding anything: tests/oracle.compare executes the
                 oracle FIRST, so an oracle error masks a simultaneous
                 engine crash on the same input.

Usage:
    python scripts/dirty_sweep.py [--src=/root/testdata/sf0.001]
        [--dir=/tmp/dirty_sf0.001] [--only=k1,k2] [--start-at=key]
        [--engine-only] [--unique-keys] [--numeric] [--unicode]
        [--timestamp] [--nan] [--empty]

The sweep is a read-only diagnostic: it never writes into the repo or
the source fixtures.
"""
from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.001"
DIRTY = "/tmp/dirty_sf0.001"
ONLY = None
START_AT = None
ENGINE_ONLY = False
UNIQUE_KEYS = False
NUMERIC = False
UNICODE = False
TIMESTAMP = False
NAN = False
EMPTY = False
OUT = "/tmp/dirty_sweep_results.json"
for a in sys.argv[1:]:
    if a.startswith("--src="):
        SRC = a.split("=", 1)[1]
    elif a.startswith("--dir="):
        DIRTY = a.split("=", 1)[1]
    elif a.startswith("--only="):
        ONLY = set(a.split("=", 1)[1].split(","))
    elif a.startswith("--start-at="):
        START_AT = a.split("=", 1)[1]
    elif a == "--engine-only":
        ENGINE_ONLY = True
    elif a == "--unique-keys":
        UNIQUE_KEYS = True
    elif a == "--numeric":
        NUMERIC = True
    elif a == "--unicode":
        UNICODE = True
    elif a == "--timestamp":
        TIMESTAMP = True
    elif a == "--nan":
        NAN = True
    elif a == "--empty":
        EMPTY = True
    elif a.startswith("--out="):
        OUT = a.split("=", 1)[1]

# the twin builder is SHARED with the pinned regression tests
# (tests/dirty_fixtures.py) so the maintenance sweep and the test
# fixtures cannot silently diverge (r10 ADVICE); --numeric / --unicode /
# --timestamp swap in the extreme-numerics / unicode-hostile /
# extreme-timestamp twins instead of the NULL-contract twin. The latter
# two are engine-only crash twins by design — their oracle-side dialect
# noise is not adjudicated, so running them in parity mode would write
# misleading FAIL statuses; ENGINE_ONLY is therefore FORCED on for them
# (r12 ADVICE: a comment asked politely, nothing enforced it).
if (UNICODE or TIMESTAMP or NAN) and not ENGINE_ONLY:
    print(
        "note: --unicode/--timestamp/--nan are engine-only crash twins; "
        "forcing --engine-only (their oracle dialect noise is "
        "unadjudicated by design)",
        flush=True,
    )
    ENGINE_ONLY = True
from tests.dirty_fixtures import (  # noqa: E402
    build_dirty,
    build_empty,
    build_hostile_nan,
    build_hostile_numeric,
    build_hostile_timestamp,
    build_unicode,
)


def main() -> None:
    if NUMERIC:
        build_hostile_numeric(SRC, DIRTY)
    elif NAN:
        build_hostile_nan(SRC, DIRTY)
    elif EMPTY:
        build_empty(SRC, DIRTY)
    elif UNICODE:
        build_unicode(SRC, DIRTY)
    elif TIMESTAMP:
        build_hostile_timestamp(SRC, DIRTY)
    else:
        build_dirty(SRC, DIRTY, unique_keys=UNIQUE_KEYS)

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("dirty-sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from modevetl_spark.session import quiet_bounded_window_warnings

    quiet_bounded_window_warnings(spark)

    from tests.oracle import compare, duck_con

    qs = mod.queries()
    oracles = mod.oracle_sql()
    keys = sorted(qs)
    if START_AT:
        keys = keys[keys.index(START_AT):]
    if ONLY:
        keys = [k for k in keys if k in ONLY]

    results: dict[str, tuple[str, str]] = {}
    for i, k in enumerate(keys):
        t0 = time.time()
        try:
            df = qs[k](spark, DIRTY)
            # Materialize EVERY column, engine-first, in both modes.
            # .count() is NOT a crash probe: Catalyst prunes projections
            # no aggregate consumes, so a pure select/window key's
            # poisoned expression never evaluates and a real abort hides
            # (q_window_range_frame's decimal overflow survived three
            # rounds of .count() sweeps this way). toPandas() is what
            # the grading driver does. Running it BEFORE the oracle also
            # means an ORACLE_ERR can never mask an engine crash — the
            # r10 lesson, now structural instead of procedural.
            #
            # EXCEPT on the extreme-timestamp twin: pandas datetime64[ns]
            # spans only 1677..2262, so even `spark.read.parquet(twin)
            # .toPandas()` of the RAW table raises OutOfBoundsDatetime —
            # collect-ability is the wrong bar when the input itself is
            # outside pandas' domain. There the probe is a JVM-side full
            # materialization (noop write: every column evaluated, no
            # python conversion), which is exactly the 100 TB sink path.
            if TIMESTAMP:
                df.write.mode("overwrite").format("noop").save()
            else:
                df.toPandas()
            if ENGINE_ONLY:
                results[k] = ("ENGINE_OK", "")
                print(f"[{i+1}/{len(keys)}] {k}: ENGINE_OK "
                      f"({time.time()-t0:.1f}s)", flush=True)
                continue
        except Exception as e:
            results[k] = ("ENGINE_ERR", f"{type(e).__name__}: {e}"[:300])
            print(f"[{i+1}/{len(keys)}] {k}: ENGINE_ERR", flush=True)
            continue
        con = duck_con(DIRTY)
        try:
            compare(df, con, oracles[k])
            results[k] = ("PASS", "")
            status = "PASS"
        except AssertionError as e:
            results[k] = ("MISMATCH", str(e)[:500])
            status = "MISMATCH"
        except Exception as e:
            # classify by the exception's defining module, not by
            # substring-matching the traceback text (r10 ADVICE): a
            # DuckDB failure raises a duckdb.* exception class, a Spark
            # abort raises from pyspark/py4j
            emod = type(e).__module__ or ""
            kind = "ORACLE_ERR" if emod.startswith("duckdb") else "ENGINE_ERR"
            results[k] = (kind, f"{type(e).__name__}: {e}"[:300])
            status = kind
        finally:
            con.close()
        print(f"[{i+1}/{len(keys)}] {k}: {status} "
              f"({time.time()-t0:.1f}s)", flush=True)

    bad = {k: v for k, v in results.items() if v[0] not in ("PASS", "ENGINE_OK")}
    print(f"\n=== {len(results)} keys, {len(bad)} non-PASS ===")
    for k, (s, msg) in sorted(bad.items()):
        print(f"{k}: {s}: {msg[:200]}")
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(f"results -> {OUT}")


if __name__ == "__main__":
    main()
