"""Shared adversarial-twin builders for the dirty-input robustness tier.

Single source of truth for the fixture mutations used by BOTH the
pinned regression tests (tests/test_dirty_contracts.py,
tests/test_numeric_contracts.py) and the maintenance sweep
(scripts/dirty_sweep.py) — previously the twin-builder loop was
duplicated verbatim in the two files and could silently diverge
(r10 ADVICE).

Two twin families:

- :func:`build_dirty` — the NULL-contract twin: per table, one row per
  column with JUST that column NULL (others copied from row 0), one
  all-NULL row, an empty-string row per string column, an empty-list
  row per list column, and an ALL-ZERO-VECTOR row per float-list
  column (zero norm is a distinct crash class from empty: the
  ``size > 0`` guards added in round 10 do not exclude it, and raw
  cosine division dies on it — r10 ADVICE). ``unique_keys=True``
  remaps identifier columns to fresh values in every filler row so no
  primary key is duplicated, isolating pure NULL/empty-value behavior
  from duplicate-PK fixture artifacts.

- :func:`build_hostile_numeric` — the extreme-numerics twin: appended
  rows carry 1e300, the 5e-324 subnormal, a large negative, and zero
  in every float value column (int32 max / ±1 / 0 in non-key integer
  columns); key columns stay fresh and valid. This is the
  ANSI-overflow class (NUMERIC_VALUE_OUT_OF_RANGE at DECIMAL fold
  seams, double→BIGINT CAST_OVERFLOW, integer-div /0) fixed in round
  11 with the try_cast/TRY_CAST swap (COVERAGE.md M11).

Schema is preserved exactly via pyarrow (no pandas int→float traps).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# identifier-like columns: duplicating row 0's value in a filler row
# violates primary-key invariants and makes per-row vs per-key answers
# ill-posed (both engines see the same data, but neither answer is
# "right"); unique_keys=True remaps them to fresh values so the
# remaining divergence is pure NULL-contract dialect.
KEYISH = (
    "o_orderkey", "l_orderkey", "c_custkey", "s_suppkey", "p_partkey",
    "n_nationkey", "r_regionkey", "event_id", "doc_id", "vec_id",
)


def _tables() -> tuple[str, ...]:
    from modevetl_spark.sources.catalog import TABLES

    return TABLES


def variant(row: pa.Table, subs: dict) -> pa.Table:
    """One filler row: row 0 with the ``subs`` columns overridden
    (``None`` → a NULL of the column's exact type)."""
    arrays = []
    for name in row.column_names:
        col = row.column(name)
        typ = col.type
        if name in subs:
            v = subs[name]
            if v is None:
                arrays.append(pa.nulls(1, type=typ))
            else:
                arrays.append(pa.array([v], type=typ))
        else:
            arrays.append(col.combine_chunks())
    return pa.Table.from_arrays(arrays, names=row.column_names)


def _is_float_list(typ: pa.DataType) -> bool:
    return (
        (pa.types.is_list(typ) or pa.types.is_large_list(typ))
        and pa.types.is_floating(typ.value_type)
    )


def build_dirty(src: str, dst, unique_keys: bool = False) -> str:
    """Write the NULL-contract adversarial twin of ``src`` into ``dst``
    (created if missing) and return ``str(dst)``."""
    os.makedirs(str(dst), exist_ok=True)
    for t in _tables():
        tab = pq.read_table(f"{src}/{t}.parquet")
        row0 = tab.slice(0, 1)
        key_max = {
            n: pc.max(tab.column(n)).as_py()
            for n in tab.column_names
            if n in KEYISH and pa.types.is_integer(tab.schema.field(n).type)
        }
        specs = [{n: None} for n in tab.column_names]
        specs.append({n: None for n in tab.column_names})
        for name in tab.column_names:
            typ = tab.schema.field(name).type
            if pa.types.is_string(typ) or pa.types.is_large_string(typ):
                specs.append({name: ""})
            elif pa.types.is_list(typ) or pa.types.is_large_list(typ):
                specs.append({name: []})
                if _is_float_list(typ):
                    # all-zero vector at the fixture's own dimension:
                    # len > 0 but norm 0 — the cosine-division crash
                    # class the empty-list row cannot reach
                    v0 = row0.column(name).to_pylist()[0]
                    if v0:
                        specs.append({name: [0.0] * len(v0)})
        variants = []
        for j, subs in enumerate(specs):
            if unique_keys:
                subs = dict(subs)
                for kn, km in key_max.items():
                    if kn not in subs:  # keep the NULLed/blanked column
                        subs[kn] = km + j + 1
            variants.append(variant(row0, subs))
        pq.write_table(
            pa.concat_tables([tab] + variants), f"{dst}/{t}.parquet"
        )
    return str(dst)


def build_unicode(src: str, dst) -> str:
    """Write the unicode adversarial twin of ``src`` into ``dst`` and
    return ``str(dst)`` — the round-11 engine-only crash sweep's twin,
    promoted into the shared builder so the tier is reproducible from
    the repo (it lived in a session-local script in r11): every string
    column gets CJK, non-BMP emoji, combining accents, RTL embedding,
    NBSP + zero-width joiners, and a 5000-char token, with fresh keys.
    Targets tokenizer/regex/normalizer paths (split, regexp_replace,
    lower, levenshtein, md5-of-text) that only ever see ASCII in the
    clean fixtures."""
    os.makedirs(str(dst), exist_ok=True)
    hostiles = [
        "漢字テスト中文",          # CJK
        "\U0001f600\U0001f9e0\U0001f680 emoji",                 # non-BMP
        "café näive é́́",          # combining
        "‮RTL‬ text שלום",        # RTL
        "a b‍c​d e",                             # NBSP/ZWJ/ZWSP
        "tok" * 1667,                                           # ~5000 chars
    ]
    for t in _tables():
        tab = pq.read_table(f"{src}/{t}.parquet")
        row0 = tab.slice(0, 1)
        key_max = {
            n: pc.max(tab.column(n)).as_py()
            for n in tab.column_names
            if n in KEYISH and pa.types.is_integer(tab.schema.field(n).type)
        }
        variants = []
        for j, h in enumerate(hostiles):
            subs: dict = {}
            for name in tab.column_names:
                typ = tab.schema.field(name).type
                if name in key_max:
                    subs[name] = key_max[name] + j + 1
                elif pa.types.is_string(typ) or pa.types.is_large_string(typ):
                    subs[name] = h
            variants.append(variant(row0, subs))
        pq.write_table(
            pa.concat_tables([tab] + variants), f"{dst}/{t}.parquet"
        )
    return str(dst)


def build_hostile_timestamp(src: str, dst) -> str:
    """Write the extreme-timestamp twin of ``src`` into ``dst`` and
    return ``str(dst)`` — the round-11 engine-only crash sweep's twin,
    promoted into the shared builder (see build_unicode): every
    temporal column gets year-0001 / year-9999 dates and epoch-zero /
    epoch-negative timestamps, with fresh keys. Targets date_trunc /
    window-bucket / interval arithmetic that can overflow or produce
    out-of-range intermediates the clean fixtures never reach."""
    import datetime as _dt

    os.makedirs(str(dst), exist_ok=True)
    hostile_ts = [
        _dt.datetime(1, 1, 1, 0, 0, 0),
        _dt.datetime(9999, 12, 31, 23, 59, 59),
        _dt.datetime(1970, 1, 1, 0, 0, 0),
        _dt.datetime(1901, 12, 13, 20, 45, 52),  # < INT32_MIN seconds
    ]
    hostile_dates = [d.date() for d in hostile_ts]
    for t in _tables():
        tab = pq.read_table(f"{src}/{t}.parquet")
        row0 = tab.slice(0, 1)
        key_max = {
            n: pc.max(tab.column(n)).as_py()
            for n in tab.column_names
            if n in KEYISH and pa.types.is_integer(tab.schema.field(n).type)
        }
        variants = []
        for j in range(len(hostile_ts)):
            subs: dict = {}
            for name in tab.column_names:
                typ = tab.schema.field(name).type
                if name in key_max:
                    subs[name] = key_max[name] + j + 1
                elif pa.types.is_timestamp(typ):
                    subs[name] = hostile_ts[j]
                elif pa.types.is_date(typ):
                    subs[name] = hostile_dates[j]
            variants.append(variant(row0, subs))
        pq.write_table(
            pa.concat_tables([tab] + variants), f"{dst}/{t}.parquet"
        )
    return str(dst)


def build_empty(src: str, dst) -> str:
    """Write the EMPTY twin of ``src`` into ``dst`` and return
    ``str(dst)``: every table keeps its exact schema but carries ZERO
    rows — the operational shape of an empty daily partition or a
    filter that matched nothing, which a 100 TB standing pipeline hits
    routinely. The question the sweep answers per key: does the job
    complete (empty or NULL-aggregate output) or does driver-side code
    (.collect()[0] of a bounds row, np.asarray of an empty sample,
    a seeded-training step) blow up? Loud-by-design empties
    (ivf_train's documented IndexError on an empty corpus) are
    expected findings, not regressions — the census distinguishes
    them from silent assumptions."""
    os.makedirs(str(dst), exist_ok=True)
    for t in _tables():
        tab = pq.read_table(f"{src}/{t}.parquet")
        pq.write_table(tab.slice(0, 0), f"{dst}/{t}.parquet")
    return str(dst)


def build_hostile_nan(src: str, dst) -> str:
    """Write the NaN twin of ``src`` into ``dst`` and return
    ``str(dst)``: appended rows per table with NaN, +inf and -inf in
    EVERY float value column (keys fresh and valid), plus one row whose
    float-list columns carry a [NaN, …]-poisoned vector. ±inf rides in
    this twin because it behaves like NaN at the decimal fold seams
    (Spark ANSI casts ALL non-finite doubles to NULL decimal — only
    out-of-range FINITE values raise) and like 1e300 at the long-cast
    seams (raw cast aborts; the 9.2e18 floor guards exclude it). NaN is the most common
    real-world dirty float (a failed upstream division, a null-to-NaN
    pandas export), and it is deliberately NOT in the extreme-numerics
    twin: DuckDB 1.0.0 ``TRY_CAST(NaN AS DECIMAL)`` RAISES (the
    int64-decimal path range-checks with a comparison NaN fails), so a
    NaN row in a parity twin would convert every fold key into
    unadjudicatable ORACLE_ERR noise. This twin is ENGINE-ONLY by
    construction (scripts/dirty_sweep.py forces it): the question it
    answers is "does one NaN row abort a 100 TB Spark job?" — and the
    round-13 census answer is NO, 274/274 ENGINE_OK: Spark's ANSI
    ``cast(NaN AS DECIMAL)`` yields NULL (only out-of-range FINITE
    values raise), so even the inline raw folds that ``round(NaN, 9)``
    propagates into (COVERAGE Q7) NULL-fold rather than abort. The
    twin stays in the kit as the regression gate for that property."""
    os.makedirs(str(dst), exist_ok=True)
    nan, inf = float("nan"), float("inf")
    scalar_poisons = [nan, inf, -inf]
    for t in _tables():
        tab = pq.read_table(f"{src}/{t}.parquet")
        row0 = tab.slice(0, 1)
        key_max = {
            n: pc.max(tab.column(n)).as_py()
            for n in tab.column_names
            if n in KEYISH and pa.types.is_integer(tab.schema.field(n).type)
        }
        variants = []
        for j in range(len(scalar_poisons) + 1):
            subs: dict = {}
            for name in tab.column_names:
                typ = tab.schema.field(name).type
                if name in key_max:
                    subs[name] = key_max[name] + j + 1
                elif j < len(scalar_poisons) and pa.types.is_floating(typ):
                    subs[name] = scalar_poisons[j]
                elif j == len(scalar_poisons) and _is_float_list(typ):
                    base = row0.column(name).combine_chunks()[0].as_py()
                    vec = list(base) if base else [0.0, 0.0, 0.0]
                    vec[0] = nan
                    subs[name] = vec
            variants.append(variant(row0, subs))
        pq.write_table(
            pa.concat_tables([tab] + variants), f"{dst}/{t}.parquet"
        )
    return str(dst)


def build_hostile_numeric(src: str, dst) -> str:
    """Write the extreme-numerics twin of ``src`` into ``dst`` and
    return ``str(dst)``. Keys stay fresh and valid; only value columns
    are poisoned."""
    os.makedirs(str(dst), exist_ok=True)
    hostile_floats = [1e300, 5e-324, -99999.99, 0.0]
    hostile_ints = [2**31 - 1, 1, -1, 0]
    for t in _tables():
        tab = pq.read_table(f"{src}/{t}.parquet")
        row0 = tab.slice(0, 1)
        key_max = {
            n: pc.max(tab.column(n)).as_py()
            for n in tab.column_names
            if n in KEYISH and pa.types.is_integer(tab.schema.field(n).type)
        }
        variants = []
        for j in range(len(hostile_floats)):
            subs: dict = {}
            for name in tab.column_names:
                typ = tab.schema.field(name).type
                if name in key_max:
                    subs[name] = key_max[name] + j + 1
                elif pa.types.is_floating(typ):
                    subs[name] = hostile_floats[j]
                elif pa.types.is_integer(typ):
                    subs[name] = hostile_ints[j]
            variants.append(variant(row0, subs))
        pq.write_table(
            pa.concat_tables([tab] + variants), f"{dst}/{t}.parquet"
        )
    return str(dst)
