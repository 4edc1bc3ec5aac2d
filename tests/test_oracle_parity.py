"""Local replica of the driver's correctness gate: every registered query
with an oracle must match DuckDB on the same parquet (row count + column
names + exact values, order-insensitive).  Run at sf0.001 by default
(SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the driver scale).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from spreadsheet_etl_engine_spark import registry
from spreadsheet_etl_engine_spark.sources.readers import TABLE_NAMES


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[col]):
            ser = df[col]
            if getattr(ser.dtype, "tz", None) is not None:
                ser = ser.dt.tz_localize(None)
            df[col] = ser.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[col]):
            df[col] = df[col].astype("float64")
        elif pd.api.types.is_integer_dtype(df[col]):
            df[col] = df[col].astype("Int64")
        elif df[col].dtype == object:
            df[col] = df[col].astype(str).where(~df[col].isna(), None)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_query_parity(spark, duck, sf_dir, name):
    rq = registry.get(name)
    got = _normalize(rq.fn(spark, sf_dir).toPandas())
    exp = _normalize(duck.execute(rq.oracle).df())
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} != oracle {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: {len(got)} rows != oracle {len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)


ORACLE_QUERIES = sorted(n for n, rq in registry.REGISTRY.items() if rq.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_parity(spark, duck, sf_dir, name):
    assert_query_parity(spark, duck, sf_dir, name)


NO_ORACLE = sorted(n for n, rq in registry.REGISTRY.items() if rq.oracle is None)


@pytest.mark.parametrize("name", NO_ORACLE)
def test_rows_only(spark, sf_dir, name):
    df = registry.get(name).fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_contract(spark):
    import __spark_entry__ as e

    out = e.entry(spark)
    assert out.count() > 0
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 10


# Queries the driver MUST re-verify this round — the invariant behind
# this list (round-2 verdict lesson: queries silently fell past the
# driver's 50-entry check budget when extras were registered ahead of
# them) is "anything whose code or oracle changed since its last driver
# row sits inside the budget", plus the flagship sentinels.  Earlier
# rounds also parked the whole DSL/[EXT] surface here while it was
# earning first-time rows; since r8 every query is attested at current
# bytes and byte-pinned by the tail snapshot guard below, so the head
# spends its slots on the FRESHNESS rotation (r9 rotated 42 stale rows,
# r10 rotates the remaining 23 — see the DRIVER_PRIORITY comment) plus
# the entries with a hard changed-bytes re-verification reason.
MUST_BE_IN_CHECK_BUDGET = [
    # r16 optimization round changed bytes — must re-verify (full
    # audit in the registry.py rotation comment):
    # similarity.py's PQ/IVF trainer was batched+vectorized, so the
    # rows-only ANN outputs CHANGE (recall floors + determinism
    # pytest-pinned):
    "similarity_topk_pq",
    "similarity_topk_ivfpq",
    "similarity_topk_ivf",
    # operators/dedup.py: connected_components round fold + observed
    # convergence flag; semantic_dedup conditional base repartition —
    # outputs equivalence-pinned unchanged:
    "dedup_components",
    "curation_pipeline_decisions",
    "dedup_semantic",
    # streaming harnesses now derive the state-shuffle partition count
    # (scale-governed); emitted rows partitioning-independent:
    "streaming_dedup_fuzzy",
    "streaming_seen_index",
]


def test_driver_priority_ordering():
    """All north-star queries sit inside the driver's check budget, the
    priority list has no typos (every name registered) and no duplicates,
    and it never exceeds the budget (extra registrations go to the tail)."""
    names = list(registry.queries())
    head = names[: registry.DRIVER_CHECK_BUDGET]
    assert len(registry.DRIVER_PRIORITY) == len(set(registry.DRIVER_PRIORITY))
    # r10 advice fix: duplicates here pad the list and invite
    # miscounting against the 50-slot budget.
    assert len(MUST_BE_IN_CHECK_BUDGET) == len(set(MUST_BE_IN_CHECK_BUDGET)), \
        sorted({n for n in MUST_BE_IN_CHECK_BUDGET
                if MUST_BE_IN_CHECK_BUDGET.count(n) > 1})
    assert len(registry.DRIVER_PRIORITY) <= registry.DRIVER_CHECK_BUDGET
    unregistered = [n for n in registry.DRIVER_PRIORITY if n not in registry.REGISTRY]
    assert not unregistered, f"priority names not registered: {unregistered}"
    missing = [n for n in MUST_BE_IN_CHECK_BUDGET if n not in head]
    assert not missing, f"north-star queries past the driver budget: {missing}"
    # The tail must still be registered queries (nothing dropped).
    assert sorted(names) == sorted(registry.REGISTRY)


def test_tail_queries_unchanged():
    """Rotation guard: queries past the driver's 50-slot check budget ride
    on a green row earned in an EARLIER round — valid only while their
    code is untouched.  If this fails: you edited a tail query; promote
    it into the DRIVER_PRIORITY head (rotate out something stable) so the
    next round re-verifies it, then run
    `python scripts/update_tail_snapshot.py`."""
    import json
    import os

    from scripts.update_tail_snapshot import (
        fingerprint, module_hashes, tail_names,
    )

    path = os.path.join(os.path.dirname(__file__), "driver_tail_snapshot.json")
    with open(path) as f:
        snap = json.load(f)
    pinned_modules = snap.pop("__modules__", {})
    changed = sorted(
        set(k for k, v in module_hashes().items()
            if pinned_modules.get(k) != v)
        | set(k for k in pinned_modules if k not in module_hashes())
    )
    assert not changed, (
        f"shared modules changed since the tail snapshot was pinned: "
        f"{changed}.  The per-query fingerprints cannot see this "
        "(transitive blind spot): audit which TAIL queries execute the "
        "changed code, promote those into DRIVER_PRIORITY (or record in "
        "the rotation comment why their outputs are byte-unchanged), "
        "then re-pin via scripts/update_tail_snapshot.py"
    )
    tail = tail_names()
    assert sorted(tail) == sorted(snap), (
        f"tail set changed: new={sorted(set(tail) - set(snap))} "
        f"gone={sorted(set(snap) - set(tail))}; re-pin via "
        "scripts/update_tail_snapshot.py (new tail entries must have a "
        "green driver row from the round that demoted them)"
    )
    drifted = [n for n in tail if fingerprint(n) != snap[n]]
    assert not drifted, (
        f"tail queries edited since their last driver verification: "
        f"{drifted}; promote them into DRIVER_PRIORITY and re-pin"
    )
