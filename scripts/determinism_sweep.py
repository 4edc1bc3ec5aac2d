"""Determinism-under-reconfiguration sweep (r11): every ORACLED query
must produce the IDENTICAL normalized result under different physical
configurations — shuffle partition counts and AQE on/off.

Why this gate exists: the local parity gates all run at one fixed
config (shuffle_partitions=8), so a query whose output depends on
partition layout — a first-seen zero-sign extremum (family 13), a
float sum that escaped the decimal convention, an untied window rank,
a partition-order argmax — can be locally green and still flap when
the driver (or a production cluster) runs a different layout.  The r9
re-execution review audited this BY READING; this sweep checks it
mechanically.

Approximate/no-oracle queries are excluded by design: sketches
(approx_percentile, HLL, approx_top_k) are legitimately
partition-sensitive, which is exactly why they carry no value oracle.

Usage:
    python scripts/determinism_sweep.py            # all oracled queries
    python scripts/determinism_sweep.py name ...   # subset
Exit 0 = every query hash-identical across all configs.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

from spreadsheet_etl_engine_spark import registry  # noqa: E402
from spreadsheet_etl_engine_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# (shuffle partitions, AQE enabled): the first is the local test config;
# 32 matches the driver-shaped local[32] layout; 5 is a deliberately
# odd count so fixed-partition assumptions (mod arithmetic, per-
# partition tie luck) break visibly.  AQE toggling also re-plans
# post-shuffle coalescing, moving row order within partitions.
CONFIGS = ((8, True), (32, False), (5, True))


def _normalize_hash(pdf: pd.DataFrame) -> str:
    # Same normalization stance as tests/test_oracle_parity.py: sorted
    # columns, stable row sort, values rendered to text.  repr of a
    # float includes the -0.0 sign — which is the point: a sign that
    # flips with partitioning must FAIL here even though IEEE compare
    # and pandas parity are blind to it.
    pdf = pdf[sorted(pdf.columns)].copy()
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    payload = pdf.to_csv(index=False, float_format=None)
    return hashlib.md5(payload.encode()).hexdigest()


def main() -> int:
    names = sys.argv[1:] or sorted(
        n for n, rq in registry.REGISTRY.items() if rq.oracle)
    unknown = [n for n in names if n not in registry.REGISTRY]
    if unknown:
        print(f"not registered: {unknown}")
        return 2
    no_oracle = [n for n in names if registry.REGISTRY[n].oracle is None]
    if no_oracle:
        print(f"no oracle (approximate by design, partition-sensitive "
              f"is allowed): {no_oracle}")
        return 2
    spark = get_spark("determinism-sweep", shuffle_partitions=CONFIGS[0][0])
    spark.sparkContext.setLogLevel("ERROR")
    failures: list[str] = []
    for name in names:
        fn = registry.get(name).fn
        hashes = []
        for parts, aqe in CONFIGS:
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
            try:
                hashes.append(_normalize_hash(fn(spark, SF_DIR).toPandas()))
            except Exception as exc:  # fail loud per query, keep sweeping
                hashes.append(f"ERROR:{type(exc).__name__}")
        # restore the baseline config before the next query — derived
        # from CONFIGS[0] so reordering/editing CONFIGS can't silently
        # desynchronize the restored baseline from the declared one
        # (r11 ADVICE).
        spark.conf.set("spark.sql.shuffle.partitions", str(CONFIGS[0][0]))
        spark.conf.set("spark.sql.adaptive.enabled", str(CONFIGS[0][1]).lower())
        # An ERROR under every config hashes identically — that is NOT
        # determinism evidence, it's a broken query reading as green
        # (the vacuous-green class this repo's gates keep finding).
        if any(h.startswith("ERROR:") for h in hashes):
            failures.append(name)
            print(f"ERRORED {name}: {hashes}", flush=True)
        elif len(set(hashes)) != 1:
            failures.append(name)
            print(f"NONDETERMINISTIC {name}: {hashes}", flush=True)
        else:
            print(f"ok {name}", flush=True)
    if failures:
        print(f"\n{len(failures)} queries vary with physical config: "
              f"{failures}")
        return 1
    print(f"\nall {len(names)} oracled queries identical across "
          f"{len(CONFIGS)} configs")
    return 0


if __name__ == "__main__":
    sys.exit(main())
