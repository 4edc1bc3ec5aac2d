"""Full-registry edge-parity sweep — the standing gate version of the
one-time mid-r7 manual exercise that found nine parity-blind bugs.

Runs EVERY oracled registry query against the edge-augmented fixture
tables (``tests/test_edge_parity.py``'s planted NULL / tie / duplicate-id
/ whitespace-only / epoch-boundary / zero-value rows) by invoking the
opt-in ``test_edge_parity_full_sweep`` parametrization alongside the
always-on curated gate.  Run it before every round-end commit and after
any operator change that touches NULL handling, ordering, or hashing.

Usage:
    python scripts/edge_sweep.py            # full sweep (all oracled queries)
    python scripts/edge_sweep.py name1 ...  # sweep only the named queries

Exit code 0 = every query's engine output matches its DuckDB oracle on
the edge-augmented tables.
"""

from __future__ import annotations

import os
import subprocess
import sys


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, SPARK_GRAFT_EDGE_SWEEP="1")
    cmd = [sys.executable, "-m", "pytest", "tests/test_edge_parity.py",
           "-q", "--no-header", "-p", "no:cacheprovider"]
    names = sys.argv[1:]
    if names:
        # Validate against the registry BEFORE building -k: pytest exits
        # 0 when any one name matches, so a typo'd second name would be
        # silently skipped and the gate recorded green without sweeping
        # the changed query (r9 lattice review; same pattern as
        # check_promotions.py).
        sys.path.insert(0, repo)
        from spreadsheet_etl_engine_spark import registry
        import spreadsheet_etl_engine_spark.ext_queries  # noqa: F401
        unknown = [n for n in names if n not in registry.REGISTRY]
        if unknown:
            print(f"not registered: {unknown}")
            return 2
        # The sweep tests parametrize over ORACLED queries only, so a
        # registered-but-oracle-less name would match zero tests and be
        # silently skipped while the gate reads green (r11 scripts
        # review — the same silent-drop class the registry check above
        # fixed).  Fail loud instead: no-oracle queries have no edge-
        # parity form to sweep.
        no_oracle = [n for n in names if registry.REGISTRY[n].oracle is None]
        if no_oracle:
            print(f"no oracle (nothing to sweep, would silently skip): "
                  f"{no_oracle}")
            return 2
        cmd += ["-k", " or ".join(f"[{n}]" for n in names)]
    return subprocess.call(cmd, env=env, cwd=repo)


if __name__ == "__main__":
    sys.exit(main())
