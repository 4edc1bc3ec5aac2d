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
        cmd += ["-k", " or ".join(f"[{n}]" for n in names)]
    return subprocess.call(cmd, env=env, cwd=repo)


if __name__ == "__main__":
    sys.exit(main())
