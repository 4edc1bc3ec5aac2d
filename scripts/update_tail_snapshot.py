"""Regenerate tests/driver_tail_snapshot.json — the rotation guard.

The driver verifies only the first DRIVER_CHECK_BUDGET (50) queries per
round; everything past slot 50 rides on a green row earned in an earlier
round, which is only valid while its code is untouched.  The snapshot
pins a fingerprint (function source + oracle SQL) for every tail query;
``tests/test_oracle_parity.py::test_tail_queries_unchanged`` fails when
a tail query's fingerprint drifts, forcing the editor to promote it into
the DRIVER_PRIORITY head for the next round (and rerun this script).

Usage: python scripts/update_tail_snapshot.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spreadsheet_etl_engine_spark import registry  # noqa: E402


def fingerprint(name: str) -> str:
    import hashlib
    import inspect

    rq = registry.get(name)
    src = inspect.getsource(rq.fn) + "\n" + (rq.oracle or "")
    return hashlib.md5(src.encode()).hexdigest()[:12]


def tail_names() -> list[str]:
    return list(registry.queries())[registry.DRIVER_CHECK_BUDGET:]


def main() -> None:
    snap = {n: fingerprint(n) for n in sorted(tail_names())}
    path = os.path.join(os.path.dirname(__file__), "..", "tests",
                        "driver_tail_snapshot.json")
    with open(path, "w") as f:
        json.dump(snap, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"pinned {len(snap)} tail queries")


if __name__ == "__main__":
    main()
