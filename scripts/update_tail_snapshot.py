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


# Shared-code tripwire: the per-query fingerprint hashes only the query
# fn + oracle, so an edit to a shared OPERATOR module a tail query calls
# into (the r7 review's transitive blind spot) would never drift it.
# These module hashes make that loud: any edit fails the guard until the
# editor audits which tail queries execute the changed code, promotes
# the affected ones, and re-pins.  registry.py / ext_queries.py are NOT
# hashed (their query-fn bodies are covered per-query, and every head
# edit or new registration would otherwise drift the snapshot into a
# rubber stamp) — helpers living inside them, like pack_sequences, stay
# a documented residual blind spot (COVERAGE.md rotation policy).
SHARED_MODULE_GLOBS = (
    # Recursive: every package module is pinned (future subpackages
    # included) EXCEPT registry.py / ext_queries.py, excluded below.
    "**/*.py",
)

# Excluded from the hash (see rationale above): query-fn bodies are
# covered per-query and head edits would otherwise rubber-stamp drift.
_EXCLUDED_MODULES = frozenset({"registry.py", "ext_queries.py"})


def module_hashes() -> dict[str, str]:
    import glob
    import hashlib

    pkg = os.path.dirname(os.path.abspath(registry.__file__))
    out: dict[str, str] = {}
    for pattern in SHARED_MODULE_GLOBS:
        for path in sorted(glob.glob(os.path.join(pkg, pattern), recursive=True)):
            rel = os.path.relpath(path, pkg)
            if rel in _EXCLUDED_MODULES:
                continue
            with open(path, "rb") as f:
                out[rel] = hashlib.md5(f.read()).hexdigest()[:12]
    return out


def tail_names() -> list[str]:
    return list(registry.queries())[registry.DRIVER_CHECK_BUDGET:]


def main() -> None:
    snap: dict = {n: fingerprint(n) for n in sorted(tail_names())}
    snap["__modules__"] = module_hashes()
    path = os.path.join(os.path.dirname(__file__), "..", "tests",
                        "driver_tail_snapshot.json")
    with open(path, "w") as f:
        json.dump(snap, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"pinned {len(snap) - 1} tail queries + "
          f"{len(snap['__modules__'])} shared modules")


if __name__ == "__main__":
    main()
