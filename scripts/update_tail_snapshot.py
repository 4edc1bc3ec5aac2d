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
# the affected ones, and re-pins.  registry.py / ext_queries.py are
# hashed with every @register'd query-fn span STRIPPED (r9 lattice
# review: helpers living inside them — _dec_sum, _cents, the v2 rule
# runner glue — are executed by tail queries too, and r9 edited the
# decimal-sum semantics twice with only a manual audit catching the
# affected tail queries; query-fn bodies stay excluded because they are
# covered per-query and every head edit would otherwise rubber-stamp
# the snapshot).  Rotation-comment edits in registry.py now also drift
# the module hash — re-pinning after a rotation is already part of the
# standing workflow, so that costs one command.
SHARED_MODULE_GLOBS = (
    # Recursive: every package module is pinned (future subpackages
    # included); registry.py / ext_queries.py via the stripped variant.
    "**/*.py",
)

# Hashed with query-fn spans stripped instead of raw bytes.
_STRIPPED_MODULES = frozenset({"registry.py", "ext_queries.py"})


def _stripped_source(path: str) -> bytes:
    """File text minus the source span of every registered query fn
    (decorator included — the oracle strings ride the per-query
    fingerprints).  What remains is exactly the shared surface: module
    helpers, DRIVER_PRIORITY, imports."""
    import inspect

    with open(path) as f:
        text = f.read()
    modname = os.path.basename(path)
    spans = []
    for rq in registry.REGISTRY.values():
        fn_file = getattr(rq.fn, "__code__", None)
        if fn_file is None:
            continue
        if os.path.basename(fn_file.co_filename) != modname:
            continue
        try:
            src = inspect.getsource(rq.fn)
        except OSError:
            continue
        spans.append(src)
    for span in spans:
        text = text.replace(span, "", 1)
    return text.encode()


def module_hashes() -> dict[str, str]:
    import glob
    import hashlib

    pkg = os.path.dirname(os.path.abspath(registry.__file__))
    out: dict[str, str] = {}
    for pattern in SHARED_MODULE_GLOBS:
        for path in sorted(glob.glob(os.path.join(pkg, pattern), recursive=True)):
            rel = os.path.relpath(path, pkg)
            if rel in _STRIPPED_MODULES:
                out[rel] = hashlib.md5(_stripped_source(path)).hexdigest()[:12]
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
