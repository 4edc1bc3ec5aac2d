"""Python-worker daemon wrapper: drop the pyspark/py4j zip bundles from
``sys.path`` before the daemon imports pyspark (r15 optimization round).

Why this exists: every Python worker task runs
``worker_util.setup_spark_files`` → ``importlib.invalidate_caches()``.
On CPython 3.11+ ``zipimporter.invalidate_caches`` EAGERLY re-reads the
zip central directory, and because the stock worker ``PYTHONPATH``
puts ``pyspark.zip``/``py4j-*.zip`` ahead of site-packages, pyspark is
imported FROM the zip — which registers one zipimporter per imported
subpackage path (``pyspark.zip/pyspark``, ``pyspark.zip/pyspark/sql``,
…), each of which re-parses the whole ~3.4 MB central directory on
every invalidation.  Measured on the sf0.1 streaming-dedup harness:
~0.29 s of pure Python-worker CPU per task start, ~37 s of worker CPU
per run across 32 workers × 4 micro-batches — the single largest
Python-boundary overhead in the engine (guide §4.1: you control how
much work crosses the boundary; this work crossed it for nothing).

The fix: fork the daemon with the zip entries removed so pyspark
resolves from the installed site-packages distribution and no
zipimporter is ever created; ``invalidate_caches()`` then touches only
cheap ``FileFinder`` entries.  Zip entries are removed ONLY when
pyspark/py4j remain importable without them (a zip-only Spark
distribution keeps its path and merely keeps paying the re-read), so
behavior is identical everywhere except the wasted CPU.

Wired up via ``spark.python.daemon.module`` in ``session.get_spark``;
the repo root rides the worker ``PYTHONPATH`` (set there too) so this
module is importable at daemon launch.  It lives at the REPO ROOT, not
inside the package: ``python -m`` imports the owning package's
``__init__`` first, and the package ``__init__`` imports pyspark — from
the zip, before the strip could run (measured: workers kept resolving
``pyspark.__file__`` to ``.../pyspark.zip/...`` when this module lived
in the package).
"""

from __future__ import annotations

import os
import sys


def _strip_spark_zip_path_entries() -> None:
    def is_spark_zip(p: str) -> bool:
        base = os.path.basename(p)
        # The pyspark/py4j bundles, plus SPARK'S OWN jars: Spark's
        # PythonUtils.sparkPythonPath historically appends the
        # spark-core JAR to the worker PYTHONPATH, and a single failed
        # import probe registers a zipimporter over the multi-MB jar
        # whose directory then gets re-parsed on EVERY task's
        # invalidate_caches (measured: the jar, not pyspark.zip, was
        # the larger re-read).  No Python module is ever imported from
        # Spark's jars, so dropping those is behavior-neutral — but
        # only Spark's (``spark-*.jar``, r16 ADVICE fix): a deployment
        # may legitimately ship Python modules inside some other jar on
        # the worker PYTHONPATH, and a blanket jar strip would lose
        # them silently (the importability restore below only re-checks
        # pyspark/py4j).
        if base.endswith(".jar"):
            return base.startswith("spark-")
        return base.endswith(".zip") and (
            base.startswith("pyspark") or base.startswith("py4j")
        )

    original = list(sys.path)
    sys.path[:] = [p for p in sys.path if not is_spark_zip(p)]
    # Defensive: drop any already-registered zip finders for those
    # entries (and their in-zip subpaths like ``pyspark.zip/pyspark``) —
    # PathFinder.invalidate_caches walks sys.path_importer_cache, not
    # sys.path, so a stale entry would keep re-reading the zip
    # directory forever.
    def inside_spark_zip(entry: str) -> bool:
        for ext in (".zip", ".jar"):
            i = entry.find(ext)
            if i >= 0 and is_spark_zip(entry[: i + 4]):
                return True
        return False

    for k in [k for k in sys.path_importer_cache if inside_spark_zip(k)]:
        del sys.path_importer_cache[k]
    try:
        import importlib.util

        ok = (
            importlib.util.find_spec("pyspark") is not None
            and importlib.util.find_spec("py4j") is not None
        )
    except (ImportError, ValueError):  # pragma: no cover — defensive
        ok = False
    if not ok:  # pragma: no cover — zip-only Spark distribution
        sys.path[:] = original


_strip_spark_zip_path_entries()

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
