"""Opt-in scaling-curve gate (r8): pins the measured ~10x wall-time
ratios from ``scripts/scale_probe.py`` as assertions, so a change that
makes one of the four most scale-sensitive operators super-linear fails
a named test instead of waiting for the next manual probe.

Heavy (several minutes of synthetic-corpus Spark work), so opt-in like
the full edge sweep:

    SPARK_GRAFT_SCALE_PROBE=1 python -m pytest tests/test_scale_probe.py

Bounds are deliberately loose (2x headroom over the recorded medians in
BENCH_NOTES.md r8) — this gate catches complexity-class regressions
(quadratic candidate blowup, skew funnels), not ambient drift.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

_ENABLED = os.environ.get("SPARK_GRAFT_SCALE_PROBE") == "1"

pytestmark = pytest.mark.skipif(
    not _ENABLED,
    reason="scaling gate: set SPARK_GRAFT_SCALE_PROBE=1 (several minutes)",
)

# (probe name, bound on t(10n)/t(n), recorded r8 median ratio).
# A linear operator reads ~<= 10 at 10x data; bounds sit ~2x above the
# recorded medians and far below the 10x linearity ceiling for the
# sub-linear ones.
BOUNDS = {
    # ngram's t(n) is ~2s, so the ratio's denominator is small enough
    # for ambient swings to double it (observed 2.5x-6x across runs of
    # the identical code); the bound sits under the ~25x a quadratic
    # candidate blowup would produce, which is what this gate exists to
    # catch.
    "ngram": 9.0,       # recorded 2.53x median
    # paragraph's recorded median (7.87x) sits close to the data ratio
    # because hot-chunk frequency grows WITH n; in-session GC/ambient
    # swings push individual runs past 10x, so the bound is a
    # catastrophic-only ceiling (~1.5x linear), not a precision pin.
    "paragraph": 15.0,  # recorded 7.87x
    "ivf": 4.0,         # recorded 1.49x
    # r15: IVF-ADC query path (index pretrained; encode+scan+rerank is
    # what scales with the corpus).  Recorded 1.75x drained — margin
    # matches the ivf bound's ~2.7x headroom for ambient swings; a
    # scan that stopped pruning by probed list reads ~10x.
    "ivfpq": 4.5,       # recorded 1.75x
    # r9 additions (r8 verdict item 4): connected_components on 10x more
    # FIXED-diameter chains — round count is set by diameter, so the
    # ratio must stay far under linear (recorded 2.2x; diameter GROWTH
    # is a separate fail-loud max_iter contract, not a curve).
    "components": 5.0,  # recorded 2.2x
    # resample_gapfill with keys growing 10x at fixed span: grid rows
    # (explode + fill window) grow 10x, wall recorded 3.95x standalone —
    # but in-suite it runs after components' ~90 localCheckpoint blocks
    # (freed only by JVM GC; the clearCache+gc below helps but is not a
    # guarantee), which pushed one in-suite run past 8x.  The bound is a
    # catastrophic ceiling: a keys^2 grid blowup reads ~100x.
    "gapfill": 12.0,    # recorded 3.95x standalone
    # r10 addition: asof union-and-window at 10x rows per key (fixed
    # 1000 keys).  Recorded 2.03x — the small arm (~0.9s) is overhead-
    # diluted, so the bound is a catastrophic ceiling well under the
    # ~10x a per-key sort funnel (or a double-shipped right payload)
    # would read, not a precision pin.
    "asof": 8.0,        # recorded 2.03x
    # r10 addition: duplicate_clusters with HALF the corpus one
    # byte-identical mega-cluster growing 10x with the data (10k ->
    # 100k copies).  Recorded 2.39x — the quadratic all-pairs form
    # would not even finish the big arm (C(100k,2) = 5e9 pairs per
    # band), so any bound that completes is already the proof; 7.0 is
    # ~3x the recorded median for ambient headroom.
    "megadup": 7.0,     # recorded 2.39x
    # r12 addition: semantic_dedup under the SemDeDup discipline (10x
    # vectors AND 10x centroids, cluster size fixed): pair work
    # n²/nlist grows linearly; recorded 1.51x (small arm overhead-
    # diluted).  A fixed-nlist quadratic regime reads ~10x the linear
    # reading — the catastrophe this bound exists to catch.
    "semantic": 5.0,    # recorded 1.51x
    # r12 addition: the COLUMN axis (60 -> 600 cols at fixed 50k rows;
    # r11 verdict item 4).  10x columns = 10x cells AND 10x agg
    # expressions, so linear reads ~10; recorded 9.55x.  The failure
    # mode this gate exists to catch — superlinear Catalyst analysis /
    # codegen in the expression count — reads ~50x+.
    "wideschema": 15.0,  # recorded 9.55x
    # r12 addition: the Arrow media pipeline (decode_media header
    # sweep + extract_features full pixel decode over six real image
    # containers + sampled GIF frame decode) at 10x media rows.
    # Embarrassingly parallel per Arrow batch, so the true curve is
    # ~linear and the small arm is overhead-diluted (recorded 2.44x).
    # The failure modes this gate catches — a driver-side decode loop,
    # a per-row (non-batched) UDF regression, or a frame-join that
    # ships the video bytes once per sampled frame — all read >>10x.
    "media": 8.0,        # recorded 2.44x
}
# Measured 0.932 (n) / 0.964 (10n) in the r8 probe; floor keeps ~half
# the margin (r8 verdict item 6).  Must hold at 10n too.
MIN_IVF_RECALL = 0.9


def _drop_probe_residue(spark):
    """Cross-probe hygiene: connected_components leaves localCheckpoint
    RDD blocks that only JVM GC reclaims; a later probe timed against
    that residue reads an inflated ratio (observed: gapfill 3.95x
    standalone vs >8x in-suite).  Clear the cache and invite a GC so
    each probe starts from a clean storage layer."""
    spark.catalog.clearCache()
    spark._jvm.System.gc()


# Explicit execution order, NOT sorted(): probes share one session, and
# residue accumulates — components' ~90 localCheckpoint blocks are freed
# only by JVM GC, and every probe leaves shuffle files.  gapfill (whose
# 50M-row big arm is the most memory-pressure-sensitive) runs FIRST in
# the cleanest environment; components runs LAST so its residue
# contaminates nothing.  (r10 incident: adding the asof probe ahead of
# gapfill in alphabetical order pushed an in-suite gapfill run to 19x —
# standalone re-measured 3.4x on the same bytes, confirming ordering
# residue, not a regression.)
# megadup also ends in connected_components (localCheckpoint residue),
# so it runs with components at the tail of the order.
PROBE_ORDER = ["gapfill", "asof", "ivf", "ivfpq", "ngram", "paragraph",
               "semantic", "wideschema", "media", "megadup", "components"]
assert sorted(PROBE_ORDER) == sorted(BOUNDS)


def test_every_probe_is_gated():
    """A probe registered in scale_probe.py but asserted nowhere would
    be a silently-ungated curve (the r9 vacuous-green class): every
    PROBES entry must either carry a BOUNDS ratio or be named by a
    dedicated test below."""
    import scale_probe as SP

    dedicated = {"salted", "stardiam", "statefulstream"}
    assert set(SP.PROBES) == set(BOUNDS) | dedicated


@pytest.mark.parametrize("name", PROBE_ORDER)
def test_ratio_within_bound(spark, name):
    import scale_probe as SP

    _drop_probe_residue(spark)
    fn, n = SP.PROBES[name]
    out = fn(spark, 2, n)
    assert out["ratio"] <= BOUNDS[name], out
    if name == "ivf":
        assert out["recall_n"] >= MIN_IVF_RECALL, out
        assert out["recall_10n"] >= MIN_IVF_RECALL, out
    if name == "ivfpq":
        # Two approximation stages compound (coarse probe AND residual
        # quantization), so the floor sits at the pytest operator gate
        # (0.8), not the single-stage IVF floor: recorded 0.928 (n) /
        # 0.884 (10n) drained.
        assert out["recall_n"] >= 0.8, out
        assert out["recall_10n"] >= 0.8, out


def test_star_components_flat_under_diameter_growth(spark):
    """r11 (r10 verdict item 4): the algorithm='star' formulation must
    stay ~flat as component diameter grows (recorded 1.13x from d15 to
    d49 at a fixed 30k-edge budget, while label grew 2.8x and fails
    loud past max_iter), and on the dup-shaped arm (star edges,
    diameter 2 — the registry's real workload) the label default must
    remain competitive (recorded: label 3.3s vs star 3.7s — why label
    stays the default).  Runs last-ish: both algorithms leave
    localCheckpoint residue, hence the explicit cleanup."""
    import scale_probe as SP

    _drop_probe_residue(spark)
    fn, n = SP.PROBES["stardiam"]
    out = fn(spark, 2, n)
    assert out["star_growth_d15_to_d49"] <= 2.0, out
    assert out["t_label_dup"] <= out["t_star_dup"] * 2.0, out


def test_stateful_stream_scales_with_state(spark):
    """r11: the applyInPandasWithState operator as a REAL availableNow
    stream at 10x events AND 10x users (state rows, groups per batch
    and Arrow transfer all grow 10x; micro-batch count fixed at 4).
    Recorded 2.14x — fixed per-batch overhead dilutes the growth; the
    bound is a catastrophic ceiling (a per-key quadratic or state
    explosion reads >10x), not a precision pin."""
    import scale_probe as SP

    _drop_probe_residue(spark)
    fn, n = SP.PROBES["statefulstream"]
    out = fn(spark, 2, n)
    assert out["ratio"] <= 8.0, out


def test_salted_join_not_worse_than_plain(spark):
    """The salting shape must scale no worse than the plain shuffle join
    on its own target workload (one key holding 50% of rows).

    Multiplier history: 1.5 tripped twice in r12 pytest contexts
    (in-lattice 6.42-vs-4.16, standalone-in-suite 4.20-vs-4.125 — a
    4ms-over-margin reading) while direct drained probes read
    2.81/3.01-vs-2.50/2.22 (BENCH_NOTES r12).  Both ratios have ~1s
    denominators, so the COMPARATIVE bound multiplies two
    overhead-diluted noises; 2.0 keeps the catastrophic signal (a
    salt-explode shipping the dim 32x or a broken AQE path reads
    >>2x plain) without pinning session-residue noise.  The PRECISE
    1.5x comparative gate lives on the drained-probe path since r13
    (scripts/scale_probe.py probe_salted's gate field — run
    `python scripts/scale_probe.py --probe salted` standalone; exits
    non-zero past 1.5x), per the r12 ADVICE split."""
    import scale_probe as SP

    fn, n = SP.PROBES["salted"]
    out = fn(spark, 2, n)
    assert out["ratio_salted"] <= out["ratio_plain"] * 2.0, out
    assert out["ratio_salted"] <= 10.0, out
