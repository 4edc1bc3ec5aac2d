"""Relational operators beyond plain DataFrame methods: as-of joins,
pivot, deterministic sampling, exact algebraic moments.

Each is designed for the 100 TB path and documented with its shuffle
shape; the registry pairs them with DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spreadsheet_etl_engine_spark.functions.numeric import finite_or_fail


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: str,
    right_cols: dict[str, str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right.on <= left.on`` within the same ``by`` group (direction
    'backward'; 'forward' mirrors with >=).

    Implementation is the union-and-window trick: tag both sides, union,
    sort within ``by`` by ``on``, carry the last-seen right values forward
    with ``last(ignorenulls)``, keep left rows.  ONE shuffle on ``by``
    (the window partition) regardless of table sizes — no range cross
    join, no per-key driver loop; skewed ``by`` keys are handled by AQE.
    ``right_cols`` maps right column → output alias.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")

    # Right rows with a NULL as-of timestamp can never satisfy
    # right.on <= left.on; without this filter they sort NULLS-FIRST
    # under the window order and last(ignorenulls) would carry their
    # values into every left row before the first real right timestamp
    # (a parity-blind wrong answer: a union-and-window SQL oracle built
    # the same way computes the identical forward-fill).
    right = right.filter(F.col(on).isNotNull())

    l_tag = left.select(
        F.col(by), F.col(on), F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left.columns if c not in (by, on)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    r_tag = right.select(
        F.col(by), F.col(on), F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (by, on)],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    # Whole-ROW carry, not per-column: right values travel as ONE struct
    # so the matched output always comes from a single right row — a
    # per-column last(ignorenulls) would stitch columns from DIFFERENT
    # right rows whenever the latest right row holds a NULL (and the
    # native ASOF JOIN semantics both DuckDB and kdb implement carry the
    # matched row's own NULLs).  Left rows carry a NULL struct, which
    # ignorenulls skips.
    unioned = l_tag.unionByName(r_tag).withColumn(
        "_r",
        F.when(
            F.col("_is_left") == 0,
            F.struct(*[F.col(f"_r_{c}") for c in right_cols]),
        ),
    ).drop(*[f"_r_{c}" for c in right_cols])
    # (the flat _r_ columns are dropped so right values cross the
    # shuffle ONCE, inside the struct — not twice)
    # Right rows sort before left rows at equal timestamps so an exact-tie
    # right row is visible to the left row (asof <=).  The trailing _r
    # struct makes the order TOTAL over tied right rows (same by, same
    # on): without it, which tied row "wins" depended on shuffle-fetch
    # arrival order and could flip under task retry or speculative
    # execution (r9 re-execution review) — now the struct-max tied row
    # wins deterministically (byte-identical duplicates tie harmlessly).
    # A left row with a NULL as-of timestamp matches nothing (NULL >= x
    # and NULL <= x are both unknown — DuckDB's native ASOF JOIN returns
    # no match).  Backward gets this for free: asc is NULLS FIRST, so the
    # NULL left row precedes every right row and carries a NULL struct.
    # Forward must pin NULLS FIRST explicitly — bare desc() is NULLS
    # LAST, which would put the NULL left row AFTER every right row and
    # hand it the minimum-``on`` match (r9 advice finding).
    order = [F.col(on).asc(), F.col("_is_left").asc(), F.col("_r").asc()]
    if direction == "forward":
        order = [F.desc_nulls_first(on), F.col("_is_left").asc(), F.col("_r").asc()]
    w = Window.partitionBy(by).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    carried = unioned.select(
        "*", F.last(F.col("_r"), ignorenulls=True).over(w).alias("_rw"),
    )
    keep = [F.col(c) for c in left.columns] + [
        F.col(f"_rw._r_{c}").alias(out) for c, out in right_cols.items()
    ]
    return carried.filter(F.col("_is_left") == 1).select(*keep)


def pivot_counts(
    df: DataFrame, *, row_key: str, pivot_key: str, values: list[str]
) -> DataFrame:
    """Pivot with an explicit value list — never the value-discovering
    variant (which runs an extra distinct job and breaks at high
    cardinality).  Map-side combinable: one shuffle on ``row_key``.
    Only the pivoted count columns are zero-filled — a NULL row key must
    stay NULL, not merge with a genuine 0 key."""
    return df.groupBy(row_key).pivot(pivot_key, values).count().na.fill(0, subset=values)


def _hash_bucket(key: Column, modulus: int) -> Column:
    """The engine's one deterministic bucket function: first 8 hex chars of
    md5 as an integer, mod ``modulus``.  Mirrored verbatim in the SQL
    oracles — change both together or parity breaks.

    NULL keys coalesce to a sentinel BEFORE hashing so they land in one
    deterministic bucket like any other value — md5(NULL) is NULL, and a
    NULL bucket would fail every ``< percent`` comparison, silently
    excluding NULL-key rows from all samples (percent=100 would not
    return the full table)."""
    key_str = F.coalesce(key.cast("string"), F.lit("\x00null\x00"))
    return F.conv(F.substring(F.md5(key_str), 1, 8), 16, 10).cast("long") % modulus


def hash_sample(df: DataFrame, key: Column, *, percent: int, modulus: int = 100) -> DataFrame:
    """Deterministic hash-based sampling: keep rows where
    ``md5(key) mod modulus < percent``; NULL keys hash via a sentinel
    (one deterministic stratum — never silently dropped).

    At 100 TB this is the only sane sampling: reproducible across runs,
    engines and partitionings, stable under re-partitioning (unlike
    ``df.sample`` whose output depends on partition layout), and
    consistent for the same key across tables (joinable samples).
    """
    return df.filter(_hash_bucket(key, modulus) < percent)


def upsert(
    target: DataFrame,
    updates: DataFrame,
    key: str | list[str],
    *,
    dedup_updates: bool = False,
) -> DataFrame:
    """Key-based upsert (MERGE without a table format): updates win, target
    rows without a matching update survive.

    Anti-join formulation — ``updates ∪ (target ⟂ updates.keys)`` — moves
    only the key column of the update set against the target (semi-join
    pruning), not full rows through a full-outer join; at 100 TB with a
    small update batch the anti side broadcasts and the big target never
    shuffles.  Output column order follows ``target``.

    PRECONDITION: ``updates`` must be unique per key, or the output breaks
    the one-row-per-key invariant (Delta/Iceberg MERGE errors loudly on
    multiple matches for the same reason).  ``dedup_updates=True`` keeps
    an arbitrary-but-deterministic row per key (max by the row's struct
    ordering) for feeds that can't guarantee it upstream.
    """
    keys = [key] if isinstance(key, str) else list(key)
    if dedup_updates:
        others = [c for c in updates.columns if c not in keys]
        if others:
            updates = (
                updates.groupBy(*keys)
                .agg(F.max(F.struct(*others)).alias("_r"))
                .select(*keys, *[F.col(f"_r.{c}").alias(c) for c in others])
            )
        else:
            # Key-only update set: duplicate keys are identical rows, so
            # dedup is plain distinct (the struct-of-no-columns agg would
            # otherwise die with an opaque analysis error).
            updates = updates.distinct()
    survivors = target.join(updates.select(*keys), keys, "left_anti")
    return updates.select(*target.columns).unionByName(survivors)


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str | list[str],
    attrs: list[str],
    *,
    effective_col: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2: apply a change batch to a
    versioned dimension, preserving history.

    For each change row whose attributes differ from the key's current
    version (null-safe compare): the current row closes
    (``valid_to = effective``, ``is_current = false``) and a new open
    version is appended; identical attributes are a no-op; unknown keys
    insert a first version.  Historical (non-current) rows pass through
    untouched.  Shuffle shape: one key join of current-rows × changes plus
    one anti-join for brand-new keys — the change batch is typically tiny
    next to the dimension, so both broadcast; history never shuffles.

    PRECONDITION: one change row per key per batch (run batches in
    effective-date order); ``effective_col`` must be non-null (validated —
    a NULL change row fails the job loudly rather than vanishing); ``dim``
    must carry exactly ``keys + attrs`` plus the three SCD bookkeeping
    columns (validated — surrogate keys / audit columns belong on a
    wrapping projection).  A NULL ``is_current`` is treated as historical
    (``coalesce(false)``): under plain filters such a row would match
    neither branch and silently vanish.
    """
    keys = [key] if isinstance(key, str) else list(key)
    out_cols = dim.columns
    expected = set(keys) | set(attrs) | {from_col, to_col, current_col}
    extra = [c for c in out_cols if c not in expected]
    if extra:
        raise ValueError(
            f"scd2_apply: dim has columns {extra} beyond keys+attrs+SCD "
            "bookkeeping; project them off (or into attrs) first"
        )
    null_to = F.lit(None).cast(dim.schema[to_col].dataType)
    is_cur = F.coalesce(F.col(current_col), F.lit(False))
    cur = dim.filter(is_cur)
    hist = dim.filter(~is_cur)
    # A NULL effective date would make the change row match neither the
    # changed nor the unchanged branch and silently vanish from history —
    # fail the job loudly instead (the check rides inside the _eff
    # expression itself so column pruning can never drop it).
    eff = F.col(effective_col)
    eff_checked = F.when(eff.isNotNull(), eff).otherwise(
        F.raise_error(F.lit(
            f"scd2_apply: NULL {effective_col} in change batch; every "
            "change row needs an effective date"
        ))
    )
    u = changes.select(
        *keys,
        *[F.col(a).alias(f"_u_{a}") for a in attrs],
        eff_checked.alias("_eff"),
    )
    j = cur.join(u, keys, "left")
    differs = F.lit(False)
    for a in attrs:
        differs = differs | ~F.col(a).eqNullSafe(F.col(f"_u_{a}"))
    is_changed = F.col("_eff").isNotNull() & differs
    closed = j.filter(is_changed).select(
        *keys, *attrs, F.col(from_col),
        F.col("_eff").alias(to_col), F.lit(False).alias(current_col),
    ).select(*out_cols)
    kept = j.filter(~is_changed).select(*out_cols)
    reopened = j.filter(is_changed).select(
        *keys, *[F.col(f"_u_{a}").alias(a) for a in attrs],
        F.col("_eff").alias(from_col), null_to.alias(to_col),
        F.lit(True).alias(current_col),
    ).select(*out_cols)
    first_version = u.join(cur.select(*keys), keys, "left_anti").select(
        *keys, *[F.col(f"_u_{a}").alias(a) for a in attrs],
        F.col("_eff").alias(from_col), null_to.alias(to_col),
        F.lit(True).alias(current_col),
    ).select(*out_cols)
    return hist.unionByName(kept).unionByName(closed).unionByName(
        reopened).unionByName(first_version)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str | list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Change-data capture between two snapshots: one row per changed key
    with ``change_type`` in {added, removed, changed}.

    Three key-only joins (two anti + one inner with a compare predicate);
    ``changed`` uses null-safe equality so NULL→value transitions count.
    The CDC primitive for incremental pipelines: feed the output to
    :func:`upsert` (or a deletion pass) to advance a derived table without
    reprocessing the unchanged bulk.
    """
    keys = [key] if isinstance(key, str) else list(key)
    added = new.join(old.select(*keys), keys, "left_anti").select(
        *keys, F.lit("added").alias("change_type")
    )
    removed = old.join(new.select(*keys), keys, "left_anti").select(
        *keys, F.lit("removed").alias("change_type")
    )
    o = old.select(*keys, *compare_cols)
    n = new.select(*keys, *[F.col(c).alias(f"_new_{c}") for c in compare_cols])
    differs = None
    for c in compare_cols:
        d = ~F.col(c).eqNullSafe(F.col(f"_new_{c}"))
        differs = d if differs is None else (differs | d)
    changed = (
        o.join(n, keys)
        .filter(differs)
        .select(*keys, F.lit("changed").alias("change_type"))
    )
    return added.unionByName(removed).unionByName(changed)


def stratified_hash_sample(
    df: DataFrame,
    key: Column,
    stratum: Column,
    rates: dict[str, int],
    *,
    modulus: int = 100,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep rows where
    ``md5(key) mod modulus < rates[stratum]`` (percent per stratum value;
    missing strata keep nothing).

    The 100 TB rebalancing primitive: down-weight dominant strata
    (language, domain, source) at exact, reproducible rates with a single
    codegen'd filter — no shuffle, no RNG, pushable after the scan, and
    the same key hash keeps per-entity samples consistent across tables.
    """
    bucket = _hash_bucket(key, modulus)
    rate = F.lit(0)
    for value, pct in rates.items():
        rate = F.when(stratum == value, F.lit(pct)).otherwise(rate)
    return df.filter(bucket < rate)


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    *,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-salting join: the manual fallback when AQE's skew-join split
    can't help (e.g. one key holds >spill-size of rows on the *build*
    side, or the join is followed by a key-preserving op that re-skews).

    The skewed side gets a random salt in [0, salt); the small side is
    replicated ``salt`` times (explode over the salt range); joining on
    (key, salt) spreads each hot key over ``salt`` partitions.  Replication
    multiplies the small side — only use when small ≪ skewed.

    Only left-preserving modes are supported: under ``right``/``full``,
    replicated right rows whose (key, salt) matches nothing would survive
    as up-to-``salt`` spurious right-only duplicates — a silently wrong
    result, so those modes fail loud here.
    """
    # Spark accepts underscore/alias spellings (leftouter, left_outer,
    # leftsemi, ...) for the same modes — normalize before the
    # left-preserving check so valid spellings don't fail loud.
    if how.lower().replace("_", "") not in (
        "inner", "left", "leftouter", "semi", "leftsemi", "anti", "leftanti"
    ):
        raise ValueError(
            f"salted_join does not support how={how!r}: salt replication "
            "is only correct for left-preserving joins (inner/left/"
            "semi/anti) — an unmatched replicated right row would "
            "duplicate under right/full outer semantics"
        )
    # Deterministic row-content salt: any salt value works (the small
    # side is replicated for all of them), but it must be a PURE
    # function of the row — monotonically_increasing_id depends on row
    # POSITION within a partition, which is not stable for post-shuffle
    # inputs (this operator's documented use case), and a
    # nondeterministic expression inside a shuffle KEY tears the join
    # under task retry/speculation: re-attempted map tasks re-salt rows
    # differently and reducers see rows twice or never (the SPARK-23207
    # class; r9 re-execution review).  xxhash64 over every column keeps
    # the spread and is retry-stable; byte-identical duplicate rows
    # share a salt — acceptable, hot-key rows differ elsewhere.
    salted_left = skewed.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt)),
    )
    exploded_right = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_left.join(exploded_right, [key, "_salt"], how)
    return out.drop("_salt")


def exact_moments(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    alias_prefix: str,
    include_range: bool = False,
) -> DataFrame:
    """Mean / population variance / stddev computed from exact decimal
    power sums (Σx, Σx²) in ONE pass: algebraic aggregates that combine
    associatively across partitions — the scale-correct way to get exact,
    engine-reproducible moments (float sum order never enters; the only
    float ops are the final divisions/sqrt, identical in any engine).

    ``n`` counts NON-NULL values (``count(value)``, not ``count(*)``):
    NULLs vanish from the power sums, so dividing by the row count would
    skew every moment on any table with missing values — the standard
    SQL AVG/VAR_POP convention, and the parity-blind class of bug (an
    oracle written with ``count(*)`` computes the same wrong answer).
    Values must fit decimal(18,2): larger magnitudes fail loud under
    ANSI (null out under non-ANSI, shrinking ``n``'s basis) — pre-filter
    or widen the cast for such feeds.  NaN/±Infinity fail loud via
    finite_or_fail (ANSI would silently NULL them out of the cast).

    ``include_range=True`` appends exact decimal ``_min``/``_max``
    columns — the EXACT degenerate-group detector (min = max ⟺ the
    group is constant-valued).  Consumers that divide by ``_std`` need
    it: for a constant group the double subtraction leaves ±1e-18
    cancellation residue (or exact 0), so testing the float variance
    is the same parity-blind trap agg_linear_fit fixed in r9 — a
    zero-or-garbage sigma divides into garbage z-scores or an ANSI
    DIVIDE_BY_ZERO that kills the whole query (r10 review pass 4,
    found live in events_value_outliers)."""
    x = finite_or_fail(F.col(value_col), value_col).cast("decimal(18,2)")
    n = F.count(x)
    sx = F.sum(x)
    sxx = F.sum(x * x)
    mean = (sx.cast("double") / n)
    # Clamp at 0: the final double subtraction can land at -1e-18 for
    # constant-valued groups, which would turn the stddev into NaN.
    var = F.greatest((sxx.cast("double") / n) - mean * mean, F.lit(0.0))
    aggs = [
        n.alias(f"{alias_prefix}_n"),
        mean.alias(f"{alias_prefix}_mean"),
        var.alias(f"{alias_prefix}_var"),
        F.sqrt(var).alias(f"{alias_prefix}_std"),
    ]
    if include_range:
        aggs += [
            F.min(x).alias(f"{alias_prefix}_min"),
            F.max(x).alias(f"{alias_prefix}_max"),
        ]
    return df.groupBy(*group_cols).agg(*aggs)


def resample_gapfill(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket: str = "1 hour",
    max_buckets_per_key: int = 1_000_000,
) -> DataFrame:
    """Time-series resample + gap fill: bucket events per key, generate
    the complete bucket grid between each key's first and last bucket,
    and forward-fill the aggregated value across empty buckets.

    Output: ``(key, bucket_start, n_events, v_filled)`` with one row per
    (key, bucket) in the key's observed span — ``n_events = 0`` marks a
    gap, ``v_filled`` carries the last observed bucket sum forward.

    Scale shape: one shuffle for the bucket agg and one for the
    grid↔agg join + fill window, both keyed on ``key_col`` (AQE splits
    skewed keys).  The grid generation (``sequence`` + ``explode``) is
    per-row compute bounded by span/bucket per key — no shuffle, no
    driver involvement; a 100 TB event table with bounded per-key spans
    resamples in one pass over keys.  The value sum accumulates in
    DECIMAL(18,2) so bucket totals are engine-reproducible.

    ``max_buckets_per_key`` is the poison-timestamp guard (r8 edge-sweep
    find): the grid is DATA-DEPENDENT, so ONE corrupted far-future or
    epoch timestamp silently inflates a key's span — a single 9999-12-31
    row next to 2025 data demands a ~70M-element ``sequence`` array
    (~0.5 GB in one task) and OOMs the executor.  A key whose grid would
    exceed the cap fails LOUD with the key named (raise_error inside
    the grid expression — still fully distributed); bound the input time
    range or raise the cap for legitimately long spans.  The cap is
    exact: the per-key grid holds at most ``max_buckets_per_key`` rows
    (sequence is end-inclusive, so the guard fires at a span of cap
    intervals).  The default (1M buckets ≈ 114 years of hours) never
    triggers on sane data.
    """
    h = F.window(F.col(ts_col), bucket)["start"]
    hourly = df.groupBy(F.col(key_col), h.alias("_h")).agg(
        F.count("*").alias("_n"),
        F.sum(finite_or_fail(F.col(value_col), value_col)
              .cast("decimal(18,2)")).cast("double").alias("_v"),
    )
    # Interval arithmetic keeps the cap bucket-unit-agnostic: the guard
    # compares timestamps, never parses the interval string itself.
    # >= keeps the cap exact: a span of exactly `cap` intervals would emit
    # cap+1 grid rows (sequence is end-inclusive), so the guard fires at
    # span >= cap intervals and the grid never exceeds cap rows per key.
    limit = F.col("_hmin") + F.expr(f"interval {bucket} * {max_buckets_per_key}")
    guarded_hmax = F.when(
        F.col("_hmax") >= limit,
        F.raise_error(
            F.concat(
                F.lit("resample_gapfill: key "),
                F.col(key_col).cast("string"),
                F.lit(
                    f" spans more than {max_buckets_per_key} '{bucket}' "
                    "buckets (poison timestamp? bound the input time "
                    "range or raise max_buckets_per_key)"
                ),
            )
        ).cast("timestamp"),
    ).otherwise(F.col("_hmax"))
    grid = (
        hourly.groupBy(key_col)
        .agg(F.min("_h").alias("_hmin"), F.max("_h").alias("_hmax"))
        .select(
            F.col(key_col),
            F.explode(
                F.sequence(F.col("_hmin"), guarded_hmax, F.expr(f"interval {bucket}"))
            ).alias("_h"),
        )
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("_h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, [key_col, "_h"], "left")
        .select(
            F.col(key_col),
            F.col("_h").alias("bucket_start"),
            F.coalesce(F.col("_n"), F.lit(0)).alias("n_events"),
            F.last("_v", ignorenulls=True).over(w).alias("v_filled"),
        )
    )


def funnel_steps(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    steps: list,
) -> DataFrame:
    """Ordered-funnel first-occurrence timestamps per key.

    ``steps`` is an ordered list of ``(output_name, predicate Column)``.
    Step i's timestamp is the MIN event time matching predicate i that is
    >= the key's step-(i-1) timestamp; keys that never reach a step carry
    NULL from that step on (LEFT joins preserve earlier progress).  One
    row per key that completed step 0.

    Scale shape: each stage is filter → shuffle-agg on the key → join
    back on the key — n_steps keyed aggs over progressively *shrinking*
    populations (stage filters prune at the scan; the inner join against
    prior completers prunes the rest).  No windows over whole event
    histories, so per-key event skew never concentrates in one task
    beyond the agg combine.
    """
    if not steps:
        raise ValueError("funnel_steps needs at least one step")
    # NULL event timestamps can never order within a funnel: without this
    # filter a key whose step-0 events are all NULL-ts would emit an
    # all-NULL step chain (min(ts) = NULL, every later ts >= NULL drops),
    # violating the one-row-per-step-0-completer contract.
    df = df.filter(F.col(ts_col).isNotNull())
    out = None
    for i, (_, pred) in enumerate(steps):
        stage = df.filter(pred)
        if out is None:
            out = stage.groupBy(key_col).agg(F.min(ts_col).alias("_ts0"))
            continue
        prev = f"_ts{i - 1}"
        cur = (
            stage.join(out.select(key_col, prev), key_col)
            .filter(F.col(ts_col) >= F.col(prev))
            .groupBy(key_col)
            .agg(F.min(ts_col).alias(f"_ts{i}"))
        )
        out = out.join(cur, key_col, "left")
    return out.select(
        key_col,
        *[F.col(f"_ts{i}").alias(name) for i, (name, _) in enumerate(steps)],
    )
