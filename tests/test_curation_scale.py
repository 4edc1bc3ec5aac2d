"""Skew-robustness evidence for the curation family: md5 bucket
assignment keeps packing-bucket loads balanced even when the
document-length distribution is heavily skewed (round-4 verdict item 6).
The bucket-count knob itself (PACK_BUCKETS) is documented next to
``pack_sequences`` in ext_queries.py.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from spreadsheet_etl_engine_spark.ext_queries import PACK_BUCKETS, pack_sequences


def _skewed_docs(spark, n=4000, seed=7):
    """Heavy length skew: ~1% of docs are ~40x the median token count —
    the shape that breaks size-oblivious partitioning schemes."""
    rng = random.Random(seed)
    rows = [
        (i, " ".join(["tok"] * (1000 if rng.random() < 0.01 else rng.randint(5, 50))))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bucket_loads(packed):
    rows = (
        packed.groupBy((F.col("seq_id") / 1_000_000).cast("long").alias("bucket"))
        .agg(F.sum("n_tokens").alias("tok"), F.sum("n_docs").alias("docs"))
        .collect()
    )
    return {r["bucket"]: (r["tok"], r["docs"]) for r in rows}


def test_pack_bucket_balance_under_skew(spark):
    docs = _skewed_docs(spark)
    loads = _bucket_loads(pack_sequences(docs, n_buckets=PACK_BUCKETS))
    # Every bucket occupied — no dead partitions.
    assert len(loads) == PACK_BUCKETS
    toks = [t for t, _ in loads.values()]
    ndocs = [d for _, d in loads.values()]
    mean_tok = sum(toks) / len(toks)
    mean_docs = sum(ndocs) / len(ndocs)
    # Token load stays near-uniform despite the skewed lengths: the md5
    # hash spreads giant docs independently of their size, so the max
    # bucket is bounded by (mean + a few giants), not by a hot key.
    assert max(toks) / mean_tok < 2.0, (max(toks), mean_tok)
    assert min(toks) / mean_tok > 0.4, (min(toks), mean_tok)
    # Doc-count occupancy is tighter still (pure md5 uniformity).
    assert max(ndocs) / mean_docs < 1.4
    assert min(ndocs) / mean_docs > 0.6


def test_pack_bucket_knob_scales(spark):
    """The knob changes parallelism, not semantics: total packed tokens
    and docs are invariant across bucket counts."""
    docs = _skewed_docs(spark, n=1000)
    totals = {}
    for nb in (8, PACK_BUCKETS):
        packed = pack_sequences(docs, n_buckets=nb)
        agg = packed.agg(
            F.sum("n_tokens").alias("t"), F.sum("n_docs").alias("d")
        ).collect()[0]
        totals[nb] = (agg["t"], agg["d"])
        assert len(_bucket_loads(packed)) == nb
    assert totals[8] == totals[PACK_BUCKETS]


def test_pack_sequences_respect_budget(spark):
    """Next-fit invariant: a sequence exceeds the 512-token budget only
    via its last (straddling) document, so n_tokens < 512 + max_doc."""
    docs = _skewed_docs(spark, n=1000)
    packed = pack_sequences(docs, n_buckets=8)
    max_seq = packed.agg(F.max("n_tokens")).collect()[0][0]
    assert max_seq < 512 + 1000
