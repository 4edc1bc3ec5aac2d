"""Similarity search over embedding columns.

* ``topk_bruteforce`` — exact cosine top-k for a (small) query set: the
  query side is broadcast, so the big side streams through one scan with
  no shuffle; ranking is a per-query window.  The right baseline, and the
  right *final reranker* at scale.
* ``topk_ivf`` — IVF-style ANN: k-means-lite centroids assign every vector
  to a partition (nprobe controls recall); candidate generation joins the
  query only against its closest centroid partitions.  This is the
  100 TB path: candidate volume drops by ~nlist/nprobe.
* Random-hyperplane LSH bucketing lives in ``functions.vectors``/
  ``operators.dedup.embedding_neardup_pairs``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spreadsheet_etl_engine_spark.functions import vectors as VEC


def topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors by cosine for every query vector.

    ``queries`` is expected to be small (it is broadcast); self-matches
    (same id) are excluded; ties break on neighbor id for determinism.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", VEC.cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


def train_centroids_lite(
    corpus: DataFrame, vec_col: str, *, nlist: int = 16, sample_per_list: int = 1
) -> list[list[float]]:
    """IVF centroid 'training' without MLlib: deterministic sample of
    ``nlist`` vectors as centroids (k-means|| init without the iterations).
    Cheap fallback; ``train_centroids_kmeans`` is the quality path."""
    rows = (
        corpus.select(F.col(vec_col).alias("v"))
        # Order before limit: a bare limit() depends on partition layout,
        # which would make the "deterministic" sample anything but.
        .orderBy(F.col("v"))
        .limit(nlist * sample_per_list)
        .collect()
    )
    return [list(map(float, r["v"])) for r in rows[:nlist]]


def train_centroids_kmeans(
    corpus: DataFrame, vec_col: str, *, nlist: int = 16, seed: int = 42, max_iter: int = 10
) -> list[list[float]]:
    """Real IVF centroids via pyspark.ml KMeans (k-means|| init, fixed
    seed) over L2-NORMALIZED vectors — spherical k-means, so the bucket
    structure matches the cosine metric the search ranks by.  Training
    runs distributed over the corpus; only the ``nlist`` centroid vectors
    come back to the driver (tiny — they are shipped to executors inside
    the Arrow-batched assignment kernel)."""
    import numpy as np
    import pandas as pd
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql.functions import pandas_udf

    # Arrow-batched normalization: one numpy pass per batch.  (The
    # expression form — transform(arr, x -> x / norm(arr)) — re-evaluates
    # the full norm aggregate per ELEMENT: O(dim^2) work per row.)
    def _unit_rows(vs):
        M = np.stack(vs.to_numpy()).astype(np.float64)
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        return pd.Series(list(M))

    _unit_rows.__annotations__ = {"vs": pd.Series, "return": pd.Series}
    unit = pandas_udf(_unit_rows, "array<double>")(F.col(vec_col))
    train = corpus.select(array_to_vector(unit).alias("features"))
    model = KMeans(k=nlist, seed=seed, maxIter=max_iter).fit(train)
    return [list(map(float, c)) for c in model.clusterCenters()]


def _centroid_matrix(centroids: list[list[float]]):
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    return C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)


def _cosine_to_centroids(vs, Cn):
    """(batch × dim) unit-normalized matmul against the centroid matrix."""
    import numpy as np

    if len(vs) == 0:
        # Arrow can hand the kernel a zero-row batch (empty partition /
        # empty source slice); np.stack raises on an empty list.
        return np.zeros((0, Cn.shape[0]))
    M = np.stack(vs.to_numpy()).astype(np.float64)
    M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    return M @ Cn.T


def assign_centroid(df: DataFrame, vec_col: str, centroids: list[list[float]]) -> DataFrame:
    """Add ``centroid_id`` = argmax cosine against the centroid list.

    One Arrow-batched kernel: the whole batch is a single
    ``(batch × dim) @ (dim × nlist)`` numpy matmul — per-row expression
    trees (nlist × dim literals deep) make Catalyst analysis itself the
    bottleneck, and a centroid *join* would amplify the corpus nlist-fold.
    Per-partition, no shuffle; centroids ride along in the closure
    (serialized once per executor, like a broadcast)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    Cn = _centroid_matrix(centroids)

    def _nearest(vs):
        return pd.Series(_cosine_to_centroids(vs, Cn).argmax(axis=1))

    _nearest.__annotations__ = {"vs": pd.Series, "return": pd.Series}
    return df.withColumn("centroid_id", pandas_udf(_nearest, "int")(F.col(vec_col)))


def probe_centroids(df: DataFrame, vec_col: str, centroids: list[list[float]],
                    nprobe: int) -> DataFrame:
    """Add ``probes`` = the ``nprobe`` nearest centroid ids (by cosine),
    same Arrow-batched matmul as :func:`assign_centroid`."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    Cn = _centroid_matrix(centroids)

    def _probes(vs):
        sims = _cosine_to_centroids(vs, Cn)
        order = np.argsort(-sims, axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(order))

    _probes.__annotations__ = {"vs": pd.Series, "return": pd.Series}
    return df.withColumn("probes", pandas_udf(_probes, "array<int>")(F.col(vec_col)))


def topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    spill: int = 2,
    kmeans: bool = True,
) -> DataFrame:
    """Approximate top-k: probe only the ``nprobe`` closest centroid
    partitions per query.  Recall < 1 by design; the bruteforce operator
    is the exact baseline.  ``kmeans=True`` trains real centroids via
    MLlib; False uses the cheap deterministic-sample fallback.

    ``spill`` replicates each corpus vector into its ``spill`` nearest
    buckets (spill-tree / IVF-with-replication): near-boundary vectors —
    where most recall is lost, especially on near-orthogonal embeddings
    with weak cluster structure — become reachable from either side.
    Storage × spill, query fan-in unchanged (still nprobe buckets).
    """
    if kmeans:
        centroids = train_centroids_kmeans(corpus, vec_col, nlist=nlist)
    else:
        centroids = train_centroids_lite(corpus, vec_col, nlist=nlist)
    c = probe_centroids(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")),
        "cv", centroids, max(1, spill),
    ).withColumn("centroid_id", F.explode(F.col("probes"))).drop("probes")
    # Rank centroids per query, keep nprobe.
    q = probe_centroids(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        "qv", centroids, nprobe,
    ).withColumn("probe", F.explode(F.col("probes"))).drop("probes")
    scored = (
        F.broadcast(q)
        .join(c, F.col("probe") == F.col("centroid_id"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        # A pair can surface via several shared buckets — dedupe before
        # scoring so the window ranks each candidate once.
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cosine", VEC.cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )
