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
    seed).  Training runs distributed over the corpus; only the ``nlist``
    centroid vectors come back to the driver (tiny — they are broadcast
    into the assignment expression as literals)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=nlist, seed=seed, maxIter=max_iter).fit(train)
    return [list(map(float, c)) for c in model.clusterCenters()]


def assign_centroid(df: DataFrame, vec_col: str, centroids: list[list[float]]) -> DataFrame:
    """Add ``centroid_id`` = argmin L2 distance to the (literal, broadcast)
    centroid list — per-row expression, no shuffle."""
    best_id = F.lit(0)
    best_d = None
    for i, cvec in enumerate(centroids):
        lit_vec = F.array(*[F.lit(float(x)) for x in cvec])
        d = VEC.l2_distance(F.col(vec_col), lit_vec)
        if best_d is None:
            best_d, best_id = d, F.lit(0)
        else:
            closer = d < best_d
            best_id = F.when(closer, F.lit(i)).otherwise(best_id)
            best_d = F.when(closer, d).otherwise(best_d)
    return df.withColumn("centroid_id", best_id)


def topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    kmeans: bool = True,
) -> DataFrame:
    """Approximate top-k: probe only the ``nprobe`` closest centroid
    partitions per query.  Recall < 1 by design; the bruteforce operator
    is the exact baseline.  ``kmeans=True`` trains real centroids via
    MLlib; False uses the cheap deterministic-sample fallback."""
    if kmeans:
        centroids = train_centroids_kmeans(corpus, vec_col, nlist=nlist)
    else:
        centroids = train_centroids_lite(corpus, vec_col, nlist=nlist)
    c = assign_centroid(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")), "cv", centroids
    )
    # Rank centroids per query, keep nprobe.
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    probe_sets = []
    for i, cvec in enumerate(centroids):
        lit_vec = F.array(*[F.lit(float(x)) for x in cvec])
        probe_sets.append(F.struct(VEC.l2_distance(F.col("qv"), lit_vec).alias("d"), F.lit(i).alias("cid")))
    q = q.withColumn(
        "probes",
        F.slice(F.array_sort(F.array(*probe_sets)), 1, nprobe),
    ).withColumn("probe", F.explode(F.col("probes.cid"))).drop("probes")
    scored = (
        F.broadcast(q)
        .join(c, F.col("probe") == F.col("centroid_id"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", VEC.cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )
