"""Similarity search over an embedding column (array<float>).

* ``cosine_topk_bruteforce`` -- exact top-k by cosine: broadcast the query
  set against the corpus, JVM-side dot products (F.aggregate/zip_with in
  whole-stage codegen -- no Python in the hot path), window top-k.  The
  oracle-checkable baseline.
* ``lsh_topk`` -- random-hyperplane LSH variant: signatures via a
  vectorized pandas UDF, candidates restricted to matching buckets
  (multi-band), exact re-rank inside buckets.  The 100TB scale path: the
  crossJoin disappears, replaced by a bucket-keyed join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# cosine in double precision with a strict left-fold so Spark and DuckDB
# produce bit-identical sums (both fold sequentially over the list)
_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)
_NORM = (
    "sqrt(aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
)


def cosine_expr(a: str, b: str) -> str:
    return (f"{_DOT.format(a=a, b=b)} / "
            f"(greatest({_NORM.format(a=a)}, 1e-30) * greatest({_NORM.format(a=b)}, 1e-30))")


def cosine_topk_bruteforce(emb: DataFrame, k: int = 5, n_queries: int = 10,
                           id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """For each of the first ``n_queries`` ids: exact top-k neighbors by
    cosine.  The query side is broadcast (small); Catalyst keeps the dot
    product inside codegen."""
    queries = emb.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    corpus = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        F.broadcast(queries).crossJoin(corpus)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.expr(cosine_expr("qv", "cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def cosine_topk_oracle_sql(k: int = 5, n_queries: int = 10,
                           table: str = "embeddings") -> str:
    dot = ("list_sum(list_transform(generate_series(1, len(q.embedding)), "
           "i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))")
    nq = ("sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))")
    nc = ("sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))")
    return f"""
        WITH scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 {dot} / (greatest({nq}, 1e-30) * greatest({nc}, 1e-30)) AS cosine
          FROM {table} q, {table} c
          WHERE q.vec_id < {n_queries} AND q.vec_id <> c.vec_id
        ), ranked AS (
          SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, neighbor_id ASC) AS rank
          FROM scored
        )
        SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
               round(cosine, 6) AS cosine
        FROM ranked WHERE rank <= {k}
    """


def hyperplane_signatures(emb: DataFrame, n_planes: int = 16, seed: int = 42,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          dim: int | None = None) -> DataFrame:
    """Random-hyperplane sign bits packed into a long (vectorized)."""
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))

    def sig_iter(it):
        for pdf in it:
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (mat @ planes) > 0
            sig = (bits.astype(np.uint64)
                   << np.arange(n_planes, dtype=np.uint64)[None, :]).sum(
                axis=1, dtype=np.uint64).view(np.int64)
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "sig": sig})

    return emb.select(id_col, vec_col).mapInPandas(
        sig_iter, f"{id_col} {dict(emb.dtypes)[id_col]}, sig long")


def train_ivf_centroids(emb: DataFrame, n_centroids: int = 16, iters: int = 5,
                        sample_rows: int = 10000, seed: int = 42,
                        vec_col: str = "embedding") -> np.ndarray:
    """Deterministic k-means centroids from a bounded sample (driver-side
    numpy Lloyd iterations -- the sample is small by construction, the
    assignment over the full corpus stays distributed)."""
    sample = np.stack(
        emb.select(vec_col).limit(sample_rows).toPandas()[vec_col].to_numpy()
    ).astype(np.float64)
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-30)
    rng = np.random.default_rng(seed)
    cents = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)),
                              replace=False)]
    for _ in range(iters):
        sims = sample @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cents[c] = m / max(np.linalg.norm(m), 1e-30)
    return cents


def refine_ivf_centroids(emb: DataFrame, centroids: np.ndarray,
                         iters: int = 1,
                         vec_col: str = "embedding") -> np.ndarray:
    """Distributed Lloyd refinement over the FULL corpus: each task
    computes per-cluster partial (vector sum, count) against the
    broadcast centroids inside a batched numpy kernel; the driver reduces
    the (n_partitions x k) partials and renormalizes.  This makes the
    final centroids sample-independent at 100 TB -- the bounded driver
    sample in :func:`train_ivf_centroids` only seeds them.  One corpus
    pass per iteration, no shuffle at all: the partial rows (k per task)
    are the only thing that moves."""
    cents = np.asarray(centroids, dtype=np.float64).copy()
    k = len(cents)
    sc = emb.sparkSession.sparkContext
    for _ in range(iters):
        b = sc.broadcast(cents)

        def partials(it):
            c = b.value
            sums = np.zeros_like(c)
            counts = np.zeros(k, dtype=np.int64)
            for pdf in it:
                if not len(pdf):
                    continue
                mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                mat /= np.maximum(
                    np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
                assign = (mat @ c.T).argmax(axis=1)
                np.add.at(sums, assign, mat)
                counts += np.bincount(assign, minlength=k)
            yield pd.DataFrame({"cluster": np.arange(k, dtype=np.int32),
                                "s": list(sums), "n": counts})

        rows = emb.select(vec_col).mapInPandas(
            partials, "cluster int, s array<double>, n long").collect()
        sums = np.zeros_like(cents)
        counts = np.zeros(k, dtype=np.int64)
        for r in rows:  # n_partitions x k rows -- bounded, driver reduce
            sums[r["cluster"]] += np.asarray(r["s"])
            counts[r["cluster"]] += r["n"]
        nonempty = counts > 0
        means = sums[nonempty] / counts[nonempty, None]
        cents[nonempty] = means / np.maximum(
            np.linalg.norm(means, axis=1, keepdims=True), 1e-30)
        b.unpersist()
    return cents


def ivf_assign(emb: DataFrame, centroids: np.ndarray, id_col: str = "vec_id",
               vec_col: str = "embedding", assign_probes: int = 1) -> DataFrame:
    """(id, cluster) via a vectorized matmul against broadcast centroids.

    ``assign_probes`` > 1 indexes each vector under its top-r nearest
    clusters (multi-assignment, the standard IVF recall lever for points
    near cluster boundaries) at r x index-size cost."""

    def assign(it):
        for pdf in it:
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
            sims = mat @ centroids.T
            r = min(assign_probes, sims.shape[1])
            top = np.argsort(-sims, axis=1)[:, :r].astype(np.int32)
            ids = np.repeat(pdf[id_col].to_numpy(), r)
            yield pd.DataFrame({id_col: ids, "cluster": top.ravel()})

    return emb.select(id_col, vec_col).mapInPandas(assign, f"{id_col} {dict(emb.dtypes)[id_col]}, cluster int")


def ivf_topk(emb: DataFrame, k: int = 5, n_queries: int = 10,
             n_centroids: int = 16, nprobe: int = 4, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding",
             assign_probes: int = 1, refine_iters: int = 1) -> DataFrame:
    """IVF approximate top-k: corpus inverted by nearest centroid; each
    query searches only its ``nprobe`` closest clusters, exact cosine
    re-rank inside.  The 100TB shape: candidate generation is a cluster-id
    equi-join over ~corpus/n_centroids*nprobe*assign_probes rows per
    query.  ``assign_probes`` multi-assigns corpus vectors to their top-r
    clusters, recovering neighbors that sit just over a cluster border.
    ``refine_iters`` distributed Lloyd passes over the full corpus make
    the sample-seeded centroids sample-independent
    (:func:`refine_ivf_centroids`)."""
    cents = train_ivf_centroids(emb, n_centroids, seed=seed, vec_col=vec_col)
    if refine_iters:
        cents = refine_ivf_centroids(emb, cents, refine_iters, vec_col)
    assigned = ivf_assign(emb, cents, id_col, vec_col, assign_probes)
    emb_b = emb.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))

    # query -> its nprobe nearest clusters (tiny: n_queries rows, driver math)
    qvecs = emb.filter(F.col(id_col) < n_queries).select(id_col, vec_col).toPandas()
    qmat = np.stack(qvecs[vec_col].to_numpy()).astype(np.float64)
    qmat /= np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-30)
    probes = np.argsort(-(qmat @ cents.T), axis=1)[:, :nprobe]
    probe_rows = [(int(q), int(c)) for q, row in zip(qvecs[id_col], probes)
                  for c in row]
    spark = emb.sparkSession
    probe_df = spark.createDataFrame(probe_rows, "query_id long, cluster int")

    cands = (
        F.broadcast(probe_df)
        .join(assigned.withColumnRenamed(id_col, "neighbor_id"), "cluster")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id").distinct()
    )
    scored = (
        cands.join(emb_b.withColumnRenamed("_id", "query_id")
                   .withColumnRenamed("_v", "qv"), "query_id")
        .join(emb_b.withColumnRenamed("_id", "neighbor_id")
              .withColumnRenamed("_v", "cv"), "neighbor_id")
        .withColumn("cosine", F.expr(cosine_expr("qv", "cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def embedding_near_dup_pairs(emb: DataFrame, threshold: float = 0.4,
                             n_planes: int = 64, bands: int = 32, seed: int = 42,
                             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Embedding near-duplicate pairs at scale: hyperplane-LSH band-bucket
    self-join for candidates, exact cosine filter inside candidates -- no
    all-pairs crossJoin anywhere (that shape is kept ONLY as the small-sf
    oracle in __spark_entry__).

    Recall: a pair at cosine c agrees on one plane w.p. 1 - arccos(c)/pi
    (Goemans-Williamson); at the default 32 bands x 2 bits and c = 0.4 the
    miss probability is (1 - 0.631^2)^32 ~ 9e-8 per pair.  Low thresholds
    need many narrow bands (weak per-band selectivity) -- callers chasing
    higher thresholds should raise bits-per-band for a sparser join."""
    sigs = hyperplane_signatures(emb, n_planes, seed, id_col, vec_col)
    bits_per_band = n_planes // bands
    mask = (1 << bits_per_band) - 1
    banded = sigs.select(
        id_col,
        F.posexplode(F.array(*[
            F.shiftrightunsigned("sig", i * bits_per_band).bitwiseAND(F.lit(mask))
            for i in range(bands)
        ])).alias("band", "key"),
    )
    a = banded.select(F.col(id_col).alias("id_a"), "band", "key")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "key")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    emb_b = emb.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    return (
        cand.join(emb_b.withColumnRenamed("_id", "id_a")
                  .withColumnRenamed("_v", "va"), "id_a")
        .join(emb_b.withColumnRenamed("_id", "id_b")
              .withColumnRenamed("_v", "vb"), "id_b")
        .withColumn("cosine", F.expr(cosine_expr("va", "vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def lsh_topk(emb: DataFrame, k: int = 5, n_queries: int = 10, n_planes: int = 16,
             bands: int = 4, seed: int = 42, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: candidates share at least one signature band with
    the query, exact cosine re-rank within candidates.  Bucket-keyed join
    instead of a crossJoin -- the shape that survives 10^9 vectors."""
    sigs = hyperplane_signatures(emb, n_planes, seed, id_col, vec_col)
    bits_per_band = n_planes // bands
    mask = (1 << bits_per_band) - 1
    banded = sigs.select(
        id_col,
        F.posexplode(F.array(*[
            F.shiftrightunsigned("sig", i * bits_per_band).bitwiseAND(F.lit(mask))
            for i in range(bands)
        ])).alias("band", "key"),
    )
    emb_b = emb.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    q_band = (banded.filter(F.col(id_col) < n_queries)
              .select(F.col(id_col).alias("query_id"), "band", "key"))
    c_band = banded.select(F.col(id_col).alias("neighbor_id"), "band", "key")
    cands = (
        q_band.join(c_band, ["band", "key"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id").distinct()
    )
    scored = (
        cands.join(emb_b.withColumnRenamed("_id", "query_id")
                   .withColumnRenamed("_v", "qv"), "query_id")
        .join(emb_b.withColumnRenamed("_id", "neighbor_id")
              .withColumnRenamed("_v", "cv"), "neighbor_id")
        .withColumn("cosine", F.expr(cosine_expr("qv", "cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )
