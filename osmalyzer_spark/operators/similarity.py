"""Embedding similarity search.

- cosine_topk_bruteforce: exact top-k. Probes (small) are collected to a
  numpy matrix and closed over a mapInPandas stage; each Arrow batch of
  candidates is one (batch x probes) matmul, emitting only each batch's
  local top-k per probe; a final window rank produces the global top-k.
  Shuffle volume is O(partitions * probes * k), never O(candidates).
- cosine_topk_lsh: IVF/LSH scale path — random-hyperplane signatures
  bucket candidates; probes search their own bucket (+ optional
  multi-table OR), exact rerank inside buckets. Recall < 1 by design;
  the brute-force path is the oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _collect_probes(probes: DataFrame, id_col: str, vec_col: str):
    rows = probes.select(id_col, vec_col).collect()
    ids = np.array([r[id_col] for r in rows])
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    return ids, mat


def cosine_topk_bruteforce(
    candidates: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k of each probe against all candidates.

    Output: (probe_id, cand_id, cosine, rank). Probe set must be
    driver-collectable (the usual ANN query shape); candidates stream.
    """
    probe_ids, probe_mat = _collect_probes(probes, id_col, vec_col)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            cand_ids = pdf["__cid"].to_numpy()
            mat = np.array(list(pdf["__cv"]), dtype=np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            cos = mat @ probe_mat.T  # (batch, n_probes)
            if exclude_self:
                same = cand_ids[:, None] == probe_ids[None, :]
                cos = np.where(same, -np.inf, cos)
            n_local = min(k, cos.shape[0])
            # local top-k per probe within this batch
            idx = np.argpartition(-cos, n_local - 1, axis=0)[:n_local]
            out = {
                "probe_id": np.repeat(probe_ids[None, :], n_local, axis=0).ravel(),
                "cand_id": cand_ids[idx].ravel(),
                "cosine": np.take_along_axis(cos, idx, axis=0).ravel(),
            }
            res = pd.DataFrame(out)
            yield res[np.isfinite(res["cosine"])]

    scored = candidates.select(
        F.col(id_col).alias("__cid"), F.col(vec_col).alias("__cv")
    ).mapInPandas(score, schema="probe_id long, cand_id long, cosine double")
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "cand_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


# Quantization scale for hyperplane signatures: components become
# floor(v * 2^20) int64, so the ±1-plane dot product is an exact,
# order-independent integer sum — one numpy matmul per Arrow batch here,
# bit-identical to a plain-SQL replay in the oracle, and no codegen
# blowup at real embedding dims (512–1536), unlike per-literal columns.
QUANT = 1 << 20


def hyperplane_planes(n_planes: int, dim: int, seed: int, table: int) -> np.ndarray:
    """±1 Rademacher planes, deterministic from (seed, table); exposed so
    oracle SQL generators embed the identical coefficients."""
    rng = np.random.default_rng(seed + 1000 * table)
    return rng.choice([-1.0, 1.0], size=(n_planes, dim)).astype(np.int64)


def hyperplane_signatures_col(vec_col: str, n_planes: int, n_tables: int, seed: int):
    """array<long> column of n_tables LSH bucket keys (bit j of key t =
    sign of quantized dot with plane j of table t)."""

    @F.pandas_udf("array<long>")
    def sig_udf(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype=object)
        mat = np.array(list(vecs), dtype=np.float64)
        q = np.floor(mat * QUANT).astype(np.int64)
        dim = q.shape[1]
        shifts = np.arange(n_planes, dtype=np.int64)[None, :]
        keys = np.empty((len(vecs), n_tables), dtype=np.int64)
        for t in range(n_tables):
            dots = q @ hyperplane_planes(n_planes, dim, seed, t).T  # exact int64
            keys[:, t] = ((dots > 0).astype(np.int64) << shifts).sum(axis=1)
        return pd.Series(list(keys))

    return sig_udf(F.col(vec_col))


def cosine_topk_lsh(
    candidates: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    n_tables: int = 3,
    seed: int = 11,
) -> DataFrame:
    """Approximate cosine top-k: multi-table hyperplane LSH buckets, exact
    rerank within colliding buckets. Output schema matches brute force."""

    def with_sigs(df: DataFrame, prefix: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            F.col(vec_col).alias(f"{prefix}_v"),
            F.posexplode(
                hyperplane_signatures_col(vec_col, n_planes, n_tables, seed)
            ).alias("table", "key"),
        )

    c = with_sigs(candidates, "cand")
    p = with_sigs(probes, "probe")
    dot = F.aggregate(
        F.zip_with("probe_v", "cand_v", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda col: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(col, lambda x: x.cast("double") * x.cast("double")), F.lit(0.0), lambda a, x: a + x)
    )
    pairs = (
        c.join(F.broadcast(p), ["table", "key"])
        .filter(F.col("probe_id") != F.col("cand_id"))
        .dropDuplicates(["probe_id", "cand_id"])
        .withColumn("cosine", dot / (norm(F.col("probe_v")) * norm(F.col("cand_v"))))
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), F.col("cand_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "cand_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def ivf_assignments_col(
    vec_col: str, cent_ids: np.ndarray, cent_q: np.ndarray, nprobe: int
):
    """array<long> of the nprobe nearest centroid ids (ascending exact
    integer quantized L2; ties by centroid id). One matmul per batch."""
    sq_c = (cent_q * cent_q).sum(axis=1)

    @F.pandas_udf("array<long>")
    def assign(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype=object)
        mat = np.array(list(vecs), dtype=np.float64)
        q = np.floor(mat * QUANT).astype(np.int64)
        d = (q * q).sum(axis=1, keepdims=True) - 2 * (q @ cent_q.T) + sq_c[None, :]
        # stable argsort + id-ascending columns == tie-break by centroid id
        order = np.argsort(d, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(cent_ids[order]))

    return assign(F.col(vec_col))


def kmeans_centroids(
    df: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iter: int = 5,
    seed: int = 29,
) -> tuple[np.ndarray, np.ndarray]:
    """Seeded Lloyd's k-means over a vector column, as DataFrame passes.

    Production coarse quantizer for IVF (the deterministic id-based
    stand-in remains the oracle-gate path). Scale shape: each iteration is
    ONE distributed pass — a mapInPandas stage computes per-Arrow-batch
    partial (cluster, sum, count) rows against the broadcast centroid
    matrix (k x dim, tiny), and only those partials (O(batches * k) rows)
    reach the driver for the numpy reduce. No shuffle of the vectors.

    Deterministic: init picks the n_centroids rows with the smallest
    xxhash64(id, seed) — a seeded uniform draw computed as a distributed
    top-k (TakeOrdered, no global sort) — assignment ties break to the
    lowest cluster index, and empty clusters keep their previous centroid.

    Returns (cent_ids = arange(n_centroids), cent_mat float64 (k, dim)).
    """
    seed_rows = (
        df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        .withColumn("__h", F.xxhash64(F.col("__id"), F.lit(seed)))
        .orderBy("__h", "__id")
        .limit(n_centroids)
        .collect()
    )
    if len(seed_rows) < n_centroids:
        raise ValueError(
            f"need >= {n_centroids} rows to seed k-means, got {len(seed_rows)}"
        )
    cent = np.array([r["__v"] for r in seed_rows], dtype=np.float64)
    vecs = df.select(F.col(vec_col).alias("__v"))

    for _ in range(n_iter):
        c = cent  # bind current value into the closure

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                mat = np.array(list(pdf["__v"]), dtype=np.float64)
                d = (
                    (mat * mat).sum(axis=1, keepdims=True)
                    - 2.0 * (mat @ c.T)
                    + (c * c).sum(axis=1)[None, :]
                )
                cid = np.argmin(d, axis=1)  # first occurrence == lowest index
                rows = []
                for ci in np.unique(cid):
                    sel = mat[cid == ci]
                    rows.append((int(ci), sel.sum(axis=0).tolist(), int(sel.shape[0])))
                yield pd.DataFrame(rows, columns=["cid", "s", "n"])

        agg = vecs.mapInPandas(partials, "cid int, s array<double>, n long").collect()
        sums = np.zeros_like(cent)
        counts = np.zeros(len(cent), dtype=np.int64)
        for r in agg:
            sums[r["cid"]] += np.asarray(r["s"])
            counts[r["cid"]] += r["n"]
        nonempty = counts > 0
        new_cent = cent.copy()  # empty clusters keep their centroid
        new_cent[nonempty] = sums[nonempty] / counts[nonempty, None]
        if np.allclose(new_cent, cent, rtol=0, atol=1e-12):
            cent = new_cent
            break
        cent = new_cent
    return np.arange(n_centroids, dtype=np.int64), cent


def kmeans_centroids_exact(
    df: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iter: int = 3,
    hash_mult: int = 2654435761,
    hash_mod: int = 1000003,
) -> tuple[np.ndarray, np.ndarray]:
    """Lloyd's k-means entirely in EXACT integer arithmetic, so the run is
    bit-reproducible in plain SQL (the q36 driver gate replays it in
    DuckDB, iteration by iteration).

    Same distributed shape as :func:`kmeans_centroids` (one partial-sum
    mapInPandas pass per iteration, no vector shuffle) with three exactness
    substitutions:

    * vectors are quantized ONCE: ``floor(float64(v) * QUANT)`` int64 —
      the same quantization every oracle here uses;
    * distances are integer L2 computed via float64 matmul, exact because
      every term is < 2**48 < 2**53;
    * centroid update is element-wise FLOOR DIVISION ``sum // count``
      (empty clusters keep their centroid), expressible in SQL as
      ``(s - ((s % n + n) % n)) // n``.

    Seeding is a portable multiplicative hash — the ``n_centroids`` rows
    with the smallest ``((id * hash_mult) % hash_mod, id)`` — instead of
    xxhash64 (which DuckDB lacks). Returns (cent_ids = arange(k), cent_q
    int64 (k, dim)) directly in quantized space: ready for
    ivf_assignments_col with NO further quantization.
    """
    seed_rows = (
        df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        .withColumn("__h", (F.col("__id") * F.lit(hash_mult)) % F.lit(hash_mod))
        .orderBy("__h", "__id")
        .limit(n_centroids)
        .collect()
    )
    if len(seed_rows) < n_centroids:
        raise ValueError(
            f"need >= {n_centroids} rows to seed k-means, got {len(seed_rows)}"
        )
    cent = np.floor(
        np.array([r["__v"] for r in seed_rows], dtype=np.float64) * QUANT
    ).astype(np.int64)
    vecs = df.select(F.col(vec_col).alias("__v"))

    for _ in range(n_iter):
        c = cent.astype(np.float64)  # exact: |values| < 2**21

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                q = np.floor(
                    np.array(list(pdf["__v"]), dtype=np.float64) * QUANT
                )
                d = (
                    (q * q).sum(axis=1, keepdims=True)
                    - 2.0 * (q @ c.T)
                    + (c * c).sum(axis=1)[None, :]
                )
                cid = np.argmin(d, axis=1)  # first occurrence == lowest index
                qi = q.astype(np.int64)
                rows = []
                for ci in np.unique(cid):
                    sel = qi[cid == ci]
                    rows.append((int(ci), sel.sum(axis=0).tolist(), int(sel.shape[0])))
                yield pd.DataFrame(rows, columns=["cid", "s", "n"])

        agg = vecs.mapInPandas(partials, "cid int, s array<long>, n long").collect()
        sums = np.zeros_like(cent)
        counts = np.zeros(len(cent), dtype=np.int64)
        for r in agg:
            sums[r["cid"]] += np.asarray(r["s"], dtype=np.int64)
            counts[r["cid"]] += r["n"]
        nonempty = counts > 0
        new_cent = cent.copy()  # empty clusters keep their centroid
        new_cent[nonempty] = np.floor_divide(
            sums[nonempty], counts[nonempty, None]
        )
        if np.array_equal(new_cent, cent):
            break  # fixed point: further (SQL) iterations are no-ops
        cent = new_cent
    return np.arange(n_centroids, dtype=np.int64), cent


def cosine_topk_ivf(
    candidates: DataFrame,
    probes: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: str = "by_id",
    kmeans_iter: int = 5,
    kmeans_seed: int = 29,
) -> DataFrame:
    """IVF ANN: coarse quantizer buckets + exact cosine rerank.

    centroids="by_id" (the oracle-gate path): the centroid set is
    DETERMINISTIC — the rows with id < n_centroids (quantized like the
    signatures) — so assignment is an exact integer argmin reproducible in
    plain SQL. centroids="kmeans": seeded Lloyd's iterations
    (kmeans_centroids) — the production quantizer; recall vs brute force
    at equal nprobe is asserted in tests. Every other stage (broadcast
    assignment matmul, inverted-list bucket join, exact rerank) is
    identical between the two. Candidates land in their single nearest
    list; probes search their nprobe nearest lists. Output schema
    matches the brute-force/LSH paths: (probe_id, cand_id, cosine, rank).
    """
    if centroids == "kmeans":
        cent_ids, cent_mat = kmeans_centroids(
            candidates, n_centroids, id_col, vec_col, kmeans_iter, kmeans_seed
        )
        cent_q = np.floor(cent_mat * QUANT).astype(np.int64)
    elif centroids == "kmeans_exact":
        # integer-space Lloyd's (already quantized — see
        # kmeans_centroids_exact): the SQL-replayable production quantizer
        cent_ids, cent_q = kmeans_centroids_exact(
            candidates, n_centroids, id_col, vec_col, kmeans_iter
        )
    elif centroids == "by_id":
        cent_rows = sorted(
            candidates.filter(F.col(id_col) < n_centroids).select(id_col, vec_col).collect(),
            key=lambda r: r[id_col],
        )
        cent_ids = np.array([r[id_col] for r in cent_rows], dtype=np.int64)
        cent_q = np.floor(
            np.array([r[vec_col] for r in cent_rows], dtype=np.float64) * QUANT
        ).astype(np.int64)
    else:
        raise ValueError(
            f"centroids must be 'by_id', 'kmeans' or 'kmeans_exact', got {centroids!r}"
        )

    c = candidates.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cand_v"),
        F.element_at(ivf_assignments_col(vec_col, cent_ids, cent_q, 1), 1).alias("cid"),
    )
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("probe_v"),
        F.explode(ivf_assignments_col(vec_col, cent_ids, cent_q, nprobe)).alias("cid"),
    )
    dot = F.aggregate(
        F.zip_with("probe_v", "cand_v", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda col: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(col, lambda x: x.cast("double") * x.cast("double")), F.lit(0.0), lambda a, x: a + x)
    )
    pairs = (
        c.join(F.broadcast(p), "cid")
        .filter(F.col("probe_id") != F.col("cand_id"))
        .dropDuplicates(["probe_id", "cand_id"])
        .withColumn("cosine", dot / (norm(F.col("probe_v")) * norm(F.col("cand_v"))))
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), F.col("cand_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "cand_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.98,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 13,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup tier 4): LSH-bucketed
    self-join, exact cosine verify >= threshold."""
    e = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.posexplode(
            hyperplane_signatures_col(vec_col, n_planes, n_tables, seed)
        ).alias("table", "key"),
    )
    a = e.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"), "table", "key")
    b = e.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"), "table", "key")
    dot = F.aggregate(
        F.zip_with("v_a", "v_b", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda col: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(col, lambda x: x.cast("double") * x.cast("double")), F.lit(0.0), lambda a, x: a + x)
    )
    return (
        a.join(b, ["table", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("cosine", dot / (norm(F.col("v_a")) * norm(F.col("v_b"))))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )
