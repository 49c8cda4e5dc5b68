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


def hyperplane_signature_expr(vec_col: str, n_planes: int, dim: int, seed: int, table: int):
    """Native-expression random-hyperplane LSH signature: sign bits of
    dot(v, plane_j) packed into a long. Planes are +-1 Rademacher
    (deterministic from seed), so each dot product is a signed sum of
    vector components — pure zip_with/aggregate, no UDF."""
    rng = np.random.default_rng(seed + 1000 * table)
    planes = rng.choice([-1.0, 1.0], size=(n_planes, dim))
    sig = F.lit(0).cast("long")
    for j in range(n_planes):
        coeffs = F.array(*[F.lit(float(c)) for c in planes[j]])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), coeffs, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(dot > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


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
    dim = len(candidates.select(vec_col).first()[vec_col])

    def with_sigs(df: DataFrame, prefix: str) -> DataFrame:
        sigs = F.array(
            *[
                F.struct(
                    F.lit(t).alias("table"),
                    hyperplane_signature_expr(vec_col, n_planes, dim, seed, t).alias("key"),
                )
                for t in range(n_tables)
            ]
        )
        return df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            F.col(vec_col).alias(f"{prefix}_v"),
            F.explode(sigs).alias("sig"),
        ).select(f"{prefix}_id", f"{prefix}_v", F.col("sig.table").alias("table"), F.col("sig.key").alias("key"))

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
    dim = len(df.select(vec_col).first()[vec_col])
    sigs = F.array(
        *[
            F.struct(
                F.lit(t).alias("table"),
                hyperplane_signature_expr(vec_col, n_planes, dim, seed, t).alias("key"),
            )
            for t in range(n_tables)
        ]
    )
    e = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"), F.explode(sigs).alias("sig")).select(
        "id", "v", F.col("sig.table").alias("table"), F.col("sig.key").alias("key")
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
