import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmalyzer_spark.operators.dedup import (
    connected_components_greedy,
    exact_dedup,
    minhash_dedup,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_pairs,
)
from osmalyzer_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    embedding_near_dup_pairs,
)

VOCAB = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi omicron pi rho sigma tau".split()


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(5)
    rows = []
    base_docs = []
    for i in range(40):
        words = [VOCAB[j] for j in rng.integers(0, len(VOCAB), 30)]
        base_docs.append(words)
        rows.append((i, " ".join(words)))
    # near-duplicates: copy docs 0-9 with 2 word substitutions
    for i in range(10):
        words = list(base_docs[i])
        words[3] = "REPL1"
        words[17] = "REPL2"
        rows.append((100 + i, " ".join(words)))
    # exact duplicate of doc 20
    rows.append((200, rows[20][1]))
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def _true_jaccard_pairs(rows, threshold):
    def toks(t):
        return set(t.split())

    out = {}
    for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
        a, b = toks(ta), toks(tb)
        j = len(a & b) / len(a | b)
        if j >= threshold:
            out[(min(ia, ib), max(ia, ib))] = j
    return out


def test_exact_dedup(spark, docs):
    groups = exact_dedup(docs, "doc_id", "text", normalized=False).collect()
    assert len(groups) == 1
    assert groups[0]["n_docs"] == 2
    assert groups[0]["keep_id"] == 20
    assert groups[0]["members"] == [20, 200]


def test_ngram_jaccard_exact_vs_oracle(spark, docs):
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    want = _true_jaccard_pairs(rows, 0.6)
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", 0.6).collect()
    }
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-3)


def test_minhash_finds_near_dups(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_dedup(docs, "doc_id", "text", threshold=0.5, num_hashes=128, bands=32).collect()
    }
    # the 10 planted near-dups (jaccard ~0.87 on 3-shingles lower) must be found
    for i in range(10):
        assert (i, 100 + i) in pairs, f"missing planted near-dup {(i, 100+i)}"
    # exact dup found
    assert (20, 200) in pairs
    # estimated jaccard for the exact dup is 1.0
    est = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_dedup(docs, "doc_id", "text", threshold=0.5, num_hashes=128, bands=32).collect()
    }
    assert est[(20, 200)] == 1.0


def test_minhash_signature_estimates_jaccard(spark, docs):
    """MinHash estimate within ~0.18 of true shingle jaccard (128 hashes)."""
    import zlib

    sigs = {r["id"]: np.array(r["sig"]) for r in minhash_signatures(docs, "doc_id", "text", 128, 3).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}

    def shingles(t):
        toks = t.split()
        return {zlib.crc32(" ".join(toks[i : i + 3]).encode()) for i in range(len(toks) - 2)}

    rng = np.random.default_rng(3)
    ids = list(texts)
    for _ in range(30):
        a, b = rng.choice(ids, 2, replace=False)
        sa, sb = shingles(texts[a]), shingles(texts[b])
        true_j = len(sa & sb) / len(sa | sb)
        est_j = float((sigs[a] == sigs[b]).mean())
        assert abs(true_j - est_j) < 0.18


def test_simhash_identical_and_near(spark, docs):
    fps = {r["id"]: r["simhash"] for r in simhash_fingerprints(docs, "doc_id", "text").collect()}
    assert fps[20] == fps[200]  # identical text -> identical fingerprint
    pairs = simhash_near_pairs(
        spark.createDataFrame([(k, v) for k, v in fps.items()], "id long, simhash long"),
        max_hamming=3,
    )
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert got[(20, 200)] == 0
    # verify against brute force hamming <= 3
    want = set()
    ids = list(fps)
    for a, b in itertools.combinations(sorted(ids), 2):
        if bin(fps[a] ^ fps[b]).count("1") <= 3:
            want.add((a, b))
    assert set(got) == want


def test_connected_components(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)], "id_a long, id_b long"
    )
    comp = {r["id"]: r["component"] for r in connected_components_greedy(pairs).collect()}
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10
    assert comp[20] == comp[21] == comp[22] == comp[23] == 20


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(9)
    base = rng.normal(size=(60, 16))
    rows = [(i, [float(x) for x in base[i]], 0) for i in range(60)]
    # planted near-dups: 3 vectors with tiny noise
    for j, i in enumerate([0, 1, 2]):
        v = base[i] + rng.normal(scale=0.01, size=16)
        rows.append((300 + j, [float(x) for x in v], 1))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int").cache()


def test_cosine_topk_bruteforce_vs_numpy(spark, emb):
    probes = emb.filter(F.col("vec_id") < 5)
    got = cosine_topk_bruteforce(emb, probes, k=4).collect()
    rows = emb.collect()
    mat = np.array([r["embedding"] for r in rows])
    ids = np.array([r["vec_id"] for r in rows])
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    by_probe = {}
    for r in got:
        by_probe.setdefault(r["probe_id"], []).append((r["rank"], r["cand_id"], r["cosine"]))
    for pid in range(5):
        pv = matn[ids == pid][0]
        cos = matn @ pv
        cos[ids == pid] = -np.inf
        order = sorted(zip(-cos, ids), key=lambda t: (t[0], t[1]))[:4]
        want = [int(i) for _, i in order]
        have = [c for _, c, _ in sorted(by_probe[pid])]
        assert have == want


def test_cosine_lsh_recall(spark, emb):
    """LSH must recover the planted near-identical neighbor as top-1."""
    probes = emb.filter(F.col("vec_id").isin([0, 1, 2]))
    got = cosine_topk_lsh(emb, probes, k=2, n_planes=8, n_tables=6)
    top1 = {r["probe_id"]: r["cand_id"] for r in got.collect() if r["rank"] == 1}
    assert top1 == {0: 300, 1: 301, 2: 302}


def test_embedding_near_dup(spark, emb):
    pairs = {(r["id_a"], r["id_b"]) for r in embedding_near_dup_pairs(emb, threshold=0.99).collect()}
    assert {(0, 300), (1, 301), (2, 302)} <= pairs


def test_clean_corpus_pipeline(spark, docs):
    from osmalyzer_spark.plans.pipeline import clean_corpus

    # add a junk doc that fails the quality gate
    junk = spark.createDataFrame([(999, "x")], "doc_id long, text string")
    corpus = docs.union(junk)
    cleaned, report = clean_corpus(
        spark, corpus, min_quality=0.6, neardup_threshold=0.5
    )
    assert report.n_input == 52
    assert report.n_after_quality == 51          # junk dropped
    assert report.n_after_exact == 50            # doc 200 == doc 20 dropped
    # the 10 planted near-dups collapse (keep lower id of each pair)
    assert report.n_after_neardup == 40
    ids = {r["doc_id"] for r in cleaned.select("doc_id").collect()}
    assert 20 in ids and 200 not in ids
    for i in range(10):
        assert i in ids and (100 + i) not in ids


def test_cosine_ivf_recall(spark, emb):
    """IVF with enough probes must recover the planted near-identical
    neighbor as top-1 (its vector lands in the same centroid list)."""
    from osmalyzer_spark.operators.similarity import cosine_topk_ivf

    probes = emb.filter(F.col("vec_id").isin([0, 1, 2]))
    got = cosine_topk_ivf(emb, probes, k=2, n_centroids=8, nprobe=8)
    top1 = {r["probe_id"]: r["cand_id"] for r in got.collect() if r["rank"] == 1}
    assert top1 == {0: 300, 1: 301, 2: 302}


def test_cosine_ivf_subset_of_bruteforce(spark, emb):
    """Every IVF hit must agree in cosine with the exact ranking source."""
    from osmalyzer_spark.operators.similarity import cosine_topk_ivf

    probes = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["probe_id"], r["cand_id"]): r["cosine"]
        for r in cosine_topk_bruteforce(emb, probes, k=64).collect()
    }
    ivf = cosine_topk_ivf(emb, probes, k=3, n_centroids=8, nprobe=2).collect()
    for r in ivf:
        assert exact[(r["probe_id"], r["cand_id"])] == pytest.approx(r["cosine"], abs=1e-6)


def test_kmeans_centroids_deterministic_and_converging(spark, emb):
    from osmalyzer_spark.operators.similarity import kmeans_centroids

    ids1, c1 = kmeans_centroids(emb, 8, n_iter=5, seed=29)
    ids2, c2 = kmeans_centroids(emb, 8, n_iter=5, seed=29)
    assert (ids1 == ids2).all() and np.allclose(c1, c2)  # seeded == repeatable
    # centroids are means of their assigned vectors: the within-cluster
    # sum of squares must not exceed the init assignment's
    rows = emb.collect()
    mat = np.array([r["embedding"] for r in rows])

    def wcss(cent):
        d = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        return d.min(axis=1).sum()

    _, c0 = kmeans_centroids(emb, 8, n_iter=0, seed=29)
    assert wcss(c1) <= wcss(c0) + 1e-9


def test_kmeans_ivf_recall_vs_deterministic(spark, emb):
    """At equal nprobe, the k-means quantizer's planted-neighbor recall
    must match or beat the deterministic id-based stand-in (same pipeline
    otherwise) — the VERDICT r2 acceptance for the production path."""
    from osmalyzer_spark.operators.similarity import cosine_topk_ivf

    probes = emb.filter(F.col("vec_id").isin([0, 1, 2]))

    def top1(centroids):
        got = cosine_topk_ivf(
            emb, probes, k=2, n_centroids=8, nprobe=2, centroids=centroids
        ).collect()
        want = {0: 300, 1: 301, 2: 302}
        return sum(
            1 for r in got if r["rank"] == 1 and want[r["probe_id"]] == r["cand_id"]
        )

    km, by_id = top1("kmeans"), top1("by_id")
    assert km == 3  # near-identical vectors share a Voronoi cell
    assert km >= by_id


def test_kmeans_ivf_cosines_exact(spark, emb):
    """k-means changes WHICH pairs are searched, never the scores."""
    from osmalyzer_spark.operators.similarity import cosine_topk_ivf

    probes = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["probe_id"], r["cand_id"]): r["cosine"]
        for r in cosine_topk_bruteforce(emb, probes, k=64).collect()
    }
    for r in cosine_topk_ivf(
        emb, probes, k=3, n_centroids=8, nprobe=2, centroids="kmeans"
    ).collect():
        assert exact[(r["probe_id"], r["cand_id"])] == pytest.approx(
            r["cosine"], abs=1e-6
        )


def test_kmeans_exact_integer_space(spark, emb):
    """The SQL-replayable exact-arithmetic Lloyd's (q36's quantizer):
    deterministic, integer-valued, and its numpy oracle reproduces it."""
    from osmalyzer_spark.operators.similarity import (
        QUANT,
        kmeans_centroids_exact,
    )

    ids1, c1 = kmeans_centroids_exact(emb, 8, n_iter=3)
    ids2, c2 = kmeans_centroids_exact(emb, 8, n_iter=3)
    assert np.array_equal(c1, c2) and c1.dtype == np.int64

    # single-process oracle: same seeding, same integer Lloyd's
    rows = emb.select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: ((r["vec_id"] * 2654435761) % 1000003, r["vec_id"]))
    q = np.floor(
        np.array([r["embedding"] for r in rows], dtype=np.float64) * QUANT
    ).astype(np.int64)
    cent = q[:8].copy()
    for _ in range(3):
        cf, qf = cent.astype(np.float64), q.astype(np.float64)
        d = (qf * qf).sum(1, keepdims=True) - 2 * (qf @ cf.T) + (cf * cf).sum(1)
        cid = np.argmin(d, axis=1)
        new = cent.copy()
        for ci in range(8):
            sel = q[cid == ci]
            if len(sel):
                new[ci] = np.floor_divide(sel.sum(axis=0), len(sel))
        if np.array_equal(new, cent):
            break
        cent = new
    assert np.array_equal(c1, cent)


def test_kmeans_exact_ivf_recall(spark, emb):
    """kmeans_exact end-to-end: planted neighbors recovered as top-1."""
    from osmalyzer_spark.operators.similarity import cosine_topk_ivf

    probes = emb.filter(F.col("vec_id").isin([0, 1, 2]))
    got = cosine_topk_ivf(
        emb, probes, k=2, n_centroids=8, nprobe=2, centroids="kmeans_exact"
    ).collect()
    top1 = {r["probe_id"]: r["cand_id"] for r in got if r["rank"] == 1}
    assert top1 == {0: 300, 1: 301, 2: 302}


def test_md5_batch_bit_parity_with_hashlib():
    import hashlib
    import os
    import random

    from osmalyzer_spark.functions.md5 import md5_lower64_batch, md5_lower64_ranges

    random.seed(3)
    msgs = [b"", b"a", "šis ir tests".encode(), b"x" * 55, b"y" * 56, b"z" * 130]
    msgs += [os.urandom(random.randint(0, 90)) for _ in range(300)]
    want = np.array(
        [int.from_bytes(hashlib.md5(m).digest()[8:], "little") for m in msgs],
        dtype=np.uint64,
    )
    assert (md5_lower64_batch(msgs) == want).all()
    # ranges API over one concatenated buffer
    flat = np.frombuffer(b"".join(msgs), dtype=np.uint8)
    lens = np.array([len(m) for m in msgs], dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lens[:-1])))
    assert (md5_lower64_ranges(flat, starts, lens) == want).all()
    assert len(md5_lower64_batch([])) == 0


def test_batch_shingle_spans_match_single_doc_path():
    from osmalyzer_spark.functions.md5 import md5_lower64_ranges
    from osmalyzer_spark.operators.dedup import _batch_shingle_spans, _shingle_hashes

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "",
        "one",
        "divi vārdi",
        "a  b   c",  # multi-space: empties dropped
        "ū ī š ķ ģ",  # multi-byte UTF-8 tokens
    ]
    for k in (1, 2, 3, 5):
        flat, starts, lens, counts = _batch_shingle_spans(texts, k)
        hashes = md5_lower64_ranges(flat, starts, lens)
        pos = 0
        for t, c in zip(texts, counts):
            got = np.unique(hashes[pos : pos + c])
            pos += c
            assert (got == _shingle_hashes(t, k)).all(), (t, k)


def test_star_cc_matches_greedy_on_random_graphs(spark):
    from osmalyzer_spark.operators.dedup import (
        connected_components_greedy,
        connected_components_star,
    )

    rng = np.random.default_rng(17)
    for trial in range(3):
        n, m = 60, 80
        edges = [(int(rng.integers(0, n)), int(rng.integers(0, n))) for _ in range(m)]
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        greedy = {(r["id"], r["component"])
                  for r in connected_components_greedy(df, max_iter=64).collect()}
        star = {(r["id"], r["component"])
                for r in connected_components_star(
                    df, local_edge_threshold=0).collect()}
        assert star == greedy, f"trial {trial} (distributed)"
        local = {(r["id"], r["component"])
                 for r in connected_components_star(df).collect()}
        assert local == greedy, f"trial {trial} (driver-local fast path)"


def test_star_cc_long_chain_logarithmic_rounds(spark):
    """A 200-node path: min-label propagation needs ~199 rounds (raises at
    max_iter=20); the star algorithm converges in O(log n)."""
    import pytest as _pytest

    from osmalyzer_spark.operators.dedup import (
        connected_components_greedy,
        connected_components_star,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(199)], "id_a long, id_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components_greedy(chain, max_iter=20)
    labels, rounds = connected_components_star(
        chain, with_rounds=True, local_edge_threshold=0
    )
    assert rounds <= 12, rounds
    got = {(r["id"], r["component"]) for r in labels.collect()}
    assert got == {(i, 0) for i in range(200)}


def test_star_cc_local_fast_path_chain_and_strings(spark):
    """Driver-local CC path: pointer-jumping converges on a long chain,
    and string ids canonicalize to the lexicographic min exactly like
    the distributed path's F.least."""
    from osmalyzer_spark.operators.dedup import connected_components_star

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(199)], "id_a long, id_b long"
    )
    got = {
        (r["id"], r["component"])
        for r in connected_components_star(chain).collect()
    }
    assert got == {(i, 0) for i in range(200)}

    s = spark.createDataFrame(
        [("b", "ab"), ("ab", "z"), ("q", "zz")], "id_a string, id_b string"
    )
    got = {
        (r["id"], r["component"])
        for r in connected_components_star(s).collect()
    }
    assert got == {
        ("ab", "ab"), ("b", "ab"), ("z", "ab"), ("q", "q"), ("zz", "q")
    }


def test_star_cc_local_empty_edges(spark):
    from osmalyzer_spark.operators.dedup import connected_components_star

    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components_star(empty).count() == 0
