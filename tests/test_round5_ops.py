"""Independent ground-truth tests for round-5 operators: numpy or
hand-computed answers, deliberately NOT the shared Spark/DuckDB oracle
formulas — when both engines share a formula, the sweep cannot catch a
formula bug (the round-3 review's blind spot, closed per-round since)."""

from __future__ import annotations

import hashlib

import numpy as np

import metadata_extractors_api_spark as mdx


def test_matryoshka_audit_matches_numpy(spark, sf_dir):
    """Full/truncated top-5 overlap recomputed with plain numpy float
    cosine (not the scaled-int64 shared arithmetic). Float vs
    scaled-int ranking can only diverge on near-ties; the fixture has
    none at top-5 (asserted implicitly by equality)."""
    from metadata_extractors_api_spark.operators.llm import MRL_DIM

    e = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in e])
    m = np.array([r["embedding"] for r in e], dtype=np.float64)
    order = np.argsort(ids)
    ids, m = ids[order], m[order]

    def topk(mat, q_idx, k=5):
        q = mat[q_idx]
        sims = mat @ q / (
            np.linalg.norm(mat, axis=1) * np.linalg.norm(q) + 1e-30
        )
        sims[q_idx] = -np.inf
        # tiebreak by vec_id ascending on equal sims: argsort on
        # (-sim, id) pairs
        key = np.lexsort((ids, -sims))
        return [int(ids[i]) for i in key[:k]]

    got = {
        r["qid"]: r
        for r in mdx.QUERIES["embedding_matryoshka_audit"](
            spark, sf_dir
        ).collect()
    }
    t = m[:, :MRL_DIM]
    for qid in got:
        qi = int(np.where(ids == qid)[0][0])
        full5, trunc5 = topk(m, qi), topk(t, qi)
        assert got[qid]["top1_full"] == full5[0], qid
        assert got[qid]["top1_trunc"] == trunc5[0], qid
        assert got[qid]["n_overlap"] == len(set(full5) & set(trunc5)), qid


def test_recall_curve_matches_numpy_brute_force(spark, sf_dir):
    """IVF recall curve recomputed end to end in numpy: centroid
    assignment, probe ranking, per-nprobe candidate top-5, recall vs
    exact top-5 — an independent implementation of the whole pipeline."""
    from metadata_extractors_api_spark.operators.llm import (
        CENTROIDS,
        RECALL_CURVE_NPROBES,
        SCALE,
    )

    e = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in e])
    m = np.array([r["embedding"] for r in e], dtype=np.float64)
    cen = np.array(CENTROIDS, dtype=np.float64)

    def dot_scaled_np(a, b):
        return int(np.floor(a * b * SCALE).astype(np.int64).sum())

    # exact scaled-int centroid assignment, first-max-wins like the SQL
    assign = np.empty(len(ids), dtype=np.int64)
    for i in range(len(ids)):
        dots = [dot_scaled_np(m[i], c) for c in cen]
        assign[i] = int(np.argmax(dots))  # argmax returns FIRST max
    qi = int(np.where(ids == 0)[0][0])
    qdots = [dot_scaled_np(m[qi], c) for c in cen]
    order = sorted(range(len(cen)), key=lambda k: (-qdots[k], k))

    sims = m @ m[qi] / (
        np.linalg.norm(m, axis=1) * np.linalg.norm(m[qi]) + 1e-30
    )
    mask = ids != 0
    key = np.lexsort((ids, -sims))
    key = [i for i in key if mask[i]]
    brute5 = {int(ids[i]) for i in key[:5]}

    got = {
        r["nprobe"]: r
        for r in mdx.QUERIES["sim_ann_recall_curve"](spark, sf_dir).collect()
    }
    assert sorted(got) == RECALL_CURVE_NPROBES
    for p in RECALL_CURVE_NPROBES:
        probe = set(order[:p])
        cand = [i for i in key if int(assign[i]) in probe]
        top5 = {int(ids[i]) for i in cand[:5]}
        assert got[p]["n_candidates"] == len(cand), p
        assert got[p]["n_hits"] == len(top5 & brute5), p


def test_dedup_paragraphs_hand_corpus(spark, tmp_path_factory):
    """Hand-computed tiny corpus: doc0 = blocks [A, B], doc1 = [B, A],
    doc2 = [A, C] (A, B, C = distinct 10-token blocks). First
    occurrences: A@ (0,0), B@(0,1), C@(2,1); duplicated blocks: doc1
    both (B and A seen before), doc2 block A."""
    A = " ".join(["aa"] * 10)
    B = " ".join(["bb"] * 10)
    C = " ".join(["cc"] * 10)
    d = str(tmp_path_factory.mktemp("para"))
    spark.createDataFrame(
        [(0, f"{A} {B}"), (1, f"{B} {A}"), (2, f"{A} {C}")],
        "doc_id long, text string",
    ).write.parquet(f"{d}/documents.parquet")
    got = {
        r["doc_id"]: (r["n_paras"], r["n_dup_paras"], r["dup_frac_e6"])
        for r in mdx.QUERIES["dedup_paragraphs"](spark, d).collect()
    }
    assert got == {
        0: (2, 0, 0),
        1: (2, 2, 1_000_000),
        2: (2, 1, 500_000),
    }


def test_reservoir_bottomk_matches_python_md5(spark, sf_dir):
    """Bottom-k draw recomputed with Python's hashlib over the raw
    keys — an independent md5 implementation and an independent sort."""
    from metadata_extractors_api_spark.operators.training import RESERVOIR_K

    keys = [
        r["o_orderkey"]
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey")
        .collect()
    ]
    want = sorted(
        (hashlib.md5(str(k).encode()).hexdigest(), k) for k in keys
    )[:RESERVOIR_K]
    got = [
        (r["hk"], r["o_orderkey"])
        for r in mdx.QUERIES["sample_reservoir_bottomk"](spark, sf_dir)
        .orderBy("hk", "o_orderkey")
        .collect()
    ]
    assert got == want


def test_multimodal_gradient_matches_direct_numpy(spark, sf_dir):
    """Gradient sums recomputed from the PAYLOAD BYTES directly (skip
    the decoder entirely): regenerate each payload, slice the raster
    region by hand-computed header length, reshape, diff."""
    from metadata_extractors_api_spark.operators.llm import _ppm_payload

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("doc_id < 10")
        .select("doc_id", "text")
        .collect()
    )
    got = {
        r["doc_id"]: (r["grad_r"], r["grad_g"], r["grad_b"])
        for r in mdx.QUERIES["multimodal_gradient_stats"](spark, sf_dir)
        .filter("doc_id < 10")
        .collect()
    }
    for r in docs:
        payload = _ppm_payload(r["text"])
        header_end = payload.index(b"255\n") + 4
        L = len(r["text"])
        w = 64 + (13 * L) % 321
        h = 64 + (29 * L) % 321
        px = np.frombuffer(payload, np.uint8, offset=header_end).reshape(
            h, w, 3
        ).astype(np.int64)
        g = np.abs(np.diff(px, axis=1)).sum(axis=(0, 1))
        assert got[r["doc_id"]] == (int(g[0]), int(g[1]), int(g[2]))


def test_ols_two_features_matches_numpy_lstsq(spark, sf_dir):
    """Multiple-regression coefficients recomputed with numpy's QR
    least squares over the raw per-customer rows — an entirely
    different solver than the Cramer closed form."""
    import pandas as pd
    from pyspark.sql import functions as F
    from metadata_extractors_api_spark.catalog import load

    o = load(spark, sf_dir, "orders")
    pc = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("y"),
        F.count(F.lit(1)).alias("x2"),
    )
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("x1"),
    )
    pdf = (
        c.join(pc, c.c_custkey == pc.o_custkey)
        .select("c_nationkey", "x1", "x2", "y")
        .toPandas()
    )
    got = {
        r["nation"]: r
        for r in mdx.QUERIES["agg_ols_two_features"](spark, sf_dir).collect()
    }
    compared = 0
    for nation, g in pdf.groupby("c_nationkey"):
        X = np.column_stack(
            [np.ones(len(g)), g["x1"].to_numpy(float), g["x2"].to_numpy(float)]
        )
        y = g["y"].to_numpy(float)
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        if nation not in got:
            # A skipped nation must be GENUINELY degenerate under the
            # query's own guard (singular Gram matrix or zero outcome
            # variance), recomputed here from the raw rows — otherwise
            # a guard bug that drops healthy groups would pass silently.
            gram = X.T @ X
            gram_det = float(np.linalg.det(gram))
            diag_scale = float(np.prod(np.diag(gram))) or 1.0
            sst = float(np.sum((y - y.mean()) ** 2))
            assert gram_det <= 1e-8 * diag_scale or sst <= 0.0, (
                f"nation {nation} missing from query output but "
                f"non-degenerate (det={gram_det}, sst={sst})"
            )
            continue
        compared += 1
        r = got[nation]
        assert abs(r["intercept"] - beta[0]) < max(1e-4 * abs(beta[0]), 1e-3)
        assert abs(r["beta_acctbal"] - beta[1]) < max(1e-4 * abs(beta[1]), 1e-3)
        assert abs(r["beta_n_orders"] - beta[2]) < max(1e-4 * abs(beta[2]), 1e-3)
    # The TPC-H fixture has 25 nations with varied balances/counts: the
    # overwhelming majority must survive the guard and be compared.
    assert compared >= 20, f"only {compared} nations compared"


def test_ks_two_sample_matches_numpy_ecdf(spark, sf_dir):
    """KS statistic recomputed with a direct numpy ECDF construction
    over the raw cents values — independent of the cross-multiplied
    prefix-sum form."""
    from pyspark.sql import functions as F
    from metadata_extractors_api_spark.catalog import load

    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
            (F.col("o_orderpriority") == "1-URGENT").alias("a"),
        )
        .collect()
    )
    xa = np.sort(np.array([r["c"] for r in o if r["a"]], dtype=np.int64))
    xb = np.sort(np.array([r["c"] for r in o if not r["a"]], dtype=np.int64))
    grid = np.unique(np.concatenate([xa, xb]))
    fa = np.searchsorted(xa, grid, side="right")
    fb = np.searchsorted(xb, grid, side="right")
    ks_num = int(np.max(np.abs(fa * len(xb) - fb * len(xa))))

    r = mdx.QUERIES["dq_ks_two_sample"](spark, sf_dir).first()
    assert r["n_a"] == len(xa) and r["n_b"] == len(xb)
    assert r["ks_num"] == ks_num
    assert r["ks_e6"] == ks_num * 1_000_000 // (len(xa) * len(xb))
