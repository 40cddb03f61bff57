"""Round-4 operator tests: independent ground truth for the new
operators (hand-stated expectations, numpy re-derivations, property
checks) — deliberately NOT the oracle formulas, so a bug shared by both
engines still surfaces (the round-3 percentile_cont lesson)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

import metadata_extractors_api_spark as mdx


# ---------------------------------------------------------------------------
# file-type detection
# ---------------------------------------------------------------------------

def test_detection_classes_hand_checked(spark, sf_dir):
    out = {
        r["fname"]: r
        for r in mdx.QUERIES["extract_detect_filetype"](spark, sf_dir).collect()
    }
    # magic + extension agree
    assert out["nolabel_gcpl.mpr"]["detected_type"] == "biologic-mpr"
    assert out["nolabel_gcpl.mpr"]["via"] == "magic"
    assert out["nolabel_gcpl.mpr"]["extractor_id"] == "yadg"
    # magic only (unknown extension)
    assert out["mystery.dat"]["detected_type"] == "biologic-mpr"
    # CONFLICT: magic says mpr, extension says csv -> magic outranks
    assert out["renamed.csv"]["detected_type"] == "biologic-mpr"
    assert out["renamed.csv"]["via"] == "magic"
    # extension only
    assert out["plain_table.csv"]["detected_type"] == "example-csv"
    assert out["plain_table.csv"]["via"] == "extension"
    assert out["plain_table.csv"]["extractor_id"] == "csv-extract"
    # detected type with NO registered extractor
    assert out["trace.bin"]["detected_type"] == "orphan-type"
    assert out["trace.bin"]["extractor_id"] is None
    # undetectable
    assert out["opaque.xyz"]["detected_type"] is None
    assert out["opaque.xyz"]["via"] == "none"


def test_dead_letter_includes_undetectable(spark, sf_dir):
    rows = mdx.QUERIES["extract_dead_letter"](spark, sf_dir).collect()
    reasons = {(r["path"], r["reason"]) for r in rows}
    assert ("opaque.xyz", "undetectable_type") in reasons
    # detectable files must NOT be dead-lettered
    assert not any(p == "plain_table.csv" for p, _ in reasons)


# ---------------------------------------------------------------------------
# registry test sweep
# ---------------------------------------------------------------------------

def test_sweep_per_extractor_hand_checked(spark, sf_dir):
    out = {
        r["extractor_id"]: r
        for r in mdx.QUERIES["extract_test_sweep"](spark, sf_dir).collect()
    }
    # yadg: 3 mpr example files, python in-process -> all pass
    assert (out["yadg"]["n_pairs"], out["yadg"]["n_pass"]) == (3, 3)
    # alt-extractor: altx binary does not exist -> all error
    assert (out["alt-extractor"]["n_pairs"], out["alt-extractor"]["n_error"]) == (3, 3)
    assert out["alt-extractor"]["n_pass"] == 0
    # csv-extract: 2 csv example files through the csvx shim -> pass
    assert (out["csv-extract"]["n_pairs"], out["csv-extract"]["n_pass"]) == (2, 2)
    # nothing anywhere in the 'fail' (ran-but-invalid) channel
    assert all(r["n_fail"] == 0 for r in out.values())


# ---------------------------------------------------------------------------
# NTILE arithmetic vs Spark's own window function
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("k", [3, 4, 5, 7])
def test_ntile_from_rank_matches_window_ntile(spark, k):
    from metadata_extractors_api_spark.operators.quality import (
        _ntile_from_rank,
    )

    n = 23  # deliberately not divisible by any tested k
    df = spark.range(1, n + 1).select(
        F.col("id").alias("i"), F.lit(n).alias("n")
    )
    w = Window.orderBy("i")
    both = df.select(
        "i",
        _ntile_from_rank(F.col("i"), F.col("n"), k).alias("arith"),
        F.ntile(k).over(w).alias("window"),
    )
    bad = both.filter(F.col("arith") != F.col("window")).count()
    assert bad == 0


# ---------------------------------------------------------------------------
# k-center: greedy max-min properties vs numpy brute force
# ---------------------------------------------------------------------------

def test_kcenter_matches_numpy_greedy(spark, sf_dir):
    import pandas as pd

    rows = mdx.QUERIES["sample_kcenter_diverse"](spark, sf_dir).collect()
    got = [(r["rank"], r["vec_id"], r["d2_at_selection"]) for r in rows]
    got.sort()
    # numpy re-derivation with the same quantization
    from metadata_extractors_api_spark.catalog import load

    pdf = load(spark, sf_dir, "embeddings").select("vec_id", "embedding").toPandas()
    pdf = pdf.sort_values("vec_id").reset_index(drop=True)
    X = np.floor(
        np.stack(pdf["embedding"].to_numpy()).astype(np.float64) * 1e6
    ).astype(np.int64)
    ids = pdf["vec_id"].to_numpy()
    sel = [int(np.argmin(ids))]
    dmin = ((X - X[sel[0]]) ** 2).sum(axis=1)
    expect = [(1, int(ids[sel[0]]), None)]
    for t in range(2, 6):
        # max d, ties -> smaller vec_id (ids sorted ascending: first hit)
        nxt = int(np.argmax(dmin))
        expect.append((t, int(ids[nxt]), int(dmin[nxt])))
        nd = ((X - X[nxt]) ** 2).sum(axis=1)
        dmin = np.minimum(dmin, nd)
    assert got == expect
    # greedy max-min distances are non-increasing
    ds = [d for _, _, d in got[1:]]
    assert all(a >= b for a, b in zip(ds, ds[1:]))


# ---------------------------------------------------------------------------
# OLS vs numpy.polyfit
# ---------------------------------------------------------------------------

def test_ols_matches_numpy_polyfit(spark, sf_dir):
    from metadata_extractors_api_spark.catalog import load

    got = {
        r["nation"]: r
        for r in mdx.QUERIES["agg_ols_regression"](spark, sf_dir).collect()
    }
    o = load(spark, sf_dir, "orders").toPandas()
    c = load(spark, sf_dir, "customer").toPandas()
    y = (
        (o["o_totalprice"] * 100).round().astype("int64")
        .groupby(o["o_custkey"]).sum()
    )
    c = c.set_index("c_custkey")
    c["x"] = (c["c_acctbal"] * 100).round().astype("int64")
    for nk, row in got.items():
        sub = c[c["c_nationkey"] == nk]
        xs = sub["x"].to_numpy(np.float64)
        ys = y.reindex(sub.index).to_numpy()
        mask = ~np.isnan(ys)
        xs, ys = xs[mask], ys[mask].astype(np.float64)
        slope, intercept = np.polyfit(xs, ys, 1)
        assert row["n"] == mask.sum()
        assert row["slope"] == pytest.approx(slope, rel=1e-6, abs=1e-4)
        assert row["intercept"] == pytest.approx(intercept, rel=1e-6, abs=1e-2)
        r = np.corrcoef(xs, ys)[0, 1]
        assert row["r2"] == pytest.approx(r * r, rel=1e-6, abs=1e-6)


# ---------------------------------------------------------------------------
# PCA vs numpy eigendecomposition
# ---------------------------------------------------------------------------

def test_pca_kernel_bit_exact_vs_numpy_simulation(spark, sf_dir):
    # The kernel contract: PCA_ITERS exact iterations, bit-identical
    # to an independent numpy simulation of the same arithmetic
    # (quantize -> int Xv -> decimal X'S -> max-abs floor rescale),
    # and monotonically improving alignment with the true top
    # eigenvector. (Full convergence on this near-isotropic fixture
    # needs ~90 iterations — λ2/λ1 ≈ 0.93 — which is a property of
    # the data, not the kernel; see the operator docstring.)
    from metadata_extractors_api_spark.catalog import load
    from metadata_extractors_api_spark.operators.pipeline import PCA_ITERS

    rows = mdx.QUERIES["embedding_pca_power"](spark, sf_dir).collect()
    v_got = np.array(
        [r["component"] for r in sorted(rows, key=lambda r: r["j"])],
        dtype=np.int64,
    )
    pdf = load(spark, sf_dir, "embeddings").select("embedding").toPandas()
    X = np.floor(
        np.stack(pdf["embedding"].to_numpy()).astype(np.float64) * 1e6
    )
    G = X.T @ X
    evals, evecs = np.linalg.eigh(G)
    top = evecs[:, -1]

    def cos(u):
        return abs(u @ top) / (np.linalg.norm(u) * np.linalg.norm(top))

    v = np.full(64, 1e6)
    aligns = [cos(v)]
    w = None
    for _ in range(PCA_ITERS):
        s = X @ v
        w = X.T @ s
        m = np.abs(w).max()
        v = np.floor(w / m * 1e6)
        aligns.append(cos(v))
    assert np.array_equal(v_got, v.astype(np.int64))  # bit-exact kernel
    assert all(a < b for a, b in zip(aligns, aligns[1:]))  # monotone
    # Rayleigh quotient matches the simulation's and sits within the
    # true spectrum (in original 1e12-scaled units)
    ray = (v @ w) / (v @ v) / 1e12
    assert rows[0]["eigval"] == pytest.approx(ray, rel=1e-6)
    assert evals[0] / 1e12 <= rows[0]["eigval"] <= evals[-1] / 1e12 * 1.001


# ---------------------------------------------------------------------------
# sign-safe floor-division formula
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "s,n", [(-7, 3), (7, 3), (-9, 3), (0, 5), (-1, 4), (10, 4)]
)
def test_pmod_floor_division_formula(spark, s, n):
    row = spark.sql(
        f"SELECT (CAST({s} AS BIGINT) - pmod(CAST({s} AS BIGINT), {n}))"
        f" div {n} AS v"
    ).collect()[0]
    assert row["v"] == s // n  # Python // IS floor division
