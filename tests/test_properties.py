"""Property-based tests (hypothesis) for the reference-fidelity string
logic -- the pure-Python kernels under fn_template / udf_scalar /
udtf_parse_call."""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st

from metadata_extractors_api_spark.functions.callparse import (
    dequote,
    prepare_python_call,
)
from metadata_extractors_api_spark.functions.template import apply_template_args

token = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_-./",
    min_size=1,
    max_size=20,
)


@given(token)
def test_dequote_roundtrips_clean_tokens(t):
    assert dequote(f"'{t}'") == t
    assert dequote(f'"{t}"') == t
    assert dequote(t) == t


@given(token)
def test_dequote_asymmetric_single_side(t):
    assert dequote(f"'{t}") == t
    assert dequote(f"{t}'") == t


@given(token, token)
def test_template_cli_substitutes_raw(input_type, input_path):
    out = apply_template_args(
        "run {{ input_type }} {{ input_path }}",
        method="cli",
        input_type=input_type,
        input_path=input_path,
    )
    assert out == f"run {input_type} {input_path}"


@given(token, token)
def test_template_python_repr_quotes(input_type, input_path):
    out = apply_template_args(
        "f({{ input_type }}, {{ input_path }})",
        method="python",
        input_type=input_type,
        input_path=input_path,
    )
    assert out == f"f({input_type!r}, {input_path!r})"


@given(token)
def test_template_none_preserves_slot(v):
    out = apply_template_args(
        "x {{ output_type }} y", method="cli", input_type=v, input_path=v
    )
    assert "{{ output_type }}" in out


@given(token, token)
def test_template_override_beats_local_unless_falsy(a, b):
    out = apply_template_args(
        "{{ input_path }}",
        method="cli",
        input_type="t",
        input_path=a,
        additional_template={"input_path": b},
    )
    assert out == b
    out = apply_template_args(
        "{{ input_path }}",
        method="cli",
        input_type="t",
        input_path=a,
        additional_template={"input_path": ""},
    )
    assert out == a


ident = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=10
)  # dot-free: a '.' inside a tree element is indistinguishable from a
#    path separator (same in the reference's split('.'))


@given(
    st.lists(ident, min_size=1, max_size=3),
    st.lists(token, min_size=0, max_size=3),
    st.dictionaries(
        st.text(alphabet="abcdefgh", min_size=1, max_size=5),
        token,
        max_size=3,
    ),
)
def test_parser_roundtrips_generated_calls(tree, args, kwargs):
    parts = [f"'{a}'" for a in args] + [f"{k}='{v}'" for k, v in kwargs.items()]
    command = ".".join(tree) + "(" + ", ".join(parts) + ")"
    ptree, pargs, pkwargs = prepare_python_call(command)
    assert ptree == tree
    assert pargs == args
    assert pkwargs == kwargs


def test_corr_matches_builtin_and_is_stable(spark, sf_dir):
    """The exact-moments corr must agree with Spark's builtin corr()
    to float precision, and be bit-identical across repartitionings
    (the builtin is order-sensitive; the moments form is not)."""
    import metadata_extractors_api_spark as mdx
    from metadata_extractors_api_spark.catalog import load
    from pyspark.sql import functions as F

    got = {r["l_returnflag"]: r["corr_e9"]
           for r in mdx.QUERIES["agg_corr"](spark, sf_dir).collect()}
    li = load(spark, sf_dir, "lineitem")
    ref = {r["l_returnflag"]: r["c"]
           for r in li.groupBy("l_returnflag")
                      .agg(F.corr("l_quantity", "l_extendedprice").alias("c"))
                      .collect()}
    for k, e9 in got.items():
        assert abs(e9 / 1e9 - ref[k]) < 1e-6, (k, e9, ref[k])
    again = {r["l_returnflag"]: r["corr_e9"]
             for r in mdx.QUERIES["agg_corr"](spark, sf_dir).collect()}
    assert got == again


def test_scd2_versions_tile_each_users_history(spark, sf_dir):
    """SCD2 invariants: per user, versions are disjoint and contiguous
    (each valid_to equals the next valid_from), exactly one version is
    open-ended and flagged current, and consecutive versions never
    repeat a state (else the change wasn't a change)."""
    import metadata_extractors_api_spark as mdx

    rows = mdx.QUERIES["scd2_dimension"](spark, sf_dir).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for user, versions in by_user.items():
        versions.sort(key=lambda r: r["valid_from_us"])
        open_ended = [v for v in versions if v["valid_to_us"] is None]
        assert len(open_ended) == 1 and open_ended[0] is versions[-1]
        assert all(v["is_current"] == (1 if v["valid_to_us"] is None else 0)
                   for v in versions)
        for a, b in zip(versions, versions[1:]):
            assert a["valid_to_us"] == b["valid_from_us"], (user, a, b)
            assert a["state"] != b["state"], (user, a, b)


def test_skew_kurtosis_match_builtins_and_are_stable(spark, sf_dir):
    """The exact-power-sum skew/kurtosis must agree with Spark's
    builtin skewness()/kurtosis() to float precision and be
    bit-identical across reruns (the builtins' running updates are
    order-sensitive; the power-sum form is not)."""
    import metadata_extractors_api_spark as mdx
    from metadata_extractors_api_spark.catalog import load
    from pyspark.sql import functions as F

    got = {r["l_returnflag"]: (r["skew_e9"], r["kurt_e9"])
           for r in mdx.QUERIES["agg_skew_kurtosis"](spark, sf_dir).collect()}
    li = load(spark, sf_dir, "lineitem")
    ref = {r["l_returnflag"]: (r["s"], r["k"])
           for r in li.groupBy("l_returnflag")
                      .agg(F.skewness("l_quantity").alias("s"),
                           F.kurtosis("l_quantity").alias("k"))
                      .collect()}
    for flag, (s_e9, k_e9) in got.items():
        assert abs(s_e9 / 1e9 - ref[flag][0]) < 1e-6, (flag, s_e9, ref[flag])
        assert abs(k_e9 / 1e9 - ref[flag][1]) < 1e-6, (flag, k_e9, ref[flag])
    again = {r["l_returnflag"]: (r["skew_e9"], r["kurt_e9"])
             for r in mdx.QUERIES["agg_skew_kurtosis"](spark, sf_dir).collect()}
    assert got == again


def test_pagerank_mass_and_floor_invariants(spark, sf_dir):
    """Integer PageRank invariants: every node keeps at least the BASE
    floor, total mass never exceeds the initial endowment (floor
    division and dangling nodes only ever leak mass), and reruns are
    bit-identical (the property float PageRank cannot give)."""
    import metadata_extractors_api_spark as mdx
    from metadata_extractors_api_spark.operators.pipeline import PR_BASE, PR_SCALE

    rows = {r["node"]: r["rank_units"]
            for r in mdx.QUERIES["graph_pagerank"](spark, sf_dir).collect()}
    assert len(rows) == 25  # every nation, including any dangling ones
    assert all(v >= PR_BASE for v in rows.values())
    assert sum(rows.values()) <= 25 * PR_SCALE
    again = {r["node"]: r["rank_units"]
             for r in mdx.QUERIES["graph_pagerank"](spark, sf_dir).collect()}
    assert rows == again
