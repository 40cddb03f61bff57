"""Reference-fidelity unit tests (SURVEY.md §5.2 item 3): the templating
golden strings and call-parser cases from the reference's own test suite
(tests/test_mpr.py:100-148), run against this engine's re-implementation."""

from __future__ import annotations

import pytest

from metadata_extractors_api_spark.functions import (
    apply_template_args,
    prepare_python_call,
)


def test_template_cli_golden():
    out = apply_template_args(
        "parse --type=example {{ input_path }}",
        method="cli",
        input_type="example",
        input_path="example.txt",
        output_path="example.json",
    )
    assert out == "parse --type=example example.txt"


def test_template_python_repr_quoting():
    out = apply_template_args(
        "extract({{ input_type }}, {{ input_path }})",
        method="python",
        input_type="biologic-mpr",
        input_path="/data/f.mpr",
    )
    assert out == "extract('biologic-mpr', '/data/f.mpr')"


def test_template_none_skips_slot():
    out = apply_template_args(
        "noop {{ output_type }}", method="cli", input_type="t", input_path="/p"
    )
    assert out == "noop {{ output_type }}"


def test_template_additional_overrides_but_falsy_falls_back():
    out = apply_template_args(
        "x {{ input_path }}",
        method="cli",
        input_type="t",
        input_path="local.txt",
        additional_template={"input_path": "override.txt"},
    )
    assert out == "x override.txt"
    out = apply_template_args(
        "x {{ input_path }}",
        method="cli",
        input_type="t",
        input_path="local.txt",
        additional_template={"input_path": ""},
    )
    assert out == "x local.txt"


def test_parse_double_quoted():
    tree, args, kwargs = prepare_python_call('extract("biologic-mpr", "/path/to/file")')
    assert tree == ["extract"]
    assert args == ["biologic-mpr", "/path/to/file"]
    assert kwargs == {}


def test_parse_single_quoted():
    tree, args, kwargs = prepare_python_call("extract('biologic-mpr', '/path/to/file')")
    assert tree == ["extract"]
    assert args == ["biologic-mpr", "/path/to/file"]
    assert kwargs == {}


def test_parse_dotted_tree_and_kwarg():
    tree, args, kwargs = prepare_python_call(
        'example.extractors.extract("example.txt", type="example")'
    )
    assert tree == ["example", "extractors", "extract"]
    assert args == ["example.txt"]
    assert kwargs == {"type": "example"}


def test_parse_kwargs_only():
    tree, args, kwargs = prepare_python_call(
        'extract(filename="example.txt", type="example")'
    )
    assert tree == ["extract"]
    assert args == []
    assert kwargs == {"filename": "example.txt", "type": "example"}


def test_parse_rejects_nested_dict():
    with pytest.raises(RuntimeError):
        prepare_python_call(
            'extract(filename="example.txt", type={"test": "example", "dictionary": "example"})'
        )


def test_dequote_asymmetric():
    from metadata_extractors_api_spark.functions.callparse import dequote

    assert dequote("'abc") == "abc"
    assert dequote("abc'") == "abc"
    assert dequote("'abc'") == "abc"
    assert dequote('"abc"') == "abc"
    assert dequote("abc") == "abc"


def test_template_expr_matches_repr(spark):
    """Column-form python-mode quoting must equal CPython repr for
    printable strings, including embedded quotes and backslashes."""
    from pyspark.sql import functions as F

    from metadata_extractors_api_spark.functions.template import (
        apply_template_args,
        template_expr,
    )

    tricky = [
        "plain.txt",
        "it's here.mpr",
        'say "hi".csv',
        "both ' and \".bin",
        "back\\slash.dat",
        "mix '\\\" all",
    ]
    df = spark.createDataFrame([(t,) for t in tricky], "p string")
    got = (
        df.select(
            "p",
            template_expr(
                F.lit("run {{ input_path }}"),
                F.lit("python"),
                {"input_path": F.col("p")},
            ).alias("r"),
        )
        .toPandas()
        .set_index("p")["r"]
    )
    for t in tricky:
        want = apply_template_args("run {{ input_path }}", "python", input_path=t)
        assert got[t] == want == f"run {t!r}"
