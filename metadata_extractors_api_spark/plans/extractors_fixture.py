"""Worker-side fixture extractors for A16 dynamic invocation.

The reference resolves a registry entry's ``setup`` to an importable
module (``import_module(setup)``, ``__init__.py:371-378``), descends the
parsed function tree and invokes it in-process. On a cluster, workers
don't pip-install extractors per task; the Spark-idiomatic port ships
the registered extractor OBJECTS with the task closure (the package
registers itself for cloudpickle by-value serialization), and the
resolver looks them up by the same ``setup`` string the registry row
carries. The descent/name-check semantics are preserved exactly.

The fixture "yadg" below mirrors the registry fixture's usage row
``yadg.extractors.extract({{ input_type }}, {{ input_path }})``: its
output is a deterministic function of the ARGUMENTS it receives, so an
oracle can verify the whole template -> parse -> resolve -> invoke
chain end to end (wrong arg routing changes the values).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# Module-level (not function-local) import: execute_python_call runs
# INSIDE Spark workers, where the package is not importable — the
# reference must be captured in this module's by-value-pickled globals,
# not re-imported at call time.
from metadata_extractors_api_spark.functions.callparse import prepare_python_call

EXTRACT_CHANNELS = ("Ewe", "I", "cycle")
EXTRACT_POINTS = 5


class FixtureModule:
    """A picklable stand-in for an imported extractor module: carries
    ``__name__`` (the reference's tree[0] check) and an attribute tree
    (the reference's getattr descent). Plain object, not ModuleType,
    because cloudpickle serializes modules by reference and workers
    must not need them importable."""

    def __init__(self, name: str, **attrs: Any) -> None:
        self.__name__ = name
        for k, v in attrs.items():
            setattr(self, k, v)


def _yadg_extract(input_type: str, input_path: str) -> list[tuple[str, int, float]]:
    """Deterministic fake of ``yadg.extractors.extract``: an
    electrochemistry-shaped table whose values depend on both call
    arguments (proving the rendered template's args reached the
    resolved callable)."""
    type_bonus = 0.5 if input_type == "biologic-mpr" else 99.0
    return [
        (ch, pt, round(len(input_path) + pt + len(ch) * 0.25 + type_bonus, 2))
        for ch in EXTRACT_CHANNELS
        for pt in range(EXTRACT_POINTS)
    ]


#: setup string (registry row) -> resolvable extractor root object.
EXTRACTOR_MODULES: dict[str, FixtureModule] = {
    "yadg": FixtureModule("yadg", extractors=FixtureModule("yadg.extractors", extract=_yadg_extract)),
}


def descend_function_tree(module: Any, tree: list[str]) -> Callable:
    """Faithful port of the reference's ``_descend_function_tree``
    (``__init__.py:381-394``): first tree element must equal the
    module's ``__name__``; the rest getattr-descend to the callable."""
    if tree[0] != module.__name__:
        raise RuntimeError(f"Module name mismatch: {module.__name__} != {tree[0]}")
    _tree = tree.copy()
    _tree.pop(0)
    function: Any = module
    while _tree:
        function = getattr(function, _tree.pop(0))
    return function


def execute_python_call(rendered: str, setup: str) -> Any:
    """Port of ``_execute_python`` (``__init__.py:370-399``): validate
    the setup spec, resolve the extractor root, parse the rendered call
    and invoke the resolved callable with its args/kwargs."""
    if " " in setup:
        raise RuntimeError("Only simple `import <setup>` invocation is supported")
    module = EXTRACTOR_MODULES.get(setup)
    if module is None:
        raise RuntimeError(f"No registered extractor module for setup {setup!r}")
    function_tree, args, kwargs = prepare_python_call(rendered)
    try:
        function = descend_function_tree(module, function_tree)
    except AttributeError:
        raise RuntimeError(f"Could not resolve {function_tree} in {setup}")
    return function(*args, **kwargs)
