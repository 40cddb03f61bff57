"""Python-call string parsing: the port of the reference's
_prepare_python (marda_extractors_api/__init__.py:308-346), re-implemented
from its observed semantics and verified against the reference's own test
cases (tests/test_mpr.py:112-148):

- ``"a.b.f(x, 'y', k=v)"`` -> function tree ``["a","b","f"]``, positional
  args, kwargs dict; the argument list is whatever sits between the FIRST
  ``(`` and the FIRST ``)``;
- argument values are strings only; a ``k=v`` segment containing braces or
  more than one ``=`` is rejected (nested structures unsupported);
- dequoting is deliberately asymmetric (SURVEY.md §2.C): a segment that
  *starts or ends* with a quote gets one quote stripped from each end
  (single quotes checked before double), then surrounding whitespace is
  trimmed -- replicated exactly for oracle parity.
"""

from __future__ import annotations


def dequote(s: str) -> str:
    """Strip one leading/trailing quote if the string starts OR ends with
    one; single-quote rule wins over double-quote (the reference's
    asymmetric elif chain)."""
    s = s.strip()
    if s.startswith("'") or s.endswith("'"):
        s = s.removeprefix("'").removesuffix("'")
    elif s.startswith('"') or s.endswith('"'):
        s = s.removeprefix('"').removesuffix('"')
    return s.strip()


def prepare_python_call(command: str) -> tuple[list[str], list[str], dict[str, str]]:
    """Split ``a.b.f(args...)`` into (function tree, args, kwargs)."""
    head, _, rest = command.partition("(")
    function_tree = head.split(".")
    body = rest.partition(")")[0]
    args: list[str] = []
    kwargs: dict[str, str] = {}
    for segment in body.split(","):
        segment = segment.strip()
        if not segment:
            continue
        if "=" in segment:
            parts = segment.split("=")
            if len(parts) > 2 or "{" in segment or "}" in segment:
                raise RuntimeError(f"cannot parse argument: {segment!r}")
            kwargs[dequote(parts[0])] = dequote(parts[1])
        else:
            args.append(dequote(segment))
    return function_tree, args, kwargs
