"""Committed-artifact completeness gate (VERDICT r6 'Next round' #1).

Round 6's end-of-round snapshot committed a mid-run, 29-line
SWEEP_r06_sf01.txt, deleting the complete 382/382 artifact. Two defenses
now exist:

1. tools/compare.py --out writes to OUT.tmp and atomically renames only
   after a FULL-registry sweep finishes — a partial sweep can never
   become an artifact file at all.
2. This test: every committed SWEEP_*.txt must be internally complete —
   a footer line whose total equals the number of per-query result
   lines, and zero FAIL lines. A truncated file (no footer, or footer
   disagreeing with its own body) fails the suite.

Registry-count equality (footer N == len(QUERIES)) is enforced by the
script at WRITE time, not here: mid-round the registry legitimately
grows past the last committed sweep, and the sweep is re-run at round
close.
"""

import glob
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SWEEPS = sorted(glob.glob(os.path.join(REPO, "SWEEP_*.txt")))

FOOTER_RE = re.compile(r"^(\d+)/(\d+) passed")


@pytest.mark.parametrize("path", SWEEPS, ids=[os.path.basename(p) for p in SWEEPS])
def test_sweep_artifact_is_complete(path):
    with open(path) as f:
        lines = f.read().splitlines()
    result_lines = [l for l in lines if l.startswith(("OK  ", "FAIL"))]
    footers = [m for l in lines if (m := FOOTER_RE.match(l))]
    assert footers, f"{path}: no 'N/N passed' footer — truncated artifact"
    passed, total = int(footers[-1].group(1)), int(footers[-1].group(2))
    assert total == len(result_lines), (
        f"{path}: footer claims {total} queries but file holds "
        f"{len(result_lines)} result lines — truncated artifact"
    )
    assert passed == total, f"{path}: committed sweep has failures"
    fails = [l for l in result_lines if l.startswith("FAIL")]
    assert not fails, f"{path}: FAIL lines committed: {fails[:3]}"


def test_sweep_artifacts_exist():
    assert SWEEPS, "no committed sweep artifacts at repo root"


def test_compare_out_refuses_partial_sweep(tmp_path):
    """The atomic-artifact gate end-to-end: a subset sweep with --out
    must exit non-zero and leave NO artifact (and no .tmp) behind."""
    import subprocess
    import sys

    out = tmp_path / "SWEEP_partial.txt"
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "compare.py"),
            "--sf",
            "/root/testdata/sf0.001",
            "--out",
            str(out),
            "scan_parquet",
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 1
    assert "REFUSING" in r.stdout
    assert not out.exists()
    assert not (tmp_path / "SWEEP_partial.txt.tmp").exists()

def test_plans_md_covers_every_benched_query():
    """VERDICT r9 hygiene item: every query bench.py times must have a
    committed PLANS.md section (plan evidence for every benched number).
    tools/plan_report.py derives its section list from bench.HEADLINE
    plus its own EXTRA list; this gate catches a PLANS.md committed
    before a headliner was added."""
    import sys

    sys.path.insert(0, REPO)
    from bench import HEADLINE

    with open(os.path.join(REPO, "PLANS.md")) as f:
        sections = {
            l[3:].strip() for l in f.read().splitlines() if l.startswith("## ")
        }
    missing = [n for n in HEADLINE if n not in sections]
    assert not missing, (
        f"{len(missing)} benched queries lack PLANS.md sections "
        f"(regenerate via tools/plan_report.py): {missing[:10]}"
    )
