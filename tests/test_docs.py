"""Doc-integrity checks (VERDICT r4 items 2+9).

A docstring that cites a measurement artifact is a load-bearing claim:
every ``docs/results/*`` path referenced from package/perf source must
resolve to a committed file, or the claim is unauditable.
"""

import re
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

_PAT = re.compile(r"docs/results/([\w][\w.-]*\.(?:json|png))")


def _source_files():
    yield from (REPO / "deepsensornz_tpu").rglob("*.py")
    yield from (REPO / "perf").glob("*.py")
    yield REPO / "bench.py"
    yield REPO / "__graft_entry__.py"


# a line that WRITES an artifact (output-path default / argparse --out) is
# not a measurement citation; only read-side references must resolve
_WRITER = re.compile(r"out_path|--out|ns\.out|out=|Writes?\b")


def test_results_artifacts_referenced_from_source_exist():
    missing = {}
    for py in _source_files():
        for line in py.read_text().splitlines():
            if _WRITER.search(line):
                continue
            for m in _PAT.finditer(line):
                if not (REPO / "docs" / "results" / m.group(1)).exists():
                    missing.setdefault(str(py.relative_to(REPO)), []).append(
                        m.group(1))
    assert not missing, f"dangling docs/results references: {missing}"


def test_results_artifacts_referenced_from_results_readme_exist():
    readme = REPO / "docs" / "results" / "README.md"
    missing = [m.group(1) for m in _PAT.finditer(readme.read_text())
               if not (REPO / "docs" / "results" / m.group(1)).exists()]
    # bare `name.json` references inside the results README itself
    for m in re.finditer(r"`([\w][\w.-]*\.(?:json|png))`", readme.read_text()):
        if not (REPO / "docs" / "results" / m.group(1)).exists():
            missing.append(m.group(1))
    assert not missing, f"results README cites missing artifacts: {missing}"
