"""E2E line coverage of kernel/readability.py under the golden corpora.

Runs the kernel (plain Python, no Spark) over the fixture corpus + the
frozen synthetic bench docs with stdlib ``trace`` and reports which
executable lines of readability.py never execute — the fixture-selection
tool the golden corpus was built with (round 2: 782/964; the
mark_data_tables ladder is e2e-unreachable by bug-faithful design).

Usage::

    python tools/kernel_coverage.py            # summary + uncovered ranges
    python tools/kernel_coverage.py --list     # every uncovered line with source
"""

from __future__ import annotations

import os
import sys
import trace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from paperoni_spark.spans import extract_document, fixture_corpus, synth_document  # noqa: E402

TARGET = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "paperoni_spark",
    "kernel",
    "readability.py",
)


def run_corpora() -> None:
    # re-execute the module body under the tracer so import-time lines
    # (defs, constants) count as hit — only behavior lines should show missed
    import importlib

    from paperoni_spark.kernel import readability

    importlib.reload(readability)
    for doc in fixture_corpus():
        extract_document(doc["doc_id"], doc["spans"])
    for i in range(0, 40):
        d = synth_document(i)
        extract_document(d["doc_id"], d["spans"])


def executable_lines(path: str) -> set[int]:
    import dis

    with open(path) as f:
        code = compile(f.read(), path, "exec")
    lines: set[int] = set()

    def walk(c):
        lines.update(l for _, l in dis.findlinestarts(c) if l is not None)
        for const in c.co_consts:
            if hasattr(const, "co_code"):
                walk(const)

    walk(code)
    return lines


def main() -> None:
    tracer = trace.Trace(count=True, trace=False)
    tracer.runfunc(run_corpora)
    counts = tracer.results().counts
    hit = {ln for (fn, ln), n in counts.items() if fn == TARGET and n > 0}
    exe = executable_lines(TARGET)
    missed = sorted(exe - hit)
    print(f"executable: {len(exe)}  hit: {len(exe & hit)}  missed: {len(missed)}")
    with open(TARGET) as f:
        src = f.readlines()
    if "--list" in sys.argv:
        for ln in missed:
            print(f"{ln:5d}  {src[ln - 1].rstrip()}")
    else:
        # collapse into ranges for a readable summary
        ranges = []
        for ln in missed:
            if ranges and ln == ranges[-1][1] + 1:
                ranges[-1][1] = ln
            else:
                ranges.append([ln, ln])
        for a, b in ranges:
            head = src[a - 1].strip()[:72]
            print(f"{a}-{b}: {head}")


if __name__ == "__main__":
    main()
