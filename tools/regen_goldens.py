"""ADDITIVE golden regeneration for tests/golden/fixture_spans.json.

The golden file is the span-equality CONTRACT (CLAUDE.md): existing entries
may never change.  This script re-runs the kernel over fixture_corpus(),
content-verifies every doc_id already in the golden file BYTE-FOR-BYTE
(any drift aborts with a diff — that is a kernel regression, not a reason
to regenerate), and appends entries only for NEW doc_ids.

Usage::

    python tools/regen_goldens.py          # verify + append new fixtures
    python tools/regen_goldens.py --check  # verify only, change nothing
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from paperoni_spark.spans import extract_document, fixture_corpus  # noqa: E402

GOLDEN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "golden",
    "fixture_spans.json",
)


def entry_for(doc: dict) -> dict:
    got = extract_document(doc["doc_id"], doc["spans"])
    return {
        "status": got["status"],
        "extracted": [
            {
                "kind": s["kind"],
                "text": s["text"],
                "media_ref": s["media_ref"],
                "order": s["order"],
            }
            for s in (got["extracted"] or [])
        ],
        "metadata": got["metadata"],
        "img_urls": got["img_urls"],
    }


def main() -> None:
    with open(GOLDEN) as f:
        golden = json.load(f)
    corpus = fixture_corpus()
    drift, added = [], []
    out = dict(golden)
    for doc in corpus:
        new = entry_for(doc)
        doc_id = doc["doc_id"]
        if doc_id in golden:
            if golden[doc_id] != new:
                drift.append(doc_id)
        else:
            added.append(doc_id)
            out[doc_id] = new
    removed = sorted(set(golden) - {d["doc_id"] for d in corpus})
    if drift or removed:
        print(f"DRIFT in existing entries: {drift}; removed fixtures: {removed}")
        print("Refusing to write — existing goldens are a frozen contract.")
        sys.exit(1)
    n_spans = sum(len(e["extracted"]) for e in out.values())
    print(f"verified {len(golden)} existing entries byte-identical")
    if "--check" in sys.argv:
        if added:
            print(f"NOT written (--check): {len(added)} new fixtures pending: {added}")
            sys.exit(1)
        print("no new fixtures; golden is current")
        return
    if added:
        with open(GOLDEN, "w") as f:
            json.dump(out, f, indent=1, ensure_ascii=False, sort_keys=True)
            f.write("\n")
        print(f"appended {len(added)} new entries: {added}")
    print(f"total: {len(out)} docs / {n_spans} spans")


if __name__ == "__main__":
    main()
