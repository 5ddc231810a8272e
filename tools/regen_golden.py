"""Golden-fixture maintenance for tests/golden_extractions.json.

The golden file stores literal (role, tool, text) INPUTS with their
expected extraction outputs, so entries stay valid even when the
generator's family mix changes.  This tool appends fixtures for rule
families not yet pinned (e.g. when a new payload family ships), keeping
every existing pinned entry byte-identical.  Usage:

    python tools/regen_golden.py            # append missing families
    python tools/regen_golden.py --check    # exit 1 if families missing

Run it after ADDING a family; after CHANGING semantics deliberately,
review the pytest diff first, then regenerate the affected entries by
deleting them here and re-running.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from unraveldocs_spark.generator import conv_name, conv_sizes, make_turn  # noqa: E402
from unraveldocs_spark.oracle import ALL_RULES, extract_turn  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tests", "golden_extractions.json")
PER_FAMILY = 15
# families that need >1 conversation to appear are exempt from the
# at-least-one check only if truly absent from the scan range
SCAN_CONVS = 60


def expected_of(r) -> dict:
    return {
        "extracted_text": r.extracted_text,
        "spans": [{"start": s, "end": e, "kind": k} for (s, e, k) in r.spans],
        "status": r.status,
        "error_message": r.error_message,
        "content_format": r.content_format,
        "rule": r.rule,
    }


def main() -> int:
    check = "--check" in sys.argv
    with open(GOLDEN) as f:
        golden = json.load(f)
    pinned_rules = {g["expected"]["rule"] for g in golden}
    missing = [r for r in ALL_RULES if r not in pinned_rules]
    # error_oversize needs a 10MB payload; pin it via a compact synthetic
    # rather than the generator's oversize turn to keep the file small
    if not missing:
        print("all rule families pinned")
        return 0
    if check:
        print("missing families:", missing)
        return 1

    added = 0
    counts = {r: 0 for r in missing}
    for c in range(SCAN_CONVS):
        for t in range(conv_sizes(SCAN_CONVS, 18, 2)[c]):
            role, text, tool = make_turn(c, t, include_oversize=False)
            r = extract_turn(role, tool, text)
            if r.rule in counts and counts[r.rule] < PER_FAMILY:
                counts[r.rule] += 1
                added += 1
                golden.append(
                    {
                        "conv_id": conv_name(c),
                        "turn_idx": t,
                        "role": role,
                        "tool": tool,
                        "text": text,
                        "expected": expected_of(r),
                    }
                )
    with open(GOLDEN, "w") as f:
        json.dump(golden, f, indent=1)
    print(f"appended {added} fixtures: {counts}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
