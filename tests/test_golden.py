"""Golden-fixture drift guard.

The oracle and the Spark extraction stage share one implementation, so a
semantic regression would change both sides in lockstep and the equality
tests would still pass.  This file pins 135 (input -> expected output)
pairs — spanning every rule family — captured from the reviewed
implementation.  If extraction semantics change, this test fails and the
change must be deliberate (regenerate via the script in the docstring of
the JSON file's producer, after reviewing the diff).
"""

import json
import os

import pytest

from unraveldocs_spark.oracle import extract_turn

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_extractions.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


def test_every_rule_family_is_pinned(golden):
    rules = {g["expected"]["rule"] for g in golden}
    assert {
        "plain",
        "html",
        "pages_direct",
        "pages_ocr_fallback",
        "tool_fence",
        "layout",
        "vision",
        "error_no_data",
        "error_unsupported_kind",
        "error_page_selection",
    } <= rules


def test_oracle_matches_golden(golden):
    mismatches = []
    for g in golden:
        r = extract_turn(g["role"], g["tool"], g["text"])
        e = g["expected"]
        got = {
            "extracted_text": r.extracted_text,
            "spans": [{"start": s, "end": en, "kind": k} for (s, en, k) in r.spans],
            "status": r.status,
            "error_message": r.error_message,
            "content_format": r.content_format,
            "rule": r.rule,
        }
        if got != e:
            mismatches.append((g["conv_id"], g["turn_idx"], got, e))
    assert not mismatches, f"{len(mismatches)} golden mismatches; first: {mismatches[0]}"
