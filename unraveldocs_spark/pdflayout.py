"""PDF layout parsing: line/span clustering of positioned text runs.

North-star mandate: "PDF layout parsing (pdfminer-style line/span
clustering) to emit cleaned main-content text and span offsets per turn".
The reference consumes pre-extracted page text (PDFTextStripper,
SRC/ocrprocessing/utils/PdfTextExtractor.java:95-114 — PDFBox does the
layout analysis internally); this module implements the layout half the
graft needs when payloads arrive as raw positioned runs instead.

Envelope (FIXTURES.md F10)::

    {"kind": "layout",
     "runs": [{"x": int, "y": int, "w": int, "h": int, "s": str}, ...]}

Coordinates are INTEGER layout units (e.g. centipoints), so clustering
decisions are exact and engine-portable (the DuckDB oracle re-derives the
same lines with window functions — no float tolerance games).

Algorithm (deterministic, pdfminer LTTextLine-style):

1. order runs by (y, x, input index);
2. a new LINE starts when a run's y exceeds the previous run's y by more
   than ``LINE_TOL`` (runs whose baselines differ by <= LINE_TOL jitter
   cluster together);
3. within a line, runs are ordered by (x, input index); a single space is
   inserted between consecutive runs when the horizontal gap
   ``x - (prev.x + prev.w)`` exceeds ``SPACE_TOL`` (pdfminer's word-gap
   rule); touching/overlapping runs concatenate without a space;
4. lines join with "\\n"; spans are per-line (start, end, "line") offsets.

No Spark imports — runs inside Arrow batches on executors and in the
pure-Python oracle.
"""

from __future__ import annotations

LINE_TOL = 5  # max baseline jitter within one line (layout units)
SPACE_TOL = 2  # min horizontal gap that renders as a word space


def layout_lines(runs: list[dict]) -> list[str]:
    """Cluster positioned runs into reading-order lines (rules 1-3)."""
    order = sorted(
        range(len(runs)),
        key=lambda i: (runs[i]["y"], runs[i]["x"], i),
    )
    groups: list[list[int]] = []
    cur: list[int] = []
    prev_y = None
    for i in order:
        y = runs[i]["y"]
        if prev_y is not None and y - prev_y > LINE_TOL:
            groups.append(cur)
            cur = []
        cur.append(i)
        prev_y = y
    if cur:
        groups.append(cur)

    lines: list[str] = []
    for group in groups:
        group = sorted(group, key=lambda i: (runs[i]["x"], i))
        parts: list[str] = []
        prev_end = None
        for i in group:
            r = runs[i]
            if prev_end is not None and r["x"] - prev_end > SPACE_TOL:
                parts.append(" ")
            parts.append(str(r["s"]))
            prev_end = r["x"] + r["w"]
        lines.append("".join(parts))
    return lines


def extract_layout(runs: list[dict]) -> tuple[str, list[tuple[int, int, str]]]:
    """Full layout extraction: lines joined by '\\n' + per-line spans."""
    lines = layout_lines(runs or [])
    spans: list[tuple[int, int, str]] = []
    out: list[str] = []
    pos = 0
    for i, line in enumerate(lines):
        if i > 0:
            out.append("\n")
            pos += 1
        spans.append((pos, pos + len(line), "line"))
        out.append(line)
        pos += len(line)
    return "".join(out), spans
