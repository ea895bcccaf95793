"""PDF/layout main-content extraction (driver-mandated stage,
BASELINE.json north_rule: "HTML boilerplate strip, PDF/layout parse, DOM
heuristics" — no reference counterpart).

Two layers:

1. ``decode_pdf_bytes`` — raw ``%PDF-`` byte streams need a PDF text
   extractor (pdfminer.six / PyMuPDF).  Neither ships in this container,
   so the decode step is a clearly-marked STUB behind an import-try; the
   Spark-side plumbing (dispatch, per-row exception isolation, batch
   shape) is real and tested.  When a PDF library is present the same
   code path produces positioned text boxes and falls through to layer 2.

2. ``extract_layout_content`` — layout analysis over positioned text
   boxes, the part that is genuinely algorithmic and fully implemented:

   * **recursive XY-cut** (Nagy & Seth's classic top-down page
     segmentation): recursively split the box set at the widest empty
     gap in the x- or y-projection, emitting top-before-bottom and
     left-before-right — this reconstructs reading order across
     multi-column layouts;
   * **running header/footer removal**: boxes whose normalized text
     repeats on 2+ pages within the top/bottom page bands are running
     decorations, and standalone page-number boxes (第N页 / - N - / bare
     digits) are dropped regardless of repetition;
   * pages are emitted in order, blocks joined with newlines.

The positioned-box serialization (one box per line)::

    %LAYOUT v1
    P<page> <x0> <y0> <x1> <y1> <text>

with y increasing downward, is what a PDF decoder emits per text box; the
synthetic transcripts generator produces it natively so the whole path is
exercised end-to-end without a binary PDF dependency.
"""

from __future__ import annotations

import re
from typing import NamedTuple

LAYOUT_MAGIC = "%LAYOUT"
PDF_MAGIC = "%PDF-"

# page-number patterns a footer box may carry on its own
_PAGE_NUM_RE = re.compile(r"^\s*(?:第?\s*\d+\s*[页頁]?|-\s*\d+\s*-|\d+\s*/\s*\d+)\s*$")
_WS_RE = re.compile(r"\s+")

# minimum empty-gap width (in layout units ~ points) for an XY-cut split
_MIN_GAP_X = 18.0
_MIN_GAP_Y = 10.0
# top/bottom page bands where running headers/footers live
_BAND_FRACTION = 0.15


class Box(NamedTuple):
    page: int
    x0: float
    y0: float
    x1: float
    y1: float
    text: str


def parse_layout(text: str) -> list[Box]:
    """Parse the ``%LAYOUT v1`` serialization; raises ValueError on junk."""
    lines = text.split("\n")
    if not lines or not lines[0].startswith(LAYOUT_MAGIC):
        raise ValueError("not a layout document")
    boxes: list[Box] = []
    for line in lines[1:]:
        if not line.strip():
            continue
        head, _, body = line.partition(" ")
        if not head.startswith("P"):
            raise ValueError(f"bad box line: {line[:40]!r}")
        parts = body.split(" ", 4)
        if len(parts) < 5:
            raise ValueError(f"bad box line: {line[:40]!r}")
        boxes.append(
            Box(
                int(head[1:]),
                float(parts[0]),
                float(parts[1]),
                float(parts[2]),
                float(parts[3]),
                parts[4],
            )
        )
    return boxes


def _norm(text: str) -> str:
    return _WS_RE.sub(" ", text).strip()


def _strip_decorations(boxes: list[Box]) -> list[Box]:
    """Drop running headers/footers (repeated across pages in the edge
    bands) and standalone page-number boxes."""
    if not boxes:
        return boxes
    height = max(b.y1 for b in boxes)
    top = height * _BAND_FRACTION
    bottom = height * (1.0 - _BAND_FRACTION)

    def in_band(b: Box) -> bool:
        return b.y1 <= top or b.y0 >= bottom

    pages_of: dict[str, set[int]] = {}
    for b in boxes:
        if in_band(b):
            pages_of.setdefault(_norm(b.text), set()).add(b.page)

    kept = []
    for b in boxes:
        if in_band(b):
            t = _norm(b.text)
            if _PAGE_NUM_RE.match(t):
                continue
            if len(pages_of.get(t, ())) >= 2:
                continue
        kept.append(b)
    return kept


def _projection_gaps(
    intervals: list[tuple[float, float]], min_gap: float
) -> list[tuple[float, float]]:
    """Maximal empty gaps >= min_gap between sorted, merged intervals."""
    intervals = sorted(intervals)
    gaps = []
    _, hi = intervals[0]
    for lo2, hi2 in intervals[1:]:
        if lo2 - hi >= min_gap:
            gaps.append((hi, lo2))
        hi = max(hi, hi2)
    return gaps


def _xycut(boxes: list[Box]) -> list[Box]:
    """Recursive XY-cut: emit boxes in reading order (top-to-bottom,
    left-to-right at each recursive split)."""
    if len(boxes) <= 1:
        return list(boxes)
    y_gaps = _projection_gaps([(b.y0, b.y1) for b in boxes], _MIN_GAP_Y)
    x_gaps = _projection_gaps([(b.x0, b.x1) for b in boxes], _MIN_GAP_X)
    best_y = max((hi - lo for lo, hi in y_gaps), default=0.0)
    best_x = max((hi - lo for lo, hi in x_gaps), default=0.0)
    if best_y <= 0.0 and best_x <= 0.0:
        return sorted(boxes, key=lambda b: (b.y0, b.x0))
    # prefer the horizontal cut (stacked blocks) unless a clearly wider
    # vertical gap indicates columns
    if best_y > 0.0 and best_y >= best_x:
        lo, hi = max(y_gaps, key=lambda g: g[1] - g[0])
        first = [b for b in boxes if b.y1 <= lo + 1e-9]
        second = [b for b in boxes if b.y1 > lo + 1e-9]
    else:
        lo, hi = max(x_gaps, key=lambda g: g[1] - g[0])
        first = [b for b in boxes if b.x1 <= lo + 1e-9]
        second = [b for b in boxes if b.x1 > lo + 1e-9]
    return _xycut(first) + _xycut(second)


def extract_layout_content(text: str) -> str:
    """Reading-order text of a ``%LAYOUT`` document, decorations stripped.

    Malformed layout markup degrades to returning the input unchanged
    (row-level isolation — an extraction failure must never fail the
    task, mirroring the reference's per-row try/except,
    keyword_corrector.py:102-106).
    """
    try:
        boxes = _strip_decorations(parse_layout(text))
    except ValueError:
        return text
    out: list[str] = []
    for page in sorted({b.page for b in boxes}):
        out.extend(b.text for b in _xycut([b for b in boxes if b.page == page]))
    return "\n".join(out)


def decode_pdf_bytes(data: bytes) -> str:
    """Decode raw PDF bytes to the ``%LAYOUT v1`` serialization.

    STUB in this container: requires a PDF text extractor (pdfminer.six),
    which is not installed and must not be pip-installed here.  The
    surrounding operator treats NotImplementedError as "row passes
    through unchanged" so the plumbing is exercised without the binary
    dependency.
    """
    try:
        from pdfminer.high_level import extract_pages  # type: ignore
        from pdfminer.layout import LTTextContainer  # type: ignore
    except ImportError as exc:  # pragma: no cover - no pdfminer in sandbox
        raise NotImplementedError(
            "PDF byte decoding needs pdfminer.six (not available in this "
            "environment); layout analysis itself is implemented — feed "
            "%LAYOUT documents or install pdfminer"
        ) from exc
    lines = [f"{LAYOUT_MAGIC} v1"]  # pragma: no cover - exercised only with pdfminer
    for pageno, page in enumerate(extract_pages(data)):  # pragma: no cover
        for el in page:
            if isinstance(el, LTTextContainer):
                txt = _norm(el.get_text())
                if txt:
                    # pdfminer y grows upward; flip to y-down
                    h = page.height
                    lines.append(
                        f"P{pageno} {el.x0:.1f} {h - el.y1:.1f} "
                        f"{el.x1:.1f} {h - el.y0:.1f} {txt}"
                    )
    return "\n".join(lines)  # pragma: no cover
