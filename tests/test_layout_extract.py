"""Layout-extraction kernel tests (functions/layout_extract.py).

Covers: XY-cut reading order (incl. two-column pages), running
header/footer stripping, page-number removal, format dispatch in
operators/extract.py, the PDF decode stub, and the end-to-end Spark path
over generator layout rows.
"""

from __future__ import annotations

import pytest

from ocr_corrector_spark.functions.layout_extract import (
    Box,
    _strip_decorations,
    _xycut,
    decode_pdf_bytes,
    extract_layout_content,
    parse_layout,
)
from ocr_corrector_spark.operators.extract import extract_any


def _doc(*lines: str) -> str:
    return "\n".join(("%LAYOUT v1",) + lines)


def test_parse_layout_roundtrip():
    doc = _doc("P0 1 2 3 4 hello world", "P1 5.5 6 7 8 第二页正文")
    boxes = parse_layout(doc)
    assert boxes == [
        Box(0, 1.0, 2.0, 3.0, 4.0, "hello world"),
        Box(1, 5.5, 6.0, 7.0, 8.0, "第二页正文"),
    ]


def test_parse_layout_rejects_non_layout():
    with pytest.raises(ValueError):
        parse_layout("plain text")


def test_xycut_two_columns_reading_order():
    # two columns (wide x-gap), each with two stacked blocks: reading
    # order must be left column top-to-bottom, then right column
    boxes = [
        Box(0, 320, 100, 560, 300, "R1"),
        Box(0, 40, 100, 280, 300, "L1"),
        Box(0, 40, 320, 280, 500, "L2"),
        Box(0, 320, 320, 560, 500, "R2"),
    ]
    assert [b.text for b in _xycut(boxes)] == ["L1", "L2", "R1", "R2"]


def test_xycut_prefers_horizontal_cut_for_stacked_blocks():
    # title spanning both columns above a two-column body: title first
    boxes = [
        Box(0, 320, 200, 560, 400, "R"),
        Box(0, 40, 40, 560, 80, "TITLE"),
        Box(0, 40, 200, 280, 400, "L"),
    ]
    assert [b.text for b in _xycut(boxes)] == ["TITLE", "L", "R"]


def test_strip_decorations_repeated_header_and_page_numbers():
    boxes = [
        Box(0, 36, 20, 559, 34, "机密文件 信贷报告"),
        Box(0, 36, 60, 559, 600, "正文甲"),
        Box(0, 250, 810, 345, 822, "第 1 页"),
        Box(1, 36, 20, 559, 34, "机密文件 信贷报告"),
        Box(1, 36, 60, 559, 600, "正文乙"),
        Box(1, 250, 810, 345, 822, "- 2 -"),
    ]
    kept = _strip_decorations(boxes)
    assert [b.text for b in kept] == ["正文甲", "正文乙"]


def test_strip_decorations_keeps_unrepeated_edge_text():
    # a one-off box in the top band (e.g. a real title) must survive
    boxes = [
        Box(0, 36, 20, 559, 34, "合同标题"),
        Box(0, 36, 60, 559, 600, "正文"),
        Box(1, 36, 60, 559, 600, "续文"),
    ]
    kept = _strip_decorations(boxes)
    assert [b.text for b in kept] == ["合同标题", "正文", "续文"]


def test_extract_layout_content_end_to_end():
    doc = _doc(
        "P0 36 20 559 34 机密文件",
        "P0 36 60 280 600 左栏文字",
        "P0 300 60 559 600 右栏文字",
        "P0 250 810 345 822 第 1 页",
        "P1 36 20 559 34 机密文件",
        "P1 36 60 559 600 次页正文",
        "P1 250 810 345 822 第 2 页",
    )
    assert extract_layout_content(doc) == "左栏文字\n右栏文字\n次页正文"


def test_extract_layout_malformed_passes_through():
    bad = "%LAYOUT v1\nP0 not numbers here"
    assert extract_layout_content(bad) == bad


def test_pdf_decode_is_stubbed_without_pdfminer():
    pytest.importorskip_reason = None
    try:
        import pdfminer  # noqa: F401

        pytest.skip("pdfminer present; stub not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_pdf_bytes(b"%PDF-1.4 fake")


def test_extract_any_dispatch():
    # PDF bytes pass through unchanged (decode stub)
    pdf_text = "%PDF-1.4 binaryish"
    assert extract_any(pdf_text) == pdf_text
    # layout docs are layout-parsed
    doc = _doc("P0 36 60 559 600 正文")
    assert extract_any(doc) == "正文"
    # plain text untouched
    assert extract_any("你好") == "你好"
    assert extract_any(None) is None


def test_generator_layout_rows_roundtrip(spark):
    from pyspark.sql import functions as F

    from ocr_corrector_spark.operators.extract import with_extraction
    from ocr_corrector_spark.sources.transcripts import gen_transcripts

    df = gen_transcripts(spark, n_convs=120, keep_oracle_cols=True)
    layout = df.filter(F.col("is_layout"))
    assert layout.count() > 0
    bad = (
        with_extraction(layout, out_col="text_extracted")
        .filter(F.col("text_extracted") != F.col("text_noisy"))
        .count()
    )
    assert bad == 0
