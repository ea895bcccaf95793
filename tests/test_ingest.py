"""S2 ingestion analog: bounded-concurrency OCR-API stage (sources/ingest.py)."""

import pytest
from pyspark.sql import functions as F

from ocr_corrector_spark.sources.ingest import (
    _parse_result,
    fake_ocr_call,
    ocr_ingest,
)


def test_fake_call_is_deterministic_and_ali_shaped():
    r1 = fake_ocr_call(b"img-1")
    r2 = fake_ocr_call(b"img-1")
    assert r1 == r2
    assert "prism_wordsInfo" in r1
    w = r1["prism_wordsInfo"][0]
    assert len(w["charInfo"]) == len(w["word"])


def test_parse_result_matches_reference_projection():
    # ali_ocr.py:36-53: word -> text, charInfo prob/100 -> probs
    res = {
        "prism_wordsInfo": [
            {"word": "未还本金", "charInfo": [{"prob": 99}, {"prob": 56}, {"prob": 99}, {"prob": 99}]},
            {"word": "ok", "charInfo": [{"prob": 100}, {"prob": 100}]},
        ]
    }
    assert _parse_result(res) == [
        ("未还本金", [0.99, 0.56, 0.99, 0.99]),
        ("ok", [1.0, 1.0]),
    ]


@pytest.fixture(scope="module")
def images(spark):
    rows = [(f"img-{i:03d}", bytes(f"payload-{i}", "utf-8")) for i in range(50)]
    return spark.createDataFrame(rows, "image_id string, image binary").repartition(4)


def test_ingest_rows_and_schema(spark, images):
    out = ocr_ingest(images, max_concurrency_per_task=3)
    rows = out.collect()
    assert {r.image_id for r in rows} == {f"img-{i:03d}" for i in range(50)}
    ok = [r for r in rows if r.error is None]
    assert ok, "expected successful segments"
    for r in ok:
        assert len(r.probs) == len(r.text)
        assert 0 <= r.seg_idx
    # deterministic across runs (thread pool must not reorder output rows
    # relative to input: pool.map preserves order)
    again = ocr_ingest(images, max_concurrency_per_task=3).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_ingest_isolates_failed_calls(spark):
    # craft payloads until one hits the fake vendor's failure digest
    import hashlib

    bad = next(
        f"x-{i}".encode() for i in range(10_000)
        if hashlib.md5(f"x-{i}".encode()).digest()[0] == 0xFF
    )
    df = spark.createDataFrame(
        [("good", b"payload-1"), ("bad", bytes(bad))],
        "image_id string, image binary",
    )
    rows = {r.image_id: r for r in ocr_ingest(df).collect() if r.error is not None}
    assert "bad" in rows and "good" not in rows
    assert rows["bad"].error.startswith("ConnectionError")
    assert rows["bad"].seg_idx == -1
