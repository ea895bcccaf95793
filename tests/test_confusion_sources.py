"""Offline confusion-statistics job (A3) and reference-shaped sources (S1/S3)."""

import json

import pytest
from pyspark.sql import functions as F

from ocr_corrector_spark.operators.confusion import (
    char_occurrences,
    confusion_pair_counts,
    mask_probabilities,
    top_confusions,
)
from ocr_corrector_spark.sources.ocr_json import parse_ali_result, read_ocr_fixture


def test_confusion_stats(spark):
    pairs = spark.createDataFrame(
        [("大", "天")] * 5 + [("太", "天")] * 2 + [("白", "自")] * 3,
        "wrong_char string, correct_char string",
    )
    counts = confusion_pair_counts(pairs)
    top = {r.correct_char: (r.wrong_char, r.n) for r in top_confusions(counts).collect()}
    assert top["天"] == ("大", 5)
    assert top["自"] == ("白", 3)

    occ = spark.createDataFrame(
        [("天", 10), ("自", 2)], "correct_char string, n_occ long"
    )
    mp = {r.correct_char: r.mask_prob for r in mask_probabilities(counts, occ).collect()}
    assert mp["天"] == pytest.approx(0.5)   # 5/10
    assert mp["自"] == 1.0                  # min(3/2, 1.0) — create_data.py:139-147 cap


def test_char_occurrences(spark):
    corpus = spark.createDataFrame([("天天向上",), ("天",)], "text string")
    occ = {r.correct_char: r.n_occ for r in char_occurrences(corpus).collect()}
    assert occ["天"] == 3
    assert occ["上"] == 1


def test_read_ocr_fixture(spark, tmp_path):
    # S1: the reference golden fixture shape (demo.py:24-34)
    fixture = {"texts": ["宋还本全", "账户状态"], "probs": [[0.5, 0.99, 0.99, 0.5], [0.99] * 4]}
    p = tmp_path / "f.json"
    p.write_text(json.dumps(fixture), encoding="utf-8")
    rows = read_ocr_fixture(spark, str(p)).orderBy("line_idx").collect()
    assert [r.text for r in rows] == ["宋还本全", "账户状态"]
    assert rows[0].line_idx == 0
    assert rows[0].probs == [0.5, 0.99, 0.99, 0.5]


def test_parse_ali_result(spark):
    # S3: vendor response projection (ali_ocr.py:36-53): prob/100
    data = [
        (
            [
                {"word": "未还本金", "charInfo": [{"prob": 99}, {"prob": 56}, {"prob": 99}, {"prob": 99}]},
                {"word": "逾期天", "charInfo": [{"prob": 90}, {"prob": 88}, {"prob": 99}]},
            ],
        )
    ]
    schema = (
        "prism_wordsInfo array<struct<word:string,charInfo:array<struct<prob:bigint>>>>"
    )
    df = spark.createDataFrame(data, schema)
    rows = parse_ali_result(df).orderBy("line_idx").collect()
    assert rows[0].text == "未还本金"
    assert rows[0].probs == [0.99, 0.56, 0.99, 0.99]
    assert rows[1].line_idx == 1


def test_confusion_pairs_from_parallel(spark):
    from ocr_corrector_spark.operators.confusion import (
        confusion_pair_counts,
        confusion_pairs_from_parallel,
        scorer_table_from_stats,
    )
    from ocr_corrector_spark.sources.transcripts import gen_transcripts

    df = gen_transcripts(spark, n_convs=200, keep_oracle_cols=True)
    pairs = confusion_pairs_from_parallel(df)
    counts = {
        (r.wrong_char, r.correct_char): r.n
        for r in confusion_pair_counts(pairs).collect()
    }
    # the generator's designed swaps must dominate the statistics
    assert counts[("大", "天")] > 0
    assert counts[("白", "自")] > 0
    assert counts[("宋", "未")] > 0
    # no identity pairs ever
    assert all(w != c for (w, c) in counts)

    table = scorer_table_from_stats(confusion_pair_counts(pairs))
    rows = {r.wrong_char: r for r in table.filter("rk = 1").collect()}
    # 宋's top correction is 未 with probability mass near 1
    assert rows["宋"].correct_char == "未"
    assert rows["宋"].prob >= 0.5
