"""T13 sentence cutting goldens + T9 pronunciation similarity."""

import pytest

from ocr_corrector_spark.assets import build_char_meta
from ocr_corrector_spark.functions import CharSim
from ocr_corrector_spark.functions.sentence_cut import cut_sentences


def test_cut_at_terminals():
    assert cut_sentences("第一句话结束。第二句话结束！第三句呢？") == [
        "第一句话结束。",
        "第二句话结束！",
        "第三句呢？",
    ]


def test_cut_quote_aware():
    # terminator inside quotes must NOT split (create_data.py:6-28)
    line = "他说“不要走。留下来”然后离开了。"
    assert cut_sentences(line) == [line]


def test_cut_comma_lookahead():
    long = "这是一个非常非常非常长的开头语句片段啊啊啊，后半句在此。"
    parts = cut_sentences(long, comma_min=20)
    assert parts == ["这是一个非常非常非常长的开头语句片段啊啊啊，", "后半句在此。"]
    # short prefix before comma: no split
    assert cut_sentences("短句，后半", comma_min=20) == ["短句，后半"]


def test_cut_merges_fragments():
    assert cut_sentences("好。这一句足够长了。", min_len=5) == ["好。这一句足够长了。"]


def test_pronunciation_similarity():
    cs = CharSim(build_char_meta())
    # assets give 牛=niu2, 午=wu3 → 1 - ed('niu2','wu3')/4 = 0.25
    assert cs.pronunciation_similarity("牛", "午") == pytest.approx(0.25)
    # null pronunciation → 0.0 (char_sim.py:290-291)
    assert cs.pronunciation_similarity("大", "天") == 0.0


def test_cut_corpus_df(spark):
    from ocr_corrector_spark.functions.sentence_cut import cut_corpus_df

    df = spark.createDataFrame(
        [(1, "第一句话结束。第二句话结束！")], "id int, text string"
    )
    rows = cut_corpus_df(df).orderBy("sentence_idx").collect()
    assert [(r.sentence_idx, r.sentence) for r in rows] == [
        (0, "第一句话结束。"),
        (1, "第二句话结束！"),
    ]
