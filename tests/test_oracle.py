"""Batch-oracle goldens: the reference's correct_all / correct doctests and
README I/O contract examples (SURVEY.md §5.1, §5.4)."""

import pytest

from ocr_corrector_spark.oracle import BertOracle, KeywordOracle


@pytest.fixture(scope="module")
def kw():
    # doctest keyword_corrector.py:44-48 runs with CorrectorConfig
    # (similarity_threshold=0.6, base_corrector.py:19)
    return KeywordOracle(similarity_threshold=0.6)


@pytest.fixture(scope="module")
def kw_report():
    # report biz config: similarity_threshold=0.55 (config/config.json:8)
    return KeywordOracle(similarity_threshold=0.55)


@pytest.fixture(scope="module")
def bert():
    return BertOracle()


def test_keyword_correct_all_doctest(kw):
    # keyword_corrector.py:44-48
    assert kw.correct_all(["宋还本全", "数期大"], [[0, 3], [0, 2]]) == [
        "未还本金",
        "逾期天",
    ]


def test_keyword_fixture2_error(kw_report):
    # real OCR error from corrector/data/2_ocr_result.json: 术还本金
    assert kw_report.correct_all(["术还本金"], [[0]]) == ["未还本金"]


def test_keyword_exact_skip(kw):
    # keyword_corrector.py:52-55
    assert kw.correct_all(["未还本金"], [[0]]) == ["未还本金"]


def test_keyword_no_candidate_passthrough(kw):
    # nothing within BK radius → unchanged
    assert kw.correct_all(["个处个业"], [[0]]) == ["个处个业"]


def test_keyword_below_threshold_passthrough(kw):
    # candidates exist but max similarity < threshold → unchanged:
    # 已还本金 is a keyword; corrupt char 已→龘 (unknown char, similarity 0)
    assert kw.correct_all(["龘还本金"], [[0]]) == ["龘还本金"]


def test_bert_correct_all_doctest(bert):
    # bert_corrector.py:28-34
    texts = [
        "本着平等、白愿、诚信、互利的原则，一致同意本合同内容，并共同遵守。",
        "无效、重大暇疵或不符合乙方其他规定的债权资产，乙方有权拒绝，不子初始登",
    ]
    out = bert.correct_all(list(texts), [[5], [5, 31]])
    assert out == [
        "本着平等、自愿、诚信、互利的原则，一致同意本合同内容，并共同遵守。",
        "无效、重大瑕疵或不符合乙方其他规定的债权资产，乙方有权拒绝，不予初始登",
    ]


def test_bert_readme_example(bert):
    # README.md:17-27 — 我爱北京大安门, prob dip at index 4
    probs = [0.99, 0.99, 0.99, 0.99, 0.56, 0.99, 0.99]
    assert bert.correct(["我爱北京大安门"], [probs]) == ["我爱北京天安门"]


def test_bert_digit_guard(bert):
    # bert_corrector.py:52-54 — digits never replaced even at low prob
    assert bert.correct_all(["逾期3天要还"], [[2]]) == ["逾期3天要还"]


def test_bert_traditional_and_curve_rejection(bert):
    # scorer proposes 萬 (traditional → guard) then 方 (conf .03 → curve)
    assert bert.correct_all(["一万个文本"], [[1]]) == ["一万个文本"]


def test_bert_multichar_candidate_guard(bert):
    # '术' scorer: '技术' rejected (len), then '未' accepted
    # (similarity 0.888…, conf 0.38 → 0.38+0.888-1 >= 0)
    assert bert.correct_all(["术语的文本"], [[0]]) == ["未语的文本"]


def test_bert_smoke_test_sentence(bert):
    # masked_lm.py:450-458 smoke sentence: 苦→著 proposed but guard-rejected
    # (著 ∈ traditional class, base_corrector.py:168); 丰→主 accepted.
    assert bert.correct_all(["国际电台苦名丰持人"], [[4, 6]]) == [
        "国际电台苦名主持人"
    ]


# --- preprocess / post_process (F1-F4) ---------------------------------------
def test_correct_batch_order_restoration(kw_report):
    # mix of pass rows (filter, no-error) and corrected rows; order preserved
    texts = ["ok", "宋还本全", "未还本金", "术还本金"]
    probs = [
        [0.99, 0.99],
        [0.5, 0.99, 0.99, 0.5],
        [0.99, 0.99, 0.99, 0.99],
        [0.5, 0.99, 0.99, 0.99],
    ]
    assert kw_report.correct(texts, probs) == [
        "ok",            # <2 CJK chars → filter pass-through (base_corrector.py:96-106)
        "未还本金",
        "未还本金",      # no err positions → pass-through (base_corrector.py:64-66)
        "未还本金",
    ]


def test_correct_non_prob_path(kw_report):
    # probs=None → every position is an error (base_corrector.py:75-86)
    out = kw_report.correct(["宋还本全"])
    # distance capped at len-1 (keyword_corrector.py:58-60); regex '^(.)(.)(.)(.)$'
    # matches any 4-char keyword; best shape match wins
    assert out == ["未还本金"]


def test_bert_filter_variants(bert):
    # bert_corrector.py:81-93: alphabet → pass; <3 CJK → pass; >62 chars → pass
    long_text = "错" * 63
    texts = ["有ab字母的", "字两", long_text, "我爱北京大安门"]
    probs = [[0.1] * 5, [0.1] * 2, [0.1] * 63, [0.99] * 4 + [0.56] + [0.99] * 2]
    out = bert.correct(texts, probs)
    assert out[:3] == texts[:3]
    assert out[3] == "我爱北京天安门"
