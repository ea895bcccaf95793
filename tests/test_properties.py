"""Property-based kernel tests (hypothesis) — the invariants SURVEY.md §5
calls for, checked over generated inputs rather than fixtures only."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_corrector_spark.assets import KEYWORDS, build_char_meta
from ocr_corrector_spark.functions import BKTree, CharSim, edit_distance
from ocr_corrector_spark.functions.correct_kernels import (
    bert_correct_one,
    keyword_correct_one,
)
from ocr_corrector_spark.functions.rules import find_err_pos_by_prob
from ocr_corrector_spark.functions.sentence_cut import cut_sentences
from ocr_corrector_spark.assets.scorer_table import topn_candidates

CJK = "未还本金逾期天账户状态大安门白愿自数术个处业宋全已"
_char_sim = CharSim(build_char_meta())
_tree = BKTree(KEYWORDS)
_kwset = frozenset(_tree.words)

text_st = st.text(alphabet=CJK + string.ascii_lowercase + "0123456789，。", max_size=24)


@given(st.text(max_size=16), st.text(max_size=16))
@settings(max_examples=200, deadline=None)
def test_edit_distance_metric_properties(a, b):
    d = edit_distance(a, b)
    assert d == edit_distance(b, a)                       # symmetry
    assert d <= max(len(a), len(b))                       # upper bound
    assert (d == 0) == (a == b)                           # identity
    assert d >= abs(len(a) - len(b))                      # length bound


@given(st.text(alphabet=CJK, min_size=1, max_size=8), st.integers(0, 3))
@settings(max_examples=100, deadline=None)
def test_bktree_equals_bruteforce(word, d):
    got = sorted(_tree.search(word, d))
    brute = sorted(w for w in _tree.words if edit_distance(w, word) <= d)
    assert got == brute


@given(st.lists(st.floats(0, 1, allow_nan=False), max_size=20), st.floats(0.1, 1.0))
@settings(max_examples=100, deadline=None)
def test_find_err_pos_matches_definition(probs, thr):
    pos = find_err_pos_by_prob(probs, thr)
    assert pos == [i for i, p in enumerate(probs) if p < thr]
    assert pos == sorted(pos)


@given(text_st)
@settings(max_examples=150, deadline=None)
def test_correction_identity_without_errors(text):
    # no error positions → both kernels are the identity
    assert keyword_correct_one(text, [], _tree, _kwset, _char_sim, 0.55) == text
    assert bert_correct_one(text, [], _char_sim, topn_candidates) == text


@given(text_st, st.lists(st.integers(0, 30), max_size=5))
@settings(max_examples=200, deadline=None)
def test_correction_never_crashes_or_changes_length(text, errs):
    # out-of-range error positions, any text: row-level isolation must hold
    out_kw = keyword_correct_one(text, errs, _tree, _kwset, _char_sim, 0.55)
    out_b = bert_correct_one(text, errs, _char_sim, topn_candidates)
    assert isinstance(out_kw, str) and isinstance(out_b, str)
    # bert path substitutes 1:1 → length preserved (or untouched on error)
    assert len(out_b) == len(text)


@given(st.text(alphabet=CJK + "，。；？！“”", max_size=80))
@settings(max_examples=150, deadline=None)
def test_sentence_cut_lossless(line):
    # cutting never loses or reorders characters
    assert "".join(cut_sentences(line)) == line


@given(st.text(max_size=80), st.text(max_size=80))
@settings(max_examples=500, deadline=None)
def test_myers_equals_dp(a, b):
    from ocr_corrector_spark.functions.editdist import _py_levenshtein

    assert edit_distance(a, b) == _py_levenshtein(a, b)


# --- layout-extraction invariants (functions/layout_extract.py) -------------------

_box_st = st.tuples(
    st.integers(0, 1),                      # page
    st.integers(0, 50),                     # x0 slot
    st.integers(0, 50),                     # y0 slot
    st.sampled_from(["正文", "内容", "text", "数据块"]),
)


@given(st.lists(_box_st, min_size=1, max_size=12, unique_by=lambda b: (b[0], b[1], b[2])))
@settings(max_examples=150, deadline=None)
def test_xycut_emits_every_box_exactly_once(boxes):
    from ocr_corrector_spark.functions.layout_extract import Box, _xycut

    built = [
        Box(p, x * 12.0, y * 12.0, x * 12.0 + 10.0, y * 12.0 + 10.0, f"{t}#{i}")
        for i, (p, x, y, t) in enumerate(boxes)
    ]
    out = _xycut(built)
    # reading order is a PERMUTATION: nothing lost, nothing duplicated
    assert sorted(b.text for b in out) == sorted(b.text for b in built)


@given(st.lists(_box_st, min_size=1, max_size=10, unique_by=lambda b: (b[0], b[1], b[2])))
@settings(max_examples=100, deadline=None)
def test_layout_roundtrip_preserves_all_text(boxes):
    from ocr_corrector_spark.functions.layout_extract import (
        Box,
        extract_layout_content,
    )

    # mid-page boxes only (outside the decoration bands) and unique texts
    doc_lines = ["%LAYOUT v1"]
    texts = []
    for i, (p, x, y, t) in enumerate(boxes):
        text = f"{t}#{i}"
        texts.append(text)
        y0 = 200.0 + y * 6.0
        doc_lines.append(f"P{p} {x * 12.0} {y0} {x * 12.0 + 10.0} {y0 + 5.0} {text}")
    out = extract_layout_content("\n".join(doc_lines))
    assert sorted(out.split("\n")) == sorted(texts)


@given(
    st.text(alphabet=CJK + string.ascii_lowercase + "0123456789，。", max_size=80),
    st.lists(st.integers(0, 79), max_size=5),
)
@settings(max_examples=150, deadline=None)
def test_framed_scorer_equals_table_scorer(text, errs):
    """For ANY input (pure CJK, mixed, digits, punctuation) the framed
    backend with an empty context-bigram table equals the char-keyed
    scorer: aligned rows score identically by construction, and
    misaligned rows (multi-char wordpieces) fall back to the char-keyed
    path explicitly."""
    from ocr_corrector_spark.functions.correct_kernels import (
        bert_correct_one_framed,
    )
    from ocr_corrector_spark.functions.framed_scorer import FramedTableScorer

    errs = sorted({e for e in errs if e < len(text)})
    fs = FramedTableScorer(context_bigrams={})
    per_err = fs.score_sentences([text], [errs])[0]
    if per_err is None:
        framed_out = bert_correct_one(text, errs, _char_sim, topn_candidates)
    else:
        framed_out = bert_correct_one_framed(text, errs, _char_sim, per_err)
    table_out = bert_correct_one(text, errs, _char_sim, topn_candidates)
    assert framed_out == table_out
