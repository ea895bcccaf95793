"""Per-row correction kernels — the single source of truth for correction
semantics, shared by the Spark Arrow-UDF operators (operators/correct.py)
and the pure-Python batch oracle (oracle/reference_oracle.py).

Each kernel replicates one reference ``correct_all`` body including its
quirks (SURVEY.md §7 hard parts): candidate iteration order, first-wins
argmax ties, the BK distance cap, digit guards, and per-row exception
isolation (any error passes the row through unchanged —
keyword_corrector.py:102-106, bert_corrector.py:74-77).
"""

from __future__ import annotations

import re

from .bktree import BKTree
from .charsim import CharSim
from .rules import (
    DIGIT_RE,
    check_candidate,
    curve_02,
    regulation,
    translate_digits,
)


def keyword_correct_one(
    text: str,
    err_pos,
    tree: BKTree,
    keywords: frozenset,
    char_sim: CharSim,
    similarity_threshold: float,
) -> str:
    """Keyword-path correction of one row.

    Parity: keyword_corrector.py:43-108 —
    correct_all(['宋还本全','数期大'], [[0,3],[0,2]]) == ['未还本金','逾期天'].
    """
    try:
        if text in keywords:  # exact-keyword skip (:52-55)
            return text

        err = list(err_pos)
        distance = len(err)  # BK radius = #errors, capped (:58-60)
        if distance == len(text):
            distance = len(text) - 1
        found = tree.search(text, distance)  # J1 (:62)
        if not found:
            return text

        reg, origin = regulation(text, err)  # T2 (:70)
        pattern = re.compile(reg)
        candidates = []
        for kw in found:  # T3 structural filter (:72-77)
            m = pattern.match(kw)
            if not m:
                continue
            candidates.append("".join(m.group(i + 1) for i in range(len(err))))
        if not candidates:
            return text

        sims = [char_sim.shape_similarity(origin, c) for c in candidates]  # T5-T8
        best = max(sims)
        if best < similarity_threshold:  # J2 threshold (:88-91)
            return text

        substitution = list(candidates[sims.index(best)])  # first-wins argmax (:94)
        chars = list(text)
        for p in err:  # T4 substitute in err order (:96-97)
            chars[p] = substitution.pop(0)
        return "".join(chars)
    except Exception:
        return text  # row-level isolation (:102-106)


def bert_correct_one(
    text: str,
    err_pos,
    char_sim: CharSim,
    scorer,
    topn: int = 3,
) -> str:
    """BERT-path correction of one row with a pluggable candidate scorer.

    ``scorer(char) -> [(candidate, confidence), ...]`` stands in for the
    masked-LM top-n output (masked_lm.py:400-447); the detect → candidates
    → guard → curve-gated accept loop is bit-parity with
    bert_corrector.py:27-78 including the short-circuit ``break`` on first
    accepted candidate (:70-71) and the digit guard (:52-54).
    """
    try:
        numfree = translate_digits(text)  # T1 (:37-42)
        origin = list(text)
        for e in err_pos:
            if DIGIT_RE.match(origin[e]):  # never replace digits (:52-54)
                continue
            observed = numfree[e]
            _accept_candidates(origin, e, scorer(observed), char_sim, topn)
        return "".join(origin)
    except Exception:
        return text  # row-level isolation (:74-77)


def _accept_candidates(origin, e, candidates, char_sim, topn) -> None:
    """The guard + curve-gated accept scan for one error position —
    bit-parity with bert_corrector.py:56-71 including the short-circuit
    ``break`` on first accepted candidate."""
    for pred, confidence in candidates[:topn]:
        similarity = char_sim.shape_similarity(pred, origin[e])  # (:59)
        if origin[e] == pred:  # identical-candidate skip (:64-65)
            continue
        if not check_candidate(origin[e], pred):  # F5/F6 guards (:66)
            continue
        if curve_02(confidence, similarity):  # J3 (:68-71)
            origin[e] = pred
            return


def bert_correct_one_framed(
    text: str,
    err_pos,
    char_sim: CharSim,
    per_err_candidates,
    topn: int = 3,
) -> str:
    """BERT-path correction fed by PRE-COMPUTED per-error candidate lists
    from the framed batch scorer (functions/framed_scorer.py — the
    tokenize → frame → score path, masked_lm.py:251-302,400-447).  Guards,
    curve gate and short-circuit semantics are shared with
    ``bert_correct_one`` via ``_accept_candidates``."""
    try:
        origin = list(text)
        for e, cands in zip(err_pos, per_err_candidates):
            if DIGIT_RE.match(origin[e]):  # never replace digits (:52-54)
                continue
            _accept_candidates(origin, e, cands, char_sim, topn)
        return "".join(origin)
    except Exception:
        return text  # row-level isolation (:74-77)
