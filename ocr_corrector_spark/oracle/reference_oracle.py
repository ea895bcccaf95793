"""Pure-Python batch oracle — the reference's list-in/list-out contract.

Replicates ``BaseCorrector.correct(texts, probs)`` end to end
(/root/reference/corrector/base_corrector.py:33-94): the correctability
pre-filter, prob-threshold error detection, the split into
correct/pass streams, subclass ``correct_all`` dispatch, and the
insert-by-original-index order restoration (``post_process``).  Tests run
this row-by-row on the driver and assert the Spark pipeline's
``text_corrected`` equals it per turn (the BASELINE.json per-turn equality
contract).
"""

from __future__ import annotations

from ..assets import KEYWORDS, build_char_meta
from ..assets.scorer_table import topn_candidates
from ..functions.bktree import BKTree
from ..functions.charsim import CharSim
from ..functions.correct_kernels import bert_correct_one, keyword_correct_one
from ..functions.rules import (
    do_correct_filter_bert,
    do_correct_filter_keyword,
    find_err_pos_by_prob,
)


class _OracleBase:
    prob_threshold = 0.9

    def correct(self, texts, probs=None):
        """base_corrector.py:33-48 with preprocess/post_process semantics."""
        to_process, err_positions, to_pass = [], [], []
        if probs:  # base_corrector.py:36-39 batch-level switch
            for i, (sent, p) in enumerate(zip(texts, probs)):
                if not self.do_correct_filter(sent):
                    to_pass.append((i, sent))
                else:
                    err = find_err_pos_by_prob(p, self.prob_threshold)
                    if not err:
                        to_pass.append((i, sent))
                    else:
                        to_process.append(sent)
                        err_positions.append(err)
        else:  # non-prob path marks every position (base_corrector.py:75-86)
            for i, sent in enumerate(texts):
                if not self.do_correct_filter(sent):
                    to_pass.append((i, sent))
                else:
                    to_process.append(sent)
                    err_positions.append(list(range(len(sent))))
        if not to_process:
            return list(texts)
        results = self.correct_all(to_process, err_positions)
        for i, s in to_pass:  # post_process insert-by-index (:88-94)
            results.insert(i, s)
        return results

    def correct_row(self, text, prob):
        """Row-shaped entry matching the Spark pipeline's per-row contract:
        prob=None → non-prob path for that row."""
        return self.correct([text], [prob] if prob is not None else None)[0]


class KeywordOracle(_OracleBase):
    def __init__(self, similarity_threshold: float = 0.55, keywords=KEYWORDS):
        self.similarity_threshold = similarity_threshold
        self.tree = BKTree(keywords)
        self.keywords = frozenset(self.tree.words)
        self.char_sim = CharSim(build_char_meta())

    def do_correct_filter(self, text):
        return do_correct_filter_keyword(text)

    def correct_all(self, texts, err_positions):
        return [
            keyword_correct_one(
                t, e, self.tree, self.keywords, self.char_sim, self.similarity_threshold
            )
            for t, e in zip(texts, err_positions)
        ]


class BertOracle(_OracleBase):
    def __init__(self, topn: int = 3, max_seq_length: int = 64):
        self.topn = topn
        self.max_seq_length = max_seq_length
        self.char_sim = CharSim(build_char_meta())

    def do_correct_filter(self, text):
        return do_correct_filter_bert(text, self.max_seq_length)

    def correct_all(self, texts, err_positions):
        return [
            bert_correct_one(t, e, self.char_sim, topn_candidates, self.topn)
            for t, e in zip(texts, err_positions)
        ]
