"""Error detection as native Catalyst expressions (operators F1-F3).

The reference runs these per row in Python (base_corrector.py:54-119);
here they are declarative column expressions so Catalyst keeps them inside
whole-stage codegen and can push the cheap disqualifiers ahead of the
expensive Arrow-UDF correction stage — the same manual optimization the
reference hard-codes (pre-filter before correct, SURVEY.md §4), but done
by the optimizer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# base_corrector.py:125 — CJK block used by the correctability filters
_CJK_CLASS = "[一-龥]"
_NON_CJK_CLASS = "[^一-龥]"
# base_corrector.py:124 — ASCII + fullwidth alphabet
_ALPHABET_CLASS = "[a-zA-ZＡ-Ｚａ-ｚ]"


def cjk_count(col: Column) -> Column:
    """Number of CJK chars — len(re.findall(chinese, text)) equivalent."""
    return F.length(F.regexp_replace(col, _NON_CJK_CLASS, ""))


def eligible_keyword(text: Column) -> Column:
    """F1 (base_corrector.py:96-106): >= 2 CJK chars."""
    return cjk_count(text) >= 2


def eligible_bert(text: Column, max_seq_length: int = 64) -> Column:
    """F2 (bert_corrector.py:81-93)."""
    return (
        (~text.rlike(_ALPHABET_CLASS))
        & (cjk_count(text) >= 3)
        & (F.length(text) <= max_seq_length - 2)
    )


def err_positions(text: Column, probs: Column, prob_threshold: float = 0.9) -> Column:
    """F3 (base_corrector.py:75-86,109-119): indices with prob below
    threshold; NULL probs → the non-prob path marks every position."""
    empty = F.array().cast("array<int>")
    idx = F.sequence(F.lit(0), F.size(probs) - 1)
    # guard size==0: sequence(0,-1) would produce a DESCENDING range
    by_prob = F.when(
        F.size(probs) > 0,
        F.filter(idx, lambda i: F.element_at(probs, i + 1) < F.lit(prob_threshold)),
    ).otherwise(empty)
    all_pos = F.when(
        F.length(text) > 0, F.sequence(F.lit(0), F.length(text) - 1)
    ).otherwise(empty)
    return F.when(probs.isNull(), all_pos).otherwise(by_prob)


def err_prob_key(probs: Column, prob_threshold: float = 0.9) -> Column:
    """The probs-only factor of ``err_positions``: the sub-threshold index
    set for non-null probs (empty for empty probs), and NULL for null
    probs.  For every (text, probs):

        err_positions(text, probs, th) == err_from_key(text, err_prob_key(probs, th))

    (tests/test_dedup_correction.py pins the identity).  The key is
    text-extraction-independent, so the dedup plan can compute it natively
    on raw rows and use it as a join key orders of magnitude smaller than
    the probs array itself (plans/pipeline._dedup_correct_pipeline)."""
    empty = F.array().cast("array<int>")
    idx = F.sequence(F.lit(0), F.size(probs) - 1)
    by_prob = F.when(
        F.size(probs) > 0,
        F.filter(idx, lambda i: F.element_at(probs, i + 1) < F.lit(prob_threshold)),
    ).otherwise(empty)
    return F.when(probs.isNull(), F.lit(None).cast("array<int>")).otherwise(by_prob)


def err_from_key(text: Column, key: Column) -> Column:
    """Reconstruct ``err_positions`` from (text, err_prob_key): NULL key
    (null probs) → every position of ``text``; else the key itself."""
    empty = F.array().cast("array<int>")
    all_pos = F.when(
        F.length(text) > 0, F.sequence(F.lit(0), F.length(text) - 1)
    ).otherwise(empty)
    return F.when(key.isNull(), all_pos).otherwise(key)


def with_error_detection(
    df: DataFrame,
    corrector: str = "keyword",
    prob_threshold: float = 0.9,
    max_seq_length: int = 64,
    text_col: str = "text",
    probs_col: str = "probs",
) -> DataFrame:
    """Adds ``eligible`` (correctability pre-filter), ``err_pos``
    (array<int> of low-confidence positions) and ``needs_correction``."""
    text = F.col(text_col)
    probs = F.col(probs_col)
    elig = (
        eligible_keyword(text)
        if corrector == "keyword"
        else eligible_bert(text, max_seq_length)
    )
    df = df.withColumn("eligible", elig)
    df = df.withColumn(
        "err_pos",
        F.when(F.col("eligible"), err_positions(text, probs, prob_threshold)).otherwise(
            F.array().cast("array<int>")
        ),
    )
    return df.withColumn(
        "needs_correction", F.col("eligible") & (F.size("err_pos") > 0)
    )
