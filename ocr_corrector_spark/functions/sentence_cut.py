"""Sentence cutting for offline corpus prep (SURVEY.md §2c T13).

Parity with the reference's training-corpus splitter
(/root/reference/corrector/bert_modeling/create_data.py:6-28):

* long lines split after the terminal punctuation 。；？！ — but NOT when
  the terminator sits inside double quotes (quote-aware);
* additionally split after a comma ，/, when the accumulated segment is
  already >= ``comma_min`` chars (lookahead rule);
* segments shorter than ``min_len`` are merged forward.

Pure function; the Spark job form is a flatMap-style ``mapInPandas`` over
a corpus table (operators: one input line → n sentence rows).
"""

from __future__ import annotations

import pandas as pd  # module-level so pyspark can resolve the UDF type hints

_TERMINALS = set("。；？！")
_COMMAS = set("，,")
_QUOTES = {"“": 1, "”": -1}


def cut_sentences(line: str, comma_min: int = 20, min_len: int = 5) -> list[str]:
    """Split one line into sentence segments."""
    segments: list[str] = []
    buf: list[str] = []
    quote_depth = 0
    for ch in line:
        buf.append(ch)
        quote_depth += _QUOTES.get(ch, 0)
        if quote_depth < 0:
            quote_depth = 0
        if quote_depth == 0 and (
            ch in _TERMINALS or (ch in _COMMAS and len(buf) >= comma_min)
        ):
            segments.append("".join(buf))
            buf = []
    if buf:
        segments.append("".join(buf))
    # merge too-short segments forward (create_data.py keeps fragments with
    # their successor so the corpus has no stub sentences)
    merged: list[str] = []
    for seg in segments:
        if merged and len(merged[-1]) < min_len:
            merged[-1] += seg
        else:
            merged.append(seg)
    if len(merged) >= 2 and len(merged[-1]) < min_len:
        last = merged.pop()
        merged[-1] += last
    return merged


def cut_corpus_df(df, text_col: str = "text", out_col: str = "sentence"):
    """Spark flatMap form: one row per cut sentence, with the source row's
    position retained.  Arrow-batched pandas UDF (one Python transfer per
    batch) — the repo bans per-row ``F.udf`` everywhere (SURVEY.md §4,
    enforced by tests/test_no_row_udf.py)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, StringType

    @F.pandas_udf(ArrayType(StringType()))
    def cut_udf(t: pd.Series) -> pd.Series:
        return t.map(lambda x: cut_sentences(x) if x else [])

    return df.select(
        "*", F.posexplode(cut_udf(F.col(text_col))).alias("sentence_idx", out_col)
    )
