"""End-to-end correction plan (SURVEY.md §3 EP2, Spark shape).

Stages:
  scan → extraction (Arrow UDF, HTML rows only in effect)
       → native detect (F1-F3 Catalyst expressions)
       → per-biz correction (Arrow UDF with broadcast dictionaries)
       → stable (conv_id, turn_idx) ordering (range-partitioned, skew-safe)

The per-biz dispatch mirrors the reference's corrector registry
(corrector/__init__.py:20-38: biz 'report' → keyword corrector, 'doc' →
BERT corrector) as ONE declarative plan: both correction columns are
computed by vectorized UDFs whose kernels no-op unless the row's
``needs_correction`` flag for that corrector is set, and a CASE picks the
right one — no per-row object dispatch, no DataFrame split/merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.correct import with_correction
from ..operators.detect import with_error_detection
from ..operators.extract import with_extraction
from ..operators.reassemble import order_turns


def correct_pipeline(
    df: DataFrame,
    spark: SparkSession,
    biz_col: str = "tool",
    extract_html: bool = True,
    prob_threshold: float = 0.9,
    keyword_similarity_threshold: float = 0.55,
    order_output: bool = True,
) -> DataFrame:
    """Adds ``text_corrected`` (+ ``text`` rewritten by extraction)."""
    if extract_html:
        df = with_extraction(df)

    is_report = F.col(biz_col) == F.lit("report")

    kw = with_error_detection(df, corrector="keyword", prob_threshold=prob_threshold)
    kw = kw.withColumn("needs_correction", F.col("needs_correction") & is_report)
    kw = with_correction(
        kw,
        corrector="keyword",
        similarity_threshold=keyword_similarity_threshold,
        spark=spark,
        out_col="_kw_corrected",
    ).drop("eligible", "err_pos", "needs_correction")

    bert = with_error_detection(kw, corrector="bert", prob_threshold=prob_threshold)
    bert = bert.withColumn("needs_correction", F.col("needs_correction") & ~is_report)
    out = with_correction(
        bert, corrector="bert", spark=spark, out_col="_bert_corrected"
    ).drop("eligible", "err_pos", "needs_correction")

    out = out.withColumn(
        "text_corrected",
        F.when(is_report, F.col("_kw_corrected")).otherwise(F.col("_bert_corrected")),
    ).drop("_kw_corrected", "_bert_corrected")

    if order_output:
        out = order_turns(out)
    return out


def changed_rows(df: DataFrame) -> DataFrame:
    """The demo.py:67-70 diff report: rows the corrector changed."""
    return df.filter(F.col("text") != F.col("text_corrected"))


def flagship(spark: SparkSession, n_convs: int = 200) -> DataFrame:
    """Flagship query: generate the synthetic transcripts table, run
    extraction + correction, return changed rows in stable turn order."""
    from ..sources.transcripts import gen_transcripts

    df = gen_transcripts(spark, n_convs=n_convs)
    out = correct_pipeline(df, spark)
    return changed_rows(out).select(
        "conv_id", "turn_idx", "role", "tool", "text", "text_corrected"
    )
