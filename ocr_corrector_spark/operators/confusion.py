"""Offline confusion-statistics job (SURVEY.md §2e A3).

The reference's training-data prep counts (wrong_char, correct_char)
confusion pairs, finds each correct char's top confusion, and derives a
mask probability ``min(top_confusion_count / correct_occurrences, 1.0)``
(/root/reference/corrector/bert_modeling/create_data.py:79-160) — all in
driver-side dicts.  Here it is the engine's first pure-SQL aggregate
pipeline: groupBy counts + a row_number window + a broadcast-joinable
occurrence table.  Output feeds the deterministic scorer table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def confusion_pair_counts(pairs: DataFrame) -> DataFrame:
    """pairs: (wrong_char string, correct_char string) one row per observed
    confusion.  Returns (wrong_char, correct_char, n)."""
    return pairs.groupBy("wrong_char", "correct_char").agg(
        F.count(F.lit(1)).alias("n")
    )


def top_confusions(pair_counts: DataFrame, k: int = 1) -> DataFrame:
    """Per correct_char, its k most frequent confusions (deterministic
    tie-break on wrong_char) — create_data.py:123-137."""
    w = Window.partitionBy("correct_char").orderBy(F.desc("n"), F.asc("wrong_char"))
    return (
        pair_counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


def mask_probabilities(
    pair_counts: DataFrame, occurrences: DataFrame
) -> DataFrame:
    """create_data.py:139-147: mask_prob(correct_char) =
    min(top_confusion_n / occurrences, 1.0).  ``occurrences``:
    (correct_char, n_occ)."""
    top = top_confusions(pair_counts, k=1).select(
        "correct_char", F.col("n").alias("top_n")
    )
    joined = top.join(F.broadcast(occurrences), "correct_char", "inner")
    return joined.select(
        "correct_char",
        F.least(F.col("top_n") / F.col("n_occ"), F.lit(1.0)).alias("mask_prob"),
    )


def char_occurrences(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-char occurrence counts over a text corpus — explode each string
    into chars natively (split on empty pattern)."""
    chars = corpus.select(
        F.explode(F.split(F.col(text_col), "")).alias("correct_char")
    ).filter(F.length("correct_char") > 0)
    return chars.groupBy("correct_char").agg(F.count(F.lit(1)).alias("n_occ"))


def confusion_pairs_from_parallel(
    df: DataFrame, noisy_col: str = "text_noisy", clean_col: str = "text_clean"
) -> DataFrame:
    """Extract (wrong_char, correct_char) observations from parallel
    noisy/clean text — the engine-side analog of the reference's
    training-data diffing (create_data.py:79-160's input pairs), done
    entirely with native array expressions: zip the char streams, keep
    positions where they differ.  Length-mismatched rows are skipped
    (substitution-only confusion model, same as the reference)."""
    same_len = F.length(noisy_col) == F.length(clean_col)
    zipped = F.arrays_zip(
        F.split(F.col(noisy_col), ""), F.split(F.col(clean_col), "")
    )
    diffs = F.filter(
        zipped, lambda z: (z["0"] != z["1"]) & (F.length(z["0"]) > 0)
    )
    return (
        df.filter(same_len)
        .select(F.explode(diffs).alias("d"))
        .select(
            F.col("d.0").alias("wrong_char"), F.col("d.1").alias("correct_char")
        )
    )


def scorer_table_from_stats(
    pair_counts: DataFrame, topn: int = 3
) -> DataFrame:
    """Build the deterministic scorer table (M4) from confusion statistics:
    per observed char, its top-n correction candidates with pseudo-
    probabilities proportional to observation counts — the offline job
    whose output broadcast-feeds the correction UDF's scorer."""
    from pyspark.sql import Window

    w = Window.partitionBy("wrong_char").orderBy(
        F.desc("n"), F.asc("correct_char")
    )
    total = Window.partitionBy("wrong_char")
    return (
        pair_counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= topn)
        .withColumn("prob", F.round(F.col("n") / F.sum("n").over(total), 6))
        .select("wrong_char", "correct_char", "prob", "rk")
    )
