"""Reference-shaped OCR sources (SURVEY.md §2a S1/S3).

S1: golden fixture loader — the reference's demo path reads
``{"texts": [...], "probs": [[...]]}`` JSON (demo.py:24-34;
corrector/data/{1,2}_ocr_result.json) as parallel lists.  Here the pair
explodes into one row per OCR line with a stable ``line_idx`` — the
positional identity the reference keeps implicitly (SURVEY.md §1).

S3: Ali-OCR result projection — flattens the vendor response
(api_call/ali_ocr.py:36-53: ``prism_wordsInfo[].word`` → text,
``charInfo[].prob / 100`` → probs) with pure Catalyst expressions
(explode + transform), no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_ocr_fixture(spark: SparkSession, path: str) -> DataFrame:
    """S1: one row per OCR line: (line_idx int, text string,
    probs array<double>)."""
    raw = spark.read.option("multiLine", "true").json(path)
    zipped = raw.select(
        F.posexplode(F.arrays_zip(F.col("texts"), F.col("probs"))).alias(
            "line_idx", "z"
        )
    )
    return zipped.select(
        F.col("line_idx").cast("int"),
        F.col("z.texts").alias("text"),
        F.col("z.probs").cast("array<double>").alias("probs"),
    )


def parse_ali_result(df: DataFrame) -> DataFrame:
    """S3: vendor-response projection.  Expects the documented response
    shape ``prism_wordsInfo: array<struct<word:string,
    charInfo:array<struct<prob:long,...>>>>`` (ali_ocr.py:36-53)."""
    lines = df.select(
        F.posexplode(F.col("prism_wordsInfo")).alias("line_idx", "w")
    )
    return lines.select(
        F.col("line_idx").cast("int"),
        F.col("w.word").alias("text"),
        F.transform(
            F.col("w.charInfo"), lambda c: c.getField("prob").cast("double") / 100.0
        ).alias("probs"),
    )
