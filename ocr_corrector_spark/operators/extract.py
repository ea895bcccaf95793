"""Spark wrapper for the HTML main-content extractor.

The pure kernel lives in functions/html_extract.py (pyspark-free, so the
pickled UDF drags only light modules into the Python workers); this module
holds the DataFrame-facing operator.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..functions.html_extract import extract_main_content

__all__ = ["extract_main_content", "with_extraction"]


def with_extraction(df: DataFrame, text_col: str = "text", out_col: str = "text") -> DataFrame:
    @F.pandas_udf(StringType())
    def extract_udf(text: pd.Series) -> pd.Series:
        return text.map(extract_main_content)

    return df.withColumn(out_col, extract_udf(F.col(text_col)))
