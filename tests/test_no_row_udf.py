"""The repo bans per-row Python UDFs (BASELINE.json input_hint: 'vectorized
pandas/Arrow UDFs (no per-row Python) throughout').  Grep-enforce it: every
UDF in the package must be a pandas_udf / mapInPandas / mapInArrow /
applyInPandas* form."""

import re
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "ocr_corrector_spark"

ROW_UDF = re.compile(r"(?<![a-zA-Z_.])(?:F\.udf|functions\.udf|sf\.udf)\s*\(")


def test_no_per_row_udf_anywhere():
    offenders = []
    for py in PKG.rglob("*.py"):
        src = py.read_text()
        for m in ROW_UDF.finditer(src):
            line_no = src[: m.start()].count("\n") + 1
            offenders.append(f"{py.relative_to(PKG.parent)}:{line_no}")
    assert offenders == [], f"per-row F.udf found at: {offenders}"


def test_no_rdd_in_hot_path():
    # RDD API only permissible in comments/docstrings; the engine is
    # DataFrame-first.  (sparkContext.broadcast / accumulator are fine.)
    offenders = []
    for py in PKG.rglob("*.py"):
        for i, line in enumerate(py.read_text().splitlines(), 1):
            stripped = line.split("#")[0]
            if re.search(r"\.rdd\b|\.mapPartitions\(|\.flatMap\(", stripped):
                offenders.append(f"{py.relative_to(PKG.parent)}:{i}")
    assert offenders == [], f"RDD usage found at: {offenders}"
