"""S2 ingestion analog: OCR-API calls as a bounded-concurrency Spark stage.

The reference's S2 source (api_call/ocr_call.py:32-41 image read →
base64 → HTTP POST; api_call/ali_ocr.py:12-33 request shape) is a
driver-side network side-effect — out of the correctness path by design
(SURVEY.md §2a).  This module is its Spark-shaped skeleton: an ingestion
JOB that turns a table of image blobs into transcript-shaped OCR rows.

Spark shape (the part that matters at 10^12 scale):

* ``mapInPandas`` over the image table — one Arrow batch per task, never a
  per-row ``udf``;
* a per-task ``ThreadPoolExecutor`` bounds IN-FLIGHT CALLS PER TASK; total
  cluster-wide concurrency = tasks x ``max_concurrency_per_task``, so the
  vendor rate limit is controlled by partition count x this knob (I/O-bound
  calls want threads, not processes — the GIL releases on network wait);
* per-row isolation: a failed call yields zero segments plus an ``error``
  string, it never fails the task (keyword_corrector.py:102-106 contract);
* the response → (texts, probs) projection replicates ali_ocr.py:36-53
  (``parse_result``: word per line, charInfo prob/100 per char).

No network exists in this sandbox, so the default ``call_fn`` is a
deterministic fake vendor client producing ali-shaped responses from the
image bytes — the plumbing (batching, concurrency, isolation, projection,
output schema) is real and tested; swap ``call_fn`` for a real HTTP client
(requests.post per ali_ocr.py:13-27) in production.
"""

from __future__ import annotations

import hashlib
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

INGEST_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("seg_idx", IntegerType()),
        StructField("text", StringType()),
        StructField("probs", ArrayType(DoubleType())),
        StructField("error", StringType()),
    ]
)

_FAKE_SEGMENTS = ("本着平等自愿的原则", "未还本金", "逾期天数")


def fake_ocr_call(image_bytes: bytes) -> dict:
    """Deterministic stand-in for the Ali OCR endpoint: an ali-shaped
    response (``prism_wordsInfo[].word`` + ``charInfo[].prob`` in percent,
    ali_ocr.py:36-53) derived from the image bytes' digest.  Images whose
    digest starts with 0xFF raise, exercising the isolation path."""
    digest = hashlib.md5(image_bytes).digest()
    if digest[0] == 0xFF:
        raise ConnectionError("fake vendor 5xx")
    n_segs = 1 + digest[1] % len(_FAKE_SEGMENTS)
    words_info = []
    for s in range(n_segs):
        word = _FAKE_SEGMENTS[(digest[2] + s) % len(_FAKE_SEGMENTS)]
        char_info = [
            {"prob": 56 if digest[(3 + s + i) % 16] % 7 == 0 else 99}
            for i in range(len(word))
        ]
        words_info.append({"word": word, "charInfo": char_info})
    return {"prism_wordsInfo": words_info}


def _parse_result(res: dict):
    """ali_ocr.py:36-53 parse_result: word → text, charInfo prob/100 →
    probs, one (text, probs) per OCR'd line."""
    out = []
    for w in res.get("prism_wordsInfo", []):
        text = w.get("word", "")
        probs = [float(c.get("prob", 0)) / 100.0 for c in w.get("charInfo", [])]
        out.append((text, probs))
    return out


def ocr_ingest(
    images: DataFrame,
    call_fn=None,
    max_concurrency_per_task: int = 4,
    image_col: str = "image",
    id_col: str = "image_id",
) -> DataFrame:
    """images: (image_id string, image binary) → one row per OCR'd segment
    in INGEST_SCHEMA.  ``call_fn(bytes) -> ali-shaped response dict``."""
    fn = call_fn or fake_ocr_call

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with ThreadPoolExecutor(max_workers=max_concurrency_per_task) as pool:
            for pdf in batches:
                ids = pdf[id_col].tolist()
                blobs = pdf[image_col].tolist()

                def one(blob):
                    try:
                        return _parse_result(fn(bytes(blob))), None
                    except Exception as exc:  # isolation: call fails, row survives
                        return [], f"{type(exc).__name__}: {exc}"

                results = list(pool.map(one, blobs))
                rows = []
                for img_id, (segs, err) in zip(ids, results):
                    if err is not None:
                        rows.append((img_id, -1, None, None, err))
                    for i, (text, probs) in enumerate(segs):
                        rows.append((img_id, i, text, probs, None))
                yield pd.DataFrame(
                    rows, columns=[f.name for f in INGEST_SCHEMA.fields]
                )

    return images.mapInPandas(process, INGEST_SCHEMA)
