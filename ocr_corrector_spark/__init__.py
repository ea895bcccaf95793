"""ocr_corrector_spark — a PySpark-native OCR text-correction + extraction engine.

Brand-new engine with the query/data-processing capabilities of the reference
repo tiantian91091317/OCR-Corrector (read-only at /root/reference), re-designed
Spark-first: declarative DataFrame plans for everything Catalyst can express,
Arrow-batched pandas UDFs for the per-character correction kernels, and
explicit skew/partitioning handling for web-scale (10^12-turn) inputs.

Layout
------
functions/  pure-Python kernels (edit distance, glyph similarity, BK-tree,
            filter curves) — no Spark imports; unit-testable against the
            reference's doctest goldens.
assets/     static dictionaries (keyword list, synthetic char_meta, the
            deterministic masked-LM stand-in scorer table).
operators/  DataFrame-level operators (detect, correct, extract, reassemble,
            dedup, similarity, text stats).
sources/    synthetic transcripts generator + testdata table loaders.
plans/      end-to-end pipelines (flagship correction plan, audit, checkpoint).
streaming/  Structured Streaming variants.
oracle/     pure-Python row-at-a-time re-implementation of the reference's
            semantics, used as the per-turn equality oracle in tests.
"""

__version__ = "0.1.0"
