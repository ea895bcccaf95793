"""Deterministic synthetic transcripts generator (FIXTURES.md §1).

Generates the driver's input_hint table shape —
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` plus the derived ``probs array<double>`` — entirely with
native Catalyst expressions over ``spark.range``: no driver-side data, no
RNG (hash arithmetic only), so the SAME table materializes at any scale
and any partitioning.  Conversation lengths are skewed (a heavy conv every
``heavy_every`` ids) to exercise the salted reassembly path.

Corpus rows are the reference's golden correction pairs (README examples,
doctest fixtures) noised exactly as documented: confusion-char swaps at
known positions with per-char confidence dipping below 0.9 at those
positions (0.56 / 0.78 are the README's published prob values,
/root/reference/README.md:21,32).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (clean, noisy, err_positions, biz) — biz routes to the corrector the
# reference's registry would pick (config/config.json:1-21:
# 'report' → keyword, 'doc' → bert).
CORPUS: list[tuple[str, str, list[int], str]] = [
    # README.md:17-27
    ("我爱北京天安门", "我爱北京大安门", [4], "doc"),
    # README.md:29-38 / bert_corrector.py doctest
    (
        "本着平等、自愿、诚信、互利的原则，一致同意本合同内容，并共同遵守。",
        "本着平等、白愿、诚信、互利的原则，一致同意本合同内容，并共同遵守。",
        [5],
        "doc",
    ),
    (
        "无效、重大瑕疵或不符合乙方其他规定的债权资产，乙方有权拒绝，不予初始登",
        "无效、重大暇疵或不符合乙方其他规定的债权资产，乙方有权拒绝，不子初始登",
        [5, 31],
        "doc",
    ),
    # masked_lm.py smoke sentence — 苦 stays (traditional guard), 丰→主
    ("国际电台苦名主持人", "国际电台苦名丰持人", [4, 6], "doc"),
    # digit guard: dip at a digit position → unchanged
    ("逾期3天要还", "逾期3天要还", [2], "doc"),
    # traditional + curve rejection → unchanged
    ("一万个文本", "一万个文本", [1], "doc"),
    # clean doc row (no error positions)
    ("本合同内容双方共同遵守", "本合同内容双方共同遵守", [], "doc"),
    # keyword_corrector.py doctests + fixture-2 errors
    ("未还本金", "宋还本全", [0, 3], "report"),
    ("逾期天", "数期大", [0, 2], "report"),
    ("未还本金", "术还本金", [0], "report"),
    # exact-keyword skip
    ("账户状态", "账户状态", [0], "report"),
    # clean keyword rows
    ("五级分类", "五级分类", [], "report"),
    ("剩余还款期数", "剩余还款期数", [], "report"),
    # non-CJK row → correctability filter pass-through
    ("settlement ok", "settlement ok", [], "report"),
]

_HTML_PREFIX = (
    '<html><head><title>t</title><style>.x{color:red}</style></head><body>'
    '<nav class="navbar"><a href="/">首页</a><a href="/a">账户</a></nav>'
    '<div class="content"><p>'
)
_HTML_SUFFIX = (
    "</p></div>"
    '<footer class="footer"><a href="/tos">条款</a> © 2026 example</footer>'
    "</body></html>"
)

# %LAYOUT documents (functions/layout_extract.py serialization): body box
# carries the turn text; the running header repeats on both pages and the
# footers are page numbers, so layout extraction recovers the body exactly.
_LAYOUT_PREFIX = (
    "%LAYOUT v1\n"
    "P0 36 20 559 34 机密文件 信贷报告\n"
    "P0 36 60 559 600 "
)
_LAYOUT_SUFFIX = (
    "\nP0 250 810 345 822 第 1 页\n"
    "P1 36 20 559 34 机密文件 信贷报告\n"
    "P1 250 810 345 822 第 2 页"
)


def corpus_df(spark: SparkSession) -> DataFrame:
    rows = [
        (i, clean, noisy, errs, biz)
        for i, (clean, noisy, errs, biz) in enumerate(CORPUS)
    ]
    return spark.createDataFrame(
        rows, "corpus_idx long, text_clean string, text_noisy string, "
        "err_expected array<int>, biz string"
    )


def gen_transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    heavy_every: int = 97,
    heavy_turns: int = 200,
    html_fraction_denom: int = 5,
    layout_fraction_denom: int = 7,
    keep_oracle_cols: bool = False,
    seed: int = 0,
) -> DataFrame:
    """Deterministic transcripts table; ~n_convs * ~5.5 rows (+ heavy tail).

    ``seed`` is folded into every hash-derived choice (corpus pick, variant
    suffix, html flag) so distinct seeds yield same-shaped but textually
    distinct tables — the bench protocol times each rep on a fresh seed so
    worker-side memoization cannot ride across reps.
    """
    convs = spark.range(n_convs).withColumn(
        "n_turns",
        F.when(F.pmod(F.col("id"), F.lit(heavy_every)) == 0, F.lit(heavy_turns))
        .otherwise((F.pmod(F.col("id") * 2654435761, 1000) % 8 + 1).cast("int")),
    )
    turns = convs.select(
        F.format_string("conv-%06d", F.col("id")).alias("conv_id"),
        F.col("id").alias("_cid"),
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    ).withColumn("turn_idx", F.col("turn_idx").cast("int"))

    pick = F.pmod(
        F.xxhash64(F.col("conv_id"), F.col("turn_idx"), F.lit(seed)), F.lit(len(CORPUS))
    )
    turns = turns.withColumn("corpus_idx", pick)
    df = turns.join(F.broadcast(corpus_df(spark)), "corpus_idx")

    # High-cardinality variant rows (~half): append a unique CJK suffix so
    # the corpus is not a handful of distinct strings — the correction
    # kernels (and their memo) see realistic cardinality.  Error positions
    # stay in the prefix, so the designed corrections still apply on the
    # doc path; keyword-path variants exercise the BK-search miss path.
    suffix = F.concat(
        F.lit("。编号"),
        F.translate(
            F.lpad(
                F.pmod(
                    F.xxhash64("conv_id", "turn_idx", F.lit(13), F.lit(seed)),
                    F.lit(100000),
                ).cast(
                    "string"
                ),
                5,
                "0",
            ),
            "0123456789",
            "零一二三四五六七八九",
        ),
    )
    is_variant = (
        F.pmod(F.xxhash64("conv_id", "turn_idx", F.lit(29), F.lit(seed)), F.lit(2)) == 0
    ) & (F.length("text_noisy") > 4)
    df = df.withColumn(
        "text_noisy",
        F.when(is_variant, F.concat(F.col("text_noisy"), suffix)).otherwise(
            F.col("text_noisy")
        ),
    ).withColumn(
        "text_clean",
        F.when(is_variant, F.concat(F.col("text_clean"), suffix)).otherwise(
            F.col("text_clean")
        ),
    )

    # per-char probs over the INNER (pre-HTML-wrap) noisy text: 0.99
    # everywhere, dipping to the README's published 0.56 at injected errors
    probs = F.when(
        F.length("text_noisy") > 0,
        F.transform(
            F.sequence(F.lit(0), F.length("text_noisy") - 1),
            lambda i: F.when(
                F.array_contains("err_expected", i.cast("int")), F.lit(0.56)
            ).otherwise(F.lit(0.99)),
        ),
    ).otherwise(F.array().cast("array<double>"))
    df = df.withColumn("probs", probs)

    is_html = (
        F.pmod(
            F.xxhash64(F.col("conv_id"), F.col("turn_idx"), F.lit(7), F.lit(seed)),
            F.lit(html_fraction_denom),
        )
        == 0
    )
    df = df.withColumn("is_html", is_html)
    if layout_fraction_denom:
        is_layout = (
            F.pmod(
                F.xxhash64(F.col("conv_id"), F.col("turn_idx"), F.lit(11), F.lit(seed)),
                F.lit(layout_fraction_denom),
            )
            == 0
        ) & ~F.col("is_html")
    else:
        is_layout = F.lit(False)
    df = df.withColumn("is_layout", is_layout)
    df = df.withColumn(
        "text",
        F.when(
            F.col("is_html"),
            F.concat(F.lit(_HTML_PREFIX), F.col("text_noisy"), F.lit(_HTML_SUFFIX)),
        )
        .when(
            F.col("is_layout"),
            F.concat(F.lit(_LAYOUT_PREFIX), F.col("text_noisy"), F.lit(_LAYOUT_SUFFIX)),
        )
        .otherwise(F.col("text_noisy")),
    )

    df = (
        df.withColumn(
            "role",
            F.element_at(
                F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
                (F.pmod(F.col("turn_idx"), F.lit(3)) + 1).cast("int"),
            ),
        )
        .withColumn("tool", F.col("biz"))
        .withColumn(
            # one conv per day, wrapping within a year: unbounded _cid*86400
            # at bench scale (millions of convs) would run past pandas'
            # ns-timestamp ceiling (year 2262)
            "ts",
            F.timestamp_seconds(
                F.lit(1767225600)
                + F.pmod(F.col("_cid"), F.lit(365)) * 86400
                + F.col("turn_idx")
            ),
        )
    )

    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "probs"]
    if keep_oracle_cols:
        cols += ["text_clean", "text_noisy", "err_expected", "is_html", "is_layout"]
    return df.select(*cols)
