"""Bigram-LM perplexity + exact log2 length histogram: structural
invariants and the broadcast plan shape (values are pinned by the DuckDB
oracle pairs in tests/test_entry_oracle.py)."""

from __future__ import annotations

import math
import os

from ocr_corrector_spark.operators import sqlops

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_DIR", "/root/testdata/sf0.01")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_lm_perplexity_scores_every_multiword_doc(spark):
    out = sqlops.q_lm_perplexity(spark, SF_DIR)
    rows = out.collect()
    docs = sqlops.load_table(spark, SF_DIR, "documents")
    n_multi = docs.filter("size(split(text, ' ')) >= 2").count()
    assert len(rows) == n_multi
    # smoothing keeps every probability in (0, 1): nll strictly positive,
    # and bounded above by the unseen-pair ceiling ln((cu + a*V)/a)
    assert all(r.avg_nll > 0 for r in rows)
    assert all(r.n_bigrams >= 1 for r in rows)


def test_lm_perplexity_count_tables_broadcast(spark):
    # the corpus-sized bigram stream must pass through BROADCAST joins
    # against the vocab-bounded count tables — a shuffle join here would
    # reshuffle the whole corpus by token at 100TB
    plan = _plan(sqlops.q_lm_perplexity(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_length_histogram_buckets_exact(spark):
    rows = sqlops.q_length_histogram(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # bucket boundaries are exact powers of two
        assert 2**r.log2_bucket <= r.min_chars
        assert r.max_chars < 2 ** (r.log2_bucket + 1)
        assert r.log2_bucket == int(math.floor(math.log2(r.min_chars)))
    docs = sqlops.load_table(spark, SF_DIR, "documents")
    assert sum(r.n_docs for r in rows) == docs.filter("n_chars > 0").count()


def test_char_entropy_is_scan_local_and_bounded(spark):
    df = sqlops.q_char_entropy(spark, SF_DIR)
    plan = _plan(df)
    assert "Exchange" not in plan, plan
    rows = df.collect()
    docs = (
        sqlops.load_table(spark, SF_DIR, "documents")
        .filter("text IS NOT NULL AND length(text) > 0")
        .count()
    )
    assert len(rows) == docs
    for r in rows:
        # 0 <= H <= ln(n_distinct) (uniform bound)
        assert -1e-9 <= r.entropy <= math.log(r.n_distinct) + 1e-9, r


def test_char_entropy_edge_parity_with_oracle(spark, tmp_path):
    """Empty-text docs emit no row (matching DuckDB's unnest+GROUP BY) and
    supplementary-plane chars count once per code point on BOTH engines —
    the two edge cases the shared sf0.01 fixtures never exercise."""
    import duckdb

    import __spark_entry__ as entry_mod

    docs = spark.createDataFrame(
        [
            (0, "aab", "s", 3),
            (1, "", "s", 0),                # empty: no output row
            (2, "a\U0001F600\U0001F600b", "s", 4),  # emoji = 1 code point
            (3, None, "s", 0),              # null: no output row
        ],
        "doc_id long, text string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {
        r.doc_id: (r.n_distinct, r.entropy)
        for r in sqlops.q_char_entropy(spark, str(tmp_path)).collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    oracle = {
        r[0]: (r[1], r[2])
        for r in con.execute(entry_mod.oracle_sql()["char_entropy"]).fetchall()
    }
    con.close()

    assert set(rows) == set(oracle) == {0, 2}
    for doc_id in rows:
        assert rows[doc_id][0] == oracle[doc_id][0]
        assert abs(rows[doc_id][1] - oracle[doc_id][1]) < 1e-9


def test_zipf_fit_single_dimension_frame(spark):
    row = sqlops.q_zipf_fit(spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    assert r.n_vocab >= 2
    # more-frequent-at-lower-rank ⇒ non-positive slope
    assert r.zipf_slope <= 0


def test_dup_ngram_coverage_bounds(spark):
    rows = sqlops.q_dup_ngram_coverage(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_dup_grams <= r.n_grams
        assert abs(r.dup_frac - round(r.n_dup_grams / r.n_grams, 6)) < 1e-9
    # the synthetic corpus repeats template phrases: some doc must dup
    assert any(r.n_dup_grams > 0 for r in rows)


def test_ivfpq_query_side_frames_broadcast(spark):
    # the probe set and the ADC table are query-side and tiny: they must
    # broadcast; the candidate restriction must be a semi-join on codes
    # (the corpus-sized side) — a shuffle of full vectors would defeat
    # the bytes-per-vector PQ scan
    df = sqlops.q_ivfpq_topk(spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan
    rows = df.collect()
    assert len(rows) == 10
    dists = [r.adc_dist for r in rows]
    assert dists == sorted(dists)


def test_quality_classifier_scan_local_and_consistent(spark):
    """Model inference via the hashing trick is a pure scan-stage
    projection: ZERO wide stages; keep == (score_sum >= 0); weights stay
    in [-500, 499] so |score_sum| <= 500 * n_words."""
    df = sqlops.q_quality_classifier(spark, SF_DIR)
    plan = _plan(df)
    assert "Exchange" not in plan, plan
    rows = df.collect()
    assert rows
    kept = sum(r.keep for r in rows)
    assert 0 < kept < len(rows), "fixture should split both ways"
    for r in rows:
        assert r.keep == (1 if r.score_sum >= 0 else 0)
        assert abs(r.score_sum) <= 500 * r.n_words
        assert 0.0 <= r.prob <= 1.0


def test_image_ahash_dedup_buckets(spark):
    """aHash is a near-dup primitive: identical synthetic images (same
    (width, height, ahash)) count each other; every doc appears once."""
    from ocr_corrector_spark.operators.multimodal import q_image_ahash

    rows = q_image_ahash(spark, SF_DIR).collect()
    docs = {r.doc_id for r in rows}
    assert len(rows) == len(docs)
    by_key = {}
    for r in rows:
        by_key.setdefault((r.width, r.height, r.ahash), []).append(r)
    for key, members in by_key.items():
        assert all(m.n_same_hash == len(members) for m in members), key
        # hash fits the pixel-count bit budget
        w, h, ah = key
        assert 0 <= ah < (1 << (w * h)), key
