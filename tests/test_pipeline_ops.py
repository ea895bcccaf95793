"""Structural invariants for the training-data pipeline operators added in
round 3 (packing, stratified sampling, TF-IDF ranking, decontamination,
group-representative selection).  The value-level checks live in
tests/test_entry_oracle.py; these pin the properties the oracle hash can't
see (monotonicity, nesting, exactly-one-keep)."""

import os

from pyspark.sql import functions as F

from ocr_corrector_spark.operators import sqlops

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_DIR", "/root/testdata/sf0.01")


def test_pack_sequences_monotone_and_zero_based(spark):
    out = sqlops.q_pack_sequences(spark, SF_DIR).collect()
    by_source = {}
    for r in out:
        by_source.setdefault(r.source, []).append(r)
    for source, rows in by_source.items():
        rows.sort(key=lambda r: r.doc_id)
        # first doc of every shard starts pack 0; pack ids never decrease
        assert rows[0].pack_id == 0, source
        packs = [r.pack_id for r in rows]
        assert packs == sorted(packs), source
        # a pack boundary is crossed only when the running total passes the
        # budget: tokens strictly before the first doc of pack p are >= p*B
        cum = 0
        for r in rows:
            assert r.pack_id == cum // sqlops.PACK_BUDGET_TOKENS
            cum += r.n_tokens


def test_stratified_sample_deterministic_and_gated(spark):
    out = sqlops.q_stratified_sample(spark, SF_DIR)
    rows = {(r.doc_id, r.lang, r.bucket) for r in out.collect()}
    again = {(r.doc_id, r.lang, r.bucket) for r in out.collect()}
    assert rows == again  # no rand() anywhere
    for _, lang, bucket in rows:
        limit = (
            sqlops.SAMPLE_RATE_EN if lang == "en" else sqlops.SAMPLE_RATE_OTHER
        )
        assert 0 <= bucket < limit


def test_tfidf_top_terms_ranked(spark):
    out = sqlops.q_tfidf_top_terms(spark, SF_DIR).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rows in per_doc.items():
        rows.sort(key=lambda r: r.rk)
        assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= sqlops.TFIDF_TOP_K
        scores = [r.tfidf for r in rows]
        assert scores == sorted(scores, reverse=True), doc_id


def test_decontaminate_excludes_eval_and_flags_consistently(spark):
    from ocr_corrector_spark.sources.tables import load_table

    out = sqlops.q_decontaminate(spark, SF_DIR)
    rows = out.collect()
    eval_ids = {
        r.doc_id
        for r in load_table(spark, SF_DIR, "documents")
        .filter(F.col("source") == sqlops.DECON_EVAL_SOURCE)
        .select("doc_id")
        .collect()
    }
    assert eval_ids, "fixture must contain eval-source docs"
    assert not ({r.doc_id for r in rows} & eval_ids)
    assert any(r.contaminated == 1 for r in rows), (
        "synthetic corpus repeats 5-grams; expected at least one hit"
    )
    for r in rows:
        assert (r.n_shared_grams > 0) == (r.contaminated == 1)


def test_group_representative_exactly_one_keep_per_group(spark):
    rows = sqlops.q_group_representative(spark, SF_DIR).collect()
    groups = {}
    for r in rows:
        groups.setdefault(r.group_id, []).append(r)
    assert groups
    for gid, members in groups.items():
        kept = [r for r in members if r.keep == 1]
        assert len(kept) == 1, gid
        best = max(members, key=lambda r: (r.n_tokens, -r.doc_id))
        assert kept[0].doc_id == best.doc_id
