"""Markup-extraction group: link inventory, per-domain rollup, link-graph
PageRank step, and markdown rendering.  Value correctness is pinned by the
DuckDB oracle pairs (tests/test_entry_oracle.py); these tests pin the
structural invariants and the plan shapes the 100TB design depends on."""

from __future__ import annotations

import os
import re

from pyspark.sql import functions as F

from ocr_corrector_spark.operators import sqlops

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_DIR", "/root/testdata/sf0.01")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_link_extract_shape(spark):
    links = sqlops.q_link_extract(spark, SF_DIR)
    n_docs = sqlops.load_table(spark, SF_DIR, "documents").count()
    rows = links.collect()
    # template nav (2) + generated (LINKS_PER_DOC) + footer (1) per page
    assert len(rows) == n_docs * (3 + sqlops.LINKS_PER_DOC)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc, rs in by_doc.items():
        rs.sort(key=lambda r: r.link_pos)
        assert [r.href for r in rs[:2]] == ["/", "/a"], rs
        assert rs[-1].href == "/tos"
        for k, r in enumerate(rs[2:-1]):
            assert r.anchor == f"ref-{k}"
            assert re.fullmatch(
                r"https://site-\d+\.example\.com/doc/\d+", r.href
            ), r.href


def test_link_extract_is_scan_local(spark):
    # extraction is row-local regexp work: the executed plan must carry
    # no shuffle Exchange at all — it scales with the scan or not at all
    plan = _plan(sqlops.q_link_extract(spark, SF_DIR))
    assert "Exchange" not in plan, plan


def test_markdownify_renders_links_and_strips_tags(spark):
    md = sqlops.q_markdownify(spark, SF_DIR)
    rows = md.limit(50).collect()
    assert rows
    for r in rows:
        assert "<" not in r.md and ">" not in r.md, r.md
        assert "[ref-0](https://site-" in r.md
        # nav/footer boilerplate text must be gone
        assert "首页" not in r.md and "example" not in r.md.split("[")[0]
    plan = _plan(md)
    assert "Exchange" not in plan, plan


def test_domain_stats_partition_by_host(spark):
    stats = sqlops.q_domain_stats(spark, SF_DIR).collect()
    assert 0 < len(stats) <= sqlops.LINK_SITES
    n_docs = sqlops.load_table(spark, SF_DIR, "documents").count()
    assert sum(r.n_links for r in stats) == n_docs * sqlops.LINKS_PER_DOC
    for r in stats:
        assert re.fullmatch(r"site-\d+\.example\.com", r.host)
        assert r.n_docs <= r.n_links


def test_link_graph_mass_conservation(spark):
    g = sqlops.q_link_graph(spark, SF_DIR)
    rows = g.collect()
    assert rows
    # every rank carries the 0.15 teleport floor and each edge
    # contributes 1/outdeg: total distributed mass equals the number of
    # linking docs (sum over src of outdeg * 1/outdeg)
    assert all(r.rank_1 >= 0.15 for r in rows)
    docs = sqlops.load_table(spark, SF_DIR, "documents").select("doc_id")
    n_src = docs.count()
    mass = sum(r.rank_1 - 0.15 for r in rows) / 0.85
    # every src keeps at least one edge (distinct targets mod 500, all
    # targets < 500 exist at sf >= 0.01), so distributed mass == n_src
    assert abs(mass - n_src) < 1e-3, (mass, n_src)
    assert all(r.in_degree >= 1 for r in rows)


def test_url_canonicalize_collapses_variants(spark):
    rows = sqlops.q_url_canonicalize(spark, SF_DIR).collect()
    assert rows
    assert any(r.n_variants > 1 for r in rows), (
        "noise fixture should produce multiple variants of some target"
    )
    for r in rows:
        assert "#" not in r.canonical_url
        assert "utm_" not in r.canonical_url
        assert not r.canonical_url.endswith("/")
        assert 1 <= r.n_variants <= r.n_links
        assert 1 <= r.n_docs <= r.n_links


def test_anchor_stats_consistent(spark):
    rows = sqlops.q_anchor_stats(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r.top_anchor_n <= r.n_links
        assert 1 <= r.n_docs <= r.n_links
        assert r.top_anchor.startswith("ref-") or r.top_anchor
