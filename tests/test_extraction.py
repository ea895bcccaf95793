"""Extraction-stage goldens (FIXTURES.md §8 — driver-mandated stage)."""

from ocr_corrector_spark.operators.extract import extract_main_content
from ocr_corrector_spark.sources.transcripts import _HTML_PREFIX, _HTML_SUFFIX


def test_passthrough_plain_text():
    assert extract_main_content("未还本金") == "未还本金"
    assert extract_main_content("a < b and c > d") == "a < b and c > d"
    assert extract_main_content(None) is None


def test_strip_nav_footer_boilerplate():
    html = (
        "<nav><a href='/'>home</a><a href='/x'>x</a></nav>"
        '<div class="content">本着平等、自愿、诚信、互利的原则</div>'
        "<footer>© 2026 corp</footer>"
    )
    assert extract_main_content(html) == "本着平等、自愿、诚信、互利的原则"


def test_datagen_wrapper_roundtrip():
    inner = "我爱北京大安门"
    assert extract_main_content(_HTML_PREFIX + inner + _HTML_SUFFIX) == inner


def test_drop_script_style():
    html = "<body><script>var x=1;</script><p>正文内容在此处</p><style>p{}</style></body>"
    assert extract_main_content(html) == "正文内容在此处"


def test_link_density_boilerplate_dropped():
    html = (
        "<div><a href='1'>l1</a> <a href='2'>l2</a> <a href='3'>l3</a></div>"
        "<div>this is the real article body with plenty of prose text</div>"
    )
    assert (
        extract_main_content(html)
        == "this is the real article body with plenty of prose text"
    )


def test_boilerplate_class_tokens():
    html = (
        '<div class="sidebar-widget">ads here</div>'
        "<p>主内容段落，足够长的正文文本</p>"
        '<div id="cookie-banner">accept cookies</div>'
    )
    assert extract_main_content(html) == "主内容段落，足够长的正文文本"


def test_never_lose_document():
    # everything boilerplate → largest block is still returned
    html = "<nav>only nav text here</nav>"
    assert extract_main_content(html) == "only nav text here"


def test_malformed_html_degrades_to_tag_strip():
    html = "<div><p>text &amp; more"  # unclosed — parser may or may not cope
    out = extract_main_content(html)
    assert "text" in out and "<" not in out


def test_pdf_branch_isolates_undecodable_rows():
    # A %PDF- prefixed row whose body carries CJK / U+FFFD chars (binary
    # bytes read as UTF-8 text) must pass through unchanged — the latin-1
    # encode inside the PDF branch must never escape the per-row isolation
    # guard (ADVICE r01).
    from ocr_corrector_spark.operators.extract import extract_any

    for t in ("%PDF-1.4 宋体", "%PDF-1.7 ��stream", "%PDF-"):
        assert extract_any(t) == t
