"""HTML extraction + line-level dedup (operators/html.py)."""

import pandas as pd
import pytest

from gdal_spark.operators.html import extract_html, extract_text, line_dedup


# ---------------------------------------------------------------- kernel

def test_extract_basic_blocks():
    text, title, n, dropped = extract_html(
        "<html><head><title>T1</title><style>p{color:red}</style></head>"
        "<body><h1>Head line</h1><p>para one</p><p>para  two\n wrapped</p>"
        "<script>var x = '<p>not text</p>';</script></body></html>"
    )
    assert title == "T1"
    assert text == "Head line\npara one\npara two wrapped"
    assert n == 3 and dropped == 0


def test_entities_and_inline_tags():
    text, _, n, _ = extract_html(
        "<p>a &amp; b &lt;c&gt; <b>bold</b><i>ital</i> &#65;</p>"
    )
    assert text == "a & b <c> boldital A"
    assert n == 1


def test_br_and_void_break_blocks():
    text, _, n, _ = extract_html("<p>one<br>two</p>")
    assert text == "one\ntwo"
    assert n == 2


def test_link_density_drops_nav():
    html = (
        "<div><a href=x>Home</a> <a href=y>About</a> <a href=z>Contact</a>"
        "</div><p>Real content with <a href=w>one link</a> inside a much "
        "longer sentence of prose.</p>"
    )
    full, _, n_full, d0 = extract_html(html)
    assert "Home About Contact" in full and d0 == 0
    text, _, n, dropped = extract_html(html, max_link_density=0.5)
    assert "Home" not in text and "Real content" in text
    assert dropped == 1 and n == n_full - 1


def test_broken_html_is_tolerated():
    # unclosed tags, stray <, bogus entity — must not raise
    text, _, _, _ = extract_html("<p>a < b <div>c &bogus; d")
    assert "c" in text and "d" in text


def test_nested_list_and_table():
    text, _, _, _ = extract_html(
        "<ul><li>x1</li><li>x2</li></ul>"
        "<table><tr><td>c1</td><td>c2</td></tr></table>"
    )
    assert text.split("\n") == ["x1", "x2", "c1", "c2"]


# ------------------------------------------------------------- operators

@pytest.fixture(scope="module")
def html_docs(spark):
    rows = [
        (0, "<html><head><title>Zero</title></head><body>"
            "<nav><a href=/>Home</a> <a href=/a>About</a></nav>"
            "<p>alpha beta</p><p>gamma</p></body></html>"),
        (1, "<body><h2>One</h2><p>alpha &amp; beta</p></body>"),
        (2, "<p>plain</p>"),
        (3, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, html string")


def test_extract_text_df(html_docs):
    out = {
        r["doc_id"]: r
        for r in extract_text(html_docs, max_link_density=0.5).collect()
    }
    assert out[0]["title"] == "Zero"
    assert out[0]["text"] == "alpha beta\ngamma"
    assert out[0]["n_dropped_blocks"] == 1
    assert out[1]["text"] == "One\nalpha & beta"
    assert out[2]["text"] == "plain"
    assert out[3]["text"] == "" and out[3]["n_blocks"] == 0


def test_line_dedup_exact(spark):
    docs = spark.createDataFrame(
        [
            (0, "unique a\nCopyright 2020 Corp\nunique b"),
            (1, "copyright 2020 corp\nonly here"),
            (2, "Copyright 2020 Corp"),
            (3, "solo text"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(docs, min_docs=2).collect()}
    # the copyright line appears (normalized) in 3 docs -> dropped
    assert out[0]["text"] == "unique a\nunique b"
    assert out[0]["n_lines_dropped"] == 1
    assert out[1]["text"] == "only here"
    assert out[2]["text"] == "" and out[2]["n_lines_kept"] == 0
    assert out[3]["text"] == "solo text"


def test_line_dedup_order_preserved(spark):
    n_lines = 40
    body = "\n".join(
        (f"common line" if i % 3 == 0 else f"line {i}")
        for i in range(n_lines)
    )
    docs = spark.createDataFrame(
        [(0, body), (1, "common line")], "doc_id long, text string"
    ).repartition(8)
    out = {r["doc_id"]: r for r in line_dedup(docs, min_docs=2).collect()}
    expect = [f"line {i}" for i in range(n_lines) if i % 3 != 0]
    assert out[0]["text"].split("\n") == expect


def test_line_dedup_no_normalize(spark):
    docs = spark.createDataFrame(
        [(0, "Same\nkeep0"), (1, "same\nkeep1")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in line_dedup(docs, min_docs=2, normalize=False).collect()
    }
    # case differs -> not duplicates when normalize=False
    assert out[0]["text"] == "Same\nkeep0"
    assert out[1]["text"] == "same\nkeep1"


def test_extract_then_line_dedup_composes(spark):
    boiler = "<footer>(c) 2020 MegaCorp - All rights reserved</footer>"
    docs = spark.createDataFrame(
        [(i, f"<p>body text {i}</p>{boiler}") for i in range(4)],
        "doc_id long, html string",
    )
    text_df = extract_text(docs)
    out = {r["doc_id"]: r for r in line_dedup(text_df, min_docs=3).collect()}
    for i in range(4):
        assert out[i]["text"] == f"body text {i}"
        assert out[i]["n_lines_dropped"] == 1
