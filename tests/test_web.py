"""Web-corpus hygiene operators: URL canonicalization/dedup, PII
redaction, NFC cleanup — exact oracles and a no-rogue-Python plan pin."""

import pandas as pd
from pyspark.sql import functions as F

from gdal_spark.operators.web import (
    nfc_clean,
    normalize_url,
    redact_pii,
    registrable_domain,
    url_dedup,
)

CANON = "https://www.example.com/a/b?id=7"
VARIANTS = [
    "https://WWW.Example.COM:443/a/b/?id=7&utm_source=x",
    "https://www.example.com/a/b?utm_campaign=y&id=7",
    "https://www.example.com/a/b/?id=7#frag",
    "https://www.example.com:443/a/b?id=7&fbclid=abc123",
]


def _norm(spark, urls):
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    return [
        r["n"]
        for r in df.select(normalize_url(F.col("url")).alias("n")).collect()
    ]


def test_normalize_url_variants_collapse(spark):
    assert _norm(spark, VARIANTS) == [CANON] * len(VARIANTS)


def test_normalize_url_edge_cases(spark):
    got = _norm(
        spark,
        [
            "http://example.com:80/",       # default port + root path
            "http://example.com",            # no path at all
            "https://h.io:8443/p?z=1&a=2",  # non-default port kept
            "https://h.io/p?",               # empty query dropped
            "http://h.io/a//b///",           # only trailing runs collapse
        ],
    )
    assert got == [
        "http://example.com/",
        "http://example.com/",
        "https://h.io:8443/p?a=2&z=1",
        "https://h.io/p",
        "http://h.io/a//b",
    ]


def test_registrable_domain(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {"url": ["https://a.b.Example.COM/x", "http://localhost/x"]}
        )
    )
    got = [
        r["d"]
        for r in df.select(
            registrable_domain(F.col("url")).alias("d")
        ).collect()
    ]
    assert got == ["example.com", "localhost"]


def test_url_dedup_keeps_min_order_row(spark):
    rows = [(u, i, f"payload{i}") for i, u in enumerate(VARIANTS)]
    rows += [("https://other.net/q", 9, "solo")]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "ts", "body"])
    )
    out = {
        r["url_norm"]: (r["url"], r["ts"], r["body"], r["n_dups"])
        for r in url_dedup(df, "url", "ts").collect()
    }
    assert out[CANON] == (VARIANTS[0], 0, "payload0", 4)
    assert out["https://other.net/q"] == (
        "https://other.net/q", 9, "solo", 1,
    )


def test_url_dedup_partitioning_invariant(spark):
    rows = [
        (f"https://d{i % 7}.com/p?id={i % 7}&utm_source={i}", i)
        for i in range(100)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["url", "ts"]))
    one = url_dedup(df.coalesce(1), "url", "ts").collect()
    many = url_dedup(df.repartition(16), "url", "ts").collect()
    key = lambda r: r["url_norm"]
    assert sorted(one, key=key) == sorted(many, key=key)
    assert all(r["ts"] == r["ts"] % 7 for r in one)  # min doc kept


def test_redact_pii_counts_and_text(spark):
    cases = [
        ("mail bob.smith+x@m.example.org or 10.0.0.1 ok",
         1, 1, "mail <EMAIL> or <IP> ok"),
        ("not an ip 999.999.999.999 or 256.1.1.1", 0, 0,
         "not an ip 999.999.999.999 or 256.1.1.1"),
        ("two a@b.co c@d.io", 2, 0, "two <EMAIL> <EMAIL>"),
        ("edge 255.255.255.255 and 0.0.0.0", 0, 2,
         "edge <IP> and <IP>"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame([c[0] for c in cases], columns=["text"])
    )
    got = {r["text"]: r for r in redact_pii(df).collect()}
    for text, n_e, n_i, red in cases:
        r = got[text]
        assert (r["n_emails"], r["n_ips"], r["text_redacted"]) == (
            n_e, n_i, red,
        ), text


def test_nfc_clean_composes_and_collapses(spark):
    decomposed = "re\u0301sume\u0301"   # e + combining acute (NFD)
    composed = "r\u00e9sum\u00e9"        # precomposed (NFC)
    assert decomposed != composed
    df = spark.createDataFrame(
        pd.DataFrame(
            {"text": [f"  {decomposed}   x\t y ", "plain  ascii", None]}
        )
    )
    got = [r["text_clean"] for r in nfc_clean(df, "text").collect()]
    assert got[0] == f"{composed} x y"
    assert got[1] == "plain ascii"
    assert got[2] is None


def test_web_chain_has_single_shuffle_and_one_udf(spark):
    """Dedup is ONE hash-partition exchange; the only Python in the
    whole chain is the NFC pandas UDF (everything else codegen)."""
    df = spark.createDataFrame(
        pd.DataFrame(
            {"url": VARIANTS * 5, "ts": range(20), "text": ["a  b"] * 20}
        )
    )
    out = nfc_clean(
        redact_pii(url_dedup(df, "url", "ts"), "text"), "text_redacted"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "ArrowEvalPython" in plan  # the one NFC UDF
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python
