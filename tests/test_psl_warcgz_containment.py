"""Round-4 batch: public-suffix eTLD+1, .warc.gz member decode,
n-gram containment pairs."""

import gzip

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- PSL

# (host, expected public_suffix, expected registrable) — covering the
# four PSL rule classes against functions/psl.py::DEFAULT_RULES.
PSL_CASES = [
    ("a.b.example.com", "com", "example.com"),               # normal
    ("shop.acme.co.uk", "co.uk", "acme.co.uk"),              # multi-label beats 'uk'
    ("acme.co.uk", "co.uk", "acme.co.uk"),
    ("co.uk", "co.uk", None),                                # host IS a suffix
    ("deep.x.pages.github.io", "github.io", "pages.github.io"),
    ("www.ck", "ck", "www.ck"),                              # exception !www.ck
    ("sub.www.ck", "ck", "www.ck"),
    ("zz.weird.ck", "weird.ck", "zz.weird.ck"),              # wildcard *.ck
    ("weird.ck", "weird.ck", None),                          # wildcard suffix itself
    # exception rule: suffix = rule minus leftmost label (PSL spec §algorithm)
    ("city.kawasaki.jp", "kawasaki.jp", "city.kawasaki.jp"),
    ("a.b.kawasaki.jp", "b.kawasaki.jp", "a.b.kawasaki.jp"), # wildcard
    ("x.unknowntld", "unknowntld", "x.unknowntld"),          # default rule '*'
    ("unknowntld", "unknowntld", None),
    ("WWW.Example.COM.", "com", "example.com"),              # case + trailing dot
]


def test_registrable_domain_psl_semantics(spark):
    from pyppeteer_scraper_spark.functions.psl import registrable_domain

    df = spark.createDataFrame([(h,) for h, _, _ in PSL_CASES], "host string")
    got = {
        r["host"]: (r["public_suffix"], r["registrable"])
        for r in registrable_domain(df, "host").collect()
    }
    for host, suf, reg in PSL_CASES:
        assert got[host] == (suf, reg), (host, got[host], (suf, reg))


def test_registrable_domain_preserves_other_columns(spark):
    from pyppeteer_scraper_spark.functions.psl import registrable_domain

    df = spark.createDataFrame(
        [("a.example.com", 1), ("b.example.com", 2)], "host string, n int"
    )
    out = registrable_domain(df, "host")
    assert sorted(r["n"] for r in out.collect()) == [1, 2]
    assert set(out.columns) == {"host", "n", "public_suffix", "registrable"}
    # one row in, one row out — the candidate explode must fold back
    assert out.count() == 2


# ----------------------------------------------------------- .warc.gz


def _member(url: str, body: str, rtype: str = "response") -> bytes:
    crlf = "\r\n"
    if rtype == "response":
        block = f"HTTP/1.1 200 OK{crlf}Content-Type: text/html{crlf}{crlf}{body}"
    else:
        block = body
    rec = (
        f"WARC/1.0{crlf}"
        f"WARC-Type: {rtype}{crlf}"
        f"WARC-Target-URI: {url}{crlf}"
        f"WARC-Date: 2026-03-01T00:00:00Z{crlf}"
        f"Content-Length: {len(block.encode())}{crlf}{crlf}"
        f"{block}{crlf}{crlf}"
    )
    return gzip.compress(rec.encode())


def test_warc_gz_member_roundtrip(spark, tmp_path):
    from pyppeteer_scraper_spark.sources.warc import parse_warc_gz

    members = [
        _member("https://a.example/1", "hello <b>one</b>"),
        _member("https://a.example/2", "two body", rtype="conversion"),
        # a body that CONTAINS a line-initial WARC/1.0 — per-member
        # framing makes this safe (each member is exactly one record)
        _member("https://a.example/3", "WARC/1.0\r\nnot a real record"),
    ]
    p = tmp_path / "seg-00000.warc.gz"
    p.write_bytes(b"".join(members))

    raw = spark.read.format("binaryFile").load(str(p))
    recs = parse_warc_gz(raw, id_cols=("path",)).orderBy("member_idx").collect()
    assert [r["member_idx"] for r in recs] == [0, 1, 2]
    assert [r["url"] for r in recs] == [f"https://a.example/{i}" for i in (1, 2, 3)]
    assert recs[0]["record_type"] == "response"
    assert recs[0]["payload"] == "hello <b>one</b>"   # HTTP envelope stripped
    assert recs[1]["record_type"] == "conversion"
    assert recs[1]["payload"] == "two body"           # raw block kept
    assert recs[2]["payload"].startswith("WARC/1.0")  # framing immunity


def test_warc_gz_trailing_garbage_is_dropped(spark, tmp_path):
    from pyppeteer_scraper_spark.sources.warc import split_gzip_members

    p = tmp_path / "trunc.warc.gz"
    p.write_bytes(_member("https://a.example/1", "x") + b"\x1f\x8b\x08GARBAGE")
    raw = spark.read.format("binaryFile").load(str(p))
    out = split_gzip_members(raw).collect()
    assert len(out) == 1 and out[0]["member_idx"] == 0


# ------------------------------------------------------- containment


def test_ngram_containment_embedded_doc(spark):
    from pyppeteer_scraper_spark.operators.dedup import ngram_containment_pairs

    article = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, article),
            (2, "aggregator says : " + article + " end of quote"),
            (3, "totally unrelated text about spark shuffles and joins"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["a"], r["b"]): r
        for r in ngram_containment_pairs(docs, threshold=0.5).collect()
    }
    assert (1, 2) in rows
    r = rows[(1, 2)]
    # every shingle of doc 1 appears in doc 2 → containment_a = 1.0,
    # while Jaccard (n_common/union) is well below 1
    assert r["containment_a"] == pytest.approx(1.0)
    assert r["containment_b"] < 1.0
    assert all(3 not in k for k in rows)


def test_ngram_containment_df_cap_bounds_postings(spark):
    from pyppeteer_scraper_spark.operators.dedup import ngram_containment_pairs

    # 30 docs sharing one boilerplate sentence + unique bodies: with
    # df_cap below 30 the boilerplate shingles drop out entirely and no
    # pair qualifies (the unique bodies share nothing).
    docs = spark.createDataFrame(
        [
            (i, f"copyright two thousand twenty six corp . unique body {i} alpha {i} beta {i}")
            for i in range(30)
        ],
        "doc_id long, text string",
    )
    out = ngram_containment_pairs(docs, df_cap=10, threshold=0.3)
    assert out.count() == 0
