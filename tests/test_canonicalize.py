import pandas as pd

from pyppeteer_scraper_spark.functions.canonicalize import (
    canonicalize_series,
    canonicalize_url,
)


def test_rules():
    cases = {
        "https://A.Example.COM/p1": "https://a.example.com/p1",
        "https://a.example.com:443/p1": "https://a.example.com/p1",
        "http://a.example.com:80/p1": "http://a.example.com/p1",
        "http://a.example.com:8080/p1": "http://a.example.com:8080/p1",
        "https://a.example.com/p1/": "https://a.example.com/p1",
        "https://a.example.com/p1//": "https://a.example.com/p1",
        "https://a.example.com/p1#frag": "https://a.example.com/p1",
        "https://a.example.com/p1?utm_source=x": "https://a.example.com/p1",
        "https://a.example.com/p1?utm_source=x&q=2": "https://a.example.com/p1?q=2",
        "https://a.example.com/p1?q=2&utm_medium=m&utm_source=x": "https://a.example.com/p1?q=2",
        "https://a.example.com/p1?fbclid=abc": "https://a.example.com/p1",
        "https://a.example.com/": "https://a.example.com",
        "  https://a.example.com/p1 ": "https://a.example.com/p1",
        "not a url": "not a url",
    }
    got = canonicalize_series(pd.Series(list(cases.keys())))
    for (raw, want), g in zip(cases.items(), got):
        assert g == want, f"{raw!r}: got {g!r} want {want!r}"


def test_scalar_matches_series():
    urls = [
        "https://MEGA-HOST.example/p7?utm_source=x#f",
        "http://site-3.example:80/p9/",
    ]
    series = list(canonicalize_series(pd.Series(urls)))
    for u, s in zip(urls, series):
        assert canonicalize_url(u) == s


def test_spark_udf_and_hash(spark):
    from pyspark.sql import functions as F

    from pyppeteer_scraper_spark.functions.canonicalize import with_canonical_url

    df = spark.createDataFrame(
        [
            ("https://Mega-Host.example/p7/",),
            ("https://mega-host.example/p7?utm_source=x",),
            ("https://mega-host.example/p7",),
            ("https://site-3.example/p9",),
        ],
        ["url"],
    )
    out = with_canonical_url(df).select("url", "url_hash", "host", "domain").collect()
    canon = {r["url"] for r in out}
    assert canon == {"https://mega-host.example/p7", "https://site-3.example/p9"}
    hashes = {r["url"]: r["url_hash"] for r in out}
    assert len(set(hashes.values())) == 2
    doms = {r["domain"] for r in out}
    assert doms == {"mega-host.example", "site-3.example"}
