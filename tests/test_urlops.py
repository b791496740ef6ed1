"""URL frontier operators added round 4: SURT canonical keys
(functions/canonicalize.py::surt_key), RefinedWeb-style pre-fetch URL
filtering (functions/urlfilter.py), serpentine host bin packing
(operators/export.py::binpack_hosts), and per-target anchor-text
aggregation (operators/linkrank.py::anchor_text_topk).  The registry
twins `url_surt_keys`, `url_filter_refinedweb`, `shard_binpack_hosts`,
and `rank_anchor_texts` hash-check the same logic against DuckDB; these
tests pin hand-computed values and the planted-skew shapes the sf0.01
data can't exercise."""

from pyspark.sql import functions as F


def test_surt_key_hand_computed(spark):
    from pyppeteer_scraper_spark.functions.canonicalize import surt_key

    cases = [
        # (url, expected surt)
        ("http://WWW.Foo.Example:8080/A/b?b=2&a=1", "example,foo:8080)/a/b?a=1&b=2"),
        ("https://example.com/", "com,example)/"),
        ("HTTP://example.com:80/x", "com,example)/x"),
        ("https://example.com:443/x", "com,example)/x"),
        ("https://shop.example.com:9090", "com,example,shop:9090)/"),
        ("http://www.a.b.c.example/p?z=1", "example,c,b,a)/p?z=1"),
        ("http://example.com?a=2", "com,example)/?a=2"),
        # www only strips as a LEADING label
        ("http://notwww.example.com/x", "com,example,notwww)/x"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {
        r.url: r.surt
        for r in df.select("url", surt_key(F.col("url")).alias("surt")).collect()
    }
    for url, want in cases:
        assert got[url] == want, f"{url}: {got[url]} != {want}"


def test_surt_key_sorts_host_contiguously(spark):
    """The point of SURT: all pages of a registrable domain sort
    adjacent regardless of subdomain/scheme/param spelling."""
    from pyppeteer_scraper_spark.functions.canonicalize import surt_key

    urls = [
        "https://www.zebra.example/1",
        "http://a.example/page",
        "https://shop.a.example/other",
        "http://a.example/z?b=2&a=1",
        "http://mid.example/x",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = (
        df.select(surt_key(F.col("url")).alias("s"))
        .orderBy("s")
        .collect()
    )
    keys = [r.s for r in rows]
    a_domain = [i for i, k in enumerate(keys) if k.startswith("example,a")]
    assert a_domain == list(range(a_domain[0], a_domain[0] + 3))


def test_url_filter_verdict_precedence(spark):
    """Blocklist beats depth beats keyword score; distinct-token
    scoring counts a repeated flagged word once."""
    from pyppeteer_scraper_spark.functions.urlfilter import filter_urls

    urls = spark.createDataFrame(
        [
            # blocklisted AND deep AND scored: blocklist wins
            ("http://bad.example/widget/widget/a/b/c/d", "bad.example"),
            # deep AND scored: too_deep wins
            ("http://ok.example/widget/red/a/b/c/d", "ok.example"),
            # scored only (widget 2.0 + red 1.5 >= 3.0)
            ("http://ok.example/widget/red", "ok.example"),
            # repeated token counts once: widget alone is 2.0 < 3.0
            ("http://ok.example/widget/widget-widget", "ok.example"),
            ("http://ok.example/plain/path", "ok.example"),
        ],
        "url string, domain string",
    )
    block = spark.createDataFrame([("bad.example",)], "domain string")
    out = filter_urls(
        urls,
        block,
        spark,
        keyword_weights={"widget": 2.0, "red": 1.5},
        score_threshold=3.0,
        max_depth=4,
    )
    got = {r.url: (r.verdict, r.kw_score) for r in out.collect()}
    assert got["http://bad.example/widget/widget/a/b/c/d"][0] == "blocklist"
    assert got["http://ok.example/widget/red/a/b/c/d"][0] == "too_deep"
    assert got["http://ok.example/widget/red"] == ("keyword_score", 3.5)
    assert got["http://ok.example/widget/widget-widget"] == ("keep", 2.0)
    assert got["http://ok.example/plain/path"] == ("keep", 0.0)


def test_url_filter_blocklist_is_broadcast(spark):
    """The blocklist join must broadcast — a shuffle of the frontier
    against a 10^5-row dim would be the scale bug."""
    from pyppeteer_scraper_spark.functions.urlfilter import filter_urls

    urls = spark.createDataFrame(
        [("http://a.example/x", "a.example")], "url string, domain string"
    )
    block = spark.createDataFrame([("b.example",)], "domain string")
    plan = filter_urls(urls, block, spark)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_binpack_serpentine_beats_modulo_on_planted_skew(spark):
    """Zipf-ish planted loads (exponent 0.6 — a web-like host-size
    tail without one host dwarfing the ideal shard): serpentine's
    makespan must sit within 15% of ideal and strictly beat the naive
    rank%n deal.  (With an extreme head — one host ≈ a whole shard —
    no dealing strategy balances; that regime is the salted top-k's
    job, not the packer's.)"""
    from pyppeteer_scraper_spark.operators.export import binpack_hosts

    loads = [
        ("h%03d" % i, max(1, int(3000 / (i + 1) ** 0.6))) for i in range(64)
    ]
    df = spark.createDataFrame(loads, "host string, n_urls long")
    n = 4
    packed = binpack_hosts(df, n).collect()
    total = sum(l for _, l in loads)
    ideal = total / n

    shard_load = {}
    for r in packed:
        shard_load[r.shard] = shard_load.get(r.shard, 0) + r.n_urls
    makespan = max(shard_load.values())

    # naive modulo deal on the same ranking
    ranked = sorted(loads, key=lambda t: (-t[1], t[0]))
    naive = {}
    for i, (_, l) in enumerate(ranked):
        naive[i % n] = naive.get(i % n, 0) + l
    assert makespan <= 1.15 * ideal
    assert makespan < max(naive.values())
    # every host assigned exactly once, every shard used
    assert len(packed) == len(loads)
    assert set(shard_load) == set(range(n))


def test_binpack_deterministic_across_partitioning(spark):
    from pyppeteer_scraper_spark.operators.export import binpack_hosts

    loads = [("h%02d" % i, (i * 37) % 11 + 1) for i in range(40)]
    df1 = spark.createDataFrame(loads, "host string, n_urls long").repartition(1)
    df2 = spark.createDataFrame(loads, "host string, n_urls long").repartition(13)
    a = {r.host: r.shard for r in binpack_hosts(df1, 8).collect()}
    b = {r.host: r.shard for r in binpack_hosts(df2, 8).collect()}
    assert a == b


def test_anchor_text_topk_hand_computed(spark):
    from pyppeteer_scraper_spark.operators.linkrank import anchor_text_topk

    links = spark.createDataFrame(
        [(1, "docs")] * 3 + [(1, "home")] * 3 + [(1, "blog")] * 2
        + [(1, "about")] + [(2, "shop")],
        "dst long, anchor string",
    )
    out = anchor_text_topk(links, 2)
    got = {(r.node, r.rk): r for r in out.collect()}
    # count ties (docs=home=3) break by anchor asc
    assert got[(1, 1)].anchor == "docs" and got[(1, 1)].n == 3
    assert got[(1, 2)].anchor == "home"
    assert (1, 3) not in got  # k=2
    assert got[(1, 1)].n_unique_anchors == 4
    assert got[(1, 1)].n_inlinks == 9
    assert got[(2, 1)].anchor == "shop" and got[(2, 1)].n_inlinks == 1


def test_anchor_topk_aggregates_before_window(spark):
    """The window must run over the (dst, anchor) aggregate, not raw
    links: the executed plan's window input is the HashAggregate."""
    from pyppeteer_scraper_spark.operators.linkrank import anchor_text_topk

    links = spark.createDataFrame(
        [(i % 5, "a%d" % (i % 3)) for i in range(100)],
        "dst long, anchor string",
    )
    plan = (
        anchor_text_topk(links, 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.index("Window") < plan.index("HashAggregate")
