"""pyppeteer_scraper_spark — a from-scratch PySpark-native web-crawl
frontier + fetch scheduler with the query semantics of the reference
scraper suite (``zhou-en/pyppeteer-scraper``), re-expressed as idiomatic
Spark DataFrame jobs.

The reference is a fleet of cron-driven single-process scrapers
(fetch → extract → filter → dedup-against-seen-set → rate-limited act →
persist state + metrics).  Here each of those stages is a declarative
DataFrame operator over Common-Crawl-style ``pages`` tables:

- ``sources``    — deterministic datagen + table loaders
- ``functions``  — URL canonicalization/hashing, text analysis, parsing
- ``operators``  — dedup, politeness, top-k, bloom seen-set, CDC, ANN
- ``plans``      — the scheduler round, checkpointing, metrics, oracle
- ``streaming``  — structured-streaming variants of the round loop

Nothing here is a port: the reference's pyppeteer/asyncio engine is
replaced by Catalyst-optimized DataFrame plans; Python appears only in
Arrow-vectorized pandas UDFs (no per-row Python).
"""

__version__ = "0.1.0"
