from pyppeteer_scraper_spark.functions.canonicalize import (  # noqa: F401
    canonicalize_series,
    canonicalize_url,
    with_canonical_url,
)
