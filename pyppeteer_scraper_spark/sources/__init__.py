from pyppeteer_scraper_spark.sources.tables import load_tables  # noqa: F401
