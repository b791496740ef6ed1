"""Round-4 batch: passage chunking, script profile, charset sniffing,
compression-ratio signal."""

import pytest
from pyspark.sql import functions as F


def test_passage_chunks_window_arithmetic(spark):
    from pyppeteer_scraper_spark.operators.packing import passage_chunks

    text = " ".join(f"t{i}" for i in range(250))  # 250 tokens
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        passage_chunks(df, size=128, stride=96).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # starts at 0, 96, 192 — stop before 288 > 249
    assert [r["start_tok"] for r in rows] == [0, 96, 192]
    assert [r["n_chunk_tokens"] for r in rows] == [128, 128, 58]
    # overlap: chunk 1 begins 32 tokens before chunk 0 ends
    assert rows[0]["passage"].split(" ")[96:] == rows[1]["passage"].split(" ")[:32]
    # full coverage: union of windows reconstructs the token stream
    seen = {}
    for r in rows:
        for j, tok in enumerate(r["passage"].split(" ")):
            seen[r["start_tok"] + j] = tok
    assert [seen[i] for i in range(250)] == text.split(" ")


def test_passage_chunks_short_and_empty_docs(spark):
    from pyppeteer_scraper_spark.operators.packing import passage_chunks

    df = spark.createDataFrame(
        [(1, "only three tokens"), (2, ""), (3, "x")],
        "doc_id long, text string",
    )
    rows = passage_chunks(df, size=128, stride=96).collect()
    got = {(r["doc_id"], r["chunk_idx"]): r["n_chunk_tokens"] for r in rows}
    assert got == {(1, 0): 3, (3, 0): 1}  # empty doc yields nothing


def test_script_profile_planted_scripts(spark):
    from pyppeteer_scraper_spark.functions.text import script_profile

    df = spark.createDataFrame(
        [
            (1, "hello world abc"),
            (2, "привет мир как дела сегодня"),
            (3, "中文网页内容测试"),
            (4, "12345 67890 11"),
            (5, ""),
            (6, "mixed привет text here"),  # latin 13 ≥ cyrillic 6
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in script_profile(df).collect()}
    assert got[1]["dominant_script"] == "latin"
    assert got[2]["dominant_script"] == "cyrillic"
    assert got[3]["dominant_script"] == "cjk"
    assert got[4]["dominant_script"] == "digit"
    assert got[5]["dominant_script"] == "empty"
    assert got[6]["dominant_script"] == "latin"
    assert got[3]["n_cjk"] == 8
    assert got[1]["n_space"] == 2
    # fractions sum to 1 over the classes
    r = got[2]
    total = sum(
        r[f"n_{k}"]
        for k in ("latin", "digit", "cyrillic", "greek", "arabic", "cjk", "space", "other")
    )
    assert total == len("привет мир как дела сегодня")


def test_charset_sniff_precedence_and_aliases(spark):
    from pyppeteer_scraper_spark.functions.charset import (
        bom_charset,
        sniff_charset,
    )

    df = spark.createDataFrame(
        [
            (1, '<meta charset="latin1">', bytearray(b"\xef\xbb\xbfhello")),
            (2, '<meta charset="latin1">', bytearray(b"plain bytes")),
            (3, "<p>no declaration</p>", bytearray(b"x")),
            (4, '<META HTTP-EQUIV="Content-Type" CONTENT="text/html; charset=CP1252">', bytearray(b"")),
            (5, "<meta charset=utf8>", bytearray(b"\xff\xfea\x00")),
        ],
        "id long, html string, raw binary",
    )
    out = {
        r["id"]: (r["bom"], r["resolved"])
        for r in df.select(
            "id",
            bom_charset(F.col("raw")).alias("bom"),
            sniff_charset(F.col("html"), F.col("raw")).alias("resolved"),
        ).collect()
    }
    assert out[1] == ("utf-8", "utf-8")        # BOM beats declaration
    assert out[2] == (None, "iso-8859-1")      # alias fold
    assert out[3] == (None, "utf-8")           # default
    assert out[4] == (None, "windows-1252")    # http-equiv + case + alias
    assert out[5] == ("utf-16le", "utf-16le")  # UTF-16 LE BOM


def test_compression_ratio_analytic_bounds(spark):
    from pyppeteer_scraper_spark.functions.text import compression_ratio

    import random

    rng = random.Random(7)
    rand_text = "".join(chr(rng.randrange(0x21, 0x7F)) for _ in range(4000))
    df = spark.createDataFrame(
        [
            (1, "spam " * 800),       # pathologically repetitive
            (2, rand_text),            # incompressible
            (3, ""),                   # empty → defined as 1.0
            (4, None),                 # null passthrough
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["r"]
        for r in df.select(
            "doc_id", compression_ratio(F.col("text")).alias("r")
        ).collect()
    }
    assert got[1] < 0.05
    assert got[2] > 0.7
    assert got[3] == 1.0
    assert got[4] is None
    # deterministic across re-evaluation
    again = {
        r["doc_id"]: r["r"]
        for r in df.select(
            "doc_id", compression_ratio(F.col("text")).alias("r")
        ).collect()
    }
    assert again == got
