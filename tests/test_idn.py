"""functions/idn.py — from-scratch RFC 3492 Punycode pinned against
CPython's stdlib `punycode` codec (an independent implementation of
the same RFC), plus roundtrip, idempotence, and the Arrow-batched UDF
path end to end."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyppeteer_scraper_spark.functions.idn import (
    idn_host_ascii,
    idn_host_unicode,
    punycode_decode,
    punycode_encode,
)

# label alphabet spanning ASCII letters, Latin-1 accents, general BMP,
# CJK, and astral emoji — two-sided insertion deltas and 4-byte UTF-8
_CP = st.one_of(
    st.integers(97, 122),
    st.integers(0xA0, 0x2FF),
    st.integers(0x370, 0x2FFF),
    st.integers(0x4E00, 0x9FFF),
    st.integers(0x1F300, 0x1F64F),
)
_LABEL = st.lists(_CP, min_size=0, max_size=16).map(
    lambda cps: "".join(chr(c) for c in cps)
)


@settings(max_examples=500, deadline=None)
@given(_LABEL)
def test_encode_matches_stdlib_codec(label):
    assert punycode_encode(label) == label.encode("punycode").decode("ascii")


@settings(max_examples=500, deadline=None)
@given(_LABEL)
def test_decode_roundtrips(label):
    assert punycode_decode(punycode_encode(label)) == label


def test_rfc_appendix_sample():
    # RFC 3492 §7.1 sample (A): Arabic (Egyptian)
    label = "".join(
        chr(c)
        for c in [
            0x0644, 0x064A, 0x0647, 0x0645, 0x0627, 0x0628, 0x062A, 0x0643,
            0x0644, 0x0645, 0x0648, 0x0634, 0x0639, 0x0631, 0x0628, 0x064A,
            0x061F,
        ]
    )
    assert punycode_encode(label) == "egbpdaj6bu4bxfgehfvwxn"
    assert punycode_decode("egbpdaj6bu4bxfgehfvwxn") == label


def test_host_ace_form_and_idempotence():
    assert idn_host_ascii("Bücher.example") == "xn--bcher-kva.example"
    assert idn_host_ascii("xn--bcher-kva.example") == "xn--bcher-kva.example"
    assert idn_host_ascii("plain.example") == "plain.example"
    assert idn_host_unicode("xn--bcher-kva.example") == "bücher.example"


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        punycode_decode("abc-!!")
    with pytest.raises(ValueError):
        punycode_decode("aaa-z")  # z = digit 25 >= t, so more digits are required: truncated


def test_udf_path(spark):
    from pyppeteer_scraper_spark.functions.idn import idn_ascii_udf
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("Bücher.example",), ("PLAIN.example",), ("日本語.jp",), (None,)],
        "host string",
    )
    got = [r[0] for r in df.select(idn_ascii_udf(F.col("host"))).collect()]
    assert got == [
        "xn--bcher-kva.example",
        "plain.example",
        "xn--wgv71a119e.jp",
        "",
    ]
