"""Frequency-domain audio features
(operators/multimodal.py::audio_spectral_features): analytic pins — a
bin-exact sine's peak bin and centroid land exactly on f0, bandwidth
is the Hann main-lobe width, flatness separates tones from broadband
noise by ~20 orders of magnitude, and the mel argmax is monotone in
f0.  Plus the oracled query's cross-engine check at fixture scale."""

import numpy as np
import pytest

from pyppeteer_scraper_spark.operators.multimodal import (
    _mel_filterbank,
    audio_spectral_features,
)

SR = 16000
BIN_HZ = SR / 512


def _sine(f0, n, amp=0.5):
    t = np.arange(n) / SR
    return (amp * 32767 * np.sin(2 * np.pi * f0 * t)).astype(np.int16)


@pytest.mark.parametrize("f0", [500, 1000, 2000, 4000])
def test_bin_exact_sine_peak_and_centroid(f0):
    f = audio_spectral_features(_sine(f0, 4096), SR)
    n_frames, peak_bin, peak_hz, centroid, bw, roll, flat = f[:7]
    assert n_frames == 1 + (4096 - 512) // 256
    assert peak_bin == f0 / BIN_HZ  # exact: f0 sits on a bin
    assert peak_hz == pytest.approx(f0, abs=1e-3)
    # symmetric leakage around an exact bin → centroid == f0
    assert centroid == pytest.approx(f0, rel=1e-4)
    # Hann main lobe: tight bandwidth, rolloff just above f0
    assert bw < 2.5 * BIN_HZ
    assert f0 <= roll <= f0 + 2 * BIN_HZ


def test_flatness_separates_tone_from_noise():
    tone = audio_spectral_features(_sine(1000, 4096), SR)[6]
    rng = np.random.default_rng(7)
    noise = audio_spectral_features(
        (rng.standard_normal(4096) * 5000).astype(np.int16), SR)[6]
    assert tone < 1e-10
    assert noise > 0.8


def test_mel_argmax_monotone_in_f0():
    argmaxes = [
        int(np.argmax(audio_spectral_features(_sine(f0, 2048), SR)[7:]))
        for f0 in (500, 1000, 2000, 4000)
    ]
    assert argmaxes == sorted(argmaxes)
    assert argmaxes[0] < argmaxes[-1]


def test_mel_filterbank_partition_properties():
    fb = _mel_filterbank(16, 512, SR)
    assert fb.shape == (16, 257)
    assert (fb >= 0).all()
    # every filter has support, and filters tile the band: each
    # interior frequency bin is covered by at least one filter
    assert (fb.sum(axis=1) > 0).all()
    covered = fb.sum(axis=0)
    assert (covered[5:250] > 0).all()


def test_short_and_silent_payloads():
    # shorter than one frame → zero-padded, one frame, no crash
    f = audio_spectral_features(_sine(1000, 100), SR)
    assert f[0] == 1
    z = audio_spectral_features(np.zeros(2048, dtype=np.int16), SR)
    assert z[1] == 0 and z[3] == 0  # peak_bin, centroid
    assert z[6] == 1.0  # flatness of silence defined as 1


def test_query_matches_oracle_at_fixture_scale(spark):
    import duckdb

    from pyppeteer_scraper_spark.plans.queries import ORACLE_SQL, QUERIES

    sf = "/root/testdata/sf0.001"
    sdf = (
        QUERIES["media_audio_spectral"](spark, sf)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"create view documents as select * from "
        f"read_parquet('{sf}/documents.parquet')"
    )
    odf = (
        con.sql(ORACLE_SQL["media_audio_spectral"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(sdf, odf, check_dtype=False)
