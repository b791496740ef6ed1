import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "the quick brown fox jumps over a lazy dog"),  # near dup
        (3, "completely different words entirely unrelated text here"),
        (4, "le chat et la souris dans la maison des amis"),
        (5, "der hund und die katze das haus ein garten nicht"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(spark, docs):
    from pyppeteer_scraper_spark.operators.dedup import exact_dedup

    groups = {r["canonical_id"]: r["n_dups"] for r in exact_dedup(docs).collect()}
    assert groups[0] == 2  # docs 0 and 1 collapse
    assert groups[2] == 1


def test_minhash_lsh_finds_near_dups(spark, docs):
    from pyppeteer_scraper_spark.operators.dedup import minhash_lsh_pairs

    # k=2 shingles give docs 0/2 a true Jaccard ≈ 0.55; 32 bands × 2 rows
    # catch that with probability ≈ 1.
    pairs = {
        (r["a"], r["b"]): r["jaccard_est"]
        for r in minhash_lsh_pairs(docs, k=2, bands=32, threshold=0.3).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0  # exact dup → full agreement
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup found
    assert all(b != 3 and a != 3 for a, b in pairs)  # unrelated doc never pairs


def test_simhash_near_dups(spark, docs):
    from pyppeteer_scraper_spark.operators.dedup import simhash, simhash_near_dups

    sigs = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert sigs[0] == sigs[1]
    pairs = {(r["a"], r["b"]): r["hamming"] for r in simhash_near_dups(docs, max_hamming=16).collect()}
    assert pairs.get((0, 1)) == 0
    assert (0, 3) not in pairs


def test_ngram_jaccard(spark, docs):
    from pyppeteer_scraper_spark.operators.dedup import (
        dedup_keep_canonical,
        ngram_jaccard_pairs,
    )

    pairs = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert 0.5 <= pairs[(0, 2)] < 1.0

    kept = {r["doc_id"] for r in dedup_keep_canonical(docs, ngram_jaccard_pairs(docs, threshold=0.5)).collect()}
    assert 0 in kept and 1 not in kept and 2 not in kept and 3 in kept


def test_similarity_topk_matches_numpy(spark, sf_small):
    import numpy as np

    from pyppeteer_scraper_spark.operators.similarity import brute_force_topk

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    got = brute_force_topk(emb.filter(F.col("vec_id") < 5), emb, k=3).collect()

    pdf = emb.toPandas().sort_values("vec_id")
    m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    ids = pdf["vec_id"].to_numpy()
    u = m / np.linalg.norm(m, axis=1, keepdims=True)
    S = u @ u.T
    for q in range(5):
        qi = list(ids).index(q)
        scores = [
            (round(S[qi, j], 6), int(ids[j])) for j in range(len(ids)) if ids[j] != q
        ]
        scores.sort(key=lambda t: (-t[0], t[1]))
        want = [v for _, v in scores[:3]]
        got_q = sorted(
            [(r["rank"], r["neighbor_id"]) for r in got if r["query_id"] == q]
        )
        assert [n for _, n in got_q] == want, f"query {q}"


def test_embedding_near_dups_lsh_matches_bruteforce(spark, sf_small):
    """The default (banded-SRP) near-dup path must reproduce the exact
    crossJoin ground truth on the planted-near-dup corpus: precision is
    exact by construction (candidates are cosine-verified), so equality
    means recall 1.0 at this scale."""
    from pyppeteer_scraper_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )
    from pyppeteer_scraper_spark.plans.queries import _near_dup_corpus

    corpus = _near_dup_corpus(spark, sf_small)
    lsh = {
        (r["a"], r["b"], r["cosine"])
        for r in embedding_near_dup_pairs(corpus, 0.95, method="lsh").collect()
    }
    exact = {
        (r["a"], r["b"], r["cosine"])
        for r in embedding_near_dup_pairs(corpus, 0.95, method="exact").collect()
    }
    assert len(exact) > 50, "planted corpus should contain real near-dups"
    assert lsh == exact
    # every pair emitted is genuinely above threshold (verified, not assumed)
    assert all(c >= 0.95 for _, _, c in lsh)


def test_lsh_topk_is_subset_ranked(spark, sf_small):
    from pyppeteer_scraper_spark.operators.similarity import lsh_topk

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    rows = lsh_topk(emb.filter(F.col("vec_id") < 5), emb, k=3).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["query_id"] != r["neighbor_id"]
        assert 1 <= r["rank"] <= 3


def test_ivf_topk_recall_vs_bruteforce(spark, sf_small):
    """IVF with full probing is EXACT (equals brute force); partial
    probing keeps high recall@k on the planted-neighbor corpus."""
    from pyppeteer_scraper_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in brute_force_topk(q, emb, k=3).collect()
    }

    # probing every cell must reproduce brute force exactly
    full, indexed = ivf_topk(q, emb, k=3, n_centroids=8, n_probe=8, iters=2)
    got = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in full.collect()}
    assert got == exact
    indexed.unpersist()

    # partial probing: recall@3 ≥ 0.8 on planted near-neighbors
    part, indexed = ivf_topk(q, emb, k=3, n_centroids=8, n_probe=5, iters=3)
    # candidate generation must be an equi-join on cell, never all-pairs
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        part.explain("formatted")
    assert "CartesianProduct" not in buf.getvalue()
    gotp = {(r["query_id"], r["neighbor_id"]) for r in part.collect()}
    exact_pairs = {(a, b) for a, b, _ in exact}
    recall = len(gotp & exact_pairs) / len(exact_pairs)
    assert recall >= 0.8, f"recall {recall}"
    indexed.unpersist()


def test_rolling_hash_golden_and_bounded_memory():
    """Golden values pin the hash function across implementations; the
    memory bound pins the O(total-bytes) behavior — the padded-matrix
    form would allocate rows×maxlen ≈ 10 GB for this input."""
    import tracemalloc

    import pandas as pd

    from pyppeteer_scraper_spark.functions.text import rolling_hash_series

    golden = [
        -3750763034362895579, -5808556873153909620, -1792535898324117685,
        8618312879776256743, -2184859513441168699, -3750763034362895579,
        -7084427419218711332, 7665414082170103366,
    ]
    s = pd.Series([
        "", "a", "abc", "hello world", "x" * 1000, None,
        "héllo ünïcode", "the quick brown fox jumps over the lazy dog" * 3,
    ])
    assert list(rolling_hash_series(s)) == golden

    # vectorized path and per-row tail path must agree byte-for-byte:
    # 20 equal-length copies stay on the gather path; a lone copy in a
    # short batch takes the tail fold.
    long = "z" * 50_000
    vec = rolling_hash_series(pd.Series([long] * 20)).iloc[0]
    tail = rolling_hash_series(pd.Series([long, "a", "b"])).iloc[0]
    assert vec == tail

    # one 1 MB doc mixed into a 10k-row batch: bounded memory
    big = pd.Series(["doc %d" % i for i in range(10_000)] + ["z" * 1_000_000])
    tracemalloc.start()
    out = rolling_hash_series(big)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert peak < 200_000_000, f"peak {peak} bytes — padded matrix is back?"
    assert out.iloc[0] == rolling_hash_series(pd.Series(["doc 0"])).iloc[0]


def test_text_functions(spark, docs):
    from pyppeteer_scraper_spark.functions.text import (
        bpe_ish_token_count,
        lang_id,
        quality_score,
        ws_token_count,
    )

    out = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id",
            lang_id(F.col("text")).alias("lang"),
            quality_score(F.col("text")).alias("q"),
            ws_token_count(F.col("text")).alias("ws"),
            bpe_ish_token_count(F.col("text")).alias("bpe"),
        ).collect()
    }
    assert out[0]["lang"] == "en"
    assert out[4]["lang"] == "fr"
    assert out[5]["lang"] == "de"
    assert out[6]["lang"] == "und"
    assert out[0]["ws"] == 9
    assert 0.0 <= out[0]["q"] <= 1.0


def test_rolling_hash_deterministic(spark, docs):
    from pyppeteer_scraper_spark.functions.text import (
        rolling_hash_series,
        rolling_hash_udf,
    )

    got = {
        r["doc_id"]: r["h"]
        for r in docs.select("doc_id", rolling_hash_udf("text").alias("h")).collect()
    }
    pdf = docs.toPandas()
    want = dict(zip(pdf["doc_id"], rolling_hash_series(pdf["text"])))
    assert got == want
    assert got[0] == got[1] and got[0] != got[3]


def test_multimodal_plumbing(spark):
    from pyppeteer_scraper_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        fake_decode,
        frame_sample_plan,
        real_decode_stub,
    )

    rows = [
        (0, "image", b"\x01\x02\x03\x04", (4, 2, None, None, "image/png")),
        (1, "video", b"\xff" * 64, (16, 9, None, 100, "video/mp4")),
        (2, "audio", None, (None, None, 44100, None, "audio/wav")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    assert feats[0]["n_bytes"] == 4
    assert len(feats[0]["feature"]) == 8
    assert feats[2]["n_bytes"] == 0 and all(x == 0.0 for x in feats[2]["feature"])
    # determinism of the fake decoder
    assert list(fake_decode(b"\x01\x02\x03\x04")) == list(fake_decode(b"\x01\x02\x03\x04"))

    frames = frame_sample_plan(media, every_n=10).collect()
    assert {r["frame_idx"] for r in frames} == set(range(0, 100, 10))

    with pytest.raises(NotImplementedError):
        real_decode_stub(b"x")


def test_alert_sink_messages(spark, tmp_path):
    from pyppeteer_scraper_spark.operators.sinks import alert_messages, append_alerts

    actions = spark.createDataFrame(
        [
            (1, "EV1", "KW0001", "Build a Birdhouse", "2026-03-14T08:30:00-0400", True, True, False),
            (1, "EV2", "KW0002", "Paint a Planter", "2026-03-14T10:30:00-0400", True, False, False),
        ],
        "round int, event_code string, workshop_id string, title string, "
        "start_time string, alert boolean, register boolean, known_before boolean",
    )
    msgs = alert_messages(actions).collect()
    kinds = sorted((m["event_code"], m["kind"]) for m in msgs)
    assert kinds == [("EV1", "alert"), ("EV1", "register"), ("EV2", "alert")]
    std = next(m for m in msgs if m["event_code"] == "EV2" and m["kind"] == "alert")
    assert std["message"] == (
        "*<https://www.homedepot.ca/workshops?store=7265|Paint a Planter>* "
        "starts on *2026-03-14T10:30:00-0400* is open for registration: "
        "https://www.homedepot.ca/workshops?store=7265"
    )
    reg = next(m for m in msgs if m["kind"] == "register")
    assert "🎯 Auto-registering" in reg["message"] and "*EV1*" in reg["message"]

    out = str(tmp_path / "alerts")
    append_alerts(actions, out)
    append_alerts(actions.withColumn("round", actions["round"] + 1), out)
    back = spark.read.parquet(out)
    assert back.count() == 6
    assert back.select("round").distinct().count() == 2


def test_connected_components_chain_and_random(spark):
    """Star-contraction CC equals a driver-side union-find on a seeded
    random graph, and resolves chains transitively (the case min-id-wins
    dedup_keep_canonical explicitly gets wrong)."""
    import random

    from pyppeteer_scraper_spark.operators.dedup import (
        connected_components,
        dedup_keep_components,
    )

    # chain 10-11, 11-12, 12-13: one component labeled 10; with
    # nodes=None the root labels itself too (every node of the pair
    # graph gets a row, per the docstring)
    chain = spark.createDataFrame([(11, 10), (11, 12), (13, 12)], ["a", "b"])
    got = {
        (r["doc_id"], r["component"])
        for r in connected_components(chain).collect()
    }
    assert got == {(10, 10), (11, 10), (12, 10), (13, 10)}

    # random sparse graph vs union-find
    rng = random.Random(42)
    n = 400
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(250)
    ]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min member of each component
    members: dict[int, list[int]] = {}
    for x in range(n):
        members.setdefault(find(x), []).append(x)
    expect = {
        (x, min(ms)) for ms in members.values() for x in ms
    }

    pairs = spark.createDataFrame(edges, ["a", "b"])
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    got = {
        (r["doc_id"], r["component"])
        for r in connected_components(pairs, nodes=nodes).collect()
    }
    assert got == expect

    # keep-set: exactly one survivor (the min) per component
    df = nodes
    kept = sorted(
        r["doc_id"] for r in dedup_keep_components(df, pairs).collect()
    )
    assert kept == sorted(min(ms) for ms in members.values())


def test_line_dedup_golden(spark):
    """C4 rule on a hand-built corpus: each line survives only at its
    first (doc, pos) occurrence; fully-consumed docs vanish."""
    from pyppeteer_scraper_spark.operators.dedup import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "alpha\nbeta"),
            (2, "beta\ngamma"),
            (3, "alpha\ndelta"),
            (4, "alpha\nbeta"),  # both lines already owned → drops out
        ],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["text_kept"])
        for r in line_dedup(docs).collect()
    }
    assert out == {
        1: (2, 2, "alpha\nbeta"),
        2: (2, 1, "gamma"),
        3: (2, 1, "delta"),
    }
    # separator containing regex metacharacters is treated literally
    docs2 = spark.createDataFrame(
        [(1, "alpha||beta"), (2, "beta||gamma")], "doc_id int, text string"
    )
    out2 = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["text_kept"])
        for r in line_dedup(docs2, line_sep="||").collect()
    }
    assert out2 == {1: (2, 2, "alpha||beta"), 2: (2, 1, "gamma")}


def test_repetition_signals_golden(spark):
    from pyppeteer_scraper_spark.functions.text import with_repetition_signals

    df = spark.createDataFrame(
        [(1, "a a b a"), (2, "hello")], "doc_id int, text string"
    )
    rows = {r["doc_id"]: r for r in with_repetition_signals(df).collect()}
    r1 = rows[1]
    assert r1["n_tokens"] == 4
    assert r1["dup_word_frac"] == 0.5  # {a,b} of 4 tokens
    assert r1["top_2gram_frac"] == round(1 / 3, 6)  # grams all distinct
    assert r1["mean_word_len"] == 1.0
    r2 = rows[2]  # single token: no 2-grams, fraction defined as 0
    assert r2["n_tokens"] == 1 and r2["top_2gram_frac"] == 0.0
    assert r2["dup_word_frac"] == 0.0 and r2["mean_word_len"] == 5.0


def test_gopher_rules_planted_branches(spark):
    """Each Gopher rule rejects exactly its planted violator and the
    clean document passes all five (Rae et al. 2021 A1 semantics)."""
    from pyppeteer_scraper_spark.functions.text import with_gopher_rules

    good = "the cat and the dog have been with all of them " + " ".join(
        ["word"] * 12
    )  # 23 words, all alpha, mwl in [3,10], stopwords >= 2
    docs = spark.createDataFrame(
        [
            (1, good),
            (2, "the of and"),  # G1: below the 5-word floor
            (3, "the of " + " ".join(["a"] * 20)),  # G2: mean word len < 3
            (4, good + " # # # # # # # # # # # # # #"),  # G3: symbols
            (5, "the of " + " ".join(["123"] * 20)),  # G4: non-alpha words
            (6, " ".join(["word"] * 20)),  # G5: no stop words
        ],
        "doc_id int, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in with_gopher_rules(docs, min_words=5).collect()
    }
    assert rows[1]["keep"] == 1
    assert {d: rows[d]["keep"] for d in (2, 3, 4, 5, 6)} == {
        2: 0, 3: 0, 4: 0, 5: 0, 6: 0
    }
    # signal spot checks
    assert rows[2]["n_words"] == 3
    assert rows[3]["mean_word_len"] < 3
    assert rows[4]["symbol_ratio"] > 0.1
    assert rows[5]["frac_alpha_words"] < 0.8
    assert rows[6]["n_stopwords"] == 0
    # ellipsis counts as a symbol (both spellings)
    r = {
        x["doc_id"]: x
        for x in with_gopher_rules(
            spark.createDataFrame(
                [(1, "a ... b …")], "doc_id int, text string"
            ),
            min_words=1,
        ).collect()
    }
    assert r[1]["symbol_ratio"] == 0.5


def test_real_codecs_roundtrip_and_features(spark):
    """PPM/BMP/WAV decode is REAL (numpy+stdlib): encode→decode is
    pixel/sample-exact, features match direct numpy computation, and the
    whole path runs through the Arrow mapInPandas stage."""
    import numpy as np

    from pyppeteer_scraper_spark.operators.multimodal import (
        audio_features,
        decode_bmp,
        decode_ppm,
        decode_wav,
        encode_bmp,
        encode_ppm,
        encode_wav,
        extract_features,
        image_features,
        real_decode,
        thumbnail_gray,
    )

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(12, 17, 3), dtype=np.uint8)
    # pixel-exact codecs (17px width exercises BMP's 4-byte row padding)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)
    sr = 8000
    t = np.arange(sr)  # 1 s
    sine = (10000 * np.sin(2 * np.pi * 440 * t / sr)).astype(np.int16)
    out, sr2 = decode_wav(encode_wav(sine, sr))
    assert sr2 == sr and np.array_equal(out, sine)
    # feature semantics: sine RMS = amp/sqrt(2), 440 Hz → ZCR ≈ 880/sr
    af = audio_features(sine, sr)
    assert abs(af[0] - 1.0) < 1e-6                       # duration
    assert abs(af[1] - (10000 / 32768) / np.sqrt(2)) < 1e-3  # rms
    assert abs(af[2] - 2 * 440 / sr) < 5e-3              # zcr
    # thumbnail is an exact block mean
    thumb = thumbnail_gray(img)
    gray = img.mean(axis=2)
    assert abs(thumb[0, 0] - gray[:1, :2].mean() / 255.0) < 1e-6
    # end-to-end through the Arrow batch stage with the REAL decoder
    rows = [
        (1, "image", bytearray(encode_ppm(img)), (17, 12, None, None, "image/x-portable-pixmap")),
        (2, "image", bytearray(encode_bmp(img)), (17, 12, None, None, "image/bmp")),
        (3, "audio", bytearray(encode_wav(sine, sr)), (None, None, sr, None, "audio/wav")),
    ]
    from pyppeteer_scraper_spark.operators.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r["media_id"]: np.array(r["feature"], dtype=np.float32)
        for r in extract_features(media, decoder=real_decode).collect()
    }
    np.testing.assert_allclose(got[1], image_features(img), rtol=1e-6)
    np.testing.assert_allclose(got[2], image_features(img), rtol=1e-6)
    np.testing.assert_allclose(got[3], audio_features(sine, sr), rtol=1e-6)
    # PPM and BMP payloads of the SAME image produce identical features
    np.testing.assert_array_equal(got[1], got[2])


def test_real_decode_stub_contract_for_compressed(spark):
    import pytest as _pytest

    from pyppeteer_scraper_spark.operators.multimodal import real_decode

    # MP4/H.264 stays the documented external-codec seam...
    with _pytest.raises(NotImplementedError):
        real_decode(b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 16)
    # ...JPEG is REAL now (operators/jpeg.py): a signature with garbage
    # after it must fail PARSING (ValueError from the actual decoder),
    # and progressive SOF2 hits the documented NotImplementedError seam
    # from inside the codec.
    with _pytest.raises(ValueError):
        real_decode(b"\xff\xd8\xff\xe0" + b"\x00" * 16)
    sof2 = (b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x10\x00\x10\x01"
            b"\x01\x11\x00\xff\xd9")
    with _pytest.raises(NotImplementedError):
        real_decode(sof2)
    # ...but PNG is REAL now (from-scratch zlib codec): a payload with
    # the PNG signature and garbage chunks must fail PARSING (ValueError
    # from the actual decoder), not hit the not-implemented seam.
    with _pytest.raises(ValueError):
        real_decode(b"\x89PNG\r\n\x1a\n....")


def test_pii_redaction_planted_strings(spark):
    """Exact masking semantics on hand-planted strings: typed
    placeholders, email-before-IP ordering (dotted mail hosts never
    split), word boundaries, and clean text untouched."""
    from pyppeteer_scraper_spark.functions.pii import pii_counts, redact_pii

    rows = [
        (1, "mail me at jo.na-b+x@sub.example.co.uk today"),
        (2, "call 555-123-4567 or 555-000-1111 now"),
        (3, "server at 10.2.30.4 and 255.255.255.255"),
        (4, "mixed a@b.io then 555-222-3333 from 8.8.8.8"),
        (5, "clean text with no secrets 12345 1.5 v2.0.1"),
        (6, "not-a-phone 5551234567 and long 1234-567-8901x"),
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    c = pii_counts(F.col("t"))
    got = {
        r["id"]: r
        for r in df.select(
            "id",
            redact_pii(F.col("t")).alias("red"),
            c["email"].alias("e"),
            c["phone"].alias("p"),
            c["ipv4"].alias("i"),
        ).collect()
    }
    assert got[1]["red"] == "mail me at <EMAIL> today"
    assert (got[1]["e"], got[1]["p"], got[1]["i"]) == (1, 0, 0)
    assert got[2]["red"] == "call <PHONE> or <PHONE> now"
    assert got[3]["red"] == "server at <IP> and <IP>"
    assert got[4]["red"] == "mixed <EMAIL> then <PHONE> from <IP>"
    assert (got[4]["e"], got[4]["p"], got[4]["i"]) == (1, 1, 1)
    assert got[5]["red"] == rows[4][1]  # untouched
    assert (got[5]["e"], got[5]["p"], got[5]["i"]) == (0, 0, 0)
    # neither a bare 10-digit run nor a digit-embedded 1234-567-8901 is
    # a formatted phone: \b between two digits is not a boundary, so the
    # pattern stays precision-leaning on embedded runs.
    assert got[6]["p"] == 0
    assert got[6]["red"] == rows[5][1]  # untouched


def test_semantic_dedup_planted_and_invariants(spark):
    """SemDeDup leader pass: planted near-copies are dropped against
    their lower-id base; no two kept items in the same cell exceed the
    threshold (brute-force verified); reported cosines are exact."""
    import numpy as np

    from pyppeteer_scraper_spark.operators.dedup import semantic_dedup

    rng = np.random.default_rng(7)
    dim, n_base, n_copies = 16, 60, 20
    base = rng.normal(size=(n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i].tolist()) for i in range(n_base)]
    # planted copies: tiny perturbation of base j -> cosine ~0.9995
    for c in range(n_copies):
        j = c % n_base
        v = base[j] + 0.02 * rng.normal(size=dim)
        rows.append((1000 + c, (v / np.linalg.norm(v)).tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    verdicts, handle = semantic_dedup(
        emb, n_centroids=8, threshold=0.95, iters=2, chunk=16
    )
    pdf = verdicts.toPandas().sort_values("vec_id").reset_index(drop=True)
    handle.unpersist()
    assert len(pdf) == n_base + n_copies

    # every planted copy dropped, attributed to a lower-id kept item
    by_id = pdf.set_index("vec_id")
    for c in range(n_copies):
        row = by_id.loc[1000 + c]
        assert not row["kept"], f"copy {1000 + c} survived"
        assert row["dup_of"] < 1000 + c
        assert by_id.loc[row["dup_of"]]["kept"]
        assert row["cosine"] > 0.95

    # kept rows carry no attribution
    assert pdf[pdf["kept"]]["dup_of"].isna().all()

    # brute-force invariant: no kept pair within a cell above threshold,
    # and reported cosines match numpy exactly (1e-6)
    unit = {i: np.asarray(v) / np.linalg.norm(v) for i, v in rows}
    for cell, grp in pdf.groupby("cell"):
        kept_ids = grp[grp["kept"]]["vec_id"].to_list()
        for a in range(len(kept_ids)):
            for b in range(a + 1, len(kept_ids)):
                assert unit[kept_ids[a]] @ unit[kept_ids[b]] <= 0.95
    for _, r in pdf[~pdf["kept"]].iterrows():
        got = unit[r["vec_id"]] @ unit[r["dup_of"]]
        assert abs(got - r["cosine"]) < 1e-6

    # determinism across shuffle widths
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        v2, h2 = semantic_dedup(
            emb, n_centroids=8, threshold=0.95, iters=2, chunk=16
        )
        pdf2 = v2.toPandas().sort_values("vec_id").reset_index(drop=True)
        h2.unpersist()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert pdf.equals(pdf2)


def test_substring_dup_coverage_golden(spark):
    """Hand-computed k=3 cases: cross-doc duplicated windows, island
    merging of overlapping windows, within-doc self-repetition, and
    short-doc zero rows."""
    from pyppeteer_scraper_spark.operators.dedup import substring_dup_coverage

    docs = spark.createDataFrame(
        [
            # d1/d2 share "a b c d" -> windows "a b c"@0 and "b c d"@1
            # duplicated in both docs; islands merge to cover 4 tokens
            (1, "a b c d x y z"),
            (2, "p q a b c d r"),
            # d3: self-repetition "m n o ... m n o" duplicates the
            # "m n o" window at pos 0 and 4 within one doc (2 islands,
            # 3 tokens each)
            (3, "m n o u m n o"),
            # d4: 2 tokens < k -> no windows, zero coverage
            (4, "hi there"),
            # d5: all-unique tokens -> windows exist, none duplicated
            (5, "e f g h i j"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_dup_tokens"], r["dup_frac"])
        for r in substring_dup_coverage(docs, k=3).collect()
    }
    assert out[1] == (7, 4, round(4 / 7, 6))
    assert out[2] == (7, 4, round(4 / 7, 6))
    assert out[3] == (7, 6, round(6 / 7, 6))
    assert out[4] == (2, 0, 0.0)
    assert out[5] == (6, 0, 0.0)


def test_ws_token_count_single_space_semantics(spark):
    """The shared tokenizer must match the oracles' string_split(text,
    ' ') on multi-space / tab / leading-whitespace boundaries — the
    cases where a \\s+ split silently diverges."""
    import duckdb

    from pyppeteer_scraper_spark.functions.text import ws_token_count

    texts = [
        "a  b",          # double space -> empty token counted
        "a\tb c",        # tab is NOT a separator under ' ' split
        " leading",      # leading space -> empty first token
        "trailing ",     # trailing space -> empty last token
        "",              # empty doc -> one empty token
        "one",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", ws_token_count(F.col("text")).alias("n")
        ).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        want = con.execute(
            "SELECT len(string_split(?, ' '))", [t]
        ).fetchone()[0]
        assert got[i] == want == len(t.split(" ")), (i, t, got[i], want)


def test_deletion_neighborhood_exact_ed1(spark):
    """FastSS blocking finds EXACTLY the ed<=1 pairs: deletion,
    insertion, substitution, and identity all caught; an ed=2 pair
    and an unrelated string excluded.  Cross-checked against the
    brute-force O(n^2) levenshtein join on the same rows."""
    from pyppeteer_scraper_spark.operators.dedup import (
        deletion_neighborhood_pairs,
    )

    rows = [
        (1, "frontier"),
        (2, "fronter"),    # deletion of 'i'  -> ed 1 vs #1
        (3, "fronntier"),  # insertion of 'n' -> ed 1 vs #1
        (4, "fruntier"),   # substitution     -> ed 1 vs #1
        (5, "frontier"),   # identical        -> ed 0 vs #1
        (6, "frontispiece"),  # far away
        (7, "fronte"),     # ed 2 vs #1 (two deletions) — excluded
    ]
    df = spark.createDataFrame(rows, ["doc_id", "title"])
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in deletion_neighborhood_pairs(df).collect()
    }
    # brute force ground truth
    import itertools

    def ed(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[-1]

    want = {
        (i, j): ed(a, b)
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if ed(a, b) <= 1
    }
    assert got == want
    assert (1, 7) not in got and (1, 6) not in got
    assert got[(1, 5)] == 0 and got[(1, 2)] == 1


def test_pca_whiten_identity_and_partials_exactness(spark, sf_small):
    """pca_whiten: whitened covariance == I (numpy check, tighter than
    the query's 6 dp), ZCA whitening matrix is symmetric, and the
    distributed Gram partials agree with numpy's covariance exactly
    (one-pass partial sums vs two-pass centered sums at 1e-10)."""
    import numpy as np

    from pyppeteer_scraper_spark.operators.similarity import (
        embedding_covariance,
        pca_whiten,
    )

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    pdf = emb.toPandas().sort_values("vec_id")
    x = np.stack([np.asarray(v, np.float64) for v in pdf["embedding"]])
    ref_cov = np.cov(x, rowvar=False, bias=True)

    # distributed covariance == numpy covariance
    rows = embedding_covariance(emb).collect()
    d = x.shape[1]
    got = np.zeros((d, d))
    for r in rows:
        got[r["i"], r["j"]] = got[r["j"], r["i"]] = r["cov"]
    assert np.abs(got - ref_cov).max() < 1e-10

    whitened, mean, w = pca_whiten(emb)
    assert np.abs(mean - x.mean(axis=0)).max() < 1e-12
    assert np.abs(w - w.T).max() < 1e-12  # ZCA form
    wdf = whitened.toPandas().sort_values("vec_id")
    y = np.stack([np.asarray(v, np.float64) for v in wdf["whitened"]])
    wc = np.cov(y, rowvar=False, bias=True)
    assert np.abs(wc - np.eye(d)).max() < 1e-8


def test_embedding_covariance_order_invariant(spark, sf_med):
    """The 6-dp covariance contract must be stable to cross-partition
    accumulation ORDER (the r05 driver flake: a one-pass moment cell
    near a .5e-7 boundary flipped between runs).  The two-pass centered
    form's partials are covariance-magnitude, so the rounded output
    must be bit-identical across partition counts and repeated runs."""
    from pyspark.sql import functions as SF

    from pyppeteer_scraper_spark.operators.similarity import (
        embedding_covariance,
    )

    emb = spark.read.parquet(f"{sf_med}/embeddings.parquet")

    def rounded(df_in):
        return sorted(
            (r["i"], r["j"], r["cov"])
            for r in embedding_covariance(df_in)
            .select("i", "j", SF.round("cov", 6).alias("cov"))
            .collect()
        )

    ref = rounded(emb.repartition(1))
    for parts in (3, 8):
        assert rounded(emb.repartition(parts)) == ref
    # repeated run, same layout: deterministic
    assert rounded(emb.repartition(8)) == ref


def test_incremental_minhash_is_asymmetric_and_complete(spark):
    """New-batch docs pair ONLY against the corpus: internal dups on
    either side are never emitted (that is the point — per-round cost
    independent of corpus-internal duplication), while every true
    cross near-dup is found (brute-force cross ground truth)."""
    from pyppeteer_scraper_spark.operators.dedup import (
        incremental_minhash_pairs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus_rows = [
        (1, base),
        (2, base),  # corpus-internal exact dup: must NOT be emitted
        (3, "unrelated corpus words entirely different from everything"),
    ]
    new_rows = [
        (101, base + " lambda"),       # near-dup of corpus 1 and 2
        (102, base + " lambda"),       # new-internal dup of 101
        (103, "fresh novel content with no twin in the corpus at all"),
    ]
    corpus = spark.createDataFrame(corpus_rows, ["doc_id", "text"])
    newb = spark.createDataFrame(new_rows, ["doc_id", "text"])
    got = {
        (r["new_id"], r["corpus_id"]): r["jaccard"]
        for r in incremental_minhash_pairs(
            newb, corpus, threshold=0.5).collect()
    }
    assert set(got) == {(101, 1), (101, 2), (102, 1), (102, 2)}
    # exact-Jaccard verification: 10-word base has 8 shingles, the
    # +1-word copy has 9 (8 shared + 1 new) → 8/9
    for v in got.values():
        assert v == round(8 / 9, 6)


def test_random_projection_matches_numpy_and_preserves_geometry(spark, sf_small):
    """The distributed projection equals the numpy matmul with the
    same hash-derived matrix exactly; JL property sanity: squared
    distances in the projected space track the originals (rank
    correlation on planted pairs)."""
    import numpy as np

    from pyppeteer_scraper_spark.operators.similarity import (
        _rp_sign,
        random_projection,
    )

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    pdf = emb.toPandas().sort_values("vec_id")
    x = np.stack([np.asarray(v, np.float64) for v in pdf["embedding"]])
    d_in, d_out = x.shape[1], 16
    r = np.array(
        [[_rp_sign(i, j) for j in range(d_out)] for i in range(d_in)],
        dtype=np.float64) / np.sqrt(d_out)
    want = x @ r

    got = random_projection(emb, d_out=d_out).toPandas()
    y = np.zeros((len(pdf), d_out))
    idx = {v: k for k, v in enumerate(pdf["vec_id"])}
    for _, row in got.iterrows():
        y[idx[row["vec_id"]], int(row["j"])] = row["y"]
    assert np.abs(y - want).max() < 1e-12

    # JL guarantee, testable form: E[||y||^2] = ||x||^2 (unbiased norm
    # preservation), with per-vector distortion shrinking ~1/sqrt(d)
    # as d_out grows.  (Pairwise-distance correlation is uninformative
    # on this corpus — the synthetic embeddings are near-isotropic, so
    # true distances are nearly constant and any projection noise
    # swamps their tiny variance.)
    def norm_ratios(d_out):
        rm = np.array(
            [[_rp_sign(i, j) for j in range(d_out)]
             for i in range(d_in)], dtype=np.float64) / np.sqrt(d_out)
        yy = x @ rm
        return (yy ** 2).sum(1) / (x ** 2).sum(1)

    r16, r48 = norm_ratios(16), norm_ratios(48)
    assert abs(r16.mean() - 1.0) < 0.1
    assert abs(r48.mean() - 1.0) < 0.1
    assert r48.std() < r16.std()  # distortion shrinks with d_out
