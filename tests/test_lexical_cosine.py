"""Golden tests for operators/search.py::lexical_cosine_topk — the
exact sparse tf-idf cosine over a df-pruned vocabulary.  The Spark
result is checked against an independent numpy tf-idf/cosine
computation on a tiny corpus (so any drift in weighting, norming,
pruning, or ranking fails loudly), plus a pruning-semantics check.
"""

import math

import numpy as np
import pytest


def _numpy_topk(texts, max_df_frac, top_n):
    """Independent dense re-derivation: tf-idf (idf=ln(n/df)),
    df-pruned vocab, L2 norm, all-pairs cosine, rounded-score rank."""
    n = len(texts)
    toks = [t.split(" ") for t in texts]
    vocab = sorted({w for ts in toks for w in ts})
    df = {w: sum(1 for ts in toks if w in set(ts)) for w in vocab}
    kept = [w for w in vocab if df[w] <= max_df_frac * n]
    mat = np.zeros((n, len(kept)))
    for i, ts in enumerate(toks):
        for j, w in enumerate(kept):
            c = ts.count(w)
            if c:
                mat[i, j] = c * math.log(n / df[w])
    out = {}
    norms = np.sqrt((mat * mat).sum(axis=1))
    kept_sets = [set(ts) & set(kept) for ts in toks]
    for i in range(n):
        if norms[i] == 0:
            continue
        sims = []
        for j in range(n):
            if j == i or norms[j] == 0:
                continue
            # the posting-list join emits a pair only when the docs
            # SHARE a kept term (even a zero-weight one); mirror that
            if not (kept_sets[i] & kept_sets[j]):
                continue
            cos = float(mat[i] @ mat[j] / (norms[i] * norms[j]))
            sims.append((round(cos, 6), j))
        sims.sort(key=lambda s: (-s[0], s[1]))
        out[i] = [(j, c) for c, j in sims[:top_n]]
    return out


TEXTS = [
    "spark shuffles rows fast",
    "spark shuffles rows slowly today",
    "ducks swim on the pond",
    "ducks swim fast on the river",
    "the pond and the river",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_matches_numpy_golden(spark, docs):
    from pyppeteer_scraper_spark.operators.search import lexical_cosine_topk

    got = {
        (r["doc_id"], r["rnk"]): (r["partner_id"], r["cos_sim"])
        for r in lexical_cosine_topk(
            docs, max_df_frac=1.0, top_n=2
        ).collect()
    }
    want = _numpy_topk(TEXTS, max_df_frac=1.0, top_n=2)
    for i, neigh in want.items():
        for rnk, (j, cos) in enumerate(neigh, start=1):
            pj, pcos = got[(i, rnk)]
            assert pj == j, (i, rnk, pj, j)
            assert abs(pcos - cos) <= 1e-6, (i, rnk, pcos, cos)
    # no extra rows beyond the golden's
    assert len(got) == sum(len(v) for v in want.values())


def test_df_pruning_drops_stopword_pairs(spark, docs):
    """'the' appears in 3/5 docs (df=0.6n): with max_df_frac=0.5 it is
    pruned, so doc 4 ("the pond and the river") keeps only pond/and/
    river signal; its similarity to doc 2 must come from 'pond' alone
    and the numpy golden under the same cap must agree exactly."""
    from pyppeteer_scraper_spark.operators.search import lexical_cosine_topk

    got = {
        (r["doc_id"], r["rnk"]): (r["partner_id"], r["cos_sim"])
        for r in lexical_cosine_topk(
            docs, max_df_frac=0.5, top_n=3
        ).collect()
    }
    want = _numpy_topk(TEXTS, max_df_frac=0.5, top_n=3)
    for i, neigh in want.items():
        for rnk, (j, cos) in enumerate(neigh, start=1):
            pj, pcos = got[(i, rnk)]
            assert pj == j
            assert abs(pcos - cos) <= 1e-6
    assert len(got) == sum(len(v) for v in want.values())


def test_no_crossjoin_in_plan(spark, docs):
    """Candidate generation must be the posting-list equi-join on term,
    never an all-pairs cartesian: the physical plan may not contain a
    CartesianProduct, and BroadcastNestedLoopJoin only as the 1-row
    scalar stats attach."""
    import contextlib
    import io

    from pyppeteer_scraper_spark.operators.search import lexical_cosine_topk

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        lexical_cosine_topk(docs).explain("formatted")
    assert "CartesianProduct" not in buf.getvalue()
