"""A/B microbench (round 6): does Catalyst/codegen subexpression
elimination already share the gram/bucket subtrees that
``quality_model_score`` repeats across its three returned columns —
or do n_grams / score_raw / score each re-tokenize and re-hash?

Variant A = the shipped one-projection form (queries select all three
columns from one dict).  Variant B = staged projections: toks →
grams → raw/n → score, each referenced by column.  Outputs must be
row-identical; only evaluation count may differ.

Usage: python tools/bench_qmodel_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyppeteer_scraper_spark.session import get_spark
    from pyppeteer_scraper_spark.sources.tables import load_table
    from pyppeteer_scraper_spark.functions.classifier import (
        _WEIGHT_SPAN,
        default_weights,
        quality_model_score,
    )

    spark = get_spark("qmodel_ab", cores=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    docs = load_table(spark, sf_dir, "documents")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # --- A: shipped one-projection form -------------------------------
    def variant_a():
        cols = quality_model_score(F.col("text"))
        return docs.select(
            "doc_id",
            cols["n_grams"].alias("n_grams"),
            cols["score_raw"].alias("score_raw"),
            cols["score"].alias("score"),
        )

    # --- B: staged projections (identical arithmetic) ------------------
    def variant_b():
        w = default_weights()
        warr = F.array(*[F.lit(int(x)) for x in w])
        toks = F.filter(F.split(F.trim(F.lower(F.col("text"))), r"\W+"),
                        lambda t: t != "")
        s1 = docs.select("doc_id", toks.alias("__toks"))
        n = F.size(F.col("__toks"))
        bigrams = F.when(
            n >= 2,
            F.zip_with(
                F.slice("__toks", 1, n - 1),
                F.slice("__toks", 2, n - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
        ).otherwise(F.array().cast("array<string>"))
        s2 = s1.select("doc_id", F.concat("__toks", bigrams).alias("__grams"))
        buckets = F.transform(
            F.col("__grams"),
            lambda g: F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("\x1f", F.lit("qmodel-v1"), g)), 1, 6
                    ),
                    16,
                    10,
                ).cast("bigint"),
                F.lit(len(w)),
            ),
        )
        raw = F.aggregate(
            buckets,
            F.lit(0).cast("bigint"),
            lambda acc, b: acc
            + F.element_at(warr, (b + 1).cast("int")).cast("bigint"),
        )
        s3 = s2.select(
            "doc_id",
            F.size("__grams").cast("long").alias("n_grams"),
            raw.alias("score_raw"),
        )
        x = F.col("score_raw").cast("double") / (
            F.col("n_grams").cast("double") * float(_WEIGHT_SPAN)
        )
        return s3.select(
            "doc_id",
            "n_grams",
            "score_raw",
            F.when(
                F.col("n_grams") > 0,
                F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-x)), 6),
            ).otherwise(F.lit(0.5)).alias("score"),
        )

    # warm-up
    force(docs.select("doc_id").limit(10))

    out = {}
    for name, fn in (("A_one_projection", variant_a), ("B_staged", variant_b)):
        times = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"qmodel {name} rep{r}")
            t0 = time.time()
            force(fn())
            times.append(round(time.time() - t0, 3))
        out[name] = times

    # equality check: exceptAll both ways must be empty
    a, b = variant_a(), variant_b()
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    out["rows_differ"] = diff
    print(out)


if __name__ == "__main__":
    main()
