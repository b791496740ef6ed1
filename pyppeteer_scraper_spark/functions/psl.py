"""Public-suffix (eTLD+1) registrable-domain extraction.

Everything host-keyed in a web-scale crawl — politeness budgets
(`plans/round.py`), host-quality priors (`operators/hostquality.py`),
SURT clustering (`functions/canonicalize.py::surt_key`), URL filters
(`functions/urlfilter.py`) — is only correct if "host" means the
REGISTRABLE domain: `a.example.co.uk` and `b.example.co.uk` are one
site (one crawl-delay budget, one quality prior), while
`example1.co.uk` and `example2.co.uk` are different sites even though
they share more trailing labels than `x.com` / `y.com` share.  The
reference sidesteps this entirely (it crawls a fixed handful of
first-party hosts: scraper/costco.py, scraper/home_depo.py); a
Common-Crawl-scale frontier cannot.

Algorithm — publicsuffix.org/list/ (the public PSL spec):
  1. a rule matches when the host's trailing labels equal the rule's
     labels; ``*`` in a rule matches exactly one host label,
  2. an exception rule (``!``-prefixed) prevails over all others and
     makes the public suffix the rule MINUS its leftmost label,
  3. otherwise the longest matching rule is the public suffix,
  4. no match → the default rule ``*`` applies (suffix = last label),
  5. registrable domain = public suffix + one preceding label
     (NULL when the host IS a public suffix).

Spark shape: per host, generate the ≤2·MAX_RULE_LABELS candidate keys
(the literal k-label suffix and its ``*``-headed variant), explode,
equi-join against the broadcast rules dim (the full PSL is ~10^4 rows
— trivially broadcastable at any corpus scale), and aggregate the
prevailing rule per row.  All codegen built-ins; the only shuffle is
the final groupBy on the caller's row id, and the join never expands
(each candidate matches at most one rule key).

``DEFAULT_RULES`` is a deliberately small spec-covering subset (normal,
multi-label, wildcard, exception) for tests and the driver oracle;
production callers pass the full downloaded PSL as ``rules``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Longest rule the matcher considers; the real PSL's deepest rule is 5
# labels, and candidate generation cost is linear in this.
MAX_RULE_LABELS = 5

DEFAULT_RULES = [
    "com",
    "org",
    "net",
    "io",
    "uk",
    "co.uk",
    "gov.uk",
    "github.io",
    "jp",
    "*.ck",
    "!www.ck",
    "*.kawasaki.jp",
    "!city.kawasaki.jp",
    "example",
]


def psl_rules_df(spark: SparkSession, rules: list[str] | None = None) -> DataFrame:
    """Parse PSL rule strings into the join dim:
    ``(rule_key, n_labels, is_exception)``.  Exception rules keep their
    literal labels as the key (the ``!`` is semantics, not matching).
    """
    rows = []
    for r in rules if rules is not None else DEFAULT_RULES:
        r = r.strip().lower()
        if not r or r.startswith("//"):
            continue
        exc = r.startswith("!")
        key = r[1:] if exc else r
        rows.append((key, len(key.split(".")), exc))
    return spark.createDataFrame(rows, "rule_key string, n_labels int, is_exception boolean")


def registrable_domain(
    df: DataFrame,
    host_col: str = "host",
    rules_df: DataFrame | None = None,
    out_col: str = "registrable",
) -> DataFrame:
    """Append ``(public_suffix, <out_col>)`` to ``df``.

    ``public_suffix`` is the prevailing PSL match; ``<out_col>`` is the
    eTLD+1 (NULL when the host is itself a public suffix).  One
    broadcast join + one groupBy(__psl_id); every expression is a
    Catalyst built-in.
    """
    spark = df.sparkSession
    if rules_df is None:
        rules_df = psl_rules_df(spark)

    tagged = df.withColumn("__psl_id", F.monotonically_increasing_id())
    host = F.lower(F.regexp_replace(F.col(host_col), r"\.$", ""))
    labels = F.split(host, r"\.")
    nl = F.size(labels)

    # Candidate keys: for k = 1..MAX_RULE_LABELS (k ≤ #labels), the
    # literal k-label suffix and, for k ≥ 2, the same suffix with its
    # leftmost label replaced by '*'.  At most 2·MAX_RULE_LABELS rows
    # per host — a bounded explode, not a combinatorial one.
    cands = []
    for k in range(1, MAX_RULE_LABELS + 1):
        lit = F.when(
            nl >= k, F.concat_ws(".", F.slice(labels, nl - k + 1, k))
        )
        cands.append(F.struct(lit.alias("key"), F.lit(k).alias("k")))
        if k >= 2:
            wild = F.when(
                nl >= k,
                F.concat_ws(
                    ".", F.lit("*"), F.concat_ws(".", F.slice(labels, nl - k + 2, k - 1))
                ),
            )
            cands.append(F.struct(wild.alias("key"), F.lit(k).alias("k")))

    exploded = (
        tagged.select(
            "__psl_id",
            labels.alias("__labels"),
            nl.alias("__nl"),
            F.explode(F.filter(F.array(*cands), lambda c: c["key"].isNotNull())).alias("c"),
        )
        .join(
            F.broadcast(rules_df),
            (F.col("c.key") == F.col("rule_key")) & (F.col("c.k") == F.col("n_labels")),
            "left",
        )
    )
    # Prevailing rule per host: any exception → its (n_labels - 1);
    # else the longest normal match; else the default rule (1 label).
    agg = exploded.groupBy("__psl_id", "__labels", "__nl").agg(
        F.max(F.when(F.col("is_exception"), F.col("n_labels") - 1)).alias("__exc_len"),
        F.max(F.when(F.col("is_exception") == F.lit(False), F.col("n_labels"))).alias(
            "__match_len"
        ),
    )
    suffix_len = F.coalesce(F.col("__exc_len"), F.col("__match_len"), F.lit(1))
    resolved = agg.select(
        "__psl_id",
        F.concat_ws(
            ".", F.slice(F.col("__labels"), F.col("__nl") - suffix_len + 1, suffix_len)
        ).alias("public_suffix"),
        F.when(
            F.col("__nl") > suffix_len,
            F.concat_ws(
                ".",
                F.slice(F.col("__labels"), F.col("__nl") - suffix_len, suffix_len + 1),
            ),
        ).alias(out_col),
    )
    return tagged.join(resolved, "__psl_id").drop("__psl_id")
