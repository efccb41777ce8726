"""Corpus-quality signals and PII scrubbing for training-data pipelines.

Repetition signals are the Gopher-style (Rae et al. 2021, §A1.1) cheap
filters: documents dominated by one token or by repeated n-grams are
boilerplate/spam and get dropped before tokenization. Both signals here
are computed per row with ZERO shuffle — a single higher-order-function
pass over the token array — so at 100 TB they ride the corpus scan as a
narrow stage (cf. the SQL explode/groupBy formulation, which shuffles
O(total tokens); that version exists only in the DuckDB oracles).

PII scrubbing is pure `regexp_replace` chains (JVM-side, codegen): the
regex subset used is deliberately common to Java regex and RE2 so the
DuckDB oracle reproduces the masking bit-for-bit.

Reference parity: the reference has no corpus layer; these extend the
sanitizer family (app/utils.py:10-23, F1 sanitize) to document scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from graph_db_spark.operators.text import tokens


def top_word_fraction(text: Column | str) -> Column:
    """Fraction of tokens taken by the single most frequent token.

    Single pass: sort the token array, then one ``aggregate`` tracking the
    longest equal-run — identical to the multiset max count, with no
    explode/shuffle. Accumulator is a (prev, run, best) struct; higher-
    order functions run interpreted, so the one-traversal shape matters
    (same lesson as the MinHash signature, dedup.py:102-107).
    """
    t = F.sort_array(tokens(text))
    n = F.size(t)
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc: Column, x: Column) -> Column:
        new_run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"),
            new_run.alias("run"),
            F.greatest(acc["best"], new_run).alias("best"),
        )

    best = F.aggregate(t, init, step, lambda acc: acc["best"])
    return F.when(n > 0, best.cast("double") / n).otherwise(F.lit(0.0))


def dup_gram_fraction(text: Column | str, n: int) -> Column:
    """Fraction of word n-grams that are repeats of an earlier n-gram:
    ``1 - distinct/total`` (0.0 for docs shorter than n tokens). Non-
    distinct gram list built inline — ``text.word_ngrams`` dedups, which
    is right for decontamination but wrong for a repetition signal."""
    t = tokens(text)
    total = F.size(t) - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(total, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(t, i, n)),
    )
    return F.when(
        total > 0,
        (total - F.size(F.array_distinct(grams))).cast("double") / total,
    ).otherwise(F.lit(0.0))


# Regex subset shared by Java regex (Spark) and RE2 (DuckDB): character
# classes, bounded repetition, alternation — no backrefs, no lookaround.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
PHONE_RE = "[+][0-9]{2}-[0-9]{3}-[0-9]{4}"
CARD_RE = "[0-9]{16}"


def pii_counts(col: Column | str) -> tuple[Column, Column, Column]:
    """(n_emails, n_phones, n_cards) match counts — the audit row a
    scrubbing pipeline logs per shard."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), 0)),
        F.size(F.regexp_extract_all(c, F.lit(PHONE_RE), 0)),
        F.size(F.regexp_extract_all(c, F.lit(CARD_RE), 0)),
    )


def pii_scrub(col: Column | str) -> Column:
    """Mask emails → [EMAIL], +NN-NNN-NNNN phones → [PHONE], 16-digit
    runs → [CARD]. Order matters: emails first (an email may contain
    digit runs), cards before phones never collide by construction."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, EMAIL_RE, "[EMAIL]")
    c = F.regexp_replace(c, CARD_RE, "[CARD]")
    c = F.regexp_replace(c, PHONE_RE, "[PHONE]")
    return c
