"""Sequence packing: greedy token-budget bin packing of documents into
training sequences.

LLM pretraining concatenates documents into fixed-budget sequences; the
assignment "next doc starts a new bin when it would overflow" is inherently
SEQUENTIAL within a stream — no window function expresses a cumulative sum
that resets at a data-dependent boundary. This is the textbook case for
``applyInPandas``: partition the corpus into independent streams (here:
language; production: shard id), run the sequential fold per stream in an
Arrow-batched pandas function, stay parallel ACROSS streams.

At 100 TB: streams = input shards (thousands), each a few GB — the
per-stream fold is linear and single-pass, the shuffle is one partition-by
on the stream key. Never pack across shards globally: a total order over
100 TB serializes the job for no training benefit.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def pack_sequences(
    docs: DataFrame,
    stream_col: str,
    order_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Assign each row a ``bin_id`` (0-based per stream): rows are taken in
    ``order_col`` order; a row opens a new bin when adding it would push
    the running token total over ``budget``. A single over-budget row
    occupies its (then-current) bin alone — flag-don't-drop, the caller
    decides truncation policy.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    # fresh StructType — StructType.add MUTATES, and mutating docs.schema
    # poisons the cached child schema the plan resolver sees
    schema = StructType(list(docs.schema.fields) + [StructField("bin_id", LongType())])

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        bins = []
        acc, b = 0, 0
        for nt in pdf[tokens_col]:
            nt = int(nt)
            if acc > 0 and acc + nt > budget:
                b += 1
                acc = nt
            else:
                acc += nt
            bins.append(b)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        return pdf

    return docs.groupBy(stream_col).applyInPandas(pack, schema=schema)
