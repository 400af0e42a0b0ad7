"""Sequence packing — grouping documents into fixed token-budget packs,
the step that turns a filtered corpus into training-context-sized
chunks.

Greedy first-fit in a deterministic order: documents are sharded by
``doc_id % n_shards``, ordered by id within the shard, and a new pack
starts whenever the running whitespace-token total would exceed the
budget (an oversized document gets a pack of its own). Packing is
inherently sequential WITHIN a shard and embarrassingly parallel ACROSS
shards, so the shard is the scale unit: one applyInPandas group per
shard, thousands of shards on a real corpus — no global ordering, no
driver loop.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACK_SCHEMA = "doc_id long, shard int, pack_id int, n_tok int"


def pack_documents(docs: DataFrame, budget: int = 512,
                   n_shards: int = 8, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(doc_id, shard, pack_id, n_tok) under greedy first-fit packing
    with a whitespace-token budget per pack."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        packs = []
        run = 0
        pack = -1
        for t in pdf["n_tok"]:
            if pack < 0 or run + t > budget:
                pack += 1
                run = int(t)
            else:
                run += int(t)
            packs.append(pack)
        pdf["pack_id"] = packs
        return pdf[[id_col, "shard", "pack_id", "n_tok"]]

    base = docs.select(
        F.col(id_col),
        (F.col(id_col) % n_shards).cast("int").alias("shard"),
        F.size(F.split(F.col(text_col), " ")).cast("int").alias("n_tok"))
    return base.groupBy("shard").applyInPandas(kernel, schema=PACK_SCHEMA)
