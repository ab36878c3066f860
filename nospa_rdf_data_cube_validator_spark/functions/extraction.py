"""Vectorized mention detection / triple extraction over transcript turns.

This is the pipeline's only Python data-plane code, and it runs as
Arrow-batched ``mapInPandas`` (no per-row Python UDFs, per BASELINE.json
input_hint). Extraction uses pandas' vectorized ``str.extract`` per relation
template; keys (conv_id, turn_idx) ride through every batch so the
per-turn-text-equality invariant under repartitioning is preserved by
construction.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from . import entities as E

MENTION_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("rel", StringType(), False),
        StructField("subj_surface", StringType(), False),
        StructField("obj_surface", StringType(), False),
    ]
)


def _template_patterns() -> list[tuple[str, str]]:
    """(regex, relation_local_id) per template; '{}' slots become lazy
    capture groups anchored by the template's literal text."""
    pats = []
    for tmpl, rel in E.TEMPLATES:
        parts = [re.escape(p) for p in tmpl.split("{}")]
        pattern = "^" + "(.+?)".join(parts) + "$"
        pats.append((pattern, rel))
    return pats


def extract_mentions(transcripts: DataFrame, extra_cols: list[str] | None = None) -> DataFrame:
    """(conv_id, turn_idx, text) -> (conv_id, turn_idx, rel, subj_surface, obj_surface).

    One output row per detected relation mention. Turns whose text matches
    no template produce no rows (dropped, not nulled). ``extra_cols`` are
    carried through unchanged (e.g. ``ts`` for streaming event-time) —
    streaming queries can't rejoin the stream on itself, so pass-through is
    the only watermark-safe way to keep them."""
    patterns = _template_patterns()
    extra_cols = extra_cols or []
    schema = StructType(
        MENTION_SCHEMA.fields
        + [transcripts.schema[c] for c in extra_cols]
    )

    # Literal mid-segment per template ("{}A{}B" -> "A"): a regex match
    # requires the escaped literal as a substring, so a vectorized
    # non-regex contains() pre-filter is a sound necessary condition —
    # the (much slower) per-row regex then runs only on candidate rows
    # instead of the whole batch, once per template (guide §4.2).
    mids = [t.split("{}")[1] for t, _ in E.TEMPLATES]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = pdf["text"].astype("string")
            outs = []
            for (pattern, rel), mid in zip(patterns, mids):
                cand = texts.str.contains(mid, regex=False).fillna(False) if mid else None
                sub = texts[cand] if cand is not None else texts
                if sub.empty:
                    continue
                ext = sub.str.extract(pattern, expand=True)
                hit = ext.index[ext[0].notna()]
                if hit.empty:
                    continue
                data = {
                    "conv_id": pdf.loc[hit, "conv_id"],
                    "turn_idx": pdf.loc[hit, "turn_idx"].astype("int32"),
                    "rel": rel,
                    "subj_surface": ext.loc[hit, 0],
                    "obj_surface": ext.loc[hit, 1],
                }
                for c in extra_cols:
                    data[c] = pdf.loc[hit, c]
                outs.append(pd.DataFrame(data))
            if outs:
                yield pd.concat(outs, ignore_index=True)
            else:
                yield pd.DataFrame({f.name: pd.Series(dtype="object") for f in schema.fields})

    from ..session import spread

    # parallelism floor for the regex kernel: a single-partition scan
    # would serialize the extraction on one Python worker (no-op for
    # streaming frames and well-partitioned inputs)
    cols = spread(transcripts.select("conv_id", F.col("turn_idx").cast("int"), "text", *extra_cols))
    return cols.mapInPandas(gen, schema=schema)
