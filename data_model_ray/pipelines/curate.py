"""End-to-end training-data curation pipeline (composition showcase).

``curate_docs`` chains the engine's LLM-data operators the way a real
corpus-curation job runs them, each stage streaming into the next:

1. quality filter       — single-pass byte kernel (stages/text.py), keep
                          docs with score >= min_score
2. exact dedup          — hash-bucket shuffle keeping min doc_id per
                          identical text (stages/dedup.py)
3. near-dup clustering  — exact shingle-Jaccard pairs (stages/neardup.py)
                          -> connected components (stages/graph.py)
4. cluster dedup        — keep the min-doc_id representative per
                          component (broadcast anti-join)

Every stage is individually oracled elsewhere; the composition has its
own single DuckDB oracle (CTE chain in ``__ray_entry__.oracle_sql``) so
the driver hash-checks the WHOLE pipeline end to end.

Scale notes: the curated (id, text, lang) table is materialized once
between stage 2 and the two stage-3/4 consumers (pair generation and the
final filter) — object-store backed, spills under pressure; everything
else is a streaming exchange. The only corpus-sized shuffles are the
exact-dedup bucket exchange and the Jaccard block-pair exchange.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def curate_docs(
    sf_dir: str,
    *,
    min_score: float = 0.86,
    jaccard_threshold: float = 0.5,
    method: str = "lsh",
    substring_k: int | None = None,
):
    """documents -> curated (doc_id, lang) after quality filter, exact
    dedup, and near-dup cluster dedup.

    With ``substring_k`` set, a 5th stage runs exact duplicated-substring
    span removal (``webtext.substring_spans``, ExactSubstr discipline)
    over the surviving docs — the full RefinedWeb-style chain — and the
    output becomes (doc_id, lang, n_tokens, removed_tokens, kept_text).

    ``method`` picks the near-dup pair generator for stage 3:

    - ``"lsh"`` (default, the 100-TB path): MinHash-LSH candidates with
      exact-Jaccard verification — band exchange + pair-bucket exchange
      with the budget-counted broadcast pair list (corpus text never
      shuffles; join fallback when the pair table exceeds the budget)
      (``stages/neardup.minhash_lsh_candidates``).
    - ``"exact"``: all-pairs shingle Jaccard — O(N^2) block-pair triangle
      join; the SQL-expressible oracle/verifier rung
      (``stages/neardup.jaccard_all_pairs``).

    Both modes produce the SAME verified pair set whenever LSH recall is
    100% (true on the test fixtures — pinned by
    ``tests/test_dedup_modes.py``; mirrors the reference's
    two-implementations-one-pinned-semantic discipline,
    /root/reference/src/eopf_geozarr/conversion/s2_resampling.py:206-212),
    so the driver hash-checks the LSH default against the exact-mode
    DuckDB CTE oracle.
    """
    from ..sources.fs import sized_read_parquet
    from ..stages.dedup import dedup_exact
    from ..stages.graph import connected_components, keep_one_per_cluster
    from ..stages.neardup import jaccard_all_pairs, minhash_lsh_candidates
    from ..stages.text import text_stats

    ds = sized_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def quality_filter(t: pa.Table) -> pa.Table:
        s = text_stats(t)
        # identical rounding to doc_quality / its oracle, so the >= compare
        # bites the same rows in both engines
        score = pc.round(
            s["score"], ndigits=6, round_mode="half_towards_infinity"
        )
        keep = pc.greater_equal(score, pa.scalar(min_score))
        return t.filter(keep)

    qual = ds.map_batches(quality_filter, batch_format="pyarrow")

    def neg(t: pa.Table) -> pa.Table:
        return t.append_column("__neg_id", pc.negate_checked(t["doc_id"]))

    exact = dedup_exact(
        qual.map_batches(neg, batch_format="pyarrow"),
        key="text",
        order_col="__neg_id",  # max(-id) == min(id)
        num_buckets=16,
    ).select_columns(["doc_id", "text", "lang"]).materialize()

    if method == "lsh":
        pairs = minhash_lsh_candidates(docs=exact, threshold=jaccard_threshold)
    elif method == "exact":
        pairs = jaccard_all_pairs(docs=exact, threshold=jaccard_threshold)
    else:
        raise ValueError(f"unknown near-dup method: {method!r}")
    comps = connected_components(pairs)
    if substring_k is None:
        return keep_one_per_cluster(
            exact.select_columns(["doc_id", "lang"]), comps
        )
    from .webtext import substring_spans

    survivors = keep_one_per_cluster(
        exact.select_columns(["doc_id", "text", "lang"]), comps
    )
    out = substring_spans(survivors, k=substring_k)
    return out.select_columns(
        ["doc_id", "lang", "n_tokens", "removed_tokens", "kept_text"]
    )
