"""Text analysis stages: token counts, quality scoring, language-ID, fingerprints.

Large-scale training-data-pipeline operators (task brief "Text analysis"),
expressed as vectorized Arrow kernels inside ``map_batches``. Semantics are
the engine's analogues of the reference's variable-type classifier +
type-aware processing (/root/reference/src/eopf_geozarr/s2_optimization/
s2_resampling.py:172-203): ``score`` is the probability-like [0,1] column
(clipped-mean rollups, A5) and ``flag`` the quality-mask-like bitmask column
(max/any rollups, A3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_PATTERN = r"[A-Za-z0-9_]+"

#: quality-flag bits (quality-mask analogue; rollup = Max = any-set)
FLAG_SHORT = 1  # text shorter than 80 chars
FLAG_LONG = 2  # text longer than 4000 chars
FLAG_LOW_ALPHA = 4  # alpha ratio < 0.6

# tiny per-language stopword marker sets for the n-gram/stopword language-ID
# heuristic (public linguistics commonplaces, not a model)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "la", "los", "que", "es"],
    "ru": ["i", "v", "ne", "na", "chto"],
    "zh": ["de", "shi", "le", "zai", "he"],
    "ja": ["no", "ni", "wa", "wo", "ga"],
}


def text_stats(batch: pa.Table) -> pa.Table:
    """Adds ``token_count``, ``alpha_ratio``, ``score`` (in [0,1]) and
    ``flag`` (uint8 bitmask) from the ``text`` column. Stateless vectorized
    kernel — deployed as a task stage (fuses with neighbors)."""
    return _text_stats_impl(batch)


class TextStats:
    """Callable-class wrapper for when a heavier scorer needs per-actor state."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _text_stats_impl(batch)


def _text_stats_impl(batch: pa.Table) -> pa.Table:
    text = batch["text"]
    n_chars = pc.utf8_length(text).cast(pa.float64())
    tokens = pc.count_substring_regex(text, TOKEN_PATTERN).cast(pa.int64())
    # alpha ratio via total letters count (vectorized regex count)
    letters = pc.count_substring_regex(text, r"[A-Za-z]").cast(pa.float64())
    safe_n = pc.max_element_wise(n_chars, pa.scalar(1.0))
    alpha_ratio = pc.divide(letters, safe_n)

    # quality score in [0,1]: mean-word-length closeness to 5 chars and
    # alpha ratio, equally weighted, clipped (probability-type analogue)
    mean_wlen = pc.divide(
        n_chars, pc.max_element_wise(tokens.cast(pa.float64()), pa.scalar(1.0))
    )
    wlen_term = pc.subtract(
        pa.scalar(1.0),
        pc.min_element_wise(
            pc.divide(pc.abs(pc.subtract(mean_wlen, pa.scalar(5.0))), pa.scalar(5.0)),
            pa.scalar(1.0),
        ),
    )
    score = pc.min_element_wise(
        pc.max_element_wise(
            pc.divide(pc.add(wlen_term, alpha_ratio), pa.scalar(2.0)),
            pa.scalar(0.0),
        ),
        pa.scalar(1.0),
    )

    nc = n_chars.combine_chunks() if isinstance(n_chars, pa.ChunkedArray) else n_chars
    n = nc.to_numpy(zero_copy_only=False)
    ar = (
        alpha_ratio.combine_chunks()
        if isinstance(alpha_ratio, pa.ChunkedArray)
        else alpha_ratio
    ).to_numpy(zero_copy_only=False)
    flag = np.zeros(len(batch), dtype=np.uint8)
    flag |= np.where(n < 80, FLAG_SHORT, 0).astype(np.uint8)
    flag |= np.where(n > 4000, FLAG_LONG, 0).astype(np.uint8)
    flag |= np.where(ar < 0.6, FLAG_LOW_ALPHA, 0).astype(np.uint8)

    out = batch.append_column("token_count", tokens)
    out = out.append_column("alpha_ratio", alpha_ratio)
    out = out.append_column("score", score)
    out = out.append_column("flag", pa.array(flag))
    return out


class LangId:
    """Stopword-marker language-ID heuristic. Adds ``lang_pred``.

    Compiled marker regexes are the once-per-actor state (ray guide
    actor-pool pattern; reference analogue: CF vocabulary loaded once,
    /root/reference/src/eopf_geozarr/data_api/geozarr/common.py:107-167).
    """

    def __init__(self):
        self.patterns = {
            lang: r"\b(" + "|".join(markers) + r")\b"
            for lang, markers in LANG_MARKERS.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch["text"]
        n = len(batch)
        counts = np.zeros((n, len(self.patterns)), dtype=np.int64)
        langs = list(self.patterns)
        for k, lang in enumerate(langs):
            c = pc.count_substring_regex(text, self.patterns[lang])
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            counts[:, k] = c.to_numpy(zero_copy_only=False)
        best = counts.argmax(axis=1)
        pred = np.array(langs)[best]
        pred[counts.max(axis=1) == 0] = "und"
        return batch.append_column("lang_pred", pa.array(pred))


def fingerprint64(text_col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """64-bit content fingerprint per string (vectorized via polars xxhash).

    Deterministic within a run environment; used for hash-partitioned exact
    text dedup and doc fingerprint rollups (document fingerprinting op).
    """
    import polars as pl

    s = pl.from_arrow(
        text_col.combine_chunks()
        if isinstance(text_col, pa.ChunkedArray)
        else text_col
    )
    return s.hash(seed=42).to_numpy().astype(np.uint64)


class Fingerprint:
    """Adds ``text_hash`` (uint64) — rolling/content hash stage."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "text_hash", pa.array(fingerprint64(batch["text"]))
        )
