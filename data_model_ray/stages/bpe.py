"""Deterministic subword (BPE-style) tokenizer — train, apply, replay.

Classic byte-pair-encoding learns a merge table from corpus word counts
and tokenizes by applying the merges in rank order. This implementation
defines the merge-application semantics as REPLACE-UNTIL-FIXPOINT on a
space-separated symbol string (`` h e l l o `` -> merge ``(l,l)`` ->
`` h e ll o ``): for each merge rank, ``s.replace(' a b ', ' ab ')`` runs
repeatedly until no occurrence remains. That rule is (a) deterministic,
(b) identical in Python and in SQL (nested ``replace()`` calls), so the
token counts are DuckDB-replayable with the trained merge table embedded
as CTEs — the property the correctness gate needs. (Sennrich-style BPE
differs only on runs of 3+ identical symbols, where one replace pass can
skip the middle pair; fixpoint iteration converges to a deterministic
result either way.)

Scale shape: training input is the corpus WORD-COUNT table — one bucketed
exchange of per-block (word, cnt) partials, vocabulary-bounded output —
then the merge loop runs driver-side over distinct words only (the
``doc_logprob`` vocabulary-bounded discipline). Application broadcasts
the merge list via ``ray.put`` and encodes per block with a per-distinct-
word memo, so the per-row cost is a dict lookup.

Tie-breaks: highest pair count wins; equal counts break by lexicographic
smallest (a, b) — byte order, engine- and replay-stable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _spaced(word: str) -> str:
    return " " + " ".join(word) + " "


def _apply_merge(s: str, a: str, b: str) -> str:
    """Replace-until-fixpoint of one merge on a spaced symbol string."""
    pat, rep = f" {a} {b} ", f" {a}{b} "
    while pat in s:
        s = s.replace(pat, rep)
    return s


def apply_merges(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Tokenize one word with the merge table (rank order)."""
    s = _spaced(word)
    for a, b in merges:
        s = _apply_merge(s, a, b)
    return s.split()


def train_bpe(
    words: list[str], counts: np.ndarray, n_merges: int
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merges from (distinct word, count) pairs.

    Pure + deterministic: pair frequencies count every adjacent occurrence
    weighted by the word count; the best pair is (max count, then
    lexicographically smallest). Stops early when no adjacent pair occurs
    at least twice.
    """
    spaced = [_spaced(w) for w in words]
    cnts = np.asarray(counts, dtype=np.int64)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for s, c in zip(spaced, cnts):
            syms = s.split()
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                pair_counts[k] = pair_counts.get(k, 0) + int(c)
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        merges.append((a, b))
        spaced = [_apply_merge(s, a, b) for s in spaced]
    return merges


def corpus_word_counts(ds, *, text_col: str = "text", num_buckets: int = 64):
    """Distributed corpus word counts -> driver DataFrame (word, cnt).

    One bucketed exchange of per-block partials; the collect is bounded by
    the vocabulary, not the corpus.
    """
    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.list_flatten(
            pc.split_pattern(
                t[text_col].combine_chunks().cast(pa.large_string()), " "
            )
        )
        toks = toks.filter(pc.not_equal(toks, pa.scalar("", pa.large_string())))
        vc = toks.value_counts()
        df = pd.DataFrame(
            {
                "word": vc.field("values").to_pandas().astype(str),
                "cnt": vc.field("counts").to_numpy(zero_copy_only=False),
            }
        )
        df["bucket"] = (
            pd.util.hash_pandas_object(df["word"], index=False).to_numpy(np.uint64)
            % np.uint64(num_buckets)
        ).astype(np.int32)
        return df

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("word", sort=False)["cnt"].sum().reset_index()
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(combine, batch_format="pandas")
    )
    from ..sources.fs import to_pandas_cols

    wc = to_pandas_cols(out, {"word": "object", "cnt": "int64"})
    return wc.sort_values("word", kind="mergesort").reset_index(drop=True)


def corpus_merges(
    sf_dir: str, *, text_col: str = "text", n_merges: int = 30
) -> list[tuple[str, str]]:
    """Train the merge table on ``documents`` (the distributed path)."""
    from ..sources.fs import sized_read_parquet

    ds = sized_read_parquet(f"{sf_dir}/documents.parquet", columns=[text_col])
    wc = corpus_word_counts(ds, text_col=text_col)
    return train_bpe(wc["word"].tolist(), wc["cnt"].to_numpy(), n_merges)


class BpeEncoder:
    """Per-actor memoized BPE application (merges broadcast once)."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.merges = merges
        self._cache: dict[str, int] = {}
        self._tok_cache: dict[str, list[str]] = {}

    def token_count(self, word: str) -> int:
        n = self._cache.get(word)
        if n is None:
            n = len(apply_merges(word, self.merges))
            self._cache[word] = n
        return n

    def tokens(self, word: str) -> list[str]:
        t = self._tok_cache.get(word)
        if t is None:
            t = apply_merges(word, self.merges)
            self._tok_cache[word] = t
        return t

    def count_texts(self, texts: list[str]) -> np.ndarray:
        out = np.empty(len(texts), dtype=np.int64)
        for i, txt in enumerate(texts):
            out[i] = sum(self.token_count(w) for w in txt.split(" ") if w)
        return out

    def tokenize_texts(self, texts: list[str]) -> list[list[str]]:
        return [
            [t for w in txt.split(" ") if w for t in self.tokens(w)]
            for txt in texts
        ]


#: per-worker-process encoder cache keyed by the broadcast ref — map
#: functions run once per BATCH, and rebuilding the encoder there would
#: throw away the distinct-word memo every batch
_ENCODER_CACHE: dict[str, BpeEncoder] = {}


def encoder_for(merges_ref) -> BpeEncoder:
    """Worker-side: the (cached) BpeEncoder for a ``ray.put`` merges ref."""
    import ray

    key = merges_ref.hex() if hasattr(merges_ref, "hex") else str(merges_ref)
    enc = _ENCODER_CACHE.get(key)
    if enc is None:
        enc = BpeEncoder(ray.get(merges_ref))
        _ENCODER_CACHE.clear()  # one live tokenizer per worker is plenty
        _ENCODER_CACHE[key] = enc
    return enc


def bpe_token_counts(sf_dir: str, *, n_merges: int = 30):
    """(doc_id, n_subtok) per document under the corpus-trained merges."""
    import ray

    from ..sources.fs import sized_read_parquet

    merges = corpus_merges(sf_dir, n_merges=n_merges)
    mref = ray.put(merges)
    ds = sized_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    class Encode:
        def __init__(self):
            self.enc = BpeEncoder(ray.get(mref))

        def __call__(self, t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": t["doc_id"].cast(pa.int64()),
                    "n_subtok": pa.array(
                        self.enc.count_texts(t["text"].to_pylist())
                    ),
                }
            )

    # autoscaling pool from 1: a fixed pool the size of the CPU count
    # starves the upstream read tasks on small clusters (observed: the
    # 4-actor pool on the 4-CPU test session stalled the whole pipeline)
    return ds.map_batches(Encode, batch_format="pyarrow", concurrency=(1, 4))


# --- SQL replay (oracle generation) ----------------------------------------


def merge_pass_counts(
    words: list[str], merges: list[tuple[str, str]]
) -> list[int]:
    """Per-merge replace-until-fixpoint pass counts over ``words`` — the
    exact nesting depth the SQL replay needs for this corpus."""
    spaced = [_spaced(w) for w in words]
    out: list[int] = []
    for a, b in merges:
        pat, rep = f" {a} {b} ", f" {a}{b} "
        mx = 1
        nxt = []
        for s in spaced:
            p = 0
            while pat in s:
                s = s.replace(pat, rep)
                p += 1
            mx = max(mx, p)
            nxt.append(s)
        spaced = nxt
        out.append(mx)
    return out


def replay_sql(merges: list[tuple[str, str]], passes: list[int]) -> str:
    """DuckDB CTE chain that tokenizes ``documents.text`` by replaying the
    merge table with nested replace() (``passes[r]`` nestings per merge —
    must cover the longest fixpoint iteration, see ``merge_pass_counts``)
    and emits ``bpe(doc_id, n_subtok)``. Deterministic twin of
    ``BpeEncoder``."""

    def esc(s: str) -> str:
        return s.replace("'", "''")

    expr = "' ' || regexp_replace(w, '(.)', '\\1 ', 'g')"
    for (a, b), k in zip(merges, passes):
        pat, rep = esc(f" {a} {b} "), esc(f" {a}{b} ")
        for _ in range(k):
            expr = f"replace({expr}, '{pat}', '{rep}')"
    return f"""
    bpe_words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    bpe_tok AS (
        SELECT doc_id,
               array_length(string_split(trim({expr}), ' ')) AS ntok
        FROM bpe_words WHERE w <> ''
    ),
    bpe AS (
        SELECT d.doc_id, COALESCE(s.n_subtok, 0) AS n_subtok
        FROM documents d LEFT JOIN (
            SELECT doc_id, SUM(ntok)::BIGINT AS n_subtok
            FROM bpe_tok GROUP BY doc_id
        ) s USING (doc_id)
    )
    """
