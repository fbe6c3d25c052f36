"""Near-duplicate detection suite (task brief "Deduplication"):

- **MinHash + LSH**: word-shingle -> k minhashes -> banded LSH buckets ->
  ``groupby(band_id, band_hash)`` -> candidate pairs -> exact n-gram Jaccard
  verify. The shingle/minhash/band stages are vectorized per batch
  (reduceat over flat shingle arrays); the bucket groupby is the only
  shuffle and moves (band, hash, doc_id) triples, never text.
- **SimHash**: 64-bit sign fingerprints from token hashes (vectorized bit
  sums); near-dups = hamming distance <= t (pairs via identical-simhash
  buckets here; banded simhash pieces for distance>0 at scale).
- **n-gram Jaccard**: exact verify kernel shared with minhash.
- **embedding cosine near-dup**: pairs with cosine >= threshold
  (per-batch matmul vs a broadcast normalized matrix at small scale; the
  documented scale path is LSH bucketing as in ``knn.knn_embeddings_lsh``).

Determinism: all hashing is splitmix64 with fixed seeds; candidate pairs
are emitted with doc_a < doc_b and sorted output.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..hashing import hash_stream, splitmix64

U64 = np.uint64
N_PERM = 64
N_BANDS = 8  # 8 bands x 8 rows
ROWS_PER_BAND = N_PERM // N_BANDS
SHINGLE_W = 3


def _token_hashes(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Flat token-hash array + row offsets, fully vectorized.

    Tokenization = whitespace split (Arrow ``split_pattern``); token hashes
    = polars xxhash over the flattened token column (seed fixed -> process-
    independent determinism), mixed through splitmix64. No Python loop over
    rows or tokens.
    """
    import polars as pl
    import pyarrow.compute as pc

    arr = pa.array(texts, type=pa.large_string())
    lists = pc.split_pattern(arr, " ")
    # offsets of the list array give token counts per row
    offsets = np.asarray(lists.offsets)
    flat_tokens = lists.flatten()
    if len(flat_tokens) == 0:
        return np.array([], dtype=U64), offsets.astype(np.int64)
    hashed = (
        pl.from_arrow(flat_tokens.cast(pa.large_string()))
        .hash(seed=7)
        .to_numpy()
        .astype(U64)
    )
    return splitmix64(hashed), offsets.astype(np.int64)


def shingle_hashes(texts: list[str], w: int = SHINGLE_W) -> tuple[np.ndarray, np.ndarray]:
    """Unique word-w-gram shingle hashes (flat) + row offsets, vectorized.

    Rolling FNV-style mix over w shifted views of the flat token array;
    windows crossing row boundaries are masked out; per-row set-dedup is a
    single lexsort over (row, hash). Rows with < w tokens fall back to
    per-token shingles (so short docs still fingerprint).
    """
    flat, offsets = _token_hashes(texts)
    n_rows = len(offsets) - 1
    n_tok = len(flat)
    counts = np.diff(offsets)
    if n_tok == 0:
        return np.array([], dtype=U64), np.zeros(n_rows + 1, dtype=np.int64)

    # row id of each flat token position
    row_of = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
    # rolling w-gram mix at each window start position
    n_win = max(0, n_tok - w + 1)
    with np.errstate(over="ignore"):
        if n_win > 0:
            acc = flat[:n_win].copy()
            for j in range(1, w):
                acc = acc * U64(0x100000001B3) ^ flat[j : n_win + j]
            win_hash = splitmix64(acc)
            # a window is valid if it does not cross a row boundary
            valid = row_of[:n_win] == row_of[w - 1 :]
        else:
            win_hash = np.array([], dtype=U64)
            valid = np.array([], dtype=bool)

    # short rows (< w tokens): every token is its own shingle
    short_rows = counts < w
    extra_mask = short_rows[row_of]
    sh_rows = np.concatenate([row_of[:n_win][valid], row_of[extra_mask]])
    sh_hash = np.concatenate([win_hash[valid], splitmix64(flat[extra_mask])])

    # per-row unique via lexsort over (row, hash)
    order = np.lexsort((sh_hash, sh_rows))
    sh_rows = sh_rows[order]
    sh_hash = sh_hash[order]
    keep = np.ones(len(sh_rows), dtype=bool)
    if len(sh_rows) > 1:
        keep[1:] = (sh_rows[1:] != sh_rows[:-1]) | (sh_hash[1:] != sh_hash[:-1])
    sh_rows = sh_rows[keep]
    sh_hash = sh_hash[keep]

    sh_offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(np.bincount(sh_rows, minlength=n_rows), out=sh_offsets[1:])
    return sh_hash, sh_offsets


def minhash_signatures(texts: list[str], n_perm: int = N_PERM) -> np.ndarray:
    """(n_docs, n_perm) minhash matrix, vectorized reduceat per permutation."""
    flat, offsets = shingle_hashes(texts)
    n = len(offsets) - 1
    sig = np.full((n, n_perm), np.iinfo(np.uint64).max, dtype=U64)
    if len(flat) == 0:
        return sig
    starts = offsets[:-1]
    lengths = np.diff(offsets)
    nonempty = lengths > 0
    for p in range(n_perm):
        h = hash_stream(flat, 1000 + p)
        mins = np.minimum.reduceat(h, starts[nonempty])
        sig[nonempty, p] = mins
    return sig


def band_hashes(sig: np.ndarray) -> np.ndarray:
    """(n_docs, n_bands) band bucket hashes from a minhash signature matrix."""
    n, _ = sig.shape
    out = np.empty((n, N_BANDS), dtype=U64)
    for b in range(N_BANDS):
        chunk = sig[:, b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
        acc = np.zeros(n, dtype=U64)
        with np.errstate(over="ignore"):
            for j in range(ROWS_PER_BAND):
                acc = acc * U64(0x100000001B3) ^ chunk[:, j]
        out[:, b] = splitmix64(acc)
    return out


def jaccard(texts_a: list[str], texts_b: list[str]) -> np.ndarray:
    """Exact n-gram (shingle) Jaccard per pair (verify kernel)."""
    fa, oa = shingle_hashes(texts_a)
    fb, ob = shingle_hashes(texts_b)
    out = np.zeros(len(texts_a))
    for i in range(len(texts_a)):
        a = fa[oa[i] : oa[i + 1]]
        b = fb[ob[i] : ob[i + 1]]
        if len(a) == 0 and len(b) == 0:
            out[i] = 1.0
            continue
        inter = len(np.intersect1d(a, b, assume_unique=True))
        union = len(a) + len(b) - inter
        out[i] = inter / union if union else 0.0
    return out


def simhash64(texts: list[str]) -> np.ndarray:
    """64-bit simhash per text (vectorized bit-count sums per doc)."""
    flat, offsets = _token_hashes(texts)
    flat = splitmix64(flat)
    n = len(offsets) - 1
    out = np.zeros(n, dtype=U64)
    starts = offsets[:-1]
    lengths = np.diff(offsets)
    nonempty = lengths > 0
    if not nonempty.any():
        return out
    for bit in range(64):
        contrib = (((flat >> U64(bit)) & U64(1)).astype(np.int64) * 2 - 1).astype(
            np.float64
        )
        sums = np.add.reduceat(contrib, starts[nonempty])
        bits = (sums > 0).astype(np.uint64)
        out[nonempty] |= bits << U64(bit)
    return out


# ---------------------------------------------------------------------------
# Dataset-level operators
# ---------------------------------------------------------------------------


def minhash_lsh_candidates(
    docs_path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
):
    """MinHash-LSH near-dup pairs with exact-Jaccard verification.

    Returns (doc_a, doc_b, jaccard) for verified pairs (doc_a < doc_b).
    Verification re-reads the two texts; at fixture scale the candidate set
    is tiny and verified driver-side — the 100 TB path replaces that with a
    co-partitioned join on doc id (documented scale note).
    """
    import ray.data as rd

    ds = rd.read_parquet(docs_path, columns=[id_col, text_col])

    def to_bands(batch: pa.Table) -> pd.DataFrame:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sig = minhash_signatures(texts)
        bands = band_hashes(sig)
        n = len(ids)
        return pd.DataFrame(
            {
                "band_id": np.repeat(np.arange(N_BANDS, dtype=np.int32), n),
                "band_hash": bands.T.reshape(-1),
                id_col: np.tile(ids, N_BANDS),
            }
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(group[id_col].unique())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})

    cand = (
        ds.map_batches(to_bands, batch_format="pyarrow")
        .groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    if cand.empty:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})

    # exact verify (small candidate set at fixture scale)
    texts = {
        r[id_col]: r[text_col]
        for r in ds.to_pandas().to_dict("records")
        if r[id_col] in set(cand["doc_a"]) | set(cand["doc_b"])
    }
    j = jaccard(
        [texts[a] for a in cand["doc_a"]], [texts[b] for b in cand["doc_b"]]
    )
    cand["jaccard"] = np.round(j, 6)
    out = cand[cand["jaccard"] >= threshold].reset_index(drop=True)
    return out


def simhash_table(docs_path: str, *, text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, simhash) fingerprints as a Dataset (vectorized per batch)."""
    import ray.data as rd

    ds = rd.read_parquet(docs_path, columns=[id_col, text_col])

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch[id_col],
                "simhash": pa.array(simhash64(batch[text_col].to_pylist())),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def embedding_near_dups(
    emb_path: str,
    *,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Cosine near-dup pairs (vec_a < vec_b, cos >= threshold).

    Per-batch matmul against a broadcast normalized matrix — O(n * batch)
    compute with no shuffle; scale path = LSH buckets (knn_embeddings_lsh).
    """
    import ray
    import ray.data as rd

    from .knn import _as_matrix, _normalize

    ds = rd.read_parquet(emb_path, columns=[id_col, vec_col])
    full = ds.to_pandas()
    m = _normalize(np.stack(full[vec_col].to_numpy()).astype(np.float64))
    ids = full[id_col].to_numpy()
    ref = ray.put((m, ids))

    def pairs(batch: pa.Table) -> pd.DataFrame:
        m_all, ids_all = ray.get(ref)
        mb = _normalize(_as_matrix(batch[vec_col]))
        idb = batch[id_col].to_numpy(zero_copy_only=False)
        sims = mb @ m_all.T
        ai, bi = np.nonzero(sims >= threshold)
        keep = idb[ai] < ids_all[bi]
        return pd.DataFrame(
            {
                "vec_a": idb[ai][keep],
                "vec_b": ids_all[bi][keep],
                "cos": np.round(sims[ai, bi][keep], 6),
            }
        )

    out = ds.map_batches(pairs, batch_format="pyarrow").to_pandas()
    if out.empty:
        return pd.DataFrame({"vec_a": [], "vec_b": [], "cos": []})
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
