"""Web-corpus curation operators for large-scale training-data pipelines.

The task-brief "training-data pipeline" family beyond dedup/ANN: per-doc
repetition quality metrics (Gopher-style), benchmark-contamination
screening, regex PII scanning/redaction, cross-snapshot incremental dedup
(Bloom prefilter + exact verify), temperature mixture sampling, and
greedy sequence packing. Every SQL-expressible operator here is
DuckDB-oracled expression-for-expression (see ``__ray_entry__.oracle_sql``).

Reference analogues: the quality metrics extend the variable-type
classifier + probability-type scoring dispatch
(/root/reference/src/eopf_geozarr/s2_optimization/s2_resampling.py:156-203);
incremental dedup is the skip-if-already-ingested set difference
(/root/reference/src/eopf_geozarr/conversion/geozarr.py:1044-1057) done at
corpus scale; packing mirrors the aligned-chunk planner's bin-fill search
(/root/reference/src/eopf_geozarr/conversion/utils.py:161-189).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import splitmix64
from ..sources.fs import sized_read_parquet

U64 = np.uint64

#: RE2 pattern pair used by the PII scan (email + digit-run); DuckDB's
#: regexp functions are RE2 too, so oracle parity is exact.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
DIGIT_RUN_RE = r"[0-9]+"

#: incremental-dedup snapshot boundary (pages fixture spans 2024)
SNAPSHOT_CUTOFF = "2024-07-01 00:00:00"


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    return sized_read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _col_token_hashes(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Flat token-hash array + row offsets for a string column (vectorized).

    Same tokenization + hash chain as ``stages.neardup._token_hashes``
    (single-space split, polars xxhash seed 7, splitmix64 mix) so token
    identity agrees across the near-dup and quality-metric families.
    """
    import polars as pl

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    lists = pc.split_pattern(arr.cast(pa.large_string()), " ")
    offsets = np.asarray(lists.offsets).astype(np.int64)
    flat = lists.flatten()
    if len(flat) == 0:
        return np.array([], dtype=U64), offsets
    hashed = (
        pl.from_arrow(flat.cast(pa.large_string()))
        .hash(seed=7)
        .to_numpy()
        .astype(U64)
    )
    return splitmix64(hashed), offsets


# --- normalized-text exact dedup ----------------------------------------------


def normalize_texts(arr) -> pa.Array:
    """Dedup-grade text normalization: lowercase, punctuation -> space,
    whitespace collapsed, trimmed — the rung between byte-exact dedup and
    near-dup (CCNet-style normalization before hashing). Pure pyarrow
    kernels; byte-identical DuckDB twin in the oracle."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    x = pc.utf8_lower(arr.cast(pa.large_string()))
    x = pc.replace_substring_regex(x, "[.,!?]", " ")
    x = pc.replace_substring_regex(x, " +", " ")
    return pc.utf8_trim(x, " ").cast(pa.string())


#: the same normalization as a DuckDB expression over column ``t``
NORMALIZE_SQL = (
    "trim(regexp_replace(regexp_replace(lower({t}), '[.,!?]', ' ', 'g'),"
    " ' +', ' ', 'g'), ' ')"
)


def norm_text_dedup(sf_dir: str, *, num_buckets: int = 64):
    """Normalization-insensitive exact dedup stats: per normalized text,
    total row count and the kept (first) row's rank, over a messy-variant
    table both engines derive identically (fixture texts are already
    normalized, so variants make the operator bite — the
    ``canon_url_dedup`` discipline). One bucketed exchange of per-block
    (norm hash) partials; raw texts never shuffle twice."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def derive(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        base = t["text"].to_pandas().astype(str)
        v = ids % 4
        variant = base.copy()
        variant[v == 1] = variant[v == 1].str.upper()
        variant[v == 2] = variant[v == 2].str.replace(" ", "  ", regex=False)
        variant[v == 3] = variant[v == 3] + " ."
        texts = pa.array(
            pd.concat([base, variant], ignore_index=True), pa.string()
        )
        r = np.concatenate(
            [np.zeros(len(ids), np.int64), np.ones(len(ids), np.int64)]
        )
        return pa.table(
            {"norm_text": normalize_texts(texts), "r": pa.array(r)}
        )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("norm_text", sort=False).agg(
            n_rows=("r", "size"), kept_r=("r", "min")
        ).reset_index()
        g["bucket"] = (
            pd.util.hash_pandas_object(g["norm_text"], index=False).to_numpy(
                np.uint64
            )
            % np.uint64(num_buckets)
        ).astype(np.int32)
        return g

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("norm_text", sort=False).agg(
            n_rows=("n_rows", "sum"), kept_r=("kept_r", "min")
        )
        return g.reset_index()[["norm_text", "n_rows", "kept_r"]]

    return (
        ds.map_batches(derive, batch_format="pyarrow")
        .map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(combine, batch_format="pandas")
    )


# --- Gopher-rules document filter --------------------------------------------

GOPHER_STOPWORDS = ("a", "and", "of", "the", "to")
#: popcount LUT for the 5-bit stopword presence masks
_POP5 = np.array([bin(i).count("1") for i in range(1 << 5)], dtype=np.int64)


def gopher_rules(
    sf_dir: str,
    *,
    min_words: int = 20,
    max_words: int = 90,
    min_mean_wl: float = 3.8,
    max_mean_wl: float = 5.2,
    min_stop_distinct: int = 1,
):
    """Gopher-style document quality rules (Rae et al. 2021, public
    filter set): keep docs whose word count, mean word length and
    distinct-stopword presence fall inside the published-band analogues
    (thresholds adapted so each rule bites on the synthetic vocabulary).
    Pure per-batch map — no shuffle, no state; mean word length computed
    as (chars - (n_words - 1)) / n_words so both engines share the exact
    integer-domain expression.
    """
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    stops = pa.array(GOPHER_STOPWORDS, pa.large_string())

    def keep(t: pa.Table) -> pa.Table:
        arr = (
            t["text"].combine_chunks()
            if isinstance(t["text"], pa.ChunkedArray)
            else t["text"]
        ).cast(pa.large_string())
        lists = pc.split_pattern(arr, " ")
        n = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
        chars = pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
        mean_wl = (chars - (n - 1)) / np.maximum(n, 1)
        mean_wl = pc.round(
            pa.array(mean_wl), ndigits=6, round_mode="half_towards_infinity"
        ).to_numpy()
        # distinct stopwords present per doc: flat membership -> stop index
        # -> per-doc bitmask OR (vectorized reduceat; 5 stopwords = 5 bits)
        flat = lists.values
        offs = np.asarray(lists.offsets).astype(np.int64)
        sidx = np.searchsorted(np.array(GOPHER_STOPWORDS), flat.to_numpy(zero_copy_only=False))
        sidx = np.clip(sidx, 0, len(GOPHER_STOPWORDS) - 1)
        is_stop = pc.is_in(flat, value_set=stops).to_numpy(zero_copy_only=False)
        bits = np.where(is_stop, np.left_shift(1, sidx), 0).astype(np.int64)
        nz = np.diff(offs) > 0
        masks = np.zeros(len(n), dtype=np.int64)
        if nz.any():
            masks[nz] = np.bitwise_or.reduceat(bits, offs[:-1][nz])
        stop_distinct = _POP5[masks]
        ok = (
            (n >= min_words)
            & (n <= max_words)
            & (mean_wl >= min_mean_wl)
            & (mean_wl <= max_mean_wl)
            & (stop_distinct >= min_stop_distinct)
        )
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "n_words": pa.array(n),
                "mean_wl": pa.array(mean_wl),
                "stop_distinct": pa.array(stop_distinct),
            }
        ).filter(pa.array(ok))

    return ds.map_batches(keep, batch_format="pyarrow")


# --- Gopher-style repetition metrics ----------------------------------------


def doc_repetition(sf_dir: str):
    """Per-doc repetition quality metrics: duplicate-token fraction and
    top-bigram fraction (the Gopher repetition filters' two cheapest
    signals). One stateless vectorized kernel, no shuffle: distinct-token
    counts via one lexsort over (row, token-hash), top-bigram counts via
    run-length stats over (row, bigram-hash)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(_repetition_kernel, batch_format="pyarrow")


def _repetition_kernel(t: pa.Table) -> pa.Table:
    flat, offs = _col_token_hashes(t["text"])
    ntok = np.diff(offs)
    n = len(ntok)
    row_of = np.repeat(np.arange(n, dtype=np.int64), ntok)

    # distinct tokens per row (set semantics == SQL COUNT(DISTINCT tok))
    order = np.lexsort((flat, row_of))
    r, h = row_of[order], flat[order]
    first = np.ones(len(r), dtype=bool)
    if len(r) > 1:
        first[1:] = (r[1:] != r[:-1]) | (h[1:] != h[:-1])
    nd = np.bincount(r[first], minlength=n).astype(np.int64)

    # most-frequent-bigram count per row: adjacent-pair mix hashes,
    # grouped run lengths after one lexsort
    mc = np.zeros(n, dtype=np.int64)
    if len(flat) > 1:
        with np.errstate(over="ignore"):
            bg = splitmix64(flat[:-1] * U64(0x100000001B3) ^ flat[1:])
        ok = row_of[:-1] == row_of[1:]
        br, bh = row_of[:-1][ok], bg[ok]
        if len(br):
            o2 = np.lexsort((bh, br))
            br, bh = br[o2], bh[o2]
            newrun = np.ones(len(br), dtype=bool)
            newrun[1:] = (br[1:] != br[:-1]) | (bh[1:] != bh[:-1])
            run_idx = np.flatnonzero(newrun)
            run_len = np.diff(np.append(run_idx, len(br)))
            np.maximum.at(mc, br[run_idx], run_len)

    ntok_f = np.maximum(ntok, 1).astype(np.float64)
    dup = 1.0 - nd / ntok_f
    top = mc / np.maximum(ntok - 1, 1).astype(np.float64)
    # DuckDB ROUND is half-away-from-zero
    rnd = dict(ndigits=6, round_mode="half_towards_infinity")
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(ntok),
            "dup_token_frac": pc.round(pa.array(dup), **rnd),
            "top_bigram_frac": pc.round(pa.array(top), **rnd),
        }
    )


# --- benchmark contamination screening --------------------------------------


def contamination_check(sf_dir: str, *, bench_mod: int = 97):
    """Per-doc overlap with a benchmark shingle set (train/eval
    contamination screening). Benchmark docs = ``doc_id % bench_mod == 0``
    (stand-in for an eval suite); their distinct word-3-gram shingle
    hashes are collected once (benchmarks are ~MBs even when the corpus
    is 100 TB) and broadcast via ``ray.put``; every corpus doc then counts
    shared shingles in one stateless ``map_batches`` pass — no shuffle
    touches the corpus. Shingles come from ``stages.neardup.shingle_hashes``
    (same w=3 + short-doc fallback as the near-dup family)."""
    import ray

    from ..stages.neardup import shingle_hashes

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def bench_partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array(ids % bench_mod == 0))
        if len(sub) == 0:
            return pa.table({"h": pa.array([], type=pa.uint64())})
        sh, _ = shingle_hashes(sub["text"].to_pylist())
        return pa.table({"h": pa.array(np.unique(sh))})

    bench_parts = ds.map_batches(bench_partial, batch_format="pyarrow").to_pandas()
    bench_sorted = (
        np.unique(bench_parts["h"].to_numpy(dtype=U64))
        if "h" in bench_parts.columns  # empty corpus -> no benchmark side
        else np.array([], dtype=U64)
    )
    ref = ray.put(bench_sorted)

    def probe(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array(ids % bench_mod != 0))
        sh, offs = shingle_hashes(sub["text"].to_pylist())
        bench = ray.get(ref)  # zero-copy shared-memory view per worker
        idx = np.searchsorted(bench, sh)
        hit = np.zeros(len(sh), dtype=np.int64)
        if len(bench):
            inb = idx < len(bench)
            hit[inb] = (bench[idx[inb]] == sh[inb]).astype(np.int64)
        c = np.concatenate([[0], np.cumsum(hit)])
        shared = c[offs[1:]] - c[offs[:-1]]
        n_sh = np.diff(offs)
        frac = shared / np.maximum(n_sh, 1).astype(np.float64)
        return pa.table(
            {
                "doc_id": sub["doc_id"],
                "n_shingles": pa.array(n_sh),
                "n_shared": pa.array(shared),
                "contam_frac": pc.round(
                    pa.array(frac), ndigits=6, round_mode="half_towards_infinity"
                ),
            }
        )

    return ds.map_batches(probe, batch_format="pyarrow")


# --- PII scan / redaction ----------------------------------------------------


def pii_scan(pages_path: str):
    """Regex PII pass over distinct urls: match counts (emails,
    digit runs) + the digit-redacted form. Vectorized RE2 kernels
    (``count_substring_regex`` / ``replace_substring_regex``); the only
    exchange is the url distinct (scan output is a pure function of url,
    so dedup-then-scan == SQL ``SELECT DISTINCT``)."""
    from ..stages.dedup import dedup_exact

    ds = sized_read_parquet(pages_path, columns=["url", "warc_ts"])
    distinct = dedup_exact(ds, key="url", order_col="warc_ts", num_buckets=16)

    def scan(t: pa.Table) -> pa.Table:
        url = t["url"]
        return pa.table(
            {
                "url": url,
                "n_emails": pc.cast(
                    pc.count_substring_regex(url, EMAIL_RE), pa.int64()
                ),
                "n_digit_runs": pc.cast(
                    pc.count_substring_regex(url, DIGIT_RUN_RE), pa.int64()
                ),
                "redacted_url": pc.replace_substring_regex(
                    url, DIGIT_RUN_RE, replacement="#"
                ),
            }
        )

    return distinct.map_batches(scan, batch_format="pyarrow")


# --- incremental (cross-snapshot) dedup --------------------------------------


def incremental_dedup(
    pages_path: str,
    *,
    cutoff: str = SNAPSHOT_CUTOFF,
    n_bits: int = 1 << 23,
    num_buckets: int = 512,
):
    """New-snapshot rows (``warc_ts >= cutoff``) whose url was never seen
    in the old snapshot (``warc_ts < cutoff``) — recrawl dedup against an
    already-ingested corpus.

    Scale shape (see ``stages.bloom``): a Bloom filter over the seen urls
    is OR-reduced from per-block partials and broadcast once; new rows
    missing the bloom are provably unseen and stream straight to the
    output with NO exchange; only bloom hits (true dups + small FP
    residue) cross one bucketed anti-join against the seen keys, so the
    exchange is sized by the overlap, not the snapshot.

    The miss/hit branches are two lazy consumers of the probe stage, so
    the (cheap) read+probe runs once per branch; a production sink would
    write the miss branch directly while the hit branch verifies."""
    import ray

    from ..stages.bloom import BloomFilter, build_bloom
    from ..stages.text import fingerprint64

    cut = pa.scalar(pd.Timestamp(cutoff), type=pa.timestamp("us"))
    ds = sized_read_parquet(pages_path, columns=["url", "warc_ts"])

    def old_side(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t["warc_ts"], cut))

    seen = ds.map_batches(old_side, batch_format="pyarrow")
    bloom = build_bloom(seen, lambda t: fingerprint64(t["url"]), n_bits=n_bits)
    bits_ref = ray.put(bloom.bits)

    def probe(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["warc_ts"], cut))
        bf = BloomFilter(n_bits=n_bits, bits=ray.get(bits_ref))
        return t.append_column(
            "bloom_hit", pa.array(bf.contains(fingerprint64(t["url"])))
        )

    probed = ds.map_batches(probe, batch_format="pyarrow")
    sure_new = probed.map_batches(
        lambda t: t.filter(pc.invert(t["bloom_hit"])).drop_columns(["bloom_hit"]),
        batch_format="pyarrow",
    )
    candidates = probed.map_batches(
        lambda t: t.filter(t["bloom_hit"]).drop_columns(["bloom_hit"]),
        batch_format="pyarrow",
    )

    # exact verify: ONE bucketed exchange carrying only candidates + the
    # per-block pre-distincted seen keys (the _exists_join discipline)
    def tag_seen(t: pa.Table) -> pa.Table:
        u = pc.unique(t["url"])
        b = (fingerprint64(u) % U64(num_buckets)).astype(np.int32)
        return pa.table(
            {
                "url": u,
                "warc_ts": pa.nulls(len(u), pa.timestamp("us")),
                "side": pa.array(np.zeros(len(u), dtype=np.int8)),
                "bucket": pa.array(b),
            }
        )

    def tag_cand(t: pa.Table) -> pa.Table:
        b = (fingerprint64(t["url"]) % U64(num_buckets)).astype(np.int32)
        return pa.table(
            {
                "url": t["url"],
                "warc_ts": t["warc_ts"],
                "side": pa.array(np.ones(len(t), dtype=np.int8)),
                "bucket": pa.array(b),
            }
        )

    tagged = seen.map_batches(tag_seen, batch_format="pyarrow").union(
        candidates.map_batches(tag_cand, batch_format="pyarrow")
    )

    def anti(df: pd.DataFrame) -> pd.DataFrame:
        seen_urls = df.loc[df["side"] == 0, "url"]
        new_rows = df[df["side"] == 1]
        keep = new_rows[~new_rows["url"].isin(set(seen_urls))]
        return keep[["url", "warc_ts"]]

    verified = tagged.groupby("bucket").map_groups(anti, batch_format="pandas")

    # pandas blocks carry ns timestamps; restore us so the union schemas
    # agree. Empty partitions reach here as COLUMN-LESS blocks (map_groups
    # drops the frame schema when a partition has no groups) — emit a
    # schema-carrying empty table instead, or the union produces
    # schema-less RefBundles and Ray warns on every merge.
    def restore_ts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "url" not in t.column_names:
            return pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "warc_ts": pa.array([], pa.timestamp("us")),
                }
            )
        return pa.table(
            {
                "url": pc.cast(t["url"], pa.string()),
                "warc_ts": pc.cast(t["warc_ts"], pa.timestamp("us")),
            }
        )

    verified = verified.map_batches(restore_ts, batch_format="pyarrow")
    return sure_new.union(verified)


# --- temperature mixture sampling -------------------------------------------


def mixture_sample(sf_dir: str):
    """Square-root temperature sampling across sources: each source
    contributes ``ceil(sqrt(count_s))`` docs (the T=2 mixture-flattening
    rule, normalization-free so it is engine-reproducible), selected by
    Knuth-hash order of doc_id — deterministic across cluster sizes,
    retries and resumes. Two bounded exchanges: a per-source count
    (#sources rows) and one per-source top-quota cut whose input is
    pre-cut to quota rows per (block, source)."""
    import ray

    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    from ..sources.fs import to_pandas_cols

    counts_df = (
        to_pandas_cols(
            ds.map_batches(
                lambda t: t.group_by("source").aggregate([("doc_id", "count")]),
                batch_format="pyarrow",
            ),
            {"source": "object", "doc_id_count": "int64"},
        )
        .groupby("source", sort=False)["doc_id_count"]
        .sum()
    )
    quotas = {s: int(math.ceil(math.sqrt(c))) for s, c in counts_df.items()}
    max_q = max(quotas.values(), default=0)
    qref = ray.put(quotas)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # per-(block, source) pre-cut to the max quota bounds the exchange.
        # Hash in uint64 (wrap is well-defined at any doc_id); the DuckDB
        # oracle's BIGINT product only stays overflow-free for
        # doc_id < 2^63/2654435761 ~= 3.47e9, so oracle parity holds below
        # that bound while the engine itself is deterministic at all scales.
        df = df.copy()
        df["h"] = (
            (df["doc_id"].to_numpy().astype(np.uint64) * np.uint64(2654435761))
            % np.uint64(4294967296)
        ).astype(np.int64)
        df = df.sort_values(["source", "h", "doc_id"], kind="mergesort")
        return df.groupby("source", sort=False).head(max_q)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        q = ray.get(qref)[df["source"].iloc[0]]
        df = df.sort_values(["h", "doc_id"], kind="mergesort").head(q)
        return df[["doc_id", "source"]]

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("source")
        .map_groups(final, batch_format="pandas")
    )


# --- greedy sequence packing -------------------------------------------------


def pack_sequences(
    sf_dir: str,
    *,
    budget: int = 256,
    range_size: int = 64,
    tokenizer: str = "whitespace",
    merges=None,
):
    """Greedy sequence packing: walk docs in doc_id order, appending each
    to the current bin unless its token count would overflow ``budget``,
    then start a new bin. Packing is inherently sequential, so the
    parallel unit is a doc_id range of ``range_size`` docs (bins never
    span ranges — the documented partitioning assumption; at corpus scale
    range == input shard). One groupby exchange on the range key; the
    in-group walk touches at most ``range_size`` rows.

    ``tokenizer="bpe"`` packs by SUBWORD counts under the corpus-trained
    merge table (``stages/bpe.py``; pass ``merges`` to reuse a trained
    table) — same pipeline shape, only the per-block count kernel changes.
    """
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    mref = _bpe_merges_ref(sf_dir, tokenizer, merges)

    def prep(t: pa.Table) -> pa.Table:
        arr = t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray) else t["text"]
        if mref is not None:
            from ..stages.bpe import encoder_for

            enc = encoder_for(mref)  # per-worker cache — memo survives batches
            ntok = pa.array(enc.count_texts(arr.to_pylist()))
        else:
            ntok = pc.cast(
                pc.list_value_length(pc.split_pattern(arr, " ")), pa.int64()
            )
        rng = pc.divide(t["doc_id"], pa.scalar(range_size, pa.int64()))
        return pa.table({"doc_id": t["doc_id"], "n_tokens": ntok, "rng": rng})

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        toks = df["n_tokens"].to_numpy()
        bins = np.zeros(len(df), dtype=np.int64)
        pos = np.zeros(len(df), dtype=np.int64)
        b, fill = 0, 0
        for i, tc in enumerate(toks):
            if i > 0 and fill + tc > budget:
                b += 1
                fill = 0
            bins[i] = b
            pos[i] = fill
            fill += tc
        rng = df["rng"].to_numpy()
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_tokens": df["n_tokens"],
                "bin_id": rng * 100_000 + bins,
                "bin_pos": pos,
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("rng")
        .map_groups(pack, batch_format="pandas")
    )


# --- sliding token-window chunking --------------------------------------------


def _bpe_merges_ref(sf_dir: str, tokenizer: str, merges):
    """Shared tokenizer plumbing: None for whitespace, else a ray.put ref
    of the (possibly freshly corpus-trained) BPE merge table."""
    if tokenizer == "whitespace":
        return None
    if tokenizer != "bpe":
        raise ValueError(f"unknown tokenizer: {tokenizer!r}")
    import ray

    from ..stages.bpe import corpus_merges

    if merges is None:
        merges = corpus_merges(sf_dir)
    return ray.put(merges)


def doc_chunks(
    sf_dir: str,
    *,
    window: int = 32,
    stride: int = 24,
    tokenizer: str = "whitespace",
    merges=None,
):
    """Split each doc into overlapping token windows (embedding/RAG prep):
    chunk c covers tokens [c*stride, min(c*stride + window, n)). A pure
    flat-map — rows out > rows in, no shuffle. Fully vectorized: one
    ragged gather over the flat token array builds every chunk's token
    list, one ``binary_join`` materializes the texts.

    ``tokenizer="bpe"`` windows over SUBWORD tokens (corpus-trained merge
    table, memoized per-word apply); the ragged-gather kernel is shared —
    only the token-list builder changes."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    mref = _bpe_merges_ref(sf_dir, tokenizer, merges)

    def chunk(t: pa.Table) -> pa.Table:
        arr = (
            t["text"].combine_chunks()
            if isinstance(t["text"], pa.ChunkedArray)
            else t["text"]
        )
        if mref is not None:
            from ..stages.bpe import encoder_for

            enc = encoder_for(mref)  # per-worker cache — memo survives batches
            tok_lists = enc.tokenize_texts(arr.to_pylist())
            lists = pa.array(tok_lists, type=pa.large_list(pa.large_string()))
        else:
            lists = pc.split_pattern(arr.cast(pa.large_string()), " ")
        row_offs = np.asarray(lists.offsets).astype(np.int64)
        flat = lists.values
        n = np.diff(row_offs)
        n_rows = len(n)
        n_chunks = (n + stride - 1) // stride  # == len(range(0, n, stride))
        total_chunks = int(n_chunks.sum())
        if total_chunks == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "chunk_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "chunk_text": pa.array([], pa.string()),
                }
            )
        doc_of = np.repeat(np.arange(n_rows, dtype=np.int64), n_chunks)
        # chunk_id within its doc = position since the doc's first chunk
        chunk_first = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
        chunk_id = np.arange(total_chunks, dtype=np.int64) - np.repeat(
            chunk_first, n_chunks
        )
        start = chunk_id * stride
        end = np.minimum(start + window, n[doc_of])
        counts = end - start
        # ragged gather: flat token indices of every chunk, concatenated
        base = row_offs[doc_of] + start
        tok_first = np.concatenate([[0], np.cumsum(counts)[:-1]])
        total_toks = int(counts.sum())
        idx = np.repeat(base, counts) + (
            np.arange(total_toks, dtype=np.int64) - np.repeat(tok_first, counts)
        )
        chunk_toks = flat.take(pa.array(idx))
        offs = np.zeros(total_chunks + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        chunk_lists = pa.LargeListArray.from_arrays(
            pa.array(offs, pa.int64()), chunk_toks
        )
        text_out = pc.binary_join(chunk_lists, pa.scalar(" ", pa.large_string()))
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(ids[doc_of]),
                "chunk_id": pa.array(chunk_id),
                "n_tokens": pa.array(counts),
                "chunk_text": pc.cast(text_out, pa.string()),
            }
        )

    return ds.map_batches(chunk, batch_format="pyarrow")


# --- zonal statistics (polygon-zone aggregate) -------------------------------


def zonal_stats(pages_path: str):
    """Per-admin-polygon zonal statistics over the deduped, geoindexed
    pages (the raster-analysis "zonal stats" operator: aggregate all
    cells/points falling in each polygon zone). Rides the flagship
    enrich + dedup stages, then reduces per-batch (zone, count, sums)
    partials — the final combine is bounded by the polygon count, so
    nothing corpus-sized leaves the map stage."""
    from .flagship import FlagshipConfig, pages_to_cells

    ds = sized_read_parquet(pages_path)
    deduped, _ = pages_to_cells(ds, FlagshipConfig(geoindex_concurrency=(1, 4)))

    def part(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "zone": t["admin_l1"].to_numpy(zero_copy_only=False),
                "n_pages": 1,
                "text_bytes": t["text_len"].to_numpy(zero_copy_only=False),
                "token_sum": t["token_count"].to_numpy(zero_copy_only=False),
            }
        )
        return df.groupby("zone", as_index=False, sort=False).sum()

    parts = deduped.map_batches(part, batch_format="pyarrow").to_pandas()
    out = parts.groupby("zone", as_index=False, sort=True).sum()
    out["mean_text_len"] = out["text_bytes"].astype(np.float64) / out[
        "n_pages"
    ].astype(np.float64)
    for c in ("zone", "n_pages", "text_bytes", "token_sum"):
        out[c] = out[c].astype(np.int64)
    return out


# --- exact substring-level dedup (duplicated k-gram span removal) ------------


def _gram_occurrences(
    flat: np.ndarray, offsets: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Positional k-gram rolling hashes over a flat token-hash array.

    Returns ``(gram_hash u64, row index, token position within row)`` for
    every window that does not cross a row boundary — the positional
    sibling of ``stages.neardup.shingle_hashes`` (same FNV-mix chain, so
    gram identity agrees with the near-dup family; no set-dedup, no
    short-row fallback: rows with < k tokens emit nothing).
    """
    n_rows = len(offsets) - 1
    counts = np.diff(offsets)
    n_tok = len(flat)
    n_win = max(0, n_tok - k + 1)
    if n_win == 0:
        e = np.array([], dtype=np.int64)
        return np.array([], dtype=U64), e, e
    row_of = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
    with np.errstate(over="ignore"):
        acc = flat[:n_win].copy()
        for j in range(1, k):
            acc = acc * U64(0x100000001B3) ^ flat[j : n_win + j]
    gram = splitmix64(acc)
    valid = row_of[:n_win] == row_of[k - 1 :]
    idx = np.flatnonzero(valid)
    rows = row_of[idx]
    return gram[idx], rows, idx - offsets[rows]


def substring_dedup(sf_dir: str, *, k: int = 8, num_buckets: int = 32):
    """Exact duplicated-substring removal over the documents table —
    see ``substring_spans`` for semantics and the scale shape."""
    return substring_spans(
        _read(sf_dir, "documents", ["doc_id", "text"]), k=k, num_buckets=num_buckets
    )


def _split_text(col):
    """(offsets, flat token array, per-row counts) for a string column."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    lists = pc.split_pattern(arr.cast(pa.large_string()), " ")
    offs = np.asarray(lists.offsets).astype(np.int64)
    return offs, lists.flatten(), np.diff(offs)


def _apply_removals(
    t: pa.Table, offs: np.ndarray, flat_tok, n: np.ndarray, start_flat: np.ndarray, kk: int
) -> pa.Table:
    """Shared span-cut kernel: removal-window starts (flat token indices)
    -> merged coverage (diff+cumsum), span counts, and the rebuilt
    kept_text via one ragged take + binary_join. Output = input columns
    minus ``text`` plus (n_tokens, removed_tokens, n_spans, kept_text)."""
    n_rows = len(n)
    delta = np.zeros(len(flat_tok) + 1, dtype=np.int64)
    np.add.at(delta, start_flat, 1)
    np.add.at(delta, start_flat + kk, -1)
    cov = np.cumsum(delta[:-1]) > 0
    row_of = np.repeat(np.arange(n_rows, dtype=np.int64), n)
    removed = np.bincount(row_of[cov], minlength=n_rows).astype(np.int64)
    doc_start = np.zeros(len(flat_tok), dtype=bool)
    doc_start[offs[:-1][n > 0]] = True
    prev = np.zeros(len(flat_tok), dtype=bool)
    prev[1:] = cov[:-1]
    span_start = cov & (doc_start | ~prev)
    n_spans = np.bincount(row_of[span_start], minlength=n_rows).astype(np.int64)
    kept_idx = np.flatnonzero(~cov)
    new_offs = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(n - removed, out=new_offs[1:])
    kept_lists = pa.LargeListArray.from_arrays(
        pa.array(new_offs, pa.int64()), flat_tok.take(pa.array(kept_idx))
    )
    text_out = pc.binary_join(kept_lists, pa.scalar(" ", pa.large_string()))
    out = t.drop_columns(["text"])
    out = out.append_column("n_tokens", pa.array(n))
    out = out.append_column("removed_tokens", pa.array(removed))
    out = out.append_column("n_spans", pa.array(n_spans))
    return out.append_column("kept_text", pc.cast(text_out, pa.string()))


def _combine_dup_bucket(df: pd.DataFrame) -> pa.Table:
    """Per-bucket combine of (gram, cnt, minkey) partials -> duplicated
    grams only, side-tagged 0 for the join path's union (Arrow out so the
    union with the occurrence stream keeps one block type)."""
    b = int(df["bucket"].iloc[0])
    g = df["gram"].to_numpy().astype(U64)
    cnt = df["cnt"].to_numpy()
    kv = df["minkey"].to_numpy().astype(U64)
    order = np.lexsort((kv, g))
    g, cnt, kv = g[order], cnt[order], kv[order]
    new = np.ones(len(g), dtype=bool)
    new[1:] = g[1:] != g[:-1]
    gid = np.cumsum(new) - 1
    tot = np.bincount(gid, weights=cnt).astype(np.int64)
    starts = np.flatnonzero(new)
    keep = tot >= 2
    gk, kk_ = g[starts][keep], kv[starts][keep]
    return pa.table(
        {
            "bucket": pa.array(np.full(len(gk), b, dtype=np.int32)),
            "gram": pa.array(gk),
            "key": pa.array(kk_),
            "side": pa.array(np.zeros(len(gk), dtype=np.int8)),
        }
    )


def substring_spans(
    docs,
    *,
    k: int = 8,
    num_buckets: int = 32,
    method: str = "broadcast",
    broadcast_row_budget: int = 5_000_000,
):
    """Exact duplicated-substring removal (the ExactSubstr discipline of
    Lee et al., "Deduplicating Training Data Makes Language Models
    Better"): any k-token window whose exact token sequence occurs >= 2
    times in the corpus (any doc, any position — self-repetition counts)
    is removed from every occurrence EXCEPT the globally first one
    (min (doc_id, pos)); overlapping removal windows merge into maximal
    spans and the surviving tokens re-join into ``kept_text``.

    ``docs`` is any Dataset with (doc_id, text, passthrough...); it is
    consumed twice (gram-count pass + cut pass), so pass a materialized or
    cheap-to-recompute dataset. Output columns: the input's minus ``text``,
    plus (n_tokens, removed_tokens, n_spans, kept_text).

    Scale shape: pass 1 ships one row per DISTINCT (block, gram) — a
    ``(gram u64, cnt, minkey u64)`` partial — through one bucketed
    exchange (text never shuffles; both ``cnt`` and ``minkey`` are
    commutative combiners, so the per-block pre-aggregation is lossless).
    The duplicated-gram table (global cnt >= 2) is bounded by the corpus'
    duplicated-span volume — orders of magnitude below token count for a
    web corpus — and is broadcast once via ``ray.put``; for extreme-dup
    corpora where even that table is too large, ``method="join"`` replaces
    the broadcast with bucketed exchanges (see ``_substring_join_path``;
    parity-pinned in tests). Pass 2 is a stateless vectorized map: rolling
    gram hashes, searchsorted membership, coverage via diff+cumsum, one
    ragged ``take`` + ``binary_join`` rebuilds the kept text. Keeper keys
    pack as ``doc_id << 32 | pos`` (valid for doc_id < 2^31 and docs
    < 2^32 tokens; ordering matches SQL ``ORDER BY doc_id, pos``).

    Collision caveat: gram identity is a 64-bit rolling hash, not the
    token strings, so two DISTINCT k-grams can collide and mark a unique
    span as duplicated. P(any collision) ~= G^2 / 2^65 for G distinct
    grams (birthday bound) — negligible at fixture scale (G=10^6 ->
    ~3e-8) but reaching ~2.7% of corpora at G=10^12; exactness at that
    scale needs a verify-against-token-strings cut pass or a 128-bit
    gram hash (same discipline as the HLL/sketch error notes).

    Reference analogue: the dedup-merge skip-if-present set discipline
    (/root/reference/src/eopf_geozarr/conversion/geozarr.py:1044-1057) at
    token-span granularity.
    """
    import polars as pl
    import ray

    kk = int(k)

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        flat, offs = _col_token_hashes(t["text"])
        gram, rows, pos = _gram_occurrences(flat, offs, kk)
        key = (ids[rows].astype(U64) << U64(32)) | pos.astype(U64)
        order = np.lexsort((key, gram))
        g, kv = gram[order], key[order]
        new = np.ones(len(g), dtype=bool)
        new[1:] = g[1:] != g[:-1]
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, len(g)))
        gu = g[starts]
        return pa.table(
            {
                "bucket": pa.array((gu % U64(num_buckets)).astype(np.int32)),
                "gram": pa.array(gu),
                "cnt": pa.array(cnt.astype(np.int64)),
                "minkey": pa.array(kv[starts]),
            }
        )

    ds = docs
    dup_ds = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_combine_dup_bucket, batch_format="pandas")
    )
    if method == "join":
        return _substring_join_path(ds, dup_ds, kk, num_buckets)
    if method == "auto":
        # the auto-degrading rule (same shape as connected_components'
        # contract_row_budget): count the distributed dup-gram table and
        # broadcast only when it fits the budget, else take the join path
        dup_ds = dup_ds.materialize()
        if dup_ds.count() > broadcast_row_budget:
            return _substring_join_path(ds, dup_ds, kk, num_buckets)
    elif method != "broadcast":
        raise ValueError(f"unknown method: {method!r}")
    dup = dup_ds.to_pandas()
    if "gram" not in dup.columns:  # zero duplicated grams -> empty frame
        dup = pd.DataFrame({"gram": np.array([], U64), "key": np.array([], U64)})
    g_dup = dup["gram"].to_numpy().astype(U64)
    mk_dup = dup["key"].to_numpy().astype(U64)
    order = np.argsort(g_dup)
    dup_ref = ray.put((g_dup[order], mk_dup[order]))

    def cut(t: pa.Table) -> pa.Table:
        g_dup, mk_dup = ray.get(dup_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        offs, flat_tok, n = _split_text(t["text"])
        if len(flat_tok):
            flat = splitmix64(
                pl.from_arrow(flat_tok.cast(pa.large_string()))
                .hash(seed=7)
                .to_numpy()
                .astype(U64)
            )
        else:
            flat = np.array([], dtype=U64)
        gram, rows, pos = _gram_occurrences(flat, offs, kk)
        if len(g_dup) and len(gram):
            j = np.minimum(np.searchsorted(g_dup, gram), len(g_dup) - 1)
            hit = g_dup[j] == gram
            key = (ids[rows].astype(U64) << U64(32)) | pos.astype(U64)
            rm = hit & (key != mk_dup[j])
        else:
            rm = np.zeros(len(gram), dtype=bool)
        start_flat = offs[rows[rm]] + pos[rm]
        return _apply_removals(t, offs, flat_tok, n, start_flat, kk)

    return ds.map_batches(cut, batch_format="pyarrow")


def _substring_join_path(ds, dup_ds, kk: int, num_buckets: int):
    """``substring_spans(method="join")``: the no-driver-broadcast scale
    path for extreme-dup corpora where the duplicated-gram table itself is
    too large to broadcast. Three exchanges, none corpus-driver-sized:

    1. the (gram, cnt, minkey) partials groupby (same as broadcast mode);
       the combine KEEPS its bucket and stays distributed;
    2. dup grams + all gram occurrences side-tagged into one gram-bucket
       exchange; each bucket inner-joins locally and emits only the
       removal occurrences ``(doc_id, pos)`` — sized by dup volume;
    3. docs + removals co-partitioned on a doc_id bucket; each group cuts
       its docs with the shared ``_apply_removals`` kernel. Text shuffles
       exactly once (this exchange) — the price of dropping the broadcast.

    Input must be exactly (doc_id, text); ``dup_ds`` is the distributed
    (bucket, gram, key, side=0) duplicated-gram table from
    ``_combine_dup_bucket``. Output matches broadcast mode (parity pinned
    in tests/test_webtext.py).
    """
    if set(ds.schema().names) != {"doc_id", "text"}:
        raise ValueError("join mode requires exactly (doc_id, text) input")

    def emit_occ(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        flat, offs = _col_token_hashes(t["text"])
        gram, rows, pos = _gram_occurrences(flat, offs, kk)
        key = (ids[rows].astype(U64) << U64(32)) | pos.astype(U64)
        return pa.table(
            {
                "bucket": pa.array((gram % U64(num_buckets)).astype(np.int32)),
                "gram": pa.array(gram),
                "key": pa.array(key),
                "side": pa.array(np.ones(len(gram), dtype=np.int8)),
            }
        )

    occ = ds.map_batches(emit_occ, batch_format="pyarrow")

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g[g["side"] == 0]
        o = g[g["side"] == 1]
        empty = pd.DataFrame(
            {"doc_id": pd.Series(dtype="int64"), "pos": pd.Series(dtype="int64")}
        )
        if d.empty or o.empty:
            return empty
        gd = d["gram"].to_numpy().astype(U64)
        kd = d["key"].to_numpy().astype(U64)
        order = np.argsort(gd)
        gd, kd = gd[order], kd[order]
        go = o["gram"].to_numpy().astype(U64)
        ko = o["key"].to_numpy().astype(U64)
        j = np.minimum(np.searchsorted(gd, go), len(gd) - 1)
        rm = (gd[j] == go) & (ko != kd[j])
        keys = ko[rm]
        return pd.DataFrame(
            {
                "doc_id": (keys >> U64(32)).astype(np.int64),
                "pos": (keys & U64(0xFFFFFFFF)).astype(np.int64),
            }
        )

    removals = (
        dup_ds.union(occ)
        .groupby("bucket")
        .map_groups(join_bucket, batch_format="pandas")
    )

    dbuckets = num_buckets

    def tag_docs(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = (splitmix64(ids.astype(U64)) % U64(dbuckets)).astype(np.int32)
        return pa.table(
            {
                "dbucket": pa.array(b),
                "doc_id": t["doc_id"],
                "pos": pa.array(np.full(len(t), -1, dtype=np.int64)),
                "text": pc.cast(t["text"], pa.string()),
            }
        )

    def tag_removals(df: pd.DataFrame) -> pa.Table:
        ids = (
            df["doc_id"].to_numpy(np.int64)
            if "doc_id" in df.columns
            else np.array([], dtype=np.int64)
        )
        pos = (
            df["pos"].to_numpy(np.int64) if len(ids) else np.array([], dtype=np.int64)
        )
        return pa.table(
            {
                "dbucket": pa.array(
                    (splitmix64(ids.astype(U64)) % U64(dbuckets)).astype(np.int32)
                ),
                "doc_id": pa.array(ids),
                "pos": pa.array(pos),
                "text": pa.array([""] * len(ids), pa.string()),
            }
        )

    tagged = ds.map_batches(tag_docs, batch_format="pyarrow").union(
        removals.map_batches(tag_removals, batch_format="pandas")
    )

    def cut_group(g: pd.DataFrame) -> pd.DataFrame:
        docs_rows = g[g["pos"] < 0].sort_values("doc_id", kind="mergesort")
        if docs_rows.empty:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "n_tokens": pd.Series(dtype="int64"),
                    "removed_tokens": pd.Series(dtype="int64"),
                    "n_spans": pd.Series(dtype="int64"),
                    "kept_text": pd.Series(dtype=object),
                }
            )
        ids = docs_rows["doc_id"].to_numpy(np.int64)
        t = pa.table(
            {
                "doc_id": pa.array(ids),
                "text": pa.array(docs_rows["text"].tolist(), pa.string()),
            }
        )
        offs, flat_tok, n = _split_text(t["text"])
        rms = g[g["pos"] >= 0]
        ridx = np.searchsorted(ids, rms["doc_id"].to_numpy(np.int64))
        start_flat = offs[ridx] + rms["pos"].to_numpy(np.int64)
        return _apply_removals(t, offs, flat_tok, n, start_flat, kk).to_pandas()

    return tagged.groupby("dbucket").map_groups(cut_group, batch_format="pandas")


# --- weighted priority sampling (A-ES without replacement) --------------------


def weighted_sample(sf_dir: str, *, k: int = 64):
    """Weighted sampling WITHOUT replacement via the Efraimidis-Spirakis
    priority rule (public algorithm, "Weighted random sampling with a
    reservoir", IPL 2006): each doc draws priority ``u^(1/w)`` with weight
    w = its token count, and the global top-k priorities win — longer
    docs proportionally likelier, one pass, no shuffle of the corpus.

    Determinism + oracle parity: u comes from the same Knuth
    multiplicative hash of doc_id used by ``mixture_sample`` (exactly
    expressible in SQL), and priorities are rounded to 12dp on BOTH
    engines before ordering (ULP discipline; ties break by doc_id).
    Scale shape: per-block top-k partial -> one bounded combine of
    k rows/block — the distributed-reservoir merge property of A-ES.
    """
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(t: pa.Table) -> pd.DataFrame:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ntok = pc.list_value_length(
            pc.split_pattern(t["text"].combine_chunks().cast(pa.large_string()), " ")
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        # uint64 hash: well-defined at any doc_id (the oracle's BIGINT
        # product is overflow-safe only for doc_id < ~3.47e9 — see
        # mixture_sample for the bound).
        u = (
            (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(4294967296)
        ).astype(np.float64)
        u = (u + 1) / 4294967297.0
        key = np.round(u ** (1.0 / np.maximum(ntok, 1)), 12)
        top = np.lexsort((ids, -key))[: min(k, len(ids))]
        return pd.DataFrame(
            {"doc_id": ids[top], "n_tokens": ntok[top], "key": key[top]}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if "key" not in parts.columns:
        return pd.DataFrame(
            {"doc_id": pd.Series(dtype="int64"), "n_tokens": pd.Series(dtype="int64")}
        )
    out = parts.sort_values(
        ["key", "doc_id"], ascending=[False, True], kind="mergesort"
    ).head(k)
    return out[["doc_id", "n_tokens"]].reset_index(drop=True)


# --- unigram log-probability quality scoring (perplexity-filter proxy) -------


def doc_logprob(sf_dir: str):
    """Per-doc mean unigram log-probability — the CCNet-style perplexity
    quality filter with a unigram proxy LM trained on the corpus itself:
    docs whose tokens are globally rare score low (boilerplate/garbage),
    high-probability prose scores high. Two passes:

    1. global term frequencies: per-block Arrow group_by counts
       (vocabulary-bounded rows per block), combined driver-side and
       broadcast once as log-probs — the same vocabulary-bounded
       broadcast discipline as ``analytic.tfidf_top_term``;
    2. stateless scoring map: searchsorted token->logp lookup, per-doc
       mean via one bincount, 6dp ULP rounding shared with the oracle.

    No OOV handling is needed: the LM's support IS the corpus vocabulary.
    """
    import ray

    from ..sources.fs import to_pandas_cols

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def tf_partial(t: pa.Table) -> pa.Table:
        arr = (
            t["text"].combine_chunks()
            if isinstance(t["text"], pa.ChunkedArray)
            else t["text"]
        )
        lists = pc.split_pattern(arr.cast(pa.large_string()), " ")
        flat = pa.table({"token": pc.cast(lists.flatten(), pa.string())})
        return flat.group_by("token").aggregate([("token", "count")])

    parts = to_pandas_cols(
        ds.map_batches(tf_partial, batch_format="pyarrow"),
        {"token": "object", "token_count": "int64"},
    )
    freq = parts.groupby("token", sort=True)["token_count"].sum()
    toks_sorted = freq.index.to_numpy(dtype=object)
    total = float(freq.to_numpy().sum()) or 1.0
    logp_sorted = np.log(freq.to_numpy(np.float64) / total)
    ref = ray.put((toks_sorted.astype("U"), logp_sorted))

    def score(t: pa.Table) -> pa.Table:
        vocab, lp = ray.get(ref)
        arr = (
            t["text"].combine_chunks()
            if isinstance(t["text"], pa.ChunkedArray)
            else t["text"]
        )
        lists = pc.split_pattern(arr.cast(pa.large_string()), " ")
        offs = np.asarray(lists.offsets).astype(np.int64)
        flat = np.asarray(lists.flatten().to_pylist(), dtype="U")
        n = np.diff(offs)
        row_of = np.repeat(np.arange(len(n), dtype=np.int64), n)
        idx = np.searchsorted(vocab, flat)
        doc_sum = np.bincount(row_of, weights=lp[idx], minlength=len(n))
        mean = doc_sum / np.maximum(n, 1)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n),
                "mean_logprob": pc.round(
                    pa.array(mean), ndigits=6, round_mode="half_towards_infinity"
                ),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


# --- BM25 retrieval scoring ---------------------------------------------------

#: fixed benchmark query — terms chosen across the fixture vocabulary's
#: frequency range so idf spread is real (mirrored VERBATIM in the oracle)
BM25_QUERY_TERMS = ("data", "merge", "window", "spark")


def bm25_docs(sf_dir: str, *, terms=BM25_QUERY_TERMS, k1: float = 1.2, b: float = 0.75):
    """Exact BM25 scores for every document matching >= 1 query term:
    ``(doc_id, bm25)`` — the retrieval-scoring rung beside the inverted
    index (which answers WHICH docs match; this ranks them).

    Two corpus passes, the ``doc_logprob`` discipline — text never enters
    an exchange:

    1. per-block (n_docs, sum_dl, df_t) scalar partials collect driver-side
       (|terms|+2 ints per block) and fold into the idf / avgdl constants;
    2. a stateless scoring map recomputes per-doc term frequencies with one
       vectorized token-equality scan per term and applies the closed-form
       score.

    Cross-engine float discipline: N, df, tf, dl are exact integers; avgdl
    is an exact-integer ratio; every remaining op is the IDENTICAL scalar
    expression on both engines, composite constants are spelled as the
    same source literals (``1.2 + 1``, not ``2.2`` — they differ in the
    last ulp), the per-term sum runs in fixed term order, and the result
    rounds to 6dp half-away-from-zero (the repo's oracle convention).
    """
    import ray

    from ..sources.fs import to_pandas_cols

    nt = len(terms)
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _tf_dl(t: pa.Table):
        arr = (
            t["text"].combine_chunks()
            if isinstance(t["text"], pa.ChunkedArray)
            else t["text"]
        )
        lists = pc.split_pattern(arr.cast(pa.large_string()), " ")
        offs = np.asarray(lists.offsets).astype(np.int64)
        dl = np.diff(offs)
        flat = lists.flatten()
        row_of = np.repeat(np.arange(len(dl), dtype=np.int64), dl)
        tf = np.zeros((len(dl), nt), dtype=np.int64)
        for i, term in enumerate(terms):
            m = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            m = np.asarray(m, dtype=bool)
            if m.any():
                np.add.at(tf[:, i], row_of[m], 1)
        return tf, dl

    def partial(t: pa.Table) -> pd.DataFrame:
        tf, dl = _tf_dl(t)
        row = {"n_docs": [len(dl)], "sum_dl": [int(dl.sum())]}
        for i in range(nt):
            row[f"df{i}"] = [int((tf[:, i] > 0).sum())]
        return pd.DataFrame(row)

    schema = {"n_docs": "int64", "sum_dl": "int64"}
    schema.update({f"df{i}": "int64" for i in range(nt)})
    parts = to_pandas_cols(ds.map_batches(partial, batch_format="pyarrow"), schema)
    n = float(parts["n_docs"].sum())
    if n == 0:
        return pd.DataFrame(
            {"doc_id": np.array([], dtype=np.int64), "bm25": np.array([], np.float64)}
        )
    avgdl = float(parts["sum_dl"].sum()) / n
    idf = np.array(
        [
            np.log(1.0 + (n - df + 0.5) / (df + 0.5))
            for df in parts[[f"df{i}" for i in range(nt)]].sum().to_numpy(np.float64)
        ]
    )
    consts = ray.put((idf, avgdl))

    def score(t: pa.Table) -> pa.Table:
        idf_v, ad = ray.get(consts)
        tf, dl = _tf_dl(t)
        dlf = dl.astype(np.float64)
        norm = k1 * ((1.0 - b) + b * dlf / ad)
        s = np.zeros(len(dlf), dtype=np.float64)
        for i in range(nt):  # fixed term order = the oracle's + chain
            tfi = tf[:, i].astype(np.float64)
            s = s + idf_v[i] * (tfi * (k1 + 1)) / (tfi + norm)
        keep = tf.sum(axis=1) > 0
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()).filter(pa.array(keep)),
                "bm25": pc.round(
                    pa.array(s[keep]), ndigits=6, round_mode="half_towards_infinity"
                ),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


# --- paragraph-level dedup (CCNet-style) --------------------------------------

#: paragraph-key packing bound (mirrored in the oracle): pidx < 2^20, so
#: doc_id must stay < 2^43 for the keep-first key to be collision-free
PARA_KEY_SHIFT = 1_048_576


def _paragraphs_of(t: pa.Table, para_words: int):
    """Per-block paragraph explode: the fixed-width ``para_words``-token
    windows of every doc, as (doc_row, pidx, para-string) arrays plus the
    per-doc paragraph counts. One tokenize + one pandas group-join; shared
    verbatim by both passes so the dedup key is derived identically."""
    arr = (
        t["text"].combine_chunks()
        if isinstance(t["text"], pa.ChunkedArray)
        else t["text"]
    )
    lists = pc.split_pattern(arr.cast(pa.large_string()), " ")
    offs = np.asarray(lists.offsets).astype(np.int64)
    ntok = np.diff(offs)
    flat = np.asarray(lists.flatten().to_pylist(), dtype=object)
    n_paras = (ntok + para_words - 1) // para_words
    row_of_tok = np.repeat(np.arange(len(ntok), dtype=np.int64), ntok)
    pos_in_doc = np.arange(len(flat), dtype=np.int64) - np.repeat(offs[:-1], ntok)
    pidx_of_tok = pos_in_doc // para_words
    # global paragraph id per token: doc's paragraph base + local index
    base = np.concatenate([[0], np.cumsum(n_paras)[:-1]])
    gpid = np.repeat(base, ntok) + pidx_of_tok
    para = (
        pd.Series(flat)
        .groupby(gpid, sort=True)
        .agg(" ".join)
        .to_numpy(dtype=object)
    )
    doc_row = np.repeat(np.arange(len(ntok), dtype=np.int64), n_paras)
    pidx = np.concatenate([np.arange(k, dtype=np.int64) for k in n_paras]) if len(
        n_paras
    ) else np.array([], dtype=np.int64)
    return doc_row, pidx, para, n_paras


def paragraph_dedup(sf_dir: str, *, para_words: int = 16, num_buckets: int = 64):
    """CCNet-style PARAGRAPH-level dedup: every ``para_words``-token window
    ("paragraph") that occurs more than once corpus-wide is removed except
    its globally-first occurrence (min ``doc_id * 2^20 + pidx`` key);
    output is ``(doc_id, n_paras, n_removed, kept_text)`` per doc — the
    granularity rung between byte-exact doc dedup and substring-span
    removal (real CC pipelines dedup boilerplate paragraphs this way).

    Shape (the ``substring_spans`` broadcast discipline):

    1. per-block distinct (para, cnt, minkey) partials → ONE exchange
       bucketed on the paragraph-string hash → global winner table,
       filtered to cnt > 1 — bounded by CROSS-DOC DUPLICATE paragraphs,
       the sparse set in the web regime — broadcast once via ``ray.put``
       (string-exact semantics: whole paragraphs travel, not hashes, so
       there is no collision caveat);
    2. a stateless map re-derives each doc's paragraphs with the SAME
       kernel, drops losers by sorted-array membership, and rebuilds
       ``kept_text`` — corpus text never enters any exchange.

    doc_id must stay < 2^43 (key packing bound, documented like the
    ``substring_spans`` bound). A heavy-boilerplate corpus whose dup table
    outgrows the broadcast budget would grow a ``method="join"`` fallback
    exactly like ``substring_spans``; the fixture-scale default keeps the
    single broadcast.
    """
    import ray

    from ..sources.fs import to_pandas_cols

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(t: pa.Table) -> pd.DataFrame:
        doc_row, pidx, para, _ = _paragraphs_of(t, para_words)
        ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        key = ids[doc_row] * PARA_KEY_SHIFT + pidx
        df = pd.DataFrame({"para": para, "key": key})
        g = df.groupby("para", sort=False)["key"]
        out = g.agg(cnt="size", minkey="min").reset_index()
        out["__b"] = (
            pd.util.hash_array(out["para"].to_numpy(dtype=object))
            & (num_buckets - 1)
        ).astype(np.int32)
        return out

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("para", sort=False)
        out = g.agg(cnt=("cnt", "sum"), minkey=("minkey", "min")).reset_index()
        return out[out["cnt"] > 1][["para", "minkey"]]

    dups = to_pandas_cols(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(combine, batch_format="pandas"),
        {"para": "object", "minkey": "int64"},
    )
    dup_paras = dups["para"].to_numpy(dtype=object).astype("U")
    order = np.argsort(dup_paras, kind="mergesort")
    ref = ray.put((dup_paras[order], dups["minkey"].to_numpy(np.int64)[order]))

    def apply(t: pa.Table) -> pd.DataFrame:
        dpar, dkey = ray.get(ref)
        doc_row, pidx, para, n_paras = _paragraphs_of(t, para_words)
        ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        if len(dpar):
            pu = para.astype("U")
            pos = np.clip(np.searchsorted(dpar, pu), 0, len(dpar) - 1)
            isdup = dpar[pos] == pu
            key = ids[doc_row] * PARA_KEY_SHIFT + pidx
            removed = isdup & (key != dkey[pos])
        else:
            removed = np.zeros(len(para), dtype=bool)
        kept = pd.DataFrame(
            {"row": doc_row[~removed], "para": para[~removed]}
        )
        # pidx-ordered by construction (paragraphs emit in doc order)
        ktext = kept.groupby("row", sort=True)["para"].agg(" ".join)
        n_rem = np.zeros(len(ids), dtype=np.int64)
        np.add.at(n_rem, doc_row[removed], 1)
        out = pd.DataFrame(
            {
                "doc_id": ids,
                "n_paras": n_paras.astype(np.int64),
                "n_removed": n_rem,
                "kept_text": np.full(len(ids), "", dtype=object),
            }
        )
        out.loc[ktext.index, "kept_text"] = ktext.to_numpy(dtype=object)
        return out

    return ds.map_batches(apply, batch_format="pyarrow")


def within_doc_para_dedup(sf_dir: str, *, para_words: int = 16):
    """WITHIN-document paragraph dedup: repeated ``para_words``-token
    windows inside the SAME doc keep only their first occurrence — the
    boilerplate-trimming rung that needs NO exchange at all (each doc is
    self-contained, so the whole transform is one stateless map over
    blocks; corpus-wide duplicates are ``paragraph_dedup``'s job).
    Output per doc: (doc_id, n_paras, n_removed, kept_text)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(t: pa.Table) -> pd.DataFrame:
        doc_row, pidx, para, n_paras = _paragraphs_of(t, para_words)
        ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"row": doc_row, "pidx": pidx, "para": para})
        # paragraphs emit in (row, pidx) order -> duplicated() keeps first
        removed = df.duplicated(["row", "para"]).to_numpy()
        kept = df[~removed]
        ktext = kept.groupby("row", sort=True)["para"].agg(" ".join)
        n_rem = np.zeros(len(ids), dtype=np.int64)
        np.add.at(n_rem, doc_row[removed], 1)
        return pd.DataFrame(
            {
                "doc_id": ids,
                "n_paras": n_paras.astype(np.int64),
                "n_removed": n_rem,
                "kept_text": pd.Series(ktext, index=range(len(ids)))
                .fillna("")
                .astype(str)
                .to_numpy(),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def doc_lexical_stats(sf_dir: str):
    """Per-doc lexical stats: token count + DISTINCT token count (the
    type-token ratio's exact integer numerator/denominator — emitting the
    ints keeps the oracle float-free). Pure per-block map, no shuffle."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        arr = (
            t["text"].combine_chunks()
            if isinstance(t["text"], pa.ChunkedArray)
            else t["text"]
        )
        lists = pc.split_pattern(arr.cast(pa.large_string()), " ")
        ntok = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
        offs = np.asarray(lists.offsets).astype(np.int64)
        flat = np.asarray(lists.flatten().to_pylist(), dtype=object)
        row = np.repeat(np.arange(len(ntok), dtype=np.int64), ntok)
        df = pd.DataFrame({"row": row, "w": flat})
        nd = (
            df.drop_duplicates()
            .groupby("row", sort=True)
            .size()
            .reindex(range(len(ntok)), fill_value=0)
            .to_numpy(np.int64)
        )
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "n_tokens": pa.array(ntok),
                "n_distinct": pa.array(nd),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")
