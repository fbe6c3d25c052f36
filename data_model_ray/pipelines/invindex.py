"""Inverted-index build: documents -> bucket-partitioned postings parquet.

The sink-shaped half of the text-statistics family (``analytic.token_df_topk``
is the stats half): distinct (token, doc_id) postings are hash-bucketed by
token and written through the lineage layer's resumable writer — one
atomic parquet partition per bucket, each carrying a fingerprinted lineage
record, so a re-run (or a crashed run) skips every already-valid bucket
and rebuilds only the missing ones. This is the reference's
skip-if-already-ingested + validated-group-write discipline
(/root/reference/src/eopf_geozarr/conversion/geozarr.py:1011-1057) applied
to a text index instead of a raster store.

Scale shape: the only exchange is the bucket groupby, and rows entering it
are per-block distinct (token, doc_id) pairs — token text crosses the wire
once, no doc text ever does. Bucket count bounds both the write fan-in and
the resume granularity; at 100 TB you raise ``num_buckets`` so each
posting partition stays writeable by one task.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.fs import sized_read_parquet
from ..stages.text import fingerprint64
from ..state.lineage import read_output, resumable_write


def postings_dataset(sf_dir: str, *, num_buckets: int = 16):
    """Lazy Dataset of distinct ``(bucket, token, doc_id)`` postings."""
    ds = sized_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def pairs(t: pa.Table) -> pa.Table:
        arr = (
            t["text"].combine_chunks()
            if isinstance(t["text"], pa.ChunkedArray)
            else t["text"]
        )
        lists = pc.split_pattern(arr.cast(pa.large_string()), " ")
        counts = np.diff(np.asarray(lists.offsets).astype(np.int64))
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pa.table(
            {
                "token": pc.cast(lists.flatten(), pa.string()),
                "doc_id": pa.array(np.repeat(ids, counts)),
            }
        )
        # exact per-block distinct on the token STRING (Arrow group_by —
        # no hash-collision exposure in the index itself)
        dist = flat.group_by(["token", "doc_id"]).aggregate([])
        b = (fingerprint64(dist["token"]) % np.uint64(num_buckets)).astype(
            np.int32
        )
        return dist.append_column("bucket", pa.array(b))

    return ds.map_batches(pairs, batch_format="pyarrow")


def build_inverted_index(
    sf_dir: str, out_dir: str, *, num_buckets: int = 16
) -> dict:
    """Build (or resume) the postings index under ``out_dir``; returns the
    resumable-write summary (partitions written/skipped, rows)."""
    import pyarrow.parquet as pq

    n_rows = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    fp = f"invindex:v1:rows={n_rows}:buckets={num_buckets}"
    summary = resumable_write(
        postings_dataset(sf_dir, num_buckets=num_buckets),
        out_dir,
        partition_col="bucket",
        fingerprint=fp,
    )
    _write_manifest(out_dir, fp, num_buckets)
    return summary


def _write_manifest(out_dir: str, fingerprint: str, num_buckets: int) -> None:
    """Consolidated store manifest — the closed-contract surface
    ``functions.store.validate_invindex_store`` checks (third registered
    store model; reference analogue: the per-product union members of
    /root/reference/src/eopf_geozarr/data_api/s2_converter.py:408-418).
    Atomic replace so a crashed run never leaves a half manifest.

    Partitions are admitted by their FOOTER FINGERPRINT, not by presence
    on disk: leftovers from a previous build with a different input or
    bucket count carry a different fingerprint and are DELETED here (they
    are invalid for this build by the resumable-write contract and would
    otherwise make the just-built store fail its own closed validation).
    """
    import glob
    import json
    import os
    import shutil

    import pyarrow.parquet as pq

    from ..state.lineage import FINGERPRINT_KEY

    parts = {}
    for p in sorted(glob.glob(os.path.join(out_dir, "part=*", "data.parquet"))):
        bucket = os.path.basename(os.path.dirname(p)).split("=", 1)[1]
        meta = pq.read_schema(p).metadata or {}
        if meta.get(FINGERPRINT_KEY, b"").decode() != fingerprint:
            shutil.rmtree(os.path.dirname(p), ignore_errors=True)
            continue
        parts[bucket] = pq.read_metadata(p).num_rows
    manifest = {
        "kind": "inverted-index",
        "version": 1,
        "num_buckets": num_buckets,
        "input_fingerprint": fingerprint,
        "partitions": parts,
    }
    tmp = os.path.join(out_dir, f"invindex_manifest.json.tmp.{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, "invindex_manifest.json"))


def inverted_index(sf_dir: str, out_dir: str | None = None):
    """queries() entry: build the index (resuming if the same input was
    already indexed), read the written partitions back, and return the
    (token, doc_id) postings — what a consumer of the index sees."""
    import hashlib
    import os

    if out_dir is None:
        tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
        out_dir = f"/tmp/data_model_ray_invindex/{tag}"
    os.makedirs(out_dir, exist_ok=True)
    summary = build_inverted_index(sf_dir, out_dir)
    if summary["partitions_written"] + summary["partitions_skipped"] == 0:
        # empty corpus -> nothing was (or ever will be) written
        return pa.table(
            {"token": pa.array([], pa.string()), "doc_id": pa.array([], pa.int64())}
        )
    return read_output(out_dir).select_columns(["token", "doc_id"])


def index_lookup(
    sf_dir: str,
    terms: tuple[str, ...] = ("data", "query", "fast"),
    out_dir: str | None = None,
):
    """Conjunctive (AND) term lookup against the built index — the read
    half of the family, and the payoff of bucket partitioning: only the
    partitions whose bucket matches a query term's hash are opened
    (partition pruning at the read; with 16 buckets and 3 terms that is
    <= 3/16 of the index regardless of corpus size). Returns the doc_ids
    containing EVERY term.

    Scale shape: postings for the probed buckets stream through one
    ``is_in`` filter, then a per-block (doc_id, hits) partial and one
    bounded combine — candidate docs only, never the corpus.
    """
    import glob
    import hashlib
    import os

    import pandas as pd
    import ray.data as rd

    if out_dir is None:
        tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
        out_dir = f"/tmp/data_model_ray_invindex/{tag}"
    os.makedirs(out_dir, exist_ok=True)
    summary = build_inverted_index(sf_dir, out_dir)
    n_parts = summary["partitions_written"] + summary["partitions_skipped"]
    if n_parts == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})

    terms = tuple(dict.fromkeys(terms))  # dedup, keep order
    num_buckets = 16  # matches build_inverted_index default
    want = np.unique(
        (fingerprint64(pa.array(list(terms))) % np.uint64(num_buckets)).astype(
            np.int64
        )
    )
    paths = [
        p
        for b in want
        for p in glob.glob(os.path.join(out_dir, f"part={b}", "data.parquet"))
    ]
    if not paths:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
    postings = rd.read_parquet(sorted(paths), columns=["token", "doc_id"])
    term_set = pa.array(list(terms), pa.string())

    def partial(t: pa.Table) -> pa.Table:
        hit = t.filter(pc.is_in(t["token"], value_set=term_set))
        # postings are distinct by construction: count == distinct count
        return hit.group_by("doc_id").aggregate([("token", "count")])

    parts = postings.map_batches(partial, batch_format="pyarrow").to_pandas()
    if "doc_id" not in parts.columns or parts.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
    hits = parts.groupby("doc_id", sort=True)["token_count"].sum()
    out = hits[hits == len(terms)].index.to_numpy(np.int64)
    return pd.DataFrame({"doc_id": out})
