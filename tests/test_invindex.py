"""Inverted-index sink (pipelines/invindex.py): postings correctness is
covered by the oracle sweeps; here we pin the lineage behaviors the SQL
can't see — resume skips valid buckets, a corrupted/missing partition is
rebuilt alone, and a fingerprint change (different input) rebuilds all."""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq

from data_model_ray.pipelines.invindex import build_inverted_index, inverted_index

SF = "/root/testdata/sf0.001"


def test_build_then_resume_skips_all(ray_session, tmp_path):
    out = str(tmp_path / "idx")
    s1 = build_inverted_index(SF, out)
    assert s1["partitions_written"] > 0 and s1["partitions_skipped"] == 0
    s2 = build_inverted_index(SF, out)
    assert s2["partitions_written"] == 0
    assert s2["partitions_skipped"] == s1["partitions_written"]


def test_missing_partition_rebuilt_alone(ray_session, tmp_path):
    out = str(tmp_path / "idx")
    s1 = build_inverted_index(SF, out)
    victims = [d for d in os.listdir(out) if d.startswith("part=")]
    shutil.rmtree(os.path.join(out, victims[0]))
    s3 = build_inverted_index(SF, out)
    assert s3["partitions_written"] == 1
    assert s3["partitions_skipped"] == s1["partitions_written"] - 1


def test_readback_matches_direct_dataset(ray_session, tmp_path):
    out = str(tmp_path / "idx")
    got = inverted_index(SF, out).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    want = {
        (tok, i)
        for i, s in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
        for tok in set(s.split(" "))
    }
    assert set(zip(got["token"], got["doc_id"])) == want


def test_index_lookup_prunes_buckets(ray_session, tmp_path):
    """The AND-lookup opens only the term-hash buckets' partitions and
    still returns the exact conjunctive doc set."""
    import pyarrow as pa

    from data_model_ray.pipelines.invindex import index_lookup
    from data_model_ray.stages.text import fingerprint64

    out = str(tmp_path / "idx")
    terms = ("data", "query", "fast")
    got = index_lookup(SF, terms, out)
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    want = sorted(
        i
        for i, s in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
        if set(terms) <= set(s.split(" "))
    )
    assert want, "fixture must contain conjunctive matches"
    assert list(got["doc_id"]) == want
    # pruning: the probed buckets are a strict subset of the 14+ written
    buckets = {int(b) for b in fingerprint64(pa.array(list(terms))) % 16}
    assert len(buckets) <= 3 < len(os.listdir(out)) - 1  # -1: lineage log
