"""Web-corpus curation operators (pipelines/webtext.py + stages/bloom.py).

Oracle parity mirrors the driver's gate (exact frame equality vs the same
DuckDB SQL shipped in __ray_entry__.oracle_sql); behavioral tests cover
the parts the oracle can't see — bloom no-false-negatives, FP resolution
by the exact verify join, packing invariants, quota exactness.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entry
from data_model_ray import fixtures, oracles
from data_model_ray.stages.bloom import BloomFilter, build_bloom

N = 10_000
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con(ray_session):
    fixtures.ensure_pages_parquet(N)
    fixtures.ensure_side_tables()
    c = duckdb.connect()
    c.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _assert_parity(got, want: pd.DataFrame):
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_exact=True)


# --- oracle parity (documents-table queries use the exact shipped SQL) ------

DOC_CASES = ["doc_repetition", "doc_chunks", "substring_dedup", "contamination_check", "mixture_sample", "pack_sequences"]


@pytest.mark.parametrize("name", DOC_CASES)
def test_doc_query_matches_oracle(con, name):
    got = entry.queries()[name](SF)
    want = con.sql(entry.oracle_sql()[name]).df()
    assert len(want) > 0
    _assert_parity(got, want)


PAGES_CASES = [
    ("pages_pii_scan", lambda: oracles.pii_scan_sql(N)),
    ("pages_incremental_dedup", lambda: oracles.incremental_dedup_sql(N)),
    ("pages_zonal_stats", lambda: oracles.pages_zonal_stats_sql(N)),
]


@pytest.mark.parametrize("name,sql_builder", PAGES_CASES)
def test_pages_query_matches_oracle(con, name, sql_builder):
    got = entry.queries()[name](SF)
    want = con.sql(sql_builder()).df()
    assert len(want) > 0
    _assert_parity(got, want)


def test_new_queries_have_oracles():
    osql = entry.oracle_sql()
    for name in DOC_CASES + [n for n, _ in PAGES_CASES]:
        assert name in osql


# --- contamination behavior --------------------------------------------------


def test_contamination_finds_planted_overlap(con):
    got = entry.queries()["contamination_check"](SF).to_pandas()
    # benchmark docs themselves are excluded from the probe side
    assert (got["doc_id"] % 97 != 0).all()
    # the 31-word vocabulary guarantees some genuine 3-gram overlap
    assert (got["n_shared"] > 0).any()
    assert ((got["contam_frac"] >= 0) & (got["contam_frac"] <= 1)).all()


# --- bloom filter ------------------------------------------------------------


def test_bloom_no_false_negatives():
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 2**63, size=5000, dtype=np.uint64)
    bf = BloomFilter(n_bits=1 << 16)
    bf.add(keys)
    assert bf.contains(keys).all()


def test_bloom_fp_rate_small():
    rng = np.random.default_rng(11)
    keys = rng.integers(0, 2**63, size=1000, dtype=np.uint64)
    other = rng.integers(0, 2**63, size=20000, dtype=np.uint64)
    bf = BloomFilter(n_bits=1 << 16)  # m/n = 65, k = 4 -> fp << 1%
    bf.add(keys)
    fp = bf.contains(np.setdiff1d(other, keys)).mean()
    assert fp < 0.01


def test_bloom_merge_is_or():
    a, b = BloomFilter(n_bits=1 << 12), BloomFilter(n_bits=1 << 12)
    ka = np.arange(100, dtype=np.uint64)
    kb = np.arange(100, 200, dtype=np.uint64)
    a.add(ka)
    b.add(kb)
    merged = BloomFilter(n_bits=1 << 12, bits=a.bits.copy()).merge(b)
    assert merged.contains(ka).all() and merged.contains(kb).all()
    # idempotent: merging again changes nothing (retry safety)
    again = BloomFilter(n_bits=1 << 12, bits=merged.bits.copy()).merge(b)
    assert (again.bits == merged.bits).all()


def test_build_bloom_distributed(ray_session):
    import ray.data as rd

    from data_model_ray.stages.text import fingerprint64

    urls = [f"u{i}" for i in range(2000)]
    ds = rd.from_arrow(pa.table({"url": urls})).repartition(8)
    bf = build_bloom(ds, lambda t: fingerprint64(t["url"]), n_bits=1 << 16)
    assert bf.contains(fingerprint64(pa.array(urls))).all()


# --- incremental dedup: planted heavy overlap + forced bloom FPs ------------


def test_incremental_dedup_planted(ray_session, tmp_path):
    from data_model_ray.pipelines.webtext import incremental_dedup

    old_urls = [f"https://a/{i}" for i in range(500)]
    # new snapshot: 300 recrawls of seen urls + 400 genuinely new
    new_urls = [f"https://a/{i}" for i in range(300)] + [
        f"https://b/{i}" for i in range(400)
    ]
    cut = pd.Timestamp("2024-07-01")
    t = pa.table(
        {
            "url": old_urls + new_urls,
            "warc_ts": pa.array(
                [cut - pd.Timedelta(days=1)] * len(old_urls)
                + [cut + pd.Timedelta(days=1)] * len(new_urls),
                type=pa.timestamp("us"),
            ),
        }
    )
    path = str(tmp_path / "pages")
    import os

    os.makedirs(path)
    pq.write_table(t, f"{path}/part-0.parquet")

    # tiny filter forces false positives -> the exact verify must fix them
    out = incremental_dedup(path, n_bits=1 << 8).to_pandas()
    assert sorted(out["url"]) == sorted(f"https://b/{i}" for i in range(400))


# --- packing invariants ------------------------------------------------------


def test_pack_sequences_invariants(ray_session):
    got = entry.queries()["pack_sequences"](SF).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    assert len(got) == 500
    # bin fill never exceeds the budget (every doc here is < 256 tokens)
    fills = got.groupby("bin_id")["n_tokens"].sum()
    assert (fills <= 256).all()
    # offsets are the exclusive prefix sums within each bin
    for _, g in got.groupby("bin_id"):
        g = g.sort_values("doc_id")
        assert list(g["bin_pos"]) == list(
            np.concatenate([[0], np.cumsum(g["n_tokens"].to_numpy())[:-1]])
        )
    # greedy reference walk per 64-doc range reproduces bin boundaries
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ref = pd.DataFrame(
        {
            "doc_id": docs["doc_id"].to_numpy(),
            "n": [len(s.split(" ")) for s in docs["text"].to_pylist()],
        }
    ).sort_values("doc_id")
    ref["rng"] = ref["doc_id"] // 64
    bins = {}
    for rng, g in ref.groupby("rng"):
        b, fill = 0, 0
        for _, row in g.iterrows():
            if fill and fill + row["n"] > 256:
                b, fill = b + 1, 0
            bins[row["doc_id"]] = rng * 100_000 + b
            fill += row["n"]
    assert got.set_index("doc_id")["bin_id"].to_dict() == bins


# --- mixture sampling quotas -------------------------------------------------


def test_mixture_sample_quotas(ray_session, con):
    import math

    got = entry.queries()["mixture_sample"](SF).to_pandas()
    counts = con.sql("SELECT source, COUNT(*) c FROM documents GROUP BY source").df()
    want = {r.source: math.ceil(math.sqrt(r.c)) for r in counts.itertuples()}
    assert got.groupby("source")["doc_id"].count().to_dict() == want
    # deterministic: same call returns the same sample
    again = entry.queries()["mixture_sample"](SF).to_pandas()
    assert sorted(got["doc_id"]) == sorted(again["doc_id"])


# --- exact substring dedup behavioral cases ----------------------------------


def _substr_run(tmp_path, texts, k=8):
    from data_model_ray.pipelines.webtext import substring_dedup

    tab = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    out = substring_dedup(str(tmp_path), k=k).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_substring_dedup_keeps_first_occurrence(ray_session, tmp_path):
    shared = " ".join(f"w{i}" for i in range(10))
    out = _substr_run(
        tmp_path, [f"alpha {shared} omega", f"beta {shared} gamma zz"]
    )
    # doc 0 (globally first occurrence) is untouched
    assert out.loc[0, "removed_tokens"] == 0
    assert out.loc[0, "kept_text"] == f"alpha {shared} omega"
    # doc 1 loses exactly the shared 10-token run, one merged span
    assert out.loc[1, "removed_tokens"] == 10
    assert out.loc[1, "n_spans"] == 1
    assert out.loc[1, "kept_text"] == "beta gamma zz"


def test_substring_dedup_within_doc_repetition(ray_session, tmp_path):
    phrase = " ".join(f"p{i}" for i in range(8))
    out = _substr_run(tmp_path, [f"{phrase} mid {phrase}"])
    # second occurrence of the 8-gram removed, first kept
    assert out.loc[0, "removed_tokens"] == 8
    assert out.loc[0, "n_spans"] == 1
    assert out.loc[0, "kept_text"] == f"{phrase} mid"


def test_substring_dedup_short_docs_untouched(ray_session, tmp_path):
    short = "a b c d e f g"  # 7 tokens < k=8: no windows, even if identical
    out = _substr_run(tmp_path, [short, short])
    assert (out["removed_tokens"] == 0).all()
    assert (out["kept_text"] == short).all()


def test_substring_dedup_disjoint_spans_counted(ray_session, tmp_path):
    s1 = " ".join(f"x{i}" for i in range(8))
    s2 = " ".join(f"y{i}" for i in range(8))
    sep = " ".join(f"u{i}" for i in range(5))
    out = _substr_run(
        tmp_path, [f"{s1} q {s2}", f"{s1} {sep} {s2} tail"]
    )
    # doc 1 loses both shared 8-gram runs as two disjoint spans
    assert out.loc[1, "removed_tokens"] == 16
    assert out.loc[1, "n_spans"] == 2
    assert out.loc[1, "kept_text"] == f"{sep} tail"


def test_curate_substring_stage_bites(ray_session, tmp_path):
    """Composition check: docs dissimilar enough to survive near-dup
    clustering (low Jaccard) but sharing one long run get that run cut by
    the substring stage; the earlier (keeper) doc is untouched."""
    from data_model_ray.pipelines.curate import curate_docs

    rng = np.random.default_rng(3)
    # 4-letter alphabetic words -> quality score 0.9 >= 0.86 (passes stage 1)
    def words(n, tag):
        return [f"{tag}{chr(97 + int(c))}{chr(97 + int(d))}q"[:4]
                for c, d in rng.integers(0, 26, size=(n, 2))]

    shared = " ".join(f"st{chr(97 + i)}r"[:4] for i in range(12))
    t0 = " ".join(words(40, "a")) + " " + shared
    t1 = " ".join(words(40, "b")) + " " + shared
    tab = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": [t0, t1],
        "lang": ["en", "en"],
    })
    pq.write_table(tab, str(tmp_path / "documents.parquet"))

    plain = curate_docs(str(tmp_path)).to_pandas()
    assert sorted(plain["doc_id"]) == [1, 2]  # Jaccard < 0.5: both survive

    out = (
        curate_docs(str(tmp_path), substring_k=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out.columns) == [
        "doc_id", "lang", "n_tokens", "removed_tokens", "kept_text",
    ]
    assert out.loc[0, "removed_tokens"] == 0
    assert out.loc[0, "kept_text"] == t0
    assert out.loc[1, "removed_tokens"] == 12
    assert out.loc[1, "kept_text"] == " ".join(words(0, "x")) or True
    assert out.loc[1, "kept_text"] == t1[: -(len(shared) + 1)]


def test_weighted_sample_layout_invariant_and_biased(ray_session, con):
    from data_model_ray.pipelines.webtext import weighted_sample

    got = weighted_sample(SF, k=64)
    # distributed top-k == single-process reference (A-ES merge property)
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ids = np.asarray(docs["doc_id"])
    ntok = np.array([len(s.split(" ")) for s in docs["text"].to_pylist()])
    u = (
        ((ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(4294967296)).astype(
            np.float64
        )
        + 1
    ) / 4294967297.0
    key = np.round(u ** (1.0 / np.maximum(ntok, 1)), 12)
    order = np.lexsort((ids, -key))[:64]
    assert list(got["doc_id"]) == list(ids[order])
    # weighting bites: sampled docs are longer than the corpus average
    assert got["n_tokens"].mean() > ntok.mean()


def test_substring_join_mode_matches_broadcast(ray_session):
    """method="join" (no driver broadcast; text shuffles once) must equal
    the broadcast default row-for-row."""
    from data_model_ray.pipelines.webtext import _read, substring_spans

    a = (
        substring_spans(_read(SF, "documents", ["doc_id", "text"]))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        substring_spans(_read(SF, "documents", ["doc_id", "text"]), method="join")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = b[a.columns.tolist()].astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    assert (a["removed_tokens"] > 0).any()  # the fixture makes it bite


# --- substring dedup property test vs pure-python reference -----------------


def _ref_substring(texts, k):
    """Brute-force ExactSubstr reference: same semantics, no vectorization."""
    toks = [t.split(" ") for t in texts]
    occ = {}
    for i, tk in enumerate(toks):
        for p in range(max(len(tk) - k + 1, 0)):
            occ.setdefault(tuple(tk[p : p + k]), []).append((i, p))
    cov = [set() for _ in toks]
    for lst in occ.values():
        if len(lst) >= 2:
            for i, p in lst[1:]:  # lst is in (doc, pos) order by construction
                cov[i].update(range(p, p + k))
    out = []
    for i, tk in enumerate(toks):
        c = sorted(cov[i])
        spans = sum(
            1 for j, ti in enumerate(c) if j == 0 or ti != c[j - 1] + 1
        )
        kept = " ".join(t for j, t in enumerate(tk) if j not in cov[i])
        out.append((i, len(tk), len(c), spans, kept))
    return out


def test_substring_dedup_matches_reference_random(ray_session, tmp_path):
    """Randomized corpora over a tiny vocabulary (forces dense gram
    collisions, overlapping spans, within-doc repeats, k-boundary docs)
    must match the brute-force reference in both execution modes."""
    import ray.data as rd

    from data_model_ray.pipelines.webtext import substring_spans

    rng = np.random.default_rng(42)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    for trial in range(12):
        n_docs = int(rng.integers(1, 9))
        texts = [
            " ".join(rng.choice(vocab, size=int(rng.integers(0, 14))))
            for _ in range(n_docs)
        ]
        tab = pa.table(
            {"doc_id": pa.array(range(n_docs), pa.int64()), "text": texts}
        )
        want = pd.DataFrame(
            _ref_substring(texts, 3),
            columns=["doc_id", "n_tokens", "removed_tokens", "n_spans", "kept_text"],
        )
        for method in ("broadcast", "join"):
            ds = rd.from_arrow(tab).repartition(3)
            got = (
                substring_spans(ds, k=3, method=method)
                .to_pandas()
                .sort_values("doc_id")
                .reset_index(drop=True)
            )
            got = got[want.columns.tolist()].astype(
                {c: "int64" for c in want.columns[:4]}
            )
            pd.testing.assert_frame_equal(
                got, want.astype(got.dtypes.to_dict()), check_exact=True
            ), (trial, method)


def test_substring_auto_mode_picks_both_branches(ray_session):
    """method="auto" broadcasts under the budget and degrades to the join
    path above it — identical results either way."""
    from data_model_ray.pipelines.webtext import _read, substring_spans

    def run(budget):
        return (
            substring_spans(
                _read(SF, "documents", ["doc_id", "text"]),
                method="auto",
                broadcast_row_budget=budget,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    a = run(10_000_000)  # dup table fits -> broadcast branch
    b = run(0)  # budget 0 -> forced join branch
    b = b[a.columns.tolist()].astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)


def test_gopher_rules_bites(ray_session):
    """Each rule must actually drop documents on the fixture (thresholds
    chosen against the synthetic vocabulary): kept < total, all metrics
    inside the bands."""
    import pyarrow.parquet as pq

    from data_model_ray.pipelines.webtext import gopher_rules

    total = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    df = gopher_rules(SF).to_pandas()
    assert 0 < len(df) < total
    assert df["n_words"].between(20, 90).all()
    assert df["mean_wl"].between(3.8, 5.2).all()
    assert (df["stop_distinct"] >= 1).all()


def test_norm_text_dedup_bites(ray_session):
    """Every messy-variant class must collapse onto its base text: all
    groups have exactly 2 rows with the base (r=0) kept."""
    from data_model_ray.pipelines.webtext import norm_text_dedup, normalize_texts
    import pyarrow as pa

    df = norm_text_dedup(SF).to_pandas()
    assert (df["n_rows"] == 2).all()
    assert (df["kept_r"] == 0).all()
    # kernel unit cases
    got = normalize_texts(
        pa.array(["A  B c.", "a b c", "  x!y  ", "P,q"])
    ).to_pylist()
    assert got == ["a b c", "a b c", "x y", "p q"]


class TestBM25:
    def test_matches_plain_reference(self, ray_session, tmp_path):
        import math

        from data_model_ray.pipelines.webtext import bm25_docs

        docs = [
            (1, "data merge data window"),
            (2, "spark spark spark spark spark spark"),
            (3, "the quick brown fox"),          # no query term -> absent
            (4, "data"),
            (5, "merge window spark data all four terms here"),
        ]
        df = pd.DataFrame(docs, columns=["doc_id", "text"])
        d = tmp_path / "bm25"
        d.mkdir()
        df.to_parquet(d / "documents.parquet", index=False)

        out = bm25_docs(str(d)).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert out["doc_id"].tolist() == [1, 2, 4, 5]

        # plain-python replay of the documented formula
        terms = ("data", "merge", "window", "spark")
        toks = {i: t.split(" ") for i, t in docs}
        n = float(len(docs))
        dl = {i: float(len(w)) for i, w in toks.items()}
        avgdl = sum(dl.values()) / n
        dfs = [sum(1.0 for w in toks.values() if t in w) for t in terms]
        want = {}
        for i, w in toks.items():
            s = 0.0
            for t, dft in zip(terms, dfs):
                tf = float(w.count(t))
                idf = math.log(1.0 + (n - dft + 0.5) / (dft + 0.5))
                s = s + idf * (tf * (1.2 + 1)) / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl[i] / avgdl))
            if any(t in w for t in terms):
                want[i] = s
        got = dict(zip(out["doc_id"], out["bm25"]))
        for i, v in want.items():
            assert abs(got[i] - v) < 1e-6, (i, got[i], v)

    def test_empty_corpus(self, ray_session, tmp_path):
        from data_model_ray.pipelines.webtext import bm25_docs

        d = tmp_path / "bm25e"
        d.mkdir()
        pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                      "text": pd.Series([], dtype="object")}).to_parquet(
            d / "documents.parquet", index=False)
        out = bm25_docs(str(d))
        assert len(out) == 0
        assert list(out.columns) == ["doc_id", "bm25"]


class TestParagraphDedup:
    def _run(self, tmp_path, docs, **kw):
        from data_model_ray.pipelines.webtext import paragraph_dedup

        d = tmp_path / "pdedup"
        d.mkdir(exist_ok=True)
        pd.DataFrame(docs, columns=["doc_id", "text"]).to_parquet(
            d / "documents.parquet", index=False
        )
        return (
            paragraph_dedup(str(d), **kw)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    def test_keep_first_across_docs(self, ray_session, tmp_path):
        boiler = " ".join(f"b{i}" for i in range(16))
        uniq1 = " ".join(f"u{i}" for i in range(16))
        uniq2 = " ".join(f"v{i}" for i in range(16))
        out = self._run(
            tmp_path,
            [
                (10, f"{uniq1} {boiler}"),   # first occurrence of boiler: kept
                (20, f"{boiler} {uniq2}"),   # later occurrence: removed
            ],
        )
        assert out.loc[0].tolist() == [10, 2, 0, f"{uniq1} {boiler}"]
        assert out.loc[1].tolist() == [20, 2, 1, uniq2]

    def test_within_doc_repeat_and_short_tail(self, ray_session, tmp_path):
        para = " ".join(f"x{i}" for i in range(16))
        tail = "short tail"
        out = self._run(tmp_path, [(1, f"{para} {para} {tail}")])
        # second copy removed (same doc, higher pidx); short tail kept
        assert out.loc[0].tolist() == [1, 3, 1, f"{para} {tail}"]

    def test_all_paragraphs_removed(self, ray_session, tmp_path):
        para = " ".join(f"y{i}" for i in range(16))
        out = self._run(tmp_path, [(1, para), (2, para)])
        assert out.loc[0].tolist() == [1, 1, 0, para]
        assert out.loc[1].tolist() == [2, 1, 1, ""]
