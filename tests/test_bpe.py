"""BPE tokenizer tests: training determinism, fixpoint apply semantics,
SQL replay parity, and packing/chunking integration parity."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from data_model_ray.stages.bpe import (
    BpeEncoder,
    apply_merges,
    merge_pass_counts,
    replay_sql,
    train_bpe,
)

SF = "/root/testdata/sf0.001"


class TestTrain:
    def test_hand_example(self):
        # classic toy corpus: 'low'x5 'lower'x2 'newest'x6 'widest'x3
        words = ["low", "lower", "newest", "widest"]
        counts = np.array([5, 2, 6, 3])
        merges = train_bpe(words, counts, 4)
        # (e,s) 9, then (es,t) 9, (l,o) 7, (lo,w) 7 — count then lex order
        assert merges[0] == ("e", "s")
        assert merges[1] == ("es", "t")
        assert merges[2] == ("l", "o")
        assert merges[3] == ("lo", "w")

    def test_tie_break_lexicographic(self):
        # 'ab' and 'cd' both occur twice -> (a,b) wins by byte order
        merges = train_bpe(["ab", "cd"], np.array([2, 2]), 1)
        assert merges == [("a", "b")]

    def test_stops_when_no_repeats(self):
        merges = train_bpe(["ab", "cd"], np.array([1, 1]), 5)
        assert merges == []

    def test_deterministic(self):
        words = ["spark", "spars", "sparse", "parse", "park"]
        counts = np.array([3, 1, 4, 1, 5])
        m1 = train_bpe(words, counts, 6)
        m2 = train_bpe(list(words), counts.copy(), 6)
        assert m1 == m2 and len(m1) > 0


class TestApply:
    def test_fixpoint_run(self):
        # 4-symbol run: fixpoint iteration pairs them two-by-two
        assert apply_merges("llll", [("l", "l")]) == ["ll", "ll"]
        assert apply_merges("lll", [("l", "l")]) == ["ll", "l"]

    def test_rank_order(self):
        toks = apply_merges("abab", [("a", "b"), ("ab", "ab")])
        assert toks == ["abab"]

    def test_pass_counts_cover_fixpoint(self):
        words = ["llllllll", "ll", "xy"]
        merges = [("l", "l"), ("ll", "ll")]
        passes = merge_pass_counts(words, merges)
        assert len(passes) == 2 and all(p >= 1 for p in passes)
        # replaying with those pass counts reproduces apply_merges
        import duckdb

        con = duckdb.connect()
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM (VALUES "
            + ", ".join(f"({i}, '{w}')" for i, w in enumerate(words))
            + ") t(doc_id, text)"
        )
        sql = f"WITH {replay_sql(merges, passes).strip()} SELECT SUM(n_subtok) FROM bpe"
        expect = sum(len(apply_merges(w, merges)) for w in words)
        assert con.sql(sql).fetchone()[0] == expect


def _train_on(sf_dir: str, n_merges: int = 30):
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    toks = pc.list_flatten(
        pc.split_pattern(t["text"].combine_chunks().cast("large_string"), " ")
    )
    toks = toks.filter(pc.not_equal(toks, ""))
    vc = toks.value_counts()
    words = vc.field("values").to_pylist()
    cnts = vc.field("counts").to_numpy(zero_copy_only=False)
    order = sorted(range(len(words)), key=lambda i: words[i])
    return [words[i] for i in order], cnts[list(order)]


class TestPipeline:
    def test_distributed_train_matches_local(self, ray_session):
        from data_model_ray.stages.bpe import corpus_merges

        words, cnts = _train_on(SF)
        local = train_bpe(words, cnts, 30)
        dist = corpus_merges(SF, n_merges=30)
        assert dist == local and len(dist) > 0

    def test_counts_vs_replayed_sql_matched_scale(self, ray_session):
        """The replayed-merge CTE (trained on the SAME corpus) reproduces
        the engine's subtoken counts — the sf0.001 twin of the sf0.01
        driver oracle."""
        import duckdb

        from data_model_ray.stages.bpe import bpe_token_counts

        words, cnts = _train_on(SF)
        merges = train_bpe(words, cnts, 30)
        passes = merge_pass_counts(words, merges)
        con = duckdb.connect()
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')"
        )
        sql = (
            f"WITH {replay_sql(merges, passes).strip()} "
            "SELECT doc_id, n_subtok FROM bpe"
        )
        odf = con.sql(sql).df().sort_values("doc_id").reset_index(drop=True)
        df = (
            bpe_token_counts(SF, n_merges=30)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert (df["doc_id"].values == odf["doc_id"].values).all()
        assert (df["n_subtok"].values == odf["n_subtok"].values).all()
        # merges actually compress: subword counts above char counts' floor
        # but below per-char tokenization
        assert df["n_subtok"].sum() > 0

    def test_pack_sequences_bpe_parity(self, ray_session):
        """BPE-budget packing == pure-python reference (same greedy walk,
        same subtoken counts)."""
        from data_model_ray.pipelines.webtext import pack_sequences

        words, cnts = _train_on(SF)
        merges = train_bpe(words, cnts, 30)
        got = (
            pack_sequences(SF, tokenizer="bpe", merges=merges)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        docs = pq.read_table(
            f"{SF}/documents.parquet", columns=["doc_id", "text"]
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        enc = BpeEncoder(merges)
        ntok = enc.count_texts(docs["text"].tolist())
        # reference greedy pack per doc_id-range of 64
        bins, poss = [], []
        cur_rng, b, fill = None, 0, 0
        for did, tc in zip(docs["doc_id"], ntok):
            rng = did // 64
            if rng != cur_rng:
                cur_rng, b, fill = rng, 0, 0
            elif fill + tc > 256:
                b, fill = b + 1, 0
            bins.append(rng * 100_000 + b)
            poss.append(fill)
            fill += tc
        assert (got["n_tokens"].values == ntok).all()
        assert (got["bin_id"].values == np.array(bins)).all()
        assert (got["bin_pos"].values == np.array(poss)).all()

    def test_doc_chunks_bpe_parity(self, ray_session):
        """BPE chunking == reference windows over the subtoken streams."""
        from data_model_ray.pipelines.webtext import doc_chunks

        words, cnts = _train_on(SF)
        merges = train_bpe(words, cnts, 30)
        got = (
            doc_chunks(SF, window=16, stride=12, tokenizer="bpe", merges=merges)
            .to_pandas()
            .sort_values(["doc_id", "chunk_id"])
            .reset_index(drop=True)
        )
        docs = pq.read_table(
            f"{SF}/documents.parquet", columns=["doc_id", "text"]
        ).to_pandas()
        enc = BpeEncoder(merges)
        ref = []
        for did, txt in zip(docs["doc_id"], docs["text"]):
            toks = [t for w in txt.split(" ") if w for t in enc.tokens(w)]
            for ci, start in enumerate(range(0, len(toks), 12)):
                sel = toks[start : start + 16]
                ref.append((did, ci, len(sel), " ".join(sel)))
        ref = pd.DataFrame(
            ref, columns=["doc_id", "chunk_id", "n_tokens", "chunk_text"]
        ).sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["doc_id", "chunk_id", "n_tokens", "chunk_text"]].astype(
                {"doc_id": np.int64, "chunk_id": np.int64, "n_tokens": np.int64}
            ),
            ref.astype(
                {"doc_id": np.int64, "chunk_id": np.int64, "n_tokens": np.int64}
            ),
        )


class TestTrainInvariance:
    def test_word_order_invariant(self):
        """Training is a pure function of the (word -> count) MULTISET —
        shuffling the distinct-word list cannot change the merge table."""
        import random

        words = ["low", "lower", "newest", "widest", "news", "wide"]
        counts = np.array([5, 2, 6, 3, 4, 1])
        base = train_bpe(words, counts, 6)
        rng = random.Random(3)
        for _ in range(5):
            idx = list(range(len(words)))
            rng.shuffle(idx)
            got = train_bpe([words[i] for i in idx], counts[idx], 6)
            assert got == base

    def test_encoder_matches_apply(self):
        enc = BpeEncoder([("e", "s"), ("es", "t")])
        for w in ["newest", "est", "set", "s"]:
            assert enc.tokens(w) == apply_merges(w, enc.merges)
            assert enc.token_count(w) == len(enc.tokens(w))
