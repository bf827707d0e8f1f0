"""Gopher quality/repetition signals + sequence packing + domain mixing."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators import quality, training


class TestGopherSignals:
    def test_signals_and_verdict(self, spark):
        good = "the quick brown fox jumps over to the lazy dog and " * 6  # 66 words
        short = "too short"
        symbols = ("the and of have " + "# " * 20) * 8  # symbol-heavy, 192 words
        df = spark.createDataFrame(
            [(1, good), (2, short), (3, symbols)], "doc_id long, text string"
        )
        out = {r.doc_id: r for r in quality.gopher_quality_signals(df).collect()}
        g = out[1]
        assert g.n_words == 66 and g.gopher_pass
        assert 3 <= g.mean_word_len <= 10 and g.n_stop_words >= 2
        assert not out[2].gopher_pass  # < 50 words
        s = out[3]
        assert s.symbol_word_ratio >= 0.1 and not s.gopher_pass

    def test_alpha_fraction(self, spark):
        df = spark.createDataFrame(
            [(1, "111 222 333 abc")], "doc_id long, text string"
        )
        r = quality.gopher_quality_signals(df).first()
        assert r.frac_alpha_words == 0.25


class TestRepetition:
    def test_top_ngram_fraction(self, spark):
        # "a b" appears 3x in 8 words -> top 2-gram covers 6/8 words
        df = spark.createDataFrame(
            [(1, "a b a b a b x y"), (2, "all words distinct here now")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in quality.top_ngram_fraction(df, n=2).collect()}
        assert out[1].n_words == 8 and out[1].top_ngram_count == 3
        assert out[1].top_ngram_frac == 0.75
        assert out[2].top_ngram_count == 1

    def test_duplicate_ngram_fraction(self, spark):
        # 10 words -> 6 windows of 5; "v w x y z" repeats -> 1 duplicate window
        df = spark.createDataFrame(
            [(1, "v w x y z v w x y z"), (2, "a b c d e f g h i j")],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: r for r in quality.duplicate_ngram_fraction(df, n=5).collect()
        }
        assert out[1].dup_ngram_frac == round(1 / 6, 4)
        assert out[2].dup_ngram_frac == 0.0


class TestPackSequences:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        rows = [
            ("d1", list(range(10))),
            ("d2", list(range(100, 107))),
            ("d3", list(range(200, 230))),  # longer than seq_len -> chunks
            ("d4", list(range(300, 303))),
        ]
        return spark.createDataFrame(
            rows, "doc_id string, tokens array<int>"
        ).repartition(1)

    def test_packing_conserves_tokens(self, spark, docs):
        out = training.pack_sequences(docs, seq_len=16).collect()
        total_in = sum(len(r.tokens) for r in docs.collect())
        total_real = sum(r.n_real_tokens for r in out)
        assert total_real == total_in
        for r in out:
            assert len(r.tokens) == 16
            assert r.n_pad == 16 - r.n_real_tokens
        # only the final (tail) sequence may be padded
        assert sum(1 for r in out if r.n_pad > 0) <= 1

    def test_long_doc_chunks_and_order(self, spark, docs):
        out = sorted(
            training.pack_sequences(docs, seq_len=16).collect(),
            key=lambda r: int(r.seq_id.split("-")[1]),
        )
        flat = [t for r in out for t in r.tokens[: r.n_real_tokens]]
        # docs packed in sorted doc_id order, each doc's tokens contiguous
        expect = (
            list(range(10)) + list(range(100, 107)) + list(range(200, 230))
            + list(range(300, 303))
        )
        assert flat == expect
        # d3 (30 tokens) spans multiple sequences
        carrying = [r for r in out if "d3" in r.doc_ids]
        assert len(carrying) >= 2

    def test_eos_and_determinism(self, spark, docs):
        a = training.pack_sequences(docs, seq_len=16, eos_token=-1).collect()
        b = training.pack_sequences(docs, seq_len=16, eos_token=-1).collect()
        assert sorted(map(str, a)) == sorted(map(str, b))
        flat = [
            t
            for r in sorted(a, key=lambda r: int(r.seq_id.split("-")[1]))
            for t in r.tokens[: r.n_real_tokens]
        ]
        assert flat.count(-1) == 4  # one eos per doc


class TestStratifiedMix:
    def test_mix_fractions(self, spark):
        rows = [(f"d{i}", "web", 100) for i in range(50)] + [
            (f"c{i}", "code", 100) for i in range(50)
        ]
        df = spark.createDataFrame(rows, "doc_id string, source string, n_tok int")
        # budget 2000 tokens, 3:1 web:code -> web target 1500/5000=0.3, code 500/5000=0.1
        out = training.stratified_token_mix(
            df, {"web": 3.0, "code": 1.0}, token_budget=2000, seed=7
        )
        got = {r[0]: r[1] for r in out.groupBy("source").count().collect()}
        # Bernoulli sampling: expect ~15 web / ~5 code; allow wide noise band
        assert 5 <= got.get("web", 0) <= 28
        assert 1 <= got.get("code", 0) <= 14
        # deterministic for a fixed seed
        again = training.stratified_token_mix(
            df, {"web": 3.0, "code": 1.0}, token_budget=2000, seed=7
        )
        assert sorted(r.doc_id for r in out.collect()) == sorted(
            r.doc_id for r in again.collect()
        )

    def test_oversubscribed_caps_at_one(self, spark):
        df = spark.createDataFrame(
            [("a", "rare", 10), ("b", "rare", 10)], "doc_id string, source string, n_tok int"
        )
        out = training.stratified_token_mix(df, {"rare": 1.0}, token_budget=10_000)
        assert out.count() == 2  # fraction capped at 1.0


class TestPackScaleProperties:
    def test_multi_partition_conservation(self, spark):
        """Packing is per-partition: N partitions pack independently, total
        real tokens are conserved, per-partition tail waste <= 1 padded
        sequence, and seq_ids are globally unique."""
        import random

        rng = random.Random(99)
        rows = [
            (f"d{i:04d}", [rng.randrange(1000) for _ in range(rng.randrange(1, 70))])
            for i in range(300)
        ]
        df = spark.createDataFrame(
            rows, "doc_id string, tokens array<int>"
        ).repartition(8)
        out = training.pack_sequences(df, seq_len=64).collect()
        assert sum(r.n_real_tokens for r in out) == sum(len(t) for _, t in rows)
        assert all(len(r.tokens) == 64 for r in out)
        padded = [r for r in out if r.n_pad > 0]
        assert len(padded) <= 8  # at most one tail per partition
        ids = [r.seq_id for r in out]
        assert len(ids) == len(set(ids))


class TestLangId:
    def test_planted_docs_classify_correctly(self, spark):
        """Every planted fr/de/es/it/en doc must classify to its true
        language (the r4 english-density heuristic could not do this)."""
        from opentelemetry_collector_contrib_spark.plans.catalog import LANG_ID_PLANTS

        df = spark.createDataFrame(LANG_ID_PLANTS, "doc_id long, text string, lang string")
        out = df.withColumn("pred", quality.lang_id(F.col("text"))).collect()
        for r in out:
            assert r.pred == r.lang, (r.lang, r.pred, r.text)

    def test_no_hits_is_und(self, spark):
        df = spark.createDataFrame([(1, "zzz qqq xxx 123")], "doc_id long, text string")
        assert df.select(quality.lang_id(F.col("text")).alias("p")).first().p == "und"

    def test_tie_break_is_deterministic(self, spark):
        # 'la' hits both fr and es profiles equally -> first in LANG_ORDER wins (fr)
        df = spark.createDataFrame([(1, "la la la")], "doc_id long, text string")
        assert df.select(quality.lang_id(F.col("text")).alias("p")).first().p == "fr"


class TestDeterministicMix:
    def test_hash_mode_is_partitioning_invariant(self, spark):
        rows = [(i, f"src{i % 3}", 100 + i) for i in range(300)]
        df = spark.createDataFrame(rows, "doc_id long, source string, n_tok int")
        w = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
        a = training.stratified_token_mix(df.repartition(1), w, 9000, id_col="doc_id")
        b = training.stratified_token_mix(df.repartition(7), w, 9000, id_col="doc_id")
        ids_a = sorted(r.doc_id for r in a.collect())
        ids_b = sorted(r.doc_id for r in b.collect())
        assert ids_a == ids_b and len(ids_a) > 0

    def test_hash_mode_hits_budget_approximately(self, spark):
        rows = [(i, "s", 10) for i in range(2000)]
        df = spark.createDataFrame(rows, "doc_id long, source string, n_tok int")
        out = training.stratified_token_mix(df, {"s": 1.0}, 10000, id_col="doc_id")
        got = out.agg(F.sum("n_tok")).first()[0]
        assert abs(got - 10000) / 10000 < 0.1  # binomial tolerance at n=2000
