"""Training-data selection operators (operators/selection.py): hashed
n-gram Moore-Lewis/DSIR importance scoring and the fastText-style hashed
linear quality classifier.

Oracle parity of the two driver rows (dsir_select,
quality_classifier_fixed_weights) is checked by
scripts/check_correctness.py; these tests pin the operator semantics on
handcrafted rows (hand-computable expected values via an independent
python/numpy reference that reimplements the math from the definitions,
not by calling the operators), the distributed gradient against a numpy
full-batch reference, and the planted-separability CI floor for
training."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyspark.sql.functions as F
import pytest

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (
    selection as S,
)


def _bucket(feature: str, m: int) -> int:
    """Python reference of the cross-engine 60-bit md5-prefix hash."""
    return int(hashlib.md5(feature.encode("utf-8")).hexdigest()[:15], 16) % m


def _feats(text: str, bigrams: bool) -> list[str]:
    toks = [t for t in text.split() if t]
    out = list(toks)
    if bigrams:
        out += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return out


def _ref_ce_diff(rows, target_ids, m, bigrams):
    """Independent reference of cross_entropy_diff_scores."""
    ct: dict[int, int] = {}
    cs: dict[int, int] = {}
    per_doc: dict[int, dict[int, int]] = {}
    for doc_id, text in rows:
        tf: dict[int, int] = {}
        for f in _feats(text, bigrams):
            tf[_bucket(f, m)] = tf.get(_bucket(f, m), 0) + 1
        per_doc[doc_id] = tf
        for b, c in tf.items():
            cs[b] = cs.get(b, 0) + c
            if doc_id in target_ids:
                ct[b] = ct.get(b, 0) + c
    tt, ts = sum(ct.values()), sum(cs.values())
    out = {}
    for doc_id, tf in per_doc.items():
        n = sum(tf.values())
        score = 0
        for b, c in tf.items():
            bits_s = ((ts + m) // (cs.get(b, 0) + 1)).bit_length() - 1
            bits_t = ((tt + m) // (ct.get(b, 0) + 1)).bit_length() - 1
            score += c * (bits_s - bits_t)
        mean = math.floor(score * 1000.0 / n) if n else 0
        out[doc_id] = (n, score, mean)
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "alpha beta gamma alpha"),
        (2, "alpha beta beta"),
        (3, "delta epsilon zeta delta epsilon"),
        (4, "zeta zeta eta theta"),
        (5, ""),  # no tokens: scores 0 / bias exactly
        (6, "alpha delta"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return rows, df


class TestCrossEntropyDiff:
    def test_matches_reference(self, corpus):
        rows, df = corpus
        target = {1, 2}  # the "alpha beta" domain
        got = {
            r["doc_id"]: (r["n_feats"], r["score_bits"], r["mean_milli"])
            for r in S.cross_entropy_diff_scores(
                df, F.col("doc_id").isin(*target), m=64, bigrams=True
            ).collect()
        }
        assert got == _ref_ce_diff(rows, target, 64, True)

    def test_empty_doc_scores_zero(self, corpus):
        _, df = corpus
        got = {
            r["doc_id"]: r
            for r in S.cross_entropy_diff_scores(
                df, F.col("doc_id") <= 2, m=64
            ).collect()
        }
        assert (
            got[5]["n_feats"],
            got[5]["score_bits"],
            got[5]["mean_milli"],
        ) == (0, 0, 0)

    def test_target_docs_rank_above_offdomain(self, corpus):
        """The selection SIGNAL: with disjoint vocabularies, in-domain
        docs must outscore off-domain docs (the Moore-Lewis keep set)."""
        rows, df = corpus
        scores = {
            r["doc_id"]: r["mean_milli"]
            for r in S.cross_entropy_diff_scores(
                df, F.col("doc_id").isin(1, 2), m=64, bigrams=True
            ).collect()
        }
        assert min(scores[1], scores[2]) > max(scores[3], scores[4])

    def test_topk_flag_exact_k(self, corpus):
        _, df = corpus
        out = S.dsir_select(df, F.col("doc_id").isin(1, 2), k=3, m=64)
        sel = {r["doc_id"] for r in out.collect() if r["selected"]}
        assert len(sel) == 3 and {1, 2} <= sel

    def test_gumbel_resampling_seeded(self, corpus):
        """DSIR's Gumbel-top-k mode: exactly k selected, same seed ->
        same set (coordination-free determinism), DIFFERENT seeds draw
        genuinely different samples (the inert-seed regression: an
        additive seed shifted every doc's u uniformly and every seed
        returned the identical set), negative seeds are valid (u stays
        in (0,1) — no NULL keys silently shrinking the selection), and
        the sample is importance-BIASED across seeds."""
        _, df = corpus
        tgt = F.col("doc_id").isin(1, 2)
        draws = []
        for seed in range(12):
            sel = {
                r["doc_id"]
                for r in S.dsir_select(
                    df, tgt, k=2, m=64, gumbel_seed=seed
                ).collect()
                if r["selected"]
            }
            assert len(sel) == 2
            again = {
                r["doc_id"]
                for r in S.dsir_select(
                    df, tgt, k=2, m=64, gumbel_seed=seed
                ).collect()
                if r["selected"]
            }
            assert sel == again, "same seed must reproduce the sample"
            draws.append(frozenset(sel))
        assert len(set(draws)) > 1, (
            draws,
            "seeds never changed the draw — the seed is inert",
        )
        neg = {
            r["doc_id"]
            for r in S.dsir_select(
                df, tgt, k=2, m=64, gumbel_seed=-7
            ).collect()
            if r["selected"]
        }
        assert len(neg) == 2, "negative seed must not NULL the keys"
        from collections import Counter

        counts = Counter(i for d in draws for i in d)
        in_domain = counts[1] + counts[2]
        off_domain = counts[3] + counts[4]
        assert in_domain > off_domain, (counts, "importance bias lost")


class TestScoreHashedLinear:
    def test_fixed_integer_weights_reference(self, corpus):
        rows, df = corpus
        A, B, MOD, OFF, BIAS = 2654435761, 40503, 2001, 1000, -3000

        def w(b):
            return ((b * F.lit(A) + F.lit(B)) % F.lit(MOD)) - F.lit(OFF)

        got = {
            r["doc_id"]: (r["n_tokens"], r["logit"])
            for r in S.score_hashed_linear(
                df, w, m=256, bias=BIAS
            ).collect()
        }
        for doc_id, text in rows:
            toks = [t for t in text.split() if t]
            logit = BIAS + sum(
                ((_bucket(t, 256) * A + B) % MOD) - OFF for t in toks
            )
            assert got[doc_id] == (len(toks), logit), doc_id

    def test_float_weights_match_numpy(self, corpus):
        rows, df = corpus
        rng = np.random.default_rng(7)
        w = rng.normal(size=64)
        got = {
            r["doc_id"]: (r["n_tokens"], r["logit"])
            for r in S.score_hashed_linear(df, w, m=64, bias=0.25).collect()
        }
        for doc_id, text in rows:
            toks = [t for t in text.split() if t]
            dot = sum(w[_bucket(t, 64)] for t in toks) + 0.25
            assert got[doc_id][0] == len(toks)
            # sum order may differ; micro-floor can differ by at most 1 ulp
            # worth — allow the adjacent integer.
            assert abs(got[doc_id][1] - math.floor(dot * 1e6)) <= 1, doc_id

    def test_empty_doc_scores_exact_bias(self, corpus):
        _, df = corpus
        got = {
            r["doc_id"]: r["logit"]
            for r in S.score_hashed_linear(
                df, lambda b: b, m=16, bias=-7
            ).collect()
        }
        assert got[5] == -7

    def test_weight_shape_guard(self, corpus):
        _, df = corpus
        with pytest.raises(ValueError, match="shape"):
            S.score_hashed_linear(df, np.zeros(8), m=16)

    def test_xx64_hash_mode(self, corpus):
        """The production hash family: same n_tokens, deterministic
        across calls, and a rejected unknown family is loud.  (Bucket
        values differ from md5 by design — the md5 twin carries the
        oracle proof, the minhash convention.)"""
        _, df = corpus
        a = {
            r["doc_id"]: (r["n_tokens"], r["logit"])
            for r in S.score_hashed_linear(
                df, lambda b: b, m=64, hash_fn="xx64"
            ).collect()
        }
        b = {
            r["doc_id"]: (r["n_tokens"], r["logit"])
            for r in S.score_hashed_linear(
                df, lambda b: b, m=64, hash_fn="xx64"
            ).collect()
        }
        assert a == b
        md5 = {
            r["doc_id"]: r["n_tokens"]
            for r in S.score_hashed_linear(
                df, lambda b: b, m=64, hash_fn="md5"
            ).collect()
        }
        assert {k: v[0] for k, v in a.items()} == md5  # counts invariant
        with pytest.raises(ValueError, match="hash_fn"):
            S.score_hashed_linear(df, lambda b: b, m=64, hash_fn="crc")


def _ref_grad(rows, labels, m, w, b):
    """Numpy full-batch reference gradient of mean logistic loss."""
    g = np.zeros(m)
    gb = 0.0
    loss = 0.0
    n_docs = 0
    for (doc_id, text), y in zip(rows, labels):
        toks = [t for t in text.split() if t]
        if not toks:
            continue  # docs with no buckets are absent from the tf table
        x = np.zeros(m)
        for t in toks:
            x[_bucket(t, m)] += 1.0
        x /= len(toks)
        z = float(w @ x) + b
        p = 0.5 * (1.0 + np.tanh(0.5 * z))  # the operator's stable form
        loss += max(-z, 0.0) + np.log1p(np.exp(-abs(z))) + (1 - y) * z
        g += (p - y) * x
        gb += p - y
        n_docs += 1
    return g / n_docs, gb / n_docs, loss / n_docs


class TestTrainLogreg:
    def test_one_step_matches_numpy_gradient(self, spark):
        rows = [
            (1, "aa bb cc"),
            (2, "aa aa dd"),
            (3, "ee ff gg hh"),
            (4, "ee ee ff"),
        ]
        labels = [1, 1, 0, 0]
        df = spark.createDataFrame(
            [(i, t, y) for (i, t), y in zip(rows, labels)],
            "doc_id bigint, text string, y int",
        )
        m, lr = 32, 0.5
        w, b, losses = S.train_logreg_hashed(
            df, "y", m=m, iters=1, lr=lr, l2=0.0
        )
        g_ref, gb_ref, loss_ref = _ref_grad(
            rows, labels, m, np.zeros(m), 0.0
        )
        np.testing.assert_allclose(w, -lr * g_ref, atol=1e-12)
        assert abs(b - (-lr * gb_ref)) < 1e-12
        assert abs(losses[0] - loss_ref) < 1e-12

    def test_loss_decreases_and_separates_planted(self, spark):
        """CI floor: a linearly-separable planted corpus (disjoint
        vocabularies per class) must be classified >= 0.95 by the
        trained weights through the real serving path."""
        rng = np.random.default_rng(11)
        good_vocab = [f"g{i}" for i in range(30)]
        bad_vocab = [f"b{i}" for i in range(30)]
        rows = []
        for i in range(120):
            y = i % 2
            vocab = good_vocab if y else bad_vocab
            text = " ".join(rng.choice(vocab, size=12))
            rows.append((i, text, y))
        df = spark.createDataFrame(
            rows, "doc_id bigint, text string, y int"
        )
        w, b, losses = S.train_logreg_hashed(
            df, "y", m=128, iters=40, lr=8.0, l2=0.0
        )
        assert losses == sorted(losses, reverse=True), "loss must descend"
        assert losses[-1] < 0.5 * losses[0]
        scored = S.score_hashed_linear(
            df, w, m=128, bias=b, score_col="s"
        )
        joined = scored.join(df.select("doc_id", "y"), "doc_id")
        acc = joined.select(
            F.avg(
                ((F.col("s") >= 0).cast("int") == F.col("y")).cast("double")
            )
        ).first()[0]
        assert acc >= 0.95, f"planted separation failed: acc={acc}"

    def test_empty_corpus_raises(self, spark):
        df = spark.createDataFrame([], "doc_id bigint, text string, y int")
        with pytest.raises(ValueError, match="no labeled"):
            S.train_logreg_hashed(df, "y", m=16, iters=1)


class TestXxh64PythonTwin:
    def test_matches_spark_xxhash64(self, spark):
        """The from-spec pure-Python XXH64 (the Gumbel witness's hash)
        equals Spark's xxhash64 expression for longs, for int literals
        folded in via seed-chaining, and for the doc-id+seed chain the
        sampler actually uses."""
        ids = [0, 1, 7, -3, 42, 123456789012345, -987654321,
               2**62, -(2**62), 2**63 - 1, -(2**63)]
        df = spark.createDataFrame([(i,) for i in ids], "id bigint")
        rows = df.select(
            "id",
            F.xxhash64("id").alias("h1"),
            F.xxhash64("id", F.lit(7)).alias("h2"),
            F.xxhash64("id", F.lit(-12345)).alias("h3"),
        ).collect()
        for r in rows:
            base = S.xxh64_long_py(r["id"], 42)
            assert base == r["h1"]
            assert S.xxh64_int_py(7, base) == r["h2"]
            assert S.xxh64_int_py(-12345, base) == r["h3"]

    def test_gumbel_key_matches_to_ulp_and_flags_exactly(self, corpus):
        """gumbel_rank_key_py reproduces the Spark ranking key to within
        float-log ulp noise, and the top-k SET under the Python keys is
        identical (the dsir_select_gumbel witness contract)."""
        _, df = corpus
        tgt = F.col("doc_id").isin(1, 2)
        out = S.dsir_select(
            df, tgt, k=2, m=64, gumbel_seed=11, emit_key=True
        ).collect()
        for r in out:
            ref = S.gumbel_rank_key_py(r["doc_id"], r["mean_milli"], 11)
            assert abs(ref - r["rank_key"]) < 1e-9
        ref_sorted = sorted(
            out,
            key=lambda r: (
                S.gumbel_rank_key_py(r["doc_id"], r["mean_milli"], 11),
                -r["doc_id"],
            ),
            reverse=True,
        )
        ref_sel = {r["doc_id"] for r in ref_sorted[:2]}
        assert ref_sel == {r["doc_id"] for r in out if r["selected"]}
