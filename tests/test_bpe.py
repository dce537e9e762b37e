"""BPE vocabulary training + distributed encoding (operators/bpe.py)."""

import pytest

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.functions.text import (
    bpe_token_count,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (
    bpe as B,
)
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark):
    # The classic BPE teaching corpus: "low"-family words with skewed
    # frequencies so the merge order is known a priori.
    rows = (
        [("low",)] * 5
        + [("lower",)] * 2
        + [("newest",)] * 6
        + [("widest",)] * 3
    )
    return spark.createDataFrame(rows, "text string")


def test_word_frequencies_counts(corpus):
    wf = {r["word"]: r["freq"] for r in B.word_frequencies(corpus).collect()}
    assert wf == {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_train_bpe_learns_expected_merges(corpus):
    merges, dropped = B.train_bpe(corpus, num_merges=4)
    assert dropped == 0
    # Pair counts on the raw corpus: ("e","s") and ("s","t") both appear in
    # newest+widest (6+3=9); the lexicographic tie-break picks ("e","s")
    # first, then ("es","t") at 9, then ("est" merges exhausted) the
    # l-family pairs ("l","o") at 7.
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert ("l", "o") in merges[2:]


def test_train_bpe_deterministic(corpus):
    m1, _ = B.train_bpe(corpus, num_merges=6)
    m2, _ = B.train_bpe(corpus.repartition(7), num_merges=6)
    assert m1 == m2


def test_train_bpe_cap_reports_drops(corpus):
    merges, dropped = B.train_bpe(corpus, num_merges=2, max_words=2)
    assert dropped == 2  # 4 distinct words, top-2 kept
    # Trained only on newest(6)+low(5): first merge is still ("e","s").
    assert merges[0] == ("e", "s")


def test_train_bpe_hard_cap_raises(corpus):
    with pytest.raises(ValueError, match="hard cap"):
        B.train_bpe(corpus, max_words=B.MAX_WORDS_HARD_CAP + 1)


def test_merges_df_shape(spark, corpus):
    merges, _ = B.train_bpe(corpus, num_merges=3)
    mdf = B.bpe_merges_df(spark, merges)
    assert mdf.columns == ["rank", "left", "right", "merged"]
    rows = mdf.orderBy("rank").collect()
    assert [r["rank"] for r in rows] == [0, 1, 2]
    assert all(r["merged"] == r["left"] + r["right"] for r in rows)


def test_encode_compresses_vs_char_level(spark, corpus):
    merges, _ = B.train_bpe(corpus, num_merges=8)
    enc = B.bpe_encode(corpus, merges)
    out = enc.select(
        "text",
        "bpe_tokens",
        F.length("text").alias("chars"),
        bpe_token_count("text").alias("pretokens"),
    ).collect()
    for r in out:
        # Learned tokens: never more than character count, never fewer
        # than the pre-token count, and strictly compressed for the
        # high-frequency words the merges were trained on.
        assert r["pretokens"] <= r["bpe_tokens"] <= r["chars"]
    full = {r["text"]: r["bpe_tokens"] for r in out}
    # "newest" (freq 6): est+new fully merged within 8 merges -> <=2 tokens.
    assert full["newest"] <= 2
    assert full["low"] <= 2


def test_encode_no_merges_is_char_count(corpus):
    out = B.bpe_encode(corpus, []).select("text", "bpe_tokens").collect()
    for r in out:
        assert r["bpe_tokens"] == len(r["text"])


def test_word_frequencies_plan_is_scan_shaped(spark, sf_dir):
    """The corpus-wide pass must be the 100 TB shape: column-pruned scan
    (only `text` read), native explode, map-side partial_count BEFORE the
    single word-keyed exchange, no Python anywhere in the counting path."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.plans import (
        explain as E,
    )
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.tables import (
        load_table,
    )

    wf = B.word_frequencies(load_table(spark, sf_dir, "documents"))
    assert E.read_schema_columns(wf) == [["text"]]
    assert E.python_eval_nodes(wf) == []
    assert E.num_exchanges(wf) == 1
    assert "partial_count" in E.plan_string(wf, "simple")


def test_train_bpe_incremental_matches_naive(spark, sf_dir):
    """The incremental trainer (pair->word index + lazy heap, VERDICT r03
    #1) must learn the BIT-IDENTICAL merge sequence the naive
    rescan-everything loop did — same counts, same lexicographic
    tie-break — on a real fixture corpus."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.tables import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    num_merges, max_words = 100, 100_000
    got, _ = B.train_bpe(docs, num_merges=num_merges, max_words=max_words)

    rows = (
        B.word_frequencies(docs)
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(max_words)
        .collect()
    )
    words = [(list(r["word"]), int(r["freq"])) for r in rows]
    want = []
    for _ in range(num_merges):  # the pre-r04 naive loop, verbatim
        counts = B._pair_counts(words)
        if not counts:
            break
        best_count = max(counts.values())
        best_pair = min(p for p, c in counts.items() if c == best_count)
        if best_count < 2:
            break
        want.append(best_pair)
        joined = best_pair[0] + best_pair[1]
        words = [
            (B._merge_word(s, best_pair, joined), f) if best_pair[0] in s else (s, f)
            for s, f in words
        ]
    assert got == want
    # The promoted reference twin (bpe_vocab_train's ref_diff_rows
    # witness runs it) must equal the verbatim pre-r04 loop above too.
    words0 = [
        (list(r["word"]), int(r["freq"]))
        for r in B.word_frequencies(docs)
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(max_words)
        .collect()
    ]
    assert B.merges_from_stats_reference(words0, num_merges) == want
    assert B.merges_from_stats(words0, num_merges) == want


def test_tokenize_pack_pipeline_conserves_tokens(spark):
    """The composed text->BPE->packed-windows query: per-shard packed
    token totals must equal the sum of the per-doc BPE counts (nothing
    dropped or double-counted between the stages)."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark import (
        queries as Q,
    )
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (
        bpe as BP,
    )
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.tables import (
        load_table,
    )
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    packed = Q.QUERIES["tokenize_pack_pipeline"](spark, sf_dir)
    per_shard = {
        r["shard"]: r["t"]
        for r in packed.groupBy("shard").agg(F.sum("tokens").alias("t")).collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    merges, _ = BP.train_bpe(docs, num_merges=48, max_words=100_000)
    want = {
        r["shard"]: r["t"]
        for r in BP.bpe_encode(docs, merges, out_col="n_bpe")
        .groupBy((F.col("doc_id") % 8).alias("shard"))
        .agg(F.sum("n_bpe").alias("t"))
        .collect()
    }
    assert per_shard == want and sum(per_shard.values()) > 0


def _fixed_formula_merges():
    """The bpe_encode_fixed_ranks merge table (queries/curation.py): every [a-z]
    letter pair (ranks 0..675), then every (two-letter, letter)
    extension (ranks 676..18251) — level-1 ranks all sort below level-2,
    so greedy ORDER is what the oracle row actually checks."""
    merges = [
        (chr(97 + i), chr(97 + j)) for i in range(26) for j in range(26)
    ]
    merges += [
        (chr(97 + i) + chr(97 + j), chr(97 + k))
        for i in range(26)
        for j in range(26)
        for k in range(26)
    ]
    return merges


def test_encode_fixed_ranks_greedy_order_pins(spark):
    # Hand-derived greedy outcomes under the formula table:
    # "abz": (a,b)=rank 1 beats (b,z)=51 -> [ab,z]; (ab,z)=727 -> 1 tok.
    # "zab": (a,b)=1 beats (z,a)=650 -> [z,ab]; (z,ab) is
    #        (1-letter, 2-letter) = NOT in the table -> 2 tokens —
    #        the order-dependence the mechanism check rides on.
    # "aaa": equal ranks at i=0,1 -> LEFTMOST -> [aa,a] -> (aa,a) -> 1.
    # "abab": [ab,a,b] (leftmost rank-1) -> [ab,ab] -> no (2,2) rule -> 2.
    # " ab": space is not merge-eligible -> [' ', ab] -> 2 tokens.
    df = spark.createDataFrame(
        [("abz",), ("zab",), ("aaa",), ("abab",), (" ab",)], "text string"
    )
    out = {
        r["text"]: r["bpe_tokens"]
        for r in B.bpe_encode(df, _fixed_formula_merges()).collect()
    }
    assert out == {"abz": 1, "zab": 2, "aaa": 1, "abab": 2, " ab": 2}


def test_bpe_encode_empty_doc_emits_zero(spark):
    """Every input document keeps a row — an empty/whitespace-only text
    encodes to 0 tokens, not a dropped row (the fixed-ranks oracle
    mirrors this with its LEFT JOIN back to documents)."""
    docs = spark.createDataFrame(
        [(1, "ab cd"), (2, ""), (3, "zz")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["bpe_tokens"]
        for r in B.bpe_encode(docs, [("a", "b"), ("c", "d")]).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[2] == 0
    assert out[1] == 3  # 'ab' -> 1 tok; ' cd' -> [' ', 'cd'] -> 2 toks
