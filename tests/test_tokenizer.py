"""Unit tests for operators/tokenizer — real BPE train + apply.

Pinned against hand-computed merges on the classic Sennrich-style
corpus (not a second implementation of the same loop): the first
merges of {low ×5, lowest ×2, newer ×6, wider ×3} are derivable by
hand, and the apply path is checked symbol by symbol."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_scripts_spark.operators.tokenizer import (
    EOW,
    bpe_encode,
    encode_word,
    train_bpe,
    train_bpe_from_frequencies,
    word_frequencies,
)

CORPUS = [("low", 5), ("lowest", 2), ("newer", 6), ("wider", 3)]


def test_first_merges_hand_computed():
    # pair counts over {low:5, lowest:2, newer:6, wider:3}:
    # ('e','r') appears in newer(6)+wider(3)=9 — the unique max.
    # After merging 'er': ('er','</w>') also 9; tie-break order is
    # (-count, pair) so ('e','r') < ('er','</w>') lexicographically
    # is irrelevant (no tie: first iteration has ('e','r')=9 vs
    # ('r','</w>')=9 — TIE, and ('e','r') < ('r','</w>') wins).
    merges = train_bpe_from_frequencies(CORPUS, num_merges=3)
    assert merges[0] == ("e", "r")
    assert merges[1] == ("er", EOW)
    # next: 'low' pairs — ('l','o') = 5+2 = 7, ('o','w') = 7,
    # ('n','e') = 6, ('w','i') = 3 … tie ('l','o') vs ('o','w') →
    # lexicographic min is ('l','o')
    assert merges[2] == ("l", "o")


def test_encode_word_follows_rank_order():
    # with exactly the first two merges, 'newer' ends in the 'er</w>'
    # unit (deeper training keeps merging: w+er</w>, then e+wer</w>)
    merges = train_bpe_from_frequencies(CORPUS, num_merges=2)
    ranks = {m: i for i, m in enumerate(merges)}
    toks = encode_word("newer", ranks)
    assert toks == ["n", "e", "w", "er" + EOW]
    # unseen characters pass through as single symbols
    merges6 = train_bpe_from_frequencies(CORPUS, num_merges=6)
    ranks6 = {m: i for i, m in enumerate(merges6)}
    assert encode_word("zq", ranks6) == ["z", "q", EOW]
    assert "".join(encode_word("newer", ranks6)) == "newer" + EOW


def test_encode_word_reconstructs_any_word():
    merges = train_bpe_from_frequencies(CORPUS, num_merges=10)
    ranks = {m: i for i, m in enumerate(merges)}
    for w in ["low", "lowest", "newer", "wider", "lower", "news", "x"]:
        assert "".join(encode_word(w, ranks)) == w + EOW


def test_training_is_deterministic():
    a = train_bpe_from_frequencies(CORPUS, num_merges=8)
    b = train_bpe_from_frequencies(list(reversed(CORPUS)), num_merges=8)
    assert a == b


def test_word_frequencies_bounded_and_ordered(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat"), (3, "the. the!")],
        "doc_id long, text string",
    )
    freqs = word_frequencies(docs, max_words=3)
    assert freqs[0] == ("the", 4)  # punctuation split off by pretokenizer
    assert len(freqs) == 3


def test_bpe_encode_end_to_end(spark):
    rows = (
        [(i, "low " * 5) for i in range(3)]
        + [(100 + i, "newer wider") for i in range(3)]
        + [(200, None), (201, "")]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(docs, num_merges=10)
    out = {r["doc_id"]: r for r in bpe_encode(docs, merges).collect()}
    # reconstruction: joined tokens spell the pre-tokenized words
    assert "".join(out[0]["tokens"]) == ("low" + EOW) * 5
    assert out[0]["n_tokens"] == len(out[0]["tokens"])
    assert out[200]["tokens"] == [] and out[200]["n_tokens"] == 0
    assert out[201]["tokens"] == []
    # trained merges compress: fewer tokens than characters
    assert out[100]["n_tokens"] < len("newerwider") + 2


def test_bpe_encode_zero_exchanges(spark):
    docs = spark.createDataFrame(
        [(1, "low lower lowest")], "doc_id long, text string"
    )
    merges = train_bpe_from_frequencies(CORPUS, num_merges=5)
    plan = (
        bpe_encode(docs, merges)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
