"""Tokenizer-exact BPE counting (VERDICT r9 next #2): segmentation is
lossless, deterministic, matches an independent replay of the SQL
oracle's string-rewrite semantics, and the Arrow kernel agrees with a
pure-Python walk over real fixture docs."""

from __future__ import annotations

import duckdb

import pytest

from batch_processing_etl_orchestration_spark.functions.bpe import (
    bpe_token_counts,
    encode_word,
    encode_word_priority_pass,
    load_merges,
    merge_ranks,
    validate_merges,
)

SF = "/root/testdata/sf0.001"


def _fixture_words() -> list[str]:
    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT DISTINCT unnest(string_split(text, ' ')) AS w
            FROM read_parquet('{SF}/documents.parquet*') ORDER BY 1"""
    ).fetchall()
    return [r[0] for r in rows if r[0]]


def test_merges_committed_and_wellformed():
    merges = load_merges()
    assert len(merges) >= 16
    assert all(
        isinstance(a, str) and isinstance(b, str) and a and b
        for a, b in merges
    )
    # surfaces must be [a-z0-9]+ (ADVICE r10 #4): the SQL replay uses
    # ( ) as token delimiters AND interpolates surfaces into VALUES
    # string literals — a quote or paren would corrupt/inject oracle
    # SQL. validate_merges (run by load_merges) enforces it; assert
    # directly too so the committed file is covered even if loading
    # changes.
    import re

    assert all(
        re.fullmatch(r"[a-z0-9]+", a) and re.fullmatch(r"[a-z0-9]+", b)
        for a, b in merges
    )


def test_validate_merges_rejects_unsafe_surfaces():
    with pytest.raises(ValueError, match=r"\[a-z0-9\]\+"):
        validate_merges([("a'", "b")])
    with pytest.raises(ValueError, match=r"\[a-z0-9\]\+"):
        validate_merges([("a", "(b)")])
    with pytest.raises(ValueError, match=r"\[a-z0-9\]\+"):
        validate_merges([("A", "b")])


def test_validate_merges_rejects_operand_of_later_product():
    """The structural precondition for rank-dict == priority-pass:
    ('x','abc') before ('ab','c') means the later merge could create a
    fresh 'abc' the earlier pass already ran past."""
    with pytest.raises(ValueError, match="LATER"):
        validate_merges(
            [("a", "bc"), ("x", "abc"), ("a", "b"), ("ab", "c")]
        )
    # same pairs with the producer FIRST are fine
    validate_merges([("a", "b"), ("ab", "c"), ("x", "abc")])


def test_rank_dict_matches_priority_pass_reference():
    """VERDICT r10 next #3 done-criterion: the rank-dict encoder is
    bit-equal to the priority-order reference (the algorithm the SQL
    oracle replays) on the committed table — fixture vocabulary plus
    adversarial overlap/repeat words."""
    merges = load_merges()
    ranks = merge_ranks(merges)
    words = _fixture_words() + [
        "aaaa", "ababab", "zz", "q", "thethethe", "aandthe", "0a1b2c",
    ]
    for w in words:
        assert encode_word(w, ranks=ranks) == encode_word_priority_pass(
            w, merges
        ), w


def test_rank_dict_matches_priority_pass_random_tables():
    """Property check over RANDOM valid tables (seeded): generate a
    merge list bottom-up the way training does (operands always exist
    before the merge), keep only tables validate_merges accepts, and
    require bit-equality on random words."""
    import random

    rng = random.Random(20260815)
    alphabet = "abcd"
    for _ in range(25):
        tokens = list(alphabet)
        merges = []
        while len(merges) < 30:
            a, b = rng.choice(tokens), rng.choice(tokens)
            if (a, b) in merges or len(a + b) > 8:
                continue
            merges.append((a, b))
            tokens.append(a + b)
        try:
            validate_merges(merges)
        except ValueError:
            continue  # rare surface collision — not a valid table
        ranks = merge_ranks(merges)
        for _ in range(40):
            w = "".join(
                rng.choice(alphabet) for _ in range(rng.randint(1, 14))
            )
            assert encode_word(w, ranks=ranks) == (
                encode_word_priority_pass(w, merges)
            ), (w, merges)


def test_encode_lossless_on_fixture_vocab():
    merges = load_merges()
    for w in _fixture_words():
        toks = encode_word(w, merges)
        assert "".join(toks) == w
        assert all(toks)


def test_encode_matches_sql_replace_semantics():
    """The oracle applies each merge as one SQL replace over a
    '(tok)(tok)' rendering — non-overlapping, left-to-right. Replay
    that EXACT semantics with str.replace and require token-level
    identity with encode_word, on fixture words plus adversarial
    repeats (overlapping-pair cases like 'aaaa')."""
    merges = load_merges()
    words = _fixture_words() + ["aaaa", "ababab", "zz", "q"]
    for w in words:
        s = "".join(f"({c})" for c in w)
        for a, b in merges:
            s = s.replace(f"({a})({b})", f"({a}{b})")
        sql_toks = s[1:-1].split(")(") if s else []
        assert sql_toks == encode_word(w, merges), w


def test_greedy_left_to_right():
    # one merge (a,a): 'aaa' -> ['aa','a'], 'aaaa' -> ['aa','aa']
    merges = [("a", "a")]
    assert encode_word("aaa", merges) == ["aa", "a"]
    assert encode_word("aaaa", merges) == ["aa", "aa"]
    # priority order matters: (a,b) before (b,c) consumes the b
    assert encode_word("abc", [("a", "b"), ("b", "c")]) == ["ab", "c"]
    assert encode_word("abc", [("b", "c"), ("a", "b")]) == ["a", "bc"]


def test_vocab_mapping_deterministic_and_covering():
    from batch_processing_etl_orchestration_spark.functions.bpe import (
        VOCAB_BASE,
        encode_word,
        vocab,
    )

    v = vocab()
    # base chars fixed ids; merges appended in priority order,
    # first-surface-occurrence wins (both engines must agree)
    assert all(v[c] == i for i, c in enumerate(VOCAB_BASE))
    assert len(set(v.values())) == len(v)
    merges = load_merges()
    for w in _fixture_words():
        for t in encode_word(w, merges):
            assert t in v, t  # every emitted token has an id


def test_encode_ids_positions(spark):
    from batch_processing_etl_orchestration_spark.functions.bpe import (
        bpe_encode_ids,
        vocab,
    )

    df = spark.createDataFrame(
        [(0, "the fast"), (97, ""), (194, None)],
        "doc_id LONG, text STRING",
    )
    rows = sorted(
        (r["doc_id"], r["word_pos"], r["tok_pos"], r["token_id"])
        for r in bpe_encode_ids(df).collect()
    )
    v = vocab()
    merges = load_merges()
    want = []
    for wpos, w in ((1, "the"), (2, "fast")):
        for tpos, t in enumerate(encode_word(w, merges), start=1):
            want.append((0, wpos, tpos, v[t]))
    assert rows == sorted(want)  # empty/NULL docs emit nothing


def test_kernel_zero_token_docs(spark):
    """Empty/NULL/whitespace-only texts count as (0, 0) and are never
    dropped — the oracle mirrors this with LEFT JOIN + COALESCE, so a
    regenerated corpus containing an empty doc cannot flip the
    attestation (review r10)."""
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, " "), (4, "the fast")],
        "doc_id LONG, text STRING",
    )
    got = {
        r["doc_id"]: (r["ws_tokens"], r["bpe_tokens"])
        for r in bpe_token_counts(df).collect()
    }
    assert got[1] == (0, 0) and got[2] == (0, 0) and got[3] == (0, 0)
    assert got[4][0] == 2 and got[4][1] >= 2


def test_kernel_passthrough_source(spark):
    from batch_processing_etl_orchestration_spark.tables import load_table

    d = load_table(spark, SF, "documents")
    out = bpe_token_counts(d, passthrough=("source",))
    assert out.columns == ["doc_id", "source", "ws_tokens", "bpe_tokens"]
    assert out.where("source IS NULL").count() == 0


def test_kernel_matches_pure_python(spark):
    from batch_processing_etl_orchestration_spark.tables import load_table

    merges = load_merges()
    d = load_table(spark, SF, "documents")
    got = {
        r["doc_id"]: (r["ws_tokens"], r["bpe_tokens"])
        for r in bpe_token_counts(d).collect()
    }
    memo: dict[str, int] = {}
    for row in d.select("doc_id", "text").collect():
        words = [w for w in (row["text"] or "").split(" ") if w]
        want_bpe = 0
        for w in words:
            if w not in memo:
                memo[w] = len(encode_word(w, merges))
            want_bpe += memo[w]
        assert got[row["doc_id"]] == (len(words), want_bpe)
    assert len(got) == d.count()
    # the tokenizer budget must differ from the whitespace proxy
    # somewhere, or the operator attests nothing
    assert any(ws != bpe for ws, bpe in got.values())


def _synthetic_merges(n: int, alphabet: str = "abcd") -> list:
    """A VALID n-merge table BPE-shaped by construction: every
    generation pairs the previous generation's products with base
    chars, so operands always precede their producers and products
    strictly grow — validate_merges holds."""
    merges = []
    gen = list(alphabet)
    while len(merges) < n:
        nxt = []
        for x in gen:
            for c in alphabet:
                if len(merges) >= n:
                    break
                merges.append((x, c))
                nxt.append(x + c)
        gen = nxt
    return merges


def test_encoder_flat_cost_at_100k_merges():
    """VERDICT r10 next #3 done-criterion: per-word encode cost must be
    INDEPENDENT of the merge-table size. Deterministic operation count
    instead of wall clock (ADVICE r11 #3 — timing ratios flake under
    CI load): instrument ranks.get via a counting dict subclass and
    assert the lookup count under a synthetic 100k-merge table stays
    within the table-size-free O(|word|^2) bound — each merge round
    scans len(toks)-1 pairs and there are at most len(word)-1 rounds.
    The old priority-order pass did O(|merges|) lookups per word, ~2000x
    over this bound at 100k merges by construction."""
    big = _synthetic_merges(100_000)
    validate_merges(big)
    small_ranks = merge_ranks(load_merges())
    big_ranks = merge_ranks(big)
    words = ["".join("abcd"[(i * 7 + j) % 4] for j in range(3 + i % 14))
             for i in range(500)]

    class CountingRanks(dict):
        gets = 0

        def get(self, *a):
            CountingRanks.gets += 1
            return super().get(*a)

    def lookups(ranks) -> int:
        counted = CountingRanks(ranks)
        CountingRanks.gets = 0
        for w in words:
            out = encode_word(w, ranks=counted)
            assert "".join(out) == w
        return CountingRanks.gets

    bound = sum((len(w) - 1) * len(w) for w in words)
    n_small, n_big = lookups(small_ranks), lookups(big_ranks)
    assert n_small <= bound, (n_small, bound)
    assert n_big <= bound, (
        f"per-word lookups not flat: {n_big} gets @100k merges vs the "
        f"table-size-free bound {bound} ({n_small} @48 merges)"
    )
    # and re-pinned on the committed sf10-trained table (r12: the
    # first organically multi-thousand-merge table, 3,263 merges)
    from batch_processing_etl_orchestration_spark.functions.bpe import (
        load_merges_sf10,
    )

    n_sf10 = lookups(merge_ranks(load_merges_sf10()))
    assert n_sf10 <= bound, (n_sf10, bound)
    # and the 100k table still round-trips correctness vs the reference
    sample = words[::50]
    for w in sample:
        assert encode_word(w, ranks=big_ranks) == (
            encode_word_priority_pass(w, big)
        ), w


def test_sf1_saturated_table_committed_and_consistent():
    """VERDICT r10 next #7 (the honest version): the committed
    sf1-trained table sits at the fixture corpus's SATURATION ceiling
    — 383 merges over 310 distinct words — and satisfies the same
    invariants as the default table (validate_merges runs inside
    load_merges). At saturation every in-corpus word compresses to a
    single token whose ID encodes the full merge ORDER, which is why
    q_bpe_encode_ids_satvocab attests the id stream rather than
    counts."""
    import json
    import os

    from batch_processing_etl_orchestration_spark.functions import bpe

    sat = bpe.load_merges_sf1()
    assert len(sat) > 4 * len(load_merges())  # genuinely larger table
    with open(
        os.path.join(os.path.dirname(bpe.__file__), "bpe_merges_sf1.json")
    ) as f:
        doc = json.load(f)
    assert doc["saturated"] is True
    # ids are priority-order-sensitive: the sf0.001 fixture words all
    # encode to exactly one token each, with DISTINCT nontrivial ids
    ranks = merge_ranks(sat)
    v = bpe.vocab(sat)
    ids = []
    for w in _fixture_words():
        toks = encode_word(w, ranks=ranks)
        assert "".join(toks) == w
        if len(w) > 1:
            assert len(toks) == 1, (w, toks)  # saturation compresses
        ids.append(v.get(toks[0], -1))
    assert len(set(ids)) == len(ids)  # distinct ids per distinct word
    # every multi-char word's id is a MERGE-PRODUCT id (>= 36), i.e.
    # it encodes the table's priority order, not just the base alphabet
    assert all(
        i >= 36 for w, i in zip(_fixture_words(), ids) if len(w) > 1
    )
    # rank-dict == priority-pass on the big table too
    for w in _fixture_words():
        assert encode_word(w, ranks=ranks) == encode_word_priority_pass(
            w, sat
        )


def test_sf10_table_committed_multi_thousand_and_consistent():
    """VERDICT r11 next #4: the committed sf10-trained table is the
    first ORGANICALLY multi-thousand-merge table this fixture family
    supports — >=2,000 merges (3,263 at saturation over 3,100 distinct
    suffixed words), trained with the same deterministic Sennrich
    procedure, and exactly equivalent between the rank-dict encoder
    and the priority-order reference pass on the fixture words."""
    import json
    import os

    from batch_processing_etl_orchestration_spark.functions import bpe

    big = bpe.load_merges_sf10()
    assert len(big) >= 2000, len(big)
    assert len(big) > 8 * len(bpe.load_merges_sf1())
    with open(
        os.path.join(os.path.dirname(bpe.__file__), "bpe_merges_sf10.json")
    ) as f:
        doc = json.load(f)
    assert doc["saturated"] is True
    assert doc["n_words"] == 3100
    ranks = merge_ranks(big)
    for w in _fixture_words():
        fast = encode_word(w, ranks=ranks)
        assert "".join(fast) == w
        assert fast == encode_word_priority_pass(w, big), w
