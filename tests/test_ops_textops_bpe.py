"""Real BPE token count: training determinism, apply-order equivalence, and
exactness of the DuckDB recursive-CTE oracle replay.

The reference counts tokens with tiktoken's GPT-2 BPE (ref
src/utils.py:45-47); this engine trains its own deterministic merge table
(wbkg/ops/textops.py) and must (a) encode identically no matter whether
merges are applied rank-order-sequentially (the fast-encoder way this repo
uses) or min-rank-first (the textbook priority loop), and (b) be replayable
bit-for-bit by the SQL oracle's fixpoint-replace recursion.
"""

import random

import duckdb
import pytest

from wbkg.ops.textops import (
    BPE_MERGES,
    _merge_pass,
    bpe_encode_len,
    bpe_token_count,
    train_bpe_merges,
)

ALPHA = " abcdefghtlow.,!?019"


def _fuzz_strings(n=80, seed=11):
    rng = random.Random(seed)
    out = ["", " the", " table", "aaaa", "a" * 25, " the the", "x!x!x!"]
    out += [
        "".join(rng.choice(ALPHA) for _ in range(rng.randrange(1, 40)))
        for _ in range(n)
    ]
    return out


def test_training_deterministic_and_wellfounded():
    m1, m2 = train_bpe_merges(), train_bpe_merges()
    assert m1 == m2 == BPE_MERGES
    assert len(m1) == 80
    # well-foundedness: any merge part longer than one char must itself be
    # the product of an EARLIER merge — this is what makes sequential
    # rank-order application equivalent to the priority loop
    produced = set()
    for lft, rgt in m1:
        for part in (lft, rgt):
            if len(part) > 1:
                assert part in produced, (part, "used before being produced")
        produced.add(lft + rgt)


def _encode_priority(piece, merges):
    """Textbook BPE: repeatedly merge the lowest-rank pair present."""
    rank = {p: i for i, p in enumerate(merges)}
    syms = list(piece)
    while len(syms) >= 2:
        pairs = [(rank.get((a, b)), i) for i, (a, b) in enumerate(zip(syms, syms[1:]))]
        pairs = [(r, i) for r, i in pairs if r is not None]
        if not pairs:
            break
        best_rank = min(pairs)[0]
        lft, rgt = merges[best_rank]
        syms = _merge_pass(syms, lft, rgt)
    return len(syms)


def test_rank_order_equals_priority_loop():
    for s in _fuzz_strings():
        assert bpe_encode_len(s) == _encode_priority(s, BPE_MERGES), repr(s)


def test_known_counts():
    # seed-corpus words collapse to single tokens; unseen chars stay chars
    assert bpe_encode_len(" the") == 1
    assert bpe_encode_len(" table") == 1
    assert bpe_encode_len("") == 0
    assert bpe_encode_len(" zzz") == 4  # ' ', 'z', 'z', 'z' — no merges hit


def test_duckdb_fixpoint_replace_replay_exact():
    """The oracle's per-rank fixpoint `replace` over chr(31)-separated
    symbols must reproduce the single left-to-right merge pass exactly —
    including the shared-separator pathologies (runs of identical symbols,
    alternating pairs)."""
    values = ",".join(
        "('{}','{}',{})".format(l.replace("'", "''"), r.replace("'", "''"), i)
        for i, (l, r) in enumerate(BPE_MERGES, 1)
    )
    n = len(BPE_MERGES)
    texts = _fuzz_strings(seed=23)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pieces AS SELECT * FROM "
        "(SELECT unnest(range(%d)) AS pid, unnest(?) AS piece)" % len(texts),
        [texts],
    )
    sql = f"""
        WITH RECURSIVE
        merges(lft, rgt, rnk) AS (VALUES {values}),
        bpe(pid, rnk, seq) AS (
          SELECT pid, 1,
                 chr(31) || array_to_string(string_split(piece, ''), chr(31)) || chr(31)
          FROM pieces WHERE piece <> ''
          UNION ALL
          SELECT pid,
                 CASE WHEN nseq <> seq THEN rnk ELSE rnk + 1 END,
                 CASE WHEN nseq <> seq THEN nseq ELSE seq END
          FROM (
            SELECT b.pid, b.rnk, b.seq,
                   replace(b.seq, chr(31)||m.lft||chr(31)||m.rgt||chr(31),
                                  chr(31)||m.lft||m.rgt||chr(31)) AS nseq
            FROM bpe b JOIN merges m ON m.rnk = b.rnk
          ) WHERE rnk < {n} OR nseq <> seq
        )
        SELECT p.pid,
               coalesce(min(len(b.seq)) - len(p.piece) - 1, 0)::BIGINT AS n
        FROM pieces p LEFT JOIN bpe b USING (pid) GROUP BY p.pid, p.piece
    """
    got = dict(con.execute(sql).fetchall())
    for i, t in enumerate(texts):
        assert got[i] == bpe_encode_len(t), (i, repr(t))


def test_spark_bpe_token_count(spark):
    df = spark.createDataFrame(
        [(0, "the table value"), (1, ""), (2, "zzz zzz"), (3, "a" * 12)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_token_count(df).collect()}
    # piece-split happens JVM-side; expected = python encode over the pieces
    # ("the" first word has no leading space; later words do)
    exp = {
        0: bpe_encode_len("the") + bpe_encode_len(" table") + bpe_encode_len(" value"),
        1: 0,
        2: bpe_encode_len("zzz") + bpe_encode_len(" zzz"),
        3: bpe_encode_len("a" * 12),
    }
    assert got == exp
    # real BPE compresses: fewer tokens than characters, at least one per word
    assert 0 < got[0] < len("the table value")
