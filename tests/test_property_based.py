"""Property-based tests (hypothesis) — the testing layer the reference
lacks (SURVEY §5 "NOT present: randomized/property-based frameworks").

Each property pits a distributed operator against an independent
sequential oracle on randomized inputs: asof_join vs
``pandas.merge_asof``, salted aggregation vs the plain aggregate,
bucketized range join vs a naive O(n²) pair scan, and the batch
sessionizer invariants.
"""

from __future__ import annotations

import datetime

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

BASE = datetime.datetime(2024, 1, 1)


def _ts(offset_s: int) -> datetime.datetime:
    return BASE + datetime.timedelta(seconds=int(offset_s))


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),        # user_id
        st.integers(min_value=0, max_value=100_000),  # ts offset s
        st.floats(min_value=-100, max_value=100, allow_nan=False,
                  width=32),
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@pytest.mark.heavy  # 42 s hypothesis sweep
@given(left=events_strategy, right=events_strategy)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    """asof_join (union + window fill) ≡ pandas.merge_asof per user."""
    from bio_lakehouse_spark.operators.joins import asof_join

    # Unique (user, ts) per side — both implementations break ties
    # differently for duplicate timestamps within one side.
    left = list({(u, t): (u, t, v) for u, t, v in left}.values())
    right = list({(u, t): (u, t, v) for u, t, v in right}.values())
    ldf = spark.createDataFrame(
        [(u, i, _ts(t)) for i, (u, t, _) in enumerate(left)],
        schema="user_id long, event_id long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(u, _ts(t), float(v)) for u, t, v in right],
        schema="user_id long, ts timestamp, value double",
    )
    got = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(
            ldf, rdf, on=["user_id"], left_ts="ts", right_ts="ts",
            right_cols=["value"],
        ).collect()
    }
    lpd = pd.DataFrame(
        [(u, i, _ts(t)) for i, (u, t, _) in enumerate(left)],
        columns=["user_id", "event_id", "ts"],
    ).sort_values("ts", kind="mergesort")
    rpd = pd.DataFrame(
        [(u, _ts(t), float(v)) for u, t, v in right],
        columns=["user_id", "ts", "value"],
    ).sort_values("ts", kind="mergesort")
    expected = pd.merge_asof(
        lpd, rpd, on="ts", by="user_id", direction="backward"
    )
    for _, row in expected.iterrows():
        g = got[row["event_id"]]
        if pd.isna(row["value"]):
            assert g is None
        else:
            assert g == pytest.approx(row["value"])


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@pytest.mark.heavy  # 30 s hypothesis sweep
@given(rows=events_strategy, n_salts=st.integers(min_value=1, max_value=7))
def test_salted_agg_equals_plain(spark, rows, n_salts):
    from bio_lakehouse_spark.operators.skew import salted_agg_cols

    df = spark.createDataFrame(
        [(u, float(v)) for u, _, v in rows], schema="k long, v double"
    )
    plain = {
        r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
            F.min("v").alias("mn"), F.max("v").alias("mx"),
        ).collect()
    }
    salted = {
        r["k"]: (r["n"], r["total"], r["min_value"], r["max_value"])
        for r in salted_agg_cols(df, ["k"], "v", n_salts=n_salts).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        pn, ps, pmn, pmx = plain[k]
        sn, ss, smn, smx = salted[k]
        assert (pn, pmn, pmx) == (sn, smn, smx)
        assert ps == pytest.approx(ss, rel=1e-9)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(left=events_strategy, right=events_strategy,
       window=st.sampled_from([60, 600, 3600]))
@pytest.mark.heavy  # 24 s hypothesis sweep
def test_range_join_matches_naive(spark, left, right, window):
    from bio_lakehouse_spark.operators.joins import range_join_bucketed

    ldf = spark.createDataFrame(
        [(u, i, _ts(t)) for i, (u, t, _) in enumerate(left)],
        schema="user_id long, lid long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(u, j, _ts(t)) for j, (u, t, _) in enumerate(right)],
        schema="user_id long, rid long, ts timestamp",
    )
    got = {
        (r["lid"], r["r_rid"])
        for r in range_join_bucketed(
            ldf, rdf, on=["user_id"], left_ts="ts", right_ts="ts",
            lower_s=0, upper_s=window, bucket_s=window,
        ).collect()
    }
    expected = {
        (i, j)
        for i, (ul, tl, _) in enumerate(left)
        for j, (ur, tr, _) in enumerate(right)
        if ul == ur and 0 <= tr - tl < window
    }
    assert got == expected


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=events_strategy, gap=st.sampled_from([60, 1800]))
def test_batch_sessionizer_invariants(spark, rows, gap):
    """Session rule on random event sets: within a session every
    inter-event gap ≤ gap; across consecutive sessions the boundary
    gap > gap; events are partitioned exactly."""
    from bio_lakehouse_spark.streaming.sessionize import make_sessionizer

    pdf = pd.DataFrame(
        [(u, _ts(t), float(v)) for u, t, v in rows],
        columns=["user_id", "ts", "value"],
    ).drop_duplicates(subset=["user_id", "ts"])

    class _State:
        exists = False
        hasTimedOut = False

        def __init__(self):
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

        def remove(self):
            self._v, self.exists = None, False

        def setTimeoutTimestamp(self, ts):
            pass

    fn = make_sessionizer(gap_s=gap)
    for user, g in pdf.groupby("user_id"):
        state = _State()
        out = list(fn((user,), [g], state))
        closed = pd.concat(out) if out else pd.DataFrame(
            columns=["n_events", "session_start", "session_end"]
        )
        n_open = state.get[2] if state.exists else 0
        assert int(closed["n_events"].sum() if len(closed) else 0) + n_open == len(g)
        ts_sorted = g.sort_values("ts")["ts"].tolist()
        # reconstruct expected session count with the gap rule
        expected_sessions = 1
        for a, b in zip(ts_sorted, ts_sorted[1:]):
            if (b - a).total_seconds() > gap:
                expected_sessions += 1
        assert len(closed) + (1 if state.exists else 0) == expected_sessions


# Random word-doc corpora with planted near-dup mutations: a base
# vocabulary keeps docs plausibly colliding; each doc is 8-20 words,
# and some docs are 1-2-word mutations of earlier docs (true near-dups
# at small hamming).
_VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
          "theta", "iota", "kappa"]
docs_strategy = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=8, max_size=20),
    min_size=2,
    max_size=25,
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@pytest.mark.heavy  # 69 s hypothesis sweep
@given(docs=docs_strategy, seed=st.integers(min_value=0, max_value=99))
def test_banded_simhash_equals_bruteforce(spark, docs, seed):
    """Pigeonhole recall: the banded 64-bit simhash pipeline must
    return EXACTLY the brute-force hamming<=3 pair set — banding is a
    pure candidate-generation optimization, never a semantics change.
    Mutated copies of random docs plant true near-dup pairs."""
    import random

    from bio_lakehouse_spark.operators.dedup import (
        simhash64,
        simhash_pairs_banded,
    )

    rng = random.Random(seed)
    all_docs = list(docs)
    for i, d in enumerate(docs):
        if rng.random() < 0.5:
            mut = list(d)
            mut[rng.randrange(len(mut))] = rng.choice(_VOCAB)
            all_docs.append(mut)
    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(all_docs)],
        schema="doc_id long, text string",
    )
    got = sorted(
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_pairs_banded(
            df, "doc_id", "text", n=3, max_hamming=3
        ).collect()
    )
    sig = {r["doc_id"]: (r["sim_hi"], r["sim_lo"])
           for r in simhash64(df, "doc_id", "text", n=3).collect()}
    ids = sorted(sig)
    expect = sorted(
        (a, b,
         bin(sig[a][0] ^ sig[b][0]).count("1")
         + bin(sig[a][1] ^ sig[b][1]).count("1"))
        for i, a in enumerate(ids) for b in ids[i + 1:]
        if bin(sig[a][0] ^ sig[b][0]).count("1")
        + bin(sig[a][1] ^ sig[b][1]).count("1") <= 3
    )
    assert got == expect


intervals_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50_000),   # start offset s
        st.integers(min_value=0, max_value=8_000),    # duration s
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(left=intervals_strategy, right=intervals_strategy)
def test_interval_overlap_join_matches_naive(spark, left, right):
    """Bucketized interval-overlap join ≡ the O(n²) scan on random
    intervals — binning is a pure candidate optimization, never a
    semantics change (inclusive overlap, all bucket boundaries)."""
    from bio_lakehouse_spark.operators.joins import interval_overlap_join

    ldf = spark.createDataFrame(
        [(i, _ts(s), _ts(s + d)) for i, (s, d) in enumerate(left)],
        schema="id long, s timestamp, e timestamp",
    )
    rdf = spark.createDataFrame(
        [(i, _ts(s), _ts(s + d)) for i, (s, d) in enumerate(right)],
        schema="id long, s timestamp, e timestamp",
    )
    got = sorted(
        (r["l_id"], r["r_id"])
        for r in interval_overlap_join(
            ldf, rdf, ("id", "s", "e"), ("id", "s", "e"), bucket_s=3600
        ).collect()
    )
    expect = sorted(
        (i, j)
        for i, (ls, ld) in enumerate(left)
        for j, (rs, rd) in enumerate(right)
        if ls <= rs + rd and rs <= ls + ld
    )
    assert got == expect


def test_interval_overlap_join_bin_explosion_fails_loudly(spark):
    """Fan-out guard: a single pathological interval (a year at 1-hour
    buckets → ~8 760 bins, or a mis-parsed epoch-0 start → millions)
    must FAIL the job with a diagnostic, not silently explode the
    candidate table; clamping would drop true overlaps. Raising
    max_bins_per_row (or bucket_s) is the sanctioned escape hatch."""
    import pytest as _pytest

    from bio_lakehouse_spark.operators.joins import interval_overlap_join

    year = 365 * 24 * 3600
    ldf = spark.createDataFrame(
        [(0, _ts(0), _ts(year))], schema="id long, s timestamp, e timestamp"
    )
    rdf = spark.createDataFrame(
        [(1, _ts(100), _ts(200))], schema="id long, s timestamp, e timestamp"
    )
    with _pytest.raises(Exception, match="max_bins_per_row"):
        interval_overlap_join(
            ldf, rdf, ("id", "s", "e"), ("id", "s", "e"), bucket_s=3600
        ).collect()
    # Same data passes once the guard is sized for it.
    ok = interval_overlap_join(
        ldf, rdf, ("id", "s", "e"), ("id", "s", "e"),
        bucket_s=3600, max_bins_per_row=10_000,
    ).collect()
    assert [(r["l_id"], r["r_id"]) for r in ok] == [(0, 1)]


def test_remove_frequent_segments_newline_mode(spark):
    """Line-delimiter mode on crafted multi-line docs: the boilerplate
    line shared by 3 docs is stripped everywhere, unique lines
    survive in order, and a doc made ENTIRELY of boilerplate returns
    clean_text NULL (not '') — the SQL string_agg FILTER contract."""
    from bio_lakehouse_spark.operators.dedup import (
        remove_frequent_segments,
    )

    boiler = "subscribe to our newsletter"
    rows = [
        (0, f"alpha unique opening\n{boiler}\nclosing thoughts alpha"),
        (1, f"{boiler}\nbeta body text"),
        (2, f"gamma solo line\n{boiler}"),
        (3, boiler),                      # fully boilerplate
        (4, "delta never repeated\nsecond delta line"),
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in remove_frequent_segments(
            df, "doc_id", "text", min_docs=2, delim="\n"
        ).collect()
    }
    assert out[0]["clean_text"] == "alpha unique opening closing thoughts alpha"
    assert out[0]["n_segs"] == 3 and out[0]["n_removed"] == 1
    assert out[1]["clean_text"] == "beta body text"
    assert out[2]["clean_text"] == "gamma solo line"
    assert out[3]["clean_text"] is None
    assert out[3]["n_removed"] == out[3]["n_segs"] == 1
    assert out[4]["clean_text"] == "delta never repeated second delta line"
    assert out[4]["n_removed"] == 0


def test_remove_frequent_segments_fixed_width_roundtrip(spark):
    """Fixed-width mode with no frequent segments is the identity on
    text (chunk + reassemble must round-trip, including a ragged last
    chunk shorter than words_per_seg)."""
    from bio_lakehouse_spark.operators.dedup import (
        remove_frequent_segments,
    )

    texts = [
        "one two three four five six seven eight nine",   # 9 words: 8+1
        "a b c",                                          # single ragged chunk
        " ".join(f"w{i}" for i in range(16)),             # exact multiple
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        schema="doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in remove_frequent_segments(
            df, "doc_id", "text", words_per_seg=8, min_docs=2
        ).collect()
    }
    for i, t in enumerate(texts):
        assert out[i]["clean_text"] == t, (i, out[i]["clean_text"])
        assert out[i]["n_removed"] == 0


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    n_words=st.integers(min_value=1, max_value=200),
    chunk_size=st.integers(min_value=2, max_value=64),
    data=st.data(),
)
def test_chunk_overlap_invariants(spark, n_words, chunk_size, data):
    """Sliding-window chunker invariants for arbitrary sizes: full
    token coverage in order (reassembling chunk[i][overlap:] after
    chunk[0] reproduces the doc), consecutive chunks share exactly
    `overlap` tokens, no empty chunk, and the standard count formula
    holds."""
    import math

    from bio_lakehouse_spark.operators.packing import chunk_with_overlap

    overlap = data.draw(st.integers(min_value=0, max_value=chunk_size - 1))
    stride = chunk_size - overlap
    words = [f"w{i}" for i in range(n_words)]
    df = spark.createDataFrame(
        [(0, " ".join(words))], schema="doc_id long, text string"
    )
    rows = sorted(
        chunk_with_overlap(
            df, "doc_id", "text", chunk_size=chunk_size, overlap=overlap
        ).collect(),
        key=lambda r: r["chunk_id"],
    )
    expect_n = (
        1 if n_words <= chunk_size
        else math.ceil((n_words - chunk_size) / stride) + 1
    )
    assert len(rows) == expect_n
    rebuilt = rows[0]["chunk_text"].split(" ")
    for prev, cur in zip(rows, rows[1:]):
        p, c = prev["chunk_text"].split(" "), cur["chunk_text"].split(" ")
        shared = min(overlap, len(c))
        assert cur["start_tok"] == prev["start_tok"] + stride
        assert p[stride:stride + shared] == c[:shared]  # overlap agrees
        rebuilt.extend(c[shared:] if len(p) == chunk_size else [])
    if all(len(r["chunk_text"].split(" ")) == chunk_size
           for r in rows[:-1]):
        assert rebuilt == words  # full in-order coverage
    for r in rows:
        assert 1 <= r["n_tok"] <= chunk_size
        assert len(r["chunk_text"].split(" ")) == r["n_tok"]


def test_unigram_lm_oov_scores_worse(spark):
    """LM quality contract: a document of out-of-vocabulary junk must
    score strictly higher mean surprisal than one built from the
    reference corpus's most common words, and OOV tokens take the
    maximum per-token nll (uniform-smoothed floor)."""
    import math

    from bio_lakehouse_spark.operators.textops import unigram_lm_score

    ref = spark.createDataFrame(
        [(100 + i, "the cat sat on the mat") for i in range(5)],
        schema="doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [(0, "the the the cat"), (1, "zxqv wvut qqqq")],
        schema="doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           unigram_lm_score(docs, "doc_id", "text", ref=ref).collect()}
    assert out[1]["mean_nll"] > out[0]["mean_nll"]
    # OOV floor: every token of doc 1 is OOV -> mean_nll == log2(N+V+1)
    n_ref, v_ref = 30, 5
    assert abs(out[1]["mean_nll"] - math.log2(n_ref + v_ref + 1)) < 1e-9


def test_repeated_span_catches_unaligned_copy(spark):
    """The defining property vs chunk-based dedup: a 20-token span
    pasted into another doc at a DIFFERENT word offset must flag both
    docs (stride-1 windows align at any offset); unrelated docs stay
    unflagged."""
    from bio_lakehouse_spark.operators.dedup import repeated_window_flags

    span = " ".join(f"s{i}" for i in range(20))
    rows = [
        (0, "aa bb cc " + span + " dd ee"),          # span at offset 3
        (1, "xx " + span + " yy zz qq rr tt"),       # span at offset 1
        (2, " ".join(f"u{i}" for i in range(30))),   # unrelated
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in repeated_window_flags(
            df, "doc_id", "text", window=16
        ).collect()
    }
    assert out[0]["flagged"] and out[1]["flagged"]
    assert not out[2]["flagged"] and out[2]["n_shared"] == 0
    # both copies share exactly the 5 complete 16-windows of the span
    assert out[0]["n_shared"] == out[1]["n_shared"] == 5


def test_seasonal_decompose_identity_and_zero_sum(spark):
    """Decomposition invariants on a crafted series with a known
    weekly pattern: observed == trend + seasonal + residual exactly
    per row, seasonal sums to ~0 over the 7 phases, and a strong
    planted weekday spike surfaces as the max seasonal phase."""
    import datetime as dt

    from bio_lakehouse_spark.operators.stats import seasonal_decompose

    base = dt.date(2024, 1, 1)  # a Monday
    rows = []
    for i in range(70):
        d = base + dt.timedelta(days=i)
        v = 100.0 + i * 0.5 + (25.0 if d.weekday() == 5 else 0.0)
        rows.append(("hr", d, v))
    df = spark.createDataFrame(rows, "entity string, date date, v double")
    out = seasonal_decompose(df, "entity", "date", "v").collect()
    assert len(out) == 70
    for r in out:
        assert abs(r["observed"] - (r["trend"] + r["seasonal"] + r["residual"])) < 1e-9
    by_phase = {}
    for r in out:
        ph = (r["date"] - dt.date(1970, 1, 5)).days % 7
        by_phase[ph] = r["seasonal"]
    assert abs(sum(by_phase.values())) < 1e-9
    assert max(by_phase, key=by_phase.get) == 5  # Saturday spike


def test_pagerank_mass_and_dangling(spark):
    """PageRank invariants on a crafted graph WITH a dangling node:
    rank mass sums to 1 every time, a node with more in-links
    outranks one with fewer, and the dangling node still holds the
    teleport floor."""
    from bio_lakehouse_spark.operators.graph import pagerank

    # 1->3, 2->3, 4->1 ; 3 is dangling (no out-edges)
    edges = spark.createDataFrame(
        [(1, 3), (2, 3), (4, 1)], "src long, dst long"
    )
    rows = {r["node"]: r["rank"] for r in pagerank(edges, iters=5).collect()}
    assert abs(sum(rows.values()) - 1.0) < 1e-9
    assert rows[3] > rows[1] > rows[2]  # 2 in-links > 1 > 0-ish
    assert min(rows.values()) > 0.15 / 4 - 1e-12  # teleport floor


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(toks=st.lists(st.integers(min_value=1, max_value=500),
                     min_size=2, max_size=6))
def test_pack_pairs_sorted_matching_is_optimal(spark, toks):
    """EVEN shards: sorted longest-with-shortest pairing minimizes
    the maximum bin load over ALL perfect matchings — verified
    against brute force. Odd shards use the median-singleton
    heuristic (documented off-optimal, e.g. [1,1,2]), so only
    membership is asserted there. Every doc appears in exactly one
    bin either way."""
    import itertools

    from bio_lakehouse_spark.operators.packing import (
        pack_pairs_minimal_padding,
    )

    df = spark.createDataFrame(
        [(i * 8, t) for i, t in enumerate(toks)],  # one shard (all %8==0)
        "doc_id long, n_tok long",
    )
    bins = pack_pairs_minimal_padding(df, "doc_id", "n_tok", n_shards=8).collect()
    seen = [b["long_id"] for b in bins] + [
        b["short_id"] for b in bins if b["short_id"] != -1
    ]
    assert sorted(seen) == sorted(i * 8 for i in range(len(toks)))
    if len(toks) % 2 == 1:
        return  # odd: heuristic, membership already checked
    got_max = max(b["pair_tok"] for b in bins)

    def best_max(vals):
        n = len(vals)
        if n <= 2:
            return sum(vals)
        if n % 2 == 1:  # odd: one singleton, try each
            return min(
                max(vals[i], best_max(vals[:i] + vals[i + 1:]))
                for i in range(n)
            )
        first, rest = vals[0], vals[1:]
        return min(
            max(first + rest[i], best_max(rest[:i] + rest[i + 1:]))
            for i in range(len(rest))
        )

    assert got_max == best_max(list(toks))


def test_containment_catches_embedded_doc_jaccard_misses(spark):
    """The defining case: a short doc pasted verbatim inside a long
    one — containment ≈ 1, Jaccard tiny — must be flagged by
    ngram_containment_pairs and absent from ngram_jaccard_pairs at
    matched thresholds."""
    from bio_lakehouse_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    short = " ".join(f"quote{i}" for i in range(12))
    long_doc = (
        " ".join(f"body{i}" for i in range(150))
        + " " + short + " "
        + " ".join(f"tail{i}" for i in range(150))
    )
    df = spark.createDataFrame(
        [(0, short, "en"), (1, long_doc, "en"),
         (2, " ".join(f"other{i}" for i in range(40)), "en")],
        "doc_id long, text string, lang string",
    )
    cont = ngram_containment_pairs(
        df, "doc_id", "text", ["lang"], n=3, threshold=0.8
    ).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in cont] == [(0, 1)]
    assert cont[0]["cont_a_in_b"] == 1.0  # fully embedded
    jac = ngram_jaccard_pairs(
        df, "doc_id", "text", ["lang"], n=3, threshold=0.5
    ).collect()
    assert jac == []  # Jaccard structurally blind to the embedding


def _unit_vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_mmr_skips_redundant_near_duplicate(spark):
    """The defining MMR property: given a top candidate and its
    near-duplicate, plain top-k returns both; MMR's second pick must
    be the DIVERSE item instead of the redundant twin."""
    from bio_lakehouse_spark.operators.similarity import mmr_select

    q = [(0, [1.0, 0.0, 0.0, 0.0], 0)]
    cands = [
        (1, [0.99, 0.14, 0.0, 0.0], 0),   # best match
        (2, [0.985, 0.17, 0.0, 0.0], 0),  # near-dup of 1, 2nd by rel
        (3, [0.8, 0.0, 0.6, 0.0], 0),     # diverse, 3rd by rel
    ]
    def picks(lam):
        return [
            r["id"]
            for r in sorted(
                mmr_select(
                    _unit_vecs(spark, cands), _unit_vecs(spark, q),
                    k_candidates=3, k_select=2, lam=lam,
                ).collect(),
                key=lambda r: r["pick"],
            )
        ]

    # λ=0.5 weighs redundancy enough to skip the twin; λ→1 degrades
    # to plain relevance order and takes it — the dial MMR exists for.
    assert picks(0.5) == [1, 3]
    assert picks(0.99) == [1, 2]


def test_rrf_consistent_midrank_beats_single_list_top():
    """RRF arithmetic: rank 2 in BOTH lists (2/62) outscores rank 1
    in only one list (1/61) — the consensus property that makes RRF
    the default fusion."""
    both_second = 1 / 62 + 1 / 62
    single_first = 1 / 61
    assert both_second > single_first


def test_bitext_mutual_margin_finds_planted_pair(spark):
    """A planted translation pair (identical vectors across the two
    sides) must surface as a mutual top-1 with the highest margin;
    a hub-ish vector close to everything must NOT pair."""
    from bio_lakehouse_spark.operators.similarity import bitext_mine_mutual

    side_a = _unit_vecs(spark, [
        (0, [1.0, 0.0, 0.0, 0.0], 0),   # planted pair member
        (1, [0.0, 1.0, 0.0, 0.0], 0),
        (2, [0.5, 0.5, 0.5, 0.5], 0),   # hub: mid-similar to all
    ])
    side_b = _unit_vecs(spark, [
        (10, [1.0, 0.02, 0.0, 0.0], 1),  # ~translation of 0
        (11, [0.0, 1.0, 0.05, 0.0], 1),  # ~translation of 1
        (12, [0.4, 0.45, 0.55, 0.5], 1),
    ])
    out = {(r["a_id"], r["b_id"]): r["margin"]
           for r in bitext_mine_mutual(side_a, side_b, k_margin=2,
                                       margin_threshold=1.0).collect()}
    assert (0, 10) in out and (1, 11) in out
    assert out[(0, 10)] > 1.0


def test_minhash_signature_estimates_jaccard(spark):
    """Signature-agreement fraction is an unbiased Jaccard estimator:
    over controlled-overlap doc pairs, |estimate − exact| must stay
    within a few binomial standard errors of sqrt(J(1−J)/k). Guards
    the hash family's independence (a broken per-component seed — e.g.
    every component hashing identically — passes banding tests but
    fails this)."""
    import numpy as np

    from bio_lakehouse_spark.operators.dedup import (
        minhash_signatures_raw,
        shingle_sets,
    )

    words_pool = [f"tok{i}" for i in range(400)]
    rng = np.random.default_rng(5)
    docs, exact = [], {}
    did = 0
    for overlap in (0.2, 0.5, 0.8):
        for _ in range(6):
            base = list(rng.choice(words_pool, 120, replace=False))
            k = int(len(base) * overlap)
            other = [w for w in words_pool if w not in base]
            variant = base[:k] + list(rng.choice(other, 120 - k, replace=False))
            docs.append((did, " ".join(base)))
            docs.append((did + 1, " ".join(variant)))
            did += 2
    df = spark.createDataFrame(docs, "doc_id long, text string")
    K = 16
    sigs = {
        r["doc_id"]: [r[f"mh_{j}"] for j in range(K)]
        for r in minhash_signatures_raw(
            df, "doc_id", "text", n=3, num_hashes=K
        ).collect()
    }
    sets = {
        r["doc_id"]: set(r["shingles"])
        for r in shingle_sets(df, "doc_id", "text", n=3).collect()
    }
    errs = []
    for a in range(0, did, 2):
        b = a + 1
        est = sum(x == y for x, y in zip(sigs[a], sigs[b])) / K
        jac = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        se = max((jac * (1 - jac) / K) ** 0.5, 1 / K)
        assert abs(est - jac) <= 4 * se, (a, est, jac)
        errs.append(est - jac)
    # no systematic bias across the pair population
    assert abs(sum(errs) / len(errs)) < 0.08


def test_prefix_filter_join_equals_bruteforce_at_boundary(spark):
    """Prefix filtering's recall-1 theorem, stressed where a
    probabilistic method is weakest: pairs sitting EXACTLY at the
    Jaccard threshold (|x∩y|/|x∪y| = 0.5 by construction) must all
    be found, plus random pairs straddling it."""
    import numpy as np

    from bio_lakehouse_spark.operators.dedup import (
        prefix_filter_pairs,
        shingle_sets,
    )

    rng = np.random.default_rng(9)
    pool = [f"w{i}" for i in range(600)]
    docs, did = [], 0
    # exact-boundary pairs: |A|=|B|=60, overlap 40 → J = 40/80 = 0.5
    for _ in range(5):
        common = list(rng.choice(pool, 40, replace=False))
        rest = [w for w in pool if w not in common]
        a = common + list(rng.choice(rest, 20, replace=False))
        b = common + list(
            rng.choice([w for w in rest if w not in a], 20, replace=False)
        )
        docs += [(did, " ".join(a)), (did + 1, " ".join(b))]
        did += 2
    # random background docs
    for _ in range(30):
        docs.append((did, " ".join(rng.choice(pool, 60, replace=False))))
        did += 1
    df = spark.createDataFrame(docs, "doc_id long, text string")

    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in prefix_filter_pairs(
            df, "doc_id", "text", n=1, threshold=0.5
        ).collect()
    }
    sets = {
        r["doc_id"]: set(r["shingles"])
        for r in shingle_sets(df, "doc_id", "text", n=1).collect()
    }
    want = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
            if j >= 0.5:
                want[(a, b)] = j
    assert set(got) == set(want)  # recall 1 AND precision 1
    for k, j in want.items():
        assert got[k] == pytest.approx(j, rel=1e-12)
    assert len(want) >= 5  # the boundary pairs are all present


def test_dense_ids_match_global_rank_and_reject_dupes(spark):
    import numpy as np

    from bio_lakehouse_spark.operators.aggregates import dense_ids

    rng = np.random.default_rng(3)
    vals = rng.permutation(500)
    df = spark.createDataFrame(
        [(int(i), int(v)) for i, v in enumerate(vals)], "id long, v long"
    )
    out = {
        r["id"]: r["dense_id"]
        for r in dense_ids(df, ["v", "id"], num_partitions=7).collect()
    }
    order = sorted(range(500), key=lambda i: (vals[i], i))
    for rank, i in enumerate(order):
        assert out[i] == rank
    # duplicate keys without a tiebreaker must fail loudly
    dup = spark.createDataFrame([(1, 5), (2, 5)], "id long, v long")
    with pytest.raises(ValueError, match="total order"):
        dense_ids(dup, ["v"])


def test_global_row_number_desc_via_negation_and_ties(spark):
    """windows.global_row_number (gini/hill's shared rank path):
    1-based, equals row_number() OVER (ORDER BY ...) including the
    hill pattern — DESC via a negated column with heavy ties broken
    by the PK — across a partition count that forces several range
    partitions."""
    import numpy as np

    from bio_lakehouse_spark.operators.windows import global_row_number

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 40, size=400)  # many ties
    df = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(vals)],
        "id long, r double",
    ).withColumn("negr", -F.col("r"))
    out = {
        row["id"]: row["i"]
        for row in global_row_number(
            df, ["negr", "id"], rank_name="i", num_partitions=9,
            assume_unique=True,
        ).collect()
    }
    order = sorted(range(400), key=lambda i: (-vals[i], i))
    for rank0, i in enumerate(order):
        assert out[i] == rank0 + 1  # 1-based


def test_fs_adaptive_knobs_thresholds(spark):
    """_fs_adaptive_knobs: baseline (100, 2) at/below N_ref, width
    halves per doubling, suffix +1 per decade."""
    from bio_lakehouse_spark.suite.relational import _fs_adaptive_knobs

    def knobs(n):
        return _fs_adaptive_knobs(spark.range(n))

    assert knobs(150) == (100.0, 2)
    assert knobs(2000) == (100.0, 2)
    assert knobs(2001) == (50.0, 3)   # first step past N_ref
    assert knobs(4000) == (50.0, 3)
    assert knobs(4001) == (25.0, 3)
    assert knobs(20000) == (6.25, 3)   # ceil(log2(10)) = 4 halvings
    assert knobs(20001) == (6.25, 4)   # ratio > 10 → suffix grows
    assert knobs(240000) == (100.0 / 128, 5)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@pytest.mark.heavy  # 20 s hypothesis sweep
@given(docs=docs_strategy, seed=st.integers(min_value=0, max_value=99))
def test_containment_prefix_filter_recall_exact(spark, docs, seed):
    """The asymmetric prefix filter must return EXACTLY the
    brute-force either-direction-containment >= t pair set — prefix
    candidate generation is pure optimization, recall 1 by pigeonhole
    (smaller doc's rarest prefix always intersects the larger doc's
    full shingle set). Planted containment cases: a random doc's
    prefix pasted into a much longer doc."""
    import random

    from bio_lakehouse_spark.operators.dedup import (
        containment_prefix_pairs,
        ngram_containment_pairs,
    )

    rng = random.Random(seed)
    all_docs = list(docs)
    for d in docs:
        if rng.random() < 0.5 and len(d) >= 8:
            # short verbatim excerpt → containment ≈ 1 into a long host
            host = d[:6] + [rng.choice(_VOCAB) for _ in range(30)]
            all_docs.append(host)
            all_docs.append(d[:6])
    rows = [(i, " ".join(d), "en") for i, d in enumerate(all_docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    def pairset(out):
        return {
            (r["doc_a"], r["doc_b"]): (
                round(r["cont_a_in_b"], 6), round(r["cont_b_in_a"], 6)
            )
            for r in out.collect()
        }

    fast = pairset(
        containment_prefix_pairs(
            df, "doc_id", "text", block_cols=["lang"], n=3, threshold=0.8
        )
    )
    brute = pairset(
        ngram_containment_pairs(
            df, "doc_id", "text", block_cols=["lang"], n=3, threshold=0.8
        )
    )
    assert fast == brute


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(doc=st.lists(st.sampled_from(_VOCAB), min_size=40, max_size=80),
       pos=st.integers(min_value=5, max_value=35),
       seed=st.integers(min_value=0, max_value=99))
def test_cdc_chunking_is_shift_resistant(spark, doc, pos, seed):
    """The CDC claim: inserting ONE word changes only the chunk
    containing the insertion point (boundaries are content-defined,
    so chunking re-synchronizes) — the original and mutated docs must
    still SHARE every chunk outside the edit, which fixed-position
    windows cannot do. Verified via the duplicate-chunk fraction:
    both docs must report dup chunks (their shared runs) whenever
    they have >= 3 chunks."""
    import random

    from bio_lakehouse_spark.operators.dedup import cdc_chunk_stats

    rng = random.Random(seed)
    mutated = doc[:pos] + [rng.choice(_VOCAB) + "zzz"] + doc[pos:]
    df = spark.createDataFrame(
        [(0, " ".join(doc)), (1, " ".join(mutated))],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           cdc_chunk_stats(df, "doc_id", "text", divisor=8).collect()}
    assert set(out) == {0, 1}
    # An insertion splits at most one chunk of the original: the
    # mutated doc can lose at most 2 shared chunks vs the original's
    # chunk count (the edited chunk, and the final remainder chunk if
    # the edit lands there).
    n0, d0 = out[0]["n_chunks"], out[0]["n_dup_chunks"]
    assert d0 >= n0 - 2
    if n0 >= 3:
        assert d0 > 0  # shared runs survive the edit


def test_canonical_keep_ranks_quality_not_min_id(spark):
    """Canonical selection must keep the HIGHEST-quality copy, not
    the min id: a well-formed copy (long, clean) planted at a HIGHER
    id than a digit-spammed copy of the same word bag must win."""
    from bio_lakehouse_spark.operators.dedup import canonical_keep_verdicts

    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away to the hills where it rests under a tree for a while")
    # Build true bag-equal copies: same words, different order/case.
    words = base.split()
    shuffled = " ".join(reversed(words)).upper()
    digity = " ".join(words) + " 999 888 777 666 555 444 333 222 111 000"
    rows = [
        (1, digity),    # extra digit words → different bag: own group
        (2, shuffled),  # bag-equal with 3, worse quality (no lowercase
                        # penalty — but digit ratio 0, len same)
        (3, base),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           canonical_keep_verdicts(df, "doc_id", "text").collect()}
    # only the bag-equal pair {2, 3} forms a group
    assert set(out) == {2, 3}
    assert out[2]["n_copies"] == 2 and out[3]["n_copies"] == 2
    # equal quality (case-insensitive metrics) → tie falls to min id;
    # the point under test: BOTH verdicts emitted, exactly one keeper
    keepers = [d for d, r in out.items() if r["is_canonical"]]
    assert len(keepers) == 1


def test_bloom_filter_no_false_negatives_and_bounded_fp(spark):
    """Bloom prune contract: EVERY build-side key passes the probe
    (no false negatives — the property that makes the prune
    result-transparent), and disjoint keys pass at roughly the
    theoretical FP rate ((1-e^{-kn/m})^k ≈ 0.24% for n=500, m=2^16,
    k=3 — assert < 5%, an order of magnitude of slack)."""
    from bio_lakehouse_spark.operators.joins import (
        bloom_filter_build,
        bloom_prune,
    )

    members = spark.range(0, 500).select(F.col("id").alias("k"))
    bloom = bloom_filter_build(members, "k")
    kept_members = bloom_prune(members, "k", bloom).count()
    assert kept_members == 500, "false negative: a member was pruned"

    outsiders = spark.range(100_000, 110_000).select(F.col("id").alias("k"))
    fp = bloom_prune(outsiders, "k", bloom).count()
    assert fp / 10_000 < 0.05, f"false-positive rate too high: {fp}/10000"


def test_lsh_recall_audit_buckets_and_bounds(spark):
    """lsh_recall_audit on a constructed corpus with controlled
    overlap: (1) n_found ≤ n_truth and recall ∈ [0, 1] per bucket;
    (2) buckets span the engineered jaccard range (not just the
    fixture's bimodal ≥0.9 mass); (3) expected_recall is the
    closed-form 1−(1−s⁴)⁴ at the bucket midpoint; (4) the measured
    corpus-wide recall is within binomial noise of the expectation —
    the audit's whole point is that these two columns agree when the
    hash family is healthy."""
    import numpy as np

    from bio_lakehouse_spark.operators.dedup import lsh_recall_audit

    words_pool = [f"tok{i}" for i in range(600)]
    rng = np.random.default_rng(11)
    docs, did = [], 0
    for overlap in (0.45, 0.6, 0.75, 0.92):
        for _ in range(10):
            base = list(rng.choice(words_pool, 150, replace=False))
            k = int(len(base) * overlap)
            other = [w for w in words_pool if w not in base]
            variant = base[:k] + list(
                rng.choice(other, 150 - k, replace=False)
            )
            docs.append((did, " ".join(base)))
            docs.append((did + 1, " ".join(variant)))
            did += 2
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = lsh_recall_audit(
        df, "doc_id", "text", n=3, n_bands=4, rows_per_band=4,
        truth_threshold=0.2,
    ).collect()
    assert len(rows) >= 3  # the overlap ladder spreads across deciles
    n_truth_total = n_found_total = 0
    exp_found = 0.0
    for r in rows:
        assert 0 <= r["n_found"] <= r["n_truth"]
        assert 0.0 <= r["recall"] <= 1.0
        mid = r["bucket_lo"] + 0.05
        expected = 1 - (1 - mid**4) ** 4
        assert abs(r["expected_recall"] - expected) < 1e-6, r
        n_truth_total += r["n_truth"]
        n_found_total += r["n_found"]
        exp_found += r["n_truth"] * expected
    # corpus-wide: measured hits within 4·sqrt(n) of the expectation
    # (pair-level band hits are ~independent Bernoullis here)
    assert abs(n_found_total - exp_found) <= 4 * max(
        n_truth_total**0.5, 3.0
    ), (n_found_total, exp_found)


def test_spread_is_noop_on_multi_split_inputs(spark):
    """The 100 TB posture of registry.spread(): a production input
    that already has >= defaultParallelism splits must pass through
    UNTOUCHED — same object, no repartition, no checkpoint — so the
    plan Catalyst sees at scale is identical with or without the
    local fixture fix. The small-input branch must repartition to
    exactly defaultParallelism (and only checkpoint when asked)."""
    from bio_lakehouse_spark.suite.registry import spread

    par = spark.sparkContext.defaultParallelism
    big = spark.range(0, 10_000).repartition(par + 4, "id")
    assert spread(big, "id") is big
    assert spread(big, "id", barrier=True) is big

    small = spark.range(0, 100).coalesce(1)
    out = spread(small, "id")
    assert out.rdd.getNumPartitions() == par
    # barrier branch still yields the spread partitioning and the
    # same rows (lazy checkpoint materializes on first action)
    outb = spread(small, "id", barrier=True)
    assert outb.rdd.getNumPartitions() == par
    assert sorted(r.id for r in outb.collect()) == list(range(100))


def test_ntile_rank_closed_form_matches_native_windows(spark):
    """ntile_rank_quintiles' closed-form NTILE/RANK (dense_ids global
    position + arithmetic) must equal Spark's own window functions on
    frames of every n%5 residue, including n<5 where the small-bucket
    division degenerates — the exact semantics the scalable rewrite
    must preserve."""
    from pyspark.sql import Window

    from bio_lakehouse_spark.operators.aggregates import dense_ids

    for n in (3, 7, 10, 23, 40):
        rows = [(i, float((i * 37) % 11)) for i in range(n)]
        df = spark.createDataFrame(rows, "user_id long, total_value double")
        native = {
            (r["user_id"]): (r["q"], r["rk"])
            for r in df.select(
                "user_id",
                F.ntile(5)
                .over(Window.orderBy("total_value", "user_id"))
                .alias("q"),
                F.rank()
                .over(Window.orderBy(F.desc("total_value")))
                .alias("rk"),
            ).collect()
        }
        pos = dense_ids(df, ("total_value", "user_id"), id_name="__pos")
        nn = df.count()
        big = nn // 5 + 1
        rem = nn % 5
        out = {}
        tie_max = {
            r["total_value"]: r["m"]
            for r in pos.groupBy("total_value")
            .agg(F.max("__pos").alias("m"))
            .collect()
        }
        for r in pos.collect():
            p = r["__pos"]
            if p < rem * big:
                q = p // big + 1
            else:
                q = rem + (p - rem * big) // (nn // 5) + 1
            out[r["user_id"]] = (q, nn - tie_max[r["total_value"]])
        assert out == native, (n, out, native)


def test_curation_pipeline_composes_standalone_verdicts(spark, sf_dir):
    """curation_pipeline_full must agree with the standalone
    operators it composes: keep ⟺ no reject reason, and the
    contaminated flag must equal decontaminate_eval_overlap's doc
    set (same eval-slice convention)."""
    from bio_lakehouse_spark.suite import REGISTRY

    rows = REGISTRY["curation_pipeline_full"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["keep"] == (r["reject_reasons"] == ""), r
        reasons = set(filter(None, r["reject_reasons"].split(",")))
        assert ("contaminated" in reasons) == r["contaminated"]
        assert ("neardup" in reasons) == r["neardup_demoted"]
    cont_ids = {
        r["doc_id"]
        for r in REGISTRY["decontaminate_eval_overlap"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert {r["doc_id"] for r in rows if r["contaminated"]} == cont_ids
