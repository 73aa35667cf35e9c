"""Property-based tests (SURVEY §5 item 4): dedup idempotence and gold
aggregation invariance under input permutation and re-partitioning."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from investcloud_data_pipeline_spark.operators.dedup import dedup_keep_first
from investcloud_data_pipeline_spark.operators.gold import user_argmax_totals

row_strategy = st.tuples(
    st.integers(0, 5),                      # key
    st.integers(0, 3),                      # region idx
    st.integers(0, 100),                    # value (int → exact doubles)
    st.integers(0, 10**6),                  # tiebreak id
)
rows_strategy = st.lists(row_strategy, min_size=1, max_size=40)

REGIONS = ["r0", "r1", "r2", "r3"]

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from investcloud_data_pipeline_spark.session import get_spark

        _spark = get_spark("props", cpus=4)
    return _spark


def _df(rows, n_parts=None):
    spark = _get_spark()
    data = [
        (f"u{k}", REGIONS[r], float(v), f"id{i}") for k, r, v, i in rows
    ]
    df = spark.createDataFrame(
        data, "user_id string, geo_region string, watch_time double, rid string"
    )
    return df.repartition(n_parts) if n_parts else df


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=rows_strategy)
def test_dedup_idempotent_and_subset(rows):
    df = _df(rows)
    once = dedup_keep_first(df, ["user_id"], ["watch_time", "rid"])
    twice = dedup_keep_first(once, ["user_id"], ["watch_time", "rid"])
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b
    assert len(a) == len({r[0] for r in rows})


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=rows_strategy, n_parts=st.sampled_from([1, 3, 8]))
def test_gold_invariant_under_partitioning_and_order(rows, n_parts):
    base = sorted(
        map(tuple, user_argmax_totals(_df(rows)).collect())
    )
    shuffled = sorted(
        map(tuple, user_argmax_totals(_df(list(reversed(rows)), n_parts)).collect())
    )
    assert base == shuffled


# ---- connected components vs a union-find reference ----

edges_strategy = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
        lambda e: e[0] != e[1]
    ),
    min_size=1,
    max_size=60,
)


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id in the component
    comp = {}
    for n in parent:
        root = find(n)
        comp.setdefault(root, []).append(n)
    return {
        n: min(members) for members in comp.values() for n in members
    }


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(edges=edges_strategy)
@pytest.mark.slow
def test_components_match_union_find_reference(edges):
    from investcloud_data_pipeline_spark.operators.graph import (
        connected_components,
    )

    spark = _get_spark()
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.component for r in connected_components(df).collect()
    }
    assert got == _union_find_components(edges)


# ---------- CDC merge: equivalence with a sequential reference fold ----------

cdc_change_strategy = st.tuples(
    st.integers(0, 6),                       # key
    st.integers(0, 50),                      # payload value
    st.booleans(),                           # is_delete
    st.integers(0, 10**6),                   # seq
)
cdc_strategy = st.lists(cdc_change_strategy, min_size=0, max_size=30)
base_strategy = st.dictionaries(
    st.integers(0, 6), st.integers(0, 50), max_size=7
)


def _reference_merge(base: dict, changes) -> dict:
    """Sequential fold in seq order (= the semantics apply_cdc promises
    for its batch): last change per key wins; 'D' preferred on seq tie."""
    out = dict(base)
    last = {}
    for k, v, is_del, seq in changes:
        cur = last.get(k)
        # same total order as latest_per_key: seq desc, then deletes
        # win seq ties (op asc — 'D' ranks before 'U')
        rank = (seq, 1 if is_del else 0)
        if cur is None or rank > cur[0]:
            last[k] = (rank, v, is_del)
    for k, (_, v, is_del) in last.items():
        if is_del:
            out.pop(k, None)
        else:
            out[k] = v
    return out


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(base=base_strategy, changes=cdc_strategy)
def test_apply_cdc_matches_sequential_fold(base, changes):
    from investcloud_data_pipeline_spark.operators.merge import apply_cdc

    spark = _get_spark()
    base_df = spark.createDataFrame(
        [(k, v) for k, v in base.items()] or
        spark.sparkContext.emptyRDD(),
        "k long, v long",
    )
    ch_df = spark.createDataFrame(
        [(k, v, "D" if d else "U", s) for k, v, d, s in changes] or
        spark.sparkContext.emptyRDD(),
        "k long, v long, op string, seq long",
    )
    got = {
        r.k: r.v
        for r in apply_cdc(base_df, ch_df, ["k"], "seq").collect()
    }
    assert got == _reference_merge(base, changes)


# ---------------------------------------------------------------------------
# Fuzzy-dedup invariants (VERDICT r4 #8)

WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
         "golf", "hotel", "india", "juliet"]

doc_strategy = st.lists(st.sampled_from(WORDS), min_size=0, max_size=12)
corpus_strategy = st.lists(doc_strategy, min_size=2, max_size=12)


def _docs_df(word_lists, dup_of=None):
    """(doc_id, text) frame; dup_of maps new ids to ids they duplicate."""
    spark = _get_spark()
    rows = [(i, " ".join(ws)) for i, ws in enumerate(word_lists)]
    if dup_of:
        base = dict(rows)
        rows += [(nid, base[src]) for nid, src in dup_of.items()]
    return spark.createDataFrame(rows, "doc_id long, text string")


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpus=corpus_strategy)
@pytest.mark.slow
def test_minhash_lsh_matches_local_banding_and_catches_exact_dups(corpus):
    """Two invariants of the MinHash-LSH plan on generated corpora:
    (1) the distributed banding join emits EXACTLY the pairs that agree
    on at least one band of their (collected) signatures — i.e. the
    explode/band/self-join plan implements the LSH definition; and
    (2) every identical-text pair (Jaccard 1: all minhashes equal) is a
    candidate — the deterministic core of 'candidates ⊇ exact pairs at
    the banding threshold' (sub-1 similarities are probabilistic by
    design, so only J=1 is a law)."""
    from investcloud_data_pipeline_spark.operators.dedup_fuzzy import (
        minhash_lsh_candidates,
        minhash_signatures,
    )

    # append one exact duplicate of each of the first two docs
    dup_of = {100: 0, 101: 1}
    df = _docs_df(corpus, dup_of)
    got = {
        (r.id1, r.id2)
        for r in minhash_lsh_candidates(df, num_hashes=12, bands=4).collect()
    }

    sigs = {
        r["id"]: [r[f"mh_{j}"] for j in range(12)]
        for r in minhash_signatures(df, num_hashes=12).collect()
    }
    ids = sorted(sigs)
    expected = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = sigs[a], sigs[b]
            if any(sa[3 * k: 3 * k + 3] == sb[3 * k: 3 * k + 3]
                   for k in range(4)):
                expected.add((a, b))
    assert got == expected

    # docs with no tokens are excluded from signatures (like a GROUP BY)
    for nid, src in dup_of.items():
        if src in sigs:  # tokenizable duplicate pair must be caught
            assert (src, nid) in got


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpus=corpus_strategy)
def test_simhash_candidates_match_local_16bit_banding(corpus):
    """The SimHash blocking join emits exactly the pairs agreeing on ≥1
    of the four 16-bit chunks of their (collected) simhash values —
    which implies hamming-distance-0 pairs (identical texts) are always
    candidates, and any miss has hamming weight spread over all 4
    bands (the standard blocking guarantee)."""
    from investcloud_data_pipeline_spark.operators.dedup_fuzzy import (
        simhash64,
        simhash_candidates,
    )

    df = _docs_df(corpus, dup_of={100: 0})
    got = {(r.id1, r.id2) for r in simhash_candidates(df).collect()}

    hashed = {
        r["id"]: r["simhash"]
        for r in df.mapInPandas(
            lambda it: simhash64(it), schema="id long, simhash long"
        ).collect()
    }
    ids = sorted(hashed)
    expected = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ua = (hashed[a] + (1 << 63)) % (1 << 64)
            ub = (hashed[b] + (1 << 63)) % (1 << 64)
            if any(((ua >> (16 * c)) & 0xFFFF) == ((ub >> (16 * c)) & 0xFFFF)
                   for c in range(4)):
                expected.add((a, b))
    assert got == expected
    assert (0, 100) in got  # identical text → hamming 0 → candidate


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpus=st.lists(st.lists(st.sampled_from(WORDS), min_size=10,
                                max_size=14), min_size=2, max_size=6))
@pytest.mark.slow
def test_clean_corpus_is_idempotent(corpus):
    """clean_corpus is a fixed point: survivors are pairwise
    non-near-duplicate component roots whose exact-digest groups root at
    themselves, so re-running the funnel (pairs recomputed on the
    output) keeps every row."""
    from pyspark.sql import functions as F

    from investcloud_data_pipeline_spark.operators.dedup_fuzzy import (
        ngram_jaccard_pairs,
    )
    from investcloud_data_pipeline_spark.plans.training_data import (
        clean_corpus,
    )

    df = _docs_df(corpus, dup_of={100: 0, 101: 0})
    df = df.withColumn("lang", F.lit("en")).withColumn("source", F.lit("t"))

    def run(d):
        pairs = ngram_jaccard_pairs(d, threshold=0.6).select("id1", "id2")
        return clean_corpus(d, pairs)

    once = run(df)
    once_rows = sorted(map(tuple, once.collect()))
    twice_rows = sorted(map(tuple, run(once).collect()))
    assert once_rows == twice_rows
    kept = {r[0] for r in once_rows}
    assert 100 not in kept and 101 not in kept  # exact dups lose to id 0


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpus=corpus_strategy, thr=st.sampled_from([0.3, 0.5, 0.8]))
@pytest.mark.slow
def test_containment_dominates_jaccard(corpus, thr):
    """Overlap coefficient ≥ Jaccard always (min(|A|,|B|) ≤ |A∪B|), so
    at any shared threshold the containment pair set must be a superset
    of the Jaccard pair set — the law that makes containment the
    stricter leakage net. Also: every exact-duplicate pair has
    containment exactly 1.0."""
    from investcloud_data_pipeline_spark.operators.dedup_fuzzy import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    df = _docs_df(corpus, dup_of={100: 0})
    cont = {
        (r.id1, r.id2): r.containment
        for r in ngram_containment_pairs(df, threshold=thr).collect()
    }
    jac = {
        (r.id1, r.id2)
        for r in ngram_jaccard_pairs(df, threshold=thr).collect()
    }
    assert jac <= set(cont)
    if any(t for t in corpus[0]):  # doc 0 tokenizable → dup pair exists
        assert cont.get((0, 100)) == 1.0


# ---------- round-5 fourth-block invariants ----------

word_st = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
)
doc_st = st.lists(word_st, min_size=0, max_size=24).map(" ".join)
corpus_st = st.lists(doc_st, min_size=1, max_size=8)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(docs=corpus_st)
@pytest.mark.slow
def test_repeated_spans_bounded_and_permutation_invariant(docs):
    """dup_tokens <= n_tokens for every doc; result is invariant to
    input partitioning; duplicating the whole corpus makes every
    windowable doc fully covered (dup_fraction == 1)."""
    from investcloud_data_pipeline_spark.operators.dedup_fuzzy import (
        repeated_span_stats,
    )

    spark = _get_spark()
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in repeated_span_stats(df, k=4).collect()}
    n_toks = {i: len(t.split()) if t.strip() else 0 for i, t in rows}
    for i, t in rows:
        assert 0 <= out[i].dup_tokens <= n_toks[i]
        if n_toks[i] < 4:
            assert out[i].dup_tokens == 0
    out_re = {
        r.doc_id: r
        for r in repeated_span_stats(df.repartition(5), k=4).collect()
    }
    assert {i: tuple(r) for i, r in out.items()} == {
        i: tuple(r) for i, r in out_re.items()
    }
    # duplicate every doc under fresh ids -> every >=4-token doc fully dup
    dup_rows = rows + [(i + 1000, t) for i, t in rows]
    ddf = spark.createDataFrame(dup_rows, "doc_id long, text string")
    for r in repeated_span_stats(ddf, k=4).collect():
        base = n_toks[r.doc_id % 1000]
        if base >= 4:
            assert r.dup_tokens == base, r
            assert r.dup_fraction == 1.0


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    fact=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)),
        min_size=0, max_size=30,
    ),
    dim_keys=st.sets(st.integers(0, 3), max_size=4),
)
@pytest.mark.slow
def test_salted_join_equals_plain_join(fact, dim_keys):
    from investcloud_data_pipeline_spark.operators.scale import salted_join

    spark = _get_spark()
    f = spark.createDataFrame(fact or [(99, 0)], "k long, v long")
    d = spark.createDataFrame(
        [(k, f"n{k}") for k in dim_keys] or [(98, "x")], "k long, name string"
    )
    for how in ("inner", "left"):
        plain = sorted((r.k, r.v, r.name) for r in f.join(d, "k", how).collect())
        salted = sorted(
            (r.k, r.v, r.name)
            for r in salted_join(f, d, "k", salt_buckets=4, how=how).collect()
        )
        assert salted == plain


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(ids=st.sets(st.integers(0, 10**9), min_size=1, max_size=40))
def test_shard_manifest_partitions_corpus_exactly(ids):
    """Shard counts sum to the corpus; checksums are partitioning-
    invariant; shard ids stay in range."""
    from investcloud_data_pipeline_spark.operators.export import shard_manifest

    spark = _get_spark()
    rows = [(i, f"text {i}") for i in sorted(ids)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    m1 = {r.shard: (r.n_docs, r.content_md5)
          for r in shard_manifest(df, 8).collect()}
    m2 = {r.shard: (r.n_docs, r.content_md5)
          for r in shard_manifest(df.repartition(7), 8).collect()}
    assert m1 == m2
    assert sum(n for n, _ in m1.values()) == len(rows)
    assert set(m1) <= set(range(8))


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-2.0, max_value=2.0,
                      allow_nan=False, allow_infinity=False,
                      width=32),
            min_size=24, max_size=24,
        ),
        min_size=4, max_size=20, unique_by=tuple,
    )
)
def test_multiband_lsh_matches_local_banding(vecs):
    """The OR-amplified multiband sign-LSH join emits EXACTLY the
    neighbor set implied by its definition: a candidate pair agrees on
    the full sign pattern of at least one band. Verified against a
    local recomputation of the band keys over generated vectors
    (including negative/zero components, where the >=0 sign convention
    must match bit-for-bit)."""
    spark = _get_spark()
    from investcloud_data_pipeline_spark.operators.simsearch import (
        lsh_multiband_topk,
    )

    rows = [(i, list(v)) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r.query_id, r.neighbor_id)
        for r in lsh_multiband_topk(
            emb, emb, k=len(vecs), n_bands=8, bits_per_band=3
        ).collect()
    }

    import struct as _struct

    def f32(x):  # the table stores float32: band on the stored value
        return _struct.unpack("f", _struct.pack("f", x))[0]

    def bands(v):
        return [
            tuple(f32(v[b * 3 + j]) >= 0 for j in range(3))
            for b in range(8)
        ]

    expected = set()
    local = {i: bands(v) for i, v in enumerate(vecs)}
    for i in local:
        for j in local:
            if i == j:
                continue
            if any(bi == bj for bi, bj in zip(local[i], local[j])):
                expected.add((i, j))
    assert got == expected


# ---------- wave-2 extension laws ----------

_pro_rows = st.lists(
    st.tuples(
        st.integers(1, 4),          # order id
        st.integers(1, 500_00),     # weight in cents (positive)
    ),
    min_size=1,
    max_size=24,
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=_pro_rows, totals=st.lists(st.integers(1, 10**7), min_size=4, max_size=4))
def test_proration_always_sums_to_total_and_bounds_remainder(rows, totals):
    """Largest-remainder law: for ANY positive weights and header
    totals, per-order allocations sum exactly to the header cents and
    each allocation differs from the unrounded share by < 1 cent."""
    from pyspark.sql import functions as F

    from investcloud_data_pipeline_spark.plans import analytics_ext as AX

    spark = _get_spark()
    li = spark.createDataFrame(
        [
            (oid, i + 1, cents / 100.0)
            for i, (oid, cents) in enumerate(rows)
        ],
        "l_orderkey long, l_linenumber int, l_extendedprice double",
    )
    o = spark.createDataFrame(
        [(oid, t / 100.0) for oid, t in zip(range(1, 5), totals)],
        "o_orderkey long, o_totalprice double",
    )
    orig = AX.load_table
    try:
        AX.load_table = lambda spark, d, name: {  # noqa: ARG005
            "lineitem": li,
            "orders": o,
        }[name]
        out = AX.order_proration_largest_remainder(spark, "x")
        per_order = {
            r.l_orderkey: r.s
            for r in out.groupBy("l_orderkey")
            .agg(F.sum("alloc_cents").alias("s"))
            .collect()
        }
    finally:
        AX.load_table = orig
    import math

    expected = {
        oid: int(math.floor(t / 100.0 * 100 + 0.5))
        for oid, t in zip(range(1, 5), totals)
    }
    present = {oid for oid, _ in rows}
    for oid, s in per_order.items():
        assert s == expected[oid], (oid, s, expected[oid])
    assert set(per_order) == present


_pf_corpus = st.lists(
    st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=12).map(
        lambda ws: " ".join(ws)
    ),
    min_size=2,
    max_size=12,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(texts=_pf_corpus)
@pytest.mark.slow
def test_prefix_filter_is_lossless_vs_bruteforce(texts):
    """The prefix lemma end-to-end: for random small corpora the
    prefix-filtered exact join returns EXACTLY the brute-force
    threshold pair set (no false negatives from prefix truncation, no
    false positives from candidate generation)."""
    from investcloud_data_pipeline_spark.operators.setsim import (
        prefix_filter_jaccard_pairs,
    )

    spark = _get_spark()
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.id1, r.id2)
        for r in prefix_filter_jaccard_pairs(docs, n=3, num=1, den=2).collect()
    }
    # local reference
    def shingles(t):
        ws = t.split()
        if len(ws) <= 3:
            return {" ".join(ws)}
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

    sh = {i: shingles(t) for i, t in enumerate(texts) if t.strip()}
    expected = set()
    ids = sorted(sh)
    for a in ids:
        for b in ids:
            if a < b:
                inter = len(sh[a] & sh[b])
                union = len(sh[a]) + len(sh[b]) - inter
                if 2 * inter >= union:
                    expected.add((a, b))
    assert got == expected


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    start=st.dates(),
    span=st.integers(-10, 400),
)
def test_business_days_closed_form_matches_day_walk(start, span):
    """The closed form (5*floor(days/7) + remainder weekday count)
    equals the literal day-by-day weekday walk for any span."""
    import datetime as dt

    days = span
    end = start + dt.timedelta(days=span)
    walk = 0
    d = start + dt.timedelta(days=1)
    while d <= end:
        if d.weekday() <= 4:
            walk += 1
        d += dt.timedelta(days=1)
    # closed form (mirrors the plan expression)
    if days > 0:
        fw = days // 7
        rem = days - fw * 7
        wd = start.weekday()
        closed = fw * 5 + sum(1 for i in range(1, rem + 1) if (wd + i) % 7 <= 4)
    else:
        closed = 0
    assert closed == walk


# ---------- Misra-Gries merge laws (wave 4) ----------

@settings(max_examples=200, deadline=None)
@given(
    stream=st.lists(
        st.tuples(st.integers(0, 30), st.integers(1, 50)),
        min_size=1,
        max_size=60,
    ),
    k=st.integers(1, 8),
)
def test_mg_merge_no_miss_and_lower_bound(stream, k):
    """After folding n occurrences into a K-counter MG summary: every
    key with true frequency > n/(K+1) is present, and every counter is
    a lower bound of its key's true count."""
    from investcloud_data_pipeline_spark.operators.sketches import mg_merge

    summary = mg_merge({}, stream, k)
    truth: dict[int, int] = {}
    for key, c in stream:
        truth[key] = truth.get(key, 0) + c
    n = sum(truth.values())
    assert len(summary) <= k
    for key, lb in summary.items():
        assert lb <= truth[key]
        # undercount bound
        assert truth[key] - lb <= n / (k + 1)
    for key, c in truth.items():
        if c > n / (k + 1):
            assert key in summary, (key, c, n, k, summary)


@settings(max_examples=100, deadline=None)
@given(
    a=st.lists(
        st.tuples(st.integers(0, 20), st.integers(1, 30)),
        min_size=1,
        max_size=30,
    ),
    b=st.lists(
        st.tuples(st.integers(0, 20), st.integers(1, 30)),
        min_size=0,
        max_size=30,
    ),
    k=st.integers(2, 6),
)
def test_mg_merge_incremental_equals_one_shot(a, b, k):
    """Folding stream A then stream B into the same summary (the
    streaming state path) keeps the guarantee for the CONCATENATED
    stream — the property the state-store sketch relies on."""
    from investcloud_data_pipeline_spark.operators.sketches import mg_merge

    summary = mg_merge(mg_merge({}, a, k), b, k)
    truth: dict[int, int] = {}
    for key, c in a + b:
        truth[key] = truth.get(key, 0) + c
    n = sum(truth.values())
    for key, c in truth.items():
        if c > n / (k + 1):
            assert key in summary
    for key, lb in summary.items():
        assert lb <= truth[key]


# ---------- Gini reference model + scale invariance (wave 3) ----------

def _gini_reference(revenues):
    xs = sorted(revenues)
    n = len(xs)
    total = sum(xs)
    iw = sum((i + 1) * x for i, x in enumerate(xs))
    return round(2.0 * iw / (n * total) - (n + 1) / n, 6)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    revenues=st.lists(st.integers(1, 500), min_size=2, max_size=12),
    scale=st.sampled_from([1, 3, 10]),
)
def test_gini_matches_reference_and_is_scale_invariant(revenues, scale):
    import pyspark.sql.functions as F

    from investcloud_data_pipeline_spark.plans import analytics_ext3 as AX3

    spark = _get_spark()
    orders = spark.createDataFrame(
        [
            (i + 1, i + 1, "O", float(rev * scale), "1995-01-01",
             "1-URGENT")
            for i, rev in enumerate(revenues)
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string,"
        " o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    customer = spark.createDataFrame(
        [(i + 1, f"c{i}", 0, 0.0, "B") for i in range(len(revenues))],
        "c_custkey long, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    )
    nation = spark.createDataFrame(
        [(0, "Z", 0)], "n_nationkey int, n_name string, n_regionkey int"
    )
    orig = AX3.load_table
    try:
        AX3.load_table = lambda s, d, n: {
            "orders": orders, "customer": customer, "nation": nation
        }[n]
        got = AX3.customer_revenue_gini(spark, "x").collect()[0].gini
    finally:
        AX3.load_table = orig
    # Gini is invariant under scaling every revenue by the same factor,
    # so the unscaled reference must match
    assert got == _gini_reference(revenues)


# ---------- OLS planted-coefficient recovery (wave 3) ----------

@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    b0=st.integers(-5, 5),
    b1=st.integers(-4, 4),
    b2=st.integers(-4, 4),
)
def test_ols_recovers_planted_plane(b0, b1, b2):
    import pyspark.sql.functions as F  # noqa: F401

    from investcloud_data_pipeline_spark.plans import analytics_ext3 as AX3

    spark = _get_spark()
    # non-collinear grid of (x1, x2) with exact 2dp values
    pts = [(1.0, 0.0), (2.0, 0.25), (3.0, 0.5), (4.0, 0.0),
           (5.0, 0.75), (6.0, 0.25), (7.0, 0.5), (8.0, 0.75)]
    rows = [
        (1, i + 1, i + 1, x1, b0 + b1 * x1 + b2 * x2, x2, 0.0,
         "N", "O", "1995-01-01")
        for i, (x1, x2) in enumerate(pts)
    ]
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate string",
    )
    orig = AX3.load_table
    try:
        AX3.load_table = lambda s, d, n, **kw: li  # **kw: scan_wide opt-in
        r = AX3.lineitem_ols_price(spark, "x").collect()[0]
    finally:
        AX3.load_table = orig
    assert r.intercept == float(b0)
    assert r.beta_quantity == float(b1)
    assert r.beta_discount == float(b2)


# ---------- round-7 operator laws ----------

ks_strategy = st.tuples(
    st.lists(st.integers(0, 50), min_size=2, max_size=30),
    st.lists(st.integers(0, 50), min_size=2, max_size=30),
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(samples=ks_strategy)
def test_ks_statistic_matches_local_reference(spark, samples, monkeypatch):
    """The KS query's exact-integer D equals a direct local two-sample
    computation on arbitrary integer samples."""
    from investcloud_data_pipeline_spark.plans import analytics_ext7 as AX7

    xs, ys = samples
    rows = [("BUILDING", float(v)) for v in xs] + [
        ("MACHINERY", float(v)) for v in ys
    ]
    cust = spark.createDataFrame(
        [(i, f"c{i}", 1, bal, seg, "a", "p", "c")
         for i, (seg, bal) in enumerate(rows)],
        "c_custkey long, c_name string, c_nationkey long,"
        " c_acctbal double, c_mktsegment string, c_address string,"
        " c_phone string, c_comment string",
    )
    monkeypatch.setattr(
        AX7, "load_table", lambda s, d, name: {"customer": cust}[name]
    )
    r = AX7.customer_balance_ks_test(spark, "x").collect()[0]
    # local reference: integer numerator over every distinct value
    n1, n2 = len(xs), len(ys)
    d_num = 0
    for v in sorted(set(xs) | set(ys)):
        c1 = sum(1 for x in xs if x <= v)
        c2 = sum(1 for y in ys if y <= v)
        d_num = max(d_num, abs(c1 * n2 - c2 * n1))
    assert (r.n1, r.n2, r.d_num) == (n1, n2, d_num)


bin_strategy = st.lists(
    st.floats(-100, 100, allow_nan=False, allow_infinity=False),
    min_size=20, max_size=120,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(scores=bin_strategy, n_bins=st.sampled_from([2, 4, 5]))
def test_approx_bins_monotone_and_cover(spark, scores, n_bins):
    """Binning laws on arbitrary score sets: every row lands in a valid
    bin, assignment is monotone in the score, and with high sketch
    accuracy the realized edges respect the quantile ordering."""
    from investcloud_data_pipeline_spark.operators.binning import (
        approx_quantile_bins,
    )

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(scores)],
        "rid long, score double",
    )
    out = approx_quantile_bins(df, "score", n_bins, bin_col="b").collect()
    assert len(out) == len(scores)
    assert all(1 <= r.b <= n_bins for r in out)
    by_score = sorted(out, key=lambda r: (r.score, r.rid))
    bins = [r.b for r in by_score]
    assert bins == sorted(bins)  # monotone in score


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(docs=corpus_st)
@pytest.mark.slow
def test_exactsubstr_keep_first_invariants(docs):
    """Round-11 keep-first ExactSubstr laws: n_removed <= n_tokens and
    bounded by the strip-everywhere variant's removal per doc (keeping
    one occurrence can never remove MORE than stripping all); corpus
    removal is strictly positive exactly when strip-everywhere's is;
    result invariant to input partitioning; docs shorter than k are
    untouched."""
    from investcloud_data_pipeline_spark.operators.dedup_fuzzy import (
        exactsubstr_keep_first,
        strip_repeated_spans,
    )

    spark = _get_spark()
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    keep = {r.doc_id: r for r in exactsubstr_keep_first(df, k=4).collect()}
    n_toks = {i: len(t.split()) if t.strip() else 0 for i, t in rows}
    for i, t in rows:
        r = keep[i]
        assert 0 <= r.n_removed <= r.n_tokens == n_toks[i]
        if n_toks[i] < 4:
            assert r.n_removed == 0 and r.text_dedup == " ".join(t.split())
    # partition invariance: canonical selection uses the (doc_id, pos)
    # total order, so physical layout cannot change the result
    keep_re = {
        r.doc_id: tuple(r)
        for r in exactsubstr_keep_first(df.repartition(5), k=4).collect()
    }
    assert {i: tuple(r) for i, r in keep.items()} == keep_re
    # per-doc dominance: strip-everywhere removes at least as much,
    # doc by doc (keep-first spans are a subset of its spans)
    strip = {
        r.doc_id: r.n_removed
        for r in strip_repeated_spans(df, k=4).collect()
    }
    # strip_repeated_spans only counts CROSS-DOC duplication; keep-first
    # also strips within-doc repeats, so dominance holds only on the
    # cross-doc component. Compare against a corpus with every doc
    # duplicated under fresh ids, where all duplication is cross-doc
    # and every window's canonical copy lives in the original doc ids.
    dup_rows = rows + [(i + 1000, t) for i, t in rows]
    ddf = spark.createDataFrame(dup_rows, "doc_id long, text string")
    keep_d = {
        r.doc_id: r for r in exactsubstr_keep_first(ddf, k=4).collect()
    }
    strip_d = {
        r.doc_id: r.n_removed
        for r in strip_repeated_spans(ddf, k=4).collect()
    }
    for i, _ in dup_rows:
        assert keep_d[i].n_removed <= strip_d[i], (
            i, keep_d[i].n_removed, strip_d[i]
        )
    # every clone (>=k tokens) is fully stripped — its every window's
    # canonical occurrence is at the lower (doc_id, pos)... unless the
    # ORIGINAL doc repeats the window internally; either way the clone
    # holds no canonical occurrence of a window ALSO when the original
    # doc_id is smaller, so the clone must lose every windowable token
    for i, t in rows:
        if n_toks[i] >= 4:
            assert keep_d[i + 1000].n_removed == n_toks[i], t
