"""Property-based tests (SURVEY.md §5.2 item 3, hypothesis): the
cross-engine determinism helpers must agree with DuckDB on *arbitrary*
inputs, not just the fixtures; tokenization must be idempotent."""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

money = st.integers(min_value=-(10**9), max_value=10**9).map(lambda c: c / 100.0)

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(vals=st.lists(money, min_size=1, max_size=40))
@SET
def test_money_avg_matches_duckdb(spark, vals):
    from jobanalytics_bigdataproject_spark.functions.exact import money_avg

    got = (
        spark.createDataFrame([(v,) for v in vals], ["x"])
        .agg(money_avg("x").alias("a"))
        .first()
        .a
    )
    want = duckdb.execute(
        """SELECT ROUND(ROUND(SUM(CAST(ROUND(x*100) AS BIGINT))*1.0/COUNT(x))/100.0, 2)
           FROM (SELECT unnest(?) AS x)""",
        [vals],
    ).fetchone()[0]
    assert got == want


@given(
    num=st.integers(min_value=0, max_value=10**6),
    den=st.integers(min_value=1, max_value=10**6),
)
@SET
def test_exact_div_matches_duckdb(spark, num, den):
    from jobanalytics_bigdataproject_spark.functions.exact import exact_div

    got = (
        spark.range(1)
        .select(exact_div(F.lit(num), F.lit(den), 4).alias("r"))
        .first()
        .r
    )
    want = duckdb.execute(
        "SELECT ROUND(10000.0*?/NULLIF(?,0))/10000.0", [num, den]
    ).fetchone()[0]
    assert got == want


@given(vals=st.lists(money, min_size=2, max_size=31))
@SET
def test_money_median_matches_duckdb(spark, vals):
    from jobanalytics_bigdataproject_spark.functions.exact import money_median

    got = (
        spark.createDataFrame([(v,) for v in vals], ["x"])
        .agg(money_median("x").alias("m"))
        .first()
        .m
    )
    want = duckdb.execute(
        """SELECT ROUND(ROUND(MEDIAN(CAST(ROUND(x*100) AS BIGINT)))/100.0, 2)
           FROM (SELECT unnest(?) AS x)""",
        [vals],
    ).fetchone()[0]
    assert got == want


@given(
    text=st.text(
        alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Zs", "Po")),
        max_size=80,
    )
)
@SET
def test_tokenize_idempotent(spark, text):
    from jobanalytics_bigdataproject_spark.functions.textfns import tokenize

    df = spark.createDataFrame([(text,)], ["t"])
    once = df.select(tokenize("t").alias("tok"))
    twice = once.select(
        F.array_join("tok", " ").alias("t")
    ).select(tokenize("t").alias("tok"))
    assert once.first().tok == twice.first().tok


def test_percentile_accuracy_report_bounds(spark, tables):
    """GK sketch at accuracy=1000 must sit within ~1% rank error of exact;
    on this distribution that is well under 500bp of value error, and the
    err_bp column must be consistent with its inputs."""
    from jobanalytics_bigdataproject_spark.operators.sampling import (
        percentile_accuracy_report,
    )

    rows = percentile_accuracy_report(tables["lineitem"]).collect()
    assert len(rows) == 9  # 3 groups x 3 probabilities
    for r in rows:
        assert r.err_bp < 500, (r.grp, r.p, r.err_bp)


def test_weighted_sample_determinism_and_bias(spark, tables):
    from pyspark.sql import functions as F

    from jobanalytics_bigdataproject_spark.operators.sampling import weighted_sample

    docs = tables["documents"]
    s1 = sorted(r.doc_id for r in weighted_sample(docs, "doc_id", "n_chars", 30).collect())
    s2 = sorted(r.doc_id for r in weighted_sample(docs, "doc_id", "n_chars", 30).collect())
    assert s1 == s2
    assert len(s1) == 30
    # weight bias: mean n_chars of the weighted sample should exceed the
    # corpus mean (longer docs drawn more often)
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    sample_mean = (
        docs.join(spark.createDataFrame([(i,) for i in s1], "doc_id long"), "doc_id")
        .agg(F.avg("n_chars")).first()[0]
    )
    assert sample_mean > corpus_mean


def test_expect_counts_violations_in_one_pass(spark):
    from pyspark.sql import functions as F

    from jobanalytics_bigdataproject_spark.operators.profile import expect

    df = spark.createDataFrame(
        [(1, 10.0, "A"), (2, -5.0, "B"), (3, 20.0, "ZZZ"), (4, None, "A")],
        "id long, v double, cat string",
    )
    rows = {r.rule: (r.violations, r.total, r.pass_bp) for r in expect(df, {
        "v_positive": F.col("v") > 0,
        "cat_known": F.col("cat").isin("A", "B"),
    }).collect()}
    # NULL v: predicate NULL -> ~NULL is NULL -> when() doesn't fire -> not
    # counted as a violation; nullness needs its own rule (document this)
    assert rows["v_positive"] == (1, 4, 7500.0)
    assert rows["cat_known"] == (1, 4, 7500.0)


@given(
    tgt=st.dictionaries(
        st.integers(0, 20), st.one_of(st.none(), st.integers(-100, 100)), max_size=12
    ),
    src=st.dictionaries(
        st.integers(0, 20), st.one_of(st.none(), st.integers(-100, 100)), max_size=12
    ),
)
@SET
def test_merge_upsert_is_dict_update(spark, tgt, src):
    """merge_upsert on arbitrary keyed frames must equal python
    ``{**tgt, **src}`` — MERGE's matched-update + unmatched-insert IS the
    dict-merge law, including NULL source values winning on match."""
    from jobanalytics_bigdataproject_spark.operators.scd import merge_upsert

    schema = "k long, v long"
    t = spark.createDataFrame(list(tgt.items()) or [], schema)
    s = spark.createDataFrame(list(src.items()) or [], schema)
    got = {r.k: r.v for r in merge_upsert(t, s, ("k",)).collect()}
    assert got == {**tgt, **src}


@given(
    edges=st.sets(
        st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=20,
    )
)
@SET
def test_pagerank_micro_conserves_mass(spark, edges):
    """Damped integer PageRank on an undirected graph: every node's rank
    stays within [base, n·10⁶], the total leaks only by truncation
    (bounded by damping_pct·n per round), and results match the pure
    integer recurrence regardless of Spark's execution order."""
    from jobanalytics_bigdataproject_spark.operators.joins import pagerank_micro

    df = spark.createDataFrame(sorted(edges), "id_a long, id_b long")
    rows = pagerank_micro(df, n_iter=3).collect()
    nodes = {n for e in edges for n in e}
    assert len(rows) == len(nodes)
    total = sum(r.rank_micro for r in rows)
    n = len(nodes)
    # each round truncates < 1 unit per (edge-endpoint + node) in div ops
    assert n * 1_000_000 >= total > n * 1_000_000 - 3 * (2 * len(edges) + n) * 100
    assert all(150_000 <= r.rank_micro <= n * 1_000_000 for r in rows)


# --- stateful model check of the versioned-table stack -----------------
# A random sequence of table operations is applied BOTH to the real
# snapshot log and to a trivial pure-Python model (a list of version ->
# multiset states). After every op: read_snapshot == model, and the
# metadata-only COUNT (manifest row counts) == len(model state) — so
# every commit path maintains the row-count map correctly under
# composition, not just in the per-feature tests.

_op = st.one_of(
    st.tuples(st.just("append"), st.lists(st.integers(0, 9), min_size=1, max_size=5)),
    st.tuples(st.just("delete_le"), st.integers(0, 9)),
    st.tuples(st.just("optimize"), st.just(0)),
    st.tuples(st.just("rollback"), st.just(0)),
    # key-only MERGE: matched keys keep every copy (update with zero
    # value columns rewrites the hit files in place), absent keys insert
    st.tuples(
        st.just("merge"),
        st.lists(st.integers(0, 9), min_size=1, max_size=4, unique=True),
    ),
    # round-4 DML surface: merge-on-read delete/update (deletion
    # vectors), copy-on-write update (shifts keys by +10), materialize
    st.tuples(st.just("mor_delete_le"), st.integers(0, 9)),
    st.tuples(st.just("mor_update_shift"), st.integers(0, 9)),
    st.tuples(st.just("cow_update_shift"), st.integers(0, 9)),
    st.tuples(st.just("materialize"), st.just(0)),
)


@given(ops=st.lists(_op, min_size=1, max_size=6))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_snapshot_stack_matches_model(spark, tmp_path_factory, ops):
    from collections import Counter

    import pytest as _pytest

    from jobanalytics_bigdataproject_spark.sources import snapshots as sn

    tdir = str(tmp_path_factory.mktemp("prop") / "tbl")
    states: list[Counter] = []  # model: states[v-1] = multiset at version v
    has_dvs = False  # model: does the head carry deletion vectors?

    for kind, arg in ops:
        if kind == "append":
            sn.write_snapshot(
                spark.createDataFrame([(v,) for v in arg], "i long"), tdir
            )
            prev = states[-1] if states else Counter()
            states.append(prev + Counter(arg))
            # appends carry the parent's deletion vectors: has_dvs holds
        elif kind == "delete_le":
            if not states:
                continue
            if has_dvs:
                # COW over a vectored table must refuse BEFORE any probe,
                # even when the condition would match nothing
                with _pytest.raises(ValueError, match="materialize_dvs"):
                    sn.delete_where(spark, tdir, f"i <= {arg}")
            else:
                res = sn.delete_where(spark, tdir, f"i <= {arg}")
                cur = Counter({k: n for k, n in states[-1].items() if k > arg})
                if res["rows_deleted"] > 0:
                    states.append(cur)  # only a real delete commits
                # no-match delete: model state unchanged, no new version
        elif kind == "mor_delete_le":
            if not states:
                continue
            res = sn.delete_where_mor(spark, tdir, f"i <= {arg}")
            if res["rows_deleted"] > 0:
                states.append(
                    Counter({k: n for k, n in states[-1].items() if k > arg})
                )
                has_dvs = True
        elif kind == "cow_update_shift":
            if not states:
                continue
            if has_dvs:
                with _pytest.raises(ValueError, match="materialize_dvs"):
                    sn.update_where(spark, tdir, {"i": "i + 10"}, f"i <= {arg}")
            else:
                res = sn.update_where(spark, tdir, {"i": "i + 10"}, f"i <= {arg}")
                if res["rows_updated"] > 0:
                    cur = Counter()
                    for k, n in states[-1].items():
                        cur[k + 10 if k <= arg else k] += n
                    states.append(cur)
        elif kind == "mor_update_shift":
            if not states:
                continue
            res = sn.update_where_mor(spark, tdir, {"i": "i + 10"}, f"i <= {arg}")
            if res["rows_updated"] > 0:
                cur = Counter()
                for k, n in states[-1].items():
                    cur[k + 10 if k <= arg else k] += n
                states.append(cur)
                has_dvs = True
        elif kind == "materialize":
            if not states:
                continue
            res = sn.materialize_dvs(spark, tdir)
            assert (res["files_rewritten"] > 0) == has_dvs
            if has_dvs:
                states.append(Counter(states[-1]))  # same logical rows
                has_dvs = False
        elif kind == "optimize":
            if not states:
                continue
            # the full rewrite reads DV-aware and overwrites: on a
            # vectored table it doubles as materialize (dvs cleared)
            sn.optimize_snapshot(spark, tdir)
            states.append(Counter(states[-1]))
            has_dvs = False
        elif kind == "rollback":
            if len(states) < 2:
                continue
            sn.rollback(spark, tdir, to_version=1)
            states.append(Counter(states[0]))
            has_dvs = False  # v1 is always the first append, never vectored
        elif kind == "merge":
            if not states:
                continue
            if has_dvs:
                src = spark.createDataFrame([(v,) for v in sorted(arg)], "i long")
                with _pytest.raises(ValueError, match="materialize_dvs"):
                    sn.merge_into(spark, tdir, src, ("i",))
            else:
                src = spark.createDataFrame([(v,) for v in sorted(arg)], "i long")
                sn.merge_into(spark, tdir, src, ("i",))
                prev = states[-1]
                states.append(prev + Counter(k for k in arg if k not in prev))

        if states:
            got = Counter(r.i for r in sn.read_snapshot(spark, tdir).collect())
            assert got == states[-1]
            assert sn.metadata_agg(spark, tdir)["n_rows"] == sum(
                states[-1].values()
            )
            assert sn.current_version(spark, tdir) == len(states)


# --- three-way composition model: column mapping × partition spec × DVs
# (VERDICT r5 #10). The table is PARTITIONED (identity p + derived
# bucket(2, i)); ops mix MOR deletes (deletion vectors), renames (column
# mapping), rollback and materialization. The model tracks the multiset
# of i, plus three booleans (mapped / has_dvs / spec_live); after every
# op the real read, the metadata COUNT, time travel to v1, and every
# refusal must match the model.

_op3 = st.one_of(
    st.tuples(st.just("append"), st.lists(st.integers(0, 9), min_size=1, max_size=4)),
    st.tuples(st.just("mor_delete_le"), st.integers(0, 9)),
    st.tuples(st.just("cow_delete_le"), st.integers(0, 9)),
    st.tuples(st.just("rename_v"), st.just(0)),
    st.tuples(st.just("rename_bucket_src"), st.just(0)),
    st.tuples(st.just("materialize_mapping"), st.just(0)),
    st.tuples(st.just("materialize_dvs"), st.just(0)),
    st.tuples(st.just("rollback"), st.just(0)),
)


@given(ops=st.lists(_op3, min_size=2, max_size=6))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_mapping_spec_dv_composition_matches_model(spark, tmp_path_factory, ops):
    from collections import Counter

    import pytest as _pytest

    from jobanalytics_bigdataproject_spark.sources import snapshots as sn

    tdir = str(tmp_path_factory.mktemp("prop3") / "tbl")

    def frame(keys, vname):
        return spark.createDataFrame(
            [(k, k % 3, f"s{k}") for k in keys],
            f"i long, p long, {vname} string",
        )

    states: list[Counter] = []
    mapped = False     # column_mapping present on the head
    has_dvs = False    # head carries deletion vectors
    spec_live = True   # head still has the v1 partition spec
    vname = "v"        # current logical name of the renameable column

    for kind, arg in ops:
        if kind == "append":
            if not states:
                sn.write_snapshot(
                    frame(arg, vname), tdir,
                    partition_by=("p", "bucket(2, i)"),
                )
            else:
                sn.write_snapshot(frame(arg, vname), tdir)
            prev = states[-1] if states else Counter()
            states.append(prev + Counter(arg))
        elif kind == "mor_delete_le":
            if not states:
                continue
            if mapped:
                with _pytest.raises(ValueError, match="column-mapped"):
                    sn.delete_where_mor(spark, tdir, f"i <= {arg}")
            else:
                res = sn.delete_where_mor(spark, tdir, f"i <= {arg}")
                if res["rows_deleted"] > 0:
                    states.append(
                        Counter({k: n for k, n in states[-1].items() if k > arg})
                    )
                    has_dvs = True
        elif kind == "cow_delete_le":
            if not states:
                continue
            if mapped:
                with _pytest.raises(ValueError, match="column-mapped"):
                    sn.delete_where(spark, tdir, f"i <= {arg}")
            elif has_dvs:
                with _pytest.raises(ValueError, match="materialize_dvs"):
                    sn.delete_where(spark, tdir, f"i <= {arg}")
            else:
                res = sn.delete_where(spark, tdir, f"i <= {arg}")
                if res["rows_deleted"] > 0:
                    states.append(
                        Counter({k: n for k, n in states[-1].items() if k > arg})
                    )
        elif kind == "rename_v":
            # renaming a NON-partition column is always a legal
            # metadata-only commit, even on a DV-carrying partitioned
            # table — reads keep excluding vectored rows afterwards
            if not states or vname != "v":
                continue
            sn.rename_column(spark, tdir, "v", "w")
            states.append(Counter(states[-1]))
            mapped, vname = True, "w"
        elif kind == "rename_bucket_src":
            # i is the SOURCE of the derived bucket(2, i) entry: rename
            # must refuse while the spec is live (the label cannot be
            # rewritten), and commit nothing
            if not states or not spec_live:
                continue
            with _pytest.raises(ValueError, match="derived partition"):
                sn.rename_column(spark, tdir, "i", "j")
        elif kind == "materialize_mapping":
            # full-rewrite overwrite: logical names become physical,
            # mapping/DVs/spec all reset (overwrite semantics)
            if not states or not mapped:
                continue
            sn.write_snapshot(
                sn.read_snapshot(spark, tdir), tdir, mode="overwrite"
            )
            states.append(Counter(states[-1]))
            mapped, has_dvs, spec_live = False, False, False
        elif kind == "materialize_dvs":
            if not states:
                continue
            if mapped:
                with _pytest.raises(ValueError, match="column-mapped"):
                    sn.materialize_dvs(spark, tdir)
            else:
                res = sn.materialize_dvs(spark, tdir)
                assert (res["files_rewritten"] > 0) == has_dvs
                if has_dvs:
                    states.append(Counter(states[-1]))
                    has_dvs = False
        elif kind == "rollback":
            if len(states) < 2:
                continue
            sn.rollback(spark, tdir, to_version=1)
            states.append(Counter(states[0]))
            # v1: partitioned first append — unmapped, no DVs, spec live
            mapped, has_dvs, spec_live, vname = False, False, True, "v"

        if states:
            got = Counter(r.i for r in sn.read_snapshot(spark, tdir).collect())
            assert got == states[-1]
            assert sn.metadata_agg(spark, tdir)["n_rows"] == sum(
                states[-1].values()
            )
            assert sn.current_version(spark, tdir) == len(states)
            # the head's table-level keys match the model's booleans
            man = sn.snapshot_info(
                spark, tdir, sn.current_version(spark, tdir)
            )
            assert (man.get("column_mapping") is not None) == mapped
            assert bool(man.get("dvs")) == has_dvs
            assert bool(man.get("partition_spec")) == spec_live

    # time travel to v1 still shows the first append, whatever happened
    if states:
        v1 = Counter(r.i for r in sn.read_snapshot(spark, tdir, version=1).collect())
        assert v1 == states[0]


# --- exact-substring dedup invariants on arbitrary corpora (round 8) ---

_doc = st.lists(
    st.sampled_from("aa bb cc dd ee".split()), min_size=0, max_size=30
).map(" ".join)


@given(texts=st.lists(_doc, min_size=1, max_size=6), k=st.integers(3, 5))
@SET
def test_substring_dedup_laws_hold_on_arbitrary_corpora(spark, texts, k):
    """For ANY corpus over a tiny vocabulary (maximal shingle collisions
    — the stress case): spans stay inside their doc's token range and
    never overlap, the removal obeys n_tokens_after == n_tokens − span
    union, and the hashed shuffle key changes nothing."""
    from jobanalytics_bigdataproject_spark.operators import substring

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    spans = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in substring.duplicate_spans(df, k=k).collect()
    )
    n_tok = {
        r.doc_id: r.n
        for r in df.select(
            "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n")
        ).collect()
    }
    prev = {}
    covered: dict[int, int] = {}
    for did, s, e in spans:
        assert 0 <= s <= e < n_tok[did]
        if did in prev:
            assert s > prev[did] + 1  # disjoint, non-adjacent (else merged)
        prev[did] = e
        covered[did] = covered.get(did, 0) + (e - s + 1)
    out = {r.doc_id: r for r in substring.remove_duplicate_spans(df, k=k).collect()}
    for did, r in out.items():
        assert r.n_tokens_after == r.n_tokens - covered.get(did, 0)
    hashed = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in substring.duplicate_spans(df, k=k, hash_shingles=True).collect()
    )
    assert hashed == spans
