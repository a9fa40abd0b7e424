"""Measured sf0.1 -> sf1 scaling exponents for the most expensive query
families (VERDICT r3 #7: SCALE.md argued O()-shapes with no measurement
a decade of scale up backing them).

Builds a synthetic sf1 (10x sf0.1) under /tmp by unioning 10 key-offset
copies of every fact table — dims (region/nation) stay as-is, foreign
keys shift together so join selectivity per row is UNCHANGED, and the
content columns that drive similarity operators are made copy-distinct
so candidate-pair structure scales linearly instead of quadratically
(what an organic 10x corpus does):

- documents.text: every word suffixed ``_i`` in copy i -> zero shingle
  overlap across copies; MinHash/SimHash clusters replicate, not merge.
- customer.c_name: suffixed ``-i`` -> distance-1 blocks replicate.
- embeddings.embedding: copy-dependent sign-flip pattern -> copies are
  near-orthogonal, not 10-cliques of exact duplicates.

Then runs the probe queries once untimed (prime) + ``--runs`` timed at
both scales in ONE session and reports the wall-time exponent
``log(t_sf1/t_sf0.1)/log(10)`` — 1.0 = linear, <1 = sublinear (fixed
overhead amortizing), >1 = superlinear (a shape to explain or fix).

Usage: python tools/scale_probe.py [--runs 2] [--rebuild]
Writes tools/scale_probe_result.json; SCALE.md's exponent table is
pasted from that artifact.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/sf1_scaled"
COPIES = 10
OFF = 100_000_000  # key offset per copy; far above any sf0.1 key

# top-cost queries from the round bench plus one reference per family
# (scan-agg, multi-join, window). Index-backed ANN paths (ann_cosine_ivf*,
# ann_cosine_pq, ann_recall_report, docs_incremental_dedup) are excluded:
# their first call at a new sf_dir measures index INGEST, which SCALE.md
# treats separately from the query path.
PROBES = [
    "q1_pricing_summary",
    "tpch_q18_large_volume",
    "customer_rolling_spend",
    "events_sessionize",
    "t2_price_tiers",
    "percentiles_price",
    "percentile_accuracy_report",
    "lineitem_mad_outliers",
    "customer_fuzzy_pairs",
    "fuzzy_graph_triangles",
    "docs_neardup_dedup",
    "docs_corpus_pipeline",
    "embeddings_semantic_dedup",
    "ml_price_model",
    # round-4 lakehouse family: the first (untimed) call builds the
    # versioned snapshot tables at that sf (ingest, measured separately
    # per SCALE.md); the timed runs measure the QUERY path — scan-after-
    # delete (linear), metadata-only agg (flat), CDF read of changed
    # files (linear in churn), IVM read after a no-op refresh (flat+agg)
    "orders_delete_propagation",
    "orders_snapshot_metadata_agg",
    "orders_cdf_deletes",
    "orders_ivm_agg",
    # Bloom point lookup: timed run scans only the ~2 kept files, so the
    # exponent tracks kept-file size (vs 1.0 for the oracle's full scan);
    # merge/cdc timed runs measure the applied table's scan-after-merge
    "orders_point_lookup",
    "orders_snapshot_merge",
    "orders_cdc_apply",
    # DML-triad + deletion-vector family: timed runs measure the read
    # path over the mutated table — retention expiry and the COW update
    # scan the rewritten/carried files (linear in survivors), the MOR
    # pair scans with the position anti-join applied (linear + a small
    # DV-side join whose build side is the deleted cohort)
    "orders_retention_expiry",
    "orders_update_redaction",
    "orders_mor_delete",
    "orders_mor_update",
    # ingest prime runs the exact-dedup pass + the key-set MOR commit;
    # timed runs measure the deduped corpus scan with vectors applied
    "docs_dedup_mor_delete",
    # MOR CDC apply: timed runs scan the applied table with the
    # vector anti-join (same oracle as the COW twin)
    "orders_cdc_apply_mor",
    # index-backed ANN SERVING paths (VERDICT r4 #3): the per-(process,
    # sf_dir) index builds in the untimed prime (cluster-at-ingest,
    # measured separately like the lakehouse ingests); the timed runs
    # measure the query path — partition-pruned probed-cell scans, so the
    # exponent should sit well below 1 (the whole point of the index)
    "ann_cosine_ivf_indexed",
    "ann_cosine_ivfpq",
    # round 7: sharded Vamana graph serving — same cluster-at-ingest
    # prime discipline; the timed runs measure the probed-shard beam
    # search, which should stay flat like the IVF family (shard COUNT,
    # not shard size, absorbs the 10x)
    "ann_cosine_vamana",
    # round 8: exact-substring dedup — two linear shuffles (by shingle,
    # then by doc); the sf1 fixture's copy-distinct word suffixes keep
    # cross-copy spans from merging, so this measures the real per-token
    # cost, not a replication artifact
    "docs_substring_dedup",
    # round 9 (VERDICT r8 #10): the same pass with hash_shingles=True —
    # the 100-TB key representation (8-byte xxhash64 instead of the
    # k-gram string on the corpus-wide exchange); output bit-identical
    # to the raw run, so the delta vs docs_substring_dedup isolates the
    # exchange-width saving
    "docs_substring_dedup_hashed",
    # round 10 (VERDICT r9 #8): the STORE-BACKED substring passes — the
    # steady-state configuration. The untimed prime seeds the bucketed
    # stores at that sf (ingest, measured separately like the index
    # builds); the timed runs probe history as 8-byte keys through the
    # Exchange-free bucketed scan, so both should scale like the hashed
    # batch pass (~0.06), not the raw one (0.16)
    "docs_substring_decontaminate_store",
    "docs_substring_incremental",
    # round 7: LEFT SEMI interval-join batch twin (linear in events like
    # the outer twin) and MJPEG video near-dups (BOUNDED by the query's
    # 120-doc slice at any sf — the probe verifies the bound holds, i.e.
    # the exponent is ~0 BY CONSTRUCTION, not by luck)
    "events_interval_join_semi",
    "multimodal_video_neardups",
    # partitioned snapshot tables (round 5): the untimed prime builds the
    # partitioned table + the zero-I/O partition drop; timed runs measure
    # the pruned/aggregate read paths over the partition-split files
    "orders_partitioned_prune",
    "events_partitioned_daily",
    # round 6: stream-stream interval-join batch twin (left-outer) — the
    # state-path probe VERDICT r5 #9 asked for: wall-time should be linear
    # in events (one range-join per click within the horizon); the
    # streaming form's state is bounded by rows inside the watermark
    # horizon (see SCALE.md)
    "events_interval_join_outer",
    # round 6: spec-evolution read across the boundary (prune both specs)
    # and the bucketed shuffle-free snapshot join (prime builds tables)
    "orders_spec_evolution",
    "orders_bucketed_join",
]


def build_sf1(spark) -> None:
    from pyspark.sql import functions as F

    from jobanalytics_bigdataproject_spark.sources.readers import read_table

    os.makedirs(SF1, exist_ok=True)
    key_cols = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
    for t in ("region", "nation"):
        read_table(spark, SF01, t).write.mode("overwrite").parquet(f"{SF1}/{t}.parquet")
    for t, keys in key_cols.items():
        base = read_table(spark, SF01, t)
        parts = []
        for i in range(COPIES):
            c = base
            for kcol in keys:
                c = c.withColumn(kcol, F.col(kcol) + F.lit(i * OFF))
            if t == "documents":
                # copy-distinct shingles: suffix every word with the copy id
                c = c.withColumn(
                    "text",
                    F.array_join(
                        F.transform(F.split("text", " "), lambda w: F.concat(w, F.lit(f"_{i}"))),
                        " ",
                    ),
                )
            if t == "customer":
                c = c.withColumn("c_name", F.concat("c_name", F.lit(f"-{i}")))
            if t == "embeddings":
                # copy-dependent sign pattern -> copies near-orthogonal
                c = c.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, j: F.when((j * (i + 1)) % 5 < 2, -x).otherwise(x),
                    ),
                )
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{SF1}/{t}.parquet")
        print(f"  built {t}", flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--rebuild", action="store_true")
    ap.add_argument("--only", nargs="*", default=None,
                    help="probe only these names; results MERGE into the artifact")
    args = ap.parse_args()

    import bench
    import __spark_entry__ as mod
    from jobanalytics_bigdataproject_spark.session import get_spark

    spark = get_spark("scale-probe")
    if args.rebuild or not os.path.exists(f"{SF1}/lineitem.parquet"):
        print("building sf1 fixture (10x sf0.1)", flush=True)
        build_sf1(spark)

    qmap = mod.queries()
    probes = [n for n in PROBES if not args.only or n in args.only]
    result: dict[str, dict] = {}
    for sf_dir, tag in ((SF01, "sf0.1"), (SF1, "sf1")):
        for name in probes:
            fn = qmap[name]
            try:
                bench._time_once(fn, spark, sf_dir)  # prime
                runs = [bench._time_once(fn, spark, sf_dir) for _ in range(args.runs)]
            except Exception as e:  # noqa: BLE001
                print(f"  FAIL {name}@{tag}: {str(e)[:150]}", flush=True)
                continue
            med = round(statistics.median(runs), 3)
            result.setdefault(name, {})[tag] = med
            print(f"  {name}@{tag}: {med}", flush=True)

    for name, r in result.items():
        if "sf0.1" in r and "sf1" in r:
            r["exponent"] = round(math.log10(r["sf1"] / r["sf0.1"]), 2)

    # Vamana beam-visit fraction (VERDICT r7 #7): alongside the wall-time
    # exponent, measure what fraction of each probed shard the beam search
    # actually visits at both scales — the quantified IVFPQ-vs-Vamana
    # trade (IVF re-ranks the whole probed cell, fraction 1.0; the graph
    # walk's absolute visit count should stay near-flat as shards grow
    # 10x, so the fraction should DROP roughly 10x).
    if "ann_cosine_vamana" in probes:
        import tempfile

        from pyspark.sql import functions as F

        from jobanalytics_bigdataproject_spark.operators import vamana
        from jobanalytics_bigdataproject_spark.sources.readers import read_table

        vstats = {}
        for sf_dir, tag in ((SF01, "sf0.1"), (SF1, "sf1")):
            emb = read_table(spark, sf_dir, "embeddings")
            idx = tempfile.mkdtemp(prefix="vamana_visits_") + "/idx"
            vamana.vamana_build_index(emb, idx, n_shards=16, r=16, beam=32)
            rep = vamana.vamana_visit_report(
                spark, idx, emb.limit(32), n_probe=2, beam=32
            )
            row = rep.agg(
                F.avg("visited").alias("v"),
                F.avg("shard_size").alias("s"),
                F.avg(F.col("visited") / F.col("shard_size")).alias("f"),
            ).first()
            vstats[tag] = {
                "mean_visited": round(float(row["v"]), 1),
                "mean_shard_size": round(float(row["s"]), 1),
                "mean_visit_frac": round(float(row["f"]), 4),
            }
            print(f"  vamana visits@{tag}: {vstats[tag]}", flush=True)
        result["vamana_visit_fraction"] = vstats
    path = "/root/repo/tools/scale_probe_result.json"
    merged = result
    if args.only and os.path.exists(path):
        with open(path) as f:
            prior = json.load(f).get("probes", {})
        merged = {**prior, **result}
    with open(path, "w") as f:
        json.dump({"copies": COPIES, "runs": args.runs, "probes": merged}, f, indent=1)
    print(json.dumps(result, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
