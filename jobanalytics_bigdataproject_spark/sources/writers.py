"""Writers: parquet sink (SURVEY.md §2.1 S3) + partitioned-write [EXT].

The reference materializes every pipeline stage with
``df.write.mode("overwrite").parquet(path)``
(reference code/01_DataPreprocessing.scala:68,205-208,249,307). We keep that
sink and add what a 100 TB deployment needs and the reference lacks:

- ``partition_by`` (e.g. date) so downstream reads get partition pruning;
- ``max_records_per_file`` to bound file sizes (small-file problem at scale
  is the writer's responsibility, AQE coalescing handles the shuffle side);
- optional ``bucket_by`` via ``saveAsTable`` for shuffle-free co-located
  joins on the bucketing key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Parquet sink mirroring reference S3, plus scale knobs."""
    writer = df.write.mode(mode)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_cols: Sequence[str],
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    range_partition: bool = True,
    num_partitions: int | None = None,
) -> None:
    """[EXT] Range-clustered parquet sink: ``repartitionByRange`` on
    ``sort_cols`` (files cover disjoint value ranges) + ``sortWithinPartitions``
    (row groups inside each file stay narrow too). Result: parquet min/max
    footer statistics become selective, so later range/point filters on
    those columns skip whole files and row groups at scan time (verified
    from the footers in tests). Costs ONE range-exchange at write time —
    the standard clustering trade: pay once at ingest, every subsequent
    scan with a ``sort_cols`` predicate reads a fraction of the data.
    ``range_partition=False`` keeps the current partitioning (no shuffle)
    and only sorts within tasks — narrows row groups inside multi-group
    files but not across files."""
    if range_partition:
        df = (
            df.repartitionByRange(num_partitions, *sort_cols)
            if num_partitions
            else df.repartitionByRange(*sort_cols)
        )
    writer = df.sortWithinPartitions(*sort_cols).write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def zorder_key_n(xs, bits: int = 16):
    """[EXT] k-dimensional Morton (Z-order) key: interleave the low
    ``bits`` bits of k non-negative integer columns (column j takes bit
    positions ``i*k + j``). Built from shift/and/or expressions only —
    whole-stage codegen, no UDF — and the same bit math is expressible in
    any SQL engine (the oracle replays it). ``k * bits`` must fit a signed
    long (≤ 63); callers normalize inputs to [0, 2^bits) first (``pmod``
    for hash-like keys, min-max scaling for value clustering — see
    ``write_zorder_parquet``). Real layouts cluster 3–4 columns
    (date × key × category); past ~4 the per-dimension resolution
    (63/k bits) stops buying pruning — the usual Z-order guidance."""
    from pyspark.sql import functions as F

    xs = list(xs)
    k = len(xs)
    if k < 1:
        raise ValueError("zorder_key_n needs at least one column")
    if k * int(bits) > 63:
        raise ValueError(
            f"{k} columns x {bits} bits = {k * int(bits)} key bits > 63 "
            f"(a signed long); lower bits to <= {63 // k}"
        )
    z = None
    for i in range(int(bits)):
        for j, x in enumerate(xs):
            e = F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), i * k + j)
            z = e if z is None else z.bitwiseOR(e)
    return z


def zorder_key(x, y, bits: int = 16):
    """[EXT] Two-dimensional Morton key (x → even bit positions, y → odd);
    the k=2 case of ``zorder_key_n``, kept as the common-shape entry."""
    return zorder_key_n((x, y), bits)


def _minmax_scaled_axes(df: DataFrame, cols: Sequence[str], bits: int | None = None):
    """[EXT] Min-max-scale ``cols`` to ``bits`` bits each (ONE tiny bounds
    aggregation, broadcast back — metadata-cheap at any scale). Returns
    ``(scaled_df, axis_exprs, drop_cols, bits_used)``. A constant column
    scales to 0 (no information, no key contribution). Shared by the
    Morton and Hilbert clustered writers; bits defaults to the finest
    per-dimension resolution that fits a long: ``min(16, 63 // k)``."""
    from pyspark.sql import functions as F

    cols = [str(c) for c in cols]
    k = len(cols)
    if bits is None:
        bits = min(16, 63 // k)
    exprs = [F.col(c).cast("double") for c in cols]
    bounds = df.agg(
        *[
            agg
            for j, e in enumerate(exprs)
            for agg in (F.min(e).alias(f"__min{j}"), F.max(e).alias(f"__max{j}"))
        ]
    )
    top = (1 << int(bits)) - 1
    scaled = df.crossJoin(F.broadcast(bounds))
    axes = []
    drop = []
    for j, e in enumerate(exprs):
        lo, hi = F.col(f"__min{j}"), F.col(f"__max{j}")
        axes.append(
            F.when(hi > lo, (e - lo) / (hi - lo) * top)
            .otherwise(F.lit(0))
            .cast("long")
        )
        drop += [f"__min{j}", f"__max{j}"]
    return scaled, axes, drop, int(bits)


def zorder_scaled_key(df: DataFrame, cols: Sequence[str], bits: int | None = None):
    """[EXT] ``(df_with___zkey, bits_used)`` — min-max-scaled Morton key;
    see ``_minmax_scaled_axes``. Used by ``write_zorder_parquet`` and
    ``optimize_snapshot(zorder_by=…)``."""
    scaled, axes, drop, bits = _minmax_scaled_axes(df, cols, bits)
    return scaled.withColumn("__zkey", zorder_key_n(axes, bits)).drop(*drop), bits


def hilbert_index_np(axes, bits: int):
    """[EXT] Vectorized Hilbert index (Skilling 2004, "Programming the
    Hilbert curve" — public algorithm, re-derived here in numpy): map an
    (n, k) array of ``bits``-bit axis values to their positions on the
    k-dimensional Hilbert curve. Unlike Morton order, CONSECUTIVE curve
    positions are always adjacent cells (unit Manhattan step — tested as
    the defining property), so clustered files cover tighter regions:
    Morton's worst-case 'seam jumps' (e.g. 0x0FFF..→0x1000.. crossing the
    whole space) don't exist on the Hilbert curve."""
    import numpy as np

    X = np.asarray(axes, dtype=np.uint64).copy()
    if X.ndim != 2:
        raise ValueError(f"expected (n, k) axes, got shape {X.shape}")
    n, k = X.shape
    one = np.uint64(1)
    # Skilling AxesToTranspose: inverse-undo pass then Gray decode
    Q = np.uint64(1) << np.uint64(bits - 1)
    while Q > one:
        P = Q - one
        for i in range(k):
            mask = (X[:, i] & Q) != 0
            X[mask, 0] ^= P
            nm = ~mask
            t = (X[nm, 0] ^ X[nm, i]) & P
            X[nm, 0] ^= t
            X[nm, i] ^= t
        Q >>= one
    for i in range(1, k):
        X[:, i] ^= X[:, i - 1]
    t = np.zeros(n, dtype=np.uint64)
    Q = np.uint64(1) << np.uint64(bits - 1)
    while Q > one:
        mask = (X[:, k - 1] & Q) != 0
        t[mask] ^= Q - one
        Q >>= one
    for i in range(k):
        X[:, i] ^= t
    # interleave the transposed coordinates into the scalar curve index
    z = np.zeros(n, dtype=np.uint64)
    for q in range(bits - 1, -1, -1):
        for i in range(k):
            z = (z << one) | ((X[:, i] >> np.uint64(q)) & one)
    return z.astype(np.int64)


def hilbert_scaled_key(df: DataFrame, cols: Sequence[str], bits: int | None = None):
    """[EXT] ``(df_with___zkey, bits_used)`` — min-max-scaled HILBERT key.

    The Skilling transform carries data-dependent per-bit state, which
    does not unroll into a sane codegen expression the way the Morton
    interleave does (the collapsed projection tree grows exponentially),
    so the key is computed in ONE vectorized Arrow batch pass — the
    sanctioned boundary, at write time only; reads never pay it."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    scaled, axes, drop, bits = _minmax_scaled_axes(df, cols, bits)
    b = bits

    @pandas_udf("long")
    def hkey(*series):
        import numpy as np
        import pandas as pd

        stacked = np.stack([s.to_numpy(dtype="int64") for s in series], axis=1)
        return pd.Series(hilbert_index_np(stacked, b))

    tmp = [f"__ax{j}" for j in range(len(axes))]
    out = scaled
    for name, e in zip(tmp, axes):
        out = out.withColumn(name, e)
    return (
        out.withColumn("__zkey", hkey(*[F.col(c) for c in tmp])).drop(*drop, *tmp),
        bits,
    )


def write_hilbert_parquet(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int | None = None,
    mode: str = "overwrite",
    num_partitions: int | None = None,
) -> None:
    """[EXT] Hilbert-clustered parquet sink — same contract and cost shape
    as ``write_zorder_parquet`` (one bounds pass + one range exchange),
    but files cover tighter regions of the clustered space: the Hilbert
    curve has no Morton seam jumps, so a file's min/max bounding box per
    column is never stretched by a cross-space discontinuity. The win is
    real on range predicates spanning Morton seams and bounded elsewhere
    (measured in tests/test_zorder.py's skipping comparison)."""
    keyed, _ = hilbert_scaled_key(df, cols, bits)
    keyed = (
        keyed.repartitionByRange(num_partitions, "__zkey")
        if num_partitions
        else keyed.repartitionByRange("__zkey")
    )
    keyed.sortWithinPartitions("__zkey").drop("__zkey").write.mode(mode).parquet(path)


def write_zorder_parquet(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int | None = None,
    mode: str = "overwrite",
    num_partitions: int | None = None,
) -> None:
    """[EXT] Z-order-clustered parquet sink for k-dimensional locality:
    each column is min-max-scaled (one tiny extra aggregation pass for the
    bounds, broadcast back), rows are range-partitioned and sorted by the
    interleaved Morton key, then the key is dropped before writing.
    Result: every file covers a compact HYPER-RECTANGLE in the clustered
    columns' space, so parquet min/max footer stats prune files for
    predicates on ANY clustered column — the property a single-column
    sort can only give to its leading column. This is the standard
    lakehouse OPTIMIZE ZORDER BY layout, paid once at ingest.
    (Linear-scan clustering; at 100 TB the bounds pass is metadata-cheap
    and the single range exchange is the same cost as any sorted write.)"""
    keyed, _ = zorder_scaled_key(df, cols, bits)
    keyed = (
        keyed.repartitionByRange(num_partitions, "__zkey")
        if num_partitions
        else keyed.repartitionByRange("__zkey")
    )
    keyed.sortWithinPartitions("__zkey").drop("__zkey").write.mode(mode).parquet(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """[EXT] JSON-lines sink — interchange format for downstream tools that
    don't speak parquet; not a scale format (no column pruning), so keep it
    at pipeline edges."""
    df.write.mode(mode).json(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
) -> None:
    """[EXT] ORC sink with the same partitioning knob as the parquet one."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: repeated joins/aggs on ``bucket_cols`` become
    shuffle-free (both sides pre-hashed into the same bucket layout). This is
    the [EXT] scale path for fact-fact joins the reference never needed."""
    writer = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
