"""Hypothesis soundness properties for the key-probe layers (pure
python — no SparkSession; the Spark-side parity of partition_expr vs
transform_value is pinned by tests/test_partition_transforms.py, and
the end-to-end probe by tests/test_keyprobe.py).

The directions that must NEVER be wrong, for any data:

1. a bloom filter never false-negatives an inserted value, across the
   producer-variant canonical forms (_canon): bytes vs bytearray,
   int vs the integral float Arrow->pandas widens it to, naive
   datetimes;
2. partition-set pruning never drops a file whose (single) partition
   holds a probe key;
3. the per-partition key bounds always contain every probe key of
   that partition — so the catalog's tightened range check can only
   drop files with NO in-partition key inside their [min, max].
"""

import datetime as dt

from hypothesis import given, settings, strategies as st

from no_jvm_wap_with_iceberg_spark.catalog.bloom import (
    bloom_may_contain,
    build_bloom,
)
from no_jvm_wap_with_iceberg_spark.catalog.keyprobe import (
    PartSet,
    file_survives,
    partition_key_bounds,
    partition_prunes_file,
)
from no_jvm_wap_with_iceberg_spark.catalog.table import FileEntry
from no_jvm_wap_with_iceberg_spark.catalog.transforms import (
    PartitionField,
    transform_value,
)

_scalars = st.one_of(
    st.integers(-(2**40), 2**40),
    st.text(alphabet=st.sampled_from("abXY01 _é'%\\"), max_size=24),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.binary(max_size=12),
    st.datetimes(
        min_value=dt.datetime(2020, 1, 1),
        max_value=dt.datetime(2030, 1, 1),
        timezones=st.none(),
    ),
)


@settings(max_examples=200, deadline=None)
@given(vals=st.lists(_scalars, min_size=1, max_size=40))
def test_bloom_never_false_negative(vals):
    hex_bloom = build_bloom(vals)
    for v in vals:
        assert bloom_may_contain(hex_bloom, v), repr(v)
        # producer variants must hash identically (_canon)
        if isinstance(v, bytes):
            assert bloom_may_contain(hex_bloom, bytearray(v))
        if isinstance(v, int) and not isinstance(v, bool):
            assert bloom_may_contain(hex_bloom, float(v)) or abs(v) > 2**52


_keys = st.text(
    alphabet=st.sampled_from("0123456789abcdef"), min_size=1, max_size=16
)
_width = st.integers(1, 4)


@settings(max_examples=200, deadline=None)
@given(
    file_key=_keys,
    probe=st.lists(_keys, min_size=1, max_size=30),
    width=_width,
)
def test_partition_prune_and_bounds_sound(file_key, probe, width):
    """Emulates partition_value_sets' output for a truncate(width)
    spec (same transform_value the planner uses) and asserts both
    soundness directions against a single-partition file."""
    fld = PartitionField(
        spec=f"truncate({width}, k)",
        source="k",
        transform="truncate",
        param=width,
    )
    values = frozenset(str(transform_value(fld, p)) for p in probe)
    bounds = {}
    for p in probe:
        pv = str(transform_value(fld, p))
        lo, hi = bounds.get(pv, (p, p))
        bounds[pv] = (min(lo, p), max(hi, p))
    ps = PartSet(0, [fld.name], values, bounds)
    f = FileEntry(
        path="f",
        rows=1,
        bytes=1,
        columns={"k": {"nulls": 0, "min": file_key, "max": file_key}},
        partition={fld.name: str(transform_value(fld, file_key))},
    )
    pruned = partition_prunes_file(f, [ps])
    if file_key in probe:
        # a true hit must survive the partition set...
        assert not pruned
        # ...and the tightened range check: its own partition's
        # bounds must contain it
        lo, hi = partition_key_bounds(f, [ps])[0]
        assert lo <= file_key <= hi
    if pruned:
        # pruning is only ever justified by partition-value mismatch
        assert str(transform_value(fld, file_key)) not in values
        assert file_key not in probe


@settings(max_examples=150, deadline=None)
@given(
    file_keys=st.lists(_keys, min_size=1, max_size=20),
    probe=st.lists(_keys, min_size=1, max_size=30),
    width=_width,
)
def test_tightened_range_check_keeps_every_true_hit(
    file_keys, probe, width
):
    """The catalog's combined check (partition set -> per-partition
    bounds vs file [min,max]) emulated exactly: any file holding a
    probe key must survive."""
    fld = PartitionField(
        spec=f"truncate({width}, k)",
        source="k",
        transform="truncate",
        param=width,
    )
    values = frozenset(str(transform_value(fld, p)) for p in probe)
    bounds = {}
    for p in probe:
        pv = str(transform_value(fld, p))
        lo, hi = bounds.get(pv, (p, p))
        bounds[pv] = (min(lo, p), max(hi, p))
    ps = PartSet(0, [fld.name], values, bounds)
    # files are partition-pure, like the real write path lays out
    by_part: dict = {}
    for k in file_keys:
        by_part.setdefault(str(transform_value(fld, k)), []).append(k)
    for pv, ks in by_part.items():
        f = FileEntry(
            path=f"f-{pv}",
            rows=len(ks),
            bytes=1,
            columns={"k": {"nulls": 0, "min": min(ks), "max": max(ks)}},
            partition={fld.name: pv},
        )
        survives = not partition_prunes_file(f, [ps])
        if survives:
            tight = partition_key_bounds(f, [ps]).get(0)
            if tight is not None:
                lo, hi = tight
                survives = not (max(ks) < lo or min(ks) > hi)
        holds_hit = any(p in ks for p in probe)
        if holds_hit:
            assert survives, (pv, ks, sorted(probe))


# ----------------------------------------------------------------------
# file_survives keeps every file that truly holds a probe key, under
# randomized manifests mixing missing stats, None components,
# incomparable evidence types, hive-null/percent-encoded partition
# values and rename-era stat names
# ----------------------------------------------------------------------

_hexkeys = st.text(
    alphabet=st.sampled_from("0123456789abcdef"), min_size=2, max_size=8
)


@settings(max_examples=200, deadline=None)
@given(
    file_keys=st.lists(_hexkeys, min_size=1, max_size=12),
    probe=st.lists(_hexkeys, min_size=1, max_size=20),
    width=_width,
    old_name=st.booleans(),
    drop_stats=st.booleans(),
)
def test_file_survives_never_drops_a_true_hit(
    file_keys, probe, width, old_name, drop_stats
):
    """The catalog's combined layers 1-2 check (the exact function the
    probe loop calls): a file holding any probe key must survive —
    with the stats keyed under a rename-era historical name, or with
    stats missing entirely (conservative keep)."""
    fld = PartitionField(
        spec=f"truncate({width}, k)",
        source="k",
        transform="truncate",
        param=width,
    )
    values = frozenset(str(transform_value(fld, p)) for p in probe)
    pbounds: dict = {}
    for p in probe:
        pv = str(transform_value(fld, p))
        lo, hi = pbounds.get(pv, (p, p))
        pbounds[pv] = (min(lo, p), max(hi, p))
    ps = PartSet(0, [fld.name], values, pbounds)
    bounds = [(min(probe), max(probe))]
    stat_name = "k_old" if old_name else "k"
    names_per_col = [["k", "k_old"]]
    by_part: dict = {}
    for k in file_keys:
        by_part.setdefault(str(transform_value(fld, k)), []).append(k)
    for pv, ks in by_part.items():
        columns = (
            {}
            if drop_stats
            else {stat_name: {"nulls": 0, "min": min(ks), "max": max(ks)}}
        )
        f = FileEntry(
            path=f"f-{pv}",
            rows=len(ks),
            bytes=1,
            columns=columns,
            partition={fld.name: pv},
        )
        if any(p in ks for p in probe):
            assert file_survives(f, [ps], bounds, names_per_col), (
                pv,
                ks,
                sorted(probe),
            )
