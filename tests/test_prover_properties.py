"""Hypothesis soundness properties for the file-level provers.

The two directions that must NEVER be wrong, for any data and any
predicate (tz-aware timestamp literals included — the round-6 high
finding):

- ``_stats_all_match(f, p)`` proving True means EVERY row satisfies
  ``p`` (otherwise the whole-file DELETE fast path silently
  over-deletes);
- ``_file_may_match(f, p)`` returning False means NO row satisfies
  ``p`` (otherwise may-match pruning silently drops matching rows).

Stats are derived exactly the way the engine derives them
(``_json_safe`` with the min/max bound rules), so the property
exercises the REAL encoding, string truncation included.
"""

import datetime as dt

from hypothesis import given, settings, strategies as st

from no_jvm_wap_with_iceberg_spark.catalog import Predicate
from no_jvm_wap_with_iceberg_spark.catalog.pruning import (
    _file_may_match,
    _stats_all_match,
)
from no_jvm_wap_with_iceberg_spark.catalog.table import FileEntry, _json_safe

_OPS = ["lt", "le", "gt", "ge", "eq"]

_ints = st.integers(-50, 50)
_strs = st.text(
    alphabet=st.sampled_from("abXY01 _é"), min_size=0, max_size=40
)
_naive_dts = st.datetimes(
    min_value=dt.datetime(2023, 12, 31),
    max_value=dt.datetime(2024, 1, 2),
    timezones=st.none(),
)
_tz = st.sampled_from(
    [
        dt.timezone.utc,
        dt.timezone(dt.timedelta(hours=2)),
        dt.timezone(dt.timedelta(hours=-7, minutes=-30)),
    ]
)


def _entry(values, n_null):
    """FileEntry built the way the engine builds one: nulls counted,
    min/max through _json_safe's bound-aware encoding."""
    non_null = [v for v in values if v is not None]
    st_ = {
        "nulls": n_null,
        "min": _json_safe(min(non_null), "min") if non_null else None,
        "max": _json_safe(max(non_null), "max") if non_null else None,
    }
    return FileEntry(
        path="f",
        rows=len(values) + n_null,
        bytes=1,
        columns={"c": st_},
    )


def _norm_instant(v):
    if isinstance(v, dt.datetime) and v.tzinfo is not None:
        return v.astimezone(dt.timezone.utc).replace(tzinfo=None)
    return v


def _satisfies(row, op, value):
    """SQL 3VL reference semantics: NULL satisfies nothing."""
    if row is None:
        return False
    value = _norm_instant(value)
    if op == "lt":
        return row < value
    if op == "le":
        return row <= value
    if op == "gt":
        return row > value
    if op == "ge":
        return row >= value
    return row == value


def _check(values, n_null, op, pred_value):
    f = _entry(values, n_null)
    p = Predicate(op, "c", pred_value)
    rows = list(values) + [None] * n_null
    sat = [_satisfies(r, op, pred_value) for r in rows]
    if _stats_all_match(f, p):
        assert all(sat), (
            f"all-match proof over-claims: {op} {pred_value!r} "
            f"on {rows!r}"
        )
    if rows and not _file_may_match(f, p):
        assert not any(sat), (
            f"may-match pruning drops matching rows: {op} "
            f"{pred_value!r} on {rows!r}"
        )


@settings(max_examples=400, deadline=None)
@given(
    values=st.lists(_ints, min_size=0, max_size=8),
    n_null=st.integers(0, 2),
    op=st.sampled_from(_OPS),
    pred_value=_ints,
)
def test_prover_soundness_ints(values, n_null, op, pred_value):
    _check(values, n_null, op, pred_value)


@settings(max_examples=400, deadline=None)
@given(
    values=st.lists(_strs, min_size=0, max_size=6),
    n_null=st.integers(0, 2),
    op=st.sampled_from(_OPS),
    pred_value=_strs,
)
def test_prover_soundness_strings_with_truncation(values, n_null, op, pred_value):
    _check(values, n_null, op, pred_value)


@settings(max_examples=400, deadline=None)
@given(
    values=st.lists(_naive_dts, min_size=0, max_size=6),
    n_null=st.integers(0, 2),
    op=st.sampled_from(_OPS),
    pred_naive=_naive_dts,
    aware=st.booleans(),
    tz=_tz,
)
def test_prover_soundness_timestamps_tz(
    values, n_null, op, pred_naive, aware, tz
):
    """Rows are naive-UTC instants (the engine's storage form); the
    predicate value may arrive tz-AWARE for the same or a shifted
    instant — the provers must agree with instant semantics either
    way (the round-6 high fix)."""
    pred_value = (
        pred_naive.replace(tzinfo=dt.timezone.utc).astimezone(tz)
        if aware
        else pred_naive
    )
    _check(values, n_null, op, pred_value)
