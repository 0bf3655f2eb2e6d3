"""Key-set file pruning for keyed mutations and index probes.

``Catalog._files_overlapping_keys`` answers one question per keyed
mutation (upsert / delete_keys / merge_into) and per incremental-dedup
ingest: which live files MAY hold any of the incoming key tuples?
This module holds its two scale-critical halves:

1. **Partition-value set pruning** (:func:`partition_value_sets` /
   :func:`partition_prunes_file`) — when a key column is also a
   partition source (identity, or hidden ``truncate``/``bucket``/
   calendar transforms), the batch's DISTINCT partition values are
   computed Spark-side with the SAME expression the write path used
   (``transforms.partition_expr``), so membership against a file's
   hive directory value is exact. The collected set is bounded by the
   table's partition cardinality (65,536 for ``truncate(4, sha256)``),
   NOT by the batch's key count — a 10-million-document ingest prunes
   exactly as well as a 10-row one. This is the 100 TB path for the
   incremental dedup indexes, where per-file blooms saturate once
   files hold ≫1k distinct digests.

2. **Executor-side bloom/range probing** (:func:`probe_files_spark`)
   — above the driver sample cap the old probe silently skipped
   blooms, degrading a uniform-digest batch to a full index scan
   (every file's [min,max] spans the whole hex range). Instead, the
   probe now ships each candidate file's per-column (min, max, bloom)
   to the executors and tests the EXACT key tuples against them with
   ``mapInPandas``: a tuple admits a file only if every component is
   within the file's column range AND its bloom (if any) admits it.
   Range-slicing BEFORE the bloom test is what keeps false-positive
   admission from compounding with batch size — a 1 KiB bloom has
   ~0.1% FP per probe, so testing all N batch keys against every file
   admits everything for N ≳ 1,000, while testing only the few keys
   inside the file's range admits ~no false files. No keys are ever
   collected to the driver on this path, and the per-file Python loop
   work moves to executors.

The reference's PyIceberg tables never face this (one Lambda batch,
no persisted index — ``src/serverless/app.py:235-317``); this is the
machinery that makes its WAP loop hold at a content-addressed corpus.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Iterator
from urllib.parse import unquote

from pyspark.sql import DataFrame, functions as F

from no_jvm_wap_with_iceberg_spark.catalog.transforms import (
    PartitionField,
    partition_expr,
)

HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

# identity partition dirs render str(value); only these Spark types
# round-trip byte-identically through cast("string") on the probe side
_IDENTITY_SAFE_TYPES = {"byte", "short", "integer", "long", "string"}

# collected-distinct cap for a partition-value set; a field whose batch
# exceeds it simply doesn't prune (bounded driver memory, never wrong)
PARTITION_SET_MAX = 70_000


@dataclasses.dataclass(frozen=True)
class PartSet:
    """One key column's partition-prune evidence for a batch."""

    key_index: int
    pnames: list[str]  # candidate manifest keys (rename history)
    values: frozenset[str]  # batch's distinct partition values
    # partition value -> (min key, max key) WITHIN that partition of
    # the batch — a file's range need only overlap ITS OWN partition's
    # key range, which is vastly tighter than the batch's global
    # bounds once keys are uniform (the whole point of the layout)
    bounds: dict


def partition_value_sets(
    meta, key_cols: list[str], kdf: DataFrame
) -> list[PartSet]:
    """For each key column that is a partition source, the batch's
    distinct partition values as directory-comparable strings, plus
    per-partition key min/max (one bounded aggregation job).

    ``pnames`` covers pre-rename files (their dirs are keyed by the
    historical field name). Fields whose distinct set exceeds
    :data:`PARTITION_SET_MAX` are omitted — pruning is an IO reducer,
    never a correctness gate.

    Partition EVOLUTION is first-class: every spec the table ever
    wrote under contributes its own set (``all_partition_fields``), so
    a dedup index that started at ``truncate(2, fingerprint)`` and
    evolved to ``truncate(4, ...)`` as the corpus grew prunes BOTH
    file eras by set lookup — each file is only ever tested against a
    field whose name its own manifest entry carries.
    """
    pfields = meta.all_partition_fields
    if not pfields:
        return []
    types = {f.name: f.dataType.typeName() for f in meta.spark_schema.fields}
    matches = [
        (i, p)
        for i, col in enumerate(key_cols)
        for p in pfields
        if p.source == col
    ]
    # resolve each usable field's partition-value expression up front
    usable: list[tuple[int, PartitionField, str]] = []
    pv_exprs = []
    for i, fld in matches:
        col = key_cols[i]
        src_t = types.get(col)
        if fld.transform == "identity":
            if src_t not in _IDENTITY_SAFE_TYPES:
                continue
            pv_expr = F.col(col).cast("string")
        else:
            pv_expr = partition_expr(fld, src_t)
        pv_exprs.append(pv_expr.alias(f"_pv{len(usable)}"))
        usable.append((i, fld, col))
    if not usable:
        return []

    # ONE aggregation job for every field (a keyed mutation against an
    # evolved table has several eras over the same column — the old
    # one-job-per-field loop rescanned the batch per era): group by
    # the tuple of ALL partition-value expressions, min/max each key
    # column once, fold per-field sets/bounds driver-side. The combined
    # cardinality is the max over correlated fields (an era's wider
    # prefix determines the narrower one), so the cap rarely bites; if
    # it does, fall back to per-field jobs so one over-wide field only
    # disables itself.
    key_src_cols = sorted({col for _i, _f, col in usable})
    aggs = []
    for col in key_src_cols:
        aggs.append(F.min(col).alias(f"_lo_{col}"))
        aggs.append(F.max(col).alias(f"_hi_{col}"))
    rows = (
        kdf.groupBy(*pv_exprs)
        .agg(*aggs)
        .limit(PARTITION_SET_MAX + 1)
        .collect()
    )
    if len(rows) > PARTITION_SET_MAX:
        return _per_field_sets(meta, key_cols, kdf, usable)

    from no_jvm_wap_with_iceberg_spark.catalog.pruning import _norm

    out: list[PartSet] = []
    for k, (i, fld, col) in enumerate(usable):
        pv_name, lo_name, hi_name = f"_pv{k}", f"_lo_{col}", f"_hi_{col}"
        folded: dict[str, tuple] = {}
        for r in rows:
            pv = r[pv_name]
            if pv is None:
                continue
            lo, hi = r[lo_name], r[hi_name]
            prev = folded.get(pv)
            if prev is None:
                folded[pv] = (lo, hi)
            else:
                plo, phi = prev
                if lo is not None and (plo is None or lo < plo):
                    plo = lo
                if hi is not None and (phi is None or hi > phi):
                    phi = hi
                folded[pv] = (plo, phi)
        bounds = {
            pv: (_norm(lo), _norm(hi)) for pv, (lo, hi) in folded.items()
        }
        out.append(PartSet(i, _pnames(meta, fld, col), frozenset(folded), bounds))
    return out


def _pnames(meta, fld: PartitionField, col: str) -> list[str]:
    names = [fld.name]
    for old in meta.rename_history.get(col, ()):
        names.append(dataclasses.replace(fld, source=old).name)
    return names


# int Spark types whose collected Python values truncate/str() exactly
# like the write path's partition_expr
_LOCAL_INT_TYPES = {"byte", "short", "integer", "long"}


def partition_value_sets_local(
    meta, key_cols: list[str], keys: list[tuple]
) -> list[PartSet] | None:
    """Driver-side twin of :func:`partition_value_sets` over an
    already-collected COMPLETE key set: when the probe's driver sample
    (``_files_overlapping_keys``) captured every key row, the
    partition-value sets and per-partition bounds are pure functions
    of those tuples — paying a second Spark aggregation job to compute
    them is one fixed job cost per probe for nothing (guide §1.2).

    Soundness gate: returns ``None`` (caller falls back to the Spark
    aggregation) unless every derivation is provably byte-identical to
    the write path's ``partition_expr``:

    - every key value is a Python int or str (no bool) — collected
      timestamps/decimals/floats have formatting/ordering subtleties
      the Spark expressions own;
    - ``bucket``: crc32 over ``str(v)`` utf-8 == Spark
      ``crc32(cast(string) as binary)`` for int/string sources;
    - ``truncate``: ``v - v % W`` == Spark ``pmod`` form for ints;
      character prefixes only for all-ASCII strings (JVM substring
      counts UTF-16 units, Python counts codepoints — they agree only
      below U+10000, so any non-ASCII value falls back);
    - ``identity``: same :data:`_IDENTITY_SAFE_TYPES` skip rule as the
      Spark path (an unsafe-typed identity field prunes on neither);
    - calendar transforms always fall back (session-timezone
      formatting belongs to the engine).

    Equivalence with the Spark path is pinned by
    tests/test_keyprobe.py::test_local_partition_sets_match_spark.
    """
    from no_jvm_wap_with_iceberg_spark.catalog.pruning import _norm

    for t in keys:
        for v in t:
            if v is not None and (
                isinstance(v, bool) or not isinstance(v, (int, str))
            ):
                return None
    pfields = meta.all_partition_fields
    if not pfields:
        return []
    types = {f.name: f.dataType.typeName() for f in meta.spark_schema.fields}
    matches = [
        (i, p)
        for i, col in enumerate(key_cols)
        for p in pfields
        if p.source == col
    ]
    usable: list[tuple[int, PartitionField, Any]] = []
    for i, fld in matches:
        src_t = types.get(key_cols[i])
        if fld.transform == "identity":
            if src_t not in _IDENTITY_SAFE_TYPES:
                continue  # same skip as the Spark path: never prunes
            fn = str
        elif fld.transform == "bucket":
            if src_t not in ("byte", "short", "integer", "long", "string"):
                return None
            import zlib

            fn = (
                lambda v, n=fld.param: str(
                    zlib.crc32(str(v).encode("utf-8")) % n
                )
            )
        elif fld.transform == "truncate":
            if src_t in _LOCAL_INT_TYPES:
                fn = lambda v, w=fld.param: str(v - v % w)
            elif src_t == "string":
                if any(
                    t[i] is not None and not t[i].isascii() for t in keys
                ):
                    return None
                fn = lambda v, w=fld.param: str(v)[:w]
            else:
                return None
        else:
            return None  # calendar transforms: Spark owns the format
        usable.append((i, fld, fn))
    if not usable:
        return []

    out: list[PartSet] = []
    for i, fld, fn in usable:
        folded: dict[str, tuple] = {}
        for t in keys:
            v = t[i]
            if v is None:
                continue  # null keys land in the hive-null dir: no set
            pv = fn(v)
            prev = folded.get(pv)
            if prev is None:
                folded[pv] = (v, v)
            else:
                lo, hi = prev
                folded[pv] = (v if v < lo else lo, v if v > hi else hi)
        bounds = {
            pv: (_norm(lo), _norm(hi)) for pv, (lo, hi) in folded.items()
        }
        out.append(
            PartSet(i, _pnames(meta, fld, key_cols[i]), frozenset(folded), bounds)
        )
    return out


def _per_field_sets(
    meta, key_cols: list[str], kdf: DataFrame, usable: list
) -> list[PartSet]:
    """Fallback when the combined groupBy's cardinality blew the cap:
    one bounded job per field (the pre-round-8 shape), so a single
    over-wide field only disables its own pruning."""
    from no_jvm_wap_with_iceberg_spark.catalog.pruning import _norm

    types = {f.name: f.dataType.typeName() for f in meta.spark_schema.fields}
    out: list[PartSet] = []
    for i, fld, col in usable:
        if fld.transform == "identity":
            pv_expr = F.col(col).cast("string")
        else:
            pv_expr = partition_expr(fld, types.get(col))
        rows = (
            kdf.groupBy(pv_expr.alias("_pv"))
            .agg(F.min(col).alias("_lo"), F.max(col).alias("_hi"))
            .limit(PARTITION_SET_MAX + 1)
            .collect()
        )
        if len(rows) > PARTITION_SET_MAX:
            continue
        vals = frozenset(r["_pv"] for r in rows if r["_pv"] is not None)
        bounds = {
            r["_pv"]: (_norm(r["_lo"]), _norm(r["_hi"]))
            for r in rows
            if r["_pv"] is not None
        }
        out.append(PartSet(i, _pnames(meta, fld, col), vals, bounds))
    return out


def partition_prunes_file(f, part_sets: list[PartSet]) -> bool:
    """True when the file's partition values PROVE no batch key can
    live in it. Conservative on missing values, the hive null marker
    (which also swallows empty strings), and escaping oddities —
    directory strings are unescaped (Spark percent-encodes special
    chars) before membership."""
    for ps in part_sets:
        raw = next(
            (f.partition[p] for p in ps.pnames if p in f.partition), None
        )
        if raw is None or raw == HIVE_NULL:
            continue
        if unquote(raw) not in ps.values:
            return True
    return False


def partition_key_bounds(f, part_sets: list[PartSet]) -> dict:
    """key index -> (lo, hi) of the batch keys WITHIN this file's own
    partition — the tight range a matching key must fall in. Only for
    columns whose partition value resolved; absent entries fall back
    to the caller's global bounds."""
    out: dict = {}
    for ps in part_sets:
        raw = next(
            (f.partition[p] for p in ps.pnames if p in f.partition), None
        )
        if raw is None or raw == HIVE_NULL:
            continue
        b = ps.bounds.get(unquote(raw))
        if b is not None:
            out[ps.key_index] = b
    return out


def file_survives(
    f,
    part_sets: list[PartSet],
    bounds: list[tuple[Any, Any]],
    names_per_col: list[list[str]],
) -> bool:
    """Layers 1–2 of the probe for ONE file: partition-value-set
    membership, then per-column range overlap against the batch's key
    bounds tightened to the file's own partition. False only when the
    file PROVABLY holds no batch key; every ambiguity (missing stats,
    incomparable evidence types, unresolved partition values) keeps
    the file.

    Deliberately a per-file scalar loop: measured ~1.2 us/file warm
    (set-miss short-circuit on the first partition check) — the full
    probe runs ~5 s at a synthetic 1M-file manifest
    (tools/soak_probe_manifest.py), batch-bounded admissions. A numpy
    whole-manifest variant was built and benchmarked SLOWER at every
    measured point (object-array construction costs more than the
    early-exit loop saves), so the loop stays; past ~10M live files
    the honest next step is a manifest-as-parquet files relation
    joined Spark-side, not more driver vectorization."""
    if part_sets and partition_prunes_file(f, part_sets):
        return False
    tight = partition_key_bounds(f, part_sets) if part_sets else {}
    for ci, ((lo, hi), names) in enumerate(zip(bounds, names_per_col)):
        lo, hi = tight.get(ci, (lo, hi))
        if lo is None:
            continue  # all-null component: no range evidence
        st = next((f.columns[n] for n in names if n in f.columns), {})
        mn, mx = st.get("min"), st.get("max")
        try:
            if mn is not None and mx is not None and (mx < lo or mn > hi):
                return False
        except TypeError:
            pass  # incomparable stats -> conservative
    return True


def probe_files_spark(
    kdf: DataFrame,
    key_cols: list[str],
    candidates: list[tuple[int, list[tuple[Any, Any, str | None]]]],
) -> set[int]:
    """Executor-side key probe: which candidate files does at least
    one key tuple admit?

    ``candidates`` is ``(file_index, per_column_evidence)`` where each
    column entry is ``(min, max, bloom_hex_or_None)`` or ``(min, max,
    bloom_hex_or_None, bucket_evidence)`` — stats under the file's OWN
    column naming already resolved by the caller. A tuple admits a
    file only if, for every key column: the value is null (no
    evidence applies), or it lies within [min, max] (missing bounds
    pass), its hash bucket matches ``bucket_evidence = (N, pval)``
    when present (the file's own ``bucket(N, col)`` partition value —
    per-TUPLE partition pruning: a hash-bucketed column's value range
    scatters over the whole space and its bloom saturates at
    production rows/file, so bucket identity is the only evidence
    that keeps a composite band-hash delete O(victims' bands) instead
    of O(table); found by tools/soak_forget_manifest.py), and the
    bloom (if present) may contain it. Returns the admitted file
    indices.

    One Spark job over the distinct key tuples; the broadcast payload
    is ~1 KiB bloom + bounds per (file, column). Per executor task the
    bloom bit positions are memoized per distinct value, so the cost
    is O(in-range tuples) per file, not O(batch) — and a file is
    dropped from further testing the moment one tuple admits it.

    Single STRING key columns (the sha256-digest hot path — dedup
    indexes, content-addressed upserts) take a sorted-keys fast path:
    the task's keys sort once, every candidate's [min, max] locates
    its in-range keys with two ``searchsorted`` probes, and blooms
    (when present) test only that slice. O((keys + files) log keys)
    per task instead of O(keys x files) pandas masks — at a 1M-file
    manifest with a 12k-digest batch this is the difference between a
    ~30 s and a ~2 s admit step (SCALE.md round-8 addendum); the
    general path below is its semantic reference (same admit set,
    asserted by test_keyprobe.py).
    """
    spark = kdf.sparkSession
    # normalize legacy 3-tuple evidence to the 4-tuple form
    norm = [
        (j, [(*c[:3], c[3] if len(c) > 3 else None) for c in cols])
        for j, cols in candidates
    ]
    bc = spark.sparkContext.broadcast(norm)
    n_cols = len(key_cols)

    def probe(batches: Iterator) -> Iterator:
        cand = [
            (
                j,
                [
                    (mn, mx, bytes.fromhex(bh) if bh else None, bk)
                    for mn, mx, bh, bk in cols
                ],
            )
            for j, cols in bc.value
        ]
        yield from _probe_batches(batches, cand, n_cols)

    hits = (
        kdf.select(*key_cols)
        .distinct()
        .mapInPandas(probe, schema="j long")
        .distinct()
        .collect()
    )
    return {r["j"] for r in hits}


def probe_files_local(
    keys: list[tuple],
    candidates: list[tuple[int, list[tuple[Any, Any, str | None]]]],
) -> set[int]:
    """Driver-side twin of :func:`probe_files_spark` over an
    already-collected complete key set: the same vectorized kernel
    (:func:`_probe_batches` — bit-for-bit the executor path, pinned by
    the randomized reference test) over one in-memory chunk, with no
    Spark job. The caller bounds ``len(keys)`` by the driver sample
    cap; the kernel is O((keys + candidates) log keys) for the single
    sorted-key hot path and numpy-vectorized otherwise, so ~100k keys
    probe in tens of milliseconds."""
    import pandas as pd

    cand = [
        (
            j,
            [
                (
                    c[0],
                    c[1],
                    bytes.fromhex(c[2]) if c[2] else None,
                    c[3] if len(c) > 3 else None,
                )
                for c in cols
            ],
        )
        for j, cols in candidates
    ]
    n_cols = len(keys[0]) if keys else 0
    pdf = pd.DataFrame(
        {i: [t[i] for t in keys] for i in range(n_cols)}
    )
    out: set[int] = set()
    for res in _probe_batches([pdf], cand, n_cols):
        out.update(int(j) for j in res["j"])
    return out


def _probe_batches(batches, cand, n_cols):
    """The probe kernel shared by the executor (mapInPandas) and
    driver (:func:`probe_files_local`) paths: yields one ``{"j": ...}``
    frame of admitted candidate indices per incoming chunk.
    ``cand`` carries decoded bloom bytes."""
    import zlib

    import numpy as np
    import pandas as pd

    from no_jvm_wap_with_iceberg_spark.catalog.bloom import (
        _canon,
        _hashes as bloom_hashes,
    )

    has_bucket = any(
        c[3] is not None for _j, cols in cand for c in cols
    )
    pos_cache: dict[Any, list[int]] = {}

    def admits(bits: bytes, v: Any) -> bool:
        try:
            pos = pos_cache[v]
        except (KeyError, TypeError):
            pos = bloom_hashes(v)
            try:
                pos_cache[v] = pos
            except TypeError:
                pass
        return all(bits[p // 8] & (1 << (p % 8)) for p in pos)

    admitted: set[int] = set()

    def single_sorted_chunk(v) -> bool:
        """Sorted-keys fast path for one chunk of a single string
        or numeric key column (digests; band hashes; integer-id
        upserts). False when the chunk's dtype defeats a total
        sort order — the caller falls back to the general masks
        below, which this path must match admit-for-admit."""
        if len(v) == 0:
            # a zero-row chunk carries no keys: admit nothing,
            # matching the general path (mask.any() is False on an
            # empty chunk) — without this, evidence-free candidates
            # (no bounds, no bloom) would over-admit (ADVICE r8)
            return True
        if v.isna().any():
            # a null key carries no evidence against any file: the
            # general path's range mask includes nulls and its
            # bloom tests skip them, so it admits everything
            admitted.update(j for j, _ in cand)
            return True
        vals = v.to_numpy()
        if vals.dtype == object:
            if any(type(x) is not str for x in vals):
                return False
            want = str
        elif vals.dtype.kind in "iuf":
            want = (int, float)  # bool included (int subclass)
        else:
            return False
        vs = np.sort(vals)
        nv = len(vs)
        for j, specs in cand:
            if j in admitted:
                continue
            mn, mx, bb, _bk = specs[0]
            span = None
            if isinstance(mn, want) and isinstance(mx, want):
                try:
                    lo = int(np.searchsorted(vs, mn, side="left"))
                    if lo >= nv or vs[lo] > mx:
                        continue  # no key inside [min, max]
                    if bb is None:
                        admitted.add(j)
                        continue
                    hi = int(np.searchsorted(vs, mx, side="right"))
                    span = vs[lo:hi]
                except (OverflowError, TypeError):
                    span = None  # out-of-dtype bound: conservative
            if span is None:
                # absent/incomparable bounds: range passes every
                # key (the general path's conservative mask)
                if bb is None:
                    admitted.add(j)
                    continue
                span = vs
            for x in span:
                # blooms hash python natives (_canon) — unwrap
                # numpy scalars before probing/caching
                if admits(bb, x.item() if hasattr(x, "item") else x):
                    admitted.add(j)
                    break
        return True

    for pdf in batches:
        if len(admitted) == len(cand):
            break
        # the sorted-keys fast path has no bucket-identity check;
        # bucket evidence (rare: composite band deletes) takes the
        # general masks so the new constraint is never dropped
        if (
            n_cols == 1
            and not has_bucket
            and single_sorted_chunk(pdf.iloc[:, 0])
        ):
            yield pd.DataFrame({"j": sorted(admitted)})
            continue
        cols = [pdf.iloc[:, i] for i in range(n_cols)]
        nulls = [s.isna() for s in cols]
        # numpy views of the chunk: the candidate loop below runs
        # per FILE (up to the whole manifest census for scatter
        # regimes like composite band deletes), so per-candidate
        # work must be numpy-array ops (~µs), not pandas Series
        # allocations (~50 µs each) — measured 25-60× on the
        # 300k-candidate soak (tools/soak_forget_manifest.py)
        vals_np = [s.to_numpy() for s in cols]
        nulls_np = [s.to_numpy() for s in nulls]
        py_cols: list[list[Any] | None] = [None] * n_cols
        all_rows = np.arange(len(pdf))
        # per-chunk caches, shared by every candidate of the same
        # table era: the crc32-bucket array per (column, N), its
        # bucket-sorted row index (so a candidate's tuple set is
        # ITS bucket's rows — O(rows/N) — not the whole chunk),
        # and each column's null-row indices (a null key carries
        # no evidence, so null rows ride along with every bucket)
        bcache: dict[tuple[int, int], Any] = {}
        scache: dict[tuple[int, int], Any] = {}
        null_rows: list[Any] = [None] * n_cols

        def bucket_arr(i: int, n: int):
            arr = bcache.get((i, n))
            if arr is None:
                # _canon folds the integral floats a NULLABLE int
                # column becomes in pandas back onto ints — the
                # file's partition value hashed "5", and
                # crc32("5.0") would cross-bucket-reject every
                # true hit (caught by the randomized reference
                # test; same canonicalization the blooms use)
                arr = np.array(
                    [
                        -1
                        if pd.isna(v)
                        else zlib.crc32(
                            str(
                                _canon(
                                    v.item()
                                    if hasattr(v, "item")
                                    else v
                                )
                            ).encode("utf-8")
                        )
                        % n
                        for v in cols[i]
                    ],
                    dtype=np.int64,
                )
                bcache[(i, n)] = arr
            return arr

        def rows_for_bucket(i: int, n: int, pv: int):
            """Row indices whose column-i value hashes to bucket
            pv, plus the column's null rows — two searchsorted
            probes against a once-per-(column, N) sorted index.
            Turns the 300k-candidate composite-delete probe from
            O(candidates × chunk) into O(candidates × rows/N)
            (soak-measured, tools/soak_forget_manifest.py)."""
            key = (i, n)
            srt = scache.get(key)
            if srt is None:
                barr = bucket_arr(i, n)
                order = np.argsort(barr, kind="stable")
                srt = (barr[order], order)
                scache[key] = srt
            sb, order = srt
            lo = int(np.searchsorted(sb, pv, side="left"))
            hi = int(np.searchsorted(sb, pv, side="right"))
            rows = order[lo:hi]
            if null_rows[i] is None:
                null_rows[i] = nulls_np[i].nonzero()[0]
            if null_rows[i].size:
                rows = np.concatenate([rows, null_rows[i]])
            return rows

        for j, specs in cand:
            if j in admitted:
                continue
            # start from the first bucket-evidenced column's own
            # rows when there is one; the whole chunk otherwise —
            # all remaining evidence then filters the SUBSET
            b_i = next(
                (i for i, s in enumerate(specs) if s[3] is not None),
                None,
            )
            if b_i is not None:
                n_bk, pv = specs[b_i][3]
                rows = rows_for_bucket(b_i, n_bk, pv)
            else:
                rows = all_rows
            if rows.size == 0:
                continue
            for i, (mn, mx, _bb, bk) in enumerate(specs):
                if bk is not None and i != b_i:
                    n2, pv2 = bk
                    keep = (bucket_arr(i, n2)[rows] == pv2) | nulls_np[
                        i
                    ][rows]
                    rows = rows[keep]
                    if rows.size == 0:
                        break
                if mn is None or mx is None:
                    continue
                try:
                    v = vals_np[i][rows]
                    rng = (v >= mn) & (v <= mx)
                except Exception:
                    # numpy balks at some mixed/object comparisons
                    # pandas handles; fall back before giving up
                    try:
                        rng = (
                            cols[i].iloc[rows].between(mn, mx).to_numpy()
                        )
                    except TypeError:
                        continue  # incomparable -> conservative
                rows = rows[rng | nulls_np[i][rows]]
                if rows.size == 0:
                    break
            if rows.size == 0:
                continue
            if all(bb is None for _mn, _mx, bb, _bk in specs):
                admitted.add(j)
                continue
            for r in rows:
                ok = True
                for i, (_mn, _mx, bb, _bk) in enumerate(specs):
                    if bb is None or bool(nulls_np[i][r]):
                        continue
                    if py_cols[i] is None:
                        # numpy scalars repr differently than the
                        # python natives the blooms were built from
                        py_cols[i] = [
                            v.item() if hasattr(v, "item") else v
                            for v in cols[i]
                        ]
                    if not admits(bb, py_cols[i][r]):
                        ok = False
                        break
                if ok:
                    admitted.add(j)
                    break
        yield pd.DataFrame({"j": sorted(admitted)})
