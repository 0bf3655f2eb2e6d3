"""Run independent Spark actions in sibling driver threads.

Spark's scheduler happily runs several jobs at once inside one
application; actions are only sequential because driver code calls
them sequentially (optimization guide §2.6). When two actions read
disjoint (or already-materialized) inputs, submitting them from
sibling threads lets the shorter job's wall hide inside the longer's
and the second job's tasks back-fill executors freed by the first's
stragglers.
"""

from __future__ import annotations

__all__ = ["overlap_actions"]


def overlap_actions(*thunks):
    """Run the thunks in sibling driver threads and return their
    results in order.

    ``InheritableThread``, not a plain pool thread, so a caller's
    job-group / cancellation scope reaches the jobs — same rationale
    as ``Catalog.append_many``'s write threads. On failure raises the
    lowest-index failure with the others attached as notes
    (deterministic, information-preserving).

    Cold-cache caveat (measured, pipelines/incremental_dedup.py): when
    every thunk's FIRST action is the same uncomputed cached subtree,
    the forked jobs' tasks pile onto the same cache partitions and
    serialize on Spark's block locks — materialize the shared cache
    with one action BEFORE forking.
    """
    from pyspark import InheritableThread

    results: list = [None] * len(thunks)
    failures: dict[int, BaseException] = {}

    def run(i: int, fn) -> None:
        try:
            results[i] = fn()
        except BaseException as exc:  # surfaced after join
            failures[i] = exc

    threads = [
        InheritableThread(target=run, args=(i, fn))
        for i, fn in enumerate(thunks)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    if failures:
        order = sorted(failures)
        primary = failures[order[0]]
        for i in order[1:]:
            primary.add_note(
                f"also failed: overlapped action {i}: "
                f"{type(failures[i]).__name__}: {failures[i]}"
            )
        raise primary
    return results
