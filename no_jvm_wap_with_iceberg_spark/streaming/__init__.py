"""Streaming faces of the engine.

Lazy re-exports (PEP 562): the changefeed DataSource classes are
unpickled inside EVERY fresh Python worker a stream spawns (the
driver-side planner worker that resolves the schema, the long-lived
streaming-source runner, and each executor reader), and unpickling
imports this package. An eager ``import sessionize`` here drags
pandas (~0.33 s) and ``import ingest`` the whole catalog (~0.08 s)
into workers that only need ``changefeed_source`` — measured 0.41 s
per worker spawn at stream start (two spawns per ``start()``), the
single biggest share of the streaming entry's fixed machinery cost.
Each symbol now imports on first attribute access instead.
"""

_EXPORTS = {
    "backfill_then_stream": "changefeed_source",
    "register_changefeed_source": "changefeed_source",
    "dedup_within_watermark": "ingest",
    "follow_changes": "ingest",
    "stream_merge": "ingest",
    "stream_wap": "ingest",
    "windowed_event_counts": "ingest",
    "sessionize": "sessionize",
    "sessionize_stream": "sessionize",
}

__all__ = sorted(_EXPORTS)


def __getattr__(name: str):
    mod = _EXPORTS.get(name)
    if mod is None:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}"
        )
    import importlib

    value = getattr(importlib.import_module(f"{__name__}.{mod}"), name)
    globals()[name] = value  # cache: next access skips __getattr__
    return value
