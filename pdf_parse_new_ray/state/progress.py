"""In-flight progress surface for distributed extraction.

Reference analogue: the streaming engine's user-facing callbacks
``onProgress({processed, total})`` / ``onChunkComplete(start, end, text)``
(lib/pdf-parse-stream.js:110-118, index.d.ts:105-123).  A per-batch Python
callback cannot cross process boundaries in a distributed run, so the
Ray-native shape is a zero-CPU named actor that extraction stages post
fire-and-forget increments to, and that the driver (or any observer
process) polls with ``snapshot()`` while the job runs.

Usage::

    prog = start_progress("myjob", total_units_hint=n_media)
    ds = extract_media_text(media, progress="myjob")
    # ... while consuming the stream elsewhere:
    prog.snapshot()  # {'units': 1402, 'pages': 63011, 'errors': 2, ...}
"""

from __future__ import annotations

import time
from typing import Optional

import ray


@ray.remote(num_cpus=0)
class _ProgressActor:
    """Counter sink; num_cpus=0 so it never competes with extract tasks."""

    def __init__(self, total_units_hint: int = 0):
        self.t0 = time.time()
        self.total_units_hint = total_units_hint
        self.units = 0
        self.pages = 0
        self.errors = 0
        self.batches = 0
        self.docs_parsed = 0
        self.cache_hits = 0
        self.last_update = self.t0

    def report(self, units: int, pages: int, errors: int,
               docs_parsed: int = 0, cache_hits: int = 0) -> None:
        self.units += units
        self.pages += pages
        self.errors += errors
        self.docs_parsed += docs_parsed
        self.cache_hits += cache_hits
        self.batches += 1
        self.last_update = time.time()

    def snapshot(self) -> dict:
        now = time.time()
        elapsed = max(1e-9, now - self.t0)
        return {
            "units": self.units,
            "pages": self.pages,
            "errors": self.errors,
            "batches": self.batches,
            "docs_parsed": self.docs_parsed,
            "cache_hits": self.cache_hits,
            "total_units_hint": self.total_units_hint,
            "elapsed_s": round(elapsed, 3),
            "units_per_s": round(self.units / elapsed, 2),
            "pages_per_s": round(self.pages / elapsed, 2),
            "seconds_since_update": round(now - self.last_update, 3),
        }


class ProgressHandle:
    """Driver-side view of a named progress actor."""

    def __init__(self, name: str, actor):
        self.name = name
        self._actor = actor

    def snapshot(self) -> dict:
        return ray.get(self._actor.snapshot.remote())

    def close(self) -> None:
        ray.kill(self._actor, no_restart=True)


def start_progress(name: str, total_units_hint: int = 0) -> ProgressHandle:
    """Create (or replace) the named progress actor for a job."""
    try:
        old = ray.get_actor(name)
        ray.kill(old, no_restart=True)
    except ValueError:
        pass
    actor = _ProgressActor.options(name=name, lifetime=None).remote(
        total_units_hint=total_units_hint)
    return ProgressHandle(name, actor)


_WORKER_PROGRESS_CACHE: dict = {}

# how long a failed (None) resolution stays cached before the worker asks
# the GCS again — bounds name-lookup traffic while letting workers that
# started before the actor (or saw it replaced) eventually reattach
_RERESOLVE_AFTER_S = 2.0


def reporter_for(name: Optional[str]):
    """Worker-side cached accessor: returns the actor handle or None.
    Missing/late actors degrade to no-op (progress must never fail a job),
    but a None resolution is only cached for _RERESOLVE_AFTER_S so a
    worker that resolved before the actor existed reattaches instead of
    staying silent forever (round-2 advisor finding)."""
    if not name:
        return None
    cached = _WORKER_PROGRESS_CACHE.get(name)
    if cached is not None:
        actor, at = cached
        if actor is not None or time.time() - at < _RERESOLVE_AFTER_S:
            return actor
    try:
        actor = ray.get_actor(name)
    except Exception:
        actor = None
    _WORKER_PROGRESS_CACHE[name] = (actor, time.time())
    return actor


def invalidate_reporter(name: Optional[str]) -> None:
    """Drop a cached handle (called when a fire-and-forget send fails —
    e.g. the named actor was killed and replaced under the same name)."""
    if name:
        _WORKER_PROGRESS_CACHE.pop(name, None)
