"""Per-stage device timers (VERDICT round 1, missing item #7).

The reference has no profiling at all (SURVEY §5: wall-clock epoch prints
only, reference main.py:92,136). For the capture loop the frame budget is
<1 s (BASELINE.md north star), so stage attribution is a prerequisite for
attacking it.

JAX dispatch is async; a stage "finishes" only when its outputs are
materialized. On the tunneled axon TPU platform ``block_until_ready`` does
not actually block, so `sync` forces a real host readback of one element
per array leaf — a few bytes per stage, negligible next to the work being
timed.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


def enable_compile_cache(path: str = "/tmp/avatarcap_jax_cache") -> None:
    """Persistent XLA compilation cache for bench/profile entry points.

    The tunneled TPU backend compiles slowly (tens of seconds per
    executable); benchmarks re-run the same static shapes every round, so
    cache hits make repeat runs compile-free. Safe to call repeatedly.
    """
    import jax
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def sync(tree) -> None:
    """Force completion of every array leaf in a pytree via host readback."""
    leaves = [leaf.ravel()[:1] for leaf in jax.tree_util.tree_leaves(tree)
              if hasattr(leaf, "ravel") and getattr(leaf, "size", 0) > 0]
    if leaves:
        jax.device_get(leaves)


class StageTimer:
    """Accumulates per-stage wall seconds with forced device sync.

    Usage::

        timer = StageTimer()
        with timer.stage("grid_query"):
            out = query_fn(...)
            timer.observe(out)   # sync happens at block exit too
        timer.times  # {"grid_query": 0.123}

    A ``None`` timer is a no-op (zero overhead in production paths)::

        with StageTimer.maybe(timer, "mc"):
            ...
    """

    def __init__(self):
        self.times: Dict[str, float] = {}
        self._pending = None

    def observe(self, tree) -> None:
        """Register outputs to sync at the end of the current stage."""
        self._pending = tree

    @contextlib.contextmanager
    def stage(self, name: str):
        self._pending = None
        t0 = time.perf_counter()
        yield
        if self._pending is not None:
            sync(self._pending)
            self._pending = None
        self.times[name] = self.times.get(name, 0.0) \
            + (time.perf_counter() - t0)

    @staticmethod
    @contextlib.contextmanager
    def maybe(timer: Optional["StageTimer"], name: str, outputs_fn=None):
        """Stage context that is a no-op when ``timer`` is None."""
        if timer is None:
            yield
            return
        with timer.stage(name):
            yield

    def total(self) -> float:
        return sum(self.times.values())

    def report(self) -> str:
        tot = self.total()
        lines = [f"  {k:<24s} {v * 1e3:9.1f} ms  ({v / max(tot, 1e-12):5.1%})"
                 for k, v in sorted(self.times.items(), key=lambda kv: -kv[1])]
        lines.append(f"  {'TOTAL':<24s} {tot * 1e3:9.1f} ms")
        return "\n".join(lines)
