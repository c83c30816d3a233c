"""Tracing / profiling hooks.

The reference's only observability is ad-hoc ``time.time()`` deltas printed
at verbose>=2 (mf.py:624-631, 976, 1030-1032). Here the verbose print
contract is kept in MFModel.fit, and this module adds the TPU-native layer:
``jax.profiler`` trace capture around a region and lightweight named stage
timers that synchronize the device before reading the clock.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def device_trace(log_dir):
    """Capture a jax/XLA profiler trace viewable in TensorBoard/Perfetto.

    >>> with device_trace('/tmp/mf_trace'):
    ...     model.fit(...)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer(object):
    """Named wall-clock stage timers with device synchronization.

    >>> t = StageTimer()
    >>> with t.stage("rotate"):
    ...     out = kernel(x)
    >>> t.report()
    """

    def __init__(self, sync=True):
        self.sync = sync
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def stage(self, name, sync_value=None):
        st = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                if sync_value is not None:
                    jax.block_until_ready(sync_value)
                else:
                    jax.effects_barrier()
            dt = time.perf_counter() - st
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self, printer=print):
        for name in self.totals:
            printer("%-24s %8.3f s  (%d call%s)" %
                    (name, self.totals[name], self.counts[name],
                     "s" if self.counts[name] != 1 else ""))
        return dict(self.totals)


def annotate(name):
    """Decorator: label a function's device work in profiler traces."""
    def wrap(fn):
        def inner(*args, **kwargs):
            with jax.profiler.TraceAnnotation(name):
                return fn(*args, **kwargs)
        inner.__name__ = getattr(fn, "__name__", name)
        return inner
    return wrap
