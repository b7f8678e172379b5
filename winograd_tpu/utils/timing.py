"""Timing and the benchmark protocol.

The reference's profiling subsystem is a microsecond wall clock bracketing
kernel launches with a device sync (/root/reference/util.c:5-13,
Kernel128_winograd.cu:261-270), run 100 times with the first 2 iterations
discarded (/root/reference/Test.c:14,45-48). `bench_loop` reproduces that
protocol on TPU: `jax.block_until_ready` plays the role of
cudaDeviceSynchronize, and dispatch overhead is amortized honestly by also
reporting a many-iteration chained measurement (SURVEY.md section 7:
dispatch overhead on TPU dwarfs sub-100us kernels).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, List

import jax
import jax.numpy as jnp

from winograd_tpu.config import BENCH_ITERATIONS, BENCH_WARMUP
from winograd_tpu.utils import native


def get_time_microseconds64() -> int:
    """Microsecond wall clock; native CLOCK_REALTIME when available."""
    lib = native.load()
    if lib is not None:
        return int(lib.wt_time_us())
    return time.time_ns() // 1000


class Timer:
    """Context-manager stopwatch in microseconds."""

    def __enter__(self):
        self.start = time.perf_counter_ns()
        return self

    def __exit__(self, *exc):
        self.elapsed_us = (time.perf_counter_ns() - self.start) / 1e3
        return False


@dataclasses.dataclass
class BenchResult:
    name: str
    mean_us: float          # per-iteration mean over timed iterations
    min_us: float
    iterations: int
    warmup: int
    per_iteration_us: List[float]
    chained_us: float       # per-iteration time with device-chained dispatch
    device_us: float = float("nan")  # per-op device time from the scan protocol

    def __str__(self) -> str:
        return (
            f"{self.name}: mean {self.mean_us:.1f} us, min {self.min_us:.1f} us, "
            f"chained {self.chained_us:.1f} us, device {self.device_us:.1f} us "
            f"over {self.iterations} iters"
        )


def bench_loop(
    name: str,
    fn: Callable[[], jax.Array],
    iterations: int = BENCH_ITERATIONS,
    warmup: int = BENCH_WARMUP,
    chain_depth: int = 50,
) -> BenchResult:
    """Reference protocol: `iterations` runs, first `warmup` discarded, mean
    of the rest; each run is individually synchronized (launch overhead
    included, like the reference's timed region which contains the kernel
    launches plus one sync). Additionally measures `chain_depth` back-to-back
    dispatches divided by the depth — the per-op device cost once dispatch
    is pipelined, the honest number for layers inside a real network.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    warmup = max(0, min(warmup, iterations - 1))  # always keep >=1 timed iter
    times: List[float] = []
    result = None
    for _ in range(iterations):
        t0 = time.perf_counter_ns()
        result = fn()
        jax.block_until_ready(result)
        times.append((time.perf_counter_ns() - t0) / 1e3)
    timed = times[warmup:]
    mean_us = sum(timed) / len(timed)

    # Chained: enqueue many dispatches, sync once.
    t0 = time.perf_counter_ns()
    results = [fn() for _ in range(chain_depth)]
    jax.block_until_ready(results)
    chained_us = (time.perf_counter_ns() - t0) / 1e3 / chain_depth

    return BenchResult(
        name=name,
        mean_us=mean_us,
        min_us=min(timed),
        iterations=len(timed),
        warmup=warmup,
        per_iteration_us=times,
        chained_us=chained_us,
    )


def bench_scan(
    core: Callable[[jax.Array], jax.Array],
    x: jax.Array,
    scan_len: int | None = 4096,
    repeats: int = 5,
    target_s: float = 0.5,
) -> float:
    """Per-op DEVICE time: run `core` inside ONE jitted lax.scan, iterations
    serialized by a data dependency, so host dispatch is paid once. The
    per-op time is the SLOPE between a short and a long scan, which cancels
    the constant per-call overhead (RPC/dispatch floor) exactly. This is the
    closest TPU analog of the reference's timed region (kernel launches +
    one sync, transfers excluded —
    /root/reference/Kernel128_winograd.cu:261-270): the steady-state
    per-layer device latency a deployed network would see.

    scan_len=None picks the length ADAPTIVELY: a two-length probe estimates
    the op time, then the long leg is sized so the kernel time itself is
    ~target_s seconds (power-of-two, clamped to [1024, 2**18]). A fixed
    4096 leaves a ~1.5 us op's long leg at ~6 ms — smaller than the
    remote-dispatch floor's own jitter, which showed up as 30-50% swings
    on the layer modes. With ~0.5 s legs the floor jitter perturbs the
    slope by <0.5%.

    `core` maps x -> y (any output shape); the carry multiplies x by
    (1 + 0*y[0]), which XLA cannot fold away (NaN semantics: 0*NaN != 0)
    and which adds only a scalar-broadcast epilogue per step. The y[0]
    read goes through `lax.optimization_barrier`: without it XLA narrows
    pure-XLA cores by pushing the slice back through the producer chain
    (measured: a 7x7/2 stem conv "alone" timed 10 us where the true cost
    is ~350 — the scan body computed a sliver of the output). Pallas
    custom calls were never narrowable; the barrier makes XLA-op cores
    (the vendor-baseline column) measure honestly too.
    """

    def make(length):
        @jax.jit
        def scan_n(x0):
            def body(c, _):
                y = core(c)
                y = jax.lax.optimization_barrier(y)
                c = c * (1.0 + 0.0 * jnp.ravel(y)[0])
                return c, ()

            out, _ = jax.lax.scan(body, x0, None, length=length)
            return out

        return scan_n

    fns = {}  # one jitted scan per length (make() closures would recompile)

    def measure(length, reps):
        fn = fns.get(length)
        if fn is None:
            fn = fns[length] = make(length)
        jax.block_until_ready(fn(x))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter_ns()
            jax.block_until_ready(fn(x))
            best = min(best, (time.perf_counter_ns() - t0) / 1e3)
        return best

    if scan_len is None:
        # Probe slope between 256 and 1024 iterations (floor cancels),
        # then size the long leg to ~target_s seconds of kernel time. The
        # probed programs are kept in `fns`, so a clamped-to-1024 choice
        # (slow ops) reuses the compiled probe program.
        t256, t1024 = measure(256, 2), measure(1024, 2)
        est_us = max((t1024 - t256) / 768.0, 1e-3)
        # Wall-clock guard: t1024/1024 upper-bounds the true per-iteration
        # cost (constant floor included), so even a mis-probed slope (e.g. a
        # non-positive one clamped to 1e-3) cannot size a leg that runs for
        # minutes through the ~29 ms-RTT tunnel.
        cap = max(1024, int(target_s * 1e6 * 1024 / max(t1024, 1e-3)))
        scan_len = 1 << max(
            10, min(18, int(min(target_s * 1e6 / est_us, cap)).bit_length())
        )

    # The spread between the two lengths must make L*t_op dwarf the jitter
    # of the constant floor (~ms through a remote-dispatch tunnel), so the
    # short leg is ~1/64 of the long one.
    l_short = max(scan_len // 64, 2)
    for attempt in range(3):
        times = {length: measure(length, repeats) for length in (l_short, scan_len)}
        slope = (times[scan_len] - times[l_short]) / (scan_len - l_short)
        if slope > 0:
            return slope
        # A non-positive slope means the short leg's wall time exceeded the
        # long leg's — dispatch-floor jitter or a concurrent process on the
        # chip polluted a leg (observed once in the round-5 sweep: a -82 us
        # "device time" recorded for a 220 us op while two bench streams
        # shared the chip). Never record it: re-measure, then hard-fail so
        # the sweep reruns the mode rather than publish garbage.
    raise RuntimeError(
        f"bench_scan: non-positive slope {slope:.3f} us after 3 attempts "
        f"(lengths {l_short}/{scan_len}; device contention?)"
    )
