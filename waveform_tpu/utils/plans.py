"""Measured kernel-plan selection — the FFTW planner's measure-and-pick.

FFTW's planner times candidate solver trees and keeps the fastest, then
persists the choice as wisdom (/root/reference/deps/fftw-3.3.11/kernel/
planner.c:572 ``search``, api/export-wisdom-to-file.c).  XLA owns codegen
here, but the exact Pallas kernel still has real per-size plan choices the
compiler cannot make:

* the stage-1 split (2-factor dense vs 3-factor radix-4, exact_pallas
  ``_stage1_split``), and
* the digit dtype for the MXU passes (bf16/f32-acc vs int8/int32-acc —
  bit-identical results, different VPU/MXU balance).

:func:`measure` times every candidate interleaved in one process (tunnel
slow phases hit all variants equally) and :func:`record` persists the
winner to a plan file; ``exact_pallas`` consults :func:`plan_for` when no
env override is set.  Run ``python -m waveform_tpu.utils.plans 4096
16384`` on the target hardware to tune.  Heuristic defaults apply when no
plan entry exists, so plans are an optimization, never a requirement.
"""

from __future__ import annotations

import json
import os
import time
from functools import lru_cache

import numpy as np


def plan_path() -> str:
    return os.environ.get(
        "WAVEFORM_TPU_PLAN_FILE",
        os.path.join(os.path.expanduser("~"), ".cache", "waveform_tpu",
                     "plans.json"))


@lru_cache(maxsize=8)
def _load(path: str, mtime: float) -> dict:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


@lru_cache(maxsize=1)
def _packaged_plans() -> dict:
    """Plans measured on TPU v5e, shipped with the package as a fallback
    for machines that have not run the tuner (FFTW ships no wisdom and
    pays heuristics everywhere; here the target hardware is known, so the
    measured table travels with the code).  Only consulted on a TPU
    backend whose device kind looks like v5e — CPU runs (tests, interpret
    mode) and other TPU generations (different VMEM/MXU balance) keep the
    heuristics so the v5e table cannot skew their behavior.

    Backend probing may RAISE mid-init; lru_cache does not cache
    exceptions, so a transient failure retries on the next call instead
    of latching an empty table for the life of the process — plan_for
    treats the raise as "no table this time"."""
    import jax
    if jax.default_backend() != "tpu":   # may raise during backend init
        return {}
    kind = (getattr(jax.devices()[0], "device_kind", "") or "").lower()
    kind = kind.replace("-", " ").replace("_", " ")
    if not ("v5e" in kind or "v5 lite" in kind
            or os.environ.get("PALLAS_AXON_TPU_GEN", "").startswith("v5e")):
        return {}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "plans_v5e.json")
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def plan_for(n: int) -> dict | None:
    """The stored plan entry for fft_size ``n``: the user's tuned plan
    file first, then the packaged v5e table (v5e TPU only), else None."""
    def packaged() -> dict:
        try:
            return _packaged_plans()
        except Exception:
            return {}   # transient backend-init failure: no table this time

    path = plan_path()
    try:
        mtime = os.path.getmtime(path)
    except OSError:
        return packaged().get(str(n))
    entry = _load(path, mtime).get(str(n))
    if entry is not None:
        return entry
    return packaged().get(str(n))


def record(n: int, entry: dict) -> None:
    path = plan_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    try:
        with open(path) as f:
            plans = json.load(f)
    except (OSError, ValueError):
        plans = {}
    plans[str(n)] = entry
    with open(path, "w") as f:
        json.dump(plans, f, indent=1, sort_keys=True)


def _candidates(n: int) -> list[tuple[int, str, int]]:
    from ..kernels.exact_pallas import _block_streams, admits_bs, supports
    out = []
    for split in (2, 3):
        # probe each split on its own merits: supports(n) without the
        # explicit split resolves the env/plan default, which must not
        # veto the *other* candidate (an existing plan entry or env
        # override would otherwise drop lowerable candidates)
        if not supports(n, split=split):
            continue
        for ddt in ("bf16", "int8"):
            # bs dimension: the default block size plus its doublings up
            # to the VMEM gate — small sizes leave most of VMEM idle at
            # the default 16, and larger blocks amortize per-block
            # constant reloads and grid overhead (whether that wins is
            # exactly what gets measured)
            bs0 = _block_streams(n, split=split, ddt=ddt, want=16)
            for bs in (bs0, bs0 * 2, bs0 * 4):
                if bs == bs0 or admits_bs(n, bs, split=split, ddt=ddt):
                    out.append((split, ddt, bs))
    return out


def measure(n: int, streams: int = 64, ticks: int = 0, reps: int = 8,
            verbose: bool = True) -> dict:
    """Time every kernel candidate (and the XLA lowering) interleaved;
    persist and return the winning plan entry.

    ``ticks <= 0`` auto-sizes the scan so each timed dispatch carries
    ~0.5 GB·frames of work (≈ 0.3–1 s on v5e): over the relay tunnel a
    single dispatch costs ~30 ms of round trip, which at small N swamps
    the per-frame compute unless the scan amortizes it (measured: N=2048
    at ticks=16 reported 7.7 µs/frame for every candidate — pure RTT)."""
    import jax
    import jax.numpy as jnp

    if ticks <= 0:
        ticks = max(8, (1 << 31) // (n * streams))

    from ..kernels import exactfft
    from ..kernels.exact_pallas import rfft_rows_mag_packed

    S = streams
    w = jnp.ones((n,), jnp.float32)
    wz = jnp.zeros((n,), jnp.float32)

    def build(tag):
        # every candidate consumes/produces the serving ring's FLAT
        # [S·2, N] rows and emits [S·2, N/2] magnitude rows in ITS OWN
        # natural layout (kernel: block order with zero relayout; xla:
        # natural order with zero relayout) — the tuner times what each
        # path would actually cost the engine end to end
        if tag == "xla":
            def mag_fn(x2):
                x = x2.reshape(S, 2, n)
                m = exactfft.rfft_pair_mag_exact(x, allow_kernel=False)
                return m
        else:
            split, ddt, bs = tag
            # measure the accuracy tier production resolves (fast by
            # default; WAVEFORM_TPU_KERNEL_TWIDDLE=df tunes the exact
            # tier instead) — the tuner must time what serving will run
            from ..kernels.exact_pallas import _twiddle_choice
            twd = _twiddle_choice()

            def mag_fn(x2):
                return rfft_rows_mag_packed(x2, w, wz, split=split,
                                            ddt=ddt, bs=bs, twiddle=twd)[0]

        def run(x2):
            def body(carry, _):
                mag = mag_fn(carry).reshape(2 * S, n // 2)
                d = jnp.concatenate([mag, mag], axis=-1)
                return (carry * jnp.float32(0.9999)
                        + d * jnp.float32(1e-6)), mag[0, 0]
            c, ys = jax.lax.scan(body, x2, None, length=ticks)
            # a SCALAR result the timing loop pulls to the host:
            # block_until_ready alone can return before tiny dispatches
            # complete on the relay backend (measured: 0.00 us/frame
            # recorded at N<=1040) — a host readback cannot
            return c[0, 0] + ys.sum()

        return jax.jit(run)

    tags = _candidates(n) + ["xla"]
    fns = {t: build(t) for t in tags}
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(0.3 * rng.standard_normal((2 * S, n)), jnp.float32)
    for t in list(fns):
        t0 = time.perf_counter()
        try:
            np.asarray(fns[t](x0))
        except Exception as e:   # candidate unlowerable on this backend
            if verbose:
                print(f"candidate {t} failed to compile: "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)
            del fns[t]
            continue
        if verbose:
            print(f"compile {t}: {time.perf_counter() - t0:.0f}s",
                  flush=True)
    tags = list(fns)
    times = {t: [] for t in tags}
    for _ in range(reps):
        for t in tags:
            t0 = time.perf_counter()
            np.asarray(fns[t](x0))   # host readback: see run()'s note
            times[t].append((time.perf_counter() - t0)
                            / (ticks * S) * 1e6)
    mins = {t: float(np.min(v)) for t, v in times.items()}
    if not mins:
        raise RuntimeError(f"no plan candidate compiled for n={n} on "
                           f"this backend — nothing to record")
    kern = [t for t in tags if t != "xla"]
    entry: dict = {"streams": S}
    if "xla" in mins:   # the baseline itself can fail to lower
        entry["xla_us_per_frame"] = round(mins["xla"], 3)
    if kern:
        best = min(kern, key=lambda t: mins[t])
        entry.update({"split": best[0], "ddt": best[1], "bs": best[2],
                      "us_per_frame": round(mins[best], 3)})
    record(n, entry)
    if verbose:
        for t in tags:
            print(f"{t}: min {mins[t]:.2f} us/frame")
        print(f"plan[{n}] = {entry}")
    return entry


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sizes", type=int, nargs="+")
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--ticks", type=int, default=0,
                    help="scan length per dispatch (0 = auto-size so the "
                         "dispatch round trip is amortized)")
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()
    from .wisdom import enable
    enable()
    for n in args.sizes:
        measure(n, args.streams, args.ticks, args.reps)


if __name__ == "__main__":
    main()
