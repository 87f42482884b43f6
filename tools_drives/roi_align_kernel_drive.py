"""Chip drive: windowed Pallas RoIAlign vs dense matmul form.

Times ops/pallas_roi_align.multilevel_roi_align_windowed against the dense
ops/proposals.multilevel_roi_align (all-levels tent-weight matmuls) at
mask-1x reference geometry: 800x1344 canvas -> P2..P5 FPN maps, C=256,
bs2, R=1024 box rois (res 7) and R=64 mask rois (res 14), bf16 features.
Also checks numeric agreement on the chip and times fwd+bwd (the custom
VJP backward is the dense transpose either way, so the delta isolates the
forward).

Timing follows the BENCH_NOTES evolving-state rule: the roi set evolves
inside a lax.scan so the axon serving stack cannot memoize dispatches.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python tools_drives/roi_align_kernel_drive.py [--cpu-smoke]
"""

from __future__ import annotations

import argparse
import contextlib
import functools
import json
import time

import numpy as np


@contextlib.contextmanager
def force_path(mod, value):
    """Force USE_PALLAS_ROI_ALIGN for one measurement, restoring on any
    exit — an exception mid-drive must not leave the kernel forced off.
    The global is read at TRACE time, so each forced region must define a
    fresh jitted closure (scan_time does) rather than reuse a cached one."""
    prev = mod.USE_PALLAS_ROI_ALIGN
    mod.USE_PALLAS_ROI_ALIGN = value
    try:
        yield
    finally:
        mod.USE_PALLAS_ROI_ALIGN = prev


def bench(fn, *args, iters=30):
    import jax

    out = jax.block_until_ready(fn(*args))  # compile + warm
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    dt = time.perf_counter() - t0
    return dt / iters * 1000.0, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-smoke", action="store_true")
    args = ap.parse_args()
    if args.cpu_smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    from sad_tpu.ops import pallas_roi_align
    from sad_tpu.ops.pallas_roi_align import multilevel_roi_align_windowed
    from sad_tpu.ops.proposals import (
        map_rois_to_fpn_levels, multilevel_roi_align,
    )

    B, C = 2, 32 if args.cpu_smoke else 256
    Hc, Wc = (128, 192) if args.cpu_smoke else (800, 1344)
    dtype = jnp.float32 if args.cpu_smoke else jnp.bfloat16
    key = jax.random.PRNGKey(0)
    feats = {
        l: jax.random.normal(
            jax.random.fold_in(key, l),
            (B, Hc // 2 ** l, Wc // 2 ** l, C), dtype,
        )
        for l in (2, 3, 4, 5)
    }

    def make_rois(k, r):
        ks = jax.random.split(k, 5)
        x1 = jax.random.uniform(ks[0], (r,), minval=0, maxval=Wc * 0.8)
        y1 = jax.random.uniform(ks[1], (r,), minval=0, maxval=Hc * 0.8)
        w = jax.random.uniform(ks[2], (r,), minval=8, maxval=Wc * 0.5)
        h = jax.random.uniform(ks[3], (r,), minval=8, maxval=Hc * 0.5)
        b = jax.random.randint(ks[4], (r,), 0, B).astype(jnp.float32)
        return jnp.stack(
            [b, x1, y1, jnp.minimum(x1 + w, Wc - 1),
             jnp.minimum(y1 + h, Hc - 1)], axis=1)

    results = {}
    iters = 3 if args.cpu_smoke else 30
    for tag, r, res in (("box", 8 if args.cpu_smoke else 1024, 7),
                        ("mask", 8 if args.cpu_smoke else 64, 14)):
        rois0 = make_rois(jax.random.fold_in(key, 99), r)
        valid = jnp.ones((r,), bool)

        def agree_check():
            lv = map_rois_to_fpn_levels(rois0[:, 1:], 2, 5)
            with force_path(pallas_roi_align, False):
                dense = multilevel_roi_align(feats, rois0, lv, valid, res, 2)
            win = multilevel_roi_align_windowed(feats, rois0, lv, valid,
                                                res, 2)
            d = jnp.max(jnp.abs(dense.astype(jnp.float32)
                                - win.astype(jnp.float32)))
            return float(d)

        maxdiff = agree_check()

        # evolving-state scan: rotate roi positions every iteration
        def scan_time(fn):
            def body(carry, _):
                rois = carry
                lv = map_rois_to_fpn_levels(rois[:, 1:], 2, 5)
                o = fn(feats, rois, lv, valid, res, 2)
                shift = jnp.mean(o.astype(jnp.float32)) * 1e-6 + 1.0
                rois = rois.at[:, 1:].multiply(shift)
                rois = rois.at[:, 1].add(0.37)
                return rois, ()

            @jax.jit
            def run(r0):
                out, _ = jax.lax.scan(body, r0, None, length=iters)
                return out

            return bench(run, rois0, iters=iters)

        def dense_fn(f, ro, lv, v, rs, s):
            return multilevel_roi_align(f, ro, lv, v, rs, s)

        with force_path(pallas_roi_align, False):
            t_dense, _ = scan_time(dense_fn)
        t_win, _ = scan_time(multilevel_roi_align_windowed)

        # fwd+bwd (features cotangent only, rois stop-grad like training)
        def scan_time_grad(fn):
            def loss(f, rois, lv):
                o = fn(f, rois, lv, valid, res, 2)
                return jnp.sum(o.astype(jnp.float32) ** 2)

            def body(carry, _):
                rois = carry
                lv = map_rois_to_fpn_levels(rois[:, 1:], 2, 5)
                g = jax.grad(loss)(feats, rois, lv)
                shift = jnp.mean(
                    g[2].astype(jnp.float32)) * 1e-9 + 1.0
                rois = rois.at[:, 1:].multiply(shift)
                rois = rois.at[:, 1].add(0.37)
                return rois, ()

            @jax.jit
            def run(r0):
                out, _ = jax.lax.scan(body, r0, None, length=iters)
                return out

            return bench(run, rois0, iters=iters)

        with force_path(pallas_roi_align, False):
            tg_dense, _ = scan_time_grad(dense_fn)
        tg_win, _ = scan_time_grad(multilevel_roi_align_windowed)

        results[tag] = {
            "R": r, "res": res, "max_abs_diff": maxdiff,
            "fwd_dense_ms": round(t_dense, 3),
            "fwd_windowed_ms": round(t_win, 3),
            "fwd_speedup": round(t_dense / t_win, 2),
            "fwdbwd_dense_ms": round(tg_dense, 3),
            "fwdbwd_windowed_ms": round(tg_win, 3),
            "fwdbwd_speedup": round(tg_dense / tg_win, 2),
        }
        print(tag, json.dumps(results[tag]), flush=True)

    print(json.dumps(results))
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from driveutil import record_result
    record_result("roi_align_kernel", results)
    print("DRIVE OK")


if __name__ == "__main__":
    main()
