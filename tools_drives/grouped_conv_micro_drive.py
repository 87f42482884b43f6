"""Chip micro-drive: grouped-conv phrasings at X-101-64x4d shapes.

The round-4 zoo row showed X-101 at 202 ms/img vs R-101's 24 ms/img —
8.3x — where the reference's own GPU ratio is ~2.1x (MODEL_ZOO.md:889-961).
The delta lives in the grouped 3x3 convs (ResNet.py:244-255, group=64):
per-group widths of 4..32 channels sit far below the MXU's 128-lane tile.

This drive times every phrasing in sad_tpu/ops/grouped_conv.py at the
four grouped-conv shapes of the zoo geometry (896x1408 canvas, bs4):

- fgc    — XLA feature_group_count (the current backbone path)
- pack=1 — group-to-batch via batch_group_count (no flop inflation)
- lane   — 128//cg groups per block-diagonal dense conv (fills one lane
           tile; 128/cg x flop inflation)
- 4lane  — 512-lane packs
- dense  — one full block-diagonal conv (64x inflation, MXU-friendly)

Two modes per phrasing: 'train' (fwd+bwd with the pack transform INSIDE
the differentiated region, as a training step would pay it) and 'infer'
(fwd only, kernel pre-packed outside jit — the distillation-teacher case,
which is what the R-101 <- X-101 headline pays).

Timing uses the evolving-state scan harness (BENCH_NOTES memoization
hazard). Run:
  PYTHONPATH=/root/repo python tools_drives/grouped_conv_micro_drive.py
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from sad_tpu.ops import grouped_conv as gc

# (name, N, H, W, C, blocks) — grouped 3x3 is C->C inside each bottleneck;
# `blocks` (X-101 block counts 3/4/23/3) scales the per-shape verdict to a
# whole-trunk estimate in the summary line.
SHAPES = [
    ("res2_g64", 4, 224, 352, 256, 3),
    ("res3_g64", 4, 112, 176, 512, 4),
    ("res4_g64", 4, 56, 88, 1024, 23),
    ("res5_g64", 4, 28, 44, 2048, 3),
]
GROUPS = 64
INNER = 10


def impl_list(cg):
    lane = max(1, min(GROUPS, 128 // cg))
    impls = [("fgc", None), ("pack1", 1), ("lane", lane)]
    if lane * 4 <= GROUPS and lane * 4 != lane:
        impls.append(("lane4", lane * 4))
    impls.append(("dense", GROUPS))
    # dedup pack sizes that coincide (e.g. cg=32: lane4 == 16, dense 64)
    seen, out = set(), []
    for name, p in impls:
        if p in seen:
            continue
        seen.add(p)
        out.append((name, p))
    return out


def bench_one(n, h, w, c, pack, mode):
    cg = c // GROUPS
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (n, h, w, c), jnp.bfloat16)
    k0 = jax.random.normal(key, (3, 3, cg, c), jnp.float32) * 0.05

    if mode == "infer":
        if pack is None:
            kern = k0.astype(jnp.bfloat16)
            conv = lambda x, k: gc.grouped_conv_fgc(x, k, GROUPS)
        else:
            kern = gc.pack_block_diagonal(k0, GROUPS, pack).astype(jnp.bfloat16)
            bgc = GROUPS // pack

            def conv(x, k):
                if bgc == 1:
                    lhs = x
                else:
                    lhs = (
                        x.reshape(n, h, w, bgc, pack * cg)
                        .transpose(3, 0, 1, 2, 4)
                        .reshape(bgc * n, h, w, pack * cg)
                    )
                return jax.lax.conv_general_dilated(
                    lhs, k, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    batch_group_count=bgc,
                )

        def body(carry, _):
            x, s = carry
            y = conv(x, kern)
            y32 = y.astype(jnp.float32)
            scale = jax.lax.rsqrt(jnp.mean(jnp.square(y32)) + 1e-6)
            return ((y32 * scale).astype(jnp.bfloat16), s + jnp.mean(y32)), None

    else:  # train: fwd+bwd, pack transform inside the differentiated region
        kern = k0

        def fwd_loss(x, k):
            if pack is None:
                y = gc.grouped_conv_fgc(x, k.astype(x.dtype), GROUPS)
            else:
                y = gc.grouped_conv_packed(x, k, GROUPS, pack)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        def body(carry, _):
            x, s = carry
            gx, gk = jax.grad(fwd_loss, argnums=(0, 1))(x, kern)
            g32 = gx.astype(jnp.float32)
            scale = jax.lax.rsqrt(jnp.mean(jnp.square(g32)) + 1e-6)
            x_new = (g32 * scale).astype(jnp.bfloat16)
            return (x_new, s + jnp.mean(gk.astype(jnp.float32))), None

    @jax.jit
    def chain(x, s):
        (x, s), _ = jax.lax.scan(body, (x, s), None, length=INNER)
        return x, s

    s = jnp.float32(0.0)
    x = x0
    x, s = chain(x, s)
    jax.block_until_ready(s)
    prev = None
    for _ in range(12):
        t0 = time.perf_counter()
        for _ in range(2):
            x, s = chain(x, s)
        jax.block_until_ready(s)
        cur = (time.perf_counter() - t0) / (2 * INNER)
        if prev is not None and abs(cur - prev) / cur < 0.03:
            break
        prev = cur
    t0 = time.perf_counter()
    calls = 4
    for _ in range(calls):
        x, s = chain(x, s)
    jax.block_until_ready(s)
    assert np.isfinite(float(s)), "diverged/NaN chain state"
    return (time.perf_counter() - t0) / (calls * INNER) * 1e3


def main():
    totals = {}  # (mode, impl_name) -> whole-trunk ms estimate
    for name, n, h, w, c, blocks in SHAPES:
        cg = c // GROUPS
        for mode in ("infer", "train"):
            r = {"shape": name, "cg": cg, "mode": mode}
            for iname, pack in impl_list(cg):
                try:
                    ms = bench_one(n, h, w, c, pack, mode)
                except Exception as e:  # record, keep sweeping
                    r[iname + "_ms"] = f"FAIL {type(e).__name__}"
                    continue
                r[iname + "_ms"] = round(ms, 3)
                key = (mode, iname)
                totals[key] = totals.get(key, 0.0) + ms * blocks
            print(json.dumps(r), flush=True)
    for (mode, iname), ms in sorted(totals.items()):
        print(json.dumps({
            "summary": "whole-trunk grouped-conv ms (bs4)",
            "mode": mode, "impl": iname, "ms": round(ms, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
