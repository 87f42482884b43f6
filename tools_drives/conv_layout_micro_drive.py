"""Chip micro-drive: NHWC vs NCHW logical conv layouts at SAD-step shapes.

BENCH_NOTES' step profile says the joint SAD step is spread across
bandwidth-bound conv fusions; the untested lever was logical layout
(ROADMAP #2: "NCHW experiment would mean custom dimension_numbers through
every Flax conv — high effort, uncertain gain"). Before committing to that
refactor, time raw lax.conv_general_dilated fwd+bwd in both layouts at the
step's representative shapes (R-50 trunk stages at 640x1024 + the shared
RetinaNet head tower at P3), bf16 IO like the step. If NCHW shows no
reliable win here, the refactor is dead and this drive is the ceiling
proof.

Caveat on ABSOLUTE numbers: the scan body's RMS normalization (f32 cast of
the full activation gradient, mean-of-squares, rsqrt, mean(gk)) is inside
the timed region. It is layout-independent — it cannot bias the NHWC-vs-NCHW
comparison — but it inflates absolute ms, compresses relative speedups
toward 1.0, and makes quoted TFLOP/s a LOWER bound on the true conv rate.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python tools_drives/conv_layout_micro_drive.py
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# (name, N, H, W, Cin, Cout, k, stride) at bs8 (one group row of the bs32
# bench; per-conv traffic scales linearly so the layout verdict transfers)
SHAPES = [
    ("res2_3x3", 8, 160, 256, 64, 64, 3, 1),
    ("res3_3x3", 8, 80, 128, 128, 128, 3, 1),
    ("res4_3x3", 8, 40, 64, 256, 256, 3, 1),
    ("res4_1x1_expand", 8, 40, 64, 256, 1024, 1, 1),
    ("res5_3x3", 8, 20, 32, 512, 512, 3, 1),
    ("head_tower_p3", 8, 80, 128, 256, 256, 3, 1),
    ("head_pred_p3", 8, 80, 128, 256, 720, 3, 1),
]


def bench_layout(layout, n, h, w, cin, cout, k, stride):
    if layout == "NHWC":
        dn = jax.lax.conv_dimension_numbers(
            (n, h, w, cin), (k, k, cin, cout), ("NHWC", "HWIO", "NHWC"))
        x = jnp.zeros((n, h, w, cin), jnp.bfloat16)
        kern = jnp.zeros((k, k, cin, cout), jnp.bfloat16)
    else:
        dn = jax.lax.conv_dimension_numbers(
            (n, cin, h, w), (cout, cin, k, k), ("NCHW", "OIHW", "NCHW"))
        x = jnp.zeros((n, cin, h, w), jnp.bfloat16)
        kern = jnp.zeros((cout, cin, k, k), jnp.bfloat16)

    def fwd_loss(x, kern):
        # bf16-in/bf16-out like the step's Flax convs (MXU accumulates f32
        # internally either way); keeping cotangents bf16 also matches the
        # step's backward and keeps the transpose convs well-typed
        y = jax.lax.conv_general_dilated(
            x, kern, (stride, stride), "SAME", dimension_numbers=dn)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    # The axon serving stack memoizes repeated dispatches with identical
    # inputs (BENCH_NOTES memoization hazard) — the first version of this
    # drive read 0.02 ms for a 72-GFLOP fwd+bwd (3,300 TFLOP/s: fiction).
    # Evolve the activation INSIDE a scan so every iteration is real work,
    # and feed the carry back between dispatches so outer calls differ too.
    # gk feeds the carry scalar so the weight-grad conv can't be DCE'd.
    INNER = 20

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

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, x.shape, jnp.bfloat16)
    kern = jax.random.normal(key, kern.shape, jnp.bfloat16)
    s = jnp.float32(0.0)
    x, s = chain(x, s)
    jax.block_until_ready(s)
    # warmup windows until two agree within 3% (axon fresh-executable tail)
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
    calls = 5
    for _ in range(calls):
        x, s = chain(x, s)
    jax.block_until_ready(s)
    assert np.isfinite(float(s))
    return (time.perf_counter() - t0) / (calls * INNER) * 1e3


def main():
    for name, n, h, w, cin, cout, k, s in SHAPES:
        r = {"shape": name}
        for layout in ("NHWC", "NCHW"):
            r[layout + "_ms"] = round(bench_layout(layout, n, h, w, cin, cout, k, s), 3)
        r["nchw_speedup"] = round(r["NHWC_ms"] / r["NCHW_ms"], 3)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
