"""Chip micro-drive: sublane-batched greedy NMS vs vmapped single-problem.

nms_batched_pallas packs 8 independent problems into the VPU sublanes of
one kernel program. This measures compile latency and runtime against
the vmapped single-problem kernel at the R-CNN RPN shape (10 problems =
5 FPN levels x 2 images, K=2048, max_out=2000) to decide whether the
train-step proposal path should route through it.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python tools_drives/nms_batched_micro_drive.py
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sad_tpu.ops.pallas_nms import nms_batched_pallas, nms_fixed_pallas

    N, K, MAX_OUT, THR = 10, 2048, 2000, 0.7
    rng = np.random.RandomState(0)
    centers = rng.uniform(0, 800, (800, 2))
    which = rng.randint(0, 800, (N, K))
    xy = centers[which] + rng.uniform(-10, 10, (N, K, 2))
    wh = rng.uniform(20, 120, (N, K, 2))
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], axis=2), jnp.float32)
    scores0 = jnp.asarray(rng.uniform(0.0, 1.0, (N, K)), jnp.float32)

    def run(tag, f):
        f = jax.jit(f, static_argnums=(2, 3))
        t0 = time.perf_counter()
        out = f(boxes, scores0, THR, MAX_OUT)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        iters = 10
        t0 = time.perf_counter()
        s = scores0
        for i in range(iters):
            s = s + 1e-7  # evolving inputs (tunnel memoization hazard)
            out = f(boxes, s, THR, MAX_OUT)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / iters * 1e3
        r = {"compile_s": round(compile_s, 1), "ms_per_call": round(ms, 2),
             "kept": int(np.asarray(out[1]).sum())}
        print(tag, r, flush=True)
        return r

    r_vm = run(
        "vmapped single-problem kernel",
        lambda b, s, t, m: jax.vmap(
            lambda bb, ss: nms_fixed_pallas(bb, ss, t, m)
        )(b, s),
    )
    r_b = run("sublane-batched kernel", nms_batched_pallas)
    print(json.dumps({"vmapped": r_vm, "batched": r_b}))


if __name__ == "__main__":
    main()
