"""Chip micro-drive: greedy NMS at RPN-proposal shapes, jnp vs Pallas.

The RPN proposal stage (ops/proposals.py) runs nms_fixed with
max_out=POST_NMS_TOP_N (2000 at train) over K pre-NMS candidates per
level — 2000 sequential fori_loop iterations inside the R-CNN train
graph. This measures both forms at that shape (vmapped batch 2) plus the
kernel's compile latency, to decide whether proposals should route
through ops/pallas_nms.py like the detection decode does.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python tools_drives/rpn_nms_micro_drive.py
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sad_tpu.ops.nms import nms_fixed
    from sad_tpu.ops.pallas_nms import nms_fixed_pallas

    B, K, MAX_OUT, THR = 2, 16384, 2000, 0.7
    rng = np.random.RandomState(0)
    centers = rng.uniform(0, 800, (800, 2))
    which = rng.randint(0, 800, (B, K))
    xy = centers[which] + rng.uniform(-10, 10, (B, K, 2))
    wh = rng.uniform(20, 120, (B, K, 2))
    boxes = jnp.asarray(
        np.concatenate([xy, xy + wh], axis=2), jnp.float32)
    scores0 = jnp.asarray(rng.uniform(0.0, 1.0, (B, K)), jnp.float32)

    def run(tag, fn):
        f = jax.jit(jax.vmap(lambda b, s: fn(b, s, THR, MAX_OUT)))
        t0 = time.perf_counter()
        out = f(boxes, scores0)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        iters = 20
        t0 = time.perf_counter()
        s = scores0
        for i in range(iters):
            s = s + 1e-7  # evolving inputs (tunnel memoization hazard)
            out = f(boxes, s)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / iters * 1e3
        r = {"compile_s": round(compile_s, 1), "ms_per_call": round(ms, 2),
             "kept": int(np.asarray(out[1]).sum())}
        print(tag, r, flush=True)
        return r

    r_jnp = run("jnp fori_loop", nms_fixed)
    r_pl = run("pallas kernel", nms_fixed_pallas)
    print(json.dumps({"jnp": r_jnp, "pallas": r_pl}))


if __name__ == "__main__":
    main()
