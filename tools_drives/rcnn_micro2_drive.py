"""Chip micro-drive 2: properly-cached timings of RCNN step stages.

(The first decompose run re-jitted a fresh lambda per iteration, so its
top_k number was compile time, not runtime.) Times with def-level jits:
  - lax.top_k k=2000 over P2-size scores (bs2 vmap)
  - multilevel_roi_align forward (512 rois/im)
  - roi_align forward+backward wrt features (the scatter-add path)
  - sample_proposal_labels (IoU + sampling)
Run: PYTHONPATH="/root/repo:$PYTHONPATH" python tools_drives/rcnn_micro2_drive.py
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    B = 2
    H, W = 416, 672
    rng = np.random.RandomState(0)
    results = {}

    def bench(tag, jitted, make_args, iters=20):
        args = make_args(0)
        out = jitted(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = jitted(*args)
        jax.block_until_ready(out)
        second_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(1, iters + 1):
            out = jitted(*make_args(i))
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / iters * 1e3
        results[tag] = round(ms, 2)
        print(tag, {"ms": round(ms, 2), "2nd_call_s": round(second_s, 3)},
              flush=True)

    # ---- top_k at P2 scale (52k scores, k=2000), vmapped over B
    k2 = (H // 4) * (W // 4) * 3
    base_scores = rng.randn(B, k2).astype(np.float32)

    @jax.jit
    def topk(s):
        return jax.vmap(lambda x: jax.lax.top_k(x, 2000))(s)

    bench("top_k_2000_P2xB", topk,
          lambda i: (jnp.asarray(base_scores + i * 1e-5),))

    # ---- approx_max_k same shape
    @jax.jit
    def approx(s):
        return jax.vmap(
            lambda x: jax.lax.approx_max_k(x, 2000, recall_target=0.99)
        )(s)

    bench("approx_max_k_2000_P2xB", approx,
          lambda i: (jnp.asarray(base_scores + i * 1e-5),))

    # ---- RoIAlign fwd and fwd+bwd (512 rois/im over 4 FPN levels)
    from sad_tpu.ops.proposals import multilevel_roi_align

    feats = {
        l: jnp.asarray(
            rng.randn(B, H // 2 ** l, W // 2 ** l, 256), jnp.bfloat16)
        for l in (2, 3, 4, 5)
    }
    n_rois = 512 * B
    bcol = np.repeat(np.arange(B, dtype=np.float32), 512)[:, None]
    xy = rng.uniform(0, 300, (n_rois, 2))
    wh = rng.uniform(20, 150, (n_rois, 2))
    rois0 = np.concatenate([bcol, xy, xy + wh], axis=1).astype(np.float32)

    from sad_tpu.ops.proposals import map_rois_to_fpn_levels

    valid_r = jnp.ones((n_rois,), bool)

    @jax.jit
    def roi_fwd(f, r):
        lv = map_rois_to_fpn_levels(r[:, 1:5], 2, 5)
        return multilevel_roi_align(f, r, lv, valid_r, 7, 2)

    bench("roialign_fwd_1024rois", roi_fwd,
          lambda i: (feats, jnp.asarray(rois0 + i * 1e-4)))

    @jax.jit
    def roi_bwd(f, r):
        lv = map_rois_to_fpn_levels(r[:, 1:5], 2, 5)

        def loss(ff):
            return jnp.sum(
                multilevel_roi_align(
                    ff, r, lv, valid_r, 7, 2
                ).astype(jnp.float32) ** 2
            )
        return jax.grad(loss)(f)

    bench("roialign_fwd+bwd_1024rois", roi_bwd,
          lambda i: (feats, jnp.asarray(rois0 + i * 1e-4)))

    # ---- proposal label sampling
    from sad_tpu.ops.proposals import sample_proposal_labels

    boxes0 = rois0[:512, 1:5]
    gt = rng.uniform(0, 300, (50, 4)).astype(np.float32)
    gt = np.concatenate([gt[:, :2], gt[:, :2] + 80], axis=1)
    gtc = rng.randint(1, 81, 50).astype(np.int32)

    @jax.jit
    def sample(key, b, v, g, c):
        return sample_proposal_labels(
            key, b, v, g, c, 512, 0.25, 0.5, 0.5, 0.1,
            81, (10.0, 10.0, 5.0, 5.0),
        )

    valid = jnp.ones((512,), bool)
    bench("sample_labels_512", sample,
          lambda i: (jax.random.PRNGKey(i), jnp.asarray(boxes0 + i * 1e-4),
                     valid, jnp.asarray(gt), jnp.asarray(gtc)))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
