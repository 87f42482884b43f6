"""FOLD_AFFINE is a trace-time rewrite (conv -> AffineChannel pairs become
conv(x, W*s) + b): same parameter tree, same outputs, same gradients, so
checkpoints, the weight converter, and the trainable masks are unaffected
by the flag. The reference applies the equivalent fold only offline in its
checkpoint converter (tools/pickle_caffe_blobs.py:148-170); here it is a
live-forward option targeting the bandwidth-bound trunk."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sad_tpu.config import Config
from sad_tpu.config.config import merge_cfg_from_dict
from sad_tpu.models import create_model
from sad_tpu.models.model_builder import init_model_params


def _small_cfg(**resnets):
    return merge_cfg_from_dict(
        Config(),
        {
            "MODEL": {
                "TYPE": "retinanet",
                "NUM_CLASSES": 2,
                "CONV_BODY": "FPN.add_fpn_ResNet50_conv5_body",
            },
            "FPN": {
                "FPN_ON": True,
                "RPN_MIN_LEVEL": 3,
                "RPN_MAX_LEVEL": 7,
                "EXTRA_CONV_LEVELS": True,
                "COARSEST_STRIDE": 64,
            },
            "RETINANET": {
                "RETINANET_ON": True,
                "ASPECT_RATIOS": (1.0,),
                "SCALES_PER_OCTAVE": 1,
            },
            "RESNETS": {"CHANNEL_RATIO": 0.125, **resnets},
            "COMPUTE_DTYPE": "float32",
        },
    )


def _randomize(params, seed):
    """Non-trivial values everywhere — in particular the AffineChannel s/b,
    which initialize to (1, 0) and would make the fold trivially correct.
    Perturbs the (scale-controlled) init multiplicatively and adds noise to
    1-D params so activations stay O(1) through the deep trunk — large
    activations would amplify f32 reassociation error and swamp the
    equivalence being tested."""
    rng = np.random.RandomState(seed)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    out = [
        jnp.asarray(
            np.asarray(l) * (1.0 + 0.2 * rng.randn(*l.shape))
            + (0.1 * rng.randn(*l.shape) if l.ndim == 1 else 0.0),
            l.dtype,
        )
        for l in leaves
    ]
    return jax.tree_util.tree_unflatten(treedef, out)


def _compare_outputs(cfg, x, seed=0, tol=1e-4):
    m0 = create_model(cfg)
    params = _randomize(
        init_model_params(m0, jax.random.PRNGKey(0), (1, 64, 64, 3)), seed
    )
    m1 = create_model(dataclasses.replace(cfg, FOLD_AFFINE=True))
    out0 = m0.apply({"params": params}, x)
    out1 = m1.apply({"params": params}, x)
    flat0 = jax.tree_util.tree_leaves(out0)
    flat1 = jax.tree_util.tree_leaves(out1)
    assert len(flat0) == len(flat1) > 0
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=tol, atol=tol
        )
    return m0, m1, params


class TestAffineFold:
    def test_param_tree_identical(self):
        cfg = _small_cfg()
        m0 = create_model(cfg)
        m1 = create_model(dataclasses.replace(cfg, FOLD_AFFINE=True))
        p0 = init_model_params(m0, jax.random.PRNGKey(0), (1, 64, 64, 3))
        p1 = init_model_params(m1, jax.random.PRNGKey(0), (1, 64, 64, 3))
        f0 = {k: v.shape for k, v in
              jax.tree_util.tree_leaves_with_path(p0)}
        f1 = {k: v.shape for k, v in
              jax.tree_util.tree_leaves_with_path(p1)}
        assert f0 == f1
        # same RNG paths -> bitwise-identical init values
        for a, b in zip(jax.tree_util.tree_leaves(p0),
                        jax.tree_util.tree_leaves(p1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_full_model_flag_parity(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)
        _compare_outputs(_small_cfg(), x)

    def test_grouped_trunk_parity(self):
        """ResNeXt trunk: the fold pre-scales the grouped kernel before the
        phrasing dispatcher, which must be phrasing-invariant."""
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)
        _compare_outputs(
            _small_cfg(NUM_GROUPS=4, WIDTH_PER_GROUP=16, CHANNEL_RATIO=0.25),
            x, seed=1,
        )

    def test_s2d_stem_combo_parity(self):
        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)
        cfg = dataclasses.replace(_small_cfg(), S2D_STEM=True)
        _compare_outputs(cfg, x, seed=2)

    def test_gradients_match(self):
        """Fold is linear in W, s, b, so grads (incl. the s/b grads the
        trainable mask later zeroes) are identical up to float error."""
        cfg = _small_cfg()
        rng = np.random.RandomState(5)
        x = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)
        m0 = create_model(cfg)
        m1 = create_model(dataclasses.replace(cfg, FOLD_AFFINE=True))
        params = _randomize(
            init_model_params(m0, jax.random.PRNGKey(0), (1, 64, 64, 3)), 7
        )

        def loss(m):
            def f(p):
                out = m.apply({"params": p}, x)
                return sum(
                    jnp.sum(l * l) for l in jax.tree_util.tree_leaves(out)
                )
            return f

        g0 = jax.grad(loss(m0))(params)
        g1 = jax.grad(loss(m1))(params)
        for (k, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g0),
            jax.tree_util.tree_leaves_with_path(g1),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
                err_msg=str(jax.tree_util.keystr(k)),
            )

    def test_res5_roi_head_parity(self):
        """The C4 res5 RoI head builds Bottlenecks directly; the fold flag
        must flow there too."""
        from sad_tpu.models.arch import arch_from_config
        from sad_tpu.models.single_scale import ResNetRoIConv5Head

        cfg = merge_cfg_from_dict(
            Config(),
            {
                "MODEL": {
                    "TYPE": "generalized_rcnn",
                    "NUM_CLASSES": 3,
                    "CONV_BODY": "ResNet.add_ResNet50_conv4_body",
                },
                "RESNETS": {"CHANNEL_RATIO": 0.125},
                "COMPUTE_DTYPE": "float32",
            },
        )
        a0 = arch_from_config(cfg)
        a1 = arch_from_config(dataclasses.replace(cfg, FOLD_AFFINE=True))
        rng = np.random.RandomState(8)
        feats = jnp.asarray(
            rng.randn(4, 14, 14, a0.stage_dims()[2]), jnp.float32
        )
        h0 = ResNetRoIConv5Head(a0, resolution=14, dtype=jnp.float32)
        h1 = ResNetRoIConv5Head(a1, resolution=14, dtype=jnp.float32)
        params = _randomize(
            h0.init(jax.random.PRNGKey(0), feats)["params"], 9
        )
        o0 = h0.apply({"params": params}, feats)
        o1 = h1.apply({"params": params}, feats)
        np.testing.assert_allclose(
            np.asarray(o0), np.asarray(o1), rtol=1e-4, atol=1e-4
        )
