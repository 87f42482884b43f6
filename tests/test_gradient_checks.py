"""Numeric finite-difference gradient checks — the Caffe2 testing pattern
(caffe2/python/gradient_checker.py, used by every operator_test) applied to
the loss ops whose published CUDA backward IS the true derivative of the
forward.

For the adaptive distillation loss, the published backward folds alpha
differently than the forward (SURVEY.md Appendix A), but expanding the
algebra shows the two factorings are the SAME function in the smooth
region: alpha*(pt-p) - (1-2*alpha)*(1-pt)*p == alpha*pt*(1-p) -
(1-alpha)*(1-pt)*p. The published kernel diverges from the true derivative
only where the forward's log(max(FLT_MIN, p)) clamp bites (|x| >~ 88), so
at moderate logits the finite-difference check must PASS — asserted below.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sad_tpu.ops import losses as L


def fd_grad(f, x, eps=1e-2):
    """Central-difference gradient of scalar f at x (f32 ops -> loose eps)."""
    x = np.asarray(x, np.float32)
    g = np.zeros_like(x)
    flat = x.reshape(-1)
    gf = g.reshape(-1)
    for i in range(flat.size):
        orig = flat[i]
        flat[i] = orig + eps
        fp = float(f(jnp.asarray(x)))
        flat[i] = orig - eps
        fm = float(f(jnp.asarray(x)))
        flat[i] = orig
        gf[i] = (fp - fm) / (2 * eps)
    return g


def _rand_case(seed, n=1, h=3, w=3, a=2, c=4):
    rng = np.random.RandomState(seed)
    logits = rng.randn(n, h, w, a, c).astype(np.float32)
    labels = rng.randint(-1, c + 1, (n, h, w, a)).astype(np.int32)
    return logits, labels


def test_sigmoid_focal_loss_gradient():
    logits, labels = _rand_case(0)
    f = lambda x: L.sigmoid_focal_loss(x, labels, 7.0, 2.0, 0.25, 0.5)
    g = jax.grad(f)(jnp.asarray(logits))
    g_fd = fd_grad(f, logits)
    np.testing.assert_allclose(np.asarray(g), g_fd, rtol=2e-2, atol=2e-4)


def test_select_smooth_l1_gradient():
    rng = np.random.RandomState(1)
    pred = rng.randn(1, 4, 4, 2, 4).astype(np.float32)
    tgt = rng.randn(1, 4, 4, 2, 4).astype(np.float32)
    mask = rng.uniform(size=(1, 4, 4, 2)) < 0.3
    f = lambda x: L.select_smooth_l1_loss(x, tgt, mask, 5.0, 0.11, 0.5)
    g = jax.grad(f)(jnp.asarray(pred))
    g_fd = fd_grad(f, pred)
    np.testing.assert_allclose(np.asarray(g), g_fd, rtol=3e-2, atol=3e-4)


def test_softmax_focal_loss_gradient():
    from sad_tpu.ops.detectron_ops import softmax_focal_loss

    rng = np.random.RandomState(2)
    c = 4  # includes background column 0
    logits = rng.randn(1, 3, 3, 2, c).astype(np.float32)
    labels = rng.randint(-1, c, (1, 3, 3, 2)).astype(np.int32)
    f = lambda x: softmax_focal_loss(x, labels, 6.0, 2.0, 0.25, 0.5)
    g = jax.grad(f)(jnp.asarray(logits))
    g_fd = fd_grad(f, logits)
    np.testing.assert_allclose(np.asarray(g), g_fd, rtol=3e-2, atol=3e-4)


def test_adaptive_distill_gradient_matches_fd_in_smooth_region():
    """At moderate logits the published backward (which the custom VJP
    transcribes) equals the true derivative — its alpha-folding is an
    algebraic refactoring, not a different function; divergence exists only
    in the forward's log clamp region."""
    rng = np.random.RandomState(3)
    logits = (rng.randn(1, 3, 3, 2, 4) * 2).astype(np.float32)
    pt = rng.uniform(0.05, 0.95, (1, 3, 3, 2, 4)).astype(np.float32)
    labels = rng.randint(-1, 5, (1, 3, 3, 2)).astype(np.int32)
    f = lambda x: L.sigmoid_adaptive_distill_loss(
        x, pt, labels, 50.0, 2.0, 0.25, 0.0, -1, 0.5
    )
    g_op = np.asarray(jax.grad(f)(jnp.asarray(logits)))
    g_fd = fd_grad(f, logits)
    np.testing.assert_allclose(g_op, g_fd, rtol=5e-2, atol=5e-4)
