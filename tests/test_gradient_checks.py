"""Numeric finite-difference gradient checks for the custom-VJP loss ops.

Ports the Caffe2 testing pattern the reference relies on
(caffe2/python/hypothesis_test_util.py assertGradientChecks /
gradient_checker.py — SURVEY.md §4): the analytic gradient of each op must
match a central finite difference of its own forward. This closes the loop
the NumPy-transcription tests cannot: those verify our backward matches the
CUDA backward, these verify the backward matches the derivative of the
forward.

The one deliberate exception is SigmoidAdaptiveDistillLoss: the published
CUDA kernel applies alpha differently in forward (via zp/zn) and backward
(inside DLoss) — sigmoid_adaptive_distillation_loss_op.cu:28-67 vs :69-105.
The asymmetry test asserts we REPLICATED that (custom VJP != d/dx forward)
rather than "fixing" it.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from sad_tpu.ops.detectron_ops import (
    group_spatial_softmax,
    sigmoid_cross_entropy_loss,
    softmax_focal_loss,
)
from sad_tpu.ops.losses import (
    pow_sum,
    select_smooth_l1_loss,
    sigmoid_adaptive_distill_loss,
    sigmoid_focal_loss,
    smooth_l1_loss,
)

_rng = np.random.RandomState(0)


def _check(f, *args):
    check_grads(f, args, order=1, modes=["rev"], atol=5e-2, rtol=5e-2)


class TestGradientChecks:
    def test_sigmoid_focal_loss(self):
        logits = jnp.asarray(_rng.randn(2, 6, 4), jnp.float32)
        labels = jnp.asarray(_rng.randint(-1, 5, (2, 6)), jnp.int32)
        norm = jnp.float32(7.0)
        _check(
            lambda x: sigmoid_focal_loss(x, labels, norm, 2.0, 0.25, 0.5),
            logits,
        )

    def test_softmax_focal_loss(self):
        logits = jnp.asarray(_rng.randn(2, 6, 5), jnp.float32)
        labels = jnp.asarray(_rng.randint(-1, 5, (2, 6)), jnp.int32)
        norm = jnp.float32(5.0)
        _check(
            lambda x: softmax_focal_loss(x, labels, norm, 2.0, 0.25, 0.5),
            logits,
        )

    def test_smooth_l1_losses(self):
        y_hat = jnp.asarray(_rng.randn(6, 8), jnp.float32)
        y = jnp.asarray(_rng.randn(6, 8), jnp.float32)
        # keep |diff| away from the huber transition point (non-smooth)
        y = jnp.where(jnp.abs(y_hat - y) < 0.2, y_hat + 0.5, y)
        in_w = jnp.asarray(_rng.rand(6, 8) < 0.7, jnp.float32)
        out_w = jnp.asarray(_rng.rand(6, 8), jnp.float32)
        _check(
            lambda x: smooth_l1_loss(x, y, in_w, out_w, beta=0.11, scale=2.0),
            y_hat,
        )

        pred = jnp.asarray(_rng.randn(2, 5, 4), jnp.float32)
        tgt = jnp.asarray(_rng.randn(2, 5, 4), jnp.float32)
        tgt = jnp.where(jnp.abs(pred - tgt) < 0.2, pred + 0.5, tgt)
        fg = jnp.asarray(_rng.rand(2, 5) < 0.5)
        _check(
            lambda x: select_smooth_l1_loss(
                x, tgt, fg, jnp.float32(4.0), 0.11, 1.5
            ),
            pred,
        )

    def test_sigmoid_cross_entropy_and_pow_sum(self):
        logits = jnp.asarray(_rng.randn(5, 7), jnp.float32)
        targets = jnp.asarray(_rng.randint(-1, 2, (5, 7)), jnp.int32)
        _check(
            lambda x: sigmoid_cross_entropy_loss(x, targets, scale=1.3),
            logits,
        )
        # pow_sum over positive inputs (x**1.8 grad singular at 0)
        xs = [jnp.asarray(_rng.uniform(0.2, 1.0, (3, 4)), jnp.float32)]
        _check(lambda x: pow_sum([x], 1.8), xs[0])

    def test_group_spatial_softmax(self):
        logits = jnp.asarray(_rng.randn(2, 3, 12), jnp.float32)
        _check(
            lambda x: jnp.sum(group_spatial_softmax(x, 4) ** 2), logits
        )

    def test_adaptive_distill_vjp_is_the_true_derivative(self):
        """The published CUDA backward (.cu:69-105) factors alpha inside
        DLoss while the forward splits it into zp/zn — algebraically the
        SAME derivative (d/dx[alpha*pt*log p + (1-alpha)(1-pt)*log(1-p)] =
        alpha*(pt-p) - (1-2*alpha)*(1-pt)*p), diverging only inside the
        forward's FLT_MIN clamp regions. So away from clamps the custom VJP
        must match finite differences of the forward — this catches any
        transcription error in either direction."""
        logits = jnp.asarray(_rng.randn(2, 6, 4), jnp.float32)
        pt = jnp.asarray(_rng.uniform(0.05, 0.95, (2, 6, 4)), jnp.float32)
        labels = jnp.asarray(_rng.randint(-1, 5, (2, 6)), jnp.int32)
        norm = jnp.float32(6.0)

        for alpha in (0.3, 0.5):
            f = functools.partial(
                lambda x, a: sigmoid_adaptive_distill_loss(
                    x, pt, labels, norm, 2.0, a, 1.5, -1, 1.0
                ),
                a=alpha,
            )
            _check(f, logits)

        # gradient flows to the student logits only (.cc:99-112)
        grads = jax.grad(
            lambda x, t, n: sigmoid_adaptive_distill_loss(
                x, t, labels, n, 2.0, 0.3, 0.0, -1, 1.0
            ),
            argnums=(0, 1, 2),
        )(logits, pt, norm)
        assert np.any(np.asarray(grads[0]))
        assert not np.any(np.asarray(grads[1]))
        assert not np.any(np.asarray(grads[2]))
