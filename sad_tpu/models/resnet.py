"""ResNet / ResNeXt backbone bodies in Flax (NHWC, bf16 compute).

Capability-equivalent to detectron/lib/modeling/ResNet.py, redesigned for TPU:
- NHWC layout (XLA's preferred conv layout on TPU), bfloat16 compute with
  float32 params.
- AffineChannel frozen-BN (scale/bias receive no gradient — the reference's
  AffineChannel gradient maker only emits GI(0),
  caffe2/modules/detectron/affine_channel_op.cc:70-80).
- FREEZE_AT stages are wrapped in stop_gradient (ref: ResNet.py:103-122
  StopGradient), which also lets XLA skip their backward entirely.
- ResNeXt = grouped 3x3 routed through ops/grouped_conv.py, whose
  SAD_TPU_GROUPED_CONV_IMPL trace-time knob swaps the MXU phrasing
  (feature_group_count / group-to-batch / lane-packed block-diagonal)
  underneath an unchanged parameter tree; CHANNEL_RATIO width
  multiplier for half-width students (ResNet.py:99-118).

Module names mirror the reference blob names (conv1, res_conv1_bn,
res2_0_branch2a, ...) so the pickle-checkpoint converter is a pure renaming.
"""

from __future__ import annotations

from typing import Any, List

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import grouped_conv as _gc
from .arch import ModelArch


class AffineChannel(nn.Module):
    """y = x * s + b per channel; s/b are frozen (no grad in the reference)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        s = self.param("s", nn.initializers.ones, (self.dim,), jnp.float32)
        b = self.param("b", nn.initializers.zeros, (self.dim,), jnp.float32)
        return x * s.astype(x.dtype) + b.astype(x.dtype)


def _conv(name: str, features: int, kernel: int, stride: int = 1,
          dilation: int = 1, groups: int = 1, use_bias: bool = False,
          dtype=jnp.bfloat16, kernel_init=None, bias_init=None):
    pad = ((kernel - 1) * dilation) // 2
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        kernel_dilation=(dilation, dilation),
        feature_group_count=groups,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=kernel_init or nn.initializers.he_normal(),
        bias_init=bias_init or nn.initializers.zeros,
        name=name,
    )


class GroupedConv(nn.Module):
    """Grouped conv with the same param tree as nn.Conv(feature_group_count)
    — name 'kernel', shape (k, k, cin/groups, features) — but whose compute
    phrasing is selected at trace time by ops/grouped_conv.py (the MXU
    study knob, BENCH_NOTES round-4 grouped-conv section). Checkpoints and
    the weight converter see no difference."""

    features: int
    kernel: int
    groups: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        if x.shape[-1] % self.groups or self.features % self.groups:
            raise ValueError(
                f"{self.name}: channels in/out ({x.shape[-1]}/{self.features})"
                f" must divide groups={self.groups} (check NUM_GROUPS x "
                f"WIDTH_PER_GROUP x CHANNEL_RATIO)"
            )
        k = self.param(
            "kernel", nn.initializers.he_normal(),
            (self.kernel, self.kernel, x.shape[-1] // self.groups,
             self.features), jnp.float32,
        )
        return _gc.grouped_conv(
            x.astype(self.dtype), k, self.groups,
            stride=self.stride, dilation=self.dilation,
        )


class Conv1S2D(nn.Module):
    """conv1 as a weight-equivalent space-to-depth conv (the MLPerf TPU
    trick for the stem).

    A 7x7/s2 conv over 3-channel input maps poorly onto the MXU: the
    contracting dim packs cin=3 into 128-wide lanes. Regrouping 2x2 input
    blocks into 12 channels turns it into a 4x4/s1 conv with IDENTICAL
    outputs: zero-pad the kernel to 8x8 with a leading row/col (the extra
    tap multiplies zeros), then split each spatial axis into (tap, block
    parity). The parameter keeps the reference's name and (7,7,cin,64)
    shape, so checkpoints and the weight converter are untouched; only the
    on-device compute layout changes. Equivalence is pinned by
    tests/test_s2d_stem.py. Ref stem: ResNet.py:88-99 / conv1 blob.
    """

    dtype: Any

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        w7 = self.param(
            "kernel", nn.initializers.he_normal(), (7, 7, c, 64), jnp.float32
        )
        w8 = jnp.pad(w7, ((1, 0), (1, 0), (0, 0), (0, 0)))
        # k[r, s, (by*2+bx)*c + ci, f] = w8[2r+by, 2s+bx, ci, f]
        k = (
            w8.reshape(4, 2, 4, 2, c, 64)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(4, 4, 4 * c, 64)
        )
        y = (
            x.reshape(n, h // 2, 2, w // 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(n, h // 2, w // 2, 4 * c)
        )
        # block-row taps i-2..i+1 cover full-res rows 2i-4..2i+3; the
        # original pad-3 window is rows 2i-3..2i+3 plus the zeroed w8 row
        return jax.lax.conv_general_dilated(
            y.astype(self.dtype),
            k.astype(self.dtype),
            (1, 1),
            ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class Bottleneck(nn.Module):
    """1x1 -> 3x3 (grouped) -> 1x1 bottleneck with AffineChannel after each
    conv, plus projection shortcut when dims change (ResNet.py:221-278)."""

    prefix: str  # e.g. 'res2_0'
    dim_in: int
    dim_out: int
    dim_inner: int
    stride: int
    groups: int
    dilation: int
    stride_1x1: bool
    dtype: Any

    @nn.compact
    def __call__(self, x):
        s1, s3 = (self.stride, 1) if self.stride_1x1 else (1, self.stride)
        p = self.prefix

        cur = _conv(p + "_branch2a", self.dim_inner, 1, s1, dtype=self.dtype)(x)
        cur = AffineChannel(self.dim_inner, name=p + "_branch2a_bn")(cur)
        cur = nn.relu(cur)

        if self.groups > 1:
            cur = GroupedConv(
                self.dim_inner, 3, self.groups, stride=s3,
                dilation=self.dilation, dtype=self.dtype,
                name=p + "_branch2b",
            )(cur)
        else:
            cur = _conv(
                p + "_branch2b", self.dim_inner, 3, s3,
                dilation=self.dilation, dtype=self.dtype,
            )(cur)
        cur = AffineChannel(self.dim_inner, name=p + "_branch2b_bn")(cur)
        cur = nn.relu(cur)

        # branch2c conv init is down-scaled so a FROM-SCRATCH network starts
        # near-identity instead of exploding through 50 unnormalized layers
        # (AffineChannel is frozen, so the usual zero-gamma trick would kill
        # the branch permanently; a small *conv* init trains normally).
        # Pretrained loads overwrite this, so reference parity is unaffected.
        cur = _conv(
            p + "_branch2c", self.dim_out, 1, 1, dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(
                0.01, "fan_in", "truncated_normal"
            ),
        )(cur)
        cur = AffineChannel(self.dim_out, name=p + "_branch2c_bn")(cur)

        if self.dim_in != self.dim_out:
            sc = _conv(p + "_branch1", self.dim_out, 1, self.stride, dtype=self.dtype)(x)
            sc = AffineChannel(self.dim_out, name=p + "_branch1_bn")(sc)
        else:
            sc = x
        return nn.relu(cur + sc)


class ResNetBody(nn.Module):
    """conv1..res5 trunk returning the res2..res5 stage outputs (NHWC).

    Output dict keys are the reference's FPN-level-info blob names
    ('res{stage}_{last}_sum') so FPN wiring and checkpoint conversion line up.
    """

    arch: ModelArch

    @nn.compact
    def __call__(self, x):
        a = self.arch
        dtype = jnp.dtype(a.compute_dtype)
        x = x.astype(dtype)

        if a.s2d_stem:
            p = Conv1S2D(dtype=dtype, name="conv1")(x)
        else:
            p = _conv("conv1", 64, 7, 2, dtype=dtype)(x)
        p = AffineChannel(64, name="res_conv1_bn")(p)
        p = nn.relu(p)
        p = nn.max_pool(p, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        dim_in = 64
        dim_bottleneck = int(a.num_groups * a.width_per_group * a.channel_ratio)
        stage_dims = a.stage_dims()
        outputs = {}

        for stage_idx, (n_blocks, dim_out) in enumerate(
            zip(a.block_counts, stage_dims), start=2
        ):
            dilation = a.res5_dilation if stage_idx == 5 else 1
            inner = dim_bottleneck * (2 ** (stage_idx - 2))
            s = p
            block_cls = nn.remat(Bottleneck) if a.remat else Bottleneck
            for i in range(n_blocks):
                # stride 2 on the first block of res3..res5; res2 follows the
                # stride-2 max pool. The reference detects the stem with a
                # `dim_in != 64` heuristic (ResNet.py:171-175) that breaks
                # for small CHANNEL_RATIOs; use the stage index instead
                # (identical behavior at all real widths).
                stride = 2 if (i == 0 and stage_idx > 2 and dilation == 1) else 1
                s = block_cls(
                    prefix=f"res{stage_idx}_{i}",
                    dim_in=dim_in,
                    dim_out=dim_out,
                    dim_inner=inner,
                    stride=stride,
                    groups=a.num_groups,
                    dilation=dilation,
                    stride_1x1=a.stride_1x1,
                    dtype=dtype,
                )(s)
                dim_in = dim_out
            if a.freeze_at == stage_idx:
                s = jax.lax.stop_gradient(s)
            outputs[f"res{stage_idx}_{n_blocks - 1}_sum"] = s
            p = s

        return outputs

    @staticmethod
    def stage_blob_names(arch: ModelArch) -> List[str]:
        return [
            f"res{stage}_{n - 1}_sum"
            for stage, n in zip(range(2, 6), arch.block_counts)
        ]
