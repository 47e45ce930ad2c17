"""Core flax modules: convs with weight/spectral norm, norms, activations.

Channels-last (B, T, C) throughout — the TPU-friendly layout. Initializer
semantics mirror the reference's torch defaults/overrides so imported
checkpoints and from-scratch training both behave identically:
  - torch conv default: kaiming-uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)),
    bias U(+-1/sqrt(fan_in))
  - PWG Conv1d: kaiming-normal relu, zero bias
    (/root/reference/parallel_wavegan/layers/residual_block.py:25-30)
  - MelGAN: N(0, 0.02) (/root/reference/parallel_wavegan/models/melgan.py:204-219)
  - HiFiGAN: N(0, 0.01) (/root/reference/parallel_wavegan/models/hifigan.py:194-207)

Weight norm stores (kernel_v, kernel_g) with kernel = v * g/||v|| per output
channel (norm over kernel+input dims, matching torch weight_norm dim=0), g
initialized to ||v|| so the initial kernel equals the base init sample.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from parallelwavegan_tpu.ops import conv as conv_ops

Initializer = Callable[..., jnp.ndarray]


# ---------------------------------------------------------------------------
# Initializers (shapes are (K..., Cin/groups, Cout); fan_in = prod(K)*Cin/g)
# ---------------------------------------------------------------------------
def _fan_in(shape: Sequence[int]) -> int:
    out = 1
    for s in shape[:-1]:
        out *= s
    return out


def torch_conv_default_init(rng, shape, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(_fan_in(shape))
    return jax.random.uniform(rng, shape, dtype, -bound, bound)


def torch_bias_init_for(kernel_shape) -> Initializer:
    bound = 1.0 / math.sqrt(_fan_in(kernel_shape))

    def init(rng, shape, dtype=jnp.float32):
        return jax.random.uniform(rng, shape, dtype, -bound, bound)

    return init


def kaiming_normal_relu_init(rng, shape, dtype=jnp.float32):
    """torch.nn.init.kaiming_normal_(nonlinearity='relu'): N(0, 2/fan_in)."""
    std = math.sqrt(2.0 / _fan_in(shape))
    return std * jax.random.normal(rng, shape, dtype)


def normal_init(std: float) -> Initializer:
    def init(rng, shape, dtype=jnp.float32):
        return std * jax.random.normal(rng, shape, dtype)

    return init


def zeros_init(rng, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def mean_filter_init(rng, shape, dtype=jnp.float32):
    """Conv2d init to a mean filter (reference upsample.py:52-58)."""
    k = 1
    for s in shape[:-2]:
        k *= s
    return jnp.full(shape, 1.0 / k, dtype)


# ---------------------------------------------------------------------------
# Activations (torch-name registry so reference YAML configs resolve)
# ---------------------------------------------------------------------------
def get_activation(name: Optional[str], params: Optional[dict] = None):
    """Map a torch.nn activation class name to a jnp function."""
    params = dict(params or {})
    if name is None:
        return lambda x: x
    if name == "LeakyReLU":
        slope = params.get("negative_slope", 0.01)
        return partial(nn.leaky_relu, negative_slope=slope)
    if name == "ReLU":
        return nn.relu
    if name == "ELU":
        return partial(nn.elu, alpha=params.get("alpha", 1.0))
    if name == "GELU":
        return nn.gelu
    if name == "Tanh":
        return jnp.tanh
    if name == "Sigmoid":
        return jax.nn.sigmoid
    if name == "Softmax":
        # torch uses dim=1 (channels); channels-last -> last axis
        return partial(jax.nn.softmax, axis=-1)
    if name == "SiLU" or name == "Swish":
        return jax.nn.silu
    raise ValueError(f"unsupported activation: {name}")


# torch pad-module name -> jnp.pad mode (for reference config parity)
_PAD_MODES = {
    "ConstantPad1d": "zeros",
    "ZeroPad1d": "zeros",
    "ReflectionPad1d": "reflect",
    "ReplicationPad1d": "replicate",
}


def pad_mode_from_torch(name: str) -> str:
    if name in _PAD_MODES:
        return _PAD_MODES[name]
    raise ValueError(f"unsupported pad module: {name}")


# ---------------------------------------------------------------------------
# Norm helpers shared by Conv1d/Conv2d
# ---------------------------------------------------------------------------
def _wn_norm(v: jnp.ndarray, axes=None) -> jnp.ndarray:
    if axes is None:
        axes = tuple(range(v.ndim - 1))
    return jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True))


class _ConvBase(nn.Module):
    """Shared weight handling for normed convs."""

    def _kernel(self, shape, kernel_init, use_weight_norm, use_spectral_norm,
                deterministic, wn_axes=None):
        # wn_axes: reduction axes of the weight-norm ||v||. Default all-but-
        # last (per out channel, torch weight_norm dim=0 on conv). Transposed
        # convs pass per-*input*-channel axes, since torch's dim=0 there is
        # the input-channel dim of its (I, O, K) weight.
        if use_weight_norm:
            v = self.param("kernel_v", kernel_init, shape)
            g = self.param("kernel_g", lambda rng: _wn_norm(v, wn_axes))
            kernel = v * (g / jnp.maximum(_wn_norm(v, wn_axes), 1e-12))
        else:
            kernel = self.param("kernel", kernel_init, shape)
        if use_spectral_norm:
            kernel = self._spectral_normalize(kernel, deterministic)
        return kernel

    def _spectral_normalize(self, kernel, deterministic):
        # torch reshapes (O, I, K...) -> (O, -1); ours is (K..., I, O):
        # flatten all non-output dims.
        out_ch = kernel.shape[-1]
        w = kernel.reshape(-1, out_ch).T  # (O, N)
        u_var = self.variable(
            "spectral", "u",
            lambda: jax.random.normal(self.make_rng("params"), (out_ch,))
            / math.sqrt(out_ch),
        )
        u = u_var.value
        v = w.T @ u
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
        u_new = w @ v
        u_new = u_new / jnp.maximum(jnp.linalg.norm(u_new), 1e-12)
        sigma = u_new @ (w @ v)
        if not deterministic and not self.is_initializing():
            u_var.value = jax.lax.stop_gradient(u_new)
        return kernel / jax.lax.stop_gradient(sigma)


class Conv1d(_ConvBase):
    """Conv1d on (B, T, Cin) -> (B, T', Cout), torch-compatible padding."""

    features: int
    kernel_size: int = 1
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    bias: bool = True
    padding: Union[int, Tuple[int, int]] = 0
    pad_mode: str = "zeros"
    use_weight_norm: bool = False
    use_spectral_norm: bool = False
    kernel_init: Initializer = torch_conv_default_init
    bias_init: Optional[Initializer] = None
    precision: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        in_ch = x.shape[-1]
        shape = (self.kernel_size, in_ch // self.groups, self.features)
        kernel = self._kernel(
            shape, self.kernel_init, self.use_weight_norm,
            self.use_spectral_norm, deterministic,
        )
        bias = None
        if self.bias:
            binit = self.bias_init or torch_bias_init_for(shape)
            bias = self.param("bias", binit, (self.features,))
        pad = self.padding
        if isinstance(pad, int):
            pad = (pad, pad)
        if self.pad_mode != "zeros" and pad != (0, 0):
            x = conv_ops.pad1d(x, pad, self.pad_mode)
            pad = (0, 0)
        return conv_ops.conv1d(
            x, kernel, bias, self.stride, tuple(pad), self.dilation,
            self.groups, self.precision,
        )


class ConvTranspose1d(_ConvBase):
    """Transposed Conv1d with torch ConvTranspose1d length semantics."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    output_padding: int = 0
    dilation: int = 1
    groups: int = 1
    bias: bool = True
    use_weight_norm: bool = False
    use_spectral_norm: bool = False
    kernel_init: Initializer = torch_conv_default_init
    bias_init: Optional[Initializer] = None
    precision: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        in_ch = x.shape[-1]
        # stored in forward-conv orientation (K, Cin/groups, Cout); fan_in for
        # torch's default init on transposed convs is Cout/groups * K
        shape = (self.kernel_size, in_ch // self.groups, self.features)
        kernel = self._kernel(
            shape, self.kernel_init, self.use_weight_norm,
            self.use_spectral_norm, deterministic, wn_axes=(0, 2),
        )
        bias = None
        if self.bias:
            tshape = (self.kernel_size, self.features // self.groups, in_ch)
            binit = self.bias_init or torch_bias_init_for(tshape)
            bias = self.param("bias", binit, (self.features,))
        return conv_ops.conv_transpose1d(
            x, kernel, bias, self.stride, self.padding, self.output_padding,
            self.dilation, self.groups, self.precision,
        )


class Conv2d(_ConvBase):
    """Conv2d on (B, H, W, Cin) -> (B, H', W', Cout)."""

    features: int
    kernel_size: Tuple[int, int] = (1, 1)
    stride: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    groups: int = 1
    bias: bool = True
    padding: Union[Tuple[int, int], Tuple[Tuple[int, int], Tuple[int, int]]] = (0, 0)
    use_weight_norm: bool = False
    use_spectral_norm: bool = False
    kernel_init: Initializer = torch_conv_default_init
    bias_init: Optional[Initializer] = None
    precision: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        shape = (kh, kw, in_ch // self.groups, self.features)
        kernel = self._kernel(
            shape, self.kernel_init, self.use_weight_norm,
            self.use_spectral_norm, deterministic,
        )
        pad = self.padding
        if isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
        )
        y = jax.lax.conv_general_dilated(
            x, kernel, self.stride, pad, rhs_dilation=self.dilation,
            dimension_numbers=dn, feature_group_count=self.groups,
            precision=self.precision,
        )
        if self.bias:
            binit = self.bias_init or torch_bias_init_for(shape)
            y = y + self.param("bias", binit, (self.features,))
        return y


class Dense(nn.Module):
    """Linear layer with torch-default init (used by duration predictor)."""

    features: int
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", torch_conv_default_init, (in_ch, self.features)
        )
        y = x @ kernel
        if self.bias:
            bound = 1.0 / math.sqrt(in_ch)
            y = y + self.param(
                "bias",
                lambda rng, s, d=jnp.float32: jax.random.uniform(
                    rng, s, d, -bound, bound
                ),
                (self.features,),
            )
        return y


def instance_norm_1d(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """torch InstanceNorm1d (affine=False): normalize (B, T, C) over T."""
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.var(x, axis=1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel axis of (B, T, C) with learnable affine.

    Mirrors the reference's dim-selectable LayerNorm
    (/root/reference/parallel_wavegan/layers/layer_norm.py:10-40).
    """

    features: int
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", lambda r, s: jnp.ones(s), (self.features,))
        bias = self.param("bias", lambda r, s: jnp.zeros(s), (self.features,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
