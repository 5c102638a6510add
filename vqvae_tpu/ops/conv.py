"""Functional NHWC convolution ops with exact torch operator semantics.

The reference delegates all convs to torch.nn.{Conv2d,ConvTranspose2d} in NCHW.
On TPU the native layout is NHWC (channels on the 128-wide lane dimension), so
the whole framework is NHWC end-to-end; XLA lowers these to MXU convolutions.

``conv_transpose2d`` reproduces torch's ConvTranspose2d exactly: the gradient of
a strided conv, i.e. a conv over the input dilated by ``stride`` with spatially
flipped kernels and padding ``k - 1 - p``. This matches the decoder's upsampling
(reference models/decoder.py:27-35) including its output-size arithmetic.

Kernels are stored HWIO relative to the *consuming* convolution:
  - conv2d:            (kh, kw, C_in, C_out)
  - conv_transpose2d:  (kh, kw, C_in, C_out) where the op maps C_in -> C_out.
    torch stores ConvTranspose2d weight as (C_in, C_out, kh, kw) and computes
    fan_in = C_out*kh*kw for default init — see models/initializers.py.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")

# On TPU, lax's DEFAULT precision feeds fp32 conv operands to the MXU as
# single-pass bf16 (8-bit mantissa). The reference trains in full fp32; at
# 5k updates the bf16 gradient noise measurably degrades convergence (see
# PARITY.md), so training paths pass "highest" (6-pass fp32-exact) while
# serving uses compute_dtype=bfloat16, where precision is moot.
_PRECISIONS = {
    None: None,
    "default": lax.Precision.DEFAULT,
    "high": lax.Precision.HIGH,
    "highest": lax.Precision.HIGHEST,
}


def _pair(v: Union[int, Tuple[int, int]]) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def conv2d(x, w, b=None, stride=1, padding=0, precision: Optional[str] = None):
    """2-D convolution, torch Conv2d semantics, NHWC.

    x: (N, H, W, C_in); w: (kh, kw, C_in, C_out); b: (C_out,) or None.
    precision: None/"default" | "high" | "highest" (MXU pass count for fp32
    operands; irrelevant when x is already bfloat16).
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    y = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        dimension_numbers=_DN,
        precision=_PRECISIONS[precision],
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv_transpose2d(x, w, b=None, stride=1, padding=0, precision: Optional[str] = None):
    """2-D transposed convolution, torch ConvTranspose2d semantics, NHWC.

    Implemented as conv_general_dilated with lhs_dilation=stride, spatially
    flipped kernel, padding (k-1-p): output size = (H-1)*s - 2p + k.
    x: (N, H, W, C_in); w: (kh, kw, C_in, C_out); b: (C_out,) or None.
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    kh, kw = w.shape[0], w.shape[1]
    w_flip = jnp.flip(w, axis=(0, 1))
    y = lax.conv_general_dilated(
        x,
        w_flip.astype(x.dtype),
        window_strides=(1, 1),
        padding=((kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)),
        lhs_dilation=(sh, sw),
        dimension_numbers=_DN,
        precision=_PRECISIONS[precision],
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


__all__ = ["conv2d", "conv_transpose2d"]
