from vqvae_tpu.ops.conv import conv2d, conv_transpose2d
from vqvae_tpu.ops.quantizer import (
    quantize,
    nearest_code,
    nearest_code_jnp,
    QuantizeOutput,
)

__all__ = [
    "conv2d",
    "conv_transpose2d",
    "quantize",
    "nearest_code",
    "nearest_code_jnp",
    "QuantizeOutput",
]
