"""Configuration dataclasses.

One dataclass-based config system replaces the reference's two separate argparse
flag sets (reference: main.py:16-30, pixelcnn/gated_pixelcnn.py:27-42). Defaults
are the reference defaults verbatim so that default runs are parity runs.
Configs serialize to/from plain dicts and are persisted inside checkpoints
(mirroring the reference storing ``args.__dict__`` — main.py:91-93).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple


def _asdict(cfg) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


class _DictMixin:
    def to_dict(self) -> Dict[str, Any]:
        return _asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]):
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class VQVAEConfig(_DictMixin):
    """VQ-VAE model hyperparameters (reference defaults: main.py:16-25)."""

    in_channels: int = 3
    n_hiddens: int = 128            # h_dim
    n_residual_hiddens: int = 32    # res_h_dim
    n_residual_layers: int = 2
    embedding_dim: int = 64
    n_embeddings: int = 512
    beta: float = 0.25
    # The reference accidentally shares one ResidualLayer's weights across the
    # whole stack (reference models/residual.py:44-45 uses [layer]*n). We default
    # to independent weights (the intended architecture); flip this for strict
    # parameter-count parity with the reference.
    share_residual_weights: bool = False
    # Compute dtype for conv stacks ("float32" or "bfloat16"); params stay fp32.
    compute_dtype: str = "float32"
    # MXU precision for fp32 conv operands: "highest" (6-pass, fp32-exact —
    # matches the reference's fp32 training; lax's DEFAULT would silently run
    # fp32 convs as single-pass bf16 on TPU, whose gradient noise measurably
    # degrades 5k-update convergence — see PARITY.md), "high" (bf16x3), or
    # "default". Irrelevant when compute_dtype="bfloat16" (the serving path).
    conv_precision: str = "highest"
    # Quantizer forward backend: "auto" (XLA matmul+argmin unless the (N, K)
    # score matrix exceeds the HBM budget, then the fused Pallas streaming
    # kernel), "pallas" (force fused kernel), "jnp" (force XLA).
    quantizer_impl: str = "auto"
    # Distance-matmul precision in the quantizer: "highest" (full fp32 —
    # bitwise argmin parity with the reference), "high" (bf16x3), or
    # "default" (single-pass bf16 MXU, ~6x faster distances; near-tie code
    # assignments may flip — use for inference/serving).
    quantizer_precision: str = "highest"
    # EMA codebook updates (van den Oord et al. 2017, appendix A.1): the
    # codebook is maintained by exponential moving averages of assigned
    # encoder outputs instead of gradient descent; the embedding loss reduces
    # to the beta-weighted commitment term. The reference repo only implements
    # the gradient variant; this is the BASELINE.json north-star extension
    # ("codebook replicated with EMA/gradient allreduce over ICI").
    ema_codebook: bool = False
    ema_decay: float = 0.99
    ema_epsilon: float = 1e-5


@dataclass(frozen=True)
class PixelCNNConfig(_DictMixin):
    """GatedPixelCNN prior hyperparameters (reference pixelcnn/gated_pixelcnn.py:27-42,69)."""

    input_dim: int = 512            # number of discrete codes (n_embeddings)
    dim: int = 64                   # reference sets dim = img_dim**2 = 64
    n_layers: int = 15
    n_classes: int = 10
    img_dim: int = 8                # latent grid side
    compute_dtype: str = "float32"
    # MXU precision for fp32 conv operands — see VQVAEConfig.conv_precision.
    conv_precision: str = "highest"


@dataclass(frozen=True)
class TrainConfig(_DictMixin):
    """Training-loop hyperparameters (reference defaults: main.py:16-30)."""

    batch_size: int = 32
    n_updates: int = 5000
    learning_rate: float = 3e-4     # Adam(amsgrad) — main.py:55
    # AMSGrad flavor: "torch" = exact torch-1.1.0 semantics (raw-second-moment
    # max, current-step bias correction — what the reference trains with);
    # "optax" = optax.amsgrad's bias-corrected-max variant, which effectively
    # anneals the LR ~2x after the step-~250 gradient spike (see
    # train/optim.py and PARITY.md root-cause section).
    amsgrad_impl: str = "torch"
    log_interval: int = 50
    dataset: str = "CIFAR10"        # CIFAR10 | BLOCK | LATENT_BLOCK
    seed: int = 0
    save: bool = False
    filename: Optional[str] = None
    data_dir: str = "data"
    results_dir: str = "results"
    # PixelCNN-prior loop extras (reference pixelcnn/gated_pixelcnn.py:27-42)
    epochs: int = 100
    gen_samples: bool = False
    # Steps executed per device dispatch (lax.scan over pre-staged batches).
    # Amortizes the fixed per-invocation host<->device overhead (~28 ms on
    # tunneled TPU) without changing update semantics; 1 = reference-style
    # one-dispatch-per-step.
    steps_per_dispatch: int = 1
    # Stage the full training set in device HBM once and gather batches
    # on-device from uploaded index arrays (6 KB/chunk instead of ~20 MB of
    # image data). Applied when the dataset fits under device_data_max_bytes.
    device_data: bool = True
    device_data_max_bytes: int = 2_000_000_000


@dataclass(frozen=True)
class MeshConfig(_DictMixin):
    """Device-mesh / parallelism settings (new-framework-only; reference is single device).

    The VQ-VAE parallelism scheme: batch sharded over the ``data`` axis, params
    and codebook replicated; XLA inserts gradient all-reduces over ICI.
    """

    data_axis: str = "data"
    # None => use all available devices on the data axis.
    n_data: Optional[int] = None
    # Codebook-parallel axis: shard the (K, D) codebook (and its optimizer
    # moments / EMA stats) row-wise over `code` devices (parallel/code_parallel).
    # 1 = replicated codebook (the default data-parallel-only scheme).
    code_axis: str = "code"
    n_code: int = 1
    # Multi-host bootstrap (jax.distributed.initialize) — off by default.
    distributed: bool = False
    coordinator_address: Optional[str] = None
    num_processes: Optional[int] = None
    process_id: Optional[int] = None


__all__ = ["VQVAEConfig", "PixelCNNConfig", "TrainConfig", "MeshConfig"]
