from vqvae_tpu.train.checkpoint import save_checkpoint, load_checkpoint, latest_checkpoint
from vqvae_tpu.train.metrics import MetricHistory, readable_timestamp
from vqvae_tpu.train.optim import make_optimizer, torch_amsgrad
from vqvae_tpu.train.vqvae_train import (
    VQVAETrainer,
    TrainState,
    train_vqvae,
)

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "latest_checkpoint",
    "MetricHistory",
    "readable_timestamp",
    "VQVAETrainer",
    "TrainState",
    "train_vqvae",
    "make_optimizer",
    "torch_amsgrad",
]
