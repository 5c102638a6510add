"""Command-line interface.

One CLI replaces the reference's two ad-hoc argparse scripts (main.py,
pixelcnn/gated_pixelcnn.py) and adds the pipelines the reference only
describes: latent extraction (README.md:53-58) and end-to-end sampling.

    python -m vqvae_tpu.cli train-vqvae [--batch_size 32 --n_updates 5000 ...]
    python -m vqvae_tpu.cli extract-latents --checkpoint results/...npz
    python -m vqvae_tpu.cli train-prior [--epochs 100 ...]
    python -m vqvae_tpu.cli sample --vqvae-checkpoint ... --prior-checkpoint ...
    python -m vqvae_tpu.cli benchmark

Flag names/defaults mirror the reference's (main.py:16-30,
gated_pixelcnn.py:27-42) so reference invocations translate 1:1.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys

import numpy as np

from vqvae_tpu.config import MeshConfig, PixelCNNConfig, TrainConfig, VQVAEConfig


def _add_vqvae_flags(p: argparse.ArgumentParser):
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--n_updates", type=int, default=5000)
    p.add_argument("--n_hiddens", type=int, default=128)
    p.add_argument("--n_residual_hiddens", type=int, default=32)
    p.add_argument("--n_residual_layers", type=int, default=2)
    p.add_argument("--embedding_dim", type=int, default=64)
    p.add_argument("--n_embeddings", type=int, default=512)
    p.add_argument("--beta", type=float, default=0.25)
    p.add_argument("--learning_rate", type=float, default=3e-4)
    p.add_argument("--log_interval", type=int, default=50)
    p.add_argument("--dataset", type=str, default="CIFAR10")
    p.add_argument("-save", action="store_true")
    p.add_argument("--filename", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data_dir", type=str, default="data")
    p.add_argument("--results_dir", type=str, default="results")
    p.add_argument("--compute_dtype", type=str, default="float32")
    p.add_argument("--share_residual_weights", action="store_true",
                   help="strict parity with the reference's accidental weight sharing")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint for this filename")
    p.add_argument("--amsgrad_impl", type=str, default="torch",
                   choices=["torch", "optax"],
                   help="AMSGrad flavor: torch = exact reference semantics")
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="updates per device dispatch (scan); amortizes host overhead")
    p.add_argument("--ema_codebook", action="store_true",
                   help="EMA codebook updates instead of gradient descent")
    p.add_argument("--ema_decay", type=float, default=0.99)
    p.add_argument("--quantizer_precision", type=str, default="highest",
                   choices=["highest", "high", "default"],
                   help="distance-matmul precision (highest = bitwise argmin parity)")
    p.add_argument("--conv_precision", type=str, default="highest",
                   choices=["highest", "high", "default"],
                   help="MXU precision for fp32 conv operands (highest = the "
                        "reference's fp32 training arithmetic; moot under "
                        "--compute_dtype bfloat16)")
    p.add_argument("--quantizer_impl", type=str, default="auto",
                   choices=["auto", "pallas", "jnp"],
                   help="quantizer forward backend")


def _mesh_flags(p: argparse.ArgumentParser):
    p.add_argument("--n_data", type=int, default=None, help="devices on the data axis")
    p.add_argument("--n_code", type=int, default=1,
                   help="codebook-parallel devices (shards the codebook row-wise)")
    p.add_argument("--distributed", action="store_true")
    p.add_argument("--coordinator_address", type=str, default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)


def _mesh_cfg(args) -> MeshConfig:
    return MeshConfig(
        n_data=args.n_data,
        n_code=args.n_code,
        distributed=args.distributed,
        coordinator_address=args.coordinator_address,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )


def _saved_hp(path: str) -> dict:
    """Hyperparameters stored in a checkpoint ({} for legacy files without
    ``__meta__``). Corrupt files (bad zip/JSON) raise — masking those as
    "legacy" would send the user down a misleading flag-mismatch path."""
    from vqvae_tpu.train.checkpoint import peek_hyperparameters

    try:
        return peek_hyperparameters(path)
    except KeyError:
        return {}


def _vqvae_cfg_for_checkpoint(path: str, args) -> VQVAEConfig:
    """Config for LOADING a VQ-VAE checkpoint: prefer the checkpoint's own
    stored hyperparameters (reference load_model semantics,
    visualization.ipynb cell 1) over the loading process's flags — a
    non-default mode like --ema_codebook changes the state tree, so
    rebuilding from flags fails the strict v2 tree match (or worse,
    cross-loads a different architecture)."""
    hp = _saved_hp(path)
    if hp:
        # quantizer_impl is pure execution-backend dispatch, not model
        # identity: a TPU-trained checkpoint with impl="pallas" must still
        # load on a CPU host, so re-resolve it here ("auto" falls back to
        # the XLA path off-TPU).
        return VQVAEConfig.from_dict(hp).replace(quantizer_impl="auto")
    return VQVAEConfig(
        n_hiddens=args.n_hiddens,
        n_residual_hiddens=args.n_residual_hiddens,
        n_residual_layers=args.n_residual_layers,
        embedding_dim=args.embedding_dim,
        n_embeddings=args.n_embeddings,
        beta=args.beta,
        share_residual_weights=args.share_residual_weights,
        # mode flags the same subparsers define — a legacy EMA checkpoint
        # is loadable by passing --ema_codebook etc. explicitly
        compute_dtype=getattr(args, "compute_dtype", "float32"),
        conv_precision=getattr(args, "conv_precision", "highest"),
        quantizer_precision=getattr(args, "quantizer_precision", "highest"),
        ema_codebook=getattr(args, "ema_codebook", False),
        ema_decay=getattr(args, "ema_decay", 0.99),
    )


def _pixelcnn_cfg_for_checkpoint(path: str, args) -> PixelCNNConfig:
    """Config for LOADING a prior checkpoint — same contract as
    :func:`_vqvae_cfg_for_checkpoint`."""
    hp = _saved_hp(path)
    if hp:
        return PixelCNNConfig.from_dict(hp)
    return PixelCNNConfig(
        input_dim=args.n_embeddings, dim=args.img_dim ** 2,
        n_layers=args.n_layers, img_dim=args.img_dim,
    )


def cmd_train_vqvae(args) -> int:
    from vqvae_tpu.parallel.distributed import maybe_initialize_distributed
    from vqvae_tpu.train.vqvae_train import train_vqvae

    mesh_cfg = _mesh_cfg(args)
    maybe_initialize_distributed(mesh_cfg)
    vq_cfg = VQVAEConfig(
        n_hiddens=args.n_hiddens,
        n_residual_hiddens=args.n_residual_hiddens,
        n_residual_layers=args.n_residual_layers,
        embedding_dim=args.embedding_dim,
        n_embeddings=args.n_embeddings,
        beta=args.beta,
        share_residual_weights=args.share_residual_weights,
        compute_dtype=args.compute_dtype,
        conv_precision=args.conv_precision,
        ema_codebook=args.ema_codebook,
        ema_decay=args.ema_decay,
        quantizer_precision=args.quantizer_precision,
        quantizer_impl=args.quantizer_impl,
    )
    train_cfg = TrainConfig(
        batch_size=args.batch_size,
        n_updates=args.n_updates,
        learning_rate=args.learning_rate,
        log_interval=args.log_interval,
        dataset=args.dataset,
        seed=args.seed,
        save=args.save,
        filename=args.filename,
        data_dir=args.data_dir,
        results_dir=args.results_dir,
        steps_per_dispatch=args.steps_per_dispatch,
        amsgrad_impl=args.amsgrad_impl,
    )
    if args.save:
        name = args.filename or "run"
        print(f"Results will be saved in ./{args.results_dir}/vqvae_{name}_step*.npz")
    train_vqvae(vq_cfg, train_cfg, mesh_cfg, resume=args.resume)
    return 0


def cmd_extract_latents(args) -> int:
    from vqvae_tpu.data.datasets import load_dataset
    from vqvae_tpu.pipelines.extract import extract_latents
    from vqvae_tpu.train.checkpoint import load_checkpoint
    from vqvae_tpu.train.vqvae_train import TrainConfig as _TC, VQVAETrainer

    train_ds, val_ds, x_train_var, _info = load_dataset(args.dataset, args.data_dir)
    vq_cfg = _vqvae_cfg_for_checkpoint(args.checkpoint, args)
    trainer = VQVAETrainer(vq_cfg, TrainConfig(), x_train_var=x_train_var)
    template = trainer.init_state()
    state, step, _, _ = load_checkpoint(args.checkpoint, template)
    out = args.out or f"{args.data_dir}/latent_e_indices.npy"
    data = np.concatenate([train_ds.data, val_ds.data])
    codes = extract_latents(trainer, state, data, batch_size=args.extract_batch, out_path=out)
    print(f"Saved {codes.shape} code grids from step-{step} checkpoint to {out}")
    return 0


def cmd_train_prior(args) -> int:
    from vqvae_tpu.data.datasets import load_dataset
    from vqvae_tpu.train.pixelcnn_train import train_pixelcnn

    train_ds, val_ds, _var, _info = load_dataset("LATENT_BLOCK", args.data_dir)
    cfg = PixelCNNConfig(
        input_dim=args.n_embeddings,
        dim=args.img_dim ** 2,
        n_layers=args.n_layers,
        img_dim=args.img_dim,
        compute_dtype=args.compute_dtype,
        conv_precision=args.conv_precision,
    )
    train_cfg = TrainConfig(
        batch_size=args.batch_size,
        epochs=args.epochs,
        learning_rate=args.learning_rate,
        log_interval=args.log_interval,
        save=args.save,
        data_dir=args.data_dir,
        results_dir=args.results_dir,
        seed=args.seed,
        gen_samples=args.gen_samples,
        steps_per_dispatch=args.steps_per_dispatch,
    )
    save_path = f"{args.results_dir}/latent_block_pixelcnn.npz"
    train_pixelcnn(
        cfg, train_cfg, train_ds, val_ds, save_path=save_path, resume=args.resume
    )
    return 0


def cmd_sample(args) -> int:
    from vqvae_tpu.pipelines.sample import sample_images
    from vqvae_tpu.train.checkpoint import load_checkpoint
    from vqvae_tpu.train.pixelcnn_train import PixelCNNTrainer
    from vqvae_tpu.train.vqvae_train import VQVAETrainer

    import jax

    vq_cfg = _vqvae_cfg_for_checkpoint(args.vqvae_checkpoint, args)
    pc_cfg = _pixelcnn_cfg_for_checkpoint(args.prior_checkpoint, args)
    vq_trainer = VQVAETrainer(vq_cfg, TrainConfig())
    vq_state, _, _, _ = load_checkpoint(args.vqvae_checkpoint, vq_trainer.init_state())
    pc_trainer = PixelCNNTrainer(pc_cfg, TrainConfig())
    pc_state, _, _, _ = load_checkpoint(args.prior_checkpoint, pc_trainer.init_state())

    # class-conditional labels cycling 0..9 (reference gated_pixelcnn.py:143-149
    # uses 10x each of 0..9); works for any n_samples, not just multiples of 10
    labels = (np.arange(args.n_samples) % 10).astype(np.int32)
    images, codes = sample_images(
        vq_trainer, vq_state, pc_trainer, pc_state, labels,
        rng=jax.random.PRNGKey(args.seed),
    )
    out = args.out or "samples/samples.npz"
    import os

    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    np.savez(out, images=images, codes=codes, labels=labels)
    print(f"Saved {images.shape[0]} samples to {out}")
    if args.png:
        from vqvae_tpu.pipelines.viz import save_image_grid

        # labels cycle 0..9, so with 10 columns class c fills COLUMN c (the
        # transpose of the reference's row-per-class 10x10 grid,
        # gated_pixelcnn.py:143-149 — same 10-per-class content)
        n_cols = 10 if args.n_samples % 10 == 0 else 8
        print(f"Wrote {save_image_grid(images, args.png, n_cols=n_cols)}")
    return 0


def cmd_serve(args) -> int:
    """Continuous-batching sampling service behind an HTTP JSON API."""
    from vqvae_tpu.pipelines.sample import decode_code_grids
    from vqvae_tpu.pipelines.serve import SamplingHTTPServer, SamplingService
    from vqvae_tpu.train.checkpoint import load_checkpoint
    from vqvae_tpu.train.pixelcnn_train import PixelCNNTrainer
    from vqvae_tpu.train.vqvae_train import VQVAETrainer

    pc_cfg = _pixelcnn_cfg_for_checkpoint(args.prior_checkpoint, args)
    pc_trainer = PixelCNNTrainer(pc_cfg, TrainConfig())
    pc_state, _, _, _ = load_checkpoint(args.prior_checkpoint, pc_trainer.init_state())
    service = SamplingService(
        pc_cfg, pc_state.params, batch_size=args.serve_batch, seed=args.seed
    )

    decode_fn = None
    if args.vqvae_checkpoint:
        vq_cfg = _vqvae_cfg_for_checkpoint(args.vqvae_checkpoint, args)
        vq_trainer = VQVAETrainer(vq_cfg, TrainConfig())
        vq_state, _, _, _ = load_checkpoint(
            args.vqvae_checkpoint, vq_trainer.init_state()
        )
        decode_fn = lambda codes: decode_code_grids(vq_trainer, vq_state, codes)

    service.start()
    server = SamplingHTTPServer(service, decode_fn, host=args.host, port=args.port)
    print(f"serving on http://{server.address[0]}:{server.address[1]} "
          f"(POST /sample, GET /healthz)", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        service.stop()
    return 0


def cmd_profile(args) -> int:
    """Capture an xprof device trace of training steps (SURVEY.md §5 tracing)."""
    from vqvae_tpu.data.datasets import load_dataset
    from vqvae_tpu.data.sampler import ReplacementSampler
    from vqvae_tpu.train.vqvae_train import VQVAETrainer
    from vqvae_tpu.utils.profiling import annotate, profile_trace

    train_ds, _val, x_train_var, _info = load_dataset(args.dataset, args.data_dir)
    vq_cfg = VQVAEConfig(
        n_hiddens=args.n_hiddens,
        n_residual_hiddens=args.n_residual_hiddens,
        n_residual_layers=args.n_residual_layers,
        embedding_dim=args.embedding_dim,
        n_embeddings=args.n_embeddings,
        beta=args.beta,
        compute_dtype=args.compute_dtype,
        conv_precision=args.conv_precision,
        quantizer_precision=args.quantizer_precision,
        ema_codebook=args.ema_codebook,
        ema_decay=args.ema_decay,
    )
    trainer = VQVAETrainer(vq_cfg, TrainConfig(batch_size=args.batch_size),
                           x_train_var=x_train_var)
    state = trainer.init_state()
    sampler = ReplacementSampler(len(train_ds), args.batch_size, seed=args.seed)
    # warm up the compile outside the trace so the trace is pure steady-state
    state, m = trainer.step(state, train_ds.data[sampler.next_indices()])
    np.asarray(m["loss"])
    with profile_trace(args.trace_dir):
        for i in range(args.profile_steps):
            with annotate(f"train_step_{i}"):
                state, m = trainer.step(state, train_ds.data[sampler.next_indices()])
        np.asarray(m["loss"])  # host-transfer fence inside the trace window
    print(f"Wrote xprof trace of {args.profile_steps} steps to {args.trace_dir}")
    return 0


def cmd_benchmark(args) -> int:
    import subprocess

    return subprocess.call([sys.executable, "bench.py"])


def cmd_viz(args) -> int:
    """Metric curves + reconstructions from a checkpoint (the notebook's eval
    surface — visualization.ipynb cells 1-8)."""
    from vqvae_tpu.data.datasets import load_dataset
    from vqvae_tpu.pipelines.viz import (
        load_model,
        plot_metrics,
        reconstruct,
        save_image_grid,
    )

    trainer, state, metrics, hp = load_model(args.checkpoint)
    outdir = args.out_dir
    if metrics:
        p = plot_metrics(metrics, f"{outdir}/metrics.png")
        print(f"Wrote {p}")
    _train, val, _var, _info = load_dataset(
        hp.get("dataset", "CIFAR10"), args.data_dir
    )
    batch = val.data[: args.n_images]
    recons = reconstruct(trainer, state, batch)
    print(f"Wrote {save_image_grid(batch, f'{outdir}/originals.png')}")
    print(f"Wrote {save_image_grid(recons, f'{outdir}/reconstructions.png')}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="vqvae_tpu")
    sub = p.add_subparsers(dest="command", required=True)

    tv = sub.add_parser("train-vqvae", help="train the VQ-VAE (reference main.py)")
    _add_vqvae_flags(tv)
    _mesh_flags(tv)
    tv.set_defaults(fn=cmd_train_vqvae)

    ex = sub.add_parser("extract-latents", help="dataset -> code indices .npy")
    _add_vqvae_flags(ex)
    ex.add_argument("--checkpoint", type=str, required=True)
    ex.add_argument("--out", type=str, default=None)
    ex.add_argument("--extract_batch", type=int, default=256)
    ex.set_defaults(fn=cmd_extract_latents)

    tp = sub.add_parser("train-prior", help="train GatedPixelCNN on latents")
    tp.add_argument("--batch_size", type=int, default=32)
    tp.add_argument("--epochs", type=int, default=100)
    tp.add_argument("--log_interval", type=int, default=100)
    tp.add_argument("-save", action="store_true")
    tp.add_argument("--img_dim", type=int, default=8)
    tp.add_argument("--n_embeddings", type=int, default=512)
    tp.add_argument("--n_layers", type=int, default=15)
    tp.add_argument("--learning_rate", type=float, default=3e-4)
    tp.add_argument("--seed", type=int, default=0)
    tp.add_argument("--data_dir", type=str, default="data")
    tp.add_argument("--results_dir", type=str, default="results")
    tp.add_argument("--gen_samples", action="store_true",
                    help="generate 10x10 class-conditional samples each epoch "
                         "(reference gated_pixelcnn.py:143-149)")
    tp.add_argument("--compute_dtype", type=str, default="float32",
                    choices=["float32", "bfloat16"],
                    help="prior conv-stack compute dtype (bfloat16 with "
                         "--conv_precision default = the 3.76x fast mode; "
                         "params stay fp32)")
    tp.add_argument("--conv_precision", type=str, default="highest",
                    choices=["highest", "high", "default"])
    tp.add_argument("--resume", action="store_true",
                    help="resume from the saved prior checkpoint")
    tp.add_argument("--steps_per_dispatch", type=int, default=1,
                    help="updates per device dispatch (lax.scan over batches "
                         "gathered on-device from the staged latent grids); "
                         "1 = reference-style one-dispatch-per-step")
    tp.set_defaults(fn=cmd_train_prior)

    sm = sub.add_parser("sample", help="AR sample codes -> decode images")
    _add_vqvae_flags(sm)
    sm.add_argument("--img_dim", type=int, default=8)
    sm.add_argument("--n_layers", type=int, default=15)
    sm.add_argument("--vqvae-checkpoint", type=str, required=True)
    sm.add_argument("--prior-checkpoint", type=str, required=True)
    sm.add_argument("--n_samples", type=int, default=100)
    sm.add_argument("--out", type=str, default=None)
    sm.add_argument("--png", type=str, default=None,
                    help="also render the samples as one PNG grid")
    sm.set_defaults(fn=cmd_sample)

    bm = sub.add_parser("benchmark", help="run bench.py")
    bm.set_defaults(fn=cmd_benchmark)

    sv = sub.add_parser("serve", help="HTTP sampling service (continuous batching)")
    _add_vqvae_flags(sv)
    sv.add_argument("--img_dim", type=int, default=8)
    sv.add_argument("--n_layers", type=int, default=15)
    sv.add_argument("--prior-checkpoint", type=str, required=True)
    sv.add_argument("--vqvae-checkpoint", type=str, default=None,
                    help="attach a decoder so /sample can return images")
    sv.add_argument("--host", type=str, default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8787)
    sv.add_argument("--serve_batch", type=int, default=64,
                    help="device slots per lockstep wave")
    sv.set_defaults(fn=cmd_serve)

    pf = sub.add_parser("profile", help="capture an xprof trace of train steps")
    _add_vqvae_flags(pf)
    pf.add_argument("--trace_dir", type=str, default="results/trace")
    pf.add_argument("--profile_steps", type=int, default=10)
    pf.set_defaults(fn=cmd_profile)

    vz = sub.add_parser("viz", help="metric curves + reconstructions from a checkpoint")
    vz.add_argument("--checkpoint", type=str, required=True)
    vz.add_argument("--out_dir", type=str, default="results/viz")
    vz.add_argument("--data_dir", type=str, default="data")
    vz.add_argument("--n_images", type=int, default=16)
    vz.set_defaults(fn=cmd_viz)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
