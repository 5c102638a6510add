"""GatedPixelCNN tests: causality, forward parity vs the reference torch model
(read-only import with copied weights), and AR sampling sanity.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqvae_tpu.config import PixelCNNConfig
from vqvae_tpu.models.pixelcnn import GatedPixelCNN

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")


def _small_cfg(n_layers=3):
    return PixelCNNConfig(input_dim=32, dim=16, n_layers=n_layers, n_classes=10, img_dim=8)


@pytest.fixture(scope="module")
def small_model():
    cfg = _small_cfg()
    model = GatedPixelCNN(cfg)
    x = jnp.zeros((2, 8, 8), jnp.int32)
    lab = jnp.zeros((2,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, lab)["params"]
    return cfg, model, params


def test_output_shape(small_model):
    cfg, model, params = small_model
    x = jnp.zeros((2, 8, 8), jnp.int32)
    lab = jnp.zeros((2,), jnp.int32)
    logits = model.apply({"params": params}, x, lab)
    assert logits.shape == (2, 8, 8, cfg.input_dim)


def test_causality(small_model):
    """logits at (i, j) must not depend on inputs at raster positions >= (i, j)."""
    cfg, model, params = small_model
    rng = np.random.default_rng(0)
    x = rng.integers(0, cfg.input_dim, (1, 8, 8)).astype(np.int32)
    lab = jnp.zeros((1,), jnp.int32)
    base = np.asarray(model.apply({"params": params}, jnp.asarray(x), lab))

    i, j = 4, 4
    for (pi, pj) in [(4, 4), (4, 6), (5, 0), (7, 7)]:  # current + later positions
        x2 = x.copy()
        x2[0, pi, pj] = (x2[0, pi, pj] + 7) % cfg.input_dim
        out = np.asarray(model.apply({"params": params}, jnp.asarray(x2), lab))
        np.testing.assert_allclose(
            out[0, i, j], base[0, i, j], atol=1e-5,
            err_msg=f"logits at {(i, j)} leaked from input at {(pi, pj)}",
        )

    # and it MUST depend on earlier positions (sanity that the test can fail)
    x3 = x.copy()
    x3[0, 2, 2] = (x3[0, 2, 2] + 7) % cfg.input_dim
    out3 = np.asarray(model.apply({"params": params}, jnp.asarray(x3), lab))
    assert np.abs(out3[0, i, j] - base[0, i, j]).max() > 1e-7


def _copy_params_to_torch_pixelcnn(params, tmodel, n_layers):
    def t_conv(w):
        return torch.from_numpy(np.asarray(w).transpose(3, 2, 0, 1).copy())

    def t_vec(v):
        return torch.from_numpy(np.asarray(v).copy())

    sd = {"embedding.weight": t_vec(params["embedding"])}
    for i in range(n_layers):
        lp = params[f"layer_{i}"]
        sd[f"layers.{i}.class_cond_embedding.weight"] = t_vec(lp["class_cond_embedding"])
        sd[f"layers.{i}.vert_stack.weight"] = t_conv(lp["vert_stack_w"])
        sd[f"layers.{i}.vert_stack.bias"] = t_vec(lp["vert_stack_b"])
        sd[f"layers.{i}.vert_to_horiz.weight"] = t_conv(lp["vert_to_horiz_w"])
        sd[f"layers.{i}.vert_to_horiz.bias"] = t_vec(lp["vert_to_horiz_b"])
        sd[f"layers.{i}.horiz_stack.weight"] = t_conv(lp["horiz_stack_w"])
        sd[f"layers.{i}.horiz_stack.bias"] = t_vec(lp["horiz_stack_b"])
        sd[f"layers.{i}.horiz_resid.weight"] = t_conv(lp["horiz_resid_w"])
        sd[f"layers.{i}.horiz_resid.bias"] = t_vec(lp["horiz_resid_b"])
    sd["output_conv.0.weight"] = t_conv(params["out1_w"])
    sd["output_conv.0.bias"] = t_vec(params["out1_b"])
    sd["output_conv.2.weight"] = t_conv(params["out2_w"])
    sd["output_conv.2.bias"] = t_vec(params["out2_b"])
    tmodel.load_state_dict(sd, strict=True)


def test_forward_parity_vs_reference_torch(small_model):
    """Same weights + input grid => same logits as the reference GatedPixelCNN.

    Note the reference mask-A layer zeroes its kernel's last row/column
    in-place on forward (pixelcnn/models.py:61-67); our functional mask must
    produce identical outputs.
    """
    cfg, model, params = small_model
    from pixelcnn.models import GatedPixelCNN as TorchPixelCNN  # read-only

    tmodel = TorchPixelCNN(cfg.input_dim, cfg.dim, cfg.n_layers, cfg.n_classes)
    params_np = jax.tree_util.tree_map(np.asarray, params)
    _copy_params_to_torch_pixelcnn(params_np, tmodel, cfg.n_layers)
    tmodel.eval()

    rng = np.random.default_rng(1)
    x = rng.integers(0, cfg.input_dim, (3, 8, 8)).astype(np.int64)
    lab = rng.integers(0, cfg.n_classes, (3,)).astype(np.int64)

    logits_j = np.asarray(
        model.apply({"params": params}, jnp.asarray(x, jnp.int32), jnp.asarray(lab, jnp.int32))
    )
    with torch.no_grad():
        logits_t = tmodel(torch.from_numpy(x), torch.from_numpy(lab))
    logits_t = logits_t.numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC

    np.testing.assert_allclose(logits_j, logits_t, rtol=1e-3, atol=1e-4)


def test_generate_shapes_and_range(small_model):
    cfg, model, params = small_model
    lab = jnp.zeros((4,), jnp.int32)
    out = model.apply(
        {"params": params}, lab, jax.random.PRNGKey(0), (8, 8), 4,
        method=model.generate,
    )
    out = np.asarray(out)
    assert out.shape == (4, 8, 8)
    assert out.min() >= 0 and out.max() < cfg.input_dim


def test_bfloat16_compute_dtype_is_consumed():
    """compute_dtype=bfloat16 must actually change the arithmetic (the r5
    review caught the flag wired into config but never consumed): logits stay
    fp32 outwardly, track the fp32 model loosely, and differ bitwise from it
    (proof the bf16 path ran)."""
    import jax
    import jax.numpy as jnp

    from vqvae_tpu.config import PixelCNNConfig
    from vqvae_tpu.models.pixelcnn import GatedPixelCNN

    cfg32 = PixelCNNConfig(input_dim=32, dim=16, n_layers=3)
    cfg16 = PixelCNNConfig(
        input_dim=32, dim=16, n_layers=3,
        compute_dtype="bfloat16", conv_precision="default",
    )
    m32, m16 = GatedPixelCNN(cfg32), GatedPixelCNN(cfg16)
    grid = jnp.asarray(
        np.random.default_rng(0).integers(0, 32, (2, 8, 8)), jnp.int32
    )
    label = jnp.zeros((2,), jnp.int32)
    params = m32.init(jax.random.PRNGKey(0), grid, label)["params"]

    l32 = m32.apply({"params": params}, grid, label)
    l16 = m16.apply({"params": params}, grid, label)
    assert l16.dtype == jnp.float32  # fp32 logits for the CE loss
    assert not np.array_equal(np.asarray(l32), np.asarray(l16))  # bf16 ran
    np.testing.assert_allclose(
        np.asarray(l16), np.asarray(l32), rtol=0.1, atol=0.05
    )
