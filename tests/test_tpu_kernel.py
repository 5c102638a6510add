"""On-TPU (non-interpret) Pallas quantizer parity test.

The rest of the suite runs on the virtual CPU mesh (conftest.py forces the
platform before jax initializes), where Pallas runs in interpreter mode. This
test compiles the REAL Mosaic kernel on the TPU chip — in a subprocess, so the
session's CPU platform config doesn't apply.

Gated behind RUN_TPU_TESTS=1 because the chip is single-tenant (a second TPU
process blocks forever) and tunnel compiles take minutes:

    RUN_TPU_TESTS=1 python -m pytest tests/test_tpu_kernel.py -v
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("RUN_TPU_TESTS") != "1",
    reason="needs exclusive real-TPU access; set RUN_TPU_TESTS=1",
)

_CHECK = textwrap.dedent(
    """
    import jax, numpy as np
    import jax.numpy as jnp
    assert jax.default_backend() == "tpu", jax.default_backend()
    from vqvae_tpu.ops.pallas_quantizer import nearest_code_pallas
    from vqvae_tpu.ops.quantizer import nearest_code_jnp

    for (n, k, d) in [(2048, 512, 64), (2048, 8192, 256), (1000, 300, 48)]:
        z = jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.float32)
        cb = jax.random.normal(jax.random.PRNGKey(1), (k, d), jnp.float32)
        zq_ref, idx_ref = nearest_code_jnp(z, cb, precision="highest")
        # compiled Mosaic kernel (interpret=False on tpu backend)
        zq, idx = nearest_code_pallas(z, cb, precision="highest")
        idx, idx_ref = np.asarray(idx), np.asarray(idx_ref)
        mism = int((idx != idx_ref).sum())
        assert mism == 0, f"({n},{k},{d}): {mism} index mismatches vs fp32 XLA"
        assert np.array_equal(np.asarray(zq), np.asarray(cb)[idx]), "gather not exact"
        # tie-break duplicate codebook rows -> torch-style first-minimum
        cb_dup = jnp.concatenate([cb[: k // 2], cb[: k // 2]], axis=0)
        _, idx_dup = nearest_code_pallas(z, cb_dup, precision="highest")
        assert int(np.asarray(idx_dup).max()) < k // 2, "tie-break not first-min"
    print("TPU_KERNEL_PARITY_OK")
    """
)


def test_pallas_kernel_on_tpu():
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORM_NAME", "JAX_PLATFORMS", "XLA_FLAGS")
    }
    out = subprocess.run(
        [sys.executable, "-u", "-c", _CHECK],
        capture_output=True,
        text=True,
        timeout=1500,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, f"stdout:\n{out.stdout}\nstderr:\n{out.stderr[-3000:]}"
    assert "TPU_KERNEL_PARITY_OK" in out.stdout
