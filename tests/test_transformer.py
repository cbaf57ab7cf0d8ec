"""Transformer modules: shapes + torch parity for TransformerEncoderLayer/AIFI."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"


def test_mlp_shapes():
    import jax
    import jax.numpy as jnp

    from fce_yolo_tpu.nn.transformer import MLP

    m = MLP(hidden_dim=32, output_dim=4, num_layers=3)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 10, 16)))
    out = m.apply(v, jnp.ones((2, 10, 16)))
    assert out.shape == (2, 10, 4)


def test_sincos_pos_embed():
    from fce_yolo_tpu.nn.transformer import build_2d_sincos_pos_embed

    p = build_2d_sincos_pos_embed(4, 3, 64)
    assert p.shape == (1, 12, 64)
    assert np.all(np.abs(np.asarray(p)) <= 1.0)


@pytest.mark.parity
@pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "ultralytics")), reason="no reference")
def test_aifi_torch_parity():
    torch = pytest.importorskip("torch")
    import importlib.metadata as md

    orig = md.version
    md.version = lambda n, *a, **k: (orig(n) if n != "torchvision" else "0.23.0")
    sys.path.insert(0, REF)
    try:
        from ultralytics.nn.modules.transformer import AIFI as TorchAIFI
    finally:
        sys.path.remove(REF)

    import jax
    import jax.numpy as jnp

    from fce_yolo_tpu.nn.import_torch import state_dict_to_variables
    from fce_yolo_tpu.nn.transformer import AIFI

    c, h, w = 64, 5, 7
    tm = TorchAIFI(c, cm=128, num_heads=4).eval().float()
    ours = AIFI(c1=c, cm=128, num_heads=4)
    variables = state_dict_to_variables(tm.state_dict())

    rng = np.random.RandomState(0)
    x = rng.rand(2, h, w, c).astype(np.float32)
    with torch.no_grad():
        ty = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out = ours.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out), ty.numpy().transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4
    )
