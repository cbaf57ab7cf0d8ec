"""TTA + Ensemble tests (reference nn/tasks.py:422-487, 1238-1276)."""

import jax
import jax.numpy as jnp
import numpy as np

from fce_yolo_tpu.nn.model import build_model, init_variables
from fce_yolo_tpu.nn.tta import ensemble_predict, predict_augment, scale_img


def _tiny_model():
    model, spec, strides = build_model("fce_yolo_tpu/cfg/models/yolo11.yaml", scale="n", nc=3)
    v = init_variables(model, jax.random.PRNGKey(0), imgsz=64)
    return model, v, spec


def test_scale_img_stride_pad():
    x = jnp.zeros((1, 64, 64, 3))
    y = scale_img(x, 0.83, gs=32)
    assert y.shape[1] % 32 == 0 and y.shape[2] % 32 == 0
    assert y.shape[1] >= int(64 * 0.83)


def test_predict_augment_merges_and_descales():
    model, v, spec = _tiny_model()
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    merged = predict_augment(model, v, x)
    single = model.apply(v, x, train=False)["preds"]
    assert merged.shape[-1] == single.shape[-1]
    # clip math: full-scale pass drops its P5 tail, smallest drops its P3 head
    assert merged.shape[1] > single.shape[1] * 0.9
    # de-scaled boxes stay within the original frame (with slack for pads)
    assert float(jnp.nanmax(jnp.abs(merged[..., :2]))) < 64 * 1.6


def test_ensemble_concat():
    model, v, spec = _tiny_model()
    model2, v2, _ = _tiny_model()
    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3), jnp.float32)
    y = ensemble_predict([(model, v), (model2, v2)], x)
    single = model.apply(v, x, train=False)["preds"]
    assert y.shape == (1, 2 * single.shape[1], single.shape[2])
    np.testing.assert_allclose(np.asarray(y[:, : single.shape[1]]), np.asarray(single), rtol=1e-5)
