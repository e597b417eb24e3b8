"""int8 PTQ serving mode tests (dcf.quant + ConvNorm quant paths).

Checks the three contracts: (1) the float param tree is shared verbatim
across modes, (2) calibration records positive activation scales, (3)
the int8 forward tracks the bf16 forward within quantization-rounding
tolerance end-to-end.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dcf.config import tiny_config
from dcf.data.preprocess import frame_to_example, stack_examples
from dcf.data.synthetic import make_frame
from dcf.models.detector import ContFuseDetector
from dcf.models.layers import ConvNorm
from dcf.quant import calibrate, quant_config


def _batch(cfg, seed=0):
    return {k: jnp.asarray(v) for k, v in stack_examples(
        [frame_to_example(make_frame(seed=seed), cfg)]).items()}


class TestConvNormInt8:
    def test_single_layer_close_to_float(self):
        key = jax.random.key(0)
        x = jax.random.normal(key, (1, 32, 40, 16), jnp.float32)
        f32 = ConvNorm(24, 3, 1, jnp.float32, quant="off")
        params = f32.init(key, x)
        # calibrate the one layer
        calib = ConvNorm(24, 3, 1, jnp.float32, quant="calib")
        _, qvars = calib.apply(params, x, mutable=["quant"])
        amax = float(jax.tree.leaves(qvars["quant"])[0])
        assert amax > 0
        i8 = ConvNorm(24, 3, 1, jnp.float32, quant="int8")
        y_f = f32.apply(params, x)
        y_q = i8.apply({**params, **qvars}, x)
        err = np.linalg.norm(np.asarray(y_q - y_f)) / np.linalg.norm(
            np.asarray(y_f))
        assert err < 0.05, err

    def test_param_tree_shared(self):
        key = jax.random.key(1)
        x = jnp.zeros((1, 16, 16, 8), jnp.float32)
        p_off = ConvNorm(8, 3, 1, jnp.float32, quant="off").init(key, x)
        p_i8 = ConvNorm(8, 3, 1, jnp.float32, quant="int8").init(key, x)
        assert (jax.tree.structure(p_off["params"])
                == jax.tree.structure(p_i8["params"]))
        for a, b in zip(jax.tree.leaves(p_off["params"]),
                        jax.tree.leaves(p_i8["params"])):
            assert a.shape == b.shape and a.dtype == b.dtype


class TestDetectorPTQ:
    def test_e2e_int8_tracks_float(self):
        cfg = tiny_config(with_fusion=True)
        # fp32 compute isolates quantization error from bf16 noise
        cfg = dataclasses.replace(
            cfg, backbone=dataclasses.replace(cfg.backbone,
                                              dtype="float32"))
        batch = _batch(cfg, seed=0)
        model = ContFuseDetector(cfg)
        variables = jax.jit(model.init)(jax.random.key(0), batch)

        qvars = calibrate(cfg, variables, [batch, _batch(cfg, seed=5)])
        scales = np.array(jax.tree.leaves(qvars["quant"]))
        assert (scales > 0).all()

        int8_model = ContFuseDetector(quant_config(cfg))
        p_f = jax.jit(model.apply)(variables, batch)
        p_q = jax.jit(int8_model.apply)(
            {"params": variables["params"], **qvars}, batch)
        for k in p_f:
            a = np.asarray(p_f[k], np.float32)
            b = np.asarray(p_q[k], np.float32)
            assert np.isfinite(b).all(), k
            err = np.linalg.norm(b - a) / max(np.linalg.norm(a), 1e-6)
            assert err < 0.15, (k, err)
