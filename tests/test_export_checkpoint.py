"""Orbax checkpoint backend + jax.export serving round trips."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_model_and_train import tiny_arch, tiny_cfg


class TestOrbax:
    def test_save_restore_roundtrip(self, tmp_path):
        from sad_tpu.train.orbax_checkpoint import OrbaxCheckpointer

        params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(3)}
        vel = jax.tree_util.tree_map(jnp.zeros_like, params)
        ck = OrbaxCheckpointer(str(tmp_path / "ckpt"), max_to_keep=2)
        ck.save(10, params, vel)
        ck.save(20, params, vel)
        ck.wait()
        assert ck.latest_step() == 20
        restored = ck.restore(20)
        np.testing.assert_allclose(
            np.asarray(restored["params"]["w"]), np.asarray(params["w"])
        )
        # retention: saving a third drops the oldest
        ck.save(30, params)
        ck.wait()
        steps = ck.manager.all_steps()
        assert 10 not in steps and 30 in steps
        ck.close()


class TestExport:
    def test_export_and_reload_inference(self, tmp_path):
        from sad_tpu.eval.export import export_retinanet_inference, load_exported
        from sad_tpu.models import RetinaNet
        from sad_tpu.models.model_builder import init_model_params

        cfg = tiny_cfg(n_groups=1)
        arch = tiny_arch()
        model = RetinaNet(arch)
        params = init_model_params(model, jax.random.PRNGKey(0), (1, 128, 128, 3))
        path = str(tmp_path / "retina.jaxexport")
        export_retinanet_inference(cfg, model, params, 2, (128, 128), path)

        serve = load_exported(path)
        rng = np.random.RandomState(0)
        images = jnp.asarray(rng.randn(2, 128, 128, 3), jnp.float32)
        im_hw = jnp.asarray([[128, 128], [100, 90]], jnp.float32)
        scale = jnp.asarray([1.0, 1.0], jnp.float32)
        out = serve(images, im_hw, scale)
        k = cfg.TEST.DETECTIONS_PER_IM
        assert out["boxes"].shape == (2, k, 4)
        # matches the live model
        from sad_tpu.eval.inference import make_inference_fn

        live = make_inference_fn(cfg, model)(params, images, im_hw, scale)
        np.testing.assert_allclose(
            np.asarray(out["scores"]), np.asarray(live["scores"]),
            rtol=1e-5, atol=1e-6,
        )
