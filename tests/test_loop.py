"""Host training-loop integration: artifacts, resume, code snapshot."""
import os

import jax
import numpy as np

from humangaussian_tpu.testing import tiny_system
from humangaussian_tpu.train.loop import finalize, run_training, snapshot_code


class TestLoop:
    def test_short_run_writes_artifacts(self, tmp_path):
        system = tiny_system()
        state = system.init_state(jax.random.PRNGKey(0))
        save_dir = str(tmp_path / "save")
        os.makedirs(save_dir)
        state, history = run_training(
            system, state, max_steps=4, val_interval=2,
            save_dir=save_dir, log_every=2, log_fn=lambda *_: None,
        )
        assert int(state.step) == 4
        assert len(history) >= 1
        files = set(os.listdir(save_dir))
        assert "last.ply" in files
        assert "metrics.csv" in files
        assert any(f.startswith("it2-val") for f in files)
        assert any(f.startswith("orbit.") for f in files)  # mp4 or gif
        assert os.path.isdir(os.path.join(save_dir, "ckpts", "last"))

    def test_resume_from_checkpoint(self, tmp_path):
        from humangaussian_tpu.train.checkpoint import restore_checkpoint

        system = tiny_system()
        state = system.init_state(jax.random.PRNGKey(0))
        save_dir = str(tmp_path / "save")
        os.makedirs(save_dir)
        state, _ = run_training(
            system, state, max_steps=2, val_interval=0,
            save_dir=save_dir, log_fn=lambda *_: None,
        )
        template = system.init_state(jax.random.PRNGKey(0))
        restored = restore_checkpoint(
            os.path.join(save_dir, "ckpts", "last"), template
        )
        assert int(restored.step) == 2
        # training continues from the restored counter
        restored, _ = run_training(
            system, restored, max_steps=3, val_interval=0, log_fn=lambda *_: None
        )
        assert int(restored.step) == 3

    def test_code_snapshot(self, tmp_path):
        out = snapshot_code(str(tmp_path))
        assert out is not None
        assert os.path.exists(os.path.join(out, "bench.py"))

    def test_guidance_eval_snapshot(self, tmp_path):
        system = tiny_system()
        state = system.init_state(jax.random.PRNGKey(0))
        save_dir = str(tmp_path / "save")
        os.makedirs(save_dir)
        run_training(
            system, state, max_steps=2, val_interval=0,
            save_dir=save_dir, guidance_eval_interval=2,
            log_fn=lambda *_: None,
        )
        assert any(
            f.startswith("it2-guidance") for f in os.listdir(save_dir)
        )
