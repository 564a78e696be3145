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


class TestViewer:
    def test_http_viewer_serves_frames(self):
        import json
        import urllib.request

        import jax
        from humangaussian_tpu.apps.viewer import ViewerServer
        from humangaussian_tpu.core.scene import scene_from_points
        import numpy as np
        import jax.numpy as jnp

        rng = np.random.RandomState(0)
        scene = scene_from_points(
            jnp.asarray(rng.randn(200, 3).astype(np.float32) * 0.3),
            jnp.full((200, 3), 0.6, jnp.float32),
            capacity=256, sh_degree=0, mean_sq_dist=np.full(200, 1e-3),
        )
        server = ViewerServer(scene, port=0, size=64).start()
        try:
            base = f"http://127.0.0.1:{server.port}"
            page = urllib.request.urlopen(base + "/").read()
            assert b"viewer" in page
            info = json.loads(
                urllib.request.urlopen(base + "/info").read()
            )
            assert info["n_gaussians"] == 200
            png = urllib.request.urlopen(
                base + "/render?azimuth=30&elevation=10&distance=2.0"
            ).read()
            assert png[:8] == b"\x89PNG\r\n\x1a\n"
            assert len(png) > 100
        finally:
            server.stop()


class TestActiveRankBucket:
    def test_ladder_values(self):
        from humangaussian_tpu.train.loop import active_rank_bucket as b

        cap = 1 << 19
        assert b(100, cap) == 32768          # floor
        assert b(100_000, cap) == 131072     # pow2 step
        assert b(180_000, cap) == 196608     # 1.5x intermediate step
        assert b(254_000, cap) == 393216     # 1.5x step below capacity
        assert b(400_000, cap) is None       # ~capacity -> full domain
        # every bucket is a multiple of 128 (pair/lane alignment) and
        # covers alive * 1.05
        for alive in range(1000, 500_000, 7919):
            bk = b(alive, cap)
            if bk is not None:
                assert bk % 128 == 0
                assert bk >= int(alive * 1.05) + 1
