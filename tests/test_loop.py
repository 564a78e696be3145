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


class _ScriptedSystem:
    """Minimal system surface for exercising run_training's adaptive
    overflow ladder without a real render: train_step returns scripted
    (overflow, overflow_spill) metrics and records the (tile_cap,
    class_fracs) the loop passed in."""

    class _Cfg:
        capacity = 1 << 15
        tile_capacity = 4096
        max_steps = 100

    cfg = _Cfg()

    def __init__(self, script):
        # script: step -> (overflow, spill)
        self.script = script
        self.calls = []  # (step, tile_cap, fracs)

    def init_state(self):
        import jax.numpy as jnp
        from types import SimpleNamespace

        scene = SimpleNamespace(alive=jnp.ones((1000,), bool))
        return SimpleNamespace(scene=scene, step=jnp.zeros((), jnp.int32))

    def train_step(self, state, bucket, tile_cap, fracs="cfg"):
        import jax.numpy as jnp

        step = int(state.step)
        self.calls.append((step, tile_cap, fracs))
        ovf, spill = self.script(step)
        state.step = state.step + 1
        metrics = {
            "loss": jnp.float32(1.0),
            "n_alive": jnp.int32(1000),
            "overflow": jnp.int32(ovf),
            "overflow_spill": jnp.int32(spill),
        }
        return state, metrics

    def maybe_densify(self, state):
        return state, None


class TestOverflowLadder:
    def _run(self, script, steps=40, **kw):
        sys_ = _ScriptedSystem(script)
        state = sys_.init_state()
        run_training(
            sys_, state, max_steps=steps, val_interval=0, save_dir=None,
            log_every=1, log_fn=lambda *_: None,
            overflow_grow_threshold=100, overflow_patience=3, **kw,
        )
        return sys_

    def test_kcap_overflow_grows_tile_capacity(self):
        # persistent overflow with NO spill component: the ladder must
        # grow tile_cap 1.5x per trip and leave class_fracs alone
        sys_ = self._run(lambda step: (10_000, 0), steps=10)
        caps = [c for (_s, c, _f) in sys_.calls]
        fracs = {f for (_s, _c, f) in sys_.calls}
        assert caps[0] == 4096 and caps[-1] > 4096
        assert caps == sorted(caps)
        assert fracs == {"cfg"}

    def test_spill_overflow_jumps_to_class_fracs(self):
        # spill-dominated overflow: the loop must take the class_fracs
        # axis immediately (growing tile_cap cannot reduce demotion).
        # The scripted scene's spill vanishes once the dual-class rung
        # (fracs=None, dom=4n) is active — as it structurally must
        sys_ = _ScriptedSystem(None)
        sys_.script = lambda step: (
            (0, 0) if sys_.calls and sys_.calls[-1][2] is None
            else (10_000, 9_000)
        )
        state = sys_.init_state()
        run_training(
            sys_, state, max_steps=14, val_interval=0, save_dir=None,
            log_every=1, log_fn=lambda *_: None,
            overflow_grow_threshold=100, overflow_patience=3,
        )
        caps = {c for (_s, c, _f) in sys_.calls}
        fracs = [f for (_s, _c, f) in sys_.calls]
        assert caps == {4096}  # tile_cap untouched
        assert fracs[0] == "cfg"
        assert (0.75, 0.125) in fracs  # rung 1 engaged
        assert fracs[-1] is None  # rung 2 (dual-class, spill-free)

    def test_overflow_subsiding_stops_ladder(self):
        # overflow below threshold: no rungs ever fire
        sys_ = self._run(lambda step: (50, 0), steps=8)
        assert {c for (_s, c, _f) in sys_.calls} == {4096}
        assert {f for (_s, _c, f) in sys_.calls} == {"cfg"}
