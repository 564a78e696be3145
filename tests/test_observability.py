"""Adan optimizer, parse_optimizer/scheduler, loggers, richer saving."""
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from humangaussian_tpu.train.adan import adan
from humangaussian_tpu.train.optimizers import parse_optimizer, parse_scheduler


class TestAdan:
    def test_first_step_is_sign_like(self):
        """At t=1: diff=0, m=(1-b1)g, n=(1-b3)g^2, so the update is
        -lr * g/(|g|+eps) (optimizers.py:200-255 algebra)."""
        opt = adan(learning_rate=0.1)
        p = {"w": jnp.array([2.0, -3.0, 0.5])}
        g = {"w": jnp.array([0.4, -0.2, 0.1])}
        state = opt.init(p)
        upd, _ = opt.update(g, state, p)
        expected = -0.1 * np.sign(np.asarray(g["w"]))
        np.testing.assert_allclose(np.asarray(upd["w"]), expected, atol=1e-4)

    def test_converges_on_quadratic(self):
        opt = adan(learning_rate=0.05)
        p = {"w": jnp.array([5.0, -4.0])}
        state = opt.init(p)

        @jax.jit
        def step(p, state):
            g = jax.grad(lambda q: jnp.sum((q["w"] - 1.0) ** 2))(p)
            upd, state = opt.update(g, state, p)
            return jax.tree.map(lambda a, b: a + b, p, upd), state

        for _ in range(600):
            p, state = step(p, state)
        # Adan's sign-like steps oscillate within ~lr of the optimum
        np.testing.assert_allclose(np.asarray(p["w"]), 1.0, atol=0.15)

    def test_weight_decay_and_clipping_paths(self):
        for kwargs in ({"weight_decay": 0.01}, {"max_grad_norm": 1.0},
                       {"no_prox": True, "weight_decay": 0.01}):
            opt = adan(learning_rate=0.01, **kwargs)
            p = {"w": jnp.ones(3)}
            state = opt.init(p)
            g = {"w": jnp.full(3, 10.0)}
            upd, state = opt.update(g, state, p)
            assert np.isfinite(np.asarray(upd["w"])).all()


class TestParse:
    def test_optimizer_names(self):
        import optax

        for name in ("adam", "adamw", "sgd", "adan"):
            opt = parse_optimizer(name, lr=1e-3)
            p = {"w": jnp.ones(2)}
            s = opt.init(p)
            upd, _ = opt.update({"w": jnp.ones(2)}, s, p)
            assert jax.tree.leaves(upd)

    def test_scheduler_shapes(self):
        for name, kw in (("constant", {}), ("linear", {}),
                         ("exponential", {"gamma": 0.1}),
                         ("multistep", {"milestones": [10], "gamma": 0.5})):
            sched = parse_scheduler(name, 0.01, 100, **kw)
            v0, v99 = float(sched(0)), float(sched(99))
            assert v0 > 0
            if name != "constant":
                assert v99 < v0 + 1e-9


class TestLoggers:
    def test_tensorboard_writes_events(self, tmp_path):
        from humangaussian_tpu.utils.loggers import TensorBoardLogger

        lg = TensorBoardLogger(str(tmp_path))
        lg.log_scalars(1, {"train/loss": 0.5, "alive": 100})
        lg.log_image(1, "val/render", np.zeros((8, 8, 3), np.float32))
        lg.close()
        assert glob.glob(os.path.join(tmp_path, "events.out.tfevents.*"))

    def test_csv_logger(self, tmp_path):
        from humangaussian_tpu.utils.loggers import CSVLogger

        path = os.path.join(tmp_path, "m.csv")
        lg = CSVLogger(path)
        lg.log_scalars(1, {"loss": 1.0})
        lg.log_scalars(2, {"loss": 0.5})
        lines = open(path).read().strip().splitlines()
        assert lines[0].startswith("step")
        assert len(lines) == 3

    def test_wandb_degrades_gracefully(self):
        from humangaussian_tpu.utils.loggers import WandbLogger

        lg = WandbLogger("proj", "name")  # wandb not installed here
        lg.log_scalars(0, {"x": 1.0})
        lg.log_image(0, "img", np.zeros((4, 4, 3)))
        lg.close()

    def test_multilogger_fanout(self, tmp_path):
        from humangaussian_tpu.utils.loggers import CSVLogger, MultiLogger

        a = CSVLogger(os.path.join(tmp_path, "a.csv"))
        b = CSVLogger(os.path.join(tmp_path, "b.csv"))
        ml = MultiLogger([a, b])
        ml.log_scalars(0, {"loss": 2.0})
        ml.close()
        assert os.path.exists(os.path.join(tmp_path, "a.csv"))
        assert os.path.exists(os.path.join(tmp_path, "b.csv"))


class TestSaving:
    def test_grid_with_text_banners(self, tmp_path):
        from humangaussian_tpu.utils.saving import save_image_grid

        imgs = [np.full((32, 48, 3), 0.5, np.float32) for _ in range(3)]
        path = save_image_grid(
            os.path.join(tmp_path, "grid.png"), imgs,
            texts=["n0.50\ne12.0", None, "a-45"],
        )
        from PIL import Image

        arr = np.asarray(Image.open(path))
        assert arr.shape == (32, 3 * 48, 3)
        # the banner modified pixels over the uniform gray
        base = arr[20:, 40:48]
        assert (arr[:16, :48] != base[0, 0, 0]).any()

    def test_save_gif(self, tmp_path):
        from humangaussian_tpu.utils.saving import save_gif

        frames = [np.full((8, 8, 3), i / 4, np.float32) for i in range(4)]
        path = save_gif(os.path.join(tmp_path, "seq.gif"), frames, fps=10)
        assert os.path.exists(path) and path.endswith(".gif")
