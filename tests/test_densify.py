"""Density-control semantics vs the reference's rules
(gaussiansplatting/scene/gaussian_model.py:359-438)."""
import jax
import jax.numpy as jnp
import numpy as np

from humangaussian_tpu.core.scene import GaussianScene, empty_scene, inverse_sigmoid
from humangaussian_tpu.densify import (
    DensifyState,
    densify_and_prune,
    init_densify_state,
    prune_only,
    update_stats,
)


def make_scene(capacity=16, n=8, scale=0.01, opacity=0.5):
    scene = empty_scene(capacity)
    idx = jnp.arange(capacity)
    return scene._replace(
        means=jnp.where(
            (idx < n)[:, None], jnp.arange(capacity * 3).reshape(capacity, 3) * 0.1, 0.0
        ),
        log_scales=jnp.where((idx < n)[:, None], jnp.log(scale), -10.0),
        opacity_logits=jnp.where(
            (idx < n)[:, None], inverse_sigmoid(jnp.float32(opacity)), -10.0
        ),
        alive=idx < n,
    )


def make_moments(scene):
    p = scene.params()
    return {
        "mu": jax.tree.map(jnp.ones_like, p),
        "nu": jax.tree.map(jnp.ones_like, p),
    }


def stats_with_grad(scene, grads):
    c = scene.capacity
    ds = init_densify_state(c)
    g = jnp.zeros((c, 2)).at[:, 0].set(jnp.asarray(grads))
    return update_stats(ds, g, jnp.ones(c, jnp.int32), scene.alive)


class TestStats:
    def test_only_visible_accumulate(self):
        ds = init_densify_state(4)
        grad = jnp.array([[3.0, 4.0], [3.0, 4.0], [0.0, 0.0], [1.0, 0.0]])
        radii = jnp.array([10, 0, 5, 2], jnp.int32)
        vis = radii > 0
        ds = update_stats(ds, grad, radii, vis)
        np.testing.assert_allclose(ds.grad_accum, [5.0, 0.0, 0.0, 1.0])
        np.testing.assert_allclose(ds.denom, [1.0, 0.0, 1.0, 1.0])
        np.testing.assert_allclose(ds.max_radii2d, [10.0, 0.0, 5.0, 2.0])
        ds = update_stats(ds, grad, jnp.array([3, 0, 9, 1], jnp.int32), vis)
        np.testing.assert_allclose(ds.max_radii2d, [10.0, 0.0, 9.0, 2.0])


class TestClone:
    def test_small_high_grad_cloned(self):
        scene = make_scene(capacity=16, n=8, scale=0.01)  # small vs 0.01*4.0
        ds = stats_with_grad(scene, [1.0] + [0.0] * 15)
        mom = make_moments(scene)
        s2, mom2, ds2, info = densify_and_prune(
            scene, mom, ds, jax.random.PRNGKey(0),
            max_grad=2e-4, min_opacity=0.05, extent=4.0, max_screen_size=20.0,
        )
        assert int(info.n_cloned) == 1 and int(info.n_split) == 0
        assert int(info.n_alive) == 9
        # child is a verbatim copy of parent 0 in a previously-dead slot
        child_slot = 8  # first free slot
        assert bool(s2.alive[child_slot])
        np.testing.assert_allclose(s2.means[child_slot], scene.means[0])
        np.testing.assert_allclose(
            s2.opacity_logits[child_slot], scene.opacity_logits[0]
        )
        # moments zeroed at the new slot, untouched elsewhere
        assert float(mom2["mu"]["means"][child_slot].sum()) == 0.0
        assert float(mom2["mu"]["means"][0].sum()) == 3.0
        # stats reset after a densify pass
        np.testing.assert_allclose(ds2.grad_accum, 0.0)


class TestSplit:
    def test_large_high_grad_split(self):
        scene = make_scene(capacity=16, n=8, scale=0.5)  # 0.5 > 0.01*4.0
        ds = stats_with_grad(scene, [1.0] + [0.0] * 15)
        mom = make_moments(scene)
        s2, _, _, info = densify_and_prune(
            scene, mom, ds, jax.random.PRNGKey(0),
            max_grad=2e-4, min_opacity=0.05, extent=4.0, max_screen_size=None,
        )
        assert int(info.n_split) == 1
        # parent died, two children live: net +1
        assert int(info.n_alive) == 9
        # children carry scale / 1.6; the parent (scale 0.5) is gone, the
        # other 7 originals remain (the parent's slot may be reused)
        alive_scales = np.asarray(s2.scales)[np.asarray(s2.alive)]
        assert (np.abs(alive_scales[:, 0] - 0.5 / 1.6) < 1e-5).sum() == 2
        assert (np.abs(alive_scales[:, 0] - 0.5) < 1e-5).sum() == 7

    def test_children_never_resplit_same_pass(self):
        scene = make_scene(capacity=64, n=4, scale=0.5)
        ds = stats_with_grad(scene, [1.0, 1.0, 1.0, 1.0] + [0.0] * 60)
        mom = make_moments(scene)
        s2, _, _, info = densify_and_prune(
            scene, mom, ds, jax.random.PRNGKey(1),
            max_grad=2e-4, min_opacity=0.05, extent=4.0, max_screen_size=None,
        )
        assert int(info.n_split) == 4
        assert int(info.n_alive) == 8  # 4 parents -> 8 children, no cascade


class TestPrune:
    def test_low_opacity_pruned(self):
        scene = make_scene(capacity=16, n=8, opacity=0.5)
        scene = scene._replace(
            opacity_logits=scene.opacity_logits.at[3].set(inverse_sigmoid(0.01))
        )
        ds = init_densify_state(16)
        mom = make_moments(scene)
        s2, _, _, info = densify_and_prune(
            scene, mom, ds, jax.random.PRNGKey(0),
            max_grad=2e-4, min_opacity=0.05, extent=4.0, max_screen_size=None,
        )
        assert int(info.n_pruned) == 1
        assert not bool(s2.alive[3])

    def test_world_size_prune_with_size_threshold(self):
        # scale 0.45 > 0.1 * extent(4.0) = 0.4 -> pruned when threshold set...
        scene = make_scene(capacity=16, n=8, scale=0.009)
        scene = scene._replace(
            log_scales=scene.log_scales.at[2].set(jnp.log(0.45))
        )
        ds = init_densify_state(16)
        mom = make_moments(scene)
        s2, _, _, _ = densify_and_prune(
            scene, mom, ds, jax.random.PRNGKey(0),
            max_grad=2e-4, min_opacity=0.05, extent=4.0, max_screen_size=20.0,
        )
        assert not bool(s2.alive[2])
        # ...and kept when size threshold is None (reference :404-408)
        s3, _, _, _ = densify_and_prune(
            scene, mom, ds, jax.random.PRNGKey(0),
            max_grad=2e-4, min_opacity=0.05, extent=4.0, max_screen_size=None,
        )
        assert bool(s3.alive[2])


class TestCapacity:
    def test_dropped_children_reported(self):
        scene = make_scene(capacity=8, n=8, scale=0.01)  # zero free slots
        ds = stats_with_grad(scene, [1.0] * 8)
        mom = make_moments(scene)
        s2, _, _, info = densify_and_prune(
            scene, mom, ds, jax.random.PRNGKey(0),
            max_grad=2e-4, min_opacity=0.05, extent=4.0, max_screen_size=None,
        )
        assert int(info.n_dropped) == 8  # all clones dropped
        assert int(info.n_alive) == 8

    def test_split_parent_slots_reused(self):
        scene = make_scene(capacity=8, n=8, scale=0.5)  # full, all split
        ds = stats_with_grad(scene, [1.0] * 8)
        mom = make_moments(scene)
        s2, _, _, info = densify_and_prune(
            scene, mom, ds, jax.random.PRNGKey(0),
            max_grad=2e-4, min_opacity=0.05, extent=4.0, max_screen_size=None,
        )
        # 8 parents die freeing 8 slots; 16 children want slots; 8 dropped
        assert int(info.n_split) == 8
        assert int(info.n_dropped) == 8
        assert int(info.n_alive) == 8


class TestPruneOnly:
    def test_opacity_and_size(self):
        scene = make_scene(capacity=16, n=8, scale=0.005, opacity=0.5)
        scene = scene._replace(
            opacity_logits=scene.opacity_logits.at[1].set(
                inverse_sigmoid(0.001)
            ),
            log_scales=scene.log_scales.at[5].set(jnp.log(0.02)),
        )
        ds = stats_with_grad(scene, [1.0] * 16)
        mom = make_moments(scene)
        s2, _, ds2, info = prune_only(
            scene, mom, ds, min_opacity=0.005, size_thresh=0.008
        )
        assert int(info.n_pruned) == 2
        assert not bool(s2.alive[1]) and not bool(s2.alive[5])
        # survivors keep their stats; killed slots zeroed
        assert float(ds2.grad_accum[0]) == 1.0
        assert float(ds2.grad_accum[1]) == 0.0

    def test_jit_stable_shapes(self):
        scene = make_scene(capacity=32, n=10)
        ds = init_densify_state(32)
        mom = make_moments(scene)

        @jax.jit
        def step(scene, mom, ds, key):
            return densify_and_prune(
                scene, mom, ds, key,
                max_grad=2e-4, min_opacity=0.05, extent=4.0,
                max_screen_size=20.0,
            )

        s2, m2, d2, i2 = step(scene, mom, ds, jax.random.PRNGKey(0))
        s3, m3, d3, i3 = step(s2, m2, d2, jax.random.PRNGKey(1))
        assert s3.capacity == 32
