"""Benchmark: differentiable tiled rasterizer fwd+bwd at training scale.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Metric: rays/s for a full forward+backward render at 1024x1024 with
100k Gaussians (the reference's training resolution and init count,
/root/reference/README.md:120, configs/test.yaml:8-13) on one chip.

Baseline (vs_baseline denominator): 1.0e8 rays/s — an estimate of the
CUDA diff-gaussian-rasterization fwd+bwd on the reference's A100
(~5-10 ms per 1024^2 render+backward at ~1e5 Gaussians; the repo itself
publishes no kernel benchmark, see BASELINE.md). BASELINE.json's target
is 1.5x this per chip.

Extra fields report the stage split and the pure-forward rate.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax

    # persistent compile cache: repeat bench runs skip the multi-minute
    # remote compile
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from humangaussian_tpu.core.camera import camera_from_c2w, look_at_c2w
    from humangaussian_tpu.ops.projection import RasterizeConfig
    from humangaussian_tpu.ops.rasterize_tiled import rasterize_tiled

    rng = np.random.RandomState(0)
    n = 100_000
    h = w = 1024
    cfg = RasterizeConfig(tile=32, max_tiles_per_gaussian=16)
    c2w = look_at_c2w(
        jnp.array([0.0, 0.0, 3.0]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])
    )
    camera = camera_from_c2w(c2w, 0.8, h, w)
    background = jnp.zeros((3,), jnp.float32)
    params = dict(
        means=jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.5),
        scales=jnp.asarray(np.exp(rng.randn(n, 3).astype(np.float32) * 0.5 - 5.0)),
        quats=jnp.asarray(rng.randn(n, 4).astype(np.float32)),
        sh=jnp.asarray(rng.randn(n, 1, 3).astype(np.float32) * 0.3),
        opacities=jnp.asarray((1 / (1 + np.exp(-rng.randn(n)))).astype(np.float32)),
    )
    alive = jnp.ones((n,), bool)

    def render(p):
        return rasterize_tiled(
            p["means"], p["scales"], p["quats"], p["sh"], p["opacities"],
            alive, camera, background, 0, cfg, tile_capacity=4096,
        )

    @jax.jit
    def fwd(p):
        out = render(p)
        return out["image"]

    @jax.jit
    def fwdbwd(p):
        def loss(q):
            o = render(q)
            return jnp.sum(o["image"]) + jnp.sum(o["depth"]) * 1e-3 + jnp.sum(o["alpha"])

        return jax.grad(loss)(p)["means"]

    def timeit(f, iters=30):
        """(amortized, per-call median) seconds. Amortized keeps the
        device pipeline full (steady-state training behavior) and hides
        the tunnel's per-dispatch latency; per-call sync bounds the
        worst case. Both are reported."""
        out = f(params)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(params)
        jax.block_until_ready(out)
        amortized = (time.perf_counter() - t0) / iters
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = f(params)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        return amortized, float(np.median(times))

    dt_fwd, dt_fwd_min = timeit(fwd)
    dt_fb, dt_fb_min = timeit(fwdbwd)
    rays = h * w
    value = rays / dt_fb
    baseline = 1.0e8  # estimated CUDA rasterizer fwd+bwd rays/s (A100)
    print(
        json.dumps(
            {
                "metric": "rasterizer_fwd_bwd_rays_per_s",
                "value": round(value, 1),
                "unit": "rays/s",
                "vs_baseline": round(value / baseline, 4),
                "fwd_ms": round(dt_fwd * 1e3, 2),
                "fwd_bwd_ms": round(dt_fb * 1e3, 2),
                "fwd_ms_percall": round(dt_fwd_min * 1e3, 2),
                "fwd_bwd_ms_percall": round(dt_fb_min * 1e3, 2),
                "fwd_rays_per_s": round(rays / dt_fwd, 1),
                "backend": jax.default_backend(),
                "n_gaussians": n,
                "resolution": f"{h}x{w}",
            }
        )
    )


if __name__ == "__main__":
    main()
