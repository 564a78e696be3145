"""Closed-loop SDS efficacy (round-4 verdict Next #4).

Every full-scale run in rounds 1-4 used random guidance weights
(zero-egress: no real SD2), so nothing showed the ANPG/SDS chain
actually sculpting a scene. This closes the loop with a locally trained
prior:

1. TARGET SCENE: the toy SMPL-X body recolored red (vs the system's
   gray init), rendered from the training camera distribution.
2. PRIOR: the tiny dual-branch UNet (TINY_TEST_CONFIG, the same
   architecture family as the reference's Texture-Structure Joint
   Model) is trained as an eps-denoiser on (rgb, depth, pose) latent
   triplets of the target renders — view-dependent text conditioning
   and pose conditioning exactly as the real pipeline wires them.
   300 denoiser steps on a 200-step VAE-autoencoder (round-5
   ablations: a RANDOM VAE's sampling noise + scrambled Jacobian and a
   400+-step overtrained toy prior each measurably misdirect the loop;
   this is the validated recipe).
3. SDS: the REAL GaussianDreamerSystem.train_step
   (train/system.py — the flagship jitted step, untouched) runs from
   the fresh gray-init scene against that prior (mode="sds").
4. METRIC: PSNR to the target's val renders and the rendered red-vs-
   green channel gap, sampled along training. SDS works iff the scene
   moves toward the prior's data.

Writes benchmarks/efficacy_r5.json. CPU, ~10-20 min at defaults.
Reference behavior being demonstrated:
/root/reference/threestudio/systems/GaussianDreamer.py:316-374.
"""
import dataclasses
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import optax

from humangaussian_tpu.data.cameras import sample_camera_batch
from humangaussian_tpu.guidance.dual_branch import (
    DEPTH_MEAN,
    DEPTH_STD,
    RGB_MEAN,
    RGB_STD,
    WHOLE_MEAN,
    WHOLE_STD,
    GuidanceConfig,
)
from humangaussian_tpu.testing import tiny_system

RED = np.array([0.9, 0.12, 0.12], np.float32)
C0 = 0.28209479177387814  # SH DC basis


def build(batch=4, capacity=2048):
    system = tiny_system(capacity=capacity, batch=batch)
    # Isolate the SDS gradient chain: densification off, and
    # lambda_sparsity=0 — the sparsity regularizer is balanced against a
    # STRONG real prior in the reference (guidance_scale 7.5-100); under
    # this toy prior at s=0 it dominates and measurably drags the scene
    # away from the target (diagnosed round 5: with sparsity on, psnr
    # 29.1 -> 27.9 over 400 steps; with it off, 29.1 -> 30.0 and the
    # red_gap moves toward the target).
    system.cfg = dataclasses.replace(
        system.cfg, densify_prune_start_step=10**9,
        prune_only_start_step=10**9, prune_only_end_step=2 * 10**9,
        lambda_sparsity=0.0,
    )
    return system


def make_target_scene(system, key):
    state = system.init_state(key)
    scene = state.scene
    dc = (RED - 0.5) / C0
    sh_dc = jnp.broadcast_to(jnp.asarray(dc)[None, :], scene.sh_dc.shape)
    scene = scene._replace(sh_dc=sh_dc)
    return state, scene


def batch_inputs(system, scene, key):
    """(rgb, depth3, pose, cond_ctx) for one random camera batch —
    the exact image plumbing of train/system.py batch_loss."""
    k_cam, k_render = jax.random.split(key)
    cams = sample_camera_batch(k_cam, 10_000, system.camera_cfg)
    out = system.render_batch(scene, cams, system.camera_cfg.height,
                              system.camera_cfg.width)
    images = out["image"]
    depths = out["depth"][..., None]
    dmin = jnp.min(depths, axis=(1, 2, 3), keepdims=True)
    dmax = jnp.max(depths, axis=(1, 2, 3), keepdims=True)
    depth3 = jnp.repeat((depths - dmin) / (dmax - dmin + 1e-10), 3, axis=-1)
    pose = system.pose_images(cams)
    text = system.prompt_embeddings.get_text_embeddings(
        cams.elevation, cams.azimuth, cams.camera_distances
    )
    b = images.shape[0]
    cond = text.reshape((3, b) + text.shape[1:])[0]
    return images, depth3, pose, cond


def train_vae_ae(system, target_scene, key, steps=250, lr=2e-3):
    """Autoencoder pretraining of the tiny VAE on target renders.

    With a RANDOM VAE the sampled latents carry O(1) noise (untrained
    logvar) and the encoder's random Jacobian scrambles color
    directions — the first full efficacy run measurably drove the scene
    AWAY from the target through it. The real pipeline's sd-vae-ft-mse
    is a good autoencoder; 250 recon steps (+ logvar -> -8 so sampling
    noise is small) restores that property for the toy loop."""
    g = system.guidance
    vae = g.vae
    params = g.vae_params
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    s = g.cfg.image_size

    @jax.jit
    def ae_step(params, opt_state, imgs):
        x = jax.image.resize(imgs, (imgs.shape[0], s, s, 3),
                             "bilinear") * 2.0 - 1.0

        def loss_fn(p):
            mean, logvar = vae.apply(p, x, method=vae.encode)
            recon = vae.apply(p, mean, method=vae.decode)
            return (jnp.mean((recon - x) ** 2)
                    + 0.02 * jnp.mean((logvar + 8.0) ** 2))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(steps):
        key, kb = jax.random.split(key)
        rgb, depth3, pose, _ = batch_inputs(system, target_scene, kb)
        # train on all three image streams the guidance encodes
        imgs = jnp.concatenate([rgb, depth3, pose], axis=0)
        params, opt_state, loss = ae_step(params, opt_state, imgs)
        if i % 50 == 0 or i == steps - 1:
            print(f"vae-ae step {i}: recon loss {float(loss):.4f}",
                  flush=True)
    return params


def train_prior(system, target_scene, key, steps=500, lr=2e-3):
    """eps-objective denoiser training of the tiny dual-branch UNet on
    target renders (both branches, pose-conditioned, view-dep text)."""
    g = system.guidance
    unet, sched = g.unet, g.schedule
    params = g.unet_params
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    s = g.cfg.image_size

    def resize(x, b):
        return jax.image.resize(x, (b,) + (s, s, 3), "bilinear")

    @jax.jit
    def prior_step(params, opt_state, rgb, depth3, pose, cond, key):
        b = rgb.shape[0]
        k1, k2, k3, k4, k5, kt = jax.random.split(key, 6)
        latents = g.encode_images(resize(rgb, b), k1)
        dl = (g.encode_images(resize(depth3, b), k2)
              - DEPTH_MEAN) / DEPTH_STD * RGB_STD + RGB_MEAN
        wl = g.encode_images(resize(pose, b), k3)
        wl = (wl - WHOLE_MEAN) / WHOLE_STD * RGB_STD + RGB_MEAN
        t = jax.random.randint(kt, (b,), 20, 981)
        noise = jax.random.normal(k4, latents.shape)
        dnoise = jax.random.normal(k5, dl.shape)
        lat_noisy = sched.add_noise(latents, noise, t)
        dep_noisy = sched.add_noise(dl, dnoise, t)
        time_ids = jnp.tile(
            jnp.array([[g.cfg.original_size, g.cfg.original_size, 0, 0,
                        g.cfg.target_size, g.cfg.target_size]], jnp.float32),
            (b, 1))

        def loss_fn(p):
            pred = unet.apply(
                p,
                jnp.concatenate([lat_noisy, wl], axis=-1),
                jnp.concatenate([dep_noisy, wl], axis=-1),
                t.astype(jnp.float32), cond, time_ids,
            )
            target = jnp.concatenate([noise, dnoise], axis=-1)
            return jnp.mean((pred - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(steps):
        key, kb, ks = jax.random.split(key, 3)
        rgb, depth3, pose, cond = batch_inputs(system, target_scene, kb)
        params, opt_state, loss = prior_step(
            params, opt_state, rgb, depth3, pose, cond, ks)
        if i % 50 == 0 or i == steps - 1:
            losses.append((i, float(loss)))
            print(f"prior step {i}: denoise mse {float(loss):.4f}",
                  flush=True)
    return params, losses


def psnr(a, b):
    mse = float(jnp.mean((a - b) ** 2))
    return -10.0 * np.log10(max(mse, 1e-12))


def eval_metrics(system, scene, target_scene):
    out, cams = system.render_eval(scene, "val")
    tgt, _ = system.render_eval(target_scene, "val")
    img, timg = out["image"], tgt["image"]
    # redness on body pixels (alpha-weighted channel gap)
    w = out["alpha"][..., None]
    red_gap = float(jnp.sum(w * (img[..., :1] - img[..., 1:2]))
                    / (jnp.sum(w) + 1e-6))
    return psnr(img, timg), red_gap


def run(prior_steps=500, sds_steps=400, eval_every=50, out_json=None):
    key = jax.random.PRNGKey(0)
    system = build()
    state0, target_scene = make_target_scene(system, jax.random.PRNGKey(42))

    key, kv = jax.random.split(key)
    vae_params = train_vae_ae(system, target_scene, kv, steps=200)
    system.guidance = system.guidance.replace(vae_params=vae_params)

    key, kp = jax.random.split(key)
    trained, prior_losses = train_prior(system, target_scene, kp,
                                        steps=prior_steps)
    system.guidance = system.guidance.replace(
        unet_params=trained,
        cfg=GuidanceConfig(
            latent_size=8, image_size=16, mode="sds", guidance_scale=0.0,
            weighting_strategy="sds", remat_encode=False,
        ),
    )

    state = system.init_state(jax.random.PRNGKey(7))
    traj = []
    p0, r0 = eval_metrics(system, state.scene, target_scene)
    traj.append({"step": 0, "psnr": p0, "red_gap": r0})
    print(f"sds step 0: psnr {p0:.2f} red_gap {r0:.4f}", flush=True)
    for i in range(1, sds_steps + 1):
        state, metrics = system.train_step(state)
        if i % eval_every == 0:
            p, r = eval_metrics(system, state.scene, target_scene)
            traj.append({"step": i, "psnr": p, "red_gap": r,
                         "loss": float(metrics["loss"])})
            print(f"sds step {i}: psnr {p:.2f} red_gap {r:.4f} "
                  f"loss {float(metrics['loss']):.4f}", flush=True)

    result = {
        "prior_denoise_mse": prior_losses,
        "sds_trajectory": traj,
        "psnr_start": traj[0]["psnr"],
        "psnr_end": traj[-1]["psnr"],
        "red_gap_start": traj[0]["red_gap"],
        "red_gap_end": traj[-1]["red_gap"],
    }
    if out_json:
        with open(out_json, "w") as f:
            json.dump(result, f, indent=1)
        print("wrote", out_json)
    return result


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--prior-steps", type=int, default=300)
    ap.add_argument("--sds-steps", type=int, default=300)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "efficacy_r5.json"))
    a = ap.parse_args()
    r = run(a.prior_steps, a.sds_steps, out_json=a.out)
    ok = (r["psnr_end"] > r["psnr_start"]
          and r["red_gap_end"] > r["red_gap_start"])
    print("EFFICACY", "OK" if ok else "FAILED", r["psnr_start"], "->",
          r["psnr_end"], "| red_gap", r["red_gap_start"], "->",
          r["red_gap_end"])
