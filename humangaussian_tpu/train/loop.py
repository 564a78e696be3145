"""Host training loop: step dispatch, densify schedule, eval, artifacts.

The runtime around the compiled train step (what PyTorch Lightning's
Trainer does for the reference, launch.py:166-183 + callbacks): drives
`system.train_step` for max_steps, invokes the densify/prune programs on
schedule, renders validation orbits every `val_interval`, and writes the
final artifacts (120-view orbit video + last.ply + orbax checkpoint —
GaussianDreamer.py:410-565).
"""
from __future__ import annotations

import os
import time

import jax
import numpy as np

from humangaussian_tpu.io.ply import save_ply
from humangaussian_tpu.train.checkpoint import save_checkpoint
from humangaussian_tpu.utils.saving import (
    save_image_grid,
    save_metrics_csv,
    save_video,
)


def snapshot_code(save_dir: str) -> str | None:
    """Copy the git-tracked source into the trial dir (the reference's
    CodeSnapshotCallback, threestudio/utils/callbacks.py:60-94)."""
    import shutil
    import subprocess

    try:
        root = subprocess.check_output(
            ["git", "rev-parse", "--show-toplevel"], text=True
        ).strip()
        files = subprocess.check_output(
            ["git", "ls-files"], cwd=root, text=True
        ).splitlines()
    except Exception:
        return None
    dst_root = os.path.join(save_dir, "code")
    for rel in files:
        src = os.path.join(root, rel)
        if not os.path.isfile(src):
            continue
        dst = os.path.join(dst_root, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copy2(src, dst)
    return dst_root


def active_rank_bucket(alive: int, capacity: int) -> int | None:
    """Candidate-domain cap for the rasterizer, >= the alive count with
    ~5% headroom, from a {2^k, 1.5*2^k} ladder (all multiples of 128).
    None (= full capacity) once the scene approaches capacity. Each
    distinct bucket costs one extra train-step compilation, so the
    ladder is coarse — a handful of recompiles as densification grows
    the scene, in exchange for candidate sorts and backward gathers
    sized by the live scene instead of the padded capacity
    (ops/binning.build_pair_lists). The 1.5x intermediate steps matter
    most at the top: a scene just over 2^k/1.5 would otherwise jump to
    2^(k+1) and pay 33% extra in every P-proportional stage."""
    want = max(int(alive * 1.05) + 1, 1 << 15)
    pow2 = 1 << (want - 1).bit_length()
    bucket = pow2 if want > (pow2 * 3) // 4 else (pow2 * 3) // 4
    return None if bucket >= capacity else bucket


def run_training(
    system,
    state,
    max_steps: int | None = None,
    val_interval: int = 100,
    save_dir: str | None = None,
    log_every: int = 10,
    log_fn=print,
    guidance_eval_interval: int = 0,  # 0 = off (ref hard-codes it off)
    logger=None,  # utils.loggers.MultiLogger (TB/CSV/wandb fan-out)
    overflow_warn: int = 1,  # dropped pairs per step that triggers a warning
    overflow_limit: int | None = None,  # absolute dropped-pair abort (opt-in)
    overflow_grow_threshold: int = 50_000,  # persistent drops that grow
    #     the tile-capacity ladder (VERDICT r2 #3: adaptive response
    #     instead of silent deepest-first truncation)
    overflow_patience: int = 3,  # consecutive logged rows over threshold
    tile_cap_max: int = 65536,  # k_cap is a pure clamp in the paged
    #     kernel (no array is sized by it; total work stays bounded by
    #     the pair budget), so the ladder may grow it far past the old
    #     16384 — a concentrated converged-like scene under a regular
    #     camera packs 24-54k pairs into single tiles, and 65536 renders
    #     it drop-free (benchmarks/probe_r5_overflow.py shell regime:
    #     1.41M K-cap drops at 16384 -> 0 at 65536, live pairs 2.6M ->
    #     4.0M — the dropped content becomes real compositing work)
    class_fracs_ladder: tuple = ((0.75, 0.125), None),  # second ladder
    #     axis, engaged once tile_cap is maxed: persistent overflow then
    #     means class-cap spill — a mid-training scene whose (2,2)-class
    #     population exceeds its static cap (probe_r5_overflow bloat
    #     regime, the rehearsal_r5 dense-phase drops). Each rung shifts
    #     the candidate-domain split toward (2,2); the final rung None
    #     is the dual-class layout (dom = 4n, spill structurally
    #     impossible at rect<=2x2). Costs one recompile + a larger
    #     candidate domain per rung, engaged only when needed.
    progress_path: str | None = None,  # % progress file (ProgressCallback)
):
    """Train to max_steps. Returns (state, metrics_history)."""
    cfg = system.cfg
    max_steps = max_steps or cfg.max_steps
    history: list[dict] = []
    t_start = time.time()
    t_last = t_start
    start_step = int(state.step)

    alive_now = int(np.asarray(jax.device_get(state.scene.alive.sum())))
    bucket = active_rank_bucket(alive_now, cfg.capacity)
    tile_cap = cfg.tile_capacity
    ovf_streak = 0
    fracs = "cfg"  # class_fracs ladder position (system.train_step)
    fracs_rung = 0

    for i in range(start_step, max_steps):
        state, metrics = system.train_step(state, bucket, tile_cap, fracs)
        state, dens_info = system.maybe_densify(state)
        # host-side step counter: state.step is a device array and
        # int(state.step) would force a BLOCKING fetch every iteration —
        # through the axon relay that is a 10-30 ms round-trip per step
        # that also collapses the async dispatch pipeline
        step = i + 1
        if dens_info is not None:
            # alive count only changes at densify/prune events; resize
            # the candidate-domain bucket (a new bucket re-specializes
            # the jitted step once)
            alive_now = int(np.asarray(jax.device_get(
                state.scene.alive.sum())))
            new_bucket = active_rank_bucket(alive_now, cfg.capacity)
            if new_bucket != bucket:
                log_fn(
                    f"step {step}: active-rank bucket {bucket} -> "
                    f"{new_bucket} (alive={alive_now})"
                )
                bucket = new_bucket

        if progress_path:
            # the reference's ProgressCallback writes a percentage file
            # every batch for external UIs (utils/callbacks.py:121-156)
            with open(progress_path, "w") as pf:
                pf.write(f"{step / max_steps * 100:.1f}")

        if step % log_every == 0 or dens_info is not None:
            row = {k: float(np.asarray(v)) for k, v in metrics.items()}
            row["step"] = step
            now = time.time()
            row["steps_per_s"] = log_every / max(now - t_last, 1e-9)
            t_last = now
            if dens_info is not None:
                row.update(
                    n_cloned=int(dens_info.n_cloned),
                    n_split=int(dens_info.n_split),
                    n_pruned=int(dens_info.n_pruned),
                    n_dropped=int(dens_info.n_dropped),
                )
            # pair-buffer overflow is silent image degradation: warn as
            # soon as ANY pair is dropped, abort when the drop rate says
            # the static pair capacity is undersized for this scene
            # (VERDICT r1 weak #6; ops/binning.py drops deepest-first)
            ovf = int(row.get("overflow", 0))
            if ovf >= overflow_warn:
                log_fn(
                    f"WARNING step {step}: rasterizer dropped {ovf} "
                    f"(tile, gaussian) pairs — raise tile_capacity/"
                    f"pair_factor if this persists"
                )
                if overflow_limit is not None and ovf > overflow_limit:
                    raise RuntimeError(
                        f"step {step}: {ovf} dropped pairs exceeds "
                        f"overflow_limit={overflow_limit} — the scene "
                        f"outgrew the static pair buffers; increase "
                        f"tile_capacity or cfg.pair_factor and resume "
                        f"from the last checkpoint"
                    )
            # adaptive tile-capacity ladder: persistent heavy overflow
            # means the densified scene exceeds the per-tile pair cap;
            # grow it 1.5x (one recompile per rung) instead of silently
            # dropping image content every step
            ovf_streak = ovf_streak + 1 if ovf > overflow_grow_threshold else 0
            if ovf_streak >= overflow_patience:
                spill = int(row.get("overflow_spill", 0))
                spill_bound = spill >= ovf // 2  # class-cap demotion
                #   dominates — growing tile_cap can't help; go straight
                #   to the class_fracs axis
                if spill_bound and fracs_rung < len(class_fracs_ladder):
                    fracs = class_fracs_ladder[fracs_rung]
                    fracs_rung += 1
                    log_fn(
                        f"step {step}: overflow persisted {ovf_streak} "
                        f"checks ({ovf} pairs, {spill} class-spill) — "
                        f"class_fracs -> {fracs}"
                    )
                    ovf_streak = 0
                elif tile_cap < tile_cap_max:
                    new_cap = min(
                        -(-int(tile_cap * 1.5) // 128) * 128, tile_cap_max
                    )
                    log_fn(
                        f"step {step}: overflow persisted {ovf_streak} "
                        f"checks ({ovf} pairs) — tile_capacity {tile_cap} "
                        f"-> {new_cap}"
                    )
                    tile_cap = new_cap
                    ovf_streak = 0
                elif fracs_rung < len(class_fracs_ladder):
                    # tile_cap maxed: remaining persistent overflow is
                    # class-cap spill (or budget) — both shrink by
                    # shifting the candidate-domain split toward (2,2)
                    fracs = class_fracs_ladder[fracs_rung]
                    fracs_rung += 1
                    log_fn(
                        f"step {step}: overflow persisted {ovf_streak} "
                        f"checks ({ovf} pairs) at tile_capacity "
                        f"{tile_cap} — class_fracs -> {fracs}"
                    )
                    ovf_streak = 0
            history.append(row)
            if logger is not None:
                logger.log_scalars(step, row)
            log_fn(
                f"step {step}: loss={row['loss']:.4f} "
                f"alive={int(row['n_alive'])} "
                f"{row['steps_per_s']:.2f} it/s"
                + (f" densify={dens_info}" if dens_info is not None else "")
            )

        if save_dir and val_interval and step % val_interval == 0:
            out, _cams = system.render_eval(state.scene, "val")
            save_image_grid(
                os.path.join(save_dir, f"it{step}-val.png"),
                np.asarray(out["image"]),
            )
            if logger is not None:
                logger.log_image(
                    step, "val/render", np.asarray(out["image"][0])
                )
        if (
            save_dir and guidance_eval_interval
            and step % guidance_eval_interval == 0
        ):
            import jax as _jax

            strips = system.guidance_eval_snapshot(state)
            hw = np.asarray(strips["imgs_final"][0]).shape[:2]
            row = np.concatenate(
                [
                    np.asarray(
                        _jax.image.resize(strips[k][0], hw + (3,), "bilinear")
                    )
                    for k in ("render", "pose", "imgs_1step", "imgs_final",
                              "depths_1step", "depths_final")
                    if k in strips
                ],
                axis=1,
            )
            save_image_grid(
                os.path.join(save_dir, f"it{step}-guidance.png"), [row]
            )

    if save_dir:
        finalize(system, state, save_dir)
        save_metrics_csv(os.path.join(save_dir, "metrics.csv"), history)
    if logger is not None:
        logger.close()
    return state, history


def finalize(system, state, save_dir: str):
    """Test-time artifacts: orbit video + PLY + checkpoint
    (on_test_epoch_end, GaussianDreamer.py:550-565)."""
    out, _cams = system.render_eval(state.scene, "test")
    frames = np.asarray(out["image"])
    save_video(os.path.join(save_dir, "orbit.mp4"), frames, fps=30)
    save_ply(state.scene, os.path.join(save_dir, "last.ply"))
    save_checkpoint(os.path.join(save_dir, "ckpts", "last"), state)
    return save_dir
